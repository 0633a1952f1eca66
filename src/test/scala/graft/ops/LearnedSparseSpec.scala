package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[RetrievalOps.learnedSparseTopK]] (r21) — learned-sparse retrieval.
  * Contracts:
  *
  *  1. the bounded (MaxScore) evaluation returns the IDENTICAL answer
  *     to an independent exhaustive scorer over the same learned
  *     impacts — elementwise, at both gate SFs;
  *  2. ReLU soundness: every scored contribution is positive (the
  *     precondition [[RetrievalOps.boundedImpactTopK]]'s bounds need);
  *  3. plan pin: candidate generation joins the postings against a
  *     BROADCAST of the ≤256-row query support — no shuffle join on
  *     the corpus side for candidate generation;
  *  4. integer exactness: every returned impact is a whole number
  *     (micro-logit × saturated tf — no float drift enters the score).
  */
class LearnedSparseSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def wPosOf(docs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    RetrievalOps.trainImpacts(docs)

  test("bounded evaluation equals the exhaustive scorer elementwise at both gate SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables.t(spark, dir, "documents")
      val wPos = wPosOf(docs) // trained ONCE, shared by both arms
      val (topk, stats) = RetrievalOps.learnedSparseTopK(docs, wPos, k = 10, topB = 32, nBuckets = 8)
      val got = topk.collect().map(_.toString).toSeq
      assert(got.nonEmpty, s"$dir: empty result")
      // exhaustive: sum ALL contributions per (query, doc), rank, top-10
      val exhaustive = RetrievalOps.learnedSparseContrib(docs, wPos)
        .groupBy("query_id", "doc_id").agg(sum(col("c")).as("score"))
        .select(col("query_id"),
          struct((-col("score")).as("ns"), col("doc_id"), col("score")).as("rec"))
        .groupBy("query_id")
        .agg(graft.functions.TopKAggregates.minK(col("rec"), 10).as("recs"))
        .select(col("query_id"), posexplode(col("recs")).as(Seq("pos", "rec")))
        .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
          col("rec.doc_id").as("doc_id"), col("rec.score").as("score"))
        .orderBy("query_id", "rank")
        .collect().map(_.toString).toSeq
      assert(got == exhaustive,
        s"$dir: bounded evaluation drifted from exhaustive\ngot:  $got\nwant: $exhaustive")
      // the stats frame covers every query that scored
      assert(stats.collect().forall(_.getLong(1) > 0), s"$dir: empty posting stats")
    }
  }

  test("ReLU soundness and integer exactness") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val wPos = wPosOf(docs)
    assert(wPos.values.forall(_ > 0), "ReLU support must be strictly positive")
    val contrib = RetrievalOps.learnedSparseContrib(docs, wPos).collect()
    assert(contrib.nonEmpty)
    contrib.foreach { r =>
      val c = r.getDouble(3)
      assert(c > 0, s"non-positive contribution breaks the MaxScore bounds: $r")
      assert(c == math.rint(c), s"non-integer contribution: $r")
    }
    val (topk, _) = RetrievalOps.learnedSparseTopK(docs, k = 10)
    topk.collect().foreach { r =>
      val sc = r.getDouble(3)
      assert(sc == math.rint(sc) && sc > 0, s"impact not a positive integer: $r")
    }
  }

  test("candidate generation is a broadcast support join, not a corpus-side shuffle join") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val contrib = RetrievalOps.learnedSparseContrib(docs, wPosOf(docs))
    val plan = contrib.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"support join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"candidate generation must not shuffle-join the corpus:\n$plan")
  }

  // ---- the FLOAT-saturation twin (r22, [[RetrievalOps.learnedSparseLogTopK]]) ----

  test("log variant: bounded equals exhaustive elementwise at both gate SFs, " +
    "contributions stay positive (bound soundness), and the curve actually differs " +
    "from the integer stand-in") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables.t(spark, dir, "documents")
      val wPos = wPosOf(docs)
      val (topk, _) = RetrievalOps.learnedSparseLogTopK(docs, wPos, k = 10, topB = 32, nBuckets = 8)
      val got = topk.collect().map(_.toString).toSeq
      assert(got.nonEmpty, s"$dir: empty result")
      val contrib = RetrievalOps.learnedSparseContrib(docs, wPos, logSaturation = true)
      contrib.collect().foreach { r =>
        assert(r.getDouble(3) > 0, s"non-positive log contribution breaks the bounds: $r")
      }
      // exhaustive twin under the SAME rounded-compare discipline
      val exhaustive = contrib
        .groupBy("query_id", "doc_id").agg(round(sum(col("c")), 4).as("score"))
        .select(col("query_id"),
          struct((-col("score")).as("ns"), col("doc_id"), col("score")).as("rec"))
        .groupBy("query_id")
        .agg(graft.functions.TopKAggregates.minK(col("rec"), 10).as("recs"))
        .select(col("query_id"), posexplode(col("recs")).as(Seq("pos", "rec")))
        .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
          col("rec.doc_id").as("doc_id"), col("rec.score").as("score"))
        .orderBy("query_id", "rank")
        .collect().map(_.toString).toSeq
      assert(got == exhaustive,
        s"$dir: bounded log evaluation drifted from exhaustive\ngot:  $got\nwant: $exhaustive")
      // ln(1+tf) is not min(tf,3)-shaped: at least one score is non-integer
      assert(topk.collect().exists(r => r.getDouble(3) != math.rint(r.getDouble(3))),
        s"$dir: every log-saturated score is integral — is the log curve actually applied?")
    }
  }
}
