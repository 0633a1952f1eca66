package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TextOps.setSimilarityJoin]]: the prefix filter must be LOSSLESS —
  * the filtered join returns exactly the brute-force all-pairs answer.
  */
class SetSimJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def brute(threshold: Double, width: Int) = {
    val tok = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
      .where(size(col("t")) >= width)
      .select(
        col("doc_id"),
        array_distinct(
          expr(s"transform(sequence(1, size(t) - ${width - 1}), i -> concat_ws(' ', slice(t, i, $width)))")
        ).as("s")
      )
    tok.as("a")
      .join(tok.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        round(
          size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
            size(array_union(col("a.s"), col("b.s"))),
          4
        ).as("jaccard")
      )
      .where(col("jaccard") >= threshold)
  }

  test("prefix-filtered join equals brute-force all-pairs at sf0.001 (t=0.5, w=5)") {
    val fast = TextOps.setSimilarityJoin(Tables.t(spark, sfDir, "documents"), 5, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val slow = brute(0.5, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(slow.nonEmpty, "fixture should contain near-dup pairs")
    assert(fast === slow)
  }

  test("a lower threshold still matches brute force (more candidates survive the prefix)") {
    val fast = TextOps.setSimilarityJoin(Tables.t(spark, sfDir, "documents"), 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val slow = brute(0.3, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast === slow)
  }

  test("positional filter stays lossless on a boilerplate-heavy corpus " +
    "(template shingles inside prefixes, true similarity below threshold)") {
    import spark.implicits._
    // 60 docs, each ~55% one shared template + 45% own words: the
    // template shingles flood every doc's t=0.5 prefix (the dupskew
    // fixture's adversarial band) while true pairwise J stays ~0.38 —
    // the exact case the early/late split + positional bound prune.
    // The join must still return precisely the brute-force answer.
    val vocab = "alpha beta gamma delta eps zeta eta theta iota kappa".split(" ")
    val template = (0 until 24).map(i => vocab(i * 7 % vocab.length)).mkString(" ")
    val docs = (0L until 60L).map { id =>
      val rnd = new scala.util.Random(id)
      val own = (0 until 20).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      (id, s"$template $own")
    }.toDF("doc_id", "text")
    val fast = TextOps.setSimilarityJoin(docs, 5, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val tok = docs
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
      .select(col("doc_id"), array_distinct(
        expr(s"transform(sequence(1, size(t) - 4), i -> concat_ws(' ', slice(t, i, 5)))")).as("s"))
    val slow = tok.as("a")
      .join(tok.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(size(array_intersect(col("a.s"), col("b.s"))).cast("double") /
          size(array_union(col("a.s"), col("b.s"))), 4).as("jaccard"))
      .where(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast === slow)
  }

  test("plan has no cartesian product or nested-loop join") {
    // materialize=false: the default localCheckpoint would truncate the
    // lineage and hide the join plan under inspection here.
    val p = TextOps.setSimilarityJoin(Tables.t(spark, sfDir, "documents"), 5, 0.5, materialize = false)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
