package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** [[RetrievalOps.maxScoreTopK]] — bounded evaluation must be an
  * OPTIMIZATION, never an approximation:
  *
  *  1. the top-10 equals r02's exhaustive answer ELEMENTWISE (query,
  *     rank, doc, score) at both gate SFs;
  *  2. equality survives adversarial knobs — a tiny threshold sample
  *     and the coarsest blocks change how much is skipped, never what
  *     is returned;
  *  3. the skipping actually bites (nonzero skipped fraction on at
  *     least one query) — a prune that never fires is untested code.
  */
class MaxScoreSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

  test("identical to the exhaustive scorer at both gate SFs, and the skip fires") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables.t(spark, dir, "documents")
      val exhaustive = rows(graft.SparkEntry.queries("r02_bm25_topk")(spark, dir))
      val (topk, stats) = RetrievalOps.maxScoreTopK(docs, k = 10)
      assert(rows(topk) === exhaustive, s"$dir: bounded evaluation changed the answer")
      val skipFracs = stats.collect().map(r => r.getAs[Double]("skip_frac"))
      info(s"$dir skip fractions: ${skipFracs.mkString(", ")}")
      assert(skipFracs.exists(_ > 0.0), s"$dir: the block skip never fired")
      assert(skipFracs.forall(f => f >= 0.0 && f < 1.0))
    }
  }

  test("adversarial knobs change the skipped volume, never the answer") {
    val dir = "/root/testdata/sf0.01"
    val docs = Tables.t(spark, dir, "documents")
    val baseline = rows(RetrievalOps.maxScoreTopK(docs, k = 10)._1)
    for ((topB, nBuckets) <- Seq((10, 2), (64, 16), (12, 4))) {
      val (topk, _) = RetrievalOps.maxScoreTopK(docs, k = 10, topB = topB, nBuckets = nBuckets)
      assert(rows(topk) === baseline, s"topB=$topB nBuckets=$nBuckets changed the answer")
    }
  }
}
