package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval-evaluation metrics (r16): internal consistency of the
  * emitted rows (hits reconcile across precision and recall, the
  * zero-relevant query zeroes every guard), the nDCG fold's defining
  * identities (perfect ranking = 1.0, earlier relevant = higher), and
  * determinism. The exact arithmetic is oracle-replayed by DuckDB;
  * these pin the SEMANTICS the arithmetic is supposed to carry.
  */
class RetrievalMetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def rows() = graft.SparkEntry.queries("r16_retrieval_metrics")(spark, sfDir)
    .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("n_rel"),
      r.getAs[Double]("p_at10"), r.getAs[Double]("recall_at10"),
      r.getAs[Double]("mrr"), r.getAs[Double]("ndcg_at10"))).toSeq

  test("metric rows are internally consistent, the zero-relevant query zeroes " +
    "every guard, and the query is deterministic") {
    val got = rows()
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L))
    got.foreach { case (qid, nRel, p, rec, mrr, ndcg) =>
      assert(p >= 0 && p <= 1 && rec >= 0 && rec <= 1 && mrr >= 0 && mrr <= 1 &&
        ndcg >= 0 && ndcg <= 1, s"q$qid metrics out of [0,1]")
      val hits = math.round(p * 10)
      if (nRel > 0)
        assert(rec == BigDecimal(hits.toDouble / nRel)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          s"q$qid: recall $rec does not reconcile with hits $hits / n_rel $nRel")
      if (mrr > 0)
        // mrr is round(1/rank, 6): inverting the 6dp value recovers the
        // integer rank to well under 1e-3 for any rank <= 20
        assert(math.abs(1.0 / mrr - math.round(1.0 / mrr)) < 1e-3,
          s"q$qid: mrr $mrr is not 1/rank for an integer rank")
    }
    val q4 = got.find(_._1 == 4L).get
    assert(q4._2 == 0 && q4._3 == 0.0 && q4._4 == 0.0 && q4._5 == 0.0 && q4._6 == 0.0,
      s"query 4 (no phrase matches by construction) must zero every metric: $q4")
    assert(got.exists(_._2 > 0), "fixture sanity: some query must have relevant docs")
    assert(rows() == got, "r16 must be deterministic")
  }

  test("the nDCG fold: a perfect ranking scores exactly 1.0 and moving a " +
    "relevant doc earlier strictly raises the score") {
    def ndcg(relRanks: Seq[Int], nRel: Int): Double = {
      val df = spark.sql(
        s"""SELECT round(
           |  aggregate(array(${relRanks.mkString(",")}), 0D, (acc, r) -> acc + 1D / ln(r + 1)) /
           |  aggregate(sequence(1, ${math.min(nRel, 10)}), 0D, (acc, i) -> acc + 1D / ln(i + 1)),
           |  6) AS n""".stripMargin)
      df.head().getDouble(0)
    }
    assert(ndcg(Seq(1, 2, 3), 3) == 1.0, "relevant at ranks 1..n_rel must score 1.0")
    assert(ndcg(Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10), 10) == 1.0)
    val worse = ndcg(Seq(5, 9), 2)
    val better = ndcg(Seq(2, 9), 2)
    assert(better > worse, s"earlier relevant must raise nDCG: $better !> $worse")
    assert(ndcg(Seq(10), 2) > 0.0 && ndcg(Seq(10), 2) < 1.0)
  }
}
