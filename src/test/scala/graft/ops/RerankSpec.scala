package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[RetrievalOps.rerankCandidates]] + [[RetrievalOps.denseLogregFit]]
  * (r19) — the learned reranker closing the retrieval loop:
  *
  *  1. the fit is deterministic (re-running over the same candidates
  *     reproduces identical weight snapshots — the replay-idempotency
  *     the oracle's unrolled CTE stages rely on);
  *  2. the model LEARNS the label's own signal: the phrase rule is
  *     term-adjacency, so the query-term-overlap weight must come out
  *     positive at both gate SFs (the honest learning claim on this
  *     fixture — other signals may legitimately anti-correlate);
  *  3. the reranked order actually differs from the RRF order for at
  *     least one query (a reranker that reproduces its input ranking
  *     is dead weight);
  *  4. a degenerate training frame (no positives) fails loudly.
  */
class RerankSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("fit determinism, learned overlap signal, and a moved ranking at both gate SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val feat = RetrievalOps.rerankCandidates(spark, dir).localCheckpoint()
      val h1 = RetrievalOps.denseLogregFit(feat)
      val h2 = RetrievalOps.denseLogregFit(feat)
      assert(h1.length === 3 && h1.forall(_.length === 5))
      assert(h1.map(_.toSeq).toSeq === h2.map(_.toSeq).toSeq, s"$dir: fit not deterministic")
      assert(h1.last.exists(_ != 0L), s"$dir: descent never moved the weights")
      assert(h1.last(3) > 0L,
        s"$dir: overlap weight ${h1.last(3)} — the phrase label's own feature must be learned")

      val reranked = graft.SparkEntry.queries("r19_learned_rerank")(spark, dir)
        .select("query_id", "rank", "doc_id")
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      // RRF order over the same candidates (the pre-reranker ranking;
      // f3 is the quantized RRF mass, monotone in it)
      val rrf = RetrievalOps.rerankCandidates(spark, dir)
        .select(col("query_id"),
          struct((-col("f3")).as("nk"), col("doc_id")).as("rec"))
        .groupBy("query_id")
        .agg(graft.functions.TopKAggregates.minK(col("rec"), 5).as("recs"))
        .select(col("query_id"), posexplode(col("recs")).as(Seq("pos", "rec")))
        .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
          col("rec.doc_id").as("doc_id"))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(reranked.keys == rrf.keys)
      assert(reranked.exists { case (k, d) => rrf(k) != d },
        s"$dir: the learned reranker reproduced the RRF order exactly")
    }
  }

  test("a training frame with no positives fails loudly") {
    import spark.implicits._
    val degenerate = Seq((1L, 1L, 10L, 10L, 10L, 10L, 10000L, 0))
      .toDF("query_id", "doc_id", "f1", "f2", "f3", "f4", "f5", "y")
    val e = intercept[IllegalArgumentException] {
      RetrievalOps.denseLogregFit(degenerate)
    }
    assert(e.getMessage.contains("degenerate"), e.getMessage)
  }
}
