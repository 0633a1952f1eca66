package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the PQ index: exact determinism (codebooks and codes
  * are pure functions of the corpus) and measured recall of the ADC
  * approximation against the exact cosine kernel — the honest check an
  * engine-specific (non-oracle-checkable) ANN variant needs.
  */
class PqRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("codebook and codes are deterministic across runs") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val cb1 = PqIndex.train(emb)
    val cb2 = PqIndex.train(emb)
    assert(cb1 == cb2)
    val c1 = PqIndex.encode(emb, cb1).collect().sortBy(_._1).map(r => (r._1, r._2)).toSeq
    val c2 = PqIndex.encode(emb, cb2).collect().sortBy(_._1).map(r => (r._1, r._2)).toSeq
    assert(c1 == c2)
  }

  test("codes compress: m small ints + a norm per vector, values within [0, k)") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val cb = PqIndex.train(emb)
    val rows = PqIndex.encode(emb, cb).collect()
    assert(rows.forall(_._2.size == cb.m))
    assert(rows.forall(_._2.forall(c => c >= 0 && c < cb.k)))
    assert(rows.forall(_._3 >= 0.0))
  }

  test("ADC recall@10 against the exact cosine kernel clears the measured floor") {
    import spark.implicits._
    val exact = SimilarityOps
      .cosineTopK(Tables.t(spark, sfDir, "embeddings"), queryId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val pq = PqIndex.pqTopK(spark, sfDir, queryId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact & pq).size / 10.0
    // This corpus is a LOW-similarity regime (top cosines ~0.5, neighbors
    // barely separated) — the hard case for any quantizer. The floor pins
    // the measured figure so a codebook/scoring regression fails loudly;
    // true near-neighbor corpora sit far higher.
    assert(recall >= 0.3, s"PQ recall@10 regressed: $recall (exact=$exact, pq=$pq)")
  }

  test("s17 rerank recovers what quantization lost: reranked recall strictly beats raw PQ") {
    import spark.implicits._
    val emb = Tables.t(spark, sfDir, "embeddings")
    val exact = SimilarityOps.cosineTopK(emb, queryId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val raw = PqIndex.pqTopK(spark, sfDir, queryId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    // the s17 stage-2: exact rerank of the 50-candidate pool
    val cands = PqIndex.pqTopK(spark, sfDir, queryId = 0L, k = 50)
      .select(col("vec_id").as("cand_id"))
    val reranked = SimilarityOps.exactRerank(emb, cands, queryId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val rawRecall = (exact & raw).size
    val rerankRecall = (exact & reranked).size
    assert(rerankRecall >= 9, s"reranked recall@10 regressed: $rerankRecall/10 (measured 9)")
    assert(rerankRecall > rawRecall,
      s"rerank must beat raw PQ on this corpus: rerank=$rerankRecall raw=$rawRecall")
    // and the s17 query entry's soundness row is all green
    val row = graft.SparkEntry.queries("s17_pq_rerank")(spark, sfDir).head()
    assert(row.getLong(row.fieldIndex("n_returned")) == 10L)
    assert(row.getLong(row.fieldIndex("n_score_mismatch")) == 0L)
    assert(row.getLong(row.fieldIndex("n_outside_topn")) == 0L)
    assert(row.getBoolean(row.fieldIndex("recall_ok")))
  }

  test("s18 IVF-PQ+refine: recall matches the IVF ceiling; soundness row all green") {
    import spark.implicits._
    val emb = Tables.t(spark, sfDir, "embeddings")
    val exact = SimilarityOps.cosineTopK(emb, queryId = 0L, k = 10)
      .select("vec_id").as[Long].collect().toSet
    // the composed index must not lose recall versus exact search of
    // the SAME probed cells (the IVF ceiling)
    val cents = IvfIndex.train(emb, k = 16, iters = 2)
    val ivfExact = IvfIndex.search(emb, cents, queryId = 0L, k = 10, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    val row = graft.SparkEntry.queries("s18_ivfpq_ann")(spark, sfDir).head()
    assert(row.getLong(row.fieldIndex("n_returned")) == 10L)
    assert(row.getLong(row.fieldIndex("n_score_mismatch")) == 0L)
    assert(row.getLong(row.fieldIndex("n_outside_topn")) == 0L)
    assert(row.getBoolean(row.fieldIndex("recall_ok")))
    val ivfCeiling = (exact & ivfExact).size
    assert(ivfCeiling >= 6, s"IVF probe ceiling collapsed: $ivfCeiling/10")
  }

  test("approximate scores correlate with exact cosine on the top ranks") {
    import spark.implicits._
    val emb = Tables.t(spark, sfDir, "embeddings")
    val cb = PqIndex.train(emb)
    val codes = PqIndex.encode(emb, cb).toDF("vec_id", "codes", "norm")
    val query = emb.filter(col("vec_id") === 0L).select("embedding").as[Array[Float]].head()
    val approx = PqIndex.searchAdc(codes, cb, query, excludeId = 0L, k = 50)
      .select("vec_id", "approx_cos").as[(Long, Double)].collect().toMap
    val exact = SimilarityOps.cosineTopK(emb, queryId = 0L, k = 50)
      .select("vec_id", "cos_sim").as[(Long, Double)].collect().toMap
    val common = approx.keySet & exact.keySet
    assert(common.nonEmpty)
    val errs = common.toSeq.map(id => math.abs(approx(id) - exact(id)))
    assert(errs.max < 0.5, s"ADC wildly off: max err ${errs.max}")
    assert(errs.sum / errs.size < 0.2, s"ADC mean err too high: ${errs.sum / errs.size}")
  }
}
