package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** Quantifies (not just asserts) the LSH near-dup approximation against
  * the exact all-pairs kernel (`s05_neardup_exact`) on the overlapping
  * id range. Planes are fixed-seed and the data is static, so recall is
  * DETERMINISTIC — the default config's measured figure is pinned
  * exactly, and the recall-tuned config must clear a 0.8 floor,
  * demonstrating the (numTables, planesPerTable) amplification knob:
  * P(candidate | cos θ) = 1 - (1 - p^R)^L, p = 1 - θ/π.
  */
class SimilarityRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.filter("vec_a < 200 AND vec_b < 200")
      .select("vec_a", "vec_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  private lazy val exact = pairSet(graft.SparkEntry.queries("s05_neardup_exact")(spark, sfDir))
  private lazy val emb = Tables.t(spark, sfDir, "embeddings")

  test("default 4x4 LSH config: measured recall pinned (candidate-volume-biased by design)") {
    assert(exact.size == 8) // the exact kernel's ground truth on this corpus
    val lsh = pairSet(SimilarityOps.neardupPairs(emb, threshold = 0.4))
    assert(lsh.subsetOf(exact), "LSH must never emit a pair the exact kernel rejects (no false positives post-rerank)")
    // ~0.45-cosine regime: theory gives ~0.54 expected recall for 4x4;
    // this corpus + seed lands on exactly 3/8. A plane/seed/config change
    // that moves recall shows up here, not silently in production.
    assert(lsh.intersect(exact).size == 3, s"default-config recall drifted: ${lsh.intersect(exact).size}/8")
  }

  test("recall-tuned 8x3 config clears the 0.8 recall floor on the same corpus") {
    val lsh = pairSet(SimilarityOps.neardupPairs(emb, threshold = 0.4, numTables = 8, planesPerTable = 3))
    assert(lsh.subsetOf(exact))
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"tuned recall $recall < 0.8")
  }

  test("s12 MMR: rank 0 is pure relevance, the diversity term reorders the tail, selection is pinned") {
    val rows = graft.SparkEntry.queries("s12_mmr_diversity")(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 until 5))
    assert(rows.head.getDouble(3) == 0.0, "rank 0 has no prior to be similar to")
    // deterministic pinned selection on this corpus (sf0.001 embeddings)
    assert(rows.map(_.getLong(1)).toSeq == Seq(17L, 299L, 402L, 12L, 225L),
      s"selection drifted: ${rows.map(_.getLong(1)).toSeq}")
    // the diversity term must actually reorder: pure top-5 by relevance
    // differs from the MMR pick (rank 0 agrees — it IS pure relevance)
    val top5 = SimilarityOps.cosineTopK(emb, queryId = 0L, k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(rows.head.getLong(1) == top5.head)
    assert(rows.map(_.getLong(1)).toSeq != top5, s"MMR degenerated to pure top-k: $top5")
    val again = graft.SparkEntry.queries("s12_mmr_diversity")(spark, sfDir).collect()
    assert(again.map(_.getLong(1)).toSeq == rows.map(_.getLong(1)).toSeq)
  }

  test("s24 streaming-upsert soundness row is pinned (exact scores, top-100 containment, recall >= 5)") {
    // IndexStreamsSpec pins the mechanics (prune, replay-idempotency,
    // drift metric); this pins the END RESULT the oracle hashes: the
    // live index built 80%-batch/20%-stream answers query 0 with zero
    // score mismatches, full top-100 containment, and recall@10 over
    // the floor (measured 7/10 at sf0.001, 6/10 at sf0.01 — the
    // 80%-train nprobe=6 ceiling; see the s24 entry comment).
    val row = graft.SparkEntry.queries("s24_stream_ivf_upsert")(spark, sfDir).collect()(0)
    assert(row.getLong(0) == 10L, s"n_returned ${row.getLong(0)}")
    assert(row.getLong(1) == 0L, s"n_score_mismatch ${row.getLong(1)}")
    assert(row.getLong(2) == 0L, s"n_outside_topn ${row.getLong(2)}")
    assert(row.getBoolean(3), "recall_ok flipped false")
  }

  test("s11 semdedup: one row per vector, drops only above threshold, lowest id per cluster always kept") {
    val rows = graft.SparkEntry.queries("s11_semdedup")(spark, sfDir).collect()
    assert(rows.length == emb.count())
    val dropped = rows.filterNot(_.getBoolean(3))
    assert(dropped.nonEmpty, "the corpus's near-dup vectors must trigger drops")
    dropped.foreach(r => assert(r.getDouble(2) > 0.4, s"dropped ${r.getLong(0)} with max_cos ${r.getDouble(2)}"))
    // each cluster's lowest vec_id has no lower clustermate: max_cos = -1, always kept
    rows.groupBy(_.getLong(1)).foreach { case (_, members) =>
      val first = members.minBy(_.getLong(0))
      assert(first.getDouble(2) == -1.0 && first.getBoolean(3))
    }
  }
}
