package graft.ops

import graft.SparkSpec
import graft.streaming.IndexStreams
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[IvfIndex.rangeSearchIndexLive]] — the range query over a churning
  * index. Contracts:
  *
  *  1. LOSSLESS over the live view: at every swept tau the result
  *     equals the brute-force threshold scan over (base ∪ channel,
  *     LWW, − tombstones) exactly — including the permissive tau where
  *     the prune keeps everything;
  *  2. LWW-before-threshold: an id re-upserted with a MOVED embedding
  *     is judged by the latest version (the negated re-upsert of id 1
  *     serves the negated cosine, and its old base/pending rows never
  *     leak);
  *  3. the STATIC [[IvfIndex.rangeSearchIndex]] fails loudly on a
  *     churning index instead of silently ignoring the channels, and
  *     serves again after compaction + a radii refresh.
  */
class RangeLiveSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def churned(): (String, Array[Float], Map[Long, Array[Float]]) = {
    import spark.implicits._
    val emb = Tables.t(spark, sfDir, "embeddings")
    val idxDir = Files.createTempDirectory("graft-range-live-spec").toString
    IvfIndex.build(emb.filter(col("vec_id") >= 100), idxDir, k = 16, iters = 2)
    IvfIndex.saveCellRadii(spark, idxDir)
    val cents = IvfIndex.loadCentroids(spark, idxDir)
    IndexStreams.upsertBatch(emb.filter(col("vec_id") < 50), 0L, idxDir, cents)
    IndexStreams.upsertBatch(
      emb.filter(col("vec_id") >= 50 && col("vec_id") < 100), 1L, idxDir, cents)
    IndexStreams.tombstoneBatch(spark, Seq(1L, 2L, 3L, 105L), 2L, idxDir)
    IndexStreams.upsertBatch(emb.filter(col("vec_id") === 1L)
      .select(col("vec_id"), expr("transform(embedding, x -> -x)").as("embedding")),
      3L, idxDir, cents)
    val all = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val live = (all -- Seq(2L, 3L, 105L)).map {
      case (1L, v) => 1L -> v.map(x => -x)
      case kv => kv
    }
    (idxDir, all(0L), live)
  }

  test("lossless at every tau over the live view; LWW judges the moved re-upsert") {
    val (idxDir, qe, live) = churned()
    val expectAll = live.view.filterKeys(_ != 0L)
      .map { case (id, v) => id -> math.round(cosine(v, qe) * 1e6) / 1e6 }.toMap
    for (tau <- Seq(-1.0, 0.0, 0.15, 0.25, 0.4)) {
      val got = IvfIndex.rangeSearchIndexLive(spark, idxDir, qe, tau, excludeId = Some(0L))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val expect = expectAll.filter(_._2 >= tau)
      assert(got === expect, s"tau=$tau: live range diverged from brute force")
    }
    // the moved re-upsert: id 1 appears iff its NEGATED cosine clears tau
    val c1 = expectAll(1L)
    val tauBetween = c1 - 0.01
    val got = IvfIndex.rangeSearchIndexLive(spark, idxDir, qe, tauBetween, excludeId = Some(0L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.get(1L).contains(c1), s"id 1 must serve the re-upserted (negated) cosine $c1, got ${got.get(1L)}")
    new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(idxDir), true)
  }

  test("the static range search fails loudly under churn and serves again after compaction") {
    val (idxDir, qe, live) = churned()
    val e = intercept[IllegalArgumentException] {
      IvfIndex.rangeSearchIndex(spark, idxDir, qe, 0.2, excludeId = Some(0L))
    }
    assert(e.getMessage.contains("unconsumed") && e.getMessage.contains("rangeSearchIndexLive"),
      e.getMessage)
    IvfIndex.compactLiveIndex(spark, idxDir)
    IvfIndex.saveCellRadii(spark, idxDir) // radii must describe the compacted base
    val got = IvfIndex.rangeSearchIndex(spark, idxDir, qe, 0.2, excludeId = Some(0L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expect = live.view.filterKeys(_ != 0L)
      .map { case (id, v) => id -> math.round(cosine(v, qe) * 1e6) / 1e6 }
      .filter(_._2 >= 0.2).toMap
    assert(got === expect, "post-compaction static range diverged from the live view")
    new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(idxDir), true)
  }
}
