package graft.streaming

import graft.SparkSpec
import graft.ops.{IvfIndex, Tables}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming retrain policy rung
  * ([[IndexStreams.upsertBatchWithRetrain]] /
  * [[IndexStreams.streamingIvfUpsertWithRetrain]]): a micro-batch whose
  * drift metric (mean cos-to-assigned-centroid) falls below the floor
  * triggers exactly ONE retrainLiveIndex inside the loop. Pinned:
  *
  *  1. a drifted stream triggers exactly one retrain: in-distribution
  *     batches pass (no flip), the low-fit batch flips to gen 1, the
  *     next in-distribution batch assigns under the NEW geometry and
  *     does not flip again;
  *  2. serving continuity across the flip: searches answer correctly
  *     before, during (old gen until the marker), and after;
  *  3. replayed epochs don't double-retrain: re-driving the triggering
  *     epoch re-lands its rows idempotently but the consumedThrough
  *     guard refuses a second flip;
  *  4. the metric's measured blindness: the s44 ANTIPODAL wave assigns
  *     at in-distribution fit (0.226 vs 0.222 measured) and must NOT
  *     trigger — the doc's "scheduled retrain or recall canary" caveat
  *     is a real boundary, so the spec pins it rather than hiding it.
  *
  * Drift fixture for the LOW-FIT class: vectors orthogonal to the
  * trained centroid span (Gram-Schmidt over the k=16 sidecar, then an
  * orthogonalized basis direction) — cos ≈ 0 to every centroid, the
  * "new embedding model / new modality" shape.
  */
class RetrainTriggerSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.t(spark, sfDir, "embeddings")

  private def rm(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

  /** A unit vector orthogonal to every centroid (Gram-Schmidt residual
    * of a standard basis direction against the centroid span).
    */
  private def orthogonalTo(cents: IvfIndex.Centroids, seed: Int): Array[Float] = {
    val dim = cents.head._2.length
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def normd(a: Array[Double]) = math.sqrt(dot(a, a))
    var basis = Vector.empty[Array[Double]]
    cents.map(_._2.map(_.toDouble)).foreach { c =>
      val r = c.clone()
      basis.foreach { b => val p = dot(r, b); (0 until dim).foreach(i => r(i) -= p * b(i)) }
      val n = normd(r)
      if (n > 1e-9) basis :+= r.map(_ / n)
    }
    val v = Array.tabulate(dim)(i => if (i == seed % dim) 1.0 else 0.0)
    basis.foreach { b => val p = dot(v, b); (0 until dim).foreach(i => v(i) -= p * b(i)) }
    val n = normd(v)
    require(n > 1e-6, s"basis direction $seed lies in the centroid span — pick another")
    v.map(x => (x / n).toFloat)
  }

  private def fixture(): (String, IvfIndex.Centroids) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("retrain-trigger").toString
    IvfIndex.build(emb.filter(col("vec_id") >= 100).select("vec_id", "embedding"),
      dir, k = 16, iters = 2)
    (dir, IvfIndex.loadCentroids(spark, dir))
  }

  private def orthoBatch(cents: IvfIndex.Centroids, n: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val u = orthogonalTo(cents, 0)
    val w = orthogonalTo(cents, 1)
    // n distinct unit vectors inside the orthogonal complement: cos to
    // every centroid is ~0 regardless of the mix
    (0 until n).map { j =>
      val t = j.toDouble / n
      val v = u.zip(w).map { case (a, b) => (a * (1 - t) + b * t).toFloat }
      val nn = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (1000000L + j, v.map(_ / nn).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("exactly one retrain: in-distribution passes, low-fit flips gen 1, the next " +
    "batch rides the new geometry; replay cannot double-retrain; serving continuous") {
    val (dir, cents0) = fixture()
    try {
      val floor = 0.1
      // batch 0: in-distribution — no flip
      val r0 = IndexStreams.upsertBatchWithRetrain(
        emb.filter(col("vec_id") < 50).select("vec_id", "embedding"), 0L, dir,
        driftFloor = floor, retrainK = 16)
      assert(!r0 && IvfIndex.readLiveState(spark, dir).gen == 0L,
        "in-distribution batch must not retrain")
      // batch 1: orthogonal-complement vectors — cos ~ 0 to every cell
      val ortho = orthoBatch(cents0, 40).localCheckpoint()
      val r1 = IndexStreams.upsertBatchWithRetrain(ortho, 1L, dir,
        driftFloor = floor, retrainK = 16)
      val st1 = IvfIndex.readLiveState(spark, dir)
      assert(r1, "low-fit batch must trigger the retrain")
      assert(st1.gen == 1L && st1.consumedThrough == 1L, s"unexpected state $st1")
      // drift log recorded the low fit
      val logged = IndexStreams.readUpsertLog(spark, dir)
        .filter(col("batch") === 1).head().getDouble(2)
      assert(logged < floor, s"logged drift $logged should be under the floor")
      // serving continuity: a drifted vector is findable AFTER the flip
      // (folded into gen 1 under retrained geometry)
      val q = ortho.head().getSeq[Float](1).toArray
      val got = IvfIndex.searchIndexLive(spark, dir, q, k = 5, nprobe = 16)
        .collect().map(_.getLong(0))
      assert(got.exists(_ >= 1000000L), s"drifted vectors not served post-flip: ${got.toSeq}")
      // REPLAY of the triggering epoch: rows re-land idempotently, no second flip
      val r1b = IndexStreams.upsertBatchWithRetrain(ortho, 1L, dir,
        driftFloor = floor, retrainK = 16)
      val st2 = IvfIndex.readLiveState(spark, dir)
      assert(!r1b && st2 == st1, s"replayed epoch double-retrained: $st2")
      // batch 2: in-distribution again — the retrained geometry fits it, no flip
      val r2 = IndexStreams.upsertBatchWithRetrain(
        emb.filter(col("vec_id") >= 50 && col("vec_id") < 100).select("vec_id", "embedding"),
        2L, dir, driftFloor = floor, retrainK = 16)
      assert(!r2 && IvfIndex.readLiveState(spark, dir).gen == 1L,
        "post-retrain in-distribution batch must not flip again")
    } finally rm(dir)
  }

  test("the wired stream drives the same policy end-to-end") {
    import spark.implicits._
    val (dir, cents0) = fixture()
    val drop = Files.createTempDirectory("retrain-trigger-drop").toString
    val ckpt = Files.createTempDirectory("retrain-trigger-ckpt").toString
    try {
      // two single-file appends -> two micro-batches (maxFilesPerTrigger
      // = 1): in-distribution first, the low-fit wave second
      emb.filter(col("vec_id") < 50).select(col("vec_id"), col("embedding"),
        lit(0).as("label")).coalesce(1).write.mode("append").parquet(drop)
      orthoBatch(cents0, 40).select(col("vec_id"), col("embedding"), lit(0).as("label"))
        .coalesce(1).write.mode("append").parquet(drop)
      val q = IndexStreams.streamingIvfUpsertWithRetrain(
        IndexStreams.readEmbeddingStream(spark, drop), dir, ckpt,
        driftFloor = 0.1, retrainK = 16).start()
      q.processAllAvailable()
      q.stop()
      val st = IvfIndex.readLiveState(spark, dir)
      assert(st.gen >= 1L, s"the drifted micro-batch never retrained: $st")
      assert(st.gen == 1L, s"more than one retrain fired: $st")
    } finally { rm(dir); rm(drop); rm(ckpt) }
  }

  test("measured boundary: the ANTIPODAL wave does NOT trigger (fit-blind drift class)") {
    val (dir, _) = fixture()
    try {
      val wave = emb.filter(col("vec_id") % 4 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          expr("transform(embedding, x -> -x)").as("embedding"))
      val r = IndexStreams.upsertBatchWithRetrain(wave, 0L, dir,
        driftFloor = 0.1, retrainK = 16)
      assert(!r && IvfIndex.readLiveState(spark, dir).gen == 0L,
        "antipodal drift is invisible to the fit metric BY DESIGN — if this now " +
          "triggers, the metric changed and the doc's boundary claim must be re-measured")
    } finally rm(dir)
  }
}
