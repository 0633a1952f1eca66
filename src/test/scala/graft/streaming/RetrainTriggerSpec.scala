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

  // ---- the RECALL CANARY rung ([[IndexStreams.upsertBatchWithCanary]]):
  // the trigger for the drift class the fit metric provably misses ------

  /** `copies` jittered clones of each anchor vector (sign-flipped for
    * the antipodal wave) — the s44 clique shape: a drifted neighborhood
    * arriving TOGETHER, deterministic down to the sin-based jitter.
    */
  private def jitteredCliques(srcIds: Seq[Long], offset: Long, copies: Int,
      anti: Boolean): org.apache.spark.sql.DataFrame = {
    val sgn = if (anti) "-" else ""
    (0 until copies).map { j =>
      emb.filter(col("vec_id").isin(srcIds.map(x => x: Any): _*))
        .select((col("vec_id") * 100 + j + offset).as("vec_id"),
          expr(s"transform(embedding, (x, i) -> cast($sgn(x + 0.02 * " +
            s"sin(cast(vec_id * 7 + i * 13 + $j * 37 AS DOUBLE))) as float))")
            .as("embedding"))
    }.reduce(_ unionByName _)
  }

  test("canary rung: the antipodal clique wave — ABOVE the fit floor, so the fit rung " +
    "is provably blind to it — triggers exactly ONE retrain via recall; in-distribution " +
    "cliques pass; replay cannot double-retrain") {
    import spark.implicits._
    // corpus WITH trained-in cliques (k-means must model neighborhood
    // structure for serving recall to be meaningful — on a purely
    // isotropic corpus every probe depth is equally blind and the wave
    // has nothing to scatter)
    val anchors = (0L until 20L).map(_ * 10 + 5)
    val corpus = emb.select("vec_id", "embedding")
      .unionByName(jitteredCliques(anchors, 1000000L, 5, anti = false))
    val dir = Files.createTempDirectory("canary-trigger").toString
    try {
      IvfIndex.build(corpus, dir, k = 16, iters = 3)
      val fitFloor = 0.1 // the fit rung's floor from the tests above
      val canaryFloor = 0.85 // between measured in-dist 1.0 and wave 0.7
      // batch 0: NEW in-distribution cliques (fresh jitters of trained
      // anchors) — canary reads 1.0 (measured), no flip
      val r0 = IndexStreams.upsertBatchWithCanary(
        jitteredCliques(anchors.take(8), 2000000L, 5, anti = false), 0L, dir,
        recallFloor = canaryFloor, retrainK = 16, nCanary = 8,
        nprobeServe = 2, nprobeRef = 16)
      assert(!r0 && IvfIndex.readLiveState(spark, dir).gen == 0L,
        "in-distribution cliques must not trigger the canary")
      // batch 1: the ANTIPODAL wave (whole cliques arriving sign-flipped)
      val r1 = IndexStreams.upsertBatchWithCanary(
        jitteredCliques(anchors.drop(8).take(8), 3000000L, 5, anti = true), 1L, dir,
        recallFloor = canaryFloor, retrainK = 16, nCanary = 8,
        nprobeServe = 2, nprobeRef = 16)
      assert(r1, "the wave must trigger the canary retrain")
      val st1 = IvfIndex.readLiveState(spark, dir)
      assert(st1.gen == 1L && st1.consumedThrough == 1L, s"unexpected state $st1")
      // the FIT metric on the triggering batch sat ABOVE the fit floor
      // (the wave assigns at in-distribution fit — this is the measured
      // blindness the canary exists for; if this assertion ever fails
      // the fit rung started seeing the wave and the canary's reason-
      // to-exist must be re-measured)
      val fitLogged = IndexStreams.readUpsertLog(spark, dir)
        .filter(col("batch") === 1).head().getDouble(2)
      assert(fitLogged > fitFloor,
        s"wave fit $fitLogged under the fit floor — the fit rung would have caught it")
      // and the canary log shows the recall collapse
      val canaryLogged = IndexStreams.readCanaryLog(spark, dir)
        .filter(col("batch") === 1).head().getDouble(2)
      assert(canaryLogged < canaryFloor,
        s"canary recall $canaryLogged not under the floor — what triggered?")
      // REPLAY of the triggering epoch: idempotent rows, no second flip
      val r1b = IndexStreams.upsertBatchWithCanary(
        jitteredCliques(anchors.drop(8).take(8), 3000000L, 5, anti = true), 1L, dir,
        recallFloor = canaryFloor, retrainK = 16, nCanary = 8,
        nprobeServe = 2, nprobeRef = 16)
      assert(!r1b && IvfIndex.readLiveState(spark, dir) == st1,
        "replayed epoch double-retrained via the canary")
    } finally rm(dir)
  }
}
