package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[IvfIndex.probeCellsRadiusAware]] — probe ranking by the
  * best-possible-member bound cos(max(0, θ(q,c) − r_c)). Contracts:
  *
  *  1. MECHANISM (pure function, synthetic geometry): a far-centroid
  *     cell with a WIDE radius outranks a nearer-centroid cell with a
  *     tight one — exactly the reorder centroid-cosine ranking cannot
  *     express; with UNIFORM radii the ranking equals centroid order
  *     (the measured no-op on isotropic corpora, now pinned);
  *  2. index plumbing: searchIndex(radiusAware = true) fails loudly
  *     without the generation's radii sidecar, and returns exact
  *     scores over its probed cells when the sidecar exists;
  *  3. the s47 soundness rows hold at both gate SFs.
  */
class RadiusProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  // 2-D unit vectors by angle keep every bound hand-checkable
  private def v(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("a wide far cell outranks a tight near cell; uniform radii reduce to centroid order") {
    val cents: IvfIndex.Centroids = Array(0 -> v(20), 1 -> v(60))
    val q = v(0)
    // tight near cell (r=5°) vs wide far cell (r=55°): best possible
    // member of cell 1 sits at 60−55=5° from q, beating cell 0's 15°
    val hetero = Map(0 -> math.toRadians(5), 1 -> math.toRadians(55))
    assert(IvfIndex.probeCellsRadiusAware(cents, hetero, q, 2) == Seq(1, 0))
    // centroid order says the opposite
    assert(IvfIndex.probeCells(cents, q, 2) == Seq(0, 1))
    // uniform radii: the bound is a monotone transform of centroid
    // angle, so the ranking IS centroid order
    val uniform = Map(0 -> math.toRadians(30), 1 -> math.toRadians(30))
    assert(IvfIndex.probeCellsRadiusAware(cents, uniform, q, 2) ==
      IvfIndex.probeCells(cents, q, 2))
  }

  test("radius-aware searchIndex requires the sidecar, then returns exact scores") {
    import spark.implicits._
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("radius-probe").toString
    IvfIndex.build(emb, dir, k = 16, iters = 2)
    val qe = emb.filter(col("vec_id") === 0L).select("embedding").as[Array[Float]].head()
    val ex = intercept[IllegalArgumentException] {
      IvfIndex.searchIndex(spark, dir, qe, k = 10, nprobe = 4,
        excludeId = Some(0L), radiusAware = true).collect()
    }
    assert(ex.getMessage.contains("radii sidecar"), ex.getMessage)
    IvfIndex.saveCellRadii(spark, dir)
    val got = IvfIndex.searchIndex(spark, dir, qe, k = 10, nprobe = 4,
      excludeId = Some(0L), radiusAware = true).collect()
    assert(got.length == 10)
    // scores are exact rounded cosines — spot-check the top row against
    // a brute-force recomputation
    val top = got.head
    val exact = emb.filter(col("vec_id") === top.getLong(0))
      .select(round(graft.functions.VectorFunctions.cosine_similarity(
        col("embedding"), array(qe.toSeq.map(lit): _*)), 6))
      .head().getDouble(0)
    assert(top.getDouble(1) == exact)
  }

  test("s47 soundness rows hold at both gate SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = graft.SparkEntry.queries("s47_radius_probe")(spark, dir).collect()
      assert(rows.length === 2, s"$dir: one row per selector")
      rows.foreach { r =>
        assert(r.getAs[Long]("n_returned") === 10L, s"$dir $r")
        assert(r.getAs[Long]("n_score_mismatch") === 0L, s"$dir $r")
        assert(r.getAs[Long]("n_outside_topn") === 0L, s"$dir $r")
        assert(r.getAs[Boolean]("recall_ok"), s"$dir $r")
      }
    }
  }
}
