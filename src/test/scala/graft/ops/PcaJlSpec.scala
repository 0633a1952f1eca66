package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavior pins for the two linear-algebra projections: power-iteration
  * PCA must actually find a maximal-variance direction (not merely
  * match its own replay oracle), and the JL sign projection must
  * preserve pairwise distances within the theoretical distortion band
  * for k=16 on this corpus — both checks are about the MATH being
  * right, complementing the exact-oracle gate which checks the
  * ARITHMETIC is reproducible.
  */
class PcaJlSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("s21: PC1 captures at least as much variance as every raw coordinate axis") {
    val scores = graft.SparkEntry.queries("s21_pca_power")(spark, sfDir)
    val pcVar = scores.agg(var_samp(col("pc1_score"))).head().getDouble(0)
    // variance along each of the 64 raw axes (the trivial candidate
    // directions PC1 must dominate if the iteration converged)
    val axisVar = Tables.t(spark, sfDir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy("i").agg(var_samp(col("v").cast("double")).as("av"))
      .agg(max(col("av"))).head().getDouble(0)
    assert(pcVar >= axisVar * 0.999, // 0.1% slack: panel-trained PC applied to full table
      s"PC1 variance $pcVar below best single-axis variance $axisVar — power iteration failed")
  }

  test("s20: every pair's JL distance ratio sits inside the k=16 distortion band") {
    val ratios = graft.SparkEntry.queries("s20_jl_projection")(spark, sfDir)
      .select("jl_ratio").collect().map(_.getDouble(0))
    assert(ratios.nonEmpty)
    // JL with k=16: P(|ratio-1| > eps) ~ 2exp(-k eps^2/8); eps=1.5 puts
    // the per-pair failure odds ~2e-3 — 780 deterministic pairs on this
    // fixed corpus measure well inside (empirically [0.3, 2.3])
    assert(ratios.forall(r => r > 0.1 && r < 3.0),
      s"JL distortion outside any plausible band: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.25,
      s"mean distance ratio $mean far from the unbiased-estimator 1.0")
  }
}
