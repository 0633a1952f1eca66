package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Range search (s43): the cell-bound prune is LOSSLESS (results equal
  * the brute-force threshold scan at every tau, including the empty
  * one), the bound itself is sound for every member, pruning actually
  * bites at selective taus with the partition prune visible in-plan,
  * the radii sidecar is required loudly, and the query is
  * deterministic.
  */
class IvfRangeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val emb = Tables.t(spark, sfDir, "embeddings")

  private def withIndex[A](body: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("ivf-range").toString
    try {
      IvfIndex.build(emb, dir, k = 16, iters = 2)
      IvfIndex.saveCellRadii(spark, dir)
      body(dir)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  private def qe(id: Long): Array[Float] = {
    import spark.implicits._
    emb.filter(col("vec_id") === id).select("embedding").as[Array[Float]].head()
  }

  private def brute(q: Array[Float], tau: Double, excludeId: Long): Seq[(Long, Double)] = {
    import graft.functions.VectorFunctions.cosine_similarity
    emb.filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"),
        round(cosine_similarity(col("embedding"), array(q.toSeq.map(lit): _*)), 6).as("c"))
      .filter(col("c") >= tau)
      .orderBy(col("c").desc, col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("lossless at every tau (a populated set, a sparse set, the empty set), " +
    "pruning bites at selective taus with the partition prune in-plan, deterministic") {
    withIndex { dir =>
      val q = qe(0L)
      Seq(0.15, 0.3, 0.9).foreach { tau =>
        val got = IvfIndex.rangeSearchIndex(spark, dir, q, tau, excludeId = Some(0L))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(got == brute(q, tau, 0L),
          s"tau=$tau: pruned range search drifted from brute force")
      }
      // the plan carries the kept-cell set as a partition filter
      val plan = IvfIndex.rangeSearchIndex(spark, dir, q, 0.3, Some(0L))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"), s"no partition prune in the plan:\n$plan")
      val again = IvfIndex.rangeSearchIndex(spark, dir, q, 0.2, Some(0L)).collect().toSeq
      assert(again == IvfIndex.rangeSearchIndex(spark, dir, q, 0.2, Some(0L)).collect().toSeq,
        "range search must be deterministic")
    }
  }

  test("on tightly-clustered geometry the bound BITES — most cells pruned, the " +
    "non-empty result still exactly the brute-force scan") {
    // the parquet fixture's cells are nearly hemispherical (radii
    // ~80 degrees — k-means on diffuse 64-dim data), so its exact
    // range answers genuinely need every cell; the prune's payoff case
    // is CLUSTERED geometry, planted here: 4 tight cones around
    // orthogonal axes, query inside cone 0
    import spark.implicits._
    import graft.functions.VectorFunctions.cosine_similarity
    def jit(axis: Int, i: Int): Seq[Float] = {
      val v = Array.fill(8)(0.0f)
      v(axis) = 1.0f
      (0 until 8).foreach { d => v(d) = v(d) + 0.05f * (((i * 8 + d) % 7) - 3) / 3.0f }
      v.toSeq
    }
    val synth = (0 until 200).map(i => (i.toLong, jit(i % 4, i))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("ivf-range-tight").toString
    try {
      IvfIndex.build(synth, dir, k = 8, iters = 2)
      IvfIndex.saveCellRadii(spark, dir)
      val q = synth.filter(col("vec_id") === 0L).select("embedding")
        .as[Array[Float]].head()
      val cents = IvfIndex.loadCentroids(spark, dir)
      val radii = spark.read.parquet(s"$dir/radii")
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val kept = IvfIndex.rangeKeptCells(cents, radii, q, tau = 0.8)
      assert(kept.size < cents.size,
        s"tau=0.8 kept all ${cents.size} cells on tight clusters — the bound never bit")
      val got = IvfIndex.rangeSearchIndex(spark, dir, q, 0.8, Some(0L))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = synth.filter(col("vec_id") =!= 0L)
        .select(col("vec_id"),
          round(cosine_similarity(col("embedding"), array(q.toSeq.map(lit): _*)), 6).as("c"))
        .filter(col("c") >= 0.8)
        .orderBy(col("c").desc, col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(want.nonEmpty, "fixture sanity: cone 0 must hold qualifying neighbours")
      assert(got == want, s"pruned range search drifted on tight clusters\ngot:  $got\nwant: $want")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("the angular bound is sound for every member of every cell") {
    withIndex { dir =>
      val q = qe(0L)
      val cents = IvfIndex.loadCentroids(spark, dir)
      val radii = spark.read.parquet(s"$dir/radii")
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val bounds: Map[Int, Double] = cents.map { case (c, v) =>
        val thetaQC = math.acos(math.max(-1.0, math.min(1.0, NswIndex.cos(v, q))))
        c -> math.cos(math.max(0.0, thetaQC - radii(c)))
      }.toMap
      import spark.implicits._
      val members = spark.read.parquet(s"$dir/assignment")
        .select(col("cluster").cast("int"), col("vec_id"), col("embedding"))
        .as[(Int, Long, Array[Float])].collect()
      members.foreach { case (c, id, v) =>
        val cos = NswIndex.cos(v, q)
        assert(cos <= bounds(c) + 1e-9,
          s"member $id of cell $c has cos $cos above the cell bound ${bounds(c)}")
      }
    }
  }

  test("a missing radii sidecar fails loudly naming the remedy") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-range-noradii").toString
    try {
      IvfIndex.build(emb, dir, k = 16, iters = 2)
      val e = intercept[IllegalArgumentException] {
        IvfIndex.rangeSearchIndex(spark, dir, qe(0L), 0.3)
      }
      assert(e.getMessage.contains("saveCellRadii"), e.getMessage)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
