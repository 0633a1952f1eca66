package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[LakeLayout]] — the write-time z-order option: the kernel against a
  * reference interleave (including d > 2, which q105's inline
  * expression never exercises), and the end-to-end layout win on the
  * real corpus: the written table's per-file envelopes prune a
  * two-predicate box strictly better than the linear layout, with the
  * data itself untouched.
  */
class LakeLayoutSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("zvalue matches the q105 reference interleave at d=2 and generalizes to d=3") {
    import spark.implicits._
    def ref2(x: Long, y: Long): Long =
      (0 until 16).map(b => (((x >> b) & 1L) << (2 * b + 1)) | (((y >> b) & 1L) << (2 * b)))
        .reduce(_ | _)
    val cases2 = Seq((0L, 0L), (5L, 3L), (1L, 0L), (0L, 1L), (65535L, 65535L), (1023L, 512L))
    cases2.toDF("x", "y")
      .withColumn("z", LakeLayout.zvalue(Seq(col("x"), col("y")), 16))
      .collect().foreach { r =>
        val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(z == ref2(x, y), s"z($x,$y) = $z, reference ${ref2(x, y)}")
      }
    // d=3: bit b of dim i lands at 3b + (2 - i); first column most significant
    def ref3(x: Long, y: Long, w: Long): Long =
      (0 until 8).map(b =>
        (((x >> b) & 1L) << (3 * b + 2)) | (((y >> b) & 1L) << (3 * b + 1)) |
          (((w >> b) & 1L) << (3 * b))).reduce(_ | _)
    val cases3 = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (255L, 255L, 255L), (5L, 3L, 7L), (200L, 17L, 96L))
    cases3.toDF("x", "y", "w")
      .withColumn("z", LakeLayout.zvalue(Seq(col("x"), col("y"), col("w")), 8))
      .collect().foreach { r =>
        val (x, y, w, z) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        assert(z == ref3(x, y, w), s"z($x,$y,$w) = $z, reference ${ref3(x, y, w)}")
      }
  }

  private def q105Dims(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("n_chars").cast("long").as("x"),
      pmod(expr("CAST(conv(substr(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 8), 16, 10) AS BIGINT)"),
        lit(1024L)).as("y"))

  private def boxCandidates(path: String, xLo: Long, xHi: Long, yLo: Long, yHi: Long): (Long, Long) = {
    val r = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
        min(col("y")).as("y0"), max(col("y")).as("y1"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(!(col("x1") < xLo || col("x0") > xHi || col("y1") < yLo || col("y0") > yHi), 1L)
          .otherwise(0L)).as("n_cand"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  test("writeParquetZOrdered: data survives intact and the layout prunes the q105 box " +
    "strictly better than the linear layout") {
    val base = java.nio.file.Files.createTempDirectory("graft-lakelayout").toString
    val docs = q105Dims(graft.ops.Tables.t(spark, dir, "documents"))
    docs.repartitionByRange(16, col("doc_id")).write.mode("overwrite").parquet(s"$base/linear")
    LakeLayout.writeParquetZOrdered(docs, Seq("x", "y"), s"$base/zorder", numFiles = 16)
    val back = spark.read.parquet(s"$base/zorder")
    assert(back.columns.sorted.toSeq == docs.columns.sorted.toSeq, "helper column leaked")
    assert(back.count() == docs.count())
    assert(docs.except(back).count() == 0 && back.except(docs).count() == 0,
      "z-order write changed row content")
    val (xLo, xHi, yLo, yHi) = (100L, 300L, 256L, 511L)
    val (linFiles, linCand) = boxCandidates(s"$base/linear", xLo, xHi, yLo, yHi)
    val (zFiles, zCand) = boxCandidates(s"$base/zorder", xLo, xHi, yLo, yHi)
    assert(linCand == linFiles, "fixture drifted: the linear layout should prune nothing")
    assert(zCand < linCand, s"z-order layout must prune more: zorder $zCand/$zFiles vs linear $linCand/$linFiles")
    assert(zCand * 2 <= zFiles, s"expected at least half the files pruned, got $zCand/$zFiles")
  }

  test("quantizer edges: a constant dimension drops out instead of dividing by zero, " +
    "and the reserved helper name is rejected") {
    import spark.implicits._
    val df = (0L until 64L).map(i => (i, 7L)).toDF("a", "c")
    val out = java.nio.file.Files.createTempDirectory("graft-lakelayout-const").toString
    LakeLayout.writeParquetZOrdered(df, Seq("c", "a"), s"$out/t", numFiles = 4)
    assert(spark.read.parquet(s"$out/t").count() == 64)
    val bad = df.withColumnRenamed("c", "__graft_z")
    intercept[IllegalArgumentException] {
      LakeLayout.writeParquetZOrdered(bad, Seq("a"), s"$out/bad", numFiles = 2)
    }
  }

  test("TrainingShards.write(zOrderBy): shards carry tight z-slices — per-shard x-ranges " +
    "overlap less than the unclustered write's") {
    val docs = q105Dims(graft.ops.Tables.t(spark, dir, "documents"))
    def shardSpread(zOrder: Seq[String]): (Long, Double) = {
      val out = java.nio.file.Files.createTempDirectory("graft-zshards").toString
      TrainingShards.write(docs.repartition(8), out, maxDocsPerShard = 64, zOrderBy = zOrder)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("y", org.apache.spark.sql.types.LongType)))
      val back = TrainingShards.read(spark, out, Some(schema))
      val n = back.count()
      // mean per-shard x-envelope width: the loader's skip signal
      val spread = back
        .groupBy(input_file_name().as("f"))
        .agg((max(col("x")) - min(col("x"))).cast("double").as("w"))
        .agg(avg(col("w"))).head().getDouble(0)
      (n, spread)
    }
    val (n0, spread0) = shardSpread(Nil)
    val (n1, spread1) = shardSpread(Seq("x", "y"))
    assert(n0 == n1 && n1 == docs.count(), "zOrderBy changed the row count")
    assert(spread1 < spread0 / 2,
      s"z-ordered shards should carry much tighter x-slices: $spread1 vs unclustered $spread0")
  }
}
