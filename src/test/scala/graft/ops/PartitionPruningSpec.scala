package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The reference's dated-dir layout maps to Hive-style partitioning
  * (SURVEY.md §1.1): writing day-partitioned parquet and filtering on the
  * partition column must prune at PLAN time — the Catalyst replacement
  * for the reference's manual listing + filter_date.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("day-partitioned write + watermark filter prunes partitions at plan time") {
    val out = Files.createTempDirectory("part").toString
    Tables
      .t(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
      .write
      .partitionBy("day")
      .mode("overwrite")
      .parquet(out)

    val days = new java.io.File(out).listFiles().filter(_.getName.startsWith("day=")).map(_.getName).sorted
    assert(days.length >= 25) // ~30 days of events

    // strict-> watermark semantics on the partition column
    val watermark = "2024-01-25"
    val pruned = spark.read.parquet(out).filter(col("day") > lit(watermark).cast("date"))
    val plan = pruned.queryExecution.executedPlan.toString

    // The scan must report the partition filter and read only the late days
    assert(plan.contains("PartitionFilters"), "no partition filter in plan")
    val scannedDirs = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(scannedDirs.nonEmpty)
    assert(scannedDirs.forall { f =>
      val day = "day=([0-9-]+)".r.findFirstMatchIn(f).get.group(1)
      day > watermark
    }, "scan touched a partition at or before the watermark")

    // correctness of the pruned result vs full-scan filter
    val full = Tables
      .t(spark, "/root/testdata/sf0.001", "events")
      .filter(to_date(col("ts")) > lit(watermark).cast("date"))
      .count()
    assert(pruned.count() == full)
  }
}
