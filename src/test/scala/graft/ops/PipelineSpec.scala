package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins for the composed curation pipeline (p01): the stage ledger must
  * behave like a filter chain, and the whole six-stage flow must read
  * the corpus ONCE (the point of composing, vs running the stages as
  * six standalone queries each re-parsing `documents`).
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("p01: the stage ledger is a monotone filter chain; packing conserves the budget stage") {
    val rows = PipelineOps.queries("p01_curation_pipeline")(spark, sfDir)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val names = Seq("raw", "dedup", "quality", "decontam", "budget", "pack")
    assert(rows.keySet == names.toSet, s"stage set drifted: ${rows.keySet}")
    // survivors never increase through the filter stages
    names.sliding(2).take(4).foreach { case Seq(a, b) =>
      assert(rows(b)._1 <= rows(a)._1, s"$b has more docs than $a: $rows")
      assert(rows(b)._2 <= rows(a)._2, s"$b has more tokens than $a: $rows")
    }
    // packing re-bins the budget survivors without adding or dropping any
    assert(rows("pack")._1 == rows("budget")._1, s"pack changed the doc count: $rows")
    assert(rows("pack")._2 == rows("budget")._2, s"pack changed the token count: $rows")
    // something survives, and bins exist only at the pack stage
    assert(rows("budget")._1 > 0, s"pipeline filtered everything out: $rows")
    assert(rows("pack")._3 > 0, s"no bins packed: $rows")
    assert(names.dropRight(1).forall(rows(_)._3 == 0L), s"n_bins leaked into a filter stage: $rows")
    // bin count is consistent with the budget: >= tokens/PackBudget bins
    assert(rows("pack")._3 >= rows("pack")._2 / PipelineOps.PackBudget,
      s"too few bins for the packed tokens: $rows")
  }

  test("p01: one corpus scan — the feature pass reads parquet once, the stages read the checkpoint") {
    val docs = Tables.t(spark, sfDir, "documents")
    // the feature frame is the single place `text` is touched
    val featPlan = PipelineOps.featureFrame(docs).queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(featPlan).size == 1,
      s"feature pass should scan documents exactly once:\n$featPlan")
    // the composed pipeline's final plan reads ONLY the checkpointed
    // feature RDD — zero parquet scans anywhere downstream
    val p = PipelineOps.queries("p01_curation_pipeline")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("FileScan parquet"),
      s"a pipeline stage re-scans parquet instead of the checkpointed features:\n$p")
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      s"expected the checkpoint scan in the plan:\n$p")
  }
}
