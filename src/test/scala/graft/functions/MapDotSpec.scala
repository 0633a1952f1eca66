package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fused map_dot kernel that carries logregFit's per-iteration
  * margin: exact parity with the old flat-frame aggregate
  * `sum(c * element_at(w, bucket + 1))`, the old path's edge semantics
  * (out-of-range buckets and null values contribute 0), and
  * codegen/interpreted agreement.
  */
class MapDotSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val w = Array(5L, -3L, 0L, 7L, 1000L)

  test("map_dot equals the old sum(c * element_at(w, bucket+1)) aggregate") {
    val flat = Seq(
      (0L, 0L, 2L), (0L, 3L, 1L), (0L, 4L, 1L),
      (1L, 1L, 5L), (1L, 2L, 9L),
      (2L, 4L, 1L)
    ).toDF("doc_id", "bucket", "c")
    val viaAgg = flat
      .withColumn("wm", element_at(typedLit(w.toSeq), col("bucket").cast("int") + 1))
      .groupBy("doc_id").agg(sum(col("c") * col("wm")).as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaKernel = flat
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("c")))).as("f"))
      .select(col("doc_id"), VectorFunctions.map_dot(col("f"), w).as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaKernel === viaAgg)
    assert(viaKernel(0L) === 2 * 5L + 7L + 1000L)
  }

  test("out-of-range buckets contribute 0, exactly like non-ANSI element_at + sum") {
    // bucket 99 is past the weight vector: element_at yields NULL, sum
    // skips it — the kernel must agree, not throw and not mis-index
    val df = Seq((0L, Map(0L -> 1L, 99L -> 123L, -1L -> 7L))).toDF("doc_id", "f")
    val z = df.select(VectorFunctions.map_dot(col("f"), w)).collect().head.getLong(0)
    assert(z === 5L)
  }

  test("codegen and interpreted evaluation agree bit-for-bit") {
    val df = (0L until 257L).map(i => (i, Map(i % 5 -> (i + 1), (i + 1) % 5 -> 2L)))
      .toDF("doc_id", "f")
    def run(codegen: String): Map[Long, Long] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(col("doc_id"), VectorFunctions.map_dot(col("f"), w).as("z"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
  }

  test("logregFit margin shape: one bucket-keyed exchange per iteration, no join") {
    // the r18 regression this kernel closes: the per-iteration plan must
    // carry NO doc-keyed exchange and NO broadcast error-frame join —
    // just the in-row margin + one bucket aggregate
    val dbm = Seq((0L, 0, Map(0L -> 1L, 4L -> 1L)), (1L, 1, Map(1L -> 2L, 4L -> 1L)))
      .toDF("doc_id", "y", "f")
    val grads = dbm
      .withColumn("z", VectorFunctions.map_dot(col("f"), w))
      .withColumn("e", col("z") - col("y"))
      .select(col("e"), explode(col("f")).as(Seq("bucket", "c")))
      .groupBy("bucket").agg(sum(col("e") * col("c")).as("g"))
    val plan = grads.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"iteration plan must be join-free:\n$plan")
    assert("Exchange".r.findAllIn(plan).size <= 1, s"one bucket exchange expected:\n$plan")
  }
}
