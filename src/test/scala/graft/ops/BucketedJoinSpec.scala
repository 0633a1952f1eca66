package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The 100 TB co-location lever SURVEY §7 calls out: two tables bucketed
  * (and sorted) on the join key with the same bucket count join WITHOUT
  * any shuffle — the bucketed scans already satisfy the join's required
  * hash distribution, so the fact-fact join that would otherwise move
  * both sides over the network becomes a per-bucket local merge.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("same-bucketing equi-join plans with zero Exchange (and the unbucketed twin shuffles)") {
    val orders = Tables.t(spark, sfDir, "orders")
    val customer = Tables.t(spark, sfDir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_bkt")
    customer.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("customer_bkt")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join path
    try {
      val bucketed = spark
        .table("orders_bkt")
        .join(spark.table("customer_bkt"), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      // the join inputs are bucketed scans: NO exchange below the join
      // (the only exchange in the whole plan is the post-join group-by)
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      val unbucketed = orders
        .join(customer, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
      val unbucketedJoinSection = {
        val p = unbucketed.queryExecution.executedPlan.toString
        p.substring(p.indexOf("SortMergeJoin"))
      }
      assert(unbucketedJoinSection.contains("Exchange"), "control: unbucketed join should shuffle")

      // identical results either way
      val a = bucketed.collect().map(_.toString).sorted
      val b = unbucketed.collect().map(_.toString).sorted
      assert(a.sameElements(b))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
