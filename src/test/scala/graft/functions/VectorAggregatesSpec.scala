package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorAggregatesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("vec_sum matches the posexplode+avg centroid fold exactly on partition-stable data") {
    val rows = Seq(
      (0, Seq(1.0f, 2.0f, 3.0f)),
      (0, Seq(0.5f, -2.0f, 1.0f)),
      (1, Seq(10.0f, 0.0f, -1.0f)),
      (1, Seq(2.0f, 4.0f, 8.0f)),
      (1, Seq(0.0f, 0.0f, 1.0f))
    ).toDF("cluster", "embedding").repartition(1) // one partition: both folds add in row order
    val viaAgg = rows.groupBy("cluster")
      .agg(VectorAggregates.vec_sum(col("embedding")).as("s"), count(lit(1)).as("n"))
      .select(col("cluster"), expr("transform(s, x -> CAST(x / n AS FLOAT))").as("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    val viaExplode = rows
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("cluster", "pos").agg(avg(col("v")).as("m"))
      .groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cluster"), expr("transform(pm, x -> CAST(x.m AS FLOAT))").as("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    assert(viaAgg === viaExplode)
  }

  test("vec_sum partial-aggregates: the exchange carries one row per (task, group), not dim x rows") {
    val rows = (0 until 1000).map(i => (i % 3, Seq.fill(8)(i.toFloat))).toDF("cluster", "embedding")
      .repartition(4)
    val agg = rows.groupBy("cluster").agg(VectorAggregates.vec_sum(col("embedding")).as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate, got:\n$plan")
    // partial + final pair around one exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2)
    val out = agg.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val expect = (0 until 1000).groupBy(_ % 3).view
      .mapValues(is => Seq.fill(8)(is.map(_.toDouble).sum)).toMap
    assert(out.keySet === expect.keySet)
    out.foreach { case (k, v) =>
      v.zip(expect(k)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
    }
  }

  test("vec_sum of no rows per group never fabricates a group; null inputs are skipped") {
    val rows = Seq((0, Some(Seq(1.0f, 1.0f))), (0, None), (1, Some(Seq(2.0f, 3.0f))))
      .toDF("cluster", "embedding")
    val out = rows.groupBy("cluster")
      .agg(VectorAggregates.vec_sum(col("embedding")).as("s"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1)).map(_ => r.getSeq[Double](1))).toMap
    assert(out(0) === Some(Seq(1.0, 1.0)))
    assert(out(1) === Some(Seq(2.0, 3.0)))
  }
}
