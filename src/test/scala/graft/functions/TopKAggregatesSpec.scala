package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the exact semantics [[TopKAggregates]] promises (ascending /
  * descending sorted output, multiset duplicates, struct tiebreak order,
  * under-filled groups) and the plan shape (ObjectHashAggregate, i.e. a
  * map-side-combinable bounded heap — never a sort or a window).
  */
class TopKAggregatesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import TopKAggregates._

  test("minK returns the k smallest, ascending, duplicates kept (multiset)") {
    import spark.implicits._
    val df = Seq(5L, 3L, 9L, 3L, 7L, 1L, 8L).toDF("x")
    val got = df.agg(minK(col("x"), 4).as("m")).collect().head.getSeq[Long](0)
    assert(got == Seq(1L, 3L, 3L, 5L))
  }

  test("maxK returns the k largest, descending") {
    import spark.implicits._
    val df = Seq(5L, 3L, 9L, 3L, 7L, 1L, 8L).toDF("x")
    val got = df.agg(maxK(col("x"), 3).as("m")).collect().head.getSeq[Long](0)
    assert(got == Seq(9L, 8L, 7L))
  }

  test("under-filled groups return all values; element_at(arr, k) guarded by size") {
    import spark.implicits._
    val df = Seq(("a", 2L), ("a", 1L), ("b", 4L)).toDF("g", "x")
    val got = df.groupBy("g").agg(minK(col("x"), 3).as("m"))
      .select(col("g"), size(col("m")).as("n"),
        when(size(col("m")) === 3, element_at(col("m"), 3)).as("kth"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.isNullAt(2))).toSet
    assert(got == Set(("a", 2, true), ("b", 1, true)))
  }

  test("struct minK orders lexicographically: primary asc, then tiebreak asc") {
    import spark.implicits._
    val df = Seq((1.0, 20L), (1.0, 10L), (0.5, 30L), (2.0, 5L)).toDF("p", "id")
    val got = df
      .agg(minK(struct(col("p"), col("id")), 3).as("m"))
      .select(explode(col("m")).as("r"))
      .select(col("r.p"), col("r.id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(got == Seq((0.5, 30L), (1.0, 10L), (1.0, 20L)))
  }

  test("minK matches sort+limit on random data (property)") {
    import spark.implicits._
    val xs = new scala.util.Random(7).shuffle((1 to 500).map(_.toLong * 3 % 97)).toSeq
    val df = xs.toDF("x").repartition(8) // force multi-partition partial merge
    val got = df.agg(minK(col("x"), 10).as("m")).collect().head.getSeq[Long](0)
    val want = xs.sorted.take(10)
    assert(got == want)
  }

  test("plan: minK aggregates via ObjectHashAggregate — no Sort, no Window") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("b", 2L)).toDF("g", "x")
      .groupBy("g").agg(minK(col("x"), 4).as("m"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window"), p)
  }
}
