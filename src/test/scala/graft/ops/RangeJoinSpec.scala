package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[RangeJoin.pointInInterval]]: parity with the naive range join, the
  * equi-join plan shape (the whole point), and the bin-boundary edges.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def points = Seq(0L, 5L, 10L, 15L, 99L, 100L, 101L, 250L).toDF("p")
  private def intervals = Seq(
    (1L, 0L, 10L),    // spans bins 0-1 at width 10, closed ends
    (2L, 10L, 10L),   // degenerate [10,10]
    (3L, 95L, 105L),  // crosses the 100 boundary
    (4L, 300L, 400L)  // matches nothing
  ).toDF("id", "s", "e")

  test("matches the naive range join row-for-row") {
    val binned = RangeJoin
      .pointInInterval(points, "p", intervals, "s", "e", binWidth = 10L)
      .select("id", "p")
    val naive = points
      .crossJoin(intervals)
      .where(col("p") >= col("s") && col("p") <= col("e"))
      .select("id", "p")
    assert(binned.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      naive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    // Spot-check the edges: closed ends, degenerate interval, bin-crossing.
    val got = binned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 0L)) && got.contains((1L, 10L)), "closed [0,10] keeps both ends")
    assert(got.contains((2L, 10L)), "degenerate [10,10] matches its point")
    assert(got.contains((3L, 99L)) && got.contains((3L, 100L)) && got.contains((3L, 101L)),
      "interval crossing a bin boundary matches points in both bins")
    assert(!got.exists(_._1 == 4L), "disjoint interval matches nothing")
  }

  test("no pair is emitted twice even when an interval spans many bins") {
    val wide = Seq((9L, 0L, 95L)).toDF("id", "s", "e") // spans 10 bins at width 10
    val rows = RangeJoin
      .pointInInterval(points, "p", wide, "s", "e", binWidth = 10L)
      .groupBy("p").count().collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) == 1L), rows.mkString(","))
  }

  test("plans as an equi-join on the bin: no nested-loop, no cartesian") {
    val p = RangeJoin
      .pointInInterval(points, "p", intervals, "s", "e", binWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q61 parity at sf0.001: binned result equals the naive range join") {
    val sfDir = "/root/testdata/sf0.001"
    val hourUs = 3600L * 1000000L
    val ev = Tables.t(spark, sfDir, "events")
    val base = ev.agg(min(unix_micros(col("ts"))).as("base"))
    val iv = Tables.t(spark, sfDir, "nation")
      .crossJoin(broadcast(base))
      .select(
        col("n_nationkey").cast("long").as("interval_id"),
        (col("base") + col("n_nationkey") * lit(3 * hourUs)).as("start_us"),
        (col("base") + col("n_nationkey") * lit(3 * hourUs) +
          (col("n_nationkey") % 7 + 1) * lit(hourUs)).as("end_us")
      )
    val pts = ev.select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val binned = RangeJoin
      .pointInInterval(pts, "ts_us", iv, "start_us", "end_us", hourUs)
      .select("interval_id", "event_id")
    val naive = pts
      .crossJoin(iv)
      .where(col("ts_us") >= col("start_us") && col("ts_us") <= col("end_us"))
      .select("interval_id", "event_id")
    assert(binned.count() > 0)
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("rejects a non-positive bin width") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "p", intervals, "s", "e", binWidth = 0L)
    }
  }
}
