package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 09:59:00"), 100L),
    (1L, ts("2024-01-01 10:00:00"), 101L),
    (1L, ts("2024-01-01 10:05:00"), 102L),
    (2L, ts("2024-01-01 10:01:00"), 200L)
  ).toDF("user_id", "ts", "event_id")

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 09:58:00"), 1L), // before all quotes for key 1
    (1L, ts("2024-01-01 10:00:00"), 2L), // exactly at quote 101
    (1L, ts("2024-01-01 10:10:00"), 3L), // after all quotes
    (2L, ts("2024-01-01 10:00:00"), 4L), // before key 2's only quote
    (3L, ts("2024-01-01 10:00:00"), 5L) // key with no quotes at all
  ).toDF("user_id", "ts", "event_id")

  test("leftAsOf: inclusive latest-at-or-before semantics per key") {
    val out = AsOfJoin
      .leftAsOf(trades, quotes, "user_id", "ts", Seq("event_id"), "event_id")
      .select($"event_id", $"asof_event_id")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out(1L) == -1L) // no quote yet
    assert(out(2L) == 101L) // same-instant match is inclusive
    assert(out(3L) == 102L) // latest prior
    assert(out(4L) == -1L) // key 2's quote is later
    assert(out(5L) == -1L) // key never quoted
  }

  test("leftAsOf preserves left row count exactly (left-join semantics)") {
    val out = AsOfJoin.leftAsOf(trades, quotes, "user_id", "ts", Seq("event_id"), "event_id")
    assert(out.count() == trades.count())
  }
}
