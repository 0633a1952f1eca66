package graft.plans

import graft.SparkSpec
import graft.ops.{AsOfJoin, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native physical as-of join must agree row-for-row with the
  * composed (union + window) form on real data AND plan as the custom
  * operator with per-side requirements — the whole point of dropping to
  * a SparkPlan.
  */
class AsOfJoinNativeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def events = Tables.t(spark, sfDir, "events").filter(col("user_id") < 30)
  private def purchases = events.filter(col("event_type") === "purchase")

  test("native as-of join matches the composed union+window form row-for-row") {
    val composed = AsOfJoin
      .leftAsOf(
        events.select("event_id", "user_id", "ts"),
        purchases.select("event_id", "user_id", "ts"),
        key = "user_id", ts = "ts", valueCols = Seq("event_id"), tieBreak = "event_id"
      )
      .select("event_id", "user_id", "asof_event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(r => (r._2, r._1))
    val native = AsOfJoinNative
      .leftAsOf(
        events.select("event_id", "user_id", "ts"),
        purchases.select("event_id", "user_id", "ts"),
        key = "user_id", ts = "ts", valueCols = Seq("event_id"), tieBreak = "event_id"
      )
      .select("event_id", "user_id", "asof_event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(r => (r._2, r._1))
    assert(native.nonEmpty && native.length == composed.length)
    assert(native.sameElements(composed))
    assert(native.exists(_._3 >= 0), "no as-of matches found — fixture degenerate")
    assert(native.exists(_._3 == -1L), "no null (pre-first-purchase) rows — fixture degenerate")
  }

  test("plans as AsOfJoinExec with per-side clustering + (key, ts, tie) sorts") {
    val df = AsOfJoinNative.leftAsOf(
      events.select("event_id", "user_id", "ts"),
      purchases.select("event_id", "user_id", "ts"),
      key = "user_id", ts = "ts", valueCols = Seq("event_id"), tieBreak = "event_id"
    )
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"native operator missing from plan:\n$p")
    // EnsureRequirements must have satisfied the declared requirements:
    // a hash exchange per side and a (key, ts, tie) sort per side.
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size >= 2, s"per-side clustering missing:\n$p")
    assert(
      "Sort \\[user_id#\\d+L ASC NULLS FIRST, ts#\\d+ ASC NULLS FIRST, event_id#\\d+L ASC NULLS FIRST\\]".r
        .findFirstIn(p).isDefined,
      s"merge sort order missing:\n$p"
    )
  }

  test("bucketed sides join with ZERO exchanges — the scale win the composed form cannot have") {
    import spark.implicits._
    val l = (1L to 200L).map(i => (i % 10, i, i * 3)).toDF("k", "t", "lid")
    val r = (1L to 50L).map(i => (i % 10, i * 2, i + 1000)).toDF("k", "t", "lid")
    l.write.mode("overwrite").bucketBy(4, "k").saveAsTable("asof_l_bkt")
    r.write.mode("overwrite").bucketBy(4, "k").saveAsTable("asof_r_bkt")
    try {
      val out = AsOfJoinNative.leftAsOf(
        spark.table("asof_l_bkt"),
        spark.table("asof_r_bkt"),
        key = "k", ts = "t", valueCols = Seq("lid"), tieBreak = "lid"
      )
      val p = out.queryExecution.executedPlan.toString
      // Both children already satisfy ClusteredDistribution(k) via their
      // bucketing — EnsureRequirements must insert sorts only, no shuffle.
      // (The composed union+window form ALWAYS shuffles: a union of two
      // bucketed scans exposes no partitioning.)
      assert(!p.contains("Exchange"), s"bucketed as-of join still shuffles:\n$p")
      assert(p.contains("AsOfJoin"), p)
      assert(out.count() == 200)
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_l_bkt")
      spark.sql("DROP TABLE IF EXISTS asof_r_bkt")
    }
  }

  test("edge semantics: simultaneous right row matches; empty right side yields all nulls") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L)).toDF("k", "t", "lid")
    val r = Seq((1L, 10L, 900L), (1L, 15L, 901L)).toDF("k", "t", "lid")
    val out = AsOfJoinNative
      .leftAsOf(l, r, key = "k", ts = "t", valueCols = Seq("lid"), tieBreak = "lid")
      .orderBy("lid")
      .collect()
      .map(row => (row.getLong(2), if (row.isNullAt(3)) -1L else row.getLong(3)))
    // lid 100 at t=10 sees the simultaneous right row 900 (inclusive);
    // lid 101 at t=20 sees 901; key 2 has no right rows at all.
    assert(out.sameElements(Array((100L, 900L), (101L, 901L), (102L, -1L))))

    val empty = AsOfJoinNative
      .leftAsOf(l, r.filter(col("k") === 999), key = "k", ts = "t", valueCols = Seq("lid"), tieBreak = "lid")
      .collect()
    assert(empty.length == 3 && empty.forall(_.isNullAt(3)))
  }
}
