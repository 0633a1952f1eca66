package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-denominator cases the sf fixtures never hit: MAD = 0
  * (q77), an empty funnel stage (q76), and an all-equal price column
  * (r09). Each division is guarded IDENTICALLY in the Spark code and the
  * DuckDB oracle SQL (nullif / greatest-clamp), so both engines agree on
  * legal-but-degenerate data instead of diverging on NULL-vs-inf
  * semantics. These tests pin the Spark side; the textual guard in the
  * oracle is asserted alongside so the two can't drift apart.
  */
class DegenerateDivisionSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("degenerate").toString

  test("q77: an event type where >=half the values equal the median (MAD=0) yields NULL z, 0 outliers") {
    import spark.implicits._
    val dir = tmpDir()
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 'flat' has 3 of 4 values at the median -> MAD = 0; 'spread' is healthy
    (Seq((1L, ts, 1L, "flat", 5.0), (2L, ts, 1L, "flat", 5.0),
      (3L, ts, 2L, "flat", 5.0), (4L, ts, 2L, "flat", 99.0)) ++
      (1 to 20).map(i => (100L + i, ts, 3L, "spread", i.toDouble)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = EventOps.queries("q77_mad_outliers")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val flat = rows("flat")
    assert(flat.getDouble(3) == 0.0, "MAD should be 0 for the flat type")
    assert(flat.getLong(4) == 0L, "no outliers may be flagged when MAD=0")
    assert(flat.isNullAt(5), "max_robust_z must be NULL (not inf) when MAD=0")
    val spread = rows("spread")
    assert(!spread.isNullAt(5) && spread.getDouble(3) > 0.0)
  }

  test("q76: a funnel with zero clicks yields NULL conversion past the empty stage, not inf") {
    import spark.implicits._
    val dir = tmpDir()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // views and purchases but NO clicks: stage 2 count = 0, stage 3 = 0
    (Seq((1L, ts(1), 1L, "view", 1.0), (2L, ts(2), 2L, "view", 1.0),
      (3L, ts(3), 1L, "purchase", 1.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = EventOps.queries("q76_funnel")(spark, dir)
      .orderBy("stage").collect()
    assert(rows.length == 3)
    assert(rows(0).isNullAt(2), "stage 1 has no predecessor")
    assert(rows(1).getLong(1) == 0L && rows(1).getDouble(2) == 0.0,
      "click stage: 0 conversions from 2 views")
    assert(rows(2).getLong(1) == 0L && rows(2).isNullAt(2),
      "purchase stage: 0/0 must be NULL (nullif guard), not inf/nan")
  }

  test("r09: an all-equal price column puts all mass in bin 0 and estimates exactly") {
    import spark.implicits._
    val dir = tmpDir()
    Seq.fill(50)(42.5).toDF("l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = RetrievalOps.queries("r09_histogram_quantiles")(spark, dir)
      .orderBy("q").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getDouble(1) == 42.5, s"estimate must collapse to the exact value: $r")
      assert(r.getDouble(2) == 42.5)
      assert(r.getDouble(3) == 0.0, s"rel_err must be 0: $r")
      assert(r.getBoolean(4))
    }
  }

  test("the Spark guards and their oracle twins use the same construct (no drift)") {
    assert(EventOps.oracleSql("q77_mad_outliers").contains("nullif(ma.mad, 0)"))
    assert(EventOps.oracleSql("q76_funnel").contains("nullif(lag(n) OVER (ORDER BY stage), 0)"))
    assert(RetrievalOps.oracleSql("r09_histogram_quantiles").contains("greatest(st.hi - st.lo, 1e-12)"))
  }
}
