package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables.{t, Q}

/** Relational operator surface: scans, filters, joins (broadcast/shuffle,
  * inner/outer/semi/anti/full), aggregations (hash, distinct, rollup, cube,
  * grouping sets), windows, sorts/top-k, set ops, scalar functions,
  * subqueries — each as a `SparkEntry.queries` entry with a DuckDB oracle.
  *
  * Design rules applied throughout (100 TB posture):
  *  - filters and projections precede joins so Catalyst pushes them into
  *    the parquet scan (PushedFilters / pruned ReadSchema);
  *  - always-small dims (region, nation: fixed 5/25 rows at ANY scale
  *    factor) are broadcast explicitly; fact-fact joins are left to
  *    AQE/sort-merge because both sides scale with data volume;
  *  - every query ends in a deterministic ORDER BY so results are
  *    reproducible across engines and partition counts;
  *  - aggregates are rounded so Spark-vs-DuckDB double summation-order
  *    noise cannot flip the comparison.
  */
object RelationalOps {

  /** Stable overwrite-mode scratch path for round-trip queries, KEYED BY
    * the input dir so two SFs (or two concurrent JVMs on different
    * fixtures) never share a directory: repeated invocations on one
    * fixture reuse one path (no per-run dir leak), while a different
    * fixture gets its own — an overwrite from a bigger corpus can never
    * be read back by a smaller one's query.
    */
  private def rtPath(tag: String, dir: String): String = {
    // full md5 of the path, not String.hashCode: a 32-bit hash collision
    // between two fixture paths would let one corpus's overwrite be read
    // back by the other's round-trip query — the exact contamination this
    // keying exists to rule out
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_rt_" +
      md.map(b => f"$b%02x").mkString
  }


  val queries: Map[String, Q] = Map(
    // Flagship: the ingest-manifest shape — per-day/type file counts past a
    // watermark (the reference's day-batch view, audit_data_ingest.py:49-51).
    "q00_ingest_manifest" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(date_trunc("day", col("ts")) > lit("2024-01-05").cast("timestamp"))
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_files"), round(sum(col("value")), 2).as("total_bytes"))
        .orderBy("day", "event_type")
    }),

    // TPC-H Q1 shape: wide multi-aggregate hash aggregation.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2)
            .as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q6 shape: tight filter fully pushed to the scan, single-row agg.
    "q02_revenue_forecast" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24
        )
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    }),

    // TPC-H Q3 shape: 3-way join + agg + top-k (deterministic tie-break).
    "q03_shipping_priority" -> ((s, dir) => {
      val customer = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val orders = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val lineitem = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      customer
        .join(orders, col("c_custkey") === col("o_custkey"))
        .join(lineitem, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q4 shape: correlated EXISTS = left-semi join.
    "q04_order_priority" -> ((s, dir) => {
      val orders = t(s, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp")
      )
      val lineitem = t(s, dir, "lineitem")
      orders
        .join(
          lineitem,
          col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"),
          "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q5 shape: 6-way join; tiny dims broadcast, fact joins shuffled.
    "q05_region_revenue" -> ((s, dir) => {
      val orders = t(s, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")
      )
      t(s, dir, "customer")
        .join(orders, col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")).filter(col("r_name") === "ASIA"), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Left outer join + mixed aggregates (count of nullable side, distinct).
    "q06_cust_order_stats_left" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("n_name")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          countDistinct(col("c_custkey")).as("n_custs"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spend")
        )
        .orderBy("n_name")
    }),

    // NOT EXISTS = left-anti join (right side filtered first).
    "q07_no_urgent_anti" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(
          t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("o_custkey") === col("c_custkey"),
          "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),

    // TPC-H Q14 shape: conditional aggregation over a fact-dim join.
    "q08_promo_share" -> ((s, dir) => {
      val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("l_shipdate")).cast("int").as("ship_year"))
        .agg(
          round(
            lit(100.0) * sum(when(col("p_type") === "PROMO", revenue).otherwise(0.0)) / sum(revenue),
            4
          ).as("promo_share")
        )
        .orderBy("ship_year")
    }),

    // Window: per-partition top-n with row_number (deterministic tie-break).
    "q09_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), row_number().over(w).as("rnk"))
        .filter(col("rnk") <= 3)
        .orderBy("o_custkey", "rnk")
    }),

    // Window: running sum over an explicit ROWS frame.
    "q10_window_running" -> ((s, dir) => {
      val w = Window
        .partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 500)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          round(sum(col("l_quantity")).over(w), 2).as("running_qty")
        )
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Window: lag for event-time deltas.
    "q11_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .filter(col("user_id") < 50)
        .select(
          col("event_id"),
          col("user_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w))).cast("bigint").as("gap_s")
        )
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Multiple DISTINCT aggregates in one pass (Expand-based plan).
    "q12_distinct_aggs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows")
        )
        .orderBy("l_returnflag")
    }),

    // ROLLUP hierarchy totals. SQL form: the DataFrame rollup + post-agg
    // coalesce trips Spark's ambiguous-self-join detector on the re-read
    // grouping attrs, so express the pivot through the SQL surface.
    // View names are per-invocation (and dropped right after analysis
    // resolves them) so concurrent queries on one session cannot race.
    "q13_rollup" -> ((s, dir) => {
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val (c, n, r) = (s"customer_ru_$tag", s"nation_ru_$tag", s"region_ru_$tag")
      t(s, dir, "customer").createOrReplaceTempView(c)
      t(s, dir, "nation").createOrReplaceTempView(n)
      t(s, dir, "region").createOrReplaceTempView(r)
      val df = s.sql(s"""
        SELECT coalesce(r_name, 'ALL') AS region_name, coalesce(n_name, 'ALL') AS nation_name, count(*) AS n_customers
        FROM $c JOIN $n ON c_nationkey = n_nationkey JOIN $r ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name) ORDER BY region_name, nation_name
      """)
      Seq(c, n, r).foreach(s.catalog.dropTempView)
      df
    }),

    // CUBE over two dimensions.
    "q14_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"),
          col("n")
        )
        .orderBy("returnflag", "linestatus")
    }),

    // GROUPING SETS (SQL surface — no DataFrame equivalent in Spark).
    // Unique per-invocation view name, dropped after analysis (no race).
    "q15_grouping_sets" -> ((s, dir) => {
      val v = s"orders_gs_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      t(s, dir, "orders").createOrReplaceTempView(v)
      val df = s.sql(s"""
        SELECT coalesce(o_orderpriority, 'ALL') AS dim_priority,
               coalesce(o_orderstatus, 'ALL') AS dim_status,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM $v
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY dim_priority, dim_status
      """)
      s.catalog.dropTempView(v)
      df
    }),

    // Salted skew join: ~2/3 of orders are remapped onto ONE customer key,
    // the classic hot-key shape that stalls a plain shuffle join on a
    // single reducer. SkewJoin.saltedInnerJoin splits the hot key across
    // saltFactor sub-partitions; the merge hint forces the shuffle path
    // (broadcast would hide the skew at this SF — at 100 TB neither side
    // broadcasts). Results are identical to the unsalted join, which is
    // exactly what the oracle checks.
    "q36_skew_salted" -> ((s, dir) => {
      val orders = t(s, dir, "orders").select(
        when(col("o_orderkey") % 3 < 2, lit(1L)).otherwise(col("o_custkey")).as("skew_custkey"),
        col("o_orderkey"),
        col("o_totalprice")
      )
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("skew_custkey"), col("c_mktsegment"))
      SkewJoin
        .saltedInnerJoin(orders, cust.hint("merge"), key = "skew_custkey", uniqueCol = "o_orderkey", saltFactor = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("c_mktsegment")
    }),

    // Set operations: INTERSECT / EXCEPT (distinct semantics).
    "q16_setops" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      val both = cn.intersect(sn).select(lit("both").as("op"), col("nationkey"))
      val custOnly = cn.except(sn).select(lit("cust_only").as("op"), col("nationkey"))
      both.unionByName(custOnly).orderBy("op", "nationkey")
    }),

    // Scalar string functions.
    "q17_string_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_partkey") < 100)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), " ", "_").as("name_snake"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          element_at(split(col("p_name"), " "), 1).as("first_word")
        )
        .orderBy("p_partkey")
    }),

    // Scalar date functions.
    "q18_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 100)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
          datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01"))).as("days_since_epoch95"),
          last_day(col("o_orderdate")).as("month_end")
        )
        .orderBy("o_orderkey")
    }),

    // Scalar math functions.
    "q19_math_funcs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("d1"),
          ceil(col("l_quantity") / 7.0).as("d2"),
          floor(col("l_extendedprice") / 1000.0).as("d3"),
          round(sqrt(col("l_extendedprice")), 4).as("d4"),
          round(log(col("l_extendedprice") + 1), 4).as("d5"),
          round(pow(col("l_tax") + 1, 2), 6).as("d6"),
          (col("l_linenumber") % 3).cast("int").as("d7"),
          signum(col("l_discount") - 0.05).as("d8")
        )
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // CASE WHEN classification + aggregate.
    "q20_case_when" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
            .when(col("o_orderpriority") === "3-MEDIUM", "mid")
            .otherwise("low")
            .as("prio_class")
        )
        .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 2).as("avg_price"))
        .orderBy("prio_class")
    }),

    // HAVING = post-aggregation filter.
    "q21_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") > 15)
        .orderBy("o_custkey")
    }),

    // Scalar subquery (1-row side broadcast by AQE).
    "q22_scalar_subquery" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val avgPrice = orders.agg(avg(col("o_totalprice")).as("ap"))
      orders
        .crossJoin(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("ap"))
        .agg(count(lit(1)).as("n_above_avg"))
    }),

    // IN-subquery = semi join against a broadcast dim chain.
    "q23_in_subquery" -> ((s, dir) => {
      val eurNations = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")).filter(col("r_name") === "EUROPE"), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey")
      t(s, dir, "customer")
        .join(broadcast(eurNations), col("c_nationkey") === col("n_nationkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    }),

    // Global sort + limit => TakeOrderedAndProject (no full sort at scale).
    "q24_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // Array functions over the embedding column.
    "q26_array_funcs" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .filter(col("vec_id") < 20)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).as("first_val"),
          col("label")
        )
        .orderBy("vec_id")
    }),

    // Full outer join of two aggregates.
    "q27_full_outer" -> ((s, dir) => {
      val cc = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_custs")).as("c")
      val ss = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supps")).as("s")
      cc.join(ss, col("c.nk") === col("s.nk"), "full_outer")
        .select(
          coalesce(col("c.nk"), col("s.nk")).as("nationkey"),
          coalesce(col("n_custs"), lit(0L)).as("n_custs"),
          coalesce(col("n_supps"), lit(0L)).as("n_supps")
        )
        .orderBy("nationkey")
    }),

    // Exact percentiles (sort-based interpolation, matching DuckDB's
    // quantile_cont definition).
    // Percentiles round at 4dp, not 2dp: prices have 2dp granularity, so
    // interpolated quantiles land exactly on x.xx5 — a 2dp round sits on
    // the half-way boundary where the engines' (ulp-different) interpolation
    // arithmetic flips the digit. No possible percentile value sits within
    // ulp of a 4dp midpoint, so 4dp is deterministic across engines.
    "q28_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50"),
          round(percentile(col("l_extendedprice"), lit(0.95)), 4).as("p95"),
          round(median(col("l_extendedprice")), 4).as("med")
        )
        .orderBy("l_returnflag")
    }),

    // Pivot: status counts per priority (DataFrame pivot with explicit
    // value list, so the output schema is static at any scale).
    "q29_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(
          col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("status_f"),
          coalesce(col("O"), lit(0L)).as("status_o"),
          coalesce(col("P"), lit(0L)).as("status_p")
        )
        .orderBy("o_orderpriority")
    }),

    // Distribution window functions: ntile / percent_rank / cume_dist.
    "q34_rank_funcs" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_custkey") < 20)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume")
        )
        .orderBy(col("o_custkey"), col("pct_rank"), col("o_orderkey"))
    }),

    // Approximate distinct (HLL++). The raw estimates can't hash-match a
    // foreign engine's HLL, so the comparable surface is a TOLERANCE BAND:
    // each engine emits its exact distinct counts plus a boolean saying
    // its own approx estimate landed within 5% of them — the strict
    // row-hash compare then verifies both engines' sketches against
    // ground truth (HLL++ rsd defaults ~2-3% observed error; 5% is the
    // documented band).
    "q25_approx_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_orderkey")).as("exact_orders"),
          (abs(
            approx_count_distinct(col("l_orderkey"), 0.01).cast("double") / countDistinct(col("l_orderkey")) - 1
          ) <= 0.05).as("orders_within_5pct"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          (abs(
            approx_count_distinct(col("l_partkey"), 0.01).cast("double") / countDistinct(col("l_partkey")) - 1
          ) <= 0.05).as("parts_within_5pct")
        )
        .orderBy("l_returnflag")
    }),

    // UNPIVOT (melt): wide measure columns to long (measure, value) rows
    // — the inverse of q29's pivot. Narrow generate per row, no shuffle
    // before the final sort.
    "q51_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity").cast("double").as("quantity"),
          col("l_extendedprice").cast("double").as("extendedprice"), col("l_discount").cast("double").as("discount"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("quantity"), col("extendedprice"), col("discount")),
          variableColumnName = "measure",
          valueColumnName = "value"
        )
        .select(col("l_orderkey"), col("l_linenumber"), col("measure"), round(col("value"), 2).as("value"))
        .orderBy("l_orderkey", "l_linenumber", "measure")
    }),

    // Count-min sketch: the frequency-estimation sketch next to q25's HLL
    // cardinality sketch. The sketch builds DISTRIBUTED (df.stat merges
    // per-partition sketches); the tiny distinct key set (5 event types)
    // is probed driver-side and ships back as a literal map, so the check
    // column — estimate within 2% of exact — is oracle-checkable the same
    // tolerance-band way as q25 (CMS overestimates by at most eps*N =
    // 0.001*|events| here, well under 2% of any type's count).
    "q49_count_min" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val cms = ev.stat.countMinSketch(col("event_type"), eps = 0.001, confidence = 0.99, seed = 42)
      // Guarded driver-side probe: the key set must be known-small before
      // collect() — a high-cardinality column here would OOM the driver,
      // so fail loudly at the cap instead (see CollectGuard).
      val estimates: Map[String, Long] = CollectGuard
        .smallDistinct(ev.select("event_type"), cap = 10000)
        .map(r => r.getString(0) -> cms.estimateCount(r.getString(0))).toMap
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .select(
          col("event_type"),
          col("n"),
          (abs(element_at(typedLit(estimates), col("event_type")) - col("n")) <= col("n") * 0.02)
            .as("cms_within_2pct")
        )
        .orderBy("event_type")
    }),

    // Bloom filter: the membership sketch. Built distributed over the
    // orders side (df.stat merges per-partition filters), probed per
    // customer as a literal predicate. The DETERMINISTIC property — no
    // false negatives: every customer with orders tests positive — plus a
    // bounded false-positive rate on the order-less customers make it
    // oracle-checkable as one summary row.
    "q50_bloom_filter" -> ((s, dir) => {
      val customers = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val bloom = orders.stat.bloomFilter(col("o_custkey"), expectedNumItems = 100000L, fpp = 0.01)
      val bloomBc = customers.sparkSession.sparkContext.broadcast(bloom)
      val withOrders = orders.select(col("o_custkey").as("c_custkey")).distinct()
      // membership test via a deterministic map over partitions (the bloom
      // object is not expressible as a Catalyst literal)
      import customers.sparkSession.implicits._
      val tested = customers
        .join(withOrders.withColumn("has_orders", lit(true)), Seq("c_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("has_orders"), lit(false)).as("has_orders"))
        .as[(Long, Boolean)]
        .mapPartitions { it =>
          val b = bloomBc.value
          it.map { case (k, has) => (k, has, b.mightContain(k)) }
        }
        .toDF("c_custkey", "has_orders", "bloom_positive")
      tested.agg(
        count(lit(1)).as("n_customers"),
        sum(when(col("has_orders"), 1L).otherwise(0L)).as("n_with_orders"),
        // no false negatives — exact, deterministic
        (sum(when(col("has_orders") && !col("bloom_positive"), 1L).otherwise(0L)) === 0L)
          .as("no_false_negatives"),
        // FP rate among order-less customers bounded by ~3x target fpp
        (sum(when(!col("has_orders") && col("bloom_positive"), 1L).otherwise(0L)).cast("double") <=
          greatest(sum(when(!col("has_orders"), 1L).otherwise(0L)).cast("double") * 0.03, lit(1.0)))
          .as("fp_rate_bounded")
      )
    }),

    // Correlated EXISTS / NOT EXISTS subqueries (SQL form — the DataFrame
    // API has no EXISTS; semi/anti joins are its spelling, covered by
    // q05/q07). Both branches stream the same broadcast-able probe.
    "q37_exists_subquery" -> ((s, dir) => {
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val (c, o) = (s"customer_ex_$tag", s"orders_ex_$tag")
      t(s, dir, "customer").createOrReplaceTempView(c)
      t(s, dir, "orders").createOrReplaceTempView(o)
      val df = s.sql(s"""
        SELECT 'has_urgent' AS cls, c_custkey FROM $c
          WHERE c_custkey < 50 AND EXISTS (SELECT 1 FROM $o WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        UNION ALL
        SELECT 'no_urgent' AS cls, c_custkey FROM $c
          WHERE c_custkey < 50 AND NOT EXISTS (SELECT 1 FROM $o WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        ORDER BY cls, c_custkey
      """)
      Seq(c, o).foreach(s.catalog.dropTempView)
      df
    }),

    // RANGE window frame (value-based, not row-based): events in the
    // trailing hour per user. Seconds-granularity key on both engines.
    "q38_range_window" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_sec")).rangeBetween(-3600, 0)
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("ts_sec"))
        .withColumn("n_last_hour", count(lit(1)).over(w))
        .select(col("user_id"), col("event_id"), col("n_last_hour"))
        .orderBy("user_id", "event_id")
    }),

    // Regex scalar functions: extract, global replace, match-test.
    "q39_regex_funcs" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_custkey") < 100)
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)$", 1).as("cust_num"),
          regexp_replace(col("c_name"), "[0-9]", "#").as("masked_name"),
          col("c_mktsegment").rlike("AUTO|BUILD").as("seg_match")
        )
        .orderBy("c_custkey")
    }),

    // FILTER-clause conditional aggregates (ANSI) — one pass computing
    // differently-predicated aggregates, instead of self-joining.
    "q40_filter_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("count(*) FILTER (WHERE l_discount > 0.05)").as("n_discounted"),
          expr("round(sum(l_extendedprice) FILTER (WHERE l_quantity > 25), 2)").as("rev_bulk"),
          count(lit(1)).as("n_total")
        )
        .orderBy("l_returnflag")
    }),

    // Array position explode + per-position aggregate — the column-wise
    // profile of the embedding corpus (posexplode == UNNEST WITH
    // ORDINALITY). One shuffle keyed on the 64 positions.
    "q41_posexplode_agg" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("pos")
        .agg(
          round(avg(col("v")), 4).as("mean_v"),
          round(min(col("v")).cast("double"), 6).as("min_v"),
          round(max(col("v")).cast("double"), 6).as("max_v")
        )
        .orderBy("pos")
    }),

    // Ordered string aggregation (listagg/string_agg): deterministic via
    // explicit lexicographic element order on both engines.
    "q42_string_agg" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_custkey") < 50)
        .groupBy("c_mktsegment")
        .agg(
          expr("array_join(array_sort(collect_list(CAST(c_custkey AS STRING))), ',')").as("custkeys"),
          count(lit(1)).as("n")
        )
        .orderBy("c_mktsegment")
    }),

    // Approximate percentile (t-digest/GK-style sketches differ per
    // engine) — same tolerance-band oracle pattern as q25: each engine
    // emits the exact percentile plus a boolean saying its own sketch
    // landed within 1% of it.
    "q44_approx_percentile" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.5d)"), 4).as("exact_p50"), // 4dp: see q28
          (abs(
            expr("percentile_approx(l_extendedprice, 0.5d, 10000)") /
              expr("percentile(l_extendedprice, 0.5d)") - 1
          ) <= 0.01).as("p50_within_1pct"),
          round(expr("percentile(l_extendedprice, 0.95d)"), 4).as("exact_p95"),
          (abs(
            expr("percentile_approx(l_extendedprice, 0.95d, 10000)") /
              expr("percentile(l_extendedprice, 0.95d)") - 1
          ) <= 0.01).as("p95_within_1pct")
        )
        .orderBy("l_returnflag")
    }),

    // Null-handling scalar functions: nullif / coalesce / greatest /
    // least — the null-propagation corners every SQL port gets subtly
    // wrong.
    "q45_null_funcs" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_custkey") < 100)
        .select(
          col("c_custkey"),
          expr("nullif(c_mktsegment, 'BUILDING')").as("seg_or_null"),
          expr("coalesce(nullif(c_mktsegment, 'BUILDING'), 'SUPPRESSED')").as("seg_coalesced"),
          round(greatest(col("c_acctbal"), lit(0.0)), 2).as("bal_floor0"),
          round(least(col("c_acctbal"), lit(0.0)), 2).as("bal_cap0")
        )
        .orderBy("c_custkey")
    }),

    // Moving average over a bounded ROWS frame (7-row trailing window per
    // customer) — the row-frame twin of q38's RANGE frame.
    // Statistical-moment aggregates — the profiling family next to the
    // percentile/HLL sketches: correlation, covariance, dispersion, and
    // shape per group. All are single-pass partial-aggregable (Spark's
    // Imperative/DeclarativeAggregate), so the plan is one hash-agg
    // shuffle keyed on the group, same as a plain sum.
    "q48_stat_moments" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_covar"),
          round(stddev_samp(col("l_discount")), 6).as("discount_sd"),
          round(var_samp(col("l_tax")), 6).as("tax_var"),
          // Spark's skewness is the population g1; DuckDB's is the
          // bias-corrected sample G1 = g1 * sqrt(n(n-1))/(n-2). Apply the
          // exact correction so the engines agree at ANY group size (at
          // sf0.01+ the factor hides below 6dp; at sf0.001 it does not).
          round(
            skewness(col("l_extendedprice")) *
              sqrt(count(lit(1)) * (count(lit(1)) - 1)) / (count(lit(1)) - 2),
            6
          ).as("price_skew")
        )
        .orderBy("l_returnflag")
    }),

    "q46_moving_avg" -> ((s, dir) => {
      val w = Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-6, 0)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 20)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          round(avg(col("o_totalprice")).over(w), 2).as("trailing_avg_7")
        )
        .orderBy("o_custkey", "o_orderkey")
    }),

    // first/last/nth window values over an explicit full-partition frame
    // (last_value needs UNBOUNDED FOLLOWING to be well-defined).
    "q43_first_last_window" -> ((s, dir) => {
      val w = Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 20)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          last(col("o_orderkey")).over(w).as("last_ok"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_ok")
        )
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Higher-order array functions: transform/filter/aggregate/zip_with
    // evaluate INSIDE the row projection — no explode, no shuffle, no UDF.
    // At 100 TB a per-row fold beats q41's posexplode+groupBy shape
    // whenever the result stays row-aligned (one output row per vector).
    "q54_higher_order_funcs" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .filter(col("vec_id") < 200)
        .select(
          col("vec_id"),
          round(aggregate(transform(col("embedding"), _.cast("double")), lit(0.0), _ + _), 4)
            .as("sum_all"),
          size(filter(col("embedding"), _ > lit(0f))).cast("long").as("n_pos"),
          round(
            aggregate(
              zip_with(col("embedding"), reverse(col("embedding")),
                (a, b) => a.cast("double") * b.cast("double")),
              lit(0.0), _ + _),
            4).as("dot_rev")
        )
        .orderBy("vec_id")
    }),

    // Map functions: per-user event-type histogram built as a native map
    // column (map_from_entries), then queried with map_keys / element_at /
    // map_filter / map_values — the map stays inside one hash aggregate +
    // projection, never exploded back out. The oracle recomputes the same
    // scalars relationally, checking the map semantics, not the storage.
    "q55_map_funcs" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("user_id") < 100)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(map_from_entries(array_sort(collect_list(struct(col("event_type"), col("n"))))).as("m"))
        .select(
          col("user_id"),
          array_join(array_sort(map_keys(col("m"))), ",").as("types_seen"),
          coalesce(element_at(col("m"), "click"), lit(0L)).as("n_click"),
          size(map_filter(col("m"), (_, v) => v >= 3)).cast("long").as("n_types_3plus"),
          aggregate(map_values(col("m")), lit(0L), _ + _).as("n_events")
        )
        .orderBy("user_id")
    }),

    // Table-generating sequence: each order expands to its 3-day active
    // window (sequence + explode). Generation is per-row and pipelined —
    // the only wide operation is the final sort.
    "q56_sequence_explode" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 50)
        .select(
          col("o_orderkey"),
          explode(sequence(to_date(col("o_orderdate")), date_add(to_date(col("o_orderdate")), 2)))
            .as("active_day"),
          round(col("o_totalprice") / 3, 2).as("daily_price")
        )
        .orderBy("o_orderkey", "active_day")
    }),

    // Mode + exact interpolated percentiles per group — one hash aggregate.
    "q57_mode_median" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          // deterministic=true: frequency ties return the LOWEST value —
          // bare mode() picks an arbitrary tie member per engine, so the
          // oracle could only pass by fixture luck.
          expr("mode(o_orderpriority, true)").as("top_priority"),
          round(median(col("o_totalprice")), 2).as("median_price"),
          round(percentile(col("o_totalprice"), lit(0.25)), 2).as("p25_price"),
          count(lit(1)).as("n")
        )
        .orderBy("o_orderstatus")
    }),

    // Linear-regression aggregates: slope/intercept/r2/count in one pass —
    // the single-shuffle way to fit per-group trend lines at 100 TB.
    "q58_regr_aggs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).cast("long").as("n_pairs"),
          round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 4).as("avg_qty")
        )
        .orderBy("l_returnflag")
    }),

    // Bitwise aggregates + scalar bit ops (codegen'd integer ALU work).
    "q59_bitwise" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          bit_and(col("l_linenumber").cast("long")).as("ln_and"),
          bit_or(col("l_linenumber").cast("long")).as("ln_or"),
          bit_xor(col("l_orderkey")).as("ok_xor"),
          count(lit(1)).as("n")
        )
        .select(
          col("l_returnflag"), col("ln_and"), col("ln_or"), col("ok_xor"),
          shiftleft(col("ln_or"), 2).as("ln_or_shl2"),
          (col("ok_xor").bitwiseAND(lit(255L))).as("ok_xor_low8"),
          col("n")
        )
        .orderBy("l_returnflag")
    }),

    // IGNORE NULLS window variants: lag/lead/last skipping nulls — the
    // gap-filling idiom (carry the last observed reading forward) that a
    // naive self-join would turn into a range join.
    "q60_ignore_nulls_window" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .filter(col("user_id") < 20)
        .select(col("event_id"), col("user_id"),
          when(col("value") > 50, round(col("value"), 2)).as("big_v"))
        .select(
          col("event_id"), col("user_id"), col("big_v"),
          lag(col("big_v"), 1, null, ignoreNulls = true).over(w).as("prev_big"),
          lead(col("big_v"), 1, null, ignoreNulls = true).over(w).as("next_big"),
          last(col("big_v"), ignoreNulls = true).over(wf).as("filled_v")
        )
        .orderBy("user_id", "event_id")
    }),

    // TPC-H Q18 shape (large-volume orders): a grouped-HAVING IN-subquery
    // gating a 3-table join, then re-aggregation and a deterministic
    // top-100. The IN side plans as a semi-join on the order key; both
    // aggs are map-side combined; the top-100 is TakeOrderedAndProject.
    "q70_tpch_q18_shape" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val big = li.groupBy("l_orderkey").agg(sum("l_quantity").as("sq")).filter(col("sq") > 150)
        .select(col("l_orderkey").as("o_orderkey"))
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(big, "o_orderkey")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(
          col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          round(col("o_totalprice"), 2).as("o_totalprice")
        )
        .agg(round(sum("l_quantity"), 2).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q21 shape (the lone-late-supplier query): suppliers whose
    // line shipped >60 days after the order date in a multi-supplier
    // order where EVERY OTHER supplier shipped on time. The textbook
    // form is an EXISTS + NOT-EXISTS double-correlation; Catalyst
    // decorrelates that into two extra shuffled joins over lineitem
    // (three scans of the fact). Decorrelated by hand instead into ONE
    // orderkey shuffle: a window over the order's lines carries the
    // distinct-supplier set and the distinct-LATE-supplier set, and a
    // line wins iff it is late, the order has >=2 suppliers, and the
    // late set is exactly {its own supplier}. Identical result (the
    // oracle keeps the EXISTS form); lineitem is scanned once and the
    // collect_set state per order is bounded by suppliers-per-order
    // (~4 in TPC-H), so the window never holds a skewable payload.
    "q71_late_supplier" -> ((s, dir) => {
      val ordF = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val lines = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(ordF, col("o_orderkey") === col("l_orderkey"))
        .select(
          col("l_orderkey"), col("l_suppkey"),
          expr("l_shipdate > o_orderdate + INTERVAL 60 DAY").as("is_late"))
      val w = Window.partitionBy("l_orderkey")
      val winners = lines
        .withColumn("all_supps", collect_set(col("l_suppkey")).over(w))
        .withColumn("late_supps", collect_set(when(col("is_late"), col("l_suppkey"))).over(w))
        .filter(col("is_late") && size(col("all_supps")) >= 2 && size(col("late_supps")) === 1)
      winners
        .join(broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))),
          col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // TPC-H Q2 shape (min-cost supplier): the correlated-scalar-MIN
    // pattern — for each part, the supplier(s) achieving its minimum
    // unit price. Decorrelated by hand into one per-part min aggregate
    // joined back (the plan Catalyst derives from the textbook form; the
    // oracle keeps the correlated subquery). Ties keep every achieving
    // supplier; equality compares the UNROUNDED division, identical
    // IEEE in both engines.
    "q78_min_cost_supplier" -> ((s, dir) => {
      val parts = t(s, dir, "part").filter(col("p_partkey") < 100).select(col("p_partkey"))
      val li = t(s, dir, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      val minUp = li.groupBy("l_partkey").agg(min(col("unit_price")).as("min_up"))
      li
        .join(minUp, "l_partkey")
        .filter(col("unit_price") === col("min_up"))
        .join(broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))),
          col("s_suppkey") === col("l_suppkey"))
        .select(col("l_partkey").as("p_partkey"), col("s_name"),
          round(col("unit_price"), 4).as("unit_price"))
        .distinct() // a supplier with two min-price lines counts once
        .orderBy("p_partkey", "s_name")
    }),

    // TPC-H Q11 shape (important stock): fraction-of-total HAVING — keep
    // part values above 0.1% of the group total. The total is a 1-row
    // broadcast scalar, not a correlated re-aggregation; ordering is on
    // the ROUNDED value so the top-20 cut is engine-portable.
    "q79_important_parts" -> ((s, dir) => {
      val pv = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")
          .filter(col("s_nationkey") < 5).select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice")).as("value"))
      pv
        .crossJoin(broadcast(pv.agg((sum(col("value")) * 0.001).as("cutoff"))))
        .filter(col("value") > col("cutoff"))
        .select(col("l_partkey"), round(col("value"), 2).as("total_value"))
        .orderBy(col("total_value").desc, col("l_partkey"))
        .limit(20)
    }),

    // TPC-H Q20 shape (suppliers of heavily-shipped interesting parts):
    // the nested IN + grouped HAVING — suppliers with some 'red%' part
    // TPC-H Q22 shape: well-funded customers (balance above the positive
    // average for their segment of nations) with no RECENT order — the
    // scalar correlated subquery + NOT EXISTS pair on a lapsed-customer
    // cutoff. Plans as: a 1-row broadcast scalar (the average), then a
    // LEFT ANTI join against the date-filtered orders (the filter pushes
    // to the orders scan) — the decorrelation Catalyst applies to the
    // textbook form, written directly so no per-row re-scan can ever
    // appear. The oracle keeps the correlated NOT EXISTS form.
    "q82_idle_customers" -> ((s, dir) => {
      val cutoff = "2001-01-01"
      val cust = t(s, dir, "customer").filter(col("c_nationkey") < 10)
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg(avg(col("c_acctbal")).as("avg_bal"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
        .select(col("o_custkey"))
      cust
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy("c_nationkey")
    }),

    // whose lines they shipped total >50 units. Plans as: broadcast the
    // name-filtered part ids, one (supp, part) aggregate, HAVING, then
    // a semi-shaped distinct join to supplier.
    "q80_heavy_red_suppliers" -> ((s, dir) => {
      val redParts = t(s, dir, "part")
        .filter(col("p_name").startsWith("red")).select(col("p_partkey"))
      val qualified = t(s, dir, "lineitem")
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity")).as("sq"))
        .filter(col("sq") > 50)
        .select(col("l_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(qualified, col("s_suppkey") === col("l_suppkey"))
        .select(col("s_name"))
        .orderBy("s_name")
    }),

    // TPC-H Q7 shape (nation-pair trade volume): a 6-table join where
    // the two nation dims broadcast and the fact-side joins shuffle on
    // their keys — the canonical star-join-with-two-role-playing-dims.
    "q72_nation_volume" -> ((s, dir) => {
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(n1), col("sn_key") === col("s_nationkey"))
        .join(broadcast(n2), col("cn_key") === col("c_nationkey"))
        .filter(col("sn_key") < 3 && col("cn_key") < 3 && col("sn_key") =!= col("cn_key"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // GROUPING()/grouping-id flags over ROLLUP: the aggregation-level
    // indicator that lets a consumer tell a real NULL key from a
    // subtotal row. The id is composed from the GROUPING bits explicitly
    // (g_flag*2 + g_status) so it is engine-portable rather than relying
    // on each engine's native grouping_id bit order.
    "q75_grouping_id" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          (grouping(col("l_returnflag")).cast("long") * 2 + grouping(col("l_linestatus"))).as("gid"),
          count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty")
        )
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("g_flag"), col("g_status"), col("gid"), col("n"), col("sum_qty")
        )
        .orderBy("gid", "returnflag", "linestatus")
    }),

    // CDC MERGE apply (upsert + delete): a changelog (latest recent order
    // per customer; every 13th key a delete) applied to a snapshot —
    // deletes as a LEFT ANTI join, upserts as a left join + coalesce.
    // The parquet-native spelling of MERGE INTO: one window for
    // latest-per-key, two keyed joins, no driver involvement.
    "q74_cdc_merge_apply" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val cutoff = orders.agg((max(col("o_orderdate")) - expr("INTERVAL 90 DAY")).as("cut"))
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val changes = orders
        .crossJoin(broadcast(cutoff)) // 1-row scalar cutoff
        .filter(col("o_orderdate") >= col("cut"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("o_custkey").as("key"),
          when(col("o_custkey") % 13 === 0, "D").otherwise("U").as("op"),
          round(col("o_totalprice"), 2).as("new_bal")
        )
      val upserts = changes.filter(col("op") === "U").select("key", "new_bal")
      val deletes = changes.filter(col("op") === "D").select("key")
      t(s, dir, "customer")
        .join(deletes, col("c_custkey") === deletes("key"), "left_anti")
        .join(upserts, col("c_custkey") === upserts("key"), "left")
        .select(
          col("c_custkey"),
          col("c_name"),
          round(coalesce(col("new_bal"), col("c_acctbal")), 2).as("acctbal"),
          col("key").isNotNull.as("updated")
        )
        .orderBy("c_custkey")
    }),

    // Chi-square independence statistic over a contingency table
    // (event_type x user-bucket): observed-vs-expected computed from
    // three keyed aggs + two tiny broadcast joins — the hypothesis-test
    // building block, fully distributed (no cell matrix ever collects).
    // Sums are cast to double before the r*c product so the expected-
    // count arithmetic cannot overflow at scale.
    "q73_chi_square" -> ((s, dir) => {
      val cell = t(s, dir, "events")
        .groupBy(col("event_type"), (col("user_id") % 5).as("bucket"))
        .agg(count(lit(1)).as("o"))
      val rt = cell.groupBy("event_type").agg(sum("o").as("r"))
      val ct = cell.groupBy("bucket").agg(sum("o").as("c"))
      val n = cell.agg(sum("o").as("n"))
      cell
        .join(broadcast(rt), "event_type")
        .join(broadcast(ct), "bucket")
        .crossJoin(broadcast(n))
        .select(
          col("event_type"), col("bucket"), col("o"),
          (col("r").cast("double") * col("c") / col("n")).as("e"),
          col("n")
        )
        .agg(
          round(sum(pow(col("o") - col("e"), 2) / col("e")), 4).as("chi2"),
          ((countDistinct(col("event_type")) - 1) * (countDistinct(col("bucket")) - 1)).cast("long").as("dof"),
          max(col("n")).as("n_obs")
        )
    }),

    // NULL-safe equi-join (<=> / IS NOT DISTINCT FROM): null keys MATCH
    // each other — the semantics a naive `=` join silently drops. Nulls
    // synthesized deterministically (every key ≡ 3 mod 7); the null
    // group's presence in the output is the property under test. <=> is
    // still an equi-join for the planner: hash-partitionable, no
    // nested loop.
    "q68_null_safe_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .filter(col("c_custkey") <= 20)
        .select(col("c_custkey"), expr("nullif(c_nationkey % 7, 3)").cast("long").as("k"))
      val o = t(s, dir, "orders")
        .filter(col("o_custkey") <= 20)
        .select(expr("nullif(o_custkey % 7, 3)").cast("long").as("k2"))
      c.join(o, col("k") <=> col("k2"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_pairs"), countDistinct(col("c_custkey")).as("n_cust"))
        .orderBy("k")
    }),

    // Collation-aware grouping (Spark 4 collations): mixed-case keys
    // (case variance synthesized deterministically from c_custkey parity)
    // grouped under UTF8_LCASE — the engine-level case-insensitive
    // equality that otherwise needs lower() wrappers on every reference.
    // The emitted key is lower()ed because a case-insensitive group's
    // representative variant is engine-chosen; n_case_variants proves
    // the group really folded distinct binary strings.
    "q67_collation_group" -> ((s, dir) => {
      val seg = when(col("c_custkey") % 2 === 1, initcap(lower(col("c_mktsegment"))))
        .otherwise(col("c_mktsegment"))
      t(s, dir, "customer")
        .select(seg.as("seg"))
        .select(expr("seg COLLATE UTF8_LCASE").as("k"), col("seg"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), countDistinct(col("seg")).as("n_case_variants"))
        .select(lower(col("k")).as("segment"), col("n"), col("n_case_variants"))
        .orderBy("segment")
    }),

    // VARIANT semi-structured extraction (Spark 4's open JSON type):
    // parse_json once into a VARIANT column, typed path extraction via
    // try_variant_get (null on cast failure — mirrors DuckDB TRY_CAST),
    // then aggregate. The variant parse is a single codegen'd pass;
    // unlike q35's from_json it needs no schema up front — the
    // schema-on-read shape for heterogeneous event payloads.
    "q66_variant_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .selectExpr("event_type", "parse_json(props) AS v")
        .selectExpr("event_type", "try_variant_get(v, '$.k', 'int') AS k")
        .where(col("k").isNotNull)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          max(col("k")).as("max_k"),
          countDistinct(col("k")).as("n_distinct_k")
        )
        .orderBy("event_type")
    }),

    // Columnar-format interop beyond parquet: the documents slice round-
    // trips through ORC (Spark-native, no extra dependency) and is read
    // back with a pushed-down predicate — the format a warehouse
    // migration actually hands an engine. The aggregate runs over the
    // ORC scan, so the oracle (same aggregate over the parquet source)
    // proves the format conversion byte-preserves the columns AND the
    // ORC reader's pushdown path returns exactly the matching rows.
    // FormatRoundTripSpec pins that the ORC scan really prunes
    // (PushedFilters non-empty on the second scan).
    "q98_orc_roundtrip" -> ((s, dir) => {
      val tmp = rtPath("orc", dir)
      t(s, dir, "documents").write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .filter(col("lang") === "en" && col("n_chars") >= 50)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("doc_id")).as("min_doc"))
        .orderBy("source")
    }),

    // Row-format interop: the documents slice framed into REAL Avro
    // object-container segments (deflate codec) by the hand-built
    // [[graft.sources.AvroCodec]] and parsed back executor-side — the
    // w01 WARC shape for the format a Kafka/ingest pipeline actually
    // hands over. Segment key doc_id div 256, so segment count grows
    // with the corpus (blocks-within-segment are the finer parallel
    // unit OCF's sync markers exist for); one keyed shuffle, no driver
    // materialization. Per-record output carries every field plus the
    // text's md5-prefix hash, so the oracle (same projection over the
    // parquet source) proves the varint/deflate/sync framing preserves
    // every byte. Library interop (avro-1.12.1 reads our bytes, we
    // read its) is pinned in AvroCodecSpec.
    "q100_avro_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val schema = graft.sources.AvroCodec.FlatSchema("document", Seq(
        "doc_id" -> "long", "text" -> "string", "lang" -> "string",
        "source" -> "string", "n_chars" -> "long"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .as[(Long, String, String, String, Long)]
        .groupByKey(_._1 / 256)
        .flatMapGroups { (_, it) =>
          val recs = it.toSeq.sortBy(_._1)
          val ocf = graft.sources.AvroCodec.write(
            schema,
            recs.iterator.map(r => Seq[Any](r._1, r._2, r._3, r._4, r._5)),
            codec = "deflate", recordsPerBlock = 64)
          val (sch, rows) = graft.sources.AvroCodec.parse(ocf)
          require(sch.fields == schema.fields, s"schema did not round-trip: ${sch.fields}")
          rows.iterator.map { r =>
            (r(0).asInstanceOf[Long], r(1).asInstanceOf[String], r(2).asInstanceOf[String],
              r(3).asInstanceOf[String], r(4).asInstanceOf[Long])
          }
        }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .select(
          col("doc_id"), col("lang"), col("source"), col("n_chars"),
          length(col("text")).as("text_chars"),
          expr("CAST(conv(substr(md5(CAST(text AS BINARY)), 1, 15), 16, 10) AS BIGINT)").as("text_hash"))
        .orderBy("doc_id")
    }),

    // Training-loader interop: the documents slice framed into REAL
    // TFRecord files (masked-CRC32C frames, one tf.train.Example
    // protobuf per doc) by the hand-built
    // [[graft.sources.TfRecordCodec]] and parsed back executor-side.
    // TFRecord has no intra-file split marker (unlike OCF sync /
    // WARC gzip members), so the parallel unit is the FILE: the same
    // doc_id-div-256 grouping as q100 makes file count grow with the
    // corpus, which is exactly how tf.data shards at scale. One keyed
    // shuffle, no driver materialization; both CRCs verified on every
    // frame read. Oracle = same projection over the parquet source,
    // proving frame + protobuf encoding preserve every byte.
    "q101_tfrecord_roundtrip" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.TfRecordCodec
      import graft.sources.TfRecordCodec.{I64s, Strs}
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .as[(Long, String, String, String, Long)]
        .groupByKey(_._1 / 256)
        .flatMapGroups { (_, it) =>
          val recs = it.toSeq.sortBy(_._1)
          val file = TfRecordCodec.writeFrames(recs.iterator.map { r =>
            TfRecordCodec.encodeExample(Map(
              "doc_id" -> I64s(Seq(r._1)), "text" -> Strs(Seq(r._2)),
              "lang" -> Strs(Seq(r._3)), "source" -> Strs(Seq(r._4)),
              "n_chars" -> I64s(Seq(r._5))))
          })
          TfRecordCodec.readFrames(file).iterator.map { payload =>
            val f = TfRecordCodec.decodeExample(payload)
            def s1(k: String) = f(k).asInstanceOf[Strs].values.head
            def l1(k: String) = f(k).asInstanceOf[I64s].values.head
            (l1("doc_id"), s1("text"), s1("lang"), s1("source"), l1("n_chars"))
          }
        }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .select(
          col("doc_id"), col("lang"), col("source"), col("n_chars"),
          length(col("text")).as("text_chars"),
          expr("CAST(conv(substr(md5(CAST(text AS BINARY)), 1, 15), 16, 10) AS BIGINT)").as("text_hash"))
        .orderBy("doc_id")
    }),

    // Columnar-interchange interop: the documents slice through the
    // Arrow IPC FILE format (Feather v2) via [[graft.sources
    // .ArrowIpcCodec]] — the format training loaders and dataframe
    // libraries mmap, written with the REAL arrow-vector jars Spark
    // ships (bit-compatibility with that ecosystem is the point; the
    // hand-built rungs are q100/q101). Record batches are the
    // intra-file parallel unit (64 rows per batch here so every group
    // spans several), files the inter-task one — same doc_id-div-256
    // grouping as q100/q101, one keyed shuffle, no driver
    // materialization. Oracle = same projection over the parquet
    // source. The STREAM framing is q103's rung; cross-framing
    // equality on identical input is pinned in ArrowIpcCodecSpec.
    "q102_arrow_roundtrip" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.ArrowIpcCodec
      val schema = ArrowIpcCodec.FlatSchema(Seq(
        "doc_id" -> "long", "text" -> "string", "lang" -> "string",
        "source" -> "string", "n_chars" -> "long"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .as[(Long, String, String, String, Long)]
        .groupByKey(_._1 / 256)
        .flatMapGroups { (_, it) =>
          val recs = it.toSeq.sortBy(_._1)
          val file = ArrowIpcCodec.write(
            schema,
            recs.map(r => Seq[Any](r._1, r._2, r._3, r._4, r._5)),
            rowsPerBatch = 64)
          val (sch, rows) = ArrowIpcCodec.parse(file)
          require(sch == schema, s"schema did not round-trip: ${sch.fields}")
          rows.iterator.map { r =>
            (r(0).asInstanceOf[Long], r(1).asInstanceOf[String], r(2).asInstanceOf[String],
              r(3).asInstanceOf[String], r(4).asInstanceOf[Long])
          }
        }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .select(
          col("doc_id"), col("lang"), col("source"), col("n_chars"),
          length(col("text")).as("text_chars"),
          expr("CAST(conv(substr(md5(CAST(text AS BINARY)), 1, 15), 16, 10) AS BIGINT)").as("text_hash"))
        .orderBy("doc_id")
    }),

    // The Arrow IPC STREAM framing (no footer, EOS-terminated — the
    // socket/pipe hand-off a live training loader reads front-to-back,
    // pyarrow's RecordBatchStreamReader) as its own round-trip rung:
    // identical grouping/batching to q102, but the bytes carry the
    // stream framing end to end, so the oracle proves THAT framing
    // preserves every value — q102 covers the footer-indexed file
    // layout, this covers the hand-off layout.
    "q103_arrow_stream_roundtrip" -> ((s, dir) => {
      import s.implicits._
      import graft.sources.ArrowIpcCodec
      val schema = ArrowIpcCodec.FlatSchema(Seq(
        "doc_id" -> "long", "text" -> "string", "lang" -> "string",
        "source" -> "string", "n_chars" -> "long"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .as[(Long, String, String, String, Long)]
        .groupByKey(_._1 / 256)
        .flatMapGroups { (_, it) =>
          val recs = it.toSeq.sortBy(_._1)
          val payload = ArrowIpcCodec.writeStream(
            schema,
            recs.map(r => Seq[Any](r._1, r._2, r._3, r._4, r._5)),
            rowsPerBatch = 64)
          val (sch, rows) = ArrowIpcCodec.parseStream(payload)
          require(sch == schema, s"schema did not round-trip: ${sch.fields}")
          rows.iterator.map { r =>
            (r(0).asInstanceOf[Long], r(1).asInstanceOf[String], r(2).asInstanceOf[String],
              r(3).asInstanceOf[String], r(4).asInstanceOf[Long])
          }
        }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .select(
          col("doc_id"), col("lang"), col("source"), col("n_chars"),
          length(col("text")).as("text_chars"),
          expr("CAST(conv(substr(md5(CAST(text AS BINARY)), 1, 15), 16, 10) AS BIGINT)").as("text_hash"))
        .orderBy("doc_id")
    }),

    // CONTENT-ADDRESSED CORPUS MANIFEST — the integrity/diff primitive
    // a replicated 100 TB corpus needs: leaves are md5(text); leaves
    // bucket by their first hex char into 16 shard digests
    // (md5 of the bucket's SORTED leaf concatenation — canonical, so
    // the digest is invariant to ingest order and partitioning), and
    // the corpus root hashes the bucket digests in bucket order. Two
    // mirrors compare roots in O(1); a mismatch narrows to the
    // differing buckets, then to leaves — log-style drill-down with
    // only the 16-row manifest exchanged. Shapes: one scan, bucket is
    // a high-cardinality-safe group key (16 here, 4096 via a wider
    // prefix at scale — the knob bounds per-bucket concat size), the
    // root folds 16 bounded rows. Everything is md5 over hex strings,
    // so DuckDB replays the whole tree bit-for-bit.
    "q106_corpus_manifest" -> ((s, dir) => {
      val leaves = t(s, dir, "documents")
        .select(md5(col("text")).as("h"))
        .select(substring(col("h"), 1, 1).as("bucket"), col("h"))
      // checkpointed: the bucket digests feed BOTH the 16-row output and
      // the root fold — without it the corpus scan + collect_list agg
      // runs twice (the p04/ivfTopK multi-consumer pattern)
      val buckets = leaves
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          md5(expr("CAST(array_join(array_sort(collect_list(h)), '') AS BINARY)")).as("digest"))
        .localCheckpoint()
      val root = buckets
        .select(struct(col("bucket"), col("digest")).as("bd"))
        .agg(md5(expr(
          "CAST(array_join(transform(array_sort(collect_list(bd)), x -> x.digest), '') AS BINARY)"))
          .as("corpus_root"))
      buckets.crossJoin(broadcast(root)).orderBy("bucket")
    }),

    // Parquet BLOOM-FILTER point lookup — the storage feature that
    // covers what q105's min/max stats CANNOT: equality lookups on a
    // column with no sort locality. The corpus is written ordered by
    // an md5 shuffle key (so every row group spans the full doc_id
    // range and stats prune nothing) WITH a parquet bloom filter on
    // doc_id (`parquet.bloom.filter.enabled#doc_id` — the write-side
    // option a 100 TB point-lookup table needs; parquet-mr then skips
    // non-matching row groups at read time, asserted structurally in
    // FormatRoundTripSpec via the footer's bloom offsets and the
    // pushed EqualTo). The emitted rows are the point-lookup results
    // for a fixed id set, which DuckDB recomputes from the source —
    // proving the blooms' zero-false-negative contract end to end.
    "q104_bloom_pointlookup" -> ((s, dir) => {
      // stable overwrite-mode path (the q99 idiom): repeated suite/bench
      // invocations reuse one directory instead of accumulating a fresh
      // corpus copy per run
      val base = rtPath("bloom", dir)
      t(s, dir, "documents")
        .orderBy(md5(col("text")))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#doc_id", "true")
        .option("parquet.bloom.filter.expected.ndv#doc_id", "100000")
        .parquet(base)
      s.read.parquet(base)
        .filter(col("doc_id").isin(7L, 42L, 137L, 256L, 499L))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          length(col("text")).as("text_chars"))
        .orderBy("doc_id")
    }),

    // Z-ORDER data layout — the lake-table clustering move (Delta/
    // Iceberg OPTIMIZE ZORDER): multi-dimensional locality so that
    // min/max row-group statistics can prune a multi-predicate scan.
    // The corpus is written twice into range-partitioned files: once
    // linearly by doc_id (the default arrival order — every file then
    // spans the FULL range of both query dimensions, so stats prune
    // nothing), and once by the 32-bit Morton z-value interleaving the
    // two dimensions' low 16 bits (a pure codegen bit expression — no
    // UDF). Per-file (min,max) envelopes are then computed for both
    // layouts and intersected with a fixed quarter-by-quarter box
    // predicate: the emitted soundness row pins that the z-order
    // layout leaves STRICTLY fewer stats-candidate files AND no more
    // than half the file count (the IO the layout saves at 100 TB,
    // where candidate files = row groups actually read), plus the box
    // row count itself, which DuckDB genuinely recomputes. Dimension y
    // is an md5-derived shard key, deliberately uncorrelated with the
    // linear order so the linear layout cannot prune by accident.
    "q105_zorder_layout" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").cast("long").as("x"),
          pmod(expr("CAST(conv(substr(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 8), 16, 10) AS BIGINT)"),
            lit(1024L)).as("y"))
      val zBits = (0 until 16).map(b =>
        s"shiftleft((x >> $b) & 1, ${2 * b + 1}) | shiftleft((y >> $b) & 1, ${2 * b})")
        .mkString("(", ") | (", ")")
      // stable overwrite-mode path (the q99 idiom) — no per-run dir leak
      val base = rtPath("zorder", dir)
      docs.repartitionByRange(16, col("doc_id"))
        .write.mode("overwrite").parquet(s"$base/linear")
      docs.withColumn("z", expr(zBits))
        .repartitionByRange(16, col("z"))
        .drop("z")
        .write.mode("overwrite").parquet(s"$base/zorder")
      // ONE set of query-box bounds for both the envelope test and the
      // box row count (duplicated literals here and in `boxRows` could
      // silently desynchronize the pinned pruning booleans from the row
      // count that justifies them; the DuckDB oracle's copy is pinned by
      // the box_rows value check)
      val (xLo, xHi, yLo, yHi) = (100L, 300L, 256L, 511L)
      // per-file min/max envelopes (what row-group/file stats expose)
      def candidates(path: String): DataFrame = {
        s.read.parquet(path)
          .groupBy(input_file_name().as("f"))
          .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
            min(col("y")).as("y0"), max(col("y")).as("y1"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(when(!(col("x1") < xLo || col("x0") > xHi || col("y1") < yLo || col("y0") > yHi), 1L)
              .otherwise(0L)).as("n_candidates"))
      }
      val lin = candidates(s"$base/linear")
        .select(col("n_files").as("files_linear"), col("n_candidates").as("cand_linear"))
      val zo = candidates(s"$base/zorder")
        .select(col("n_files").as("files_zorder"), col("n_candidates").as("cand_zorder"))
      val boxRows = docs
        .filter(col("x").between(xLo, xHi) && col("y").between(yLo, yHi))
        .agg(count(lit(1)).as("box_rows"))
      lin.crossJoin(zo).crossJoin(boxRows)
        .select(
          (col("cand_zorder") < col("cand_linear")).as("zorder_prunes_more"),
          (col("cand_zorder") * 2 <= col("files_zorder")).as("zorder_prunes_half"),
          (col("cand_linear") === col("files_linear")).as("linear_prunes_nothing"),
          col("box_rows"))
    }),

    // Z-ORDER WRITER — q105's pruning measurement driven through the
    // PRODUCTION write path ([[graft.sources.LakeLayout
    // .writeParquetZOrdered]]: equi-width quantization over
    // driver-collected min/max, d-dim Morton interleave, range
    // partition + in-file sort, helper column dropped) instead of
    // q105's inline demonstration expression. Same dimensions, same
    // quarter-by-quarter box; the soundness row pins the same three
    // layout facts plus ROW CONSERVATION (n_rows read back from the
    // written table — the writer may only move rows, never change
    // their count), which DuckDB genuinely recomputes along with
    // box_rows. At the 10x fixture the same writer leaves 5/16
    // candidate files vs the linear layout's 16/16
    // (bench_scale.json `zorder_writer_10x`).
    "q107_zorder_write" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").cast("long").as("x"),
          pmod(expr("CAST(conv(substr(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 8), 16, 10) AS BIGINT)"),
            lit(1024L)).as("y"))
      // stable overwrite-mode path (the q99 idiom) — no per-run dir leak
      val base = rtPath("zorder_writer", dir)
      docs.repartitionByRange(16, col("doc_id"))
        .write.mode("overwrite").parquet(s"$base/linear")
      graft.sources.LakeLayout.writeParquetZOrdered(
        docs, Seq("x", "y"), s"$base/zorder", numFiles = 16)
      val (xLo, xHi, yLo, yHi) = (100L, 300L, 256L, 511L)
      def candidates(path: String): DataFrame = {
        s.read.parquet(path)
          .groupBy(input_file_name().as("f"))
          .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
            min(col("y")).as("y0"), max(col("y")).as("y1"))
          .agg(
            count(lit(1)).as("n_files"),
            sum(when(!(col("x1") < xLo || col("x0") > xHi || col("y1") < yLo || col("y0") > yHi), 1L)
              .otherwise(0L)).as("n_candidates"))
      }
      val lin = candidates(s"$base/linear")
        .select(col("n_files").as("files_linear"), col("n_candidates").as("cand_linear"))
      val zo = candidates(s"$base/zorder")
        .select(col("n_files").as("files_zorder"), col("n_candidates").as("cand_zorder"))
      val conservation = s.read.parquet(s"$base/zorder")
        .agg(count(lit(1)).as("n_rows"))
      val boxRows = docs
        .filter(col("x").between(xLo, xHi) && col("y").between(yLo, yHi))
        .agg(count(lit(1)).as("box_rows"))
      lin.crossJoin(zo).crossJoin(boxRows).crossJoin(conservation)
        .select(
          (col("cand_zorder") < col("cand_linear")).as("zorder_prunes_more"),
          (col("cand_zorder") * 2 <= col("files_zorder")).as("zorder_prunes_half"),
          (col("cand_linear") === col("files_linear")).as("linear_prunes_nothing"),
          col("box_rows"), col("n_rows"))
    }),

    // SHARD SCHEMA EVOLUTION — the two-generation evolved read driven
    // end to end through the production container ([[graft.sources
    // .ShardSchemas]] + the [[graft.sources.TrainingShards.write]]
    // gate): generation 0 lands (doc_id, source, n_chars), a SUPERSET
    // append adds `lang`, and the read serves BOTH under the recorded
    // union schema — rows written before the column evolved read back
    // with it null. The aggregate proves exactly that: n_pre_evolution
    // counts lang-IS-NULL rows per source, which the oracle recomputes
    // from the generation split (doc_id < 250) — the two ways of
    // naming "written before the column existed" must agree, so a
    // chain regression (dropped column, wrong null-fill, inference
    // narrowing) flips the counts and fails the hash.
    "q108_shard_schema_evolution" -> ((s, dir) => {
      import graft.sources.TrainingShards
      val docs = t(s, dir, "documents")
      val base = rtPath("schema_evo", dir)
      // fresh dir per invocation: superseded layouts are now RETAINED
      // until vacuum (the time-travel contract), so a reused scratch
      // dir would accumulate one archived corpus per run
      val bp = new org.apache.hadoop.fs.Path(base)
      val bfs = bp.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (bfs.exists(bp)) bfs.delete(bp, true)
      TrainingShards.write(docs.filter(col("doc_id") < 250)
        .select("doc_id", "source", "n_chars"), base,
        maxDocsPerShard = 256, mode = "overwrite")
      TrainingShards.write(docs.filter(col("doc_id") >= 250)
        .select("doc_id", "source", "n_chars", "lang"), base, maxDocsPerShard = 256)
      TrainingShards.read(s, base)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_pre_evolution"),
          sum(col("n_chars")).as("chars_sum"))
        .orderBy("source")
    }),

    // TIME-TRAVEL shard reads ([[graft.sources.TrainingShards
    // .readAsOf]]) — the lakehouse completion of the generation
    // machinery: reproduce a training run against the exact corpus it
    // consumed. The script drives a real history: generation 0 lands
    // docs < 100 (no `lang`), an evolving append adds 100-199 WITH
    // `lang`, compaction supersedes that layout (archiving its
    // manifest + schema-as-of snapshot as generation 1, live marker
    // 2), then 200-249 append to the live generation. readAsOf(1)
    // must serve EXACTLY the pre-compaction corpus (docs < 200) and
    // readAsOf(2) the live one (docs < 250) — same files-by-manifest
    // discipline as read(), per archived snapshot. The oracle
    // recomputes both generations' populations from the documents
    // table (count, char mass, and pre-evolution null-lang rows), so
    // a snapshot serving the wrong file set, a schema-as-of dropping
    // the evolved column, or compaction corrupting a row all flip the
    // hash. Vacuum's fail-loudly contract is spec territory
    // (ShardTimeTravelSpec drives read-under-compaction and
    // read-after-vacuum).
    "q109_shard_time_travel" -> ((s, dir) => {
      import graft.sources.TrainingShards
      val docs = t(s, dir, "documents")
      val base = rtPath("timetravel", dir)
      // fresh history every invocation: generations are part of the
      // asserted output, so stale archives from a prior run must not
      // shift the numbering
      val p = new org.apache.hadoop.fs.Path(base)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      TrainingShards.write(docs.filter(col("doc_id") < 100)
        .select("doc_id", "source", "n_chars"), base,
        maxDocsPerShard = 64, mode = "overwrite")
      TrainingShards.write(docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)
        .select("doc_id", "source", "n_chars", "lang"), base, maxDocsPerShard = 64)
      TrainingShards.compact(s, base, maxDocsPerShard = 128)
      TrainingShards.write(docs.filter(col("doc_id") >= 200 && col("doc_id") < 250)
        .select("doc_id", "source", "n_chars", "lang"), base, maxDocsPerShard = 64)
      TrainingShards.generations(s, base).map { g =>
        TrainingShards.readAsOf(s, base, g)
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("chars_sum"),
            sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_no_lang"))
          .select(lit(g).as("generation"), col("n_docs"), col("chars_sum"), col("n_no_lang"))
      }.reduce(_ unionByName _).orderBy("generation")
    }),

    // Text-format interop: the same slice through CSV WITH quoting —
    // document text contains spaces (and could contain delimiters), so
    // the writer must quote and the reader must parse quotes + header +
    // an explicit schema (CSV carries no types). The oracle aggregate
    // over the parquet source proves the dialect round-trips the values
    // exactly; a length-preservation column guards the classic
    // quote-mangling failure mode.
    "q99_csv_roundtrip" -> ((s, dir) => {
      val tmp = rtPath("csv", dir)
      val docs = t(s, dir, "documents")
      docs.write.mode("overwrite").option("header", "true").option("quoteAll", "true").csv(tmp)
      // multiLine: the quoteAll writer legally emits embedded newlines
      // inside quotes, and the default line-split reader would shear such
      // a record into corrupt rows — the read must speak the full dialect
      // the writer can produce, not just what today's fixture exercises.
      s.read.schema(docs.schema).option("header", "true").option("multiLine", "true").csv(tmp)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("text_chars"),
          sum(col("n_chars")).as("n_chars_sum"))
        .withColumn("lengths_consistent", col("text_chars") === col("n_chars_sum"))
        .orderBy("lang")
    }),

    // LATERAL correlated subquery: top-2 orders per customer by price —
    // the per-row table-valued-subquery shape. Catalyst decorrelates the
    // correlated LIMIT into a partitioned rank filter, so the plan is one
    // keyed window over orders + one equi-join: no per-customer re-scan.
    "q62_lateral_topk" -> ((s, dir) => {
      val tag = java.util.UUID.randomUUID().toString.replace("-", "")
      val (c, o) = (s"customer_lat_$tag", s"orders_lat_$tag")
      t(s, dir, "customer").createOrReplaceTempView(c)
      t(s, dir, "orders").createOrReplaceTempView(o)
      val df = s.sql(s"""
        SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
        FROM $c c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM $o
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_custkey <= 50
        ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
      """)
      Seq(c, o).foreach(s.catalog.dropTempView)
      df
    }),

    // TPC-H Q13 shape (customer order-count distribution): the double
    // aggregation over a LEFT join — count per customer INCLUDING the
    // zero-order customers (count of the nullable side's key), then the
    // histogram of those counts. First agg shuffles on custkey; the
    // second is over at most max-orders-per-customer distinct values.
    "q83_order_count_dist" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      t(s, dir, "customer").select(col("c_custkey"))
        .join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q17 shape (small-quantity revenue): the correlated per-part
    // AVG subquery, decorrelated by hand into one per-part aggregate
    // joined back (partkey determines the part row, so averaging over
    // the part-filtered join equals averaging over all of lineitem for
    // those partkeys). Parts broadcast; lineitem is scanned once and
    // reused for both the average and the final filter.
    "q84_small_qty_revenue" -> ((s, dir) => {
      val parts = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#12" && col("p_size") < 5)
        .select(col("p_partkey"))
      val li = t(s, dir, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val avgQty = li.groupBy("l_partkey").agg((avg(col("l_quantity")) * 0.2).as("qty_cut"))
      li.join(avgQty, "l_partkey")
        .filter(col("l_quantity") < col("qty_cut"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    }),

    // TPC-H Q19 shape (disjunctive join predicates): three OR'd
    // brand/size/quantity conjunctions spanning both join sides. The
    // per-side implied envelopes (brand IN set + size bound; quantity
    // bound) are written as pre-join filters so they push into BOTH
    // scans — the residual OR evaluates post-join on survivors only.
    "q85_disjunctive_revenue" -> ((s, dir) => {
      val parts = t(s, dir, "part")
        .filter(col("p_brand").isin("Brand#2", "Brand#12", "Brand#23") && col("p_size") <= 15)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_quantity") <= 30)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 5) && col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 10) && col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 15) && col("l_quantity").between(20, 30))
        )
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }),

    // TPC-H Q9 shape (product-line profit by nation and year): the
    // name-LIKE part filter broadcast into a fact scan, supplier and
    // nation dims broadcast, profit = revenue minus a cost proxy from
    // the part's retail price (no partsupp table in this schema).
    "q86_profit_by_nation" -> ((s, dir) => {
      val parts = t(s, dir, "part")
        .filter(col("p_name").contains("red"))
        .select(col("p_partkey"), col("p_retailprice"))
      t(s, dir, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).cast("long").as("o_year"))
        .agg(round(sum(
          col("l_extendedprice") * (lit(1) - col("l_discount")) -
            lit(0.6) * col("p_retailprice") * col("l_quantity")), 2).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q15 shape (top supplier): revenue per supplier over one
    // quarter, keep the supplier(s) achieving the maximum — the
    // scalar-MAX-of-a-view pattern. The max is a 1-row broadcast scalar;
    // equality compares the ROUNDED revenue so ties are engine-portable.
    "q87_top_supplier" -> ((s, dir) => {
      val revenue = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("total_revenue"))
      revenue
        .crossJoin(broadcast(revenue.agg(max(col("total_revenue")).as("max_rev"))))
        .filter(col("total_revenue") === col("max_rev"))
        .join(broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_name"))),
          col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q16 shape (supplier count per part group): COUNT DISTINCT
    // over a relation with a NOT-IN exclusion list. The exclusion
    // (negative-balance suppliers) is a broadcast LEFT ANTI join — the
    // decorrelation Catalyst applies to NOT IN over a non-null key.
    // lineitem plays the part-supplier relation (no partsupp here).
    "q88_supplier_cnt" -> ((s, dir) => {
      val parts = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#5" && !col("p_type").startsWith("MEDIUM") &&
          col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val badSupp = t(s, dir, "supplier").filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }),

    // TPC-H Q10 shape (returned-item reporting): quarter of orders,
    // returned lines only, revenue per customer with nation context,
    // top 20. Date + returnflag filters push to the scans; nation
    // broadcasts; the join to orders/lineitem shuffles on its keys.
    "q89_returned_items" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val returned = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      t(s, dir, "customer")
        .join(orders, col("c_custkey") === col("o_custkey"))
        .join(returned, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q8 shape (national market share): one nation's share of a
    // region's volume per year — conditional-sum-over-sum on an 8-table
    // star join where every dim broadcasts and only the fact joins
    // shuffle. The share denominator is per-group, never zero for a
    // group that exists (volume > 0 on every contributing row).
    "q90_market_share" -> ((s, dir) => {
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val america = broadcast(t(s, dir, "region").filter(col("r_name") === "AMERICA"))
      val parts = t(s, dir, "part").filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      val orders = t(s, dir, "orders")
        .filter(col("o_orderdate").between(lit("1995-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
      t(s, dir, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(orders, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("cn_key") === col("c_nationkey"))
        .join(america, col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(n2), col("sn_key") === col("s_nationkey"))
        .select(year(col("o_orderdate")).cast("long").as("o_year"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"),
          col("supp_nation"))
        .groupBy("o_year")
        .agg(round(
          sum(when(col("supp_nation") === "NATION_5", col("volume")).otherwise(lit(0.0))) / sum(col("volume")),
          4).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q12 shape (late-line priority split): conditional-count
    // aggregation over a date-arithmetic join filter — lines shipped
    // more than 30 days after their order, split into high/low-priority
    // counts per line status (l_linestatus plays Q12's ship-mode role;
    // this schema has no l_shipmode). The shipdate year-range filter
    // pushes to the lineitem scan; the residual lateness predicate
    // evaluates post-join.
    "q93_late_line_priority" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
        .join(orders, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q75_grouping_id" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag, coalesce(l_linestatus, 'ALL') AS linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag, CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, returnflag, linestatus""".stripMargin,
    "q74_cdc_merge_apply" ->
      """WITH cutoff AS (SELECT max(o_orderdate) - INTERVAL 90 DAY AS cut FROM orders),
        |recent AS (SELECT o.* FROM orders o, cutoff WHERE o.o_orderdate >= cutoff.cut),
        |latest AS (
        |  SELECT o_custkey AS key, round(o_totalprice, 2) AS new_bal,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM recent),
        |changes AS (
        |  SELECT key, CASE WHEN key % 13 = 0 THEN 'D' ELSE 'U' END AS op, new_bal
        |  FROM latest WHERE rn = 1)
        |SELECT c.c_custkey, c.c_name,
        |  round(coalesce(u.new_bal, c.c_acctbal), 2) AS acctbal,
        |  (u.key IS NOT NULL) AS updated
        |FROM customer c
        |LEFT JOIN (SELECT * FROM changes WHERE op = 'U') u ON u.key = c.c_custkey
        |WHERE NOT EXISTS (SELECT 1 FROM changes d WHERE d.op = 'D' AND d.key = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q73_chi_square" ->
      """WITH cell AS (SELECT event_type, user_id % 5 AS bucket, count(*) AS o FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, sum(o) AS r FROM cell GROUP BY 1),
        |ct AS (SELECT bucket, sum(o) AS c FROM cell GROUP BY 1),
        |n AS (SELECT sum(o) AS n FROM cell)
        |SELECT round(sum(power(cell.o - (rt.r * ct.c / n.n), 2) / (rt.r * ct.c / n.n)), 4) AS chi2,
        |  CAST((count(DISTINCT cell.event_type) - 1) * (count(DISTINCT cell.bucket) - 1) AS BIGINT) AS dof,
        |  CAST(max(n.n) AS BIGINT) AS n_obs
        |FROM cell JOIN rt USING (event_type) JOIN ct USING (bucket), n""".stripMargin,
    "q70_tpch_q18_shape" ->
      """SELECT c.c_custkey, c.c_name, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
        |  round(o.o_totalprice, 2) AS o_totalprice, round(sum(l.l_quantity), 2) AS total_qty
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150)
        |GROUP BY 1, 2, 3, 4, 5 ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q78_min_cost_supplier" ->
      """SELECT DISTINCT p.p_partkey, s.s_name, round(l.l_extendedprice / l.l_quantity, 4) AS unit_price
        |FROM part p
        |JOIN lineitem l ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |WHERE p.p_partkey < 100
        |  AND l.l_extendedprice / l.l_quantity = (
        |    SELECT min(l2.l_extendedprice / l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
        |ORDER BY p.p_partkey, s.s_name""".stripMargin,
    "q79_important_parts" ->
      """WITH pv AS (SELECT l.l_partkey, sum(l.l_extendedprice) AS value
        |  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  WHERE s.s_nationkey < 5 GROUP BY 1)
        |SELECT l_partkey, round(value, 2) AS total_value FROM pv
        |WHERE value > (SELECT sum(value) * 0.001 FROM pv)
        |ORDER BY total_value DESC, l_partkey LIMIT 20""".stripMargin,
    "q82_idle_customers" ->
      """SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer c
        |WHERE c.c_nationkey < 10
        |  AND c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                     WHERE c2.c_acctbal > 0 AND c2.c_nationkey < 10)
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q80_heavy_red_suppliers" ->
      """SELECT s.s_name FROM supplier s
        |WHERE s.s_suppkey IN (
        |  SELECT l.l_suppkey FROM lineitem l
        |  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |  GROUP BY l.l_suppkey, l.l_partkey HAVING sum(l.l_quantity) > 50)
        |ORDER BY s.s_name""".stripMargin,
    "q71_late_supplier" ->
      """SELECT s.s_name, count(*) AS numwait
        |FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q72_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
        |JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
        |WHERE n1.n_nationkey < 3 AND n2.n_nationkey < 3 AND n1.n_nationkey <> n2.n_nationkey
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q68_null_safe_join" ->
      """WITH c AS (SELECT c_custkey, nullif(c_nationkey % 7, 3) AS k FROM customer WHERE c_custkey <= 20),
        |o AS (SELECT o_custkey, nullif(o_custkey % 7, 3) AS k2 FROM orders WHERE o_custkey <= 20)
        |SELECT CAST(c.k AS BIGINT) AS k, count(*) AS n_pairs, CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_cust
        |FROM c JOIN o ON c.k IS NOT DISTINCT FROM o.k2
        |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "q67_collation_group" ->
      """WITH s AS (SELECT CASE WHEN c_custkey % 2 = 1
        |  THEN concat(upper(substr(lower(c_mktsegment), 1, 1)), substr(lower(c_mktsegment), 2))
        |  ELSE c_mktsegment END AS seg FROM customer)
        |SELECT lower(seg) AS segment, count(*) AS n, CAST(count(DISTINCT seg) AS BIGINT) AS n_case_variants
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q66_variant_extract" ->
      """WITH j AS (SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
        |SELECT event_type, count(*) AS n, CAST(max(k) AS INT) AS max_k, CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k
        |FROM j WHERE k IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    // The round-trip queries' oracles aggregate the PARQUET source
    // directly: equality proves the ORC/CSV conversion preserved every
    // grouped/summed value and the pushdown path returned exactly the
    // matching rows.
    "q98_orc_roundtrip" ->
      """SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_doc
        |FROM documents WHERE lang = 'en' AND n_chars >= 50
        |GROUP BY source ORDER BY source""".stripMargin,
    "q100_avro_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars, CAST(strlen(text) AS INT) AS text_chars,
        |  ('0x' || substr(md5(text), 1, 15))::BIGINT AS text_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q101_tfrecord_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars, CAST(strlen(text) AS INT) AS text_chars,
        |  ('0x' || substr(md5(text), 1, 15))::BIGINT AS text_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q102_arrow_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars, CAST(strlen(text) AS INT) AS text_chars,
        |  ('0x' || substr(md5(text), 1, 15))::BIGINT AS text_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q103_arrow_stream_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars, CAST(strlen(text) AS INT) AS text_chars,
        |  ('0x' || substr(md5(text), 1, 15))::BIGINT AS text_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q104_bloom_pointlookup" ->
      """SELECT doc_id, lang, source, n_chars, CAST(strlen(text) AS INT) AS text_chars
        |FROM documents WHERE doc_id IN (7, 42, 137, 256, 499)
        |ORDER BY doc_id""".stripMargin,
    // The identical two-level hash tree: same sorted-concat bucket
    // digests, same bucket-ordered root.
    "q106_corpus_manifest" ->
      """WITH l AS (SELECT substr(md5(text), 1, 1) AS bucket, md5(text) AS h FROM documents),
        |b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |        md5(string_agg(h, '' ORDER BY h)) AS digest
        |      FROM l GROUP BY bucket),
        |r AS (SELECT md5(string_agg(digest, '' ORDER BY bucket)) AS corpus_root FROM b)
        |SELECT b.bucket, b.n_docs, b.digest, r.corpus_root
        |FROM b, r ORDER BY b.bucket""".stripMargin,
    // Layout soundness (the s04 shape): the three pruning booleans are
    // engine-computed assertions pinned TRUE — any layout regression
    // flips one and fails the hash — while box_rows is genuinely
    // recomputed here from the same md5 shard key and box predicate.
    "q105_zorder_layout" ->
      """SELECT TRUE AS zorder_prunes_more, TRUE AS zorder_prunes_half,
        |  TRUE AS linear_prunes_nothing,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |   WHERE n_chars BETWEEN 100 AND 300
        |     AND (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1024) BETWEEN 256 AND 511) AS box_rows""".stripMargin,
    "q107_zorder_write" ->
      """SELECT TRUE AS zorder_prunes_more, TRUE AS zorder_prunes_half,
        |  TRUE AS linear_prunes_nothing,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |   WHERE n_chars BETWEEN 100 AND 300
        |     AND (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1024) BETWEEN 256 AND 511) AS box_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_rows""".stripMargin,
    // The evolved-read replay: "rows whose lang column reads back null"
    // must equal "rows written before the column existed" (doc_id<250 —
    // the generation split the engine's write made).
    "q108_shard_schema_evolution" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN doc_id < 250 THEN 1 ELSE 0 END) AS BIGINT) AS n_pre_evolution,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sum
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // Time-travel: each generation's population recomputed from the
    // source split (gen 1 = the pre-compaction corpus docs < 200, gen
    // 2 = the live one docs < 250; lang evolved at doc 100).
    "q109_shard_time_travel" ->
      """SELECT CAST(1 AS BIGINT) AS generation, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sum,
        |  CAST(sum(CASE WHEN doc_id < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_no_lang
        |FROM documents WHERE doc_id < 200
        |UNION ALL
        |SELECT 2, count(*), CAST(sum(n_chars) AS BIGINT),
        |  CAST(sum(CASE WHEN doc_id < 100 THEN 1 ELSE 0 END) AS BIGINT)
        |FROM documents WHERE doc_id < 250
        |ORDER BY generation""".stripMargin,
    "q99_csv_roundtrip" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(len(text)) AS BIGINT) AS text_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars_sum,
        |  sum(len(text)) = sum(n_chars) AS lengths_consistent
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q62_lateral_topk" ->
      """SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey <= 50
        |ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "q54_higher_order_funcs" ->
      """SELECT vec_id,
        |  round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS sum_all,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  round(list_sum(list_transform(range(1, 65),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[65 - i] AS DOUBLE))), 4) AS dot_rev
        |FROM embeddings WHERE vec_id < 200 ORDER BY vec_id""".stripMargin,
    "q55_map_funcs" ->
      """WITH pt AS (
        |  SELECT user_id, event_type, count(*) AS n FROM events WHERE user_id < 100 GROUP BY 1, 2)
        |SELECT user_id,
        |  array_to_string(list_sort(list(event_type)), ',') AS types_seen,
        |  CAST(coalesce(sum(n) FILTER (WHERE event_type = 'click'), 0) AS BIGINT) AS n_click,
        |  CAST(count(*) FILTER (WHERE n >= 3) AS BIGINT) AS n_types_3plus,
        |  CAST(sum(n) AS BIGINT) AS n_events
        |FROM pt GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q56_sequence_explode" ->
      """SELECT o_orderkey,
        |  CAST(unnest(generate_series(CAST(o_orderdate AS DATE), CAST(o_orderdate AS DATE) + 2, INTERVAL 1 DAY)) AS DATE) AS active_day,
        |  round(o_totalprice / 3, 2) AS daily_price
        |FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey, active_day""".stripMargin,
    "q57_mode_median" ->
      """WITH freq AS (SELECT o_orderstatus, o_orderpriority, count(*) AS c FROM orders GROUP BY 1, 2),
        |top AS (SELECT o_orderstatus, o_orderpriority AS top_priority FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderstatus ORDER BY c DESC, o_orderpriority) AS rn FROM freq) WHERE rn = 1),
        |s AS (SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
        |  round(quantile_cont(o_totalprice, 0.25), 2) AS p25_price,
        |  count(*) AS n
        |FROM orders GROUP BY 1)
        |SELECT s.o_orderstatus, top.top_priority, s.median_price, s.p25_price, s.n
        |FROM s JOIN top USING (o_orderstatus) ORDER BY 1""".stripMargin,
    "q58_regr_aggs" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
        |  round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q59_bitwise" ->
      """SELECT l_returnflag,
        |  CAST(bit_and(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS ln_and,
        |  CAST(bit_or(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS ln_or,
        |  CAST(bit_xor(l_orderkey) AS BIGINT) AS ok_xor,
        |  CAST(bit_or(CAST(l_linenumber AS BIGINT)) AS BIGINT) << 2 AS ln_or_shl2,
        |  CAST(bit_xor(l_orderkey) AS BIGINT) & 255 AS ok_xor_low8,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q60_ignore_nulls_window" ->
      """SELECT event_id, user_id, big_v,
        |  lag(big_v IGNORE NULLS) OVER w AS prev_big,
        |  lead(big_v IGNORE NULLS) OVER w AS next_big,
        |  last_value(big_v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_v
        |FROM (SELECT event_id, user_id, CASE WHEN value > 50 THEN round(value, 2) END AS big_v
        |      FROM events WHERE user_id < 20)
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q00_ingest_manifest" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n_files, round(sum(value), 2) AS total_bytes
        |FROM events WHERE date_trunc('day', ts) > TIMESTAMP '2024-01-05' GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty, round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc, count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_revenue_forecast" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_shipping_priority" ->
      """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q05_region_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q06_cust_order_stats_left" ->
      """SELECT n_name, count(o_orderkey) AS n_orders, CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_custs, round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
        |FROM customer JOIN nation ON c_nationkey = n_nationkey LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q07_no_urgent_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q08_promo_share" ->
      """SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
        |  round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1 ORDER BY 1""".stripMargin,
    "q09_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q10_window_running" ->
      """SELECT l_orderkey, l_linenumber, round(sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        |FROM lineitem WHERE l_orderkey < 500 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q11_window_lag" ->
      """SELECT event_id, user_id, CAST(date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS BIGINT) AS gap_s
        |FROM events WHERE user_id < 50 ORDER BY user_id, event_id""".stripMargin,
    "q12_distinct_aggs" ->
      """SELECT l_returnflag, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q13_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region_name, coalesce(n_name, 'ALL') AS nation_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name) ORDER BY region_name, nation_name""".stripMargin,
    "q14_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag, coalesce(l_linestatus, 'ALL') AS linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY returnflag, linestatus""".stripMargin,
    "q15_grouping_sets" ->
      """SELECT coalesce(o_orderpriority, 'ALL') AS dim_priority, coalesce(o_orderstatus, 'ALL') AS dim_status, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ()) ORDER BY dim_priority, dim_status""".stripMargin,
    // Oracle is the PLAIN (unsalted) join — salting must be invisible in
    // the result.
    "q36_skew_salted" ->
      """WITH o AS (SELECT CASE WHEN o_orderkey % 3 < 2 THEN 1 ELSE o_custkey END AS skew_custkey, o_totalprice FROM orders)
        |SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM o JOIN customer ON skew_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q16_setops" ->
      """SELECT 'both' AS op, nationkey FROM (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'cust_only' AS op, nationkey FROM (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
        |ORDER BY op, nationkey""".stripMargin,
    "q17_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS name_upper, CAST(length(p_name) AS INT) AS name_len, substring(p_name, 1, 5) AS name_pfx,
        |  concat(p_brand, ':', p_type) AS brand_type, replace(p_name, ' ', '_') AS name_snake,
        |  lpad(p_brand, 12, '*') AS brand_pad, split_part(p_name, ' ', 1) AS first_word
        |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin,
    "q18_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo, CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch95,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin,
    "q19_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, abs(l_discount - 0.05) AS d1, CAST(ceil(l_quantity / 7.0) AS BIGINT) AS d2, CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS d3,
        |  round(sqrt(l_extendedprice), 4) AS d4, round(ln(l_extendedprice + 1), 4) AS d5, round(pow(l_tax + 1, 2), 6) AS d6,
        |  CAST(l_linenumber % 3 AS INT) AS d7, CAST(sign(l_discount - 0.05) AS DOUBLE) AS d8
        |FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q20_case_when" ->
      """SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high' WHEN o_orderpriority = '3-MEDIUM' THEN 'mid' ELSE 'low' END AS prio_class,
        |  count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_having" ->
      """SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey HAVING count(*) > 15 ORDER BY o_custkey""".stripMargin,
    "q22_scalar_subquery" ->
      """SELECT count(*) AS n_above_avg FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""".stripMargin,
    "q23_in_subquery" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE'))
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q24_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q28_percentiles" ->
      """SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95, round(median(l_extendedprice), 4) AS med
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q29_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q34_rank_funcs" ->
      """SELECT o_orderkey, o_custkey, CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank, round(cume_dist() OVER w, 6) AS cume
        |FROM orders WHERE o_custkey < 20 WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, pct_rank, o_orderkey""".stripMargin,
    "q26_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim, embedding[1] AS first_val, label
        |FROM embeddings WHERE vec_id < 20 ORDER BY vec_id""".stripMargin,
    "q27_full_outer" ->
      """SELECT coalesce(c.nk, s.nk) AS nationkey, coalesce(n_custs, 0) AS n_custs, coalesce(n_supps, 0) AS n_supps FROM
        |  (SELECT c_nationkey AS nk, count(*) AS n_custs FROM customer GROUP BY 1) c
        |  FULL OUTER JOIN (SELECT s_nationkey AS nk, count(*) AS n_supps FROM supplier GROUP BY 1) s ON c.nk = s.nk
        |ORDER BY nationkey""".stripMargin,
    // Tolerance-band HLL oracle: each engine validates its OWN sketch
    // against its exact distinct counts; the hash compare checks the
    // exact counts and both engines' within-band booleans. Spark's sketch
    // runs at rsd=0.01 (default 0.05 has observed error past 5% on these
    // cardinalities); DuckDB's default precision is already inside it.
    "q25_approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  abs(CAST(approx_count_distinct(l_orderkey) AS DOUBLE) / count(DISTINCT l_orderkey) - 1) <= 0.05 AS orders_within_5pct,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  abs(CAST(approx_count_distinct(l_partkey) AS DOUBLE) / count(DISTINCT l_partkey) - 1) <= 0.05 AS parts_within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q37_exists_subquery" ->
      """SELECT 'has_urgent' AS cls, c_custkey FROM customer
        |  WHERE c_custkey < 50 AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT 'no_urgent' AS cls, c_custkey FROM customer
        |  WHERE c_custkey < 50 AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY cls, c_custkey""".stripMargin,
    "q51_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, round(value, 2) AS value
        |FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS quantity,
        |        CAST(l_extendedprice AS DOUBLE) AS extendedprice, CAST(l_discount AS DOUBLE) AS discount
        |      FROM lineitem WHERE l_orderkey < 100) src
        |UNPIVOT (value FOR measure IN (quantity, extendedprice, discount))
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    "q49_count_min" ->
      """SELECT event_type, count(*) AS n, TRUE AS cms_within_2pct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q50_bloom_filter" ->
      """SELECT count(*) AS n_customers,
        |  CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
        |  TRUE AS no_false_negatives,
        |  TRUE AS fp_rate_bounded
        |FROM customer c""".stripMargin,
    "q38_range_window" ->
      """SELECT user_id, event_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM events WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin,
    "q39_regex_funcs" ->
      """SELECT c_custkey, regexp_extract(c_name, '([0-9]+)$', 1) AS cust_num,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
        |  regexp_matches(c_mktsegment, 'AUTO|BUILD') AS seg_match
        |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin,
    "q40_filter_agg" ->
      """SELECT l_returnflag,
        |  CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
        |  round(sum(l_extendedprice) FILTER (WHERE l_quantity > 25), 2) AS rev_bulk,
        |  count(*) AS n_total
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q41_posexplode_agg" ->
      """SELECT CAST(gs.i - 1 AS INT) AS pos, round(avg(embedding[gs.i]), 4) AS mean_v,
        |  round(CAST(min(embedding[gs.i]) AS DOUBLE), 6) AS min_v, round(CAST(max(embedding[gs.i]) AS DOUBLE), 6) AS max_v
        |FROM embeddings CROSS JOIN generate_series(1, 64) AS gs(i)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q42_string_agg" ->
      """SELECT c_mktsegment,
        |  string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY CAST(c_custkey AS VARCHAR)) AS custkeys,
        |  count(*) AS n
        |FROM customer WHERE c_custkey < 50 GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q45_null_funcs" ->
      """SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS seg_coalesced,
        |  round(greatest(c_acctbal, 0.0), 2) AS bal_floor0,
        |  round(least(c_acctbal, 0.0), 2) AS bal_cap0
        |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin,
    "q48_stat_moments" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
        |  round(stddev_samp(l_discount), 6) AS discount_sd,
        |  round(var_samp(l_tax), 6) AS tax_var,
        |  round(skewness(l_extendedprice), 6) AS price_skew
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q46_moving_avg" ->
      """SELECT o_orderkey, o_custkey,
        |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS trailing_avg_7
        |FROM orders WHERE o_custkey < 20 ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q44_approx_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
        |  abs(approx_quantile(l_extendedprice, 0.5) / quantile_cont(l_extendedprice, 0.5) - 1) <= 0.01 AS p50_within_1pct,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS exact_p95,
        |  abs(approx_quantile(l_extendedprice, 0.95) / quantile_cont(l_extendedprice, 0.95) - 1) <= 0.01 AS p95_within_1pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q43_first_last_window" ->
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER w AS last_ok,
        |  nth_value(o_orderkey, 2) OVER w AS second_ok
        |FROM orders WHERE o_custkey < 20
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q83_order_count_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q84_small_qty_revenue" ->
      """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#12' AND p.p_size < 5
        |  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin,
    "q85_disjunctive_revenue" ->
      """SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 5 AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q86_profit_by_nation" ->
      """SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount) - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE p.p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q87_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s.s_suppkey, s.s_name, r.total_revenue
        |FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
        |WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q88_supplier_cnt" ->
      """SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand <> 'Brand#5' AND p.p_type NOT LIKE 'MEDIUM%'
        |  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3 ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q89_returned_items" ->
      """SELECT c.c_custkey, c.c_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  round(c.c_acctbal, 2) AS c_acctbal, n.n_name
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-10-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l.l_returnflag = 'R'
        |GROUP BY 1, 2, 4, 5 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q90_market_share" ->
      """SELECT o_year,
        |  round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END) / sum(volume), 4) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |    l.l_extendedprice * (1 - l.l_discount) AS volume, n2.n_name AS nation
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = n1.n_regionkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        |  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        |    AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31')
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q93_late_line_priority" ->
      """SELECT l.l_linestatus,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
