import duckdb, sys
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

SQL = {
"q00_ingest_manifest": """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, count(*) AS n_files, round(sum(value), 2) AS total_bytes
FROM events WHERE date_trunc('day', ts) > TIMESTAMP '2024-01-05' GROUP BY 1, 2 ORDER BY 1, 2
""",
"q01_pricing_summary": """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 4) AS avg_qty, round(avg(l_extendedprice), 4) AS avg_price,
  round(avg(l_discount), 4) AS avg_disc, count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
""",
"q02_revenue_forecast": """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
""",
"q03_shipping_priority": """
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
"q04_order_priority": """
SELECT o_orderpriority, count(*) AS order_count FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
"q05_region_revenue": """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name
""",
"q06_cust_order_stats_left": """
SELECT n_name, count(o_orderkey) AS n_orders, count(DISTINCT c_custkey) AS n_custs, round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
FROM customer JOIN nation ON c_nationkey = n_nationkey LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY n_name ORDER BY n_name
""",
"q07_no_orders_anti": """
SELECT c_mktsegment, count(*) AS n_customers FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
"q08_promo_share": """
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
  round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1 ORDER BY 1
""",
"q09_window_topn": """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders) t WHERE rnk <= 3 ORDER BY o_custkey, rnk
""",
"q10_window_running": """
SELECT l_orderkey, l_linenumber, round(sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
FROM lineitem WHERE l_orderkey < 500 ORDER BY l_orderkey, l_linenumber
""",
"q11_window_lag": """
SELECT event_id, user_id, CAST(date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS BIGINT) AS gap_s
FROM events WHERE user_id < 50 ORDER BY user_id, ts, event_id
""",
"q12_distinct_aggs": """
SELECT l_returnflag, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts, count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
"q13_rollup": """
SELECT coalesce(r_name, 'ALL') AS region_name, coalesce(n_name, 'ALL') AS nation_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name) ORDER BY region_name, nation_name
""",
"q14_cube": """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag, coalesce(l_linestatus, 'ALL') AS linestatus,
  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY returnflag, linestatus
""",
"q15_grouping_sets": """
SELECT coalesce(o_orderpriority, 'ALL') AS dim_priority, coalesce(o_orderstatus, 'ALL') AS dim_status, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ()) ORDER BY dim_priority, dim_status
""",
"q16_setops": """
SELECT 'both' AS op, nationkey FROM (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'cust_only' AS op, nationkey FROM (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
ORDER BY op, nationkey
""",
"q17_string_funcs": """
SELECT p_partkey, upper(p_name) AS name_upper, CAST(length(p_name) AS INT) AS name_len, substring(p_name, 1, 5) AS name_pfx,
  concat(p_brand, ':', p_type) AS brand_type, replace(p_name, ' ', '_') AS name_snake,
  lpad(p_brand, 12, '*') AS brand_pad, split_part(p_name, ' ', 1) AS first_word
FROM part WHERE p_partkey < 100 ORDER BY p_partkey
""",
"q18_date_funcs": """
SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo, CAST(day(o_orderdate) AS INT) AS dom,
  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch95,
  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end
FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
""",
"q19_math_funcs": """
SELECT l_orderkey, l_linenumber, abs(l_discount - 0.05) AS d1, ceil(l_quantity / 7.0) AS d2, floor(l_extendedprice / 1000.0) AS d3,
  round(sqrt(l_extendedprice), 4) AS d4, round(ln(l_extendedprice + 1), 4) AS d5, round(pow(l_tax + 1, 2), 6) AS d6,
  CAST(l_linenumber % 3 AS INT) AS d7, sign(l_discount - 0.05) AS d8
FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber
""",
"q20_case_when": """
SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high' WHEN o_orderpriority = '3-MEDIUM' THEN 'mid' ELSE 'low' END AS prio_class,
  count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
FROM orders GROUP BY 1 ORDER BY 1
""",
"q21_having": """
SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey HAVING count(*) > 15 ORDER BY o_custkey
""",
"q22_scalar_subquery": """
SELECT count(*) AS n_above_avg FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
""",
"q23_in_subquery": """
SELECT c_mktsegment, count(*) AS n FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE'))
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
"q24_topk": """
SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
""",
"q26_array_funcs": """
SELECT vec_id, CAST(len(embedding) AS INT) AS dim, embedding[1] AS first_val, label
FROM embeddings WHERE vec_id < 20 ORDER BY vec_id
""",
"q27_full_outer": """
SELECT coalesce(c.nk, s.nk) AS nationkey, coalesce(n_custs, 0) AS n_custs, coalesce(n_supps, 0) AS n_supps FROM
  (SELECT c_nationkey AS nk, count(*) AS n_custs FROM customer GROUP BY 1) c
  FULL OUTER JOIN (SELECT s_nationkey AS nk, count(*) AS n_supps FROM supplier GROUP BY 1) s ON c.nk = s.nk
ORDER BY nationkey
""",
"q30_tumbling_hour": """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type, count(*) AS n, round(sum(value), 2) AS total_value
FROM events WHERE ts < TIMESTAMP '2024-01-03' GROUP BY 1, 2 ORDER BY 1, 2
""",
"q31_sessions": """
WITH gaps AS (
  SELECT user_id, ts, CASE WHEN date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM gaps GROUP BY user_id ORDER BY user_id
""",
"q32_event_dedup": """
SELECT user_id, event_type, min(event_id) AS first_event_id, count(*) AS n_dupes
FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type
""",
"d01_exact_dedup": """
SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY 1
""",
"d02_token_stats": """
SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens, CAST(length(text) AS INT) AS n_chars_actual
FROM documents ORDER BY doc_id
""",
"d03_text_quality": """
SELECT doc_id,
  round(CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) / length(text), 4) AS space_ratio,
  round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text), 4) AS alpha_ratio,
  CAST(length(text) AS INT) AS n_chars
FROM documents ORDER BY doc_id
""",
"d04_lang_guess": """
SELECT doc_id, lang,
  CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) * 1.0 / len(regexp_split_to_array(lower(text), '\\s+')) > 0.05 THEN 'en' ELSE 'other' END AS lang_pred
FROM documents ORDER BY doc_id
""",
"d05_fingerprint": """
SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id
""",
"d06_distinct_tokens": """
SELECT doc_id, CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS INT) AS n_distinct_tokens
FROM documents ORDER BY doc_id
""",
"s01_cosine_topk": """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qe AS DOUBLE[])) /
  (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * sqrt(list_dot_product(CAST(qe AS DOUBLE[]), CAST(qe AS DOUBLE[])))), 6) AS cos_sim
FROM embeddings, q WHERE vec_id != 0 ORDER BY cos_sim DESC, vec_id LIMIT 20
""",
}

ok, bad = 0, 0
for name, sql in SQL.items():
    try:
        df = con.execute(sql).fetchdf()
        print(f"OK   {name}: {len(df)} rows, cols={list(df.columns)}")
        ok += 1
    except Exception as e:
        print(f"FAIL {name}: {e}")
        bad += 1
print(f"\n{ok} ok, {bad} failed")
