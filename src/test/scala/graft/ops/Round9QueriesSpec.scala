package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior pins for the late-round-9 additions (the remaining TPC-H
  * optimizer shapes q83–q90, the cohort/transition event analytics
  * q91–q92, and the s14 k-means) — the semantics the value-level DuckDB
  * oracle can't articulate: conservation laws, Lloyd monotonicity,
  * plan boundedness.
  */
class Round9QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("q83: custdist partitions the customer base; weighted sum recounts the orders") {
    val rows = RelationalOps.queries("q83_order_count_dist")(spark, dir).cache()
    val nCust = Tables.t(spark, dir, "customer").count()
    assert(rows.agg(sum("custdist")).collect().head.getLong(0) == nCust,
      "order-count histogram must partition every customer exactly once")
    val nOrders = Tables.t(spark, dir, "orders")
      .where(col("o_orderpriority") =!= "1-URGENT")
      .join(Tables.t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    val weighted = rows.agg(sum(col("c_count") * col("custdist"))).collect().head.getLong(0)
    assert(weighted == nOrders, s"sum(c_count*custdist)=$weighted != non-urgent orders $nOrders")
  }

  test("q87: every returned supplier achieves exactly the maximum quarterly revenue") {
    val rows = RelationalOps.queries("q87_top_supplier")(spark, dir).cache()
    assert(rows.count() >= 1)
    val rev = Tables.t(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("r"))
    val mx = rev.agg(max("r")).collect().head.getDouble(0)
    assert(rows.where(col("total_revenue") =!= mx).count() == 0,
      "a returned supplier's revenue differs from the recomputed maximum")
  }

  test("q90: market shares are true fractions of their year's volume") {
    val rows = RelationalOps.queries("q90_market_share")(spark, dir).cache()
    assert(rows.count() > 0, "the 1995-1996 window must produce at least one year")
    assert(rows.where(col("mkt_share") < 0 || col("mkt_share") > 1).count() == 0)
  }

  test("q91: cohort week 0 retains 100%; later offsets never exceed the cohort size") {
    val rows = EventOps.queries("q91_retention_cohorts")(spark, dir).cache()
    assert(rows.where(col("week_offset") === 0 && col("retention") =!= 1.0).count() == 0,
      "a cohort's own week must retain exactly its size")
    assert(rows.where(col("retention") <= 0 || col("retention") > 1).count() == 0)
    assert(rows.where(col("week_offset") < 0).count() == 0,
      "an activity week before the user's own first week is impossible")
  }

  test("q92: transition probabilities sum to 1 per source state; counts conserve events") {
    val rows = EventOps.queries("q92_event_transitions")(spark, dir).cache()
    val bad = rows.groupBy("from_type").agg(sum("p").as("mass"))
      .where(abs(col("mass") - 1.0) > 1e-2) // 4dp-rounded cells, <=|types| of them
    assert(bad.count() == 0, "row-normalized transition mass drifted from 1")
    val ev = Tables.t(spark, dir, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    val got = rows.agg(sum("n")).collect().head.getLong(0)
    assert(got == expected, s"transition count $got != events - users = $expected")
  }

  test("s14: clusters partition the vector set and Lloyd rounds never increase inertia") {
    val emb = Tables.t(spark, dir, "embeddings")
    val n = emb.count()
    val out = SimilarityOps.queries("s14_kmeans")(spark, dir).cache()
    assert(out.agg(sum("n_vectors")).collect().head.getLong(0) == n)
    assert(out.where(col("inertia") < 0).count() == 0)
    val inertias = (1 to 3).map { r =>
      SimilarityOps.kmeansAssign(emb, k = 8, rounds = r)
        .agg(sum("dist")).collect().head.getDouble(0)
    }
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-3, s"inertia increased across a Lloyd round: $inertias")
    }
  }

  test("d51: growth curves are monotone and land exactly on the corpus totals") {
    val rows = TextOps.queries("d51_vocab_growth")(spark, dir).cache()
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
    val totalTokens = docs.select(sum(size(col("t")))).collect().head.getLong(0)
    val totalVocab = docs.select(explode(col("t")).as("tok")).distinct().count()
    val last = rows.orderBy(col("doc_id").desc).first()
    assert(last.getAs[Long]("corpus_tokens") == totalTokens)
    assert(last.getAs[Long]("vocab_size") == totalVocab)
    // running totals never decrease and vocab never outruns the corpus
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
    val bad = rows.withColumn("pv", lag("vocab_size", 1, 0L).over(w))
      .withColumn("pc", lag("corpus_tokens", 1, 0L).over(w))
      .where(col("vocab_size") < col("pv") || col("corpus_tokens") < col("pc") ||
        col("vocab_size") > col("corpus_tokens"))
    assert(bad.count() == 0)
  }

  test("q93: the priority split partitions the late-line population exactly") {
    val rows = RelationalOps.queries("q93_late_line_priority")(spark, dir).cache()
    val late = Tables.t(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.t(spark, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .count()
    val split = rows.agg(sum(col("high_line_count") + col("low_line_count")))
      .collect().head.getLong(0)
    assert(split == late, s"high+low = $split != late-line recount $late")
  }

  test("s15: silhouettes stay in [-1, 1] and cover every capped vector") {
    val rows = SimilarityOps.queries("s15_silhouette")(spark, dir).cache()
    assert(rows.where(col("avg_silhouette") < -1 || col("avg_silhouette") > 1).count() == 0)
    val n = Tables.t(spark, dir, "embeddings").where(col("vec_id") < 200).count()
    assert(rows.agg(sum("n_vectors")).collect().head.getLong(0) == n)
  }

  test("d52: communities partition the corpus; isolated docs stay singletons; LPA refines CC") {
    val rows = TextOps.queries("d52_label_prop")(spark, dir).cache()
    val docs = Tables.t(spark, dir, "documents")
    assert(rows.count() == docs.count(), "every doc gets exactly one community")
    // the reported size is the actual membership count
    val bad = rows.groupBy("community", "community_size").agg(count(lit(1)).as("n"))
      .where(col("n") =!= col("community_size"))
    assert(bad.count() == 0)
    // LPA labels only flow along edges: every community sits inside ONE
    // of d12's connected components
    val cc = TextOps.queries("d12_dup_clusters")(spark, dir)
      .select(col("doc_id"), col("cluster_id"))
    val split = rows.join(cc, "doc_id")
      .groupBy("community").agg(countDistinct("cluster_id").as("k"))
      .where(col("k") > 1)
    assert(split.count() == 0, "an LPA community crossed a connected component")
  }

  test("d53: clipped precisions live in [0, 1] and unigram overlap bounds nothing below bigram") {
    val rows = TextOps.queries("d53_ngram_overlap")(spark, dir).cache()
    assert(rows.count() > 0)
    assert(rows.where(col("p1") < 0 || col("p1") > 1).count() == 0)
    assert(rows.where(col("p2").isNotNull && (col("p2") < 0 || col("p2") > 1)).count() == 0)
    // pairs are exactly the consecutive-id pairs present in the corpus
    assert(rows.where(col("doc_b") =!= col("doc_a") + 1).count() == 0)
  }

  test("q94: the top-20 paths are 3-step, counted within the trigram total") {
    val rows = EventOps.queries("q94_event_paths")(spark, dir).cache()
    assert(rows.count() <= 20)
    assert(rows.where(size(split(col("path"), ">")) =!= 3).count() == 0)
    val ev = Tables.t(spark, dir, "events")
    val perUser = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
    val totalTrigrams = perUser.agg(sum(greatest(col("n") - 2, lit(0L))))
      .collect().head.getLong(0)
    assert(rows.agg(sum("n")).collect().head.getLong(0) <= totalTrigrams)
  }

  test("q95: residual accounting covers every (type, hour) cell; anomalies are a subset") {
    val rows = EventOps.queries("q95_seasonal_residuals")(spark, dir).cache()
    val cells = Tables.t(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts"))).count()
      .groupBy("event_type").agg(count(lit(1)).as("want"))
    assert(rows.join(cells, "event_type").where(col("n_hours") =!= col("want")).count() == 0)
    assert(rows.where(col("n_anomalies") > col("n_hours")).count() == 0)
    assert(rows.where(col("max_z") < 0).count() == 0)
  }

  test("r11: every source pair is estimated, estimates are probabilities, bound holds here") {
    val rows = RetrievalOps.queries("r11_kmv_jaccard")(spark, dir).cache()
    val nSources = Tables.t(spark, dir, "documents").select("source").distinct().count()
    assert(rows.count() == nSources * (nSources - 1) / 2, "one row per unordered source pair")
    assert(rows.where(col("est_jaccard") < 0 || col("est_jaccard") > 1).count() == 0)
    assert(rows.where(col("exact_jaccard") < 0 || col("exact_jaccard") > 1).count() == 0)
    assert(rows.where(!col("within_bound")).count() == 0,
      "a k=64 KMV Jaccard estimate strayed past 0.25 absolute error on this corpus")
  }

  test("d54: fertility is >= 1 (every word yields at least one BPE-ish token) and covers the corpus") {
    val rows = TextOps.queries("d54_token_fertility")(spark, dir).cache()
    assert(rows.agg(sum("n_docs")).collect().head.getLong(0) ==
      Tables.t(spark, dir, "documents").count())
    assert(rows.where(col("corpus_fertility") < 1.0 || col("avg_fertility") < 1.0).count() == 0)
    assert(rows.where(col("bpe_tokens") < col("ws_tokens")).count() == 0)
  }

  test("s16: the scale-path silhouette covers EVERY vector and stays in [-1, 1]") {
    val rows = SimilarityOps.queries("s16_simplified_silhouette")(spark, dir).cache()
    assert(rows.agg(sum("n_vectors")).collect().head.getLong(0) ==
      Tables.t(spark, dir, "embeddings").count())
    assert(rows.where(col("avg_silhouette") < -1 || col("avg_silhouette") > 1).count() == 0)
    // no pairwise join in the plan: the only join inputs are the k-row
    // centroid broadcast and the per-vector frames
    val p = SimilarityOps.queries("s16_simplified_silhouette")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q96: latencies are positive and ordered; populations agree with q76's funnel stages") {
    val rows = EventOps.queries("q96_funnel_latency")(spark, dir).cache()
    assert(rows.count() == 2)
    assert(rows.where(col("p50_s") <= 0 || col("p50_s") > col("p90_s") ||
      col("p90_s") > col("max_s")).count() == 0)
    val funnel = EventOps.queries("q76_funnel")(spark, dir)
      .select(col("stage"), col("n")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val lat = rows.select(col("step"), col("n_users")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lat("1_view_to_click") == funnel("2_click_after_view"))
    assert(lat("2_click_to_purchase") == funnel("3_purchase_after_click"))
  }

  test("q97: the reach curve is monotone, bounded by DAU sums, and lands on the user count") {
    val rows = EventOps.queries("q97_user_reach")(spark, dir).cache()
    val ev = Tables.t(spark, dir, "events")
    assert(rows.orderBy(col("day").desc).first().getAs[Long]("cumulative_reach") ==
      ev.select("user_id").distinct().count())
    assert(rows.agg(sum("new_users")).collect().head.getLong(0) ==
      ev.select("user_id").distinct().count())
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    assert(rows.withColumn("prev", lag("cumulative_reach", 1, 0L).over(w))
      .where(col("cumulative_reach") < col("prev") || col("new_users") > col("dau")).count() == 0)
  }

  test("plans: the decorrelated/disjunctive shapes broadcast their dims and never go cartesian") {
    for (q <- Seq("q83_order_count_dist", "q84_small_qty_revenue", "q85_disjunctive_revenue",
        "q86_profit_by_nation", "q87_top_supplier", "q88_supplier_cnt",
        "q89_returned_items", "q90_market_share", "s14_kmeans",
        "q91_retention_cohorts", "q92_event_transitions", "q93_late_line_priority",
        "q94_event_paths", "q95_seasonal_residuals", "d51_vocab_growth",
        "d52_label_prop", "d53_ngram_overlap")) {
      val p = graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
    }
    // the Q17 shape must keep its part filter broadcast and its NOT-IN anti join
    val p84 = RelationalOps.queries("q84_small_qty_revenue")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p84.contains("BroadcastHashJoin"), p84)
    val p88 = RelationalOps.queries("q88_supplier_cnt")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p88.contains("LeftAnti"), s"NOT IN lost its anti join:\n$p88")
  }
}
