package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior pins for the round-9 query additions — the semantics the
  * value-level DuckDB oracle can't articulate (geometry invariants,
  * probability-mass conservation, plan boundedness).
  */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("d46: window geometry — stride-16 starts, width-32 windows, full token coverage") {
    val rows = TextOps.queries("d46_chunk_windows")(spark, dir).cache()
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).as("n"))
    // chunk count per doc = floor((n-1)/16) + 1
    val counts = rows.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"),
      max("chunk_id").as("max_id"), min("chunk_id").as("min_id"))
    val bad = counts.join(docs, "doc_id")
      .where(col("n_chunks") =!= floor((col("n") - 1) / 16) + 1 ||
        col("min_id") =!= 0 || col("max_id") =!= col("n_chunks") - 1)
    assert(bad.count() == 0, "chunk ids not dense from 0 at stride 16")
    // every chunk is full-width except those overrunning the doc tail
    val short = rows.join(docs, "doc_id")
      .where(col("n_tokens") =!= least(lit(32), col("n") - col("chunk_id") * 16))
    assert(short.count() == 0, "a window's token count disagrees with its geometry")
    // coverage: chunk 0 of every doc starts at the first token
    val first = rows.where(col("chunk_id") === 0)
      .join(Tables.t(spark, dir, "documents"), "doc_id")
      .where(!col("text").startsWith(substring_index(col("chunk_text"), " ", 1)))
    assert(first.count() == 0)
  }

  test("d47: mixture weights are a probability distribution, monotone in surprisal") {
    val rows = TextOps.queries("d47_mixture_weights")(spark, dir).cache()
    val mass = rows.agg(sum("mixture_weight")).collect().head.getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-4, s"weights sum to $mass, not 1")
    assert(rows.where(col("mixture_weight") <= 0).count() == 0)
    // harder sources (higher surprisal) get at least as much weight
    val disorder = rows.alias("a").join(rows.alias("b"),
      col("a.avg_surprisal") < col("b.avg_surprisal") &&
        col("a.mixture_weight") > col("b.mixture_weight"))
    assert(disorder.count() == 0, "weight not monotone in surprisal")
  }

  test("q81: prefixes are exactly the first min(8, n_events) events, in time order") {
    val rows = EventOps.queries("q81_user_prefix_seq")(spark, dir).cache()
    assert(rows.where(col("prefix_len") =!= least(col("n_events"), lit(8))).count() == 0)
    assert(rows.where(size(split(col("prefix_seq"), ">")) =!= col("prefix_len")).count() == 0)
    // spot-check one user against a direct ordered recount
    val u = rows.select("user_id").first().getLong(0)
    val direct = Tables.t(spark, dir, "events").where(col("user_id") === u)
      .orderBy("ts", "event_id").select("event_type").limit(8)
      .collect().map(_.getString(0)).mkString(">")
    val got = rows.where(col("user_id") === u).select("prefix_seq").first().getString(0)
    assert(got == direct, s"user $u: $got != $direct")
  }

  test("d49: confusion cells partition each true class; fractions sum to 1 per lang") {
    val rows = TextOps.queries("d49_lang_confusion")(spark, dir).cache()
    val docs = Tables.t(spark, dir, "documents")
    assert(rows.agg(sum("n_docs")).collect().head.getLong(0) == docs.count())
    val fracs = rows.groupBy("lang").agg(sum("class_frac").as("f"))
      .where(abs(col("f") - 1.0) > 1e-3)
    assert(fracs.count() == 0, "class fractions don't partition a true class")
    // the heuristic must actually separate: 'en' predicted majority-en
    val en = rows.where(col("lang") === "en" && col("lang_pred") === "en")
      .select("class_frac").collect()
    assert(en.nonEmpty && en.head.getDouble(0) > 0.5, "en recall under 50% — heuristic broken")
  }

  test("m08: frame count matches doc length; segment accounting is conserved") {
    val rows = MultimodalOps.queries("m08_voiced_segments")(spark, dir).cache()
    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), ceil(length(col("text")) / 16.0).cast("long").as("want_frames"))
    assert(rows.join(docs, "doc_id").where(col("n_frames") =!= col("want_frames")).count() == 0)
    assert(rows.where(col("n_voiced") > col("n_frames")).count() == 0)
    assert(rows.where(col("n_segments") > col("n_voiced")).count() == 0)
    assert(rows.where(col("longest_segment") > col("n_voiced")).count() == 0)
    assert(rows.where(col("n_voiced") > 0 && col("n_segments") === 0).count() == 0)
    // segmentation is non-trivial on this corpus: some doc has >1 segment
    assert(rows.where(col("n_segments") > 1).count() > 0)
  }

  test("r10: a doc leading BOTH rankings leads the fusion; ranks are dense per query") {
    val rows = RetrievalOps.queries("r10_rrf_fusion")(spark, dir).cache()
    val ranks = rows.groupBy("query_id")
      .agg(min("rank").as("lo"), max("rank").as("hi"), count(lit(1)).as("n"))
    assert(ranks.where(col("lo") =!= 1 || col("hi") =!= col("n")).count() == 0)
    // RRF dominance: fused-first implies no doc beat it on both lists
    val top = rows.where(col("rank") === 1).select("query_id", "r_bm25", "r_prior")
    val dominated = top.alias("t").join(rows.alias("o"),
      col("t.query_id") === col("o.query_id") &&
        col("o.r_bm25") < col("t.r_bm25") && col("o.r_prior") < col("t.r_prior"))
    assert(dominated.count() == 0, "a strictly-dominating doc lost the fusion")
  }

  test("d50: the first doc is fully novel; novel grams across docs tile the gram space") {
    val rows = TextOps.queries("d50_ngram_novelty")(spark, dir).cache()
    val firstDoc = rows.orderBy("doc_id").first()
    assert(firstDoc.getDouble(3) == 1.0, "the earliest doc must be 100% novel")
    // each distinct gram is novel in exactly one doc: sums must agree
    val novelSum = rows.agg(sum("n_novel")).collect().head.getLong(0)
    val distinctGrams = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
      .where(size(col("t")) >= 2)
      .select(explode(expr("transform(sequence(1, size(t) - 1), i -> concat(t[i - 1], ' ', t[i]))")).as("g"))
      .distinct().count()
    assert(novelSum == distinctGrams, s"novel-gram total $novelSum != distinct grams $distinctGrams")
    assert(rows.where(col("novelty") < 0 || col("novelty") > 1).count() == 0)
  }

  test("q82: lapsed customers have no recent orders and above-average balances") {
    val rows = RelationalOps.queries("q82_idle_customers")(spark, dir).cache()
    assert(rows.count() > 0, "the cutoff must select a non-degenerate lapsed population")
    // recompute the population the aggregate summarizes and cross-check
    val cutoff = lit("2001-01-01").cast("timestamp")
    val cust = Tables.t(spark, dir, "customer").filter(col("c_nationkey") < 10)
    val avgBal = cust.filter(col("c_acctbal") > 0).agg(avg("c_acctbal")).collect().head.getDouble(0)
    val idle = cust.where(col("c_acctbal") > avgBal)
      .join(Tables.t(spark, dir, "orders").where(col("o_orderdate") >= cutoff)
          .select("o_custkey").distinct(),
        col("c_custkey") === col("o_custkey"), "left_anti")
    assert(rows.agg(sum("numcust")).collect().head.getLong(0) == idle.count())
    // no counted customer may have a recent order
    val leak = idle.join(
      Tables.t(spark, dir, "orders").where(col("o_orderdate") >= cutoff),
      col("c_custkey") === col("o_custkey"), "inner")
    assert(leak.count() == 0)
  }

  test("q82 plan: scalar broadcast + anti join — no per-row re-scan, no cartesian") {
    val p = RelationalOps.queries("q82_idle_customers")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"NOT EXISTS lost its anti join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q81 plan: bounded-heap aggregate, no user-partitioned window, no collect_list") {
    val p = EventOps.queries("q81_user_prefix_seq")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window ["), s"a window over the event history reappeared:\n$p")
    assert(!p.contains("collect_list"), s"unbounded per-user buffering:\n$p")
  }
}
