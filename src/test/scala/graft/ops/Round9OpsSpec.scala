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

  test("q81 plan: bounded-heap aggregate, no user-partitioned window, no collect_list") {
    val p = EventOps.queries("q81_user_prefix_seq")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window ["), s"a window over the event history reappeared:\n$p")
    assert(!p.contains("collect_list"), s"unbounded per-user buffering:\n$p")
  }
}
