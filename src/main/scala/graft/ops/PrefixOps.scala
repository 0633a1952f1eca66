package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe per-key prefix sums (running totals, dense ranks).
  *
  * `sum(x).over(Window.partitionBy(lowCardKey).orderBy(ord))` executes as
  * ONE task per key value — a source holding 90% of a 100 TB corpus
  * serializes on a single task. This helper plans the classic two-phase
  * prefix sum instead:
  *
  *   1. CHUNK: split each key's rows into `nChunks` ranges contiguous in
  *      the order key, from a broadcast per-key min/max (any monotone
  *      chunking yields the identical final prefix sum, so the chunk
  *      geometry never affects results — only balance).
  *   2. LOCAL: cumsum within (key, chunk) — `nChunks`-way parallel per
  *      key, each window task holds ~1/nChunks of the key's rows.
  *   3. OFFSET: per-chunk totals (a map-side-combinable agg) form a
  *      keys×nChunks-row frame; each chunk's offset — the sum of its
  *      predecessors — comes from a keyed self-join over that bounded
  *      frame and broadcasts back. No plan node ever partitions by the
  *      low-cardinality key alone.
  *
  * The same shape with a cheaper chunking (md5-prefix chunks, no
  * percentile pass) is inlined in `r06_token_budget_cap`, whose order key
  * is already a uniform hash string.
  */
object PrefixOps {

  /** Adds `chunkCol`: a 0-based bucket index that is monotone in `ord`
    * within each `part` (equal order keys always share a bucket), from a
    * broadcast per-key min/max — equi-WIDTH ranges over the key space.
    * One map-side-combinable agg + one broadcast join: far cheaper than
    * a quantile sketch, and balance follows the key distribution (a
    * uniformly-assigned key like a dense id or a hash spreads evenly;
    * a pathologically clustered key would degrade balance, never
    * correctness — and never below the one-task-per-key window this
    * replaces). Swap in `percentile_approx` cutpoints here if a workload
    * ever needs distribution-proof balance; every downstream step is
    * chunking-agnostic because ANY monotone chunking yields the same
    * prefix sums.
    */
  def withRangeChunks(
      df: DataFrame, part: String, ord: String, chunkCol: String, nChunks: Int = 256): DataFrame = {
    val bounds = df.groupBy(part)
      .agg(min(col(ord)).as("__lo"), max(col(ord)).as("__hi"))
    df.join(broadcast(bounds), part)
      .withColumn(chunkCol,
        least(
          floor((col(ord) - col("__lo")) /
            greatest((col("__hi") - col("__lo")) / nChunks, lit(1))).cast("int"),
          lit(nChunks - 1)))
      .drop("__lo", "__hi")
  }

  /** Core of the two-phase prefix sum over a PRECOMPUTED chunk column
    * (any column monotone in the order key within each `part` — equal
    * order keys must share a chunk): local cumsum per (part, chunk),
    * per-chunk totals self-joined into offsets and broadcast back. The
    * shared implementation under [[partitionedCumSum]]'s range chunks,
    * `r06_token_budget_cap`'s md5-prefix chunks, and p01's budget walk
    * — one place for the subtle offsets join, three chunk geometries.
    * The chunk column survives in the output (callers drop it).
    */
  def chunkedCumSum(
      df: DataFrame,
      part: String,
      chunkCol: String,
      ord: Seq[String],
      valueCol: String,
      outCol: String): DataFrame = {
    require(ord.nonEmpty, "at least one order column required")
    val local = df.withColumn("__local",
      sum(col(valueCol)).over(
        Window.partitionBy(col(part), col(chunkCol)).orderBy(ord.map(col): _*)))
    val totals = df.groupBy(part, chunkCol).agg(sum(col(valueCol)).as("__total"))
    val offsets = totals.alias("a")
      .join(totals.alias("b"),
        col(s"a.$part") === col(s"b.$part") && col(s"b.$chunkCol") < col(s"a.$chunkCol"), "left")
      .select(col(s"a.$part").as(part), col(s"a.$chunkCol").as(chunkCol),
        col("b.__total").as("__prev"))
      .groupBy(part, chunkCol)
      .agg(coalesce(sum(col("__prev")), lit(0L)).as("__offset"))
    local.join(broadcast(offsets), Seq(part, chunkCol))
      .withColumn(outCol, col("__offset") + col("__local"))
      .drop("__local", "__offset")
  }

  /** Running sum of `valueCol` per `part` in `ord` order (inclusive of the
    * current row), as `outCol` — the scale-safe equivalent of
    * `sum(valueCol).over(Window.partitionBy(part).orderBy(ord))`.
    * The head of `ord` drives the chunking; the full `ord` list orders
    * rows within a chunk and must be unique per row within a `part`
    * (prefix sums over ties are frame-ambiguous in SQL too).
    */
  def partitionedCumSum(
      df: DataFrame,
      part: String,
      ord: Seq[String],
      valueCol: String,
      outCol: String,
      nChunks: Int = 256): DataFrame = {
    require(ord.nonEmpty, "at least one order column required")
    val chunked = withRangeChunks(df, part, ord.head, "__chunk", nChunks)
    chunkedCumSum(chunked, part, "__chunk", ord, valueCol, outCol).drop("__chunk")
  }

  /** Dense 1-based rank of each row per `part` in `ord` order, as
    * `outCol` — the scale-safe equivalent of
    * `row_number().over(Window.partitionBy(part).orderBy(ord))` for
    * tie-free orderings.
    */
  def partitionedRowNumber(
      df: DataFrame,
      part: String,
      ord: Seq[String],
      outCol: String,
      nChunks: Int = 256): DataFrame =
    partitionedCumSum(df.withColumn("__one", lit(1L)), part, ord, "__one", outCol, nChunks)
      .drop("__one")
}
