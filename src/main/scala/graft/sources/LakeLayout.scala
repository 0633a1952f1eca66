package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WRITE-TIME z-order clustering — the lake-table layout move (Delta /
  * Iceberg `OPTIMIZE ZORDER BY`) as a writer option, production twin of
  * the q105 demonstration query: interleave the bits of d clustering
  * dimensions into a Morton z-value, range-partition the rows by it,
  * sort within partitions, and land parquet whose per-file (and so
  * per-row-group) min/max envelopes are TIGHT in every clustered
  * dimension at once. A multi-predicate scan then prunes files/row
  * groups by stats alone — the IO that matters at 100 TB, where a
  * linear layout leaves every file spanning the full range of every
  * non-leading dimension and stats prune nothing (q105 measures
  * exactly this gap; FormatRoundTripSpec pins the interleave kernel
  * against a reference implementation).
  *
  * Dimensions are quantized to `bitsPerDim` buckets by equi-width
  * ranges over a driver-collected (min, max) — one small agg job, then
  * the bucket and interleave are pure codegen bit arithmetic (no UDF,
  * no window, no global sort; `repartitionByRange` samples rather than
  * totally ordering). Equi-width is the repo's standing chunking
  * discipline (the r06/d13/d14 broadcast min/max ranges): under heavy
  * per-dimension skew a rank-based quantizer would balance buckets
  * better, but skew only loosens envelopes on the skewed dimension —
  * pruning degrades toward the linear layout, never below it.
  */
object LakeLayout {

  /** Morton z-value over ALREADY-BUCKETED non-negative ints: bit `b` of
    * dimension `i` lands at position `b * d + (d - 1 - i)`, so the
    * FIRST column takes the most-significant position in each bit
    * group — for d = 2 this is exactly q105's inline expression (x odd
    * positions, y even). Callers bucket first ([[zorderColumn]] does);
    * values outside `[0, 2^bitsPerDim)` silently alias, which is why
    * this is the low-level kernel, not the API.
    */
  def zvalue(cols: Seq[Column], bitsPerDim: Int): Column = {
    val d = cols.length
    require(d >= 1, "zvalue needs at least one dimension")
    require(bitsPerDim >= 1 && d * bitsPerDim <= 63,
      s"d * bitsPerDim must fit a positive long: $d * $bitsPerDim")
    val pieces = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bitsPerDim
    } yield shiftleft(shiftrightunsigned(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * d + (d - 1 - i))
    pieces.reduce(_.bitwiseOR(_))
  }

  /** The clustering key for `df`: each named column equi-width-bucketed
    * into `2^bitsPerDim` buckets over its observed (min, max) — ONE
    * driver-side agg, the bounds ship as plan literals — then Morton
    * interleaved. A constant column (min == max) buckets to 0
    * everywhere and simply drops out of the ordering.
    */
  def zorderColumn(df: DataFrame, zCols: Seq[String], bitsPerDim: Int): Column = {
    require(zCols.nonEmpty, "zorderBy needs at least one column")
    val aggs = zCols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val bounds = zCols.indices.map { i =>
      if (stats.isNullAt(2 * i)) None
      else Some((stats.getDouble(2 * i), stats.getDouble(2 * i + 1)))
    }
    zorderColumnFromBounds(zCols, bitsPerDim, bounds)
  }

  /** Pure quantize-and-interleave against PRECOMPUTED per-column
    * (min, max) bounds — no aggregation job, so a caller that already
    * aggregates over `df` (e.g. the shard writer's row count) can fold
    * the bounds into ITS job and pay one corpus pass instead of two.
    * `None` marks an all-null column (no ordering signal).
    */
  def zorderColumnFromBounds(
      zCols: Seq[String], bitsPerDim: Int,
      bounds: Seq[Option[(Double, Double)]]): Column = {
    require(zCols.nonEmpty, "zorderBy needs at least one column")
    require(zCols.length == bounds.length, "one (min, max) bound per z column")
    val buckets = (1L << bitsPerDim).toDouble
    val quantized = zCols.zip(bounds).map {
      case (_, None) => lit(0L) // all-null column: no ordering signal
      case (c, Some((lo, hi))) =>
        if (hi <= lo) lit(0L) // constant column drops out of the ordering
        else least(
          lit((1L << bitsPerDim) - 1),
          coalesce(
            floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(buckets)).cast("long"),
            lit(0L)))
    }
    zvalue(quantized, bitsPerDim)
  }

  /** Land `df` as parquet clustered by the z-order of `zCols`:
    * range-partitioned into `numFiles` files by z, sorted by z within
    * each, the helper column dropped before write — the reader sees the
    * caller's schema, only the LAYOUT changed. Extra writer options
    * (e.g. per-column bloom filters, q104's move) pass through, since
    * z-order covers range predicates and blooms cover point lookups on
    * unclustered columns — a production table often wants both.
    */
  def writeParquetZOrdered(
      df: DataFrame, zCols: Seq[String], path: String, numFiles: Int,
      bitsPerDim: Int = 8, options: Map[String, String] = Map.empty): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val zc = "__graft_z"
    require(!df.columns.contains(zc), s"column name $zc is reserved by the z-order writer")
    var w = df.withColumn(zc, zorderColumn(df, zCols, bitsPerDim))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode("overwrite")
    options.foreach { case (k, v) => w = w.option(k, v) }
    w.parquet(path)
  }
}
