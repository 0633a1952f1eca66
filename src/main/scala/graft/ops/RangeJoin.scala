package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join: the scalable plan for
  * `points JOIN intervals ON point BETWEEN start AND end` when there is
  * NO equi-key to carry the shuffle.
  *
  * Spark plans a pure range predicate as BroadcastNestedLoopJoin (small
  * side) or CartesianProduct (neither side broadcastable) — O(|P|·|I|)
  * comparisons, a non-starter at 100 TB. The classic fix is to quantize
  * the range dimension: each point lands in exactly one width-`w` bin,
  * each interval is exploded to the bins it overlaps, and the join
  * becomes a plain hash/sort-merge EQUI-join on the bin id with the
  * exact bounds re-checked post-join. Each (point, interval) pair meets
  * in at most one bin (the point's), so no dedup pass is needed.
  *
  * Cost model: the interval side is replicated `len/w + 1` times, so `w`
  * should be on the order of the typical interval length — replication
  * stays O(1) per interval while each bin's candidate set shrinks by the
  * selectivity of the range dimension. This is the same trick the
  * reference's day-partitioned layout plays for its date filter
  * (`audit_data_ingest.py:26-33`: one dir per day = bin width of a day).
  */
object RangeJoin {

  /** Inner-join `points` to every interval whose CLOSED range
    * `[startCol, endCol]` contains `pointCol`. All three columns must be
    * integral (callers quantize timestamps — e.g. `unix_micros` — first);
    * `binWidth` is in the same unit. Output carries the columns of both
    * inputs; the helper bin column is dropped.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val bin = "__graft_bin"
    val p = points.withColumn(bin, floor(col(pointCol) / binWidth).cast("long"))
    val i = intervals
      .withColumn(
        bin,
        explode(
          sequence(
            floor(col(startCol) / binWidth).cast("long"),
            floor(col(endCol) / binWidth).cast("long")
          )
        )
      )
    p.join(i, bin)
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(bin)
  }
}
