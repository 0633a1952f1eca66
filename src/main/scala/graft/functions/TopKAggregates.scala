package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
import org.apache.spark.sql.graft.ColumnBridge

/** Bounded top-K aggregation — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(lowCardKey))` top-K selection.
  *
  * A window partitioned by a low-cardinality key executes as ONE task per
  * key value: at 100 TB with a handful of sources, that is one task
  * sorting a source's entire row set. These helpers instead plan as an
  * ObjectHashAggregate over Spark's `CollectTopK` (a
  * `TypedImperativeAggregate` holding a bounded priority queue): each map
  * task keeps at most K values per group, the shuffle moves only
  * (key, K-array) per task, and the reduce-side merge is K-bounded. The
  * result is the K extrema as a SORTED array (ascending for [[minK]],
  * descending for [[maxK]]), so `element_at(arr, K)` is the K-th
  * smallest/largest and `posexplode` recovers dense ranks 1..K.
  *
  * Works on any orderable input type; for struct inputs the ordering is
  * lexicographic over the fields, so top-K with a tiebreak is
  * `minK(struct(primary, tiebreak, payload...), k)`.
  */
object TopKAggregates {

  /** The K smallest values of `c` per group, as an ascending array
    * (multiset semantics: duplicates count separately, matching
    * `row_number` over an ascending order).
    */
  def minK(c: Column, k: Int): Column =
    ColumnBridge.column(
      new CollectTopK(ColumnBridge.expression(c), k, reverse = true).toAggregateExpression())

  /** The K largest values of `c` per group, as a descending array. */
  def maxK(c: Column, k: Int): Column =
    ColumnBridge.column(
      new CollectTopK(ColumnBridge.expression(c), k).toAggregateExpression())
}
