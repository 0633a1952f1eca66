package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) left join — an operator Spark lacks natively,
  * composed from built-ins per the preference order (SURVEY.md §7.3):
  * union-tag the two sides, sort within the key partition by event time,
  * and carry the last right-side row forward with
  * `last(_, ignoreNulls = true)` over an unbounded-preceding frame.
  *
  * One shuffle on (key), one sort — the same cost shape as a sort-merge
  * join, so it scales like any keyed window. Inclusive semantics: a right
  * row at exactly left.ts matches (DuckDB `ASOF LEFT JOIN ... ON l.ts >=
  * r.ts` agrees).
  */
object AsOfJoin {

  /** For every left row, attach `valueCols` from the latest right row with
    * `right.ts <= left.ts` within the same `key`.
    *
    * @param left  rows to enrich; must contain `key` and `ts`
    * @param right rows providing the as-of values; must contain `key`, `ts`
    *              and every column in `valueCols`
    * @param key   equality-join column name
    * @param ts    event-time column name (same name both sides)
    * @param valueCols right-side columns to carry; emitted as
    *                  `asof_<name>` (null when no prior right row exists)
    * @param tieBreak   secondary ordering column present on both sides,
    *                   so equal timestamps resolve deterministically
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      valueCols: Seq[String],
      tieBreak: String
  ): DataFrame = {
    val leftCols = left.columns
    // Tag sides; right rows sort BEFORE left rows at identical (ts, tie)
    // so an exactly-simultaneous right row is visible to the left row.
    val taggedLeft = left
      .withColumn("_side", lit(1))
      .select(
        Seq(col(key), col(ts), col("_side"), col(tieBreak).as("_tie")) ++
          leftCols.filterNot(c => c == key || c == ts).map(col) ++
          valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*
      )
    val taggedRight = right
      .withColumn("_side", lit(0))
      .select(
        Seq(col(key), col(ts), col("_side"), col(tieBreak).as("_tie")) ++
          leftCols.filterNot(c => c == key || c == ts).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          valueCols.map(c => col(c).as(s"_r_$c")): _*
      )
    val w = Window
      .partitionBy(key)
      .orderBy(col(ts), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft
      .unionByName(taggedRight)
      .select(
        (Seq(col(key), col(ts), col("_side")) ++
          leftCols.filterNot(c => c == key || c == ts).map(col) ++
          valueCols.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"asof_$c"))): _*
      )
      .filter(col("_side") === 1)
      .drop("_side")
  }
}
