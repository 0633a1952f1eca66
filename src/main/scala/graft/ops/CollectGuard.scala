package graft.ops

import org.apache.spark.sql.{DataFrame, Row}

/** Guard for the few deliberate driver-side probes (sketch key sets,
  * centroid tables): prove the set is small BEFORE collecting it. At 100 TB
  * an unguarded `distinct().collect()` on an unexpectedly-wide column is a
  * driver OOM; this turns that into a loud, immediate error at the cap.
  */
object CollectGuard {
  /** Distinct rows of `df`, collected only if the distinct count is within
    * `cap`. The count runs distributed first; the collect is then known-safe.
    */
  def smallDistinct(df: DataFrame, cap: Long): Array[Row] = {
    val d = df.distinct()
    val n = d.count()
    require(n <= cap,
      s"driver-side probe aborted: ${n} distinct values exceeds the cap of $cap " +
        s"for columns ${df.columns.mkString(", ")} — this column is not a " +
        "small-key-set probe candidate")
    d.collect()
  }
}
