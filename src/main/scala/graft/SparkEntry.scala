package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{EventOps, MultimodalOps, RelationalOps, SimilarityOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the beyond-reference
  * training-data-pipeline ops) is exposed as a `queries` entry; the ones
  * expressible in ANSI SQL carry a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The ingest-manifest shape: per-day/type counts past a watermark —
    * the analytical view of the reference's day-batch loop.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q00_ingest_manifest")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalOps.queries ++ EventOps.queries ++ TextOps.queries ++ SimilarityOps.queries ++
      MultimodalOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (custom hash families, HLL sketches) => driver records a weaker
    * rows-only check.
    */
  def oracleSql: Map[String, String] =
    RelationalOps.oracleSql ++ EventOps.oracleSql ++ TextOps.oracleSql ++ SimilarityOps.oracleSql
}
