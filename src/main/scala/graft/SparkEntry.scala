package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{BpeOps, EventOps, MultimodalOps, PipelineOps, RelationalOps, RetrievalOps, SimilarityOps, TextOps, WebOps}

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
      MultimodalOps.queries ++ BpeOps.queries ++ WebOps.queries ++ RetrievalOps.queries ++
      PipelineOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. EVERY query has an exact oracle — there are
    * no rows-only entries (OracleSchemaSpec pins the allowlist at empty).
    * Queries whose natural form DuckDB cannot evaluate are made
    * oracle-checkable by one of four portability techniques:
    *
    *  - **Portable hash families** (x01/x03/x04, m01-m03): hashes that
    *    both engines compute bit-identically — md5 hex is the common
    *    primitive, so MinHash uses min-of-md5-digest per band, SimHash /
    *    winnowing / codec frame ids take a digest prefix cast to a long
    *    (Spark `conv(substr(md5(x),1,15),16,10)` ⟷ DuckDB
    *    `('0x'||substr(md5(x),1,15))::BIGINT`). No Murmur3 dependency
    *    remains on any oracle-checked path.
    *  - **Unrolled-fixpoint replay** (d18, s12): iterative argmax loops
    *    (BPE merge induction, MMR greedy selection) replay as k
    *    GENERATED CTE stages — each stage recomputes pair counts /
    *    marginal gains, takes the ORDER BY ... LIMIT 1 winner, and
    *    rewrites state (d18: boundary-safe ` l  r ` -> ` lr ` replace on
    *    DOUBLE-sentinel-space symbol strings so adjacent matches never
    *    share a delimiter; LEFT JOIN ON true + coalesce survives an
    *    exhausted round).
    *  - **Soundness summaries** (s02/s03/s04/s07, x02, x05, q25 — the
    *    q25 HLL shape came first): index-dependent candidate sets emit
    *    ONE row of engine-computed assertion counters (false-positive
    *    count, recall-floor booleans — the oracle pins them as literals)
    *    plus exact scalars DuckDB genuinely recomputes by brute force
    *    (top-k cosines, capped all-pairs counts). SimilarityRecallSpec /
    *    PqRecallSpec additionally pin measured recall in-JVM.
    *  - **Byte-level SQL codec replay** (m01-m03, x05, m04): ASCII
    *    payloads replay the stub codec / PPM parse in SQL via
    *    string_split + ascii() + generate_subscripts (stride decimation
    *    = odd subscripts), so DuckDB derives the same frame features
    *    from the same bytes.
    */
  def oracleSql: Map[String, String] =
    RelationalOps.oracleSql ++ EventOps.oracleSql ++ TextOps.oracleSql ++
      SimilarityOps.oracleSql ++ MultimodalOps.oracleSql ++ BpeOps.oracleSql ++
      WebOps.oracleSql ++ RetrievalOps.oracleSql ++ PipelineOps.oracleSql
}
