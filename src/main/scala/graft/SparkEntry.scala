package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{BpeOps, EventOps, MultimodalOps, RelationalOps, SimilarityOps, TextOps}

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
      MultimodalOps.queries ++ BpeOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Every omission is deliberate; the per-query
    * reasons (all are "the value is a function DuckDB cannot evaluate",
    * and each has an oracle-checked twin or a deterministic spec):
    *
    *  - x01/x03 (MinHash sigs, SimHash): signatures are universal-hash
    *    compositions over Spark's Murmur3 `hash()`; DuckDB has no
    *    Murmur3-compatible hash, so neither the signatures NOR any
    *    distribution derived from them (n_distinct, min/max) can be
    *    recomputed there. Oracle-checked twins: d09 (exact Jaccard over
    *    the same candidate semantics), x02 (soundness summary over the
    *    LSH pair path), SimilarityRecallSpec / TextOpsSpec pin
    *    determinism + recall.
    *  - x04 (winnowing): same — custom rolling hash.
    *  - d18 (BPE merges): an iterative argmax fixpoint (each round's
    *    winner changes the next round's counts) — not expressible as a
    *    SQL query; BpeOpsSpec pins the exact merge sequence on a
    *    hand-computed fixture and corpus determinism.
    *  - m01/m02/m03 (codec stub features, frame sampling, resize):
    *    byte-level codec output; DuckDB has no codec surface. Golden
    *    fixtures (PpmGoldenSpec) pin literal values, m04 oracle-checks
    *    the real-codec round trip, MultimodalCodecSpec pins the contract.
    *
    * s02/s03/s04/s07 (LSH ANN, LSH near-dup, IVF ANN, PQ ANN), x02
    * (MinHash-LSH pairs) and x05 (zlib round-trip) ARE
    * oracle-checked despite index-dependent candidate sets: each emits a
    * one-row soundness summary (SimilarityOps.annSoundness) whose
    * assertion counters the engine computes and whose exact scalars
    * DuckDB recomputes by brute force; SimilarityRecallSpec and
    * PqRecallSpec still pin determinism + measured recall.
    *
    * q25 (HLL) IS oracle-checked despite sketch divergence: both engines
    * emit exact distinct counts plus a "my own sketch is within 5%"
    * boolean, so the strict hash compare validates each sketch against
    * ground truth without requiring the sketches to agree — s02-s07 use
    * the same tolerance-band shape.
    */
  def oracleSql: Map[String, String] =
    RelationalOps.oracleSql ++ EventOps.oracleSql ++ TextOps.oracleSql ++
      SimilarityOps.oracleSql ++ MultimodalOps.oracleSql ++ BpeOps.oracleSql
}
