package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual mitigation when AQE's
  * skew-join split isn't available or the skew is known up front
  * (SURVEY.md §7, "salting for skew").
  *
  * The skewed (large) side gets a deterministic salt in [0, saltFactor)
  * derived from a unique column, splitting each hot key into saltFactor
  * sub-partitions; the small side is replicated saltFactor times via an
  * exploded literal range. Join keys become (key, salt), so one hot key's
  * rows spread over saltFactor reducers instead of one straggler.
  *
  * Cost model: replicates the SMALL side saltFactor-fold — use when
  * |small| * saltFactor is still far below the skewed partition size.
  * The guard makes misuse loud: when the plan-estimated replicated size
  * (sizeInBytes × saltFactor) exceeds `maxReplicatedBytes`, the call
  * throws instead of silently shuffling a replica explosion at scale.
  * Results are identical to the plain equi-join (inner) by construction.
  */
object SkewJoin {

  /** Default ceiling on the replicated small side: 1 GiB (≈8 shuffle
    * partitions' worth at the usual 128 MiB target — past that, salting is
    * amplifying the problem it is meant to fix).
    */
  val DefaultMaxReplicatedBytes: Long = 1L << 30

  /** Inner-join `large` with `small` on `key`, salting `large` by
    * `saltFactor` using `uniqueCol` (any column unique-ish per row on the
    * large side — determinism of the salt keeps re-runs identical).
    *
    * @param maxReplicatedBytes cost guard: estimated |small| × saltFactor
    *        bytes (Catalyst stats) above this throws IllegalArgumentException
    */
  def saltedInnerJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      uniqueCol: String,
      saltFactor: Int,
      maxReplicatedBytes: Long = DefaultMaxReplicatedBytes
  ): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // Catalyst sizeInBytes for non-file-backed or post-agg plans without CBO
    // can be a propagated overestimate, up to spark.sql.defaultSizeInBytes
    // (= Long.MaxValue when unset). An estimate at or beyond that default
    // carries no information — warn and skip the guard instead of spuriously
    // rejecting a plan whose true small side is fine.
    val smallBytes = small.queryExecution.optimizedPlan.stats.sizeInBytes
    val unknownDefault = BigInt(small.sparkSession.sessionState.conf.defaultSizeInBytes)
    if (smallBytes >= unknownDefault) {
      System.err.println(
        s"[graft] saltedInnerJoin: small-side size estimate ($smallBytes) is the unknown-stats " +
          "default — replication cost guard skipped; verify the small side is genuinely small"
      )
    } else {
      val replicatedBytes = smallBytes * saltFactor
      require(
        replicatedBytes <= maxReplicatedBytes,
        s"saltedInnerJoin would replicate ~$smallBytes bytes x$saltFactor = $replicatedBytes bytes " +
          s"(> $maxReplicatedBytes cap): the 'small' side is not small enough for salting — " +
          "lower saltFactor, pre-filter the small side, or rely on AQE skew-join splitting"
      )
    }
    val salted = large.withColumn("_salt", pmod(hash(col(uniqueCol)), lit(saltFactor)))
    val replicated = small.withColumn("_salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
