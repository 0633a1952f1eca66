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
  * Results are identical to the plain equi-join (inner) by construction.
  */
object SkewJoin {

  /** Inner-join `large` with `small` on `key`, salting `large` by
    * `saltFactor` using `uniqueCol` (any column unique-ish per row on the
    * large side — determinism of the salt keeps re-runs identical).
    */
  def saltedInnerJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      uniqueCol: String,
      saltFactor: Int
  ): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = large.withColumn("_salt", pmod(hash(col(uniqueCol)), lit(saltFactor)))
    val replicated = small.withColumn("_salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
