package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{cosine_similarity, sq8_dot}

/** Uniform 8-bit scalar quantization (SQ8) for embedding search — the
  * third compression leg of the vector stack beside PQ's codebooks
  * ([[PqIndex]]) and IVF's partition pruning ([[IvfIndex]]). Each
  * float32 dimension becomes ONE byte under a per-dimension affine map
  * (the FAISS `ScalarQuantizer/QT_8bit` scheme): code_d =
  * round((x_d - vmin_d) / scale_d), scale_d = (vmax_d - vmin_d)/255.
  * The index row is `(vec_id, code BINARY(dim), rnorm)` — 4x fewer
  * vector bytes than float32, with far less distortion than PQ's
  * 20x (SQ8 reconstruction is within scale/2 per dimension), the
  * standard middle rung of the compression-recall dial.
  *
  * Spark shape: the quantizer trains as ONE distributed aggregation
  * (per-dimension min/max — `posexplode` + groupBy(pos), `dim` rows to
  * the driver); encoding is a shuffle-free typed map; and search scans
  * CODES, never floats, because the asymmetric dot factors into a
  * weighted BYTE sum: dot(q, x̂) = Σ_d q_d·(vmin_d + c_d·scale_d)
  * = C + Σ_d (q_d·scale_d)·c_d with C = Σ_d q_d·vmin_d — the
  * [[graft.functions.Sq8Dot]] codegen kernel against a per-query
  * weight literal, fused into WholeStageCodegen, ending in
  * TakeOrderedAndProject. At 100 TB the byte scan is the point: the
  * candidate pass reads a quarter of the bytes (and no graph), then
  * only the `rerank` survivors touch full-precision embeddings, so
  * exact scores flow out while float IO stays O(rerank).
  *
  * Deterministic end to end: min/max aggregation is order-free, the
  * affine map is pure, and both ranking passes use the repo's (score
  * desc, vec_id asc) total order.
  */
object Sq8Index {

  /** Per-dimension affine quantizer: x̂_d = vmin_d + code_d * scale_d.
    * A constant dimension (vmax == vmin) gets scale 0 and code 0 — it
    * reconstructs exactly.
    */
  final case class Params(vmin: Array[Double], scale: Array[Double]) {
    def dim: Int = vmin.length
  }

  /** ONE aggregation over the corpus: per-dimension min/max. `dim`
    * rows collect (64 here) — the quantizer is a literal from then on,
    * like IVF centroids and PQ codebooks.
    */
  def train(emb: DataFrame): Params = {
    val rows = emb
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy("pos")
      .collect()
    val vmin = rows.map(_.getAs[Float]("lo").toDouble)
    val vmax = rows.map(_.getAs[Float]("hi").toDouble)
    Params(vmin, vmin.indices.map(d => (vmax(d) - vmin(d)) / 255.0).toArray)
  }

  /** Shuffle-free encode: `(vec_id, code BINARY, rnorm)` where rnorm =
    * |x̂| (the RECONSTRUCTED norm, so approximate cosines use the same
    * vector the scorer implicitly dots against — storing |x| instead
    * would mix two geometries).
    */
  def encode(emb: DataFrame, p: Params): Dataset[(Long, Array[Byte], Double)] = {
    import emb.sparkSession.implicits._
    val vmin = p.vmin
    val scale = p.scale
    emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].map {
      case (id, e) =>
        val n = math.min(e.length, vmin.length)
        val code = new Array[Byte](n)
        var rn = 0.0
        var d = 0
        while (d < n) {
          val c =
            if (scale(d) == 0.0) 0
            else math.max(0, math.min(255, math.round((e(d) - vmin(d)) / scale(d)).toInt))
          code(d) = c.toByte
          val rec = vmin(d) + c * scale(d)
          rn += rec * rec
          d += 1
        }
        (id, code, math.sqrt(rn))
    }
  }

  /** Byte-scan candidates + exact rerank: the SQ8 pass ranks every code
    * by approximate cosine (C + sq8_dot(code, w)) / (|q|·rnorm) and
    * keeps `rerank`; only those survivors join back (broadcast — the
    * candidate set is k-scale) to full-precision embeddings for exact
    * rounded cosines and the final top-k. Output contract matches
    * [[NswIndex.searchFrame]]: `(vec_id, cos_sim)` exact, (score desc,
    * vec_id asc) order.
    */
  def search(
      codes: DataFrame,
      emb: DataFrame,
      p: Params,
      q: Array[Float],
      excludeId: Long,
      k: Int,
      rerank: Int): DataFrame = {
    require(rerank >= k, "rerank pool must cover k")
    val w = p.scale.indices.map(d => q(d).toDouble * p.scale(d))
    val c0 = p.vmin.indices.map(d => q(d).toDouble * p.vmin(d)).sum
    val qn = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    val wLit = array(w.map(lit): _*)
    val cands = codes
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"),
        when(col("rnorm") === 0.0, 0.0)
          .otherwise((lit(c0) + sq8_dot(col("code"), wLit)) / (lit(qn) * col("rnorm")))
          .as("approx_cos"))
      .orderBy(col("approx_cos").desc, col("vec_id"))
      .limit(rerank)
    val qLit = array(q.toSeq.map(lit): _*)
    emb
      .join(broadcast(cands.select("vec_id")), "vec_id")
      .select(col("vec_id"),
        round(cosine_similarity(col("embedding"), qLit), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}
