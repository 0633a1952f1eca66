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

  /** The per-vector affine quantization: (code bytes, reconstructed
    * norm). One implementation shared by the flat and IVF encoders so
    * their codes are bit-identical for the same quantizer.
    */
  private def encodeOne(e: Seq[Float], vmin: Array[Double], scale: Array[Double]): (Array[Byte], Double) = {
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
    (code, math.sqrt(rn))
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
        val (code, rn) = encodeOne(e, vmin, scale)
        (id, code, rn)
    }
  }

  /** The shared approximate-cosine candidate pass over any codes frame
    * (`vec_id, code, rnorm`): (C + sq8_dot(code, w)) / (|q|·rnorm),
    * top-`rerank` under the total order. Factored so the flat scan and
    * the IVF-pruned scan rank with the SAME kernel.
    */
  private def approxCandidates(
      codes: DataFrame,
      p: Params,
      q: Array[Float],
      excludeId: Long,
      rerank: Int): DataFrame = {
    require(q.length == p.dim,
      s"query dim ${q.length} != trained quantizer dim ${p.dim}")
    val w = p.scale.indices.map(d => q(d).toDouble * p.scale(d))
    val c0 = p.vmin.indices.map(d => q(d).toDouble * p.vmin(d)).sum
    val qn = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    val wLit = array(w.map(lit): _*)
    codes
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"),
        when(col("rnorm") === 0.0, 0.0)
          .otherwise((lit(c0) + sq8_dot(col("code"), wLit)) / (lit(qn) * col("rnorm")))
          .as("approx_cos"))
      .orderBy(col("approx_cos").desc, col("vec_id"))
      .limit(rerank)
  }

  /** Exact rerank of a candidate frame against full-precision
    * embeddings (broadcast the k-scale candidate ids into the float
    * scan). RANKS at full precision, REPORTS at 6dp: ordering by the
    * rounded score silently swaps members of a rounded tie at the k
    * boundary (measured at the 30x fixture — two candidates 7e-7
    * apart, truth's #10 lost to the lower vec_id), so the cut must not
    * lose rank resolution to display rounding. Oracle-safe by
    * construction: whichever member of a rounded boundary tie is
    * chosen, its ROUNDED score — the only thing the soundness scalars
    * see — is identical.
    */
  private[ops] def rerankExact(
      cands: DataFrame,
      emb: DataFrame,
      q: Array[Float],
      k: Int): DataFrame = {
    val qLit = array(q.toSeq.map(lit): _*)
    emb
      .join(broadcast(cands.select("vec_id")), "vec_id")
      .select(col("vec_id"), cosine_similarity(col("embedding"), qLit).as("raw"))
      .orderBy(col("raw").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("raw"), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
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
    rerankExact(approxCandidates(codes, p, q, excludeId, rerank), emb, q, k)
  }

  /** BATCHED multi-query SQ8 search — the byte-scan twin of
    * [[NswIndex.searchFrameMany]]: ONE pass over the codes evaluates
    * every query's weighted byte-sum (Q fused [[graft.functions.Sq8Dot]]
    * columns stacked row-wise — the "score a panel against the corpus
    * in one matrix pass" shape), per-query `rerank` candidate pools
    * come from bounded minK heaps (never a window over the
    * low-cardinality query id), and ONE broadcast of the pooled ids
    * reads full-precision floats for the exact rerank, each row scored
    * against its query's vector via a map literal. Cost vs Q single
    * calls: the code bytes are read ONCE instead of Q times, and the
    * candidate float reads stay O(Q·rerank). Ranks at full precision,
    * reports at 6dp (the [[rerankExact]] discipline); a query never
    * returns itself. Output matches [[NswIndex.searchFrameMany]]:
    * `(query_id, rank, vec_id, cos_sim)`.
    */
  def searchMany(
      codes: DataFrame,
      emb: DataFrame,
      p: Params,
      queries: Map[Long, Array[Float]],
      k: Int,
      rerank: Int,
      excludeSelf: Boolean = true): DataFrame = {
    import graft.functions.TopKAggregates.minK
    require(queries.nonEmpty, "searchMany needs at least one query")
    require(rerank >= k, "rerank pool must cover k")
    queries.foreach { case (qid, q) => require(q.length == p.dim,
      s"query $qid dim ${q.length} != trained quantizer dim ${p.dim}") }
    val perQuery = queries.toSeq.sortBy(_._1).map { case (qid, q) =>
      val w = p.scale.indices.map(d => q(d).toDouble * p.scale(d))
      val c0 = p.vmin.indices.map(d => q(d).toDouble * p.vmin(d)).sum
      val qn = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
      struct(lit(qid).as("query_id"),
        when(col("rnorm") === 0.0, 0.0)
          .otherwise((lit(c0) + sq8_dot(col("code"), array(w.map(lit): _*))) /
            (lit(qn) * col("rnorm")))
          .as("approx_cos"))
    }
    val scored = codes
      .select(col("vec_id"), explode(array(perQuery: _*)).as("qa"))
      .select(col("vec_id"), col("qa.query_id").as("query_id"), col("qa.approx_cos").as("approx_cos"))
    // self-exclusion assumes panel keys ARE corpus vec_ids (the query
    // row should not return itself); pass excludeSelf=false for an
    // out-of-corpus panel whose arbitrary keys could collide with
    // unrelated corpus ids
    val pooled = (if (excludeSelf) scored.filter(col("vec_id") =!= col("query_id")) else scored)
      .groupBy("query_id")
      .agg(minK(struct((-col("approx_cos")).as("na"), col("vec_id")), rerank).as("pool"))
      .select(col("query_id"), explode(col("pool")).as("c"))
      .select(col("query_id"), col("c.vec_id").as("vec_id"))
    val qLit = typedLit(queries.map { case (qid, q) => qid -> q.toSeq })
    emb
      .join(broadcast(pooled), "vec_id")
      .select(col("query_id"), col("vec_id"),
        cosine_similarity(col("embedding"), element_at(qLit, col("query_id"))).as("raw"))
      .select(col("query_id"),
        struct((-col("raw")).as("nr"), col("vec_id"), col("raw")).as("rec"))
      .groupBy("query_id")
      .agg(minK(col("rec"), k).as("recs"))
      // SELECTION was by raw score (the rerankExact discipline); rank
      // assignment re-sorts the k kept rows into the single-query OUTPUT
      // order (rounded desc, vec_id asc) so the batch is row-identical
      // to Q independent [[search]] calls even at rounded boundary ties
      .select(col("query_id"), array_sort(expr(
        "transform(recs, r -> struct(-round(r.raw, 6) AS nc, r.vec_id AS vec_id, round(r.raw, 6) AS cos_sim))"))
        .as("recs"))
      .select(col("query_id"), posexplode(col("recs")).as(Seq("pos", "rec")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("rec.vec_id").as("vec_id"), col("rec.cos_sim").as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  // ---- IVF + SQ8: the composed production config ---------------------
  //
  // FAISS's "IVF<k>,SQ8": the coarse quantizer prunes which PARTITIONS
  // are read (nprobe/k of the files), SQ8 shrinks what each read costs
  // (1 byte/dim), rerank restores exact scores. At 100 TB the two
  // multiply: a search touches nprobe/k of the corpus at a quarter of
  // the bytes, and full-precision floats are read only for the
  // `rerank` survivors.

  /** Train-assign-encode-materialize in ONE narrow pass: `(vec_id,
    * code, rnorm)` parquet PARTITIONED BY cluster at `indexDir/cells`,
    * plus the centroid sidecar. Codes are bit-identical to the flat
    * [[encode]] for the same quantizer (shared kernel).
    */
  def buildIvf(
      emb: DataFrame,
      indexDir: String,
      p: Params,
      kCells: Int,
      iters: Int): IvfIndex.Centroids = {
    import emb.sparkSession.implicits._
    val cents = IvfIndex.train(emb, kCells, iters)
    val vmin = p.vmin
    val scale = p.scale
    IvfIndex.assignments(emb, cents)
      .select(col("cluster"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Seq[Float])]
      .map { case (cl, id, e) =>
        val (code, rn) = encodeOne(e, vmin, scale)
        (id, code, rn, cl)
      }
      .toDF("vec_id", "code", "rnorm", "cluster")
      .write
      .mode("overwrite")
      .partitionBy("cluster")
      .parquet(s"$indexDir/cells")
    IvfIndex.saveCentroids(emb.sparkSession, cents, indexDir)
    cents
  }

  /** BATCHED IVF+SQ8 — the composed production config (s29) in its
    * serving shape (s26/s30's batching): the panel is routed on the
    * driver, the UNION of probed cells is read ONCE under a single
    * partition-pruning filter (code columns only, never floats), each
    * row evaluates the weighted byte-sum for exactly the queries routed
    * to its cell (per-query `when(cluster IN routed, …)` column stack —
    * nulls where not routed, all inside WholeStageCodegen), per-query
    * rerank pools via bounded minK heaps, ONE broadcast of the pooled
    * ids into the float scan for the exact rerank (the s30 tail:
    * selection at full precision, rank order re-sorted to the
    * single-query rounded contract). Bit-identical per query to Q
    * [[searchIvf]] calls; the batch amortizes the pruned byte-scan IO
    * across the panel — at 100 TB the panel's shared cells are read
    * once instead of up to Q times.
    */
  def searchIvfMany(
      spark: SparkSession,
      indexDir: String,
      cents: IvfIndex.Centroids,
      emb: DataFrame,
      p: Params,
      queries: Map[Long, Array[Float]],
      k: Int,
      nprobe: Int,
      rerank: Int,
      excludeSelf: Boolean = true): DataFrame = {
    import graft.functions.TopKAggregates.minK
    require(queries.nonEmpty, "searchIvfMany needs at least one query")
    require(rerank >= k, "rerank pool must cover k")
    queries.foreach { case (qid, q) => require(q.length == p.dim,
      s"query $qid dim ${q.length} != trained quantizer dim ${p.dim}") }
    val routing: Map[Long, Seq[Int]] =
      queries.map { case (qid, qv) => qid -> IvfIndex.probeCells(cents, qv, nprobe) }
    val cellsUnion = routing.values.flatten.toSeq.distinct.sorted
    val perQuery = queries.toSeq.sortBy(_._1).map { case (qid, q) =>
      val w = p.scale.indices.map(d => q(d).toDouble * p.scale(d))
      val c0 = p.vmin.indices.map(d => q(d).toDouble * p.vmin(d)).sum
      val qn = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
      val admit = col("cluster").isin(routing(qid).map(x => x: Any): _*) &&
        (if (excludeSelf) col("vec_id") =!= lit(qid) else lit(true))
      struct(lit(qid).as("query_id"),
        when(admit,
          when(col("rnorm") === 0.0, 0.0)
            .otherwise((lit(c0) + sq8_dot(col("code"), array(w.map(lit): _*))) /
              (lit(qn) * col("rnorm"))))
          .as("approx_cos"))
    }
    val pooled = spark.read.parquet(s"$indexDir/cells")
      .filter(col("cluster").isin(cellsUnion.map(x => x: Any): _*))
      .select(col("cluster").cast("int").as("cluster"), col("vec_id"),
        col("code"), col("rnorm"))
      .select(col("vec_id"), explode(array(perQuery: _*)).as("qa"))
      .filter(col("qa.approx_cos").isNotNull)
      .select(col("qa.query_id").as("query_id"), col("vec_id"),
        col("qa.approx_cos").as("approx_cos"))
      .groupBy("query_id")
      .agg(minK(struct((-col("approx_cos")).as("na"), col("vec_id")), rerank).as("pool"))
      .select(col("query_id"), explode(col("pool")).as("c"))
      .select(col("query_id"), col("c.vec_id").as("vec_id"))
    val qLit = typedLit(queries.map { case (qid, q) => qid -> q.toSeq })
    emb
      .join(broadcast(pooled), "vec_id")
      .select(col("query_id"), col("vec_id"),
        cosine_similarity(col("embedding"), element_at(qLit, col("query_id"))).as("raw"))
      .select(col("query_id"),
        struct((-col("raw")).as("nr"), col("vec_id"), col("raw")).as("rec"))
      .groupBy("query_id")
      .agg(minK(col("rec"), k).as("recs"))
      .select(col("query_id"), array_sort(expr(
        "transform(recs, r -> struct(-round(r.raw, 6) AS nc, r.vec_id AS vec_id, round(r.raw, 6) AS cos_sim))"))
        .as("recs"))
      .select(col("query_id"), posexplode(col("recs")).as(Seq("pos", "rec")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("rec.vec_id").as("vec_id"), col("rec.cos_sim").as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  // ---- HNSW over SQ8 codes: the graph walk in the compressed domain ---
  //
  // FAISS's "HNSW,SQ8" leg of the compose matrix: s25 walks graphs over
  // FLOATS, s29 scans CODES linearly — this walks graphs over CODES.
  // The cell files hold `(vec_id, code BINARY, rnorm, nbrs)` and the
  // search's ReadSchema never contains a float vector column: walk
  // distances come from the same asymmetric weighted byte-sum as the
  // linear SQ8 scan (dot(q, x̂) = C + Σ (q_d·scale_d)·c_d — floats
  // appear only as the per-query weight literal), so the probed cells'
  // read IO drops by the embedding-vs-code column size (~4x on the
  // vector payload; measured in bench_scale.json) while the walk's
  // score evaluations stay O(ef·M) per cell. Exact scores are restored
  // by reranking the pooled survivors against full-precision
  // embeddings — float IO stays O(rerank).

  /** Reconstruct x̂ from a code — the GRAPH-BUILD geometry: build-time
    * cosines run over these reconstructions, so the graph is exactly
    * the one the quantized walk navigates (building over raw floats
    * would bake edges the byte scorer cannot see). Float-valued for
    * [[NswIndex.buildCellGraph]] reuse; the affine map is pure, so the
    * build stays deterministic.
    */
  private def reconstruct(code: Array[Byte], vmin: Array[Double], scale: Array[Double]): Array[Float] = {
    val out = new Array[Float](code.length)
    var d = 0
    while (d < code.length) {
      out(d) = (vmin(d) + (code(d) & 0xFF) * scale(d)).toFloat
      d += 1
    }
    out
  }

  /** Train-assign-encode + per-cell NSW graph build in ONE pass: cell
    * files `(vec_id, code, rnorm, nbrs)` partitioned by cluster, graph
    * edges chosen by cosines over the RECONSTRUCTED vectors (the
    * geometry the byte walk scores), centroid sidecar for probe
    * routing. One task per cell — the s23 distributed-build shape with
    * a 4x smaller vector payload.
    */
  def buildHnsw(
      emb: DataFrame,
      indexDir: String,
      p: Params,
      kCells: Int,
      iters: Int,
      m: Int,
      efC: Int): IvfIndex.Centroids = {
    import emb.sparkSession.implicits._
    val cents = IvfIndex.train(emb, kCells, iters)
    val vmin = p.vmin
    val scale = p.scale
    IvfIndex.assignments(emb, cents)
      .select(col("cluster"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Seq[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (cell, it) =>
        val codes = scala.collection.mutable.HashMap.empty[Long, (Array[Byte], Double)]
        val members = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
        it.foreach { case (_, id, e) =>
          val (code, rn) = encodeOne(e, vmin, scale)
          codes(id) = (code, rn)
          members += ((id, reconstruct(code, vmin, scale)))
        }
        val sorted = members.sortInPlaceBy(_._1).toArray
        val adj = NswIndex.buildCellGraph(sorted, m, efC)
        sorted.iterator.map { case (id, _) =>
          val (code, rn) = codes(id)
          (id, code, rn, adj.getOrElse(id, Array.empty[Long]).toSeq.sorted, cell)
        }
      }
      .toDF("vec_id", "code", "rnorm", "nbrs", "cluster")
      .write
      .mode("overwrite")
      .partitionBy("cluster")
      .parquet(s"$indexDir/cells")
    IvfIndex.saveCentroids(emb.sparkSession, cents, indexDir)
    cents
  }

  /** Quantized graph walk + exact rerank: partition-pruned read of the
    * probed cells' CODE columns (no float vector in the ReadSchema),
    * one greedy walk per cell scoring the asymmetric byte-sum
    * ([[NswIndex.greedySearchScored]]), per-cell survivors pooled to a
    * global top-`rerank` by approximate score, exact rounded cosines
    * restored by the broadcast rerank against full-precision
    * embeddings. Output contract matches [[NswIndex.searchFrame]].
    */
  def searchHnsw(
      spark: SparkSession,
      indexDir: String,
      cents: IvfIndex.Centroids,
      emb: DataFrame,
      p: Params,
      q: Array[Float],
      excludeId: Long,
      k: Int,
      nprobe: Int,
      ef: Int,
      rerank: Int): DataFrame = {
    import spark.implicits._
    require(rerank >= k, "rerank pool must cover k")
    require(q.length == p.dim,
      s"query dim ${q.length} != trained quantizer dim ${p.dim}")
    val probes = IvfIndex.probeCells(cents, q, nprobe)
    val w = p.scale.indices.map(d => q(d).toDouble * p.scale(d)).toArray
    val c0 = p.vmin.indices.map(d => q(d).toDouble * p.vmin(d)).sum
    val qn = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
    val bw = spark.sparkContext.broadcast(w)
    val cands = spark.read.parquet(s"$indexDir/cells")
      .filter(col("cluster").isin(probes.map(x => x: Any): _*))
      .select(col("cluster").cast("int").as("cluster"), col("vec_id"),
        col("code"), col("rnorm"), col("nbrs"))
      .as[(Int, Long, Array[Byte], Double, Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
        val codes = rows.map(r => r._2 -> ((r._3, r._4))).toMap
        val adj = rows.map(r => r._2 -> r._5.toArray).toMap
        val entry = rows.iterator.map(_._2).min
        val wv = bw.value
        def score(id: Long): Double = {
          val (code, rn) = codes(id)
          if (rn == 0.0) 0.0
          else {
            var s = c0
            var d = 0
            while (d < code.length) { s += wv(d) * (code(d) & 0xFF); d += 1 }
            s / (qn * rn)
          }
        }
        NswIndex.greedySearchScored(score, id => adj.getOrElse(id, Array.empty[Long]),
          Seq(entry), ef)
          .filter(_._2 != excludeId)
          .sortBy(t => (-t._1, t._2)).take(rerank)
          .iterator.map { case (s, id) => (id, s) }
      }
      .toDF("vec_id", "approx_cos")
      .orderBy(col("approx_cos").desc, col("vec_id"))
      .limit(rerank)
    rerankExact(cands, emb, q, k)
  }

  /** Partition-pruned byte scan + exact rerank: probe cells picked on
    * the driver, the code scan reads ONLY those partitions
    * (PartitionFilters) and ONLY code columns (never floats), the
    * same [[approxCandidates]] kernel ranks, [[rerankExact]] finishes.
    */
  def searchIvf(
      spark: SparkSession,
      indexDir: String,
      cents: IvfIndex.Centroids,
      emb: DataFrame,
      p: Params,
      q: Array[Float],
      excludeId: Long,
      k: Int,
      nprobe: Int,
      rerank: Int): DataFrame = {
    require(rerank >= k, "rerank pool must cover k")
    val probes = IvfIndex.probeCells(cents, q, nprobe)
    val pruned = spark.read.parquet(s"$indexDir/cells")
      .filter(col("cluster").isin(probes.map(x => x: Any): _*))
    rerankExact(approxCandidates(pruned, p, q, excludeId, rerank), emb, q, k)
  }
}
