package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.bit_hamming

/** Binary quantization (BQ) for embedding search — the 1-bit rung of
  * the compression dial below SQ8 ([[Sq8Index]], 8 bits/dim) and PQ
  * ([[PqIndex]], ~2.5 bits/dim at m=16/k=256 over 64 dims): each
  * dimension becomes ONE bit (set iff x_d > thresh_d, the
  * per-dimension corpus mean — the classic sign/mean binarization that
  * FAISS ships as `LSH`/`binarize` and every "binary embedding" store
  * uses as its first pass). A 64-dim float32 vector packs into 8
  * bytes: 32x fewer vector bytes, and the candidate kernel is a fused
  * XOR + popcount loop ([[graft.functions.BitHamming]]) — no
  * multiplies at all, the cheapest possible first-stage scan.
  *
  * Under mean-thresholding, low Hamming distance tracks high angular
  * similarity (each bit is a hyperplane-LSH bit through the corpus
  * mean: P[bit agree] = 1 − θ/π for centered directions), so ranking
  * by Hamming ASC is a coarse cosine-DESC ranking; the top-`rerank`
  * pool then restores exact scores against full-precision floats (the
  * [[Sq8Index]] two-stage discipline; float IO stays O(rerank)).
  *
  * At 100 TB the point is the FIRST-PASS byte count: the binary scan
  * reads 1/32 of the float bytes (1/8 of SQ8's), turning the
  * candidate pass from IO-bound to trivially cheap, at the price of a
  * cruder ranking — which is why `rerank` here is deliberately deeper
  * than SQ8's (the pool buys back what 1 bit/dim gave up; recall is
  * MEASURED, not assumed, in BqIndexSpec and the s38 gate floors).
  *
  * Deterministic end to end: the threshold aggregation is order-free
  * (per-dim mean of a fixed corpus), packing is pure, Hamming is
  * symmetric/order-free, and both ranking passes use the repo's total
  * orders (hamming asc, vec_id asc; then score desc, vec_id asc).
  */
object BqIndex {

  /** Per-dimension binarization thresholds (the corpus mean). */
  final case class Params(thresh: Array[Double]) {
    def dim: Int = thresh.length
  }

  /** ONE aggregation over the corpus: per-dimension mean. `dim` rows
    * collect — the quantizer is a literal from then on (the SQ8/IVF/PQ
    * sidecar posture).
    */
  def train(emb: DataFrame): Params = {
    val rows = emb
      .select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(avg(col("v").cast("double")).as("m"))
      .orderBy("pos")
      .collect()
    Params(rows.map(_.getAs[Double]("m")))
  }

  /** Pack one vector into ceil(dim/8) bytes: bit d lives in byte d>>3
    * at position d&7 (LSB-first), set iff x_d > thresh_d (ties fall to
    * 0 — any fixed convention works; this one is pinned by spec).
    * Shared by corpus encode and query encode so codes are comparable
    * by construction.
    */
  private[ops] def packBits(e: Seq[Float], thresh: Array[Double]): Array[Byte] = {
    val n = math.min(e.length, thresh.length)
    val out = new Array[Byte]((thresh.length + 7) >> 3)
    var d = 0
    while (d < n) {
      if (e(d) > thresh(d)) out(d >> 3) = (out(d >> 3) | (1 << (d & 7))).toByte
      d += 1
    }
    out
  }

  /** Shuffle-free encode: `(vec_id, bits BINARY(ceil(dim/8)))`. A row
    * whose dimension differs from the trained quantizer's fails loudly
    * (the [[search]] discipline applied to the corpus side) — packBits
    * would otherwise silently zero the missing dimensions' bits and
    * the row would rank near any query with mostly-zero high bits.
    */
  def encode(emb: DataFrame, p: Params): Dataset[(Long, Array[Byte])] = {
    import emb.sparkSession.implicits._
    val thresh = p.thresh
    emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].map {
      case (id, e) =>
        require(e.length == thresh.length,
          s"vector $id dim ${e.length} != trained quantizer dim ${thresh.length}")
        (id, packBits(e, thresh))
    }
  }

  /** Binary scan + exact rerank: rank every code by Hamming distance to
    * the query's code (ascending — the fused XOR/popcount kernel inside
    * WholeStageCodegen, ties broken by vec_id), keep `rerank`
    * candidates, then restore exact rounded cosines against
    * full-precision embeddings for the final top-k (the
    * [[Sq8Index.rerankExact]] discipline — selection at full precision,
    * reported at 6dp). Output contract matches [[NswIndex.searchFrame]]:
    * `(vec_id, cos_sim)` exact, (score desc, vec_id asc) order.
    */
  def search(
      bits: DataFrame,
      emb: DataFrame,
      p: Params,
      q: Array[Float],
      excludeId: Long,
      k: Int,
      rerank: Int): DataFrame = {
    require(rerank >= k, "rerank pool must cover k")
    require(q.length == p.dim,
      s"query dim ${q.length} != trained quantizer dim ${p.dim}")
    val qBits = packBits(q.toSeq, p.thresh)
    val cands = bits
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"), bit_hamming(col("bits"), lit(qBits)).as("hamming"))
      .orderBy(col("hamming").asc, col("vec_id"))
      .limit(rerank)
    Sq8Index.rerankExact(cands, emb, q, k)
  }

  // ---- IVF + BQ: the composed 1-bit config -------------------------
  //
  // FAISS's "IVFx,LSH" shape: the coarse quantizer prunes which
  // PARTITIONS are read (nprobe/k of the files), the 1-bit codes
  // shrink what each read costs (1 BIT/dim — 8x under even IVF+SQ8's
  // bytes), and the deep exact rerank restores exact scores. At 100 TB
  // the two multiply into the cheapest possible candidate pass the
  // dial offers: nprobe/k of the corpus at 1/32 of the float bytes.

  /** Assign-encode-materialize in ONE narrow pass: `(vec_id, bits)`
    * parquet PARTITIONED BY cluster at `indexDir/cells`, plus the
    * centroid sidecar. Codes are bit-identical to the flat [[encode]]
    * for the same quantizer (shared packBits kernel).
    */
  def buildIvf(
      emb: DataFrame,
      indexDir: String,
      p: Params,
      kCells: Int,
      iters: Int): IvfIndex.Centroids = {
    import emb.sparkSession.implicits._
    val cents = IvfIndex.train(emb, kCells, iters)
    val thresh = p.thresh
    IvfIndex.assignments(emb, cents)
      .select(col("cluster"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Seq[Float])]
      .map { case (cl, id, e) =>
        require(e.length == thresh.length,
          s"vector $id dim ${e.length} != trained quantizer dim ${thresh.length}")
        (id, packBits(e, thresh), cl)
      }
      .toDF("vec_id", "bits", "cluster")
      .write
      .mode("overwrite")
      .partitionBy("cluster")
      .parquet(s"$indexDir/cells")
    IvfIndex.saveCentroids(emb.sparkSession, cents, indexDir)
    cents
  }

  /** Partition-pruned bit scan + exact rerank: probe cells picked on
    * the driver, the scan reads ONLY those partitions
    * (PartitionFilters) and ONLY the 8-byte codes (never floats), the
    * same XOR/popcount ranking as the flat [[search]], the same deep
    * rerank discipline.
    */
  def searchIvf(
      spark: org.apache.spark.sql.SparkSession,
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
    require(q.length == p.dim,
      s"query dim ${q.length} != trained quantizer dim ${p.dim}")
    val probes = IvfIndex.probeCells(cents, q, nprobe)
    val qBits = packBits(q.toSeq, p.thresh)
    val cands = spark.read.parquet(s"$indexDir/cells")
      .filter(col("cluster").isin(probes.map(x => x: Any): _*))
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"), bit_hamming(col("bits"), lit(qBits)).as("hamming"))
      .orderBy(col("hamming").asc, col("vec_id"))
      .limit(rerank)
    Sq8Index.rerankExact(cands, emb, q, k)
  }

  /** BATCHED binary search — the panel shape ([[Sq8Index.searchMany]]'s
    * contract over the bit codes): ONE pass over the 8-byte codes
    * evaluates every query's XOR/popcount (Q fused [[graft.functions
    * .BitHamming]] columns stacked row-wise), per-query `rerank` pools
    * from bounded minK heaps (never a window over the low-cardinality
    * query id), ONE broadcast of the pooled ids into the float scan for
    * the exact rerank. The batch amortizes what is already the
    * cheapest scan in the family — at 100 TB the panel reads the 1/32
    * bytes ONCE instead of Q times. Bit-identical per query to Q
    * [[search]] calls (same Hamming total order, same rerank
    * discipline). Output: `(query_id, rank, vec_id, cos_sim)`.
    */
  def searchMany(
      bits: DataFrame,
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
      struct(lit(qid).as("query_id"),
        bit_hamming(col("bits"), lit(packBits(q.toSeq, p.thresh))).as("hamming"))
    }
    val scored = bits
      .select(col("vec_id"), explode(array(perQuery: _*)).as("qa"))
      .select(col("vec_id"), col("qa.query_id").as("query_id"), col("qa.hamming").as("hamming"))
    val pooled = (if (excludeSelf) scored.filter(col("vec_id") =!= col("query_id")) else scored)
      .groupBy("query_id")
      .agg(minK(struct(col("hamming"), col("vec_id")), rerank).as("pool"))
      .select(col("query_id"), explode(col("pool")).as("c"))
      .select(col("query_id"), col("c.vec_id").as("vec_id"))
    val qLit = typedLit(queries.map { case (qid, q) => qid -> q.toSeq })
    import graft.functions.VectorFunctions.cosine_similarity
    emb
      .join(broadcast(pooled), "vec_id")
      .select(col("query_id"), col("vec_id"),
        cosine_similarity(col("embedding"), element_at(qLit, col("query_id"))).as("raw"))
      .select(col("query_id"),
        struct((-col("raw")).as("nr"), col("vec_id"), col("raw")).as("rec"))
      .groupBy("query_id")
      .agg(minK(col("rec"), k).as("recs"))
      // the s30 tail: SELECTION at full precision, rank order re-sorted
      // to the single-query rounded contract so the batch matches Q
      // independent calls even at rounded boundary ties
      .select(col("query_id"), array_sort(expr(
        "transform(recs, r -> struct(-round(r.raw, 6) AS nc, r.vec_id AS vec_id, round(r.raw, 6) AS cos_sim))"))
        .as("recs"))
      .select(col("query_id"), posexplode(col("recs")).as(Seq("pos", "rec")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("rec.vec_id").as("vec_id"), col("rec.cos_sim").as("cos_sim"))
      .orderBy("query_id", "rank")
  }
}
