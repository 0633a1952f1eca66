package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine_similarity

/** IVF (inverted-file) approximate nearest neighbour — the coarse-
  * quantizer scale path next to sign-LSH: k-means centroids partition the
  * corpus into cells; a query exactly scans only its `nprobe` nearest
  * cells instead of everything.
  *
  * The k centroids are tiny (k <= 64) and live on the driver as plain
  * arrays. Assignment embeds them as LITERAL vectors in a single
  * projection — argmax-cosine via `array_max` over (sim, -cluster)
  * structs — so it is shuffle-free and stays inside WholeStageCodegen
  * (round 1 shipped a crossJoin + per-vector window here: a full
  * corpus x k shuffle just to take an argmax). Lloyd's update step is
  * the only shuffle in training, keyed on k*dim cells, never on the
  * corpus. Deterministic: centroids initialise from the k lowest
  * vec_ids and iterate a fixed number of rounds, so the index is
  * identical across runs and cluster layouts.
  *
  * At 100 TB the assignment table `(vec_id, cluster)` is written
  * partitioned by cluster; queries touch nprobe/k of the data. Here the
  * index is built on the fly per query invocation (corpus is small); the
  * split into train/assign/search mirrors the real deployment.
  */
object IvfIndex {

  /** Driver-side centroid set — k rows, trivially collectable. */
  type Centroids = Array[(Int, Array[Float])]

  private def litVec(v: Array[Float]): Column = array(v.toSeq.map(lit): _*)

  /** Driver-side cosine replicating CosineSimilarity's exact sequential
    * double fold, so probe selection is bit-identical to executor scores.
    */
  private def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }

  /** Nearest-centroid id as ONE shuffle-free expression: `array_max` over
    * (sim, -cluster) structs — struct ordering gives sim desc then
    * cluster asc on ties, matching the old window's ORDER BY.
    */
  private def nearestCluster(centroids: Centroids): Column = {
    val scored = centroids.map { case (c, vec) =>
      struct(cosine_similarity(col("embedding"), litVec(vec)).as("sim"), lit(-c).as("nc"))
    }
    array_max(array(scored.toSeq: _*)).getField("nc") * -1
  }

  /** Assign each vector to its nearest (max-cosine) centroid — a pure
    * projection over the scan, no Exchange anywhere in the stage.
    */
  private def assign(emb: DataFrame, centroids: Centroids): DataFrame =
    emb.select(col("vec_id"), col("embedding"), nearestCluster(centroids).as("cluster"))

  /** Element-wise mean of the member vectors per cluster. */
  private def centroidUpdate(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("cluster", "pos")
      .agg(avg(col("v")).as("m"))
      .groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cluster"), expr("transform(pm, x -> CAST(x.m AS FLOAT))").as("centroid"))

  private def collectCentroids(df: DataFrame): Centroids =
    df.collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)

  /** Train k centroids with `iters` Lloyd rounds (deterministic init from
    * the k lowest vec_ids). Each round is one Spark job; the k-row result
    * collects to the driver so the next assignment is again literal-based.
    */
  def train(emb: DataFrame, k: Int, iters: Int): Centroids = {
    var cents: Centroids = emb
      .orderBy("vec_id")
      .limit(k)
      .select("embedding")
      .collect()
      .zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](0).toArray }
    for (_ <- 1 to iters)
      cents = collectCentroids(centroidUpdate(assign(emb, cents)))
    cents
  }

  /** Public view of the cell assignment (vec_id, embedding, cluster) —
    * the composition point other index structures build on (s18 joins
    * PQ codes against it to score only the probed cells' codes).
    * `extraCols` carries additional attribute columns (e.g. a metadata
    * column a filtered index stores beside each vector) through the
    * NARROW assignment projection — no join, the attribute rides the
    * same row from the source scan into the cell write.
    */
  def assignments(emb: DataFrame, centroids: Centroids,
      extraCols: Seq[String] = Nil): DataFrame =
    emb.select(Seq(col("vec_id"), col("embedding")) ++ extraCols.map(col) :+
      nearestCluster(centroids).as("cluster"): _*)

  /** Driver-side probe selection: the `nprobe` cells nearest the query
    * (k is tiny; the same exact-fold cosine assignment uses, so probe
    * choice is bit-identical to executor scores).
    */
  def probeCells(centroids: Centroids, query: Array[Float], nprobe: Int): Seq[Int] =
    centroids
      .map { case (c, v) => (c, cosineLocal(v, query)) }
      .sortBy { case (c, s) => (-s, c) }
      .take(nprobe)
      .map(_._1)
      .toSeq

  /** Exact search restricted to the query's `nprobe` nearest cells: probe
    * cells are picked on the driver (k tiny), then ONE scan computes
    * assignment + filter + cosine and ends in TakeOrderedAndProject.
    */
  def search(emb: DataFrame, centroids: Centroids, queryId: Long, k: Int, nprobe: Int): DataFrame = {
    val qe = emb
      .filter(col("vec_id") === queryId)
      .select("embedding")
      .head()
      .getSeq[Float](0)
      .toArray
    val probes = probeCells(centroids, qe, nprobe).map(c => c: Any)
    assign(emb, centroids)
      .filter(col("cluster").isin(probes: _*) && col("vec_id") =!= queryId)
      .select(col("vec_id"), round(cosine_similarity(col("embedding"), litVec(qe)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  // ---- Materialized index: the real 100 TB deployment shape ------------
  //
  // `build` persists what `ivfTopK` recomputes per call: the assignment
  // table written as parquet PARTITIONED BY cluster (one directory per
  // cell) plus a tiny centroid sidecar. `searchIndex` then reads ONLY the
  // `nprobe` probed cells — partition pruning at plan time, so a search
  // touches nprobe/k of the corpus bytes no matter how large the corpus.

  /** Train and materialize the index at `indexDir`: `assignment/`
    * (vec_id, embedding) partitioned by `cluster`, and `centroids/` (k
    * rows). Returns the centroids for immediate reuse.
    */
  def build(emb: DataFrame, indexDir: String, k: Int, iters: Int): Centroids = {
    val cents = train(emb, k, iters)
    assign(emb, cents)
      .write
      .mode("overwrite")
      .partitionBy("cluster")
      .parquet(s"$indexDir/assignment")
    saveCentroids(emb.sparkSession, cents, indexDir)
    cents
  }

  /** Persist the k-row centroid sidecar. */
  def saveCentroids(spark: SparkSession, cents: Centroids, indexDir: String): Unit = {
    import spark.implicits._
    cents.toSeq
      .map { case (c, v) => (c, v.toSeq) }
      .toDF("cluster", "centroid")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$indexDir/centroids")
  }

  /** Persist index GEOMETRY only: train the coarse quantizer on a
    * bootstrap sample and write the centroid sidecar plus an EMPTY
    * (schema-carrying, unpartitioned) base assignment — the starting
    * state of a STREAM-FED index, where every data vector reaches the
    * cells through [[graft.streaming.IndexStreams]] upserts rather
    * than a batch build. [[searchIndexLive]] reads this base + the
    * streamed partitions under one probe filter unchanged.
    */
  def bootstrap(sample: DataFrame, indexDir: String, k: Int, iters: Int): Centroids = {
    val cents = train(sample, k, iters)
    assign(sample, cents).limit(0).coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$indexDir/assignment")
    saveCentroids(sample.sparkSession, cents, indexDir)
    cents
  }

  /** Load the k-row centroid sidecar back onto the driver. */
  def loadCentroids(spark: SparkSession, indexDir: String): Centroids =
    collectCentroids(spark.read.parquet(s"$indexDir/centroids").select("cluster", "centroid"))

  /** Search a materialized index: probe cells are picked on the driver
    * from the sidecar, and the assignment scan carries a
    * `cluster IN (probes)` partition filter — Spark prunes the non-probed
    * cell directories at plan time (asserted by ScaleOpsSpec), so the
    * exact rerank reads only nprobe/k of the index.
    */
  def searchIndex(
      spark: SparkSession,
      indexDir: String,
      queryVec: Array[Float],
      k: Int,
      nprobe: Int,
      excludeId: Option[Long] = None
  ): DataFrame = {
    val cents = loadCentroids(spark, indexDir)
    val probes = probeCells(cents, queryVec, nprobe).map(c => c: Any)
    val scan = spark.read.parquet(s"$indexDir/assignment")
    val pruned = scan.filter(col("cluster").isin(probes: _*))
    val excluded = excludeId.fold(pruned)(id => pruned.filter(col("vec_id") =!= id))
    excluded
      .select(col("vec_id"), round(cosine_similarity(col("embedding"), litVec(queryVec)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  // ---- RANGE (radius) search with a LOSSLESS cell-bound prune --------
  //
  // "Every neighbor with cosine >= tau" — the ANN family's OTHER query
  // shape (FAISS range_search; dedup-threshold sweeps and
  // contamination screens ask it, not top-k). Pruning is the spherical
  // triangle inequality on DIRECTIONS (cosine ignores norms):
  // angle(q, x) >= angle(q, c) − angle(c, x), so a cell whose members
  // all lie within angular radius r_c of its centroid can contain a
  // qualifying vector ONLY if cos(max(0, theta_qc − r_c)) >= tau.
  // Cells failing the bound are pruned LOSSLESSLY — unlike top-k IVF
  // probing there is no recall dial here: the result is EXACTLY the
  // brute-force threshold scan's (spec-pinned, and the oracle is fully
  // exact), the bound only decides how few partitions pay for it. At
  // 100 TB a selective tau touches the handful of cells near the
  // query; a permissive tau degrades gracefully to the full scan the
  // exact answer genuinely requires.

  /** One aggregation over the materialized assignment: each cell's
    * angular radius r_c = max angle(member, own centroid), written as
    * the `radii/` sidecar (k rows — same class as centroids). Must be
    * refreshed when the assignment changes; [[rangeSearchIndex]] fails
    * loudly without it.
    */
  def saveCellRadii(spark: SparkSession, indexDir: String): Unit = {
    val cents = loadCentroids(spark, indexDir)
    val cLit = typedLit(cents.map { case (c, v) => c -> v.toSeq }.toMap)
    spark.read.parquet(s"$indexDir/assignment")
      .select(col("cluster").cast("int").as("cluster"),
        acos(least(lit(1.0), greatest(lit(-1.0),
          cosine_similarity(col("embedding"), element_at(cLit, col("cluster"))))))
          .as("ang"))
      .groupBy("cluster").agg(max(col("ang")).as("radius"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/radii")
  }

  /** The driver-side prune: cells whose angular bound clears `tau`
    * (with a 1e-6 slack absorbing the acos/cos round-trip — slack only
    * ever KEEPS a borderline cell, so losslessness is preserved).
    * Public so specs can pin both the losslessness and that pruning
    * actually bites.
    */
  def rangeKeptCells(cents: Centroids, radii: Map[Int, Double],
      q: Array[Float], tau: Double): Seq[Int] =
    cents.toSeq.filter { case (c, v) =>
      val thetaQC = math.acos(math.max(-1.0, math.min(1.0, cosineLocal(v, q))))
      math.cos(math.max(0.0, thetaQC - radii.getOrElse(c, math.Pi))) >= tau - 1e-6
    }.map(_._1).sorted

  /** Range search over the materialized index: the kept cells are
    * picked on the driver from the two k-row sidecars, the scan reads
    * ONLY those partitions, and every survivor with rounded cosine
    * >= tau comes back exactly — `(vec_id, cos_sim)`, (score desc,
    * vec_id asc) order, variable cardinality by construction.
    */
  def rangeSearchIndex(
      spark: SparkSession,
      indexDir: String,
      q: Array[Float],
      tau: Double,
      excludeId: Option[Long] = None): DataFrame = {
    val cents = loadCentroids(spark, indexDir)
    val radiiPath = new org.apache.hadoop.fs.Path(s"$indexDir/radii")
    val fs = radiiPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(radiiPath),
      s"$indexDir has no radii sidecar — range search's lossless prune needs " +
        "IvfIndex.saveCellRadii(spark, indexDir) run after the build")
    val radii: Map[Int, Double] = spark.read.parquet(radiiPath.toString)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val kept = rangeKeptCells(cents, radii, q, tau)
    val pruned = spark.read.parquet(s"$indexDir/assignment")
      .filter(col("cluster").isin(kept.map(x => x: Any): _*))
    val excluded = excludeId.fold(pruned)(id => pruned.filter(col("vec_id") =!= id))
    excluded
      .select(col("vec_id"),
        round(cosine_similarity(col("embedding"), litVec(q)), 6).as("cos_sim"))
      .filter(col("cos_sim") >= tau)
      .orderBy(col("cos_sim").desc, col("vec_id"))
  }

  /** Search a LIVE index: the batch-built `assignment/` plus everything
    * [[graft.streaming.IndexStreams]] has streamed into
    * `stream_assignment/` since. Both layouts carry `cluster` as a
    * partition column, so the same `cluster IN (probes)` filter prunes
    * both scans at plan time — a vector ingested by stream costs a
    * search exactly what a build-time vector costs. Append-only
    * contract: re-ingesting an existing vec_id yields two candidate
    * rows (dedup at ingest, not here — the search stays a pure pruned
    * scan).
    */
  def searchIndexLive(
      spark: SparkSession,
      indexDir: String,
      queryVec: Array[Float],
      k: Int,
      nprobe: Int,
      excludeId: Option[Long] = None
  ): DataFrame = {
    val cents = loadCentroids(spark, indexDir)
    val probes = probeCells(cents, queryVec, nprobe).map(c => c: Any)
    val conf = spark.sparkContext.hadoopConfiguration
    // "exists" must mean "has at least one batch partition": vacuum can
    // leave the parent dir behind empty, and reading it would fail
    // schema inference
    def exists(p: String) = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      fs.exists(hp) && fs.listStatus(hp).exists(_.getPath.getName.startsWith("batch="))
    }
    val st = readLiveState(spark, indexDir)
    // base rows carry batch = -1: ANY tombstone outranks them under the
    // last-writer-wins merge below
    val base = spark.read.parquet(liveBaseDir(indexDir, st.gen))
      .select(col("vec_id"), col("embedding"), col("cluster"), lit(-1L).as("batch"))
    val streamPath = s"$indexDir/stream_assignment"
    val scan =
      if (exists(streamPath))
        base.unionByName(spark.read.parquet(streamPath)
          // compaction already folded batches <= consumedThrough into the
          // base — reading them again would double-serve; `batch` is a
          // partition column, so this is directory-level pruning
          .filter(col("batch") > st.consumedThrough)
          .select(col("vec_id"), col("embedding"), col("cluster"), col("batch")))
      else base
    val pruned = scan.filter(col("cluster").isin(probes: _*))
    val excluded = excludeId.fold(pruned)(id => pruned.filter(col("vec_id") =!= id))
    // merge-on-read tombstones, LAST WRITER WINS by epoch: a row is
    // dead iff some tombstone batch at-or-after it names its id (base
    // rows die to any tombstone; a re-upsert in a LATER batch than the
    // delete resurfaces). The tombstone side aggregates to one row per
    // deleted id and broadcasts — k-scale, never corpus-scale — so the
    // anti-join adds no shuffle and the partition prune above is
    // untouched.
    val tombPath = s"$indexDir/tombstones"
    val withTombs =
      if (exists(tombPath)) {
        val tombs = spark.read.parquet(tombPath)
          .filter(col("batch") > st.consumedThrough)
          .groupBy("vec_id").agg(max(col("batch")).as("tomb_batch"))
        excluded.join(broadcast(tombs), Seq("vec_id"), "left")
          .filter(col("tomb_batch").isNull || col("tomb_batch") < col("batch"))
      } else excluded
    withTombs
      .select(col("vec_id"), round(cosine_similarity(col("embedding"), litVec(queryVec)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  // ---- live-index lifecycle: tombstones, generations, compaction -----
  //
  // A 100 TB corpus CHURNS: documents get removed (takedowns, dedup
  // verdicts, curation demotions) while the serving index keeps
  // answering. Deletes ride the same batch=<epoch> partition channel as
  // upserts ([[graft.streaming.IndexStreams.tombstoneBatch]]), searches
  // apply them merge-on-read (above), and compaction folds base +
  // streamed upserts − tombstones into a NEW base generation so the
  // merge debt never grows unboundedly. The generation/retention
  // machinery mirrors graft-shards' ([[graft.sources.TrainingShards
  // .vacuum]]): a marker names the live generation, superseded
  // generations stay on disk until [[vacuumLiveIndex]] reclaims them
  // under a retention count, and every step is replay-idempotent
  // (deterministic recompute + atomic marker publish).

  /** Live-index marker state: which base generation serves, and the
    * highest stream/tombstone batch id folded into it. Generation 0 is
    * the original `assignment/` dir (what [[build]]/[[bootstrap]]
    * write); compactions produce `assignment_g<n>`.
    */
  final case class LiveState(gen: Long, consumedThrough: Long)

  private[graft] def liveBaseDir(indexDir: String, gen: Long): String =
    if (gen == 0L) s"$indexDir/assignment" else s"$indexDir/assignment_g$gen"

  private val LiveStateFile = "_LIVE_STATE"

  def readLiveState(spark: SparkSession, indexDir: String): LiveState = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/$LiveStateFile")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) LiveState(0L, -1L)
    else {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(0, buf) finally in.close()
      val parts = new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim.split(" ")
      require(parts.length == 2,
        s"corrupt $LiveStateFile under $indexDir: '${new String(buf)}' — refusing to guess")
      LiveState(parts(0).toLong, parts(1).toLong)
    }
  }

  private def publishLiveState(spark: SparkSession, indexDir: String, st: LiveState): Unit = {
    val dest = new org.apache.hadoop.fs.Path(s"$indexDir/$LiveStateFile")
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/$LiveStateFile.tmp")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(s"${st.gen} ${st.consumedThrough}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(dest)) fs.delete(dest, false)
    if (!fs.rename(tmp, dest))
      throw new IllegalStateException(s"could not publish $dest")
  }

  /** Fold the live view into a fresh base generation: current base +
    * unconsumed stream batches, tombstones applied, RE-UPSERT
    * DUPLICATES RESOLVED (one row per vec_id, the latest batch wins —
    * compaction is where the append-only upsert contract's duplicates
    * retire). Writes `assignment_g<gen+1>` partitioned by cluster, then
    * atomically publishes the marker; the consumed batch dirs and the
    * old generation stay on disk for in-flight readers until
    * [[vacuumLiveIndex]]. Crash-safe: before the marker publish nothing
    * references the new dir (readers stay consistent on the old state);
    * a replay recomputes the identical merge (deterministic inputs,
    * overwrite mode) and re-publishes the same marker.
    */
  def compactLiveIndex(spark: SparkSession, indexDir: String): LiveState = {
    val st = readLiveState(spark, indexDir)
    val conf = spark.sparkContext.hadoopConfiguration
    def batchIds(dir: String): Seq[Long] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong)
    }
    val pending = (batchIds(s"$indexDir/stream_assignment") ++
      batchIds(s"$indexDir/tombstones")).filter(_ > st.consumedThrough)
    if (pending.isEmpty) return st
    val through = pending.max
    val base = spark.read.parquet(liveBaseDir(indexDir, st.gen))
      .select(col("vec_id"), col("embedding"), col("cluster"), lit(-1L).as("batch"))
    val stream = {
      val p = s"$indexDir/stream_assignment"
      if (batchIds(p).nonEmpty)
        base.unionByName(spark.read.parquet(p)
          .filter(col("batch") > st.consumedThrough && col("batch") <= through)
          .select(col("vec_id"), col("embedding"), col("cluster"), col("batch")))
      else base
    }
    val tombPath = s"$indexDir/tombstones"
    val afterTombs =
      if (batchIds(tombPath).nonEmpty) {
        val tombs = spark.read.parquet(tombPath)
          .filter(col("batch") > st.consumedThrough && col("batch") <= through)
          .groupBy("vec_id").agg(max(col("batch")).as("tomb_batch"))
        stream.join(broadcast(tombs), Seq("vec_id"), "left")
          .filter(col("tomb_batch").isNull || col("tomb_batch") < col("batch"))
          .drop("tomb_batch")
      } else stream
    // one row per vec_id, latest epoch wins; struct ordering compares
    // batch first, so cluster/embedding only break (impossible) ties —
    // deterministic either way
    afterTombs
      .groupBy("vec_id")
      .agg(max(struct(col("batch"), col("cluster"), col("embedding"))).as("r"))
      .select(col("vec_id"), col("r.embedding").as("embedding"), col("r.cluster").as("cluster"))
      .write.mode("overwrite")
      .partitionBy("cluster")
      .parquet(liveBaseDir(indexDir, st.gen + 1))
    val next = LiveState(st.gen + 1, through)
    publishLiveState(spark, indexDir, next)
    next
  }

  /** Reclaim superseded live-index state: base generations older than
    * the retention window and stream/tombstone batch dirs the live
    * generation already folded in. `retainGenerations = 2` (default)
    * keeps the previous generation for in-flight readers — the
    * [[graft.sources.TrainingShards.vacuum]] operating point; `1`
    * keeps only the live one (a straggling reader fails loudly on the
    * missing path, never reads wrong data). Returns deleted dir names.
    * Single-admin contract: not concurrent with compaction or writers.
    */
  def vacuumLiveIndex(spark: SparkSession, indexDir: String, retainGenerations: Int = 2): Seq[String] = {
    require(retainGenerations >= 1,
      s"retainGenerations must be >= 1 (the live generation is never vacuumable), got $retainGenerations")
    val st = readLiveState(spark, indexDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(conf)
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    val genFloor = st.gen - (retainGenerations - 1)
    (0L until genFloor).foreach { g =>
      val p = new org.apache.hadoop.fs.Path(liveBaseDir(indexDir, g))
      if (fs.exists(p)) { fs.delete(p, true); deleted += p.getName }
    }
    Seq("stream_assignment", "tombstones").foreach { sub =>
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/$sub")
      if (fs.exists(p)) {
        fs.listStatus(p).foreach { s0 =>
          val n = s0.getPath.getName
          if (n.startsWith("batch=") && n.stripPrefix("batch=").toLong <= st.consumedThrough) {
            fs.delete(s0.getPath, true)
            deleted += s"$sub/$n"
          }
        }
      }
    }
    deleted.toSeq
  }

  /** End-to-end: train + probe in one call (the `queries` entry shape).
    * The corpus cache lives only for this call: the result is eagerly
    * materialized via localCheckpoint (its blocks are released by the
    * ContextCleaner once unreferenced, unlike CacheManager entries),
    * then the input cache is dropped — no storage leak across queries.
    */
  def ivfTopK(spark: SparkSession, dir: String, queryId: Long, k: Int): DataFrame = {
    val emb = Tables.t(spark, dir, "embeddings").persist()
    try {
      val centroids = train(emb, k = 16, iters = 3)
      search(emb, centroids, queryId, k, nprobe = 4).localCheckpoint()
    } finally emb.unpersist(blocking = false)
  }
}
