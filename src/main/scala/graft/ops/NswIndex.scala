package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-scale graph ANN: one navigable-small-world graph PER IVF CELL,
  * composing the coarse quantizer's partition pruning (s04/s18 —
  * `IvfIndex.probeCells` picks nprobe cells on the driver, the scan
  * reads only those partitions) with the greedy graph walk (s22). This
  * is the production form of the NSW family: s22's single graph is a
  * 256-node demo panel, constant at any SF; here every vector is
  * indexed, the graph build is DISTRIBUTED (one task per cell, the
  * cell-partitioned shape a 100 TB corpus shards naturally), and search
  * cost is nprobe cell walks of O(ef·M) score evaluations each —
  * independent of corpus size once cells are capped.
  *
  * Build is the classic incremental NSW insertion (Malkov et al.,
  * Information Systems 2014): members insert in vec_id order; each
  * searches the current graph with an `efC` frontier, links to its `m`
  * nearest discovered, and back-links are trimmed to `2m` nearest —
  * O(c·efC·m) per cell instead of the O(c²) exact-kNN graph, which is
  * the difference that matters when a cell holds 10⁷ vectors.
  * Deterministic end to end: insertion order, tie-breaks (score desc,
  * vec_id asc), and trims are all totally ordered, so the index — and
  * therefore search — is identical across runs.
  *
  * Scores use the same sequential double fold as the
  * `cosine_similarity` expression, so emitted candidates' cosines are
  * bit-identical to the exact side and the s18-style soundness oracle
  * can demand zero score mismatches.
  */
object NswIndex {
  import IvfIndex.Centroids

  /** CosineSimilarity's exact sequential double fold (the IvfIndex
    * discipline: driver/executor scalar scores must be bit-identical to
    * the expression's).
    */
  private[ops] def cos(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }

  /** Greedy best-first walk with an `ef` frontier (s22's termination:
    * stop when the best unexpanded candidate cannot improve the worst
    * of the current top-ef). Returns (score, id) sorted best-first.
    */
  private[ops] def greedySearch(
      vecs: scala.collection.Map[Long, Array[Float]],
      adj: scala.collection.Map[Long, Array[Long]],
      entries: Seq[Long],
      q: Array[Float],
      ef: Int): List[(Double, Long)] = {
    val visited = scala.collection.mutable.Set[Long](entries: _*)
    val seeds = entries.map(id => (cos(q, vecs(id)), id)).sortBy(t => (-t._1, t._2))
    var frontier = seeds.toList
    var best = seeds.toList
    var continue = true
    while (continue && frontier.nonEmpty) {
      val (cScore, cId) = frontier.head
      frontier = frontier.tail
      val floor = if (best.size < ef) -2.0 else best.map(_._1).min
      if (cScore < floor && best.size >= ef) continue = false
      else {
        adj.getOrElse(cId, Array.empty[Long]).foreach { nId =>
          if (!visited(nId)) {
            visited += nId
            val sc = cos(q, vecs(nId))
            val worst = if (best.size < ef) -2.0 else best.map(_._1).min
            if (sc > worst || best.size < ef) {
              frontier = ((sc, nId) :: frontier).sortBy(t => (-t._1, t._2))
              best = ((sc, nId) :: best).sortBy(t => (-t._1, t._2)).take(ef)
            }
          }
        }
      }
    }
    best
  }

  /** Incremental NSW build over one cell's members (already sorted by
    * vec_id). Returns the adjacency.
    */
  private[ops] def buildCellGraph(
      members: Array[(Long, Array[Float])],
      m: Int,
      efC: Int): scala.collection.Map[Long, Array[Long]] = {
    val vecs = scala.collection.mutable.HashMap.empty[Long, Array[Float]]
    val adj = scala.collection.mutable.HashMap.empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    def trim(id: Long, cap: Int): Unit = {
      val nb = adj(id)
      if (nb.length > cap) {
        val v = vecs(id)
        val kept = nb.toArray.map(o => (cos(v, vecs(o)), o))
          .sortBy(t => (-t._1, t._2)).take(cap).map(_._2)
        nb.clear(); nb ++= kept
      }
    }
    members.foreach { case (id, v) =>
      if (vecs.isEmpty) {
        vecs(id) = v; adj(id) = scala.collection.mutable.ArrayBuffer.empty[Long]
      } else {
        val entry = vecs.keysIterator.min // deterministic: first-inserted (lowest) id
        val found = greedySearch(vecs, adj.view.mapValues(_.toArray).toMap, Seq(entry), v, efC)
        val links = found.sortBy(t => (-t._1, t._2)).take(m).map(_._2)
        vecs(id) = v
        adj(id) = scala.collection.mutable.ArrayBuffer(links: _*)
        links.foreach { o =>
          adj(o) += id
          trim(o, 2 * m) // back-link cap keeps degree (and task memory) bounded
        }
      }
    }
    adj.view.mapValues(_.toArray).toMap
  }

  /** Train the IVF coarse quantizer, build one NSW graph per cell (one
    * task per cell via `flatMapGroups` — the distributed build), and
    * materialize `(vec_id, embedding, nbrs)` parquet PARTITIONED BY
    * cluster at `indexDir/cells`, so search reads only probed cells'
    * bytes. Returns the centroids for probe routing.
    */
  def build(emb: DataFrame, indexDir: String, k: Int, iters: Int, m: Int, efC: Int): Centroids = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = IvfIndex.train(emb, k, iters)
    IvfIndex.assignments(emb, cents)
      .select(col("cluster"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Seq[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (cell, it) =>
        val members = it.map { case (_, id, e) => (id, e.map(_.toFloat).toArray) }
          .toArray.sortBy(_._1)
        val adj = buildCellGraph(members, m, efC)
        members.iterator.map { case (id, v) =>
          (id, v.toSeq, adj.getOrElse(id, Array.empty[Long]).toSeq.sorted, cell)
        }
      }
      .toDF("vec_id", "embedding", "nbrs", "cluster")
      .write
      .mode("overwrite")
      .partitionBy("cluster")
      .parquet(s"$indexDir/cells")
    cents
  }

  /** Lazy search frame (for plan inspection): filter to the `nprobe`
    * probed cells — partition pruning against the cluster-partitioned
    * index — then one greedy walk per cell and a global top-k.
    */
  def searchFrame(
      spark: SparkSession,
      indexDir: String,
      cents: Centroids,
      q: Array[Float],
      excludeId: Long,
      k: Int,
      nprobe: Int,
      ef: Int): DataFrame = {
    import spark.implicits._
    val probes = IvfIndex.probeCells(cents, q, nprobe)
    val bq = spark.sparkContext.broadcast(q)
    spark.read.parquet(s"$indexDir/cells")
      .filter(col("cluster").isin(probes.map(x => x: Any): _*))
      .select(col("cluster").cast("int").as("cluster"), col("vec_id"),
        col("embedding"), col("nbrs"))
      .as[(Int, Long, Seq[Float], Seq[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
        val vecs = rows.map(r => r._2 -> r._3.map(_.toFloat).toArray).toMap
        val adj = rows.map(r => r._2 -> r._4.toArray).toMap
        val entry = rows.iterator.map(_._2).min
        greedySearch(vecs, adj, Seq(entry), bq.value, ef)
          .filter(_._2 != excludeId)
          .sortBy(t => (-t._1, t._2)).take(k)
          .iterator.map { case (s, id) => (id, s) }
      }
      .toDF("vec_id", "cos_raw")
      .select(col("vec_id"), round(col("cos_raw"), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}
