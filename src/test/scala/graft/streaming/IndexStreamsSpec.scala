package graft.streaming

import graft.SparkSpec
import graft.ops.{IvfIndex, Tables}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The streaming IVF upsert driven synchronously end-to-end: an index is
  * built from part of the corpus, the remainder arrives as two
  * micro-batches through [[IndexStreams.streamingIvfUpsert]], and the
  * spec pins the three contracts the design documents:
  *
  *  1. a stream-added vector is findable via `searchIndexLive`, the
  *     corpus-scale base scan still prunes at plan time (`cluster IN`
  *     partition filter on the assignment scan), and the probe prune
  *     re-applies after the LWW merge over the bounded channel;
  *  2. epoch replay is row-idempotent for the DATA and the upsert LOG
  *     (the batch overwrites its own `batch=<id>` partition in both);
  *  3. the emitted drift metric equals an independent batch
  *     recomputation (mean cosine of the batch's vectors to their
  *     assigned centroids).
  */
class IndexStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Exact double-fold cosine, mirroring CosineSimilarity's sequential
    * fold so expectations are bit-identical to executor scores.
    */
  private def cosLocal(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y; i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else d / den
  }

  test("streamed vectors are searchable, pruned at plan time, and replay is idempotent") {
    import spark.implicits._
    val emb = Tables.t(spark, sfDir, "embeddings")
    val idxDir = Files.createTempDirectory("graft-ivf-live").toString
    val drop = Files.createTempDirectory("graft-ivf-drop").toString
    val ckpt = Files.createTempDirectory("graft-ivf-ckpt").toString

    // index holds vec_id >= 100; vec_id < 100 arrives by stream
    val base = emb.filter(col("vec_id") >= 100)
    val cents = IvfIndex.build(base, idxDir, k = 16, iters = 2)

    // two files -> two micro-batches under maxFilesPerTrigger=1
    emb.filter(col("vec_id") < 50).coalesce(1)
      .write.mode("append").parquet(drop)
    emb.filter(col("vec_id") >= 50 && col("vec_id") < 100).coalesce(1)
      .write.mode("append").parquet(drop)

    val q = IndexStreams.streamingIvfUpsert(
      IndexStreams.readEmbeddingStream(spark, drop), idxDir, ckpt).start()
    q.processAllAvailable()
    q.stop()

    // --- every streamed row landed exactly once, in its assigned cell ---
    val streamed = spark.read.parquet(s"$idxDir/stream_assignment")
    assert(streamed.count() == 100L)
    assert(streamed.select("vec_id").distinct().count() == 100L)
    val expectedAssign = IvfIndex.assignments(emb.filter(col("vec_id") < 100), cents)
      .select(col("vec_id"), col("cluster").as("expected"))
    assert(streamed.join(expectedAssign, "vec_id")
      .filter(col("cluster") =!= col("expected")).count() == 0L)

    // --- live search finds a STREAMED vector with the prune intact ---
    val qe = emb.filter(col("vec_id") === 0L).select("embedding").as[Array[Float]].head()
    val live = IvfIndex.searchIndexLive(spark, idxDir, qe, k = 10, nprobe = 4,
      excludeId = Some(0L))
    val plan = live.queryExecution.executedPlan.toString
    // base scan keeps the partition-level prune; the bounded channel is
    // scanned whole (LWW-before-prune — a re-upsert may move a vector
    // between cells) and the probe prune re-applies post-merge
    val inLists = "cluster#\\d+L? IN \\(([^)]*)\\)".r.findAllMatchIn(plan).toSeq
    assert(inLists.nonEmpty, s"expected cluster IN prune on the base scan in:\n$plan")
    assert("\\.cluster IN \\(".r.findFirstIn(plan).nonEmpty,
      s"expected the post-LWW probe prune on the merged view:\n$plan")
    assert(inLists.forall(_.group(1).split(",").length == 4),
      s"expected 4 probed cells per scan: $inLists")

    // equivalence: the live union must equal an on-the-fly scan of the
    // FULL corpus assigned against the same (base-trained) centroids
    val probes = IvfIndex.probeCells(cents, qe, nprobe = 4).map(c => c: Any)
    val expected = IvfIndex.assignments(emb, cents)
      .filter(col("cluster").isin(probes: _*) && col("vec_id") =!= 0L)
      .select(col("vec_id"),
        round(graft.functions.VectorFunctions.cosine_similarity(
          col("embedding"), array(qe.toSeq.map(lit): _*)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
      .collect()
    assert(live.collect().map(_.toString).sameElements(expected.map(_.toString)))
    // vec_id 0's own near-duplicates live in the streamed half, so the
    // top-10 must actually contain stream-ingested ids — the claim under test
    assert(live.collect().exists(_.getLong(0) < 100L),
      "top-10 contains no streamed vector; the live union is not being searched")

    // --- (2) replay idempotency: same batch id re-lands the same rows ---
    // (file arrival order is mod-time-dependent, so replay exactly the
    // rows the engine actually assigned to batch 0)
    val batch0Ids = spark.read.parquet(s"$idxDir/stream_assignment")
      .filter(col("batch") === 0L).select("vec_id").as[Long].collect().map(x => x: Any)
    assert(batch0Ids.length == 50)
    val batch0 = emb.filter(col("vec_id").isin(batch0Ids: _*))
    val before = spark.read.parquet(s"$idxDir/stream_assignment").count()
    val (rows1, cos1) = IndexStreams.upsertBatch(batch0, batchId = 0L, idxDir, cents)
    val (rows2, cos2) = IndexStreams.upsertBatch(batch0, batchId = 0L, idxDir, cents)
    assert(rows1 == 50L && rows2 == 50L && cos1 == cos2)
    assert(spark.read.parquet(s"$idxDir/stream_assignment").count() == before,
      "batch replay changed the row count — the overwrite-own-partition contract broke")

    // ...and the LOG honors the same contract: replaying the metric write
    // leaves exactly one row per batch id
    IndexStreams.logBatchMetric(spark, idxDir, batchId = 0L, rows1, cos1)
    IndexStreams.logBatchMetric(spark, idxDir, batchId = 0L, rows2, cos2)
    val log = IndexStreams.readUpsertLog(spark, idxDir)
    assert(log.groupBy("batch").count().filter(col("count") > 1).count() == 0L,
      "upsert_log has duplicate rows for a replayed batch")
    assert(log.filter(col("batch") === 0L).count() == 1L)

    // --- (3) the drift metric equals an independent recomputation ---
    val centMap = cents.toMap
    val perVec = IvfIndex.assignments(batch0, cents)
      .select(col("vec_id"), col("embedding"), col("cluster"))
      .as[(Long, Array[Float], Int)]
      .collect()
    val meanCos = perVec.map { case (_, v, c) => cosLocal(v, centMap(c)) }.sum / perVec.length
    assert(math.abs(cos1 - meanCos) < 1e-9,
      s"drift metric $cos1 != recomputed $meanCos")
  }
}
