package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[IvfIndex.searchIndexLiveMany]] — the batched live serving path the
  * hybrid legs (r14/r20) ride instead of a per-query driver loop.
  * Contracts:
  *
  *  1. CHURN PARITY: under the full r20 churn script (build on a
  *     subset, two upsert epochs, tombstones, a re-upsert resurface)
  *     the batch answer is row-identical per query to Q independent
  *     [[IvfIndex.searchIndexLive]] calls — at a nprobe where routing
  *     DIFFERS per query, so the per-query admit column stack is
  *     actually exercised (nprobe=16 would mask a routing bug);
  *  2. QUIESCENT PARITY: same equality on an index with no churn
  *     channels (the fast path that skips the LWW exchange);
  *  3. SCALE SHAPE: the Spark JOB COUNT of serving the panel is
  *     INDEPENDENT of panel size (a 2-query and an 8-query panel cost
  *     the same number of jobs) — the property the per-qid
  *     `search(...).collect()` loop violated (Q jobs) and the reason
  *     a 10k-query serving panel stays driver-bottleneck-free.
  */
class LiveBatchParitySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
  private def rm(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def panelOf(ids: Seq[Long]): Map[Long, Array[Float]] = {
    import spark.implicits._
    emb.filter(col("vec_id").isin(ids.map(x => x: Any): _*))
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
  }

  private def perQueryRows(idxDir: String, panel: Map[Long, Array[Float]],
      k: Int, nprobe: Int): Seq[(Long, Int, Long, Double)] =
    panel.keys.toSeq.sorted.flatMap { qid =>
      IvfIndex.searchIndexLive(spark, idxDir, panel(qid), k, nprobe)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getDouble(1)) }
    }

  private def batchRows(idxDir: String, panel: Map[Long, Array[Float]],
      k: Int, nprobe: Int): Seq[(Long, Int, Long, Double)] =
    IvfIndex.searchIndexLiveMany(spark, idxDir, panel, k, nprobe)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

  private def churnScript(idxDir: String): Unit = {
    import graft.streaming.IndexStreams
    IvfIndex.build(emb.filter(col("vec_id") >= 100), idxDir, k = 16, iters = 2)
    val cents = IvfIndex.loadCentroids(spark, idxDir)
    IndexStreams.upsertBatch(emb.filter(col("vec_id") < 50), 0L, idxDir, cents)
    IndexStreams.upsertBatch(
      emb.filter(col("vec_id") >= 50 && col("vec_id") < 100), 1L, idxDir, cents)
    IndexStreams.tombstoneBatch(spark, Seq(1L, 2L, 3L, 105L), 2L, idxDir)
    IndexStreams.upsertBatch(emb.filter(col("vec_id") === 1L), 3L, idxDir, cents)
  }

  test("churn parity: batch == Q searchIndexLive calls under upserts + tombstones + " +
    "resurface, at a nprobe where per-query routing differs") {
    val dir = tmp("live-many-churn")
    try {
      churnScript(dir)
      val panel = panelOf(Seq(1L, 2L, 3L, 4L))
      // nprobe=4 of 16: each query admits only its own routed cells
      assert(batchRows(dir, panel, k = 10, nprobe = 4) ==
        perQueryRows(dir, panel, k = 10, nprobe = 4))
      // and at full probe coverage (the r20 operating point)
      assert(batchRows(dir, panel, k = 10, nprobe = 16) ==
        perQueryRows(dir, panel, k = 10, nprobe = 16))
    } finally rm(dir)
  }

  test("quiescent parity: batch == Q calls on a churn-free index (the fast path)") {
    val dir = tmp("live-many-quiet")
    try {
      IvfIndex.build(emb, dir, k = 16, iters = 2)
      val panel = panelOf(Seq(0L, 5L, 9L))
      assert(batchRows(dir, panel, k = 10, nprobe = 4) ==
        perQueryRows(dir, panel, k = 10, nprobe = 4))
    } finally rm(dir)
  }

  test("scale shape: serving an 8-query panel costs exactly as many Spark jobs as a " +
    "2-query panel — job count is independent of panel size") {
    val dir = tmp("live-many-jobs")
    try {
      churnScript(dir)
      def jobsFor(panel: Map[Long, Array[Float]]): Int = {
        val df = IvfIndex.searchIndexLiveMany(spark, dir, panel, k = 10, nprobe = 16)
        val jobs = new java.util.concurrent.atomic.AtomicInteger()
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.incrementAndGet()
        }
        spark.sparkContext.addSparkListener(listener)
        try { df.collect(); () } finally {
          Thread.sleep(1500) // let the async listener bus drain
          spark.sparkContext.removeSparkListener(listener)
        }
        jobs.get()
      }
      val small = jobsFor(panelOf(Seq(1L, 2L)))
      val large = jobsFor(panelOf(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)))
      assert(large == small,
        s"panel of 8 took $large jobs vs $small for panel of 2 — batch path is looping")
    } finally rm(dir)
  }
}
