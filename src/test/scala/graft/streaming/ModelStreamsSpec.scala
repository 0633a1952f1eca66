package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** [[ModelStreams]] — the streaming classifier refresh: a drift in the
  * incoming data MOVES the published weights and the kept-set (the
  * verdict's done-bar), and the replay contract republishes
  * bit-identical weights because each batch warm-starts only from
  * versions strictly below its own id.
  */
class ModelStreamsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSpec.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  // batch A: 'verbose' co-occurs only with the fast (y=0) label;
  // batch B drifts it into the slow (y=1) side. 'calm' drifts the
  // opposite way. Balanced 60/60 classes per batch keep the intercept
  // out of the picture.
  private def batchA(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    ((0 until 60).map(i => (i.toLong, "verbose fast fast fill")) ++
      (60 until 120).map(i => (i.toLong, "slow slow calm fill"))).toDF("doc_id", "text")
  }
  // c=2 on the drifting tokens: the warm start resumes from batch A's
  // weights, so batch B must push past them, not merely cancel them
  private def batchB(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    ((200 until 260).map(i => (i.toLong, "verbose verbose slow slow fill")) ++
      (260 until 320).map(i => (i.toLong, "fast fast calm calm fill"))).toDF("doc_id", "text")
  }

  test("data drift moves the published weights AND the kept-set; " +
    "replay from version history is bit-identical; fresh-checkpoint rerun converges") {
    val drop = java.nio.file.Files.createTempDirectory("graft-model-drop").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-model-ckpt").toString
    val modelDir = java.nio.file.Files.createTempDirectory("graft-model").toString

    batchA(spark).coalesce(1).write.mode("append").parquet(drop)
    batchB(spark).coalesce(1).write.mode("append").parquet(drop)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(drop)
    val q = ModelStreams.weightRefreshStream(stream, modelDir, ckpt).start()
    q.processAllAvailable(); q.stop()

    val Some((v0, w0)) = ModelStreams.latestWeights(spark, modelDir, below = 1L)
    val Some((v1, w1)) = ModelStreams.latestWeights(spark, modelDir)
    assert(v0 == 0L && v1 == 1L, s"expected versions 0 and 1, got $v0 / $v1")
    assert(!w0.sameElements(w1), "drifted batch must move the published weights")

    // the kept-set moves with the weights: a pure-'verbose' probe doc is
    // rejected under the batch-A model and kept once batch B drifted the
    // token to the positive side (and 'calm' the other way)
    import spark.implicits._
    val probe = Seq((1L, "verbose verbose verbose verbose"),
      (2L, "calm calm calm calm")).toDF("doc_id", "text")
    def keeps(w: Array[Long]): Map[Long, Boolean] =
      TextOps.logregScore(probe, w).select("doc_id", "keep")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val (kA, kB) = (keeps(w0), keeps(w1))
    assert(kA(1L) == false && kB(1L) == true,
      s"'verbose' probe should flip rejected->kept across the drift: $kA -> $kB")
    assert(kA(2L) == true && kB(2L) == false,
      s"'calm' probe should flip kept->rejected across the drift: $kA -> $kB")

    // replay contract: batch 1 re-trained from the version history it
    // saw the first time (strictly-below its id) republishes the exact
    // same weights — compounding its own output is impossible
    val (_, hist) = TextOps.logregFit(batchB(spark), initW = Some(w0))
    assert(hist.last.sameElements(w1), "replayed batch must republish bit-identical weights")

    // fresh checkpoint over the same drop folder: same batch order, same
    // warm-start chain, same published versions
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-model-ckpt2").toString
    val q2 = ModelStreams.weightRefreshStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(drop),
      modelDir, ckpt2).start()
    q2.processAllAvailable(); q2.stop()
    val Some((_, w1b)) = ModelStreams.latestWeights(spark, modelDir)
    assert(w1b.sameElements(w1), "fresh-checkpoint rerun must converge to the same weights")
  }

  test("a single-class batch publishes the prior weights unchanged — " +
    "a skewed sliver never unlearns the model") {
    val modelDir = java.nio.file.Files.createTempDirectory("graft-model-degen").toString
    import spark.implicits._
    val (_, h0) = TextOps.logregFit(batchA(spark))
    ModelStreams.publishWeights(spark, modelDir, 0L, h0.last)
    val oneClass = (0 until 40).map(i => (i.toLong, "slow slow noisy fill")).toDF("doc_id", "text")
    val prev = ModelStreams.latestWeights(spark, modelDir, below = 1L).get._2
    val (_, h1) = TextOps.logregFit(oneClass, initW = Some(prev))
    assert(h1.last.sameElements(prev),
      "single-class batch has zero balanced gradient; weights must ride through unchanged")
  }
}
