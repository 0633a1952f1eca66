package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.ops.TextOps

/** Streaming REFRESH of the d64/p05 quality classifier — the online
  * half of the DCLM/fastText train-then-filter loop: each arriving
  * micro-batch of labeled documents CONTINUES the gradient descent
  * from the last published weights (warm start via
  * [[TextOps.logregFit]]'s `initW`) and publishes the updated
  * micro-logit vector as a VERSIONED sidecar the d39/p05 scorer
  * broadcasts ([[TextOps.logregScore]] takes the vector as is — the
  * swap-in seam, now fed by a stream). Training cost per batch is
  * O(batch) scan + O(buckets) gradient collects per iteration —
  * independent of the corpus already seen, which is what makes
  * continuous refresh viable at 100 TB arrival rates.
  *
  * Versioning/idempotency contract (the IndexStreams upsert_log
  * discipline): batch `i`'s weights land by OVERWRITE under
  * `modelDir/weights/batch=i`, and the warm start reads the latest
  * version STRICTLY BELOW the current batch id — so a replayed epoch
  * re-trains from exactly the state its first attempt saw and
  * republishes bit-identical weights instead of compounding its own
  * output. A degenerate batch (single-class) contributes zero
  * balanced gradient and republishes the prior weights unchanged —
  * the stream never "unlearns" from a skewed sliver.
  */
object ModelStreams {

  /** Publish one weight version: (bucket, w) rows under its own
    * `batch=<id>` partition directory, overwrite-idempotent.
    */
  def publishWeights(spark: SparkSession, modelDir: String, batchId: Long, w: Array[Long]): Unit = {
    import spark.implicits._
    w.zipWithIndex.map { case (wv, j) => (j.toLong, wv) }.toSeq
      .toDF("bucket", "w")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$modelDir/weights/batch=$batchId")
  }

  /** The newest published (version, weights) with version < `below`
    * (pass Long.MaxValue for "latest overall" — the scorer's read).
    * None when nothing is published yet.
    */
  def latestWeights(spark: SparkSession, modelDir: String,
                    below: Long = Long.MaxValue): Option[(Long, Array[Long])] = {
    val root = new org.apache.hadoop.fs.Path(s"$modelDir/weights")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else {
      val versions = fs.listStatus(root).iterator
        .map(_.getPath.getName)
        .filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong)
        .filter(_ < below)
        .toSeq
      if (versions.isEmpty) None
      else {
        val v = versions.max
        val rows = spark.read.parquet(s"$modelDir/weights/batch=$v")
          .select("bucket", "w")
          .collect()
        val w = new Array[Long](rows.length)
        rows.foreach(r => w(r.getAs[Long]("bucket").toInt) = r.getAs[Long]("w"))
        Some((v, w))
      }
    }
  }

  /** Wire the refresh: every micro-batch warm-starts from the newest
    * version published by an EARLIER batch, runs `iters` descent steps
    * on its own rows, and publishes under its batch id.
    */
  def weightRefreshStream(
      docs: DataFrame,
      modelDir: String,
      checkpoint: String,
      buckets: Int = 256,
      iters: Int = 3): DataStreamWriter[org.apache.spark.sql.Row] = {
    val spark = docs.sparkSession
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val prev = latestWeights(spark, modelDir, below = batchId).map(_._2)
        val (_, hist) = TextOps.logregFit(batch, buckets, iters, initW = prev)
        publishWeights(spark, modelDir, batchId, hist.last)
      }
  }
}
