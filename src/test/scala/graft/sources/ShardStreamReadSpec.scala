package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming read side of the graft-shards container: a tailer
  * must serve exactly the manifest-committed corpus, resume from its
  * checkpoint across restarts serving ONLY newly-committed shards, and
  * respect the per-trigger admission bound.
  */
class ShardStreamReadSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  test("tail → append → resumed tail: each run serves exactly the newly committed documents") {
    import spark.implicits._
    val out = Files.createTempDirectory("shard-tail").toString
    val ckpt = Files.createTempDirectory("shard-tail-ckpt").toString
    val docs = graft.ops.Tables.t(spark, dir, "documents")
    val first = docs.filter(col("doc_id") < 300)
    val second = docs.filter(col("doc_id") >= 300)
    TrainingShards.write(first, out, maxDocsPerShard = 64)

    // the memory sink refuses checkpoint recovery; collect through
    // foreachBatch (which supports it) into a driver-side buffer
    def drain(): Set[Long] = {
      val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val q = TrainingShards.readStream(spark, out, docs.schema)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("doc_id").as[Long].collect().foreach(seen.add)
        }
        .start()
      try q.processAllAvailable()
      finally q.stop()
      import scala.jdk.CollectionConverters._
      seen.asScala.toSet
    }

    val firstIds = first.select("doc_id").as[Long].collect().toSet
    val secondIds = second.select("doc_id").as[Long].collect().toSet
    assert(drain() == firstIds, "first run must serve the whole committed corpus")
    // append more docs, then RESUME from the same checkpoint
    TrainingShards.write(second, out, maxDocsPerShard = 64)
    assert(drain() == secondIds,
      "resumed run must serve ONLY the shards committed since the checkpointed offset")
  }

  test("tailing a directory with no manifest yet idles gracefully (loader starts before writer)") {
    val out = Files.createTempDirectory("shard-tail-empty").toString
    val ckpt = Files.createTempDirectory("shard-tail-empty-ckpt").toString
    val docs = graft.ops.Tables.t(spark, dir, "documents")
    val q = TrainingShards.readStream(spark, out, docs.schema)
      .writeStream.outputMode("append").format("memory").queryName("tail_empty")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.processAllAvailable()
    finally q.stop()
    assert(spark.table("tail_empty").count() == 0)
  }

  test("resuming a pre-compaction checkpoint fails LOUDLY instead of re-serving the corpus") {
    val out = Files.createTempDirectory("shard-tail-gen").toString
    val ckpt = Files.createTempDirectory("shard-tail-gen-ckpt").toString
    val docs = graft.ops.Tables.t(spark, dir, "documents").limit(100)
    TrainingShards.write(docs.repartition(4), out, maxDocsPerShard = 16)
    def run(): org.apache.spark.sql.streaming.StreamingQuery =
      TrainingShards.readStream(spark, out, docs.schema)
        .writeStream
        .option("checkpointLocation", ckpt) // memory sink refuses recovery; foreachBatch supports it
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
    val q1 = run()
    try q1.processAllAvailable() finally q1.stop()
    // compaction re-lands every consumed row under new names
    TrainingShards.compact(spark, out, maxDocsPerShard = 64)
    val q2 = run()
    val failure = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination()
    }
    q2.stop()
    val msg = Option(failure.getCause).map(_.toString).getOrElse("") + failure.toString
    assert(msg.contains("compacted") && msg.contains("FRESH checkpoint"),
      s"expected the generation-mismatch failure, got: $msg")
  }

  test("a tailer polling INSIDE the compaction window fails the generation check " +
    "(bump lands before the overwrite commit)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val out = Files.createTempDirectory("shard-tail-race").toString
    val docs = graft.ops.Tables.t(spark, dir, "documents").limit(100)
    TrainingShards.write(docs.repartition(4), out, maxDocsPerShard = 16)
    val stream = new ShardMicroBatchStream(
      out, None, new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    // a live tailer that has consumed the whole pre-compaction corpus
    val consumed = stream.latestOffset(stream.initialOffset(), ReadLimit.allAvailable())
    assert(consumed.asInstanceOf[ShardFilesOffset].files.nonEmpty)
    var polledInWindow = false
    TrainingShards.compactWithHook(spark, out, 64L, 64L << 20, () => {
      // the race the advisory names: the overwrite commit has NOT
      // happened yet, but the generation marker must already be live so
      // this poll fails loudly instead of (after the commit) admitting
      // every re-landed shard as unseen
      val e = intercept[IllegalArgumentException] {
        stream.latestOffset(consumed, ReadLimit.allAvailable())
      }
      assert(e.getMessage.contains("compacted"), s"wrong failure in the race window: $e")
      polledInWindow = true
    })
    assert(polledInWindow, "test hook never ran")
    // and after the commit the same poll still fails the same way
    val e2 = intercept[IllegalArgumentException] {
      stream.latestOffset(consumed, ReadLimit.allAvailable())
    }
    assert(e2.getMessage.contains("compacted"))
  }

  test("a FRESH tailer started INSIDE the compaction window fails loudly after the " +
    "commit instead of double-serving (generation bumps again after the overwrite)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val out = Files.createTempDirectory("shard-tail-race2").toString
    val docs = graft.ops.Tables.t(spark, dir, "documents").limit(100)
    TrainingShards.write(docs.repartition(4), out, maxDocsPerShard = 16)
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    var windowOffset: Option[org.apache.spark.sql.connector.read.streaming.Offset] = None
    var windowStream: Option[ShardMicroBatchStream] = None
    TrainingShards.compactWithHook(spark, out, 64L, 64L << 20, () => {
      // the advisory's race: a tailer STARTED inside the bump-to-commit
      // window pins the bumped generation while the manifest still
      // lists the OLD layout — its first poll consumes the old files
      // without tripping the single pre-commit bump
      val s = new ShardMicroBatchStream(out, None, conf)
      val consumed = s.latestOffset(s.initialOffset(), ReadLimit.allAvailable())
      assert(consumed.asInstanceOf[ShardFilesOffset].files.nonEmpty,
        "window tailer should have admitted the pre-commit layout")
      windowStream = Some(s)
      windowOffset = Some(consumed)
    })
    // after the commit the window tailer's pinned generation must be
    // stale — without the post-commit bump this poll would silently
    // admit every re-landed shard as unseen (full-corpus double-serve)
    val e = intercept[IllegalArgumentException] {
      windowStream.get.latestOffset(windowOffset.get, ReadLimit.allAvailable())
    }
    assert(e.getMessage.contains("compacted"), s"expected loud generation failure, got: $e")
  }

  test("offset JSON survives file names with quotes and backslashes (json4s round trip)") {
    val off = ShardFilesOffset(3L, Seq("""weird "name"\shard.jsonl.gz""", "plain.jsonl.gz"))
    val back = ShardFilesOffset.fromJson(off.json())
    assert(back == ShardFilesOffset(3L, off.files.sorted))
  }

  test("maxFilesPerTrigger bounds each micro-batch; AvailableNow still drains the backlog") {
    val out = Files.createTempDirectory("shard-tail-bounded").toString
    val ckpt = Files.createTempDirectory("shard-tail-bounded-ckpt").toString
    val docs = graft.ops.Tables.t(spark, dir, "documents")
    TrainingShards.write(docs.repartition(4), out, maxDocsPerShard = 32) // many shards
    val nShards = new java.io.File(out).list().count(_.endsWith(".jsonl.gz"))
    assert(nShards > 4)
    val q = TrainingShards.readStream(spark, out, docs.schema, maxFilesPerTrigger = Some(2))
      .writeStream.outputMode("append").format("memory").queryName("tail_bounded")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.processAllAvailable()
    finally q.stop()
    assert(spark.table("tail_bounded").count() == docs.count(), "backlog not fully drained")
    val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
    assert(dataBatches.length >= (nShards + 1) / 2,
      s"admission bound ignored: $nShards shards served in ${dataBatches.length} batches")
  }
}
