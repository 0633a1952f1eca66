package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.unsafe.types.UTF8String

/** Streaming READ side of the `graft-shards` container: a training
  * loader tails the curated corpus as it is written —
  * `spark.readStream.format("graft-shards").option("path", dir).load()`
  * yields the raw `line` column (parse with `from_json`); each
  * micro-batch serves exactly the shards that entered the manifest
  * since the last batch.
  *
  * **Offset = the consumed shard-file set** (sorted names). The
  * manifest is the container's source of truth for what is committed,
  * and shard names carry no global order (append tokens are random, a
  * sorted prefix is not append-stable), so the offset enumerates the
  * files themselves. Offset size is O(#shards) — bounded in practice
  * by [[TrainingShards.compact]], which is also why a live tailer and
  * a compaction must not run concurrently (compaction re-lands
  * consumed rows under new file names, which an explicit-set offset
  * has no way to recognize as replays; same single-writer contract as
  * the writer side).
  *
  * Admission: `maxFilesPerTrigger` bounds each batch; with
  * `Trigger.AvailableNow` the manifest snapshot is pinned at query
  * start, so one invocation drains the backlog in bounded batches and
  * terminates. A shard is one gzip stream — unsplittable — so
  * parallelism equals shards per batch (the writer's shard targets are
  * the task-size knob).
  */
private[sources] case class ShardFilesOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    files.sorted.map(f => "\"" + f + "\"").mkString("[", ",", "]")
}

private[sources] object ShardFilesOffset {
  def fromJson(json: String): ShardFilesOffset =
    ShardFilesOffset("\"([^\"]+)\"".r.findAllMatchIn(json).map(_.group(1)).toSeq.sorted)
}

private[sources] case class ShardFilePartition(path: String) extends InputPartition

private[sources] class ShardMicroBatchStream(
    dir: String, maxFilesPerTrigger: Option[Int], conf: SerializableHadoopConf
) extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def manifestFiles(): Seq[String] = {
    val dirPath = new HPath(dir)
    val fs = dirPath.getFileSystem(conf.conf)
    ShardManifest.readIfExists(fs, dirPath).map(_.file).sorted
  }

  /** AvailableNow ceiling: the manifest snapshot at query start; shards
    * committed mid-run wait for the next invocation. `pinned`
    * disambiguates "prepared on an empty directory" from "no ceiling".
    */
  @volatile private var ceiling: Seq[String] = Nil
  @volatile private var pinned: Boolean = false

  override def prepareForTriggerAvailableNow(): Unit = {
    ceiling = manifestFiles()
    pinned = true
  }

  override def initialOffset(): Offset = ShardFilesOffset(Nil)
  override def deserializeOffset(json: String): Offset = ShardFilesOffset.fromJson(json)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = start.asInstanceOf[ShardFilesOffset].files.toSet
    val avail = (if (pinned) ceiling else manifestFiles()).filterNot(seen)
    val admitted = maxFilesPerTrigger.fold(avail)(n => avail.take(n))
    if (admitted.isEmpty) start
    else ShardFilesOffset((seen ++ admitted).toSeq.sorted)
  }

  override def latestOffset(): Offset =
    throw new IllegalStateException("latestOffset(Offset, ReadLimit) should be called instead")

  override def reportLatestOffset(): Offset = ShardFilesOffset(manifestFiles())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[ShardFilesOffset].files.toSet
    end.asInstanceOf[ShardFilesOffset].files
      .filterNot(seen)
      .map(f => ShardFilePartition(new HPath(new HPath(dir), f).toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = ShardLineReaderFactory(conf)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class ShardLineReaderFactory(conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ShardLineReader(partition.asInstanceOf[ShardFilePartition], conf)
}

/** Streams one shard's gzip jsonl: one row per line, one open stream,
  * constant memory beyond the current line.
  */
private[sources] class ShardLineReader(partition: ShardFilePartition, conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {
  private val path = new HPath(partition.path)
  private val in = new BufferedReader(new InputStreamReader(
    new GZIPInputStream(path.getFileSystem(conf.conf).open(path)), UTF_8))
  private var current: InternalRow = _

  override def next(): Boolean = {
    val line = in.readLine()
    if (line == null) false
    else {
      current = new GenericInternalRow(Array[Any](UTF8String.fromString(line)))
      true
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
