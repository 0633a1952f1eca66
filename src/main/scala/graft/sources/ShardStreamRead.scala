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
  * **Offset = (layout generation, consumed shard-file set)**. The
  * manifest is the container's source of truth for what is committed,
  * and shard names carry no global order (append tokens are random, a
  * sorted prefix is not append-stable), so the offset enumerates the
  * files themselves; serialization goes through json4s (proper
  * escaping — manifests written by other tools may carry any file
  * name). Offset size is O(#shards) per entry in the checkpoint log —
  * the cost of honest identity on an unordered container; keep shard
  * counts sane with the writer's shard targets.
  *
  * The GENERATION guards the one operation that silently breaks a
  * file-set offset: [[TrainingShards.compact]] re-lands every consumed
  * row under new names, so a tailer resuming a pre-compaction
  * checkpoint would re-serve the whole corpus as "new" shards. Compact
  * bumps the marker; the tailer fails LOUDLY on mismatch instead.
  * Writer crash recovery (epoch / pinned-token replays) re-lands only
  * the replayed batch's rows — the tailer serves those again:
  * at-least-once across writer failures, the standard source posture
  * (dedup downstream on a content key for exactly-once).
  *
  * Admission: `maxFilesPerTrigger` bounds each batch; with
  * `Trigger.AvailableNow` the manifest snapshot is pinned at query
  * start, so one invocation drains the backlog in bounded batches and
  * terminates. A shard is one gzip stream — unsplittable — so
  * parallelism equals shards per batch (the writer's shard targets are
  * the task-size knob).
  */
private[sources] case class ShardFilesOffset(generation: Long, files: Seq[String]) extends Offset {
  override def json(): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        ("gen" -> generation) ~ ("files" -> files.sorted)))
  }
}

private[sources] object ShardFilesOffset {
  import org.json4s._
  def fromJson(json: String): ShardFilesOffset = {
    val v = jackson.JsonMethods.parse(json)
    val gen = v \ "gen" match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case other => throw new IllegalArgumentException(s"corrupt graft-shards offset gen: $other")
    }
    val files = v \ "files" match {
      case JArray(items) => items.map {
        case JString(f) => f
        case other => throw new IllegalArgumentException(s"corrupt graft-shards offset file: $other")
      }
      case other => throw new IllegalArgumentException(s"corrupt graft-shards offset: $other")
    }
    ShardFilesOffset(gen, files.sorted)
  }
}

private[sources] case class ShardFilePartition(path: String) extends InputPartition

private[sources] class ShardMicroBatchStream(
    dir: String, maxFilesPerTrigger: Option[Int], conf: SerializableHadoopConf
) extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def fs = new HPath(dir).getFileSystem(conf.conf)

  private def manifestFiles(): Seq[String] =
    ShardManifest.readIfExists(fs, new HPath(dir)).map(_.file).sorted

  private def currentGeneration(): Long = ShardManifest.readGeneration(fs, new HPath(dir))

  /** The loud guard for the silent-re-serve failure mode: a checkpoint
    * written before a compaction must never resume against the
    * compacted layout.
    */
  private def requireGeneration(offsetGen: Long): Unit = {
    val now = currentGeneration()
    require(offsetGen == now,
      s"graft-shards directory $dir was compacted (layout generation $now, checkpoint has " +
        s"$offsetGen): the consumed-file offset cannot identify re-landed rows — restart the " +
        "tailer with a FRESH checkpoint (it will re-serve the full corpus once)")
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

  override def initialOffset(): Offset = ShardFilesOffset(currentGeneration(), Nil)
  override def deserializeOffset(json: String): Offset = ShardFilesOffset.fromJson(json)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ShardFilesOffset]
    requireGeneration(s.generation)
    val seen = s.files.toSet
    val avail = (if (pinned) ceiling else manifestFiles()).filterNot(seen)
    val admitted = maxFilesPerTrigger.fold(avail)(n => avail.take(n))
    if (admitted.isEmpty) start
    else ShardFilesOffset(s.generation, (seen ++ admitted).toSeq.sorted)
  }

  override def latestOffset(): Offset =
    throw new IllegalStateException("latestOffset(Offset, ReadLimit) should be called instead")

  override def reportLatestOffset(): Offset =
    ShardFilesOffset(currentGeneration(), manifestFiles())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardFilesOffset]
    requireGeneration(s.generation)
    val seen = s.files.toSet
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
  private val in = {
    val raw = path.getFileSystem(conf.conf).open(path)
    val decoded =
      if (path.getName.endsWith(".zst")) new com.github.luben.zstd.ZstdInputStream(raw)
      else new GZIPInputStream(raw)
    new BufferedReader(new InputStreamReader(decoded, UTF_8))
  }
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
