package graft.sources

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions.{col, struct, to_json}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft-shards`: a batch DSv2 sink that lands a corpus as the standard
  * training-data container — newline-delimited JSON in gzip shards
  * (`.jsonl.gz`), rolled at a document/byte target, plus a job-commit
  * `_MANIFEST.json` naming every committed shard with its document count
  * and raw byte size.
  *
  * Why not `df.write.text`: the built-in text writer emits exactly one
  * file per partition with no size control and no manifest; a training
  * loader wants uniformly-sized shards it can schedule and a manifest it
  * can checksum. Why single-column: the sink takes one `line` string
  * column (callers serialize with `to_json(struct(...))` — see
  * [[TrainingShards.write]]), so the writer is pure container logic and
  * any schema ships through unchanged.
  *
  * Commit protocol: tasks write shards under their own (partitionId,
  * taskId) names — a retried task never collides with its predecessor —
  * and report them in the commit message; only shards from COMMITTED
  * tasks enter the manifest (aborted tasks delete their files best-
  * effort, and a reader that trusts the manifest never sees orphans).
  * The 100 TB posture: the driver handles shard NAMES and counts only;
  * all bytes move executor-side, one gzip stream open per task at a
  * time.
  */
class ShardSinkProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-shards"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ShardSinkProvider.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = {
    // getTable receives the options with their ORIGINAL key case (unlike
    // inferSchema's CaseInsensitiveStringMap) — normalize before lookup.
    val opts = new CaseInsensitiveStringMap(properties)
    def opt(k: String, default: String): String =
      Option(opts.get(k)).filter(_.nonEmpty).getOrElse(default)
    val path = Option(opts.get("path")).filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException("graft-shards requires option 'path'"))
    new ShardTable(path, opt("maxdocspershard", "100000").toLong, opt("maxshardbytes", s"${64L << 20}").toLong)
  }
}

object ShardSinkProvider {
  val schema: StructType = StructType(Seq(StructField("line", StringType, nullable = false)))
}

private[sources] class ShardTable(path: String, maxDocs: Long, maxBytes: Long)
    extends Table with SupportsWrite {
  require(maxDocs > 0 && maxBytes > 0, s"shard targets must be positive (docs=$maxDocs bytes=$maxBytes)")
  override def name(): String = s"graft-shards($path)"
  override def schema(): StructType = ShardSinkProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val cols = info.schema().fieldNames.toSeq
    require(cols == Seq("line"),
      s"graft-shards sink expects exactly one 'line' string column, got $cols")
    require(info.schema().fields.head.dataType == StringType,
      s"graft-shards 'line' column must be string, got ${info.schema().fields.head.dataType.simpleString}")
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // overwrite = same fresh dir semantics
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ShardBatchWrite(path, maxDocs, maxBytes)
      }
    }
  }
}

private[sources] class ShardBatchWrite(path: String, maxDocs: Long, maxBytes: Long) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    ShardWriterFactory(path, maxDocs, maxBytes)

  /** Job commit = write the manifest naming every committed shard. The
    * manifest is the read gate: shards not named here are garbage from
    * aborted attempts and are ignored by manifest-trusting readers.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val shards = messages.collect { case ShardsWritten(s) => s }.flatten.sortBy(_.file)
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val entries = shards.map { s =>
      s"""{"file": ${q(s.file)}, "docs": ${s.docs}, "raw_bytes": ${s.rawBytes}}"""
    }
    val json =
      s"""{"n_shards": ${shards.length}, "total_docs": ${shards.map(_.docs).sum},
         |"total_raw_bytes": ${shards.map(_.rawBytes).sum},
         |"shards": [${entries.mkString(",\n  ")}]}""".stripMargin
    val tmp = Paths.get(path, "_MANIFEST.json.tmp")
    Files.createDirectories(Paths.get(path))
    Files.write(tmp, json.getBytes(UTF_8))
    Files.move(tmp, Paths.get(path, "_MANIFEST.json"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case ShardsWritten(s) => s }.flatten
      .foreach(s => new File(path, s.file).delete())
}

private[sources] case class ShardWriterFactory(path: String, maxDocs: Long, maxBytes: Long)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ShardDataWriter(path, partitionId, taskId, maxDocs, maxBytes)
}

/** Rolls gzip shard files as lines arrive: a shard closes once it holds
  * `maxDocs` documents or `maxBytes` raw (pre-compression) bytes. One
  * open stream per task; files are named
  * `part-{partitionId}-{taskId}.{seq}.jsonl.gz` so task retries cannot
  * collide, and the commit message (not the directory listing) is the
  * source of truth for what this attempt produced.
  */
private[sources] class ShardDataWriter(
    path: String, partitionId: Int, taskId: Long, maxDocs: Long, maxBytes: Long
) extends DataWriter[InternalRow] {
  private val written = scala.collection.mutable.ArrayBuffer.empty[ShardInfo]
  private var out: GZIPOutputStream = _
  private var seq = 0
  private var docs = 0L
  private var rawBytes = 0L

  private def fileName(n: Int) = f"part-$partitionId%05d-$taskId.$n%03d.jsonl.gz"

  private def roll(): Unit = {
    closeCurrent()
    val f = new File(path, fileName(seq))
    f.getParentFile.mkdirs()
    out = new GZIPOutputStream(new BufferedOutputStream(new FileOutputStream(f), 1 << 16))
    docs = 0L
    rawBytes = 0L
  }

  private def closeCurrent(): Unit =
    if (out != null) {
      out.finish(); out.close()
      written += ShardInfo(fileName(seq), docs, rawBytes)
      out = null
      seq += 1
    }

  override def write(row: InternalRow): Unit = {
    val bytes = (row.getUTF8String(0).toString + "\n").getBytes(UTF_8)
    if (out == null || docs >= maxDocs || rawBytes + bytes.length > maxBytes) roll()
    out.write(bytes)
    docs += 1
    rawBytes += bytes.length
  }

  override def commit(): WriterCommitMessage = {
    closeCurrent()
    ShardsWritten(written.toSeq)
  }

  override def abort(): Unit = {
    if (out != null) { out.close(); out = null }
    (0 to seq).foreach(n => new File(path, fileName(n)).delete())
  }

  override def close(): Unit = if (out != null) { out.close(); out = null }
}

case class ShardInfo(file: String, docs: Long, rawBytes: Long)
case class ShardsWritten(shards: Seq[ShardInfo]) extends WriterCommitMessage

/** Caller-facing API over the `graft-shards` container. */
object TrainingShards {
  /** Serialize every column of `df` into JSON lines and land them as
    * `.jsonl.gz` shards under `dir`. Shard targets bound DOCUMENT count
    * and RAW byte size per shard (compression ratio varies by corpus;
    * the raw bound is what a training loader's memory budget sees).
    */
  def write(df: DataFrame, dir: String, maxDocsPerShard: Long = 100000L,
            maxShardBytes: Long = 64L << 20): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("line"))
      .write.format("graft-shards")
      .option("path", dir)
      .option("maxDocsPerShard", maxDocsPerShard.toString)
      .option("maxShardBytes", maxShardBytes.toString)
      .mode("append")
      .save()

  /** Read a shard directory back as rows (Spark's json reader handles
    * the gzip members natively; pass `schema` to skip inference).
    */
  def read(spark: SparkSession, dir: String, schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
    schema.fold(base)(base.schema).json(s"$dir/part-*.jsonl.gz")
  }
}
