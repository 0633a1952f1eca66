package graft.sources

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration
import org.slf4j.LoggerFactory

/** DataSource V2 micro-batch source over KAFKA-WIRE-FORMAT log segments —
  * the upstream the reference's data originates from ("Ingest encrypted UC
  * Kafka audit data", `/root/reference/README.md:5`) even though the
  * script itself reads the HDFS drop. This closes the "Structured
  * Streaming with Kafka source" north star against an offline environment
  * with no Kafka broker or client jars: the on-disk layout and record
  * framing are Kafka's own public formats, read directly.
  *
  * Layout (Kafka's log directory convention):
  * {{{
  *   root/<topic>-<partition>/<20-digit base offset>.log
  * }}}
  *
  * Record framing: the public legacy v1 message format (Kafka protocol
  * guide, "Messagesets") — big-endian throughout:
  * {{{
  *   offset:8  message_size:4  crc:4  magic:1  attributes:1
  *   timestamp:8  key_len:4  key  value_len:4  value
  * }}}
  * `crc` is CRC-32 of everything after the crc field; verified per record,
  * corrupt frames fail loudly with file/offset context. Compressed
  * wrapper messages (attributes bits 0-2 != 0) are rejected — this
  * minimal reader covers the uncompressed audit-record shape.
  *
  * Output schema mirrors Spark's own Kafka source (key, value, topic,
  * partition, offset, timestamp, timestampType), so downstream transforms
  * written against a real Kafka source run unchanged.
  *
  * Semantics:
  *  - **Offset = {topicPartition -> next offset to read}**, checkpointed
  *    by Spark's offset log — restart resumes exactly, at-least-once into
  *    an idempotent sink (the object store's overwrite-same-key).
  *  - **One InputPartition per topic-partition per batch** — Kafka's own
  *    parallelism model; a reader seeks into the segment containing its
  *    start offset (segments are named by base offset, so the seek is a
  *    filename binary search, not a scan).
  *  - `maxRecordsPerTrigger` caps each batch's admitted records,
  *    distributed as a max-min fair share across partitions (equal
  *    splits, surplus from quiet partitions rolling to deep backlogs).
  *  - [[SupportsTriggerAvailableNow]] pins the end offsets at query start:
  *    one invocation drains the backlog and terminates.
  *
  * 100 TB posture: the driver holds only directory names and per-partition
  * offset longs; discovering a partition's log-end offset header-skips the
  * LAST segment only (seek past payloads, never reading them), and record
  * bytes stream through executors. Parallelism = topic partitions, the
  * same ceiling a real Kafka consumer group has.
  */
class KafkaLogSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafkalog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KafkaLogFormat.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = new KafkaLogTable(new CaseInsensitiveStringMap(properties))
}

/** Wire format read/write + schema. The writer exists for tests and for
  * producing fixture segments; the reader is the executor-side hot path.
  */
object KafkaLogFormat {
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("timestampType", IntegerType, nullable = false)
  ))

  val Magic: Byte = 1 // v1: has a timestamp field
  val CreateTime = 1 // Kafka TimestampType.CREATE_TIME

  def segmentName(baseOffset: Long): String = f"$baseOffset%020d.log"

  /** One decoded record. `timestampMs` is the producer CreateTime. */
  case class Record(offset: Long, timestampMs: Long, key: Array[Byte], value: Array[Byte])

  private def crcOf(buf: Array[Byte], from: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(buf, from, len)
    c.getValue
  }

  /** Encode one record to the v1 wire bytes. */
  def encode(r: Record): Array[Byte] = {
    val keyLen = if (r.key == null) -1 else r.key.length
    val valLen = if (r.value == null) -1 else r.value.length
    val msgSize = 4 + 1 + 1 + 8 + 4 + math.max(keyLen, 0) + 4 + math.max(valLen, 0)
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + msgSize) // big-endian by default
    bb.putLong(r.offset).putInt(msgSize)
    val crcPos = bb.position()
    bb.putInt(0) // crc back-patched below
    bb.put(Magic).put(0: Byte).putLong(r.timestampMs)
    bb.putInt(keyLen); if (keyLen > 0) bb.put(r.key)
    bb.putInt(valLen); if (valLen > 0) bb.put(r.value)
    val arr = bb.array()
    val crc = crcOf(arr, crcPos + 4, arr.length - crcPos - 4)
    bb.putInt(crcPos, crc.toInt)
    arr
  }

  /** Write records as one segment file named by the first record's offset.
    * Returns the segment path.
    */
  def writeSegment(fs: org.apache.hadoop.fs.FileSystem, dir: Path, records: Seq[Record]): Path = {
    require(records.nonEmpty, "empty segment")
    val seg = new Path(dir, segmentName(records.head.offset))
    val out = fs.create(seg, /* overwrite = */ false)
    try records.foreach(r => out.write(encode(r)))
    finally out.close()
    seg
  }

  /** Iterate records of a segment starting at its first frame, verifying
    * CRCs. `skipPayloadsOnly` = header scan for log-end discovery: seeks
    * past key/value bytes without materializing them (records carry null
    * key/value then).
    */
  def readSegment(
      in: org.apache.hadoop.fs.FSDataInputStream,
      segLen: Long,
      segPath: String,
      skipPayloadsOnly: Boolean
  ): Iterator[Record] = new Iterator[Record] {
    private var pos = 0L
    private val header = new Array[Byte](12)

    override def hasNext: Boolean = pos + 12 <= segLen

    override def next(): Record = {
      in.readFully(pos, header)
      val hb = java.nio.ByteBuffer.wrap(header)
      val offset = hb.getLong
      val msgSize = hb.getInt
      require(msgSize >= 22 && pos + 12 + msgSize <= segLen,
        s"$segPath: corrupt frame at byte $pos (message_size=$msgSize, segment=$segLen bytes)")
      val rec =
        if (skipPayloadsOnly) Record(offset, 0L, null, null)
        else {
          val msg = new Array[Byte](msgSize)
          in.readFully(pos + 12, msg)
          val mb = java.nio.ByteBuffer.wrap(msg)
          val crc = mb.getInt & 0xffffffffL
          val actual = crcOf(msg, 4, msgSize - 4)
          require(crc == actual,
            s"$segPath: CRC mismatch at offset $offset (stored $crc, computed $actual)")
          val magic = mb.get()
          require(magic == Magic, s"$segPath: unsupported magic $magic at offset $offset (only v1)")
          val attributes = mb.get()
          require((attributes & 0x07) == 0,
            s"$segPath: compressed message sets are not supported (attributes=$attributes)")
          val ts = mb.getLong
          val keyLen = mb.getInt
          val key = if (keyLen < 0) null else { val a = new Array[Byte](keyLen); mb.get(a); a }
          val valLen = mb.getInt
          val value = if (valLen < 0) null else { val a = new Array[Byte](valLen); mb.get(a); a }
          Record(offset, ts, key, value)
        }
      pos += 12 + msgSize
      rec
    }
  }
}

private[sources] class KafkaLogTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val root = {
    val r = options.get("root")
    require(r != null && r.nonEmpty, "graft-kafkalog source requires option 'root'")
    r
  }
  override def name(): String = s"graft-kafkalog($root)"
  override def schema(): StructType = KafkaLogFormat.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KafkaLogFormat.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KafkaLogMicroBatchStream(root, options)
        private lazy val batchScan = new KafkaLogBatchScan(root, options)
        override def toBatch: Batch = batchScan
      }
    }
}

/** Batch form: everything from offset 0 to the current log end, one scan. */
private[sources] class KafkaLogBatchScan(root: String, options: CaseInsensitiveStringMap)
    extends Batch {
  private val stream = new KafkaLogMicroBatchStream(root, options)
  private lazy val planned: Array[InputPartition] = {
    val end = stream.endOffsets()
    stream.plan(end.map { case (tp, _) => tp -> 0L }, end)
  }
  override def planInputPartitions(): Array[InputPartition] = planned
  override def createReaderFactory(): PartitionReaderFactory = stream.createReaderFactory()
}

/** Offset: topicPartition dir name -> next offset to read (Kafka's shape). */
private[sources] case class KafkaLogOffset(offsets: Map[String, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sorted.map { case (tp, o) => s""""$tp":$o""" }.mkString("{", ",", "}")
}

private[sources] object KafkaLogOffset {
  private val Entry = """"([^"]+)"\s*:\s*(\d+)""".r
  def fromJson(json: String): KafkaLogOffset = {
    val t = json.trim
    require(t.startsWith("{") && t.endsWith("}"), s"Corrupt graft-kafkalog offset: '$json'")
    KafkaLogOffset(Entry.findAllMatchIn(t).map(m => m.group(1) -> m.group(2).toLong).toMap)
  }
}

/** One topic-partition's admitted range plus its segment files
  * (path, length, baseOffset), sorted by base offset.
  */
private[sources] case class KafkaLogPartition(
    topic: String,
    partition: Int,
    startOffset: Long,
    endOffset: Long,
    segments: Seq[(String, Long, Long)]
) extends InputPartition

private[sources] class KafkaLogMicroBatchStream(root: String, options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private val log = LoggerFactory.getLogger(getClass)
  private def spark = SparkSession.active
  private val maxRecordsPerTrigger =
    Option(options.get("maxrecordspertrigger")).map(_.toLong).filter(_ > 0)

  private val TpDir = """(.+)-(\d+)""".r

  /** topicPartition dir name -> sorted segment files (path, len, baseOffset). */
  private def listSegments(): Map[String, Seq[(String, Long, Long)]] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Map.empty
    fs.listStatus(p).filter(_.isDirectory).collect {
      case st if TpDir.pattern.matcher(st.getPath.getName).matches() =>
        val segs = fs.listStatus(st.getPath)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".log"))
          .map(s => (s.getPath.toString, s.getLen, s.getPath.getName.stripSuffix(".log").toLong))
          .sortBy(_._3).toSeq
        st.getPath.getName -> segs
    }.toMap
  }

  /** Log-end offset per partition: header-skip the LAST segment only. */
  private[sources] def endOffsets(): Map[String, Long] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    listSegments().map { case (tp, segs) =>
      tp -> segs.lastOption.map { case (path, len, base) =>
        val in = fs.open(new Path(path))
        try {
          val it = KafkaLogFormat.readSegment(in, len, path, skipPayloadsOnly = true)
          var end = base
          while (it.hasNext) end = it.next().offset + 1
          end
        } finally in.close()
      }.getOrElse(0L)
    }
  }

  @volatile private var availableNowEnd: Option[Map[String, Long]] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowEnd = Some(endOffsets())
    log.info(s"AvailableNow end offsets pinned at $availableNowEnd")
  }

  override def initialOffset(): Offset = KafkaLogOffset(Map.empty) // absent partition = 0

  override def deserializeOffset(json: String): Offset = KafkaLogOffset.fromJson(json)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[KafkaLogOffset].offsets
    val end = availableNowEnd.getOrElse(endOffsets())
    val admitted = maxRecordsPerTrigger match {
      case None => end
      case Some(budget) =>
        // max-min fair share: walk partitions by ASCENDING backlog
        // (name-tiebroken), giving each an equal split of the budget
        // still unspent — a partition with less backlog than its share
        // takes only its backlog and the surplus rolls forward, so a hot
        // partition can never starve a quiet one within the batch, and
        // integer-division remainders land on the deepest backlogs.
        var remaining = math.max(budget, 0L)
        val byBacklog = end.toSeq
          .map { case (tp, e) =>
            val s = from.getOrElse(tp, 0L)
            (tp, s, math.max(e - s, 0L))
          }
          .sortBy { case (tp, _, backlog) => (backlog, tp) }
        var partsLeft = byBacklog.size
        byBacklog.map { case (tp, s, backlog) =>
          val fair = if (partsLeft > 0) remaining / partsLeft else 0L
          val take = math.min(backlog, fair)
          remaining -= take
          partsLeft -= 1
          tp -> (s + take)
        }.toMap
    }
    val merged = (from.keySet ++ admitted.keySet)
      .map(tp => tp -> math.max(from.getOrElse(tp, 0L), admitted.getOrElse(tp, 0L))).toMap
    KafkaLogOffset(merged)
  }

  override def latestOffset(): Offset =
    throw new IllegalStateException("latestOffset(Offset, ReadLimit) should be called instead")
  override def reportLatestOffset(): Offset = KafkaLogOffset(endOffsets())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    plan(start.asInstanceOf[KafkaLogOffset].offsets, end.asInstanceOf[KafkaLogOffset].offsets)

  private[sources] def plan(
      from: Map[String, Long],
      to: Map[String, Long]
  ): Array[InputPartition] = {
    val segs = listSegments()
    to.toSeq.sorted.flatMap { case (tp, e) =>
      val s = from.getOrElse(tp, 0L)
      if (e <= s) None
      else {
        val TpDir(topic, pnum) = tp
        val all = segs.getOrElse(tp, Nil)
        // keep segments that can contain [s, e): those whose successor's
        // base is > s (filename binary search, no file reads)
        val wanted = all.zipWithIndex.filter { case (_, i) =>
          val nextBase = all.lift(i + 1).map(_._3).getOrElse(Long.MaxValue)
          nextBase > s && all(i)._3 < e
        }.map(_._1)
        Some(KafkaLogPartition(topic, pnum.toInt, s, e, wanted): InputPartition)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    KafkaLogReaderFactory(new SerializableConfiguration(spark.sparkContext.hadoopConfiguration))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class KafkaLogReaderFactory(conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KafkaLogRecordReader(partition.asInstanceOf[KafkaLogPartition], conf)
}

/** Streams records of one topic-partition's admitted [start, end) range,
  * one open segment at a time.
  */
private[sources] class KafkaLogRecordReader(
    p: KafkaLogPartition,
    conf: SerializableConfiguration
) extends PartitionReader[InternalRow] {
  private val topicUtf8 = UTF8String.fromString(p.topic)
  private val segIt = p.segments.iterator
  private var in: org.apache.hadoop.fs.FSDataInputStream = _
  private var recIt: Iterator[KafkaLogFormat.Record] = Iterator.empty
  private var current: InternalRow = _

  private def openNextSegment(): Boolean = {
    if (in != null) { in.close(); in = null }
    if (!segIt.hasNext) return false
    val (path, len, _) = segIt.next()
    val hp = new Path(path)
    in = hp.getFileSystem(conf.value).open(hp)
    recIt = KafkaLogFormat.readSegment(in, len, path, skipPayloadsOnly = false)
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (recIt.hasNext) {
        val r = recIt.next()
        if (r.offset >= p.endOffset) return false
        if (r.offset >= p.startOffset) {
          current = new GenericInternalRow(Array[Any](
            r.key, r.value, topicUtf8, p.partition, r.offset,
            r.timestampMs * 1000L, KafkaLogFormat.CreateTime))
          return true
        }
      } else if (!openNextSegment()) return false
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (in != null) in.close()
}
