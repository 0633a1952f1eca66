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
  * Record framing: BOTH public on-disk formats, dispatched per frame on
  * the magic byte (which Kafka deliberately keeps at the same frame
  * position — byte 16 — across formats, exactly so readers can do this):
  *
  *  - **Legacy v1 messages** (protocol guide, "Messagesets"), big-endian:
  *    {{{
  *    offset:8  message_size:4  crc:4  magic:1  attributes:1
  *    timestamp:8  key_len:4  key  value_len:4  value
  *    }}}
  *    `crc` is CRC-32 of everything after the crc field. Compressed
  *    wrapper messages (attributes bits 0-2: gzip, xerial-framed snappy,
  *    or lz4) are decompressed: the wrapper's value is an inner message
  *    set with RELATIVE offsets, the wrapper offset is the absolute
  *    offset of the LAST inner record, so `absolute = wrapper - lastRel
  *    + rel` (the consumer-side rule from the protocol guide). v1-era
  *    lz4 wrappers carry a legacy frame-header checksum (pre-KIP-57
  *    clients hashed the frame magic too) — the lenient lz4 decoder
  *    accepts either convention and rejects frames matching neither.
  *  - **Record batches v2** (magic 2) — what every Kafka >= 0.11 broker
  *    writes:
  *    {{{
  *    baseOffset:8  batchLength:4  partitionLeaderEpoch:4  magic:1
  *    crc:4(CRC-32C of attributes..end)  attributes:2  lastOffsetDelta:4
  *    baseTimestamp:8  maxTimestamp:8  producerId:8  producerEpoch:2
  *    baseSequence:4  recordCount:4  records
  *    }}}
  *    Each record is varint-framed (zigzag, protobuf-style):
  *    length, attributes:1, timestampDelta(varlong), offsetDelta(varint),
  *    keyLen(varint, -1=null), key, valueLen(varint, -1=null), value,
  *    headerCount(varint) then per-header varint-framed key/value pairs
  *    (parsed and skipped — the output schema mirrors Spark's Kafka
  *    source's default, headerless shape). Compressed record areas are
  *    inflated with the full broker codec table — gzip, xerial-framed
  *    snappy, LZ4 frame, zstd (the codec jars ship inside Spark itself,
  *    so executors always have them); control batches (bit 5)
  *    yield no rows, like a consumer. CRC-32C (Castagnoli,
  *    `java.util.zip.CRC32C`) is verified per batch; corrupt frames fail
  *    loudly with file/offset context.
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

  val Magic: Byte = 1 // legacy v1: has a timestamp field
  val MagicV2: Byte = 2 // record-batch format
  val CreateTime = 1 // Kafka TimestampType.CREATE_TIME

  // Codec ids from the batch/message attributes bits 0-2 (Kafka's public
  // compression-type table). v2 batches support all four; legacy v1
  // wrappers support gzip, snappy, and lz4 — v1-era LZ4 framing carried
  // the pre-KIP-57 header checksum (hashed over the frame magic too),
  // which the lenient decoder detects and normalizes before a standard
  // frame decode. zstd never existed for the legacy wrapper format.
  val NoCodec = 0
  val GzipCodec = 1
  val SnappyCodec = 2
  val Lz4Codec = 3
  val ZstdCodec = 4
  private val V2HeaderLen = 49 // partitionLeaderEpoch..recordCount, before records

  def segmentName(baseOffset: Long): String = f"$baseOffset%020d.log"

  /** One decoded record. `timestampMs` is the producer CreateTime. */
  case class Record(offset: Long, timestampMs: Long, key: Array[Byte], value: Array[Byte])

  private def crcOf(buf: Array[Byte], from: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(buf, from, len)
    c.getValue
  }

  private def crc32cOf(buf: Array[Byte], from: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C
    c.update(buf, from, len)
    c.getValue
  }

  private[sources] def gzip(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(data); g.close()
    bos.toByteArray
  }

  private[sources] def gunzip(data: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(data))
    try in.readAllBytes() finally in.close()
  }

  /** Compress `data` with a Kafka codec id, using the SAME stream framings
    * brokers use on disk: gzip = JDK deflate-gzip, snappy = xerial
    * SnappyOutputStream block framing, lz4 = standard LZ4 frame, zstd =
    * standard zstd frame. snappy-java / lz4-java / zstd-jni ship with
    * Spark itself, so executors always have them.
    */
  private[sources] def compress(codec: Int, data: Array[Byte]): Array[Byte] = codec match {
    case NoCodec => data
    case GzipCodec => gzip(data)
    case SnappyCodec =>
      val bos = new java.io.ByteArrayOutputStream()
      val out = new org.xerial.snappy.SnappyOutputStream(bos)
      out.write(data); out.close()
      bos.toByteArray
    case Lz4Codec =>
      val bos = new java.io.ByteArrayOutputStream()
      val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      out.write(data); out.close()
      bos.toByteArray
    case ZstdCodec =>
      com.github.luben.zstd.Zstd.compress(data)
    case c => throw new IllegalArgumentException(s"unknown compression codec $c")
  }

  /** Decompress an LZ4 frame accepting BOTH header-checksum conventions:
    * the LZ4 spec's (XXH32 over the frame descriptor, excluding the
    * 4-byte magic) and the legacy Kafka one (pre-KIP-57 clients hashed
    * the whole header INCLUDING the magic — the "v1-era" framing that
    * shipped with message-format-v0/v1 producers). A legacy frame gets
    * its HC byte rewritten to the spec value and decodes through the
    * standard frame reader; a frame matching NEITHER checksum is corrupt
    * and is rejected loudly.
    */
  private[sources] def lz4DecompressLenient(data: Array[Byte], ctx: => String): Array[Byte] = {
    require(data.length >= 7, s"$ctx: truncated LZ4 frame (${data.length} bytes)")
    require(
      data(0) == 0x04.toByte && data(1) == 0x22.toByte &&
        data(2) == 0x4d.toByte && data(3) == 0x18.toByte,
      s"$ctx: not an LZ4 frame (bad magic)")
    val flg = data(4)
    require(((flg >> 6) & 0x03) == 1, s"$ctx: unsupported LZ4 frame version")
    var hcPos = 6 // magic(4) + FLG + BD
    if ((flg & 0x08) != 0) hcPos += 8 // content-size field present
    if ((flg & 0x01) != 0) hcPos += 4 // dictionary-id field present
    require(data.length > hcPos, s"$ctx: truncated LZ4 frame header")
    val xx = net.jpountz.xxhash.XXHashFactory.fastestInstance().hash32()
    def hcFrom(from: Int): Byte = ((xx.hash(data, from, hcPos - from, 0) >> 8) & 0xff).toByte
    val stored = data(hcPos)
    val fixed =
      if (stored == hcFrom(4)) data // spec-correct framing
      else if (stored == hcFrom(0)) { // legacy: hash included the magic
        val d = data.clone(); d(hcPos) = hcFrom(4); d
      } else
        throw new IllegalArgumentException(
          s"$ctx: LZ4 frame header checksum matches neither the spec nor the legacy Kafka variant")
    val in = new net.jpountz.lz4.LZ4FrameInputStream(new java.io.ByteArrayInputStream(fixed))
    try in.readAllBytes() finally in.close()
  }

  /** Frame `data` the way a pre-KIP-57 producer did: a standard LZ4 frame
    * whose header checksum covers the magic bytes too. Fixture-only.
    */
  private[sources] def lz4BrokenFrame(data: Array[Byte]): Array[Byte] = {
    val framed = compress(Lz4Codec, data)
    val flg = framed(4)
    var hcPos = 6
    if ((flg & 0x08) != 0) hcPos += 8
    if ((flg & 0x01) != 0) hcPos += 4
    val xx = net.jpountz.xxhash.XXHashFactory.fastestInstance().hash32()
    framed(hcPos) = ((xx.hash(framed, 0, hcPos, 0) >> 8) & 0xff).toByte
    framed
  }

  private def decompress(codec: Int, data: Array[Byte], ctx: => String): Array[Byte] =
    codec match {
      case NoCodec => data
      case GzipCodec => gunzip(data)
      case SnappyCodec =>
        val in = new org.xerial.snappy.SnappyInputStream(new java.io.ByteArrayInputStream(data))
        try in.readAllBytes() finally in.close()
      case Lz4Codec =>
        val in = new net.jpountz.lz4.LZ4FrameInputStream(new java.io.ByteArrayInputStream(data))
        try in.readAllBytes() finally in.close()
      case ZstdCodec =>
        val in = new com.github.luben.zstd.ZstdInputStream(new java.io.ByteArrayInputStream(data))
        try in.readAllBytes() finally in.close()
      case c => throw new IllegalArgumentException(s"$ctx: unsupported compression codec $c")
    }

  // ---- varints (zigzag + base-128, the protobuf encoding v2 uses) ----

  private[sources] def writeVarLong(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63)
    while ((z & ~0x7fL) != 0) { out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
    out.write(z.toInt)
  }

  private[sources] def readVarLong(bb: java.nio.ByteBuffer): Long = {
    var z = 0L
    var shift = 0
    var b = bb.get()
    while ((b & 0x80) != 0) {
      z |= (b & 0x7fL) << shift
      shift += 7
      require(shift <= 63, "malformed varint (over 10 bytes)")
      b = bb.get()
    }
    z |= (b & 0x7fL) << shift
    (z >>> 1) ^ -(z & 1L)
  }

  private def readVarInt(bb: java.nio.ByteBuffer): Int = {
    val v = readVarLong(bb)
    require(v >= Int.MinValue && v <= Int.MaxValue, s"varint out of int range: $v")
    v.toInt
  }

  // ---- v1 (legacy message) encoding ----

  /** Encode one record to the v1 wire bytes. `attributes` bits 0-2 carry
    * the compression codec (0 = none, 1 = gzip wrapper).
    */
  def encode(r: Record, attributes: Byte = 0): Array[Byte] = {
    val keyLen = if (r.key == null) -1 else r.key.length
    val valLen = if (r.value == null) -1 else r.value.length
    val msgSize = 4 + 1 + 1 + 8 + 4 + math.max(keyLen, 0) + 4 + math.max(valLen, 0)
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + msgSize) // big-endian by default
    bb.putLong(r.offset).putInt(msgSize)
    val crcPos = bb.position()
    bb.putInt(0) // crc back-patched below
    bb.put(Magic).put(attributes).putLong(r.timestampMs)
    bb.putInt(keyLen); if (keyLen > 0) bb.put(r.key)
    bb.putInt(valLen); if (valLen > 0) bb.put(r.value)
    val arr = bb.array()
    val crc = crcOf(arr, crcPos + 4, arr.length - crcPos - 4)
    bb.putInt(crcPos, crc.toInt)
    arr
  }

  /** Encode records as one gzip wrapper message (v1 compressed message
    * set): inner set carries RELATIVE offsets 0..n-1; the wrapper's
    * offset is the ABSOLUTE offset of the last record — the shape a
    * gzip-configured pre-0.11 producer (or an old log segment) has on
    * disk per the protocol guide.
    */
  def encodeGzipWrapperV1(records: Seq[Record]): Array[Byte] =
    encodeWrapperV1(records, GzipCodec)

  /** Encode a compressed v1 wrapper with any v1-supported codec. */
  def encodeWrapperV1(records: Seq[Record], codec: Int): Array[Byte] = {
    require(records.nonEmpty, "empty wrapper")
    val inner = new java.io.ByteArrayOutputStream()
    records.zipWithIndex.foreach { case (r, i) => inner.write(encode(r.copy(offset = i.toLong))) }
    encode(
      Record(records.last.offset, records.last.timestampMs, null,
        compress(codec, inner.toByteArray)),
      attributes = codec.toByte)
  }

  /** Encode a v1 lz4 wrapper the way a pre-KIP-57 producer framed it
    * (legacy header checksum over the magic bytes). Fixture-only: this
    * is the wrapper shape old mirrored topics still hold on disk.
    */
  def encodeLz4BrokenWrapperV1(records: Seq[Record]): Array[Byte] = {
    require(records.nonEmpty, "empty wrapper")
    val inner = new java.io.ByteArrayOutputStream()
    records.zipWithIndex.foreach { case (r, i) => inner.write(encode(r.copy(offset = i.toLong))) }
    encode(
      Record(records.last.offset, records.last.timestampMs, null,
        lz4BrokenFrame(inner.toByteArray)),
      attributes = Lz4Codec.toByte)
  }

  // ---- v2 (record batch) encoding ----

  /** Encode records as one v2 record batch (magic 2) framed the way a
    * modern broker lays it on disk: varint record fields, batch-level
    * CRC-32C over attributes..end, records area optionally compressed
    * with any of Kafka's four codecs. `control` marks a control batch
    * (attributes bit 5) whose records a reader must not surface.
    */
  def encodeBatchV2(
      records: Seq[Record],
      codec: Int = NoCodec,
      control: Boolean = false,
      partitionLeaderEpoch: Int = 0
  ): Array[Byte] = {
    require(records.nonEmpty, "empty batch")
    val base = records.head.offset
    val baseTs = records.head.timestampMs
    val recOut = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val body = new java.io.ByteArrayOutputStream()
      body.write(0) // record attributes (unused by the format today)
      writeVarLong(body, r.timestampMs - baseTs)
      writeVarLong(body, r.offset - base)
      if (r.key == null) writeVarLong(body, -1L)
      else { writeVarLong(body, r.key.length.toLong); body.write(r.key) }
      if (r.value == null) writeVarLong(body, -1L)
      else { writeVarLong(body, r.value.length.toLong); body.write(r.value) }
      writeVarLong(body, 0L) // header count
      val b = body.toByteArray
      writeVarLong(recOut, b.length.toLong)
      recOut.write(b)
    }
    val recArea = compress(codec, recOut.toByteArray)
    val attributes = (codec | (if (control) 0x20 else 0)).toShort
    val batchLen = V2HeaderLen + recArea.length
    val bb = java.nio.ByteBuffer.allocate(12 + batchLen)
    bb.putLong(base).putInt(batchLen)
    bb.putInt(partitionLeaderEpoch).put(MagicV2)
    val crcPos = bb.position()
    bb.putInt(0) // CRC-32C back-patched below
    bb.putShort(attributes)
    bb.putInt((records.last.offset - base).toInt) // lastOffsetDelta
    bb.putLong(baseTs).putLong(records.map(_.timestampMs).max)
    bb.putLong(-1L).putShort(-1) // producerId, producerEpoch (non-transactional)
    bb.putInt(-1) // baseSequence
    bb.putInt(records.size)
    bb.put(recArea)
    val arr = bb.array()
    bb.putInt(crcPos, crc32cOf(arr, crcPos + 4, arr.length - crcPos - 4).toInt)
    arr
  }

  /** Write pre-encoded frames (v1 messages, wrappers, or v2 batches — a
    * real post-upgrade segment mixes them) as one segment file named by
    * `baseOffset`. Returns the segment path.
    */
  def writeSegmentFrames(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: Path,
      baseOffset: Long,
      frames: Seq[Array[Byte]]
  ): Path = {
    require(frames.nonEmpty, "empty segment")
    val seg = new Path(dir, segmentName(baseOffset))
    val out = fs.create(seg, /* overwrite = */ false)
    try frames.foreach(out.write)
    finally out.close()
    seg
  }

  /** Write records as one v1 segment file named by the first record's
    * offset. Returns the segment path.
    */
  def writeSegment(fs: org.apache.hadoop.fs.FileSystem, dir: Path, records: Seq[Record]): Path =
    writeSegmentFrames(fs, dir, records.head.offset, records.map(r => encode(r)))

  /** Write records as one v2 single-batch segment file. */
  def writeSegmentV2(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: Path,
      records: Seq[Record],
      codec: Int = NoCodec
  ): Path =
    writeSegmentFrames(fs, dir, records.head.offset, Seq(encodeBatchV2(records, codec)))

  // ---- decoding ----

  /** Decode one v1 message body (bytes after the 12-byte frame header).
    * Returns 1 record, or the inflated inner records of a gzip wrapper
    * (with absolute offsets reconstructed). `allowWrapper=false` rejects
    * nested compression, which the format forbids.
    */
  private def decodeV1(
      offset: Long,
      body: Array[Byte],
      segPath: String,
      allowWrapper: Boolean
  ): Seq[Record] = {
    val mb = java.nio.ByteBuffer.wrap(body)
    val crc = mb.getInt & 0xffffffffL
    val actual = crcOf(body, 4, body.length - 4)
    require(crc == actual,
      s"$segPath: CRC mismatch at offset $offset (stored $crc, computed $actual)")
    val magic = mb.get()
    require(magic == Magic,
      s"$segPath: unsupported magic $magic at offset $offset (v1 and v2 record batches only)")
    val attributes = mb.get()
    val codec = attributes & 0x07
    val ts = mb.getLong
    val keyLen = mb.getInt
    val key = if (keyLen < 0) null else { val a = new Array[Byte](keyLen); mb.get(a); a }
    val valLen = mb.getInt
    val value = if (valLen < 0) null else { val a = new Array[Byte](valLen); mb.get(a); a }
    codec match {
      case NoCodec => Seq(Record(offset, ts, key, value))
      case GzipCodec | SnappyCodec | Lz4Codec =>
        require(allowWrapper, s"$segPath: nested compressed wrapper at offset $offset")
        require(value != null, s"$segPath: compressed wrapper with null value at offset $offset")
        // v1-era lz4 wrappers may carry the legacy (pre-KIP-57) frame
        // header checksum computed over the magic bytes — the lenient
        // decoder accepts both conventions and rejects anything else.
        val inflated =
          if (codec == Lz4Codec)
            lz4DecompressLenient(value, s"$segPath: lz4 wrapper at offset $offset")
          else decompress(codec, value, s"$segPath: wrapper at offset $offset")
        val inner = decodeInnerSet(inflated, segPath)
        require(inner.nonEmpty, s"$segPath: empty compressed wrapper at offset $offset")
        // magic-1 rule: wrapper offset = absolute offset of the LAST inner
        // record; inner offsets are relative
        val lastRel = inner.last.offset
        inner.map(r => r.copy(offset = offset - lastRel + r.offset))
      case c =>
        // zstd never existed for the legacy wrapper format.
        throw new IllegalArgumentException(
          s"$segPath: unsupported v1 compression codec $c at offset $offset (none/gzip/snappy/lz4)")
    }
  }

  /** Parse a concatenated v1 message set held in memory (a wrapper's
    * inflated value).
    */
  private def decodeInnerSet(bytes: Array[Byte], segPath: String): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    var pos = 0
    while (pos + 12 <= bytes.length) {
      val hb = java.nio.ByteBuffer.wrap(bytes, pos, 12)
      val off = hb.getLong
      val size = hb.getInt
      require(size >= 22 && pos + 12 + size <= bytes.length,
        s"$segPath: corrupt inner frame at byte $pos of wrapper (message_size=$size)")
      val body = java.util.Arrays.copyOfRange(bytes, pos + 12, pos + 12 + size)
      out ++= decodeV1(off, body, s"$segPath (wrapper)", allowWrapper = false)
      pos += 12 + size
    }
    out.result()
  }

  /** Decode one v2 record batch body (bytes after the 12-byte frame
    * header): CRC-32C verify, then varint-framed records; control
    * batches yield nothing.
    */
  private def decodeV2(baseOffset: Long, body: Array[Byte], segPath: String): Seq[Record] = {
    require(body.length >= V2HeaderLen,
      s"$segPath: truncated v2 batch header at base offset $baseOffset (${body.length} bytes)")
    val storedCrc = java.nio.ByteBuffer.wrap(body, 5, 4).getInt & 0xffffffffL
    val actualCrc = crc32cOf(body, 9, body.length - 9)
    require(storedCrc == actualCrc,
      s"$segPath: CRC-32C mismatch in batch at base offset $baseOffset " +
        s"(stored $storedCrc, computed $actualCrc)")
    val bb = java.nio.ByteBuffer.wrap(body)
    bb.position(9)
    val attributes = bb.getShort
    val codec = attributes & 0x07
    val isControl = (attributes & 0x20) != 0
    val lastOffsetDelta = bb.getInt
    val baseTs = bb.getLong
    bb.getLong // maxTimestamp
    bb.getLong // producerId
    bb.getShort // producerEpoch
    bb.getInt // baseSequence
    val count = bb.getInt
    val recArea = decompress(
      codec,
      java.util.Arrays.copyOfRange(body, V2HeaderLen, body.length),
      s"$segPath: batch at base offset $baseOffset")
    if (isControl) return Seq.empty // commit/abort markers: a consumer never surfaces these
    val rb = java.nio.ByteBuffer.wrap(recArea)
    val out = Seq.newBuilder[Record]
    var i = 0
    var lastDelta = 0
    while (i < count) {
      val len = readVarInt(rb)
      val end = rb.position() + len
      require(len > 0 && end <= recArea.length,
        s"$segPath: corrupt record $i in batch at base offset $baseOffset (length=$len)")
      rb.get() // record attributes (always 0 today)
      val tsDelta = readVarLong(rb)
      val offDelta = readVarInt(rb)
      val keyLen = readVarInt(rb)
      val key = if (keyLen < 0) null else { val a = new Array[Byte](keyLen); rb.get(a); a }
      val valLen = readVarInt(rb)
      val value = if (valLen < 0) null else { val a = new Array[Byte](valLen); rb.get(a); a }
      var headers = readVarInt(rb)
      while (headers > 0) {
        val hkLen = readVarInt(rb)
        require(hkLen >= 0, s"$segPath: null header key in batch at base offset $baseOffset")
        rb.position(rb.position() + hkLen)
        val hvLen = readVarInt(rb)
        if (hvLen > 0) rb.position(rb.position() + hvLen)
        headers -= 1
      }
      require(rb.position() == end,
        s"$segPath: record $i length mismatch in batch at base offset $baseOffset " +
          s"(declared $len, consumed ${rb.position() - (end - len)})")
      out += Record(baseOffset + offDelta, baseTs + tsDelta, key, value)
      lastDelta = offDelta
      i += 1
    }
    require(lastDelta == lastOffsetDelta || count == 0,
      s"$segPath: lastOffsetDelta $lastOffsetDelta != last record delta $lastDelta " +
        s"in batch at base offset $baseOffset")
    out.result()
  }

  /** Iterate records of a segment starting at its first frame, verifying
    * CRCs and dispatching v1 messages / gzip wrappers / v2 batches on the
    * magic byte. `skipPayloadsOnly` = header scan for log-end discovery:
    * reads at most 15 bytes per frame body (magic + v2's lastOffsetDelta)
    * and yields ONE record per frame carrying the frame's LAST offset
    * (v1 wrapper offset and v2 base+lastOffsetDelta already are that),
    * with null key/value.
    */
  def readSegment(
      in: org.apache.hadoop.fs.FSDataInputStream,
      segLen: Long,
      segPath: String,
      skipPayloadsOnly: Boolean
  ): Iterator[Record] = new Iterator[Record] {
    private var pos = 0L
    private val header = new Array[Byte](12)
    private var pending: Iterator[Record] = Iterator.empty

    override def hasNext: Boolean = {
      while (!pending.hasNext && pos + 12 <= segLen) loadFrame()
      pending.hasNext
    }

    override def next(): Record = {
      if (!hasNext) throw new NoSuchElementException(segPath)
      pending.next()
    }

    private def loadFrame(): Unit = {
      in.readFully(pos, header)
      val hb = java.nio.ByteBuffer.wrap(header)
      val firstOffset = hb.getLong // v1: record/wrapper offset; v2: baseOffset
      val size = hb.getInt
      require(size >= 22 && pos + 12 + size <= segLen,
        s"$segPath: corrupt frame at byte $pos (frame_size=$size, segment=$segLen bytes)")
      if (skipPayloadsOnly) {
        val prefix = new Array[Byte](math.min(size, 15))
        in.readFully(pos + 12, prefix)
        val last = prefix(4) match {
          case MagicV2 => firstOffset + java.nio.ByteBuffer.wrap(prefix, 11, 4).getInt
          case _ => firstOffset
        }
        pending = Iterator.single(Record(last, 0L, null, null))
      } else {
        val body = new Array[Byte](size)
        in.readFully(pos + 12, body)
        pending = (body(4) match {
          case MagicV2 => decodeV2(firstOffset, body, segPath)
          case _ => decodeV1(firstOffset, body, segPath, allowWrapper = true)
        }).iterator
      }
      pos += 12 + size
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
