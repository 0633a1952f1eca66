package graft.sources

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The "Structured Streaming with Kafka source" north star, drained
  * against Kafka-wire-format log segments (no broker in this
  * environment): framing round-trip with CRC verification, AvailableNow
  * drain, exactly-once-resume via the checkpointed offset log, admission
  * control, and the Kafka-source-compatible schema.
  */
class KafkaLogSourceSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSpec.spark
  import KafkaLogFormat.Record

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeTp(root: java.nio.file.Path, tp: String, records: Seq[Record]): Unit = {
    val dir = new Path(root.resolve(tp).toString)
    fs.mkdirs(dir)
    KafkaLogFormat.writeSegment(fs, dir, records)
  }

  private def rec(offset: Long, v: String, k: String = null): Record =
    Record(offset, 1600000000000L + offset, if (k == null) null else k.getBytes, v.getBytes)

  test("wire format round-trips and the CRC catches a flipped payload byte") {
    val dir = Files.createTempDirectory("kwire")
    val seg = KafkaLogFormat.writeSegment(
      fs, new Path(dir.toString),
      Seq(rec(0, "alpha", "k0"), rec(1, "beta"), Record(2, 5L, "k".getBytes, null)))
    val in = fs.open(seg)
    val len = fs.getFileStatus(seg).getLen
    val got = KafkaLogFormat.readSegment(in, len, seg.toString, skipPayloadsOnly = false).toList
    in.close()
    assert(got.map(_.offset) == List(0L, 1L, 2L))
    assert(new String(got.head.value) == "alpha" && new String(got.head.key) == "k0")
    assert(got(1).key == null && got(2).value == null)

    // flip one payload byte -> loud CRC failure with context
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(seg.toUri.getPath))
    bytes(bytes.length - 1) = (bytes(bytes.length - 1) ^ 0x01).toByte
    val corrupt = dir.resolve("corrupt-0")
    java.nio.file.Files.createDirectories(corrupt)
    java.nio.file.Files.write(corrupt.resolve(KafkaLogFormat.segmentName(0)), bytes)
    val cp = new Path(corrupt.resolve(KafkaLogFormat.segmentName(0)).toString)
    val cin = fs.open(cp)
    val e = intercept[IllegalArgumentException] {
      KafkaLogFormat.readSegment(cin, bytes.length, cp.toString, skipPayloadsOnly = false).toList
    }
    cin.close()
    assert(e.getMessage.contains("CRC mismatch"))
  }

  test("v2 record batch round-trips; CRC-32C catches a flipped byte in the records area") {
    val dir = Files.createTempDirectory("kwire2")
    val records = Seq(rec(10, "alpha", "k0"), rec(11, "beta"), Record(12, 1600000000099L, "k".getBytes, null))
    val seg = KafkaLogFormat.writeSegmentV2(fs, new Path(dir.toString), records)
    val in = fs.open(seg)
    val len = fs.getFileStatus(seg).getLen
    val got = KafkaLogFormat.readSegment(in, len, seg.toString, skipPayloadsOnly = false).toList
    in.close()
    assert(got.map(_.offset) == List(10L, 11L, 12L))
    assert(got.map(_.timestampMs) == records.map(_.timestampMs))
    assert(new String(got.head.value) == "alpha" && new String(got.head.key) == "k0")
    assert(got(1).key == null && got(2).value == null)

    // log-end discovery must read lastOffsetDelta from the batch header
    val hin = fs.open(seg)
    val skim = KafkaLogFormat.readSegment(hin, len, seg.toString, skipPayloadsOnly = true).toList
    hin.close()
    assert(skim.map(_.offset) == List(12L), "header skim yields one record at the batch's LAST offset")

    // flip one byte inside the varint records area -> loud CRC-32C failure
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(seg.toUri.getPath))
    bytes(bytes.length - 2) = (bytes(bytes.length - 2) ^ 0x01).toByte
    val corrupt = dir.resolve("corrupt-0")
    java.nio.file.Files.createDirectories(corrupt)
    java.nio.file.Files.write(corrupt.resolve(KafkaLogFormat.segmentName(10)), bytes)
    val cp = new Path(corrupt.resolve(KafkaLogFormat.segmentName(10)).toString)
    val cin = fs.open(cp)
    val e = intercept[IllegalArgumentException] {
      KafkaLogFormat.readSegment(cin, bytes.length, cp.toString, skipPayloadsOnly = false).toList
    }
    cin.close()
    assert(e.getMessage.contains("CRC-32C mismatch"))
  }

  test("gzip v1 wrapper drains into the same rows as its uncompressed twin") {
    val records = (0L until 5L).map(o => rec(o, s"payload-$o", s"k$o"))
    val root = Files.createTempDirectory("kgzip")
    val plainDir = new Path(root.resolve("plain-0").toString)
    val gzDir = new Path(root.resolve("gz-0").toString)
    fs.mkdirs(plainDir); fs.mkdirs(gzDir)
    KafkaLogFormat.writeSegment(fs, plainDir, records)
    KafkaLogFormat.writeSegmentFrames(fs, gzDir, 0L, Seq(KafkaLogFormat.encodeGzipWrapperV1(records)))

    def readAll(dir: Path): List[(Long, Long, String, String)] = {
      val seg = new Path(dir, KafkaLogFormat.segmentName(0))
      val in = fs.open(seg)
      val got = KafkaLogFormat.readSegment(
        in, fs.getFileStatus(seg).getLen, seg.toString, skipPayloadsOnly = false).toList
      in.close()
      got.map(r => (r.offset, r.timestampMs, new String(r.key), new String(r.value)))
    }
    assert(readAll(gzDir) == readAll(plainDir))

    // the wrapper's header-skim end offset equals the plain segment's
    val seg = new Path(gzDir, KafkaLogFormat.segmentName(0))
    val in = fs.open(seg)
    val skim = KafkaLogFormat.readSegment(
      in, fs.getFileStatus(seg).getLen, seg.toString, skipPayloadsOnly = true).toList
    in.close()
    assert(skim.map(_.offset) == List(4L))
  }

  test("gzip-compressed v2 batch and a control batch: inflate one, surface nothing from the other") {
    val dir = Files.createTempDirectory("kgzip2")
    val records = (100L until 104L).map(o => rec(o, s"z$o"))
    val frames = Seq(
      KafkaLogFormat.encodeBatchV2(records, KafkaLogFormat.GzipCodec),
      KafkaLogFormat.encodeBatchV2( // txn commit marker shape: reader must yield no rows
        Seq(Record(104L, 1600000000104L, Array[Byte](0, 0, 0, 1), Array[Byte](0, 0))),
        control = true)
    )
    val seg = KafkaLogFormat.writeSegmentFrames(fs, new Path(dir.toString), 100L, frames)
    val in = fs.open(seg)
    val got = KafkaLogFormat.readSegment(
      in, fs.getFileStatus(seg).getLen, seg.toString, skipPayloadsOnly = false).toList
    in.close()
    assert(got.map(_.offset) == (100L until 104L).toList)
    assert(got.map(r => new String(r.value)) == records.map(r => new String(r.value)).toList)
    // but the control batch still advances the log-end offset, like a broker
    val hin = fs.open(seg)
    val skim = KafkaLogFormat.readSegment(
      hin, fs.getFileStatus(seg).getLen, seg.toString, skipPayloadsOnly = true).toList
    hin.close()
    assert(skim.map(_.offset) == List(103L, 104L))
  }

  test("snappy/lz4/zstd v2 batches drain into the same rows as their uncompressed twin") {
    import KafkaLogFormat.{SnappyCodec, Lz4Codec, ZstdCodec}
    val records = (0L until 6L).map(o => rec(o, s"codec-payload-$o" * 10, s"k$o"))
    val root = Files.createTempDirectory("kcodecs")
    def readAll(codec: Int, name: String): List[(Long, Long, String, String)] = {
      val dir = new Path(root.resolve(name).toString)
      fs.mkdirs(dir)
      val seg = KafkaLogFormat.writeSegmentV2(fs, dir, records, codec)
      val in = fs.open(seg)
      val got = KafkaLogFormat.readSegment(
        in, fs.getFileStatus(seg).getLen, seg.toString, skipPayloadsOnly = false).toList
      in.close()
      got.map(r => (r.offset, r.timestampMs, new String(r.key), new String(r.value)))
    }
    val plain = readAll(KafkaLogFormat.NoCodec, "plain-0")
    assert(readAll(SnappyCodec, "snappy-0") == plain)
    assert(readAll(Lz4Codec, "lz4-0") == plain)
    assert(readAll(ZstdCodec, "zstd-0") == plain)
  }

  test("snappy/lz4 v1 wrappers drain like gzip — incl. the pre-KIP-57 broken-checksum lz4 frame") {
    val records = (0L until 4L).map(o => rec(o, s"snap-$o", s"k$o"))
    val root = Files.createTempDirectory("kv1snap")
    def drain(frame: Array[Byte], name: String): List[(Long, String)] = {
      val dir = new Path(root.resolve(name).toString)
      fs.mkdirs(dir)
      val seg = KafkaLogFormat.writeSegmentFrames(fs, dir, 0L, Seq(frame))
      val in = fs.open(seg)
      val got = KafkaLogFormat.readSegment(
        in, fs.getFileStatus(seg).getLen, seg.toString, skipPayloadsOnly = false).toList
      in.close()
      got.map(r => (r.offset, new String(r.value)))
    }
    val expected = records.map(r => (r.offset, new String(r.value))).toList
    assert(drain(KafkaLogFormat.encodeWrapperV1(records, KafkaLogFormat.SnappyCodec), "s-0") == expected)
    // modern (spec-checksum) lz4 framing
    assert(drain(KafkaLogFormat.encodeWrapperV1(records, KafkaLogFormat.Lz4Codec), "l-0") == expected)
    // v1-era framing: header checksum hashed over the frame magic too
    val broken = KafkaLogFormat.encodeLz4BrokenWrapperV1(records)
    assert(drain(broken, "l-1") == expected)
    // the broken frame really is rejected by a strict spec decoder
    // (otherwise this test would not be exercising the lenient path)
    val bb = java.nio.ByteBuffer.wrap(broken)
    bb.getLong; bb.getInt // frame header: offset, message_size
    bb.getInt; bb.get; bb.get; bb.getLong // crc, magic, attrs, ts
    val kl = bb.getInt; if (kl > 0) bb.position(bb.position() + kl)
    val vl = bb.getInt
    val wrapped = new Array[Byte](vl); bb.get(wrapped)
    assertThrows[Exception] {
      val in = new net.jpountz.lz4.LZ4FrameInputStream(new java.io.ByteArrayInputStream(wrapped))
      try in.readAllBytes() finally in.close()
    }
    // a frame whose header checksum matches NEITHER convention is
    // corrupt → the lenient decoder rejects instead of guessing
    val neither = wrapped.clone()
    val flg = neither(4)
    var hcPos = 6
    if ((flg & 0x08) != 0) hcPos += 8
    if ((flg & 0x01) != 0) hcPos += 4
    neither(hcPos) = (neither(hcPos) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException] {
      KafkaLogFormat.lz4DecompressLenient(neither, "corrupt-fixture")
    }
    assert(e.getMessage.contains("neither the spec nor the legacy"), e.getMessage)
  }

  test("out-of-table codec ids are rejected loudly, not silently skipped") {
    val dir = Files.createTempDirectory("kcodec")
    val fsDir = new Path(dir.toString)
    // codec 5 is outside Kafka's public compression table on both formats
    val v1Bad = KafkaLogFormat.encode(rec(0, "x"), attributes = 5)
    val seg = KafkaLogFormat.writeSegmentFrames(fs, fsDir, 0L, Seq(v1Bad))
    val in = fs.open(seg)
    val e = intercept[IllegalArgumentException] {
      KafkaLogFormat.readSegment(
        in, fs.getFileStatus(seg).getLen, seg.toString, skipPayloadsOnly = false).toList
    }
    in.close()
    assert(e.getMessage.contains("unsupported v1 compression codec 5"))
  }

  test("mixed v1/v2 directory drains both formats through the streaming source") {
    val root = Files.createTempDirectory("kmixed")
    // audit-0: one segment holding a v1 message THEN a v2 batch (post-upgrade roll shape)
    val dir0 = new Path(root.resolve("audit-0").toString)
    fs.mkdirs(dir0)
    KafkaLogFormat.writeSegmentFrames(fs, dir0, 0L, Seq(
      KafkaLogFormat.encode(rec(0, "old-0")),
      KafkaLogFormat.encode(rec(1, "old-1")),
      KafkaLogFormat.encodeBatchV2(Seq(rec(2, "new-2"), rec(3, "new-3")))
    ))
    // audit-1: pure v2 segment
    val dir1 = new Path(root.resolve("audit-1").toString)
    fs.mkdirs(dir1)
    KafkaLogFormat.writeSegmentV2(fs, dir1, (0L until 3L).map(o => rec(o, s"b$o")))

    val checkpoint = Files.createTempDirectory("kmixed-ckpt").toString
    val sink = Files.createTempDirectory("kmixed-sink").toString
    val q = spark.readStream.format("graft-kafkalog").option("root", root.toString).load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .format("parquet").option("path", sink)
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive)

    val rows = spark.read.parquet(sink).collect()
      .map(r => (r.getString(2), r.getInt(3), r.getLong(4), new String(r.getAs[Array[Byte]](1))))
      .toSet
    assert(rows == Set(
      ("audit", 0, 0L, "old-0"), ("audit", 0, 1L, "old-1"),
      ("audit", 0, 2L, "new-2"), ("audit", 0, 3L, "new-3"),
      ("audit", 1, 0L, "b0"), ("audit", 1, 1L, "b1"), ("audit", 1, 2L, "b2")))

    // restart after a new v2 segment lands: reads ONLY the appended batch
    KafkaLogFormat.writeSegmentV2(fs, dir1, Seq(rec(3, "b3")))
    val q2 = spark.readStream.format("graft-kafkalog").option("root", root.toString).load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .format("parquet").option("path", sink)
      .start()
    q2.awaitTermination(60000)
    val after = spark.read.parquet(sink)
    assert(after.count() == 8, "restart must read ONLY the appended v2 record")
  }

  test("maxRecordsPerTrigger admission that cuts mid-batch resumes inside the v2 batch") {
    val root = Files.createTempDirectory("kmidbatch")
    val dir0 = new Path(root.resolve("t-0").toString)
    fs.mkdirs(dir0)
    KafkaLogFormat.writeSegmentV2(fs, dir0, (0L until 10L).map(o => rec(o, s"v$o")))
    val stream = new KafkaLogMicroBatchStream(
      root.toString,
      new CaseInsensitiveStringMap(Map("root" -> root.toString, "maxRecordsPerTrigger" -> "4").asJava))
    val first = stream.latestOffset(KafkaLogOffset(Map.empty), ReadLimit.allAvailable())
      .asInstanceOf[KafkaLogOffset]
    assert(first.offsets == Map("t-0" -> 4L), "admission lands mid-batch")
    def drain(fromTo: (Map[String, Long], Map[String, Long])): Seq[Long] = {
      val parts = stream.plan(fromTo._1, fromTo._2)
      val factory = stream.createReaderFactory()
      parts.flatMap { p =>
        val r = factory.createReader(p)
        val out = Seq.newBuilder[Long]
        while (r.next()) out += r.get().getLong(4)
        r.close()
        out.result()
      }.toSeq
    }
    assert(drain((Map.empty, first.offsets)) == (0L until 4L))
    val second = stream.latestOffset(first, ReadLimit.allAvailable()).asInstanceOf[KafkaLogOffset]
    assert(second.offsets == Map("t-0" -> 8L))
    assert(drain((first.offsets, second.offsets)) == (4L until 8L),
      "second trigger resumes inside the same batch, no duplicates")
  }

  test("AvailableNow drains two topic-partitions; restart from checkpoint reads only appended records") {
    val root = Files.createTempDirectory("klog")
    writeTp(root, "audit-0", (0L until 5L).map(o => rec(o, s"a0-$o")))
    writeTp(root, "audit-1", (0L until 3L).map(o => rec(o, s"a1-$o")))
    val checkpoint = Files.createTempDirectory("klog-ckpt").toString
    val sink = Files.createTempDirectory("klog-sink").toString

    def drain(): Unit = {
      val q = spark.readStream.format("graft-kafkalog").option("root", root.toString).load()
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", checkpoint)
        .format("parquet")
        .option("path", sink)
        .start()
      q.awaitTermination(60000)
      assert(!q.isActive)
    }

    drain()
    val first = spark.read.parquet(sink)
    assert(first.count() == 8)
    assert(first.schema.fieldNames.toSeq ==
      Seq("key", "value", "topic", "partition", "offset", "timestamp", "timestampType"))
    val vals = first.collect().map(r =>
      (r.getString(2), r.getInt(3), r.getLong(4), new String(r.getAs[Array[Byte]](1)))).toSet
    assert(vals.contains(("audit", 0, 4L, "a0-4")) && vals.contains(("audit", 1, 2L, "a1-2")))

    // a new segment lands (base offset = next offset, Kafka's roll shape)
    val dir0 = new Path(root.resolve("audit-0").toString)
    KafkaLogFormat.writeSegment(fs, dir0, (5L until 7L).map(o => rec(o, s"a0-$o")))
    drain()
    val after = spark.read.parquet(sink)
    assert(after.count() == 10, "restart must read ONLY the two appended records")
    assert(after.groupBy().max("offset").head().getLong(0) == 6L)
  }

  test("maxRecordsPerTrigger splits the admission budget max-min fairly across partitions") {
    val root = Files.createTempDirectory("klog-adm")
    writeTp(root, "t-0", (0L until 10L).map(o => rec(o, s"x$o")))
    writeTp(root, "t-1", (0L until 10L).map(o => rec(o, s"y$o")))
    val stream = new KafkaLogMicroBatchStream(
      root.toString,
      new CaseInsensitiveStringMap(Map("root" -> root.toString, "maxRecordsPerTrigger" -> "6").asJava))
    val first = stream.latestOffset(KafkaLogOffset(Map.empty), ReadLimit.allAvailable())
      .asInstanceOf[KafkaLogOffset]
    // equal backlogs, even budget: 3 each — no partition starves
    assert(first.offsets == Map("t-0" -> 3L, "t-1" -> 3L))
    val second = stream.latestOffset(first, ReadLimit.allAvailable()).asInstanceOf[KafkaLogOffset]
    assert(second.offsets == Map("t-0" -> 6L, "t-1" -> 6L))
  }

  test("fair-share budget: a quiet partition's surplus rolls to the hot one") {
    val root = Files.createTempDirectory("klog-adm2")
    writeTp(root, "t-0", (0L until 1L).map(o => rec(o, s"x$o")))
    writeTp(root, "t-1", (0L until 10L).map(o => rec(o, s"y$o")))
    val stream = new KafkaLogMicroBatchStream(
      root.toString,
      new CaseInsensitiveStringMap(Map("root" -> root.toString, "maxRecordsPerTrigger" -> "6").asJava))
    val first = stream.latestOffset(KafkaLogOffset(Map.empty), ReadLimit.allAvailable())
      .asInstanceOf[KafkaLogOffset]
    // t-0 needs only 1 of its 3-share; the surplus 2 rolls to t-1 (1 + 5 = 6)
    assert(first.offsets == Map("t-0" -> 1L, "t-1" -> 5L))
  }

  test("batch read form scans offset 0 to log end") {
    val root = Files.createTempDirectory("klog-batch")
    writeTp(root, "b-0", (0L until 4L).map(o => rec(o, s"v$o")))
    val df = spark.read.format("graft-kafkalog").option("root", root.toString).load()
    assert(df.count() == 4)
    assert(df.filter(org.apache.spark.sql.functions.col("offset") === 3L).count() == 1)
  }

  test("north star end-to-end: kafka-format stream -> object-store sink, keyed by topic/partition/offset") {
    val root = Files.createTempDirectory("klog-ns")
    writeTp(root, "audit-0", (0L until 3L).map(o => rec(o, s"payload-$o")))
    val out = Files.createTempDirectory("klog-ns-out").toString
    val checkpoint = Files.createTempDirectory("klog-ns-ckpt").toString

    val q = spark.readStream.format("graft-kafkalog").option("root", root.toString).load()
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("topic", "partition", "offset", "value").foreachPartition {
          rows: Iterator[org.apache.spark.sql.Row] =>
            val store = new graft.ingest.LocalDirObjectStore(out)
            rows.foreach { r =>
              store.put(
                s"${r.getString(0)}/${r.getInt(1)}/${r.getLong(2)}",
                r.getAs[Array[Byte]](3),
                Map("source" -> "kafkalog"))
            }
        }
        ()
      }
      .start()
    q.awaitTermination(60000)

    val store = new graft.ingest.LocalDirObjectStore(out)
    val keys = store.listKeys("audit/")
    assert(keys.size == 3, s"got $keys")
    assert(new String(store.get("audit/0/2")) == "payload-2")
    assert(store.getMetadata("audit/0/2") == Map("source" -> "kafkalog"))
  }
}
