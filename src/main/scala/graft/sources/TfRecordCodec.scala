package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32C

/** TFRecord container codec — the training-data interchange format the
  * TensorFlow/JAX loader ecosystem speaks, next to the Avro OCF
  * ([[AvroCodec]]), WARC ([[WarcCodec]]) and parquet/ORC/CSV (q98/q99)
  * rungs. Hand-built from the PUBLISHED format documentation only
  * (tensorflow.org "TFRecord and tf.train.Example"; the riegeli/records
  * framing description), pinned in TfRecordCodecSpec against fixture
  * bytes derived with an independent CRC32C implementation:
  *
  *  - record frame = little-endian u64 payload length, masked CRC32C of
  *    those 8 length bytes, payload, masked CRC32C of the payload;
  *  - masked crc = rotr15(crc) + 0xa282ead8 (mod 2^32) — the mask exists
  *    so a CRC over a buffer that itself embeds CRCs stays effective;
  *  - a file is just frames back to back: no header, no index, no
  *    compression at the container layer. Reader-side parallelism at
  *    100 TB therefore comes from MANY FILES (shards), not intra-file
  *    splits — exactly how this codec is used in q101 (one file per
  *    doc_id-range group, the parallel unit a tf.data pipeline shards
  *    over); that "shard-is-the-split" property is the key structural
  *    difference from the sync-marker formats (Avro OCF, WARC).
  *
  * The payload is a `tf.train.Example` protocol-buffer message; the
  * minimal wire-format encoder/decoder for the flat feature shapes a
  * documents table needs (int64 / bytes / float32 lists) is below —
  * message field numbers from the published example.proto/feature.proto:
  * Example.features = 1; Features.feature = 1 (map<string, Feature>);
  * map entry key = 1, value = 2; Feature oneof bytes_list = 1,
  * float_list = 2, int64_list = 3; each list's value = 1 (floats and
  * int64s packed). Nested messages or other scalar types fail loudly.
  */
object TfRecordCodec {

  private val Mask = 0xa282ead8L

  def crc32c(bytes: Array[Byte]): Long = {
    val c = new CRC32C
    c.update(bytes, 0, bytes.length)
    c.getValue
  }

  def maskedCrc(bytes: Array[Byte]): Long = {
    val crc = crc32c(bytes)
    (((crc >>> 15) | (crc << 17)) + Mask) & 0xffffffffL
  }

  // ------------------------------------------------------------ framing

  private def putU32(out: ByteArrayOutputStream, v: Long): Unit = {
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt((v & 0xffffffffL).toInt)
    out.write(b.array())
  }

  /** Frame payloads into one TFRecord file byte array. */
  def writeFrames(payloads: Iterator[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    payloads.foreach { p =>
      val len = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(p.length.toLong).array()
      out.write(len)
      putU32(out, maskedCrc(len))
      out.write(p)
      putU32(out, maskedCrc(p))
    }
    out.toByteArray
  }

  /** Parse a TFRecord file, verifying both CRCs of every frame. */
  def readFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val frames = Seq.newBuilder[Array[Byte]]
    while (buf.hasRemaining) {
      require(buf.remaining >= 12, s"truncated frame header at ${buf.position()}")
      val lenBytes = new Array[Byte](8); buf.get(lenBytes)
      val len = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getLong
      val lenCrc = buf.getInt.toLong & 0xffffffffL
      require(lenCrc == maskedCrc(lenBytes),
        s"length CRC mismatch at ${buf.position() - 12} — corrupt or not a TFRecord file")
      require(len >= 0 && len <= buf.remaining - 4, s"truncated record: need $len bytes")
      val payload = new Array[Byte](len.toInt); buf.get(payload)
      val dataCrc = buf.getInt.toLong & 0xffffffffL
      require(dataCrc == maskedCrc(payload), "payload CRC mismatch — corrupt record")
      frames += payload
    }
    frames.result()
  }

  // ------------------------------------- minimal tf.train.Example proto

  sealed trait FeatureValue
  final case class I64s(values: Seq[Long]) extends FeatureValue
  final case class Strs(values: Seq[String]) extends FeatureValue
  final case class F32s(values: Seq[Float]) extends FeatureValue

  private def writeVarint(out: ByteArrayOutputStream, n0: Long): Unit = {
    var n = n0
    while ((n & ~0x7fL) != 0L) { out.write(((n & 0x7f) | 0x80).toInt); n >>>= 7 }
    out.write(n.toInt)
  }

  private def lenDelim(out: ByteArrayOutputStream, field: Int, body: Array[Byte]): Unit = {
    writeVarint(out, (field << 3 | 2).toLong)
    writeVarint(out, body.length.toLong)
    out.write(body)
  }

  private def encodeFeature(v: FeatureValue): Array[Byte] = {
    val list = new ByteArrayOutputStream()
    v match {
      case Strs(ss) => // BytesList: repeated bytes value = 1
        ss.foreach(s => lenDelim(list, 1, s.getBytes(UTF_8)))
      case F32s(fs) => // FloatList: packed float value = 1
        val packed = ByteBuffer.allocate(4 * fs.length).order(ByteOrder.LITTLE_ENDIAN)
        fs.foreach(packed.putFloat)
        lenDelim(list, 1, packed.array())
      case I64s(ls) => // Int64List: packed int64 value = 1
        val packed = new ByteArrayOutputStream()
        ls.foreach(writeVarint(packed, _))
        lenDelim(list, 1, packed.toByteArray)
    }
    val feature = new ByteArrayOutputStream()
    val oneofField = v match { case _: Strs => 1; case _: F32s => 2; case _: I64s => 3 }
    lenDelim(feature, oneofField, list.toByteArray)
    feature.toByteArray
  }

  /** Encode one Example. Features are written sorted by name so identical
    * inputs produce identical bytes (the reproducible-fixture property;
    * protobuf map order is unspecified, so sorting is spec-legal).
    */
  def encodeExample(features: Map[String, FeatureValue]): Array[Byte] = {
    val featuresMsg = new ByteArrayOutputStream()
    features.toSeq.sortBy(_._1).foreach { case (name, v) =>
      val entry = new ByteArrayOutputStream()
      lenDelim(entry, 1, name.getBytes(UTF_8)) // map key
      lenDelim(entry, 2, encodeFeature(v)) // map value
      lenDelim(featuresMsg, 1, entry.toByteArray) // Features.feature entry
    }
    val example = new ByteArrayOutputStream()
    lenDelim(example, 1, featuresMsg.toByteArray) // Example.features
    example.toByteArray
  }

  private final class PbCursor(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var acc = 0L; var b = 0
      do {
        require(pos < end, "truncated varint")
        b = bytes(pos) & 0xff; pos += 1
        acc |= (b & 0x7fL) << shift; shift += 7
        require(shift <= 70, "varint too long")
      } while ((b & 0x80) != 0)
      acc
    }
    def readLenDelim(): PbCursor = {
      val len = readVarint().toInt
      require(pos + len <= end, s"truncated field: need $len bytes at $pos")
      val c = new PbCursor(bytes, pos, pos + len)
      pos += len
      c
    }
    def readBytes(): Array[Byte] = {
      val c = readLenDelim()
      java.util.Arrays.copyOfRange(bytes, c.pos, c.end)
    }
    def readF32(): Float = {
      require(pos + 4 <= end, "truncated fixed32")
      val v = ByteBuffer.wrap(bytes, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getFloat
      pos += 4
      v
    }
  }

  private def decodeFeature(c: PbCursor): FeatureValue = {
    var result: FeatureValue = null
    while (c.hasMore) {
      val tag = c.readVarint()
      val (field, wire) = ((tag >> 3).toInt, (tag & 7).toInt)
      require(wire == 2, s"Feature oneof field $field: expected length-delimited, got wire $wire")
      val list = c.readLenDelim()
      result = field match {
        case 1 => // BytesList
          val ss = Seq.newBuilder[String]
          while (list.hasMore) {
            val tag2 = list.readVarint()
            require(tag2 == (1 << 3 | 2), s"BytesList: unexpected tag $tag2")
            ss += new String(list.readBytes(), UTF_8)
          }
          Strs(ss.result())
        case 2 => // FloatList: packed or unpacked per protobuf rules
          val fs = Seq.newBuilder[Float]
          while (list.hasMore) {
            val tag2 = list.readVarint()
            (tag2 & 7) match {
              case 2 =>
                val packed = list.readLenDelim()
                while (packed.hasMore) fs += packed.readF32()
              case 5 => fs += list.readF32()
              case w => throw new IllegalArgumentException(s"FloatList: unexpected wire $w")
            }
          }
          F32s(fs.result())
        case 3 => // Int64List: packed or unpacked
          val ls = Seq.newBuilder[Long]
          while (list.hasMore) {
            val tag2 = list.readVarint()
            (tag2 & 7) match {
              case 2 =>
                val packed = list.readLenDelim()
                while (packed.hasMore) ls += packed.readVarint()
              case 0 => ls += list.readVarint()
              case w => throw new IllegalArgumentException(s"Int64List: unexpected wire $w")
            }
          }
          I64s(ls.result())
        case f => throw new IllegalArgumentException(s"Feature: unsupported oneof field $f")
      }
    }
    require(result != null, "empty Feature message")
    result
  }

  /** Decode one Example payload into its feature map. */
  def decodeExample(payload: Array[Byte]): Map[String, FeatureValue] = {
    val top = new PbCursor(payload, 0, payload.length)
    val out = Map.newBuilder[String, FeatureValue]
    while (top.hasMore) {
      val tag = top.readVarint()
      require(tag == (1 << 3 | 2), s"Example: expected features field, got tag $tag")
      val features = top.readLenDelim()
      while (features.hasMore) {
        val etag = features.readVarint()
        require(etag == (1 << 3 | 2), s"Features: expected map entry, got tag $etag")
        val entry = features.readLenDelim()
        var key: String = null
        var value: FeatureValue = null
        while (entry.hasMore) {
          val ftag = entry.readVarint()
          (ftag >> 3).toInt match {
            case 1 => key = new String(entry.readBytes(), UTF_8)
            case 2 => value = decodeFeature(entry.readLenDelim())
            case f => throw new IllegalArgumentException(s"map entry: unexpected field $f")
          }
        }
        require(key != null && value != null, "map entry missing key or value")
        out += key -> value
      }
    }
    out.result()
  }
}
