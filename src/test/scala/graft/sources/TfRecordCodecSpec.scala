package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import TfRecordCodec._

/** Pins the hand-built TFRecord codec against fixtures derived OUTSIDE
  * the implementation: the published CRC32C check vector, a whole frame
  * whose bytes were computed with an independent (pure-Python, bitwise)
  * CRC32C + struct packing, and a hand-framed protobuf Example byte
  * literal written directly from the wire-format rules.
  */
class TfRecordCodecSpec extends AnyFunSuite {

  test("CRC32C matches the published check vector; masking matches the TFRecord rule") {
    // RFC 3720 / public check vector: crc32c("123456789") = 0xe3069283
    assert(crc32c("123456789".getBytes(UTF_8)) === 0xe3069283L)
    // independent fixture: masked CRC of the 8-byte LE length 14
    val len = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(14L).array()
    assert(maskedCrc(len) === 0x3f69e5c5L)
  }

  test("frame bytes match the independently derived fixture") {
    // derived with a pure-Python bitwise CRC32C + struct.pack, not this codec
    val expected =
      "0e00000000000000c5e5693f68656c6c6f2074667265636f72649f5b7622"
    val got = writeFrames(Iterator("hello tfrecord".getBytes(UTF_8)))
    assert(got.map("%02x".format(_)).mkString === expected)
    val back = readFrames(got)
    assert(back.map(new String(_, UTF_8)) === Seq("hello tfrecord"))
  }

  test("multi-record round trip; corruption in payload, CRC, and length is loud") {
    val payloads = (0 until 50).map(i => s"doc-$i-${"x" * i}".getBytes(UTF_8))
    val file = writeFrames(payloads.iterator)
    assert(readFrames(file).map(_.toSeq) === payloads.map(_.toSeq))
    // flip one payload byte -> payload CRC catches it
    val corrupt = file.clone(); corrupt(20) = (corrupt(20) ^ 1).toByte
    assert(intercept[IllegalArgumentException](readFrames(corrupt))
      .getMessage.contains("CRC"))
    // flip a length byte -> length CRC catches it before mis-framing
    val badLen = file.clone(); badLen(0) = (badLen(0) ^ 1).toByte
    assert(intercept[IllegalArgumentException](readFrames(badLen))
      .getMessage.contains("CRC"))
    // truncation is loud
    assert(intercept[IllegalArgumentException](
      readFrames(java.util.Arrays.copyOf(file, file.length - 3)))
      .getMessage.toLowerCase.contains("truncated"))
  }

  test("Example encoding matches a hand-framed wire-format byte literal, both directions") {
    // Example{features{ "id" -> Int64List[7], "txt" -> BytesList["ab"] }}
    // framed by hand from the published field numbers and wire rules:
    val hand: Array[Byte] = Array(
      0x0a, 0x1c, // Example.features, len 28
      0x0a, 0x0b, // map entry "id", len 11
      0x0a, 0x02, 'i', 'd', // key
      0x12, 0x05, // Feature, len 5
      0x1a, 0x03, // int64_list, len 3
      0x0a, 0x01, 0x07, // packed value = [7]
      0x0a, 0x0d, // map entry "txt", len 13
      0x0a, 0x03, 't', 'x', 't', // key
      0x12, 0x06, // Feature, len 6
      0x0a, 0x04, // bytes_list, len 4
      0x0a, 0x02, 'a', 'b', // value = ["ab"]
    ).map(_.toByte)
    val features = Map[String, FeatureValue]("id" -> I64s(Seq(7L)), "txt" -> Strs(Seq("ab")))
    assert(encodeExample(features).toSeq === hand.toSeq)
    assert(decodeExample(hand) === features)
  }

  test("float/int64/bytes lists round-trip, including multi-value and empty-string cases") {
    val features = Map[String, FeatureValue](
      "emb" -> F32s(Seq(1.5f, -2.25f, 0f, Float.MinPositiveValue)),
      "ids" -> I64s(Seq(0L, 1L, Long.MaxValue, 300L)),
      "txt" -> Strs(Seq("", "héllo", "a\nb")))
    assert(decodeExample(encodeExample(features)) === features)
  }

  test("unpacked int64 and float encodings (wire types 0/5) decode too") {
    // protobuf readers must accept unpacked repeated scalars; frame by hand:
    // Feature{int64_list{ value: 5 (wire 0), value: 6 }}
    val unpackedI64 = Array[Int](0x1a, 0x04, 0x08, 0x05, 0x08, 0x06).map(_.toByte)
    val entry = {
      val out = new java.io.ByteArrayOutputStream()
      // entry "k": body = key(3) + Feature-field(2 + 6) = 11
      out.write(Array[Int](0x0a, 0x0b, 0x0a, 0x01, 'k', 0x12, 0x06).map(_.toByte))
      out.write(unpackedI64)
      // entry "f": Feature{float_list{ value: 1.0f (wire 5) }};
      // FloatList body = 0x0d + 4 LE bytes (5), Feature = 0x12 0x05 + 5 (7),
      // entry body = key(3) + 0x12 0x07 + 7 = 12
      out.write(Array[Int](0x0a, 0x0c, 0x0a, 0x01, 'f', 0x12, 0x07,
        0x12, 0x05, 0x0d, 0x00, 0x00, 0x80, 0x3f).map(_.toByte))
      val ex = new java.io.ByteArrayOutputStream()
      ex.write(0x0a); ex.write(out.size()); out.writeTo(ex)
      ex.toByteArray
    }
    val decoded = decodeExample(entry)
    assert(decoded("k") === I64s(Seq(5L, 6L)))
    assert(decoded("f") === F32s(Seq(1.0f)))
  }
}
