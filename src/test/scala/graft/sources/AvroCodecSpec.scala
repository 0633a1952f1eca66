package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** [[AvroCodec]]: golden hand-framed bytes, BOTH-direction interop with
  * the reference implementation (avro-1.12.1, on the Spark classpath),
  * varint edge values, and loud corruption failures.
  */
class AvroCodecSpec extends AnyFunSuite {

  private val schema = AvroCodec.FlatSchema("doc", Seq(
    "id" -> "long", "name" -> "string", "n" -> "int"))

  private val rows: Seq[Seq[Any]] = Seq(
    Seq(1L, "alpha", 7),
    Seq(-3L, "", 0),
    Seq(Long.MaxValue, "byte ascii", -12))

  test("golden fixture: hand-framed OCF bytes (null codec) parse exactly") {
    // Framed by hand from the spec, NOT via AvroCodec.write: magic,
    // metadata map (one 2-entry block + terminator), sync, one data
    // block of two records, sync.
    def vint(n: Long): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      var z = (n << 1) ^ (n >> 63)
      while ((z & ~0x7fL) != 0L) { out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
      out.write(z.toInt)
      out.toByteArray
    }
    def str(s: String): Array[Byte] = vint(s.getBytes(UTF_8).length.toLong) ++ s.getBytes(UTF_8)
    val schemaJson =
      """{"type":"record","name":"g","fields":[{"name":"id","type":"long"},{"name":"word","type":"string"}]}"""
    val sync = Array.tabulate[Byte](16)(i => (i * 7 + 1).toByte)
    val payload = vint(5L) ++ str("five") ++ vint(-1L) ++ str("neg")
    val ocf = new ByteArrayOutputStream()
    ocf.write(Array('O'.toByte, 'b'.toByte, 'j'.toByte, 1.toByte))
    ocf.write(vint(2L)) // metadata block: 2 entries
    ocf.write(str("avro.schema")); ocf.write(str(schemaJson))
    ocf.write(str("avro.codec")); ocf.write(str("null"))
    ocf.write(vint(0L)) // map terminator
    ocf.write(sync)
    ocf.write(vint(2L)) // 2 records in the block
    ocf.write(vint(payload.length.toLong))
    ocf.write(payload)
    ocf.write(sync)
    val (sch, recs) = AvroCodec.parse(ocf.toByteArray)
    assert(sch.fields == Seq("id" -> "long", "word" -> "string"))
    assert(recs == Seq(Seq(5L, "five"), Seq(-1L, "neg")))
  }

  test("write → parse round-trips records under both codecs, multi-block") {
    for (codec <- Seq("null", "deflate")) {
      val bytes = AvroCodec.write(schema, rows.iterator, codec, recordsPerBlock = 2)
      val (sch, recs) = AvroCodec.parse(bytes)
      assert(sch.fields == schema.fields)
      assert(recs == rows, s"codec $codec")
    }
  }

  test("interop: avro-1.12.1 DataFileStream reads OUR bytes (deflate)") {
    import org.apache.avro.file.{DataFileStream, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val bytes = AvroCodec.write(schema, rows.iterator, "deflate", recordsPerBlock = 2)
    val reader = new DataFileStream[GenericRecord](
      new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    while (reader.hasNext) {
      val r = reader.next()
      got += Seq(r.get("id").asInstanceOf[Long], r.get("name").toString,
        r.get("n").asInstanceOf[Int])
    }
    reader.close()
    assert(got.toSeq == rows, "the reference implementation decoded different records")
  }

  test("interop: OUR parser reads avro-1.12.1 DataFileWriter bytes (deflate)") {
    import org.apache.avro.Schema
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val sch = new Schema.Parser().parse(schema.json)
    val out = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
      .setCodec(CodecFactory.deflateCodec(6))
    w.create(sch, out)
    rows.foreach { r =>
      val rec = new GenericData.Record(sch)
      rec.put("id", r(0).asInstanceOf[Long])
      rec.put("name", r(1).asInstanceOf[String])
      rec.put("n", r(2).asInstanceOf[Int])
      w.append(rec)
    }
    w.close()
    val (gotSchema, recs) = AvroCodec.parse(out.toByteArray)
    assert(gotSchema.fields == schema.fields)
    assert(recs == rows, "our parser decoded the reference writer's bytes differently")
  }

  test("zigzag varints round-trip the long edge values") {
    for (v <- Seq(0L, -1L, 1L, 63L, 64L, -64L, -65L, Long.MaxValue, Long.MinValue)) {
      val out = new ByteArrayOutputStream()
      AvroCodec.writeLong(out, v)
      val c = new AvroCodec.Cursor(out.toByteArray, 0)
      assert(c.readLong() == v && c.atEnd, s"value $v")
    }
  }

  test("corruption fails loudly: bad magic, flipped sync, unsupported codec") {
    val good = AvroCodec.write(schema, rows.iterator, "deflate")
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](AvroCodec.parse(badMagic))
      .getMessage.contains("magic"))
    val badSync = good.clone(); badSync(badSync.length - 1) = (badSync.last ^ 0x5a).toByte
    assert(intercept[IllegalArgumentException](AvroCodec.parse(badSync))
      .getMessage.contains("sync"))
    assert(intercept[IllegalArgumentException](
      AvroCodec.write(schema, rows.iterator, "snappy")).getMessage.contains("codec"))
  }
}
