package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import ArrowIpcCodec._

class ArrowIpcCodecSpec extends AnyFunSuite {

  private val schema = FlatSchema(Seq("id" -> "long", "txt" -> "string"))

  test("file magic: Arrow IPC files start and end with ARROW1") {
    val bytes = write(schema, Seq(Seq(1L, "a")))
    assert(new String(bytes.take(6), UTF_8) === "ARROW1")
    assert(new String(bytes.takeRight(6), UTF_8) === "ARROW1")
  }

  test("multi-batch round trip preserves order, values, and schema") {
    val rows: Seq[Seq[Any]] = (0 until 2500).map(i => Seq(i.toLong, s"doc-$i-${"x" * (i % 7)}"))
    val bytes = write(schema, rows, rowsPerBatch = 1000) // 3 batches
    val (sch, back) = parse(bytes)
    assert(sch === schema)
    assert(back === rows)
  }

  test("unicode and empty strings survive the varchar path") {
    val rows: Seq[Seq[Any]] = Seq(Seq(1L, ""), Seq(2L, "héllo — ∑"), Seq(3L, "a\nb\u0000c"))
    assert(parse(write(schema, rows))._2 === rows)
  }

  test("corrupt footer fails loudly, not with wrong data") {
    val bytes = write(schema, Seq(Seq(1L, "a")))
    val corrupt = bytes.clone()
    corrupt(corrupt.length - 7) = (corrupt(corrupt.length - 7) ^ 0x55).toByte
    assert(intercept[Exception](parse(corrupt)) != null)
  }

  test("round trip through Spark's own Arrow jars is bit-stable on identical input") {
    val rows: Seq[Seq[Any]] = (0 until 100).map(i => Seq(i.toLong, s"r$i"))
    assert(write(schema, rows).toSeq === write(schema, rows).toSeq)
  }

  test("STREAM framing: multi-batch round trip via ArrowStreamReader, no footer magic") {
    val rows: Seq[Seq[Any]] = (0 until 2500).map(i => Seq(i.toLong, s"doc-$i-${"y" * (i % 5)}"))
    val bytes = writeStream(schema, rows, rowsPerBatch = 1000) // 3 batches
    val (sch, back) = parseStream(bytes)
    assert(sch === schema)
    assert(back === rows)
    // the stream framing has NO file magic anywhere (that's the file
    // format's bracket) and is smaller than the footer-bearing file
    assert(new String(bytes.take(6), UTF_8) !== "ARROW1")
    assert(new String(bytes.takeRight(6), UTF_8) !== "ARROW1")
    assert(bytes.length < write(schema, rows, rowsPerBatch = 1000).length)
  }

  test("cross-framing equality: file-parsed rows == stream-parsed rows on identical input") {
    // the q102 comment's claim, asserted directly: both framings carry
    // the SAME logical content — only the bracket differs
    val rows: Seq[Seq[Any]] = (0 until 1500).map(i => Seq(i.toLong, s"doc-$i-${"z" * (i % 11)}"))
    val file = parse(write(schema, rows, rowsPerBatch = 512))
    val stream = parseStream(writeStream(schema, rows, rowsPerBatch = 512))
    assert(file._1 === stream._1)
    assert(file._2 === stream._2)
  }

  test("STREAM framing: unicode/empty strings survive; file bytes are rejected loudly") {
    val rows: Seq[Seq[Any]] = Seq(Seq(1L, ""), Seq(2L, "héllo — ∑"), Seq(3L, "a\nb c"))
    assert(parseStream(writeStream(schema, rows))._2 === rows)
    // a stream reader fed FILE bytes must fail, not return wrong data
    assert(intercept[Exception](parseStream(write(schema, rows))) != null)
  }
}
