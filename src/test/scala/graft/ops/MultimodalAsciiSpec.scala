package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The m-family's ASCII payload boundary — previously a SILENT-WRONG
  * mode (US_ASCII getBytes maps non-ASCII to '?' and cast-to-binary
  * emits multi-byte UTF-8, while the DuckDB oracles replay char-level
  * codepoints), now a loud error on both construction paths. Pinned:
  *
  *  1. the typed path ([[MultimodalOps.asciiPayload]]) rejects
  *     multi-byte text naming the offending codepoint;
  *  2. the untyped path ([[MultimodalOps.asciiPayloadCol]]) raises
  *     inside the plan for the same fixture;
  *  3. pure-ASCII text passes BOTH paths byte-identically to the raw
  *     encodings they replace (no behavior change on the gate corpora).
  */
class MultimodalAsciiSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("typed path rejects multi-byte text, naming the codepoint") {
    val ex = intercept[IllegalArgumentException] {
      MultimodalOps.asciiPayload("café latte")
    }
    assert(ex.getMessage.contains("U+00E9"), ex.getMessage)
    assert(ex.getMessage.contains("byte-level oracles"), ex.getMessage)
  }

  test("untyped path raises inside the plan for multi-byte text") {
    import spark.implicits._
    val df = Seq((1L, "plain ascii"), (2L, "emoji 😀 text"))
      .toDF("doc_id", "text")
      .select(MultimodalOps.asciiPayloadCol(col("text")).as("payload"))
    val ex = intercept[Exception] { df.collect() }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("ASCII corpora"), s"wrong error: $ex")
  }

  test("pure ASCII passes both paths byte-identically") {
    import spark.implicits._
    val text = "The quick brown fox! 0123"
    assert(java.util.Arrays.equals(MultimodalOps.asciiPayload(text),
      text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
    val got = Seq((1L, text)).toDF("doc_id", "text")
      .select(MultimodalOps.asciiPayloadCol(col("text")).as("payload"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(got, text.getBytes("UTF-8")))
  }
}
