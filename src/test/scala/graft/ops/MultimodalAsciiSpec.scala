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

  // ---- the BYTE-LEVEL regime (m01/m11/m12): multi-byte text IN-gate ----

  test("utf8Payload carries multi-byte text: every payload contains bytes >= 0x80 " +
    "and emoji/CJK survive without the ASCII guard") {
    val p = MultimodalOps.utf8Payload("emoji 😀 and 中文")
    assert(p.exists(b => (b & 0xff) >= 0x80), "no high bytes — not exercising UTF-8")
    // even an all-ASCII doc gets high bytes from the appended probe suffix
    val q = MultimodalOps.utf8Payload("plain ascii")
    assert(q.exists(b => (b & 0xff) >= 0x80), "suffix must force multi-byte bytes")
    // byte identity with the JDK's UTF-8 encoder over the augmented text
    assert(java.util.Arrays.equals(p,
      ("emoji 😀 and 中文" + MultimodalOps.NonAsciiSuffix).getBytes("UTF-8")))
  }

  test("hexFrameHash is defined on slices that split a UTF-8 sequence " +
    "(the case the oracle's md5(VARCHAR) could never replay from raw bytes)") {
    val p = MultimodalOps.utf8Payload("aé中€")
    // slice [0,3) cuts '中' (3 bytes) mid-sequence: invalid standalone UTF-8
    val h1 = MultimodalOps.hexFrameHash(p, 0, 3)
    val h2 = MultimodalOps.hexFrameHash(p, 0, 4)
    assert(h1 != h2, "hash must depend on the exact byte range")
    assert(h1 > 0 && h2 > 0, "60-bit prefix is always positive")
    // clamped past the end: hashes the available tail, deterministically
    assert(MultimodalOps.hexFrameHash(p, 0, 1000) ==
      MultimodalOps.hexFrameHash(p, 0, p.length))
  }
}
