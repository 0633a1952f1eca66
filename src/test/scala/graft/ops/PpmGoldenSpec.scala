package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import MultimodalOps._

/** Golden-fixture pins for the multimodal family: a hand-written 2x2 PPM
  * P6 image with hand-computed expected values, pushed through the REAL
  * distributed pipeline (extractFeatures / sampleFrames / resize over a
  * Dataset with [[PpmCodec]]), plus a literal pin of the stub codec. The
  * multimodal values are asserted against constants here — not just the
  * codec contract.
  */
class PpmGoldenSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  // P6, 2x2, maxval 255; pixels (row-major): red, red, green, blue.
  // Header is 11 ASCII bytes, data 12 bytes -> 23 bytes total.
  private val golden: Array[Byte] =
    "P6\n2 2\n255\n".getBytes("US-ASCII") ++
      Array(255, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255).map(_.toByte)

  private def assetDs = {
    import spark.implicits._
    spark.createDataset(Seq(MediaAsset(7L, "image", golden, 2, 2, 0L)))
  }

  test("m01 shape: decoded features and entropy match hand-computed literals") {
    val row = extractFeatures(assetDs, PpmCodec).collect().head
    assert(row.n_bytes == 23L)
    // channel sums R=510, G=255, B=255 of 1020 -> exactly (0.5, 0.25, 0.25)
    assert(row.feature.toSeq == Seq(0.5f, 0.25f, 0.25f, 0f, 0f, 0f, 0f, 0f))
    // byte histogram: 'P','6','2'x2,' ','5'x3 + 3 newlines in the header,
    // 0x00 x8, 0xFF x4 in the data -> Shannon entropy 2.6318326 bits/byte
    assert(math.abs(row.byte_entropy - 2.6318326080427985) < 1e-12)
  }

  test("m02 shape: per-row frame hashes match precomputed literals") {
    val frames = sampleFrames(assetDs, strideBytes = 1, maxFrames = 16, codec = PpmCodec)
      .collect().sortBy(_.frame_idx).toSeq
    // portable md5-prefix hash, computed independently in python:
    // int(md5(row_bytes).hexdigest()[:15], 16) for rows
    // [255,0,0,255,0,0] (y=0) and [0,255,0,0,0,255] (y=1)
    assert(frames.map(f => (f.frame_idx, f.frame_hash)) ==
      Seq((0, 1123125320987413059L), (1, 888909879341409529L)))
  }

  test("m03 shape: resize produces the exact 1x1 red PPM and re-decodes to (1,0,0)") {
    val out = resize(assetDs, scaleDiv = 2, codec = PpmCodec).collect().head
    assert(out.width == 1 && out.height == 1)
    assert(out.payload.toSeq ==
      ("P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array(255, 0, 0).map(_.toByte)).toSeq)
    assert(PpmCodec.decode(out.payload).toSeq == Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))
  }

  test("stub codec literal pin: 'abc' histogram and entropy") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(MediaAsset(1L, "audio", "abc".getBytes, 1, 1, 0L)))
    val row = extractFeatures(ds, StubCodec).collect().head
    // bytes 97,98,99 land in buckets 1,2,3 of 8 -> (0, 1/3, 1/3, 1/3, 0...)
    val third = (1.0 / 3.0).toFloat
    assert(row.feature.toSeq == Seq(0f, third, third, third, 0f, 0f, 0f, 0f))
    assert(math.abs(row.byte_entropy - 1.584962500721156) < 1e-12) // log2(3)
  }

  test("strict decode fails loudly on corrupt and truncated payloads") {
    intercept[IllegalArgumentException](PpmCodec.decode("JFIF****".getBytes))
    intercept[IllegalArgumentException](PpmCodec.decode(golden.dropRight(1)))
    intercept[IllegalArgumentException](
      PpmCodec.decode(PpmCodec.encodeSolid(2, 2, 0, 0, 0))) // all-black: L1 undefined
  }
}
