package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Golden-fixture pins for [[PngCodec]]'s DECODER: the filtered
  * scanline bytes are written BY HAND from RFC 2083's filter
  * definitions (not produced by the codec's own encoder), deflated and
  * chunk-framed by an independent builder in this spec, and the
  * decoder must reconstruct the hand-computed pixels for every filter
  * type. Integrity contracts (CRC tamper, truncation, unsupported
  * header fields) fail loudly; the encoder round-trips all five
  * filters over exhaustive byte patterns; the codec drives the
  * distributed plumbing (extractFeatures / resize / sampleFrames)
  * unchanged.
  */
class PngGoldenSpec extends AnyFunSuite {

  /** Independent chunk builder — the RFC, not PngCodec.encodeRgb. */
  private def buildPng(w: Int, h: Int, rawScanlines: Array[Byte]): Array[Byte] = {
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(rawScanlines); deflater.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      val t = tpe.getBytes("US-ASCII")
      val c = new java.util.zip.CRC32(); c.update(t); c.update(data)
      out.write(be32(data.length)); out.write(t); out.write(data)
      out.write(be32(c.getValue.toInt))
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0))
    chunk("IDAT", buf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def decode(png: Array[Byte]): (Int, Int, Seq[Int]) = {
    val (w, h, rgb) = PngCodec.decodePixels(png)
    (w, h, rgb.map(_ & 0xff).toSeq)
  }

  test("filter 0 (None) and filter 1 (Sub): hand-computed reconstruction") {
    // w=2: row0 None = raw bytes; row1 Sub with filtered [10,20,30,5,5,5]
    // -> pixel0 = (10,20,30), pixel1 = pixel0 + (5,5,5) = (15,25,35)
    val raw = Array[Byte](
      0, 1, 2, 3, 4, 5, 6,
      1, 10, 20, 30, 5, 5, 5)
    val (w, h, px) = decode(buildPng(2, 2, raw))
    assert((w, h) === (2, 2))
    assert(px === Seq(1, 2, 3, 4, 5, 6, 10, 20, 30, 15, 25, 35))
  }

  test("filter 2 (Up): hand-computed reconstruction") {
    val raw = Array[Byte](
      0, 1, 2, 3, 4, 5, 6,
      2, 10, 10, 10, 10, 10, 10)
    val (_, _, px) = decode(buildPng(2, 2, raw))
    assert(px === Seq(1, 2, 3, 4, 5, 6, 11, 12, 13, 14, 15, 16))
  }

  test("filter 3 (Average): hand-computed reconstruction incl. the floor division") {
    // row0 = [2,4,6,8,10,12]; row1 filtered [1,1,1,2,2,2]:
    //   i0..2: left=0 -> x + up/2 = 2,3,4
    //   i3: left=2, up=8  -> 2 + (2+8)/2  = 7
    //   i4: left=3, up=10 -> 2 + (3+10)/2 = 8  (floor of 6.5)
    //   i5: left=4, up=12 -> 2 + (4+12)/2 = 10
    val raw = Array[Byte](
      0, 2, 4, 6, 8, 10, 12,
      3, 1, 1, 1, 2, 2, 2)
    val (_, _, px) = decode(buildPng(2, 2, raw))
    assert(px === Seq(2, 4, 6, 8, 10, 12, 2, 3, 4, 7, 8, 10))
  }

  test("filter 4 (Paeth): hand-computed reconstruction") {
    // row0 = [3,6,9,12,15,18]; row1 filtered all-1s: the predictor
    // resolves to UP for every byte here (|p-b| smallest), so row1 =
    // up + 1 elementwise
    val raw = Array[Byte](
      0, 3, 6, 9, 12, 15, 18,
      4, 1, 1, 1, 1, 1, 1)
    val (_, _, px) = decode(buildPng(2, 2, raw))
    assert(px === Seq(3, 6, 9, 12, 15, 18, 4, 7, 10, 13, 16, 19))
  }

  test("Paeth predictor tie-breaks: a, then b, then c (RFC 2083 order)") {
    assert(PngCodec.paeth(5, 5, 5) === 5)   // all distances zero -> a
    assert(PngCodec.paeth(7, 7, 0) === 7)   // pa == pb == 7, pc = 14 -> a wins the tie
    assert(PngCodec.paeth(2, 9, 0) === 9)   // p=11: pb=2 smallest -> b
    assert(PngCodec.paeth(5, 10, 8) === 8)  // p=7: pc=1 smallest -> c
  }

  test("encoder round-trips all five filters over varied byte patterns") {
    val rnd = new scala.util.Random(7)
    for (ft <- 0 to 4; trial <- 0 until 3) {
      val w = 1 + rnd.nextInt(5); val h = 1 + rnd.nextInt(5)
      val rgb = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      val png = PngCodec.encodeRgb(w, h, rgb, _ => ft)
      val (dw, dh, back) = PngCodec.decodePixels(png)
      assert((dw, dh) === (w, h), s"filter $ft trial $trial")
      assert(back.toSeq === rgb.toSeq, s"filter $ft trial $trial: pixels corrupted")
    }
    // mixed filters per row, extreme values included
    val rgb = Array.tabulate(3 * 4 * 7)(i => (i * 37 + 255 * (i % 2)).toByte)
    val png = PngCodec.encodeRgb(4, 7, rgb, y => y % 5)
    assert(PngCodec.decodePixels(png)._3.toSeq === rgb.toSeq)
  }

  test("integrity: CRC tamper, truncation, and unsupported headers fail loudly") {
    val good = PngCodec.encodeRgb(3, 3, Array.tabulate(27)(_.toByte))
    // flip one byte inside the IDAT data region
    val tampered = good.clone()
    tampered(good.length - 16) = (tampered(good.length - 16) ^ 0x01).toByte
    val e1 = intercept[IllegalArgumentException](PngCodec.decodePixels(tampered))
    assert(e1.getMessage.contains("CRC"), e1.getMessage)

    val truncated = java.util.Arrays.copyOfRange(good, 0, good.length - 4)
    intercept[IllegalArgumentException](PngCodec.decodePixels(truncated))

    val notPng = "definitely not an image".getBytes("US-ASCII")
    val e3 = intercept[IllegalArgumentException](PngCodec.decodePixels(notPng))
    assert(e3.getMessage.contains("not a PNG"), e3.getMessage)

    // interlaced flag: rebuild with interlace=1 (fresh CRC, so the CRC
    // gate passes and the HEADER gate must catch it)
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val t = "IHDR".getBytes("US-ASCII")
    val data = be32(2) ++ be32(2) ++ Array[Byte](8, 2, 0, 0, 1)
    val c = new java.util.zip.CRC32(); c.update(t); c.update(data)
    out.write(be32(13)); out.write(t); out.write(data); out.write(be32(c.getValue.toInt))
    val e4 = intercept[IllegalArgumentException](PngCodec.decodePixels(out.toByteArray))
    assert(e4.getMessage.contains("interlaced"), e4.getMessage)
  }

  test("the codec seam: extractFeatures / resize / sampleFrames run unchanged over PNG assets") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    val assets = spark.createDataset(Seq(
      MultimodalOps.MediaAsset(1L, "image",
        PngCodec.encodeRgb(4, 6, Array.tabulate(72)(i => (i + 1).toByte), y => y % 5), 4, 6, 0L),
      MultimodalOps.MediaAsset(2L, "image",
        PngCodec.encodeRgb(6, 4, Array.fill(72)(40.toByte)), 6, 4, 0L)))
    val feats = MultimodalOps.extractFeatures(assets, PngCodec).collect()
    assert(feats.length === 2)
    val f2 = feats.find(_.asset_id == 2L).get
    // solid gray: channel proportions exactly 1/3 each
    assert(math.abs(f2.feature(0) - 1f / 3) < 1e-6 && math.abs(f2.feature(2) - 1f / 3) < 1e-6)

    val resized = MultimodalOps.resize(assets, scaleDiv = 2, PngCodec).collect()
    resized.foreach { a =>
      val (w, h, _) = PngCodec.decodePixels(a.payload)
      val orig = assets.filter(_.asset_id == a.asset_id).head()
      assert(w === (orig.width + 1) / 2 && h === (orig.height + 1) / 2)
    }

    val frames = MultimodalOps.sampleFrames(assets, strideBytes = 2, maxFrames = 3, PngCodec)
      .collect()
    // asset 1 has 6 rows, stride 2 -> 3 frames; asset 2 has 4 rows -> 2
    assert(frames.count(_.asset_id == 1L) === 3)
    assert(frames.count(_.asset_id == 2L) === 2)
    // solid image: every sampled row hashes identically
    assert(frames.filter(_.asset_id == 2L).map(_.frame_hash).distinct.length === 1)
  }
}
