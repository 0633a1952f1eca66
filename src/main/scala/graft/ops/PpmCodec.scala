package graft.ops

import MultimodalOps.MediaCodec

/** A REAL [[MultimodalOps.MediaCodec]]: binary PPM (P6), the simplest
  * public image format — `P6\n<w> <h>\n<maxval>\n` followed by w*h RGB
  * byte triples. Decoding here is genuine pixel work (header parse +
  * channel accumulation), demonstrating the codec seam's contract with an
  * actual format rather than the byte-histogram stub: swap THIS in and
  * the distributed plumbing (extractFeatures / sampleFrames / resize) is
  * unchanged. Invalid bytes fail loudly — a strict decoder surfaces
  * corrupt media at the task where it was read, not downstream.
  */
object PpmCodec extends MediaCodec {
  val FeatureDim = 8
  override def featureDim: Int = FeatureDim

  private case class Ppm(width: Int, height: Int, dataOffset: Int, payload: Array[Byte]) {
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val o = dataOffset + 3 * (y * width + x)
      (payload(o) & 0xff, payload(o + 1) & 0xff, payload(o + 2) & 0xff)
    }
  }

  private def parse(payload: Array[Byte]): Ppm = {
    require(payload.length >= 2 && payload(0) == 'P' && payload(1) == '6',
      s"not a P6 PPM payload (${payload.length} bytes)")
    // header = magic + 3 whitespace-separated ints, then ONE whitespace
    var pos = 2
    val fields = new Array[Int](3)
    var f = 0
    while (f < 3) {
      while (pos < payload.length && payload(pos).toChar.isWhitespace) pos += 1
      var v = 0
      var any = false
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
        v = v * 10 + (payload(pos) - '0'); pos += 1; any = true
      }
      require(any, s"corrupt PPM header at byte $pos")
      fields(f) = v
      f += 1
    }
    pos += 1 // the single whitespace after maxval
    val (w, h, maxval) = (fields(0), fields(1), fields(2))
    require(maxval == 255, s"only maxval=255 PPM supported, got $maxval")
    require(payload.length >= pos + 3 * w * h,
      s"PPM truncated: header says ${w}x$h but only ${payload.length - pos} data bytes")
    Ppm(w, h, pos, payload)
  }

  def encodeSolid(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    while (i < out.length) { out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte; i += 3 }
    out
  }

  /** Encode arbitrary per-pixel RGB (row-major callback) — the input
    * side of pixel-level ops like the m06 perceptual hash.
    */
  def encodePixels(width: Int, height: Int)(rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = rgb(x, y)
        out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Decode to raw pixels: `(width, height, rgb bytes row-major)` — the
    * full-fidelity sibling of `decode`'s fixed-width feature contract,
    * for ops that need actual pixel values (perceptual hashing).
    */
  def decodePixels(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = parse(payload)
    (img.width, img.height,
      java.util.Arrays.copyOfRange(img.payload, img.dataOffset, img.dataOffset + 3 * img.width * img.height))
  }

  /** Feature = per-channel energy proportions `[ΣR, ΣG, ΣB, 0…] / Σall` —
    * L1-normalized per the codec contract, and closed-form computable for
    * solid-color images (the m04 oracle).
    */
  override def decode(payload: Array[Byte]): Array[Float] = {
    if (payload.isEmpty) return new Array[Float](FeatureDim)
    val img = parse(payload)
    var sr, sg, sb = 0L
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val (r, g, b) = img.pixel(x, y); sr += r; sg += g; sb += b; x += 1
      }
      y += 1
    }
    val total = sr + sg + sb
    require(total > 0, "all-black image: channel proportions undefined (contract needs L1=1)")
    val f = new Array[Float](FeatureDim)
    f(0) = (sr.toDouble / total).toFloat
    f(1) = (sg.toDouble / total).toFloat
    f(2) = (sb.toDouble / total).toFloat
    f
  }

  /** A "frame" of a still image = one pixel row; `strideBytes` is reused
    * as the row stride. Same portable md5-prefix row hash as the stub
    * ([[MultimodalOps.frameHash]]) so frame identity semantics are
    * codec-uniform and oracle-replayable.
    */
  override def sampleFrames(payload: Array[Byte], strideBytes: Int, maxFrames: Int): Seq[(Int, Long)] = {
    if (payload.isEmpty) return Nil
    val img = parse(payload)
    val stride = math.max(1, strideBytes)
    (0 until math.min(maxFrames, (img.height + stride - 1) / stride)).map { i =>
      val y = i * stride
      val from = img.dataOffset + 3 * y * img.width
      (i, MultimodalOps.frameHash(payload, from, from + 3 * img.width))
    }
  }

  /** Real nearest-neighbor downsample: every `scaleDiv`-th pixel on both
    * axes, re-emitted as a valid P6 image.
    */
  override def resizePayload(payload: Array[Byte], scaleDiv: Int): Array[Byte] = {
    if (payload.isEmpty) return payload
    val img = parse(payload)
    val div = math.max(1, scaleDiv)
    val (nw, nh) = ((img.width + div - 1) / div, (img.height + div - 1) / div)
    val header = s"P6\n$nw $nh\n255\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(header.length + 3 * nw * nh)
    out.put(header)
    var y = 0
    while (y < nh) {
      var x = 0
      while (x < nw) {
        val (r, g, b) = img.pixel(x * div, y * div)
        out.put(r.toByte).put(g.toByte).put(b.toByte)
        x += 1
      }
      y += 1
    }
    out.array()
  }
}
