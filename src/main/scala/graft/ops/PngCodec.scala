package graft.ops

import MultimodalOps.MediaCodec

/** A REAL raster codec behind the [[MultimodalOps.MediaCodec]] seam:
  * PNG (RFC 2083), 8-bit truecolor (color type 2), non-interlaced —
  * built entirely on public machinery (`java.util.zip` Deflater/
  * Inflater/CRC32, the same zlib the envelope pipeline wraps). Unlike
  * the PPM codec this is a genuinely CODED format: chunk framing with
  * CRC-32 integrity, zlib-compressed scanlines, and the five per-row
  * predictive filters (None/Sub/Up/Average/Paeth) whose reconstruction
  * is the decoder's real work — PngGoldenSpec pins each filter's
  * inverse against hand-computed reconstructions. Strict decoding:
  * bad signature, CRC mismatch, unsupported header fields, and
  * short/long inflate all fail loudly at the task that read the bytes
  * (the corrupt-media-at-ingest discipline every codec here follows).
  * Swap it into extractFeatures/sampleFrames/resize and the
  * distributed plumbing is untouched — the codec-seam contract m11
  * drives end to end under an exact oracle.
  */
object PngCodec extends MediaCodec {
  val FeatureDim = 8
  override def featureDim: Int = FeatureDim

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private val Bpp = 3 // 8-bit RGB
  private val MaxPixels = 1L << 26 // decode cap: 8192x8192 truecolor

  private def crcOf(chunkType: Array[Byte], data: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32()
    c.update(chunkType)
    c.update(data)
    c.getValue.toInt
  }

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def readBe32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** RFC 2083 §6.6: the Paeth predictor — nearest of left/up/up-left to
    * the linear estimate a + b − c, ties broken a, then b, then c.
    */
  private[ops] def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ------------------------------------------------------------------
  // Encode
  // ------------------------------------------------------------------

  /** Encode row-major RGB bytes as a valid PNG. `filterForRow` picks
    * the filter type (0-4) per scanline — the fixture hook that lets
    * specs and m11 exercise every filter's round trip deterministically.
    */
  def encodeRgb(width: Int, height: Int, rgb: Array[Byte],
      filterForRow: Int => Int = _ => 0): Array[Byte] = {
    require(rgb.length == Bpp * width * height,
      s"rgb length ${rgb.length} != 3*$width*$height")
    val stride = Bpp * width
    val raw = new Array[Byte]((1 + stride) * height)
    var y = 0
    while (y < height) {
      val ft = filterForRow(y)
      require(ft >= 0 && ft <= 4, s"filter type $ft out of range")
      raw(y * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val cur = rgb(y * stride + i) & 0xff
        val left = if (i >= Bpp) rgb(y * stride + i - Bpp) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
        val upLeft = if (y > 0 && i >= Bpp) rgb((y - 1) * stride + i - Bpp) & 0xff else 0
        val filtered = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, upLeft)
        }
        raw(y * (1 + stride) + 1 + i) = filtered.toByte
        i += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val idat = buf.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      val t = tpe.getBytes("US-ASCII")
      out.write(be32(data.length)); out.write(t); out.write(data)
      out.write(be32(crcOf(t, data)))
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write(be32(width)); ihdr.write(be32(height))
    ihdr.write(8)  // bit depth
    ihdr.write(2)  // color type: truecolor
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, adaptive filtering, no interlace
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decode
  // ------------------------------------------------------------------

  private case class Header(width: Int, height: Int)

  /** Decode to `(width, height, rgb bytes row-major)` — signature,
    * per-chunk CRC, IHDR constraints, zlib inflate to the exact
    * scanline length, and the five filter inverses.
    */
  def decodePixels(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(payload.length >= Signature.length + 12 &&
      (0 until Signature.length).forall(i => payload(i) == Signature(i)),
      s"not a PNG payload (${payload.length} bytes)")
    var pos = Signature.length
    var header: Option[Header] = None
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended) {
      require(pos + 8 <= payload.length, s"PNG truncated mid chunk header at byte $pos")
      val len = readBe32(payload, pos)
      require(len >= 0 && pos + 12 + len <= payload.length,
        s"PNG chunk at byte $pos claims $len data bytes beyond the payload")
      val tpe = new String(payload, pos + 4, 4, "US-ASCII")
      val data = java.util.Arrays.copyOfRange(payload, pos + 8, pos + 8 + len)
      val crc = readBe32(payload, pos + 8 + len)
      val expect = crcOf(java.util.Arrays.copyOfRange(payload, pos + 4, pos + 8), data)
      require(crc == expect,
        f"PNG $tpe chunk CRC mismatch at byte $pos: stored 0x$crc%08x computed 0x$expect%08x")
      tpe match {
        case "IHDR" =>
          require(header.isEmpty, "duplicate IHDR")
          require(len == 13, s"IHDR must be 13 bytes, got $len")
          val w = readBe32(data, 0); val h = readBe32(data, 4)
          require(w > 0 && h > 0, s"degenerate dimensions ${w}x$h")
          // fail loudly on hostile/corrupt dims: unbounded w·h would let the
          // 32-bit stride/raw-size products below wrap (silently-garbage
          // pixels past the inflate-length checks at best), and a
          // legitimate-looking huge header would allocate unboundedly.
          // Cap at 2^26 pixels (a 8192x8192 truecolor frame): then
          // stride = 3w < 2^28 and (1+stride)·h ≤ h + 3wh < 2^29 — every
          // product below provably fits an Int.
          require(w.toLong * h.toLong <= MaxPixels,
            s"PNG dimensions ${w}x$h exceed the $MaxPixels-pixel decode cap")
          require(data(8) == 8, s"only bit depth 8 supported, got ${data(8)}")
          require(data(9) == 2, s"only color type 2 (truecolor) supported, got ${data(9)}")
          require(data(10) == 0 && data(11) == 0, "nonstandard compression/filter method")
          require(data(12) == 0, "interlaced PNG not supported")
          header = Some(Header(w, h))
        case "IDAT" =>
          require(header.nonEmpty, "IDAT before IHDR")
          idat.write(data)
        case "IEND" => ended = true
        case _ => () // ancillary chunks (CRC-checked above) are skipped
      }
      pos += 12 + len
    }
    val Header(w, h) = header.getOrElse(throw new IllegalArgumentException("PNG has no IHDR"))
    val stride = Bpp * w
    val raw = new Array[Byte]((1 + stride) * h)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, off, raw.length - off)
      require(n > 0 || inflater.finished(),
        if (inflater.needsInput) "PNG IDAT stream truncated" else "PNG inflate stalled")
      off += n
    }
    require(off == raw.length, s"PNG scanline data short: $off of ${raw.length} bytes")
    require(inflater.inflate(new Array[Byte](1)) == 0 && inflater.finished(),
      "PNG IDAT holds surplus bytes beyond the scanlines")
    inflater.end()

    val rgb = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      require(ft <= 4, s"row $y has invalid filter type $ft")
      var i = 0
      while (i < stride) {
        val x = raw(y * (1 + stride) + 1 + i) & 0xff
        val left = if (i >= Bpp) rgb(y * stride + i - Bpp) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
        val upLeft = if (y > 0 && i >= Bpp) rgb((y - 1) * stride + i - Bpp) & 0xff else 0
        val recon = ft match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + ((left + up) >> 1)
          case 4 => x + paeth(left, up, upLeft)
        }
        rgb(y * stride + i) = recon.toByte
        i += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** Feature contract identical to [[PpmCodec.decode]]: per-channel
    * energy proportions, L1-normalized — closed-form replayable from
    * whatever rule generated the pixels.
    */
  override def decode(payload: Array[Byte]): Array[Float] = {
    if (payload.isEmpty) return new Array[Float](FeatureDim)
    val (_, _, rgb) = decodePixels(payload)
    var sr, sg, sb = 0L
    var i = 0
    while (i < rgb.length) {
      sr += rgb(i) & 0xff; sg += rgb(i + 1) & 0xff; sb += rgb(i + 2) & 0xff
      i += 3
    }
    val total = sr + sg + sb
    require(total > 0, "all-black image: channel proportions undefined (contract needs L1=1)")
    val f = new Array[Float](FeatureDim)
    f(0) = (sr.toDouble / total).toFloat
    f(1) = (sg.toDouble / total).toFloat
    f(2) = (sb.toDouble / total).toFloat
    f
  }

  /** A "frame" = one DECODED pixel row (the file bytes are compressed,
    * so row identity is defined over reconstructed pixels); same
    * portable md5-prefix hash as every codec here.
    */
  override def sampleFrames(payload: Array[Byte], strideBytes: Int, maxFrames: Int): Seq[(Int, Long)] = {
    if (payload.isEmpty) return Nil
    val (w, h, rgb) = decodePixels(payload)
    val stride = math.max(1, strideBytes)
    (0 until math.min(maxFrames, (h + stride - 1) / stride)).map { i =>
      val y = i * stride
      (i, MultimodalOps.frameHash(rgb, Bpp * y * w, Bpp * (y + 1) * w))
    }
  }

  /** Nearest-neighbor downsample, re-encoded as a valid (filter-0) PNG. */
  override def resizePayload(payload: Array[Byte], scaleDiv: Int): Array[Byte] = {
    if (payload.isEmpty) return payload
    val (w, h, rgb) = decodePixels(payload)
    val div = math.max(1, scaleDiv)
    val (nw, nh) = ((w + div - 1) / div, (h + div - 1) / div)
    val out = new Array[Byte](Bpp * nw * nh)
    var y = 0
    while (y < nh) {
      var x = 0
      while (x < nw) {
        val so = Bpp * ((y * div) * w + x * div)
        val o = Bpp * (y * nw + x)
        out(o) = rgb(so); out(o + 1) = rgb(so + 1); out(o + 2) = rgb(so + 2)
        x += 1
      }
      y += 1
    }
    encodeRgb(nw, nh, out)
  }
}
