package graft.ops

/** A REAL audio container codec: RIFF/WAVE with PCM16 payloads — the
  * second genuine media format beside [[PpmCodec]]'s P6 images, giving the
  * multimodal family an audio modality whose bytes a real tool would play.
  * The parser is a proper RIFF chunk walker (not an offset hardcode): it
  * verifies the RIFF/WAVE magic, iterates `<fourcc><size32le><body>`
  * chunks honoring the word-alignment pad byte after odd-sized bodies,
  * skips unknown chunks (LIST/INFO metadata, as an editor would write),
  * and requires `fmt ` before `data` like every real decoder. Invalid
  * bytes fail loudly with byte offsets — corrupt media surfaces at the
  * task that read it, not downstream.
  *
  * Scale posture: encode/parse are narrow per-row byte work on executors
  * (no shuffle); features derived from samples stay integer-exact so they
  * survive the cross-engine hash compare.
  */
object WavCodec {

  /** Parsed PCM stream: format fields from `fmt `, samples from `data`. */
  case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int, samples: Array[Short])

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def readLe16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def readLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** The LIST/INFO metadata chunk the encoder writes — 9 content bytes,
    * deliberately ODD so every parse exercises the RIFF pad-byte rule.
    */
  private val ListContent = "INFOgraft".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Fixed header overhead of [[encodePcm16]]'s layout: 12 (RIFF+WAVE)
    * + 8+9+1 (LIST, padded) + 24 (fmt ) + 8 (data header). Payload adds
    * 2 bytes per sample. Exposed so oracles can closed-form the length.
    */
  val HeaderBytes: Int = 12 + (8 + ListContent.length + 1) + 24 + 8

  /** Encode mono PCM16 samples as a real WAV file: RIFF header, a LIST
    * metadata chunk (odd-sized, exercising the pad rule on every decode),
    * a 16-byte PCM `fmt ` chunk, then `data` with little-endian samples.
    */
  def encodePcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val channels = 1
    val bits = 16
    val byteRate = sampleRate * channels * (bits / 8)
    val blockAlign = channels * (bits / 8)
    val out = new java.io.ByteArrayOutputStream(HeaderBytes + samples.length * 2)
    val dataBytes = samples.length * 2
    val riffSize = 4 + (8 + ListContent.length + 1) + 24 + 8 + dataBytes
    out.write("RIFF".getBytes); out.write(le32(riffSize)); out.write("WAVE".getBytes)
    out.write("LIST".getBytes); out.write(le32(ListContent.length)); out.write(ListContent)
    out.write(0) // pad byte: chunks are word-aligned
    out.write("fmt ".getBytes); out.write(le32(16))
    out.write(le16(1)) // audio format: PCM
    out.write(le16(channels))
    out.write(le32(sampleRate))
    out.write(le32(byteRate))
    out.write(le16(blockAlign))
    out.write(le16(bits))
    out.write("data".getBytes); out.write(le32(dataBytes))
    samples.foreach(s => out.write(le16(s & 0xffff)))
    out.toByteArray
  }

  /** Walk the RIFF chunks and return format + samples. Strict: bad magic,
    * truncated chunks, non-PCM format, `data` before `fmt `, or a missing
    * `data` chunk all throw with byte context.
    */
  def parse(payload: Array[Byte]): WavInfo = {
    require(payload.length >= 12, s"not a RIFF file (${payload.length} bytes)")
    require(fourcc(payload, 0) == "RIFF", s"bad RIFF magic '${fourcc(payload, 0)}'")
    val riffSize = readLe32(payload, 4)
    require(riffSize + 8 <= payload.length,
      s"truncated RIFF: declares ${riffSize + 8} bytes, have ${payload.length}")
    require(fourcc(payload, 8) == "WAVE", s"not a WAVE form: '${fourcc(payload, 8)}'")
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (sampleRate, channels, bits)
    while (pos + 8 <= riffSize + 8) {
      val id = fourcc(payload, pos)
      val size = readLe32(payload, pos + 4)
      val body = pos + 8
      require(size >= 0 && body + size <= payload.length,
        s"truncated chunk '$id' at byte $pos (size=$size)")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small ($size bytes) at byte $pos")
          val audioFormat = readLe16(payload, body)
          require(audioFormat == 1, s"unsupported audio format $audioFormat (PCM only)")
          fmt = Some((readLe32(payload, body + 4), readLe16(payload, body + 2), readLe16(payload, body + 14)))
        case "data" =>
          val (rate, channels, bits) = fmt.getOrElse(
            throw new IllegalArgumentException(s"data chunk at byte $pos before fmt "))
          require(bits == 16, s"unsupported bit depth $bits (PCM16 only)")
          require(size % 2 == 0, s"odd PCM16 data size $size at byte $pos")
          val samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = readLe16(payload, body + 2 * i).toShort
            i += 1
          }
          return WavInfo(rate, channels, bits, samples)
        case _ => () // LIST and friends: metadata a decoder skips
      }
      pos = body + size + (size & 1) // odd-sized bodies carry a pad byte
    }
    throw new IllegalArgumentException("no data chunk in WAVE form")
  }
}
