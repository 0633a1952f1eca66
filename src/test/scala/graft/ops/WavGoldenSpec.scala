package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Golden-fixture pins for the RIFF/WAVE codec: a hand-framed file with
  * hand-computed byte offsets (not encoder output), so the parser's chunk
  * walking, pad-byte handling, and little-endian field decoding are pinned
  * against the format spec rather than against the encoder's own bugs.
  */
class WavGoldenSpec extends AnyFunSuite {

  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Hand-framed: RIFF(WAVE) > fmt (PCM mono 8000Hz 16-bit) > data with
    * samples [1000, -2, 257]. No metadata chunks — the minimal legal file.
    */
  private def minimal: Array[Byte] =
    "RIFF".getBytes ++ le32(4 + 24 + 8 + 6) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(6) ++ le16(1000) ++ le16(0xfffe) ++ le16(257)

  test("minimal hand-framed WAV parses to the hand-computed fields") {
    val info = WavCodec.parse(minimal)
    assert(info.sampleRate == 8000 && info.channels == 1 && info.bitsPerSample == 16)
    assert(info.samples.toSeq == Seq[Short](1000, -2, 257))
  }

  test("an unknown odd-sized chunk before fmt is skipped via the pad-byte rule") {
    // 5-byte 'junk' body + 1 pad byte; misaligning the walk (no pad) would
    // land mid-chunk and fail — parsing proves the alignment rule.
    val junk = "junk".getBytes ++ le32(5) ++ "abcde".getBytes ++ Array(0.toByte)
    val tail = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(12000) ++
      le32(24000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(2) ++ le16(7)
    val bytes = "RIFF".getBytes ++ le32(4 + junk.length + tail.length) ++ "WAVE".getBytes ++ junk ++ tail
    val info = WavCodec.parse(bytes)
    assert(info.sampleRate == 12000 && info.samples.toSeq == Seq[Short](7))
  }

  test("encoder output round-trips and matches the documented length closed form") {
    val samples = Array[Short](0, 100, -100, Short.MaxValue, Short.MinValue)
    val wav = WavCodec.encodePcm16(samples, 44100)
    assert(wav.length == WavCodec.HeaderBytes + 2 * samples.length)
    val info = WavCodec.parse(wav)
    assert(info.sampleRate == 44100 && info.channels == 1 && info.bitsPerSample == 16)
    assert(info.samples.toSeq == samples.toSeq)
  }

  test("strict failures: bad magic, data before fmt, truncated chunk, non-PCM") {
    val e1 = intercept[IllegalArgumentException](WavCodec.parse("RIFX".getBytes ++ minimal.drop(4)))
    assert(e1.getMessage.contains("bad RIFF magic"))

    val dataFirst = "RIFF".getBytes ++ le32(4 + 8 + 2) ++ "WAVE".getBytes ++
      "data".getBytes ++ le32(2) ++ le16(5)
    val e2 = intercept[IllegalArgumentException](WavCodec.parse(dataFirst))
    assert(e2.getMessage.contains("before fmt"))

    val truncated = minimal.dropRight(2) // RIFF size now exceeds the bytes
    val e3 = intercept[IllegalArgumentException](WavCodec.parse(truncated))
    assert(e3.getMessage.contains("truncated"))

    val nonPcm = minimal.clone()
    nonPcm(20) = 3 // audioFormat -> IEEE float
    val e4 = intercept[IllegalArgumentException](WavCodec.parse(nonPcm))
    assert(e4.getMessage.contains("unsupported audio format"))
  }
}
