package graft.ops

import graft.SparkSpec
import graft.ops.MultimodalOps._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property checks of the [[MultimodalOps.MediaCodec]] CONTRACT over the
  * stub implementation, plus proof the seam accepts a foreign codec — so
  * a real decoder (JavaCV/ffmpeg) can be dropped in and held to the same
  * invariants the distributed plumbing assumes.
  */
class MultimodalCodecSpec extends AnyFunSuite {
  private val rnd = new Random(42)
  private val payloads: Seq[Array[Byte]] =
    Seq(
      Array.emptyByteArray,
      Array[Byte](0),
      Array.fill[Byte](513)(7), // constant
      Array.tabulate[Byte](256)(_.toByte), // uniform over all byte values
      "plain text payload with words".getBytes
    ) ++ (1 to 20).map { _ =>
      val b = new Array[Byte](rnd.nextInt(4096)); rnd.nextBytes(b); b
    }

  test("decode: featureDim components, finite, non-negative, L1 norm 1 (0 for empty) — every payload") {
    for (p <- payloads) {
      val f = StubCodec.decode(p)
      assert(f.length == StubCodec.featureDim)
      assert(f.forall(x => !x.isNaN && !x.isInfinite && x >= 0f))
      val l1 = f.map(_.toDouble).sum
      if (p.isEmpty) assert(l1 == 0.0)
      else assert(math.abs(l1 - 1.0) < 1e-3, s"L1=$l1 for payload of ${p.length} bytes")
    }
  }

  test("decode is deterministic per payload (task retry/speculation safety)") {
    for (p <- payloads)
      assert(StubCodec.decode(p).sameElements(StubCodec.decode(p)))
  }

  test("byte entropy is bounded [0,8]; 0 for constant payloads, 8 for uniform-all-bytes") {
    for (p <- payloads) {
      val e = byteEntropy(p)
      assert(e >= 0.0 && e <= 8.0, s"entropy $e out of range")
    }
    assert(byteEntropy(Array.fill[Byte](513)(7)) == 0.0)
    assert(math.abs(byteEntropy(Array.tabulate[Byte](256)(_.toByte)) - 8.0) < 1e-9)
  }

  test("sampleFrames: at most maxFrames, contiguous indices from 0, deterministic") {
    for (p <- payloads; stride <- Seq(1, 64, 4096); max <- Seq(0, 1, 16)) {
      val frames = StubCodec.sampleFrames(p, stride, max)
      assert(frames.size <= max)
      assert(frames.map(_._1) == frames.indices)
      assert(frames == StubCodec.sampleFrames(p, stride, max))
    }
  }

  test("resizePayload shrinks by ~scaleDiv and never throws on tiny payloads") {
    for (p <- payloads; div <- Seq(2, 7)) {
      val out = StubCodec.resizePayload(p, div)
      assert(out.length == math.ceil(p.length.toDouble / div).toInt)
    }
  }

  test("a foreign codec injects through the seam without touching the plumbing") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // A "real-decoder stand-in" with a different dimension and constant
    // output — if the plumbing hard-coded StubCodec anywhere, this fails.
    val constant: MediaCodec = new MediaCodec {
      override def featureDim: Int = 3
      override def decode(payload: Array[Byte]): Array[Float] = Array(1f, 0f, 0f)
      override def sampleFrames(payload: Array[Byte], strideBytes: Int, maxFrames: Int): Seq[(Int, Long)] =
        Seq((0, 99L))
      override def resizePayload(payload: Array[Byte], scaleDiv: Int): Array[Byte] = Array[Byte](1)
    }
    val assets = Seq(
      MediaAsset(1L, "image", "abc".getBytes, 10, 10, 0L),
      MediaAsset(2L, "video", "defg".getBytes, 20, 20, 1000L)
    ).toDS()

    val feats = extractFeatures(assets, constant).collect().sortBy(_.asset_id)
    assert(feats.forall(_.feature.sameElements(Array(1f, 0f, 0f))))
    assert(feats.map(_.n_bytes).sameElements(Array(3L, 4L))) // plumbing fields still real

    val frames = sampleFrames(assets, 64, 4, constant).collect()
    assert(frames.length == 2 && frames.forall(f => f.frame_idx == 0 && f.frame_hash == 99L))

    val resized = resize(assets, 2, constant).collect()
    assert(resized.forall(_.payload.sameElements(Array[Byte](1))))
    assert(resized.map(_.width).sorted.sameElements(Array(5, 10)))
  }
}
