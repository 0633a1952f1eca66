package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("feature extraction is deterministic and schema-correct") {
    val assets = MultimodalOps.syntheticAssets(spark, sfDir)
    val feats = MultimodalOps.extractFeatures(assets)
    val rows = feats.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.feature.length == MultimodalOps.StubCodec.FeatureDim))
    // L1-normalised histogram features sum to ~1 for non-empty payloads
    assert(rows.filter(_.n_bytes > 0).forall(r => math.abs(r.feature.map(_.toDouble).sum - 1.0) < 1e-3))
    // determinism across independent runs
    val again = MultimodalOps.extractFeatures(assets).collect()
    assert(rows.sortBy(_.asset_id).zip(again.sortBy(_.asset_id)).forall { case (a, b) =>
      a.byte_entropy == b.byte_entropy && a.feature.sameElements(b.feature)
    })
  }

  test("documents fixture text is pure ASCII at every SF the gate runs " +
    "(the m05/m08/m09/m10 oracles' char/byte parity depends on it)") {
    // The engine paths use JVM char semantics (length() = chars, take(n),
    // US_ASCII getBytes) while the DuckDB oracles use strlen() (bytes)
    // and ascii() (codepoints). For ASCII text the two agree exactly; a
    // non-ASCII character would silently diverge both the row sets
    // (length filters) and the pixel/sample values. Pin the assumption:
    // octet_length == length holds only when every char is single-byte
    // UTF-8 (ASCII), and a max-codepoint check rules out any char ≥ 128.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables.t(spark, d, "documents")
      val nonAscii = docs.where(
        octet_length(col("text")) =!= length(col("text")) ||
          array_max(transform(split(col("text"), ""), c => ascii(c))) >= 128)
      assert(nonAscii.count() == 0L,
        s"non-ASCII text in $d documents — m05/m08/m09/m10 oracle parity is void")
    }
  }

  test("entropy flags degenerate payloads") {
    import spark.implicits._
    val assets = Seq(
      MultimodalOps.MediaAsset(1L, "image", Array.fill[Byte](1000)(7), 10, 10, 0L), // constant bytes
      MultimodalOps.MediaAsset(2L, "image", Array.tabulate[Byte](1000)(i => i.toByte), 10, 10, 0L)
    ).toDS()
    val feats = MultimodalOps.extractFeatures(assets).collect().sortBy(_.asset_id)
    assert(feats(0).byte_entropy == 0.0) // constant => zero entropy
    assert(feats(1).byte_entropy > 7.0) // near-uniform => ~8 bits
  }

  test("frame sampling fans out with bounded frames per asset") {
    val frames = MultimodalOps.sampleFrames(MultimodalOps.syntheticAssets(spark, sfDir), strideBytes = 64, maxFrames = 4)
    val byAsset = frames.toDF().groupBy("asset_id").count()
    assert(byAsset.filter(col("count") > 4).count() == 0)
    assert(frames.count() > 500) // most docs are >64 bytes => multiple frames
  }

  test("resize halves metadata dimensions and shrinks payloads") {
    val resized = MultimodalOps.resize(MultimodalOps.syntheticAssets(spark, sfDir), scaleDiv = 2).collect()
    assert(resized.forall(a => a.payload.length <= a.duration_ms / 10 / 2 + 1))
  }

  test("m01/m02 query entries run and are non-empty") {
    assert(MultimodalOps.queries("m01_media_features")(spark, sfDir).count() == 500)
    assert(MultimodalOps.queries("m02_frame_samples")(spark, sfDir).count() > 500)
  }

  test("PPM pixel codec round-trips arbitrary images byte-for-byte") {
    val img = PpmCodec.encodePixels(7, 5) { (x, y) => (x * 36 % 256, y * 51 % 256, (x + y) % 256) }
    val (w, h, px) = PpmCodec.decodePixels(img)
    assert(w == 7 && h == 5 && px.length == 3 * 7 * 5)
    for (y <- 0 until 5; x <- 0 until 7) {
      val o = 3 * (y * 7 + x)
      assert((px(o) & 0xff) == x * 36 % 256 && (px(o + 1) & 0xff) == y * 51 % 256
        && (px(o + 2) & 0xff) == (x + y) % 256, s"pixel ($x,$y) corrupted")
    }
  }

  test("m06: perceptual-hash dedup clusters docs into their 8 pattern classes") {
    val rows = MultimodalOps.queries("m06_phash_dedup")(spark, sfDir).collect()
    // 8 gradient pattern classes; distinct dHashes may collide between
    // classes only if the bit grids coincide — pin the actual structure
    assert(rows.map(_.getLong(1)).sum == 500)
    assert(rows.length <= 8 && rows.length >= 2, s"expected 2..8 clusters, got ${rows.length}")
    // every cluster's keeper is its minimum doc_id => keeper < 8 for full clusters
    assert(rows.forall(r => r.getLong(2) < 8), "a keeper is not the class minimum")
  }
  test("m09: the DC bin equals |sum of samples| — an independent check of the DFT kernel") {
    import org.apache.spark.sql.functions._
    val dc = graft.SparkEntry.queries("m09_spectral_features")(spark, sfDir)
      .filter(col("bin") === 0)
      .select("doc_id", "mag").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dc.nonEmpty)
    // recompute sum(ascii - 64) over the first 64 chars directly
    val direct = Tables.t(spark, sfDir, "documents")
      .filter(length(col("text")) >= 64)
      .select(col("doc_id"),
        expr("aggregate(transform(split(substr(text, 1, 64), ''), c -> ascii(c) - 64), 0, (a, v) -> a + v)").as("s"))
      .collect().map(r => r.getLong(0) -> math.abs(r.getInt(1).toDouble)).toMap
    assert(direct.keySet == dc.keySet)
    direct.foreach { case (id, expected) =>
      assert(math.abs(dc(id) - expected) < 0.01,
        s"doc $id: DC magnitude ${dc(id)} != |sample sum| $expected")
    }
  }
  test("m10: thumbnail conserves total intensity within the floor-division loss bound") {
    import org.apache.spark.sql.functions._
    // each output pixel is floor(sum4/4): 4*pix_sum is within [orig_sum - 3*64, orig_sum]
    val rows = graft.SparkEntry.queries("m10_box_downsample")(spark, sfDir)
      .select("doc_id", "pix_sum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val orig = Tables.t(spark, sfDir, "documents")
      .filter(length(col("text")) >= 256)
      .select(col("doc_id"),
        expr("aggregate(transform(split(substr(text, 1, 256), ''), c -> ascii(c)), 0L, (a, v) -> a + v)").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == orig.keySet)
    rows.foreach { case (id, ps) =>
      val o = orig(id)
      assert(4 * ps <= o && 4 * ps >= o - 3 * 64,
        s"doc $id: downsample lost more than floor-division allows (4*$ps vs $o)")
    }
  }
}
