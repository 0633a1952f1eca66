package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized property checks over the pure kernels the distributed
  * operators lean on — the invariants that must hold for EVERY input,
  * not just fixtures: codec round-trips, signing-encoder laws, bin-pack
  * conservation, BPE merge conservation.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 200): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  test("zlib round-trips arbitrary byte arrays (including empty and highly repetitive)") {
    val bytesGen = Gen.oneOf(
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      Gen.choose(0, 10000).map(n => Array.fill[Byte](n)(7)) // repetitive payloads
    )
    check(Prop.forAll(bytesGen) { b =>
      graft.ingest.Zlib.decompress(graft.ingest.Zlib.compress(b)).sameElements(b)
    })
  }

  test("zstd round-trips arbitrary byte arrays; size stays within the declared worst-case bound") {
    val bytesGen = Gen.oneOf(
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      Gen.choose(0, 10000).map(n => Array.fill[Byte](n)(7)) // repetitive payloads
    )
    check(Prop.forAll(bytesGen) { b =>
      val z = com.github.luben.zstd.Zstd.compress(b, 3)
      val n = com.github.luben.zstd.Zstd.getFrameContentSize(z)
      val back = com.github.luben.zstd.Zstd.decompress(z, n.toInt)
      back.sameElements(b) && z.length <= b.length + b.length / 256 + 64
    })
  }

  test("envelope encrypt/decrypt round-trips arbitrary payloads under both cipher modes") {
    val (pub, priv) = graft.ingest.Envelope.generateKeyPair()
    val bytesGen = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    val modeGen = Gen.oneOf(graft.ingest.Envelope.AesMode.Gcm, graft.ingest.Envelope.AesMode.Eax)
    check(
      Prop.forAll(bytesGen, modeGen) { (b, mode) =>
        val obj = graft.ingest.Envelope.encrypt(b, pub, "kid", mode)
        graft.ingest.Envelope.decrypt(obj, priv, mode).sameElements(b)
      },
      n = 30 // RSA keygen-free but each trial wraps+unwraps: keep bounded
    )
  }

  test("training shards round-trip arbitrary document text (unicode, newlines, quotes, empties)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val textGen = Gen.listOfN(40, Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.const(""),
      Gen.const("line\nbreak\tand \"quotes\" \\ backslash"),
      Gen.const("emoji 🙂 and 語 unicode"),
      Gen.listOf(Gen.oneOf('√', 'é', '語', 'a', ' ')).map(_.mkString)
    ))
    check(Prop.forAll(textGen) { texts =>
      val out = java.nio.file.Files.createTempDirectory("graft-shard-prop").toString
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      graft.sources.TrainingShards.write(df, out, maxDocsPerShard = 7)
      val back = graft.sources.TrainingShards.read(spark, out, Some(df.schema))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      back.sameElements(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.sortBy(_._1))
    }, n = 12) // each trial is a full Spark write+read job
  }

  test("SigV4 uriEncode is injective-by-decoding and idempotent on its own unreserved output") {
    val strGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '/', '+', '=', 'é', 'ß', '~', '.')))
      .map(_.mkString)
    check(Prop.forAll(strGen) { s =>
      val enc = graft.ingest.SigV4.uriEncode(s, encodeSlash = true)
      val decoded = java.net.URLDecoder.decode(enc, "UTF-8")
      // URLDecoder treats '+' as space, but uriEncode never emits '+'
      decoded == s && !enc.contains('+') &&
      enc.forall(c => c == '%' || c.isLetterOrDigit || "-._~".contains(c))
    })
  }

  test("bin-packing conserves files exactly and never overfills a bin with multiple files") {
    val filesGen = Gen.listOf(
      Gen.zip(Gen.identifier, Gen.choose(0L, 200L)).map { case (n, sz) => (n, sz, 0) }
    )
    val capGen = Gen.choose(1L, 300L)
    check(Prop.forAll(filesGen, capGen) { (files, cap) =>
      val bins = graft.sources.AuditStreamSourceTestHook.binPack(files, cap)
      val flat = bins.flatten.toSeq
      val conserved = flat.sorted == files.sorted // every file exactly once
      val noOverfull = bins.forall(b => b.map(_._2).sum <= cap || b.size == 1)
      conserved && noOverfull
    })
  }

  test("BPE mergeSymbols conserves content: joining symbols always reproduces the word") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val pairGen = Gen.zip(Gen.alphaLowerStr.suchThat(_.nonEmpty), Gen.alphaLowerStr.suchThat(_.nonEmpty))
    check(Prop.forAll(wordGen, Gen.listOfN(3, pairGen)) { (w, pairs) =>
      val syms: Seq[String] = w.map(_.toString).toList
      val merged = graft.ops.BpeOps.applyMerges(syms, pairs)
      merged.mkString == w // merging never loses or duplicates characters
    })
  }

  test("binned range join equals the naive range join for random points/intervals/widths") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val ptsGen = Gen.nonEmptyListOf(Gen.choose(-100L, 100L))
    val ivGen = Gen.nonEmptyListOf(for {
      s <- Gen.choose(-100L, 100L)
      len <- Gen.choose(0L, 60L)
    } yield (s, s + len))
    val widthGen = Gen.choose(1L, 40L)
    check(
      Prop.forAll(ptsGen, ivGen, widthGen) { (ps, ivs, w) =>
        val points = ps.toDF("p")
        val intervals = ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }.toDF("id", "s", "e")
        val binned = graft.ops.RangeJoin
          .pointInInterval(points, "p", intervals, "s", "e", w)
          .select("id", "p").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        val naive = points.crossJoin(intervals)
          .where($"p" >= $"s" && $"p" <= $"e")
          .select("id", "p").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        binned == naive
      },
      n = 20 // each trial runs two Spark jobs: keep bounded
    )
  }
}
