package graft.streaming

import graft.SparkSpec
import graft.ingest._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import java.time.LocalDate
import java.util.Base64
import java.util.concurrent.ConcurrentHashMap

/** Store factory that counts every put per key across creates (static —
  * executor tasks run in-process under local[*]).
  */
final case class CountingStoreFactory(root: String, tag: String) extends ObjectStoreFactory {
  override def create(): ObjectStore = new LocalDirObjectStore(root) {
    override def put(key: String, data: Array[Byte], metadata: Map[String, String]): Unit = {
      CountingStoreFactory.puts
        .computeIfAbsent(tag, _ => new ConcurrentHashMap[String, Integer]())
        .merge(key, 1, (a, b) => a + b)
      super.put(key, data, metadata)
    }
  }
}
object CountingStoreFactory {
  val puts = new ConcurrentHashMap[String, ConcurrentHashMap[String, Integer]]()
  def countsFor(tag: String): Map[String, Int] = {
    val m = puts.get(tag)
    if (m == null) Map.empty
    else {
      val it = m.entrySet().iterator()
      val b = Map.newBuilder[String, Int]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.intValue() }
      b.result()
    }
  }
}

/** The round-2 verdict's top task: the ingest pipeline as a NATIVE
  * Structured Streaming query (custom DSv2 source, one day per
  * micro-batch, checkpoint as watermark) — not a scheduler looping a
  * batch job.
  */
class IngestStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private lazy val (pub, priv) = Envelope.generateKeyPair()
  private def pubB64 = Base64.getEncoder.encodeToString(pub.getEncoded)

  private def makeSource(days: Seq[String]): Path = {
    val src = Files.createTempDirectory("stream-src")
    for (day <- days) {
      val d = Files.createDirectories(src.resolve(day))
      Files.write(d.resolve("a.json"), s"""{"day":"$day","n":1}""".getBytes("UTF-8"))
      Files.write(Files.createDirectories(d.resolve("sub")).resolve("b.json"), s"day $day b".getBytes)
      Files.write(d.resolve("empty.dat"), Array.emptyByteArray)
    }
    val junk = Files.createDirectories(src.resolve("not-a-date"))
    Files.write(junk.resolve("ignored.txt"), "nope".getBytes)
    src
  }

  private def cfgFor(src: Path, factory: ObjectStoreFactory, progress: Path) =
    IngestConfig(
      srcDir = src.toString,
      storeFactory = factory,
      s3Prefix = "audit/",
      masterKeyId = "test-hsm-key-id",
      publicKeyB64 = pubB64,
      progressFile = progress.toString
    )

  test("AvailableNow drains the backlog one day per micro-batch; layout, round-trip, watermark") {
    val src = makeSource(Seq("2021-05-01", "2021-05-02"))
    val out = Files.createTempDirectory("stream-out")
    val progress = Files.createTempDirectory("wm").resolve("progress.txt")
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val cfg = cfgFor(src, LocalDirObjectStoreFactory(out.toString), progress)

    IngestStream.runAvailableNow(spark, cfg, checkpoint)

    val store = cfg.storeFactory.create()
    val keys = store.listKeys("audit/")
    assert(keys.size == 6) // 3 files x 2 days, non-dated dir skipped
    assert(keys.contains("audit/2021-05-01/a.json.gz.enc"))
    assert(keys.contains("audit/2021-05-01/sub/b.json.gz.enc")) // nested relpath kept
    assert(keys.contains("audit/2021-05-01/empty.dat.gz.enc")) // 0-byte file NOT dropped

    // decrypt+inflate round-trip incl. the empty file
    val md = store.getMetadata("audit/2021-05-02/a.json.gz.enc")
    assert(md.keySet == Set("iv", "ciphertext", "datakeyencryptionkeyid"))
    val plain = Zlib.decompress(
      Envelope.decrypt(EncryptedObject(store.get("audit/2021-05-02/a.json.gz.enc"), md), priv)
    )
    assert(new String(plain, "UTF-8") == """{"day":"2021-05-02","n":1}""")
    val emptyMd = store.getMetadata("audit/2021-05-01/empty.dat.gz.enc")
    val emptyPlain = Zlib.decompress(
      Envelope.decrypt(EncryptedObject(store.get("audit/2021-05-01/empty.dat.gz.enc"), emptyMd), priv)
    )
    assert(emptyPlain.isEmpty)

    // checkpointed offsets mirrored into the reference-format progress file
    assert(Watermark.read(progress.toString).contains(LocalDate.parse("2021-05-02")))
  }

  test("restart resumes from the checkpoint: committed days are never re-read or re-put") {
    val src = makeSource(Seq("2021-06-01", "2021-06-02"))
    val out = Files.createTempDirectory("stream-out")
    val progress = Files.createTempDirectory("wm").resolve("progress.txt")
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val tag = "resume-" + System.nanoTime()
    val cfg = cfgFor(src, CountingStoreFactory(out.toString, tag), progress)

    IngestStream.runAvailableNow(spark, cfg, checkpoint)
    val afterFirst = CountingStoreFactory.countsFor(tag)
    assert(afterFirst.size == 6 && afterFirst.values.forall(_ == 1))

    // a new day lands; the SAME checkpoint picks up only that day
    val d3 = Files.createDirectories(src.resolve("2021-06-03"))
    Files.write(d3.resolve("late.json"), "late".getBytes)
    IngestStream.runAvailableNow(spark, cfg, checkpoint)

    val afterSecond = CountingStoreFactory.countsFor(tag)
    assert(afterSecond.values.forall(_ == 1), s"some keys re-put: $afterSecond")
    assert(afterSecond.keySet.count(_.startsWith("audit/2021-06-03/")) == 1)
    assert(Watermark.read(progress.toString).contains(LocalDate.parse("2021-06-03")))
  }

  test("poisoned file fails its day, offset stays on the last good day; fixed store resumes") {
    val src = makeSource(Seq("2021-07-01", "2021-07-02"))
    Files.write(src.resolve("2021-07-02").resolve("poison.json"), "bad".getBytes)
    val out = Files.createTempDirectory("stream-out")
    val progress = Files.createTempDirectory("wm").resolve("progress.txt")
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val bad = cfgFor(src, PoisonedStoreFactory(out.toString), progress)

    val e = intercept[Exception](IngestStream.runAvailableNow(spark, bad, checkpoint))
    assert(e.getMessage != null)
    // day 1 committed, day 2 aborted: watermark mirror holds the last good day
    assert(Watermark.read(progress.toString).contains(LocalDate.parse("2021-07-01")))

    // same checkpoint, healthy store: ONLY the failed day re-runs, then commits
    val good = cfgFor(src, LocalDirObjectStoreFactory(out.toString), progress)
    IngestStream.runAvailableNow(spark, good, checkpoint)
    assert(Watermark.read(progress.toString).contains(LocalDate.parse("2021-07-02")))
    val keys = good.storeFactory.create().listKeys("audit/")
    assert(keys.count(_.startsWith("audit/2021-07-02/")) == 4) // 3 fixture files + poison.json
  }

  test("EAX mode flows through the streaming drain (reference-parity cipher per object)") {
    val src = makeSource(Seq("2021-11-01"))
    val out = Files.createTempDirectory("stream-out")
    val progress = Files.createTempDirectory("wm").resolve("progress.txt")
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val cfg = cfgFor(src, LocalDirObjectStoreFactory(out.toString), progress)
      .copy(aesMode = Envelope.AesMode.Eax)

    IngestStream.runAvailableNow(spark, cfg, checkpoint)

    val store = cfg.storeFactory.create()
    val md = store.getMetadata("audit/2021-11-01/a.json.gz.enc")
    assert(java.util.Base64.getDecoder.decode(md("iv")).length == Envelope.EaxNonceBytes)
    val plain = Zlib.decompress(
      Envelope.decrypt(
        EncryptedObject(store.get("audit/2021-11-01/a.json.gz.enc"), md),
        priv,
        Envelope.AesMode.Eax
      )
    )
    assert(new String(plain, "UTF-8") == """{"day":"2021-11-01","n":1}""")
  }

  test("batch read of the same source: manifest aggregation over all pending days") {
    import org.apache.spark.sql.functions._
    val src = makeSource(Seq("2021-09-01", "2021-09-02"))
    val manifest = spark.read
      .format("graft-audit")
      .option("srcDir", src.toString)
      .load()
      .groupBy("day")
      .agg(count(lit(1)).as("n_files"), sum(length(col("content"))).as("n_bytes"))
      .orderBy("day")
      .collect()
    assert(manifest.length == 2)
    assert(manifest.forall(_.getLong(1) == 3)) // 3 files per day incl. the empty one
    assert(manifest.map(_.getDate(0).toString).sameElements(Array("2021-09-01", "2021-09-02")))

    // watermark option prunes day 1 entirely
    val pruned = spark.read
      .format("graft-audit")
      .option("srcDir", src.toString)
      .option("startDay", "2021-09-01")
      .load()
    assert(pruned.select("day").distinct().collect().map(_.getDate(0).toString).sameElements(Array("2021-09-02")))
  }

  test("streaming analytics compose over the source: per-day file counts via foreachBatch") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val src = makeSource(Seq("2021-10-01", "2021-10-02"))
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val seen = new ConcurrentHashMap[String, Long]()
    val q = spark.readStream
      .format("graft-audit")
      .option("srcDir", src.toString)
      .load()
      .groupBy("day")
      .agg(count(lit(1)).as("n"))
      .writeStream
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => seen.put(r.getDate(0).toString, r.getLong(1)))
      }
      .start()
    q.awaitTermination()
    assert(seen.get("2021-10-01") == 3L && seen.get("2021-10-02") == 3L)
  }

  test("batch scan plans from ONE source listing (no per-method stream rebuild)") {
    val src = makeSource(Seq("2021-12-01", "2021-12-02"))
    val df = spark.read
      .format("graft-audit")
      .option("srcDir", src.toString)
      .load()
    val before = AuditSource.listDayCalls.get()
    assert(df.count() == 6)
    val listings = AuditSource.listDayCalls.get() - before
    assert(listings == 1, s"batch scan listed the source $listings times; expected exactly 1")
  }

  test("a trailing EMPTY day still advances the progress mirror (reconciled from the checkpoint)") {
    val src = makeSource(Seq("2022-01-01"))
    Files.createDirectories(src.resolve("2022-01-02")) // admitted day with ZERO files
    val out = Files.createTempDirectory("stream-out")
    val progress = Files.createTempDirectory("wm").resolve("progress.txt")
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val cfg = cfgFor(src, LocalDirObjectStoreFactory(out.toString), progress)

    IngestStream.runAvailableNow(spark, cfg, checkpoint)

    // The per-batch mirror derives from observed rows, which an empty day
    // has none of — the reconcile step must land the checkpoint's end
    // offset so a later BATCH-mode run does not re-list the empty day.
    assert(Watermark.read(progress.toString).contains(LocalDate.parse("2022-01-02")))
    // and the stream checkpoint agrees on restart: nothing pending
    val before = cfg.storeFactory.create().listKeys("audit/").size
    IngestStream.runAvailableNow(spark, cfg, checkpoint)
    assert(cfg.storeFactory.create().listKeys("audit/").size == before)
  }

  test("source honors a pre-existing progress file as the initial watermark (batch -> stream migration)") {
    val src = makeSource(Seq("2021-08-01", "2021-08-02"))
    val out = Files.createTempDirectory("stream-out")
    val progress = Files.createTempDirectory("wm").resolve("progress.txt")
    Watermark.commit(progress.toString, LocalDate.parse("2021-08-01")) // day 1 done by the batch loop
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val tag = "migrate-" + System.nanoTime()
    val cfg = cfgFor(src, CountingStoreFactory(out.toString, tag), progress)

    IngestStream.runAvailableNow(spark, cfg, checkpoint)

    val counts = CountingStoreFactory.countsFor(tag)
    assert(counts.keySet.forall(_.startsWith("audit/2021-08-02/")), s"strict > violated: ${counts.keySet}")
    assert(counts.size == 3)
    assert(Watermark.read(progress.toString).contains(LocalDate.parse("2021-08-02")))
  }
}
