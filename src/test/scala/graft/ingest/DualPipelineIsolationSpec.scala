package graft.ingest

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import java.time.LocalDate
import java.util.Base64

/** The reference deploys the SAME script twice with different
  * parameterisations — the main audit pipeline and an "equalities" one
  * with its own prefix, source dir and credentials
  * (`ci/jobs/production.yml:49-79`, `ci/meta.yml:179-186`). Two
  * [[IngestConfig]]s must therefore be able to run over one source tree,
  * interleaved and even concurrently, without cross-contaminating
  * watermarks, keys, or output objects: each pipeline's progress file
  * advances only on its own commits, each object decrypts only with its
  * own private key, and the store holds exactly the two disjoint
  * prefix families.
  */
class DualPipelineIsolationSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val days = Seq("2020-10-10", "2020-10-11", "2020-10-12")

  private def addDay(src: Path, day: String): Unit = {
    val d = Files.createDirectories(src.resolve(day))
    for (i <- 1 to 3)
      Files.write(d.resolve(s"audit-$i.json"), s"""{"day": "$day", "n": $i}""".getBytes("UTF-8"))
  }

  test("two parameterisations over one source tree: disjoint outputs, keys, and watermarks") {
    val src = Files.createTempDirectory("dual-src")
    val out = Files.createTempDirectory("dual-out") // ONE shared bucket
    val store = new LocalDirObjectStore(out.toString)
    val (pubA, privA) = Envelope.generateKeyPair()
    val (pubB, privB) = Envelope.generateKeyPair()
    val progressA = Files.createTempDirectory("dual-wm").resolve("progress-a.txt")
    val progressB = progressA.resolveSibling("progress-b.txt")
    def cfg(prefix: String, keyId: String, pub: java.security.PublicKey, progress: Path) =
      IngestConfig(
        srcDir = src.toString,
        storeFactory = LocalDirObjectStoreFactory(out.toString),
        s3Prefix = prefix,
        masterKeyId = keyId,
        publicKeyB64 = Base64.getEncoder.encodeToString(pub.getEncoded),
        progressFile = progress.toString
      )
    val cfgA = cfg("audit/", "hsm-key-a", pubA, progressA)
    val cfgB = cfg("equalities/", "hsm-key-b", pubB, progressB)

    // phase 1: only day 1 exists; A ingests it, B hasn't run yet
    addDay(src, days(0))
    assert(IngestJob.run(spark, cfgA).filesOk == 3)
    assert(Watermark.read(progressA.toString).contains(LocalDate.parse(days(0))))
    assert(Watermark.read(progressB.toString).isEmpty,
      "B's watermark must not move on A's commits")

    // phase 2: B catches up on day 1 — A's watermark must not move
    val wmABefore = Watermark.read(progressA.toString)
    assert(IngestJob.run(spark, cfgB).filesOk == 3)
    assert(Watermark.read(progressA.toString) == wmABefore)

    // phase 3: days 2-3 land; BOTH pipelines drain them CONCURRENTLY
    // from one SparkSession (the production shape: two scheduled jobs
    // over the same cluster)
    addDay(src, days(1)); addDay(src, days(2))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val (sumA, sumB) = Await.result(
      Future(IngestJob.run(spark, cfgA)).zip(Future(IngestJob.run(spark, cfgB))),
      5.minutes)
    assert(sumA.filesOk == 6 && sumB.filesOk == 6)

    // disjoint complete outputs: each prefix holds exactly its 9 objects
    val keysA = store.listKeys("audit/").toSet
    val keysB = store.listKeys("equalities/").toSet
    assert(keysA.size == 9 && keysB.size == 9)
    assert(keysA.map(_.stripPrefix("audit/")) == keysB.map(_.stripPrefix("equalities/")),
      "same source files under each pipeline's own prefix")

    // key isolation: every A object decrypts with A's private key and
    // carries A's master-key id; B's key CANNOT open it (and vice versa)
    def roundTrip(key: String, priv: java.security.PrivateKey): Array[Byte] =
      Zlib.decompress(Envelope.decrypt(EncryptedObject(store.get(key), store.getMetadata(key)), priv))
    for (k <- keysA) {
      assert(store.getMetadata(k)("datakeyencryptionkeyid") == "hsm-key-a")
      assert(new String(roundTrip(k, privA)).contains("\"day\""))
      intercept[Exception](roundTrip(k, privB))
    }
    for (k <- keysB) {
      assert(store.getMetadata(k)("datakeyencryptionkeyid") == "hsm-key-b")
      assert(new String(roundTrip(k, privB)).contains("\"day\""))
      intercept[Exception](roundTrip(k, privA))
    }

    // both watermarks independently at day 3; re-runs are no-ops that
    // move neither the other's watermark nor the store
    assert(Watermark.read(progressA.toString).contains(LocalDate.parse(days(2))))
    assert(Watermark.read(progressB.toString).contains(LocalDate.parse(days(2))))
    assert(IngestJob.run(spark, cfgA).filesOk == 0)
    assert(Watermark.read(progressB.toString).contains(LocalDate.parse(days(2))))
    assert(store.listKeys("audit/").size == 9 && store.listKeys("equalities/").size == 9)
  }
}
