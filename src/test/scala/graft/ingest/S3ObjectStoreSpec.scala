package graft.ingest

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** In-process fake of the S3 REST surface the client uses (PutObject,
  * GetObject, HeadObject, ListObjectsV2 with continuation tokens,
  * multipart upload) on a LOOPBACK HttpServer — no egress. It also
  * enforces protocol invariants independently of the client:
  * `x-amz-content-sha256` must equal the sha256 of the received body
  * (computed here with MessageDigest directly) and the Authorization
  * header must be a well-formed SigV4 credential. Error-injection keys
  * drive the client's exception classification.
  */
class FakeS3Server(bucket: String, pageSize: Int = 2) {
  private val objects = new java.util.concurrent.ConcurrentSkipListMap[String, (Array[Byte], Map[String, String])]()
  private val uploads = TrieMap[String, (Map[String, String], TrieMap[Int, Array[Byte]])]()
  private val uploadSeq = new AtomicInteger()
  val flakyAttempts = new AtomicInteger()
  val requests = new AtomicInteger()
  val listRequests = new AtomicInteger()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (exchange: HttpExchange) => try handle(exchange) finally exchange.close())
  server.setExecutor(null)
  server.start()

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)
  def storedKeys: Seq[String] = objects.keySet().asScala.toSeq
  /** Open (never completed/aborted) multipart uploads with their
    * buffered part counts — the crash-orphan population a bucket
    * lifecycle rule reaps in production.
    */
  def pendingUploads: Map[String, Int] = uploads.map { case (id, (_, parts)) => id -> parts.size }.toMap

  private def sha256Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString

  private def send(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) { val o = ex.getResponseBody; o.write(bytes); o.close() }
  }

  private def parseQuery(raw: String): Map[String, String] =
    Option(raw).filter(_.nonEmpty).map { q =>
      q.split("&").toSeq.map { p =>
        p.split("=", 2) match {
          case Array(k, v) => java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
          case Array(k) => java.net.URLDecoder.decode(k, "UTF-8") -> ""
        }
      }.toMap
    }.getOrElse(Map.empty)

  private def metaHeaders(ex: HttpExchange): Map[String, String] =
    ex.getRequestHeaders.entrySet().asScala.collect {
      case e if e.getKey.toLowerCase.startsWith("x-amz-meta-") =>
        e.getKey.toLowerCase.stripPrefix("x-amz-meta-") -> e.getValue.get(0)
    }.toMap

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def handle(ex: HttpExchange): Unit = {
    requests.incrementAndGet()
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath // decoded by URI
    val query = parseQuery(ex.getRequestURI.getRawQuery)
    val body = ex.getRequestBody.readAllBytes()

    // Protocol invariants (independent of the client's signing code).
    val auth = ex.getRequestHeaders.getFirst("Authorization")
    val hash = ex.getRequestHeaders.getFirst("x-amz-content-sha256")
    if (auth == null || !auth.startsWith("AWS4-HMAC-SHA256 Credential=") ||
      !auth.contains("SignedHeaders=") || !auth.contains("Signature="))
      return send(ex, 400, "<Error><Code>InvalidRequest</Code><Message>bad Authorization</Message></Error>")
    if (hash == null || hash != sha256Hex(body))
      return send(ex, 400, "<Error><Code>XAmzContentSHA256Mismatch</Code></Error>")
    if (path != s"/$bucket" && !path.startsWith(s"/$bucket/"))
      return send(ex, 404, "<Error><Code>NoSuchBucket</Code></Error>")

    val key = path.stripPrefix(s"/$bucket").stripPrefix("/")

    // Error injection for classification tests.
    if (key.contains("throttle")) return send(ex, 503, "<Error><Code>SlowDown</Code></Error>")
    if (key.contains("expired")) return send(ex, 403, "<Error><Code>ExpiredToken</Code></Error>")
    if (key.contains("flaky") && flakyAttempts.incrementAndGet() <= 2)
      return send(ex, 500, "<Error><Code>InternalError</Code></Error>")

    (method, key) match {
      case ("POST", k) if query.contains("uploads") =>
        val id = s"up-${uploadSeq.incrementAndGet()}"
        uploads.put(id, (metaHeaders(ex), TrieMap.empty))
        send(ex, 200, s"<InitiateMultipartUploadResult><UploadId>$id</UploadId></InitiateMultipartUploadResult>")
      case ("PUT", k) if query.contains("uploadId") && query.contains("partNumber") =>
        uploads.get(query("uploadId")) match {
          case Some((_, parts)) =>
            val n = query("partNumber").toInt
            parts.put(n, body)
            ex.getResponseHeaders.set("ETag", s""""etag-$n"""")
            send(ex, 200, "")
          case None => send(ex, 404, "<Error><Code>NoSuchUpload</Code></Error>")
        }
      case ("POST", k) if query.contains("uploadId") =>
        uploads.remove(query("uploadId")) match {
          case Some((meta, parts)) =>
            val data = parts.toSeq.sortBy(_._1).map(_._2).foldLeft(Array.emptyByteArray)(_ ++ _)
            objects.put(k, (data, meta))
            send(ex, 200, s"<CompleteMultipartUploadResult><Key>${xmlEscape(k)}</Key></CompleteMultipartUploadResult>")
          case None => send(ex, 404, "<Error><Code>NoSuchUpload</Code></Error>")
        }
      case ("DELETE", _) if query.contains("uploadId") =>
        uploads.remove(query("uploadId"))
        send(ex, 204, "")
      case ("PUT", k) =>
        objects.put(k, (body, metaHeaders(ex)))
        send(ex, 200, "")
      case ("GET", "") if query.get("list-type").contains("2") =>
        listRequests.incrementAndGet()
        val prefix = query.getOrElse("prefix", "")
        val all = objects.keySet().asScala.filter(_.startsWith(prefix)).toSeq.sorted
        val from = query.get("continuation-token").map(_.toInt).getOrElse(0)
        val page = all.slice(from, from + pageSize)
        val truncated = from + pageSize < all.size
        val keysXml = page.map(k => s"<Key>${xmlEscape(k)}</Key>").mkString
        val tokenXml =
          if (truncated) s"<NextContinuationToken>${from + pageSize}</NextContinuationToken>" else ""
        send(
          ex,
          200,
          s"<ListBucketResult>$keysXml<IsTruncated>$truncated</IsTruncated>$tokenXml</ListBucketResult>"
        )
      case ("GET", k) =>
        objects.get(k) match {
          case null => send(ex, 404, "<Error><Code>NoSuchKey</Code></Error>")
          case (data, _) =>
            ex.sendResponseHeaders(200, if (data.isEmpty) -1 else data.length)
            if (data.nonEmpty) { val o = ex.getResponseBody; o.write(data); o.close() }
        }
      case ("HEAD", k) =>
        objects.get(k) match {
          case null => send(ex, 404, "")
          case (_, meta) =>
            meta.foreach { case (mk, mv) => ex.getResponseHeaders.set(s"x-amz-meta-$mk", mv) }
            ex.sendResponseHeaders(200, -1)
        }
      case _ => send(ex, 400, "<Error><Code>InvalidRequest</Code></Error>")
    }
  }
}

/** The S3 client run against the loopback fake: seam contract + the
  * S3-specific surfaces (pagination, multipart, error classification,
  * retry integration). The signing MATH is pinned separately against
  * AWS's published vectors in [[SigV4Spec]].
  */
class S3ObjectStoreSpec extends AnyFunSuite with ObjectStoreContract with BeforeAndAfterAll {
  private val server = new FakeS3Server("testbucket")
  override def afterAll(): Unit = server.stop()

  private def store(threshold: Int = 64 * 1024 * 1024, part: Int = 64 * 1024 * 1024) =
    new S3ObjectStore(
      server.endpoint,
      "us-east-1",
      "testbucket",
      S3Credentials("AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", sessionToken = Some("tok")),
      multipartThreshold = threshold,
      partSize = part
    )

  override def implName = "S3ObjectStore(fake endpoint)"
  override def newStore(): ObjectStore = store()

  test("listKeys paginates with continuation tokens (page size 2)") {
    val s = store()
    val keys = (1 to 5).map(i => s"page/k$i")
    keys.foreach(k => s.put(k, k.getBytes, Map.empty))
    assert(s.listKeys("page/") == keys.sorted)
  }

  test("large object takes the multipart path and round-trips bytes + metadata") {
    val s = store(threshold = 1024, part = 1000)
    val data = Array.tabulate[Byte](5000)(i => (i % 251).toByte) // 5 parts
    s.put("big/obj.bin", data, Map("iv" -> "abc"))
    assert(s.get("big/obj.bin").sameElements(data))
    assert(s.getMetadata("big/obj.bin") == Map("iv" -> "abc"))
  }

  test("5xx/throttle classifies as retryable; expired token as transient-credentials") {
    val s = store()
    intercept[RetryableStoreException](s.put("err/throttle.bin", "x".getBytes, Map.empty))
    intercept[TransientCredentialsException](s.put("err/expired.bin", "x".getBytes, Map.empty))
    intercept[RuntimeException](s.get("err/nope.bin")) // plain 404 is neither
  }

  test("RetryingObjectStore over the S3 client rides out transient 5xx (boto3 standard-mode shape)") {
    server.flakyAttempts.set(0)
    val retrying = new RetryingObjectStore(store(), maxAttempts = 5, baseDelayMs = 1)
    retrying.put("flaky/k.bin", "payload".getBytes, Map("iv" -> "z"))
    assert(new String(retrying.get("flaky/k.bin")) == "payload")
    assert(server.flakyAttempts.get() >= 2, "fake never exercised the failure path")
  }

  test("full ingest day lands through the S3 client and decrypts back (executor-side clients)") {
    val spark = graft.SparkSpec.spark
    val (pub, priv) = Envelope.generateKeyPair()
    val src = java.nio.file.Files.createTempDirectory("s3-src")
    val d = java.nio.file.Files.createDirectories(src.resolve("2024-06-01"))
    java.nio.file.Files.write(d.resolve("a.json"), """{"v":1}""".getBytes)
    java.nio.file.Files.write(d.resolve("empty.dat"), Array.emptyByteArray)
    val cfg = IngestConfig(
      srcDir = src.toString,
      storeFactory = S3ObjectStoreFactory(
        server.endpoint, "us-east-1", "testbucket",
        "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", Some("tok")
      ),
      s3Prefix = "ingest/",
      masterKeyId = "kid",
      publicKeyB64 = java.util.Base64.getEncoder.encodeToString(pub.getEncoded),
      progressFile = java.nio.file.Files.createTempDirectory("s3-wm").resolve("p.txt").toString
    )
    val summary = IngestJob.run(spark, cfg)
    assert(summary.filesOk == 2)
    val s = store()
    assert(s.listKeys("ingest/") ==
      Seq("ingest/2024-06-01/a.json.gz.enc", "ingest/2024-06-01/empty.dat.gz.enc"))
    val k = "ingest/2024-06-01/a.json.gz.enc"
    val plain = Zlib.decompress(Envelope.decrypt(EncryptedObject(s.get(k), s.getMetadata(k)), priv))
    assert(new String(plain) == """{"v":1}""")
  }

  test("a writer killed MID-MULTIPART (between parts, and between last part and " +
    "complete) leaves no visible object; the re-run lands exactly one committed " +
    "object and the crash orphans never surface through the store contract") {
    // simulated kill: InterruptedException is outside NonFatal, so it
    // escapes the abort handler — like a SIGKILL'd/interrupted writer
    // that never runs the abort DELETE
    class SimulatedProcessKill extends InterruptedException("writer killed")
    def killingStore(killAfterPart: Int = -1, killBeforeComplete: Boolean = false) =
      new S3ObjectStore(
        server.endpoint, "us-east-1", "testbucket",
        S3Credentials("AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", Some("tok")),
        multipartThreshold = 1024, partSize = 1000) {
        override protected def onPartUploaded(key: String, partNumber: Int): Unit =
          if (partNumber == killAfterPart) throw new SimulatedProcessKill
        override protected def onBeforeComplete(key: String): Unit =
          if (killBeforeComplete) throw new SimulatedProcessKill
      }
    val data = Array.tabulate[Byte](5000)(i => (i % 251).toByte) // 5 parts
    val key = "crash/day1/file.bin.gz.enc"

    // crash window 1: between part uploads (2 of 5 parts landed)
    val orphansBefore = server.pendingUploads
    intercept[SimulatedProcessKill](killingStore(killAfterPart = 2).put(key, data, Map("iv" -> "a")))
    val orphans1 = server.pendingUploads -- orphansBefore.keySet
    assert(orphans1.values.toSeq == Seq(2), s"expected one orphan with 2 parts, got $orphans1")
    assert(!server.storedKeys.contains(key), "a crashed upload surfaced as an object")
    assert(store().listKeys("crash/") == Seq.empty, "orphaned parts visible through listKeys")
    intercept[RuntimeException](store().get(key)) // no partial object readable

    // crash window 2: after the last part, before CompleteMultipartUpload
    intercept[SimulatedProcessKill](killingStore(killBeforeComplete = true).put(key, data, Map("iv" -> "b")))
    val orphans2 = server.pendingUploads -- orphansBefore.keySet
    assert(orphans2.values.toSeq.sorted == Seq(2, 5), s"expected orphans (2,5) parts, got $orphans2")
    assert(!server.storedKeys.contains(key))
    assert(store().listKeys("crash/") == Seq.empty)

    // the re-run day: a fresh writer lands the SAME key — exactly one
    // committed object, bytes exact, metadata from the re-run, and the
    // orphans still never count against the contract
    store(threshold = 1024, part = 1000).put(key, data, Map("iv" -> "rerun"))
    assert(store().listKeys("crash/") == Seq(key), "re-run must commit exactly one object")
    assert(server.storedKeys.count(_ == key) == 1)
    assert(store().get(key).sameElements(data), "committed bytes must be the re-run's, unmixed")
    assert(store().getMetadata(key) == Map("iv" -> "rerun"))
    assert((server.pendingUploads -- orphansBefore.keySet).size == 2,
      "the re-run must not have adopted or completed the crashed uploads")
  }

  test("keys with special characters sign, store, and list correctly") {
    val s = store()
    val key = "spec ial/we ird+name (1).json.gz.enc"
    s.put(key, "v".getBytes, Map("iv" -> "q"))
    assert(new String(s.get(key)) == "v")
    assert(s.listKeys("spec ial/") == Seq(key))
  }
}
