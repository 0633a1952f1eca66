package graft.ingest

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Loopback fake of the SSM GetParameter surface (x-amz-json-1.1): checks
  * the target header, auth shape, and payload hash independently, serves
  * a rotatable parameter value, and injects errors for the provider's
  * classification/retry behavior.
  */
class FakeSsmServer {
  val value = new AtomicReference[String]("initial-key-b64")
  val fetches = new AtomicInteger()
  val failNext = new AtomicInteger() // countdown of injected 500s
  val expireNext = new AtomicReference[Boolean](false)

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => try handle(ex) finally ex.close())
  server.setExecutor(null)
  server.start()

  def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)

  private def sha256Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString

  private def send(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) { val o = ex.getResponseBody; o.write(bytes); o.close() }
  }

  private def handle(ex: HttpExchange): Unit = {
    val body = ex.getRequestBody.readAllBytes()
    val auth = ex.getRequestHeaders.getFirst("Authorization")
    val hash = ex.getRequestHeaders.getFirst("x-amz-content-sha256")
    val target = ex.getRequestHeaders.getFirst("x-amz-target")
    if (auth == null || !auth.startsWith("AWS4-HMAC-SHA256 Credential="))
      return send(ex, 400, """{"__type":"IncompleteSignature"}""")
    if (hash == null || hash != sha256Hex(body))
      return send(ex, 400, """{"__type":"InvalidSignature"}""")
    if (target != "AmazonSSM.GetParameter")
      return send(ex, 400, """{"__type":"UnknownOperationException"}""")
    if (expireNext.get())
      return send(ex, 403, """{"__type":"ExpiredTokenException","message":"The security token is expired"}""")
    if (failNext.getAndUpdate(n => math.max(0, n - 1)) > 0)
      return send(ex, 500, """{"__type":"InternalServerError"}""")
    val req = new String(body, UTF_8)
    if (!req.contains("\"WithDecryption\":true"))
      return send(ex, 400, """{"__type":"ValidationException"}""")
    fetches.incrementAndGet()
    val name = """"Name"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(req).map(_.group(1)).getOrElse("?")
    send(
      ex,
      200,
      s"""{"Parameter":{"Name":"$name","Type":"SecureString","Value":"${value.get()}","Version":1}}"""
    )
  }
}

class ParameterStoreKeyProviderSpec extends AnyFunSuite with BeforeAndAfterAll {
  private val server = new FakeSsmServer
  override def afterAll(): Unit = server.stop()

  private def provider(maxAttempts: Int = 3) = ParameterStoreKeyProvider(
    server.endpoint,
    "us-east-1",
    "/data/public_key",
    "AKIDEXAMPLE",
    "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
    sessionToken = Some("tok"),
    maxAttempts = maxAttempts,
    baseDelayMs = 1
  )

  test("fetches the decrypted parameter value and reflects rotation on the next fetch") {
    server.value.set("key-v1")
    assert(provider().wrappingKeyB64() == "key-v1")
    server.value.set("key-v2")
    assert(provider().wrappingKeyB64() == "key-v2")
  }

  test("5xx retries internally with backoff, then succeeds") {
    server.value.set("after-blip")
    server.failNext.set(2)
    assert(provider(maxAttempts = 3).wrappingKeyB64() == "after-blip")
  }

  test("5xx beyond maxAttempts raises retryable; expired token raises transient-credentials") {
    server.failNext.set(10)
    intercept[RetryableStoreException](provider(maxAttempts = 2).wrappingKeyB64())
    server.failNext.set(0)
    server.expireNext.set(true)
    try intercept[TransientCredentialsException](provider().wrappingKeyB64())
    finally server.expireNext.set(false)
  }

  test("ingest consults the parameter store per day and lands a decryptable corpus") {
    val spark = graft.SparkSpec.spark
    val (pub, priv) = Envelope.generateKeyPair()
    server.value.set(java.util.Base64.getEncoder.encodeToString(pub.getEncoded))
    server.fetches.set(0)

    val src = Files.createTempDirectory("ssm-src")
    for (day <- Seq("2024-07-01", "2024-07-02")) {
      val d = Files.createDirectories(src.resolve(day))
      Files.write(d.resolve("a.json"), s"""{"day":"$day"}""".getBytes)
    }
    val out = Files.createTempDirectory("ssm-out")
    val cfg = IngestConfig(
      srcDir = src.toString,
      storeFactory = LocalDirObjectStoreFactory(out.toString),
      s3Prefix = "audit/",
      masterKeyId = "kid",
      publicKeyB64 = "unused-when-provider-set",
      progressFile = Files.createTempDirectory("ssm-wm").resolve("p.txt").toString,
      keyProvider = Some(provider())
    )
    val summary = IngestJob.run(spark, cfg)
    assert(summary.filesOk == 2)
    assert(server.fetches.get() == 2, "expected one parameter fetch per day (the reference's per-day hoist)")

    val store = cfg.storeFactory.create()
    val k = "audit/2024-07-02/a.json.gz.enc"
    val plain = Zlib.decompress(Envelope.decrypt(EncryptedObject(store.get(k), store.getMetadata(k)), priv))
    assert(new String(plain) == """{"day":"2024-07-02"}""")
  }
}
