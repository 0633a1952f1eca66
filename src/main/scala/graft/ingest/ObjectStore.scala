package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Minimal object-store abstraction for the sink side of the pipeline.
  *
  * The reference uploads via boto3 `upload_fileobj` with a user-metadata
  * map (audit_data_ingest.py:177-183). This trait is the seam where an AWS
  * SDK v2 S3 client would plug in on a real cluster; the zero-egress test
  * environment uses [[LocalDirObjectStore]]. Implementations must be
  * usable from executor tasks (constructed per partition via
  * [[ObjectStoreFactory]] — clients are not serializable).
  */
trait ObjectStore {
  def put(key: String, data: Array[Byte], metadata: Map[String, String]): Unit
  def listKeys(prefix: String): Seq[String]
  def get(key: String): Array[Byte]
  def getMetadata(key: String): Map[String, String]
}

/** Serializable factory shipped in task closures; one client per partition,
  * mirroring one boto3 client per worker thread (audit_data_ingest.py:190-197).
  */
trait ObjectStoreFactory extends Serializable {
  def create(): ObjectStore
}

/** Expected-transient failure — the analog of the reference's
  * `ExpiredTokenException` (audit_data_ingest.py:303-308): ambient
  * credentials expired mid-run. Deliberately NOT retried by
  * [[RetryingObjectStore]] (backoff cannot refresh credentials); it
  * propagates to [[IngestCli]], which maps it to a clean warn-and-exit so
  * the scheduler retries the whole run, exactly like the reference.
  */
class TransientCredentialsException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** Failure a store implementation has classified as retryable (throttling,
  * 5xx, connection reset — what boto3's standard mode calls a "transient
  * error"). [[RetryingObjectStore]] retries ONLY this class and raw
  * IO-shaped failures; anything else (bad key, serialization bug,
  * programming error) is permanent and surfaces on the first attempt
  * instead of burning `maxAttempts` sleeps per file.
  */
class RetryableStoreException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** Retry-with-exponential-backoff decorator over any [[ObjectStore]] —
  * the SDK-level retry policy the reference configures on its boto3
  * client (`retries={'max_attempts': retries, 'mode': 'standard'}`,
  * audit_data_ingest.py:190-197), applied at the store seam so a flaky
  * put costs a short sleep instead of burning a whole Spark task attempt.
  *
  * Error classification mirrors the standard mode: retry on
  * [[RetryableStoreException]] and `java.io.IOException`-shaped causes
  * (network-ish), never on [[TransientCredentialsException]] (backoff
  * cannot refresh credentials), and never on anything else — a
  * deterministic failure fails fast.
  */
class RetryingObjectStore(inner: ObjectStore, maxAttempts: Int, baseDelayMs: Long = 50)
    extends ObjectStore {
  require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")

  /** boto3-standard-style classifier: walk the cause chain looking for an
    * explicitly-retryable marker or an IO failure.
    */
  private def isRetryable(e: Throwable): Boolean = {
    var cur = e
    while (cur != null) {
      cur match {
        case _: TransientCredentialsException => return false
        case _: RetryableStoreException => return true
        case _: java.io.IOException => return true
        case _ => cur = cur.getCause
      }
    }
    false
  }

  private def retry[T](op: => T): T = {
    var attempt = 1
    while (true) {
      try return op
      catch {
        case e: TransientCredentialsException => throw e
        case e: Throwable if attempt < maxAttempts && isRetryable(e) =>
          // standard-mode-style capped exponential backoff
          Thread.sleep(math.min(baseDelayMs << (attempt - 1), 5000L))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def put(key: String, data: Array[Byte], metadata: Map[String, String]): Unit =
    retry(inner.put(key, data, metadata))
  override def listKeys(prefix: String): Seq[String] = retry(inner.listKeys(prefix))
  override def get(key: String): Array[Byte] = retry(inner.get(key))
  override def getMetadata(key: String): Map[String, String] = retry(inner.getMetadata(key))
}

final case class RetryingObjectStoreFactory(
    inner: ObjectStoreFactory,
    maxAttempts: Int,
    baseDelayMs: Long = 50
) extends ObjectStoreFactory {
  override def create(): ObjectStore = new RetryingObjectStore(inner.create(), maxAttempts, baseDelayMs)
}

/** Filesystem-backed object store: key -> file under a root dir, metadata
  * as a `<key>.metadata.json` sidecar. Keys may contain `/` (the layout
  * `{prefix}{day}/{basename}.gz.enc`, audit_data_ingest.py:173).
  */
class LocalDirObjectStore(root: String) extends ObjectStore {
  private val rootPath = Paths.get(root)

  private def dataPath(key: String): Path = rootPath.resolve(key)
  private def metaPath(key: String): Path = rootPath.resolve(key + ".metadata.json")

  override def put(key: String, data: Array[Byte], metadata: Map[String, String]): Unit = {
    val p = dataPath(key)
    Files.createDirectories(p.getParent)
    Files.write(p, data)
    Files.write(metaPath(key), JsonMini.render(metadata).getBytes(StandardCharsets.UTF_8))
  }

  override def listKeys(prefix: String): Seq[String] = {
    if (!Files.exists(rootPath)) return Seq.empty
    Files
      .walk(rootPath)
      .iterator()
      .asScala
      .filter(p => Files.isRegularFile(p) && !p.toString.endsWith(".metadata.json"))
      .map(p => rootPath.relativize(p).toString)
      .filter(_.startsWith(prefix))
      .toSeq
      .sorted
  }

  override def get(key: String): Array[Byte] = Files.readAllBytes(dataPath(key))

  override def getMetadata(key: String): Map[String, String] =
    JsonMini.parseFlat(new String(Files.readAllBytes(metaPath(key)), StandardCharsets.UTF_8))
}

final case class LocalDirObjectStoreFactory(root: String) extends ObjectStoreFactory {
  override def create(): ObjectStore = new LocalDirObjectStore(root)
}

/** Tiny flat string-map JSON (metadata sidecars only; no external deps). */
private[ingest] object JsonMini {
  def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def render(m: Map[String, String]): String =
    m.toSeq.sorted.map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }.mkString("{", ", ", "}")

  /** Parse a flat {"k":"v",...} object (only what render emits). */
  def parseFlat(s: String): Map[String, String] = {
    val pat = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    pat
      .findAllMatchIn(s)
      .map(m => unesc(m.group(1)) -> unesc(m.group(2)))
      .toMap
  }

  def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'u' =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}
