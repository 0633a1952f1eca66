package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

/** A store whose put fails the first `failFirst` attempts per key with a
  * retryable (throttling-style) error.
  */
final class FlakyStore(root: String, failFirst: Int) extends LocalDirObjectStore(root) {
  val attempts = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
  override def put(key: String, data: Array[Byte], metadata: Map[String, String]): Unit = {
    val n = attempts.computeIfAbsent(key, _ => new AtomicInteger(0)).incrementAndGet()
    if (n <= failFirst) throw new RetryableStoreException(s"flaky failure #$n for $key")
    super.put(key, data, metadata)
  }
}

class RetrySpec extends AnyFunSuite {
  private def root() = Files.createTempDirectory("retry-store").toString

  test("flaky store succeeds once attempts exceed the failure count (boto3 max_attempts analog)") {
    val flaky = new FlakyStore(root(), failFirst = 2)
    val store = new RetryingObjectStore(flaky, maxAttempts = 3, baseDelayMs = 1)
    store.put("k", "v".getBytes, Map("m" -> "1"))
    assert(flaky.attempts.get("k").get() == 3)
    assert(new String(store.get("k")) == "v")
  }

  test("attempts below the failure count exhaust retries and propagate the last error") {
    val flaky = new FlakyStore(root(), failFirst = 5)
    val store = new RetryingObjectStore(flaky, maxAttempts = 3, baseDelayMs = 1)
    val e = intercept[RetryableStoreException](store.put("k", "v".getBytes, Map.empty))
    assert(e.getMessage.contains("flaky failure #3"))
  }

  test("permanent (non-retryable) error surfaces on attempt 1 with no retries") {
    val calls = new AtomicInteger(0)
    val broken = new LocalDirObjectStore(root()) {
      override def put(key: String, data: Array[Byte], metadata: Map[String, String]): Unit = {
        calls.incrementAndGet()
        throw new IllegalArgumentException("bad key: deterministic bug")
      }
    }
    val store = new RetryingObjectStore(broken, maxAttempts = 5, baseDelayMs = 1)
    intercept[IllegalArgumentException](store.put("k", "v".getBytes, Map.empty))
    assert(calls.get() == 1)
  }

  test("IOException anywhere in the cause chain IS retried (network-shaped failure)") {
    val calls = new AtomicInteger(0)
    val netFlaky = new LocalDirObjectStore(root()) {
      override def put(key: String, data: Array[Byte], metadata: Map[String, String]): Unit = {
        if (calls.incrementAndGet() == 1)
          throw new RuntimeException("wrapped", new java.io.IOException("connection reset"))
        super.put(key, data, metadata)
      }
    }
    val store = new RetryingObjectStore(netFlaky, maxAttempts = 3, baseDelayMs = 1)
    store.put("k", "v".getBytes, Map.empty)
    assert(calls.get() == 2)
  }

  test("TransientCredentialsException is NOT retried — it propagates immediately") {
    val calls = new AtomicInteger(0)
    val expiring = new LocalDirObjectStore(root()) {
      override def put(key: String, data: Array[Byte], metadata: Map[String, String]): Unit = {
        calls.incrementAndGet()
        throw new TransientCredentialsException("token expired")
      }
    }
    val store = new RetryingObjectStore(expiring, maxAttempts = 5, baseDelayMs = 1)
    intercept[TransientCredentialsException](store.put("k", "v".getBytes, Map.empty))
    assert(calls.get() == 1)
  }

  test("IngestCli.isTransient finds the class anywhere in a wrapped cause chain") {
    val inner = new TransientCredentialsException("expired")
    val wrapped = new RuntimeException("job aborted", new RuntimeException("stage failed", inner))
    assert(IngestCli.isTransient(wrapped))
    assert(!IngestCli.isTransient(new RuntimeException("plain failure")))
  }
}
