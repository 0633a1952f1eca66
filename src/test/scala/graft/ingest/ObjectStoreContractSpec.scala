package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The seam contract every [[ObjectStore]] implementation must satisfy —
  * registered once and run against each implementation, so a future store
  * (or a change to an existing one) is held to the same behavior the
  * ingest/read paths rely on.
  */
trait ObjectStoreContract { this: AnyFunSuite =>

  /** A FRESH, empty store per invocation. */
  def newStore(): ObjectStore
  def implName: String

  test(s"$implName: put/get round-trips bytes, including empty payloads") {
    val s = newStore()
    s.put("p/a.bin", "alpha".getBytes, Map("iv" -> "x"))
    s.put("p/empty.bin", Array.emptyByteArray, Map.empty)
    assert(new String(s.get("p/a.bin")) == "alpha")
    assert(s.get("p/empty.bin").isEmpty)
  }

  test(s"$implName: metadata round-trips per key") {
    val s = newStore()
    s.put("m/a", "1".getBytes, Map("iv" -> "abc", "ciphertext" -> "def==", "datakeyencryptionkeyid" -> "kid-1"))
    s.put("m/b", "2".getBytes, Map("iv" -> "zzz"))
    assert(s.getMetadata("m/a") == Map("iv" -> "abc", "ciphertext" -> "def==", "datakeyencryptionkeyid" -> "kid-1"))
    assert(s.getMetadata("m/b") == Map("iv" -> "zzz"))
  }

  test(s"$implName: listKeys honors the prefix and returns sorted keys") {
    val s = newStore()
    for (k <- Seq("pfx/2020-01-02/b", "pfx/2020-01-01/a", "other/c", "pfx/2020-01-01/sub/d"))
      s.put(k, k.getBytes, Map.empty)
    assert(s.listKeys("pfx/") == Seq("pfx/2020-01-01/a", "pfx/2020-01-01/sub/d", "pfx/2020-01-02/b"))
    assert(s.listKeys("pfx/2020-01-01/") == Seq("pfx/2020-01-01/a", "pfx/2020-01-01/sub/d"))
    assert(s.listKeys("nope/").isEmpty)
  }

  test(s"$implName: re-put overwrites data AND metadata (idempotent at-least-once upload)") {
    val s = newStore()
    s.put("o/k", "v1".getBytes, Map("iv" -> "first"))
    s.put("o/k", "v2".getBytes, Map("iv" -> "second"))
    assert(new String(s.get("o/k")) == "v2")
    assert(s.getMetadata("o/k") == Map("iv" -> "second"))
    assert(s.listKeys("o/") == Seq("o/k"))
  }

  test(s"$implName: missing key raises on get") {
    val s = newStore()
    intercept[Exception](s.get("missing/never-put"))
  }
}

class LocalDirObjectStoreContractSpec extends AnyFunSuite with ObjectStoreContract {
  override def implName = "LocalDirObjectStore"
  override def newStore(): ObjectStore =
    new LocalDirObjectStore(Files.createTempDirectory("contract-local").toString)
}

/** The retrying decorator must be contract-transparent. */
class RetryingObjectStoreContractSpec extends AnyFunSuite with ObjectStoreContract {
  override def implName = "RetryingObjectStore(LocalDir)"
  override def newStore(): ObjectStore =
    new RetryingObjectStore(
      new LocalDirObjectStore(Files.createTempDirectory("contract-retry").toString),
      maxAttempts = 3
    )
}
