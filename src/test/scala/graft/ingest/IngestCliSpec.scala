package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.Base64

class IngestCliSpec extends AnyFunSuite {
  private def keyFile(): String = {
    val (pub, _) = Envelope.generateKeyPair()
    val f = Files.createTempDirectory("cli").resolve("key.b64")
    Files.write(f, Base64.getEncoder.encodeToString(pub.getEncoded).getBytes)
    f.toString
  }

  test("parseArgs: full happy path") {
    val kf = keyFile()
    val Right((cfg, v2, retries)) = IngestCli.parseArgs(
      Array(
        "--src-dir", "/s", "--out-root", "/o", "--s3-prefix", "p/", "--key-id", "k",
        "--public-key-file", kf, "--progress-file", "/p.txt", "--v2-sink", "--retries", "5"
      )
    ): @unchecked
    assert(cfg.srcDir == "/s" && cfg.s3Prefix == "p/" && cfg.masterKeyId == "k")
    assert(cfg.publicKeyB64.nonEmpty && v2 && retries == 5)
  }

  test("parseArgs: missing required options named in the error") {
    val Left(err) = IngestCli.parseArgs(Array("--src-dir", "/s")): @unchecked
    assert(err.contains("--out-root") && err.contains("--key-id") && err.contains("--progress-file"))
  }

  test("parseArgs: missing key file reported") {
    val Left(err) = IngestCli.parseArgs(
      Array("--src-dir", "/s", "--out-root", "/o", "--key-id", "k",
        "--public-key-file", "/nope/gone.b64", "--progress-file", "/p.txt")
    ): @unchecked
    assert(err.contains("not found"))
  }

  test("parseArgs: stray positional rejected") {
    val Left(err) = IngestCli.parseArgs(Array("oops")): @unchecked
    assert(err.contains("Unexpected"))
  }
}
