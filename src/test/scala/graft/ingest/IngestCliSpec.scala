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
    val Right(IngestCli.ParsedArgs(cfg, v2, retries, streaming)) = IngestCli.parseArgs(
      Array(
        "--src-dir", "/s", "--out-root", "/o", "--s3-prefix", "p/", "--key-id", "k",
        "--public-key-file", kf, "--progress-file", "/p.txt", "--v2-sink", "--retries", "5"
      )
    ): @unchecked
    assert(cfg.srcDir == "/s" && cfg.s3Prefix == "p/" && cfg.masterKeyId == "k")
    assert(cfg.publicKeyB64.nonEmpty && v2 && retries == 5 && streaming.isEmpty)
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

  private def baseArgs(kf: String) = Array(
    "--src-dir", "/s", "--out-root", "/o", "--key-id", "k",
    "--public-key-file", kf, "--progress-file", "/p.txt"
  )

  test("parseArgs: malformed --retries is a usage error, not an exception") {
    val Left(err) = IngestCli.parseArgs(baseArgs(keyFile()) ++ Array("--retries", "lots")): @unchecked
    assert(err.contains("--retries"))
    val Left(err2) = IngestCli.parseArgs(baseArgs(keyFile()) ++ Array("--retries", "0")): @unchecked
    assert(err2.contains("--retries"))
  }

  test("parseArgs: --aes-mode eax selects reference-parity cipher; bad mode is a usage error") {
    val Right(IngestCli.ParsedArgs(cfg, _, _, _)) =
      IngestCli.parseArgs(baseArgs(keyFile()) ++ Array("--aes-mode", "eax")): @unchecked
    assert(cfg.aesMode == Envelope.AesMode.Eax)
    val Right(IngestCli.ParsedArgs(cfg2, _, _, _)) = IngestCli.parseArgs(baseArgs(keyFile())): @unchecked
    assert(cfg2.aesMode == Envelope.AesMode.Gcm)
    val Left(err) = IngestCli.parseArgs(baseArgs(keyFile()) ++ Array("--aes-mode", "cbc")): @unchecked
    assert(err.contains("--aes-mode"))
  }

  test("parseArgs: --retries feeds both task retries and store put attempts") {
    val Right(IngestCli.ParsedArgs(cfg, _, retries, _)) =
      IngestCli.parseArgs(baseArgs(keyFile()) ++ Array("--retries", "7")): @unchecked
    assert(retries == 7 && cfg.putRetries == 7)
  }

  test("parseArgs: --streaming selects the streaming drain; exclusive with --v2-sink") {
    val Right(IngestCli.ParsedArgs(_, _, _, streaming)) =
      IngestCli.parseArgs(baseArgs(keyFile()) ++ Array("--streaming", "/ckpt")): @unchecked
    assert(streaming.contains("/ckpt"))
    val Left(err) = IngestCli.parseArgs(
      baseArgs(keyFile()) ++ Array("--streaming", "/ckpt", "--v2-sink")
    ): @unchecked
    assert(err.contains("mutually exclusive"))
  }
}
