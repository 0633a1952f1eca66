package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Pins the hand-rolled SigV4 implementation to AWS's PUBLISHED worked
  * examples (AWS General Reference, "Signature Version 4 signing
  * process" + the published SigV4 test suite) — the only ground truth
  * available without network access.
  */
class SigV4Spec extends AnyFunSuite {
  private val ExampleSecret = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"

  test("signing-key derivation matches the published worked example (20120215/us-east-1/iam)") {
    val k = SigV4.signingKey(ExampleSecret, "20120215", "us-east-1", "iam")
    assert(SigV4.hex(k) == "f4780e2d9f65fa895f9c67b32ce1baf0b0d8a43505a000a1a9e090d414db404d")
  }

  test("get-vanilla from the published SigV4 test suite yields the published signature") {
    // GET / against example.amazonaws.com at 20150830T123600Z, empty body.
    val emptyHash = SigV4.sha256Hex(Array.emptyByteArray)
    assert(emptyHash == "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
    val canonical = SigV4.canonicalRequest(
      "GET",
      "/",
      "",
      Seq("host" -> "example.amazonaws.com", "x-amz-date" -> "20150830T123600Z"),
      emptyHash
    )
    val toSign = SigV4.stringToSign(
      "20150830T123600Z",
      "20150830/us-east-1/service/aws4_request",
      canonical
    )
    val sig = SigV4.signature(ExampleSecret, "20150830", "us-east-1", "service", toSign)
    assert(sig == "5fa00fa31553b73ebf1942676e86291e8372ff2a2260956d9b8aae1d763fbf31")
  }

  test("uri encoding follows the AWS rules: unreserved kept, slash configurable, UTF-8 uppercase percent") {
    assert(SigV4.uriEncode("AZaz09-._~", encodeSlash = true) == "AZaz09-._~")
    assert(SigV4.uriEncode("a/b", encodeSlash = false) == "a/b")
    assert(SigV4.uriEncode("a/b", encodeSlash = true) == "a%2Fb")
    assert(SigV4.uriEncode("a b+c", encodeSlash = true) == "a%20b%2Bc")
    assert(SigV4.uriEncode("é", encodeSlash = true) == "%C3%A9") // UTF-8 bytes, uppercase hex
  }

  test("canonical query sorts by encoded name and encodes values") {
    val q = SigV4.canonicalQuery(Seq("prefix" -> "a/b c", "list-type" -> "2", "continuation-token" -> "x=="))
    assert(q == "continuation-token=x%3D%3D&list-type=2&prefix=a%2Fb%20c")
  }

  test("authorization header carries credential scope, sorted signed headers, and the signature") {
    val auth = SigV4.authorizationHeader(
      "AKIDEXAMPLE",
      "20150830/us-east-1/service/aws4_request",
      Seq("x-amz-date", "host"),
      "abc123"
    )
    assert(
      auth == "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/service/aws4_request, " +
        "SignedHeaders=host;x-amz-date, Signature=abc123"
    )
  }
}
