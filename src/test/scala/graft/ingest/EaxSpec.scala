package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class EaxSpec extends AnyFunSuite {
  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def toHex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("CMAC matches RFC 4493 test vectors") {
    val cmac = new Cmac(hex("2b7e151628aed2a6abf7158809cf4f3c"))
    assert(toHex(cmac.mac(Array.emptyByteArray)) == "bb1d6929e95937287fa37d129b756746")
    assert(toHex(cmac.mac(hex("6bc1bee22e409f96e93d7e117393172a"))) == "070a16b46b4d4144f79bdd9dd04a287c")
    assert(
      toHex(cmac.mac(hex("6bc1bee22e409f96e93d7e117393172aae2d8a571e03ac9c9eb76fac45af8e5130c81c46a35ce411"))) ==
        "dfa66747de9ae63030ca32611497c827"
    )
    assert(
      toHex(
        cmac.mac(
          hex(
            "6bc1bee22e409f96e93d7e117393172aae2d8a571e03ac9c9eb76fac45af8e5130c81c46a35ce411e5fbc1191a0a52eff69f2445df4f9b17ad2b417be66c3710"
          )
        )
      ) == "51f0bebf7e3b9d92fc49741779363cfe"
    )
  }

  test("EAX matches published test vectors (EAX paper appendix)") {
    // Vector 1: empty message
    val (ct1, tag1) = Eax.encrypt(
      hex("233952DEE4D5ED5F9B9C6D6FF80FF478"),
      hex("62EC67F9C3A4A407FCB2A8C49031A8B3"),
      Array.emptyByteArray,
      hex("6BFB914FD07EAE6B")
    )
    assert(ct1.isEmpty)
    assert(toHex(tag1) == "e037830e8389f27b025a2d6527e79d01")
    // Vector 2: 2-byte message
    val (ct2, tag2) = Eax.encrypt(
      hex("91945D3F4DCBEE0BF45EF52255F095A4"),
      hex("BECAF043B0A23D843194BA972C66DEBD"),
      hex("F7FB"),
      hex("FA3BFD4806EB53FA")
    )
    assert(toHex(ct2) == "19dd")
    assert(toHex(tag2) == "5c4c9331049d0bdab0277408f67967e5")
  }

  test("EAX round-trip with and without tag verification (property)") {
    val rnd = new Random(99)
    for (_ <- 1 to 20) {
      val key = new Array[Byte](16); rnd.nextBytes(key)
      val nonce = new Array[Byte](16); rnd.nextBytes(nonce)
      val msg = new Array[Byte](rnd.nextInt(5000)); rnd.nextBytes(msg)
      val (ct, tag) = Eax.encrypt(key, nonce, msg)
      assert(Eax.decrypt(key, nonce, ct, Some(tag)).sameElements(msg))
      // the reference's discarded-tag path: decrypt without integrity
      assert(Eax.decrypt(key, nonce, ct, None).sameElements(msg))
    }
  }

  test("EAX tag verification rejects tampered ciphertext") {
    val key = new Array[Byte](16)
    val nonce = Array.fill[Byte](16)(1)
    val (ct, tag) = Eax.encrypt(key, nonce, "attack at dawn!!".getBytes)
    val tampered = ct.clone(); tampered(0) = (tampered(0) ^ 1).toByte
    assertThrows[SecurityException](Eax.decrypt(key, nonce, tampered, Some(tag)))
    // but the no-tag path (reference fidelity) decrypts garbage silently
    assert(!Eax.decrypt(key, nonce, tampered, None).sameElements("attack at dawn!!".getBytes))
  }
}
