package graft.ingest

import javax.crypto.Cipher
import javax.crypto.spec.SecretKeySpec

/** AES-CMAC (OMAC1, RFC 4493) built on the JCE AES-ECB primitive — JCE
  * ships neither CMAC nor EAX, and this build is offline (SURVEY.md §7.4
  * risk 1, option (a)).
  */
final class Cmac(key: Array[Byte]) {
  private val aes = {
    val c = Cipher.getInstance("AES/ECB/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"))
    c
  }

  private def dbl(in: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16)
    var carry = 0
    var i = 15
    while (i >= 0) {
      val b = in(i) & 0xff
      out(i) = ((b << 1) | carry).toByte
      carry = (b >> 7) & 1
      i -= 1
    }
    if (carry == 1) out(15) = (out(15) ^ 0x87).toByte
    out
  }

  private val k1: Array[Byte] = dbl(aes.doFinal(new Array[Byte](16)))
  private val k2: Array[Byte] = dbl(k1)

  private def xor16(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 16) { out(i) = (a(i) ^ b(i)).toByte; i += 1 }
    out
  }

  def mac(msg: Array[Byte]): Array[Byte] = {
    val n = if (msg.length == 0) 1 else (msg.length + 15) / 16
    val lastComplete = msg.length > 0 && msg.length % 16 == 0
    var x = new Array[Byte](16)
    var i = 0
    while (i < n - 1) {
      x = aes.doFinal(xor16(x, msg.slice(i * 16, i * 16 + 16)))
      i += 1
    }
    val lastBlock =
      if (lastComplete) xor16(msg.slice((n - 1) * 16, n * 16), k1)
      else {
        val padded = new Array[Byte](16)
        val rem = msg.length - (n - 1) * 16
        System.arraycopy(msg, (n - 1) * 16, padded, 0, math.max(rem, 0))
        padded(math.max(rem, 0)) = 0x80.toByte
        xor16(padded, k2)
      }
    aes.doFinal(xor16(x, lastBlock))
  }
}

/** AES-EAX (Bellare-Rogaway-Wagner), the reference's actual cipher mode
  * (pycryptodome `AES.MODE_EAX`, audit_data_ingest.py:115): OMAC-derived
  * CTR nonce + OMAC tags over nonce/header/ciphertext.
  *
  *   N = OMAC^0(nonce); H = OMAC^1(header); C = OMAC^2(ciphertext)
  *   ciphertext = CTR_N(plaintext); tag = N xor H xor C
  *
  * The reference calls `encrypt` only — the tag is computed then DISCARDED
  * (no `encrypt_and_digest`, :120), so stored objects are CTR output
  * alone. [[encrypt]] returns both so callers can choose fidelity
  * (drop the tag) or integrity (keep it).
  */
object Eax {

  private def omac(cmac: Cmac, t: Int, msg: Array[Byte]): Array[Byte] = {
    val block = new Array[Byte](16)
    block(15) = t.toByte
    cmac.mac(block ++ msg)
  }

  private def ctr(key: Array[Byte], n: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val aes = Cipher.getInstance("AES/ECB/NoPadding")
    aes.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"))
    val out = new Array[Byte](data.length)
    val counter = n.clone()
    var off = 0
    while (off < data.length) {
      val ks = aes.doFinal(counter)
      val len = math.min(16, data.length - off)
      var i = 0
      while (i < len) { out(off + i) = (data(off + i) ^ ks(i)).toByte; i += 1 }
      // 128-bit big-endian increment
      var j = 15
      var carry = true
      while (j >= 0 && carry) {
        counter(j) = (counter(j) + 1).toByte
        carry = counter(j) == 0
        j -= 1
      }
      off += 16
    }
    out
  }

  /** Returns (ciphertext, 16-byte tag). Any nonce length (OMAC-derived). */
  def encrypt(
      key: Array[Byte],
      nonce: Array[Byte],
      plaintext: Array[Byte],
      header: Array[Byte] = Array.emptyByteArray
  ): (Array[Byte], Array[Byte]) = {
    val cmac = new Cmac(key)
    val n = omac(cmac, 0, nonce)
    val h = omac(cmac, 1, header)
    val ct = ctr(key, n, plaintext)
    val c = omac(cmac, 2, ct)
    val tag = n.indices.map(i => (n(i) ^ h(i) ^ c(i)).toByte).toArray
    (ct, tag)
  }

  /** Decrypt; verifies the tag only when one is supplied — `None` mirrors
    * the reference's discarded-tag objects (decryption without integrity).
    */
  def decrypt(
      key: Array[Byte],
      nonce: Array[Byte],
      ciphertext: Array[Byte],
      tag: Option[Array[Byte]] = None,
      header: Array[Byte] = Array.emptyByteArray
  ): Array[Byte] = {
    val cmac = new Cmac(key)
    val n = omac(cmac, 0, nonce)
    tag.foreach { t =>
      val h = omac(cmac, 1, header)
      val c = omac(cmac, 2, ciphertext)
      val expect = n.indices.map(i => (n(i) ^ h(i) ^ c(i)).toByte).toArray
      if (!java.security.MessageDigest.isEqual(expect, t))
        throw new SecurityException("EAX tag verification failed")
    }
    ctr(key, n, ciphertext)
  }
}
