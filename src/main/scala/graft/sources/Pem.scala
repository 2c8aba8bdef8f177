package graft.sources

import java.security.{KeyFactory, PrivateKey}
import java.security.spec.PKCS8EncodedKeySpec
import java.util.Base64

/** Minimal PEM private-key loader for kubeconfig `client-key-data`
  * (reference semantics `ksql.js:49-51`: the key PEM is handed to the
  * TLS layer as-is; Node's OpenSSL accepts every container format, so we
  * must too). Pure JDK — no BouncyCastle:
  *
  *   - `PRIVATE KEY` (PKCS#8): direct `PKCS8EncodedKeySpec`, algorithm
  *     probed RSA → EC (the spec encodes the algorithm, KeyFactory
  *     doesn't sniff it).
  *   - `RSA PRIVATE KEY` (PKCS#1, the classic `openssl genrsa`
  *     kubeconfig key): wrapped into a PKCS#8 `PrivateKeyInfo` by
  *     prepending version + rsaEncryption AlgorithmIdentifier.
  *   - `EC PRIVATE KEY` (SEC1, `openssl ecparam -genkey`): wrapped into
  *     PKCS#8 with the named-curve OID lifted from the SEC1 body's
  *     `[0]` parameters field.
  */
object Pem {

  /** First PEM block in the bytes: (type label, DER payload). */
  def block(pem: Array[Byte]): (String, Array[Byte]) = {
    val text = new String(pem, java.nio.charset.StandardCharsets.US_ASCII)
    val re = "(?s)-----BEGIN ([A-Z0-9 ]+)-----(.*?)-----END \\1-----".r
    re.findFirstMatchIn(text) match {
      case Some(m) =>
        (m.group(1), Base64.getMimeDecoder.decode(m.group(2).trim))
      case None => sys.error("no PEM block found in key material")
    }
  }

  def privateKey(pem: Array[Byte]): PrivateKey = block(pem) match {
    case ("PRIVATE KEY", der) => pkcs8(der)
    case ("RSA PRIVATE KEY", der) => pkcs8(wrapPkcs1Rsa(der))
    case ("EC PRIVATE KEY", der) => pkcs8(wrapSec1Ec(der))
    case (other, _) => sys.error(s"unsupported private key PEM type: $other")
  }

  private def pkcs8(der: Array[Byte]): PrivateKey = {
    val spec = new PKCS8EncodedKeySpec(der)
    val attempts = Seq("RSA", "EC").iterator.map { alg =>
      try Some(KeyFactory.getInstance(alg).generatePrivate(spec))
      catch { case _: java.security.spec.InvalidKeySpecException => None }
    }
    attempts.collectFirst { case Some(k) => k }
      .getOrElse(sys.error("private key is neither RSA nor EC PKCS#8"))
  }

  // ---- DER construction helpers (definite-length encoding) ----

  private def derLen(n: Int): Array[Byte] =
    if (n < 0x80) Array(n.toByte)
    else {
      val b = BigInt(n).toByteArray.dropWhile(_ == 0)
      ((0x80 | b.length).toByte) +: b
    }

  private def tlv(tag: Int, content: Array[Byte]): Array[Byte] =
    tag.toByte +: (derLen(content.length) ++ content)

  private val versionZero: Array[Byte] = Array(0x02, 0x01, 0x00).map(_.toByte)

  /** AlgorithmIdentifier SEQ{OID 1.2.840.113549.1.1.1, NULL}. */
  private val rsaAlgId: Array[Byte] = Array(
    0x30, 0x0d, 0x06, 0x09, 0x2a, 0x86, 0x48, 0x86,
    0xf7, 0x0d, 0x01, 0x01, 0x01, 0x05, 0x00).map(_.toByte)

  /** OID 1.2.840.10045.2.1 (ecPublicKey), without AlgorithmIdentifier. */
  private val ecPublicKeyOid: Array[Byte] = Array(
    0x06, 0x07, 0x2a, 0x86, 0x48, 0xce, 0x3d, 0x02, 0x01).map(_.toByte)

  /** PKCS#1 RSAPrivateKey → PKCS#8 PrivateKeyInfo. */
  private def wrapPkcs1Rsa(pkcs1: Array[Byte]): Array[Byte] =
    tlv(0x30, versionZero ++ rsaAlgId ++ tlv(0x04, pkcs1))

  /** SEC1 ECPrivateKey → PKCS#8: the named-curve OID is pulled from the
    * SEC1 `[0]` parameters field (kubeconfig EC keys always name their
    * curve) and becomes the AlgorithmIdentifier's second element.
    */
  private def wrapSec1Ec(sec1: Array[Byte]): Array[Byte] = {
    val curveOid = findContext0Oid(sec1).getOrElse(
      sys.error("EC key has no named-curve parameter"))
    val algId = tlv(0x30, ecPublicKeyOid ++ curveOid)
    tlv(0x30, versionZero ++ algId ++ tlv(0x04, sec1))
  }

  /** Scan the top-level SEC1 SEQUENCE for the `[0]` (0xA0) element and
    * return the OID TLV inside it.
    */
  private def findContext0Oid(sec1: Array[Byte]): Option[Array[Byte]] = {
    def readLen(i: Int): (Int, Int) = {
      val first = sec1(i) & 0xff
      if (first < 0x80) (first, i + 1)
      else {
        val n = first & 0x7f
        val len = (0 until n).foldLeft(0)((acc, k) => (acc << 8) | (sec1(i + 1 + k) & 0xff))
        (len, i + 1 + n)
      }
    }
    if (sec1.isEmpty || (sec1(0) & 0xff) != 0x30) return None
    val (_, bodyStart) = readLen(1)
    var i = bodyStart
    while (i < sec1.length) {
      val tag = sec1(i) & 0xff
      val (len, contentStart) = readLen(i + 1)
      if (tag == 0xa0 && (sec1(contentStart) & 0xff) == 0x06)
        return Some(sec1.slice(contentStart, contentStart + len))
      i = contentStart + len
    }
    None
  }
}
