package graft.crypto

/** AEAD-sealed value: (associated data, 12-byte nonce, ciphertext+tag).
  * Behavioral port of confidentialstorm/common/.../crypto/model/EncryptedValue.java:16-45
  * (defensive copies, nonce length validation).
  *
  * In Spark this maps to a 3-field struct of `BinaryType` columns — see
  * [[graft.operators.SealedColumns]].
  */
final class EncryptedValue(aad0: Array[Byte], nonce0: Array[Byte], ciphertext0: Array[Byte])
    extends Serializable {
  require(nonce0 != null && nonce0.length == EncryptedValue.NonceLength,
    s"nonce must be ${EncryptedValue.NonceLength} bytes")
  require(ciphertext0 != null, "ciphertext cannot be null")

  private val aadCopy = if (aad0 == null) Array.emptyByteArray else aad0.clone()
  private val nonceCopy = nonce0.clone()
  private val ctCopy = ciphertext0.clone()

  def associatedData: Array[Byte] = aadCopy.clone()
  def nonce: Array[Byte] = nonceCopy.clone()
  def ciphertext: Array[Byte] = ctCopy.clone()

  override def equals(other: Any): Boolean = other match {
    case that: EncryptedValue =>
      java.util.Arrays.equals(aadCopy, that.aadCopy) &&
        java.util.Arrays.equals(nonceCopy, that.nonceCopy) &&
        java.util.Arrays.equals(ctCopy, that.ctCopy)
    case _ => false
  }

  override def hashCode(): Int =
    31 * (31 * java.util.Arrays.hashCode(aadCopy) + java.util.Arrays.hashCode(nonceCopy)) +
      java.util.Arrays.hashCode(ctCopy)
}

object EncryptedValue {
  val NonceLength = 12
  def apply(aad: Array[Byte], nonce: Array[Byte], ciphertext: Array[Byte]): EncryptedValue =
    new EncryptedValue(aad, nonce, ciphertext)
}
