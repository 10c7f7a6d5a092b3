package graft.crypto

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** SHA-256 routing-key derivation with a thread-local digest — reference
  * confidentialstorm/enclave/.../crypto/Hash.java:15-33; key prefixes
  * "word:"/"user:" from AbstractUserContributionBoundingServiceProvider.java:103-105
  * and SplitSentenceServiceProvider.java:79-80.
  *
  * The Spark engine shuffles by key directly (`groupBy` hashes internally),
  * so routing hashes are only needed for reference-parity outputs — exposed
  * in SQL as `sha2(concat('word:', key), 256)` which matches this byte-wise.
  */
object RoutingHash {
  private val digest = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("SHA-256"))

  def sha256(data: Array[Byte]): Array[Byte] = {
    val d = digest.get()
    d.reset()
    d.digest(data)
  }

  def sha256Hex(s: String): String =
    sha256(s.getBytes(StandardCharsets.UTF_8)).map(b => f"$b%02x").mkString

  def wordRoutingKey(word: String): Array[Byte] =
    sha256(s"word:$word".getBytes(StandardCharsets.UTF_8))

  def userRoutingKey(userId: String): Array[Byte] =
    sha256(s"user:$userId".getBytes(StandardCharsets.UTF_8))
}
