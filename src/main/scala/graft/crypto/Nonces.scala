package graft.crypto

/** Deterministic AEAD nonce derivation shared by every sealing site. */
object Nonces {

  /** 12-byte nonce from mix64 over (seed, producer-hash, seq): deterministic
    * (retry-idempotent at scale), with the producer mixed into the stream so
    * two producers with overlapping seq ranges under the same key can never
    * reuse a (nonce, key) pair — the AES-GCM/ChaCha20 catastrophic case.
    * Uniqueness still requires the CALLER to never reuse a seq per producer;
    * sequence numbers are monotonic in every pipeline (and replay-checked
    * downstream), which enforces exactly that. */
  def derive(nonceSeed: Long, producer: String, seq: Long): Array[Byte] = {
    val prodHash = java.nio.ByteBuffer
      .wrap(RoutingHash.sha256(producer.getBytes("UTF-8"))).getLong
    val nonce = new Array[Byte](12)
    var x = graft.dp.Mix.mix64(graft.dp.Mix.mix64(nonceSeed ^ prodHash) ^ seq)
    var i = 0
    while (i < 12) { nonce(i) = (x >>> ((i % 8) * 8)).toByte; if (i == 7) x = graft.dp.Mix.mix64(x); i += 1 }
    nonce
  }
}
