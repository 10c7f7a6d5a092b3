package graft.crypto

import java.nio.charset.StandardCharsets
import java.security.SecureRandom
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}
import scala.collection.immutable.TreeMap

/** Integrity-protected pipeline route configuration — the Spark-native form of
  * the reference's encrypted topology graph
  * (confidentialstorm/common/.../topology/EncryptedTopologyProvider.java:37-64,
  * generator confidentialstorm/host/.../tools/TopologyGraphGenerator.java:20-41).
  *
  * The graph is a forward adjacency list (source stage → ordered downstream
  * stages), canonically JSON-encoded (`{"adjacencyList":{"src":["dst",…]}}`,
  * sorted keys) and sealed with AES-256-GCM in the reference's wire format
  * `[12-byte nonce][ciphertext + 16-byte tag]`. Loading is FAIL-CLOSED: a
  * missing, truncated, tampered, or unparseable blob raises
  * `SecurityException` — route validation is never silently disabled.
  *
  * Both a forward and a reverse index are built at load time so
  * [[downstream]] and [[upstream]] are O(1) map lookups (stage names are
  * case-normalized to lowercase, as in the reference). The object is tiny
  * (stages × edges) and Serializable, so pipelines can close over it and
  * executors validate routes without any driver round trip.
  */
final class PipelineTopology private (forward: Map[String, Seq[String]]) extends Serializable {

  private val reverse: Map[String, Seq[String]] =
    forward.toSeq
      .flatMap { case (src, dsts) => dsts.map(_ -> src) }
      .groupBy(_._1)
      .map { case (dst, edges) => dst -> edges.map(_._2).sorted }

  def downstream(source: String): Seq[String] =
    forward.getOrElse(source.toLowerCase, Seq.empty)

  def upstream(destination: String): Seq[String] =
    reverse.getOrElse(destination.toLowerCase, Seq.empty)

  def isEdge(source: String, destination: String): Boolean =
    downstream(source).contains(destination.toLowerCase)

  def stages: Seq[String] =
    (forward.keySet ++ reverse.keySet).toSeq.sorted

  /** Canonical JSON: sorted sources, each destination list in declared order. */
  def toJson: String =
    TreeMap.from(forward)
      .map { case (src, dsts) =>
        s"${Aad.jsonString(src)}:${dsts.map(Aad.jsonString).mkString("[", ",", "]")}"
      }
      .mkString("{\"adjacencyList\":{", ",", "}}")

  /** Seals the graph in the reference wire format with a fresh random nonce. */
  def sealWith(key: Array[Byte]): Array[Byte] = {
    val nonce = new Array[Byte](12)
    new SecureRandom().nextBytes(nonce)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"), new GCMParameterSpec(128, nonce))
    val ct = cipher.doFinal(toJson.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Byte](12 + ct.length)
    System.arraycopy(nonce, 0, out, 0, 12)
    System.arraycopy(ct, 0, out, 12, ct.length)
    out
  }
}

object PipelineTopology {

  def apply(adjacency: (String, Seq[String])*): PipelineTopology =
    new PipelineTopology(adjacency.toMap.map { case (src, dsts) =>
      src.toLowerCase -> dsts.map(_.toLowerCase)
    })

  /** Decrypts, authenticates, and parses a sealed topology blob. Fail-closed:
    * every failure mode (short blob, bad tag, malformed JSON) becomes a
    * `SecurityException` so callers cannot accidentally proceed without
    * route validation. */
  def loadSealed(blob: Array[Byte], key: Array[Byte]): PipelineTopology =
    try {
      require(blob != null && blob.length > 12, "sealed topology too short")
      val nonce = java.util.Arrays.copyOfRange(blob, 0, 12)
      val ct = java.util.Arrays.copyOfRange(blob, 12, blob.length)
      val cipher = Cipher.getInstance("AES/GCM/NoPadding")
      cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"), new GCMParameterSpec(128, nonce))
      val json = new String(cipher.doFinal(ct), StandardCharsets.UTF_8)
      new PipelineTopology(parse(json))
    } catch {
      case e: SecurityException => throw e
      case scala.util.control.NonFatal(e) =>
        throw new SecurityException("topology load failed (tampered, truncated, or malformed)", e)
    }

  /** Parses `{"adjacencyList":{"src":["dst",…],…}}` (the only shape the
    * generator emits). Narrow by design, like the AAD's MiniJson. */
  private def parse(json: String): Map[String, Seq[String]] = {
    val s = json.trim
    var i = 0

    def fail(msg: String): Nothing = throw new IllegalArgumentException(s"$msg at $i in $json")
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = { skipWs(); if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'"); i += 1 }
    def parseString(): String = {
      skipWs()
      if (s.charAt(i) != '"') fail("expected string")
      i += 1
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case other => sb += other
          }
        } else sb += c
        i += 1
      }
      i += 1
      sb.toString()
    }

    expect('{')
    if (parseString() != "adjacencyList") fail("expected adjacencyList")
    expect(':')
    expect('{')
    val out = Map.newBuilder[String, Seq[String]]
    skipWs()
    if (i < s.length && s.charAt(i) == '}') { i += 1 }
    else {
      var done = false
      while (!done) {
        val src = parseString()
        expect(':')
        expect('[')
        val dsts = Seq.newBuilder[String]
        skipWs()
        if (s.charAt(i) == ']') i += 1
        else {
          var arrDone = false
          while (!arrDone) {
            dsts += parseString()
            skipWs()
            s.charAt(i) match {
              case ',' => i += 1
              case ']' => i += 1; arrDone = true
              case _ => fail("expected ',' or ']'")
            }
          }
        }
        out += (src.toLowerCase -> dsts.result().map(_.toLowerCase))
        skipWs()
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; done = true
          case _ => fail("expected ',' or '}'")
        }
      }
    }
    expect('}')
    out.result()
  }
}
