package graft.crypto

import java.nio.charset.StandardCharsets
import scala.collection.immutable.TreeMap

/** Canonical AAD metadata bound to every sealed tuple: routing endpoints,
  * producer, sequence number, epoch, plus free-form attributes (e.g.
  * `user_id`). Encoded as a JSON object with keys in sorted (TreeMap) order so
  * that encode∘decode is byte-stable — the reference binds AEAD tags to this
  * exact canonical encoding (confidentialstorm/enclave/.../crypto/SealedPayload.java:189-210,
  * decode at .../crypto/aad/DecodedAAD.java:127-148).
  */
final case class Aad(
    source: Option[String] = None,
    destination: Option[String] = None,
    producerId: Option[String] = None,
    seq: Option[Long] = None,
    epoch: Option[Long] = None,
    attrs: Map[String, String] = Map.empty) {

  def isEmpty: Boolean =
    source.isEmpty && destination.isEmpty && producerId.isEmpty &&
      seq.isEmpty && epoch.isEmpty && attrs.isEmpty

  /** Canonical JSON bytes: sorted keys, no whitespace, strings escaped. */
  def toBytes: Array[Byte] = {
    if (isEmpty) return Array.emptyByteArray
    var fields = TreeMap.empty[String, String] // key -> rendered JSON value
    attrs.foreach { case (k, v) => fields += (k -> Aad.jsonString(v)) }
    source.foreach(s => fields += ("source" -> Aad.jsonString(s)))
    destination.foreach(d => fields += ("destination" -> Aad.jsonString(d)))
    producerId.foreach(p => fields += ("producer_id" -> Aad.jsonString(p)))
    seq.foreach(s => fields += ("seq" -> s.toString))
    epoch.foreach(e => fields += ("epoch" -> e.toString))
    fields.map { case (k, v) => s"${Aad.jsonString(k)}:$v" }
      .mkString("{", ",", "}")
      .getBytes(StandardCharsets.UTF_8)
  }

  def matchesSource(expected: String): Boolean = source.contains(expected)
  def matchesDestination(expected: String): Boolean = destination.contains(expected)
}

object Aad {

  /** Canonical JSON string rendering (quoted, escaped) — shared by every
    * sealing site that builds JSON payloads by hand. */
  def jsonString(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb += '"'
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb += '"'
    sb.toString()
  }

  /** Parses canonical AAD JSON produced by [[Aad.toBytes]] (flat string/number
    * object). Tolerates missing fields; unknown keys land in `attrs`. */
  def fromBytes(bytes: Array[Byte]): Aad = {
    if (bytes == null || bytes.isEmpty) return Aad()
    val json = new String(bytes, StandardCharsets.UTF_8)
    val fields = MiniJson.parseFlatObject(json)
    Aad(
      source = fields.get("source"),
      destination = fields.get("destination"),
      producerId = fields.get("producer_id"),
      seq = fields.get("seq").map(_.toLong),
      epoch = fields.get("epoch").map(_.toLong),
      attrs = fields -- Seq("source", "destination", "producer_id", "seq", "epoch"))
  }
}

/** Minimal flat-JSON-object codec for the AAD envelope (strings and integral
  * numbers only — the reference's enclave payloads use the same narrow shape,
  * EnclaveJsonUtil via ConfidentialBoltService.java:321,371). Pipeline-side
  * JSON uses Spark's `from_json`/`to_json` built-ins instead. */
private[crypto] object MiniJson {

  def parseFlatObject(json: String): Map[String, String] = {
    val s = json.trim
    require(s.startsWith("{") && s.endsWith("}"), s"not a JSON object: $json")
    var i = 1
    val out = Map.newBuilder[String, String]

    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1

    def parseString(): String = {
      require(s.charAt(i) == '"', s"expected string at $i in $json")
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
            case 'u' =>
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => sb += other
          }
        } else sb += c
        i += 1
      }
      i += 1 // closing quote
      sb.toString()
    }

    skipWs()
    if (i < s.length && s.charAt(i) == '}') return Map.empty
    var done = false
    while (!done) {
      skipWs()
      val key = parseString()
      skipWs()
      require(s.charAt(i) == ':', s"expected ':' at $i in $json")
      i += 1
      skipWs()
      val value =
        if (s.charAt(i) == '"') parseString()
        else {
          val start = i
          while (i < s.length && s.charAt(i) != ',' && s.charAt(i) != '}') i += 1
          s.substring(start, i).trim
        }
      out += (key -> value)
      skipWs()
      s.charAt(i) match {
        case ',' => i += 1
        case '}' => done = true
        case other => throw new IllegalArgumentException(s"unexpected '$other' at $i in $json")
      }
    }
    out.result()
  }
}
