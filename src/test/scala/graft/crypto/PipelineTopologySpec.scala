package graft.crypto

import org.scalatest.funsuite.AnyFunSuite

/** Sealed route-topology provider tests — the reference's suite ideas from
  * TopologyGraphGeneratorTest.java (build → encrypt → decrypt → adjacency)
  * plus the fail-closed loading behavior of EncryptedTopologyProvider. */
class PipelineTopologySpec extends AnyFunSuite {

  private val key = SealedPayload.testKey
  private val topo = PipelineTopology(
    "spout" -> Seq("split"),
    "split" -> Seq("bounding", "aggregation"),
    "bounding" -> Seq("aggregation"))

  test("seal -> load roundtrips the graph") {
    val loaded = PipelineTopology.loadSealed(topo.sealWith(key), key)
    assert(loaded.downstream("spout") === Seq("split"))
    assert(loaded.downstream("split") === Seq("bounding", "aggregation"))
    assert(loaded.upstream("aggregation").sorted === Seq("bounding", "split"))
    assert(loaded.isEdge("spout", "split"))
    assert(!loaded.isEdge("split", "spout"))
    assert(loaded.stages === Seq("aggregation", "bounding", "spout", "split").sorted)
  }

  test("lookups are case-insensitive, unknown stages are empty") {
    assert(topo.isEdge("SPOUT", "Split"))
    assert(topo.upstream("AGGREGATION").nonEmpty)
    assert(topo.downstream("no-such-stage") === Seq.empty)
    assert(topo.upstream("no-such-stage") === Seq.empty)
  }

  test("canonical JSON has sorted sources and stable shape") {
    assert(topo.toJson ===
      """{"adjacencyList":{"bounding":["aggregation"],"split":["bounding","aggregation"],"spout":["split"]}}""")
  }

  test("loading is fail-closed: tamper, truncation, wrong key, garbage") {
    val blob = topo.sealWith(key)
    val flipped = blob.clone()
    flipped(blob.length - 1) = (flipped(blob.length - 1) ^ 0x1).toByte
    assertThrows[SecurityException](PipelineTopology.loadSealed(flipped, key))
    assertThrows[SecurityException](PipelineTopology.loadSealed(blob.take(8), key))
    assertThrows[SecurityException](PipelineTopology.loadSealed(null, key))
    assertThrows[SecurityException](PipelineTopology.loadSealed(blob, Array.fill[Byte](32)(1)))
    assertThrows[SecurityException](
      PipelineTopology.loadSealed(Array.fill[Byte](64)(7), key))
  }

  test("sealing uses a fresh nonce per call but decodes identically") {
    val a = topo.sealWith(key)
    val b = topo.sealWith(key)
    assert(!java.util.Arrays.equals(a, b)) // random nonce ⇒ different blobs
    assert(PipelineTopology.loadSealed(a, key).toJson ===
      PipelineTopology.loadSealed(b, key).toJson)
  }
}
