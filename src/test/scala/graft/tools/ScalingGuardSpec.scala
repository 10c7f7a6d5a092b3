package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The bench's cross-sf scaling guard (Bench.scala "scaling" block) re-times
  * the most expensive oracled gates at the 10×-smaller testdata dir; any
  * gate whose runtime ratio exceeds the 20× flag line has a super-linear
  * plan. This spec turns the flag list into a standing assertion: whenever a
  * full-suite bench.json is present in the checkout, its flag list must be
  * empty. (Skipped — not vacuously passed — when no bench has run here or
  * the run was filtered/small-sf, which omits the block.) */
class ScalingGuardSpec extends AnyFunSuite {

  test("bench scaling guard: no super-linear gates flagged") {
    val f = new java.io.File("bench.json")
    assume(f.exists, "bench.json not present (bench has not run in this checkout)")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val j = om.readTree(f)
    val sc = j.path("scaling")
    assume(!sc.isMissingNode && !sc.isNull,
      "no scaling block (filtered or small-sf bench run)")
    import scala.jdk.CollectionConverters._
    val names = sc.path("flagged").elements().asScala.map(_.asText()).toSeq
    assert(names.isEmpty, s"super-linear scaling flagged: $names")
    // the block itself must be well-formed: every measured ratio carries
    // both sides and the flag threshold matches the documented 20×
    assert(sc.path("flag_above").asDouble() === 20.0)
    val ratios = sc.path("ratios")
    assert(ratios.size() > 0, "scaling block present but measured no gates")
    ratios.properties().asScala.foreach { e =>
      assert(e.getValue.path("sf01").isNumber && e.getValue.path("sf001").isNumber,
        s"malformed scaling entry ${e.getKey}")
    }
  }
}
