package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.jdk.CollectionConverters._

/** The compact bench line is parsed from the last ~2000 chars of process
  * output by the driver; these tests pin the properties that gate held
  * against for four rounds: bounded length, valid JSON, headline coverage,
  * and a total that reflects ALL successful entries (shown or omitted).
  */
class BenchReportSpec extends AnyFunSuite with Matchers {

  private val mapper = new ObjectMapper

  private def parse(line: String) = mapper.readTree(line)

  // A suite shaped like the real one: ~90 entries with realistic name
  // lengths, a handful of headline workloads, one failure.
  private val headline = Seq(
    "synthetic_dp_t20", "synthetic_dp_t20_identity_state",
    "utility_t100_reduced", "utility_t1000_reduced",
    "eager_dp_sharded_t20", "eager_dp_tws_timers_t20", "eager_dp_lazy_t20",
    "colocated_join_bucket_write", "colocated_join_plain", "colocated_join_bucketed",
    "skew_join_aqe_off", "skew_join_aqe_on",
    "microbatch_0_1gb", "microbatch_0_5gb", "microbatch_1_0gb",
    "microbatch_0_1gb_gbps", "microbatch_0_5gb_gbps", "microbatch_1_0gb_gbps")
  private val suite: Seq[(String, Double)] =
    (1 to 70).map(i => f"q_some_realistically_named_query_$i%02d" -> (i * 0.137)) ++
      headline.map(h => h -> 7.5) :+ ("q_broken_entry" -> -1.0)

  test("line fits the driver tail window and parses as JSON") {
    val line = BenchReport.compactLine(suite, headline, "/root/testdata/sf0.1")
    line.length should be <= 1800
    val node = parse(line)
    node.get("metric").asText() shouldBe "total"
    node.get("unit").asText() shouldBe "sec"
    node.get("sf").asText() shouldBe "/root/testdata/sf0.1"
  }

  test("headline workloads are always present") {
    val node = parse(BenchReport.compactLine(suite, headline, "sf"))
    val qs = node.get("queries")
    headline.foreach(h => withClue(h)(qs.has(h) shouldBe true))
  }

  test("value totals every successful entry, including omitted ones") {
    val node = parse(BenchReport.compactLine(suite, headline, "sf"))
    val expected = suite.collect { case (_, v) if v >= 0 => v }.sum
    node.get("value").asDouble() shouldBe expected +- 0.001
    node.get("n_all").asInt() shouldBe suite.count(_._2 >= 0)
    val shown = node.get("queries").size()
    node.get("omitted").asInt() shouldBe node.get("n_all").asInt() - shown
  }

  test("failed entries are listed, not silently dropped") {
    val node = parse(BenchReport.compactLine(suite, headline, "sf"))
    val failed = node.get("failed").elements().asScala.map(_.asText()).toSeq
    failed shouldBe Seq("q_broken_entry")
  }

  test("omission prefers keeping the slowest non-headline queries") {
    val node = parse(BenchReport.compactLine(suite, headline, "sf"))
    val qs = node.get("queries")
    // slowest non-headline entry (i=70) must be in; if anything was omitted
    // it should be from the fast end
    qs.has("q_some_realistically_named_query_70") shouldBe true
    if (node.get("omitted").asInt() > 0)
      qs.has("q_some_realistically_named_query_01") shouldBe false
  }

  test("eager A/B cross-check passes only when every repeat of both arms agrees") {
    // all repeats agree → no mismatch
    BenchReport.eagerMismatch(Map("sharded" -> Seq(42934L, 42934L), "tws" -> Seq(42934L, 42934L))) shouldBe None
    // arms disagree → mismatch (the r5 vacuous A/B: tws quiesced empty)
    BenchReport.eagerMismatch(Map("sharded" -> Seq(42934L), "tws" -> Seq(0L))).isDefined shouldBe true
    // one NON-FINAL repeat diverges while the last agrees → still a mismatch
    // (min-of-repeats would otherwise report the bad repeat's time)
    BenchReport.eagerMismatch(
      Map("sharded" -> Seq(42934L, 42934L), "tws" -> Seq(1000L, 42934L))).isDefined shouldBe true
    // a consistent single arm (filtered suite) or no data → nothing to flag
    BenchReport.eagerMismatch(Map("sharded" -> Seq(42934L))) shouldBe None
    BenchReport.eagerMismatch(Map.empty) shouldBe None
    // a single arm whose OWN repeats diverge IS flagged even with no second
    // arm to compare against (a filtered SPARK_GRAFT_BENCH_ONLY run must not
    // let a vacuous repeat's fast time survive as the min)
    BenchReport.eagerMismatch(Map("tws" -> Seq(1000L, 42934L))).isDefined shouldBe true
    // message names both arms with per-repeat counts
    val msg = BenchReport.eagerMismatch(Map("sharded" -> Seq(5L, 5L), "tws" -> Seq(5L, 3L))).get
    msg should include("sharded=5/5")
    msg should include("tws=5/3")
  }

  test("eager arm attribution fails the diverging arm, or all arms when undecidable") {
    // intra-arm divergence → only that arm fails
    BenchReport.eagerArmsToFail(
      Map("sharded" -> Seq(5L, 5L), "tws" -> Seq(5L, 3L))) shouldBe Set("tws")
    BenchReport.eagerArmsToFail(
      Map("sharded" -> Seq(5L, 4L), "tws" -> Seq(5L, 5L))) shouldBe Set("sharded")
    // both arms internally diverged → both fail
    BenchReport.eagerArmsToFail(
      Map("sharded" -> Seq(5L, 4L), "tws" -> Seq(5L, 3L))) shouldBe Set("sharded", "tws")
    // internally consistent but arms disagree → undecidable, all fail
    BenchReport.eagerArmsToFail(
      Map("sharded" -> Seq(5L, 5L), "tws" -> Seq(3L, 3L))) shouldBe Set("sharded", "tws")
    // agreement → nothing fails
    BenchReport.eagerArmsToFail(
      Map("sharded" -> Seq(5L, 5L), "tws" -> Seq(5L, 5L))) shouldBe Set.empty
    BenchReport.eagerArmsToFail(Map("tws" -> Seq(5L, 5L))) shouldBe Set.empty
  }

  test("a pathologically large suite still renders under the cap") {
    val big = (1 to 500).map(i => f"q_extremely_long_query_name_padding_padding_$i%03d" -> i.toDouble)
    val line = BenchReport.compactLine(big, Seq.empty, "sf")
    line.length should be <= 1800
    parse(line).get("n_all").asInt() shouldBe 500
  }

  test("real Bench suite shape stays well under the cap") {
    // mirror of the actual r4 suite size (64 queries + 21 synthetic/gbps)
    val real = (1 to 64).map(i => f"d9b_quantized_lsh_topk_alias_$i%02d" -> 2.5) ++
      headline.map(_ -> 20.0)
    val line = BenchReport.compactLine(real, headline, "/root/testdata/sf0.1")
    line.length should be <= 1800
  }

  test("committedMins: per-entry min across rounds, same-sf only, corrupt files ignored") {
    val dir = java.nio.file.Files.createTempDirectory("bench_hist").toFile
    def write(name: String, content: String): Unit =
      java.nio.file.Files.writeString(new java.io.File(dir, name).toPath, content)
    // the driver wraps this program's compact line inside "tail", after
    // arbitrary log noise and with the line terminated by a newline
    def wrap(compact: String) =
      s"""{"n": 7, "sf": 0.1, "tail": ${com.fasterxml.jackson.databind.json.JsonMapper.builder().build().writeValueAsString("some log noise\n" + compact + "\n")}}"""
    write("BENCH_r07.json", wrap(
      """{"metric":"total","value":10.0,"unit":"sec","queries":{"q_a":3.0,"q_b":9.0},"sf":"/root/testdata/sf0.1"}"""))
    write("BENCH_r08.json", wrap(
      """{"metric":"total","value":10.0,"unit":"sec","queries":{"q_a":5.0,"q_b":4.0,"q_c":1.5},"sf":"/root/testdata/sf0.1"}"""))
    // a round measured at ANOTHER sf must not contaminate the reference
    write("BENCH_r09.json", wrap(
      """{"metric":"total","value":10.0,"unit":"sec","queries":{"q_a":0.001},"sf":"/root/testdata/sf0.01"}"""))
    // corrupt history must be skipped, never fail the bench
    write("BENCH_r06.json", "{ not json at all")
    write("not_a_bench.json", """{"tail": "irrelevant"}""")
    val mins = BenchReport.committedMins(dir, "/root/testdata/sf0.1")
    mins shouldBe Map("q_a" -> 3.0, "q_b" -> 4.0, "q_c" -> 1.5)
    // no same-sf history → empty reference (drift gate simply inactive)
    BenchReport.committedMins(dir, "/root/testdata/sf9.9") shouldBe Map.empty
    BenchReport.committedMins(new java.io.File(dir, "missing"), "x") shouldBe Map.empty
  }

  test("history file round-trips a rolling window; ref is the slowest recent reading") {
    val f = java.io.File.createTempFile("bench_history", ".json")
    f.delete() // start from absent
    try {
      BenchReport.historyRefs(f, "sfA") shouldBe Map.empty
      BenchReport.updateHistory(f, "sfA", Seq("q1" -> 2.0, "q2" -> 0.4, "bad" -> -1.0))
      BenchReport.historyRefs(f, "sfA") shouldBe Map("q1" -> 2.0, "q2" -> 0.4)
      // the reference is the MAX over the window (VERDICT r17 #1): a
      // slower later sweep RAISES it; failed (-1) entries never enter;
      // other sfs are independent
      BenchReport.updateHistory(f, "sfA", Seq("q1" -> 5.0, "q2" -> 0.1, "q3" -> 1.0))
      BenchReport.updateHistory(f, "sfB", Seq("q1" -> 9.0))
      BenchReport.historyRefs(f, "sfA") shouldBe Map("q1" -> 5.0, "q2" -> 0.4, "q3" -> 1.0)
      BenchReport.historyRefs(f, "sfB") shouldBe Map("q1" -> 9.0)
      BenchReport.historyRefs(f, "sfC") shouldBe Map.empty
      // the window is bounded: after HistoryWindow more sweeps, the old
      // 5.0 outlier has aged out and the reference self-heals DOWN too
      (1 to BenchReport.HistoryWindow).foreach { _ =>
        BenchReport.updateHistory(f, "sfA", Seq("q1" -> 2.1))
      }
      BenchReport.historyRefs(f, "sfA")("q1") shouldBe 2.1
      BenchReport.historyWindows(f)("sfA")("q1") shouldBe
        Seq.fill(BenchReport.HistoryWindow)(2.1)
      // corrupt file reads as empty and a subsequent update still works
      val w = new java.io.FileWriter(f); w.write("not json"); w.close()
      BenchReport.historyRefs(f, "sfA") shouldBe Map.empty
      BenchReport.updateHistory(f, "sfA", Seq("q9" -> 1.5))
      BenchReport.historyRefs(f, "sfA") shouldBe Map("q9" -> 1.5)
      // legacy pre-r18 scalar entries read as a one-element window
      val w2 = new java.io.FileWriter(f)
      w2.write("""{"sfA": {"q_old": 3.25, "q_new": [1.0, 4.0]}}"""); w2.close()
      BenchReport.historyRefs(f, "sfA") shouldBe Map("q_old" -> 3.25, "q_new" -> 4.0)
    } finally { f.delete(); () }
  }
}
