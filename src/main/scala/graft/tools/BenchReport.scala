package graft.tools

/** Renders the one-line compact benchmark JSON printed as the very last
  * stdout line of [[graft.Bench]].
  *
  * The driver captures only the LAST ~2000 characters of the process output
  * and parses the final line as JSON. Rounds 1–4 all failed that gate
  * (`BENCH_r0{1..4}.json` `"parsed": null`): first on sbt log decoration,
  * then — after `build.sbt` fixed that — simply on length: the full
  * per-query map grew past the tail window, so the captured text began
  * mid-line. The fix is structural, not cosmetic: the stdout line carries a
  * bounded payload and the complete result always lives in `bench.json`.
  *
  * Budgeting: the entries named in `headline` (the BASELINE.md-comparable
  * workloads — DP utility runs, eager A/B, co-location/skew A/Bs,
  * micro-batch GB/s) are emitted first, in the order given; the remaining
  * budget is filled with the slowest other queries (the ones a reader
  * triaging performance wants first). `"n_all"` and `"omitted"` say how
  * much of the suite the line covers; `"value"` is ALWAYS the total over
  * every successful entry, shown or omitted.
  */
object BenchReport {

  def r3(v: Double): String =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  /** How many failed-query names the compact line carries verbatim; the
    * rest are summarized by `"n_failed"` (always emitted), keeping the line
    * bounded even for a systemic-failure run — the exact scenario where the
    * driver most needs a parseable tail. */
  val MaxFailedNames = 8

  /** Per-entry best times across committed driver-round summaries — the
    * drift-retry reference (r9 advice #1). Each `BENCH_r*.json` wraps this
    * program's compact stdout line inside a `"tail"` string; the last
    * `{"metric":…}` line is parsed and its `"queries"` map kept ONLY when
    * its `"sf"` equals `sfDir` (numbers from another scale are not
    * comparable). Unreadable files, tails without a metric line, and
    * non-numeric entries are skipped silently — a corrupt history must
    * never fail a bench run, it just provides no reference. */
  def committedMins(dir: java.io.File, sfDir: String): Map[String, Double] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val files = Option(dir.listFiles).getOrElse(Array.empty[java.io.File])
      .filter(_.getName.matches("BENCH_r\\d+\\.json")).sortBy(_.getName)
    files.toSeq.flatMap { f =>
      try {
        val tail = om.readTree(f).path("tail").asText("")
        val start = tail.lastIndexOf("{\"metric\"")
        if (start < 0) Seq.empty[(String, Double)]
        else {
          val lineEnd = tail.indexOf('\n', start)
          val line = if (lineEnd < 0) tail.substring(start) else tail.substring(start, lineEnd)
          val j = om.readTree(line)
          if (j.path("sf").asText("") != sfDir) Seq.empty[(String, Double)]
          else {
            import scala.jdk.CollectionConverters._
            j.path("queries").properties().asScala.toSeq
              .filter(_.getValue.isNumber)
              .map(e => e.getKey -> e.getValue.asDouble())
          }
        }
      } catch { case scala.util.control.NonFatal(_) => Seq.empty[(String, Double)] }
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
  }

  /** How many recent full-sweep readings `bench_history.json` retains per
    * entry. Three sweeps ≈ three driver rounds: long enough that one noisy
    * sweep cannot dominate the reference, short enough that a box slowdown
    * ages out of the window within a round or two. */
  val HistoryWindow = 3

  /** Per-entry drift REFERENCE from the committed FULL-history file
    * (`bench_history.json`): the SLOWEST reading in the entry's
    * recent-sweeps window (VERDICT r17 #1). The pre-r18 file kept one
    * min-ever scalar per entry, which only ratcheted DOWN — a fast-phase
    * reading became a permanent reference the driver box could never
    * reproduce, burning drift retries on the same entries every round
    * (r16+r17 both blew the ≤2 budget this way). The file now keeps the
    * last [[HistoryWindow]] full-sweep readings per entry and the
    * reference is their MAX: an unreproducibly fast sweep stops being the
    * bar as soon as slower honest sweeps follow it. Real regressions are
    * multiplicative (2×+) and still clear a 1.5× gate on the slowest
    * recent reading; ordering/quality claims never lived here anyway —
    * they live in the same-sweep interleaved receipts. Legacy scalar
    * entries read as a one-element window. The compact stdout line drops
    * its smallest entries under the length cap, so [[committedMins]] alone
    * leaves those entries permanently history-less — re-run as "new" every
    * round and never drift-protected. This file keeps every entry.
    * Missing/corrupt file ⇒ empty map (history must never fail a run). */
  def historyRefs(file: java.io.File, sfDir: String): Map[String, Double] =
    historyWindows(file).getOrElse(sfDir, Map.empty)
      .collect { case (k, vs) if vs.nonEmpty => k -> vs.max }

  /** The raw per-sf windows (name → recent readings, oldest first). */
  def historyWindows(file: java.io.File)
      : Map[String, Map[String, Seq[Double]]] = {
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      import scala.jdk.CollectionConverters._
      om.readTree(file).properties().asScala.toSeq.map { sfEntry =>
        sfEntry.getKey -> sfEntry.getValue.properties().asScala.toSeq.map { e =>
          val v = e.getValue
          val window: Seq[Double] =
            if (v.isNumber) Seq(v.asDouble())
            else if (v.isArray) v.elements().asScala.toSeq
              .filter(_.isNumber).map(_.asDouble())
            else Seq.empty
          e.getKey -> window
        }.filter(_._2.nonEmpty).toMap
      }.toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  /** Append this run's successful timings to each entry's recent-sweeps
    * window in `bench_history.json` (sfDir → name → last
    * [[HistoryWindow]] readings, oldest first). Old readings age OUT —
    * the reference self-heals in both directions, unlike the pre-r18
    * min-ever ratchet (see [[historyRefs]]). Written with sorted keys for
    * stable diffs. */
  def updateHistory(file: java.io.File, sfDir: String,
      all: Seq[(String, Double)]): Unit = {
    try {
      val existing = historyWindows(file)
      val cur = existing.getOrElse(sfDir, Map.empty)
      val merged = all.filter(_._2 >= 0).foldLeft(cur) { case (m, (k, v)) =>
        m.updated(k, (m.getOrElse(k, Seq.empty) :+ v).takeRight(HistoryWindow))
      }
      val full = existing.updated(sfDir, merged)
      val sb = new StringBuilder("{\n")
      val sfs = full.keys.toSeq.sorted
      for ((sf, i) <- sfs.zipWithIndex) {
        sb.append("  \"").append(sf).append("\": {\n")
        val names = full(sf).keys.toSeq.sorted
        for ((n, j) <- names.zipWithIndex) {
          sb.append("    \"").append(n).append("\": ")
            .append(full(sf)(n).map(r3).mkString("[", ", ", "]"))
          sb.append(if (j == names.size - 1) "\n" else ",\n")
        }
        sb.append(if (i == sfs.size - 1) "  }\n" else "  },\n")
      }
      sb.append("}\n")
      // write-temp-then-rename: a kill/disk-full mid-write must never
      // truncate the committed reference (a truncated file reads as empty
      // and the next update would silently restart history from scratch)
      val tmp = new java.io.File(file.getAbsolutePath + ".tmp")
      val w = new java.io.FileWriter(tmp)
      try w.write(sb.toString()) finally w.close()
      java.nio.file.Files.move(tmp.toPath, file.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] history update failed (non-fatal): ${e.getMessage}")
    }
  }

  /** Cross-check of the eager A/B release counts, over EVERY in-run repeat
    * of both arms. Identical seeds make every run's count identical, so any
    * divergence — between arms OR between repeats of one arm — means some
    * run's quiescence guard tripped and its (vacuously fast) time cannot be
    * trusted; since the reported time is the min over repeats, one bad
    * repeat poisons the entry. A single-arm (filtered) run still flags
    * INTRA-arm repeat divergence — only the arm-vs-arm comparison needs two
    * arms. Returns a human-readable description of the divergence, or None
    * when all observed counts agree.
    */
  def eagerMismatch(counts: Map[String, Seq[Long]]): Option[String] = {
    if (eagerArmsToFail(counts).isEmpty) None
    else Some(counts.toSeq.sortBy(_._1)
      .map { case (arm, ns) => s"$arm=${ns.mkString("/")}" }.mkString(", "))
  }

  /** Which arms' timings are vacuous under a release-count divergence:
    * an arm whose OWN repeats disagree diverged itself; when every arm is
    * internally consistent but the arms disagree with each other, there is
    * no way to tell which quiesced early, so ALL reporting arms fail.
    * Empty set = all observed counts agree (nothing to fail). */
  def eagerArmsToFail(counts: Map[String, Seq[Long]]): Set[String] = {
    val internallyDiverged = counts.collect {
      case (arm, ns) if ns.distinct.size > 1 => arm
    }.toSet
    if (internallyDiverged.nonEmpty) internallyDiverged
    else if (counts.size >= 2 && counts.values.flatten.toSeq.distinct.size > 1) counts.keySet
    else Set.empty
  }

  /** Build the capped compact line.
    *
    * @param all      every (name, seconds) measurement; negative = failed
    * @param headline names that must appear in `"queries"` (when present in
    *                 `all` and successful), in this order
    * @param sfDir    the scale-factor directory the suite ran against
    * @param maxLen   hard cap on the rendered line length (chars); the
    *                 driver's tail window is 2000, so default leaves slack
    *                 for a trailing newline plus any stray shutdown chatter
    * @param runs     in-run repetitions per headline workload (each reported
    *                 time is the min over `runs` back-to-back executions)
    * @param load     1-minute system load average sampled before/after the
    *                 suite — lets a reader tell machine contamination from a
    *                 real regression (r5's numbers swung 2–6× under load)
    * @param extra    raw JSON fields (no surrounding braces/commas) appended
    *                 verbatim before `"sf"` — short, always-present
    *                 diagnostics (drift retries, scaling flags) that must
    *                 survive into the captured per-round summary; counted
    *                 against the length budget like everything else
    */
  def compactLine(
      all: Seq[(String, Double)],
      headline: Seq[String],
      sfDir: String,
      maxLen: Int = 1800,
      runs: Int = 1,
      load: Seq[Double] = Nil,
      extra: String = ""): String = {
    val ok = all.filter(_._2 >= 0)
    val okMap = ok.toMap
    val failed = all.collect { case (k, v) if v < 0 => k }
    val total = ok.map(_._2).sum

    val head = headline.filter(okMap.contains).map(k => k -> okMap(k))
    val headSet = head.map(_._1).toSet
    val rest = ok.filterNot { case (k, _) => headSet.contains(k) }
      .sortBy { case (k, v) => (-v, k) }

    def render(entries: Seq[(String, Double)]): String = {
      val qs = entries
        .map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
      val failedJson = failed.take(MaxFailedNames).map("\"" + _ + "\"").mkString("[", ",", "]")
      val loadJson =
        if (load.isEmpty) "" else s""","load":[${load.map(r3).mkString(",")}]"""
      val extraJson = if (extra.isEmpty) "" else s",$extra"
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,""" +
        s""""n_all":${ok.size},"omitted":${ok.size - entries.size},""" +
        s""""failed":$failedJson,"n_failed":${failed.size},"runs":$runs$loadJson$extraJson,"sf":"$sfDir"}"""
    }

    // Greedy fill: headline first (dropped from the tail only if even they
    // overflow), then slowest-first for the rest.
    var kept = head
    while (kept.nonEmpty && render(kept).length > maxLen) kept = kept.init
    var line = render(kept)
    for (e <- rest) {
      val candidate = render(kept :+ e)
      if (candidate.length <= maxLen) { kept = kept :+ e; line = candidate }
    }
    line
  }
}
