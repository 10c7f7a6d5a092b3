package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Property-style pins for the pure-function cores and the scan-speed
  * projections: invariants that must hold on EVERY input, not just the
  * planted gates — exact-allocation identities, EG monotonicity, PSL
  * agreement with an independent reference implementation, and URL
  * canonicalization idempotence. Cases come from seeded generators
  * (deterministic — a failure always reproduces). */
class PropertySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  // ---- egMixtureRows: exact allocation + monotonicity on any loss table ----

  private def lossTables(seed: Long, n: Int): Seq[(Seq[(String, Long)], Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val k = 1 + rnd.nextInt(24)
      val losses = (0 until k).map(i => (f"src$i%03d", rnd.nextLong(20000000L)))
      (losses, 1L + rnd.nextLong(10000000L))
    }
  }

  test("egMixtureRows: allocation sums EXACTLY to the budget for every loss table") {
    lossTables(seed = 1, n = 200).foreach { case (perSource, budget) =>
      val rows = TextOps.egMixtureRows(perSource, iterations = 8,
        tokenBudget = budget, etaPct = 50)
      assert(rows.map(_._4).sum === budget,
        s"largest-remainder allocation must be exact for $perSource budget $budget: $rows")
      assert(rows.forall(_._4 >= 0), s"no negative allocation: $rows")
      assert(rows.map(_._1) === perSource.map(_._1), "source order preserved")
    }
  }

  test("egMixtureRows: a higher-loss source never gets a smaller weight (EG monotonicity)") {
    lossTables(seed = 2, n = 200).foreach { case (perSource, budget) =>
      val rows = TextOps.egMixtureRows(perSource, iterations = 8,
        tokenBudget = budget, etaPct = 50)
      rows.sortBy(_._2).sliding(2).foreach {
        case Seq(lo, hi) =>
          assert(lo._3 <= hi._3,
            s"loss ${lo._2} got w_q6 ${lo._3} > ${hi._3} of loss ${hi._2} in $perSource")
        case _ => ()
      }
    }
  }

  // ---- registrableDomainMap vs an INDEPENDENT PSL reference ----

  /** Straight-from-the-spec reference: right-align each rule against the
    * host labels ('*' matches exactly one label; '!' rules match their
    * literal labels and surrender their leftmost); winner is
    * exception-first then most labels; default = bare TLD. */
  private def refRegistrable(host: String, rules: Seq[String]): Option[String] = {
    val hp = host.replaceAll(":\\d+$", "")
    if (hp.matches("^[0-9.]+$")) return None
    val ls = hp.split("\\.", -1).toSeq
    def matches(ruleLabels: Seq[String]): Boolean =
      ruleLabels.size <= ls.size &&
        ruleLabels.zip(ls.takeRight(ruleLabels.size)).forall {
          case ("*", _) => true
          case (r, h) => r == h
        }
    val hits = rules.flatMap { r =>
      val exc = r.startsWith("!")
      val labels = (if (exc) r.drop(1) else r).split("\\.", -1).toSeq
      if (matches(labels)) Some((if (exc) 1 else 0, labels.size,
        if (exc) labels.size - 1 else labels.size))
      else None
    }
    val ps = if (hits.isEmpty) 1
      else hits.maxBy { case (exc, n, _) => (exc, n) }._3
    if (ls.size > ps) Some(ls.takeRight(ps + 1).mkString(".")) else None
  }

  test("registrableDomainMap agrees with the independent PSL reference on random hosts") {
    import spark.implicits._
    val pool = Seq("ck", "uk", "co", "com", "org", "io", "blogspot", "github",
      "www", "a", "bb", "x7", "zz", "er", "site", "news")
    val rnd = new scala.util.Random(42)
    val hosts = (1 to 300).map { _ =>
      val n = 1 + rnd.nextInt(5)
      val h = Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString(".")
      if (rnd.nextInt(10) == 0) s"$h:${1024 + rnd.nextInt(9000)}" else h
    }.distinct
    val got = TextOps.registrableDomainMap(hosts.toDF("host"), "host")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    hosts.foreach { h =>
      val want = refRegistrable(h, TextOps.PublicSuffixRules)
      assert(got(h) === want, s"host $h: operator ${got(h)} vs reference $want")
    }
  }

  test("registrableDomainMap under the FULL packaged PSL matches the independent reference") {
    import spark.implicits._
    val full = TextOps.PublicSuffixRulesFull
    assert(full.size > 9000, s"packaged PSL unexpectedly small: ${full.size} rules")
    assert(TextOps.pslCandidateDepth(full) === 5,
      "full-list candidate depth drifted — re-check the explode bound derivation")
    // pool biased toward the list's famous families: the *.kobe.jp
    // wildcard + !city.kobe.jp exception, multi-label private-section
    // suffixes (compute.amazonaws.com), plus plain junk labels
    val pool = Seq("city", "kobe", "jp", "ide", "www", "ck", "uk", "co",
      "com", "compute", "amazonaws", "s3", "blogspot", "github", "io",
      "a", "bb", "x7")
    val rnd = new scala.util.Random(99)
    val hosts = ((1 to 250).map { _ =>
      val n = 1 + rnd.nextInt(6)
      Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString(".")
    } ++ Seq("[::1]", "[2001:db8::1]:8080", "[::ffff:192.0.2.1]",
      "192.0.2.1", "192.0.2.1:443", "city.kobe.jp", "x.city.kobe.jp",
      "other.kobe.jp", "a.b.compute.amazonaws.com")).distinct
    val got = TextOps.registrableDomainMap(hosts.toDF("host"), "host",
        rules = full)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    hosts.foreach { h =>
      // bracketed IPv6 authorities are the operator's own contract (the
      // reference's label machinery would shred IPv4-mapped forms): IP
      // literals have no registrable domain, full stop
      val want = if (h.startsWith("[")) None else refRegistrable(h, full)
      assert(got(h) === want, s"host $h: operator ${got(h)} vs reference $want")
    }
  }

  // ---- canonicalizeUrl: idempotence on arbitrary URL-ish strings ----

  test("canonicalizeUrl is idempotent: canon(canon(u)) == canon(u)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val schemes = Seq("https://", "http://", "HTTPS://", "")
    val hosts = Seq("Example.COM", "www.example.com", "a.b.co.uk:8443",
      "site.org:443", "x.io:80")
    val paths = Seq("", "/", "/a", "/a/b/", "/a//b")
    val queries = Seq("", "?b=2&a=1", "?utm_x=9&a=1", "?a=1#frag", "#only")
    val urls = (1 to 200).map { _ =>
      schemes(rnd.nextInt(schemes.size)) + hosts(rnd.nextInt(hosts.size)) +
        paths(rnd.nextInt(paths.size)) + queries(rnd.nextInt(queries.size))
    }.distinct
    val rows = urls.toDF("u")
      .select(TextOps.canonicalizeUrl(col("u")).as("c1"))
      .select(col("c1"), TextOps.canonicalizeUrl(col("c1")).as("c2"))
      .collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1),
      s"not a fixed point: '${r.getString(0)}' -> '${r.getString(1)}'"))
  }

  test("resolveLink agrees with java.net.URI.resolve on random references") {
    // independent-reference property (the registrableDomainMap pattern):
    // java.net.URI is a separate RFC implementation sharing no code with
    // the operator. Domain = dot-segment-free references of every arm
    // EXCEPT query-only ('?q'), where java follows RFC 2396 (drops the
    // last path segment) and the operator follows RFC 3986 (keeps the
    // path) — that arm is pinned by its own unit case in LinkGraphSpec.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(13)
    def seg() = s"s${rnd.nextInt(20)}"
    val cases = (1 to 300).map { _ =>
      val base = s"https://h${rnd.nextInt(5)}.example.com" +
        (0 to rnd.nextInt(3)).drop(1).map(_ => "/" + seg()).mkString +
        (if (rnd.nextBoolean()) "?a=1&b=2" else "")
      val href = rnd.nextInt(6) match {
        case 0 => s"http://ext${rnd.nextInt(9)}.org/${seg()}"
        case 1 => s"//cdn${rnd.nextInt(9)}.net/${seg()}"
        case 2 => s"/${seg()}/${seg()}"
        case 3 => s"${seg()}/${seg()}"
        case 4 => s"#f${rnd.nextInt(9)}"
        case _ => s"mailto:u${rnd.nextInt(9)}@x.org"
      }
      (base, href, java.net.URI.create(base).resolve(href).toString)
    }.distinct
    val got = cases.map { case (b, h, _) => (b, h) }.toDF("base", "href")
      .select(TextOps.resolveLink(col("base"), col("href")).as("r"))
      .as[String].collect().toSeq
    cases.zip(got).foreach { case ((b, h, expect), actual) =>
      assert(actual === expect, s"base='$b' href='$h'")
    }
  }
}
