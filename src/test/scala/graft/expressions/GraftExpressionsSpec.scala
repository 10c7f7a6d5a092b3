package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SealedColumns

class GraftExpressionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("DotProduct matches the higher-order-function formulation bit for bit") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.5, 2.5, -3.0), Seq(2.0, 0.5, 4.0)),
      (Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0)),
      (Seq(1e-8, 1e8, -1e-8), Seq(1e8, 1e-8, 1e8))).toDF("a", "b")
    val rows = df.select(
      GraftExpressions.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("DotProduct participates in whole-stage codegen (no fallback)") {
    // a local literal relation constant-folds to LocalTableScan; use a real
    // computed input so a codegen stage exists
    val df = spark.range(0, 100)
      .selectExpr("transform(sequence(0, 3), i -> cast(id + i as double)) AS a",
        "transform(sequence(0, 3), i -> cast(id * i as double)) AS b")
      .select(GraftExpressions.dot(col("a"), col("b")).as("d"), col("a"))
      .where(col("d") > 0)
    val plan = df.queryExecution.executedPlan.toString
    // the '*(n)' node prefix marks a whole-stage-codegen span; graft_dot must
    // sit inside one (the surrounding HOF transform stays interpreted — that
    // asymmetry is the reason this expression exists)
    assert(plan.linesIterator.exists(l => l.trim.startsWith("*(") && l.contains("graft_dot")), plan)
    assert(df.count() > 0)
  }

  test("DotProduct null propagation") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(GraftExpressions.dot(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("L2Normalize produces unit vectors and handles zero vectors") {
    import spark.implicits._
    val df = Seq(Seq(3.0, 4.0), Seq(0.0, 0.0)).toDF("a")
    val out = df.select(GraftExpressions.l2Normalize(col("a")).as("n")).collect()
    assert(out(0).getSeq[Double](0) === Seq(0.6, 0.8))
    assert(out(1).getSeq[Double](0) === Seq(0.0, 0.0))
  }

  test("MinHashShingleSigs equals the declarative aggregate form on real documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val native = graft.operators.Dedup.minHashSignatures(docs, "doc_id", "text", 3, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val agg = graft.operators.Dedup.minHashSignaturesAgg(docs, "doc_id", "text", 3, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(native.nonEmpty)
    assert(native.toSeq === agg.toSeq)
  }

  test("MinHashShingleSigs: short and empty docs yield null, split keeps empties") {
    import spark.implicits._
    val df = Seq((0L, "only two"), (1L, ""), (2L, "a  b c"), (3L, "w x y z"))
      .toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"),
      GraftExpressions.minhashShingleSigs(col("text"), 3, 8).as("sig"))
    val byId = sigs.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(byId(0L) == null, "2 tokens < k=3 has no shingles")
    assert(byId(1L) == null)
    // "a  b c" splits to [a, "", b, c] — 4 tokens, 2 shingles (empties kept,
    // matching Spark split semantics and the DuckDB oracle)
    assert(byId(2L) != null && byId(2L).length == 8)
    assert(byId(3L) != null)
  }

  test("MinHashShingleSigs participates in whole-stage codegen (no fallback)") {
    val df = spark.range(0, 50)
      .selectExpr("concat('w', id, ' x y z q') AS text")
      .select(GraftExpressions.minhashShingleSigs(col("text"), 3, 8).as("sig"))
      .where(col("sig").isNotNull)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.trim.startsWith("*(") && l.contains("graft_minhash")), plan)
    assert(df.count() === 50)
  }

  test("WindowHashArray equals the declarative transform/slice/md5 form bit for bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // real documents PLUS adversarial token layouts: empty, all-space,
    // multi-space runs (empties filtered), exactly n tokens, n-1 tokens,
    // multi-byte UTF-8, tabs/newlines inside tokens (only 0x20 splits)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (100001L, ""), (100002L, "    "), (100003L, "a  b   c d e f g h i"),
        (100004L, "one two three four five six seven eight"),
        (100005L, "one two three four five six seven"),
        (100006L, "héllo wörld 中文 tok tok tok tok tok tok"),
        (100007L, "a\tb c\nd e f g h i j k")).toDF("doc_id", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val native = rows(docs.select(col("doc_id"),
      posexplode(GraftExpressions.windowHashes(col("text"), 8)).as(Seq("pos", "h"))))
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val declarative = rows(docs.select(col("doc_id"), posexplode(
      when(size(toks) >= 8, transform(sequence(lit(0), size(toks) - 8),
          i => md5(concat_ws(" ", slice(toks, i + lit(1), lit(8))))))
        .otherwise(array().cast("array<string>"))).as(Seq("pos", "h"))))
    assert(native.nonEmpty && native === declarative)
    // interpreted == codegen (the oracle identity must not depend on path)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(rows(docs.select(col("doc_id"),
      posexplode(GraftExpressions.windowHashes(col("text"), 8)).as(Seq("pos", "h")))) === native)
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("WindowHashArray participates in whole-stage codegen (no fallback)") {
    val df = spark.range(0, 50)
      .selectExpr("concat('w', id, ' a b c d e f g h') AS text")
      .select(GraftExpressions.windowHashes(col("text"), 8).as("hs"))
      .where(org.apache.spark.sql.functions.size(col("hs")) > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.trim.startsWith("*(") && l.contains("graft_window_hashes")), plan)
    assert(df.count() === 50)
  }

  test("LuhnValid: known test cards valid, junk/transposed/non-digit false, codegen participates") {
    import spark.implicits._
    val cases = Seq(
      ("4242424242424242", true), ("4111111111111111", true),
      ("378282246310005", true),              // 15-digit Amex test number
      ("1234567890123456", false),            // sum 64 — the x19 planted ref
      ("4242424242424241", false),            // checksum digit off by one
      ("", false), ("4242a42424242424", false), ("  42", false),
      ("0", true))                            // degenerate: sum 0 ≡ 0 (mod 10)
    val got = cases.map(_._1).toDF("d")
      .select(col("d"), GraftExpressions.luhnValid(col("d")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (s, e) => assert(got(s) === e, s"'$s'") }
    // genuinely id-dependent input (arithmetic like id*0 constant-folds,
    // taking the whole expression with it): 16-digit candidates whose
    // last 3 digits vary per row, so the check must run in codegen
    val df = spark.range(50)
      .selectExpr("concat('4242424242424', lpad(cast(id as string), 3, '0')) AS d")
      .select(GraftExpressions.luhnValid(col("d")).as("v"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.trim.startsWith("*(") && l.contains("graft_luhn")), plan)
    assert(df.count() === 50)
  }

  test("SimHash32 equals the declarative 32-vote aggregate form on real documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val native = graft.operators.Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val agg = graft.operators.Dedup.simHashAgg(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(native.nonEmpty)
    assert(native.toSeq === agg.toSeq)
  }

  test("WinnowingFingerprintSet: short docs empty, sets sorted distinct") {
    import spark.implicits._
    val df = Seq((0L, "a b c d e f g"), (1L, "x y"), (2L, "")).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
        GraftExpressions.winnowingFingerprintSet(col("text"), 3, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // 7 tokens → 5 shingles → 2 windows of 4 → ≤2 distinct minima
    assert(rows(0L).nonEmpty && rows(0L).length <= 2)
    assert(rows(0L) === rows(0L).distinct.sorted)
    assert(rows(1L).isEmpty && rows(2L).isEmpty)
  }

  test("NfcNormalize: composed == decomposed after normalization; ASCII untouched; dedup merges forms") {
    import spark.implicits._
    val composed = "caf\u00e9 r\u00e9sum\u00e9"   // precomposed U+00E9
    val decomposed = "cafe\u0301 re\u0301sume\u0301"  // e + combining U+0301
    val df = Seq((0L, composed), (1L, decomposed), (2L, "plain ascii"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        GraftExpressions.nfcNormalize(col("text")).as("norm"))
    val rows = df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // both composition forms normalize to the same (composed) bytes
    assert(rows(0L)._2 === composed)
    assert(rows(1L)._2 === composed)
    assert(rows(0L)._1 !== rows(1L)._1, "fixture must start byte-distinct")
    // already-NFC text passes through unchanged
    assert(rows(2L)._2 === "plain ascii")
    // the dedup consequence: d1 keeps both forms, the NFC variant merges them
    val docs = Seq((0L, composed), (1L, decomposed)).toDF("doc_id", "text")
    assert(graft.operators.Dedup.exactDuplicateGroups(docs, "doc_id", "text").count() === 2)
    val merged = graft.operators.Dedup
      .normalizedExactDuplicateGroups(docs, "doc_id", "text").collect()
    assert(merged.length === 1 && merged.head.getLong(1) === 0L
      && merged.head.getLong(2) === 2L)
    // matches java.text.Normalizer on a mixed corpus, including Hangul
    val mixed = Seq("각", "å b̧", "ﬁxed")
    val got = mixed.toDF("t")
      .select(GraftExpressions.nfcNormalize(col("t"))).as[String].collect()
    val want = mixed.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got.toSeq === want)
  }

  test("NfcNormalize participates in whole-stage codegen (no fallback)") {
    val df = spark.range(0, 100)
      .selectExpr("concat('café doc ', cast(id as string)) AS t")
      .select(GraftExpressions.nfcNormalize(col("t")).as("n"))
      .where(length(col("n")) > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.trim.startsWith("*(") && l.contains("graft_nfc")), plan)
    assert(df.count() === 100)
  }

  test("CanonicalFold: case/punct/ligature/accent/width variants collide; digit identity kept; codegen participates") {
    import spark.implicits._
    // every row is "the same document" under the MassiveText/CCNet tier
    val variants = Seq(
      "Café—MENU!!",          // precomposed accent, em-dash, caps, punct
      "café   menu",              // decomposed accent, run of spaces
      "CAFE MENU",                      // accent absent entirely — stripping makes it match
      "cafe,menu.")
    val got = variants.toDF("t")
      .select(GraftExpressions.canonicalFold(col("t"))).as[String].collect().toSet
    assert(got === Set("cafe menu"), s"variants did not collapse: $got")
    // compat decompositions: ligature ﬁ → fi, fullwidth Ａ → a, ① → 1
    val compat = Seq("ﬁne", "Ａ ①").toDF("t")
      .select(GraftExpressions.canonicalFold(col("t"))).as[String].collect()
    assert(compat.toSeq === Seq("fine", "a 1"))
    // digits are NOT folded (5 ≠ 0 — identity, unlike CCNet retrieval norm)
    val dig = Seq("version 5", "version 0").toDF("t")
      .select(GraftExpressions.canonicalFold(col("t"))).as[String].collect()
    assert(dig.toSeq === Seq("version 5", "version 0"))
    // all-punctuation input → empty string, not a crash
    val empty = Seq("?!—…", "").toDF("t")
      .select(GraftExpressions.canonicalFold(col("t"))).as[String].collect()
    assert(empty.toSeq === Seq("", ""))
    // dedup consequence: d1 and d1b keep the variants apart, d1c merges all
    val docs = variants.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    assert(graft.operators.Dedup.exactDuplicateGroups(docs, "doc_id", "text").count() === 4)
    assert(graft.operators.Dedup.normalizedExactDuplicateGroups(docs, "doc_id", "text").count() >= 3)
    val merged = graft.operators.Dedup
      .canonicalExactDuplicateGroups(docs, "doc_id", "text").collect()
    assert(merged.length === 1 && merged.head.getLong(1) === 0L
      && merged.head.getLong(2) === 4L)
    // the ASCII-reduction property the DuckDB oracle replays: lowercase +
    // non-alphanumeric-run collapse, trimmed
    val ascii = Seq("Hello,   World!x2", " lead and trail ").toDF("t")
      .select(GraftExpressions.canonicalFold(col("t"))).as[String].collect()
    assert(ascii.toSeq === Seq("hello world x2", "lead and trail"))
    // whole-stage codegen participation (the NfcNormalize pin)
    val df = spark.range(0, 100)
      .selectExpr("concat('Café Doc ', cast(id as string)) AS t")
      .select(GraftExpressions.canonicalFold(col("t")).as("n"))
      .where(length(col("n")) > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.trim.startsWith("*(") && l.contains("graft_canon")), plan)
    assert(df.count() === 100)
  }

  test("SQL registration: graft_dot usable from spark.sql") {
    GraftExpressions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").collect()(0)
    assert(r.getDouble(0) === 11.0)
  }

  test("SQL registration: fingerprint functions match the Column API") {
    import spark.implicits._
    GraftExpressions.register(spark)
    val df = Seq((0L, "the quick brown fox jumps over the lazy dog"),
                 (1L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    df.createOrReplaceTempView("fp_docs")
    val sql = spark.sql(
      """SELECT doc_id,
        |       graft_minhash(text, 3, 16) AS sig,
        |       graft_shingle_set(text, 3) AS sh,
        |       graft_winnow(text, 3, 4) AS fp,
        |       graft_simhash(text) AS simhash
        |FROM fp_docs""".stripMargin).collect()
      .map(r => (r.getLong(0), (r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Long](3), r.getLong(4)))).toMap
    val api = df.select(col("doc_id"),
        GraftExpressions.minhashShingleSigs(col("text"), 3, 16).as("sig"),
        GraftExpressions.shingleHashSet(col("text"), 3).as("sh"),
        GraftExpressions.winnowingFingerprintSet(col("text"), 3, 4).as("fp"),
        GraftExpressions.simhash32(col("text")).as("simhash")).collect()
      .map(r => (r.getLong(0), (r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Long](3), r.getLong(4)))).toMap
    assert(sql === api)
    assert(sql(0L)._1.length === 16)
    // non-literal num-hashes argument must be rejected at analysis, fail-closed
    val err = intercept[Exception](
      spark.sql("SELECT graft_minhash(text, 3, CAST(doc_id AS INT)) FROM fp_docs").collect())
    assert(err.getMessage != null)
    // an Int-overflowing long literal must be rejected, never wrapped
    val err2 = intercept[Exception](
      spark.sql("SELECT graft_minhash(text, 3, 4294967312) FROM fp_docs").collect())
    assert(err2.getMessage != null)
  }

  test("register() and GraftSessionExtensions share one builder list covering every function") {
    // both SQL surfaces iterate GraftExpressions.sqlBuilders, so parity is
    // structural; this pins the list itself so a new expression can't be
    // registered on one surface and forgotten on the other
    assert(GraftExpressions.sqlBuilders.map(_._1) === Seq("graft_dot",
      "graft_l2_normalize", "graft_minhash", "graft_shingle_set",
      "graft_winnow", "graft_simhash", "graft_simhash60", "graft_nfc",
      "graft_canon", "graft_window_hashes", "graft_luhn"))
  }

  test("AeadUnseal expression: roundtrip, wrong route null, tampered null") {
    import spark.implicits._
    val codec = new SealedColumns.Codec(graft.crypto.SealedPayload.testKey, "aes-gcm")
    val df = Seq(("hello enclave", 7L, "p0")).toDF("text", "seq", "producer")
      .select(SealedColumns.sealColumn(col("text"), col("seq"), "spout", "split", col("producer"), codec).as("payload"))
    val ok = df.select(GraftExpressions.unseal(col("payload"),
      graft.crypto.SealedPayload.testKey, "aes-gcm", "spout", "split").as("t")).collect()(0)
    assert(ok.getString(0) === "hello enclave")
    val badRoute = df.select(GraftExpressions.unseal(col("payload"),
      graft.crypto.SealedPayload.testKey, "aes-gcm", "spout", "elsewhere")).collect()(0)
    assert(badRoute.isNullAt(0))
    val wrongKey = df.select(GraftExpressions.unseal(col("payload"),
      Array.fill[Byte](32)(9), "aes-gcm", "spout", "split")).collect()(0)
    assert(wrongKey.isNullAt(0))
  }

  test("AeadSeal expression: native both directions, stays in codegen") {
    // spark.range (not a local Seq): ConvertToLocalRelation would eval a
    // LocalRelation projection eagerly and leave no codegen span to assert on
    val df = spark.range(2)
      .select(concat(lit("msg-"), col("id")).cast("string").as("text"),
        col("id").as("seq"), concat(lit("p"), col("id")).as("producer"))
      .select(col("text"),
        GraftExpressions.seal(col("text"), col("seq"), col("producer"),
          graft.crypto.SealedPayload.testKey, "aes-gcm", "spout", "split").as("payload"))
    val round = df.select(col("text"),
      GraftExpressions.unseal(col("payload"),
        graft.crypto.SealedPayload.testKey, "aes-gcm", "spout", "split").as("back"))
    round.collect().foreach(r => assert(r.getString(0) === r.getString(1)))
    // both expressions implement doGenCode — the projection must compile
    // into a whole-stage-codegen span, not fall back to interpreted eval
    val codegenSpans = round.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty, round.queryExecution.executedPlan.toString)
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[AeadSeal]))
  }

  test("unsealForStage validates against the sealed topology graph") {
    import spark.implicits._
    val key = graft.crypto.SealedPayload.testKey
    val codec = new SealedColumns.Codec(key, "aes-gcm")
    val topo = graft.crypto.PipelineTopology.loadSealed(
      graft.crypto.PipelineTopology("spout" -> Seq("split"), "split" -> Seq("bounding"))
        .sealWith(key), key)
    val sealedDf = Seq(("route me", 1L, "p0")).toDF("text", "seq", "producer")
      .select(SealedColumns.sealColumn(col("text"), col("seq"), "spout", "split",
        col("producer"), codec).as("payload"))
    val out = sealedDf.select(
      SealedColumns.unsealForStage(col("payload"), "split", codec, topo).as("ok"),
      SealedColumns.unsealForStage(col("payload"), "bounding", codec, topo).as("wrong_stage"),
      SealedColumns.unsealForStage(col("payload"), "nowhere", codec, topo).as("unknown_stage"))
      .collect()(0)
    assert(out.getString(0) === "route me")
    assert(out.isNullAt(1)) // registered stage, but payload addressed elsewhere
    assert(out.isNullAt(2)) // stage not in graph: fail-closed
  }

  test("seal nonces are distinct across producers sharing a seq") {
    import spark.implicits._
    val codec = new SealedColumns.Codec(graft.crypto.SealedPayload.testKey, "aes-gcm")
    // same seq for every producer: without producer mixing these would all
    // reuse one (nonce, key) pair — the catastrophic GCM failure mode
    val df = (0 until 16).map(i => (s"msg-$i", 7L, s"p$i")).toDF("text", "seq", "producer")
      .select(col("text"),
        SealedColumns.sealColumn(col("text"), col("seq"), "spout", "split", col("producer"), codec).as("payload"))
    val nonces = df.select(hex(col("payload.nonce"))).collect().map(_.getString(0))
    assert(nonces.distinct.length === 16)
    val back = df.select(col("text"),
        SealedColumns.unsealColumn(col("payload"), "spout", "split", codec).as("t"))
      .collect()
    back.foreach(r => assert(r.getString(0) === r.getString(1)))
  }
}
