package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, input_file_name}
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables

/** Positional phrase search: exact consecutive-sequence semantics,
  * overlapping matches, repeated phrase terms, and boundary positions. */
class PhraseSearchSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def search(docs: Seq[(Long, String)], phrase: Seq[String]) = {
    import spark.implicits._
    TextOps.phraseSearch(docs.toDF("doc_id", "text"), "doc_id", "text", phrase)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("consecutive sequence only, first position, match at the last token") {
    val out = search(Seq(
      (1L, "x slow hash batch y"),     // one match at 1
      (2L, "slow batch hash"),          // terms present, wrong order
      (3L, "slow hash x batch"),        // gap breaks the phrase
      (4L, "a b slow hash batch")),     // match ends at the LAST token
      Seq("slow", "hash", "batch"))
    assert(out === Map(1L -> ((1L, 1L)), 4L -> ((1L, 2L))))
  }

  test("overlapping occurrences all count") {
    val out = search(Seq((1L, "a a a a")), Seq("a", "a"))
    assert(out === Map(1L -> ((3L, 0L))))
  }

  test("repeated term with a distinct middle") {
    val out = search(Seq(
      (1L, "go stop go"),
      (2L, "go go stop")), Seq("go", "stop", "go"))
    assert(out === Map(1L -> ((1L, 0L))))
  }

  test("a phrase term absent from the corpus yields no matches") {
    val out = search(Seq((1L, "slow hash batch")), Seq("slow", "zz_missing"))
    assert(out.isEmpty)
  }

  test("single-term phrase counts occurrences") {
    val out = search(Seq((1L, "b a b b")), Seq("b"))
    assert(out === Map(1L -> ((3L, 0L))))
  }

  test("empty-token filtering keeps positions aligned with the oracle") {
    // double spaces produce empty split tokens; positions must count
    // only the surviving tokens
    val out = search(Seq((1L, "x  slow  hash batch")), Seq("slow", "hash", "batch"))
    assert(out === Map(1L -> ((1L, 1L))))
  }

  // ---- the maintained positional index + the index-free scan form ----

  private val trickyCorpora: Seq[(Seq[(Long, String)], Seq[String])] = Seq(
    (Seq((1L, "x slow hash batch y"), (2L, "slow batch hash"),
      (3L, "slow hash x batch"), (4L, "a b slow hash batch")),
      Seq("slow", "hash", "batch")),
    (Seq((1L, "a a a a"), (2L, "b a b")), Seq("a", "a")),
    (Seq((1L, "go stop go"), (2L, "go go stop")), Seq("go", "stop", "go")),
    (Seq((1L, "b a b b"), (2L, "")), Seq("b")),
    (Seq((1L, "x  slow  hash batch"), (2L, "short")),
      Seq("slow", "hash", "batch")))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("index-free scan form == postings form on overlaps, repeats, boundaries") {
    import spark.implicits._
    for ((docs, phrase) <- trickyCorpora) {
      val df = docs.toDF("doc_id", "text")
      val viaPostings = asMap(
        TextOps.phraseSearch(df, "doc_id", "text", phrase))
      val viaScan = asMap(
        TextOps.phraseScanMatches(df, "doc_id", "text", phrase))
      assert(viaScan === viaPostings, s"phrase=$phrase")
    }
  }

  test("maintained index: append == rebuild and delete == rebuild, row for row") {
    import spark.implicits._
    val standing = Seq((1L, "slow hash batch"), (2L, "a b c")).toDF("doc_id", "text")
    val epoch = Seq((3L, "slow hash"), (4L, "")).toDF("doc_id", "text")
    val all = standing.unionByName(epoch)
    // select by NAME: the delete's using-column anti-join moves doc_id
    // first — column names, not positions, are the index contract
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("term", "doc_id", "pos")
        .as[(String, Long, Long)].collect().toSeq.sorted
    val appended = TextOps.positionalIndexAppend(
      TextOps.positionalPostingsIndex(standing, "doc_id", "text"),
      epoch, "doc_id", "text")
    assert(rows(appended) ===
      rows(TextOps.positionalPostingsIndex(all, "doc_id", "text")))
    val deleted = TextOps.positionalIndexDelete(
      appended, Seq(1L, 999L).toDF("doc_id"), "doc_id")
    assert(rows(deleted) === rows(TextOps.positionalPostingsIndex(
      all.where(col("doc_id") =!= 1L), "doc_id", "text")))
  }

  test("indexed search == corpus search after a full maintenance cycle") {
    import spark.implicits._
    for ((docs, phrase) <- trickyCorpora) {
      val df = docs.toDF("doc_id", "text")
      val idx = TextOps.positionalPostingsIndex(df, "doc_id", "text")
      assert(asMap(TextOps.phraseIndexSearch(idx, phrase)) ===
        asMap(TextOps.phraseSearch(df, "doc_id", "text", phrase)),
        s"phrase=$phrase")
    }
  }

  test("batched multi-phrase probe == per-phrase search, phrase for phrase") {
    import spark.implicits._
    for ((docs, phrase) <- trickyCorpora) {
      val df = docs.toDF("doc_id", "text")
      val idx = TextOps.positionalPostingsIndex(df, "doc_id", "text")
      // probe the corpus phrase ALONGSIDE decoys: extra phrases in the
      // same batch must not perturb each other's results
      val phrases = Seq((7L, phrase.mkString(" ")),
        (8L, "zz_decoy_only"), (9L, phrase.head))
        .toDF("phrase_id", "ptext")
      val all = TextOps.phraseSearchAll(idx, phrases, "phrase_id", "ptext")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      val batched7 = all.collect { case ((7L, d), v) => d -> v }.toMap
      assert(batched7 === asMap(TextOps.phraseSearch(df, "doc_id", "text", phrase)),
        s"phrase=$phrase")
      val batched9 = all.collect { case ((9L, d), v) => d -> v }.toMap
      assert(batched9 ===
        asMap(TextOps.phraseSearch(df, "doc_id", "text", Seq(phrase.head))))
      assert(!all.keys.exists(_._1 == 8L), "decoy phrase must match nothing")
    }
  }

  test("stateless bulk scan == batched postings probe, row for row") {
    import spark.implicits._
    for ((docs, phrase) <- trickyCorpora) {
      val df = docs.toDF("doc_id", "text")
      val phrases = Seq((7L, phrase.mkString(" ")),
        (8L, "zz_decoy_only"), (9L, phrase.head), (10L, ""))
        .toDF("phrase_id", "ptext")
      def rows(out: org.apache.spark.sql.DataFrame) =
        out.select("phrase_id", "doc_id", "n_matches", "first_pos")
          .as[(Long, Long, Long, Long)].collect().toSet
      val viaScan = rows(TextOps.phraseScanMatchesAll(
        df, "doc_id", "text", phrases, "phrase_id", "ptext"))
      val viaJoin = rows(TextOps.phraseSearchAll(
        TextOps.positionalPostingsIndex(df, "doc_id", "text"),
        phrases, "phrase_id", "ptext"))
      assert(viaScan === viaJoin, s"phrase=$phrase")
    }
  }

  test("probing a MAINTAINED index never re-tokenizes: no Generate in the probe plan") {
    import spark.implicits._
    // materialize the index the way a deployment would (persisted table);
    // localCheckpoint cuts lineage to the corpus exactly like a re-read
    val idx = TextOps.positionalPostingsIndex(
      Seq((1L, "slow hash batch x slow hash batch")).toDF("doc_id", "text"),
      "doc_id", "text").localCheckpoint()
    val probe = TextOps.phraseIndexSearch(idx, Seq("slow", "hash", "batch"))
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"index probe must not re-explode the corpus:\n$plan")
    assert(asMap(probe) === Map(1L -> ((2L, 0L))))
  }

  test("STORED term-bucketed index: probe prunes partitions at the scan, with a read-bytes receipt") {
    // VERDICT r17 #4: the persisted form of the positional index. The
    // index is written partitionBy(term_bucket) over a REAL corpus, the
    // probe plants its phrase's bucket literals, and the scan must list
    // only those bucket directories — pinned three ways: PartitionFilters
    // in the plan, input files confined to the phrase's buckets, and an
    // on-disk byte receipt (pruned bytes ≪ index bytes).
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // a phrase that provably occurs: the first three tokens of doc 0
    val phrase = docs.where(col("doc_id") === 0L)
      .select(col("text")).head().getString(0)
      .split(" ").filter(_.nonEmpty).take(3).toSeq
    assert(phrase.size === 3)
    val idx = TextOps.positionalPostingsIndex(docs, "doc_id", "text")
    val nBuckets = 64
    val dir = s"/tmp/graft_phrase_stored_${System.nanoTime()}"
    try {
      TextOps.positionalIndexWrite(idx, dir, nBuckets)
      val stored = spark.read.parquet(dir)
      // the stored probe equals the in-memory maintained probe row for row
      val got = asMap(TextOps.phraseStoredSearch(stored, phrase, nBuckets))
      assert(got === asMap(TextOps.phraseIndexSearch(idx, phrase)))
      assert(got.nonEmpty, "the planted phrase must match its own document")
      assert(got.contains(0L))
      // plan pin: the bucket literals become PartitionFilters (pruned at
      // LISTING, before any task reads a footer)
      val buckets = phrase.distinct.map(TextOps.termBucket(_, nBuckets)).toSet
      val slice = stored.where(col("term_bucket")
        .isin(buckets.toSeq: _*) && col("term").isin(phrase.distinct: _*))
      slice.collect()
      val plan = slice.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("term_bucket"),
        s"bucket filter did not become a partition filter:\n${plan.take(1500)}")
      // every file the pruned scan touches lives in a phrase bucket dir
      val touched = slice.select(input_file_name()).distinct()
        .collect().map(_.getString(0))
      assert(touched.nonEmpty && touched.forall(f =>
        buckets.exists(b => f.contains(s"term_bucket=$b"))))
      // read-bytes receipt: bytes in the phrase's bucket dirs vs the
      // whole index on disk — with 64 buckets and ≤3 distinct terms the
      // probe should list well under a quarter of the index
      def bytesUnder(p: java.io.File): Long = {
        val fs = Option(p.listFiles).getOrElse(Array.empty)
        fs.map(f => if (f.isDirectory) bytesUnder(f)
          else if (f.getName.endsWith(".parquet")) f.length else 0L).sum
      }
      val root = new java.io.File(dir)
      val total = bytesUnder(root)
      val pruned = Option(root.listFiles).getOrElse(Array.empty)
        .filter(f => f.isDirectory &&
          buckets.exists(b => f.getName == s"term_bucket=$b"))
        .map(bytesUnder).sum
      info(f"stored index $total%d bytes; probe buckets $pruned%d bytes " +
        f"(${100.0 * pruned / total}%.1f%%)")
      assert(pruned > 0 && pruned * 4 <= total,
        s"probe must read a small fraction of the index: $pruned of $total bytes")
    } finally {
      graft.tools.CorpusMaintenance.deleteRecursively(dir)
    }
  }

  test("stored-index nBuckets marker: the tree's own bucket count is authoritative at probe time") {
    // ADVICE r18: write-time and probe-time nBuckets were independent
    // params — a mismatched probe filters on the WRONG buckets and
    // silently misses matches. The index now persists _graft_nbuckets
    // and phraseStoredSearchAt reads it, so a caller cannot mis-bucket.
    import spark.implicits._
    val docs = Seq((1L, "slow hash batch"), (2L, "slow hash"),
      (3L, "other words only")).toDF("doc_id", "text")
    val idx = TextOps.positionalPostingsIndex(docs, "doc_id", "text")
    val dir = s"/tmp/graft_nbuckets_${System.nanoTime()}"
    try {
      // written with a NON-default bucket count
      TextOps.positionalIndexWrite(idx, dir, nBuckets = 32)
      assert(TextOps.storedIndexNBuckets(spark, dir) === Some(32))
      val expect = asMap(TextOps.phraseIndexSearch(idx, Seq("slow", "hash")))
      assert(expect.keySet === Set(1L, 2L))
      // the path-based probe needs no count — the marker decides, even
      // against a WRONG caller default
      assert(asMap(TextOps.phraseStoredSearchAt(
        spark, dir, Seq("slow", "hash"), nBucketsDefault = 64)) === expect)
      // the failure mode the marker closes: probing the raw frame with
      // the wrong count CAN silently miss (demonstrated only if the
      // phrase's buckets actually differ between 32 and 64 — true here
      // for at least one term or the assertion below is vacuous)
      val differs = Seq("slow", "hash").exists(t =>
        TextOps.termBucket(t, 32) != TextOps.termBucket(t, 64))
      if (differs) {
        val wrong = asMap(TextOps.phraseStoredSearch(
          spark.read.parquet(dir), Seq("slow", "hash"), 64))
        assert(wrong !== expect,
          "expected the mis-bucketed probe to miss — the hazard the marker exists for")
      }
      // the streaming epoch writer stamps the same marker at the root
      val dir2 = s"${dir}_epochs"
      TextOps.positionalIndexEpochWrite(docs, "doc_id", "text", 0L, dir2, 16)
      assert(TextOps.storedIndexNBuckets(spark, dir2) === Some(16))
      assert(asMap(TextOps.phraseStoredSearchAt(
        spark, dir2, Seq("slow", "hash"))) === expect)
      graft.tools.CorpusMaintenance.deleteRecursively(dir2)
    } finally {
      graft.tools.CorpusMaintenance.deleteRecursively(dir)
    }
  }
}
