package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, Tables}

/** Semantics of the r9 curation operators — each checked against an
  * independent single-node Scala replica over the real sf0.001 documents,
  * the same style as the MinHash/SimHash replica specs: the distributed
  * form and a from-scratch local computation must agree row-for-row. */
class CurationSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

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

  private def tokens(text: String): Array[String] =
    text.split(" ").filter(_.nonEmpty)

  test("perGroupMedianFilter keeps exactly the upper half per group (single-node replica)") {
    val scored = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"),
      TextOps.qualityCol(col("text")).as("quality"))
    val got = CoreOps.perGroupMedianFilter(scored, "source", "quality")
      .select("doc_id", "source", "quality")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

    val all = scored.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val want = all.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.map(_._3).sorted
      val thr = sorted(((sorted.length + 1) / 2) - 1) // 1-based rank (n+1) div 2
      rows.filter(_._3 >= thr)
    }.toSet
    assert(got === want)
    // every group must keep at least half its rows (>= median is inclusive)
    val keptBySource = got.groupBy(_._2).view.mapValues(_.size)
    val totBySource = all.groupBy(_._2).view.mapValues(_.size)
    for ((s, tot) <- totBySource)
      assert(keptBySource.getOrElse(s, 0) * 2 >= tot, s"group $s kept under half")
  }

  test("splitLeakage equals a brute-force window-set intersection (single-node replica)") {
    val n = 8
    val split = CoreOps.hashSplit(Tables.documents(spark, sfDir), "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val got = Dedup.splitLeakage(
        split.where(col("split") === "train"), split.where(col("split") === "test"),
        "doc_id", "text", n)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val rows = split.select("doc_id", "text", "split").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def windows(text: String): Seq[String] =
      tokens(text).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
    val trainWins = rows.filter(_._3 == "train").flatMap(r => windows(r._2)).toSet
    val want = rows.filter(_._3 == "test").map { case (id, text, _) =>
      val ws = windows(text)
      id -> (ws.length.toLong, ws.count(trainWins.contains).toLong)
    }.toMap
    assert(got === want)
    // the gate is only meaningful if both leaked and clean docs exist
    assert(want.values.exists(_._2 > 0L) || want.values.forall(_._2 == 0L))
  }

  test("balancedShards: round-robin over the size order, near-equal shard token sums") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
    val got = CoreOps.balancedShards(docs, "doc_id", "n_tok", shards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // replica: rank ascending by (n_tokens, doc_id), deal % 8
    val want = got.map(t => (t._1, t._2)).sortBy { case (id, n) => (n, id) }
      .zipWithIndex.map { case ((id, n), i) => (id, n, (i % 8)) }.toSet
    assert(got.toSet === want)
    // balance: size-sorted round-robin keeps shard token sums within the
    // largest document of each other
    val sums = got.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    val maxDoc = got.map(_._2).max
    assert(sums.values.max - sums.values.min <= maxDoc,
      s"shard sums spread ${sums.values.max - sums.values.min} exceeds max doc $maxDoc")
  }

  test("semanticOutliers: selected vectors dominate their cluster's unselected by (dist2, id)") {
    val assigned = Similarity.kmeansAssign(Tables.embeddings(spark, sfDir))
      .select("vec_id", "cluster", "dist2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val got = Similarity.semanticOutliers(Tables.embeddings(spark, sfDir), k = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    for ((cluster, members) <- assigned.groupBy(_._2)) {
      val sel = got.filter(_._1 == cluster)
      assert(sel.length === math.min(3, members.length))
      // replica: top-3 by (dist2 desc, vec_id asc)
      val want = members.sortBy(m => (-m._3, m._1)).take(3).map(m => (m._1, m._3)).toSeq
      assert(sel.sortBy(_._2).map(s => (s._3, s._4)).toSeq === want)
    }
  }

  test("snapshotDiff recovers exactly the applied delta (single-node replica)") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val oldSnap = docs.where(col("doc_id") % 13 =!= 0)
    val newSnap = docs.where(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(lit("updated-"), col("doc_id").cast("string")))
          .otherwise(col("text")).as("text"))
    val got = CoreOps.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    for (id <- ids) {
      val inOld = id % 13 != 0
      val inNew = id % 11 != 0
      val want =
        if (inOld && !inNew) Some("removed")
        else if (!inOld && inNew) Some("added")
        else if (inOld && inNew) Some(if (id % 7 == 0) "changed" else "unchanged")
        else None
      assert(got.get(id) === want, s"doc $id")
    }
    assert(got.size === ids.count(id => id % 13 != 0 || id % 11 != 0))
    // all four statuses must actually occur at this scale
    assert(got.values.toSet === Set("added", "removed", "changed", "unchanged"))
  }

  test("e2e_asset_text_pairs: pairs = phash-canonical assets ∩ quality-kept captions") {
    val pairs = SparkEntry.queries("e2e_asset_text_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // asset side: each surviving doc is its phash group's min id
    val hashes = Multimodal.perceptualHash(
        Multimodal.syntheticPatternImageAssets(spark, Tables.documents(spark, sfDir)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val canon = hashes.groupBy(_._2).map { case (h, m) => h -> m.map(_._1).min }
    // caption side: the median-kept set
    val kept = CoreOps.perGroupMedianFilter(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("source"),
          TextOps.qualityCol(col("text")).as("quality")), "source", "quality")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = canon.values.filter(kept.contains).toSet
    assert(pairs.map(_._1).toSet === want)
    for ((id, h) <- pairs) assert(canon(h) === id)
  }

  test("semanticCuration: outliers removed, survivors canonical, cap respected") {
    val emb = Tables.embeddings(spark, sfDir)
    val curated = Similarity.semanticCuration(emb, threshold = 0.4,
        outlierK = 3, capPerCluster = 10L)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(curated.nonEmpty)
    // cap: at most 10 per cluster
    assert(curated.groupBy(_._1).values.forall(_.length <= 10))
    // outliers: none of the 3 farthest-per-cluster vectors may survive
    val outliers = Similarity.semanticOutliers(emb, k = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(curated.map(_._2).forall(id => !outliers.contains(id)),
      "an outlier survived curation")
    // cluster labels must match the shared full-corpus assignment
    val assign = Similarity.kmeansAssign(emb)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((c, id) <- curated) assert(assign(id) === c)
  }

  test("e2e_training_manifest: packing is gapless and phases are near-equal in curriculum order") {
    val m = SparkEntry.queries("e2e_training_manifest")(spark, sfDir)
      .select("doc_id", "phase", "avg_nll", "n_tokens", "tok_start", "chunk_start", "chunk_end")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(m.nonEmpty)
    // tok_start is the exact prefix sum in (phase, avg_nll, doc_id) order
    val ordered = m.sortBy(t => (t._2, t._3, t._1))
    var acc = 0L
    for ((id, _, _, nTok, tokStart, cs, ce) <- ordered) {
      assert(tokStart === acc, s"doc $id tok_start $tokStart != running sum $acc")
      assert(cs === tokStart / 128)
      assert(ce === (if (nTok == 0) cs else (tokStart + nTok - 1) / 128))
      acc += nTok
    }
    // NTILE remainder semantics: phase sizes differ by at most 1 and are ordered
    val sizes = m.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.keySet === (1 to 4).toSet)
    assert(sizes.values.max - sizes.values.min <= 1)
    // curriculum order: max difficulty of phase k <= min difficulty of phase k+1
    for (k <- 1 to 3) {
      val hi = m.filter(_._2 == k).map(_._3).max
      val lo = m.filter(_._2 == k + 1).map(_._3).min
      assert(hi <= lo, s"phase $k difficulty overlaps phase ${k + 1}")
    }
  }

  test("boilerplate strip: df test fires on corpus-repeated chrome, never self-repetition") {
    import spark.implicits._
    val chrome = "nav home about contact privacy terms login search" // 8 tokens
    val docs = Seq(
      (0L, s"$chrome alpha beta gamma delta epsilon zeta eta theta"),
      (1L, s"$chrome iota kappa lambda mu nu xi omicron pi"),
      (2L, s"$chrome rho sigma tau upsilon phi chi psi omega"),
      // doc 3 repeats ITS OWN 8-token refrain twice — high occurrence
      // count, but document frequency 1: must NOT be stripped
      (3L, "spam spam spam spam spam spam spam spam " +
        "spam spam spam spam spam spam spam spam unique tail words here"))
      .toDF("doc_id", "text")
    val out = Dedup.stripBoilerplate(docs, "doc_id", "text", n = 8, minDocFrequency = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) === "alpha beta gamma delta epsilon zeta eta theta")
    assert(out(1L) === "iota kappa lambda mu nu xi omicron pi")
    assert(out(2L) === "rho sigma tau upsilon phi chi psi omega")
    // self-repetition survives intact (whitespace-normalized round-trip)
    assert(out(3L) === "spam spam spam spam spam spam spam spam " +
      "spam spam spam spam spam spam spam spam unique tail words here")
    // sanity: duplicateSpans WOULD have flagged doc 3 (occurrence >= 2)
    val occSpans = Dedup.duplicateSpans(docs, "doc_id", "text", n = 8, minOccurrences = 2)
      .where(col("doc_id") === 3L).count()
    assert(occSpans > 0)
  }

  test("blockDedup: first occurrence survives corpus-wide (incl. within-doc), later copies cut") {
    import spark.implicits._
    // 4-token blocks for a readable fixture
    val blockA = "w1 w2 w3 w4"
    val blockB = "x1 x2 x3 x4"
    val docs = Seq(
      (0L, s"$blockA u1 u2 u3 u4"),          // owns first copy of A
      (1L, s"$blockB $blockA"),              // A repeated → cut; owns B
      (2L, s"$blockA $blockB"),              // both repeated → collapses to ''
      (3L, s"$blockA $blockA v1 v2"),        // within-doc repeat: A already
                                             // owned by doc 0 → both cut;
                                             // trailing partial block kept
      (4L, "")                               // empty doc present, '' text
    ).toDF("doc_id", "text")
    val out = Dedup.blockDedup(docs, "doc_id", "text", blockTokens = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) === ((2L, 0L, s"$blockA u1 u2 u3 u4")))
    assert(out(1L) === ((2L, 1L, blockB)))
    assert(out(2L) === ((2L, 2L, "")))
    assert(out(3L) === ((3L, 2L, "v1 v2")))
    assert(out(4L) === ((0L, 0L, "")))
    // every block content appears exactly once across the cleaned corpus
    val cleaned = out.values.map(_._3).mkString(" ").split(" ").filter(_.nonEmpty)
    assert(cleaned.count(_ == "w1") === 1 && cleaned.count(_ == "x1") === 1)
    // physical layout must not change the result
    val repart = Dedup.blockDedup(docs.repartition(7), "doc_id", "text", blockTokens = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(repart === out)
  }

  test("classTfidfTopTerms: class-exclusive terms outrank corpus-wide stopwords") {
    import spark.implicits._
    // two classes; 'the' dominates both by raw count, 'kernel'/'recipe'
    // are exclusive — c-TF-IDF must surface the exclusive terms first
    val docs = Seq(
      (0L, "the kernel driver kernel module the kernel"),
      (1L, "the kernel panic driver kernel the"),
      (2L, "the recipe flour recipe sugar the recipe"),
      (3L, "the recipe oven flour recipe the")
    ).toDF("doc_id", "text")
    val labels = Seq((0L, 0), (1L, 0), (2L, 1), (3L, 1)).toDF("doc_id", "cluster")
    val r = TextOps.classTfidfTopTerms(docs, "doc_id", "text", labels,
        nClasses = 2, topM = 2)
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getString(2))).toSeq
    val byCluster = r.groupBy(_._1).map { case (c, rows) =>
      c -> rows.sortBy(_._2).map(_._3)
    }
    assert(byCluster(0).head === "kernel")
    assert(byCluster(1).head === "recipe")
    // the stopword never makes a top-2 despite being the most frequent
    // term in BOTH classes
    assert(!r.exists(_._3 == "the"))
    // determinism under layout
    val repart = TextOps.classTfidfTopTerms(docs.repartition(5), "doc_id", "text",
        labels, nClasses = 2, topM = 2)
      .collect().map(x => (x.getInt(0), x.getInt(1), x.getString(2))).toSeq
    assert(repart.toSet === r.toSet)
  }

  test("ndcgAt: perfect ranking scores 1; tf-inflated low-overlap doc above high-overlap docs costs nDCG") {
    import spark.implicits._
    // query 0 shares ONE rare word with doc 1, which repeats it — high
    // idf × saturated tf outscores docs 2/3, which share TWO moderate
    // words each (higher grade). BM25 then ranks the grade-1 doc first
    // and the ideal re-sort must beat the retrieved order: nDCG < 1.
    val docs = Seq(
      (0L, "rare1 c1 c2 q1 q2 q3 q4 q5"),
      (1L, "rare1 rare1 rare1 rare1 rare1 rare1 rare1 rare1 rare1 rare1 rare1 rare1"),
      (2L, "c1 c2 f1 f2 f3 f4 f5 f6"),
      (3L, "c1 c2 g1 g2 g3 g4 g5 g6")
    ).toDF("doc_id", "text")
    val queries = docs.where(col("doc_id") === 0L)
    val r = TextOps.ndcgAt(docs, queries, "doc_id", "text", "doc_id", "text",
        k = 3, maxGrade = 7, gradeDiv = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))
    assert(r.length === 1)
    val (_, n, dcg, idcg, ndcg) = r.head
    assert(n === 3L)
    assert(dcg < idcg && ndcg < 1.0, s"expected imperfect ranking, got $r")
    assert(ndcg > 0.0)
    // a query whose results are already in grade order must score exactly 1
    val r2 = TextOps.ndcgAt(docs.where(col("doc_id") =!= 1L), queries,
        "doc_id", "text", "doc_id", "text", k = 3, maxGrade = 7, gradeDiv = 1)
      .collect().map(x => x.getDouble(4))
    assert(r2.toSeq === Seq(1.0))
    // layout invariance
    val repart = TextOps.ndcgAt(docs.repartition(5), queries, "doc_id", "text",
        "doc_id", "text", k = 3, maxGrade = 7, gradeDiv = 1)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))
    assert(repart.toSeq === r.toSeq)
  }

  test("e2e_web_pipeline: survivors are quality-kept, content-distinct, min-id") {
    val rows = SparkEntry.queries("e2e_web_pipeline")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(rows.nonEmpty)
    // content-distinct and min-id per fingerprint is enforced by the rank;
    // verify fingerprints unique
    val fps = rows.map(_._4)
    assert(fps.distinct.length === fps.length)
    // the kept quality values all clear the 80th percentile of the cleaned
    // corpus: recompute the threshold from the cleaned side
    val cleaned = Dedup.stripBoilerplate(Tables.documents(spark, sfDir),
        "doc_id", "text", n = 8, minDocFrequency = 3)
      .where(size(TextOps.tokens(col("clean_text"))) > 0)
      .select(TextOps.qualityCol(col("clean_text")).as("q"))
      .agg(percentile(col("q"), lit(0.8))).collect()(0).getDouble(0)
    assert(rows.forall(_._3 >= cleaned))
  }

  test("fimTransform: md5 cut points replicated single-node; splits partition the doc") {
    import spark.implicits._
    val docs = Seq((7L, "a b c d e f g h i j"), (8L, ""), (9L, "only"))
      .toDF("doc_id", "text")
    val out = TextOps.fimTransform(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap

    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 8), 16)
    }
    for ((id, text) <- Seq(7L -> "a b c d e f g h i j", 8L -> "", 9L -> "only")) {
      val ws = text.split(" ").filter(_.nonEmpty)
      val n = ws.length
      val a = h32(s"$id#fim1") % (n + 1)
      val b = h32(s"$id#fim2") % (n + 1)
      val (u, v) = (math.min(a, b), math.max(a, b))
      val expectMd5 = {
        val p = ws.slice(0, u.toInt).mkString(" ")
        val m = ws.slice(u.toInt, v.toInt).mkString(" ")
        val s2 = ws.slice(v.toInt, n).mkString(" ")
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p|$s2|$m".getBytes("UTF-8")).map("%02x".format(_)).mkString
        d
      }
      val (np, nm, nsuf, md) = out(id)
      assert(np === u && nm === v - u && nsuf === n - v, s"doc $id cut points")
      assert(np + nm + nsuf === n.toLong)
      assert(md === expectMd5, s"doc $id psm serialization")
    }
  }

  test("memorizationRisk: corpus-hot windows counted per doc, self-repetition df stays 1") {
    import spark.implicits._
    val chrome = "nav home about contact privacy terms login search"
    val docs = Seq(
      (0L, s"$chrome alpha beta gamma delta epsilon zeta eta theta"),
      (1L, s"$chrome iota kappa lambda mu nu xi omicron pi"),
      (2L, s"$chrome rho sigma tau upsilon phi chi psi omega"),
      (3L, "spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam spam"))
      .toDF("doc_id", "text")
    val out = Dedup.memorizationRisk(docs, "doc_id", "text", n = 8, hotDf = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // chrome window (positions 0) is shared by docs 0-2 -> df 3, exactly
    // one hot window each (16 tokens -> 9 windows)
    for (id <- 0L to 2L) {
      val (nw, maxDf, nHot, frac) = out(id)
      assert(nw === 9L && maxDf === 3L && nHot === 1L)
      assert(math.abs(frac - 1.0 / 9.0) < 1e-3)
    }
    // doc 3's windows repeat within ITSELF only: distinct-doc df stays 1
    val (_, maxDf3, nHot3, frac3) = out(3L)
    assert(maxDf3 === 1L && nHot3 === 0L && frac3 === 0.0)
  }

  test("multi-suite decontamination: union of per-suite coverage == combined d15 coverage") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.where(col("doc_id") % 11 =!= 0)
    val bench = docs.where(col("doc_id") % 11 === 0)
    val multi = SparkEntry.queries("q_multi_suite_decontam")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(multi.nonEmpty)
    // flatten each suite's spans back to flagged window positions
    def winPositions(spans: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
      spans.flatMap { case (doc, s, len) => (s until (s + len - 7)).map(doc -> _) }.toSet
    val multiCover = winPositions(multi.map(t => (t._1, t._3, t._4)).distinct)
    val combined = Dedup.contaminationSpans(corpus, bench, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(multiCover === winPositions(combined),
      "per-suite flagged positions must union to the combined-eval coverage")
    // and at least two suites must actually fire for the gate to mean anything
    assert(multi.map(_._2).distinct.length >= 2)
  }

  test("kCenterGreedy equals a single-node replica; covering radii nonincreasing") {
    val emb = Tables.embeddings(spark, sfDir)
    val sel = Similarity.kCenterGreedy(emb, 8)
    val vecs = emb.select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val seed = vecs.keys.min
    var centers = Vector(seed)
    var expect = Vector((0, seed, 0.0))
    for (r <- 1 until 8) {
      val (bid, bd2) = vecs.keys.toSeq
        .map(id => (id, centers.map(c => d2(vecs(id), vecs(c))).min))
        .maxBy { case (id, m) => (m, -id) } // ties to the smaller id
      centers :+= bid
      expect :+= ((r, bid, bd2))
    }
    assert(sel === expect)
    val radii = sel.drop(1).map(_._3)
    for (Seq(a, b) <- radii.sliding(2)) assert(a >= b, "covering radius must not grow")
  }

  test("per-source boilerplate: same-source chrome cut, cross-source repeats survive") {
    import spark.implicits._
    val chrome = "nav home about contact privacy terms login search"
    val docs = Seq(
      // siteA repeats its chrome in two docs -> stripped
      (0L, s"$chrome alpha beta gamma delta epsilon zeta eta theta", "siteA"),
      (1L, s"$chrome iota kappa lambda mu nu xi omicron pi", "siteA"),
      // siteB carries the SAME phrase once -> df within siteB is 1, kept
      (2L, s"$chrome rho sigma tau upsilon phi chi psi omega", "siteB"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.stripBoilerplateBySource(docs, "doc_id", "text", "source",
        n = 8, minDocFrequency = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) === "alpha beta gamma delta epsilon zeta eta theta")
    assert(out(1L) === "iota kappa lambda mu nu xi omicron pi")
    // the global (source-blind) rule would have cut siteB's copy too
    assert(out(2L) === s"$chrome rho sigma tau upsilon phi chi psi omega")
    val global = Dedup.stripBoilerplate(docs, "doc_id", "text", n = 8, minDocFrequency = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(global(2L) === "rho sigma tau upsilon phi chi psi omega")
  }

  test("dimTruncationRecall: full-dim budget anchors at exactly 1.0; counts = queries×k") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val nq = queries.count()
    val r = Similarity.dimTruncationRecall(emb, queries, Seq(8, 64), k = 5)
      .collect().map(x => x.getInt(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(64) === ((nq * 5, nq * 5, 1.0)), "full-dim ranking must recall itself exactly")
    val (nRanked8, nHits8, rec8) = r(8)
    assert(nRanked8 === nq * 5 && nHits8 <= nRanked8)
    assert(rec8 >= 0.0 && rec8 <= 1.0)
  }

  test("contrastiveBatches: no label twice in a batch, sizes capped, all rows placed") {
    val rows = SparkEntry.queries("q_contrastive_batches")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val n = Tables.embeddings(spark, sfDir).count()
    assert(rows.length === n)
    // validity: a batch never holds two rows of one label
    for ((_, g) <- rows.groupBy(_._4)) {
      val labels = g.map(_._2)
      assert(labels.distinct.length === labels.length,
        s"batch ${g.head._4} repeats a label")
      assert(g.length <= 16, s"batch ${g.head._4} exceeds the cap")
    }
    // determinism across a repartitioned input
    val again = CoreOps.contrastiveBatches(
        Tables.embeddings(spark, sfDir).repartition(7), "vec_id", "label", 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted
    assert(again.toSeq === rows.sorted.toSeq)
  }

  test("robustZScore: medians and MAD match a single-node sort replica; zeros go NULL") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 0.1), (2L, "a", 0.2), (3L, "a", 0.3), (4L, "a", 0.4), (5L, "a", 2.0),
      (6L, "b", 0.5), (7L, "b", 0.5), (8L, "b", 0.5)) // MAD 0 -> NULL z
      .toDF("doc_id", "g", "v")
    val out: Map[Long, (Double, Double, Option[Double])] =
      CoreOps.robustZScore(df, "g", "v")
        .select("doc_id", "median", "mad", "robust_z")
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // group a: lower median of {.1,.2,.3,.4,2.0} = .3; |x-.3| = {.2,.1,0,.1,1.7},
    // lower median = .1 (floating 0.1 vs 0.4-0.3: grouped by exact bits — the
    // replica uses the same doubles)
    val a = Seq(0.1, 0.2, 0.3, 0.4, 2.0)
    val mA = a.sorted.apply((a.size - 1) / 2)
    val madA = a.map(x => math.abs(x - mA)).sorted.apply((a.size - 1) / 2)
    for (id <- 1L to 5L) {
      val (m, mad, _) = out(id)
      assert(m === mA && mad === madA, s"doc $id median/mad")
    }
    val zOutlier = out(5L)._3.get
    assert(zOutlier === math.floor((2.0 - mA) / madA * 10000.0 + 0.5) / 10000.0)
    assert(zOutlier > 5.0, "the planted outlier must stand out")
    // group b: every value at the median -> MAD 0 -> NULL by contract
    for (id <- 6L to 8L) {
      val (m, mad, z) = out(id)
      assert(m === 0.5 && mad === 0.0 && z.isEmpty)
    }
  }

  test("sourceDivergence matches a single-node full-vocabulary JS computation") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a a b c", "s1"), (1L, "a b b d", "s1"),
      (2L, "c c c d", "s2"), (3L, "d d e e", "s2"),
      (4L, "a a b c", "s3"), (5L, "a b b d", "s3")) // s3 == s1's text exactly
      .toDF("doc_id", "text", "source")
    val out = TextOps.sourceDivergence(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

    // single-node reference: full-vocabulary JS with plain doubles
    val rows = Seq(0L -> ("a a b c", "s1"), 1L -> ("a b b d", "s1"),
      2L -> ("c c c d", "s2"), 3L -> ("d d e e", "s2"),
      4L -> ("a a b c", "s3"), 5L -> ("a b b d", "s3"))
    val all = rows.flatMap { case (_, (t, s)) => tokens(t).map(w => (s, w)) }
    val global = all.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val n = all.size.toDouble
    for (src <- Seq("s1", "s2", "s3")) {
      val mine = all.filter(_._1 == src).groupBy(_._2).view.mapValues(_.size.toDouble).toMap
      val ns = mine.values.sum
      val js = global.keys.toSeq.map { w =>
        val ps = mine.getOrElse(w, 0.0) / ns
        val p = global(w) / n
        val mid = (ps + p) / 2.0
        (if (ps > 0) 0.5 * ps * math.log(ps / mid) else 0.0) +
          0.5 * p * math.log(p / mid)
      }.sum
      val (nTok, nDistinct, got) = out(src)
      assert(nTok === ns.toLong)
      assert(nDistinct === mine.size.toLong)
      assert(math.abs(got - js) < 1e-3, s"$src: got $got expected $js")
    }
    // s1 and s3 are identical corpora: identical divergence, bit-for-bit
    assert(out("s1")._3 === out("s3")._3)
    // s2 shares less vocabulary with the corpus than s1 does
    assert(out("s2")._3 > out("s1")._3)
  }

  test("lexicalNearDupPairs: DEFAULT generator is MinHash/LSH (bit-identical to the explicit composition); Hamming is the opt-in") {
    val docs = Tables.documents(spark, sfDir)
    val k = 5; val numHashes = 64; val numBands = 16; val thr = 0.7
    // the default must be the LSH pipeline d17/d19 ride — same pairs, same
    // verified jaccard values, to the last bit
    val default = Dedup.lexicalNearDupPairs(docs, "doc_id", "text",
        k, numHashes, numBands, thr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val explicitLsh = Dedup.verifyCandidatesJaccard(docs, "doc_id", "text", k,
        Dedup.lshCandidatePairs(
          Dedup.minHashSignatures(docs, "doc_id", "text", k, numHashes),
          numHashes, numBands), thr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(default === explicitLsh, "default generator is not the LSH composition")
    assert(default.nonEmpty, "fixture has planted near-dups; LSH must find some")
    // the Hamming pigeonhole generator is selectable and, being
    // precision-1.0 / recall-0.52 (q_hamming_candidate_quality), yields a
    // SUBSET of the exact-verified pairs the LSH default admits here
    val hamming = Dedup.lexicalNearDupPairs(docs, "doc_id", "text",
        k, numHashes, numBands, thr, generator = Dedup.HammingCandidates)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(hamming.subsetOf(default),
      s"hamming candidates admitted pairs LSH verification did not: ${hamming -- default}")
  }
}
