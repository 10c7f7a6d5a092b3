package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables

/** Pins the distributed in-engine BPE merge training (TextOps.bpeTrain)
  * against a from-scratch single-node replica over the real sf0.001
  * documents — the same train-in-engine verification pattern as the x12
  * logistic-regression spec: deterministic training, replica-equal model,
  * and the application path (bpeSegment) must reproduce the trainer's
  * final state exactly. */
class BpeTrainSpec extends AnyFunSuite {

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

  /** Independent single-node BPE trainer: naive pair counting over a plain
    * Map, argmax by (count desc, pair asc), list-based leftmost
    * non-overlapping merge — shares no code with the operator under test. */
  private def replicaTrain(wordFreq: Map[String, Long], numMerges: Int,
      minPairFreq: Long = 2L): (Seq[(String, String)], Map[String, List[String]]) = {
    def mergeOnce(ss: List[String], l: String, r: String): List[String] = ss match {
      case a :: b :: rest if a == l && b == r => (l + r) :: mergeOnce(rest, l, r)
      case a :: rest => a :: mergeOnce(rest, l, r)
      case Nil => Nil
    }
    var syms: Map[String, (List[String], Long)] =
      wordFreq.map { case (w, f) => w -> (w.toList.map(_.toString), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (ss, f)) <- syms; (a, b) <- ss.zip(ss.drop(1)))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + f
      val best = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some((pair, c)) if c >= minPairFreq =>
          merges += pair
          syms = syms.map { case (w, (ss, f)) => w -> (mergeOnce(ss, pair._1, pair._2), f) }
        case _ => done = true
      }
    }
    (merges.toSeq, syms.map { case (w, (ss, _)) => w -> ss })
  }

  test("bpeTrain: hand-checkable toy corpus learns the expected first merges") {
    import spark.implicits._
    // "abab"×5 + "abc"×3: (a,b) counts 13 (twice per abab, once per abc) —
    // first merge; then (ab,ab) counts 5 vs (ab,c) 3 — second merge
    val wf = Seq(("abab", 5L), ("abc", 3L)).toDF("word", "freq")
    val (merges, wordTokens) = TextOps.bpeTrain(wf, numMerges = 10)
    assert(merges.take(2) === Seq(("a", "b"), ("ab", "ab")))
    val toks = wordTokens.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks("abab") === 1L) // fully merged: abab
    // abc → [ab, c]; (ab,c) count 3 ≥ minPairFreq merges it too → [abc]
    assert(merges.contains(("ab", "c")) && toks("abc") === 1L)
  }

  test("bpeTrain == single-node replica on the real corpus (merges, model, determinism)") {
    val wf = TextOps.bpeWordFreq(Tables.documents(spark, sfDir), "text")
    val wfLocal = wf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (merges, wordTokens) = TextOps.bpeTrain(wf, numMerges = 40)
    val (replicaMerges, replicaSyms) = replicaTrain(wfLocal, numMerges = 40)
    assert(merges === replicaMerges, "distributed merge sequence diverged from replica")
    val got = wordTokens.collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getSeq[String](3).toList))).toMap
    assert(got.keySet === replicaSyms.keySet)
    for ((w, ss) <- replicaSyms) {
      assert(got(w)._1 === ss.length.toLong, s"token count mismatch for word '$w'")
      assert(got(w)._2 === ss, s"token sequence mismatch for word '$w'")
    }
    // training is bit-deterministic: a second run learns the identical list
    val (merges2, _) = TextOps.bpeTrain(wf, numMerges = 40)
    assert(merges2 === merges)
  }

  test("bpeSegment replays the trainer's final state; novel words segment losslessly") {
    val wf = TextOps.bpeWordFreq(Tables.documents(spark, sfDir), "text")
    val (merges, wordTokens) = TextOps.bpeTrain(wf, numMerges = 40)
    // rank-order application over the initial character split must land on
    // exactly the trained tokenization for EVERY corpus word — the
    // invariant that lets an apply path use the exported merge list alone
    for (r <- wordTokens.collect()) {
      val (w, n) = (r.getString(0), r.getLong(1))
      val seg = TextOps.bpeSegment(w, merges)
      assert(seg.length.toLong === n, s"bpeSegment diverged on corpus word '$w'")
      assert(seg.mkString("") === w)
    }
    // unseen word: concatenation invariant holds, no crash
    val novel = TextOps.bpeSegment("zzquxverylongnovelword", merges)
    assert(novel.mkString("") === "zzquxverylongnovelword")
  }

  test("bpeTrainLocal == distributed bpeTrain on the real corpus; auto dispatches identically") {
    val wf = TextOps.bpeWordFreq(Tables.documents(spark, sfDir), "text")
    val (dMerges, dModelDf) = TextOps.bpeTrain(wf, numMerges = 40)
    val dModel = dModelDf.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[String](3).toList)).toMap
    val localFreq = wf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val (lMerges, lModel) = TextOps.bpeTrainLocal(localFreq, numMerges = 40)
    assert(lMerges === dMerges, "local trainer's merge sequence diverged from distributed")
    assert(lModel.map(m => m._1 -> (m._2, m._4.toList)).toMap === dModel)
    // the dispatcher must be invisible: same merges, same model frame
    val (aMerges, aModelDf) = TextOps.bpeTrainAuto(wf, numMerges = 40)
    assert(aMerges === dMerges)
    val aModel = aModelDf.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[String](3).toList)).toMap
    assert(aModel === dModel)
    // input order must not matter to the local trainer
    val (lMerges2, _) = TextOps.bpeTrainLocal(localFreq.reverse, numMerges = 40)
    assert(lMerges2 === lMerges)
    // a deep merge budget stays cheap driver-side and stops cleanly when
    // no pair reaches minPairFreq (the heap drains exact)
    val (deep, deepModel) = TextOps.bpeTrainLocal(localFreq, numMerges = 5000)
    assert(deep.length <= 5000 && deep.take(40) === lMerges)
    assert(deepModel.map(_._3).sum === localFreq.map(_._2).sum)
  }

  test("bpeOovStats: unseen words count as misses, in-vocab cost and round4 fraction exact") {
    import spark.implicits._
    // model trained on a two-document corpus; the probe doc mixes known
    // and genuinely novel words (the sf corpus shares one vocabulary, so
    // the gate alone never exercises the miss path — this pins it)
    val trainDocs = Seq((0L, "alpha beta gamma alpha"), (1L, "beta delta"))
      .toDF("doc_id", "text")
    val (_, model) = TextOps.bpeTrain(TextOps.bpeWordFreq(trainDocs, "text"), 20)
    val vocabCost = model.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // pre-tokens of the probe under the GPT-2-style pattern: "alpha",
    // " zork", " beta", " quux" — space-prefixed forms after the first
    val probe = Seq((10L, "alpha zork beta quux")).toDF("doc_id", "text")
    val got = TextOps.bpeOovStats(probe, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.length === 1)
    val (_, nPre, nOov, nInVocab, frac) = got.head
    assert(nPre === 4)
    // "alpha" trained bare; " zork"/" quux" unseen; " beta" trained only
    // as " beta" (space-prefixed, from "alpha beta..." and "beta delta"?
    // "beta delta" pre-tokenizes to "beta", " delta" → bare "beta" IS in
    // vocab; "alpha beta" yields " beta" too — both forms exist)
    val expectedHits = Seq("alpha", " zork", " beta", " quux").map(vocabCost.get)
    val expOov = expectedHits.count(_.isEmpty).toLong
    val expCost = expectedHits.flatten.sum
    assert(nOov === expOov && nOov >= 2L, s"novel words must miss: $expectedHits")
    assert(nInVocab === expCost)
    assert(frac === math.floor(nOov.toDouble / 4.0 * 10000.0 + 0.5) / 10000.0)
  }

  test("bpeSizeCurve: prefix-stable vs bpeSegment, monotone in k, chars at k=0") {
    import spark.implicits._
    val wf = TextOps.bpeWordFreq(Tables.documents(spark, sfDir), "text")
    val (merges, model) = TextOps.bpeTrainAuto(wf, numMerges = 60)
    val grid = Seq(0, 20, 40, 60)
    val curve = TextOps.bpeSizeCurve(wf, merges, grid)
      .as[(String, Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._3 -> t._4).toMap).toMap
    assert(curve.nonEmpty)
    val trained = model.select("word", "n_tokens")
      .as[(String, Long)].collect().toMap
    for ((w, byK) <- curve) {
      assert(byK.keySet === grid.toSet)
      // k = 0: character segmentation
      assert(byK(0) === w.length.toLong, s"'$w' at k=0")
      // monotone nonincreasing in merge budget
      for (Seq(a, b) <- grid.sliding(2)) assert(byK(a) >= byK(b), s"'$w' $a->$b")
      // top budget: the progressive walk equals both the trained model and
      // a fresh bpeSegment under the full prefix
      assert(byK(60) === trained(w), s"'$w' top-budget vs model")
      assert(byK(20) === TextOps.bpeSegment(w, merges.take(20)).length.toLong,
        s"'$w' mid-budget vs fresh segmentation")
    }
  }
}
