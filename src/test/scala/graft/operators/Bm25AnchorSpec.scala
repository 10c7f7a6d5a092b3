package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Anchor-text BM25 enrichment: a document surfaces for a term that
  * appears ONLY in its inlink anchors; the enriched index equals the
  * plain index over the virtual corpus with anchor text appended
  * weight-fold; uncrawled targets get anchor-only entries. */
class Bm25AnchorSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def indexRows(idx: (DataFrame, DataFrame, Long, Long)) = {
    val (tfdl, dfreq, n, tdl) = idx
    (tfdl.select("doc_id", "th", "tf", "dl")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet,
      dfreq.select("th", "df")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      n, tdl)
  }

  test("a doc surfaces for a term appearing ONLY in its inlink anchors") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val anchors = Seq((1L, "zebra zoo"), (1L, "zebra")).toDF("target_doc", "anchor")
    val idx = TextOps.bm25IndexWithAnchors(corpus, "doc_id", "text",
      anchors, "target_doc", "anchor", weight = 2)
    val queries = Seq((100L, "zebra")).toDF("qid", "qtext")
    val qTerms = TextOps.bm25TermRows(queries, "qid", "query_id", "qtext").distinct()
    val top = TextOps.bm25TopK(
        TextOps.bm25MatchScores(qTerms, idx._1, idx._2, idx._3, idx._4), 5)
      .select("query_id", "rank", "doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // "zebra" never appears in any document body — doc 1 is found purely
    // through its inlink anchors, and is the ONLY hit
    assert(top === Seq((100L, 1L, 1L)))
  }

  test("enriched index == plain index over the virtual anchor-appended corpus") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta alpha"),
      (2L, "gamma"),
      (3L, "")).toDF("doc_id", "text")
    val anchors = Seq(
      (1L, "visit guide"),
      (1L, "guide"),
      (2L, "news news")).toDF("target_doc", "anchor")
    val w = 3
    val enriched = TextOps.bm25IndexWithAnchors(corpus, "doc_id", "text",
      anchors, "target_doc", "anchor", weight = w)
    // the virtual corpus: each doc's text plus w copies of ALL its anchor
    // text (order is irrelevant — BM25 is bag-of-terms)
    val virtual = Seq(
      (1L, "alpha beta alpha " + Seq.fill(w)("visit guide guide").mkString(" ")),
      (2L, "gamma " + Seq.fill(w)("news news").mkString(" ")),
      (3L, "")).toDF("doc_id", "text")
    val plain = TextOps.bm25Index(virtual, "doc_id", "text")
    assert(indexRows(enriched) === indexRows(plain))
  }

  test("maintenance composes: merging an epoch into an enriched index == enriching the union") {
    import spark.implicits._
    // anchors target STANDING docs; the epoch is doc-disjoint — the
    // maintained-index contract under which merge == rebuild holds
    val standing = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val epoch = Seq((3L, "delta alpha")).toDF("doc_id", "text")
    val anchors = Seq((1L, "zebra guide")).toDF("target_doc", "anchor")
    val enr = TextOps.bm25IndexWithAnchors(standing, "doc_id", "text",
      anchors, "target_doc", "anchor", weight = 2)
    val merged = TextOps.bm25IndexMerge(enr._1, enr._2, enr._3, enr._4,
      epoch, "doc_id", "text")
    val rebuilt = TextOps.bm25IndexWithAnchors(standing.unionByName(epoch),
      "doc_id", "text", anchors, "target_doc", "anchor", weight = 2)
    assert(indexRows(merged) === indexRows(rebuilt))
  }

  test("a target absent from the corpus becomes an anchor-only entry") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha")).toDF("doc_id", "text")
    val anchors = Seq((99L, "uncrawled target page")).toDF("target_doc", "anchor")
    val (tfdl, _, n, _) = TextOps.bm25IndexWithAnchors(corpus, "doc_id", "text",
      anchors, "target_doc", "anchor", weight = 2)
    // doc 99 was never crawled, yet it is indexed by what the web calls it
    assert(n === 2L)
    val d99 = tfdl.where(col("doc_id") === 99L)
      .agg(sum("tf")).head().getLong(0)
    assert(d99 === 6L, "3 anchor terms x weight 2")
  }
}
