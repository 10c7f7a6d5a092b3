package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

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
}
