package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables

/** Pins the physical-plan property the top-k operators rely on at scale:
  * Spark rewrites `row_number().over(partitionBy(q).orderBy(s)) <= k` into
  * WindowGroupLimit with a PARTIAL pass before the shuffle, so map tasks
  * prune to k rows per query before anything moves. If a future change to
  * the window ordering or filter shape silently defeats that rewrite, the
  * shuffle goes from O(k per query per task) to all scored pairs — this
  * spec turns that regression into a test failure. */
class SimilarityPlanSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("brute-force and LSH top-k plans contain partial WindowGroupLimit pruning") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    for ((name, df) <- Seq(
        "bruteForce" -> Similarity.bruteForceTopK(emb, queries, 5),
        "lsh" -> Similarity.lshBucketTopK(emb, queries, 5))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"$name top-k lost the WindowGroupLimit rewrite:\n$plan")
    }
  }

  test("LSH candidate volume stays bounded when the corpus doubles (auto-derived bits)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    // k = MaxValue disables the rank cut, so the row count IS the number of
    // distinct (query, candidate) pairs the bucket join produced
    def candidates(n: Int): Long =
      Similarity.lshBucketTopK(emb.where(col("vec_id") < n), queries, Int.MaxValue).count()
    val at1k = candidates(1000)
    val at2k = candidates(2000)
    // fixed 4-bit signatures would double the volume here (1000 → 4 bits,
    // 2000 → 5 via bitsForCorpus); occupancy-targeted bits keep it flat
    // modulo bucket skew
    assert(at2k <= at1k * 1.6,
      s"candidate volume grew with the corpus: $at1k -> $at2k")
    assert(at1k > 0)
  }
}
