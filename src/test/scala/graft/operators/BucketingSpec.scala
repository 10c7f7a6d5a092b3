package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables

/** Bucketed co-location: the same join that shuffles both sides from plain
  * parquet runs shuffle-free from bucketed tables, with identical results. */
class BucketingSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    val wh = s"/tmp/graft_warehouse_${System.nanoTime()}"
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the join to need distribution
      .config("spark.sql.adaptive.enabled", "false") // stable plans for assertions
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("bucketed join on the bucket key is shuffle-free and agrees with the plain join") {
    val lineitem = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity", "l_extendedprice")
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate", "o_orderpriority")

    Bucketing.writeBucketed(lineitem, "li_b", buckets = 8, Seq("l_orderkey"), Seq("l_orderkey"))
    Bucketing.writeBucketed(orders, "ord_b", buckets = 8, Seq("o_orderkey"), Seq("o_orderkey"))

    def joined(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))

    val plain = joined(lineitem, orders)
    val bucketed = joined(Bucketing.table(spark, "li_b"), Bucketing.table(spark, "ord_b"))

    // same answer...
    val pm = plain.collect().map(r => (r.getString(0), (math.round(r.getDouble(1) * 100), r.getLong(2)))).toMap
    val bm = bucketed.collect().map(r => (r.getString(0), (math.round(r.getDouble(1) * 100), r.getLong(2)))).toMap
    assert(pm === bm)

    // ...but the plain join shuffles both sides while the bucketed one reads
    // co-located buckets: no exchange anywhere below the final aggregation's
    // (the groupBy key differs from the bucket key, so ONE exchange remains
    // for the agg — the JOIN itself must contribute none)
    val plainPlan = plain.queryExecution.executedPlan.toString
    val bucketedPlan = bucketed.queryExecution.executedPlan.toString
    def joinShuffles(plan: String): Int =
      plan.linesIterator.count(l => l.contains("Exchange hashpartitioning") &&
        (l.contains("l_orderkey") || l.contains("o_orderkey")))
    assert(joinShuffles(plainPlan) === 2, s"expected 2 join-key shuffles in plain plan:\n$plainPlan")
    assert(joinShuffles(bucketedPlan) === 0, s"expected no join-key shuffle from buckets:\n$bucketedPlan")
  }

  test("aggregation on the bucket key needs no exchange at all") {
    val bucketed = Bucketing.table(spark, "li_b")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
    assert(Bucketing.shuffleFree(bucketed),
      s"bucket-key aggregation should be shuffle-free:\n${bucketed.queryExecution.executedPlan}")
  }
}
