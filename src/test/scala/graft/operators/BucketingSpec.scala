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
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** The suite JVM shares one SparkSession across specs (`getOrCreate`
    * ignores this builder's configs when a session exists), so the
    * plan-shape assertions set their session confs dynamically and restore
    * them — broadcast and AQE must be off for the exchanges to be visible
    * and stable. */
  private def withPlanConfs[A](body: => A): A = {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  /** Unique per-run table names: a previous run's managed-table DIRECTORY
    * survives the in-memory catalog (which dies with the JVM), and
    * CREATE ... AS fails on an existing orphan location. */
  private def freshTable(prefix: String): String = s"${prefix}_${System.nanoTime()}"

  private def withTables[A](names: String*)(body: => A): A =
    try body finally names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))

  test("bucketed join on the bucket key is shuffle-free and agrees with the plain join") { withPlanConfs {
    val lineitem = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity", "l_extendedprice")
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate", "o_orderpriority")

    val (liB, ordB) = (freshTable("li_b"), freshTable("ord_b"))
    withTables(liB, ordB) {
    Bucketing.writeBucketed(lineitem, liB, buckets = 8, Seq("l_orderkey"), Seq("l_orderkey"))
    Bucketing.writeBucketed(orders, ordB, buckets = 8, Seq("o_orderkey"), Seq("o_orderkey"))

    def joined(l: org.apache.spark.sql.DataFrame, o: org.apache.spark.sql.DataFrame) =
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"), count(lit(1)).as("n"))

    val plain = joined(lineitem, orders)
    val bucketed = joined(Bucketing.table(spark, liB), Bucketing.table(spark, ordB))

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
  } }

  test("aggregation on the bucket key needs no exchange at all") { withPlanConfs {
    val liAgg = freshTable("li_agg_b")
    withTables(liAgg) {
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity", "l_extendedprice"),
        liAgg, buckets = 8, Seq("l_orderkey"), Seq("l_orderkey"))
      val bucketed = Bucketing.table(spark, liAgg)
        .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
      assert(Bucketing.shuffleFree(bucketed),
        s"bucket-key aggregation should be shuffle-free:\n${bucketed.queryExecution.executedPlan}")
    }
  } }
}
