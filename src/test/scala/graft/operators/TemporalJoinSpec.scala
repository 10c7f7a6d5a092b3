package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables

/** AsOfJoin and RangeJoin agree with naive (non-scalable) formulations on
  * real test data, and handle the edges the bucketing/union tricks could
  * get wrong: equal timestamps, no-match rows, intervals spanning blocks. */
class TemporalJoinSpec extends AnyFunSuite {

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

  private def eventsUs = Tables.events(spark, "/root/testdata/sf0.001")
    .withColumn("ts_us", expr("ts_ns div 1000"))

  test("asof backward matches the naive max-prior-row join on events") {
    val clicks = eventsUs.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = eventsUs.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"),
        col("ts_us").as("p_ts_us"), col("value").as("p_value"))

    val fast = AsOfJoin.backward(clicks, purchases, Seq("user_id"), "ts_us", "p_ts_us")

    // naive: non-equi join all prior purchases, rank desc, keep the latest
    // (ties on p_ts_us broken by p_event_id desc — matches the lexicographic
    // struct tiebreak since p_event_id is the first payload field)
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("p_ts_us").desc, col("p_event_id").desc)
    val best = clicks.join(purchases, Seq("user_id"))
      .where(col("p_ts_us") <= col("ts_us"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("event_id", "p_event_id", "p_ts_us", "p_value")
    val naive = clicks.join(best, Seq("event_id"), "left_outer")
      .select("event_id", "user_id", "ts_us", "p_event_id", "p_ts_us", "p_value")

    val f = fast.collect().map(r => r.toSeq).sortBy(_.toString)
    val n = naive.collect().map(r => r.toSeq).sortBy(_.toString)
    assert(f.length === n.length)
    assert(f.toSeq === n.toSeq)
    // sanity: some clicks matched, some didn't (left-outer nulls survive)
    val matched = fast.where(col("p_event_id").isNotNull).count()
    assert(matched > 0 && matched < fast.count())
  }

  test("asof is inclusive at equal timestamps and picks the max payload on right ties") {
    import spark.implicits._
    val left = Seq((1L, "k", 100L), (2L, "k", 99L)).toDF("id", "g", "t")
    val right = Seq(("k", 100L, 7L), ("k", 100L, 9L), ("k", 50L, 1L))
      .toDF("g", "rt", "payload")
    val out = AsOfJoin.backward(left, right, Seq("g"), "t", "rt")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("payload"))).toMap
    assert(out(1L) === 9L) // t=100 matches rt=100 inclusively; max payload of the tie
    assert(out(2L) === 1L) // t=99 sees only rt=50
  }

  test("range join matches naive BETWEEN join incl. intervals spanning many blocks") {
    val clicks = eventsUs.where(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"))
    // deliberately small blockWidth (1h) vs 6h intervals: 7 blocks each
    val errors = eventsUs.where(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("u2"),
        col("ts_us").as("start_us"), (col("ts_us") + 21600000000L).as("end_us"))
      .withColumnRenamed("u2", "user_id")

    val fast = RangeJoin.pointsInIntervals(clicks, errors, Seq("user_id"),
      "ts_us", "start_us", "end_us", blockWidth = 3600000000L)
      .select("err_id", "user_id", "ts_us")

    val naive = clicks.join(errors, Seq("user_id"))
      .where(col("ts_us") >= col("start_us") && col("ts_us") < col("end_us"))
      .select("err_id", "user_id", "ts_us")

    val f = fast.collect().map(_.toSeq).sortBy(_.toString)
    val n = naive.collect().map(_.toSeq).sortBy(_.toString)
    assert(f.toSeq === n.toSeq)
    assert(f.nonEmpty, "test window should produce at least one match")
  }

  test("range join boundaries: start inclusive, end exclusive, exactly once per pair") {
    import spark.implicits._
    val pts = Seq(("k", 100L), ("k", 199L), ("k", 200L), ("k", 99L)).toDF("g", "t")
    val iv = Seq(("k", 7L, 100L, 200L)).toDF("g", "iv_id", "s", "e")
    val out = RangeJoin.pointsInIntervals(pts, iv, Seq("g"), "t", "s", "e", blockWidth = 10L)
      .select("t").as[Long].collect().sorted
    assert(out.toSeq === Seq(100L, 199L)) // 200 excluded, 99 excluded, no dups
  }

  test("interval overlap join matches naive overlap predicate, exactly once per pair") {
    import spark.implicits._
    // long intervals spanning many blocks, touching/nested/disjoint cases
    val lhs = Seq(("k", 1L, 0L, 100L), ("k", 2L, 250L, 260L), ("k", 3L, 300L, 700L),
      ("z", 4L, 0L, 50L)).toDF("g", "l_id", "ls", "le")
    val rhs = Seq(("k", 10L, 50L, 150L), ("k", 11L, 100L, 200L), ("k", 12L, 255L, 256L),
      ("k", 13L, 0L, 1000L), ("z", 14L, 50L, 60L)).toDF("g", "r_id", "rs", "re")
    val fast = RangeJoin.intervalOverlapJoin(lhs, rhs, Seq("g"), "ls", "le", "rs", "re",
        blockWidth = 16L)
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted
    val naive = lhs.join(rhs, Seq("g"))
      .where(col("ls") < col("re") && col("rs") < col("le"))
      .select("l_id", "r_id").as[(Long, Long)].collect().sorted
    assert(fast.toSeq === naive.toSeq)
    // [0,100) vs [100,200) touch but do not overlap (half-open)
    assert(!fast.contains((1L, 11L)))
    // nested long-vs-long pair appears exactly once despite ~44 shared blocks
    assert(fast.count(_ == ((3L, 13L))) === 1)
    // different keys never pair
    assert(!fast.contains((4L, 10L)) && !fast.contains((1L, 14L)))
  }

  test("interval overlap join equals the naive join on seeded random workloads") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (blockWidth <- Seq(7L, 64L, 1000L)) {
      def mk(n: Int, pfx: Long) = (0 until n).map { i =>
        val s = rnd.nextInt(2000).toLong
        (s"k${rnd.nextInt(5)}", pfx + i, s, s + 1 + rnd.nextInt(300))
      }
      val lhs = mk(150, 1000L).toDF("g", "l_id", "ls", "le")
      val rhs = mk(150, 2000L).toDF("g", "r_id", "rs", "re")
      val fast = RangeJoin.intervalOverlapJoin(lhs, rhs, Seq("g"),
          "ls", "le", "rs", "re", blockWidth)
        .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
      val naive = lhs.join(rhs, Seq("g"))
        .where(col("ls") < col("re") && col("rs") < col("le"))
        .select("l_id", "r_id").as[(Long, Long)].collect().sorted.toSeq
      assert(fast === naive, s"blockWidth=$blockWidth")
      assert(fast.nonEmpty)
      assert(fast.distinct.size === fast.size, s"duplicates at blockWidth=$blockWidth")
    }
  }
}
