package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Gap semantics and the one-Exchange plan property of sessionization. */
class SessionizeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("gap boundary: == maxGap continues the session, > maxGap opens a new one") {
    import spark.implicits._
    val ev = Seq(
      (1L, "u", 0L), (2L, "u", 100L), // gap 100 == maxGap -> same session
      (3L, "u", 201L), // gap 101 > maxGap -> new session
      (4L, "u", 301L), // gap 100 -> stays in session 2
      (5L, "v", 50L) // other key independent
    ).toDF("event_id", "user_id", "ts_us")
    val out = Sessionize.withSessionIds(ev, "user_id", "ts_us", "event_id", maxGap = 100L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("session ids and summaries need exactly one shuffle") {
    import spark.implicits._
    val ev = spark.range(1000).select(
      org.apache.spark.sql.functions.col("id").as("event_id"),
      (org.apache.spark.sql.functions.col("id") % 7).as("user_id"),
      (org.apache.spark.sql.functions.col("id") * 37 % 10000).as("ts_us"))
    val plan = Sessionize.withSessionIds(ev, "user_id", "ts_us", "event_id", 100L)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"lag + running sum should share one sort/exchange:\n$plan")
  }
}
