package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted join / sharded distinct agree exactly with their plain forms on
  * skewed data, and the plans actually spread the hot key. */
class SkewOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  // one viral key with 20k rows, 50 cold keys with ~40 each
  private lazy val skewed = {
    import spark.implicits._
    spark.range(22000).select(
      when(col("id") < 20000, lit("hot")).otherwise(concat(lit("k"), col("id") % 50)).as("key"),
      (col("id") % 997).as("user_id"),
      (col("id") % 13).cast("double").as("v"))
  }

  private lazy val dim = {
    import spark.implicits._
    (Seq(("hot", "H")) ++ (0 until 50).map(i => (s"k$i", s"D$i")))
      .toDF("key", "label")
  }

  test("saltedJoin inner/left agree with the plain join, hot key spread across salts") {
    val plainConf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (jt <- Seq("inner", "left")) {
        val fast = SkewOps.saltedJoin(skewed, dim, Seq("key"), salts = 8, joinType = jt)
        val plain = skewed.join(dim, Seq("key"), jt)
        assert(fast.count() === plain.count(), s"count parity ($jt)")
        val f = fast.groupBy("key", "label").count()
        val p = plain.groupBy("key", "label").count()
        assert(f.exceptAll(p).isEmpty && p.exceptAll(f).isEmpty, s"value parity ($jt)")
      }
      // the shuffle key must include the salt so a hot key splits
      val plan = SkewOps.saltedJoin(skewed, dim, Seq("key"), 8)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"expected salted shuffle key in plan:\n$plan")
      // and the hot key's rows really occupy several salt values
      val saltsUsed = skewed.withColumn("__salt",
          pmod(xxhash64(skewed.columns.map(col): _*), lit(8)).cast("int"))
        .where(col("key") === "hot").select("__salt").distinct().count()
      assert(saltsUsed >= 6, s"hot key should span most of 8 salts, got $saltsUsed")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", plainConf)
  }

  test("saltedJoin left keeps unmatched large rows exactly once") {
    import spark.implicits._
    val missing = Seq(("nowhere", 1L, 0.0)).toDF("key", "user_id", "v")
    val out = SkewOps.saltedJoin(skewed.unionByName(missing), dim, Seq("key"), 4, "left")
    assert(out.where(col("key") === "nowhere").count() === 1)
    assert(out.where(col("key") === "nowhere" && col("label").isNull).count() === 1)
  }

  test("saltedDistinctCount is exact vs count_distinct, incl. the hot key") {
    val fast = SkewOps.saltedDistinctCount(skewed, Seq("key"), "user_id", shards = 16, out = "u")
    val plain = skewed.groupBy("key").agg(count_distinct(col("user_id")).as("u"))
    assert(fast.exceptAll(plain).isEmpty && plain.exceptAll(fast).isEmpty)
    // hot key genuinely uses many shards (state is spread, not centralized)
    val shardsUsed = skewed.where(col("key") === "hot")
      .select(pmod(xxhash64(col("user_id")), lit(16)).as("s")).distinct().count()
    assert(shardsUsed === 16)
  }

  test("runtime bloom filter injects might_contain on the fact side and preserves results") {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (onPlan, onRows) = SkewOps.withBloomTuning(spark, enabled = true) {
        val df = SkewOps.bloomBenchJoin(spark, rows = 200000L)
        (df.queryExecution.optimizedPlan.toString, df.collect().toSeq)
      }
      val offRows = SkewOps.withBloomTuning(spark, enabled = false) {
        SkewOps.bloomBenchJoin(spark, rows = 200000L).collect().toSeq
      }
      assert(onPlan.contains("might_contain"),
        s"InjectRuntimeFilter did not fire:\n${onPlan.take(3000)}")
      assert(onRows.toSet === offRows.toSet, "bloom pruning must not change results")
      assert(onRows.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
  }

  test("AQE marks the hot sort-merge partition skewed and splits it at runtime") {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try SkewOps.withSkewTuning(spark, "256KB", "128KB") {
      val df = SkewOps.skewBenchJoin(spark, rows = 500000L)
      df.collect() // drive THIS queryExecution so the AQE final plan is inspectable
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not flag the hot partition as skewed:\n${plan.take(3000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
  }
}
