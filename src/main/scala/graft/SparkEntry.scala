package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dp.DpParams
import graft.operators.{CoreOps, DpHistogram}

/** Driver contract: one entry per implemented operator from SURVEY §2, each
  * paired (where SQL-expressible) with an equivalent DuckDB oracle query in
  * [[SparkEntry.oracleSql]]. All queries are fully deterministic: zero-noise
  * (or seeded) DP modes, total ORDER BY on both sides, and decimal-exact
  * aggregation wherever a double sum would be association-order sensitive.
  */
object SparkEntry {

  // Pipeline constants shared by Spark queries and oracle SQL.
  private val BoundC = 50L // per-user contribution bound (B1)
  private val ClampL = 100.0 // per-record clamp (P3)
  private val MuGate = 72L // unique-user release threshold for the T=1 gate query
  private val Epochs = 32 // day-of-month epochs for events (1..30 used)

  /** Flagship on sf0.001 (driver smoke-checks rows > 0): the full σ=0 DP-SQLP
    * word-count pipeline — tokenize → bound → clamp → epoched DP histogram. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val words = CoreOps.tokenize(docs, "text")
      .select(col("word"), col("doc_id").cast("string").as("user_id"),
        (col("doc_id") % 8).cast("int").as("epoch"), lit(1.0).as("value"))
    val bounded = CoreOps.boundContributions(words, "user_id", "word", 1000L)
      .withColumn("value", CoreOps.clamp(col("value"), 1.0))
    val preAgg = CoreOps.preAggregate(bounded, "word", "epoch", "user_id", "value")
    DpHistogram.run(spark, preAgg, DpParams.zeroNoise(8))
  }

  /** day-of-month epoch for the events table, cast long on both sides. */
  private def withEpoch(events: DataFrame): DataFrame =
    events.withColumn("epoch", dayofmonth(col("ts")).cast("long"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- P1: tokenizer flatMap over documents ----
    "p1_tokenize_wordcount" -> ((s, d) => {
      CoreOps.tokenize(Tables.documents(s, d), "text")
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy("word")
    }),

    // ---- P3: per-record clamp then aggregate ----
    "p3_clamp_histogram" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(round(sum(CoreOps.clamp(col("value"), ClampL)), 2).as("clamped_sum"))
        .orderBy("event_type")
    }),

    // ---- P4: SHA-256 routing keys ----
    "p4_routing_hash" -> ((s, d) => {
      Tables.events(s, d).select(col("event_type")).distinct()
        .withColumn("routing_key", CoreOps.wordRoutingKey(col("event_type")))
        .orderBy("event_type")
    }),

    // ---- P5: JSON payload parsing ----
    "p5_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("k").agg(count(lit(1)).as("cnt"))
        .orderBy("k")
    }),

    // ---- B1: contribution bounding (batch row_number semantics) ----
    "b1_bounding_histogram" -> ((s, d) => {
      CoreOps.boundContributions(Tables.events(s, d), "user_id", "event_id", BoundC)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("value_sum"))
        .orderBy("event_type")
    }),

    "b1_user_admitted_counts" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(least(count(lit(1)), lit(BoundC)).as("admitted"))
        .orderBy("user_id")
    }),

    // ---- A2: per-(key, epoch) pre-aggregation with exact distinct users ----
    "a2_preagg" -> ((s, d) => {
      withEpoch(Tables.events(s, d))
        .groupBy(col("event_type").as("key"), col("epoch"))
        .agg(round(sum(col("value")), 2).as("delta_v"),
          countDistinct(col("user_id")).as("unique_users"))
        .orderBy("key", "epoch")
    }),

    // ---- A6: exact unique-user statistic ----
    "a6_unique_users" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type").agg(countDistinct(col("user_id")).as("unique_users"))
        .orderBy("event_type")
    }),

    // ---- A1-A4 composed: full DP pipeline, sigma=0, mu=0, day epochs ----
    "dp_sigma0_mu0_histogram" -> ((s, d) => {
      val bounded = CoreOps.boundContributions(Tables.events(s, d), "user_id", "event_id", BoundC)
        .withColumn("value", CoreOps.clamp(col("value"), ClampL))
      val preAgg = CoreOps.preAggregate(withEpoch(bounded), "event_type", "epoch", "user_id", "value")
      DpHistogram.run(s, preAgg, DpParams.zeroNoise(Epochs))
    }),

    // ---- Algo 1 gate: sigma=0, T=1, mu: released iff distinct users >= mu ----
    "dp_sigma0_mu_gate" -> ((s, d) => {
      val keyed = Tables.events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("long").cast("string").as("key"),
          col("user_id").cast("string").as("user_id"), lit(0L).as("epoch"), lit(1.0).as("value"))
      val preAgg = CoreOps.preAggregate(keyed, "key", "epoch", "user_id", "value")
      DpHistogram.run(s, preAgg, DpParams.zeroNoise(1, mu = MuGate))
        // key is numeric-as-string; order numerically for a stable compare
        .select(col("key").cast("long").as("key"), col("count"))
        .orderBy(col("count").desc, col("key"))
    }),

    // ---- carried-forward per-epoch timeline (sigma=0 mu=0 streaming replay) ----
    "dp_carryforward_timeline" -> ((s, d) => {
      val preAgg = withEpoch(Tables.events(s, d))
        .groupBy(col("event_type").as("key"), col("epoch"))
        .agg(sum(col("value")).as("delta_v"))
      CoreOps.carryForwardTimeline(preAgg)
        .withColumn("cum_sum", round(col("cum_sum"), 2))
        .orderBy("epoch", "key")
    }),

    // ---- M3: partial-histogram merge (two-phase aggregation) ----
    "m3_partial_merge" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type").as("key"), (col("user_id") % 4).as("shard"))
        .agg(count(lit(1)).as("pc"))
        .groupBy("key").agg(sum(col("pc")).as("count"))
        .orderBy("key")
    }),

    // ---- T1/T2: histogram sort + top-k ----
    "t2_topk_words" -> ((s, d) => {
      CoreOps.tokenize(Tables.documents(s, d), "text")
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20)
    }),

    // ---- §2.7: utility metrics L0/Linf/L1/L2 via full-outer join ----
    "utility_metrics" -> ((s, d) => {
      val bounded = CoreOps.boundContributions(Tables.events(s, d), "user_id", "event_id", BoundC)
        .withColumn("value", CoreOps.clamp(col("value"), ClampL))
        .groupBy(col("event_type").as("key"))
        .agg(round(sum(col("value"))).cast("long").as("count"))
      val truth = Tables.events(s, d)
        .groupBy(col("event_type").as("key"))
        .agg(round(sum(col("value"))).cast("long").as("count"))
      CoreOps.utilityMetrics(bounded, truth)
        .select(col("l0"), round(col("linf"), 2).as("linf"),
          round(col("l1"), 2).as("l1"), round(col("l2"), 4).as("l2"))
    }),

    // ---- relational surface: aggregation, joins, windows, pushdown ----
    "q_tpch1_pricing" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q_join_mktsegment_revenue" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = broadcast(Tables.customer(s, d))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("cnt"))
        .orderBy("c_mktsegment")
    }),

    "q_semi_anti_counts" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey")).distinct()
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .agg(sum(when(col("o_custkey").isNotNull, 1L).otherwise(0L)).as("with_orders"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("without_orders"))
    }),

    "q_window_running_qty" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // (l_orderkey, l_linenumber) is NOT unique in this synthetic data —
      // the window order lists every payload column so the cumulative sum is
      // well-defined as a multiset, and the final sort appends running_qty to
      // break remaining full-duplicate ties deterministically.
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_partkey"))
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double").as("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
    }),

    "q_pushdown_filtered_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .where(col("l_returnflag") === "A")
        .groupBy(year(col("l_shipdate")).cast("long").as("yr"),
          month(col("l_shipdate")).cast("long").as("mo"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .orderBy("yr", "mo")
    })
  )

  /** DuckDB-equivalent SQL per query; column names and ordering must match the
    * Spark result exactly (the driver sorts columns by name and hash-compares
    * values). */
  def oracleSql: Map[String, String] = Map(

    "p1_tokenize_wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,

    "p3_clamp_histogram" ->
      s"""SELECT event_type, round(sum(greatest(-$ClampL, least($ClampL, value))), 2) AS clamped_sum
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "p4_routing_hash" ->
      """SELECT DISTINCT event_type, sha256('word:' || event_type) AS routing_key
        |FROM events ORDER BY event_type""".stripMargin,

    "p5_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS cnt
        |FROM events GROUP BY k ORDER BY k""".stripMargin,

    "b1_bounding_histogram" ->
      s"""SELECT event_type, count(*) AS cnt, round(sum(value), 2) AS value_sum
         |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn FROM events)
         |WHERE rn <= $BoundC GROUP BY event_type ORDER BY event_type""".stripMargin,

    "b1_user_admitted_counts" ->
      s"""SELECT user_id, least(count(*), $BoundC) AS admitted
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a2_preagg" ->
      """SELECT event_type AS key, CAST(EXTRACT(day FROM ts) AS BIGINT) AS epoch,
        |       round(sum(value), 2) AS delta_v, count(DISTINCT user_id) AS unique_users
        |FROM events GROUP BY key, epoch ORDER BY key, epoch""".stripMargin,

    "a6_unique_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS unique_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "dp_sigma0_mu0_histogram" ->
      s"""WITH bounded AS (
         |  SELECT event_type, greatest(-$ClampL, least($ClampL, value)) AS v
         |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn FROM events)
         |  WHERE rn <= $BoundC)
         |SELECT event_type AS key, CAST(round(sum(v)) AS BIGINT) AS "count"
         |FROM bounded GROUP BY key ORDER BY "count" DESC, key""".stripMargin,

    "dp_sigma0_mu_gate" ->
      s"""SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS key, count(*) AS "count"
         |FROM events GROUP BY key HAVING count(DISTINCT user_id) >= $MuGate
         |ORDER BY "count" DESC, key""".stripMargin,

    "dp_carryforward_timeline" ->
      """WITH pre AS (
        |  SELECT event_type AS key, CAST(EXTRACT(day FROM ts) AS BIGINT) AS epoch, sum(value) AS delta_v
        |  FROM events GROUP BY key, epoch)
        |SELECT epoch, key, round(sum(delta_v) OVER (PARTITION BY key ORDER BY epoch), 2) AS cum_sum
        |FROM pre ORDER BY epoch, key""".stripMargin,

    "m3_partial_merge" ->
      """WITH partials AS (
        |  SELECT event_type AS key, user_id % 4 AS shard, count(*) AS pc
        |  FROM events GROUP BY key, shard)
        |SELECT key, sum(pc) AS "count" FROM partials GROUP BY key ORDER BY key""".stripMargin,

    "t2_topk_words" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin,

    "utility_metrics" ->
      s"""WITH bounded AS (
         |  SELECT event_type AS key, CAST(round(sum(greatest(-$ClampL, least($ClampL, value)))) AS BIGINT) AS c
         |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn FROM events)
         |  WHERE rn <= $BoundC GROUP BY event_type),
         |truth AS (
         |  SELECT event_type AS key, CAST(round(sum(value)) AS BIGINT) AS c
         |  FROM events GROUP BY event_type),
         |j AS (
         |  SELECT coalesce(CAST(bounded.c AS DOUBLE), 0.0) AS d, coalesce(CAST(truth.c AS DOUBLE), 0.0) AS g
         |  FROM bounded FULL OUTER JOIN truth ON bounded.key = truth.key)
         |SELECT sum(CASE WHEN d <> 0.0 THEN 1 ELSE 0 END) AS l0,
         |       round(max(abs(d - g)), 2) AS linf,
         |       round(sum(abs(d - g)), 2) AS l1,
         |       round(sqrt(sum((d - g) * (d - g))), 4) AS l2
         |FROM j""".stripMargin,

    "q_tpch1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_mktsegment_revenue" ->
      """SELECT c_mktsegment,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_semi_anti_counts" ->
      """SELECT sum(CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS with_orders,
        |       sum(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END) AS without_orders
        |FROM customer c LEFT OUTER JOIN (SELECT DISTINCT o_custkey FROM orders) o
        |  ON c.c_custkey = o.o_custkey""".stripMargin,

    "q_window_running_qty" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |         PARTITION BY l_suppkey
        |         ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_partkey) AS DOUBLE) AS running_qty
        |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty""".stripMargin,

    "q_pushdown_filtered_agg" ->
      """SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
        |       CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS mo,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem WHERE l_returnflag = 'A'
        |GROUP BY yr, mo ORDER BY yr, mo""".stripMargin
  )
}
