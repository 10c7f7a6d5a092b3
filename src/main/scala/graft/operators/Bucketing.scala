package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-storage co-location: write a table pre-hash-partitioned (and
  * optionally sorted) on its join/aggregation key so that every subsequent
  * equi-join or aggregation on that key runs WITHOUT a shuffle — Spark reads
  * each bucket as one partition whose `outputPartitioning` already satisfies
  * the join's distribution requirement.
  *
  * This is the storage-level answer to the biggest cost at 100 TB: a fact
  * table joined repeatedly on the same key (lineitem ⋈ orders on orderkey,
  * contributions ⋈ user dimensions on user_id) pays its shuffle ONCE at
  * write time instead of on every query. Both sides must agree on bucket
  * count and key; sorting within buckets additionally removes the sort
  * under SortMergeJoin.
  *
  * The reference has no storage tier (Storm pipes tuples); its analogue is
  * the fieldsGrouping that keeps a key on one bolt instance for the
  * topology's lifetime (TopologySpecification.java:37-71) — bucketing is the
  * same co-location promise made durable.
  */
object Bucketing {

  /** Writes `df` as a bucketed parquet table in the session catalog.
    * `buckets` should be sized so one bucket ≈ one healthy task input
    * (128–512 MB at scale). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True iff the EXECUTED plan of `df` contains no shuffle exchange — the
    * co-location check specs and plan audits assert. */
  def shuffleFree(df: DataFrame): Boolean = {
    df.collect() // force execution so AQE finalizes the plan
    !df.queryExecution.executedPlan.toString.contains("ShuffleExchange") &&
      !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
  }
}
