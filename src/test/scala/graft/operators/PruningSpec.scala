package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables

/** Pins directory-level partition pruning — the layout counterpart of the
  * q_pushdown gate's row-group filter pushdown: a filter on the partition
  * column must reach the scan as a PartitionFilter (pruned BEFORE listing
  * file contents), not as a post-scan Filter. At 100 TB the difference is
  * listing one date directory vs the whole table. */
class PruningSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("partition-column filter becomes a PartitionFilter at the scan") {
    val dir = s"/tmp/graft_prune_${System.nanoTime()}"
    Tables.events(spark, "/root/testdata/sf0.001")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir)
      .where(col("event_type") === "click")
      .agg(sum(col("value")).as("s"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"filter did not become a partition filter:\n${plan.take(1500)}")

    // and the pruned scan touches only the one matching directory
    val matched = spark.read.parquet(dir).where(col("event_type") === "click")
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(matched.nonEmpty && matched.forall(_.contains("event_type=click")))
  }
}
