package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-provided testdata layout
  * (TESTDATA.md): one parquet per table under the scale-factor dir. */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects during schema conversion. Read it as raw INT64 nanos via
    * an explicit schema (works regardless of session conf — no reliance on
    * `spark.sql.legacy.parquet.nanosAsLong`) and expose both `ts_ns` and a
    * micro-truncated `ts` timestamp column. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    s.read
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$d/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros((col("ts_ns") / 1000L).cast("long")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
