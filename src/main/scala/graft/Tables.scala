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
  /** events.parquet's `ts` physical unit has varied across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects
    * during schema conversion) and TIMESTAMP(MICROS)/NTZ. Detect which form
    * this file uses from the inferred footer schema and normalize to the
    * same two columns either way: exact integer `ts_ns` plus a µs-precision
    * `ts` timestamp. The DuckDB oracle side (`epoch_ns(ts)`, `EXTRACT(day
    * FROM ts)`) adapts to the physical unit automatically, so this loader
    * must too — hard-assuming nanos broke every events gate when the driver
    * regenerated the data with µs storage (CORRECTNESS_r08).
    * NTZ wall times are interpreted as UTC instants EXPLICITLY in the
    * loader (convert_timezone from UTC into the ambient session zone
    * before the session-zone NTZ→LTZ cast), so the result is the same
    * whether or not the caller pinned spark.sql.session.timeZone=UTC. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val path = s"$d/events.parquet"
    val inferredTs = scala.util.Try(s.read.parquet(path).schema("ts").dataType)
    inferredTs match {
      case scala.util.Success(TimestampType) =>
        s.read.parquet(path)
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
          .select("event_id", "ts_ns", "user_id", "event_type", "value", "props", "ts")
      case scala.util.Success(TimestampNTZType) =>
        // The NTZ wall time is a UTC instant by testdata construction.
        // Epoch micros come from PURE wall-clock arithmetic (timestampdiff
        // against the NTZ epoch) — no timezone conversion anywhere, so the
        // result is identical under ANY session timeZone, including DST
        // fall-back overlap hours where a convert-then-cast round trip
        // must guess an offset for the repeated local hour.
        s.read.parquet(path)
          // integer `div`, NOT Column./ — double division of ~1.8e18 ns
          // values loses low bits (> 2^53) and shifts ts by 1 µs on ~1.5%
          // of rows
          .withColumn("ts_ns",
            expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)") * 1000L)
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
          .select("event_id", "ts_ns", "user_id", "event_type", "value", "props", "ts")
      case _ =>
        // TIMESTAMP(NANOS) storage: schema conversion fails (or infers LONG),
        // so read the raw INT64 nanos via an explicit schema.
        s.read
          .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
          .parquet(path)
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
