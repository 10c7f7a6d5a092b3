package graft

import org.apache.spark.sql.SparkSession

/** t1-smoke parity: runs [[SparkEntry.entry]] on sf0.001 and prints the row
  * count + head, as the driver's smoke check does. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.show(10, truncate = false)
    spark.stop()
  }
}
