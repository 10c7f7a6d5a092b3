package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dp.DpParams
import graft.operators.{CoreOps, DpHistogram}
import graft.sources.SyntheticSource

/** Per-round benchmark main: times every declared query on
  * `SPARK_GRAFT_SF_DIR` plus two synthetic DP-SQLP workloads mirroring the
  * reference's benchmark harnesses (BASELINE.md):
  *
  *   - `synthetic_dp_t20`: Zipf-keyed contributions → bounding-shaped
  *     pre-aggregation → full DP mechanism over 20 epochs (the §5.1 workload
  *     shape at reduced scale);
  *   - `microbatch_0_1gb`: byte-budget batch (0.1 GB at the reference's
  *     31 B/tuple accounting) through generate → clamp → histogram, the
  *     baseline micro-batch throughput measure (GB/s = size/duration).
  *
  * Prints exactly one JSON line: {"metric":"total","value":…,"unit":"sec",
  * "queries":{…},"sf":…}.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(body: => Long): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> (try time(fn(spark, sfDir).count()) catch { case _: Throwable => -1.0 })
    }

    def microbatch(s: org.apache.spark.sql.SparkSession, gb: Double): Double = try time {
      val n = SyntheticSource.recordsForGb(gb)
      val contrib = SyntheticSource.zipfContributions(s, n, 100000, 50000, 1)
      contrib.toDF()
        .withColumn("value", CoreOps.clamp(col("value"), 1.0))
        .groupBy("key").agg(sum(col("value")).as("count"))
        .count()
    } catch { case _: Throwable => -1.0 }

    val synthetic = Seq(
      "synthetic_dp_t20" -> (try time {
        val contrib = SyntheticSource.zipfContributions(spark, 2000000L, 100000, 50000, 20)
        val preAgg = CoreOps.preAggregate(contrib.toDF(), "key", "epoch", "userId", "value")
        DpHistogram.run(spark, preAgg, DpParams.zeroNoise(20, mu = 10)).count()
      } catch { case _: Throwable => -1.0 }),
      "microbatch_0_1gb" -> microbatch(spark, 0.1),
      // reference scaling-sweep sizes (run-scaling-benchmark.sh:27-34 uses
      // {0.5, 1, 2} GB; GB/s = size / duration, BEGIN→END == job wall-clock)
      "microbatch_0_5gb" -> microbatch(spark, 0.5),
      "microbatch_1gb" -> microbatch(spark, 1.0))

    def microbatchGbPerSec(name: String, gb: Double): Option[(String, Double)] =
      synthetic.toMap.get(name).filter(_ > 0).map(sec => (name + "_gbps", gb / sec))

    val gbps = Seq(("microbatch_0_1gb", 0.1), ("microbatch_0_5gb", 0.5), ("microbatch_1gb", 1.0))
      .flatMap { case (n, g) => microbatchGbPerSec(n, g) }

    val all = queryTimes ++ synthetic ++ gbps
    val qs = all.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = all.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
