package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.dp.{Mix, ZipfMandelbrot}
import graft.streaming.Contribution

/** Synthetic DP-SQLP workload generator — Spark-native restatement of the
  * reference's SyntheticSpout (S3,
  * examples/synthetic-benchmark-confidential/host/.../SyntheticSpout.java:30-174)
  * and the byte-budget micro-batch source (S4,
  * examples/microbatch-benchmark-baseline/.../MicroBatchBaselineSpout.java:53-316).
  *
  * Paper §5.1 parameters: key ~ ZipfMandelbrot(numKeys, q=1000, s=1.4),
  * per-user contribution budget ~ ZipfMandelbrot(1e5, q=26, s=6.738).
  *
  * Scale design: `spark.range(n)` partitions the id space; every sampled
  * value derives from `mix64(seed, rowId)` so the output is deterministic
  * under any partitioning and any task retry — no per-partition RNG state.
  * The Zipf CDF (O(numKeys) doubles) is built once per partition inside
  * `mapPartitions`, not per row. The reference's BEGIN/END/ZooKeeper batch
  * protocol (≈900 LoC) maps to "one Spark job per batch": duration = job
  * wall-clock.
  */
object SyntheticSource {

  val KeyDistQ = 1000.0
  val KeyDistS = 1.4
  val UserDistN = 100000
  val UserDistQ = 26.0
  val UserDistS = 6.738

  /** `numRows` keyed unit contributions over `numEpochs` epochs. */
  def zipfContributions(
      spark: SparkSession,
      numRows: Long,
      numUsers: Int,
      numKeys: Int,
      numEpochs: Int,
      seed: Long = 42L,
      partitions: Int = 32): Dataset[Contribution] = {
    import spark.implicits._
    spark.range(0, numRows, 1, partitions).mapPartitions { ids =>
      val keyDist = new ZipfMandelbrot(numKeys, KeyDistQ, KeyDistS)
      ids.map { id =>
        val uKey = Mix.uniform01(Mix.mix64(seed ^ Mix.mix64(id)))
        val uUser = Mix.uniform01(Mix.mix64(seed ^ Mix.mix64(id + numRows)))
        // >>> 33 leaves a non-negative 31-bit value, so % is enough
        val epoch = (Mix.mix64(seed ^ Mix.mix64(id + 2 * numRows)) >>> 33).toInt % numEpochs
        Contribution(
          key = keyDist.sample(uKey).toString,
          epoch = epoch,
          userId = (1 + (uUser * numUsers).toInt.min(numUsers - 1)).toString,
          value = 1.0)
      }
    }
  }

  /** Reference §5.1-style per-user contribution budgets (capped at C). */
  def userBudgets(spark: SparkSession, numUsers: Int, c: Long, seed: Long = 42L,
      partitions: Int = 32): Dataset[(String, Long)] = {
    import spark.implicits._
    spark.range(1, numUsers + 1L, 1, partitions).mapPartitions { ids =>
      val budgetDist = new ZipfMandelbrot(UserDistN, UserDistQ, UserDistS)
      ids.map { uid =>
        val u = Mix.uniform01(Mix.mix64(seed ^ Mix.mix64(uid * 31L)))
        (uid.toString, math.min(budgetDist.sample(u).toLong, c))
      }
    }
  }

  /** Byte-budget batch sizing: the reference measures 31 B/tuple
    * (MicroBatchConfig.java:219-231); records = ceil(GB · 2^30 / 31). */
  def recordsForGb(gb: Double): Long = math.ceil(gb * (1L << 30) / 31.0).toLong
}
