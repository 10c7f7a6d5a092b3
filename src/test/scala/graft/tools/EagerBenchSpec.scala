package graft.tools

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fail-closed behavior of the tws-timers eager arm: a quiescence deadline
  * exit must surface as an exception (→ a failed -1 bench entry), never as a
  * wall-clock time — the r6 bench recorded its own 180 s deadline as the
  * arm's "measurement" twice, and a converged run must actually converge.
  */
class EagerBenchSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("a deadline exit throws NotConverged instead of returning a partial count") {
    val byEpoch = EagerBench.workload(spark, 2000L, 200, 50, 4)
    val e = intercept[EagerBench.NotConverged] {
      // 1 ms deadline: phase 1 cannot possibly finish → must fail closed
      EagerBench.runTwsTimers(spark, byEpoch, 4, 42L, deadlineMs = 1L)
    }
    assert(e.getMessage.contains("deadline"))
  }

  test("a small workload converges inside the deadline with a nonzero release count") {
    val byEpoch = EagerBench.workload(spark, 2000L, 200, 50, 4)
    val n = EagerBench.runTwsTimers(spark, byEpoch, 4, 42L, deadlineMs = 120000L)
    assert(n > 0L)
    // same seeds ⇒ the barrier design must emit the same number of releases
    val sharded = EagerBench.runSharded(spark, byEpoch, 4, 42L, numShards = 4)
    assert(n === sharded)
  }
}
