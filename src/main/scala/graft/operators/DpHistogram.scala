package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dp._

/** Distributed batch execution of the DP-SQLP mechanism over an epoched
  * dataset — the Spark-native restatement of the reference's
  * DataPerturbation → HistogramAggregation stages (SURVEY §2.4/§2.5).
  *
  * Plan shape (designed for 100 TB):
  *
  *  1. [[CoreOps.preAggregatePrevEpoch]] — per (key, epoch): ΔV plus the
  *     previous-appearance-epoch histogram of its users. Every shuffle up to
  *     here runs at (key, user) or finer granularity, so a Zipf-hot key
  *     spreads across partitions; the terminal row is O(T), never O(users) —
  *     no user identity reaches per-key state.
  *  2. `groupByKey(key).flatMapGroups` — one shuffle by key; each key's ≤T
  *     epoch rows are folded through [[graft.dp.DpKeyState]] in epoch order
  *     via `processEpochPrevCounts` (exact new-user counting against the
  *     round-start epoch). The per-key timeline (tree state, Algo 3 predicted
  *     silent-epoch releases) is processed entirely inside the group, so no
  *     driver-side loop and no cross-key coordination — the reference's
  *     ZooKeeper epoch barrier (EpochBarrierCoordinator.java) has no residue
  *     here.
  *
  * State is O(keys × T); data volume only affects stage 1, which scales
  * linearly and shuffles pre-aggregated rows.
  */
object DpHistogram {

  private type EpochRow = (String, Int, Double, Seq[(Int, Long)])

  private def toEpochRows(preAgg: DataFrame) =
    preAgg.select(col("key").cast("string"), col("epoch").cast("int"),
      col("delta_v").cast("double"), col("prev_counts").cast("array<struct<prev:int,n:bigint>>"))

  /** Event-driven epoch walk for one key: processes the appearance epochs in
    * order plus, between them, the (at most one outstanding) Algorithm-3
    * predicted-release epoch. Exactly equivalent to stepping 0..T — every
    * other epoch is a no-op there by construction (no data, no prediction
    * due, and a prediction is only ever set by an unselected APPEARANCE and
    * consumed at its epoch) — but O(appearances + releases) instead of O(T)
    * per key, which matters once T is large and keys are sparse. */
  private def walkEpochs[D](state: DpKeyState, byEpoch: Map[Int, D], maxTimeSteps: Int,
      processData: (Int, D) => Option[Double])(emit: (Int, Option[Double]) => Unit): Unit = {
    val epochs = byEpoch.keysIterator.toArray
    java.util.Arrays.sort(epochs)
    var i = 0
    while (i < epochs.length) {
      val e = epochs(i)
      var p = state.predictedRelease.getOrElse(-1)
      while (p >= 0 && p < e) {
        emit(p, state.processEpochPrevCounts(p, Nil, 0.0, appeared = false))
        p = state.predictedRelease.getOrElse(-1)
      }
      emit(e, processData(e, byEpoch(e)))
      i += 1
    }
    var p = state.predictedRelease.getOrElse(-1)
    while (p >= 0 && p < maxTimeSteps) {
      emit(p, state.processEpochPrevCounts(p, Nil, 0.0, appeared = false))
      p = state.predictedRelease.getOrElse(-1)
    }
  }

  /** Final released histogram after running all epochs: (key, count), count
    * desc / key asc, negatives clamped — matching
    * StreamingDPMechanism.produceHistogram (:517-531).
    *
    * @param preAgg  output of [[CoreOps.preAggregatePrevEpoch]]:
    *                (key, epoch, delta_v, prev_counts)
    * @param params  calibrated or zero-noise DP parameters
    * @param runSeed seed for deterministic noise (ignored when σ=0)
    */
  def run(spark: SparkSession, preAgg: DataFrame, params: DpParams, runSeed: Long = 42L): DataFrame = {
    import spark.implicits._

    val result = toEpochRows(preAgg)
      .as[EpochRow]
      .groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        val state = stateFor(key, params, runSeed)
        val byEpoch = rows.map(r => (r._2, (r._3, r._4))).toMap
        walkEpochs(state, byEpoch, params.maxTimeSteps,
          (e: Int, d: (Double, Seq[(Int, Long)])) =>
            state.processEpochPrevCounts(e, d._2, d._1, appeared = true))((_, _) => ())
        state.currentSum.map(s => (key, math.max(0L, math.round(s)))).iterator
      }
      .toDF("key", "count")

    result.orderBy(col("count").desc, col("key"))
  }

  /** [[run]] over the identity-carrying pre-aggregation
    * ([[CoreOps.preAggregate]]: (key, epoch, delta_v, users)): per-key state
    * dedups user IDENTITIES against the round's observed set — O(round
    * users) state, the design [[CoreOps.preAggregatePrevEpoch]] replaced as
    * the scale default because a Zipf-hot key's row carries every user
    * string. Kept as the small-data fast path (one aggregation, no lag
    * window) and as the A/B comparator the bench tracks; mechanism
    * semantics and released values are identical. */
  def runUsers(spark: SparkSession, preAgg: DataFrame, params: DpParams, runSeed: Long = 42L): DataFrame = {
    import spark.implicits._
    val result = preAgg.select(col("key").cast("string"), col("epoch").cast("int"),
        col("delta_v").cast("double"), col("users").cast("array<string>"))
      .as[(String, Int, Double, Seq[String])]
      .groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        val state = stateFor(key, params, runSeed)
        val byEpoch = rows.map(r => (r._2, (r._3, r._4))).toMap
        walkEpochs(state, byEpoch, params.maxTimeSteps,
          (e: Int, d: (Double, Seq[String])) =>
            state.processEpoch(e, d._2, d._1, appeared = true))((_, _) => ())
        state.currentSum.map(s => (key, math.max(0L, math.round(s)))).iterator
      }
      .toDF("key", "count")
    result.orderBy(col("count").desc, col("key"))
  }

  /** Per-epoch released timeline: (epoch, key, count) for every epoch at which
    * the key's released sum changes — the batch replay of what the streaming
    * pipeline emits per trigger. */
  def timeline(spark: SparkSession, preAgg: DataFrame, params: DpParams, runSeed: Long = 42L): DataFrame = {
    import spark.implicits._

    toEpochRows(preAgg)
      .as[EpochRow]
      .groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        val state = stateFor(key, params, runSeed)
        val byEpoch = rows.map(r => (r._2, (r._3, r._4))).toMap
        val out = Seq.newBuilder[(Int, String, Long)]
        walkEpochs(state, byEpoch, params.maxTimeSteps,
          (e: Int, d: (Double, Seq[(Int, Long)])) =>
            state.processEpochPrevCounts(e, d._2, d._1, appeared = true)) { (epoch, released) =>
          released.foreach(s => out += ((epoch, key, math.max(0L, math.round(s)))))
        }
        out.result().iterator
      }
      .toDF("epoch", "key", "count")
  }

  private def stateFor(key: String, params: DpParams, runSeed: Long): DpKeyState =
    new DpKeyState(
      params,
      TreeSpec(params.maxTimeSteps, params.sigmaKey,
        NoiseSource.seeded(NoiseSource.seedFor(runSeed, key, "key"))),
      TreeSpec(params.maxTimeSteps, params.sigmaHist,
        NoiseSource.seeded(NoiseSource.seedFor(runSeed, key, "hist"))))
}
