package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.dp.DpParams
import graft.sources.SyntheticSource
import graft.streaming.{Contribution, DpStatefulProcessor, StreamingPipelines}

/** A/B harness for the two EAGER Algorithm-3 implementations — the designs
  * that surface a silent predicted release mid-stream instead of deferring
  * it to the key's next appearance:
  *
  *   - sharded state + [[StreamingPipelines.EpochTick]] barrier
  *     ([[StreamingPipelines.dpHistogramEager]]): the driver feeds one tick
  *     per epoch AFTER that epoch's data is processed, so the replay runs
  *     2 synchronous barriers (`processAllAvailable`) per epoch — the
  *     coordination cost is part of the design and is measured here;
  *   - per-key `transformWithState` + processing-time timers
  *     ([[DpStatefulProcessor.dpHistogram]] with `timers = true`): no
  *     barrier at all — epochs are fed without synchronization, the engine
  *     triggers itself while timers are pending, and the run ends when the
  *     sink quiesces. Timer latency and continuous trigger evaluation are
  *     that design's cost, equally part of the measurement.
  *
  * Each run returns the release count so the caller can cross-check that
  * both designs emitted the same number of releases (identical params and
  * seeds ⇒ identical release sets; equality of values is pinned by
  * StreamingSpec/TransformWithStateSpec, the bench only compares counts).
  */
object EagerBench {

  /** Seeded params exercising the silent-release machinery: sigmaKey > 0 so
    * Algorithm 3 actually predicts, sigmaHist = 0 so release values stay
    * exact across designs. */
  def params(t: Int): DpParams = DpParams(
    sigmaKey = 5.0, sigmaHist = 0.0,
    thresholdQuantile = graft.dp.Stats.inverseNormalCdf(1 - 0.4),
    maxTimeSteps = t, mu = 2, maxContributionsPerUser = 32)

  /** Deterministic replay workload, grouped by epoch in replay order. */
  def workload(spark: SparkSession, n: Long, numUsers: Int, numKeys: Int,
      t: Int): Seq[(Int, Seq[Contribution])] =
    SyntheticSource.zipfContributions(spark, n, numUsers, numKeys, t)
      .collect().toSeq.groupBy(_.epoch).toSeq.sortBy(_._1)

  private def ckptDir(tag: String): String =
    s"/tmp/graft_eagerbench_${tag}_${System.nanoTime()}"

  /** All three arms run under the SAME state-store backend (RocksDB) so the
    * A/B isolates operator design from provider choice — runSharded on the
    * session-default HDFS-backed store while the other arms pinned RocksDB
    * would conflate the two. */
  private def withRocksDb[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  def runSharded(spark: SparkSession, byEpoch: Seq[(Int, Seq[Contribution])],
      t: Int, runSeed: Long, numShards: Int): Long = withRocksDb(spark) {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Contribution]
    val ticks = MemoryStream[StreamingPipelines.EpochTick]
    val name = s"eager_sharded_${System.nanoTime()}"
    val q = StreamingPipelines.dpHistogramEager(mem.toDS(), ticks.toDS(), params(t), runSeed, numShards)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation", ckptDir("sharded")).start()
    try {
      byEpoch.foreach { case (e, rows) =>
        mem.addData(rows)
        q.processAllAvailable()
        ticks.addData(StreamingPipelines.EpochTick(e))
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name).count()
  }

  /** Lazy comparator: same per-key operator with timers OFF (silent releases
    * defer to the key's next appearance / the batch replay), fed without
    * barriers — the floor that the eager designs' coordination overhead is
    * measured against. */
  def runLazy(spark: SparkSession, byEpoch: Seq[(Int, Seq[Contribution])],
      t: Int, runSeed: Long): Long = withRocksDb(spark) {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Contribution]
    val name = s"eager_lazy_${System.nanoTime()}"
    val q = DpStatefulProcessor.dpHistogram(mem.toDS(), params(t), runSeed, timers = false)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation", ckptDir("lazy")).start()
    try {
      byEpoch.foreach { case (_, rows) => mem.addData(rows) }
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).count()
  }

  def runTwsTimers(spark: SparkSession, byEpoch: Seq[(Int, Seq[Contribution])],
      t: Int, runSeed: Long, deadlineMs: Long = 180000L): Long = withRocksDb(spark) {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Contribution]
    val name = s"eager_tws_${System.nanoTime()}"
    val q = DpStatefulProcessor.dpHistogram(mem.toDS(), params(t), runSeed, timers = true)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation", ckptDir("tws")).start()
    try {
      // no barrier: the engine consumes at its own cadence (with timers
      // pending it triggers continuously, so processAllAvailable would
      // never settle — poll the sink for quiescence instead)
      byEpoch.foreach { case (_, rows) => mem.addData(rows) }
      val totalFed = byEpoch.iterator.map(_._2.size.toLong).sum
      val deadline = System.currentTimeMillis() + deadlineMs
      // Phase 1: block until the engine has CONSUMED every fed row. The
      // harness knows the exact count, so quiescence may not even begin to
      // be judged before then — on a loaded machine the first micro-batch
      // can take seconds, and a stability poll that starts immediately sees
      // a stable empty sink and declares an empty run finished (the r5
      // vacuous A/B: sharded=42934 vs tws=0). Progress entries are deduped
      // by batchId; at a 300 ms poll the retained progress buffer (100)
      // cannot wrap between polls.
      val seenBatches = scala.collection.mutable.HashSet.empty[Long]
      var consumed = 0L
      def pollConsumed(): Unit = q.recentProgress.foreach { p =>
        if (seenBatches.add(p.batchId)) consumed += p.numInputRows
      }
      while (consumed < totalFed && System.currentTimeMillis() < deadline) {
        Thread.sleep(300)
        pollConsumed()
      }
      if (consumed < totalFed)
        System.err.println(s"[eagerbench] WARN: deadline hit with input only partially " +
          s"consumed ($consumed of $totalFed rows); release count will be partial")
      // Phase 2: sink quiescence — and a zero count NEVER counts as stable
      // (params() guarantees releases: sigmaKey > 0 with a 0.4 failure
      // quantile), so a slow timer flush cannot masquerade as completion.
      var last = -1L
      var stable = 0
      while (stable < 5 && System.currentTimeMillis() < deadline) {
        Thread.sleep(300)
        val c = spark.table(name).count()
        if (c == last && c > 0) stable += 1 else { stable = 0; last = c }
      }
      if (stable < 5)
        // a deadline exit means the count below may be partial — say so
        // loudly instead of letting it masquerade as an A/B difference
        System.err.println(s"[eagerbench] WARN: quiescence deadline hit after ${deadlineMs}ms; " +
          s"release count may be partial (last=$last)")
    } finally q.stop()
    spark.table(name).count()
  }
}
