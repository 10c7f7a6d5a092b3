package graft.tools

import org.apache.spark.scheduler._

import scala.collection.mutable

/** Per-query stage/task/shuffle metrics collector — the Spark-native analogue
  * of the reference's per-bolt profiler
  * (`confidentialstorm/host/src/main/java/ch/usi/inf/confidentialstorm/host/profiling/BoltProfiler.java`:
  * per-bolt ECALL timings, tuple counters, lifecycle CSVs). On Spark the
  * scheduler already measures every stage and task, so parity is an attribution
  * problem, not a measurement one: the bench wraps each query in
  * `sc.setJobGroup(queryName, …)` and this listener buckets each completed
  * stage under the job group of the job that submitted it.
  *
  * Scale note: the listener keeps one small accumulator per query name (a few
  * counters), independent of data size or task count — safe at any scale.
  */
final class QueryProfiler extends SparkListener {

  final case class QueryMetrics(
      var stages: Int = 0,
      var tasks: Int = 0,
      var taskTimeMs: Long = 0L,
      var shuffleReadBytes: Long = 0L,
      var shuffleWriteBytes: Long = 0L,
      var inputBytes: Long = 0L,
      var outputRows: Long = 0L,
      var spilledBytes: Long = 0L) {
    def jsonFields: String =
      s""""stages":$stages,"tasks":$tasks,"task_time_ms":$taskTimeMs,""" +
        s""""shuffle_read_bytes":$shuffleReadBytes,"shuffle_write_bytes":$shuffleWriteBytes,""" +
        s""""input_bytes":$inputBytes,"spilled_bytes":$spilledBytes"""
  }

  private val stageGroup = mutable.Map[Int, String]() // stageId -> job group
  private val byGroup = mutable.Map[String, QueryMetrics]()

  override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
    val group = Option(e.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
      .getOrElse("")
    if (group.nonEmpty) e.stageIds.foreach(stageGroup(_) = group)
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
    val si = e.stageInfo
    stageGroup.remove(si.stageId).foreach { group =>
      val acc = byGroup.getOrElseUpdate(group, QueryMetrics())
      acc.stages += 1
      acc.tasks += si.numTasks
      val m = si.taskMetrics
      if (m != null) {
        acc.taskTimeMs += m.executorRunTime
        acc.shuffleReadBytes += m.shuffleReadMetrics.totalBytesRead
        acc.shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
        acc.inputBytes += m.inputMetrics.bytesRead
        acc.outputRows += m.outputMetrics.recordsWritten
        acc.spilledBytes += m.memoryBytesSpilled
      }
    }
  }

  /** Immutable copy of the per-query metrics collected so far. Call
    * `ListenerBridge.waitUntilEmpty` first so async events have drained. */
  def snapshot: Map[String, QueryMetrics] = synchronized {
    byGroup.map { case (k, v) => k -> v.copy() }.toMap
  }
}
