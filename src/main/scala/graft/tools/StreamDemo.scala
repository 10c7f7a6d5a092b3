package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dp.DpParams
import graft.operators.{CoreOps, DpHistogram}
import graft.streaming.{Contribution, StreamingPipelines}

/** End-to-end streaming replay: feeds the events table epoch-by-epoch through
  * the streaming DP pipeline (bound → dp → carry-forward sink) and prints the
  * final histogram next to the batch operator's result. Exit code 1 on
  * divergence. Run: sbt 'runMain graft.tools.StreamDemo [sfDir] [fmgws|tws]'
  * — `tws` uses the transformWithState operator on the RocksDB state store. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val useTws = args.lift(1).contains("tws")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.checkpointLocation", s"/tmp/graft_demo_ckpt_${System.nanoTime()}")
      .config("spark.sql.streaming.stateStore.providerClass",
        if (useTws) "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        else "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val params = DpParams.zeroNoise(32, mu = 10)
    val contributions = Tables.events(spark, sfDir)
      .select(col("event_type"), dayofmonth(col("ts")).cast("int"), col("user_id").cast("string"), col("value"))
      .collect()
      .map(r => Contribution(r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .toSeq

    val mem = MemoryStream[Contribution]
    val boundedStream = StreamingPipelines.boundContributions(mem.toDS(), c = 1000)
    val releases =
      if (useTws) graft.streaming.DpStatefulProcessor.dpHistogram(boundedStream, params)
      else StreamingPipelines.dpHistogram(boundedStream, params)
    println(s"[stream] operator=${if (useTws) "transformWithState+RocksDB" else "flatMapGroupsWithState"}")
    val q = StreamingPipelines.carryForwardSink(releases, "demo")
    val epochs = contributions.groupBy(_.epoch).toSeq.sortBy(_._1)
    try {
      epochs.foreach { case (epoch, rows) =>
        mem.addData(rows)
        q.processAllAvailable()
        val released = spark.table("demo").where(col("epoch") === epoch).count()
        println(s"[stream] epoch=$epoch in=${rows.size} releases=$released")
      }
    } finally q.stop()

    val streamed = spark.table("demo").orderBy(col("epoch")).collect()
      .foldLeft(Map.empty[String, Long]) { (acc, r) => acc + (r.getString(0) -> r.getLong(2)) }

    val events = Tables.events(spark, sfDir)
      .select(col("event_type").as("key"), dayofmonth(col("ts")).cast("int").as("epoch"),
        col("user_id").cast("string").as("user_id"), col("value"))
    val bounded = CoreOps.boundContributions(events, "user_id", "epoch", 1000L)
    val batch = DpHistogram.run(spark, CoreOps.preAggregate(bounded, "key", "epoch", "user_id", "value"), params)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

    println(s"[stream] final histogram: ${streamed.toSeq.sortBy(-_._2)}")
    println(s"[batch]  final histogram: ${batch.toSeq.sortBy(-_._2)}")
    val ok = streamed == batch
    println(s"[verdict] streaming == batch: $ok")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
