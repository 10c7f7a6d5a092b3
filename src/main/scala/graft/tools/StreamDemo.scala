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
  * divergence. Run: sbt 'runMain graft.tools.StreamDemo [sfDir] [mode]'
  * where mode ∈ {fmgws (default), tws, sealed} — `tws` uses
  * transformWithState on RocksDB; `sealed` runs the confidential pipeline
  * (AES-GCM-sealed tuples unsealed mid-stream). */
private object SealedColumnsJson {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  def render(key: Column, epoch: Column, userId: Column, value: Column): Column =
    concat(lit("""{"key":""""), key, lit("""","epoch":"""), epoch,
      lit(""","userId":""""), userId, lit("""","value":"""), value, lit("}"))
}

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

    val useSealed = args.lift(1).contains("sealed")
    val mem = MemoryStream[Contribution]
    val inputStream =
      if (useSealed) {
        // confidential mode: seal each contribution as routed JSON, then
        // route-validate + unseal mid-stream via the native expression
        val codec = new graft.operators.SealedColumns.Codec(graft.crypto.SealedPayload.testKey, "aes-gcm")
        val sealedDf = mem.toDS().toDF()
          .select(SealedColumnsJson.render(col("key"), col("epoch"), col("userId"), col("value")).as("plainJson"),
            (col("epoch").cast("long") * 1000000L + abs(hash(col("key"), col("userId"))).cast("long")).as("seq"))
          .select(graft.operators.SealedColumns.sealColumn(col("plainJson"), col("seq"),
            "spout", "dp", concat(lit("p"), col("seq") % 4), codec).as("payload"))
        StreamingPipelines.unsealContributions(sealedDf,
          graft.crypto.SealedPayload.testKey, "aes-gcm", "spout", "dp")
      } else mem.toDS()
    val boundedStream = StreamingPipelines.boundContributions(inputStream, c = 1000)
    val releases =
      if (useTws) graft.streaming.DpStatefulProcessor.dpHistogram(boundedStream, params)
      else StreamingPipelines.dpHistogram(boundedStream, params)
    println(s"[stream] operator=${if (useTws) "transformWithState+RocksDB" else "flatMapGroupsWithState"}" +
      (if (useSealed) " mode=confidential(sealed AES-GCM)" else ""))
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
    val batch = DpHistogram.run(spark, CoreOps.preAggregatePrevEpoch(bounded, "key", "epoch", "user_id", "value"), params)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap

    println(s"[stream] final histogram: ${streamed.toSeq.sortBy(-_._2)}")
    println(s"[batch]  final histogram: ${batch.toSeq.sortBy(-_._2)}")
    val ok = streamed == batch
    println(s"[verdict] streaming == batch: $ok")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
