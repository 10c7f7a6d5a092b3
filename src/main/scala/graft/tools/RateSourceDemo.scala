package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables
import graft.dp.DpParams
import graft.streaming.{Contribution, StreamingPipelines, UtilitySink}

/** S1 parity — rate-driven live topology: `format("rate")` rows joined
  * against a broadcast documents table stand in for RandomJokeSpout
  * (RandomJokeSpout.java:23-79: pick a pseudo-random record every tick),
  * tokenized, bounded, DP-aggregated per processing-time epoch, with the K2
  * utility CSV appended every trigger.
  *
  * Run: sbt 'runMain graft.tools.RateSourceDemo [seconds] [sfDir]'
  */
object RateSourceDemo {
  def main(args: Array[String]): Unit = {
    val runSecs = args.headOption.map(_.toInt).getOrElse(15)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.checkpointLocation", s"/tmp/graft_rate_ckpt_${System.nanoTime()}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nDocs = docs.length
    val docsB = spark.sparkContext.broadcast(docs)

    // epoch = seconds since stream start / 2 (2-second processing-time epochs)
    val t0 = System.currentTimeMillis()
    val contributions = spark.readStream.format("rate")
      .option("rowsPerSecond", 200).load()
      .as[(java.sql.Timestamp, Long)]
      .mapPartitions { it =>
        val local = docsB.value
        it.flatMap { case (ts, v) =>
          val (docId, text) = local((v % nDocs).toInt)
          val epoch = math.min(((ts.getTime - t0) / 2000L).toInt.max(0), 30)
          text.toLowerCase.split("\\W+").iterator.filter(_.nonEmpty)
            .map(w => Contribution(w, epoch, s"u$docId", 1.0))
        }
      }

    val params = DpParams.zeroNoise(32, mu = 0)
    val releases = StreamingPipelines.dpHistogram(
      StreamingPipelines.boundContributions(contributions, c = 100000), params)

    val csv = s"/tmp/graft_utility_${System.nanoTime()}.csv"
    val sink = new UtilitySink(csv, () => Map.empty)
    val q = sink.start(releases, s"/tmp/graft_rate_sink_${System.nanoTime()}")
    Thread.sleep(runSecs * 1000L)
    q.stop()

    val hist = sink.currentHistogram.toSeq.sortBy(-_._2).take(10)
    println(s"[rate-demo] processed ${sink.currentHistogram.size} keys; top10: $hist")
    println(s"[rate-demo] utility csv at $csv:")
    scala.io.Source.fromFile(csv).getLines().take(5).foreach(l => println(s"[rate-demo] $l"))
    spark.stop()
    if (sink.currentHistogram.isEmpty) sys.exit(1)
  }
}
