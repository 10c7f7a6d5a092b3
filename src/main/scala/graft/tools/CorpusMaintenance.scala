package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{ExactlyOnceSink, StreamingPipelines}

/** Steady-state corpus maintenance — the operational loop a production
  * training-data pipeline runs every ingest cycle: the new batch streams
  * through [[StreamingPipelines.incrementalDedupStream]] against the
  * standing corpus (stream-static joins, no corpus self-join), admitted
  * documents are materialized EXACTLY-ONCE ([[ExactlyOnceSink]]:
  * overwrite-by-batchId parquet), and the admitted set becomes part of the
  * standing corpus for the next cycle.
  *
  * The static side of the stream-static join is fixed for the lifetime of a
  * streaming query, so each ingest cycle is its own (restartable,
  * checkpointed) query — exactly how nightly ingest behaves in production:
  * the corpus index grows BETWEEN runs, never mid-query. Within one batch,
  * documents are not compared to each other (that is batch d10b's job at
  * bootstrap); across batches, every previously admitted document IS
  * compared against, so the maintained corpus equals the batch survivor set
  * whenever batches are internally dup-free — the equivalence pinned per
  * epoch by StreamingSpec.
  */
object CorpusMaintenance {

  /** Flush rows (needed to push the event-time watermark past the batch so
    * the per-doc aggregation finalizes) use ids at or above this base and
    * are excluded from the admitted set. */
  val FlushIdBase = 1000000000L

  /** One maintenance epoch. Streams `batch` against `corpus`, materializes
    * the admitted (keep=true) decisions under `sinkDir/epoch=<epoch>`, and
    * returns the admitted doc ids (read back from the sink — the next
    * corpus is `corpus ∪ admitted`).
    */
  def runEpoch(spark: SparkSession, corpus: DataFrame,
      batch: Seq[(Long, String)], epoch: Int, sinkDir: String,
      k: Int, numHashes: Int, numBands: Int, threshold: Double): Seq[Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val deduped = StreamingPipelines.incrementalDedupStream(
      mem.toDF().toDF("doc_id", "text", "ts"), corpus, "doc_id", "text",
      "ts", watermarkDelay = "0 seconds", k, numHashes, numBands, threshold)
    val outPath = s"$sinkDir/epoch=$epoch"
    val q = ExactlyOnceSink.start(
      deduped.where(col("keep")).select("doc_id", "dup_of", "best_jaccard"),
      outPath, s"$sinkDir/ckpt_$epoch")
    try {
      mem.addData(batch.map { case (id, t) => (id, t, new java.sql.Timestamp(1000L)) })
      q.processAllAvailable()
      // two strictly later flush rows finalize the watermarked aggregation
      // (novel text so they pass any upstream gate; filtered out below)
      mem.addData(Seq((FlushIdBase + epoch * 2L,
        s"watermark flush row one for epoch $epoch of this maintenance run",
        new java.sql.Timestamp(100000L * 1000))))
      q.processAllAvailable()
      mem.addData(Seq((FlushIdBase + epoch * 2L + 1L,
        s"watermark flush row two for epoch $epoch of this maintenance run",
        new java.sql.Timestamp(200000L * 1000))))
      q.processAllAvailable()
    } finally q.stop()
    spark.read.parquet(outPath)
      .where(col("doc_id") < FlushIdBase)
      .select("doc_id").as[Long].collect().toSeq.sorted
  }
}
