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

  /** One ingest cycle of [[runEpochs]]: which epoch, how many batch docs
    * were admitted, and the wall-clock seconds for the full cycle (feed →
    * watermark drain → exactly-once sink commit). */
  final case class EpochResult(epoch: Int, admitted: Long, seconds: Double)

  /** A LONG-LIVED ingest loop: ONE streaming query + checkpoint + a
    * persisted corpus index, fed one epoch at a time — the steady-state
    * form whose per-cycle cost excludes query startup, checkpoint
    * creation, and (crucially) the per-micro-batch re-signing of the
    * corpus that the per-query mode ([[runEpoch]], no persisted index)
    * pays three times per cycle. Production keeps exactly this standing:
    * a maintained signature table plus one restartable query.
    *
    * The static corpus side is fixed for the query's lifetime (the
    * stream-static join contract), so this measures repeated batches
    * against one corpus snapshot; corpus GROWTH between cycles is
    * [[runEpoch]]'s per-query mode. Event times strictly increase across
    * epochs (batch at (3e+1)·10⁵ s, flushes at (3e+2)/(3e+3)·10⁵ s) so no
    * batch row ever lands at-or-below the standing watermark. Epoch ids
    * must be unique across epochs and below [[FlushIdBase]].
    *
    * Obtain via [[startStanding]]; feed with [[StandingIngest.epoch]]
    * (returns that cycle's wall seconds); finish with
    * [[StandingIngest.finish]] (stops the query, unpersists the index,
    * and reads admitted ids back from the exactly-once sink). */
  final class StandingIngest private[CorpusMaintenance] (
      spark: SparkSession,
      mem: MemoryStream[(Long, String, java.sql.Timestamp)],
      q: org.apache.spark.sql.streaming.StreamingQuery,
      outPath: String,
      idxBuckets: DataFrame, idxSets: DataFrame) {
    private var nextEpoch = 0
    private val fed = scala.collection.mutable.ArrayBuffer.empty[(Int, Set[Long], Double)]
    private def ts(stepsOf100k: Long) =
      new java.sql.Timestamp(stepsOf100k * 100000L * 1000)

    /** Feed one epoch through the standing query; returns wall seconds for
      * the full cycle (feed → watermark drain → sink commit). */
    def epoch(batch: Seq[(Long, String)]): Double = {
      val e = nextEpoch; nextEpoch += 1
      val t0 = System.nanoTime()
      mem.addData(batch.map { case (id, t) => (id, t, ts(3L * e + 1)) })
      q.processAllAvailable()
      // two strictly later flush rows finalize the epoch's watermarked
      // aggregation (same two-step drain as runEpoch)
      mem.addData(Seq((FlushIdBase + e * 2L,
        s"watermark flush row one for epoch $e of this maintenance run", ts(3L * e + 2))))
      q.processAllAvailable()
      mem.addData(Seq((FlushIdBase + e * 2L + 1L,
        s"watermark flush row two for epoch $e of this maintenance run", ts(3L * e + 3))))
      q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      fed += ((e, batch.map(_._1).toSet, sec))
      sec
    }

    /** Error-path teardown: stop the query and release the index without
      * reading the sink back (the sink may be mid-commit). Idempotent. */
    def abort(): Unit = {
      try q.stop() catch { case scala.util.control.NonFatal(_) => () }
      idxBuckets.unpersist(); idxSets.unpersist(); ()
    }

    /** Stop the query, release the persisted index, and attribute admitted
      * ids (read back from the sink) to the epochs that fed them. */
    def finish(): Seq[EpochResult] = {
      import spark.implicits._
      q.stop()
      idxBuckets.unpersist(); idxSets.unpersist()
      val admittedIds = spark.read.parquet(outPath)
        .where(col("doc_id") < FlushIdBase)
        .select("doc_id").as[Long].collect().toSet
      fed.toSeq.map { case (e, batchIds, sec) =>
        EpochResult(e, batchIds.count(admittedIds.contains).toLong, sec)
      }
    }
  }

  /** Start the standing ingest loop: build + persist the corpus signature
    * index ONCE (without it the stream-static join re-signs the whole
    * corpus every micro-batch — three times per cycle), open the
    * exactly-once sink and its checkpoint, and return the live handle. */
  def startStanding(spark: SparkSession, corpus: DataFrame, sinkDir: String,
      k: Int, numHashes: Int, numBands: Int, threshold: Double): StandingIngest = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val (idxBuckets, idxSets) = StreamingPipelines.dedupIndex(
      corpus, "doc_id", "text", k, numHashes, numBands)
    idxBuckets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    idxSets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    val deduped = StreamingPipelines.incrementalDedupStream(
      mem.toDF().toDF("doc_id", "text", "ts"), corpus, "doc_id", "text",
      "ts", watermarkDelay = "0 seconds", k, numHashes, numBands, threshold,
      staticIndex = Some((idxBuckets, idxSets)))
    val outPath = s"$sinkDir/epochs"
    val q = ExactlyOnceSink.start(
      deduped.where(col("keep")).select("doc_id", "dup_of", "best_jaccard"),
      outPath, s"$sinkDir/ckpt")
    new StandingIngest(spark, mem, q, outPath, idxBuckets, idxSets)
  }

  /** N ingest cycles against one standing query — [[startStanding]] +
    * [[StandingIngest.epoch]] per cycle + [[StandingIngest.finish]], kept
    * as the one-call form. `batchFor(e)` supplies epoch e's documents. */
  def runEpochs(spark: SparkSession, corpus: DataFrame, epochs: Int,
      sinkDir: String, k: Int, numHashes: Int, numBands: Int, threshold: Double)(
      batchFor: Int => Seq[(Long, String)]): Seq[EpochResult] = {
    val standing = startStanding(spark, corpus, sinkDir, k, numHashes, numBands, threshold)
    try {
      (0 until epochs).foreach(e => standing.epoch(batchFor(e)))
      standing.finish()
    } catch { case scala.util.control.NonFatal(ex) =>
      standing.abort(); throw ex
    }
  }

  /** Recursively deletes a temp sink/checkpoint tree (bench hygiene: each
    * timed run must not leave RocksDB/parquet debris under /tmp). */
  def deleteRecursively(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
  }
}
