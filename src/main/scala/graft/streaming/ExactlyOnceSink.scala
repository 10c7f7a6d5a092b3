package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once parquet sink via `foreachBatch` + overwrite-by-batchId —
  * the standard Structured Streaming idempotence recipe (K1-adjacent: the
  * reference's sink bolts rely on the replay filter for dedup; a file sink
  * gets the same guarantee from the engine's contract instead).
  *
  * Structured Streaming redelivers a micro-batch with the SAME `batchId`
  * after a failure, so writing each batch to its own `batch_id=<id>`
  * partition directory with `overwrite` makes the retry REPLACE the
  * partial output rather than append duplicates: at-least-once delivery ×
  * idempotent write = exactly-once output. Downstream reads the directory
  * tree as ordinary partitioned parquet (`batch_id` becomes a partition
  * column), and a compaction pass ([[graft.operators.Compaction]]) can
  * fold the per-batch files later without touching the guarantee.
  */
object ExactlyOnceSink {

  /** The per-batch write, exposed so tests (and operational replays) can
    * invoke exactly what the engine invokes: rewriting an already-written
    * batchId must leave the sink's contents unchanged. */
  def writeBatch(batch: DataFrame, batchId: Long, path: String): Unit =
    batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")

  /** Starts the stream writing each micro-batch idempotently under `path`. */
  def start(stream: DataFrame, path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, id: Long) => writeBatch(batch, id, path))
      .start()
}
