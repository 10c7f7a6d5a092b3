package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** K2 — streaming utility-report sink (SURVEY §2.8): per-trigger CSV rows
  * `tick, ts_ms, l0, linf, l1, l2, dp_keys, gt_keys` comparing the carried-
  * forward DP histogram against accumulated ground truth, the Spark-native
  * form of SyntheticHistogramAggregationBolt's report (:110-160).
  *
  * Implemented as `foreachBatch`: each micro-batch folds its releases into a
  * carried-forward map and appends one metrics row. Both histograms live at
  * key cardinality, so driver-side state is small regardless of input volume
  * (SURVEY §7.5.4).
  */
final class UtilitySink(csvPath: String, groundTruth: () => Map[String, Double]) extends Serializable {

  private val carried = scala.collection.mutable.HashMap.empty[String, Long]
  private var tick = 0L

  def append(releases: DataFrame, batchId: Long): Unit = {
    releases.select(col("key"), col("epoch"), col("count"))
      .orderBy(col("epoch"))
      .collect()
      .foreach(r => carried.update(r.getString(0), r.getLong(2)))

    val gt = groundTruth()
    val keys = carried.keySet ++ gt.keySet
    var l1 = 0.0
    var l2sq = 0.0
    var linf = 0.0
    keys.foreach { k =>
      val d = math.abs(carried.getOrElse(k, 0L).toDouble - gt.getOrElse(k, 0.0))
      l1 += d; l2sq += d * d; linf = math.max(linf, d)
    }
    val row = s"$tick,${System.currentTimeMillis()},${carried.size},$linf,$l1,${math.sqrt(l2sq)},${carried.size},${gt.size}\n"
    val p = Paths.get(csvPath)
    if (!Files.exists(p))
      Files.writeString(p, "tick,ts_ms,l0,linf,l1,l2,dp_keys,gt_keys\n", StandardOpenOption.CREATE)
    Files.writeString(p, row, StandardOpenOption.APPEND)
    tick += 1
  }

  def currentHistogram: Map[String, Long] = carried.toMap

  /** Starts the sink over a release stream. */
  def start(releases: Dataset[Release], checkpoint: String): StreamingQuery =
    releases.toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((df: DataFrame, id: Long) => append(df, id))
      .start()
}
