package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the maintenance operator every long-running
  * ingest needs: streaming sinks and per-partition writers leave thousands
  * of KB-scale parquet files, and at 100 TB the resulting scan pays one
  * task + one footer read per file. Compaction rewrites a directory into
  * files near a target size so downstream scans get healthy task inputs
  * (128–512 MB; align with `spark.sql.files.maxPartitionBytes`).
  */
object Compaction {

  /** Repartitions `df` so a parquet write lands near `targetBytes` per
    * file, using Catalyst's scan statistics (sum of source file bytes —
    * compressed, like the output will be). `sizeFactor` adjusts when the
    * rewrite is expected to compress differently (e.g. many tiny inputs
    * carry per-file overhead and recompress smaller). A round-robin
    * repartition, not coalesce: coalesce would skip the shuffle but chains
    * upstream parallelism to the file count being fixed. */
  def repartitionForFileSize(df: DataFrame, targetBytes: Long,
      sizeFactor: Double = 1.0): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes.toDouble * sizeFactor
    val parts = math.max(1, math.ceil(bytes / targetBytes).toInt)
    df.repartition(parts)
  }

  /** Rewrites the parquet directory at `inDir` into `outDir` with files
    * near `targetBytes`; returns the number of data files written. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, sizeFactor: Double = 1.0): Int = {
    repartitionForFileSize(spark.read.parquet(inDir), targetBytes, sizeFactor)
      .write.mode("overwrite").parquet(outDir)
    new java.io.File(outDir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
  }
}
