package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables

/** Compaction turns a many-tiny-files directory into few near-target files
  * without losing rows. */
class CompactionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("compactParquet merges 64 splinter files to roughly total/target files, rows intact") {
    val base = s"/tmp/graft_compact_${System.nanoTime()}"
    val inDir = s"$base/in"
    val outDir = s"$base/out"
    try {
      val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      li.repartition(64).write.parquet(inDir)
      val splinters = new java.io.File(inDir).listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(splinters === 64)

      val totalBytes = new java.io.File(inDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      val target = totalBytes / 4
      val nOut = Compaction.compactParquet(spark, inDir, outDir, target)
      // stats-based sizing is an estimate; anywhere in [2, 8] is a win vs 64
      assert(nOut >= 2 && nOut <= 8, s"expected ~4 output files, got $nOut")
      assert(spark.read.parquet(outDir).count() === li.count())
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
    }
  }
}
