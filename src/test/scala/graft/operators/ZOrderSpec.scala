package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables

/** Pins the property z-ordering is FOR: under a z-ordered layout, rows
  * matching a range predicate on a non-leading dimension concentrate in few
  * files, where a one-dimensional sort spreads them across essentially all
  * files. Files-containing-matches is the layout-locality metric a min/max
  * file skipper turns into files-actually-read at scale. */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("z-value interleaves bits deterministically") {
    import spark.implicits._
    // x=0b101 (5), y=0b011 (3), 3 bits: z bit layout y2 x2 y1 x1 y0 x0
    // = 0 1 1 0 1 1 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .as[Long].head()
    assert(z === 27L)
  }

  test("zValue rejects bits=0 and bit widths that overflow a long") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      df.select(ZOrder.zValue(Seq(col("x"), col("y")), 0))
    }
    intercept[IllegalArgumentException] {
      df.select(ZOrder.zValue(Seq(col("x"), col("y")), 32))
    }
  }

  test("partkey box query touches a fraction of the files a 1-D orderkey layout needs") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val dir = s"/tmp/graft_zorder_${System.nanoTime()}"
    li.repartitionByRange(16, col("l_orderkey")).sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/linear")
    ZOrder.writeZOrdered(li, Seq("l_orderkey", "l_partkey"), 16, s"$dir/zorder", 16)

    val (lo, hi) = {
      val mm = li.agg(min("l_partkey"), max("l_partkey")).head()
      val (a, b) = (mm.getLong(0), mm.getLong(1))
      (a, a + (b - a) / 8) // ~1/8th of the partkey space
    }
    def touched(path: String): (Long, Long) = {
      val matches = spark.read.parquet(path).where(col("l_partkey").between(lo, hi))
      (matches.select(input_file_name()).distinct().count(), matches.count())
    }
    val (linFiles, linRows) = touched(s"$dir/linear")
    val (zFiles, zRows) = touched(s"$dir/zorder")
    assert(linRows === zRows, "layouts must hold identical data")
    assert(zRows > 0, "test predicate selected nothing")
    // the 1-D layout scatters partkeys everywhere; z-order bounds both dims
    assert(zFiles * 2 <= linFiles,
      s"z-order touched $zFiles files vs $linFiles for the 1-D layout")
  }
}
