package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The HLL register aggregate: register correctness against an independent
  * SQL formulation, partition invariance (the merge path), buffer contract,
  * and the estimator's statistical accuracy. */
class HllSketchSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private val P = 10
  private val M = 1 << P

  private def registers(df: org.apache.spark.sql.DataFrame): Array[Int] =
    df.agg(GraftExpressions.hllRegisters(col("v"), P).as("regs"))
      .head().getSeq[Int](0).toArray

  test("registers match an independent Spark-SQL md5 formulation") {
    import spark.implicits._
    val vals = spark.range(5000).select(concat(lit("v"), col("id")).as("v"))
    val got = registers(vals)
    // independent route: SQL md5 -> conv -> integer ops, no shared code
    val ref = vals.select(
        expr("CAST(conv(substring(md5(concat('hll:', v)), 1, 12), 16, 10) AS BIGINT)").as("h"))
      .select((col("h") / lit(1L << 38)).cast("long").as("bucket"),
        pmod(col("h"), lit(1L << 38)).as("rest"))
      .select(col("bucket"), when(col("rest") === 0, lit(39))
        .otherwise(lit(39) - length(bin(col("rest")))).cast("int").as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("rho"))
      .as[(Long, Int)].collect().toMap
    got.zipWithIndex.foreach { case (rho, b) =>
      assert(rho === ref.getOrElse(b.toLong, 0), s"bucket $b")
    }
  }

  test("partition-invariant: merge path produces identical registers") {
    import spark.implicits._
    val vals = spark.range(20000).select(concat(lit("x"), col("id")).as("v"))
    val one = registers(vals.coalesce(1))
    val many = registers(vals.repartition(13))
    assert(one.toSeq === many.toSeq)
  }

  test("null inputs are ignored") {
    import spark.implicits._
    val vals = Seq(Some("a"), None, Some("b"), None).toDF("v")
    val withNulls = registers(vals)
    val without = registers(Seq("a", "b").toDF("v"))
    assert(withNulls.toSeq === without.toSeq)
  }

  test("buffer contract: serialize/deserialize roundtrip, merge is bytewise max") {
    val agg = HllRegistersAgg(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("v")), P)
    val a = agg.createAggregationBuffer()
    val b = agg.createAggregationBuffer()
    a(3) = 7; b(3) = 5; b(900) = 12
    val rt = agg.deserialize(agg.serialize(a))
    assert(rt.toSeq === a.toSeq)
    assert(!(rt eq a), "deserialize must not alias the serialized buffer")
    val m = agg.merge(a, b)
    assert(m(3) === 7 && m(900) === 12)
  }

  test("hash48 is the first 48 bits of md5('hll:'||v)") {
    // md5("hll:spark") begins 406d... -> matches the DuckDB oracle probe
    val h = HllRegistersAgg.hash48(UTF8String.fromString("spark"))
    assert(h === 70838407235056L) // ('0x'||substr(md5('hll:spark'),1,12))::BIGINT
  }

  test("streaming aggregation state: registers across micro-batches == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val b1 = (0 until 3000).map(i => s"v$i")
    val b2 = (1500 until 5000).map(i => s"v$i") // overlaps b1
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val out = mem.toDF().toDF("v")
      .agg(GraftExpressions.hllRegisters(col("v"), P).as("regs"))
    val q = out.writeStream.outputMode("complete").format("memory")
      .queryName("hllstream").start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hllstream").head().getSeq[Int](0)
    val batch = registers((b1 ++ b2).toDF("v"))
    assert(streamed.toSeq === batch.toSeq,
      "sketch state carried across micro-batches must equal the batch sketch")
  }

  test("estimator: within 3 standard errors on 50k distinct values") {
    import spark.implicits._
    val n = 50000
    val vals = spark.range(n).select(concat(lit("u"), col("id")).as("v"))
    val regs = registers(vals)
    val inv = regs.map(r => math.pow(2.0, -r)).sum
    val alpha = 0.7213 / (1 + 1.079 / M)
    val est = alpha * M * M / inv
    val relErr = math.abs(est - n) / n
    // standard error 1.04/sqrt(m) = 3.25%; 3 sigma = 9.75%
    assert(relErr < 0.0975, s"est $est vs $n (relErr $relErr)")
  }
}
