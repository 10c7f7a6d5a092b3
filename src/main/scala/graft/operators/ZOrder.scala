package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the data-layout operator behind
  * multi-dimensional file skipping: interleaving the bits of several
  * columns gives a single sort key under which rows close in EVERY
  * dimension land close on disk, so a min/max-stats reader (parquet
  * row-group pruning, Delta/Iceberg-style file skipping) touches few files
  * for a box predicate on any subset of the dimensions. A single-column
  * sort gives perfect locality in that column and none in the others.
  *
  * Interleaving RAW values is a trap: the wider-range dimension owns all
  * the high bits and the "z-order" degenerates to a plain sort on it
  * (measured: a partkey box over raw-interleaved lineitem touched 14/16
  * files — no better than 1-D). [[normalizedZValue]] therefore rescales
  * every dimension to the full `bits`-wide code range with exact integer
  * arithmetic (`(x − min) · maxCode DIV range` — engine-portable, no
  * float rounding), which is what makes the curve actually space-filling.
  *
  * Everything is integer shift/and/add on built-ins — codegen'd and
  * DuckDB-oracle-checkable. Layout quality is pinned by ZOrderSpec.
  */
object ZOrder {

  /** Morton z-value interleaving the low `bits` bits of each column:
    * bit i of column d lands at position `i·dims + d`. Columns must be
    * non-negative integers already scaled to comparable ranges (use
    * [[normalizedZValue]] for the general case); values ≥ 2^bits keep only
    * their low bits. Requires `bits·dims ≤ 63`. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val dims = cols.length
    require(dims >= 1 && bits >= 1 && bits * dims <= 63,
      s"need bits >= 1 and bits*dims <= 63 to fit a long, got $bits*$dims")
    val terms = for {
      i <- 0 until bits
      (c, d) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * dims + d)
    terms.reduce(_ + _)
  }

  /** Z-value over range-normalized dimensions: each column is rescaled to
    * [0, 2^bits) as `(x − min) · (2^bits − 1) DIV (max − min)` — exact
    * integer arithmetic, so any engine computes the identical code. One
    * tiny min/max aggregate per call (collected to the driver and inlined
    * as literals). Requires `(max − min) · (2^bits − 1)` to fit a long —
    * at 16 bits that allows ranges up to ~2^47. */
  def normalizedZValue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    val maxCode = (1L << bits) - 1
    val aggs = cols.flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    val scaledCols = cols.zipWithIndex.map { case (c, i) =>
      val (mn, mx) = (mm.getLong(2 * i), mm.getLong(2 * i + 1))
      if (mx == mn) lit(0L)
      else expr(s"CAST((($c - ${mn}L) * ${maxCode}L) DIV ${mx - mn}L AS BIGINT)")
    }
    zValue(scaledCols, bits)
  }

  /** The DuckDB SQL twin of [[normalizedZValue]]'s interleave for oracle
    * construction: `colExprs` are the (already scaled) per-dimension SQL
    * expressions. */
  def zValueSql(colExprs: Seq[String], bits: Int): String = {
    val dims = colExprs.length
    (for {
      i <- 0 until bits
      (c, d) <- colExprs.zipWithIndex
    } yield s"((($c >> $i) & 1) << ${i * dims + d})").mkString(" + ")
  }

  /** Writes `df` z-order-clustered into `numFiles` parquet files: range
    * partition on the normalized z-value (so file boundaries are z-ranges),
    * sort within each file (so row groups inside a file are z-runs too).
    * The write-once cost that buys every later multi-dimensional scan its
    * pruning. */
  def writeZOrdered(df: DataFrame, cols: Seq[String], bits: Int,
      path: String, numFiles: Int): Unit =
    df.withColumn("__z", normalizedZValue(df, cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
