package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward (most-recent-prior) as-of join — the temporal join Spark lacks
  * natively: each left row is matched to the single right row with the
  * LARGEST timestamp `<=` the left timestamp within the same `by` group
  * (the semantics of DuckDB/kdb `ASOF JOIN`, and of joining events to the
  * dimension snapshot in force at event time).
  *
  * Implemented as union + running `last(ignoreNulls)` over an event-time
  * window rather than a range join: both sides shuffle ONCE on the `by`
  * key and are sorted ONCE per group, so the cost is O(n log n) per group
  * with no candidate-pair explosion — a non-equi range join would replicate
  * every left row against every candidate right row before picking the max.
  * At 100 TB this is the same cost class as any per-key event-sequence
  * window, and AQE handles group-count skew the same way.
  *
  * The reference has no temporal join; this belongs to the training-data
  * pipeline surface (joining click/impression streams to slowly-changing
  * feature snapshots at event time).
  */
object AsOfJoin {

  /** Joins each `left` row to the most recent `right` row at-or-before its
    * timestamp, per `by` group. Left rows with no prior right row keep null
    * payload columns (LEFT OUTER semantics).
    *
    * Preconditions: `right`'s non-`by` column names must not collide with
    * `left`'s; timestamps must be orderable (use integral microseconds for
    * cross-engine determinism — double-divided nanos lose integer precision
    * above 2^53). If several right rows share one (by, rightTs) instant the
    * match is still deterministic: the lexicographically greatest payload
    * struct wins; pre-deduplicate if different semantics are needed.
    */
  def backward(left: DataFrame, right: DataFrame, by: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    require(by.nonEmpty, "as-of join needs at least one by column")
    val payloadCols = right.columns.filterNot(by.contains).toSeq
    val collisions = payloadCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"right payload collides with left: $collisions")

    val leftStruct = StructType(left.schema.fields)
    val payloadStruct = StructType(
      right.schema.fields.filter(f => payloadCols.contains(f.name)))

    val l = left.select(
      by.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__is_left"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(payloadStruct).as("__p")): _*)
    val r = right.select(
      by.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__is_left"),
        lit(null).cast(leftStruct).as("__l"),
        struct(payloadCols.map(col): _*).as("__p")): _*)

    // Rights sort BEFORE lefts at an equal timestamp (is_left asc) so the
    // match is inclusive (left.ts >= right.ts); __p breaks right-side ties.
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_left").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__is_left") === 1)
      .select(left.columns.map(c => col("__l").getField(c).as(c)) ++
        payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }
}
