package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Points-in-intervals range join via time-block bucketing — the scalable
  * form of `p.ts BETWEEN i.start AND i.end`.
  *
  * A naive non-equi join cannot hash-partition (Spark falls back to
  * broadcast-nested-loop or a cartesian product — quadratic at scale).
  * Instead both sides are keyed by a coarse time block of width
  * `blockWidth`: each interval is exploded to the blocks it overlaps
  * (`ceil(len/blockWidth)+1` rows, == 2 when `blockWidth >=` the interval
  * length), each point maps to exactly ONE block, and the join becomes a
  * plain shuffled equi-join on (`by`, block) with the exact range predicate
  * applied after the match. Each qualifying (point, interval) pair meets in
  * exactly one block — the point's — so no dedup pass is needed.
  *
  * Choose `blockWidth` ≈ the typical interval length: larger wastes
  * comparisons within a block, smaller replicates intervals across more
  * blocks. With a `by` key the block only subdivides a key's timeline, so
  * hot blocks need a hot KEY first; keyless usage concentrates each time
  * block on one reducer and is only safe for bounded per-block volume.
  *
  * No reference counterpart (Storm pipes tuples); part of the
  * training-pipeline surface (windowed attribution, incident correlation).
  */
object RangeJoin {

  /** Inner-joins `points` to every `intervals` row with
    * `start <= pointTs < end` in the same `by` group. Output columns are
    * `points`' then `intervals`' (minus the duplicated `by` columns).
    * Timestamps and `blockWidth` must share one integral unit (e.g. µs).
    */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
      by: Seq[String], pointTs: String, startTs: String, endTs: String,
      blockWidth: Long): DataFrame = {
    require(blockWidth > 0, "blockWidth must be positive")
    val collisions = intervals.columns.filterNot(by.contains)
      .toSet.intersect(points.columns.filterNot(by.contains).toSet)
    require(collisions.isEmpty, s"interval columns collide with points: $collisions")

    val p = points.withColumn("__blk", expr(s"$pointTs div ${blockWidth}L"))
    // [start, end) covers blocks floor(start/W) .. floor((end-1)/W).
    val i = intervals.withColumn("__blk",
      explode(sequence(
        expr(s"$startTs div ${blockWidth}L"),
        expr(s"($endTs - 1) div ${blockWidth}L"))))

    p.join(i, by :+ "__blk")
      .where(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("__blk")
  }

  /** Interval×interval overlap join: pairs `(l, r)` in the same `by` group
    * with `[lStart, lEnd) ∩ [rStart, rEnd) ≠ ∅`, as a block equi-join.
    *
    * Both sides explode to their covered blocks, so a pair sharing several
    * blocks would match repeatedly; instead of a `distinct` (an extra
    * shuffle over the full result), each qualifying pair is claimed by
    * exactly ONE block — the block containing the overlap's start,
    * `max(lStart, rStart)`, which both intervals necessarily cover. The
    * post-join filter keeps the match only in that block, making the output
    * duplicate-free with zero additional shuffles.
    *
    * Same `blockWidth` guidance as [[pointsInIntervals]]; replication per
    * row is `ceil(len/blockWidth)+1` blocks. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, by: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      blockWidth: Long): DataFrame = {
    require(blockWidth > 0, "blockWidth must be positive")
    val collisions = left.columns.filterNot(by.contains)
      .toSet.intersect(right.columns.filterNot(by.contains).toSet)
    require(collisions.isEmpty, s"left/right columns collide: $collisions")

    def blocks(df: DataFrame, s: String, e: String) = df.withColumn("__blk",
      explode(sequence(expr(s"$s div ${blockWidth}L"), expr(s"($e - 1) div ${blockWidth}L"))))

    blocks(left, lStart, lEnd).join(blocks(right, rStart, rEnd), by :+ "__blk")
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .where(col("__blk") === expr(s"greatest($lStart, $rStart) div ${blockWidth}L"))
      .drop("__blk")
  }
}
