package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of one key belong to one
  * session while the gap between them stays ≤ `maxGap`; a larger gap opens
  * a new session. The standard first step of behavioral feature extraction
  * over event logs.
  *
  * One shuffle on the key, one sort per key — the classic two-window form
  * (lag to flag session starts, running sum to number them) keeps
  * everything in a single window stage over the same (key, ts) sort order,
  * so Catalyst plans exactly one Exchange + one Sort. Session ids are
  * per-key ordinals (1, 2, ...), deterministic because the sort includes
  * the unique `idCol` as tiebreak.
  */
object Sessionize {

  /** Appends a `session_id` column (per-key ordinal starting at 1). */
  def withSessionIds(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, maxGap: Long): DataFrame = {
    require(maxGap > 0, "maxGap must be positive")
    val order = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(order))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsCol) - col("__prev") > maxGap, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__new")).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** Per-session summary: start/end timestamps and event count. */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, maxGap: Long): DataFrame =
    withSessionIds(events, keyCol, tsCol, idCol, maxGap)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
