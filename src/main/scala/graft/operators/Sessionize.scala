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

  /** Sessions assembled into ordered interaction transcripts — the SFT-style
    * conversation extraction step: per session, the labels of its events in
    * (ts, id) order joined into one string, with the turn count. Sessions
    * shorter than `minTurns` drop (single-event sessions make no
    * conversation). Output: (keyCol, session_id, n_turns, transcript).
    *
    * Determinism: the event order inside the aggregate is pinned by
    * sorting collected (ts, id, label) structs — struct ordering is
    * lexicographic and (ts, id) is unique — so the transcript is identical
    * under any partitioning or AQE plan.
    *
    * Scale shape: session assignment is the [[withSessionIds]] single
    * exchange+sort; the assembly is one aggregate whose state is the
    * session's own events (bounded by session length, not corpus size). */
  def conversations(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, labelCol: String, maxGap: Long, minTurns: Int = 2): DataFrame = {
    require(minTurns >= 1, "minTurns must be at least 1")
    withSessionIds(events, keyCol, tsCol, idCol, maxGap)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_turns"),
        array_join(
          transform(
            sort_array(collect_list(struct(col(tsCol), col(idCol), col(labelCol).as("l")))),
            s => s.getField("l")),
          " ").as("transcript"))
      .where(col("n_turns") >= minTurns)
  }
}
