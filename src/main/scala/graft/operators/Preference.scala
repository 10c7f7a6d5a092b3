package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-data operators for RLHF-style pipelines: derive pairwise
  * comparisons from an event log and aggregate them into Bradley–Terry
  * strength ratings, trained IN the engine (the x12/x13 train-in-engine
  * pattern: deterministic training + exported-model oracle).
  *
  * Scale shape: the event log is touched exactly once by a per-user window
  * (one hash exchange on the user key); everything after that lives at
  * ITEM-vocabulary cardinality — the comparison matrix aggregates map-side
  * to ≤ |items|² rows, and the MM iterations run on that collected matrix
  * (a documented, item²-bounded driver collect, the same bound as the
  * UtilitySink key map). At 100 TB of events the matrix for a realistic
  * item vocabulary (thousands) is still kilobytes.
  */
object Preference {

  /** Pairwise comparisons derived from an event log: per user, each pair of
    * CONSECUTIVE events (ordered by time, then id) is one comparison between
    * their two item types, won by the higher-valued event. Equal values
    * break toward the lexicographically smaller item; same-item pairs drop.
    * Output: (winner, loser, n) at ≤ |items|² cardinality, aggregated with
    * map-side partials. */
  def comparisonsFromEvents(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, itemCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val paired = events.select(col(userCol), col(tsCol), col(idCol),
        col(itemCol).as("item"), col(valueCol).as("value"))
      .withColumn("prev_item", lag("item", 1).over(w))
      .withColumn("prev_value", lag("value", 1).over(w))
      .where(col("prev_item").isNotNull && col("prev_item") =!= col("item"))
    val winner = when(col("value") > col("prev_value"), col("item"))
      .when(col("value") < col("prev_value"), col("prev_item"))
      .otherwise(least(col("item"), col("prev_item")))
    val loser = when(col("value") > col("prev_value"), col("prev_item"))
      .when(col("value") < col("prev_value"), col("item"))
      .otherwise(greatest(col("item"), col("prev_item")))
    paired.select(winner.as("winner"), loser.as("loser"))
      .groupBy("winner", "loser").agg(count(lit(1)).as("n"))
  }

  /** Bradley–Terry maximum-likelihood ratings via the minorization-
    * maximization update (Hunter 2004): rᵢ ← Wᵢ / Σ_{j≠i} tᵢⱼ/(rᵢ+rⱼ)
    * with tᵢⱼ the total comparisons between i and j and Wᵢ i's total wins,
    * then normalized so Σ r = |items|. A FIXED iteration count over the
    * item list in sorted order makes training bit-deterministic (plain
    * IEEE doubles, fixed op order). Items with zero wins converge to 0,
    * guarded against 0/0. */
  def btRatingsLocal(matrix: Seq[((String, String), Long)],
      iters: Int = 50): Seq[(String, Double)] = {
    val items = matrix.flatMap { case ((w, l), _) => Seq(w, l) }.distinct.sorted.toArray
    val idx = items.zipWithIndex.toMap
    val k = items.length
    if (k == 0) return Seq.empty
    val wins = Array.fill(k)(0.0)
    val total = Array.ofDim[Double](k, k) // t_ij symmetric
    for (((w, l), n) <- matrix.sortBy { case ((w, l), _) => (w, l) }) {
      val i = idx(w); val j = idx(l)
      wins(i) += n.toDouble
      total(i)(j) += n.toDouble
      total(j)(i) += n.toDouble
    }
    var r = Array.fill(k)(1.0)
    for (_ <- 0 until iters) {
      val next = Array.ofDim[Double](k)
      for (i <- 0 until k) {
        var den = 0.0
        for (j <- 0 until k if j != i && total(i)(j) > 0.0)
          den += total(i)(j) / (r(i) + r(j))
        next(i) = if (den == 0.0) 0.0 else wins(i) / den
      }
      val s = next.sum
      if (s > 0.0) { for (i <- 0 until k) next(i) = next(i) * k / s }
      r = next
    }
    items.toSeq.zip(r.toSeq)
  }

  /** Best-of-N (rejection) sampling over a scored candidate log: per group
    * keep exactly the highest-valued candidate — ties break toward the
    * smaller id, so selection is deterministic — annotated with the
    * candidate count and the value margin over the runner-up (null when the
    * group has a single candidate). The RLHF best-of-n selection step: the
    * group is a prompt, candidates are sampled responses, the value is a
    * reward score.
    *
    * Scale shape: one hash exchange on the group key and one per-group sort
    * — rank-1, the runner-up value, and the candidate count all come out of
    * that single exchange (the margin needs the second-order statistic,
    * which no map-side-combinable built-in aggregate exposes, and the count
    * window reuses the same partitioning, so one shuffle total). */
  def bestOfN(events: DataFrame, groupCols: Seq[String], idCol: String,
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "bestOfN needs at least one group column")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol).desc, col(idCol).asc)
    events
      .withColumn("__rn", row_number().over(w))
      .withColumn("__runner_up", lead(col(valueCol), 1).over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCols.map(col): _*)))
      .where(col("__rn") === 1)
      .select(groupCols.map(col) ++ Seq(
        col(idCol).as("chosen_id"),
        col(valueCol).as("chosen_value"),
        col("__n").as("n_candidates"),
        (col(valueCol) - col("__runner_up")).as("margin")): _*)
  }

  /** [[btRatingsLocal]] over a distributed comparison matrix: collects the
    * (winner, loser, n) table — an explicitly item²-bounded collect, NOT a
    * corpus collect — trains, and returns (item, wins, losses,
    * n_comparisons, rating) as a DataFrame at item cardinality. */
  def btRatings(spark: SparkSession, comparisons: DataFrame,
      iters: Int = 50): DataFrame = {
    import spark.implicits._
    val m = comparisons.select(col("winner"), col("loser"), col("n").cast("long"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toSeq
    val ratings = btRatingsLocal(m, iters).toMap
    val wins = m.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val losses = m.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val items = ratings.keys.toSeq.sorted
    items.map { it =>
      val w = wins.getOrElse(it, 0L); val l = losses.getOrElse(it, 0L)
      (it, w, l, w + l, ratings(it))
    }.toDF("item", "wins", "losses", "n_comparisons", "rating")
  }
}
