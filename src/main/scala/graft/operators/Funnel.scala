package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-stage funnel analysis — for each key (user, session), how far
  * through a stage sequence (view → click → purchase, …) its event
  * stream progressed, where stage `i+1` only counts if it happens
  * STRICTLY AFTER the key's first qualifying stage-`i` event. The
  * product-analytics staple the reference engine has no analog for;
  * conversion counts per stage are the canonical readout.
  *
  * Semantics: `t₀` = min time of a stage-0 event; `tᵢ` = min time of a
  * stage-`i` event with `t > tᵢ₋₁` (the earliest-possible-completion
  * convention — matching the first stage-`i−1` occurrence maximizes the
  * chance of finding a later stage-`i`, so the reached count is the
  * supremum over interleavings). Ties on the exact same timestamp do
  * NOT advance the funnel (strict `>`): simultaneous events cannot
  * prove ordering.
  *
  * Scale shape: ONE shuffle. The chain of per-stage minima is a
  * sequence of unordered same-partitioning window aggregates — Catalyst
  * plans them over a single hash-partition Exchange (asserted in
  * FunnelSpec) — then the per-key row collapses through the same
  * partitioning. Events are pruned to the stage vocabulary before the
  * shuffle. All comparisons are on the raw time values (integral
  * nanos / timestamps), so reached-stage verdicts are exact and the
  * result hash-matches a SQL replay of the identical window chain. */
object Funnel {

  /** Per-key funnel: `keyCols…, t_0 … t_{n-1}` (first qualifying time
    * per stage, null once the chain breaks) and `stages_completed`. */
  def funnelByKey(events: DataFrame, keyCols: Seq[String], timeCol: String,
                  stageCol: String, stages: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "funnelByKey needs at least one key column")
    require(stages.size >= 2, "a funnel needs at least 2 stages")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    val w = Window.partitionBy(keyCols.map(col): _*)
    val t = col(timeCol)
    val pruned = events
      .filter(col(stageCol).isin(stages: _*) && t.isNotNull)
      .select(keyCols.map(col) :+ t.as("__t") :+ col(stageCol).as("__s"): _*)
    // chained unordered windows over ONE partitioning: stage i's min is
    // conditional on stage i−1's (already-windowed) min — no ordering,
    // no extra shuffle, one WindowExec chain
    val chained = stages.zipWithIndex.foldLeft(pruned) { case (df, (s, i)) =>
      val cond =
        if (i == 0) col("__s") === s
        else col("__s") === s && col("__t") > col(s"t_${i - 1}")
      df.withColumn(s"t_$i", min(when(cond, col("__t"))).over(w))
    }
    val tCols = stages.indices.map(i => col(s"t_$i"))
    val completed = tCols.map(c => when(c.isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    chained
      .select(keyCols.map(col) ++ tCols :+ completed.as("stages_completed"): _*)
      .distinct()
  }

  /** The funnel readout: one row per stage with the count of keys whose
    * chain reached it (`n_reached` is non-increasing in `stage`). */
  def conversionCounts(events: DataFrame, keyCols: Seq[String], timeCol: String,
                       stageCol: String, stages: Seq[String]): DataFrame = {
    val byKey = funnelByKey(events, keyCols, timeCol, stageCol, stages)
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("stage", "stage_name")
    byKey.crossJoin(broadcast(stageIdx))
      .filter(col("stages_completed") > col("stage"))
      .groupBy("stage", "stage_name")
      .agg(count(lit(1)).as("n_reached"))
  }
}
