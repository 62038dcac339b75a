package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation metrics over grouped predictions — the readout side of the
  * quality-classifier tier ([[graft.text.QualityClassifier]] trains;
  * this measures): does a score actually separate the classes, per
  * slice? Sliced evaluation is the 100 TB habit that catches the
  * classic failure of one global AUC hiding a domain where the ranking
  * is inverted.
  *
  * Everything here is integer-exact by construction (the q32/q153 float
  * discipline): AUC is computed from RANKS — the Mann-Whitney U
  * identity `AUC = U / (n₊·n₋)` with midrank tie handling — and ranks,
  * tie counts, and U are exact integers. The single division is emitted
  * as the exact integer `⌊2U·10⁶ / (2·n₊·n₋)⌋`, so the result
  * hash-matches a SQL replay bit-for-bit. No float sum ever crosses a
  * row boundary. */
object Metrics {

  /** Per-group ROC AUC of `scoreCol` against boolean `labelCol` (true =
    * positive class), higher score ⇒ predicted positive.
    *
    * Midrank construction without a second scan: ascending `rank()` is
    * the MINIMUM row number of a tie run and the tie-run size `t` comes
    * from a count over the (group, score) partition, so twice the
    * midrank is `2·rank + t − 1` — an exact integer per row. Summed
    * over positives: `2U = Σ(2·rank + t − 1) − 2·n₊(n₊+1)/2`.
    *
    * Scale shape: one shuffle on the group columns; both windows and
    * the final aggregate share that partitioning (no second exchange).
    * Null scores/labels are excluded. Single-class groups (n₊ = 0 or
    * n₋ = 0) emit a null `auc_e6` — AUC is undefined there, and a
    * silent 0 or 1 would read as a (perfectly bad/good) ranking.
    *
    * Output: `(groupCols…, n_pos, n_neg, auc_e6)`. */
  def groupedAuc(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                 labelCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupedAuc needs at least one group column")
    val score = col(scoreCol)
    val label = col(labelCol)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(score)
    val wt = Window.partitionBy((groupCols.map(col) :+ score): _*)
    df.filter(score.isNotNull && label.isNotNull)
      .withColumn("__r2", lit(2) * rank().over(w) + count(lit(1)).over(wt) - 1)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(label, col("__r2")).otherwise(0L)).as("__s2"),
        sum(when(label, 1L).otherwise(0L)).as("n_pos"),
        sum(when(label, 0L).otherwise(1L)).as("n_neg"))
      .withColumn("auc_e6",
        expr("(__s2 - n_pos * (n_pos + 1)) * 1000000 div nullif(2 * n_pos * n_neg, 0)"))
      .drop("__s2")
  }
}
