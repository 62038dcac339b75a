package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped collapse operators (SURVEY §2.5 A1/A2 + §2.4 J4/J5).
  *
  * The analytical core of the reference's `collapse_career`
  * (prep_CES_pandas.py:69-102): per month, total employment (group-sum) and
  * the employment-weighted mean of hourly earnings. The reference runs a
  * Python loop per career; here careers/keys are ordinary group columns so
  * one hash-aggregate handles all of them — partial (map-side) aggregation
  * then one shuffle on the group keys.
  */
object Collapse {

  /** A2 as a pure expression aggregate — no UDAF. pandas parity: a null
    * value contributes neither numerator nor its weight to the denominator
    * (NaN·w then skipna-sum). */
  def weightedMean(value: Column, weight: Column): Column = {
    val vw = sum(when(value.isNotNull && weight.isNotNull, value * weight))
    val ws = sum(when(value.isNotNull, weight))
    vw / nullif(ws, lit(0))
  }

  /** A1: group-sum of `valueCol` per key. */
  def groupSum(df: DataFrame, keys: Seq[String], valueCol: String, as: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(sum(col(valueCol)).as(as))

  /** Full collapse: from an extracted long table holding both measures,
    * produce per (extraKeys, dateCol):
    *   - sum of the `weightMeasure` rows (employment),
    *   - `weightMeasure`-weighted mean of the `valueMeasure` rows (earnings),
    * each value row weighted by its `weightKey` group's total weight — the
    * reference's J4 weights-join semantics.
    *
    * Physical shape: the reference (and the naive port) computes weights
    * per (keys, weightKey), JOINS them back onto every value row, then
    * re-aggregates — at 100 TB that's a full-data shuffle join on the fact
    * table. Algebraic identity removes the join: with per-(keys, wk)
    * partials W = Σ weight-rows, S = Σ non-null value-rows, n = count of
    * non-null value-rows,
    *
    *   Σ_rows (value·W)        = Σ_wk W·S
    *   Σ_rows≠null-value (W)   = Σ_wk W·n
    *
    * so ONE aggregation at (keys, weightKey) grain + ONE tiny reaggregation
    * at (keys) grain produce both outputs — two shuffles, the second over
    * group-count rows, no join. Null parity with [[weightedMean]] over the
    * joined form: a wk-group with no weight rows has W null and drops out
    * of both sums; value rows with null value contribute to neither S nor n.
    */
  def collapse(extracted: DataFrame,
               dateCol: String, measureCol: String, valueCol: String,
               weightMeasure: String, valueMeasure: String,
               weightKey: String, extraKeys: Seq[String] = Nil,
               sumAs: String = "employment_thousands",
               wmeanAs: String = "avg_hourly_earnings"): DataFrame = {
    val gks = extraKeys :+ dateCol
    val v = col(valueCol)
    val partial = extracted
      .groupBy((gks :+ weightKey).map(col): _*)
      .agg(
        sum(when(col(measureCol) === weightMeasure, v)).as("__W"),
        sum(when(col(measureCol) === valueMeasure, v)).as("__S"),
        count(when(col(measureCol) === valueMeasure && v.isNotNull, lit(1))).as("__n"))
    partial
      .groupBy(gks.map(col): _*)
      .agg(
        sum(col("__W")).as(sumAs),
        (sum(col("__W") * col("__S")) /
          nullif(sum(col("__W") * col("__n")), lit(0))).as(wmeanAs))
      .orderBy(gks.map(col): _*)
  }
}
