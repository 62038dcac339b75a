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
    * weights joined on (dateCol, weightKey) like the reference's J4.
    *
    * Shape: two filters of one scan (Catalyst reuses the exchange), one
    * broadcast-or-shuffle join on the composite key, two hash aggregates,
    * one final equi-join on the date grain.
    */
  def collapse(extracted: DataFrame,
               dateCol: String, measureCol: String, valueCol: String,
               weightMeasure: String, valueMeasure: String,
               weightKey: String, extraKeys: Seq[String] = Nil,
               sumAs: String = "employment_thousands",
               wmeanAs: String = "avg_hourly_earnings"): DataFrame = {
    val gks = extraKeys :+ dateCol
    val emp  = extracted.filter(col(measureCol) === weightMeasure)
    val earn = extracted.filter(col(measureCol) === valueMeasure)

    val empM = emp.groupBy(gks.map(col): _*).agg(sum(col(valueCol)).as(sumAs))

    val weights = emp
      .groupBy((gks :+ weightKey).map(col): _*)
      .agg(sum(col(valueCol)).as("__w"))
    val earnW = earn.join(weights, gks :+ weightKey, "left")
    val earnM = earnW
      .groupBy(gks.map(col): _*)
      .agg(weightedMean(col(valueCol), col("__w")).as(wmeanAs))

    empM.join(earnM, gks, "left").orderBy(gks.map(col): _*)
  }
}
