package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Exogenous-series alignment + export fan-out (SURVEY §2.4 J6, §2.2 P7,
  * §2.9 F-N1, §2.1 S7; reference notebook cells 23 and 32-33).
  *
  * The reference's "as-of" exog merge is a month-grid-snapped equi-join:
  * both sides are normalized to the same month boundary first, so a plain
  * left equi-join is exact — no true as-of machinery needed (SURVEY J6).
  * The exog table is tiny (one row per month) → broadcast.
  */
object ExogJoin {

  /** J6 + P7 + F-N1: left-join an exogenous monthly series onto a
    * (possibly multi-key) monthly table.
    *
    * @param prefix   prepended to every exog value column (reference's
    *                 `gdelt_*` renames)
    * @param fillZero exog columns to null-fill with 0.0 after the join
    *                 (reference fills `ai_share_smoothed` before model fit)
    */
  def alignMonthly(df: DataFrame, exog: DataFrame,
                   dfDateCol: String, exogDateCol: String,
                   prefix: String = "", fillZero: Seq[String] = Nil): DataFrame = {
    val exogVals = exog.columns.filterNot(_ == exogDateCol)
    val e = exog.select(
      Cols.monthStart(col(exogDateCol)).as("__month") +:
        exogVals.map(c => col(c).as(prefix + c)): _*)
    val joined = df
      .withColumn("__month", Cols.monthStart(col(dfDateCol)))
      .join(broadcast(e), Seq("__month"), "left")
      .drop("__month")
    fillZero.map(prefix + _).filter(joined.columns.contains)
      .foldLeft(joined)((d, c) => d.withColumn(c, coalesce(col(c), lit(0.0))))
  }

  /** S7 long export: stack per-key series into one long table
    * (key, date, measure, value) — the reference's `export_long_df` concat,
    * without the driver-side loop. */
  def exportLong(df: DataFrame, keyCols: Seq[String], dateCol: String,
                 valueCols: Seq[String]): DataFrame = {
    val stackExpr = valueCols.map(c => s"'$c', `$c`").mkString(", ")
    df.selectExpr(keyCols :+ dateCol :+
      s"stack(${valueCols.size}, $stackExpr) AS (measure, value)": _*)
  }

  /** S7 wide export: pivot one measure into per-key columns (the
    * reference's `export_wide` per-career CSVs become columns of one
    * table; a partitioned write of [[exportLong]] is the at-scale shape). */
  def exportWide(long: DataFrame, keyCol: String, dateCol: String,
                 measureCol: String, valueCol: String, measure: String): DataFrame =
    long.filter(col(measureCol) === measure)
      .groupBy(col(dateCol))
      .pivot(keyCol)
      .agg(first(col(valueCol)))
      .orderBy(dateCol)
}
