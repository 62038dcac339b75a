package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar-grid operators (SURVEY §2.6 W8, §2.5 A5, §2.9 F-D2..F-D4).
  *
  * The reference's `ensure_monthly_index` / `force_complete_month_grid`
  * (notebook cell 25): snap to month grain, resolve duplicate months by a
  * policy, reindex onto a gap-free month sequence. The grid is what makes
  * positional pandas ops (shift/pct_change/rolling) well-defined as
  * calendar ops (SURVEY "hard parts" #2).
  *
  * Scale shape: the grid is built per key from that key's own min/max via a
  * grouped `sequence(...)` + `explode` — no driver-side date_range, no
  * collect; a 1000-executor cluster builds millions of key-grids in one
  * shuffle-free pass after the (single) groupBy.
  */
object CalendarOps {

  /** A5: duplicate-month resolution policies (pandas `groupby(idx).mean()/
    * sum()/last()`). `last` is positional in pandas → requires an explicit
    * order column (`orderCol`) to be deterministic; we use `max_by`. */
  sealed trait DedupePolicy
  case object MeanPolicy extends DedupePolicy
  case object SumPolicy  extends DedupePolicy
  final case class LastPolicy(orderCol: String) extends DedupePolicy

  /** Collapse duplicate (keys, month) rows by `policy` over `valueCols`.
    * `mean`/`sum` aggregate numeric columns only, like pandas
    * `numeric_only=True`. */
  def dedupeByMonth(df: DataFrame, keyCols: Seq[String], monthCol: String,
                    valueCols: Seq[String], policy: DedupePolicy): DataFrame = {
    val aggs = valueCols.map { c =>
      (policy match {
        case MeanPolicy     => avg(col(c))
        case SumPolicy      => sum(col(c))
        case LastPolicy(o)  => max_by(col(c), col(o))
      }).as(c)
    }
    df.groupBy((keyCols :+ monthCol).map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** W8: reindex each key onto its complete month grid; missing months get
    * null-filled rows. Input months must already be month-start dates. */
  def monthGrid(df: DataFrame, keyCols: Seq[String], monthCol: String): DataFrame = {
    val grid = df
      .groupBy(keyCols.map(col): _*)
      .agg(min(col(monthCol)).as("__lo"), max(col(monthCol)).as("__hi"))
      .select(
        (keyCols.map(col) :+
          explode(sequence(col("__lo"), col("__hi"), expr("interval 1 month"))).as(monthCol)): _*)
    grid.join(df, keyCols :+ monthCol, "left")
  }

  /** F-D4: the next `horizon` month-starts after each key's last observed
    * month (reference `future_month_index`), for forecast scaffolding. */
  def futureMonths(df: DataFrame, keyCols: Seq[String], monthCol: String, horizon: Int): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(max(col(monthCol)).as("__last"))
      .select((keyCols.map(col) :+
        explode(sequence(add_months(col("__last"), 1), add_months(col("__last"), horizon),
          expr("interval 1 month"))).as(monthCol)): _*)
}
