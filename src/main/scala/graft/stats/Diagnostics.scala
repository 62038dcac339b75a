package graft.stats

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark bindings for the per-series diagnostics/model layer (SURVEY §3:
  * "the one place the engine is deliberately hybrid" — except it is not
  * hybrid here: instead of collecting series to the driver like the
  * reference, each key's series is assembled and analyzed INSIDE its
  * executor via `groupByKey.mapGroups`. A 1000-executor cluster runs a
  * million independent series fits with no driver involvement; each series
  * is assumed small enough for one task (true by construction for monthly
  * data — centuries fit in KBs).
  */
object Diagnostics {

  private val statsSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("n_obs", IntegerType),
    StructField("adf_stat", DoubleType),
    StructField("adf_lag", IntegerType),
    StructField("adf_stationary_5pct", BooleanType),
    StructField("kpss_stat", DoubleType),
    StructField("kpss_stationary_5pct", BooleanType),
    StructField("yj_lambda", DoubleType),
    StructField("seasonal_period", IntegerType)))

  /** Stationarity + transform diagnostics per key: ADF, KPSS, fitted
    * Yeo-Johnson λ, dominant seasonal period. Rows with null values are
    * dropped (pandas dropna parity); series too short for a statistic get
    * null in that column. */
  def stationarity(df: DataFrame, keyCols: Seq[String], orderCol: String,
                   valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val keyExpr = if (keyCols.isEmpty) lit("all") else concat_ws("|", keyCols.map(col): _*)
    val slim = df
      .filter(col(valueCol).isNotNull)
      .select(keyExpr.as("key"), col(orderCol).cast("string").as("ord"),
        col(valueCol).cast("double").as("v"))
    import spark.implicits._
    val grouped = slim.as[(String, String, Double)]
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val series = it.toArray.sortBy(_._2).map(_._3)
        val n = series.length
        val adfR = if (n >= 12) Some(TimeSeriesStats.adf(series)) else None
        val kpssR = if (n >= 8) Some(TimeSeriesStats.kpss(series)) else None
        val yj = if (n >= 3) Some(TimeSeriesStats.yeoJohnsonLambda(series)) else None
        val per = if (n >= 4) Some(TimeSeriesStats.seasonalPeriod(series)) else None
        Row(key, n,
          adfR.map(_.stat).orNull, adfR.map(_.lag).orNull,
          adfR.map(_.stationary5).orNull,
          kpssR.map(_.stat).orNull, kpssR.map(_.stationary5).orNull,
          yj.orNull, per.orNull)
      }(Encoders.row(statsSchema))
    grouped.toDF()
  }

  private val acfSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("lag", IntegerType),
    StructField("acf", DoubleType),
    StructField("pacf", DoubleType)))

  /** ACF + PACF per key at lags 1..nlags (U7 diagnostics; reference uses
    * nlags 48-60). One row per (key, lag). */
  def correlogram(df: DataFrame, keyCols: Seq[String], orderCol: String,
                  valueCol: String, nlags: Int): DataFrame = {
    val spark = df.sparkSession
    val keyExpr = if (keyCols.isEmpty) lit("all") else concat_ws("|", keyCols.map(col): _*)
    val slim = df
      .filter(col(valueCol).isNotNull)
      .select(keyExpr.as("key"), col(orderCol).cast("string").as("ord"),
        col(valueCol).cast("double").as("v"))
    import spark.implicits._
    slim.as[(String, String, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val series = it.toArray.sortBy(_._2).map(_._3)
        val k = math.min(nlags, series.length - 2)
        if (k < 1) Iterator.empty
        else {
          val a = TimeSeriesStats.acf(series, k)
          val p = TimeSeriesStats.pacf(series, k)
          (1 to k).iterator.map(l => Row(key, l, a(l - 1), p(l - 1)))
        }
      }(Encoders.row(acfSchema))
      .toDF()
  }

  private val arSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("order", IntegerType),
    StructField("intercept", DoubleType),
    StructField("sigma2", DoubleType),
    StructField("aic", DoubleType),
    StructField("step", IntegerType),
    StructField("forecast", DoubleType)))

  /** AR-by-AIC fit + h-step mean forecast per key — the grid-search shape
    * of the reference's SARIMAX candidate loop (U8), linear state only.
    * Output: one row per (key, step). */
  def arForecast(df: DataFrame, keyCols: Seq[String], orderCol: String,
                 valueCol: String, horizon: Int,
                 orders: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    val spark = df.sparkSession
    val keyExpr = if (keyCols.isEmpty) lit("all") else concat_ws("|", keyCols.map(col): _*)
    val slim = df
      .filter(col(valueCol).isNotNull)
      .select(keyExpr.as("key"), col(orderCol).cast("string").as("ord"),
        col(valueCol).cast("double").as("v"))
    import spark.implicits._
    slim.as[(String, String, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val series = it.toArray.sortBy(_._2).map(_._3)
        val fit = TimeSeriesStats.fitArByAic(series, orders)
        TimeSeriesStats.forecastAr(fit, series, horizon).zipWithIndex.iterator
          .map { case (f, i) =>
            Row(key, fit.order, fit.intercept, fit.sigma2, fit.aic, i + 1, f)
          }
      }(Encoders.row(arSchema))
      .toDF()
  }
}
