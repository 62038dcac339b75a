package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped ordinary-least-squares trend fit — one `y = a + b·x` line per
  * key, computed declaratively from the five classical sufficient sums
  * (n, Σx, Σy, Σxy, Σx²). This is the scale-out form of "fit a trend to
  * every series": a 100 TB corpus with a billion keys runs it as ONE
  * map-side-combining aggregation — no per-series collect, no window, no
  * iterative solver — where the reference's per-series
  * `statsmodels`/`numpy.polyfit` loop is driver-bound
  * (`EDA Notebooks/Current Employment Statistics EDA.ipynb` cell 27 fits
  * one model at a time; `graft.stats.Diagnostics` keeps that shape for
  * the models that NEED per-series kernels — a straight line does not).
  *
  * Exactness contract (the q117/q122 discipline): with INTEGRAL `x` and
  * `y` (cast upstream; quantize money to cents first), all five sums are
  * exact longs and order-independent, the slope is ONE IEEE division of
  * two exact longs — `(n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)` — and the
  * intercept is the fixed op sequence `(Σy − b·Σx) / n`. Both are
  * bit-identical in any engine replaying the same expression, so the
  * approximate-looking doubles still hash-match a SQL oracle.
  *
  * Domain: the caller keeps `n·|Σxy|` and `n·Σx²` under 2⁶³ (true for
  * any per-key series whose length × x-range × y-range stays below ~1e18
  * — centuries of monthly data in cents clears it by orders of
  * magnitude). A key with fewer than 2 distinct x values has a singular
  * design (denominator 0) and reports null slope/intercept rather than
  * failing the job — the [[graft.stats.Diagnostics]] degenerate-series
  * convention. */
object Regression {

  /** One row per key: `n`, `slope`, `intercept` (rounded to `roundTo`
    * decimals via the knife-edge-safe `floor(x·10^r + 0.5)` form). */
  def groupedOls(df: DataFrame, keyCols: Seq[String], xCol: String,
                 yCol: String, roundTo: Int = 6): DataFrame = {
    require(keyCols.nonEmpty, "groupedOls needs at least one key column")
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val sums = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
      den.cast("double")
    val icept = (col("sy").cast("double") - col("__b") * col("sx").cast("double")) /
      col("n").cast("double")
    val q = math.pow(10, roundTo)
    def rnd(c: org.apache.spark.sql.Column) = floor(c * q + 0.5) / q
    sums
      .withColumn("__b", when(den =!= 0, slope))
      .select(keyCols.map(col) :+ col("n") :+
        rnd(col("__b")).as("slope") :+
        rnd(when(den =!= 0, icept)).as("intercept"): _*)
  }
}
