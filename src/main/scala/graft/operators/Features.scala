package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Time-series feature engineering (SURVEY §2.6 W1-W7, W9-W11).
  *
  * The reference computes these per-career on a whole in-memory series
  * (notebook cell 5 `add_features`). Here every career/key flows through ONE
  * plan: `Window.partitionBy(keys).orderBy(date)`. All window columns that
  * share the (partition, order) spec collapse into a single `WindowExec`
  * (one shuffle + one sort total) — the scale-out shape for 100 TB: each
  * key's series is processed independently on its executor, no driver loop.
  *
  * pandas-parity: positional ops (`pct_change`, `shift`, `rolling`) equal
  * calendar-lag ops only on a gap-free grid — enforce
  * [[CalendarOps.monthGrid]] first (SURVEY W8, "hard parts" #2).
  */
object Features {

  def keyWindow(partCols: Seq[String], orderCol: String): WindowSpec = {
    val w = if (partCols.isEmpty) Window.partitionBy(lit(1)) else Window.partitionBy(partCols.map(col): _*)
    w.orderBy(col(orderCol))
  }

  /** W1: `pct_change(k)·100` — (v / lag(v, k) − 1)·100. */
  def pctChange(c: Column, k: Int, w: WindowSpec): Column =
    (c / lag(c, k).over(w) - 1) * 100

  /** W7: difference vs k rows back (first diff k=1, seasonal diff k=s). */
  def diff(c: Column, k: Int, w: WindowSpec): Column = c - lag(c, k).over(w)

  private def frame(w: WindowSpec, n: Int): WindowSpec = w.rowsBetween(-(n - 1), 0)

  /** pandas `rolling(n)` default `min_periods = n`: emit null until the
    * window holds n non-null observations (SURVEY W2/W3 guard). */
  private def guarded(aggC: Column, c: Column, n: Int, minPeriods: Int, w: WindowSpec): Column =
    when(count(c).over(frame(w, n)) >= minPeriods, aggC)

  /** W2: rolling mean over n rows. */
  def rollingMean(c: Column, n: Int, w: WindowSpec, minPeriods: Int = -1): Column =
    guarded(avg(c).over(frame(w, n)), c, n, if (minPeriods < 0) n else minPeriods, w)

  /** W3: rolling sample std-dev over n rows. */
  def rollingStd(c: Column, n: Int, w: WindowSpec, minPeriods: Int = -1): Column =
    guarded(stddev_samp(c).over(frame(w, n)), c, n, if (minPeriods < 0) n else minPeriods, w)

  /** W5: rolling median with explicit min_periods (reference nb cell 28
    * outlier repair: window 13, min_periods 6). `median` itself refuses a
    * window frame in Spark 4 ([INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC]);
    * `percentile(c, 0.5)` is the same exact-interpolated statistic and is
    * frame-able. */
  def rollingMedian(c: Column, n: Int, minPeriods: Int, w: WindowSpec): Column =
    guarded(percentile(c, lit(0.5)).over(frame(w, n)), c, n, minPeriods, w)

  /** W4: rolling Pearson correlation of two series. NaN (zero variance)
    * normalized to null for cross-engine parity. */
  def rollingCorr(x: Column, y: Column, n: Int, w: WindowSpec): Column = {
    val c = corr(x, y).over(frame(w, n))
    when(count(when(x.isNotNull && y.isNotNull, 1)).over(frame(w, n)) >= n && !isnan(c), c)
  }

  /** W6: base-100 index vs first non-null observation of the series. */
  def base100(c: Column, w: WindowSpec): Column =
    c / first(c, ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) * 100

  /** W9: running (cumulative) sum. */
  def cumSum(c: Column, w: WindowSpec): Column =
    sum(c).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** W5∘W10 composite (reference nb cell 28
    * `fix_last_outlier_with_rolling_median`): replace each key's LAST
    * observation with the rolling median (window `n`, `minPeriods`)
    * evaluated at the SECOND-TO-LAST row; when that median is null
    * (min_periods unmet) fall back to the second-to-last raw value.
    * Series with fewer than 2 rows are left untouched. Appends `outCol`;
    * the original column is preserved for before/after comparison.
    *
    * PRECONDITION: one row per (key, orderCol) — i.e. a deduped monthly
    * grid ([[CalendarOps.dedupeByMonth]] / `monthGrid` upstream), matching
    * the reference's unique DatetimeIndex. Rows TIED for the max order
    * value would all be treated as "last" and repaired from a
    * nondeterministic lag.
    *
    * Plan shape: the ordered window computes the rolling median and both
    * lags in ONE WindowExec; the is-last test uses an UNORDERED max window
    * over the same partition keys (no extra sort). */
  def repairLastOutlier(df: DataFrame, keyCols: Seq[String], orderCol: String,
                        valueCol: String, n: Int = 13, minPeriods: Int = 6,
                        outCol: String = "repaired"): DataFrame = {
    val w = keyWindow(keyCols, orderCol)
    val wAll =
      if (keyCols.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(keyCols.map(col): _*)
    val withMed = df.withColumn("__roll_med", rollingMedian(col(valueCol), n, minPeriods, w))
    val repl = coalesce(lag(col("__roll_med"), 1).over(w), lag(col(valueCol), 1).over(w))
    val isLast = col(orderCol) === max(col(orderCol)).over(wAll)
    withMed
      .withColumn(outCol, when(isLast && repl.isNotNull, repl).otherwise(col(valueCol)))
      .drop("__roll_med")
  }

  /** Linear gap interpolation — `pandas.Series.interpolate(method=
    * 'linear')` for the interior of a series: every null `valueCol` row
    * with a non-null observation on BOTH sides gets the straight-line
    * value between its nearest non-null neighbors, positioned by the
    * NUMERIC `xCol` (so an irregular grid interpolates by distance, not
    * by row count — pandas' `method='values'` semantics, which coincide
    * with 'linear' on a regular grid). Leading/trailing nulls stay null:
    * extrapolation is a model, not a fill.
    *
    * Exactness: the interpolant `prev + (next − prev) · (x − xp) /
    * (xn − xp)` is per-row arithmetic in one fixed op order over already-
    * materialized neighbor values — bit-identical in any engine replaying
    * the expression (the documented per-row-math determinism property),
    * so the filled series hash-matches a SQL oracle without quantization.
    *
    * Plan shape: two window passes over ONE sort order (forward
    * last-non-null, backward first-non-null — Spark plans both in a
    * single WindowExec pair sharing the shuffle+sort on
    * (keyCols, xCol)); no self-join, no per-gap explode. Appends
    * `outCol`; original column preserved. */
  def interpolateLinear(df: DataFrame, keyCols: Seq[String], xCol: String,
                        valueCol: String,
                        outCol: String = "interpolated"): DataFrame = {
    val base =
      if (keyCols.isEmpty) Window.partitionBy(lit(1)) else Window.partitionBy(keyCols.map(col): _*)
    val fwd = base.orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = base.orderBy(col(xCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val obsX = when(v.isNotNull, col(xCol))
    val pv = last(v, ignoreNulls = true).over(fwd)
    val px = last(obsX, ignoreNulls = true).over(fwd)
    val nv = first(v, ignoreNulls = true).over(bwd)
    val nx = first(obsX, ignoreNulls = true).over(bwd)
    val filled = pv + (nv - pv) * (col(xCol) - px) / (nx - px)
    df.withColumn(outCol,
      when(v.isNotNull, v)
        .when(pv.isNotNull && nv.isNotNull, filled))
  }

  /** Time-weighted average per key (the TWAP/VWAP family): each
    * observation holds its value until the next one, so the average is
    * `Σ gapᵢ·vᵢ / Σ gapᵢ` over consecutive-observation gaps — the
    * step-function integral, not the row mean (which over-weights bursts
    * of closely-spaced updates; at 100 TB of irregular telemetry the two
    * disagree badly).
    *
    * Plan shape: one `lead` window and one aggregate over the SAME
    * (keys) hash partitioning — the aggregate reuses the window's
    * shuffle, so the whole operator moves data once.
    *
    * Exactness contract (q142 discipline): `tsCol` must be integral
    * (epoch micros) and `valueCol` integral (quantize money to cents
    * upstream); gaps and gap-weighted sums are then exact longs, and the
    * average is ONE IEEE division of two exact longs — bit-identical in
    * any engine. Caller keeps `span·maxValue` under 2⁶³ (true for years
    * of µs-timestamped cents by orders of magnitude). Keys with a single
    * observation have an empty integral and report null. */
  def timeWeightedAvg(df: DataFrame, keyCols: Seq[String], tsCol: String,
                      valueCol: String, roundTo: Int = 2,
                      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "timeWeightedAvg needs at least one key column")
    // tieCols make gap attribution among EQUAL timestamps deterministic
    // (the tied-away row gets gap 0); without them, which duplicate
    // carries the forward gap depends on sort instability
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol) +: tieCols.map(col)): _*)
    val t = col(tsCol).cast("long")
    val v = col(valueCol).cast("long")
    val q = math.pow(10, roundTo)
    df.filter(t.isNotNull && v.isNotNull)
      .withColumn("__gap", lead(t, 1).over(w) - t)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_obs"),
        sum(col("__gap")).as("span"),
        sum(col("__gap") * v).as("__wv"))
      .withColumn("twap",
        when(col("span") > 0,
          floor(col("__wv").cast("double") / col("span").cast("double") * q + 0.5) / q))
      .drop("__wv")
  }

  /** Per-group feature scaling — the train-prep staple (z-score and
    * min-max in one pass) as a broadcast-stats pattern, NOT a window:
    * one map-side-combining aggregate computes each group's exact-long
    * `(n, Σx, Σx², min, max)` (the [[Incremental]] monoid), the
    * group-count-sized stats table broadcasts back, and every row scales
    * with zero shuffle of the data itself — at 100 TB the rows never
    * move, only the stats do.
    *
    * Determinism: sums are exact longs (integral input, cast upstream);
    * z-score is the fixed double tree `(n·x − Σx) / sqrt(n·Σx² − Σx·Σx)`
    * — the population-σ form cleared of divisions until the final one —
    * rounded to `z_e6`; min-max is pure integer `(x−min)·10⁶ div
    * (max−min)`. The numerator `n·x − Σx` stays an exact long (bounded
    * by n·|x|, fine for billions of cents-valued rows); the VARIANCE
    * determinant multiplies three sums and would overflow 2⁶³ long
    * before the numerator does, so it runs in DOUBLE as a fixed tree
    * (the [[Regression.groupedOls2]] Cramer convention — engine-exact
    * without the long-range ceiling). Degenerate groups (σ = 0 or
    * min = max) scale to null, not NaN. */
  def standardize(df: DataFrame, keyCols: Seq[String],
                  valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "standardize needs at least one key column")
    Seq("z_e6", "minmax_e6").foreach(c => require(!df.columns.contains(c),
      s"standardize writes $c — rename the existing column"))
    val x = col(valueCol).cast("long")
    val stats = df.filter(x.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(x).as("__sx"),
        sum(x * x).as("__sxx"), min(x).as("__mn"), max(x).as("__mx"))
    val den2 = col("__n").cast("double") * col("__sxx").cast("double") -
      col("__sx").cast("double") * col("__sx").cast("double")
    // z = (x−μ)/σ_pop with σ_pop = sqrt(n·Σx²−(Σx)²)/n, so the n's cancel
    // into one clean ratio: exact-long numerator over the double sqrt
    val z = (col("__n") * x - col("__sx")).cast("double") / sqrt(den2)
    df.join(broadcast(stats), keyCols)
      .withColumn("z_e6",
        when(den2 > 0, floor(z * 1e6 + 0.5).cast("long")))
      .withColumn("minmax_e6",
        when(col("__mx") > col("__mn"),
          expr(s"(cast($valueCol as bigint) - __mn) * 1000000L div (__mx - __mn)")))
      .drop("__n", "__sx", "__sxx", "__mn", "__mx")
  }

  /** Exponential time-decay score per key — recency-weighted engagement
    * (`Σ vᵢ·2^(−ageᵢ/halfLife)`), the ranking signal feeds/search use,
    * computed EXACTLY: age quantizes to whole half-lives (integer
    * division of exact micros against the key's newest event), each term
    * becomes the integer `v · 2^(maxHalfLives − k)` via a bit shift,
    * terms older than `maxHalfLives` contribute exactly 0 BY DEFINITION
    * (at 20 half-lives the weight is below 10⁻⁶ — the truncation is the
    * operator's contract, which is what makes it replayable), and the
    * final descale divides the exact long sum by 2^maxHalfLives — a
    * power of two, so even the resulting DOUBLE is exact while the sum
    * stays under 2⁵³ (caller domain: Σv·2²⁰ < 2⁵³, i.e. Σv < 8·10⁹ per
    * key — millions of cents-valued events).
    *
    * ONE full-frame window (per-key max time) + one aggregate on the
    * same partitioning. Output per key: `n_events`, `last_us`,
    * `decay_score` (in value units). */
  def decayScore(df: DataFrame, keyCols: Seq[String], tsCol: String,
                 valueCol: String, halfLifeMicros: Long,
                 maxHalfLives: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "decayScore needs at least one key column")
    require(halfLifeMicros > 0, s"halfLifeMicros must be positive, got $halfLifeMicros")
    require(maxHalfLives >= 1 && maxHalfLives <= 40,
      s"maxHalfLives must be in [1, 40], got $maxHalfLives")
    val t = col(tsCol).cast("long")
    val v = col(valueCol).cast("long")
    val part = Window.partitionBy(keyCols.map(col): _*)
    val scale = math.pow(2.0, maxHalfLives)
    df.filter(t.isNotNull && v.isNotNull)
      .withColumn("__last", max(t).over(part))
      // SQL `div` (exact long) — operator `/` would detour through double
      .withColumn("__k",
        expr(s"(__last - cast(`$tsCol` as bigint)) div ${halfLifeMicros}L"))
      .withColumn("__term",
        when(col("__k") <= maxHalfLives,
          expr(s"shiftleft(cast(`$valueCol` as bigint), " +
            s"cast($maxHalfLives - __k as int))"))
          .otherwise(lit(0L)))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"), max(t).as("last_us"),
        (sum(col("__term")) / lit(scale)).as("decay_score"))
  }

  /** Classical seasonal decomposition (the moving-average half of STL;
    * statsmodels `seasonal_decompose(model='additive')`): per key,
    *   - trend: centered 2×`period` moving average — for even periods
    *     the standard half-weighted-endpoint form, computed as the SUM
    *     of the two adjacent `period`-windows (an exact long, ×2·period
    *     the trend) so no float enters until the final readout;
    *   - seasonal: mean detrended value per phase (position mod period),
    *     from exact long numerators;
    *   - residual: value − trend − seasonal.
    * Input must be a gap-free per-key grid ([[CalendarOps.monthGrid]]
    * upstream — positional windows equal calendar windows only without
    * holes) with integral values.
    *
    * Determinism: the only float steps are three fixed expression trees
    * (trend, seasonal, residual readouts off exact-long sums), each
    * quantized to `_e6`; edge rows without a full 2×period neighborhood
    * emit null trend/residual, and their detrended values are simply
    * absent from the seasonal means — both engines agree because
    * null-ness is structural (row position), not value-dependent.
    *
    * Plan shape: rolling sums + phase means ride TWO hash partitionings
    * — (keys) for the windows, (keys, phase) for the seasonal aggregate
    * joined back broadcast — raw rows shuffle once, the join side is
    * period-sized. */
  def seasonalDecompose(df: DataFrame, keyCols: Seq[String], ordCol: String,
                        valueCol: String, period: Int = 12): DataFrame = {
    require(keyCols.nonEmpty, "seasonalDecompose needs at least one key column")
    require(period >= 2, s"period must be >= 2, got $period")
    val x = col(valueCol).cast("long")
    val part = Window.partitionBy(keyCols.map(col): _*)
    val ord = part.orderBy(col(ordCol))
    val half = period / 2
    // two adjacent period-windows: [-half, half-1] and [-half+1, half];
    // their sum is the 2x-period-weighted centered MA numerator
    val wA = ord.rowsBetween(-half, half - 1)
    val wB = ord.rowsBetween(-half + 1, half)
    val den = 2.0 * period
    val q6 = 1e6
    val phase = ((row_number().over(ord) - 1) % period).as("__phase")
    val base = df
      .withColumn("__phase", phase)
      .withColumn("__sumA", when(count(x).over(wA) === period, sum(x).over(wA)))
      .withColumn("__sumB", when(count(x).over(wB) === period, sum(x).over(wB)))
      .withColumn("__t2p", col("__sumA") + col("__sumB")) // null at edges
    // detrended ×2p stays an exact long: 2p·x − t2p
    val det2p = lit(2 * period) * x - col("__t2p")
    val withDet = base.withColumn("__det2p", det2p)
    val seas = withDet.filter(col("__det2p").isNotNull)
      .groupBy((keyCols.map(col) :+ col("__phase")): _*)
      .agg(sum(col("__det2p")).as("__sn"), count(lit(1)).as("__sc"))
    withDet.join(broadcast(seas), keyCols :+ "__phase", "left")
      .withColumn("trend_e6",
        floor(col("__t2p").cast("double") / den * q6 + 0.5).cast("long"))
      .withColumn("seasonal_e6",
        floor(col("__sn").cast("double") / (col("__sc").cast("double") * den) * q6 + 0.5)
          .cast("long"))
      .withColumn("resid_e6",
        floor((x.cast("double") - col("__t2p").cast("double") / den -
          col("__sn").cast("double") / (col("__sc").cast("double") * den)) * q6 + 0.5)
          .cast("long"))
      .drop("__sumA", "__sumB", "__t2p", "__det2p", "__sn", "__sc", "__phase")
  }

  /** Seasonal and trend STRENGTH per key — Hyndman's feature-space
    * readout over [[seasonalDecompose]]'s components ("WHICH of a
    * million series are strongly seasonal / strongly trending" — the
    * screen that decides who gets a seasonal model, where the
    * decomposition itself is the per-series answer):
    * `F_S = max(0, 1 − Var(R)/Var(x − T))`,
    * `F_T = max(0, 1 − Var(R)/Var(x − S))`, both in [0, 1].
    *
    * Exactness: the components are ALREADY e6-quantized integers, so
    * detrended/deseasonalized values are exact BIGINT differences and
    * each variance rides the exact DECIMAL form `n·Σv² − (Σv)²` (no
    * mean, no cancellation); each strength is one double division of
    * two exact decimals, e6-quantized, clamped at 0 AFTER rounding so
    * both engines agree at the boundary. Edge rows (null trend) carry
    * no evidence and drop. Keys with zero denominator variance emit
    * null.
    *
    * Scale shape: seasonalDecompose's plan plus one map-side-combined
    * aggregate. Output: `(keys…, n_used, f_seasonal_e6,
    * f_trend_e6)`. */
  def seasonalStrength(df: DataFrame, keyCols: Seq[String], ordCol: String,
                       valueCol: String, period: Int = 12): DataFrame = {
    val dec = seasonalDecompose(df, keyCols, ordCol, valueCol, period)
      .filter(col("resid_e6").isNotNull)
      // DECIMAL scaling: a raw long x*1e6 would silently wrap past
      // ~9.2e12 while the HUGEINT oracle kept computing
      .withColumn("__det", expr(
        s"cast(`$valueCol` as decimal(38,0)) * 1000000 - trend_e6"))
      .withColumn("__des", expr(
        s"cast(`$valueCol` as decimal(38,0)) * 1000000 - seasonal_e6"))
    val sums = dec.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_used"),
        sum(expr("cast(resid_e6 as decimal(38,0))")).as("__sr"),
        sum(expr("cast(resid_e6 as decimal(38,0)) * resid_e6")).as("__qr"),
        sum(expr("cast(__det as decimal(38,0))")).as("__sd"),
        sum(expr("cast(__det as decimal(38,0)) * __det")).as("__qd"),
        sum(expr("cast(__des as decimal(38,0))")).as("__ss"),
        sum(expr("cast(__des as decimal(38,0)) * __des")).as("__qs"))
    def strength(qc: String, sc: String) =
      s"""case when n_used * $qc - $sc * $sc > 0 then
         |  greatest(cast(0 as bigint),
         |    cast(floor((1.0 - cast(n_used * __qr - __sr * __sr as double)
         |      / cast(n_used * $qc - $sc * $sc as double))
         |      * 1000000 + 0.5) as bigint))
         |end""".stripMargin
    sums
      .withColumn("f_seasonal_e6", expr(strength("__qd", "__sd")))
      .withColumn("f_trend_e6", expr(strength("__qs", "__ss")))
      .drop("__sr", "__qr", "__sd", "__qd", "__ss", "__qs")
  }

  /** MULTIPLICATIVE classical seasonal decomposition — the
    * ratio-to-moving-average method (statsmodels
    * `seasonal_decompose(model='multiplicative')`), the other classical
    * member beside [[seasonalDecompose]]'s additive form and the right
    * one when seasonal amplitude SCALES with level (revenue series,
    * traffic counts): `x = T · S · R` with
    *   - trend: the identical even-period centered 2×period MA (the
    *     exact-long `t2p` machinery is shared by construction);
    *   - seasonal: per-phase MEAN OF RATIOS `x/trend`, normalized so the
    *     indices average 1 over the period (the statsmodels
    *     `period_averages /= period_averages.mean()` convention);
    *   - residual: `x / (T · S)`.
    *
    * Exactness: each ratio is e9-quantized to an integer BEFORE any
    * cross-row sum (`⌊2p·x/t2p · 10⁹ + 0.5⌋` — one fixed double tree),
    * so phase sums are order-independent BIGINTs; the per-phase average
    * re-quantizes by EXACT INTEGER rounding `(2·sn + sc) div (2·sc)`
    * (positive operands — Spark `div` and DuckDB `//` agree), the
    * period-mean normalizer is then an exact BIGINT sum of those
    * per-phase integers, and seasonal/residual are one fixed double
    * tree each off exact integers, e6-quantized. BIGINT bound: phase
    * ratio sums wrap past ~9·10⁹ in-phase rows (ratios ≈ 1 at e9).
    * Requires strictly positive values (ratios and logs of a
    * multiplicative model are undefined at ≤ 0): rows whose full-window
    * trend is null (edges) or ≤ 0 contribute no ratio and emit null
    * seasonal-dependent readouts, matching the classical NaN edges.
    *
    * Plan shape: identical to the additive form — one (keys) shuffle
    * for the windows, a period-sized phase grid broadcast back.
    * Output: input + `(trend_e6, seasonal_e6, resid_e6)` with seasonal
    * as the mean-one index ×10⁶. */
  def seasonalDecomposeMul(df: DataFrame, keyCols: Seq[String], ordCol: String,
                           valueCol: String, period: Int = 12): DataFrame = {
    require(keyCols.nonEmpty, "seasonalDecomposeMul needs at least one key column")
    require(period >= 2, s"period must be >= 2, got $period")
    val x = col(valueCol).cast("long")
    val part = Window.partitionBy(keyCols.map(col): _*)
    val ord = part.orderBy(col(ordCol))
    val half = period / 2
    val wA = ord.rowsBetween(-half, half - 1)
    val wB = ord.rowsBetween(-half + 1, half)
    val den = 2.0 * period
    val q6 = 1e6
    val phase = ((row_number().over(ord) - 1) % period).as("__phase")
    val base = df
      .withColumn("__phase", phase)
      .withColumn("__sumA", when(count(x).over(wA) === period, sum(x).over(wA)))
      .withColumn("__sumB", when(count(x).over(wB) === period, sum(x).over(wB)))
      .withColumn("__t2p", col("__sumA") + col("__sumB"))
      // e9-quantized ratio x/trend = 2p·x/t2p; null at edges / non-pos trend
      .withColumn("__r9", expr(
        s"""case when __t2p > 0 then
           |  cast(floor(cast(`$valueCol` as double) * ${2 * period}
           |    / cast(__t2p as double) * 1000000000 + 0.5) as bigint)
           |end""".stripMargin))
      // lazy localCheckpoint (the kruskalWallis convention): the windowed
      // frame feeds the phase grid, the normalizer, AND the final join —
      // without it each branch re-scans and re-windows the input (the
      // round-9 plan audit read 6 scans)
      .localCheckpoint(false)
    val seas = base.filter(col("__r9").isNotNull)
      .groupBy((keyCols.map(col) :+ col("__phase")): _*)
      .agg(sum(col("__r9")).as("__sn"), count(lit(1)).as("__sc"))
      // exact integer round-half-up of the phase mean (operands positive)
      .withColumn("__a9", expr("(2 * __sn + __sc) div (2 * __sc)"))
    val norm = seas.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__a9")).as("__m9"), count(lit(1)).as("__np"))
    val sTree = s"(cast(__a9 as double) * __np / cast(__m9 as double))"
    base
      .join(broadcast(seas), keyCols :+ "__phase", "left")
      .join(broadcast(norm), keyCols.toSeq, "left")
      .withColumn("trend_e6",
        floor(col("__t2p").cast("double") / den * q6 + 0.5).cast("long"))
      .withColumn("seasonal_e6", expr(
        s"""case when __m9 > 0 then
           |  cast(floor($sTree * 1000000 + 0.5) as bigint) end""".stripMargin))
      .withColumn("resid_e6", expr(
        s"""case when __t2p > 0 and __m9 > 0 then
           |  cast(floor(cast(`$valueCol` as double) * ${2 * period}
           |    / cast(__t2p as double) / $sTree * 1000000 + 0.5) as bigint)
           |end""".stripMargin))
      .drop("__sumA", "__sumB", "__t2p", "__r9", "__sn", "__sc", "__a9",
        "__m9", "__np", "__phase")
  }

  /** CUSUM level-shift detection per key — the classic change-point
    * screen: cumulative deviation from the series mean, measured as its
    * rise above its own running minimum (`drift = cum − min(cum so
    * far)`), which is exactly the one-sided CUSUM statistic for an
    * upward shift without the per-step clamp recursion (the clamped and
    * min-referenced forms coincide: both measure the best suffix sum).
    * A sustained post-change upward shift grows `drift` linearly; noise
    * does not.
    *
    * Exactness: with integral `valueCol` (cents), deviations are scaled
    * by n — `dev_i = n·x_i − Σx` — so `cum`, its running min, and
    * `drift_scaled = drift` are EXACT LONGS (no mean division anywhere);
    * the caller thresholds `drift_scaled` against `n·h`. Overflow bound:
    * `n²·max|x|` under 2⁶³ — a million-point series of cents clears it.
    *
    * Plan shape: three window frames (full-partition Σ/n, running sum,
    * running min) over ONE (keys, ord) sort — a single WindowExec pair,
    * one shuffle. Output: input rows plus `dev_scaled`, `drift_scaled`,
    * and `n` (for threshold scaling). */
  def cusumDrift(df: DataFrame, keyCols: Seq[String], ordCol: String,
                 valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "cusumDrift needs at least one key column")
    Seq("dev_scaled", "drift_scaled", "n", "__cum").foreach(c =>
      require(!df.columns.contains(c), s"cusumDrift writes $c — rename the existing column"))
    val part = Window.partitionBy(keyCols.map(col): _*)
    val full = part.orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val run = part.orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = col(valueCol).cast("long")
    df.withColumn("n", count(lit(1)).over(full))
      .withColumn("dev_scaled", x * col("n") - sum(x).over(full))
      .withColumn("__cum", sum(col("dev_scaled")).over(run))
      .withColumn("drift_scaled", col("__cum") - min(col("__cum")).over(run))
      .drop("__cum")
  }

  /** Single-changepoint localization per key — the binary-segmentation
    * base step (Scott & Knott; the AMOC "at most one change" form):
    * the split `t* = argmin_t [SSE(y₁..y_t) + SSE(y_{t+1}..y_n)]` over
    * an INTEGER series, i.e. the two-segment least-squares mean fit.
    * [[cusumDrift]] raises the flag that a shift exists; this names
    * WHERE, and `gain_e4` (total SSE minus best split SSE) sizes it.
    * Recursing on the halves gives full binary segmentation; the base
    * step is the 95% use case ("when did this metric break").
    *
    * Determinism: prefix sums Σy, Σy² are EXACT BIGINTs on one ordered
    * window (caller keeps Σy² < 2⁶³ — rescale upstream). Each split's
    * cost is then ONE fixed double tree over four exact integers —
    * `(t·Σ₂ᴸ − Σ₁ᴸ²)/t + ((n−t)·Σ₂ᴿ − Σ₁ᴿ²)/(n−t)`, e4-quantized —
    * and the argmin orders by the ROUNDED cost with the split index as
    * tie-break (the adfFixedLag convention: decide on what both
    * engines can replay).
    *
    * Scale shape: ONE (keys, ord) window sort carries both prefix sums
    * and the total; the argmin is a second window over the same
    * partitioning (no extra shuffle). Entirely declarative — no
    * kernel, a million keys ride two WindowExecs. Output: one row per
    * key with n ≥ 4 — `(keys…, n_obs, split_t, split_ord, cost_e4,
    * total_cost_e4, gain_e4)`; `split_t` is the last index of the left
    * segment (1-based), `split_ord` its order value. */
  def singleChangepoint(df: DataFrame, keyCols: Seq[String], ordCol: String,
                        valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "singleChangepoint needs at least one key column")
    val part = Window.partitionBy(keyCols.map(col): _*)
    val run = part.orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = part.orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val x = col(valueCol).cast("long")
    // ONE select for all six window columns: chained withColumn inserts
    // projections between the Window nodes and defeats CollapseWindow —
    // same (partition, order) spec in one select plans as a single
    // WindowExec pass over the one sort
    val splits = df
      .filter(col(ordCol).isNotNull && x.isNotNull)
      .select(col("*"),
        row_number().over(part.orderBy(col(ordCol))).cast("long").as("__t"),
        sum(x).over(run).as("__c1"),
        sum(x * x).over(run).as("__c2"),
        count(lit(1)).over(full).as("__n"),
        sum(x).over(full).as("__t1"),
        sum(x * x).over(full).as("__t2"))
      .filter(col("__n") >= 4 && col("__t") >= 1 && col("__t") < col("__n"))
      // cast each factor to double BEFORE multiplying: the BIGINT products
      // t·Σy² and Σy·Σy wrap at n·Σy² ≳ 2⁶³ — well inside the documented
      // Σy² < 2⁶³ prefix-sum contract — while the double products round
      // identically in both engines
      .withColumn("__cost_e4", expr(
        """cast(floor(((cast(__t as double) * __c2 - cast(__c1 as double) * __c1) / __t
          |  + (cast(__n - __t as double) * (__t2 - __c2)
          |     - cast(__t1 - __c1 as double) * (__t1 - __c1)) / (__n - __t))
          |  * 10000 + 0.5) as bigint)""".stripMargin))
      .withColumn("__total_e4", expr(
        """cast(floor((cast(__n as double) * __t2 - cast(__t1 as double) * __t1)
          |  / __n * 10000 + 0.5) as bigint)""".stripMargin))
    splits
      .withColumn("__rk",
        row_number().over(part.orderBy(col("__cost_e4"), col("__t"))))
      .filter(col("__rk") === 1)
      .select(keyCols.map(col) :+ col("__n").as("n_obs") :+
        col("__t").as("split_t") :+ col(ordCol).as("split_ord") :+
        col("__cost_e4").as("cost_e4") :+ col("__total_e4").as("total_cost_e4") :+
        (col("__total_e4") - col("__cost_e4")).as("gain_e4"): _*)
  }

  /** Integer weights of the truncated EWMA kernel: `w₀ = 10⁶`,
    * `wⱼ = w_{j−1}·alphaE6 div 10⁶` — a PURE INTEGER recurrence, so the
    * weight table is identical in any engine that replays it (no
    * float pow to drift). Single source for the operator AND the
    * oracle builder. */
  def ewmaWeights(alphaE6: Long, k: Int): Seq[Long] = {
    require(alphaE6 > 0 && alphaE6 <= 1000000L,
      s"alphaE6 must be in (0, 1e6], got $alphaE6")
    require(k >= 1, s"k must be >= 1, got $k")
    Iterator.iterate(1000000L)(w => w * alphaE6 / 1000000L).take(k).toSeq
  }

  /** Trailing-k exponentially-weighted moving average over an INTEGER
    * series — `ewma_t = Σⱼ wⱼ·x_{t−j} / Σⱼ wⱼ` over the last `k`
    * observations (pandas `ewm(adjust=True)` truncated to a bounded
    * window; the tail beyond k carries `α^k ≤` ~17% of the head weight
    * at the 0.8/8 defaults and is the price of a bounded, restartable
    * operator). ENTIRELY integer arithmetic: the weights come from
    * [[ewmaWeights]]'s integer recurrence, each term is an exact
    * `long·long` product, and the readout is one integer division —
    * no float exists anywhere, so the result is engine-exact by
    * construction. Missing leading observations (series shorter than
    * k) drop both the term and its weight, exactly as pandas' adjust
    * normalization does.
    *
    * Scale shape: all k lags stack on ONE (keys, order) window sort —
    * one shuffle, one sort, k frame reads. BIGINT bound:
    * `Σ|x|·10⁶·k` must fit — fine to |x| ~ 10¹² at k = 8.
    *
    * Output: input columns + `ewma` (floored integer, `valueCol`'s
    * scale). */
  def ewmaTrailing(df: DataFrame, keys: Seq[String], orderCol: String,
                   valueCol: String, alphaE6: Long = 800000L,
                   k: Int = 8): DataFrame = {
    val ws = ewmaWeights(alphaE6, k)
    val w =
      (if (keys.isEmpty) Window.partitionBy(lit(1))
       else Window.partitionBy(keys.map(col): _*)).orderBy(col(orderCol))
    val x = col(valueCol).cast("long")
    val num = ws.zipWithIndex.map { case (wj, j) =>
      coalesce(lag(x, j).over(w) * lit(wj), lit(0L)) }.reduce(_ + _)
    val den = ws.zipWithIndex.map { case (wj, j) =>
      when(lag(x, j).over(w).isNotNull, lit(wj)).otherwise(lit(0L)) }.reduce(_ + _)
    // one projection for BOTH window sums: separate withColumns would
    // plan two WindowExecs (still one sort, but twice the frame walks)
    df.select(col("*"), num.as("__num"), den.as("__den"))
      .withColumn("ewma", expr("__num div __den"))
      .drop("__num", "__den")
  }

  /** Cross-domain quantile normalization — map each (group, value) to
    * the GLOBAL order statistic at the value's within-group permille
    * rank: scores from differently-calibrated domains (one quality
    * model per source, different scales) become comparable by
    * construction, the genomics quantile-normalization idea applied to
    * corpus scoring. Integer-exact end to end: within-group position is
    * `(rank−1)·1000 div (n−1)` with min-rank ties (identical values ⇒
    * identical permille), the global target index is
    * `permille·(N−1) div 1000`, and the normalized value is the actual
    * global sample at that index — never an interpolated float.
    *
    * Scale shape: one group-partitioned window pair; the global order
    * statistic comes from [[graft.text.Corpus.globalRank]] (range-
    * partitioned sort + zipWithIndex — no single-task window) and
    * attaches by ONE equi-join on the computed index. Output is the
    * distinct (group, value) readout: `(groupCol, valueCol, permille,
    * norm_value)`. Single-value groups normalize at permille 0 by
    * convention. */
  def quantileNormalize(df: DataFrame, groupCol: String,
                        valueCol: String): DataFrame = {
    val b = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"))
    val wg = Window.partitionBy(col("__g")).orderBy(col("__v"))
    val wn = Window.partitionBy(col("__g"))
    val p = b
      .withColumn("__rk", rank().over(wg))
      .withColumn("__n", count(lit(1)).over(wn))
      .select(col("__g"), col("__v"),
        when(col("__n") === 1, lit(0L))
          .otherwise(expr("(__rk - 1) * 1000 div (__n - 1)")).as("permille"))
      .distinct()
    val gidx = graft.text.Corpus.globalRank(b.select(col("__v").as("__gv")),
      Seq(col("__gv").asc), "__gi")
    val n = b.count()
    p.withColumn("__gi", expr(s"permille * (${n} - 1) div 1000"))
      .join(gidx, Seq("__gi"))
      .select(col("__g").as(groupCol), col("__v").as(valueCol),
        col("permille"), col("__gv").as("norm_value"))
  }

  /** W11: keep only the trailing `n` rows of each key's series (reference
    * `s.iloc[-window:]` before drift fitting). `orderCols` should end in a
    * unique tiebreaker for determinism. */
  def tailRows(df: DataFrame, partCols: Seq[String], orderCols: Seq[String], n: Int): DataFrame = {
    val w =
      (if (partCols.isEmpty) Window.partitionBy(lit(1)) else Window.partitionBy(partCols.map(col): _*))
        .orderBy(orderCols.map(col(_).desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }
}
