package graft.stats

/** Pure-JVM time-series statistics (SURVEY §2.11 U4-U8): the reference
  * leans on scipy/statsmodels for these; series are tiny (~500 obs per
  * career) so the math runs per-group inside executors
  * (see [[Diagnostics]]) — Spark parallelizes ACROSS series, the kernels
  * themselves are plain deterministic Scala.
  *
  * Implementations follow the published definitions (Dickey-Fuller 1979,
  * Kwiatkowski et al. 1992, Yeo-Johnson 2000); critical values are the
  * standard published asymptotic tables.
  */
object TimeSeriesStats {

  // ---------------------------------------------------------------- OLS

  /** Least-squares solve (X'X)b = X'y via Gaussian elimination with partial
    * pivoting. Returns (coefficients, residual variance s², se(b)). */
  def ols(x: Array[Array[Double]], y: Array[Double]): (Array[Double], Double, Array[Double]) = {
    val n = x.length
    val p = x(0).length
    require(n > p, s"need n > p (n=$n, p=$p)")
    val xtx = Array.ofDim[Double](p, p)
    val xty = new Array[Double](p)
    var i = 0
    while (i < n) {
      val r = x(i)
      var a = 0
      while (a < p) {
        xty(a) += r(a) * y(i)
        var b = a
        while (b < p) { xtx(a)(b) += r(a) * r(b); b += 1 }
        a += 1
      }
      i += 1
    }
    var a = 0
    while (a < p) { var b = 0; while (b < a) { xtx(a)(b) = xtx(b)(a); b += 1 }; a += 1 }

    val inv = invert(xtx)
    val beta = new Array[Double](p)
    a = 0
    while (a < p) {
      var b = 0
      while (b < p) { beta(a) += inv(a)(b) * xty(b); b += 1 }
      a += 1
    }
    var rss = 0.0
    i = 0
    while (i < n) {
      var pred = 0.0
      var b = 0
      while (b < p) { pred += x(i)(b) * beta(b); b += 1 }
      val e = y(i) - pred
      rss += e * e
      i += 1
    }
    val s2 = rss / (n - p)
    val se = Array.tabulate(p)(j => math.sqrt(s2 * inv(j)(j)))
    (beta, s2, se)
  }

  /** Matrix inverse by Gauss-Jordan with partial pivoting (tiny p). */
  private def invert(m0: Array[Array[Double]]): Array[Array[Double]] = {
    val p = m0.length
    val m = m0.map(_.clone())
    val inv = Array.tabulate(p, p)((i, j) => if (i == j) 1.0 else 0.0)
    var colI = 0
    while (colI < p) {
      var piv = colI
      var best = math.abs(m(colI)(colI))
      var r = colI + 1
      while (r < p) { val v = math.abs(m(r)(colI)); if (v > best) { piv = r; best = v }; r += 1 }
      require(best > 1e-12, "singular design matrix")
      if (piv != colI) { val t = m(piv); m(piv) = m(colI); m(colI) = t
        val t2 = inv(piv); inv(piv) = inv(colI); inv(colI) = t2 }
      val d = m(colI)(colI)
      var c = 0
      while (c < p) { m(colI)(c) /= d; inv(colI)(c) /= d; c += 1 }
      r = 0
      while (r < p) {
        if (r != colI) {
          val f = m(r)(colI)
          if (f != 0.0) {
            c = 0
            while (c < p) { m(r)(c) -= f * m(colI)(c); inv(r)(c) -= f * inv(colI)(c); c += 1 }
          }
        }
        r += 1
      }
      colI += 1
    }
    inv
  }

  // ---------------------------------------------------------------- ADF

  final case class AdfResult(stat: Double, lag: Int, nObs: Int,
                             crit1: Double, crit5: Double, crit10: Double) {
    /** Reject unit root (stationary) at 5%. */
    def stationary5: Boolean = stat < crit5
  }

  /** Augmented Dickey-Fuller test with constant, AIC lag selection over
    * 0..maxLag (statsmodels `adfuller(autolag="AIC")` shape): regress
    * Δy_t on [1, y_{t-1}, Δy_{t-1..k}], report the t-stat of y_{t-1}.
    * Asymptotic MacKinnon critical values, constant-only case. */
  def adf(y: Array[Double], maxLagOpt: Option[Int] = None): AdfResult = {
    val n = y.length
    require(n >= 12, s"series too short for ADF (n=$n)")
    val maxLag = maxLagOpt.getOrElse(
      math.min(math.ceil(12.0 * math.pow(n / 100.0, 0.25)).toInt, n / 2 - 2))
    val dy = Array.tabulate(n - 1)(i => y(i + 1) - y(i))

    /** Fit with k lagged diffs; `startAt` trims the sample so competing
      * lag orders share ONE estimation window (AIC across different sample
      * sizes is not comparable and would always pick the largest lag —
      * statsmodels' autolag trims to maxlag for exactly this reason). */
    def fit(k: Int, startAt: Int): (Double, Double) = { // (tstat, aic)
      val rows = dy.length - startAt
      val x = Array.ofDim[Double](rows, 2 + k)
      val yy = new Array[Double](rows)
      var i = 0
      while (i < rows) {
        val t = i + startAt // index into dy; regressand Δy_t, y_{t-1} = y(t)
        x(i)(0) = 1.0
        x(i)(1) = y(t)
        var j = 0
        while (j < k) { x(i)(2 + j) = dy(t - 1 - j); j += 1 }
        yy(i) = dy(t)
        i += 1
      }
      val (beta, s2, se) = ols(x, yy)
      val rss = s2 * (rows - (2 + k))
      val ll = -0.5 * rows * (math.log(2 * math.Pi * rss / rows) + 1)
      val aic = -2 * ll + 2 * (2 + k)
      (beta(1) / se(1), aic)
    }

    val cappedMax = math.min(maxLag, dy.length - 5)
    var bestLag = 0
    var bestAic = Double.MaxValue
    var k = 0
    while (k <= cappedMax) {
      val (_, aic) = fit(k, cappedMax)
      if (aic < bestAic) { bestAic = aic; bestLag = k }
      k += 1
    }
    // refit the chosen lag on its full available sample for the final stat
    val (stat, _) = fit(bestLag, bestLag)
    AdfResult(stat, bestLag, dy.length - bestLag, -3.43, -2.86, -2.57)
  }

  // ---------------------------------------------------------------- KPSS

  final case class KpssResult(stat: Double, lags: Int,
                              crit1: Double, crit5: Double, crit10: Double) {
    /** Fail to reject stationarity at 5%. */
    def stationary5: Boolean = stat < crit5
  }

  /** KPSS level-stationarity test: LM = Σ S_t² / (n² · σ̂²_lrv) with a
    * Bartlett-window long-run variance, lags = ⌊4(n/100)^0.25⌋ ("legacy"
    * statsmodels default). Critical values Kwiatkowski et al. (1992),
    * level case. */
  def kpss(y: Array[Double]): KpssResult = {
    val n = y.length
    require(n >= 8, s"series too short for KPSS (n=$n)")
    val mean = y.sum / n
    val e = y.map(_ - mean)
    val s = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += e(i); s(i) = acc; i += 1 }
    val eta = s.map(v => v * v).sum / (n.toDouble * n)
    val lags = math.floor(4.0 * math.pow(n / 100.0, 0.25)).toInt
    var lrv = e.map(v => v * v).sum / n
    var l = 1
    while (l <= lags) {
      var g = 0.0
      i = l
      while (i < n) { g += e(i) * e(i - l); i += 1 }
      lrv += 2.0 * (1.0 - l / (lags + 1.0)) * g / n
      l += 1
    }
    KpssResult(eta / lrv, lags, 0.739, 0.463, 0.347)
  }

  // ---------------------------------------------------------- Yeo-Johnson

  /** Yeo-Johnson transform for a fixed λ (Yeo & Johnson 2000). */
  def yeoJohnson(x: Double, lambda: Double): Double =
    if (x >= 0) {
      if (math.abs(lambda) < 1e-12) math.log1p(x)
      else (math.pow(x + 1, lambda) - 1) / lambda
    } else {
      if (math.abs(lambda - 2) < 1e-12) -math.log1p(-x)
      else -(math.pow(1 - x, 2 - lambda) - 1) / (2 - lambda)
    }

  /** λ by maximum likelihood (scipy `yeojohnson` objective): maximize
    * -n/2·log(σ̂²(z)) + (λ-1)·Σ sign(x)·log(1+|x|) via golden-section
    * search on [-5, 5]. */
  def yeoJohnsonLambda(x: Array[Double]): Double = {
    val n = x.length
    require(n >= 3, "series too short for Yeo-Johnson fit")
    val signLogSum = x.map(v => math.signum(v) * math.log1p(math.abs(v))).sum
    def llf(lambda: Double): Double = {
      val z = x.map(yeoJohnson(_, lambda))
      val m = z.sum / n
      val v = z.map(t => (t - m) * (t - m)).sum / n
      if (v <= 0 || v.isNaN || v.isInfinite) Double.NegativeInfinity
      else -0.5 * n * math.log(v) + (lambda - 1) * signLogSum
    }
    val phi = (math.sqrt(5.0) - 1) / 2
    var a = -5.0; var b = 5.0
    var c = b - phi * (b - a); var d = a + phi * (b - a)
    var fc = llf(c); var fd = llf(d)
    var it = 0
    while (b - a > 1e-8 && it < 200) {
      if (fc > fd) { b = d; d = c; fd = fc; c = b - phi * (b - a); fc = llf(c) }
      else { a = c; c = d; fc = fd; d = a + phi * (b - a); fd = llf(d) }
      it += 1
    }
    (a + b) / 2
  }

  // ------------------------------------------------------------ seasonality

  /** Dominant seasonal period by periodogram peak: DFT power over
    * candidate periods `minP..maxP` months on the demeaned series
    * (reference `estimate_seasonal_period_months`, nb cell 25).
    *
    * EXACT-INTEGER form (round-12 graduation): values quantize at e6,
    * trig coefficients come from the SHARED
    * [[graft.stats.Diagnostics.seasonalTableE15]] grid
    * (cos(2πt/p) = cos(2π(t mod p)/p)), demeaning clears division by
    * scaling through n (`n·Σeᵗc = n·Σxc − (Σx)·Σc`), and the power
    * argmax runs on exact BigInt squares — NO order-dependent float
    * accumulation remains, so the arithmetic is the one q370's
    * DuckDB oracle replays (strict-> argmax = smallest p at the max). */
  def seasonalPeriod(y: Array[Double], minP: Int = 2, maxP: Int = 24): Int = {
    val n = y.length
    require(n >= 2 * minP, "series too short for period estimation")
    val x = y.map(v => BigInt(math.floor(v * 1e6 + 0.5).toLong))
    val s = x.sum
    val bigN = BigInt(n)
    val table = Diagnostics.seasonalTableE15(maxP)
      .groupBy(_._1).map { case (p, rows) =>
        p -> rows.sortBy(_._2).map { case (_, _, c, ss) => (c, ss) }.toArray
      }
    var bestP = minP
    var bestPow = BigInt(-1)
    var p = minP
    while (p <= math.min(maxP, n / 2)) {
      val coefs = table(p)
      var xc = BigInt(0); var xs = BigInt(0); var cc = BigInt(0); var cs = BigInt(0)
      var t = 0
      while (t < n) {
        val (c, si) = coefs(t % p)
        xc += x(t) * c; xs += x(t) * si; cc += c; cs += si
        t += 1
      }
      val sc = bigN * xc - s * cc
      val ss = bigN * xs - s * cs
      val pow = sc * sc + ss * ss
      if (pow > bestPow) { bestPow = pow; bestP = p }
      p += 1
    }
    bestP
  }

  // ------------------------------------------------------------ ACF/PACF

  /** Sample autocorrelation function at lags 1..nlags (U7; the reference's
    * `plot_acf` diagnostics, biased denominator like statsmodels). */
  def acf(y: Array[Double], nlags: Int): Array[Double] = {
    val n = y.length
    require(n > nlags, s"need n > nlags (n=$n, nlags=$nlags)")
    val mean = y.sum / n
    val e = y.map(_ - mean)
    val c0 = e.map(v => v * v).sum / n
    Array.tabulate(nlags) { li =>
      val l = li + 1
      var g = 0.0
      var i = l
      while (i < n) { g += e(i) * e(i - l); i += 1 }
      (g / n) / c0
    }
  }

  /** Partial autocorrelations at lags 1..nlags via Durbin-Levinson over the
    * sample ACF (statsmodels `pacf(method="ld")` shape). */
  def pacf(y: Array[Double], nlags: Int): Array[Double] = {
    val rho = acf(y, nlags)
    val phi = Array.ofDim[Double](nlags + 1, nlags + 1)
    val out = new Array[Double](nlags)
    var k = 1
    while (k <= nlags) {
      if (k == 1) phi(1)(1) = rho(0)
      else {
        var num = rho(k - 1)
        var den = 1.0
        var j = 1
        while (j < k) { num -= phi(k - 1)(j) * rho(k - 1 - j); den -= phi(k - 1)(j) * rho(j - 1); j += 1 }
        phi(k)(k) = if (math.abs(den) < 1e-12) 0.0 else num / den
        j = 1
        while (j < k) { phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j); j += 1 }
      }
      out(k - 1) = phi(k)(k)
      k += 1
    }
    out
  }

  // ------------------------------------------------------------ AR model

  final case class ArFit(order: Int, intercept: Double, coefs: Array[Double],
                         sigma2: Double, aic: Double)

  /** AR(p) by conditional-least-squares with AIC selection over candidate
    * orders — the engine's honest stand-in for the reference's SARIMAX grid
    * (U8): same grid-search shape (candidate orders -> AIC argmin), linear
    * state only. Seasonal/differencing structure is applied upstream via
    * [[graft.operators.Features.diff]]. */
  def fitArByAic(y: Array[Double], orders: Seq[Int] = Seq(1, 2, 3)): ArFit =
    fitArByAicOption(y, orders)
      .getOrElse(throw new IllegalArgumentException(
        "no candidate order is identifiable for this series"))

  /** Like [[fitArByAic]] but None when no candidate order fits — a
    * too-short series, or singular designs at every order (deterministic
    * series make higher-order designs exactly collinear). Distributed
    * callers use this so one degenerate key skips instead of failing the
    * whole job. */
  def fitArByAicOption(y: Array[Double], orders: Seq[Int] = Seq(1, 2, 3)): Option[ArFit] = {
    val fits = orders.filter(p => y.length > 3 * p + 2).flatMap { p =>
      val rows = y.length - p
      val x = Array.ofDim[Double](rows, p + 1)
      val yy = new Array[Double](rows)
      var i = 0
      while (i < rows) {
        x(i)(0) = 1.0
        var j = 0
        while (j < p) { x(i)(j + 1) = y(i + p - 1 - j); j += 1 }
        yy(i) = y(i + p)
        i += 1
      }
      scala.util.Try {
        val (beta, s2, _) = ols(x, yy)
        val rss = s2 * (rows - (p + 1))
        val ll = -0.5 * rows * (math.log(2 * math.Pi * math.max(rss, 1e-300) / rows) + 1)
        ArFit(p, beta(0), beta.drop(1), s2, -2 * ll + 2 * (p + 1))
      }.toOption
    }
    fits.minByOption(_.aic)
  }

  /** Deterministic h-step-ahead mean forecast from an AR fit. */
  def forecastAr(fit: ArFit, history: Array[Double], h: Int): Array[Double] = {
    val p = fit.order
    val buf = history.takeRight(p).toBuffer
    Array.fill(h) {
      var v = fit.intercept
      var j = 0
      while (j < p) { v += fit.coefs(j) * buf(buf.length - 1 - j); j += 1 }
      buf += v
      v
    }
  }
}
