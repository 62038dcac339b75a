package graft.stats

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import Sarimax._

/** The Kalman-filter SARIMAX MLE is validated three independent ways:
  *   1. the filter's exact likelihood matches CLOSED-FORM AR(1) and
  *      innovations-algorithm MA(1) likelihoods computed separately here;
  *   2. on data simulated from a known candidate of the reference grid the
  *      AIC argmin recovers the planted candidate and its parameters —
  *      on planted structure any correct MLE (statsmodels included) ranks
  *      the same winner, which is what makes the grid's ranking portable;
  *   3. forecasts match hand-derived recursions (AR(1) decay-to-mean,
  *      drift + seasonal-pattern continuation after un-differencing).
  */
class SarimaxSpec extends AnyFunSuite {

  private def approx(a: Double, b: Double, tol: Double) =
    assert(math.abs(a - b) <= tol, s"$a vs $b (tol $tol)")

  // ---------------------------------------------------------------- helpers

  /** Simulate ARMA errors u with the engine's sign conventions
    * (AR: u_t = Σφ u_{t-i} + ε_t + Σθ ε_{t-j}), long burn-in. */
  private def simArma(n: Int, ar: Array[Double], ma: Array[Double],
                      sigma: Double, seed: Long): Array[Double] = {
    val rng = new Random(seed)
    val burn = 200
    val total = n + burn
    val eps = Array.fill(total)(rng.nextGaussian() * sigma)
    val u = new Array[Double](total)
    var t = 0
    while (t < total) {
      var v = eps(t)
      var i = 0
      while (i < ar.length) { if (t - 1 - i >= 0) v += ar(i) * u(t - 1 - i); i += 1 }
      i = 0
      while (i < ma.length) { if (t - 1 - i >= 0) v += ma(i) * eps(t - 1 - i); i += 1 }
      u(t) = v
      t += 1
    }
    u.drop(burn)
  }

  /** Integrate z (length n) into y with d regular then D seasonal
    * integrations — the exact inverse of [[Sarimax.difference]]. */
  private def integrate(z: Array[Double], d: Int, D: Int, s: Int): Array[Double] = {
    var cur = z
    var i = 0
    while (i < d) {
      val out = new Array[Double](cur.length + 1)
      var t = 0
      while (t < cur.length) { out(t + 1) = out(t) + cur(t); t += 1 }
      cur = out
      i += 1
    }
    i = 0
    while (i < D) {
      val out = new Array[Double](cur.length + s)
      var t = 0
      while (t < cur.length) { out(t + s) = out(t) + cur(t); t += 1 }
      cur = out
      i += 1
    }
    cur
  }

  // ------------------------------------------------- filter exactness checks

  test("armaLoglik: matches the closed-form exact AR(1) likelihood") {
    val phi = 0.7
    val u = simArma(150, Array(phi), Array.empty, 1.3, seed = 11)
    val n = u.length
    // closed form with sigma2 concentrated: F1 = 1/(1-phi^2), F_t>1 = 1
    val ssr = u(0) * u(0) * (1 - phi * phi) +
      (1 until n).map(t => math.pow(u(t) - phi * u(t - 1), 2)).sum
    val sigma2 = ssr / n
    val expected = -0.5 * (n * (math.log(2 * math.Pi) + 1 + math.log(sigma2))) -
      0.5 * (-math.log(1 - phi * phi))
    val (got, gotSigma2) = armaLoglik(u, Array(phi), Array.empty)
    approx(got, expected, 1e-8)
    approx(gotSigma2, sigma2, 1e-10)
  }

  test("armaLoglik: matches an independent innovations-algorithm MA(1) likelihood") {
    val theta = 0.6
    val u = simArma(120, Array.empty, Array(theta), 0.9, seed = 23)
    val n = u.length
    // innovations algorithm for MA(1), sigma2=1 scale:
    //   r_0 = 1+theta^2; k_t = theta / r_{t-1}; r_t = 1 + theta^2 - k_t^2 r_{t-1}
    //   v_t = u_t - k_{t-1} v_{t-1} (one-step errors), F_t = r_{t-1}
    val g0 = 1 + theta * theta
    var sumLogF = 0.0
    var ssr = 0.0
    var rPrev = g0
    var vPrev = 0.0
    var kPrev = 0.0
    var t = 0
    while (t < n) {
      val v = u(t) - kPrev * vPrev
      sumLogF += math.log(rPrev)
      ssr += v * v / rPrev
      val k = theta / rPrev
      rPrev = g0 - k * k * rPrev
      kPrev = k
      vPrev = v
      t += 1
    }
    val sigma2 = ssr / n
    val expected = -0.5 * (n * (math.log(2 * math.Pi) + 1 + math.log(sigma2)) + sumLogF)
    val (got, _) = armaLoglik(u, Array.empty, Array(theta))
    approx(got, expected, 1e-8)
  }

  test("expandPoly: (1-0.5B)(1-0.3B^12) and (1+0.4B)(1+0.2B^12)") {
    val ar = expandPoly(Array(0.5), Array(0.3), 12, signAr = true)
    assert(ar.length == 13)
    approx(ar(0), 0.5, 1e-12); approx(ar(11), 0.3, 1e-12); approx(ar(12), -0.15, 1e-12)
    val ma = expandPoly(Array(0.4), Array(0.2), 12, signAr = false)
    approx(ma(0), 0.4, 1e-12); approx(ma(11), 0.2, 1e-12); approx(ma(12), 0.08, 1e-12)
  }

  // --------------------------------------------------------- fit + selection

  test("fit: white-noise candidate is exact OLS (closed form, no search)") {
    val rng = new Random(5)
    val x = Array.tabulate(80)(_.toDouble / 10 + rng.nextGaussian())
    val y = x.zipWithIndex.map { case (xi, i) => 3.0 + 2.5 * xi + rng.nextGaussian() * 0.4 }
    // spec (0,0,0)(0,0,0): z=y, w=x, pure regression
    val fit0 = fit(y, Some(x), SarimaxSpec(0, 0, 0, 0, 0, 0, 12)).get
    val xm = x.map(v => Array(1.0, v))
    val (beta, _, _) = TimeSeriesStats.ols(xm, y)
    approx(fit0.intercept, beta(0), 1e-10)
    approx(fit0.beta, beta(1), 1e-10)
  }

  test("fitBest: recovers a planted ((1,1,0),(0,1,1,12)) process from the reference grid") {
    val phi = 0.6; val Theta = 0.4
    val ar = expandPoly(Array(phi), Array.empty, 12, signAr = true)
    val ma = expandPoly(Array.empty, Array(Theta), 12, signAr = false)
    val u = simArma(400, ar, ma, 1.0, seed = 77)
    val z = u.map(_ + 0.2) // drift c = 0.2
    val y = integrate(z, d = 1, D = 1, s = 12)
    val best = fitBest(y, None, ReferenceCandidates).get
    assert(best.spec == SarimaxSpec(1, 1, 0, 0, 1, 1, 12), s"picked ${best.spec}")
    approx(best.phi(0), phi, 0.12)
    approx(best.stheta(0), Theta, 0.15)
    approx(best.intercept, 0.2, 0.25)
  }

  test("fitBest: recovers a planted ((0,1,1),(1,1,0,12)) process from the reference grid") {
    val theta = 0.5; val Phi = 0.45
    val ar = expandPoly(Array.empty, Array(Phi), 12, signAr = true)
    val ma = expandPoly(Array(theta), Array.empty, 12, signAr = false)
    val u = simArma(400, ar, ma, 1.0, seed = 31)
    val y = integrate(u, d = 1, D = 1, s = 12)
    val best = fitBest(y, None, ReferenceCandidates).get
    assert(best.spec == SarimaxSpec(0, 1, 1, 1, 1, 0, 12), s"picked ${best.spec}")
    approx(best.theta(0), theta, 0.12)
    approx(best.sphi(0), Phi, 0.12)
  }

  test("fit: recovers an exogenous coefficient through double differencing") {
    val rng = new Random(13)
    val n = 360
    val x = Array.tabulate(n)(t => 10.0 + 0.05 * t + 3 * math.sin(t / 7.0) + rng.nextGaussian() * 0.5)
    val u = simArma(n, Array(0.5), Array.empty, 0.8, seed = 99)
    // y on levels: beta * x + integrated ARMA noise
    val noise = integrate(u, d = 1, D = 1, s = 12).take(n)
    val beta = 2.5
    val y = Array.tabulate(n)(t => beta * x(t) + noise(t))
    val f = fit(y, Some(x), SarimaxSpec(1, 1, 0, 0, 1, 0, 12)).get
    approx(f.beta, beta, 0.05)
    approx(f.phi(0), 0.5, 0.15)
  }

  test("sarx1 CLS kernel cross-check: Kalman MLE lands on the same planted coefficients") {
    // the q336 slice's model: y_t = c + phi*y_{t-1} + beta*x_t + eps
    // (lagged-dependent form). The Kalman ARMAX path fits REGRESSION-
    // WITH-AR-ERRORS (y = mu + beta*x + u, u AR(1)) — the two forms
    // coincide exactly when beta = 0 (pure AR(1), mu = c/(1-phi)), so
    // the tie to the no-oracle q39/q69 estimator is asserted THERE:
    // plant AR(1) with an uncorrelated exog column; both estimators
    // must agree on phi and read beta ~ 0. (With a smooth exog the
    // forms genuinely diverge — the slice filters x through the AR lag,
    // the ARMAX form does not; asserting coefficient equality there
    // would be comparing different models.)
    val rng = new Random(41)
    val n = 400
    val x = Array.tabulate(n)(t => if (t % 2 == 0) 1.0 else -1.0)
    val (c, phi) = (2.0, 0.6)
    val beta = 0.0
    val y = new Array[Double](n)
    y(0) = c / (1 - phi)
    (1 until n).foreach(t =>
      y(t) = c + phi * y(t - 1) + rng.nextGaussian() * 0.3)
    // CLS via the same det3 normal-equation solve the slice kernel spells
    var (cnt, sl, sx, sy, sll, slx, sxx, sly, sxy) =
      (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    (1 until n).foreach { t =>
      val l = y(t - 1); val xv = x(t); val yv = y(t)
      cnt += 1; sl += l; sx += xv; sy += yv
      sll += l * l; slx += l * xv; sxx += xv * xv; sly += l * yv; sxy += xv * yv
    }
    def det3(a11: Double, a12: Double, a13: Double, a21: Double, a22: Double,
             a23: Double, a31: Double, a32: Double, a33: Double): Double =
      a11 * (a22 * a33 - a23 * a32) - a12 * (a21 * a33 - a23 * a31) +
        a13 * (a21 * a32 - a22 * a31)
    val det = det3(cnt, sl, sx, sl, sll, slx, sx, slx, sxx)
    val clsC = det3(sy, sl, sx, sly, sll, slx, sxy, slx, sxx) / det
    val clsP = det3(cnt, sy, sx, sl, sly, slx, sx, sxy, sxx) / det
    val clsB = det3(cnt, sl, sy, sl, sll, sly, sx, slx, sxy) / det
    approx(clsP, phi, 0.1); approx(clsB, beta, 0.05)
    approx(clsC, c, 0.5)
    // full Kalman MLE on the same series: same phi, beta reads ~ 0
    val f = fit(y, Some(x), SarimaxSpec(1, 0, 0, 0, 0, 0, 12)).get
    approx(f.phi(0), clsP, 0.05)
    approx(f.beta, clsB, 0.05)
  }

  test("fit: optimized loglik is at least the loglik at the true parameters (MLE property)") {
    val phi = 0.6
    val u = simArma(600, Array(phi), Array.empty, 1.0, seed = 55)
    val f1 = fit(u, None, SarimaxSpec(1, 0, 0, 0, 0, 0, 12)).get
    val mean = u.sum / u.length
    val (llTrue, _) = armaLoglik(u.map(_ - mean), Array(phi), Array.empty)
    assert(f1.loglik >= llTrue - 1e-6, s"fitted ll=${f1.loglik} < true-params ll=$llTrue")
    // nested model sanity: the richer ARMA(1,1) cannot have LOWER loglik
    val f2 = fit(u, None, SarimaxSpec(1, 0, 1, 0, 0, 0, 12)).get
    assert(f2.loglik >= f1.loglik - 1e-4)
  }

  test("aic: strongly-AR data ranks the AR candidate far above white noise") {
    val u = simArma(600, Array(0.9), Array.empty, 1.0, seed = 55)
    val fAr = fit(u, None, SarimaxSpec(1, 0, 0, 0, 0, 0, 12)).get
    val fWn = fit(u, None, SarimaxSpec(0, 0, 0, 0, 0, 0, 12)).get
    assert(fAr.aic < fWn.aic - 100, s"AR aic=${fAr.aic} vs WN aic=${fWn.aic}")
  }

  test("fit: degenerate exog (all-zero after differencing) falls back to intercept-only MLE") {
    val rng = new Random(21)
    val y = Array.tabulate(60)(t => 5.0 + 0.5 * t + rng.nextGaussian() * 0.1)
    val x = Array.fill(60)(3.0) // constant exog -> w ≡ 0 -> singular OLS design
    val f = fit(y, Some(x), SarimaxSpec(0, 1, 0, 0, 0, 0, 12)).get
    approx(f.intercept, 0.5, 0.1) // drift recovered, not silently zeroed
    assert(f.beta == 0.0)
  }

  test("fit: unscaled large-level series is not rejected by any parameter bound") {
    val rng = new Random(9)
    // levels ~3e9, drift ~5e6 per step: both far past any absolute cutoff
    val y = Array.tabulate(80)(t => 3e9 + 5e6 * t + rng.nextGaussian() * 1e5)
    val f = fit(y, None, SarimaxSpec(0, 1, 0, 0, 0, 0, 12)).get
    approx(f.intercept, 5e6, 1e5)
  }

  test("fit: short series fits non-seasonal candidates; seasonal guard still applies") {
    val rng = new Random(2)
    val y = Array.tabulate(15)(t => 1.0 * t + rng.nextGaussian() * 0.01)
    assert(fit(y, None, SarimaxSpec(0, 1, 0, 0, 0, 0, 12)).isDefined)
    assert(fit(y, None, SarimaxSpec(1, 1, 0, 0, 1, 1, 12)).isEmpty)
  }

  // ------------------------------------------------------------- forecasting

  test("forecast: AR(1)-with-intercept decays to the mean (analytic recursion)") {
    val phi = 0.7; val c = 2.0
    val u = simArma(200, Array(phi), Array.empty, 1.0, seed = 42)
    val z = u.map(_ + c)
    val spec = SarimaxSpec(1, 0, 0, 0, 0, 0, 12)
    val f = fit(z, None, spec).get
    val fc = forecast(f, z, None, Array.empty, h = 5)
    // analytic: z_{n+j} = c + phi^j (z_n - c), at the FITTED (c, phi)
    val cHat = f.intercept; val pHat = f.phi(0)
    (1 to 5).foreach { j =>
      val expected = cHat + math.pow(pHat, j) * (z.last - cHat)
      approx(fc(j - 1), expected, 1e-6)
    }
  }

  test("forecast: un-differencing continues a deterministic trend + seasonal pattern") {
    val s = 12
    // y = 5t + strong seasonal; Dy Ds y is exactly 0, so every forecast must
    // continue the pattern exactly no matter which candidate fits
    val y = Array.tabulate(120)(t => 5.0 * t + 20.0 * math.sin(2 * math.Pi * (t % s) / s))
    val f = fit(y, None, SarimaxSpec(0, 1, 0, 0, 1, 0, s)).get
    val fc = forecast(f, y, None, Array.empty, h = 24)
    (0 until 24).foreach { j =>
      val t = 120 + j
      val expected = 5.0 * t + 20.0 * math.sin(2 * math.Pi * (t % s) / s)
      approx(fc(j), expected, 1e-6)
    }
  }

  test("forecastKernel: forecast is linear in the exog path and matches direct forecast") {
    val rng = new Random(3)
    val n = 240
    val x = Array.tabulate(n)(t => 5.0 + 0.02 * t + rng.nextGaussian() * 0.3)
    val u = simArma(n, Array(0.4), Array.empty, 0.6, seed = 8)
    val noise = integrate(u, d = 1, D = 1, s = 12).take(n)
    val y = Array.tabulate(n)(t => 1.8 * x(t) + noise(t))
    val f = fit(y, Some(x), SarimaxSpec(1, 1, 0, 0, 1, 1, 12)).get
    val h = 12
    val kern = forecastKernel(f, y, Some(x), h)
    val pathA = Array.tabulate(h)(j => x.last + 0.02 * (j + 1))
    val pathB = Array.tabulate(h)(j => x.last - 0.1 * (j + 1))
    val fa = kern.forecast(pathA)
    val fb = kern.forecast(pathB)
    // matches the non-kernel path
    val direct = forecast(f, y, Some(x), pathA, h)
    (0 until h).foreach(j => approx(fa(j), direct(j), 1e-9))
    // linearity: f(mid) == (f(a)+f(b))/2 elementwise
    val mid = Array.tabulate(h)(j => (pathA(j) + pathB(j)) / 2)
    val fm = kern.forecast(mid)
    (0 until h).foreach(j => approx(fm(j), (fa(j) + fb(j)) / 2, 1e-7))
  }
}
