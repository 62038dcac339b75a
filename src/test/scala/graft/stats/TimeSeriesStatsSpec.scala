package graft.stats

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class TimeSeriesStatsSpec extends AnyFunSuite {
  import TimeSeriesStats._

  private def approx(a: Double, b: Double, tol: Double): Boolean = math.abs(a - b) <= tol

  test("ols: recovers known coefficients exactly on noiseless data") {
    // y = 2 + 3*x1 - x2
    val rng = new Random(1)
    val x = Array.fill(50)(Array(1.0, rng.nextDouble() * 10, rng.nextDouble() * 5))
    val y = x.map(r => 2.0 + 3.0 * r(1) - r(2))
    val (beta, s2, _) = ols(x, y)
    assert(approx(beta(0), 2.0, 1e-8) && approx(beta(1), 3.0, 1e-8) && approx(beta(2), -1.0, 1e-8))
    assert(s2 < 1e-12)
  }

  test("adf: white noise strongly rejects unit root; random walk does not") {
    val rng = new Random(42)
    val noise = Array.fill(300)(rng.nextGaussian())
    val rw = noise.scanLeft(0.0)(_ + _).drop(1)
    val a1 = adf(noise)
    val a2 = adf(rw)
    assert(a1.stat < a1.crit1, s"white noise adf=${a1.stat}")
    assert(a2.stat > a2.crit5, s"random walk adf=${a2.stat}")
    assert(a1.stationary5 && !a2.stationary5)
  }

  test("kpss: white noise fails to reject stationarity; random walk rejects") {
    val rng = new Random(7)
    val noise = Array.fill(300)(rng.nextGaussian())
    val rw = noise.scanLeft(0.0)(_ + _).drop(1)
    assert(kpss(noise).stationary5)
    assert(!kpss(rw).stationary5)
  }

  test("yeoJohnson: lambda=1 is identity; lambda=0 is log1p for x>=0") {
    assert(approx(yeoJohnson(3.7, 1.0), 3.7, 1e-12))
    assert(approx(yeoJohnson(3.7, 0.0), math.log1p(3.7), 1e-12))
    assert(approx(yeoJohnson(-2.0, 2.0), -math.log1p(2.0), 1e-12))
  }

  test("yeoJohnsonLambda: near 1 for already-normal data; llf peak at returned lambda") {
    val rng = new Random(3)
    val normal = Array.fill(500)(rng.nextGaussian())
    val lam = yeoJohnsonLambda(normal)
    assert(math.abs(lam - 1.0) < 0.3, s"lambda=$lam")
    // skewed data (exponential) needs lambda < 1
    val skewed = Array.fill(500)(-math.log(rng.nextDouble()))
    assert(yeoJohnsonLambda(skewed) < 0.7)
  }

  test("seasonalPeriod: picks the injected cycle length") {
    val y = Array.tabulate(240)(t => math.sin(2 * math.Pi * t / 12.0) * 10 + t * 0.01)
    assert(seasonalPeriod(y) === 12)
  }

  test("acf/pacf: AR(1) signature — geometric acf, pacf cut-off after lag 1") {
    val rng = new Random(13)
    val phi = 0.7
    val y = new Array[Double](5000)
    var i = 1
    while (i < 5000) { y(i) = phi * y(i - 1) + rng.nextGaussian(); i += 1 }
    val a = acf(y, 5)
    val p = pacf(y, 5)
    assert(math.abs(a(0) - phi) < 0.05, s"acf1=${a(0)}")
    assert(math.abs(a(1) - phi * phi) < 0.05, s"acf2=${a(1)}")
    assert(math.abs(p(0) - phi) < 0.05, s"pacf1=${p(0)}")
    assert(p.drop(1).forall(v => math.abs(v) < 0.08), s"pacf tail=${p.drop(1).toSeq}")
  }

  test("fitArByAic: recovers AR(1) coefficient; forecast converges to mean") {
    val rng = new Random(11)
    val phi = 0.7
    val y = new Array[Double](1000)
    var i = 1
    while (i < 1000) { y(i) = phi * y(i - 1) + rng.nextGaussian(); i += 1 }
    val fit = fitArByAic(y, Seq(1, 2, 3))
    assert(math.abs(fit.coefs(0) - phi) < 0.1, s"phi_hat=${fit.coefs(0)}")
    val f = forecastAr(fit, y, 50)
    assert(math.abs(f.last) < math.abs(f.head) + 1e-9) // decays toward the mean
  }
}
