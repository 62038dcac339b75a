package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class DiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val series = {
    val rng = new Random(5)
    val noise = (1 to 200).map(i => ("stationary", f"t$i%04d", rng.nextGaussian() * 2 + 10))
    var acc = 0.0
    val rw = (1 to 200).map { i => acc += rng.nextGaussian(); ("walk", f"t$i%04d", acc) }
    (noise ++ rw).toDF("k", "t", "v")
  }

  test("stationarity: per-key verdicts computed distributed, no driver collect") {
    val out = Diagnostics.stationarity(series, Seq("k"), "t", "v")
      .orderBy("key").collect()
    assert(out.length === 2)
    val st = out.find(_.getString(0) == "stationary").get
    val wk = out.find(_.getString(0) == "walk").get
    assert(st.getAs[Boolean]("adf_stationary_5pct"))
    assert(!wk.getAs[Boolean]("adf_stationary_5pct"))
    assert(st.getAs[Boolean]("kpss_stationary_5pct"))
    assert(st.getAs[Int]("n_obs") === 200)
  }

  test("stationarity: short series yields nulls, not failure") {
    val tiny = Seq(("a", "t1", 1.0), ("a", "t2", 2.0)).toDF("k", "t", "v")
    val r = Diagnostics.stationarity(tiny, Seq("k"), "t", "v").collect().head
    assert(r.getAs[Int]("n_obs") === 2)
    assert(r.get(r.fieldIndex("adf_stat")) == null)
  }

  test("numeric order columns sort numerically, not lexicographically") {
    // values increase with t; a lexicographic sort (1, 10, 100, 101, ... 2)
    // would scramble the series and inflate the diffs
    val df = (1 to 150).map(i => ("k", i, i.toDouble)).toDF("g", "t", "v")
    val out = Diagnostics.arForecast(df, Seq("g"), "t", "v", horizon = 3).collect()
    // a clean linear trend forecast keeps climbing past the last value
    assert(out.forall(_.getAs[Double]("forecast") > 140.0),
      out.map(_.getAs[Double]("forecast")).toSeq.toString)
  }

  test("sarxForecast: noise-free planted SARX(1) recovers exactly; hold-last forecast recursion") {
    // y_t = 2 + 0.5*y_{t-1} + 1.5*x_t EXACTLY -> CLS must return the
    // planted coefficients to ~machine precision and the forecast must
    // equal the hand recursion with x held at its last value
    val n = 60
    val x = Array.tabulate(n)(t => 1.0 + 0.25 * (t % 4))
    val y = new Array[Double](n)
    y(0) = 4.0
    (1 until n).foreach(t => y(t) = 2.0 + 0.5 * y(t - 1) + 1.5 * x(t))
    val df = (0 until n).map(t => ("k", t, y(t), x(t))).toDF("g", "t", "v", "ex")
    val out = Diagnostics.sarxForecast(df, Seq("g"), "t", "v", "ex", horizon = 5)
      .orderBy("step").collect()
    assert(out.length === 5)
    val r0 = out.head
    assert(math.abs(r0.getAs[Double]("intercept") - 2.0) < 1e-8)
    assert(math.abs(r0.getAs[Double]("ar_coef") - 0.5) < 1e-10)
    assert(math.abs(r0.getAs[Double]("exog_coef") - 1.5) < 1e-8)
    var f = y(n - 1)
    val xl = x(n - 1)
    out.foreach { r =>
      f = 2.0 + 0.5 * f + 1.5 * xl
      assert(math.abs(r.getAs[Double]("forecast") - f) < 1e-6)
    }
    // singular design (constant exog == intercept column) -> no rows
    val sing = (0 until 30).map(t => ("s", t, y(t), 1.0)).toDF("g", "t", "v", "ex")
    assert(Diagnostics.sarxForecast(sing, Seq("g"), "t", "v", "ex", 3).collect()
      .isEmpty)
  }

  test("arForecast: a too-short key yields no rows instead of failing the job") {
    val df = (Seq(("short", "t1", 1.0), ("short", "t2", 2.0)) ++
      (1 to 100).map(i => ("long", f"t$i%04d", math.sin(i / 5.0))))
      .toDF("k", "t", "v")
    val out = Diagnostics.arForecast(df, Seq("k"), "t", "v", horizon = 4).collect()
    assert(out.forall(_.getString(0) == "long"))
    assert(out.length === 4)
  }

  test("arForecast: one row per (key, step) with chosen order") {
    val out = Diagnostics.arForecast(series, Seq("k"), "t", "v", horizon = 6)
      .orderBy("key", "step").collect()
    assert(out.length === 12)
    assert(out.map(_.getAs[Int]("step")).toSeq === Seq(1, 2, 3, 4, 5, 6, 1, 2, 3, 4, 5, 6))
    // stationary series forecasts stay near its mean of 10
    val stF = out.filter(_.getString(0) == "stationary").map(_.getAs[Double]("forecast"))
    assert(stF.forall(f => f > 5 && f < 15))
  }

  test("holtForecast: hand-computed recursion and linear forecast fan") {
    // y = 10, 20, 34; α = 1/2, β = 1/4 (exact binary fractions)
    // init l=10, b=10; t2: l = .5·20 + .5·20 = 20, b = .25·10 + .75·10 = 10
    // t3: l = .5·34 + .5·30 = 32, b = .25·12 + .75·10 = 10.5
    val df = Seq(("s", 1, 10.0), ("s", 2, 20.0), ("s", 3, 34.0)).toDF("k", "t", "v")
    val out = Diagnostics.holtForecast(df, Seq("k"), "t", "v", 0.5, 0.25, 3)
      .orderBy("step").collect()
    assert(out.length == 3)
    assert(out.head.getAs[Double]("level") == 32.0)
    assert(out.head.getAs[Double]("trend") == 10.5)
    assert(out.map(_.getAs[Double]("forecast")).toSeq == Seq(42.5, 53.0, 63.5))
    assert(out.head.getAs[Int]("n_obs") == 3)
  }

  test("holtForecast: an exact linear series is tracked exactly") {
    // on y = 5t the recursion's state converges to (level = 5n, trend = 5)
    // immediately (init is already exact), so every forecast lies on the line
    val df = (1 to 50).map(t => ("lin", t, 5.0 * t)).toDF("k", "t", "v")
    val out = Diagnostics.holtForecast(df, Seq("k"), "t", "v", 0.5, 0.25, 4)
      .orderBy("step").collect()
    assert(out.map(_.getAs[Double]("forecast")).toSeq ==
      Seq(255.0, 260.0, 265.0, 270.0))
  }

  test("holtForecast: series shorter than 2 observations yields no rows") {
    val df = Seq(("one", 1, 10.0)).toDF("k", "t", "v")
    assert(Diagnostics.holtForecast(df, Seq("k"), "t", "v", 0.5, 0.25, 3)
      .collect().isEmpty)
  }

  test("seasonalArForecast: an exact seasonal process is recovered exactly") {
    // y_t = 2 + 0.5·y_{t-4} exactly (all exact binary fractions), seeded by
    // 4 distinct start values — OLS on a noiseless design recovers (c, Φ)
    // to float exactness and the forecasts continue the recursion
    val start = Seq(8.0, 16.0, 32.0, 64.0)
    val vals = Iterator.iterate(start)(p => p.map(v => 2.0 + 0.5 * v))
      .take(6).flatten.toSeq // 24 observations, season 4
    val df = vals.zipWithIndex.map { case (v, i) => ("s", i, v) }.toDF("k", "t", "v")
    val out = Diagnostics.seasonalArForecast(df, Seq("k"), "t", "v",
      season = 4, horizon = 8).orderBy("step").collect()
    assert(out.length == 8)
    assert(out.map(_.getAs[Int]("season")).forall(_ == 4))
    val last4 = vals.takeRight(4)
    // steps 1..4 forecast off the OBSERVED last season; 5..8 recurse
    val f14 = last4.map(v => 2.0 + 0.5 * v)
    val f58 = f14.map(v => 2.0 + 0.5 * v)
    val got = out.map(_.getAs[Double]("forecast")).toSeq
    (f14 ++ f58).zip(got).foreach { case (e, g) =>
      assert(math.abs(e - g) < 1e-9, s"expected $e got $g") }
  }

  test("seasonalArForecast: series shorter than season+2 yields no rows") {
    val df = (0 until 5).map(t => ("s", t, t * 1.0)).toDF("k", "t", "v")
    assert(Diagnostics.seasonalArForecast(df, Seq("k"), "t", "v",
      season = 4, horizon = 3).collect().isEmpty)
  }

  test("ma1Forecast: recovers a planted grid theta and forecasts mu past step 1") {
    // y_t = mu + e_t + 0.6*e_{t-1} with a deterministic bounded innovation
    // stream; CLS over the grid must land on th=0.6 (adjacent candidates
    // pay a visibly larger SSE), and MA(1) memory dies after one step
    val th0 = 0.6; val mu0 = 50.0
    val innov = Iterator.iterate(88172645463325252L)(x =>
        x * 6364136223846793005L + 1442695040888963407L)
      .take(800).map(x => ((x >>> 40) % 21 - 10) / 5.0).toSeq
    val y = innov.indices.map(i =>
      mu0 + innov(i) + (if (i > 0) th0 * innov(i - 1) else 0.0))
    val df = y.zipWithIndex.map { case (v, i) => ("s", i, v) }.toDF("k", "t", "v")
    val out = Diagnostics.ma1Forecast(df, Seq("k"), "t", "v", horizon = 3)
      .orderBy("step").collect()
    assert(out.length == 3)
    assert(out.head.getAs[Double]("theta") == 0.6,
      s"theta=${out.head.getAs[Double]("theta")}")
    val mu = out.head.getAs[Double]("mu")
    assert(math.abs(mu - mu0) < 1.0)
    // steps 2 and 3 are exactly mu — one-innovation memory
    assert(out(1).getAs[Double]("forecast") == mu)
    assert(out(2).getAs[Double]("forecast") == mu)
  }

  test("mannKendall: monotone, constant, and alternating series") {
    val inc = (0 until 20).map(i => ("inc", i, i * 3.0 + 1))
    val const = (0 until 20).map(i => ("const", i, 7.0))
    val alt = (0 until 20).map(i => ("alt", i, if (i % 2 == 0) 1.0 else 2.0))
    val out = Diagnostics.mannKendall((inc ++ const ++ alt).toDF("k", "t", "v"),
      Seq("k"), "t", "v").collect().map(r => r.getString(0) -> r).toMap
    // strictly increasing: S = n(n-1)/2 = 190, var18 = 20*19*45, trend up
    assert(out("inc").getAs[Long]("s_stat") == 190L)
    assert(out("inc").getAs[Long]("var18") == 20L * 19 * 45)
    assert(out("inc").getAs[String]("trend") == "increasing")
    // constant: all tied -> S = 0, var18 = 0, z = 0, no trend
    assert(out("const").getAs[Long]("s_stat") == 0L)
    assert(out("const").getAs[Long]("var18") == 0L)
    assert(out("const").getAs[Double]("z") == 0.0)
    assert(out("const").getAs[String]("trend") == "no_trend")
    // alternating has no monotone drift
    assert(out("alt").getAs[String]("trend") == "no_trend")
  }

  test("arma11Forecast: recovers planted grid (phi, theta) jointly") {
    // y_t = c + 0.5*y_{t-1} + e_t + 0.3*e_{t-1}; the joint CLS grid must
    // land on (0.5, 0.3) and the forecast fan must follow f_h = c + phi*f_{h-1}
    val (phi0, th0, c0) = (0.5, 0.3, 10.0)
    val innov = Iterator.iterate(424242424242L)(x =>
        x * 6364136223846793005L + 1442695040888963407L)
      .take(1001).map(x => ((x >>> 40) % 21 - 10) / 5.0).toSeq
    val y = innov.tail.indices.foldLeft(Vector(20.0)) { (acc, i) =>
      acc :+ (c0 + phi0 * acc.last + innov(i + 1) + th0 * innov(i))
    }
    val df = y.zipWithIndex.map { case (v, i) => ("s", i, v) }.toDF("k", "t", "v")
    val out = Diagnostics.arma11Forecast(df, Seq("k"), "t", "v", horizon = 4)
      .orderBy("step").collect()
    assert(out.length == 4)
    assert(out.head.getAs[Double]("phi") == phi0,
      s"phi=${out.head.getAs[Double]("phi")}")
    assert(out.head.getAs[Double]("theta") == th0,
      s"theta=${out.head.getAs[Double]("theta")}")
    val c = out.head.getAs[Double]("c")
    val fs = out.map(_.getAs[Double]("forecast"))
    (1 until 4).foreach(h => assert(fs(h) == c + phi0 * fs(h - 1)))
  }

  test("adfFixedLag: t-stat matches the in-JVM OLS on the same regression") {
    // deterministic integer pseudo-random walk (unit-root-ish) — the same
    // Δy_t ~ [1, y_{t-1}, Δy_{t-1}] regression computed two ways: the
    // distributed DECIMAL-sums Cramer tree vs TimeSeriesStats.ols
    val y = Iterator.iterate(10000L)(v =>
      v + (((v * 2654435761L) >>> 33) % 201L) - 100L).take(60).toArray
    val df = y.toSeq.zipWithIndex.map { case (v, i) => ("s", i, v) }.toDF("k", "t", "v")
    val row = Diagnostics.adfFixedLag(df, Seq("k"), "t", "v").collect().head
    // reference: build the design matrix directly
    val dy = Array.tabulate(y.length - 1)(i => (y(i + 1) - y(i)).toDouble)
    val rows = (2 until y.length).map { t =>
      (Array(1.0, y(t - 1).toDouble, dy(t - 2)), dy(t - 1))
    }
    val (beta, _, se) = TimeSeriesStats.ols(rows.map(_._1).toArray, rows.map(_._2).toArray)
    val tExpected = beta(1) / se(1)
    assert(row.getAs[Long]("n_obs") == y.length - 2)
    assert(math.abs(row.getAs[Double]("adf_t") - tExpected) < 1e-3,
      s"adf_t=${row.getAs[Double]("adf_t")} expected ~$tExpected")
    assert(row.getAs[Double]("crit5") == -2.86)
  }

  test("adfFixedLag: a strongly mean-reverting series is flagged stationary") {
    // y alternates around 0 with large pullback — Δy_t ≈ -1.8·y_{t-1},
    // the textbook reject-the-unit-root shape
    val y = Iterator.iterate(1000.0)(v => -0.8 * v + 10.0).take(50)
      .map(v => math.round(v)).toArray
    val df = y.toSeq.zipWithIndex.map { case (v, i) => ("s", i, v) }.toDF("k", "t", "v")
    val row = Diagnostics.adfFixedLag(df, Seq("k"), "t", "v").collect().head
    assert(row.getAs[Boolean]("stationary5"),
      s"expected stationary, t=${row.getAs[Double]("adf_t")}")
  }

  test("adfAutoLag1: protocol matches TimeSeriesStats.adf(maxLag=1) — lag, nObs, stat") {
    // the same deterministic hash-walk as the adfFixedLag cross-check:
    // both the selection (common-window AICs) and the winning refit must
    // agree with the in-JVM kernel running the identical maxLag=1 protocol
    val y = Iterator.iterate(10000L)(v =>
      v + (((v * 2654435761L) >>> 33) % 201L) - 100L).take(60).toArray
    val df = y.toSeq.zipWithIndex.map { case (v, i) => ("s", i, v) }.toDF("k", "t", "v")
    val row = Diagnostics.adfAutoLag1(df, Seq("k"), "t", "v").collect().head
    val ref = TimeSeriesStats.adf(y.map(_.toDouble), Some(1))
    assert(row.getAs[Int]("lag") == ref.lag, s"lag=${row.getAs[Int]("lag")} want ${ref.lag}")
    assert(row.getAs[Long]("n_obs") == ref.nObs)
    assert(math.abs(row.getAs[Double]("adf_t") - ref.stat) < 1e-3,
      s"adf_t=${row.getAs[Double]("adf_t")} expected ~${ref.stat}")
    assert(row.getAs[Boolean]("stationary5") == ref.stationary5)
  }

  test("adfAutoLag1: strongly autocorrelated differences select lag 1") {
    // dy_t = 0.9·dy_{t-1} + APERIODIC hash jitter — the lagged-diff
    // regressor carries real signal, so AIC must prefer k=1; and the
    // kernel must agree on the same series. (A periodic jitter makes the
    // steady-state diffs predictable from the LEVEL's phase and lag 0
    // wins — the known collinear-regressor trap for planted ADF series.)
    val dy = new Array[Double](80)
    dy(0) = 50.0
    (1 until 80).foreach(i =>
      dy(i) = 0.9 * dy(i - 1) + (((i.toLong * i * 2654435761L) >>> 33) % 11L) - 5.0)
    val y = dy.scanLeft(10000.0)(_ + _).map(math.round).toArray
    val df = y.toSeq.zipWithIndex.map { case (v, i) => ("s", i, v) }.toDF("k", "t", "v")
    val row = Diagnostics.adfAutoLag1(df, Seq("k"), "t", "v").collect().head
    assert(row.getAs[Int]("lag") == 1, s"lag=${row.getAs[Int]("lag")}")
    val ref = TimeSeriesStats.adf(y.map(_.toDouble), Some(1))
    assert(ref.lag == 1)
    assert(math.abs(row.getAs[Double]("adf_t") - ref.stat) < 1e-3)
    // and both candidate AICs are emitted, winner strictly smaller
    assert(row.getAs[Double]("aic1") < row.getAs[Double]("aic0"))
  }

  test("localLevelForecast: hand-computed filter on a tiny series; flat forecast, widening bands") {
    // y = [10,12,11,13], grid pick λ=1: filter recursion by hand gives
    // m_T = 86/7, r̂ = 19/21, P_T = 34/21 — bands widen by (h−1)·λ
    val df = Seq(("s", 0, 10.0), ("s", 1, 12.0), ("s", 2, 11.0), ("s", 3, 13.0))
      .toDF("k", "t", "v")
    val out = Diagnostics.localLevelForecast(df, Seq("k"), "t", "v", horizon = 2)
      .orderBy("step").collect()
    assert(out.length == 2)
    val r = out.head
    assert(r.getAs[Double]("lambda") == 1.0)
    assert(math.abs(r.getAs[Double]("r_hat") - 19.0 / 21.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("forecast") - 86.0 / 7.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("lo") - 9.268578042335292) < 1e-9)
    assert(math.abs(r.getAs[Double]("hi") - 15.30285052909328) < 1e-9)
    // step 2: same flat level, strictly wider band
    assert(out(1).getAs[Double]("forecast") == r.getAs[Double]("forecast"))
    assert(out(1).getAs[Double]("lo") < r.getAs[Double]("lo"))
  }

  test("localLevelForecast: λ selection polarity — noise picks small, a walk picks large") {
    // observation-noise-dominated series: tiny λ (trust the average);
    // level-walk-dominated series: huge λ (track the last observation)
    val noise = (0 until 40).map(i => ("n", i, 100.0 + ((i * i * 7) % 13) - 6))
    var lvl = 0.0
    val walk = (0 until 40).map { i =>
      lvl += (((i.toLong * i * 2654435761L) >>> 33) % 21L) - 10L
      ("w", i, lvl + 0.1 * (((i * 13) % 7) - 3))
    }
    val df = (noise ++ walk).toDF("k", "t", "v")
    val byKey = Diagnostics.localLevelForecast(df, Seq("k"), "t", "v", horizon = 1)
      .collect().map(r => r.getAs[String]("key") -> r.getAs[Double]("lambda")).toMap
    assert(byKey("n") == 0.1, s"noise series picked λ=${byKey("n")}")
    assert(byKey("w") == 10.0, s"walk series picked λ=${byKey("w")}")
  }

  test("dtwPairwise: identical series at 0, shift tolerance, hand-computed DP") {
    def mk(k: String, vs: Seq[Double]) = vs.zipWithIndex.map { case (v, i) => (k, i, v) }
    // a≡b → 0; c/d differ only by a one-step time shift → DTW 0 where
    // Euclidean would pay; e/f is the hand-traced 21.0 case
    val df = (mk("a", Seq(0, 1, 2, 3)) ++ mk("b", Seq(0, 1, 2, 3)) ++
      mk("c", Seq(0, 0, 1, 0)) ++ mk("d", Seq(0, 1, 0, 0)) ++
      mk("e", Seq(1, 3, 4, 9)) ++
      mk("f", Seq(1, 6, 2, 3, 0, 9, 4, 3, 6, 3))).toDF("k", "t", "v")
    val out = Diagnostics.dtwPairwise(df, Seq("k"), "t", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("dtw")).toMap
    assert(out(("a", "b")) == 0.0)
    assert(out(("c", "d")) == 0.0, s"shifted pair: ${out(("c", "d"))}")
    assert(out(("e", "f")) == 21.0, s"hand case: ${out(("e", "f"))}")
    assert(out.size == 15, s"expected C(6,2)=15 pairs, got ${out.size}")
  }

  test("dtwPairwise: series past maxN fail loud, not quadratic-quietly") {
    val df = (0 until 40).flatMap(i => Seq(("a", i, i.toDouble), ("b", i, 1.0)))
      .toDF("k", "t", "v")
    val e = intercept[org.apache.spark.SparkException] {
      Diagnostics.dtwPairwise(df, Seq("k"), "t", "v", maxN = 10).collect()
    }
    assert(e.getMessage.contains("maxN") || e.getCause != null)
  }

  test("kpssFixedLag: eta matches the l=0 KPSS definition computed in-JVM") {
    val y = Iterator.iterate(10000L)(v =>
      v + (((v * 2654435761L) >>> 33) % 201L) - 100L).take(60).toArray
    val df = y.toSeq.zipWithIndex.map { case (v, i) => ("s", i, v) }.toDF("k", "t", "v")
    val row = Diagnostics.kpssFixedLag(df, Seq("k"), "t", "v").collect().head
    // reference: demeaned partial sums over doubles, Bartlett l=0 lrv
    val n = y.length
    val mean = y.map(_.toDouble).sum / n
    val e = y.map(_.toDouble - mean)
    val s = e.scanLeft(0.0)(_ + _).drop(1)
    val etaExpected = s.map(v => v * v).sum / (n.toDouble * n) / (e.map(v => v * v).sum / n)
    assert(row.getAs[Long]("n_obs") == n)
    assert(math.abs(row.getAs[Double]("kpss_eta") - etaExpected) < 1e-3,
      s"kpss_eta=${row.getAs[Double]("kpss_eta")} expected ~$etaExpected")
    assert(row.getAs[Double]("crit5") == 0.463)
  }

  test("kpssFixedLag: polarity — level noise accepts, a trending walk rejects") {
    // oscillation around a level: partial sums stay bounded -> tiny eta
    val flat = (0 until 50).map(i => ("flat", i, 100L + (if (i % 2 == 0) 3L else -3L)))
    // strong deterministic trend: partial sums of demeaned y grow ~n^2
    val trend = (0 until 50).map(i => ("trend", i, i * 100L))
    // degenerate: constant series has zero variance -> null eta, null verdict
    val const = (0 until 10).map(i => ("const", i, 7L))
    val out = Diagnostics.kpssFixedLag((flat ++ trend ++ const).toDF("k", "t", "v"),
      Seq("k"), "t", "v").collect().map(r => r.getString(0) -> r).toMap
    assert(out("flat").getAs[Boolean]("stationary5"))
    assert(!out("trend").getAs[Boolean]("stationary5"))
    assert(out("const").get(out("const").fieldIndex("kpss_eta")) == null)
    assert(out("const").get(out("const").fieldIndex("stationary5")) == null)
  }

  test("holtWintersForecast: hand-computed m=2 recursion and seasonal forecast fan") {
    // y = 10,20,30,40; a=b=g=1/2. init: l=15, b=10, s=[-5,5].
    // t3: l=30, b=12.5, s0=-2.5; t4: l=38.75, b=10.625, s1=3.125
    // f(h) = l + h*b + s[(4+h-1) % 2]
    val df = Seq(("k", 1, 10L), ("k", 2, 20L), ("k", 3, 30L), ("k", 4, 40L))
      .toDF("g", "t", "v")
    val out = Diagnostics.holtWintersForecast(df, Seq("g"), "t", "v",
      period = 2, alpha = 0.5, beta = 0.5, gamma = 0.5, horizon = 3)
      .orderBy("step").collect()
    assert(out.length == 3)
    assert(out.head.getAs[Double]("level") == 38.75)
    assert(out.head.getAs[Double]("trend") == 10.625)
    assert(out.map(_.getAs[Double]("forecast")).toSeq ==
      Seq(46.875, 63.125, 68.125))
  }

  test("holtWintersForecast: series shorter than two periods yields no rows") {
    val df = (1 to 7).map(t => ("k", t, t * 10L)).toDF("g", "t", "v")
    assert(Diagnostics.holtWintersForecast(df, Seq("g"), "t", "v",
      period = 4, alpha = 0.5, beta = 0.25, gamma = 0.25, horizon = 2)
      .collect().isEmpty)
  }

  test("signTest: exact binomial tails, cap at 1, zero diffs dropped") {
    // strictly increasing: 9 diffs all positive -> p = 2*C(9,9)/2^9 = 1/256
    val up = (0 until 10).map(i => ("up", i, i * 10L))
    // 8 of 10 positive: p = 2*(C(10,8)+C(10,9)+C(10,10))/2^10 = 112/1024
    val mixDiffs = Seq(1L, 1, 1, 1, -1, 1, 1, -1, 1, 1)
    val mix = ("mix", 0, 100L) +: mixDiffs.zipWithIndex.map { case (d, i) =>
      ("mix", i + 1, 100L + mixDiffs.take(i + 1).sum)
    }
    // alternating with a tie step (0 diff dropped): balanced -> p caps at 1
    val bal = (0 until 11).map(i => ("bal", i,
      if (i == 5) 50L else if (i % 2 == 0) 40L else 60L))
    val out = Diagnostics.signTest((up ++ mix ++ bal).toDF("k", "t", "v"),
      Seq("k"), "t", "v").collect().map(r => r.getString(0) -> r).toMap
    assert(out("up").getAs[Long]("n_eff") == 9L)
    assert(out("up").getAs[Long]("k_pos") == 9L)
    assert(out("up").getAs[Long]("p_e9") == 3906250L) // 1/256 e9, exact
    assert(out("mix").getAs[Long]("n_eff") == 10L)
    assert(out("mix").getAs[Long]("k_pos") == 8L)
    assert(out("mix").getAs[Long]("p_e9") == 109375000L) // 112/1024 e9
    assert(out("bal").getAs[Long]("p_e9") == 1000000000L)
  }

  test("theilSen: exact line, outlier robustness, lower-median convention") {
    // pure line y = 5t + 3: every pairwise slope is exactly 5e6
    val line = (0 until 12).map(i => ("line", i, i * 5.0 + 3))
    // same line with one wild outlier: the MEDIAN slope must stay 5e6
    val outl = (0 until 12).map(i =>
      ("outl", i, if (i == 6) 100000.0 else i * 5.0 + 3))
    // two points, slopes {1e6 for (0,1)}: n_pairs = 1
    val two = Seq(("two", 0, 0.0), ("two", 1, 1.0))
    val out = Diagnostics.theilSen((line ++ outl ++ two).toDF("k", "t", "v"),
      Seq("k"), "t", "v").collect().map(r => r.getString(0) -> r).toMap
    assert(out("line").getAs[Long]("slope_e6") == 5000000L)
    assert(out("line").getAs[Long]("n_pairs") == 66L)
    assert(out("outl").getAs[Long]("slope_e6") == 5000000L)
    assert(out("two").getAs[Long]("n_pairs") == 1L)
    assert(out("two").getAs[Long]("slope_e6") == 1000000L)
    // lower median on an even pair count: slopes of {0,0,2,2} pairs
    // y = (0, 0, 2, 2): pairs (1,2):0 (1,3):1 (1,4):2/3 (2,3):2 (2,4):1 (3,4):0
    // sorted e6: {0, 0, 666667, 1000000, 1000000, 2000000} -> lower median 666667
    val ev = Seq(("e", 0, 0.0), ("e", 1, 0.0), ("e", 2, 2.0), ("e", 3, 2.0))
    val er = Diagnostics.theilSen(ev.toDF("k", "t", "v"), Seq("k"), "t", "v")
      .collect().head
    assert(er.getAs[Long]("slope_e6") == 666667L)
  }

  test("ar1Backtest: a deterministic ramp backtests to zero model error") {
    // y = t: every expanding-window CLS fit recovers phi = 1, c = 1
    // exactly, so each one-step forecast is exact; naive carry-forward
    // errs by 1 per origin
    val ramp = (1 to 20).map(i => ("r", i, i.toLong)).toDF("k", "t", "v")
    val r = Diagnostics.ar1Backtest(ramp, Seq("k"), "t", "v", minTrain = 5)
      .collect().head
    // origins t = 5..19 -> 15 of them
    assert(r.getAs[Long]("n_origins") == 15L)
    assert(r.getAs[Long]("err_model_e4") == 0L)
    assert(r.getAs[Long]("err_naive_e4") == 15L * 10000L)
    assert(r.getAs[Long]("mase_e6") == 0L)
  }

  test("seasonalMannKendall: within-phase trend found where plain MK is diluted") {
    // 3 years of period-4 data: strong per-phase increase with a big
    // seasonal swing that plain MK pairs across phases
    val period = 4
    val rows = for (yr <- 0 until 6; ph <- 0 until period)
      yield ("k", yr * period + ph, (ph * 1000 + yr * 10).toDouble)
    val df = rows.toDF("k", "t", "v")
    val r = Diagnostics.seasonalMannKendall(df, Seq("k"), "t", "v",
      period = period).collect().head
    // every within-phase pair increases: S = 4 * C(6,2) = 60
    assert(r.getAs[Long]("s_stat") == 60L)
    // var18 = 4 * 6*5*17 = 2040
    assert(r.getAs[Long]("var18") == 2040L)
    assert(r.getAs[String]("trend") == "increasing")
    // short series (< period + 2) emit nothing
    val short = (0 until 5).map(i => ("s", i, i.toDouble)).toDF("k", "t", "v")
    assert(Diagnostics.seasonalMannKendall(short, Seq("k"), "t", "v",
      period = 4).count() == 0L)
  }

  test("ljungBox: a ramp screams autocorrelation, alternating noise much less") {
    val ramp = (1 to 40).map(i => ("r", i, i * 10.0)).toDF("k", "t", "v")
    val rr = Diagnostics.ljungBox(ramp, Seq("k"), "t", "v", nlags = 6,
      crit5E4 = 125916L).collect().head
    assert(rr.getAs[Boolean]("autocorrelated"))
    assert(rr.getAs[Long]("q_e4") > rr.getAs[Long]("crit5_e4"))
    // lag-1 alternation has NEGATIVE rho1 but Q uses rho^2 — still
    // structure; a hash-scrambled series is the no-structure case
    val noise = (1 to 40).map(i =>
      ("n", i, ((i * 2654435761L) % 1000).toDouble)).toDF("k", "t", "v")
    val nr = Diagnostics.ljungBox(noise, Seq("k"), "t", "v", nlags = 6,
      crit5E4 = 125916L).collect().head
    assert(nr.getAs[Long]("q_e4") < rr.getAs[Long]("q_e4"))
    // short series (n <= nlags + 1) emit nothing
    val short = (1 to 7).map(i => ("s", i, i.toDouble)).toDF("k", "t", "v")
    assert(Diagnostics.ljungBox(short, Seq("k"), "t", "v", nlags = 6).count() == 0L)
  }

  test("gumbelReturnLevel: matches the closed form on a two-block key") {
    // two blocks with maxima 10 and 20 (rows 5/10 and 7/20 per block)
    val df = Seq(("k", 1, 5L), ("k", 1, 10L), ("k", 2, 7L), ("k", 2, 20L))
      .toDF("key", "blk", "v")
    val r = Diagnostics.gumbelReturnLevel(df, Seq("key"), "blk", "v",
      returnT = 12, minBlocks = 2).collect().head
    assert(r.getAs[Long]("n_blocks") == 2L)
    val sd = math.sqrt((2.0 * 500 - 30.0 * 30) / (2.0 * 1))
    val beta = sd * math.sqrt(6.0) / 3.141592653589793
    val mu = 30.0 / 2 - 0.5772156649015329 * beta
    val rl = mu - beta * math.log(-math.log(1 - 1.0 / 12))
    assert(r.getAs[Long]("beta_e4") == math.floor(beta * 10000 + 0.5).toLong)
    assert(r.getAs[Long]("mu_e4") == math.floor(mu * 10000 + 0.5).toLong)
    assert(r.getAs[Long]("rl_e4") == math.floor(rl * 10000 + 0.5).toLong)
    // return level sits above the location parameter for T >= 2
    assert(r.getAs[Long]("rl_e4") > r.getAs[Long]("mu_e4"))
    // degenerate: constant maxima (zero variance) emit nothing
    val const = Seq(("c", 1, 5L), ("c", 2, 5L)).toDF("key", "blk", "v")
    assert(Diagnostics.gumbelReturnLevel(const, Seq("key"), "blk", "v",
      returnT = 12, minBlocks = 2).count() == 0L)
  }

  test("ar1Backtest: constant prefixes (zero CLS denominator) are skipped") {
    val const = (1 to 10).map(i => ("c", i, 7L)).toDF("k", "t", "v")
    assert(Diagnostics.ar1Backtest(const, Seq("k"), "t", "v").count() == 0L)
    // alternating series: AR(1) nails it, naive is maximally wrong
    val alt = (1 to 20).map(i => ("a", i, if (i % 2 == 0) 10L else 0L))
      .toDF("k", "t", "v")
    val ar = Diagnostics.ar1Backtest(alt, Seq("k"), "t", "v", minTrain = 6)
      .collect().head
    assert(ar.getAs[Long]("err_naive_e4") == ar.getAs[Long]("n_origins") * 100000L)
    assert(ar.getAs[Long]("mase_e6") < 100000L,
      s"AR(1) must dominate naive on an alternating series: ${ar.mkString(",")}")
  }

  test("runsTest: alternation and clumping flag in opposite directions; constant null") {
    // perfect alternation TFTF... (n=20, n1=10): R = 20, mu = 11,
    // var = 200*(200-20)/(400*19) = 4.7368, z = 9/2.1764 = 4.1352
    val alt = (0 until 20).map(t => ("alt", t.toLong, t % 2 == 0))
    // perfect clumping TTTTT FFFFF (n=20): R = 2 -> z = -4.1352
    val clump = (0 until 20).map(t => ("cl", t.toLong, t < 10))
    val const = (0 until 10).map(t => ("c", t.toLong, true))
    val out = Diagnostics.runsTest((alt ++ clump ++ const).toDF("k", "t", "f"),
      Seq("k"), "t", "f").collect().map(r => r.getAs[String]("k") -> r).toMap
    val mu = 200.0 / 20 + 1
    val v = 200.0 * (200.0 - 20) / (400.0 * 19)
    def z(r: Long) = math.floor((r - mu) / math.sqrt(v) * 1e4 + 0.5).toLong
    assert(out("alt").getAs[Long]("n_runs") == 20L)
    assert(out("alt").getAs[Long]("z_e4") == z(20))
    assert(out("alt").getAs[Boolean]("significant"))
    assert(out("cl").getAs[Long]("n_runs") == 2L)
    assert(out("cl").getAs[Long]("z_e4") == z(2))
    assert(out("cl").getAs[Boolean]("significant"))
    assert(out("alt").getAs[Long]("z_e4") > 0 && out("cl").getAs[Long]("z_e4") < 0)
    val c = out("c")
    assert(c.get(c.fieldIndex("z_e4")) == null)
  }

  test("durbinWatson: hand-computed bands; perfect line null; short series absent") {
    // a = [1,3,2]: slope 1/2, residuals (-1/2, 1, -1/2); scaled
    // E = 24y - 48 - 6u = (-12, 24, -12), DW = 2592/864 = 3.0 exactly
    // -> 3000000, > 2.5 -> negative
    val a = Seq(("a", 1L, 1L), ("a", 2L, 3L), ("a", 3L, 2L))
    // hump [0,5,10,10,5,0]: slope 0, residuals y - 5; E = 420y - 2100,
    // DW = 17640000/17640000 = 1.0 -> 1000000, < 1.5 -> positive
    val ramp = Seq(0L, 5L, 10L, 10L, 5L, 0L).zipWithIndex
      .map { case (v, i) => ("r", (i + 1).toLong, v) }
    // perfect line -> all residuals exactly 0 -> null dw, null verdict
    val line = (1 to 5).map(t => ("p", t.toLong, 7L * t))
    // n = 2 -> no row (DW undefined)
    val short = Seq(("s", 1L, 1L), ("s", 2L, 9L))
    val out = Diagnostics.durbinWatson(
        (a ++ ramp ++ line ++ short).toDF("k", "t", "v"), Seq("k"), "t", "v")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(!out.contains("s"))
    assert(out("a").getAs[Long]("dw_e6") == 3000000L)
    assert(out("a").getAs[String]("autocorr") == "negative")
    assert(out("r").getAs[Long]("dw_e6") == 1000000L)
    assert(out("r").getAs[String]("autocorr") == "positive")
    val p = out("p")
    assert(p.get(p.fieldIndex("dw_e6")) == null)
    assert(p.get(p.fieldIndex("autocorr")) == null)
  }

  test("durbinWatson: raises loud past the scaled-residual DECIMAL bound") {
    // E ≈ (n⁴/3)·resid: n = 40 with |resid| ≈ 1e12 puts |E| ≈ 8.5e17
    // over the 5e16 fence — must RAISE, never silently null the sums
    val big = (1 to 40).map(t =>
      ("b", t.toLong, if (t % 2 == 0) 1000000000000L else -1000000000000L))
    val ex = intercept[Exception] {
      Diagnostics.durbinWatson(big.toDF("k", "t", "v"), Seq("k"), "t", "v")
        .collect()
    }
    assert(ex.getMessage.contains("durbinWatson scaled residual"))
  }

  test("kendallTau: hand-computed tie-free and tied cases; constant null; short absent") {
    // k: (1,1),(2,3),(3,2),(4,4): S = 4, n0 = 6, tau = 2/3 -> 666667;
    // v0 = 156, var = 156/18, z = 4/2.9439203 = 1.3587 -> 13587
    val k = Seq(("k", 1L, 1L), ("k", 2L, 3L), ("k", 3L, 2L), ("k", 4L, 4L))
    // t: x=[1,1,2,3], y=[5,7,5,9]: S = 2, dx = dy = 5, tau = 0.4;
    // var = 120/18 + 0 + 4/24 = 6.8333..., z = 0.76510 -> 7651
    val t = Seq(("t", 1L, 5L), ("t", 1L, 7L), ("t", 2L, 5L), ("t", 3L, 9L))
    val c = Seq(("c", 1L, 5L), ("c", 2L, 5L), ("c", 3L, 5L))
    val s = Seq(("s", 1L, 1L), ("s", 2L, 2L))
    val out = Diagnostics.kendallTau((k ++ t ++ c ++ s).toDF("g", "x", "y"),
      Seq("g"), "x", "y").collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(!out.contains("s"))
    assert(out("k").getAs[Long]("s_stat") == 4L)
    assert(out("k").getAs[Long]("tau_b_e6") == 666667L)
    assert(out("k").getAs[Long]("z_e4") == 13587L)
    assert(!out("k").getAs[Boolean]("significant"))
    assert(out("t").getAs[Long]("s_stat") == 2L)
    assert(out("t").getAs[Long]("tau_b_e6") == 400000L)
    assert(out("t").getAs[Long]("z_e4") == 7651L)
    val rc = out("c")
    assert(rc.get(rc.fieldIndex("tau_b_e6")) == null)
    assert(rc.get(rc.fieldIndex("z_e4")) == null)
  }

  test("pettitt: hand-computed K and change index; long shift flags; constant p=1") {
    // r = [0,0,0,10,10,10]: V = (-3,-3,-3,3,3,3), U = -3,-6,-9,-6,-3
    // -> K = 9 at t = 3; p = 2*exp(-486/252) ~ 0.29 (not significant)
    val r = Seq(0L, 0L, 0L, 10L, 10L, 10L).zipWithIndex
      .map { case (v, i) => ("r", (i + 1).toLong, v) }
    // b: 15 zeros then 15 tens -> K = 225 at t = 15, p ~ 3.7e-5
    val b = (1 to 30).map(t => ("b", t.toLong, if (t <= 15) 0L else 10L))
    // c: constant -> K = 0, p clamps to exactly 1
    val c = (1 to 10).map(t => ("c", t.toLong, 5L))
    val out = Diagnostics.pettitt((r ++ b ++ c).toDF("k", "t", "v"),
      Seq("k"), "t", "v").collect().map(x => x.getAs[String]("key") -> x).toMap
    assert(out("r").getAs[Long]("k_stat") == 9L)
    assert(out("r").getAs[Int]("t_change") == 3)
    assert(out("r").getAs[Long]("p_e9") ==
      math.floor(2.0 * math.exp(-486.0 / 252.0) * 1e9 + 0.5).toLong)
    assert(!out("r").getAs[Boolean]("significant"))
    assert(out("b").getAs[Long]("k_stat") == 225L)
    assert(out("b").getAs[Int]("t_change") == 15)
    assert(out("b").getAs[Boolean]("significant"))
    assert(out("c").getAs[Long]("k_stat") == 0L)
    assert(out("c").getAs[Long]("p_e9") == 1000000000L)
    assert(!out("c").getAs[Boolean]("significant"))
  }

  test("grangerCausality: a driven series flags, an unrelated one does not, constant x null") {
    // drive: y_t = x_{t-1} + (t mod 2) — x's past explains y almost
    // perfectly where y's own past cannot (x oscillates)
    val xs = Seq(1L, 5L, 2L, 7L, 3L, 8L, 4L, 9L, 5L, 10L, 6L, 11L)
    val drive = (1 to 12).map { t =>
      val y = if (t == 1) 0L else xs(t - 2) + (t % 2)
      ("drive", t.toLong, xs(t - 1), y)
    }
    // indep: y has period 3, x is a ramp — neither lag explains y
    val indep = (1 to 12).map(t =>
      ("indep", t.toLong, t.toLong, if (t % 3 == 0) 2L else 1L))
    // cx: constant cause -> collinear design -> null
    val cx = (1 to 8).map(t => ("cx", t.toLong, 7L, (t * t % 5).toLong))
    val out = Diagnostics.grangerCausality(
        (drive ++ indep ++ cx).toDF("k", "t", "x", "y"),
        Seq("k"), "t", "x", "y")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("drive").getAs[Boolean]("significant"))
    assert(math.abs(out("drive").getAs[Double]("xlag_coef") - 1.0) < 0.2)
    assert(!out("indep").getAs[Boolean]("significant"))
    assert(out("drive").getAs[Long]("f_e4") > out("indep").getAs[Long]("f_e4"))
    val rc = out("cx")
    assert(rc.get(rc.fieldIndex("f_e4")) == null)
    assert(rc.get(rc.fieldIndex("significant")) == null)
  }

  test("crossCorrelation: a shifted copy peaks at its lag; constant x null") {
    // y_{t+1} = x_t exactly -> r = 1 at lag +1; short lags drop (< 3 pairs)
    val k = Seq((1L, 1L, 9L), (2L, 2L, 1L), (3L, 3L, 2L), (4L, 4L, 3L),
      (5L, 5L, 4L)).map { case (t, x, y) => ("k", t, x, y) }
    val c = (1 to 5).map(t => ("c", t.toLong, 7L, t.toLong))
    val out = Diagnostics.crossCorrelation((k ++ c).toDF("g", "t", "x", "y"),
      Seq("g"), "t", "x", "y").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("lag")) -> r).toMap
    // kept lags for n=5: -2..2 (3,4,5,4,3 pairs)
    assert(out.keys.count(_._1 == "k") == 5)
    assert(out(("k", 1L)).getAs[Long]("n_pairs") == 4L)
    assert(out(("k", 1L)).getAs[Long]("r_e6") == 1000000L)
    assert(out(("k", 0L)).getAs[Long]("r_e6") < 1000000L)
    val rc = out(("c", 0L))
    assert(rc.get(rc.fieldIndex("r_e6")) == null)
  }

  test("engleGranger: a shared-equilibrium pair flags, a diverging one does not") {
    // both series ride the same deterministic upward walk; y's residual
    // against x is a bounded aperiodic wobble (t^2 mod 7) -> cointegrated,
    // beta ~ 3 (a perfectly-alternating residual would make the two ADF
    // regressors exactly collinear — degenerate by construction)
    val steps = (1 to 40).map(t => (t * 7 % 5 + 1).toLong)
    val xw = steps.scanLeft(0L)(_ + _).tail
    val co = (1 to 40).map(t =>
      ("co", t.toLong, xw(t - 1), 3L * xw(t - 1) + t * t % 7))
    // diverging: the residual itself trends (t^2 term) -> not cointegrated
    val div = (1 to 40).map(t =>
      ("dv", t.toLong, xw(t - 1), 3L * xw(t - 1) + t.toLong * t))
    val out = Diagnostics.engleGranger((co ++ div).toDF("k", "t", "x", "y"),
      Seq("k"), "t", "x", "y").collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("co").getAs[Boolean]("cointegrated"))
    assert(math.abs(out("co").getAs[Double]("beta") - 3.0) < 0.05)
    assert(!out("dv").getAs[Boolean]("cointegrated"))
    assert(out("co").getAs[Double]("crit5") == -3.34)
    // constant x -> singular OLS -> no row
    val cx = (1 to 10).map(t => ("cx", t.toLong, 5L, t.toLong))
    assert(Diagnostics.engleGranger(cx.toDF("k", "t", "x", "y"),
      Seq("k"), "t", "x", "y").collect().isEmpty)
  }

  test("pageHinkley: upward jump alarms at the first crossing; downward never") {
    // a = [10,10,10,40]: terms (0,0,0,22.5) -> PH jumps to 22.5e9 at t=4
    val a = Seq(10L, 10L, 10L, 40L).zipWithIndex
      .map { case (v, i) => ("a", (i + 1).toLong, v) }
    // d = [40,10,10,10]: m only falls, running min tracks it -> PH stays 0
    val d = Seq(40L, 10L, 10L, 10L).zipWithIndex
      .map { case (v, i) => ("d", (i + 1).toLong, v) }
    val out = Diagnostics.pageHinkley((a ++ d).toDF("k", "t", "v"),
        Seq("k"), "t", "v", delta = 0.0, lambda = 5.0)
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("a").getAs[Long]("max_ph_e9") == 22500000000L)
    assert(out("a").getAs[Long]("first_alarm_t") == 4L)
    assert(out("a").getAs[Boolean]("alarmed"))
    assert(out("d").getAs[Long]("max_ph_e9") == 0L)
    val rd = out("d")
    assert(rd.get(rd.fieldIndex("first_alarm_t")) == null)
    assert(!rd.getAs[Boolean]("alarmed"))
  }

  test("ordinalAssociation: hand-computed gamma and both Somers' D; constant-y edges") {
    // t: x=[1,1,2,3], y=[5,7,5,9]: C=3 D=1 Tx=1 Ty=1
    // gamma = 2/4 = .5; D_yx = D_xy = 2/5 = .4
    val t = Seq(("t", 1L, 5L), ("t", 1L, 7L), ("t", 2L, 5L), ("t", 3L, 9L))
    val m = (1L to 4L).map(v => ("m", v, v))
    // z: constant y -> every x-moving pair lands in Ty:
    // gamma null (C+D=0), D_yx = 0 (den Ty > 0), D_xy null (den 0)
    val z = Seq(("z", 1L, 5L), ("z", 2L, 5L), ("z", 3L, 5L))
    val out = Diagnostics.ordinalAssociation((t ++ m ++ z).toDF("g", "x", "y"),
      Seq("g"), "x", "y").collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(out("t").getAs[Long]("c_pairs") == 3L)
    assert(out("t").getAs[Long]("d_pairs") == 1L)
    assert(out("t").getAs[Long]("gamma_e6") == 500000L)
    assert(out("t").getAs[Long]("somers_d_yx_e6") == 400000L)
    assert(out("t").getAs[Long]("somers_d_xy_e6") == 400000L)
    assert(out("m").getAs[Long]("gamma_e6") == 1000000L)
    val rz = out("z")
    assert(rz.get(rz.fieldIndex("gamma_e6")) == null)
    assert(rz.getAs[Long]("somers_d_yx_e6") == 0L)
    assert(rz.get(rz.fieldIndex("somers_d_xy_e6")) == null)
  }

  test("neweyWestSe: hand-computed two-point series; block series inflates; constant null") {
    // y=(0,2), L=1: c=1, d=(-1,1), mu=0, g0=1, gamma1=-1/2
    // lrv = 1 + 2*(1/2)*(-1/2) = 1/2; se_iid = sqrt(1/2), se_hac = 1/2
    val tiny = Seq(("t", 1L, 0L), ("t", 2L, 2L)).toDF("g", "t", "v")
    val r = Diagnostics.neweyWestSe(tiny, Seq("g"), "t", "v", maxLag = 1)
      .collect().head
    assert(r.getAs[Long]("mean_e6") == 1000000L)
    assert(r.getAs[Long]("se_iid_e6") == 707107L)
    assert(r.getAs[Long]("se_hac_e6") == 500000L)
    assert(r.getAs[Long]("inflation_e4") == 7071L)
    // positively autocorrelated blocks: HAC se must exceed iid se
    val blocks = (0 until 48).map(t => ("b", t.toLong, if ((t / 8) % 2 == 0) 100L else 200L))
      .toDF("g", "t", "v")
    val rb = Diagnostics.neweyWestSe(blocks, Seq("g"), "t", "v", maxLag = 4)
      .collect().head
    assert(rb.getAs[Long]("inflation_e4") > 10000L,
      s"blocks inflation=${rb.getAs[Long]("inflation_e4")}")
    // constant: zero variance -> nulls
    val cst = (0 until 10).map(t => ("c", t.toLong, 7L)).toDF("g", "t", "v")
    val rc = Diagnostics.neweyWestSe(cst, Seq("g"), "t", "v").collect().head
    assert(rc.get(rc.fieldIndex("se_hac_e6")) == null)
  }

  test("periodogramFixed: planted cosine peaks at its frequency bin") {
    // x_t = 5000 + 1000*cos(2*pi*4*t/64): pure tone in bin k=4, period 16
    val df = (0 until 64).map { t =>
      ("a", t.toLong,
        5000L + math.floor(1000.0 * math.cos(2 * math.Pi * 4 * t / 64) + 0.5).toLong)
    }.toDF("g", "t", "v")
    val out = Diagnostics.periodogramFixed(df, Seq("g"), "t", "v", n = 64)
      .collect()
    assert(out.length == 32)
    val peak = out.filter(_.getAs[Boolean]("is_peak"))
    assert(peak.map(_.getAs[Int]("k")).toSeq == Seq(4))
    assert(peak.head.getAs[Long]("share_e6") == 1000000L)
    assert(peak.head.getAs[Long]("period_e3") == 16000L)
    // quantization of the planted tone leaks only tiny side-lobe power;
    // the constant 5000 leaks NONE (orthogonal over exactly n points)
    assert(out.filter(r => !r.getAs[Boolean]("is_peak"))
      .forall(_.getAs[Long]("share_e6") < 1000L))
  }

  test("periodogramFixed: short keys drop; two-tone picks the stronger") {
    val two = (0 until 64).map { t =>
      val x = 4000.0 * math.cos(2 * math.Pi * 8 * t / 64) +
        1000.0 * math.cos(2 * math.Pi * 2 * t / 64)
      ("b", t.toLong, math.floor(x + 0.5).toLong)
    }
    val short = (0 until 10).map(t => ("s", t.toLong, 100L))
    val out = Diagnostics.periodogramFixed((two ++ short).toDF("g", "t", "v"),
      Seq("g"), "t", "v", n = 64).collect()
    assert(out.forall(_.getAs[String]("g") == "b"), "short key must drop")
    val peak = out.filter(_.getAs[Boolean]("is_peak"))
    assert(peak.map(_.getAs[Int]("k")).toSeq == Seq(8))
    // the weaker tone still shows: share ~ (1000/4000)^2 = 62500 e6-units
    val weak = out.find(_.getAs[Int]("k") == 2).get
    assert(math.abs(weak.getAs[Long]("share_e6") - 62500L) < 2000L)
  }

  test("periodogramAutoN: per-key length selection picks the largest fitting 2^k") {
    // key a: 20 points → n_sel 16, planted period 4 → peak k = 4;
    // key c: 9 points → n_sel 8, same tone → peak k = 2;
    // key s: 7 points → below the smallest candidate, drops
    def tone(g: String, len: Int) = (0 until len).map { t =>
      (g, t.toLong,
        5000L + math.floor(1000.0 * math.cos(2 * math.Pi * t / 4) + 0.5).toLong)
    }
    val df = (tone("a", 20) ++ tone("c", 9) ++ tone("s", 7)).toDF("g", "t", "v")
    val out = Diagnostics.periodogramAutoN(df, Seq("g"), "t", "v").collect()
    assert(out.forall(r => r.getAs[String]("g") != "s"), "7-point key must drop")
    val a = out.filter(_.getAs[String]("g") == "a")
    assert(a.forall(_.getAs[Int]("n_sel") == 16) && a.length == 8)
    assert(a.filter(_.getAs[Boolean]("is_peak"))
      .map(r => (r.getAs[Int]("k"), r.getAs[Long]("period_e3"))).toSeq ==
      Seq((4, 4000L)))
    val c = out.filter(_.getAs[String]("g") == "c")
    assert(c.forall(_.getAs[Int]("n_sel") == 8) && c.length == 4)
    assert(c.filter(_.getAs[Boolean]("is_peak"))
      .map(r => (r.getAs[Int]("k"), r.getAs[Long]("period_e3"))).toSeq ==
      Seq((2, 4000L)))
  }

  test("thetaForecast: perfect line — SES of the theta2 line plus the trend half") {
    // y = 10t: b = 10, a = 0, z_t = 10t, SES(1/2): 10, 15, 22.5;
    // f(h) = 0.5*(10*(3+h)) + 0.5*22.5
    val df = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 30L))
      .toDF("g", "t", "v")
    val out = Diagnostics.thetaForecast(df, Seq("g"), "t", "v",
        alpha = 0.5, horizon = 2)
      .orderBy("step").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("slope") == 10.0)
    assert(out(0).getAs[Double]("level") == 22.5)
    assert(out(0).getAs[Double]("forecast") == 31.25)
    assert(out(1).getAs[Double]("forecast") == 36.25)
    // series shorter than 3 yield nothing
    assert(Diagnostics.thetaForecast(df.limit(2), Seq("g"), "t", "v",
      0.5, 2).count() == 0L)
  }

  test("yeoJohnsonGrid: grid argmax lands within one step of the golden-section kernel") {
    // a right-skewed series (exp-shaped) wants lambda < 1; mixed signs
    // exercise both branch families
    var s = 13L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    val ys = (1 to 60).map { _ =>
      val u = (math.floorMod(next(), 1000000L) + 0.5) / 1000000.0
      -math.log(u) * 10.0 - 8.0 // exp(10) shifted: skewed, signs mixed
    }
    val df = ys.map(("k", _)).toDF("g", "x")
    val out = Diagnostics.yeoJohnsonGrid(df, Seq("g"), "x").collect()
    assert(out.length == 101)
    val best = out.filter(_.getAs[Boolean]("is_best"))
    assert(best.length == 1)
    val gridLam = best.head.getAs[Long]("lambda_e1") / 10.0
    val kernelLam = graft.stats.TimeSeriesStats.yeoJohnsonLambda(ys.toArray)
    assert(math.abs(gridLam - kernelLam) <= 0.11,
      s"grid $gridLam vs kernel $kernelLam")
    assert(gridLam < 1.0) // right-skew pulls lambda below identity
  }

  test("yeoJohnsonRefined: lam-hat stays in the grid winner's bracket, llf never drops") {
    var s = 17L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    val ys = (1 to 60).map { _ =>
      val u = (math.floorMod(next(), 1000000L) + 0.5) / 1000000.0
      -math.log(u) * 10.0 - 8.0
    }
    val df = ys.map(("k", _)).toDF("g", "x")
    val r = Diagnostics.yeoJohnsonRefined(df, Seq("g"), "x").head()
    val lam0 = r.getAs[Long]("lam0_e6") / 1e6
    val lamHat = r.getAs[Long]("lam_hat_e6") / 1e6
    assert(math.abs(lamHat - lam0) <= 0.1 + 1e-9,
      s"refinement left the e1 bracket: grid $lam0 vs refined $lamHat")
    // the refined llf must be at least the bracket edges' (it maximizes)
    val grid = Diagnostics.yeoJohnsonGrid(df, Seq("g"), "x")
      .filter(col("is_best")).head()
    assert(grid.getAs[Long]("lambda_e1") / 10.0 == lam0)
    // determinism: same inputs, same bits
    val r2 = Diagnostics.yeoJohnsonRefined(df, Seq("g"), "x").head()
    assert(r2.getAs[Long]("lam_hat_e6") == r.getAs[Long]("lam_hat_e6") &&
      r2.getAs[Long]("llf_e6") == r.getAs[Long]("llf_e6"))
  }

  test("seasonalPeriodGrid: planted tone recovers its period; kernel argmax agrees") {
    // x_t = 5000 + 1000*cos(2*pi*t/8): pure period-8 tone over 64 points
    val ys = (0 until 64).map(t =>
      5000.0 + math.floor(1000.0 * math.cos(2 * math.Pi * t / 8) + 0.5))
    val df = ys.zipWithIndex.map { case (v, t) => ("a", t.toLong, v.toLong) }
      .toDF("g", "t", "v")
    val out = Diagnostics.seasonalPeriodGrid(df, Seq("g"), "t", "v")
      .collect()
    // candidates p = 2..24 all fit (n/2 = 32)
    assert(out.length == 23)
    val best = out.filter(_.getAs[Boolean]("is_best"))
    assert(best.map(_.getAs[Int]("p")).toSeq == Seq(8))
    assert(best.head.getAs[Long]("share_e6") == 1000000L)
    // the q34 kernel now runs the SAME exact-integer arithmetic
    assert(graft.stats.TimeSeriesStats.seasonalPeriod(ys.toArray) == 8)
  }

  test("localLevelRefined: refinement stays in the bracket and tracks the regime") {
    // near-constant series → grid winner at the λ = 0.1 edge, bracket
    // [0.05, 0.5]; strong ramp → winner at the λ = 10 edge, bracket
    // [2, 20]; the refined λ̂ must stay inside its bracket and the
    // protocol must be deterministic (bit-equal across runs)
    val calm = (0 until 40).map(t =>
      ("c", t.toLong, 5.0 + (if (t % 2 == 0) 0.001 else -0.001)))
    val ramp = (0 until 40).map(t => ("r", t.toLong, t * 10.0))
    val df = (calm ++ ramp).toDF("g", "t", "v")
    val out = Diagnostics.localLevelRefined(df, Seq("g"), "t", "v")
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    val c = out("c")
    assert(c.getAs[Long]("lambda0_e6") == 100000L)
    val ch = c.getAs[Long]("lam_hat_e6")
    assert(ch >= 50000L && ch <= 500000L, s"calm lam_hat=$ch")
    val r = out("r")
    assert(r.getAs[Long]("lambda0_e6") == 10000000L)
    val rh = r.getAs[Long]("lam_hat_e6")
    assert(rh >= 2000000L && rh <= 20000000L, s"ramp lam_hat=$rh")
    // determinism: bit-equal on a second run
    val again = Diagnostics.localLevelRefined(df, Seq("g"), "t", "v")
      .collect().map(r2 => r2.getAs[String]("key") -> r2.getAs[Long]("lam_hat_e6"))
      .toMap
    assert(again("c") == ch && again("r") == rh)
    // the refined NLL can never beat the bracket's true minimum by
    // construction, but it must not be WORSE than both probes' parent
    // grid winner by more than the bracket allows — sanity: finite
    assert(c.getAs[Long]("nll_e6") != 0L || r.getAs[Long]("nll_e6") != 0L)
  }

  test("localLevelRefined: series shorter than 3 observations drop") {
    val df = Seq(("s", 0L, 1.0), ("s", 1L, 2.0)).toDF("g", "t", "v")
    assert(Diagnostics.localLevelRefined(df, Seq("g"), "t", "v").count() == 0L)
  }

  test("periodogramAutoN: matches periodogramFixed when the selected n coincides") {
    val df = (0 until 64).map { t =>
      ("a", t.toLong,
        5000L + math.floor(1000.0 * math.cos(2 * math.Pi * 4 * t / 64) + 0.5).toLong)
    }.toDF("g", "t", "v")
    val auto = Diagnostics.periodogramAutoN(df, Seq("g"), "t", "v")
      .select("g", "k", "period_e3", "share_e6", "is_peak").collect().toSet
    val fixed = Diagnostics.periodogramFixed(df, Seq("g"), "t", "v", n = 64)
      .collect().toSet
    assert(auto == fixed)
  }
}
