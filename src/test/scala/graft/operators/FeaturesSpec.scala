package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Double*) = {
    vals.zipWithIndex.map { case (v, i) => (f"2020-${i + 1}%02d-01", v) }
      .toDF("month", "v").withColumn("month", to_date(col("month")))
  }
  private val w = Features.keyWindow(Nil, "month")

  test("pctChange(1): pandas pct_change parity on a gap-free grid") {
    val out = series(100.0, 110.0, 99.0)
      .select(Features.pctChange(col("v"), 1, w)).orderBy("month")
    val got = out.collect().toSeq.map(_.get(0))
    assert(got.head == null)
    assert(approx(got(1).asInstanceOf[Double], 10.0, 1e-9))
    assert(approx(got(2).asInstanceOf[Double], -10.0, 1e-9))
  }

  test("diff(k): first and seasonal differences") {
    val df = series(1.0, 4.0, 9.0)
    val got = df.select(Features.diff(col("v"), 1, w)).orderBy("month")
      .collect().toSeq.map(_.get(0))
    assert(got === Seq(null, 3.0, 5.0))
  }

  test("rollingMean: null until min_periods=n non-null obs (pandas rolling default)") {
    val got = series(1.0, 2.0, 3.0, 4.0)
      .select(Features.rollingMean(col("v"), 3, w)).orderBy("month")
      .collect().toSeq.map(_.get(0))
    assert(got(0) == null && got(1) == null)
    assert(approx(got(2).asInstanceOf[Double], 2.0))
    assert(approx(got(3).asInstanceOf[Double], 3.0))
  }

  test("rollingStd: ddof=1 sample std like pandas") {
    val got = series(1.0, 2.0, 3.0)
      .select(Features.rollingStd(col("v"), 3, w)).orderBy("month")
      .collect().toSeq.map(_.get(0))
    assert(approx(got(2).asInstanceOf[Double], 1.0)) // std([1,2,3], ddof=1) = 1
  }

  test("rollingMedian with explicit min_periods") {
    val got = series(5.0, 1.0, 3.0, 100.0)
      .select(Features.rollingMedian(col("v"), 3, 2, w)).orderBy("month")
      .collect().toSeq.map(_.get(0))
    assert(got(0) == null) // only 1 obs < min_periods 2
    assert(approx(got(1).asInstanceOf[Double], 3.0)) // median(5,1)
    assert(approx(got(2).asInstanceOf[Double], 3.0)) // median(5,1,3)
    assert(approx(got(3).asInstanceOf[Double], 3.0)) // median(1,3,100)
  }

  test("base100: index vs first observation") {
    val got = series(50.0, 75.0, 100.0)
      .select(Features.base100(col("v"), w)).orderBy("month")
      .collect().toSeq.map(_.getDouble(0))
    assert(got.map(x => math.round(x).toDouble) === Seq(100.0, 150.0, 200.0))
  }

  test("cumSum running total") {
    val got = series(1.0, 2.0, 3.0)
      .select(Features.cumSum(col("v"), w)).orderBy("month")
      .collect().toSeq.map(_.getDouble(0))
    assert(got === Seq(1.0, 3.0, 6.0))
  }

  test("rollingCorr: perfect positive correlation = 1, guarded below n obs") {
    val df = (1 to 5).map(i => (f"2020-$i%02d-01", i.toDouble, 2.0 * i))
      .toDF("month", "x", "y").withColumn("month", to_date(col("month")))
    val got = df.select(Features.rollingCorr(col("x"), col("y"), 3, w)).orderBy("month")
      .collect().toSeq.map(_.get(0))
    assert(got(0) == null && got(1) == null)
    assert(approx(got(2).asInstanceOf[Double], 1.0, 1e-9))
  }

  test("tailRows: trailing n rows per key, deterministic via tiebreak") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("b", 1, 5.0))
      .toDF("k", "t", "v")
    val out = Features.tailRows(df, Seq("k"), Seq("t"), 2)
      .orderBy("k", "t").as[(String, Int, Double)].collect().toSeq
    assert(out === Seq(("a", 2, 20.0), ("a", 3, 30.0), ("b", 1, 5.0)))
  }

  test("repairLastOutlier: last point replaced by prior rolling median, pandas-parity") {
    // reference cell 28: window 13, min_periods max(6, 13//2)=6; replacement
    // is roll_med.iloc[-2]; short series fall back to y.iloc[-2]
    val months = (1 to 20).map(i => f"${2020 + (i - 1) / 12}-${(i - 1) % 12 + 1}%02d-01")
    val vals = (1 to 19).map(_.toDouble) :+ 500.0 // last point is the outlier
    val df = months.zip(vals).toDF("m", "v").select(to_date(col("m")).as("m"), col("v"))
    val out = Features.repairLastOutlier(df, Nil, "m", "v", n = 13, minPeriods = 6)
      .orderBy("m").collect()
    // pandas: roll_med over rows 7..19 (window 13 ending at idx 18) = median(7..19)=13
    assert(out.last.getAs[Double]("repaired") == 13.0,
      s"got ${out.last.getAs[Double]("repaired")}")
    // all non-last rows untouched
    out.init.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("repaired") == vals(i)) }
    // short series (n=3 < min_periods): falls back to second-to-last value
    val short = Seq(("2020-01-01", 10.0), ("2020-02-01", 20.0), ("2020-03-01", 99.0))
      .toDF("m", "v").select(to_date(col("m")).as("m"), col("v"))
    val out2 = Features.repairLastOutlier(short, Nil, "m", "v", n = 13, minPeriods = 6)
      .orderBy("m").collect()
    assert(out2.last.getAs[Double]("repaired") == 20.0)
    // single row: untouched
    val one = Seq(("2020-01-01", 7.0)).toDF("m", "v")
      .select(to_date(col("m")).as("m"), col("v"))
    val out3 = Features.repairLastOutlier(one, Nil, "m", "v").collect()
    assert(out3.head.getAs[Double]("repaired") == 7.0)
  }

  test("interpolateLinear fills interior gaps by x-distance, not row count") {
    // x = 0, 1, 3 (irregular): the gap at x=1 sits 1/3 of the way to x=3
    val df = Seq((0L, Some(10.0)), (1L, None), (3L, Some(40.0)))
      .toDF("x", "v")
    val out = Features.interpolateLinear(df, Nil, "x", "v", "f")
      .orderBy("x").collect().map(_.getAs[Double]("f"))
    assert(out.toSeq == Seq(10.0, 20.0, 40.0)) // 10 + 30·(1−0)/(3−0)
  }

  test("interpolateLinear: consecutive gaps share one segment; edges stay null") {
    val df = Seq((1L, None), (2L, Some(10.0)), (3L, None), (4L, None),
        (5L, Some(40.0)), (6L, None))
      .toDF("x", "v")
    val out = Features.interpolateLinear(df, Nil, "x", "v", "f")
      .orderBy("x").collect().map(r => Option(r.get(r.fieldIndex("f"))))
    assert(out.toSeq == Seq(None, Some(10.0), Some(20.0), Some(30.0),
      Some(40.0), None)) // leading/trailing nulls: no extrapolation
  }

  test("interpolateLinear is keyed: neighbors never cross series") {
    val df = Seq(("a", 1L, Some(0.0)), ("a", 2L, None), ("a", 3L, Some(2.0)),
        ("b", 1L, Some(100.0)), ("b", 2L, None))
      .toDF("k", "x", "v")
    val out = Features.interpolateLinear(df, Seq("k"), "x", "v", "f")
      .orderBy("k", "x").collect().map(r => Option(r.get(r.fieldIndex("f"))))
    assert(out.toSeq == Seq(Some(0.0), Some(1.0), Some(2.0),
      Some(100.0), None)) // b's trailing gap must not borrow a's points
  }

  test("timeWeightedAvg integrates the step function, not the row mean") {
    // value 100 held for 9 units, then 200 for 1 unit: twap = (9*100+1*200)/10
    val df = Seq(("k", 0L, 100L), ("k", 9L, 200L), ("k", 10L, 999L))
      .toDF("k", "t", "v")
    val r = Features.timeWeightedAvg(df, Seq("k"), "t", "v").collect().head
    assert(r.getAs[Long]("n_obs") == 3)
    assert(r.getAs[Long]("span") == 10)
    assert(r.getAs[Double]("twap") == 110.0) // row mean would be 433
  }

  test("timeWeightedAvg: single observation has no integral -> null") {
    val df = Seq(("k", 5L, 42L)).toDF("k", "t", "v")
    val r = Features.timeWeightedAvg(df, Seq("k"), "t", "v").collect().head
    assert(r.getAs[Long]("n_obs") == 1)
    assert(r.get(r.fieldIndex("twap")) == null)
  }

  test("timeWeightedAvg shares one shuffle between window and aggregate") {
    val df = Seq(("k", 0L, 1L), ("k", 1L, 2L)).toDF("k", "t", "v")
    val p = Features.timeWeightedAvg(df, Seq("k"), "t", "v")
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("cusumDrift: a level shift grows drift linearly; pre-shift drift stays small") {
    // 5 points at 10, then 5 at 20: mean 15, dev_scaled = ±50 (n=10)
    val vals = Seq.fill(5)(10L) ++ Seq.fill(5)(20L)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "i", "v")
    val out = Features.cusumDrift(df, Seq("k"), "i", "v").orderBy("i").collect()
    assert(out.forall(_.getAs[Long]("n") == 10))
    assert(out.map(_.getAs[Long]("dev_scaled")).toSeq ==
      (Seq.fill(5)(-50L) ++ Seq.fill(5)(50L)))
    // cum: -50,-100,...,-250, then -200,...,0; running min -250 from i=4
    val drift = out.map(_.getAs[Long]("drift_scaled")).toSeq
    assert(drift.take(5) == Seq(0L, 0L, 0L, 0L, 0L)) // descending cum: drift 0
    assert(drift.drop(5) == Seq(50L, 100L, 150L, 200L, 250L))
  }

  test("cusumDrift: pure noise around the mean keeps drift bounded") {
    val vals = Seq(10L, 20L, 10L, 20L, 10L, 20L)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "i", "v")
    val out = Features.cusumDrift(df, Seq("k"), "i", "v").orderBy("i").collect()
    // dev_scaled alternates -30/+30 (mean 15, n=6); drift never exceeds one step
    assert(out.map(_.getAs[Long]("drift_scaled")).max == 30L)
  }

  test("cusumDrift plans one shuffle (all frames share the sort)") {
    val df = Seq(("k", 0L, 1L), ("k", 1L, 2L)).toDF("k", "i", "v")
    val p = Features.cusumDrift(df, Seq("k"), "i", "v")
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("standardize: z-score and min-max from exact group stats") {
    // group g: 2, 4, 6 -> mean 4, sigma_pop = sqrt(8/3)
    val df = Seq(("g", 2L), ("g", 4L), ("g", 6L)).toDF("g", "v")
    val out = Features.standardize(df, Seq("g"), "v").orderBy("v").collect()
    val z = out.map(_.getAs[Long]("z_e6"))
    val sigma = math.sqrt(8.0 / 3.0)
    assert(z(0) == math.floor(-2 / sigma * 1e6 + 0.5).toLong)
    assert(z(1) == 0L)
    assert(z(2) == math.floor(2 / sigma * 1e6 + 0.5).toLong)
    assert(out.map(_.getAs[Long]("minmax_e6")).toSeq == Seq(0L, 500000L, 1000000L))
  }

  test("standardize: constant group scales to null, not NaN") {
    val df = Seq(("k", 5L), ("k", 5L)).toDF("g", "v")
    val out = Features.standardize(df.withColumnRenamed("g", "g2"), Seq("g2"), "v")
      .collect()
    assert(out.forall(r => r.get(r.fieldIndex("z_e6")) == null))
    assert(out.forall(r => r.get(r.fieldIndex("minmax_e6")) == null))
  }

  test("standardize broadcasts stats — no shuffle of the data rows") {
    val df = Seq(("g", 1L), ("g", 2L)).toDF("g", "v")
    val p = Features.standardize(df, Seq("g"), "v")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"), p)
  }

  test("decayScore: whole-half-life weights, exact truncation past the horizon") {
    // newest at t=100h; values at 0, 1, 2 half-lives (h = 10 units) and
    // one past the horizon
    val h = 10L
    val df = Seq(
      ("k", 100L, 8L),   // age 0 -> 8
      ("k", 90L, 8L),    // age 1h -> 4
      ("k", 85L, 8L),    // age 1.5h -> floor 1 half-life -> 4
      ("k", 80L, 8L),    // age 2h -> 2
      ("k", -1000L, 8L)  // far past maxHalfLives -> exactly 0
    ).toDF("k", "t", "v")
    val r = Features.decayScore(df, Seq("k"), "t", "v", halfLifeMicros = h,
      maxHalfLives = 20).collect().head
    assert(r.getAs[Long]("n_events") == 5)
    assert(r.getAs[Long]("last_us") == 100L)
    assert(r.getAs[Double]("decay_score") == 8.0 + 4.0 + 4.0 + 2.0)
  }

  test("seasonalDecompose: planted season + linear trend recovered") {
    // x = 1000*t + season(phase), period 4, seasonal pattern sums to zero
    val season = Seq(400L, -100L, -200L, -100L)
    val df = (0 until 16).map { t =>
      ("k", t.toLong, 1000L * t + season(t % 4)) }.toDF("k", "t", "v")
    val out = Features.seasonalDecompose(df, Seq("k"), "t", "v", period = 4)
      .orderBy("t").collect()
    // trend defined for t in [2, 13]: centered MA of a linear series = itself
    val mid = out.filter(r => r.getAs[Long]("t") >= 2 && r.getAs[Long]("t") <= 13)
    mid.foreach { r =>
      assert(r.getAs[Long]("trend_e6") == 1000L * r.getAs[Long]("t") * 1000000L,
        s"t=${r.getAs[Long]("t")}")
      assert(r.getAs[Long]("seasonal_e6") == season((r.getAs[Long]("t") % 4).toInt) * 1000000L)
      assert(r.getAs[Long]("resid_e6") == 0L)
    }
    // edges: no full window -> null trend and residual
    assert(out.take(2).forall(r => r.get(r.fieldIndex("trend_e6")) == null))
    assert(out.takeRight(2).forall(r => r.get(r.fieldIndex("resid_e6")) == null))
  }

  test("seasonalStrength: pure season scores 1 seasonal / 0 trend; pure trend the reverse") {
    // x = 1000*t (pure trend, resid 0): F_T = 1, F_S = 1 - 0/Var(x-T)
    // where x-T = 0 exactly -> zero denominator -> null F_S
    val trend = (0 until 16).map(t => ("tr", t.toLong, 1000L * t))
    // x = season only (zero-sum pattern): T = 0... pattern rides on a
    // constant level so Var(x-S) = 0 -> null F_T, F_S = 1
    val season = Seq(400L, -100L, -200L, -100L)
    val seas = (0 until 16).map(t => ("se", t.toLong, 5000L + season(t % 4)))
    val out = Features.seasonalStrength(
        (trend ++ seas).toDF("k", "t", "v"), Seq("k"), "t", "v", period = 4)
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val tr = out("tr")
    assert(tr.getAs[Long]("f_trend_e6") == 1000000L)
    assert(tr.get(tr.fieldIndex("f_seasonal_e6")) == null)
    val se = out("se")
    assert(se.getAs[Long]("f_seasonal_e6") == 1000000L)
    assert(se.get(se.fieldIndex("f_trend_e6")) == null)
  }

  test("seasonalDecomposeMul: constant level times mean-one season recovered") {
    // x = 1000 * S(phase), S = (0.8, 1.2, 1.0, 1.0): every full 4-window
    // sums to one cycle -> trend exactly 1000, ratios exactly S, indices
    // already mean-one -> seasonal = S*1e6, residual = 1e6
    val s4 = Seq(800L, 1200L, 1000L, 1000L)
    val df = (0 until 12).map { t => ("k", t.toLong, s4(t % 4)) }
      .toDF("k", "t", "v")
    val out = Features.seasonalDecomposeMul(df, Seq("k"), "t", "v", period = 4)
      .orderBy("t").collect()
    val mid = out.filter(r => r.getAs[Long]("t") >= 2 && r.getAs[Long]("t") <= 9)
    mid.foreach { r =>
      assert(r.getAs[Long]("trend_e6") == 1000L * 1000000L, s"t=${r.getAs[Long]("t")}")
      assert(r.getAs[Long]("seasonal_e6") ==
        s4((r.getAs[Long]("t") % 4).toInt) * 1000L,
        s"t=${r.getAs[Long]("t")}")
      assert(r.getAs[Long]("resid_e6") == 1000000L)
    }
    // edges: no full window -> null trend and residual; seasonal still
    // joins by phase (the classical convention)
    assert(out.take(2).forall(r => r.get(r.fieldIndex("trend_e6")) == null))
    assert(out.takeRight(2).forall(r => r.get(r.fieldIndex("resid_e6")) == null))
    assert(out.take(2).forall(r => r.get(r.fieldIndex("seasonal_e6")) != null))
  }

  test("seasonalDecomposeMul: indices normalize to mean one") {
    // x = (2000, 1000, 1000, 1000) repeating: one-cycle mean 1250, so
    // ratios are (1.6, .8, .8, .8) — mean one by the MA construction;
    // the normalizer path (m9 = 4e9, np = 4) is exercised as identity
    val s4 = Seq(2000L, 1000L, 1000L, 1000L)
    val df = (0 until 12).map { t => ("k", t.toLong, s4(t % 4)) }
      .toDF("k", "t", "v")
    val out = Features.seasonalDecomposeMul(df, Seq("k"), "t", "v", period = 4)
      .orderBy("t").collect()
    // trend = one-cycle mean = 1250 everywhere interior
    val mid = out.filter(r => r.getAs[Long]("t") >= 2 && r.getAs[Long]("t") <= 9)
    val byPhase = mid.groupBy(r => (r.getAs[Long]("t") % 4).toInt)
    assert(byPhase(0).forall(_.getAs[Long]("seasonal_e6") == 1600000L))
    assert(byPhase(1).forall(_.getAs[Long]("seasonal_e6") == 800000L))
    // x/(T*S): phase0 2000/(1250*1.6) = 1.0 -> resid 1e6
    mid.foreach(r => assert(r.getAs[Long]("resid_e6") == 1000000L))
    // short key: fewer rows than a full window -> all-null trend
    val shortDf = (0 until 3).map { t => ("s", t.toLong, 100L) }.toDF("k", "t", "v")
    val so = Features.seasonalDecomposeMul(shortDf, Seq("k"), "t", "v", period = 4)
      .collect()
    assert(so.forall(r => r.get(r.fieldIndex("trend_e6")) == null))
  }

  test("ewmaWeights: pure integer recurrence, decreasing, engine-free") {
    val w = Features.ewmaWeights(800000L, 4)
    assert(w == Seq(1000000L, 800000L, 640000L, 512000L))
    assert(Features.ewmaWeights(1000000L, 3) == Seq(1000000L, 1000000L, 1000000L))
  }

  test("ewmaTrailing: hand-computed integer smoothing with short-series head") {
    val df = Seq(("a", 1L, 100L), ("a", 2L, 200L), ("a", 3L, 50L))
      .toDF("k", "t", "v")
    val out = Features.ewmaTrailing(df, Seq("k"), "t", "v",
        alphaE6 = 500000L, k = 3)
      .orderBy("t").collect().map(_.getAs[Long]("ewma"))
    // weights 1e6, 5e5, 25e4
    // t=1: 100*1e6 / 1e6 = 100
    // t=2: (200*1e6 + 100*5e5) / 1.5e6 = 250e6/1.5e6 = 166 (floor)
    // t=3: (50*1e6 + 200*5e5 + 100*25e4) / 1.75e6 = 175e6/1.75e6 = 100
    assert(out.toSeq == Seq(100L, 166L, 100L))
  }

  test("ewmaTrailing: alpha=1 reduces to the trailing-k mean (floored)") {
    val df = (1L to 5L).map(i => ("a", i, i * 10)).toDF("k", "t", "v")
    val out = Features.ewmaTrailing(df, Seq("k"), "t", "v",
        alphaE6 = 1000000L, k = 3)
      .orderBy("t").collect().map(_.getAs[Long]("ewma"))
    assert(out.toSeq == Seq(10L, 15L, 20L, 30L, 40L))
  }

  test("quantileNormalize: permilles map to exact global order statistics") {
    // groups on different scales; global sorted = [1,2,3,100,200,300]
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 100L), ("b", 200L), ("b", 300L)).toDF("g", "v")
    val out = Features.quantileNormalize(df, "g", "v")
      .orderBy("g", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("permille"),
        r.getAs[Long]("norm_value")))
    // permilles 0/500/1000 -> global indices 0/2/5 -> values 1/3/300
    assert(out.toSeq == Seq(
      ("a", 1L, 0L, 1L), ("a", 2L, 500L, 3L), ("a", 3L, 1000L, 300L),
      ("b", 100L, 0L, 1L), ("b", 200L, 500L, 3L), ("b", 300L, 1000L, 300L)))
  }

  test("quantileNormalize: tied values share one permille and one output row") {
    val df = Seq(("a", 5L), ("a", 5L), ("a", 9L)).toDF("g", "v")
    val out = Features.quantileNormalize(df, "g", "v")
      .orderBy("v").collect()
    assert(out.length == 2, "distinct (group, value) readout")
    assert(out.head.getAs[Long]("permille") == 0L) // min-rank ties
  }

  test("singleChangepoint: planted level shift is localized exactly") {
    import spark.implicits._
    // 10 at t=1..6, 50 at t=7..12: best split after t=6 with zero residual
    val df = (1 to 12).map(i => ("k", i, if (i <= 6) 10L else 50L))
      .toDF("k", "i", "v")
    val r = Features.singleChangepoint(df, Seq("k"), "i", "v").collect().head
    assert(r.getAs[Long]("split_t") == 6L)
    assert(r.getAs[Int]("split_ord") == 6)
    assert(r.getAs[Long]("cost_e4") == 0L)
    // total SSE = 12 * var = sum((y-30)^2) = 12*400 = 4800 -> gain = 4800e4
    assert(r.getAs[Long]("total_cost_e4") == 48000000L)
    assert(r.getAs[Long]("gain_e4") == 48000000L)
  }

  test("singleChangepoint: constant series ties break to the earliest split") {
    import spark.implicits._
    val df = (1 to 8).map(i => ("k", i, 7L)).toDF("k", "i", "v")
    val r = Features.singleChangepoint(df, Seq("k"), "i", "v").collect().head
    assert(r.getAs[Long]("split_t") == 1L && r.getAs[Long]("gain_e4") == 0L)
    // short series (< 4 points) emit nothing
    val short = (1 to 3).map(i => ("s", i, i.toLong)).toDF("k", "i", "v")
    assert(Features.singleChangepoint(short, Seq("k"), "i", "v").count() == 0L)
  }
}
