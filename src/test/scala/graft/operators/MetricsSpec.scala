package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("groupedAuc: hand-computed midrank U with ties") {
    // group g: pos scores {3, 2}, neg scores {1, 2}
    // U = (3>1) + (3>2) + (2>1) + (2=2 tie 0.5) = 3.5 -> AUC = 0.875
    val df = Seq(
      ("g", 3L, true), ("g", 2L, true), ("g", 1L, false), ("g", 2L, false)
    ).toDF("grp", "score", "label")
    val r = Metrics.groupedAuc(df, Seq("grp"), "score", "label").collect().head
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("auc_e6") == 875000L)
  }

  test("groupedAuc: perfect and inverted rankings hit the endpoints") {
    val perfect = Seq(("g", 10L, true), ("g", 9L, true), ("g", 1L, false))
      .toDF("grp", "score", "label")
    assert(Metrics.groupedAuc(perfect, Seq("grp"), "score", "label")
      .collect().head.getAs[Long]("auc_e6") == 1000000L)
    val inverted = Seq(("g", 1L, true), ("g", 9L, false), ("g", 10L, false))
      .toDF("grp", "score", "label")
    assert(Metrics.groupedAuc(inverted, Seq("grp"), "score", "label")
      .collect().head.getAs[Long]("auc_e6") == 0L)
  }

  test("groupedAuc: single-class groups emit null, not a fake endpoint") {
    val df = Seq(("g", 1L, true), ("g", 2L, true), ("h", 1L, false))
      .toDF("grp", "score", "label")
    val out = Metrics.groupedAuc(df, Seq("grp"), "score", "label")
      .orderBy("grp").collect()
    assert(out.forall(_.isNullAt(out.head.fieldIndex("auc_e6"))))
  }

  test("ksDrift: hand-computed two-sample D against the complement") {
    // group a: {1, 2}; group b: {3, 4} -> D(a vs b) = 1.0 at x = 2
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "v")
    val out = Metrics.ksDrift(df, "g", "v").orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("n_rest"),
        r.getAs[Long]("ks_e6")))
    assert(out.toSeq == Seq(("a", 2L, 2L, 1000000L), ("b", 2L, 2L, 1000000L)))
  }

  test("ksDrift: identical distributions score 0") {
    val df = (Seq("a", "b").flatMap(g => Seq(1L, 2L, 3L).map(v => (g, v))))
      .toDF("g", "v")
    val out = Metrics.ksDrift(df, "g", "v").collect()
      .map(_.getAs[Long]("ks_e6"))
    assert(out.forall(_ == 0L))
  }

  test("ksDrift: partial shift lands at the exact rational D") {
    // a: {1, 2, 3}; rest: {2, 3, 4}. At x=1: |1*3 - 0*3| = 3;
    // x=2: |2*3-1*3|=3; x=3: |3*3-2*3|=3 -> D = 3/9 = 1/3
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val a = Metrics.ksDrift(df, "g", "v").filter(col("g") === "a")
      .collect().head
    assert(a.getAs[Long]("ks_e6") == 333333L)
  }

  test("lagForecastMase: hand-computed errors over the common support") {
    // series 10, 20, 10, 20, 10, 20 with season 2: seasonal-naive is
    // PERFECT (err 0); naive err = 10 per step
    val df = (1L to 6L).map(t => ("a", t, if (t % 2 == 1) 10L else 20L))
      .toDF("k", "t", "v")
    val r = Metrics.lagForecastMase(df, Seq("k"), "t", "v",
      forecastLag = 2, baselineLag = 1).collect().head
    assert(r.getAs[Long]("n_eval") == 4L)
    assert(r.getAs[Long]("err_forecast") == 0L)
    assert(r.getAs[Long]("err_baseline") == 40L)
    assert(r.getAs[Long]("mase_e6") == 0L)
  }

  test("lagForecastMase: constant series has zero baseline -> null mase") {
    val df = (1L to 5L).map(t => ("a", t, 7L)).toDF("k", "t", "v")
    val r = Metrics.lagForecastMase(df, Seq("k"), "t", "v", forecastLag = 2)
      .collect().head
    assert(r.isNullAt(r.fieldIndex("mase_e6")))
  }

  test("lagForecastMase: trend favors the naive baseline (mase > 1e6)") {
    val df = (1L to 10L).map(t => ("a", t, t * 100)).toDF("k", "t", "v")
    val r = Metrics.lagForecastMase(df, Seq("k"), "t", "v", forecastLag = 4)
      .collect().head
    // errors: forecast 400/step, baseline 100/step -> mase = 4e6
    assert(r.getAs[Long]("mase_e6") == 4000000L)
  }

  test("psiDrift: hand-computed smoothed terms, clamped bins") {
    // 2 bins (width 10): a = {5, 5} -> bin 0 x2; b = {15, 25} -> bin 1 x2
    // (25 clamps into bin 1). pa0=(2+1)/4, pb0=(0+1)/4; pa1=1/4, pb1=3/4
    val df = Seq(("a", 5L), ("a", 5L), ("b", 15L), ("b", 25L)).toDF("g", "v")
    val out = Metrics.psiDrift(df, "g", "v", binWidth = 10L, nBins = 2)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("n_rest"),
        r.getAs[Long]("psi_e9")))
    def term(pa: Double, pb: Double): Long =
      math.floor((pa - pb) * math.log(pa / pb) * 1e9 + 0.5).toLong
    val expected = term(3.0 / 4, 1.0 / 4) + term(1.0 / 4, 3.0 / 4)
    assert(out.toSeq == Seq(("a", 2L, 2L, expected), ("b", 2L, 2L, expected)))
    assert(expected > 0L, "opposite shifts must accumulate, not cancel")
  }

  test("psiDrift: identical distributions score 0 exactly") {
    val df = Seq("a", "b").flatMap(g => Seq(1L, 15L, 22L).map(v => (g, v)))
      .toDF("g", "v")
    val out = Metrics.psiDrift(df, "g", "v", binWidth = 10L, nBins = 3)
      .collect().map(_.getAs[Long]("psi_e9"))
    assert(out.forall(_ == 0L))
  }

  test("groupedAuc: null scores and labels are excluded") {
    val df = Seq[(String, Option[Long], Option[Boolean])](
      ("g", Some(3L), Some(true)), ("g", None, Some(false)),
      ("g", Some(1L), None), ("g", Some(1L), Some(false))
    ).toDF("grp", "score", "label")
    val r = Metrics.groupedAuc(df, Seq("grp"), "score", "label").collect().head
    assert(r.getAs[Long]("n_pos") == 1L && r.getAs[Long]("n_neg") == 1L)
    assert(r.getAs[Long]("auc_e6") == 1000000L)
  }

  test("averagePrecision: hand-computed ranking with tie-break") {
    // ranking by score desc, id asc: (id2,s=5,+), (id1,s=3,+), (id3,s=3,-), (id4,s=1,+)
    // AP = (1/3)(1/1 + 2/2 + 3/4) = 11/12
    val df = Seq(
      ("g", 1L, 3L, true), ("g", 2L, 5L, true), ("g", 3L, 3L, false), ("g", 4L, 1L, true)
    ).toDF("grp", "id", "score", "label")
    val r = Metrics.averagePrecision(df, Seq("grp"), "score", "label", "id")
      .collect().head
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_pos") == 3L)
    // (1e9 + 1e9 + 750000000) / 3 = 916666666
    assert(r.getAs[Long]("ap_e9") == 916666666L)
  }

  test("averagePrecision: all-positive group is exactly 1, no-positive group null") {
    val df = Seq(("a", 1L, 2L, true), ("a", 2L, 1L, true), ("b", 3L, 9L, false))
      .toDF("grp", "id", "score", "label")
    val m = Metrics.averagePrecision(df, Seq("grp"), "score", "label", "id")
      .collect().map(r => r.getString(0) -> Option(r.getAs[Long]("ap_e9"))).toMap
    assert(m("a").contains(1000000000L))
    val bRow = Metrics.averagePrecision(df, Seq("grp"), "score", "label", "id")
      .filter(col("grp") === "b").collect().head
    assert(bRow.isNullAt(bRow.fieldIndex("ap_e9")))
  }

  test("calibrationBins: exact integer bin readouts") {
    // scores 50000 (bin 0), 950000 & 1000000 (bin 9)
    val df = Seq((50000L, false), (950000L, true), (1000000L, true))
      .toDF("score_e6", "label")
    val m = Metrics.calibrationBins(df, "score_e6", "label", nBins = 10)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(m(0L).getAs[Long]("n") == 1L && m(0L).getAs[Long]("obs_rate_e6") == 0L)
    val b9 = m(9L)
    assert(b9.getAs[Long]("n") == 2L && b9.getAs[Long]("n_pos") == 2L)
    assert(b9.getAs[Long]("mean_score_e6") == 975000L)
    assert(b9.getAs[Long]("obs_rate_e6") == 1000000L)
    assert(b9.getAs[Long]("gap_e6") == 25000L)
    assert(b9.getAs[Long]("ece_num_e6") == 50000L)
  }

  test("welchTTest: equal-variance symmetric case matches the closed form") {
    // A = {10, 20}, B = {10, 20} -> t = 0, df = 2 (Welch reduces to 2(n-1))
    val df = Seq(("k", "A", 10L), ("k", "A", 20L), ("k", "B", 10L), ("k", "B", 20L))
      .toDF("key", "grp", "v")
    val r = Metrics.welchTTest(df, Seq("key"), "grp", "v", "A", "B").collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("mean_a_e2") == 1500L)
    assert(r.getAs[Long]("t_e4") == 0L)
    assert(r.getAs[Long]("df_e4") == 20000L)
  }

  test("welchTTest: empty keyCols runs ONE global (ungrouped) test") {
    val df = Seq(("A", 10L), ("A", 20L), ("B", 10L), ("B", 20L))
      .toDF("grp", "v")
    val rows = Metrics.welchTTest(df, Nil, "grp", "v", "A", "B").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("t_e4") == 0L)
    assert(rows.head.getAs[Long]("df_e4") == 20000L)
  }

  test("welchTTest: non-integer value column truncates BOTH moments consistently") {
    // doubles 10.9/20.9: both Σx and Σx² must see the bigint-truncated
    // 10/20 (a decimal*double Σx² would see 118.81/436.81 instead)
    val df = Seq(("k", "A", 10.9), ("k", "A", 20.9),
      ("k", "B", 10.9), ("k", "B", 20.9)).toDF("key", "grp", "v")
    val r = Metrics.welchTTest(df, Seq("key"), "grp", "v", "A", "B").collect().head
    assert(r.getAs[Long]("mean_a_e2") == 1500L)
    assert(r.getAs[Long]("t_e4") == 0L)
    assert(r.getAs[Long]("df_e4") == 20000L)
  }

  test("welchTTest: degenerate sides emit null t") {
    val df = Seq(("k", "A", 5L), ("k", "B", 1L), ("k", "B", 2L))
      .toDF("key", "grp", "v") // n_a = 1
    val r = Metrics.welchTTest(df, Seq("key"), "grp", "v", "A", "B").collect().head
    assert(r.isNullAt(r.fieldIndex("t_e4")) && r.isNullAt(r.fieldIndex("df_e4")))
    val cdf = Seq(("k", "A", 5L), ("k", "A", 5L), ("k", "B", 5L), ("k", "B", 5L))
      .toDF("key", "grp", "v") // both variances 0 -> se2 = 0
    val cr = Metrics.welchTTest(cdf, Seq("key"), "grp", "v", "A", "B").collect().head
    assert(cr.isNullAt(cr.fieldIndex("t_e4")))
  }

  test("cohenKappa: perfect agreement is 1e6, independence-planted is 0") {
    val perfect = Seq(("k", "x", "x"), ("k", "y", "y"), ("k", "x", "x"))
      .toDF("key", "a", "b")
    val pr = Metrics.cohenKappa(perfect, Seq("key"), "a", "b").collect().head
    assert(pr.getAs[Long]("po_e6") == 1000000L && pr.getAs[Long]("kappa_e6") == 1000000L)
    // 2x2 exact independence: every (a, b) cell equally filled
    val indep = Seq(("k", "x", "x"), ("k", "x", "y"), ("k", "y", "x"), ("k", "y", "y"))
      .toDF("key", "a", "b")
    val ir = Metrics.cohenKappa(indep, Seq("key"), "a", "b").collect().head
    assert(ir.getAs[Long]("pe_e6") == 500000L && ir.getAs[Long]("kappa_e6") == 0L)
  }

  test("brierDecomposition: hand-computed two-bin case") {
    // bin 0: scores 0 with labels (F, F); bin 9: scores 1e6 with labels (T, T)
    // perfect hard classifier: brier = 0, reliability = 0,
    // obar = 500000 -> uncertainty = 250000, resolution = 250000
    val df = Seq((0L, false), (0L, false), (1000000L, true), (1000000L, true))
      .toDF("score_e6", "label")
    val r = Metrics.brierDecomposition(df, "score_e6", "label").collect().head
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_pos") == 2L)
    assert(r.getAs[Long]("brier_e6") == 0L)
    assert(r.getAs[Long]("reliability_e6") == 0L)
    assert(r.getAs[Long]("resolution_e6") == 250000L)
    assert(r.getAs[Long]("uncertainty_e6") == 250000L)
  }

  test("brierDecomposition: constant half-score is pure reliability + uncertainty") {
    // all scores 500000, labels all false: brier = 0.25, obar = 0
    // reliability = (500000-0)^2/1e6 = 250000, resolution = 0, uncertainty = 0
    val df = Seq((500000L, false), (500000L, false)).toDF("score_e6", "label")
    val r = Metrics.brierDecomposition(df, "score_e6", "label").collect().head
    assert(r.getAs[Long]("brier_e6") == 250000L)
    assert(r.getAs[Long]("reliability_e6") == 250000L)
    assert(r.getAs[Long]("resolution_e6") == 0L)
    assert(r.getAs[Long]("uncertainty_e6") == 0L)
  }

  test("cohenKappa: constant raters (pe = 1) emit null kappa") {
    val df = Seq(("k", "x", "x"), ("k", "x", "x")).toDF("key", "a", "b")
    val r = Metrics.cohenKappa(df, Seq("key"), "a", "b").collect().head
    assert(r.isNullAt(r.fieldIndex("kappa_e6")))
  }

  test("cohenKappa: disjoint rater label sets emit kappa 0, not a dropped key") {
    // total disagreement: rater a says only 'x', rater b only 'y' — the
    // marginal join is empty (no shared class), rc = 0, kappa = 0
    val df = Seq(("k", "x", "y"), ("k", "x", "y"), ("k", "x", "y"))
      .toDF("key", "a", "b")
    val out = Metrics.cohenKappa(df, Seq("key"), "a", "b").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("po_e6") == 0L && r.getAs[Long]("pe_e6") == 0L)
    assert(r.getAs[Long]("kappa_e6") == 0L)
  }

  test("cuped: perfect covariate gives theta = slope and full variance reduction") {
    // y = 3x exactly: theta = 3, rho^2 = 1
    val df = Seq(("k", 1L, 3L), ("k", 2L, 6L), ("k", 4L, 12L), ("k", 7L, 21L))
      .toDF("key", "x", "y")
    val r = Metrics.cuped(df, Seq("key"), "x", "y").collect().head
    assert(r.getAs[Long]("theta_e6") == 3000000L)
    assert(r.getAs[Long]("var_reduction_e6") == 1000000L)
    // constant covariate: var(x) = 0 -> nulls
    val const = Seq(("k", 5L, 1L), ("k", 5L, 9L)).toDF("key", "x", "y")
    val cr = Metrics.cuped(const, Seq("key"), "x", "y").collect().head
    assert(cr.isNullAt(cr.fieldIndex("theta_e6")))
  }

  test("liftTable: hand-computed two-tile table") {
    // scores 4,3 positive; 2,1 negative; 2 tiles -> top tile captures all
    val df = Seq((4L, true), (3L, true), (2L, false), (1L, false))
      .toDF("s", "y")
    val out = Metrics.liftTable(df, "s", "y", nTiles = 2).orderBy("tile").collect()
    assert(out.map(_.getAs[Long]("tile")).toSeq == Seq(0L, 1L))
    val t0 = out(0)
    assert(t0.getAs[Long]("n") == 2L && t0.getAs[Long]("n_pos") == 2L)
    assert(t0.getAs[Long]("resp_rate_e6") == 1000000L)
    // base rate 1/2 -> top-tile cumulative lift = 2.0
    assert(t0.getAs[Long]("cum_lift_e6") == 2000000L)
    val t1 = out(1)
    assert(t1.getAs[Long]("cum_n") == 4L && t1.getAs[Long]("cum_pos") == 2L)
    assert(t1.getAs[Long]("cum_lift_e6") == 1000000L)
  }

  test("isotonicCalibration: pools the violating bin pair to their weighted mean") {
    // bins: 0 -> rate 0/2; 4 -> rate 2/2 (=1); 9 -> rate 1/2
    // violation between bin 4 (1.0) and bin 9 (0.5): PAV pools them to
    // (2+1)/(2+2) = 0.75; bin 0 stays at 0
    val df = Seq(
      (50000L, false), (50000L, false),
      (450000L, true), (450000L, true),
      (950000L, true), (950000L, false)).toDF("score_e6", "label")
    val out = Metrics.isotonicCalibration(df, "score_e6", "label")
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 4L, 9L))
    assert(out.map(_.getAs[Long]("iso_e9")).toSeq ==
      Seq(0L, 750000000L, 750000000L))
    // monotone nondecreasing by construction
    val iso = out.map(_.getAs[Long]("iso_e9"))
    assert(iso.zip(iso.tail).forall { case (a, b) => b >= a })
  }

  test("isotonicCalibration: already-monotone rates are reproduced exactly") {
    val df = Seq((50000L, false), (450000L, true), (450000L, false),
      (950000L, true)).toDF("score_e6", "label")
    val out = Metrics.isotonicCalibration(df, "score_e6", "label")
      .orderBy("bin").collect()
    // rates 0, 1/2, 1 are already isotonic -> iso = raw (e9 scale)
    assert(out.map(_.getAs[Long]("iso_e9")).toSeq ==
      Seq(0L, 500000000L, 1000000000L))
  }

  test("anovaOneWay: hand-computed F under the documented floor convention") {
    // A = {1,2,3}, B = {4,5,6}: st = 12 + 75 = 87, floor(21^2/6) = 73
    // -> ssb = 14 (analytic 13.5 under the floor convention), ssw = 4,
    // F = (14/1)/(4/4) = 14
    val df = Seq(("k", "A", 1L), ("k", "A", 2L), ("k", "A", 3L),
      ("k", "B", 4L), ("k", "B", 5L), ("k", "B", 6L)).toDF("k", "g", "v")
    val r = Metrics.anovaOneWay(df, Seq("k"), "g", "v").collect().head
    assert(r.getAs[Long]("k_groups") == 2L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("ssb") == 14L && r.getAs[Long]("ssw") == 4L)
    assert(r.getAs[Long]("f_e4") == 140000L)
    assert(r.getAs[Long]("eta2_e6") == 14L * 1000000L / 18L)
    // identical groups -> ssb clamps to 0 -> F = 0
    val same = Seq(("s", "A", 1L), ("s", "A", 2L), ("s", "A", 3L),
      ("s", "B", 1L), ("s", "B", 2L), ("s", "B", 3L)).toDF("k", "g", "v")
    val rs = Metrics.anovaOneWay(same, Seq("k"), "g", "v").collect().head
    assert(rs.getAs[Long]("ssb") == 0L && rs.getAs[Long]("f_e4") == 0L)
    // one group only -> F null
    val one = Seq(("o", "A", 1L), ("o", "A", 5L)).toDF("k", "g", "v")
    val ro = Metrics.anovaOneWay(one, Seq("k"), "g", "v").collect().head
    assert(ro.get(ro.fieldIndex("f_e4")) == null)
  }

  test("cochranQ: hand-computed three-classifier Q; all-agree null; null rows drop") {
    // items (a,b,c): (T,T,F),(T,F,F),(T,T,T),(F,F,F)
    // C=(3,2,1), T=6, sumR2=14 -> num = 3*14-36 = 6, den = 18-14 = 4,
    // Q = 2*6/4 = 3.0
    val df = Seq(
      ("k", true, true, false), ("k", true, false, false),
      ("k", true, true, true), ("k", false, false, false),
      ("z", true, true, true), ("z", false, false, false))
      .toDF("k", "a", "b", "c")
    val out = Metrics.cochranQ(df, Seq("k"), Seq("a", "b", "c"))
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("k").getAs[Long]("q_e4") == 30000L)
    assert(!out("k").getAs[Boolean]("significant"))
    // z: every item unanimous -> denominator 0 -> null
    val z = out("z")
    assert(z.get(z.fieldIndex("q_e4")) == null)
    // null votes drop the item (paired contract)
    val withNull = Seq(("n", Some(true), Some(true), Some(false)),
      ("n", Some(true), None, Some(false))).toDF("k", "a", "b", "c")
    assert(Metrics.cochranQ(withNull, Seq("k"), Seq("a", "b", "c"))
      .collect().head.getAs[Long]("n_items") == 1L)
  }

  test("dispersionIndex: constant counts D=0, bursty counts flag, Poisson-ish do not") {
    // constant 5s: s^2 = 0 -> D = 0
    val const = (1 to 10).map(_ => ("c", 5L))
    // bursty: {0,0,0,0,20}: mean 4, n*Sq - S^2 = 5*400 - 400 = 1600,
    // chi2 = 1600/20 = 80 >> (4 + 1.645*sqrt(8)) -> overdispersed
    val burst = Seq(("b", 0L), ("b", 0L), ("b", 0L), ("b", 0L), ("b", 20L))
    val out = Metrics.dispersionIndex((const ++ burst).toDF("k", "c"),
      Seq("k"), "c").collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("c").getAs[Long]("d_e4") == 0L)
    assert(!out("c").getAs[Boolean]("overdispersed"))
    val b = out("b")
    assert(b.getAs[Long]("chi2_e4") == 800000L)
    assert(b.getAs[Long]("d_e4") == 200000L) // D = 80/4 = 20
    assert(b.getAs[Boolean]("overdispersed"))
    assert(b.getAs[Long]("mean_e6") == 4000000L)
  }

  test("sprtBernoulli: crossing indices match the hand-computed Wald walk") {
    // p0=.5, p1=.8, alpha=beta=50 permille: U = ln 19 = 2.9444,
    // L1 = ln 1.6 = .4700 -> all-success crossing at ceil(2.9444/.47)=7;
    // L0 = ln .4 = -.9163 -> all-failure h0 crossing at t=4;
    // alternating 3 pairs: LLR = 3(.47-.9163) = -1.34, no crossing
    val rows =
      (1 to 10).map(t => ("up", t.toLong, true)) ++
      (1 to 10).map(t => ("dn", t.toLong, false)) ++
      (1 to 6).map(t => ("mid", t.toLong, t % 2 == 1))
    val out = Metrics.sprtBernoulli(rows.toDF("k", "t", "s"), Seq("k"), "t", "s",
        p0 = 0.5, p1 = 0.8, alphaPermille = 50, betaPermille = 50)
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("up").getAs[String]("decision") == "accept_h1")
    assert(out("up").getAs[Long]("n_decision") == 7L)
    assert(out("dn").getAs[String]("decision") == "accept_h0")
    assert(out("dn").getAs[Long]("n_decision") == 4L)
    val mid = out("mid")
    assert(mid.getAs[String]("decision") == "continue")
    assert(mid.get(mid.fieldIndex("n_decision")) == null)
    // final LLR is the exact integer-linear form a*L1 + b*L0
    val (l1, l0, _, _) = Metrics.sprtConstantsE12(0.5, 0.8, 50, 50)
    assert(mid.getAs[Long]("llr_final_e12") == 3 * l1 + 3 * l0)
  }

  test("wilsonCi: hand-computed interval; zero successes stay honest; bounds bracket the rate") {
    // n=10, x=5: center = (.5 + z^2/20)/(1 + z^2/10), rad per formula
    val df = ((1 to 5).map(_ => ("k", true)) ++ (1 to 5).map(_ => ("k", false)) ++
      (1 to 8).map(_ => ("z", false))).toDF("k", "s")
    val out = Metrics.wilsonCi(df, Seq("k"), "s")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val z = 1.96
    val (n, p) = (10.0, 0.5)
    val den = 1.0 + z * z / n
    val ctr = p + z * z / (2 * n)
    val rad = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    val k = out("k")
    assert(k.getAs[Long]("rate_e6") == 500000L)
    assert(k.getAs[Long]("lo_e6") ==
      math.floor((ctr - rad) / den * 1e6 + 0.5).toLong)
    assert(k.getAs[Long]("hi_e6") ==
      math.floor((ctr + rad) / den * 1e6 + 0.5).toLong)
    assert(k.getAs[Long]("lo_e6") < 500000L && k.getAs[Long]("hi_e6") > 500000L)
    // x = 0: Wald would give [0, 0]; Wilson's upper bound stays positive
    val zk = out("z")
    assert(zk.getAs[Long]("lo_e6") == 0L)
    assert(zk.getAs[Long]("hi_e6") > 0L)
  }

  test("effectSize: hand-computed pooled d and Hedges g; equal means zero; tiny side null") {
    // A={0,0,2,2} mean 1, B={1,1,3,3} mean 2, both sample var 4/3
    // sp2 = 4/3, d = -1/sqrt(4/3), g = d*(1 - 3/23)
    val df = (Seq(0L, 0L, 2L, 2L).map(v => ("k", "A", v)) ++
      Seq(1L, 1L, 3L, 3L).map(v => ("k", "B", v))).toDF("k", "g", "v")
    val r = Metrics.effectSize(df, Seq("k"), "g", "v", "A", "B").collect().head
    val d = -1.0 / math.sqrt(4.0 / 3.0)
    assert(r.getAs[Long]("d_e6") == math.floor(d * 1e6 + 0.5).toLong)
    assert(r.getAs[Long]("g_e6") ==
      math.floor(d * (1.0 - 3.0 / 23.0) * 1e6 + 0.5).toLong)
    assert(r.getAs[String]("magnitude") == "large")
    // identical groups: d = 0, negligible
    val same = (Seq(1L, 2L).map(v => ("s", "A", v)) ++
      Seq(1L, 2L).map(v => ("s", "B", v))).toDF("k", "g", "v")
    val rs = Metrics.effectSize(same, Seq("k"), "g", "v", "A", "B").collect().head
    assert(rs.getAs[Long]("d_e6") == 0L)
    assert(rs.getAs[String]("magnitude") == "negligible")
    // n_b = 1: undefined -> nulls
    val tiny = (Seq(1L, 2L).map(v => ("t", "A", v)) :+ ("t", "B", 5L))
      .toDF("k", "g", "v")
    val rt = Metrics.effectSize(tiny, Seq("k"), "g", "v", "A", "B").collect().head
    assert(rt.get(rt.fieldIndex("d_e6")) == null)
    assert(rt.get(rt.fieldIndex("magnitude")) == null)
  }

  test("cramerVonMises: hand-computed pooled-grid statistic; identical groups 0; empty side null") {
    // A={1,2}, B={1,3}: only v=2 contributes (cumA*nb - cumB*na) =
    // 2*2-1*2 = 2, c=1 -> U=4; T = 4/(16*4) = 0.0625
    val df = Seq(("k", "A", 1L), ("k", "A", 2L), ("k", "B", 1L), ("k", "B", 3L))
      .toDF("k", "g", "v")
    val r = Metrics.cramerVonMises(df, Seq("k"), "g", "v", "A", "B")
      .collect().head
    assert(r.getAs[Long]("t_e6") == 62500L)
    assert(!r.getAs[Boolean]("significant"))
    // identical samples: every gap 0
    val same = Seq(("s", "A", 1L), ("s", "A", 2L), ("s", "B", 1L), ("s", "B", 2L))
      .toDF("k", "g", "v")
    assert(Metrics.cramerVonMises(same, Seq("k"), "g", "v", "A", "B")
      .collect().head.getAs[Long]("t_e6") == 0L)
    // disjoint far-apart samples: maximal persistent gap flags
    val far = ((0 until 50).map(i => ("f", "A", i.toLong)) ++
      (0 until 50).map(i => ("f", "B", 1000L + i))).toDF("k", "g", "v")
    val rf = Metrics.cramerVonMises(far, Seq("k"), "g", "v", "A", "B")
      .collect().head
    assert(rf.getAs[Boolean]("significant"), s"t=${rf.getAs[Long]("t_e6")}")
    // one side empty -> null
    val one = Seq(("o", "A", 1L)).toDF("k", "g", "v")
    val ro = Metrics.cramerVonMises(one, Seq("k"), "g", "v", "A", "B")
      .collect().head
    assert(ro.get(ro.fieldIndex("t_e6")) == null)
  }

  test("jarqueBera: symmetric three-point law hand-computed; skewed key flags; constant null") {
    // {-1,0,1}*4: mean 0, m2=2/3, m3=0, m4=2/3 -> skew 0, kurt 1.5,
    // JB = 12/6 * (0 + 2.25/4) = 1.125
    val sym = (0 until 12).map(i => ("sym", (i % 3) - 1L))
    val skw = Seq(("skw", 0L), ("skw", 0L), ("skw", 0L), ("skw", 9L))
    val cst = (0 until 6).map(_ => ("cst", 5L))
    val out = Metrics.jarqueBera((sym ++ skw ++ cst).toDF("k", "v"),
      Seq("k"), "v").collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("sym").getAs[Long]("skew_e6") == 0L)
    assert(out("sym").getAs[Long]("kurt_e6") == 1500000L)
    assert(out("sym").getAs[Long]("jb_e4") == 11250L)
    assert(!out("sym").getAs[Boolean]("significant"))
    // skewed: mirror the exact shifted-sum formula (c = 9 div 4 = 2)
    val (n, s1, s2, s3, s4) = (4.0, 1.0, 61.0, 319.0, 2449.0)
    val mu = s1 / n
    val m2 = s2 / n - mu * mu
    val m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu
    val m4 = s4 / n - 4.0 * mu * (s3 / n) + 6.0 * mu * mu * (s2 / n) -
      3.0 * mu * mu * mu * mu
    val sk = m3 / math.pow(m2, 1.5)
    val ku = m4 / (m2 * m2)
    assert(out("skw").getAs[Long]("skew_e6") ==
      math.floor(sk * 1e6 + 0.5).toLong)
    assert(out("skw").getAs[Long]("kurt_e6") ==
      math.floor(ku * 1e6 + 0.5).toLong)
    // constant key: zero variance -> nulls
    val c = out("cst")
    assert(c.get(c.fieldIndex("jb_e4")) == null)
  }

  test("fisherExact: hand-computed hypergeometric p-values") {
    // tea-tasting table [[3,1],[1,3]]: support k=0..4 with probs
    // (1,16,36,16,1)/70; P(obs=3)=16/70, as-or-less-probable sum = 34/70
    def rows(key: String, n11: Int, n10: Int, n01: Int, n00: Int) =
      Seq.fill(n11)((key, true, true)) ++ Seq.fill(n10)((key, true, false)) ++
        Seq.fill(n01)((key, false, true)) ++ Seq.fill(n00)((key, false, false))
    val df = (rows("tea", 3, 1, 1, 3) ++ rows("skew", 8, 2, 1, 5))
      .toDF("k", "a", "b")
    val out = Metrics.fisherExact(df, Seq("k"), "a", "b")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val tea = out("tea")
    assert(tea.getAs[Long]("n") == 8 && tea.getAs[Long]("r1") == 4 &&
      tea.getAs[Long]("c1") == 4)
    // 34/70 = 0.4857142857... -> e9 485714286
    assert(math.abs(tea.getAs[Long]("p_e9") - 485714286L) <= 2,
      s"tea p=${tea.getAs[Long]("p_e9")}")
    assert(!tea.getAs[Boolean]("significant"))
    // [[8,2],[1,5]]: support k=3..9, probs (120,1260,3780,4200,1800,270,10)
    // /11440; P(obs=8)=270 -> selected 120+270+10=400 -> p=400/11440
    val sk = out("skew")
    assert(math.abs(sk.getAs[Long]("p_e9") - 34965035L) <= 2,
      s"skew p=${sk.getAs[Long]("p_e9")}")
    assert(sk.getAs[Boolean]("significant"))
  }

  test("fisherExact: degenerate margin gives p=1; independence-ish table is insignificant") {
    // c1 = 0: only one table possible -> p = 1 exactly
    val deg = (Seq.fill(5)(("d", true, false)) ++ Seq.fill(5)(("d", false, false)))
      .toDF("k", "a", "b")
    val d = Metrics.fisherExact(deg, Seq("k"), "a", "b").collect().head
    assert(d.getAs[Long]("p_e9") == 1000000000L)
    assert(!d.getAs[Boolean]("significant"))
  }

  test("mcnemar: symmetric disagreement ~0; one-sided disagreement flags; concordant-only null") {
    // b = c = 3 -> chi2 = 0
    val sym = (1 to 3).flatMap(_ => Seq(("s", true, false), ("s", false, true))) :+
      (("s", true, true))
    val rs = Metrics.mcnemar(sym.toDF("k", "a", "b"), Seq("k"), "a", "b")
      .collect().head
    assert(rs.getAs[Long]("chi2_e4") == 0L && !rs.getAs[Boolean]("significant"))
    // b = 10, c = 0 -> chi2 = 100/10 = 10 > 3.8415
    val one = (1 to 10).map(_ => ("o", true, false)) :+ (("o", true, true))
    val ro = Metrics.mcnemar(one.toDF("k", "a", "b"), Seq("k"), "a", "b")
      .collect().head
    assert(ro.getAs[Long]("chi2_e4") == 100000L && ro.getAs[Boolean]("significant"))
    // perfectly concordant -> undefined -> null
    val conc = Seq(("c", true, true), ("c", false, false))
    val rc = Metrics.mcnemar(conc.toDF("k", "a", "b"), Seq("k"), "a", "b")
      .collect().head
    assert(rc.get(rc.fieldIndex("chi2_e4")) == null)
  }

  test("cochranArmitage: a clean dose-response is positive-significant; flat is ~0") {
    // doses 0,1,2 with rates 0/10, 5/10, 10/10 -> strong upward trend
    val rising = (1 to 10).flatMap(i => Seq(
      ("r", 0L, false),
      ("r", 1L, i <= 5),
      ("r", 2L, true)))
    val rr = Metrics.cochranArmitage(rising.toDF("k", "w", "s"),
      Seq("k"), "w", "s").collect().head
    assert(rr.getAs[Boolean]("significant") && rr.getAs[Long]("z_e4") > 0,
      s"z=${rr.getAs[Long]("z_e4")}")
    // identical rate at every dose -> z = 0 exactly
    val flat = (1 to 10).flatMap(i => Seq(
      ("f", 0L, i <= 5), ("f", 1L, i <= 5), ("f", 2L, i <= 5)))
    val rf = Metrics.cochranArmitage(flat.toDF("k", "w", "s"),
      Seq("k"), "w", "s").collect().head
    assert(rf.getAs[Long]("z_e4") == 0L)
    // constant dose -> zero variance -> null
    val const = Seq(("c", 1L, true), ("c", 1L, false))
    val rc = Metrics.cochranArmitage(const.toDF("k", "w", "s"),
      Seq("k"), "w", "s").collect().head
    assert(rc.get(rc.fieldIndex("z_e4")) == null)
  }

  test("brownForsythe: equal spreads score ~0; a wide group is flagged; lower median") {
    // A and B same spread around different centers: deviations identical
    // -> BF = 0 exactly (ssb clamps at 0 after the floor)
    val same = Seq(("k", "A", 10L), ("k", "A", 12L), ("k", "A", 14L),
      ("k", "B", 100L), ("k", "B", 102L), ("k", "B", 104L)).toDF("k", "g", "v")
    val r = Metrics.brownForsythe(same, Seq("k"), "g", "v").collect().head
    assert(r.getAs[Long]("bf_e4") == 0L)
    // B spreads 10x wider: deviations {0,2,2} vs {0,20,20} -> large BF
    val wide = Seq(("w", "A", 10L), ("w", "A", 12L), ("w", "A", 14L),
      ("w", "B", 100L), ("w", "B", 120L), ("w", "B", 140L)).toDF("k", "g", "v")
    val rw = Metrics.brownForsythe(wide, Seq("k"), "g", "v").collect().head
    assert(rw.getAs[Long]("bf_e4") > rw.getAs[Long]("ssw"), // strong signal
      s"bf=${rw.getAs[Long]("bf_e4")}")
    // even-count group uses the LOWER median: {1, 3} -> median 1
    val even = Seq(("e", "A", 1L), ("e", "A", 3L), ("e", "B", 1L), ("e", "B", 1L))
      .toDF("k", "g", "v")
    val re = Metrics.brownForsythe(even, Seq("k"), "g", "v").collect().head
    // A deviations from lower median 1: {0, 2}; B: {0, 0}
    // -> st = floor(4/2) = 2, floor(S^2/n) = floor(4/4) = 1:
    // ssb = 1, ssw = 2 (matches the analytic decomposition exactly here)
    assert(re.getAs[Long]("n") == 4L)
    assert(re.getAs[Long]("ssb") == 1L && re.getAs[Long]("ssw") == 2L)
  }

  test("kruskalWallis: hand-computed H, tie-degenerate null, separation significant") {
    // A = {1,2}, B = {3,4}: ranks 1..4, R_A = 3, R_B = 7
    // H = 12/20 * (9/2 + 49/2) - 15 = 2.4 (exact under the floor too)
    val df = Seq(("k", "A", 1L), ("k", "A", 2L), ("k", "B", 3L), ("k", "B", 4L))
      .toDF("k", "g", "v")
    val r = Metrics.kruskalWallis(df, Seq("k"), "g", "v").collect().head
    assert(r.getAs[Long]("h_e4") == 24000L)
    assert(r.getAs[Long]("hc_e4") == 24000L) // no ties: correction = 1
    assert(!r.getAs[Boolean]("significant"))
    // all values tied -> T = n^3 - n -> null corrected H
    val tied = Seq(("t", "A", 5L), ("t", "B", 5L), ("t", "C", 5L)).toDF("k", "g", "v")
    val rt = Metrics.kruskalWallis(tied, Seq("k"), "g", "v").collect().head
    assert(rt.get(rt.fieldIndex("hc_e4")) == null)
    // three cleanly separated groups at n = 30 blow past the df=2 critical
    val sep = ((1 to 10).map(i => ("s", "A", i.toLong)) ++
      (11 to 20).map(i => ("s", "B", i.toLong)) ++
      (21 to 30).map(i => ("s", "C", i.toLong))).toDF("k", "g", "v")
    val rs = Metrics.kruskalWallis(sep, Seq("k"), "g", "v", crit5E4 = 59915L)
      .collect().head
    assert(rs.getAs[Boolean]("significant"),
      s"hc=${rs.getAs[Long]("hc_e4")}")
  }

  test("jonckheereTerpstra: brute-force 2J law, monotone trend significant, flat not") {
    // 2J must equal the double-looped pair count: 2·#{x<y} + #{x=y}
    // over every ordered group pair — checked against a mixed tie-heavy
    // fixture; then a clean monotone trend reads significant while an
    // order-free shuffle of the same values does not
    val data = Seq(("k", "a", 1L), ("k", "a", 2L), ("k", "a", 2L),
      ("k", "b", 2L), ("k", "b", 3L), ("k", "c", 3L), ("k", "c", 5L),
      ("k", "c", 1L))
    val groups = data.map(_._2).distinct.sorted
    var expected = 0L
    for (gi <- groups.indices; hi <- gi + 1 until groups.length) {
      val xs = data.filter(_._2 == groups(gi)).map(_._3)
      val ys = data.filter(_._2 == groups(hi)).map(_._3)
      for (x <- xs; y <- ys) {
        if (x < y) expected += 2L else if (x == y) expected += 1L
      }
    }
    val r = Metrics.jonckheereTerpstra(data.toDF("k", "g", "v"),
      Seq("k"), "g", "v").collect().head
    assert(r.getAs[Long]("j2") == expected, s"j2=${r.getAs[Long]("j2")} vs $expected")
    assert(r.getAs[Long]("k_groups") == 3L && r.getAs[Long]("n") == 8L)
    // monotone: values strictly rise with group order -> large positive z
    val mono = ((1 to 10).map(i => ("m", "a", i.toLong)) ++
      (11 to 20).map(i => ("m", "b", i.toLong)) ++
      (21 to 30).map(i => ("m", "c", i.toLong))).toDF("k", "g", "v")
    val rm = Metrics.jonckheereTerpstra(mono, Seq("k"), "g", "v").collect().head
    assert(rm.getAs[Boolean]("significant") && rm.getAs[Long]("z_e4") > 19600L)
    // same values dealt round-robin across groups: no order signal
    val flat = (1 to 30).map(i =>
      ("f", Seq("a", "b", "c")(i % 3), i.toLong)).toDF("k", "g", "v")
    val rf = Metrics.jonckheereTerpstra(flat, Seq("k"), "g", "v").collect().head
    assert(!rf.getAs[Boolean]("significant"), s"z=${rf.getAs[Long]("z_e4")}")
    // degenerate: single tie class -> zero variance -> null z
    val tied = Seq(("t", "a", 7L), ("t", "b", 7L), ("t", "c", 7L)).toDF("k", "g", "v")
    val rt = Metrics.jonckheereTerpstra(tied, Seq("k"), "g", "v").collect().head
    assert(rt.get(rt.fieldIndex("z_e4")) == null)
  }

  test("mannWhitney: hand-computed midranks and tie-corrected z; degenerate nulls") {
    // A = {1, 3}, B = {2, 3}: midranks 1, 2, 3.5/3.5 -> 2U_a = 3,
    // T = 6, var = 1.5, z = -1/(2*sqrt(1.5)) ~ -0.4082
    val df = Seq(("k", "A", 1L), ("k", "A", 3L), ("k", "B", 2L), ("k", "B", 3L))
      .toDF("k", "g", "v")
    val r = Metrics.mannWhitney(df, Seq("k"), "g", "v", "A", "B").collect().head
    assert(r.getAs[Long]("u_x2") == 3L)
    assert(r.getAs[Long]("z_e4") == -4082L)
    assert(!r.getAs[Boolean]("significant"))
    // swapping the sides negates 2U - n_a*n_b symmetrically
    val rSwap = Metrics.mannWhitney(df, Seq("k"), "g", "v", "B", "A").collect().head
    assert(rSwap.getAs[Long]("z_e4") == 4082L)
    // all values tied -> zero variance -> null z and verdict
    val tied = Seq(("t", "A", 5L), ("t", "A", 5L), ("t", "B", 5L)).toDF("k", "g", "v")
    val rt = Metrics.mannWhitney(tied, Seq("k"), "g", "v", "A", "B").collect().head
    assert(rt.get(rt.fieldIndex("z_e4")) == null)
    assert(rt.get(rt.fieldIndex("significant")) == null)
    // a clean separation at modest n is significant
    val sep = ((1 to 12).map(i => ("s", "A", i.toLong)) ++
      (13 to 24).map(i => ("s", "B", i.toLong))).toDF("k", "g", "v")
    val rs = Metrics.mannWhitney(sep, Seq("k"), "g", "v", "A", "B").collect().head
    assert(rs.getAs[Long]("u_x2") == 0L) // A entirely below B
    assert(rs.getAs[Boolean]("significant"))
  }

  test("bhCorrect: textbook step-up — a failing middle rank is rescued by a later pass") {
    // p = .001, .040, .050 at q = .05, m = 3: thresholds .0167/.0333/.05 —
    // rank 2 fails ITS threshold but rank 3 passes, so step-up rejects ALL
    val df = Seq(("h1", 1000000L), ("h2", 40000000L), ("h3", 50000000L))
      .toDF("h", "p_e9")
    val out = Metrics.bhCorrect(df, "p_e9", qPermille = 50, tieCols = Seq("h"))
      .collect().map(r => r.getAs[String]("h") ->
        (r.getAs[Int]("rank"), r.getAs[Boolean]("rejected"))).toMap
    assert(out == Map("h1" -> (1, true), "h2" -> (2, true), "h3" -> (3, true)))
    // and with an un-rescuable tail: only the passing prefix rejects
    val df2 = Seq(("a", 10000000L), ("b", 20000000L), ("c", 30000000L),
      ("d", 500000000L)).toDF("h", "p_e9")
    val out2 = Metrics.bhCorrect(df2, "p_e9", 50, Seq("h"))
      .collect().map(r => r.getAs[String]("h") -> r.getAs[Boolean]("rejected")).toMap
    assert(out2 == Map("a" -> true, "b" -> true, "c" -> true, "d" -> false))
    // nothing passes -> nothing rejected (kmax null path)
    val none = Metrics.bhCorrect(Seq(("z", 900000000L)).toDF("h", "p_e9"),
      "p_e9", 50, Seq("h")).collect().head
    assert(!none.getAs[Boolean]("rejected"))
  }

  test("fleissKappa: perfect agreement scores 1; hand-computed mixed case; degenerate null") {
    // perfect: each item unanimous, two categories across items
    val perfect = Seq.tabulate(4, 3)((i, _) => ("p", s"i$i", if (i < 2) "a" else "b"))
      .flatten
    val out = Metrics.fleissKappa(perfect.toDF("k", "item", "cat"),
      Seq("k"), "item", "cat").collect().head
    assert(out.getAs[Long]("kappa_e6") == 1000000L)
    assert(out.getAs[Long]("n_items") == 4L && out.getAs[Long]("n_ratings") == 12L)
    // mixed, variable n: i0 = (a,a,b), i1 = (a,b), i2 = (b,b,b,b); i3 = (a) drops
    val mixed = Seq(
      ("m", "i0", "a"), ("m", "i0", "a"), ("m", "i0", "b"),
      ("m", "i1", "a"), ("m", "i1", "b"),
      ("m", "i2", "b"), ("m", "i2", "b"), ("m", "i2", "b"), ("m", "i2", "b"),
      ("m", "i3", "a"))
    val r = Metrics.fleissKappa(mixed.toDF("k", "item", "cat"),
      Seq("k"), "item", "cat").collect().head
    // reference computation with the same quantization
    val pis = Seq((2L * 1 + 0L, 3L * 2), (0L, 2L * 1), (4L * 3, 4L * 3)).map {
      case (agree, den) => math.floor(agree.toDouble / den * 1e9 + 0.5).toLong
    }
    val pbar = pis.sum.toDouble / 1e9 / 3
    // qualifying ratings: a = 2+1 = 3, b = 1+1+4 = 6, total 9
    val pe = (3.0 * 3 + 6.0 * 6) / (9.0 * 9)
    val kExp = math.floor((pbar - pe) / (1.0 - pe) * 1e6 + 0.5).toLong
    assert(r.getAs[Long]("n_items") == 3L && r.getAs[Long]("n_ratings") == 9L)
    assert(r.getAs[Long]("kappa_e6") == kExp,
      s"kappa=${r.getAs[Long]("kappa_e6")} exp=$kExp")
    // one category only -> pe = 1 -> null kappa
    val mono = Seq(("d", "i0", "x"), ("d", "i0", "x"), ("d", "i1", "x"), ("d", "i1", "x"))
    val rd = Metrics.fleissKappa(mono.toDF("k", "item", "cat"),
      Seq("k"), "item", "cat").collect().head
    assert(rd.get(rd.fieldIndex("kappa_e6")) == null)
  }

  test("normalizedMutualInfo: 1 on a bijection, 0 under independence, null degenerate") {
    // bijective: a determines b exactly -> MI = H_a = H_b -> NMI = 1
    val bij = Seq(("k1", "x", 1), ("k1", "y", 2), ("k1", "x", 1), ("k1", "y", 2))
    // independent: all four combos equally likely -> every MI term ln(1)
    val ind = Seq(("k2", "x", 1), ("k2", "x", 2), ("k2", "y", 1), ("k2", "y", 2))
    // degenerate: both columns constant -> H_a = H_b = 0 -> null NMI
    val deg = Seq(("k3", "x", 1), ("k3", "x", 1))
    val out = Metrics.normalizedMutualInfo(
        (bij ++ ind ++ deg).toDF("k", "a", "b"), Seq("k"), "a", "b")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("k1").getAs[Long]("nmi_e6") == 1000000L)
    assert(out("k2").getAs[Long]("mi_e9") == 0L)
    assert(out("k2").getAs[Long]("nmi_e6") == 0L)
    assert(out("k3").get(out("k3").fieldIndex("nmi_e6")) == null)
    assert(out("k1").getAs[Long]("n") == 4L)
  }

  test("normalizedMutualInfo is invariant to relabeling and needs no shared vocabulary") {
    // same partition structure, disjoint label alphabets (kappa's blind spot)
    val a = Seq(("k", "x", 101), ("k", "x", 101), ("k", "y", 202), ("k", "z", 202))
    val out = Metrics.normalizedMutualInfo(a.toDF("k", "a", "b"), Seq("k"), "a", "b")
      .collect().head
    // relabel b arbitrarily: identical NMI
    val b = Seq(("k", "x", 9), ("k", "x", 9), ("k", "y", 7), ("k", "z", 7))
    val out2 = Metrics.normalizedMutualInfo(b.toDF("k", "a", "b"), Seq("k"), "a", "b")
      .collect().head
    assert(out.getAs[Long]("nmi_e6") == out2.getAs[Long]("nmi_e6"))
    // bounded: 0 <= NMI <= 1 (e6)
    val v = out.getAs[Long]("nmi_e6")
    assert(v >= 0L && v <= 1000000L, s"nmi=$v")
  }

  test("chiSquareIndependence: hand-computed 2x2; zero cells contribute; df-0 null") {
    // k: O = [[10,20],[30,40]] -> N=100, R=(30,70), C=(40,60)
    // terms (N*O - R*C)^2/(N*R*C): 1/3, 2/9, 1/7, 2/21 -> e6 quantized
    // 333333 + 222222 + 142857 + 95238 = 793650; df 1, crit 38415
    val k = Seq.fill(10)(("k", "x", "p")) ++ Seq.fill(20)(("k", "x", "q")) ++
      Seq.fill(30)(("k", "y", "p")) ++ Seq.fill(40)(("k", "y", "q"))
    // z: perfect association with EMPTY off-diagonal cells — every cell
    // (observed and zero) contributes 2.5, chi2 = 10 = N. A cells-only
    // sum would read 5.0: this pins the zero-cell contract.
    val z = Seq.fill(5)(("z", "x", "p")) ++ Seq.fill(5)(("z", "y", "q"))
    // o: single a level -> df 0 -> null statistic and verdict
    val o = Seq.fill(4)(("o", "x", "p")) ++ Seq.fill(4)(("o", "x", "q"))
    val out = Metrics.chiSquareIndependence((k ++ z ++ o).toDF("k", "a", "b"),
      Seq("k"), "a", "b").collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("k").getAs[Long]("chi2_e6") == 793650L)
    assert(out("k").getAs[Long]("dof") == 1L)
    assert(out("k").getAs[Long]("crit5_e4") == 38415L)
    assert(!out("k").getAs[Boolean]("significant"))
    assert(out("z").getAs[Long]("chi2_e6") == 10000000L)
    assert(out("z").getAs[Boolean]("significant"))
    val ro = out("o")
    assert(ro.getAs[Long]("r_levels") == 1L && ro.getAs[Long]("dof") == 0L)
    assert(ro.get(ro.fieldIndex("chi2_e6")) == null)
    assert(ro.get(ro.fieldIndex("significant")) == null)
    // null category rows drop (and a null key is not a key)
    val withNull = Seq(("n", Some("x"), Some("p")), ("n", None, Some("q")),
      (null: String, Some("x"), Some("p"))).toDF("k", "a", "b")
    val rn = Metrics.chiSquareIndependence(withNull, Seq("k"), "a", "b").collect()
    assert(rn.length == 1 && rn.head.getAs[Long]("n") == 1L)
  }

  test("histogramDrift: hand-computed EMD shift and Hellinger overlap; empty side null") {
    // k: A = {0,0,10,10}, B = {10,10,20,20} — B is A shifted by 10:
    // EMD = .5*10 + .5*10 = 10 -> 10000000; BC = sqrt(4/16) = .5 ->
    // 500000000; H = sqrt(.5) = 0.7071068 -> 707107
    val k = Seq(("k", "A", 0L), ("k", "A", 0L), ("k", "A", 10L), ("k", "A", 10L),
      ("k", "B", 10L), ("k", "B", 10L), ("k", "B", 20L), ("k", "B", 20L))
    // i: identical sides -> EMD 0, BC exactly 1e9, H clamps to 0
    val i = Seq(("i", "A", 1L), ("i", "A", 1L), ("i", "A", 1L),
      ("i", "B", 1L), ("i", "B", 1L), ("i", "B", 1L))
    // o: one empty side -> null distances
    val o = Seq(("o", "A", 5L), ("o", "A", 6L))
    val out = Metrics.histogramDrift((k ++ i ++ o).toDF("g", "side", "v"),
      Seq("g"), "side", "v", "A", "B")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("k").getAs[Long]("n_a") == 4L && out("k").getAs[Long]("n_b") == 4L)
    assert(out("k").getAs[Long]("emd_e6") == 10000000L)
    assert(out("k").getAs[Long]("bc_e9") == 500000000L)
    assert(out("k").getAs[Long]("hellinger_e6") == 707107L)
    assert(out("i").getAs[Long]("emd_e6") == 0L)
    assert(out("i").getAs[Long]("bc_e9") == 1000000000L)
    assert(out("i").getAs[Long]("hellinger_e6") == 0L)
    val ro = out("o")
    assert(ro.get(ro.fieldIndex("emd_e6")) == null)
    assert(ro.get(ro.fieldIndex("bc_e9")) == null)
    assert(ro.get(ro.fieldIndex("hellinger_e6")) == null)
  }

  test("krippendorffAlpha: hand-computed pairs; single-rating drops; unanimous null") {
    // k: items (A,A), (A,B), (B,B), (A,A) + one single-rating item (drops):
    // n = 8, D_o = 0+2+0+0 = 2, n_c = (5,3), ne = 64-25-9 = 30,
    // alpha = 1 - 7*2/30 = 8/15 = 0.5333... -> 533333
    val k = Seq(("k", 1L, "A"), ("k", 1L, "A"), ("k", 2L, "A"), ("k", 2L, "B"),
      ("k", 3L, "B"), ("k", 3L, "B"), ("k", 4L, "A"), ("k", 4L, "A"),
      ("k", 5L, "A"))
    // m: one item AAB (m=3): D = (9-5)/2 = 2, ne = 9-4-1 = 4,
    // alpha = 1 - 2*2/4 = 0
    val m = Seq(("m", 1L, "A"), ("m", 1L, "A"), ("m", 1L, "B"))
    // u: unanimous -> ne = 0 -> null alpha
    val u = Seq(("u", 1L, "X"), ("u", 1L, "X"), ("u", 2L, "X"), ("u", 2L, "X"))
    val out = Metrics.krippendorffAlpha((k ++ m ++ u).toDF("g", "item", "lab"),
      Seq("g"), "item", "lab").collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("k").getAs[Long]("n_items") == 4L)
    assert(out("k").getAs[Long]("n_ratings") == 8L)
    assert(out("k").getAs[Long]("d_o_e9") == 2000000000L)
    assert(out("k").getAs[Long]("alpha_e6") == 533333L)
    assert(out("m").getAs[Long]("d_o_e9") == 2000000000L)
    assert(out("m").getAs[Long]("alpha_e6") == 0L)
    val ru = out("u")
    assert(ru.get(ru.fieldIndex("alpha_e6")) == null)
  }

  test("moodMedianTest: perfect separation flags; identical groups zero; all-equal null") {
    // k: A = 1..4, B = 5..8 -> lower median 4, perfect split: chi2 = N = 8
    val k = (1L to 4L).map(("k", "A", _)) ++ (5L to 8L).map(("k", "B", _))
    val s = Seq(("s", "A", 1L), ("s", "A", 2L), ("s", "B", 1L), ("s", "B", 2L))
    val e = Seq(("e", "A", 5L), ("e", "A", 5L), ("e", "B", 5L), ("e", "B", 5L))
    val out = Metrics.moodMedianTest((k ++ s ++ e).toDF("g", "grp", "v"),
      Seq("g"), "grp", "v").collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("k").getAs[Long]("grand_median") == 4L)
    assert(out("k").getAs[Long]("dof") == 1L)
    assert(out("k").getAs[Long]("chi2_e6") == 8000000L)
    assert(out("k").getAs[Boolean]("significant"))
    assert(out("s").getAs[Long]("grand_median") == 1L)
    assert(out("s").getAs[Long]("chi2_e6") == 0L)
    assert(!out("s").getAs[Boolean]("significant"))
    val re = out("e")
    assert(re.getAs[Long]("c_levels") == 1L)
    assert(re.get(re.fieldIndex("chi2_e6")) == null)
  }

  test("partialCorrelation: confounder nets out; perfect collinearity degenerates") {
    // o: x = z + w, y = z - w (orthogonal w): r_xy = 0 but both ride z
    // at r = 1/sqrt(2); controlling z reveals the exact anti-correlation
    // partial = (0 - 1/2)/(1/2) = -1 (in doubles -0.99999...8, so t is
    // finite-huge and the verdict fires — deterministic in both engines)
    val o = Seq((1L, 2L, 0L), (-1L, 0L, -2L), (1L, 0L, 2L), (-1L, -2L, 0L))
      .map { case (z, x, y) => ("o", x, y, z) }
    // g: general-position 5 points — expected values recomputed here
    // from the hand-listed sufficient sums with independent spelling
    val g = Seq((0L, 0L, 0L), (1L, 2L, 0L), (2L, 1L, 1L), (3L, 3L, 1L),
      (5L, 5L, 2L)).map { case (x, y, z) => ("g", x, y, z) }
    val out = graft.operators.Profile.partialCorrelation(
        (o ++ g).toDF("k", "x", "y", "z"), Seq("k"), "x", "y", "z")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("o").getAs[Long]("r_xy_e6") == 0L)
    assert(out("o").getAs[Long]("r_xz_e6") == 707107L)
    assert(out("o").getAs[Long]("partial_e6") == -1000000L)
    assert(out("o").getAs[Boolean]("significant"))
    // g sums: n=5 Sx=11 Sy=11 Sz=4 Sxx=39 Syy=39 Szz=6 Sxy=38 Sxz=15 Syz=14
    val (n, sx, sy, sz, sxx, syy, szz, sxy, sxz, syz) =
      (5.0, 11.0, 11.0, 4.0, 39.0, 39.0, 6.0, 38.0, 15.0, 14.0)
    def r(sab: Double, sa: Double, sb: Double, qa: Double, qb: Double) =
      (n * sab - sa * sb) / math.sqrt((n * qa - sa * sa) * (n * qb - sb * sb))
    val (rxy, rxz, ryz) = (r(sxy, sx, sy, sxx, syy), r(sxz, sx, sz, sxx, szz),
      r(syz, sy, sz, syy, szz))
    val pr = (rxy - rxz * ryz) /
      math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
    assert(out("g").getAs[Long]("partial_e6") ==
      math.floor(pr * 1e6 + 0.5).toLong)
    assert(out("g").getAs[Long]("r_xy_e6") ==
      math.floor(rxy * 1e6 + 0.5).toLong)
    val t = pr * math.sqrt((n - 3.0) / (1.0 - pr * pr))
    assert(out("g").getAs[Long]("t_e4") == math.floor(t * 1e4 + 0.5).toLong)
  }

  test("partialCorrelation: longSums fast path is bit-equal; fence raises loud") {
    val g = Seq((0L, 0L, 0L), (1L, 2L, 0L), (2L, 1L, 1L), (3L, 3L, 1L),
      (5L, 5L, 2L)).map { case (x, y, z) => ("g", x, y, z) }
    val df = g.toDF("k", "x", "y", "z")
    val slow = graft.operators.Profile.partialCorrelation(
      df, Seq("k"), "x", "y", "z").collect().toSeq
    val fast = graft.operators.Profile.partialCorrelation(
      df, Seq("k"), "x", "y", "z", longSums = true).collect().toSeq
    assert(slow == fast) // exact sums -> identical readout either path
    // n * max|v|^2 past the fence: 4e9^2 = 1.6e19 > 8.3e18 -> RAISE,
    // never a silently wrapped sum
    val big = Seq(("b", 4000000000L, 1L, 1L), ("b", 1L, 1L, 1L))
      .toDF("k", "x", "y", "z")
    val ex = intercept[Exception] {
      graft.operators.Profile.partialCorrelation(
        big, Seq("k"), "x", "y", "z", longSums = true).collect()
    }
    assert(ex.getMessage.contains("longSums fence"))
  }

  test("cronbachAlpha: hand-computed two-item scales; constant total null; null rows drop") {
    // p: b = 2a -> alpha = 2*(1 - 30/54) = 8/9 -> 888889
    val p = Seq(("p", 1L, 2L), ("p", 2L, 4L), ("p", 3L, 6L))
    // i: mixed -> alpha = 2*(1 - 40/64) = 0.75 -> 750000
    val i = Seq(("i", 1L, 2L), ("i", 2L, 1L), ("i", 3L, 4L), ("i", 4L, 3L))
    // o: exact anti-variation -> total variance 0 -> null
    val o = Seq(("o", 1L, 3L), ("o", 2L, 2L), ("o", 3L, 1L))
    val out = Metrics.cronbachAlpha((p ++ i ++ o).toDF("g", "a", "b"),
      Seq("g"), Seq("a", "b")).collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("p").getAs[Long]("alpha_e6") == 888889L)
    assert(out("i").getAs[Long]("alpha_e6") == 750000L)
    assert(out("p").getAs[Long]("k_items") == 2L)
    val ro = out("o")
    assert(ro.get(ro.fieldIndex("alpha_e6")) == null)
    // a null item drops the row (paired contract)
    val wn = Seq(("n", Some(1L), Some(2L)), ("n", Some(2L), None),
      ("n", Some(3L), Some(6L)), ("n", Some(4L), Some(8L))).toDF("g", "a", "b")
    assert(Metrics.cronbachAlpha(wn, Seq("g"), Seq("a", "b"))
      .collect().head.getAs[Long]("n") == 3L)
  }

  test("ebShrinkRates: the 1/1 entity no longer outranks 97/100; degenerate keys null") {
    val k = Seq(("k", 1L, 1L, 1L), ("k", 2L, 97L, 100L), ("k", 3L, 50L, 100L),
      ("k", 4L, 10L, 20L), ("k", 5L, 3L, 10L))
    // u: all entities share one rate -> zero variance -> null prior
    val u = Seq(("u", 1L, 1L, 2L), ("u", 2L, 2L, 4L), ("u", 3L, 3L, 6L))
    val out = Metrics.ebShrinkRates((k ++ u).toDF("g", "e", "x", "n"),
      Seq("g"), "e", "x", "n").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("entity")) -> r).toMap
    val s1 = out(("k", 1L)).getAs[Long]("shrunk_e6")
    val s2 = out(("k", 2L)).getAs[Long]("shrunk_e6")
    assert(s2 > s1, s"97/100 ($s2) must outrank 1/1 ($s1) after shrinkage")
    // replay the moment fit from the quantized rates
    val rates = Seq(1.0, 0.97, 0.5, 0.5, 0.3)
    val mu = rates.sum / 5
    val varr = rates.map(r => (r - mu) * (r - mu)).sum / 4
    val c = mu * (1 - mu) / varr - 1
    val (a, b) = (mu * c, (1 - mu) * c)
    assert(math.abs(out(("k", 1L)).getAs[Long]("alpha_e6") - a * 1e6) < 2)
    assert(math.abs(s1 - (1 + a) / (1 + a + b) * 1e6) < 2)
    val ru = out(("u", 1L))
    assert(ru.get(ru.fieldIndex("shrunk_e6")) == null)
    assert(ru.getAs[Long]("rate_e9") == 500000000L)
  }

  test("pairwiseWelch: separated pairs reject, overlapping pair survives, n=1 drops") {
    val rows =
      Seq(0L, 0L, 1L, 1L).map(("k", "A", _)) ++
      Seq(100L, 101L, 102L, 103L).map(("k", "B", _)) ++
      Seq(0L, 1L, 2L, 1L).map(("k", "C", _)) ++
      Seq(("k", "D", 5L)) // single row -> null variance -> pair drops
    val out = Metrics.pairwiseWelch(rows.toDF("g", "grp", "v"),
      Seq("g"), "grp", "v").collect()
      .map(r => (r.getAs[String]("group_a"), r.getAs[String]("group_b")) -> r)
      .toMap
    assert(out.size == 3, s"D pairs must drop: ${out.keys}")
    assert(out(("A", "B")).getAs[Boolean]("rejected"))
    assert(out(("B", "C")).getAs[Boolean]("rejected"))
    assert(!out(("A", "C")).getAs[Boolean]("rejected"))
    assert(out(("A", "B")).getAs[Long]("p_e9") <
      out(("A", "C")).getAs[Long]("p_e9"))
    assert(out(("A", "B")).getAs[Long]("mean_b_e2") == 10150L)
  }

  test("friedmanTest: consistent blocks flag, one reversal lowers, ties midrank, incomplete drops") {
    def blk(g: String, b: Long, a: Long, bb: Long, c: Long) =
      Seq((g, b, "A", a), (g, b, "B", bb), (g, b, "C", c))
    // k: 3 consistent blocks + 1 reversal -> T = 2*32/32 = 2.0 (ns);
    // an incomplete 5th block (A only) must drop, n_blocks stays 4
    val k = blk("k", 1, 1, 2, 3) ++ blk("k", 2, 1, 2, 3) ++
      blk("k", 3, 1, 2, 3) ++ blk("k", 4, 3, 2, 1) ++ Seq(("k", 5L, "A", 9L))
    // c: 4 fully consistent blocks -> T = 2*128/32 = 8.0 > 5.9915 -> sig
    val c = (1L to 4L).flatMap(b => blk("c", b, 1, 2, 3))
    // t: one all-tied block (midranks 2,2,2) + one ordered -> T = 2.0
    val t = blk("t", 1, 5, 5, 5) ++ blk("t", 2, 1, 2, 3)
    // z: every block tied -> A = C -> null
    val z = blk("z", 1, 7, 7, 7) ++ blk("z", 2, 4, 4, 4)
    val out = Metrics.friedmanTest((k ++ c ++ t ++ z).toDF("g", "b", "j", "v"),
      Seq("g"), "b", "j", "v").collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("k").getAs[Long]("n_blocks") == 4L)
    assert(out("k").getAs[Long]("chi2_e6") == 2000000L)
    assert(!out("k").getAs[Boolean]("significant"))
    assert(out("c").getAs[Long]("chi2_e6") == 8000000L)
    assert(out("c").getAs[Long]("crit5_e4") == 59915L)
    assert(out("c").getAs[Boolean]("significant"))
    assert(out("t").getAs[Long]("chi2_e6") == 2000000L)
    val rz = out("z")
    assert(rz.get(rz.fieldIndex("chi2_e6")) == null)
  }

  test("blandAltman: hand-computed limits; outlier counts outside; n=1 null") {
    // k: d = [2,4,6,8]: bias 5, sd = sqrt(80/12) = 2.5819889,
    // limits [-0.0607, 10.0607], all inside
    val k = Seq(2L, 4L, 6L, 8L).map(d => ("k", 10L + d, 10L))
    // o: nine 0s and one 50: bias 5, sd = sqrt(250) = 15.811388,
    // hi = 35.99 -> the 50 falls OUTSIDE -> 9/10 = 900 pm
    val o = (Seq.fill(9)(0L) :+ 50L).map(d => ("o", 10L + d, 10L))
    val s = Seq(("s", 12L, 10L))
    val out = Metrics.blandAltman((k ++ o ++ s).toDF("g", "a", "b"),
      Seq("g"), "a", "b").collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("k").getAs[Long]("bias_e6") == 5000000L)
    assert(out("k").getAs[Long]("sd_e6") == 2581989L)
    assert(out("k").getAs[Long]("loa_lo_e6") == -60698L)
    assert(out("k").getAs[Long]("loa_hi_e6") == 10060698L)
    assert(out("k").getAs[Long]("within_pm") == 1000L)
    assert(out("o").getAs[Long]("within_pm") == 900L)
    val rs = out("s")
    assert(rs.get(rs.fieldIndex("sd_e6")) == null)
    assert(rs.get(rs.fieldIndex("within_pm")) == null)
  }

  test("confusionMetrics: hand-computed cells; empty margin nulls MCC") {
    // tp=3 fp=1 fn=2 tn=4: P=750, R=600, F1=666, acc=700,
    // MCC = 10/sqrt(600) = 0.4082483 -> 408248
    val k = Seq.fill(3)(("k", true, true)) ++ Seq.fill(1)(("k", true, false)) ++
      Seq.fill(2)(("k", false, true)) ++ Seq.fill(4)(("k", false, false))
    // p: everything predicted true -> (tn+fn) margin 0 -> null MCC
    val p = Seq(("p", true, true), ("p", true, false))
    val out = Metrics.confusionMetrics((k ++ p).toDF("g", "pred", "y"),
      Seq("g"), "pred", "y").collect().map(r => r.getAs[String]("g") -> r).toMap
    val rk = out("k")
    assert(rk.getAs[Long]("tp") == 3L && rk.getAs[Long]("tn") == 4L)
    assert(rk.getAs[Long]("precision_pm") == 750L)
    assert(rk.getAs[Long]("recall_pm") == 600L)
    assert(rk.getAs[Long]("f1_pm") == 666L)
    assert(rk.getAs[Long]("accuracy_pm") == 700L)
    assert(rk.getAs[Long]("mcc_e6") == 408248L)
    val rp = out("p")
    assert(rp.get(rp.fieldIndex("mcc_e6")) == null)
    assert(rp.getAs[Long]("precision_pm") == 500L)
  }

  test("topkStability: hand-computed overlap and displacement; empty side jaccard 0") {
    // A top-3: a1,a2,a3; B top-3: a1,a3,x9 (a2 falls to rank 4, cut)
    // common = {a1 (1,1), a3 (3,2)} -> jaccard 2/4 = 500 pm, disp 1/2 = 50
    val k = Seq(("k", "p1", "a1", 40L), ("k", "p1", "a2", 30L),
      ("k", "p1", "a3", 20L), ("k", "p1", "a4", 10L),
      ("k", "p2", "a1", 40L), ("k", "p2", "a3", 35L),
      ("k", "p2", "x9", 30L), ("k", "p2", "a2", 5L))
    val s = Seq(("s", "p1", "i", 9L), ("s", "p2", "i", 7L))
    val o = Seq(("o", "p1", "i", 9L), ("o", "p1", "j", 7L))
    val out = Metrics.topkStability((k ++ s ++ o).toDF("g", "per", "item", "v"),
      Seq("g"), "per", "item", "v", "p1", "p2", k = 3)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("k").getAs[Long]("n_common") == 2L)
    assert(out("k").getAs[Long]("jaccard_pm") == 500L)
    assert(out("k").getAs[Long]("mean_disp_e2") == 50L)
    assert(out("s").getAs[Long]("jaccard_pm") == 1000L)
    assert(out("s").getAs[Long]("mean_disp_e2") == 0L)
    assert(out("o").getAs[Long]("jaccard_pm") == 0L)
    val ro = out("o")
    assert(ro.get(ro.fieldIndex("mean_disp_e2")) == null)
  }

  test("quantileTreatmentEffect: a pure shift shows at every fence; one-sided keys drop") {
    // A = 1..10, B = 11..20: fences (1,5,9) vs (11,15,19) -> qte -10
    val kk = (1L to 10L).map(("k", "A", _)) ++ (11L to 20L).map(("k", "B", _))
    val o = (1L to 5L).map(("o", "A", _))
    val out = Metrics.quantileTreatmentEffect((kk ++ o).toDF("g", "grp", "v"),
      Seq("g"), "grp", "v", "A", "B").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("q_pct")) -> r).toMap
    assert(out.keySet == Set(("k", 10L), ("k", 50L), ("k", 90L)))
    assert(out(("k", 10L)).getAs[Long]("q_a") == 1L)
    assert(out(("k", 10L)).getAs[Long]("q_b") == 11L)
    assert(out(("k", 50L)).getAs[Long]("q_a") == 5L)
    assert(out(("k", 90L)).getAs[Long]("q_a") == 9L)
    assert(Seq(10L, 50L, 90L).forall(q =>
      out(("k", q)).getAs[Long]("qte") == -10L))
  }

  test("equivalenceTest: near-equal rates pass TOST, different or underpowered fail") {
    def arm(g: String, v: String, x: Int, n: Int) =
      Seq.fill(x)((g, v, true)) ++ Seq.fill(n - x)((g, v, false))
    // e: 500/1000 vs 501/1000 at margin 50pm -> both one-sided z's clear
    val e = arm("e", "A", 500, 1000) ++ arm("e", "B", 501, 1000)
    // d: 600 vs 400 per mille -> |d| >> margin -> not equivalent
    val d = arm("d", "A", 600, 1000) ++ arm("d", "B", 400, 1000)
    // u: same rates but n = 10 -> underpowered, TOST must NOT conclude
    val u = arm("u", "A", 5, 10) ++ arm("u", "B", 5, 10)
    // z: all success both sides -> SE 0 -> null verdict
    val z = arm("z", "A", 4, 4) ++ arm("z", "B", 3, 3)
    val out = Metrics.equivalenceTest((e ++ d ++ u ++ z).toDF("g", "v", "s"),
      Seq("g"), "v", "s", "A", "B", marginPermille = 50)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("e").getAs[Boolean]("equivalent"))
    assert(out("e").getAs[Long]("d_e6") == -1000L)
    assert(!out("d").getAs[Boolean]("equivalent"))
    assert(!out("u").getAs[Boolean]("equivalent"))
    val rz = out("z")
    assert(rz.get(rz.fieldIndex("equivalent")) == null)
    // replay the z trees from the counts
    val (pa, pb) = (0.5, 0.501)
    val se = math.sqrt(pa * (1 - pa) / 1000.0 + pb * (1 - pb) / 1000.0)
    assert(out("e").getAs[Long]("z_lo_e4") ==
      math.floor((pa - pb + 0.05) / se * 1e4 + 0.5).toLong)
  }

  test("ratioMetricAb: hand-computed delta-method z; zero-variance and tiny sides null") {
    // A: x=(1,2,3,2), y=10 each -> R=.2, Var = (2/3)/400; B: x=1 each ->
    // R=.1, Var=0 -> z = .1/sqrt(1/600) = 2.4495
    val k = Seq((1L, "A"), (2L, "A"), (3L, "A"), (2L, "A"),
      (1L, "B"), (1L, "B"), (1L, "B"), (1L, "B"))
      .map { case (x, v) => ("k", v, x, 10L) }
    val c = Seq(("c", "A", 1L, 10L), ("c", "A", 1L, 10L),
      ("c", "B", 1L, 10L), ("c", "B", 1L, 10L))
    val s = Seq(("s", "A", 1L, 10L), ("s", "B", 1L, 10L), ("s", "B", 2L, 10L))
    val out = Metrics.ratioMetricAb((k ++ c ++ s).toDF("g", "v", "x", "y"),
      Seq("g"), "v", "x", "y", "A", "B")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("k").getAs[Long]("ratio_a_e6") == 200000L)
    assert(out("k").getAs[Long]("ratio_b_e6") == 100000L)
    assert(out("k").getAs[Long]("z_e4") == 24495L)
    assert(out("k").getAs[Boolean]("significant"))
    val rc = out("c")
    assert(rc.get(rc.fieldIndex("z_e4")) == null)
    val rs = out("s")
    assert(rs.get(rs.fieldIndex("z_e4")) == null)
  }

  test("liftTable: ties share a tile (histogram deciles, no row split)") {
    // all four rows share one score -> single tile 0 holding everything
    val df = Seq((5L, true), (5L, false), (5L, true), (5L, false)).toDF("s", "y")
    val out = Metrics.liftTable(df, "s", "y", nTiles = 4).collect()
    assert(out.length == 1 && out.head.getAs[Long]("tile") == 0L)
    assert(out.head.getAs[Long]("n") == 4L)
    assert(out.head.getAs[Long]("cum_lift_e6") == 1000000L)
  }

  test("cemAtt: hand-computed strata — matched gap weighting, dropped treated, control-only ignored") {
    // g=1 matched: treated {10,20} vs control {5} → gap 10 (e6 10M);
    // g=2 treated-only → 1 treated DROPPED; g=3 control-only → ignored
    val df = Seq(
      (1, true, 10L), (1, true, 20L), (1, false, 5L),
      (2, true, 7L),
      (3, false, 100L)).toDF("g", "treat", "v")
    val r = Metrics.cemAtt(df, "treat", "v", Seq("g")).head()
    assert(r.getAs[Long]("n_strata_matched") == 1L)
    assert(r.getAs[Long]("n_treated_matched") == 2L)
    assert(r.getAs[Long]("n_control_matched") == 1L)
    assert(r.getAs[Long]("n_treated_dropped") == 1L)
    assert(r.getAs[Long]("att_e6") == 10000000L)
  }

  test("srmCheck: hand-computed GOF terms; zero-observed design arm participates") {
    // A:3 B:1 vs 1:1 → χ² = 1 exactly (each term (O·W−N·w)²/(N·w·W) = ½)
    val mild = Seq.fill(3)("A").map(("x", _)) ++ Seq(("x", "B"))
    val r1 = Metrics.srmCheck(mild.toDF("id", "arm"), "arm",
      Seq(("A", 1L), ("B", 1L))).head()
    assert(r1.getAs[Long]("chi2_e6") == 1000000L)
    assert(r1.getAs[Long]("dof") == 1L && !r1.getAs[Boolean]("srm_detected"))
    // A:100 B:10 vs 1:1 → χ² ≈ 73.6, detected
    val bad = (Seq.fill(100)("A") ++ Seq.fill(10)("B")).map(("x", _))
    val r2 = Metrics.srmCheck(bad.toDF("id", "arm"), "arm",
      Seq(("A", 1L), ("B", 1L))).head()
    assert(r2.getAs[Long]("chi2_e6") == 73636364L, s"chi2=${r2.getAs[Long]("chi2_e6")}")
    assert(r2.getAs[Boolean]("srm_detected"))
    // a designed arm with ZERO observations still contributes its term
    val half = Seq.fill(5)("A").map(("x", _))
    val r3 = Metrics.srmCheck(half.toDF("id", "arm"), "arm",
      Seq(("A", 1L), ("B", 1L))).head()
    assert(r3.getAs[Long]("chi2_e6") == 5000000L && r3.getAs[Boolean]("srm_detected"))
  }

  test("srmCheck: an observed arm outside the design raises, never silently drops") {
    val df = Seq(("x", "A"), ("x", "C")).toDF("id", "arm")
    val e = intercept[Exception] {
      Metrics.srmCheck(df, "arm", Seq(("A", 1L), ("B", 1L))).collect()
    }
    assert(e.getMessage.contains("srmCheck") || e.getCause != null)
  }

  test("bartlettTest: identical group variances give T exactly 0; a wide group flags") {
    // three groups with IDENTICAL variance → LR statistic is exactly 0
    val eq = (Seq(10, 12, 14, 16, 18).map(("a", _)) ++
      Seq(20, 22, 24, 26, 28).map(("b", _)) ++
      Seq(5, 7, 9, 11, 13).map(("c", _))).map { case (g, v) => (g, v.toLong) }
    val r1 = Metrics.bartlettTest(eq.toDF("g", "v"), "g", "v").head()
    assert(r1.getAs[Long]("bartlett_t_e6") == 0L)
    assert(!r1.getAs[Boolean]("heteroscedastic"))
    // tight vs wide (reference-traced through the quantized protocol)
    val uneq = (Seq(100, 101, 99, 100, 101, 99).map(("t", _)) ++
      Seq(50, 150, 20, 180, 10, 190).map(("w", _))).map { case (g, v) => (g, v.toLong) }
    val r2 = Metrics.bartlettTest(uneq.toDF("g", "v"), "g", "v").head()
    assert(r2.getAs[Long]("bartlett_t_e6") == 34826193L,
      s"t=${r2.getAs[Long]("bartlett_t_e6")}")
    assert(r2.getAs[Boolean]("heteroscedastic"))
  }

  test("bartlettTest: per-group SS past 2^63 at e6 still computes exactly " +
    "(the q349 sf0.01 regression — a long cast would silently saturate)") {
    // q/n·1e6 = 1e19 and 9e19, both > 2^63: the DECIMAL(38,0) route must
    // carry them exactly (hand-traced through the quantized protocol)
    val df = (Seq(0L, 1000000L, 2000000L, 3000000L, 4000000L).map(("a", _)) ++
      Seq(0L, 3000000L, 6000000L, 9000000L, 12000000L).map(("b", _)))
      .toDF("g", "v")
    val r = Metrics.bartlettTest(df, "g", "v").head()
    assert(r.getAs[Long]("bartlett_t_e6") == 3632538L,
      s"t=${r.getAs[Long]("bartlett_t_e6")}")
    assert(!r.getAs[Boolean]("heteroscedastic"))
  }

  test("bartlettTest: fail-loud fences — q/n >= 1e24 and k-1 > 40 raise") {
    val huge = Seq(("a", 0L), ("a", 2000000000000L), ("b", 1L), ("b", 2L))
      .toDF("g", "v")
    val e1 = intercept[Exception] { Metrics.bartlettTest(huge, "g", "v").collect() }
    assert(e1.getMessage.contains("bartlettTest") ||
      e1.getCause != null, e1.getMessage)
    val wide = (0 until 42).flatMap(i => Seq((s"g$i", 1L), (s"g$i", 2L)))
      .toDF("g", "v")
    val e2 = intercept[Exception] { Metrics.bartlettTest(wide, "g", "v").collect() }
    assert(e2.getMessage.contains("chi-square critical") ||
      e2.getCause != null, e2.getMessage)
  }

  test("bartlettTest: a zero-variance group nulls the verdict instead of -inf") {
    val df = (Seq(5, 5, 5).map(("z", _)) ++ Seq(1, 2, 3).map(("o", _)))
      .map { case (g, v) => (g, v.toLong) }.toDF("g", "v")
    val r = Metrics.bartlettTest(df, "g", "v").head()
    assert(r.get(r.fieldIndex("bartlett_t_e6")) == null)
    assert(r.get(r.fieldIndex("heteroscedastic")) == null)
  }

  test("hodgesLehmann: exact pure-shift recovery and weighted lower median") {
    // A = B + 5 exactly → HL must be exactly 5 (diff grid median);
    // and the tiny [1,2] vs [0,1] case: diffs [0,1,1,2] → lower median 1
    val df = (Seq(6L, 7L, 8L).map(("s", true, _)) ++
      Seq(1L, 2L, 3L).map(("s", false, _)) ++
      Seq(1L, 2L).map(("t", true, _)) ++
      Seq(0L, 1L).map(("t", false, _))).toDF("k", "side", "v")
    val out = Metrics.hodgesLehmann(df, Seq("k"), "side", "v")
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_pairs"), r.getAs[Long]("hl_shift")))).toMap
    assert(out("s") == ((3L, 3L, 9L, 5L)), s"s: ${out("s")}")
    assert(out("t") == ((2L, 2L, 4L, 1L)), s"t: ${out("t")}")
  }

  test("hodgesLehmann: a key missing one side emits nothing") {
    val df = Seq(("k", true, 1L), ("k", true, 2L)).toDF("k", "side", "v")
    assert(Metrics.hodgesLehmann(df, Seq("k"), "side", "v").count() == 0L)
  }

  test("cemAtt: negative gaps round half-up identically and weight by treated share") {
    // two matched strata: gap +2 with 1 treated, gap −5 with 3 treated
    // → att = (1·2e6 + 3·(−5e6)) / 4 = −3.25e6; floor(−3.25e6 + 0.5)
    val df = Seq(
      (1, true, 12L), (1, false, 10L),
      (2, true, 0L), (2, true, 0L), (2, true, 0L), (2, false, 5L)).toDF("g", "treat", "v")
    val r = Metrics.cemAtt(df, "treat", "v", Seq("g")).head()
    assert(r.getAs[Long]("n_treated_matched") == 4L)
    assert(r.getAs[Long]("att_e6") == -3250000L)
  }

  test("diffInDiff: hand-computed 2x2 — estimate, robust SE, significance") {
    // cell means 12/23/31/53: time shock +11, baseline gap +19, planted
    // effect 53 − (31+11) = 11; cell variances 8/18/2/18 with n=2 each
    // → se² = 4+9+1+9 = 23, t = 11/√23 = 2.2937
    val rows = Seq(
      (false, false, 10L), (false, false, 14L),
      (false, true, 20L), (false, true, 26L),
      (true, false, 30L), (true, false, 32L),
      (true, true, 50L), (true, true, 56L)).map { case (t, p, v) => ("k", t, p, v) }
    val df = rows.toDF("key", "treat", "post", "v")
    val r = Metrics.diffInDiff(df, Seq("key"), "treat", "post", "v").head()
    assert(r.getAs[Long]("n_00") == 2L && r.getAs[Long]("n_11") == 2L)
    assert(r.getAs[Long]("mean_00_e2") == 1200L)
    assert(r.getAs[Long]("mean_11_e2") == 5300L)
    assert(r.getAs[Long]("did_e6") == 11000000L)
    assert(r.getAs[Long]("t_e4") == 22937L)
    assert(r.getAs[Boolean]("significant"))
  }

  test("diffInDiff: a missing cell nulls the estimate; n=1 cells null only the t") {
    import org.apache.spark.sql.functions.col
    // no control-post cell at all — a 2x2 with an empty cell is not a DiD
    val missing = Seq(("k", false, false, 10L), ("k", true, false, 30L),
      ("k", true, true, 50L)).toDF("key", "treat", "post", "v")
    val r1 = Metrics.diffInDiff(missing, Seq("key"), "treat", "post", "v").head()
    assert(r1.isNullAt(r1.fieldIndex("did_e6")) && r1.isNullAt(r1.fieldIndex("t_e4")))
    // all four cells present with n=1: estimate computes, t does not
    val singles = Seq(("k", false, false, 10L), ("k", false, true, 21L),
      ("k", true, false, 30L), ("k", true, true, 52L)).toDF("key", "treat", "post", "v")
    val r2 = Metrics.diffInDiff(singles, Seq("key"), "treat", "post", "v").head()
    assert(r2.getAs[Long]("did_e6") == 11000000L)
    assert(r2.isNullAt(r2.fieldIndex("t_e4")))
    assert(r2.isNullAt(r2.fieldIndex("significant")))
    // null group/period/value rows drop rather than poison a cell
    val noisy = singles.union(Seq(("k", true, true, 999L)).toDF("key", "treat", "post", "v")
      .select(col("key"), lit(null).cast("boolean").as("treat"), col("post"), col("v")))
    val r3 = Metrics.diffInDiff(noisy, Seq("key"), "treat", "post", "v").head()
    assert(r3.getAs[Long]("did_e6") == 11000000L)
  }

  test("tukeyHsd: hand-computed pairwise q against the inf-df ladder") {
    // groups a:(0,2) b:(4,6) c:(8,10): every SSW_g = 2 -> SSW = 6,
    // MSW = 6/(6-3) = 2, se = sqrt(2/2 * (1/2 + 1/2)) = 1, so q = |diff|
    val df = Seq(("a", 0L), ("a", 2L), ("b", 4L), ("b", 6L),
      ("c", 8L), ("c", 10L)).toDF("g", "v")
    val out = Metrics.tukeyHsd(df, "g", "v").orderBy("g_a", "g_b").collect()
    assert(out.length == 3)
    val ab = out(0)
    assert(ab.getString(0) == "a" && ab.getString(1) == "b")
    assert(ab.getAs[Long]("diff_e6") == -4000000L)
    assert(ab.getAs[Long]("q_e4") == 40000L)
    assert(ab.getAs[Long]("q_crit_e4") == Metrics.tukeyQCritInfE4(3))
    assert(ab.getAs[Boolean]("significant")) // 4.0 > 3.3145
    assert(out(1).getAs[Long]("q_e4") == 80000L) // a vs c: |1-9| = 8
    assert(out(2).getAs[Long]("q_e4") == 40000L) // b vs c
  }

  test("tukeyHsd: a singleton group nulls every q (minn >= 2 guard)") {
    val df = Seq(("a", 0L), ("a", 2L), ("b", 4L), ("b", 6L), ("c", 9L))
      .toDF("g", "v")
    val out = Metrics.tukeyHsd(df, "g", "v").collect()
    assert(out.length == 3)
    assert(out.forall(_.isNullAt(out.head.fieldIndex("q_e4"))))
  }

  test("cmhTest: a planted stratified association fires; a balanced one does not") {
    // stratum s1: exposure perfectly predicts outcome (a=3, n1=3, m1=3,
    // N=6): E = 1.5, V = 9*3*3/(36*5) = 0.45 per stratum
    def stratum(st: String, flip: Boolean) = (1 to 6).map { i =>
      val e = i <= 3
      (st, e, if (flip) !e else e)
    }
    val assoc = (stratum("s1", false) ++ stratum("s2", false))
      .toDF("st", "e", "y")
    val r = Metrics.cmhTest(assoc, "st", "e", "y").head()
    assert(r.getAs[Long]("k_strata") == 2L && r.getAs[Long]("sum_a") == 6L)
    // sum E = 3, sum V = 0.9: CMH = (6-3)^2/0.9 = 10 -> e4 = 100000
    assert(r.getAs[Long]("cmh_e4") == 100000L)
    assert(r.getAs[Boolean]("significant"))
    // opposite directions across strata cancel: sum a = 3+0 = 3 = sum E
    val cancel = (stratum("s1", false) ++ stratum("s2", true))
      .toDF("st", "e", "y")
    val c = Metrics.cmhTest(cancel, "st", "e", "y").head()
    assert(c.getAs[Long]("cmh_e4") == 0L)
    assert(!c.getAs[Boolean]("significant"))
    // a 1-row stratum drops loudly
    val degen = (stratum("s1", false) :+ (("s3", true, true)))
      .toDF("st", "e", "y")
    val d = Metrics.cmhTest(degen, "st", "e", "y").head()
    assert(d.getAs[Long]("k_strata") == 1L && d.getAs[Long]("n_degenerate") == 1L)
  }

  test("conformalInterval: hand-computed rank-k half-width and test coverage") {
    // train mean 10 (yhat2 = 1000); cal residuals e2 sorted:
    // 0,100,100,200,200,300,300,400,400 — n_cal 9, k = ⌈10·0.9⌉ = 9 →
    // q̂ = 400; test: r = 0 ✓, 500 ✗, 400 ✓ (inclusive), 'b' unscored
    val rows =
      Seq.fill(4)(("a", "train", 10L)) ++
        Seq(10L, 11L, 12L, 13L, 14L, 9L, 8L, 7L, 6L).map(v => ("a", "val", v)) ++
        Seq(("a", "test", 10L), ("a", "test", 15L), ("a", "test", 14L),
          ("b", "test", 10L))
    val df = rows.toDF("g", "split", "v")
    val r = Metrics.conformalInterval(df, "split", Seq("g"), "v").head()
    assert(r.getAs[Long]("n_train") == 4L)
    assert(r.getAs[Long]("n_cal") == 9L)
    assert(r.getAs[Long]("k") == 9L)
    assert(r.getAs[Long]("qhat_e2") == 400L)
    assert(r.getAs[Long]("n_test_scored") == 3L)
    assert(r.getAs[Long]("n_test_unscored") == 1L)
    assert(r.getAs[Long]("n_covered") == 2L)
    assert(r.getAs[Long]("cov_e6") == 666666L)
  }

  test("groupSequential: cumulative looks, boundary crossing, stopped flag") {
    // look 1: A {10,12} vs B {10,10} → z = 1.0, under the 3.0 bar;
    // look 2 cumulates A {10,12,20,22} (var 104/3) vs B {10×4} (var 0)
    // → z = 6/√(104/12) = 2.0381, over the 2.0 bar → reject, stopped
    val rows = Seq(
      (1, true, 10L), (1, true, 12L), (1, false, 10L), (1, false, 10L),
      (2, true, 20L), (2, true, 22L), (2, false, 10L), (2, false, 10L))
    val df = rows.toDF("look", "arm", "v")
    val out = Metrics.groupSequential(df, "look", "arm", "v",
        boundariesE4 = Seq(30000L, 20000L))
      .orderBy("look").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("z_e4") == 10000L)
    assert(!out(0).getAs[Boolean]("reject") && !out(0).getAs[Boolean]("stopped"))
    assert(out(1).getAs[Long]("n_a") == 4L && out(1).getAs[Long]("n_b") == 4L)
    assert(out(1).getAs[Long]("z_e4") == 20381L)
    assert(out(1).getAs[Boolean]("reject") && out(1).getAs[Boolean]("stopped"))
  }

  test("groupSequential: a first-look rejection marks every later look stopped") {
    val rows = Seq(
      (1, true, 100L), (1, true, 102L), (1, false, 10L), (1, false, 12L),
      (2, true, 10L), (2, true, 10L), (2, false, 10L), (2, false, 11L))
    val out = Metrics.groupSequential(rows.toDF("look", "arm", "v"),
        "look", "arm", "v", boundariesE4 = Seq(20000L, 20000L))
      .orderBy("look").collect()
    assert(out(0).getAs[Boolean]("reject") && out(0).getAs[Boolean]("stopped"))
    assert(out(1).getAs[Boolean]("stopped")) // stays stopped regardless of z
    // the OBF ladder helper is monotone decreasing and ends near c
    val b = Metrics.obfBoundariesE4(5)
    assert(b == b.sorted.reverse && b.last == 20400L)
  }

  test("ivWald: hand-computed first stage, ITT, and LATE ratio") {
    // z=0: d̄ = 1/4, ȳ = 15; z=1: d̄ = 3/4, ȳ = 30 → fs = 0.5,
    // itt = 15, LATE = 30
    val rows = Seq(
      (false, 1L, 10L), (false, 0L, 10L), (false, 0L, 20L), (false, 0L, 20L),
      (true, 1L, 20L), (true, 1L, 30L), (true, 1L, 30L), (true, 0L, 40L))
      .map { case (z, d, y) => ("k", z, d, y) }
    val r = Metrics.ivWald(rows.toDF("key", "z", "d", "y"),
      Seq("key"), "z", "d", "y").head()
    assert(r.getAs[Long]("n_z0") == 4L && r.getAs[Long]("n_z1") == 4L)
    assert(r.getAs[Long]("fs_e6") == 500000L)
    assert(r.getAs[Long]("itt_e6") == 15000000L)
    assert(r.getAs[Long]("late_e6") == 30000000L)
  }

  test("ivWald: a zero first stage nulls the LATE but keeps the components") {
    val rows = Seq((false, 1L, 10L), (false, 0L, 20L),
      (true, 1L, 30L), (true, 0L, 50L)).map { case (z, d, y) => ("k", z, d, y) }
    val r = Metrics.ivWald(rows.toDF("key", "z", "d", "y"),
      Seq("key"), "z", "d", "y").head()
    assert(r.getAs[Long]("fs_e6") == 0L)
    assert(r.getAs[Long]("itt_e6") == 25000000L)
    assert(r.isNullAt(r.fieldIndex("late_e6")))
  }

  test("didPlacebo: permutation p matches a driver-side replay of the hash assignments") {
    // 12 units × (pre, post); planted effect +100 on the 4 true-treated
    // units post. Expected placebo DiDs re-derived in plain Scala with
    // the SAME md5 assignment (hash parity is pinned by
    // TextHashParitySpec), so this checks the explode/groupBy plumbing
    val units = (1L to 12L)
    val treated = (u: Long) => u <= 4L
    val base = (u: Long) => 10L + u // unit fixed effect
    val rows = units.flatMap { u =>
      Seq(("k", u, treated(u), false, base(u)),
        ("k", u, treated(u), true, base(u) + 7L + (if (treated(u)) 100L else 0L)))
    }
    val df = rows.toDF("key", "unit", "treat", "post", "v")
    val reps = 19
    def didOf(assign: Long => Boolean): Option[Long] = {
      val cells = rows.groupBy(r => (assign(r._2), r._4))
        .map { case (k, rs) => k -> (rs.size.toLong, rs.map(_._5).sum) }
      val need = Seq((false, false), (false, true), (true, false), (true, true))
      if (!need.forall(cells.contains)) None
      else {
        def m(t: Boolean, p: Boolean) = { val (n, s) = cells((t, p)); s.toDouble / n }
        Some(math.floor(((m(true, true) - m(true, false)) -
          (m(false, true) - m(false, false))) * 1000000 + 0.5).toLong)
      }
    }
    val obs = didOf(treated).get
    val placebo = (1 to reps).flatMap { b =>
      didOf(u => (graft.text.TextHash.hash32(u.toString) >> b) % 2 == 0)
    }
    val expGe = placebo.count(p => math.abs(p) >= math.abs(obs)).toLong
    val expP = (1L + expGe) * 1000000L / (placebo.size + 1L)
    val r = Metrics.didPlacebo(df, Seq("key"), "unit", "treat", "post", "v",
      reps = reps).head()
    assert(r.getAs[Long]("did_obs_e6") == obs)
    assert(r.getAs[Long]("n_reps") == placebo.size.toLong)
    assert(r.getAs[Long]("n_ge") == expGe)
    assert(r.getAs[Long]("p_e6") == expP)
    // a planted effect this large should be extreme among placebos
    assert(r.getAs[Long]("p_e6") <= 150000L, s"p=${r.getAs[Long]("p_e6")}")
  }

  test("conformalInterval: calibration smaller than the rank gives the infinite interval") {
    // n_cal = 2 → k = ⌈3·0.9⌉ = 3 > 2 → null q̂, null coverage
    val df = (Seq.fill(3)(("a", "train", 10L)) ++
      Seq(("a", "val", 11L), ("a", "val", 12L)) ++
      Seq(("a", "test", 10L))).toDF("g", "split", "v")
    val r = Metrics.conformalInterval(df, "split", Seq("g"), "v").head()
    assert(r.getAs[Long]("n_cal") == 2L && r.getAs[Long]("k") == 3L)
    assert(r.isNullAt(r.fieldIndex("qhat_e2")))
    assert(r.getAs[Long]("n_covered") == 0L)
    assert(r.isNullAt(r.fieldIndex("cov_e6")))
  }
}
