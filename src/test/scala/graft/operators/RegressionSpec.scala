package graft.operators

import graft.SparkSpec

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("groupedOls recovers an exact line and a known noisy fit per key") {
    // key a: y = 3 + 2x exactly; key b: hand-checkable 3-point fit
    val a = Seq(0L, 1L, 2L, 3L, 4L).map(x => ("a", x, 3 + 2 * x))
    // b: (0,0), (1,1), (2,4) -> slope 2, intercept -1/3
    val b = Seq(("b", 0L, 0L), ("b", 1L, 1L), ("b", 2L, 4L))
    val out = Regression.groupedOls((a ++ b).toDF("k", "x", "y"), Seq("k"), "x", "y")
      .orderBy("k").collect()
    val ra = out(0)
    assert(ra.getAs[Long]("n") == 5)
    assert(ra.getAs[Double]("slope") == 2.0)
    assert(ra.getAs[Double]("intercept") == 3.0)
    val rb = out(1)
    assert(rb.getAs[Double]("slope") == 2.0)
    assert(rb.getAs[Double]("intercept") == -0.333333) // floor(−1/3·1e6+0.5)/1e6
  }

  test("groupedOls: a singular design (single x) reports nulls, not failure") {
    val df = Seq(("k", 5L, 1L), ("k", 5L, 9L)).toDF("k", "x", "y")
    val r = Regression.groupedOls(df, Seq("k"), "x", "y").collect().head
    assert(r.getAs[Long]("n") == 2)
    assert(r.get(r.fieldIndex("slope")) == null)
    assert(r.get(r.fieldIndex("intercept")) == null)
  }

  test("groupedOls ignores null coordinates (pandas dropna parity)") {
    val df = Seq(
      ("k", Some(0L), Some(1L)), ("k", Some(1L), Some(3L)),
      ("k", None, Some(99L)), ("k", Some(7L), None)
    ).toDF("k", "x", "y")
    val r = Regression.groupedOls(df, Seq("k"), "x", "y").collect().head
    assert(r.getAs[Long]("n") == 2)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("intercept") == 1.0)
  }

  test("breuschPagan: variance growing with x fires; an exact line nulls") {
    // hetero: y = 100x +/- x -> residuals ~ +/-x, u ~ x^2 trends with x
    val het = (1 to 40).map(x =>
      ("h", x.toLong, 100L * x + (if (x % 2 == 0) x else -x)))
    // homo: exact line -> zero residuals -> constant u -> null LM
    val hom = (1 to 40).map(x => ("o", x.toLong, 100L * x))
    val out = Regression.breuschPagan((het ++ hom).toDF("g", "x", "y"),
      Seq("g"), "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    val h = out("h")
    assert(h.getAs[Long]("lm_e4") > 38415L)
    assert(h.getAs[Boolean]("heteroscedastic"))
    assert(out("o").isNullAt(out("o").fieldIndex("lm_e4")))
  }

  test("groupedOls2 recovers an exact plane per key") {
    // y = 5 + 2*x1 - 3*x2 exactly, over a non-degenerate grid
    val rows = for (x1 <- 0L to 4L; x2 <- 0L to 3L)
      yield ("k", x1, x2, 5 + 2 * x1 - 3 * x2)
    val r = Regression.groupedOls2(rows.toDF("k", "x1", "x2", "y"),
      Seq("k"), "x1", "x2", "y").collect().head
    assert(r.getAs[Long]("n") == 20)
    assert(r.getAs[Double]("intercept") == 5.0)
    assert(r.getAs[Double]("b1") == 2.0)
    assert(r.getAs[Double]("b2") == -3.0)
  }

  test("groupedOls2: collinear features report nulls, not failure") {
    // x2 = 2*x1 -> singular normal equations
    val df = Seq(("k", 1L, 2L, 10L), ("k", 2L, 4L, 20L), ("k", 3L, 6L, 30L))
      .toDF("k", "x1", "x2", "y")
    val r = Regression.groupedOls2(df, Seq("k"), "x1", "x2", "y").collect().head
    assert(r.get(r.fieldIndex("b1")) == null)
    assert(r.get(r.fieldIndex("b2")) == null)
  }

  test("groupedOls2 plans one partial+final aggregate pair, no window") {
    val df = Seq(("k", 0L, 1L, 1L), ("k", 1L, 0L, 3L), ("k", 2L, 2L, 4L))
      .toDF("k", "x1", "x2", "y")
    val p = Regression.groupedOls2(df, Seq("k"), "x1", "x2", "y")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"no window expected:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("groupedOls plans one partial+final aggregate pair, no window") {
    val df = Seq(("k", 0L, 1L), ("k", 1L, 3L)).toDF("k", "x", "y")
    val p = Regression.groupedOls(df, Seq("k"), "x", "y")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"no window expected:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("bestSplit: perfect split recovered with exact gain; noisy feature scores lower") {
    // x=(1,2,3,4), y=(F,F,T,T): threshold 2 separates perfectly ->
    // gain = parent Gini 0.5; a constant-ish feature gains ~0
    val df = Seq(
      ("k", "x", 1L, false), ("k", "x", 2L, false),
      ("k", "x", 3L, true), ("k", "x", 4L, true),
      ("k", "z", 7L, false), ("k", "z", 7L, true),
      ("k", "z", 8L, false), ("k", "z", 8L, true)
    ).toDF("k", "feat", "v", "y")
    val out = Regression.bestSplit(df, Seq("k"), "feat", "v", "y")
      .collect().map(r => r.getAs[String]("feat") -> r).toMap
    val x = out("x")
    assert(x.getAs[Long]("threshold") == 2L)
    assert(x.getAs[Long]("n_left") == 2L && x.getAs[Long]("pos_left") == 0L)
    assert(x.getAs[Long]("gain_e6") == 500000L)
    // z: both candidate splits leave 50/50 children -> zero gain; tie
    // breaks to the smaller threshold
    val z = out("z")
    assert(z.getAs[Long]("gain_e6") == 0L)
    assert(z.getAs[Long]("threshold") == 7L)
  }

  test("regressionDiscontinuity: hand-computed local linear jump at the cutoff") {
    // left (−3,8),(−2,10),(−1,12): perfect line a=14, b=2, rss=0;
    // right (0,20),(1,23),(2,27): a=59.5/3, b=3.5, rss=1/6, Var(a)=5/36;
    // τ = 19.8333… − 14 = 5.8333…, t = τ/√(5/36) ≈ 15.6525
    val df = (Seq((-3L, 8L), (-2L, 10L), (-1L, 12L),
      (0L, 20L), (1L, 23L), (2L, 27L),
      (100L, 0L), (-100L, 999L)) // outside ±60 — must not move anything
      ).map { case (u, y) => ("k", u, y) }.toDF("key", "r", "y")
    val r = Regression.regressionDiscontinuity(
      df, Seq("key"), "r", "y", cutoff = 0L, bandwidth = 60L).head()
    assert(r.getAs[Long]("n_l") == 3L && r.getAs[Long]("n_r") == 3L)
    assert(r.getAs[Long]("a_l_e6") == 14000000L)
    assert(r.getAs[Long]("b_l_e6") == 2000000L)
    assert(r.getAs[Long]("a_r_e6") == 19833333L)
    assert(r.getAs[Long]("b_r_e6") == 3500000L)
    assert(r.getAs[Long]("tau_e6") == 5833333L)
    val t = r.getAs[Long]("t_e4")
    assert(t > 156000L && t < 157000L, s"t_e4=$t")
    assert(r.getAs[Boolean]("significant"))
  }

  test("regressionDiscontinuity: thin or singular sides null the estimate / the t") {
    // n_r = 1 → no line on the right → null estimate end-to-end
    val thin = Seq(("k", -2L, 10L), ("k", -1L, 12L), ("k", 0L, 20L))
      .toDF("key", "r", "y")
    val r1 = Regression.regressionDiscontinuity(
      thin, Seq("key"), "r", "y", 0L, 60L).head()
    assert(r1.isNullAt(r1.fieldIndex("tau_e6")) && r1.isNullAt(r1.fieldIndex("t_e4")))
    // 2 points per side: estimate computes, t needs 3 → null
    val two = Seq(("k", -2L, 10L), ("k", -1L, 12L), ("k", 0L, 20L), ("k", 1L, 23L))
      .toDF("key", "r", "y")
    val r2 = Regression.regressionDiscontinuity(
      two, Seq("key"), "r", "y", 0L, 60L).head()
    assert(r2.getAs[Long]("tau_e6") == 6000000L) // a_r=20, a_l=14
    assert(r2.isNullAt(r2.fieldIndex("t_e4")))
    // a perfect fit on BOTH sides (zero residual variance) nulls the t
    val perfect = Seq(("k", -3L, 8L), ("k", -2L, 10L), ("k", -1L, 12L),
      ("k", 0L, 20L), ("k", 1L, 23L), ("k", 2L, 26L)).toDF("key", "r", "y")
    val r3 = Regression.regressionDiscontinuity(
      perfect, Seq("key"), "r", "y", 0L, 60L).head()
    assert(r3.getAs[Long]("tau_e6") == 6000000L)
    assert(r3.isNullAt(r3.fieldIndex("t_e4")))
  }
}
