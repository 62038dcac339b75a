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
}
