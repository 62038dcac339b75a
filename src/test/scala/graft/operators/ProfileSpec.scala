package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Option(1L), Option("b"), Option(2.5)),
    (Option(2L), Option("a"), None),
    (Option(2L), None, Option(10.0)),
    (None, Option("a"), Option(2.5))
  ).toDF("id", "s", "x")

  test("profile: one row per column with exact counts and string ranges") {
    val out = Profile.profile(df, Seq("id", "s", "x"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(out.toSeq == Seq(
      ("id", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b"),
      ("x", 4L, 1L, 2L, "10.0", "2.5"))) // STRING order: "10.0" < "2.5"
  }

  test("profile: single scan (no union of per-column jobs) and loud guards") {
    val p = Profile.profile(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Union"), s"profile must not union per-column scans:\n$p")
    val e = intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("id", "nope")) }
    assert(e.getMessage.contains("nope"))
    intercept[IllegalArgumentException] { Profile.profile(df, Nil) }
  }

  test("profile: an EMPTY input still emits one all-zero row per column") {
    // the round-17 contract pin: the stack+groupBy grid alone emits zero
    // rows on an empty frame; the column-list seed restores the one-row-
    // per-column shape so profileDiff can report the empty side as drift
    val out = Profile.profile(df.limit(0), Seq("id", "s", "x"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5))))
    assert(out.toSeq == Seq(
      ("id", 0L, 0L, 0L, None, None),
      ("s", 0L, 0L, 0L, None, None),
      ("x", 0L, 0L, 0L, None, None)))
  }

  test("profileDiff: an empty AFTER side reports per-column, not silence") {
    val before = Seq((Option(1L), "a"), (Option(2L), "b")).toDF("k", "s")
    val out = Profile.profileDiff(before, before.limit(0), Seq("k", "s"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_before"),
        r.getAs[Long]("n_after"), r.getAs[Boolean]("range_changed")))
    // the "producer started emitting empties" scenario: 2 rows, n_after=0,
    // range flagged as changed (non-null -> null extremes)
    assert(out.toSeq == Seq(("k", 2L, 0L, true), ("s", 2L, 0L, true)))
  }

  test("mutualInfo: independent columns score ~0; identical columns score H(X)") {
    import spark.implicits._
    // independent: every (x, y) cell equally likely
    val ind = (for (x <- Seq("a", "b"); y <- Seq("p", "q"); _ <- 1 to 5)
      yield (x, y)).toDF("x", "y")
    val mi0 = Profile.mutualInfo(ind, "x", "y").collect().head.getAs[Long]("mi_e9")
    assert(mi0 == 0L)
    // identical: I(X;X) = H(X) = ln 2 for a fair binary column
    val same = Seq.fill(10)("a").map(v => (v, v))
      .++(Seq.fill(10)("b").map(v => (v, v))).toDF("x", "y")
    val mi1 = Profile.mutualInfo(same, "x", "y").collect().head.getAs[Long]("mi_e9")
    assert(math.abs(mi1 - math.round(math.log(2) * 1e9)) <= 2,
      s"expected ~ln2 nanonats, got $mi1")
  }

  test("profileDiff: planted null spike, distinct collapse, and range change") {
    import spark.implicits._
    val before = Seq((Option(1L), "a"), (Option(2L), "b"), (Option(3L), "c"),
      (Option(4L), "d")).toDF("k", "s")
    val after = Seq((Option(1L), "a"), (None, "a"), (None, "a"),
      (Option(9L), "a")).toDF("k", "s")
    val out = Profile.profileDiff(before, after, Seq("k", "s"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_before"),
        r.getAs[Long]("n_after"), r.getAs[Long]("null_pm_before"),
        r.getAs[Long]("null_pm_after"), r.getAs[Long]("distinct_before"),
        r.getAs[Long]("distinct_after"), r.getAs[Boolean]("range_changed")))
    assert(out.toSeq == Seq(
      // k: 2 of 4 nulls after (500 permille), max 4 -> 9
      ("k", 4L, 4L, 0L, 500L, 4L, 2L, true),
      // s: distinct collapse 4 -> 1, range "a".."d" -> "a".."a"
      ("s", 4L, 4L, 0L, 0L, 4L, 1L, true)))
  }

  test("chiSquare: independence scores 0; identical columns max Cramér's V") {
    import spark.implicits._
    val ind = (for (x <- Seq("a", "b"); y <- Seq("p", "q"); _ <- 1 to 5)
      yield (x, y)).toDF("x", "y")
    val r0 = Profile.chiSquare(ind, "x", "y").collect().head
    assert(r0.getAs[Long]("chi2_e6") == 0L && r0.getAs[Long]("cramers_v_e6") == 0L)
    val same = (Seq.fill(6)("a") ++ Seq.fill(4)("b")).map(v => (v, v)).toDF("x", "y")
    val r1 = Profile.chiSquare(same, "x", "y").collect().head
    // identical columns: chi2 = n*min(r-1,c-1) -> V = 1 exactly
    assert(r1.getAs[Long]("n_rows") == 10L)
    assert((r1.getAs[Long]("cramers_v_e6") - 1000000L).abs <= 1L)
  }

  test("benfordDigits: exact shares, Benford constants, and positivity filter") {
    import spark.implicits._
    // group g: digits 1,1,1,2 over 4 values; zero/negative/null excluded
    val df = Seq[(String, Option[Long])](
      ("g", Some(100L)), ("g", Some(19L)), ("g", Some(1L)), ("g", Some(25L)),
      ("g", Some(0L)), ("g", Some(-7L)), ("g", None),
      ("h", Some(9L))
    ).toDF("grp", "v")
    val out = Profile.benfordDigits(df, Seq("grp"), "v")
      .orderBy("grp", "digit").collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Int]("digit"),
        r.getAs[Long]("n_d"), r.getAs[Long]("n"),
        r.getAs[Long]("share_e6"), r.getAs[Long]("benford_e6")))
    // benford_e6(1) = round(log10(2)*1e6) = 301030; (2) = 176091; (9) = 45757
    assert(out.toSeq == Seq(
      ("g", 1, 3L, 4L, 750000L, 301030L),
      ("g", 2, 1L, 4L, 250000L, 176091L),
      ("h", 9, 1L, 1L, 1000000L, 45757L)))
  }

  test("mutualInfo excludes nulls from both axes") {
    import spark.implicits._
    val df = Seq[(String, String)](("a", "p"), ("a", null), (null, "q"), ("b", "q"))
      .toDF("x", "y")
    val r = Profile.mutualInfo(df, "x", "y").collect().head
    assert(r.getAs[Long]("n_rows") == 2)
    assert(r.getAs[Long]("nx_distinct") == 2 && r.getAs[Long]("ny_distinct") == 2)
  }

  test("corrPairs: perfect, anti, and independent pairs") {
    import spark.implicits._
    // b = 2a (r = 1), c = -a (r = -1), d independent of a by construction
    val df = Seq((1L, 2L, -1L, 1L), (2L, 4L, -2L, -1L),
      (3L, 6L, -3L, -1L), (4L, 8L, -4L, 1L))
      .toDF("a", "b", "c", "d")
    val m = Profile.corrPairs(df, Seq("a", "b", "c", "d")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(m(("a", "b")).getAs[Long]("r_e6") == 1000000L)
    assert(m(("a", "c")).getAs[Long]("r_e6") == -1000000L)
    assert(m(("b", "c")).getAs[Long]("r_e6") == -1000000L)
    // a = (1,2,3,4) vs d = (1,-1,-1,1): cov = 0 exactly
    assert(m(("a", "d")).getAs[Long]("r_e6") == 0L)
    assert(m.size == 6 && m(("a", "b")).getAs[Long]("n") == 4L)
  }

  test("corrPairs: constant column emits null r; null rows drop listwise") {
    import spark.implicits._
    val df = Seq[(Option[Long], Option[Long], Option[Long])](
      (Some(1L), Some(5L), Some(1L)), (Some(2L), Some(5L), Some(4L)),
      (Some(3L), Some(5L), None), (None, Some(5L), Some(9L)))
      .toDF("x", "k", "y")
    val m = Profile.corrPairs(df, Seq("x", "k", "y")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // only 2 complete rows survive listwise deletion
    assert(m(("x", "y")).getAs[Long]("n") == 2L)
    val xk = m(("x", "k"))
    assert(xk.isNullAt(xk.fieldIndex("r_e6")))
    // 2 points on a line: r = 1
    assert(m(("x", "y")).getAs[Long]("r_e6") == 1000000L)
  }

  test("concentration: monopoly, uniform, and mixed groups") {
    import spark.implicits._
    val df = Seq(("mono", "a"), ("mono", "a"), ("mono", "a"),
      ("uni", "a"), ("uni", "b"), ("uni", "c"), ("uni", "d"),
      ("mix", "a"), ("mix", "a"), ("mix", "a"), ("mix", "b"))
      .toDF("grp", "item")
    val m = Profile.concentration(df, Seq("grp"), "item").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("mono").getAs[Long]("hhi_e6") == 1000000L)
    assert(m("mono").getAs[Long]("top_share_e6") == 1000000L)
    // 4 equal items: HHI = 1/4
    assert(m("uni").getAs[Long]("hhi_e6") == 250000L)
    assert(m("uni").getAs[Long]("n_items") == 4L)
    // shares 3/4 and 1/4: HHI = (9 + 1)/16 = 625000
    assert(m("mix").getAs[Long]("hhi_e6") == 625000L)
    assert(m("mix").getAs[Long]("top_share_e6") == 750000L)
  }

  test("kAnonymity: hand-built classes with a singleton and a homogeneous class") {
    import spark.implicits._
    // classes: (a) 1 row; (b) 2 rows same sensitive; (c) 5 rows, 3 values
    val df = Seq(
      ("a", "x", 1L),
      ("b", "x", 9L), ("b", "x", 9L),
      ("c", "y", 1L), ("c", "y", 2L), ("c", "y", 3L), ("c", "y", 1L), ("c", "y", 2L)
    ).toDF("q1", "q2", "sens")
    val r = Profile.kAnonymity(df, Seq("q1", "q2"), "sens", k = 3).collect().head
    assert(r.getAs[Long]("n_rows") == 8L && r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("min_class_size") == 1L)
    assert(r.getAs[Long]("rows_below_k") == 3L) // the 1-row and 2-row classes
    assert(r.getAs[Long]("share_below_k_e6") == 375000L)
    assert(r.getAs[Long]("min_l_diversity") == 1L)
    assert(r.getAs[Long]("classes_l1") == 2L) // a and b are homogeneous
  }

  test("spearman: monotone nonlinear is exactly 1e6, reversed is -1e6, ties handled") {
    import spark.implicits._
    // y = x^3: nonlinear but strictly monotone -> rho = 1
    val mono = (1L to 8L).map(x => ("m", x, x * x * x))
    val rev = (1L to 8L).map(x => ("r", x, -x))
    val df = (mono ++ rev).toDF("grp", "x", "y")
    val m = Profile.spearman(df, Seq("grp"), "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("m").getAs[Long]("rho_e6") == 1000000L)
    assert(m("r").getAs[Long]("rho_e6") == -1000000L)
    // constant y: zero variance -> null
    val const = Seq(("c", 1L, 5L), ("c", 2L, 5L)).toDF("grp", "x", "y")
    val cr = Profile.spearman(const, Seq("grp"), "x", "y").collect().head
    assert(cr.isNullAt(cr.fieldIndex("rho_e6")))
  }

  test("tCloseness: hand-computed TVD including the missing-value mass") {
    // global {A:2, B:2}; class g1 = {A,A,B}: dist (2/3,1/3) vs (1/2,1/2)
    // → TVD = 1/6; class g2 = {B}: dist (0,1) → TVD = 1/2, where A's
    // entire global mass comes from the MISSING-value term
    val d = Seq(("g1", "A"), ("g1", "A"), ("g1", "B"), ("g2", "B"))
      .toDF("grp", "v")
    val out = Profile.tCloseness(d, Seq("grp"), "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("g1").getAs[Long]("n") == 3L)
    assert(out("g1").getAs[Long]("n_values") == 2L)
    assert(out("g1").getAs[Long]("tvd_e6") == 166667L)
    assert(out("g2").getAs[Long]("n") == 1L)
    assert(out("g2").getAs[Long]("n_values") == 1L)
    assert(out("g2").getAs[Long]("tvd_e6") == 500000L)
    // a class that IS the population has zero distance
    val same = Seq(("g", "A"), ("g", "B")).toDF("grp", "v")
    val s = Profile.tCloseness(same, Seq("grp"), "v").collect().head
    assert(s.getAs[Long]("tvd_e6") == 0L)
  }
}
