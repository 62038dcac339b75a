package graft.operators

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: textbook lifetable with censoring") {
    // durations: events at 2 (x2), 5; censored at 3, 8
    // t=2: n=5, d=2 -> S = 1e9 * 3/5 = 600000000
    // t=3: n=3, c=1 -> S unchanged
    // t=5: n=2, d=1 -> S = 6e8 * 1/2 = 300000000
    // t=8: n=1, c=1 -> S unchanged
    val df = Seq(
      ("k", 2L, true), ("k", 2L, true), ("k", 3L, false),
      ("k", 5L, true), ("k", 8L, false)
    ).toDF("key", "dur", "ev")
    val out = Survival.kaplanMeier(df, Seq("key"), "dur", "ev")
      .orderBy("duration").collect()
    assert(out.map(_.getAs[Long]("duration")).toSeq == Seq(2L, 3L, 5L, 8L))
    assert(out.map(_.getAs[Long]("n_risk")).toSeq == Seq(5L, 3L, 2L, 1L))
    assert(out.map(_.getAs[Long]("d_events")).toSeq == Seq(2L, 0L, 1L, 0L))
    assert(out.map(_.getAs[Long]("c_censored")).toSeq == Seq(0L, 1L, 0L, 1L))
    assert(out.map(_.getAs[Long]("s_e9")).toSeq ==
      Seq(600000000L, 600000000L, 300000000L, 300000000L))
  }

  test("kaplanMeier: no censoring matches the empirical survival function") {
    // 4 subjects, all events, distinct times: S drops by quarters
    val df = (1 to 4).map(t => ("k", t.toLong, true)).toDF("key", "dur", "ev")
    val s = Survival.kaplanMeier(df, Seq("key"), "dur", "ev")
      .orderBy("duration").collect().map(_.getAs[Long]("s_e9")).toSeq
    assert(s == Seq(750000000L, 500000000L, 250000000L, 0L))
  }

  test("kaplanMeier: survival is monotone nonincreasing and keys are independent") {
    val df = Seq(
      ("a", 1L, true), ("a", 2L, false), ("a", 4L, true), ("a", 4L, true),
      ("b", 1L, false), ("b", 1L, false)
    ).toDF("key", "dur", "ev")
    val out = Survival.kaplanMeier(df, Seq("key"), "dur", "ev").collect()
    val byKey = out.groupBy(_.getString(0))
    byKey.foreach { case (_, rows) =>
      val s = rows.sortBy(_.getAs[Long]("duration")).map(_.getAs[Long]("s_e9"))
      assert(s.zip(s.tail).forall { case (x, y) => y <= x })
    }
    // all-censored key b never drops
    assert(byKey("b").forall(_.getAs[Long]("s_e9") == 1000000000L))
    // null duration / event rows are excluded
    val withNulls = Seq[(String, Option[Long], Option[Boolean])](
      ("k", Some(1L), Some(true)), ("k", None, Some(true)), ("k", Some(2L), None)
    ).toDF("key", "dur", "ev")
    val n = Survival.kaplanMeier(withNulls, Seq("key"), "dur", "ev")
      .agg(org.apache.spark.sql.functions.sum("n_risk")).collect().head.getLong(0)
    assert(n == 1L)
  }

  test("logRank: hand-computed two-group table; identical groups ~0; empty group null") {
    // A: deaths at 1, 2; B: deaths at 2, 3 (no censoring)
    // t=1: n=(2,2), d_A=1 -> E+=.5, V+=.25
    // t=2: n=(1,2), d=2 (one each) -> E+=2/3, V+=2/9
    // t=3: n=(0,1), d=1 -> E+=0, V+=0 (n=1 guard)
    // O_A=2, E_A=7/6, V=17/36 -> chi2 = 25/17 = 1.47058...
    val df = Seq(
      ("k", "A", 1L, true), ("k", "A", 2L, true),
      ("k", "B", 2L, true), ("k", "B", 3L, true)).toDF("k", "g", "dur", "ev")
    val r = Survival.logRank(df, Seq("k"), "g", "dur", "ev", "A", "B")
      .collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("o_a") == 2L)
    assert(r.getAs[Long]("e_a_e9") == 1166666667L)
    assert(r.getAs[Long]("v_e9") == 472222222L)
    assert(r.getAs[Long]("chi2_e4") == 14706L)
    assert(!r.getAs[Boolean]("significant"))
    // identical curves: chi2 == 0
    val same = Seq(
      ("s", "A", 1L, true), ("s", "A", 2L, true),
      ("s", "B", 1L, true), ("s", "B", 2L, true)).toDF("k", "g", "dur", "ev")
    val rs = Survival.logRank(same, Seq("k"), "g", "dur", "ev", "A", "B")
      .collect().head
    assert(rs.getAs[Long]("chi2_e4") == 0L)
    // one group empty -> zero variance -> null verdict
    val one = Seq(("o", "A", 1L, true), ("o", "A", 2L, true))
      .toDF("k", "g", "dur", "ev")
    val ro = Survival.logRank(one, Seq("k"), "g", "dur", "ev", "A", "B")
      .collect().head
    assert(ro.get(ro.fieldIndex("chi2_e4")) == null)
  }

  test("survivalSummary: hand-computed RMST segments and median; no-crossing null") {
    // m: event at t=1 (of 2 at risk), censor at t=3: S = (1, .5, .5)
    // steps; RMST(4) = 1*1 + 2*0.5 + tail 1*0.5 = 2.5 -> 2500 e3;
    // median = 1 (S hits exactly 0.5)
    val m = Seq(("m", 1L, true), ("m", 3L, false))
    // a: both die at t=2: S -> 0; RMST(4) = 2*1 + 0 = 2.0; median 2
    val a = Seq(("a", 2L, true), ("a", 2L, true))
    // c: all censored -> S stays 1 -> median null, RMST = horizon
    val c = Seq(("c", 2L, false), ("c", 4L, false))
    val out = Survival.survivalSummary(
        (m ++ a ++ c).toDF("key0", "dur", "ev"),
        Seq("key0"), "dur", "ev", horizon = 4L)
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(out("m").getAs[Long]("n_subjects") == 2L)
    assert(out("m").getAs[Long]("rmst_e3") == 2500L)
    assert(out("m").getAs[Long]("median_duration") == 1L)
    assert(out("a").getAs[Long]("rmst_e3") == 2000L)
    assert(out("a").getAs[Long]("median_duration") == 2L)
    val rc = out("c")
    assert(rc.getAs[Long]("rmst_e3") == 4000L)
    assert(rc.get(rc.fieldIndex("median_duration")) == null)
  }
}
