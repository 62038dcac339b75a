package graft.operators

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  // (user, t, type) — each user exercises one ordering scenario
  private def events = Seq(
    ("full", 1L, "view"), ("full", 2L, "click"), ("full", 3L, "purchase"),
    ("outoforder", 1L, "purchase"), ("outoforder", 2L, "view"), ("outoforder", 3L, "click"),
    // click BEFORE the first view never counts; the later one does
    ("reclick", 1L, "click"), ("reclick", 2L, "view"), ("reclick", 5L, "click"),
    ("viewonly", 1L, "view"), ("viewonly", 2L, "error"),
    ("tied", 1L, "view"), ("tied", 1L, "click"), // same instant: no ordering proof
    ("none", 1L, "error")
  ).toDF("u", "t", "s")

  test("funnelByKey: stages advance only strictly after the previous stage") {
    val out = Funnel.funnelByKey(events, Seq("u"), "t", "s", stages)
      .collect().map(r => r.getAs[String]("u") -> r.getAs[Int]("stages_completed"))
      .toMap
    assert(out == Map(
      "full" -> 3,
      "outoforder" -> 2, // purchase at t=1 precedes the view: chain stops at click
      "reclick" -> 2,    // the t=1 click is ignored, the t=5 click counts
      "viewonly" -> 1,
      "tied" -> 1))      // equal timestamps cannot prove order
    // "none" has no funnel-stage events at all -> absent
    assert(!out.contains("none"))
  }

  test("funnelByKey records the first qualifying time per stage") {
    val r = Funnel.funnelByKey(events, Seq("u"), "t", "s", stages)
      .filter($"u" === "reclick").collect().head
    assert(r.getAs[Long]("t_0") == 2L)
    assert(r.getAs[Long]("t_1") == 5L)
    assert(r.get(r.fieldIndex("t_2")) == null)
  }

  test("conversionCounts is the per-stage reach, non-increasing") {
    val out = Funnel.conversionCounts(events, Seq("u"), "t", "s", stages)
      .orderBy("stage").collect()
      .map(r => (r.getAs[Int]("stage"), r.getAs[String]("stage_name"),
        r.getAs[Long]("n_reached")))
    assert(out.toSeq == Seq((0, "view", 5L), (1, "click", 3L), (2, "purchase", 1L)))
  }

  test("the chained stage windows share one shuffle") {
    val p = Funnel.funnelByKey(events, Seq("u"), "t", "s", stages)
      .queryExecution.executedPlan.toString
    // one Exchange feeds the whole window chain; the only other one is
    // the final per-key distinct (which shuffles key-sized rows) — a
    // per-stage re-shuffle would show 4+
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      s"expected the chained windows to share one hash partitioning:\n$p")
    assert(p.contains("Window"), p)
  }

  test("cohortRetention: cohorts by first period, exact counts and permille") {
    // u1: weeks 10,11,13  u2: weeks 10,10(dup),11  u3: week 11 only
    val ev = Seq(("u1", 10L), ("u1", 11L), ("u1", 13L),
      ("u2", 10L), ("u2", 10L), ("u2", 11L), ("u3", 11L))
      .toDF("u", "w")
    val out = Funnel.cohortRetention(ev, "u", "w")
      .orderBy("cohort", "offset").collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("offset"),
        r.getAs[Long]("n_users"), r.getAs[Long]("retained_permille")))
    assert(out.toSeq == Seq(
      (10L, 0L, 2L, 1000L), // u1, u2
      (10L, 1L, 2L, 1000L), // both return in week 11
      (10L, 3L, 1L, 500L),  // only u1 reaches week 13
      (11L, 0L, 1L, 1000L)  // u3's own cohort
    ))
  }

  test("cohortRetention ignores null users/periods and dedups within period") {
    val ev = Seq((Some("u"), Some(5L)), (Some("u"), Some(5L)),
      (None, Some(5L)), (Some("v"), None)).toDF("u", "w")
    val out = Funnel.cohortRetention(ev, "u", "w").collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_users") == 1L)
  }

  test("touchAttribution: first/last preceding touch, (none) fallback, tie order") {
    val ev = Seq(
      // classic path: view then click then purchase
      ("a", 1L, 1L, "view"), ("a", 2L, 2L, "click"), ("a", 3L, 3L, "purchase"),
      // no touch before the purchase; a later view must NOT count
      ("b", 1L, 4L, "purchase"), ("b", 2L, 5L, "view"),
      // tie at t=1 broken by the id column: view(id 6) precedes purchase(id 7)
      ("c", 1L, 6L, "view"), ("c", 1L, 7L, "purchase"),
      // non-channel events are pruned before the window
      ("d", 1L, 8L, "error"), ("d", 2L, 9L, "purchase")
    ).toDF("u", "t", "id", "s")
    val out = Funnel.touchAttribution(ev, Seq("u"), "t", "id", "s",
        Seq("view", "click"), "purchase")
      .orderBy("first_touch", "last_touch").collect()
      .map(r => (r.getAs[String]("first_touch"), r.getAs[String]("last_touch"),
        r.getAs[Long]("n_conversions")))
    assert(out.toSeq == Seq(
      ("(none)", "(none)", 2L), // b and d
      ("view", "click", 1L),    // a: first view, last click
      ("view", "view", 1L)))    // c: the tied-but-earlier-id view
  }

  test("rollingActiveUsers: trailing-window distinct membership, trimmed to observed periods") {
    // u1 active weeks 10, 12; u2 week 10 only; u3 week 14
    val ev = Seq(("u1", 10L), ("u1", 12L), ("u1", 12L),
      ("u2", 10L), ("u3", 14L)).toDF("u", "w")
    val out = Funnel.rollingActiveUsers(ev, "u", "w", windowPeriods = 4)
      .orderBy("period").collect()
      .map(r => (r.getAs[Long]("period"), r.getAs[Long]("active_users")))
    assert(out.toSeq == Seq(
      (10L, 2L), // u1, u2 (window 7..10)
      (11L, 2L), (12L, 2L), (13L, 2L), // both via week 10 (u1 also via 12)
      (14L, 2L)  // u1 (week 12 in 11..14) + u3; u2's week 10 aged out
    )) // periods past 14 are trimmed
  }

  test("touchAttribution runs both window scans over one shuffle") {
    val ev = Seq(("a", 1L, 1L, "view"), ("a", 2L, 2L, "purchase"))
      .toDF("u", "t", "id", "s")
    val p = Funnel.touchAttribution(ev, Seq("u"), "t", "id", "s",
      Seq("view", "click"), "purchase").queryExecution.executedPlan.toString
    // one per-key Exchange for the window + the final small group agg
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2, p)
  }

  test("transitionMatrix counts consecutive pairs per key with permille probabilities") {
    val ev = Seq(
      ("u1", 1L, "view"), ("u1", 2L, "click"), ("u1", 3L, "view"),
      ("u1", 4L, "click"), ("u2", 1L, "view"), ("u2", 2L, "buy"))
      .toDF("u", "t", "s")
    val out = Funnel.transitionMatrix(ev, Seq("u"), "t", "s")
      .orderBy("from_state", "to_state").collect()
    val m = out.map(r => (r.getAs[String]("from_state"), r.getAs[String]("to_state")) ->
      (r.getAs[Long]("n"), r.getAs[Long]("p_permille"))).toMap
    assert(m(("view", "click")) == ((2L, 666L))) // view -> {click x2, buy x1}
    assert(m(("view", "buy")) == ((1L, 333L)))
    assert(m(("click", "view")) == ((1L, 1000L)))
    // u1's trailing click and u2's trailing buy emit nothing
    assert(!m.contains(("buy", "view")))
  }

  test("transitionMatrix: sequences never cross keys; ties resolved by tieCols") {
    val ev = Seq(("a", 1L, 1L, "x"), ("a", 2L, 2L, "y"),
      ("b", 1L, 3L, "z")).toDF("u", "t", "id", "s")
    val out = Funnel.transitionMatrix(ev, Seq("u"), "t", "s", tieCols = Seq("id"))
      .collect()
    assert(out.length == 1) // only x->y; z is alone in its key
  }

  test("conversionLag: per-transition count, min, lower median, max") {
    import spark.implicits._
    // u1 converts view@0 -> click@10 -> purchase@100; u2 view@5 -> click@9;
    // u3 clicks without a view (no chain, contributes nothing)
    val ev = Seq(
      ("u1", 0L, "view"), ("u1", 10L, "click"), ("u1", 100L, "purchase"),
      ("u2", 5L, "view"), ("u2", 9L, "click"),
      ("u3", 7L, "click")
    ).toDF("u", "t", "s")
    val out = Funnel.conversionLag(ev, Seq("u"), "t", "s",
        Seq("view", "click", "purchase"))
      .orderBy("stage").collect()
    assert(out.length == 2)
    val s1 = out(0)
    assert(s1.getAs[String]("stage_name") == "view->click")
    assert(s1.getAs[Long]("n_pairs") == 2L)
    assert(s1.getAs[Long]("min_lag") == 4L)
    assert(s1.getAs[Long]("median_lag") == 4L) // lower median of {4, 10}
    assert(s1.getAs[Long]("max_lag") == 10L)
    val s2 = out(1)
    assert(s2.getAs[String]("stage_name") == "click->purchase")
    assert(s2.getAs[Long]("n_pairs") == 1L && s2.getAs[Long]("median_lag") == 90L)
  }

  test("funnelVariantZ: symmetric variants give z = 0; one-sided drop is negative-signed") {
    import spark.implicits._
    // A: 2 users view, 1 clicks; B: identical -> z = 0 at the transition
    def users(v: String, off: Long) = Seq(
      (off + 1, v, 0L, "view"), (off + 1, v, 5L, "click"),
      (off + 2, v, 1L, "view"))
    val ev = (users("A", 0) ++ users("B", 10)).toDF("u", "variant", "t", "s")
    val out = Funnel.funnelVariantZ(ev, Seq("u"), "variant", "t", "s",
      Seq("view", "click", "purchase"), "A", "B").orderBy("stage").collect()
    val s1 = out.head
    assert(s1.getAs[Long]("n_a") == 2L && s1.getAs[Long]("x_a") == 1L)
    assert(s1.getAs[Long]("z_e4") == 0L)
    // degenerate: nobody converts anywhere -> both transitions PRESENT
    // (densified grid) with pooled p = 0 -> null z
    val none = Seq((1L, "A", 0L, "view"), (2L, "B", 0L, "view"))
      .toDF("u", "variant", "t", "s")
    val nz = Funnel.funnelVariantZ(none, Seq("u"), "variant", "t", "s",
      Seq("view", "click", "purchase"), "A", "B").collect()
    assert(nz.length == 2)
    assert(nz.forall(r => r.isNullAt(r.fieldIndex("z_e4"))))
  }

  test("funnelByKey: maxGap caps each transition against the chained prior time") {
    import spark.implicits._
    // u1: click 5 after view (within gap 10); u2: click 20 after view (outside)
    // u3: click at 8 chains, purchase at 30 is > 8+10 -> chain stops at click
    val ev = Seq(
      ("u1", 0L, "view"), ("u1", 5L, "click"),
      ("u2", 0L, "view"), ("u2", 20L, "click"),
      ("u3", 0L, "view"), ("u3", 8L, "click"), ("u3", 30L, "purchase")
    ).toDF("u", "t", "s")
    // purchase stage absent: conversionCounts emits reached stages only
    // (the q147 contract — its oracle's WHERE completed > stage)
    val out = Funnel.conversionCounts(ev, Seq("u"), "t", "s",
        Seq("view", "click", "purchase"), maxGap = Some(10L))
      .orderBy("stage").collect()
    assert(out.map(_.getAs[Long]("n_reached")).toSeq == Seq(3L, 2L))
    // without the cap u2 converts and u3 purchases
    val open = Funnel.conversionCounts(ev, Seq("u"), "t", "s",
        Seq("view", "click", "purchase"))
      .orderBy("stage").collect()
    assert(open.map(_.getAs[Long]("n_reached")).toSeq == Seq(3L, 3L, 1L))
  }

  test("rescanFunnelByKey: a re-entry the chained funnel misses converts here") {
    // u1: view 0 -> click 20 misses gap 10 from view 0, BUT view 15 ->
    //     click 20 is in-gap: chained stops at view, rescan reaches click
    // u2: chain completes identically under both (sanity)
    // u3: click 5 in-gap, purchase 30 out of EVERY click's gap: both stop
    // tied: click at the view's exact time proves nothing in either
    val ev = Seq(
      ("u1", 0L, "view"), ("u1", 15L, "view"), ("u1", 20L, "click"),
      ("u2", 0L, "view"), ("u2", 5L, "click"), ("u2", 9L, "purchase"),
      ("u3", 0L, "view"), ("u3", 5L, "click"), ("u3", 30L, "purchase"),
      ("tied", 0L, "view"), ("tied", 0L, "click")
    ).toDF("u", "t", "s")
    val out = Funnel.rescanFunnelByKey(ev, Seq("u"), "t", "s",
        Seq("view", "click", "purchase"), maxGap = Some(10L))
      .collect().map(r => r.getAs[String]("u") ->
        r.getAs[Int]("stages_completed")).toMap
    assert(out == Map("u1" -> 2, "u2" -> 3, "u3" -> 2, "tied" -> 1))
    val chained = Funnel.funnelByKey(ev, Seq("u"), "t", "s",
        Seq("view", "click", "purchase"), maxGap = Some(10L))
      .collect().map(r => r.getAs[String]("u") ->
        r.getAs[Int]("stages_completed")).toMap
    assert(chained("u1") == 1) // the undercount rescan repairs
    // t_1 is the EARLIEST qualifying click
    val u1 = Funnel.rescanFunnelByKey(ev, Seq("u"), "t", "s",
        Seq("view", "click", "purchase"), maxGap = Some(10L))
      .filter($"u" === "u1").collect().head
    assert(u1.getAs[Long]("t_1") == 20L)
  }

  test("rescanConversionCounts: unbounded gap equals the open chained funnel's reach") {
    // with no gap both semantics admit any later event: reach must agree
    val out = Funnel.rescanConversionCounts(events, Seq("u"), "t", "s", stages)
      .orderBy("stage").collect()
      .map(r => (r.getAs[Int]("stage"), r.getAs[Long]("n_reached")))
    assert(out.toSeq == Seq((0, 5L), (1, 3L), (2, 1L)))
  }

  test("rescan's flag windows still share one shuffle") {
    val p = Funnel.rescanFunnelByKey(events, Seq("u"), "t", "s", stages,
        maxGap = Some(10L))
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 1,
      s"expected the RANGE-frame windows + groupBy to share one hash partitioning:\n$p")
  }

  test("funnelByKeyAgg equals funnelByKey on the scenario fixture and LCG streams") {
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    // the scenario fixture (ties, out-of-order, re-entry, absent keys)
    assert(rows(Funnel.funnelByKeyAgg(events, Seq("u"), "t", "s", stages)) ==
      rows(Funnel.funnelByKey(events, Seq("u"), "t", "s", stages)))
    // LCG streams with and without the gap cap
    var x = 9L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    val ev = (1 to 300).map { _ =>
      ("u" + math.floorMod(next(), 7L), math.floorMod(next(), 50L),
        "s" + math.floorMod(next(), 3L))
    }.toDF("u", "t", "s")
    val st = Seq("s0", "s1", "s2")
    Seq(None, Some(8L), Some(20L)).foreach { gap =>
      assert(rows(Funnel.funnelByKeyAgg(ev, Seq("u"), "t", "s", st, gap)) ==
        rows(Funnel.funnelByKey(ev, Seq("u"), "t", "s", st, gap)),
        s"gap=$gap diverged")
    }
  }

  test("conversionCountsAuto equals the window path on skewed AND uniform keys") {
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    var x = 11L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    // skewed: one user owns 90% of events; uniform: round-robin users
    val hot = (1 to 300).map { i =>
      val u = if (i <= 270) "u0" else "u" + (math.floorMod(next(), 9L) + 1)
      (u, math.floorMod(next(), 50L), "s" + math.floorMod(next(), 3L))
    }.toDF("u", "t", "s")
    val uni = (1 to 300).map { i =>
      ("u" + (i % 50), math.floorMod(next(), 50L), "s" + math.floorMod(next(), 3L))
    }.toDF("u", "t", "s")
    val st = Seq("s0", "s1", "s2")
    for (ev <- Seq(hot, uni))
      assert(rows(Funnel.conversionCountsAuto(ev, Seq("u"), "t", "s", st)) ==
        rows(Funnel.conversionCounts(ev, Seq("u"), "t", "s", st)))
  }

  test("aggRouteWins: bounded window penalty gates the time crossover") {
    val ceil = 50000000L
    // 3+ stages: pass count >= the measured elapsed bound (3) — the agg
    // path can NEVER win on time, at any skew (the round-13 parity bug)
    assert(!Funnel.aggRouteWins(3, mx = 10000000L, tot = 11000000L,
      slots = 32, ceil))
    assert(!Funnel.aggRouteWins(5, mx = 999999L, tot = 1000000L,
      slots = 32, ceil))
    // 2 stages: engages past 2 per-slot shares, stays plain below
    assert(Funnel.aggRouteWins(2, mx = 100L, tot = 400L, slots = 32, ceil))
    assert(!Funnel.aggRouteWins(2, mx = 20L, tot = 400L, slots = 32, ceil))
    // empty probe: nothing to route
    assert(!Funnel.aggRouteWins(2, mx = 0L, tot = 0L, slots = 32, ceil))
    // survival ceiling: past ~50M pruned rows on ONE key the window's
    // single task is a straggler/memory hazard — engage at any stage count
    assert(Funnel.aggRouteWins(4, mx = ceil + 1, tot = ceil * 2,
      slots = 1000, ceil))
  }

  test("funnelByKeyAgg plans map-side partial minima (no Window node)") {
    val p = Funnel.funnelByKeyAgg(events, Seq("u"), "t", "s", stages)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"the aggregate path must not plan a window:\n$p")
    assert(p.contains("partial_min") || p.linesIterator.exists(l =>
      l.contains("HashAggregate") && l.contains("partial")),
      s"expected map-side partial aggregation:\n$p")
  }

  test("funnelVariantZ: a variant with ZERO conversions still scores (densified grid)") {
    // A: 2 view, 1 clicks; B: 2 view, 0 click — the strongest effect;
    // the stage-1 row must exist with x_b = 0 and a computable z
    val ev = Seq(
      (1L, "A", 0L, "view"), (1L, "A", 5L, "click"), (2L, "A", 1L, "view"),
      (11L, "B", 0L, "view"), (12L, "B", 1L, "view"))
      .toDF("u", "variant", "t", "s")
    val out = Funnel.funnelVariantZ(ev, Seq("u"), "variant", "t", "s",
      Seq("view", "click", "purchase"), "A", "B").orderBy("stage").collect()
    val s1 = out.head
    assert(s1.getAs[Long]("n_b") == 2L && s1.getAs[Long]("x_b") == 0L)
    assert(s1.getAs[Long]("rate_b_e6") == 0L)
    // p1 = .5, p2 = 0, pooled = .25 -> z = .5 / sqrt(.25*.75*1) = 1.1547
    assert(s1.getAs[Long]("z_e4") == 11547L)
  }

  test("rfmSegments: exact quantile-fence scores and segment labels") {
    // user i (1..5): i events, last at day i-1, each valued 10 cents ->
    // recency 4..0 days, freq 1..5, monetary 10..50: every dimension is
    // a clean 5-point grid, so buckets=5 gives scores 1..5 per dim
    val day = 86400000000L
    val rows = (1 to 5).flatMap { i =>
      (1 to i).map(j => (i.toLong, (i - 1) * day - (i - j), 10L))
    }
    val df = rows.toDF("u", "ts", "v")
    val out = Funnel.rfmSegments(df, "u", "ts", "v", buckets = 5)
      .collect()
      .map(r => (r.getAs[Int]("r_score"), r.getAs[Int]("f_score"),
        r.getAs[Int]("m_score")) -> r).toMap
    // u5: most recent, most frequent, biggest spender -> (5,5,5) champion
    assert(out((5, 5, 5)).getAs[String]("segment") == "champion")
    assert(out((5, 5, 5)).getAs[Long]("n_users") == 1L)
    assert(out((5, 5, 5)).getAs[Long]("monetary_sum") == 50L)
    // u4 -> (4,4,4) also champion (>= buckets-1 on all three)
    assert(out((4, 4, 4)).getAs[String]("segment") == "champion")
    // u1: stale, single event -> (1,1,1) churned
    assert(out((1, 1, 1)).getAs[String]("segment") == "churned")
    // u2 -> (2,2,2) churned; u3 -> (3,3,3) other
    assert(out((2, 2, 2)).getAs[String]("segment") == "churned")
    assert(out((3, 3, 3)).getAs[String]("segment") == "other")
    assert(out.size == 5)
  }

  test("rfmSegments: monetaryBin coarsens scoring but not sums") {
    val day = 86400000000L
    val rows = (1 to 4).map(i => (i.toLong, i * day, 100L + i))
    val out = Funnel.rfmSegments(rows.toDF("u", "ts", "v"), "u", "ts", "v",
      buckets = 5, monetaryBin = 1000L).collect()
    // all monetary values bin to 0 -> single m_score band; exact sums kept
    assert(out.map(_.getAs[Int]("m_score")).distinct.length == 1)
    assert(out.map(_.getAs[Long]("monetary_sum")).sum == 101L + 102L + 103L + 104L)
  }

  test("markovEntropyRate: deterministic flows score 1.0; a half split scores 1/3") {
    // g: A<->B strictly alternating across both sequences -> H = 0,
    // predictability exactly 1
    val g = Seq(("g", 1L, 1L, "A"), ("g", 1L, 2L, "B"), ("g", 1L, 3L, "A"),
      ("g", 1L, 4L, "B"), ("g", 1L, 5L, "A"), ("g", 2L, 1L, "A"),
      ("g", 2L, 2L, "B"))
    // x: one sequence A B A C: from A the next splits 50/50, from B it
    // is fixed -> rate = (2/3) ln 2; K = 3 over the from∪to alphabet
    // (C only ever appears as a to-state but still enlarges it)
    val x = Seq(("x", 1L, 1L, "A"), ("x", 1L, 2L, "B"), ("x", 1L, 3L, "A"),
      ("x", 1L, 4L, "C"))
    // r: single FROM-state but three union states (B, C terminal-only):
    // under the old from-only normalization H(next|A) = ln 2 > ln K = 0
    // would go negative — the union alphabet keeps pred in [0, 1]
    val r = Seq(("r", 1L, 1L, "A"), ("r", 1L, 2L, "B"),
      ("r", 2L, 1L, "A"), ("r", 2L, 2L, "C"))
    // z: pure self-loop -> union K = 1 -> null predictability
    val z = Seq(("z", 1L, 1L, "A"), ("z", 1L, 2L, "A"))
    val out = Funnel.markovEntropyRate(
      (g ++ x ++ r ++ z).toDF("grp", "u", "t", "s"),
      Seq("grp"), Seq("u"), "t", "s").collect()
      .map(rr => rr.getAs[String]("grp") -> rr).toMap
    assert(out("g").getAs[Long]("entropy_rate_e9") == 0L)
    assert(out("g").getAs[Long]("predictability_e6") == 1000000L)
    val h2 = math.floor(-0.5 * math.log(0.5) * 1e9 + 0.5).toLong
    val rate = (2L * 2L * h2) / 3L // num = ns_A * h_A = 2 * 2*h2; div N=3
    assert(out("x").getAs[Long]("n_states") == 3L)
    assert(out("x").getAs[Long]("entropy_rate_e9") == rate)
    val pred = math.floor(
      (1.0 - rate.toDouble / 1e9 / math.log(3.0)) * 1e6 + 0.5).toLong
    assert(out("x").getAs[Long]("predictability_e6") == pred)
    val rrow = out("r")
    assert(rrow.getAs[Long]("n_states") == 3L)
    val rRate = 2L * h2 // num = 2 * (2*h2) div N = 2
    assert(rrow.getAs[Long]("entropy_rate_e9") == rRate)
    val rPred = math.floor(
      (1.0 - rRate.toDouble / 1e9 / math.log(3.0)) * 1e6 + 0.5).toLong
    assert(rrow.getAs[Long]("predictability_e6") == rPred)
    val zrow = out("z")
    assert(zrow.getAs[Long]("n_states") == 1L)
    assert(zrow.getAs[Long]("entropy_rate_e9") == 0L)
    assert(zrow.get(zrow.fieldIndex("predictability_e6")) == null)
  }
}
