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
}
