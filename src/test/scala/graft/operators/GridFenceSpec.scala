package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Drives the GridFence contract: the bound is a per-call PARAMETER
  * (no process global to save/restore — round-17 refactor), so the
  * failure path is exercised by passing a tiny bound directly to
  * `collectGrid`/`collectCells`, and the ten operator call sites are
  * pinned by plan inspection (each fenced plan carries `raise_error`
  * with its own site name at the default bound). */
class GridFenceSpec extends SparkSpec {
  import spark.implicits._

  private def rootMessage(t: Throwable): String = {
    var cur = t
    while (cur.getCause != null) cur = cur.getCause
    String.valueOf(cur.getMessage)
  }

  // the operators' own grid shape: per-key (value, count) cells
  private def gridAgg(df: DataFrame, bound: Int): DataFrame =
    df.groupBy("g", "v").agg(count(lit(1)).as("__c"))
      .groupBy("g")
      .agg(GridFence.collectGrid(array(col("v"), col("__c")),
        "specSite", maxCells = bound).as("__grid"))

  test("an over-bound per-key value grid fails loud, naming the site") {
    // 50 distinct values = 50 cells in one group's grid, bound 8
    val df = (1 to 50).map(v => ("g", v.toLong)).toDF("g", "v")
    val ex = intercept[Exception] { gridAgg(df, 8).collect() }
    val msg = rootMessage(ex)
    assert(msg.contains("specSite"), msg)
    assert(msg.contains("quantize the value axis"), msg)
  }

  test("the struct cell-grid collect has the same fence") {
    val df = (1 to 50).map(v => ("k", s"g${v % 3}", v.toLong))
      .toDF("k", "grp", "v")
    val cells = df.groupBy("k", "grp", "v").agg(count(lit(1)).as("__c"))
      .groupBy("k")
      .agg(GridFence.collectCells(col("grp"), col("v"), col("__c"),
        "structSite", maxCells = 8).as("__cells"))
    val ex = intercept[Exception] { cells.collect() }
    assert(rootMessage(ex).contains("structSite"), rootMessage(ex))
  }

  test("within bound, the fenced collect is a transparent collect_list") {
    // 50 cells under the default bound: identical output to the
    // unbounded days, through a real operator end-to-end
    val df = (1 to 200).map(i => (s"g${i % 2}", (i % 50).toLong)).toDF("g", "v")
    val out = Sketch.binnedQuantiles(df, Seq("g"), "v", 1L, Seq(250, 500, 750))
      .orderBy("g", "q_permille").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    // lower rank element: first value whose cum count reaches ⌈q‰·n⌉;
    // g0 holds the 25 even values 0..48 (4 each), g1 the odd 1..49
    assert(out == Seq(
      ("g0", 250, 12L, 100L), ("g0", 500, 24L, 100L), ("g0", 750, 36L, 100L),
      ("g1", 250, 13L, 100L), ("g1", 500, 25L, 100L), ("g1", 750, 37L, 100L)))
  }

  test("the fence is partitioning-independent") {
    val df = (1 to 50).map(v => ("g", v.toLong)).toDF("g", "v")
      .repartition(17)
    val ex = intercept[Exception] { gridAgg(df, 8).collect() }
    assert(rootMessage(ex).contains("specSite"), rootMessage(ex))
  }

  test("every grid-kernel operator wires the fence with its own site name") {
    // plan inspection at the default bound: the analyzed plan of each
    // operator must carry raise_error with the operator's site string —
    // this is what guarantees a contract violation in production dies
    // WITH the message, per call site, without mutating any global
    val df = (1 to 40).map(i => (s"g${i % 2}", s"t${i % 3}", i.toLong))
      .toDF("g", "grp", "v")
    val plans: Seq[(String, DataFrame)] = Seq(
      "binnedQuantiles" -> Sketch.binnedQuantiles(df, Seq("g"), "v", 1L, Seq(500)),
      "madOutliers" -> Sketch.madOutliers(df, Seq("g"), "v", 3L),
      "huberLocation" -> Sketch.huberLocation(df, Seq("g"), "v"),
      "medianCi" -> Sketch.medianCi(df, Seq("g"), "v"),
      "trimmedMean" -> Sketch.trimmedMean(df, Seq("g"), "v", 100),
      "brownForsythe" -> Metrics.brownForsythe(df, Seq("g"), "grp", "v"),
      "kruskalWallis" -> Metrics.kruskalWallis(df, Seq("g"), "grp", "v"),
      "jonckheereTerpstra" -> Metrics.jonckheereTerpstra(df, Seq("g"), "grp", "v"),
      "dunnTest" -> Metrics.dunnTest(df, Seq("g"), "grp", "v"),
      "moodMedianTest" -> Metrics.moodMedianTest(df, Seq("g"), "grp", "v"))
    plans.foreach { case (site, plan) =>
      val s = plan.queryExecution.analyzed.toString
      assert(s.contains("raise_error") && s.contains(site),
        s"$site: fence missing from analyzed plan")
    }
  }
}
