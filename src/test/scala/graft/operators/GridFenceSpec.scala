package graft.operators

import graft.SparkSpec

class GridFenceSpec extends SparkSpec {
  import spark.implicits._

  private def withBound[A](bound: Int)(body: => A): A = {
    val prev = GridFence.maxGridCells
    GridFence.maxGridCells = bound
    try body finally GridFence.maxGridCells = prev
  }

  private def rootMessage(t: Throwable): String = {
    var cur = t
    while (cur.getCause != null) cur = cur.getCause
    String.valueOf(cur.getMessage)
  }

  test("an over-bound per-key value grid fails loud, naming the site") {
    // binWidth=1 over 50 distinct values = 50 cells in one group's grid
    val df = (1 to 50).map(v => ("g", v.toLong)).toDF("g", "v")
    val ex = withBound(8) {
      intercept[Exception] {
        Sketch.binnedQuantiles(df, Seq("g"), "v", 1L, Seq(500)).collect()
      }
    }
    val msg = rootMessage(ex)
    assert(msg.contains("binnedQuantiles"), msg)
    assert(msg.contains("quantize the value axis"), msg)
  }

  test("the struct cell-grid collect has the same fence") {
    val df = (1 to 50).map(v => ("k", s"g${v % 3}", v.toLong))
      .toDF("k", "grp", "v")
    val ex = withBound(8) {
      intercept[Exception] {
        Metrics.kruskalWallis(df, Seq("k"), "grp", "v").collect()
      }
    }
    assert(rootMessage(ex).contains("kruskalWallis"), rootMessage(ex))
  }

  test("within bound, the fenced collect is a transparent collect_list") {
    // 50 cells under a bound of 64: identical output to the unbounded days
    val df = (1 to 200).map(i => (s"g${i % 2}", (i % 50).toLong)).toDF("g", "v")
    val out = withBound(64) {
      Sketch.binnedQuantiles(df, Seq("g"), "v", 1L, Seq(250, 500, 750))
        .orderBy("g", "q_permille").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    }
    // lower rank element: first value whose cum count reaches ⌈q‰·n⌉;
    // g0 holds the 25 even values 0..48 (4 each), g1 the odd 1..49
    assert(out == Seq(
      ("g0", 250, 12L, 100L), ("g0", 500, 24L, 100L), ("g0", 750, 36L, 100L),
      ("g1", 250, 13L, 100L), ("g1", 500, 25L, 100L), ("g1", 750, 37L, 100L)))
  }

  test("the fence is partitioning-independent") {
    val df = (1 to 50).map(v => ("g", v.toLong)).toDF("g", "v")
      .repartition(17)
    val ex = withBound(8) {
      intercept[Exception] {
        Sketch.medianCi(df, Seq("g"), "v").collect()
      }
    }
    assert(rootMessage(ex).contains("medianCi"), rootMessage(ex))
  }
}
