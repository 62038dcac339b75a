package graft.operators

import graft.SparkSpec

class PageTrendSpec extends SparkSpec {
  import spark.implicits._

  test("perfect monotone trend over 2 blocks gives z = 2.0 exactly") {
    // per block ranks 1,2,3 -> 2R = (4, 8, 12); 2L = 4 + 16 + 36 = 56;
    // 4E = n·k(k+1)² = 96; Var = n·k²(k+1)(k²−1)/144 = 4;
    // z = (112 − 96)/(4·2) = 2.0
    val df = Seq(
      ("k", "b1", "A", 1L), ("k", "b1", "B", 2L), ("k", "b1", "C", 3L),
      ("k", "b2", "A", 10L), ("k", "b2", "B", 20L), ("k", "b2", "C", 30L))
      .toDF("key", "blk", "trt", "v")
    val Array(r) = Metrics.pageTrend(df, Seq("key"), "blk", "trt", "v").collect()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getBoolean(5)) == (2L, 3L, 56L, 20000L, true))
  }

  test("within-block ties ride the midrank identity") {
    // each block: A=B tied (2r = 3 each), C top (2r = 6);
    // 2L = 1·6 + 2·6 + 3·12 = 54; z = (108 − 96)/(4·2) = 1.5
    val df = Seq(
      ("k", "b1", "A", 1L), ("k", "b1", "B", 1L), ("k", "b1", "C", 2L),
      ("k", "b2", "A", 5L), ("k", "b2", "B", 5L), ("k", "b2", "C", 9L))
      .toDF("key", "blk", "trt", "v")
    val Array(r) = Metrics.pageTrend(df, Seq("key"), "blk", "trt", "v").collect()
    assert((r.getLong(3), r.getLong(4), r.getBoolean(5)) == (54L, 15000L, false))
  }

  test("incomplete blocks drop; the complete ones still read") {
    val df = Seq(
      ("k", "b1", "A", 1L), ("k", "b1", "B", 2L), ("k", "b1", "C", 3L),
      ("k", "b2", "A", 10L), ("k", "b2", "B", 20L), ("k", "b2", "C", 30L),
      ("k", "b3", "A", 7L), ("k", "b3", "B", 8L)) // missing C -> drops
      .toDF("key", "blk", "trt", "v")
    val Array(r) = Metrics.pageTrend(df, Seq("key"), "blk", "trt", "v").collect()
    assert((r.getLong(1), r.getLong(3)) == (2L, 56L))
  }

  test("a single-treatment key emits null z") {
    val df = Seq(("k", "b1", "A", 1L), ("k", "b2", "A", 2L))
      .toDF("key", "blk", "trt", "v")
    val Array(r) = Metrics.pageTrend(df, Seq("key"), "blk", "trt", "v").collect()
    assert(r.getLong(2) == 1L && r.isNullAt(4) && r.isNullAt(5))
  }
}
