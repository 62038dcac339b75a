package graft.operators

import graft.SparkSpec

class QuadeSpec extends SparkSpec {
  import spark.implicits._

  test("F matches the hand-computed range-weighted case") {
    // b1: A=1,B=2,C=3 (range 2, Q=1); b2: A=10,C=20,B=30 (range 20, Q=2)
    // S_j = (−3, 2, 1); A = ΣS² = 10; B = (1/n)ΣS_j² = 7;
    // F = (n−1)·B/(A−B) = 7/3 = 2.333333 → f_e6 = 2333333
    val df = Seq(
      ("k", "b1", "A", 1L), ("k", "b1", "B", 2L), ("k", "b1", "C", 3L),
      ("k", "b2", "A", 10L), ("k", "b2", "B", 30L), ("k", "b2", "C", 20L))
      .toDF("key", "blk", "trt", "v")
    val Array(r) = Metrics.quadeTest(df, Seq("key"), "blk", "trt", "v").collect()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == (2L, 3L, 2L, 2L, 2333333L))
  }

  test("internally tied blocks carry no evidence: A = B emits null F") {
    val df = Seq(
      ("k", "b1", "A", 5L), ("k", "b1", "B", 5L), ("k", "b1", "C", 5L),
      ("k", "b2", "A", 9L), ("k", "b2", "B", 9L), ("k", "b2", "C", 9L))
      .toDF("key", "blk", "trt", "v")
    val Array(r) = Metrics.quadeTest(df, Seq("key"), "blk", "trt", "v").collect()
    assert(r.isNullAt(5))
  }

  test("incomplete blocks drop before the weight ranking") {
    val df = Seq(
      ("k", "b1", "A", 1L), ("k", "b1", "B", 2L), ("k", "b1", "C", 3L),
      ("k", "b2", "A", 10L), ("k", "b2", "B", 30L), ("k", "b2", "C", 20L),
      ("k", "b3", "A", 0L), ("k", "b3", "B", 999L)) // missing C
      .toDF("key", "blk", "trt", "v")
    val Array(r) = Metrics.quadeTest(df, Seq("key"), "blk", "trt", "v").collect()
    assert((r.getLong(1), r.getLong(5)) == (2L, 2333333L))
  }

  test("tied block ranges take midrank weights") {
    // two blocks with IDENTICAL range 2 -> both get 2Q = 2+2−1 = 3
    // (midrank 1.5); same centered ranks as the first test's b1 in both
    // blocks: S_j scale by 1.5 vs (1,2) — F changes accordingly
    val df = Seq(
      ("k", "b1", "A", 1L), ("k", "b1", "B", 2L), ("k", "b1", "C", 3L),
      ("k", "b2", "A", 11L), ("k", "b2", "B", 12L), ("k", "b2", "C", 13L))
      .toDF("key", "blk", "trt", "v")
    // per block: 2r−4 = (−2, 0, 2), 2Q = 3 → 4S = (−6, 0, 6);
    // S4_j = (−12, 0, 12) → SB4 = 288; A4 = 4·36 = 144;
    // F = 1·288/(2·144 − 288) → denominator 0 → null (perfect
    // consistency degenerates the within-block error term)
    val Array(r) = Metrics.quadeTest(df, Seq("key"), "blk", "trt", "v").collect()
    assert(r.isNullAt(5))
  }
}
