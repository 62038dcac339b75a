package graft.operators

import graft.SparkSpec

class DunnSpec extends SparkSpec {
  import spark.implicits._

  // hand-computed case: A = {1,2,3}, B = {2,3,4}, C = {5,6}, n = 8.
  // midranks: 1→1, 2→2.5, 3→4.5, 4→6, 5→7, 6→8; mean ranks
  // A = 8/3, B = 13/3, C = 7.5; ties T = Σ(t³−t) = 12;
  // factor = n(n+1)/12 − T/(12(n−1)) = 6 − 1/7 = 5.857142857.
  private def df = Seq(
    ("k", "A", 1L), ("k", "A", 2L), ("k", "A", 3L),
    ("k", "B", 2L), ("k", "B", 3L), ("k", "B", 4L),
    ("k", "C", 5L), ("k", "C", 6L)).toDF("key", "grp", "v")

  test("pairwise z's match the hand-computed tie-corrected values") {
    val out = Metrics.dunnTest(df, Seq("key"), "grp", "v")
      .orderBy("group_a", "group_b").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    // z(A,B) = (8/3 − 13/3)/sqrt(5.857143·(1/3+1/3)) = −0.843434…
    // z(A,C) = (8/3 − 7.5)/sqrt(5.857143·(1/3+1/2)) = −2.187733…
    // z(B,C) = (13/3 − 7.5)/sqrt(same) = −1.433341…
    assert(out.toSeq == Seq(
      ("A", "B", 3L, 3L, -8434L),
      ("A", "C", 3L, 2L, -21877L),
      ("B", "C", 3L, 2L, -14333L)))
  }

  test("no pair survives BH at q=0.05 in the weak case") {
    val rejected = Metrics.dunnTest(df, Seq("key"), "grp", "v")
      .select("rejected").collect().map(_.getBoolean(0))
    assert(rejected.length == 3 && rejected.forall(_ == false))
  }

  test("a strongly separated pair is rejected and ranks first") {
    val sep = ((1 to 10).map(i => ("k", "X", i.toLong)) ++
      (1 to 10).map(i => ("k", "Y", (100 + i).toLong)) ++
      (1 to 10).map(i => ("k", "Z", i.toLong))).toDF("key", "grp", "v")
    val out = Metrics.dunnTest(sep, Seq("key"), "grp", "v")
      .orderBy("group_a", "group_b").collect()
      .map(r => (r.getString(1), r.getString(2), r.getBoolean(8)))
    // X vs Y and Y vs Z separate completely; X vs Z is identical data
    assert(out.toSeq == Seq(
      ("X", "Y", true), ("X", "Z", false), ("Y", "Z", true)))
  }

  test("degenerate all-tied key emits no BH rows (null p drops)") {
    val tied = Seq(("k", "A", 5L), ("k", "A", 5L), ("k", "B", 5L))
      .toDF("key", "grp", "v")
    // one tie class: factor = n(n+1)/12 − (n³−n)/(12(n−1)) = 0 → s2 = 0
    assert(Metrics.dunnTest(tied, Seq("key"), "grp", "v").count() == 0)
  }
}
