package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def raw = Seq(
    ("a", 1L), ("a", 2L), ("a", 2L), ("a", 10L),
    ("b", 5L), ("b", 7L),
    ("c", 4L)
  ).toDF("g", "v")

  test("partialAgg: exact integer monoid state per group") {
    val out = Incremental.partialAgg(raw, Seq("g"), "v")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("a", 4L, 15L, 109L, 1L, 10L), // 1+4+4+100 = 109
      ("b", 2L, 12L, 74L, 5L, 7L),
      ("c", 1L, 4L, 16L, 4L, 4L)))
  }

  test("mergePartials of any split equals the single-pass aggregate exactly") {
    val full = Incremental.partialAgg(raw, Seq("g"), "v").orderBy("g").collect()
    // three different splits, including an empty side and a 3-way shard
    val splits = Seq(
      Seq(raw.filter($"v" <= 2), raw.filter($"v" > 2)),
      Seq(raw, raw.limit(0)),
      Seq(raw.filter($"v" % 3 === 0), raw.filter($"v" % 3 === 1),
        raw.filter($"v" % 3 === 2)))
    splits.foreach { parts =>
      val merged = Incremental.mergePartials(
        parts.map(Incremental.partialAgg(_, Seq("g"), "v")), Seq("g"))
        .orderBy("g").collect()
      assert(merged.toSeq == full.toSeq,
        "the (n, Σ, Σ², min, max) monoid must be split-invariant")
    }
  }

  test("withDerived: mean/variance as exact floored integers") {
    val out = Incremental.withDerived(
      Incremental.partialAgg(raw, Seq("g"), "v"))
      .filter($"g" === "a").collect().head
    // mean = 15/4 = 3.75 -> 3750000; var = (4*109 - 225)/16 = 211/16 = 13.1875
    assert(out.getAs[Long]("mean_e6") == 3750000L)
    assert(out.getAs[Long]("var_e6") == 13187500L)
  }

  test("nulls are excluded and values are cast to exact integers") {
    val df = Seq((Some(1.0), "g"), (None, "g"), (Some(2.0), "g"))
      .toDF("v", "g")
    val out = Incremental.partialAgg(df, Seq("g"), "v").collect().head
    assert(out.getAs[Long]("n") == 2L && out.getAs[Long]("sum_v") == 3L)
  }

  test("joinDelta: old join + delta == full recompute, multiset, with dup keys") {
    // duplicate keys on BOTH sides so the multiset fan-out is exercised:
    // key "a" appears twice in old-left and twice in delta-right
    val oldL = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "lv")
    val dL = Seq(("a", 4), ("c", 5)).toDF("k", "lv")
    val oldR = Seq(("a", 10), ("b", 20), ("b", 21)).toDF("k", "rv")
    val dR = Seq(("a", 30), ("a", 31), ("c", 40)).toDF("k", "rv")
    val full = oldL.unionByName(dL).join(oldR.unionByName(dR), Seq("k"))
    val maintained = oldL.join(oldR, Seq("k"))
      .unionByName(Incremental.joinDelta(oldL, dL, oldR, dR, Seq("k")))
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
        .toSeq.sorted
    assert(bag(maintained) == bag(full),
      "delta-join identity must hold as a multiset with duplicate keys")
    assert(bag(full).size == 12, "dup keys must fan out (2+1)*(1+2)=9 for a alone")
  }

  test("joinDelta broadcasts the delta side in every term") {
    val oldL = Seq(("a", 1)).toDF("k", "lv")
    val dL = Seq(("a", 2)).toDF("k", "lv")
    val oldR = Seq(("a", 3)).toDF("k", "rv")
    val dR = Seq(("a", 4)).toDF("k", "rv")
    val p = Incremental.joinDelta(oldL, dL, oldR, dR, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("the merge shuffles group-sized partials with map-side combine") {
    val parts = Seq(raw.filter($"v" <= 2), raw.filter($"v" > 2))
      .map(Incremental.partialAgg(_, Seq("g"), "v"))
    val p = Incremental.mergePartials(parts, Seq("g"))
      .queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
  }
}
