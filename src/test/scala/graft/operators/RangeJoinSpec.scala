package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Binned point-in-interval join: containment semantics (inclusive
  * boundaries, 1:N overlap), key scoping, the degenerate-interval guard,
  * and the plan contract that motivates the operator (equi-join, not
  * BroadcastNestedLoopJoin). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, "k1", 5.0), (2L, "k1", 10.0), (3L, "k1", 25.0),
    (4L, "k2", 5.0), (5L, "k1", 100.0)
  ).toDF("id", "key", "t")
  private val intervals = Seq(
    ("k1", 0.0, 10.0, "a"),   // ids 1, 2 (end inclusive)
    ("k1", 8.0, 30.0, "b"),   // ids 2 (overlap), 3
    ("k2", 0.0, 10.0, "c"),   // id 4 (key-scoped)
    ("k1", 40.0, 50.0, "d")   // nobody
  ).toDF("key", "s", "e", "tag")

  test("containment with inclusive bounds, overlap fan-out, key scoping") {
    val out = RangeJoin.rangeJoin(points, intervals, Seq("key"),
        "t", "s", "e", payload = Seq("tag"), binWidth = 7.0)
      .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"), (4L, "c")))
  }

  test("empty keys = pure range join") {
    val out = RangeJoin.rangeJoin(points, intervals.filter($"tag" === "b"),
        Nil, "t", "s", "e", payload = Seq("tag"), binWidth = 5.0)
      .select("id").as[Long].collect().toSet
    assert(out == Set(2L, 3L)) // id 4 (k2, t=5) is NOT in [8,30]
  }

  test("plan is an equi-join on the bin, not a nested-loop join") {
    val binned = RangeJoin.rangeJoin(points, intervals, Seq("key"),
      "t", "s", "e", payload = Seq("tag"), binWidth = 7.0)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"binned rewrite must not nested-loop:\n$plan")
    // the naive PURE range predicate (no equality conjunct) DOES
    // nested-loop — the rationale, pinned. (With keys Spark hash-joins on
    // the keys and evaluates the range on every within-key pair — the
    // same quadratic blowup, just per key group, but invisible in the
    // operator name.)
    val naive = points.join(intervals,
      points("t") >= intervals("s") && points("t") <= intervals("e"))
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"))
  }

  test("degenerate interval fails loudly instead of exploding") {
    val bad = Seq(("k1", 0.0, 1e9, "x")).toDF("key", "s", "e", "tag")
    val ex = intercept[Exception] {
      RangeJoin.rangeJoin(points, bad, Seq("key"), "t", "s", "e",
        payload = Seq("tag"), binWidth = 1.0, maxBinsPerInterval = 100).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("rangeJoin")))
  }

  test("inverted intervals match nothing (BETWEEN semantics), no bin explosion") {
    val withBad = intervals.union(Seq(("k1", 1e9, 0.0, "swap")).toDF("key", "s", "e", "tag"))
    val out = RangeJoin.rangeJoin(points, withBad, Seq("key"),
        "t", "s", "e", payload = Seq("tag"), binWidth = 1.0,
        maxBinsPerInterval = 1000)
      .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(!out.exists(_._2 == "swap")) // dropped, and the guard not tripped
  }

  test("plain numeric domains beyond the timestamp-cast range bin correctly") {
    // epoch-nano-scale numbers saturate a cast to timestamp (~9.2e12 µs);
    // direct double binning must keep them in distinct bins
    val pts = Seq((1L, 1.0e18), (2L, 2.0e18)).toDF("id", "t")
    val win = Seq((0.9e18, 1.1e18, "a"), (1.9e18, 2.1e18, "b")).toDF("s", "e", "tag")
    val out = RangeJoin.rangeJoin(pts, win, Nil, "t", "s", "e",
        payload = Seq("tag"), binWidth = 1e17)
      .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "b")))
  }

  test("date columns: binDays convenience round-trips calendar boundaries") {
    val pts = Seq((1L, java.sql.Date.valueOf("2024-02-29")),
      (2L, java.sql.Date.valueOf("2024-03-01"))).toDF("id", "d")
    val win = Seq((java.sql.Date.valueOf("2024-02-01"),
      java.sql.Date.valueOf("2024-02-29"), "feb")).toDF("ws", "we", "tag")
    val out = RangeJoin.rangeJoinDays(pts, win, Nil, "d", "ws", "we",
        payload = Seq("tag"), binDays = 16)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(1L)) // leap-day inclusive, March 1 outside
  }

  test("reserved internal names and key-duplicating payload are rejected") {
    val clash = points.withColumnRenamed("id", "__bin")
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(clash, intervals, Seq("key"), "t", "s", "e",
        payload = Seq("tag"), binWidth = 7.0)
    }
    assert(e1.getMessage.contains("reserved"))
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(points.drop("key"), intervals, Seq("key"), "t", "s", "e",
        payload = Seq("key", "tag"), binWidth = 7.0)
    }
    assert(e2.getMessage.contains("duplicate join keys"))
    val e3 = intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(points, intervals.withColumnRenamed("tag", "__s"),
        Seq("key"), "t", "s", "e", payload = Seq("__s"), binWidth = 7.0)
    }
    assert(e3.getMessage.contains("reserved"))
  }

  test("intervalOverlapJoin matches brute force, each pair exactly once") {
    // deterministic intervals spanning multiple bins; keys split the space
    val li = (1 to 80).map(i =>
      (i.toLong, s"k${i % 2}", (i * 13 % 97).toDouble, (i * 13 % 97 + i % 25).toDouble))
      .toDF("l_id", "key", "ls", "le")
    val ri = (1 to 60).map(j =>
      (j.toLong, s"k${j % 2}", (j * 29 % 101).toDouble, (j * 29 % 101 + j % 18).toDouble))
      .toDF("r_id", "key", "rs", "re")
    val got = RangeJoin.intervalOverlapJoin(li, ri.withColumnRenamed("key", "key"),
        Seq("key"), "ls", "le", "rs", "re", payload = Seq("r_id"), binWidth = 10.0)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // each overlapping pair appears exactly once despite shared bins
    assert(got.length == got.distinct.length, "pair emitted in more than one bin")
    val lrows = li.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    val rrows = ri.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    val expect = (for {
      (lid, lk, ls, le) <- lrows; (rid, rk, rs, re) <- rrows
      if lk == rk && ls <= re && rs <= le
    } yield (lid, rid)).toSet
    assert(got.toSet == expect,
      s"missing=${expect -- got.toSet} extra=${got.toSet -- expect}")
    assert(expect.nonEmpty)
  }

  test("intervalOverlapJoin: inverted intervals drop; degenerate span guard fires") {
    val li = Seq((1L, 5.0, 3.0)).toDF("l_id", "ls", "le") // inverted
    val ri = Seq((9L, 0.0, 100.0)).toDF("r_id", "rs", "re")
    val out = RangeJoin.intervalOverlapJoin(li, ri, Nil, "ls", "le", "rs", "re",
      payload = Seq("r_id"), binWidth = 10.0)
    assert(out.count() == 0)
    val wide = Seq((9L, 0.0, 1e9)).toDF("r_id", "rs", "re")
    val ok = Seq((1L, 1.0, 2.0)).toDF("l_id", "ls", "le")
    val e = intercept[Exception] {
      RangeJoin.intervalOverlapJoin(ok, wide, Nil, "ls", "le", "rs", "re",
        payload = Seq("r_id"), binWidth = 1.0, maxBinsPerInterval = 100).count()
    }
    assert(e.getMessage.contains("spans more than"))
  }

  test("intervalUnionLength merges overlapping and touching intervals") {
    // k: [0,10] [5,15] touch+overlap -> island [0,15]; [20,30] separate
    val df = Seq(("k", 0L, 10L), ("k", 5L, 15L), ("k", 15L, 18L), ("k", 20L, 30L))
      .toDF("u", "s", "e")
    val r = RangeJoin.intervalUnionLength(df, Seq("u"), "s", "e").collect().head
    assert(r.getAs[Long]("n_intervals") == 4)
    assert(r.getAs[Long]("n_islands") == 2)   // [0,18] and [20,30]
    assert(r.getAs[Long]("covered") == 28)    // 18 + 10
    assert(r.getAs[Long]("span") == 30)
  }

  test("intervalUnionLength: contained intervals add nothing; malformed drop") {
    val df = Seq(("k", 0L, 100L), ("k", 10L, 20L), ("k", 50L, 40L))
      .toDF("u", "s", "e")
    val r = RangeJoin.intervalUnionLength(df, Seq("u"), "s", "e").collect().head
    assert(r.getAs[Long]("n_intervals") == 2) // inverted row dropped
    assert(r.getAs[Long]("n_islands") == 1)
    assert(r.getAs[Long]("covered") == 100)
  }

  test("intervalUnionLength plans one shuffle end to end") {
    val df = Seq(("k", 0L, 1L), ("k", 2L, 3L)).toDF("u", "s", "e")
    val p = RangeJoin.intervalUnionLength(df, Seq("u"), "s", "e")
      .queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }
}
