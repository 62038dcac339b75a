package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsofJoinNative

/** The native AsofJoinExec (custom LogicalPlan + Strategy + SparkPlan)
  * against the union+window rewrite it replaces: same rows, plus the
  * plan-shape and merge-state contracts. */
class AsofJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    ("A", 1L, 10.0), ("A", 3L, 11.0), ("A", 3L, 11.5), ("A", 7L, 12.0),
    ("B", 2L, 20.0), ("B", 9L, 21.0),
    ("C", 5L, 30.0)
  ).toDF("sym", "t", "px")

  test("native as-of matches the union+window rewrite in outer mode") {
    val t = Seq(("A", 0L, 1L), ("A", 3L, 2L), ("A", 5L, 3L), ("A", 99L, 4L),
      ("B", 1L, 5L), ("B", 9L, 6L), ("D", 4L, 7L)).toDF("sym", "t", "qty")
    val native = AsofJoinNative.join(t, quotes, Seq("sym"), "t", "t", Seq("px"))
      .orderBy("sym", "t")
      .select("sym", "t", "qty", "px").collect().toSeq
    val rewrite = AsofJoin.asofJoin(
        t, quotes.withColumnRenamed("t", "qt"), Seq("sym"), "t", "qt", Seq("px"),
        inner = false)
      .orderBy("sym", "t")
      .select("sym", "t", "qty", "px").collect().toSeq
    assert(native == rewrite)
    // spot semantics: equal time matches; later dup (11.5) wins at t=3
    val m = native.map(r => (r.getString(0), r.getLong(1)) -> r.get(3)).toMap
    assert(m(("A", 0L)) == null)          // before first quote
    assert(m(("A", 3L)) == 11.5)          // tie matches, latest dup wins
    assert(m(("A", 99L)) == 12.0)         // far future: last quote
    assert(m(("D", 4L)) == null)          // key with no quotes
  }

  test("native as-of plans the custom exec with clustered+sorted children") {
    val t = Seq(("A", 5L, 1L)).toDF("sym", "t", "qty")
    val df = AsofJoinNative.join(t, quotes, Seq("sym"), "t", "t", Seq("px"))
    val p = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix: the node prints "AsofJoin"
    assert(p.contains("AsofJoin "), s"custom exec missing:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"), p)
    // EnsureRequirements must have inserted one exchange + sort per side
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 2, p)
    assert(p.linesIterator.count(_.contains("Sort [")) === 2, p)
  }

  test("native as-of survives a self-join (fresh right-side exprIds)") {
    val e = Seq(("A", 1L), ("A", 4L), ("A", 6L)).toDF("sym", "t")
    val out = AsofJoinNative.join(
        e, e.withColumn("prev_t", col("t")), Seq("sym"), "t", "t", Seq("prev_t"))
      .orderBy("t").select("t", "prev_t").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    // each row's latest match is itself (rightTime <= leftTime includes ties)
    assert(out == Map(1L -> 1L, 4L -> 4L, 6L -> 6L))
  }

  test("native forward as-of: earliest right at-or-after, and the negation law") {
    val t = Seq(("A", 0L, 1L), ("A", 3L, 2L), ("A", 8L, 3L), ("B", 10L, 4L))
      .toDF("sym", "t", "qty")
    val fwd = AsofJoinNative.join(t, quotes, Seq("sym"), "t", "t", Seq("px"),
        direction = "forward")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.get(3)).toMap
    assert(fwd(("A", 0L)) == 10.0)   // next quote at t=1
    // tie matches; the payload-extended right ordering makes the FIRST
    // duplicate deterministic: forward takes the payload-smallest (11.0)
    assert(fwd(("A", 3L)) == 11.0)
    assert(fwd(("A", 8L)) == null)   // nothing at-or-after t=8 for A
    assert(fwd(("B", 10L)) == null)
    // negation law: forward == backward on negated times
    def neg(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("nt", org.apache.spark.sql.functions.negate(col("t")))
    val back = AsofJoinNative.join(neg(t), neg(quotes), Seq("sym"), "nt", "nt", Seq("px"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.get(4)).toMap
    // backward-on-negated takes the LAST duplicate of a time tie, forward
    // the FIRST — compare only keys with unique right timestamps
    assert(back(("A", 0L)) == fwd(("A", 0L)))
    assert(back(("A", 8L)) == fwd(("A", 8L)))
    assert(back(("B", 10L)) == fwd(("B", 10L)))
  }

  test("PushFilterThroughAsofJoin: left-only filters sink through the custom node") {
    // parquet-backed left so the pushed predicate is visible in the
    // scan's PushedFilters — the end-to-end point of the rule
    val dir = "/root/testdata/sf0.001"
    val orders = graft.sources.Tables.orders(spark, dir)
    val right = orders.groupBy(col("o_orderpriority"))
      .agg(max(col("o_orderdate")).as("mt"), avg(col("o_totalprice")).as("avg_px"))
      .select(col("o_orderpriority"), col("mt"), col("avg_px"))
    val left = orders.select("o_orderkey", "o_orderpriority", "o_orderdate")
    val joined = AsofJoinNative.join(left, right, Seq("o_orderpriority"),
      "o_orderdate", "mt", Seq("avg_px"))
    // left-only predicate: must sink below the join into the scan
    val filtered = joined.filter(col("o_orderkey") < 100L)
    val opt = filtered.queryExecution.optimizedPlan.toString
    assert(!opt.trim.startsWith("Filter"),
      s"left-only filter stayed above the as-of join:\n$opt")
    val phys = filtered.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)]") ||
      phys.contains("LessThan(o_orderkey,100)"),
      s"predicate never reached the parquet scan:\n$phys")
    // payload-referencing predicate must NOT sink (it depends on the match)
    val keep = joined.filter(col("avg_px") > 0.0)
    val opt2 = keep.queryExecution.optimizedPlan.toString
    assert(opt2.trim.startsWith("Filter"),
      s"match-dependent filter was illegally pushed:\n$opt2")
    // and the results agree with filtering after collect
    val a = filtered.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val b = joined.collect().map(_.getLong(0)).filter(_ < 100L).toSet
    assert(a == b)
    // a deterministic conjunct AFTER a non-deterministic one must stay
    // above the join (reordering would change what a seeded rand selects)
    // — threshold 0.5, because Spark 4 simplifies the always-true
    // rand() < 2.0 away entirely, which would legalize the push
    val nd = joined.filter(rand(42) < lit(0.5) && col("o_orderkey") < 100L)
    val optNd = nd.queryExecution.optimizedPlan.toString
    assert(optNd.trim.startsWith("Filter"),
      s"conjunct after rand() was illegally reordered below the join:\n$optNd")
    assert(optNd.linesIterator.take(1).mkString.contains("o_orderkey"),
      s"the deterministic tail must remain in the kept filter:\n$optNd")
  }

  test("native as-of: null keys never match, even against each other") {
    val l = Seq((Option("A"), 5L), (None: Option[String], 5L)).toDF("sym", "t")
    val r = Seq((Option("A"), 1L, 1.0), (None: Option[String], 1L, 99.0))
      .toDF("sym", "t", "px")
    val out = AsofJoinNative.join(l, r, Seq("sym"), "t", "t", Seq("px"))
      .collect().map(row => Option(row.getString(0)) -> row.get(2)).toMap
    assert(out(Some("A")) == 1.0)
    assert(out(None) == null, "null = null must not match (SQL equality)")
    // payload/left collision fails loudly, same guard as the rewrite
    val e = intercept[IllegalArgumentException] {
      AsofJoinNative.join(l.withColumn("px", lit(0.0)), r, Seq("sym"), "t", "t", Seq("px"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("tolerance: out-of-bound matches demote to null payload, both directions") {
    val t = Seq(("A", 0L, 1L), ("A", 3L, 2L), ("A", 6L, 3L), ("A", 99L, 4L),
      ("B", 2L, 5L), ("B", 9L, 6L)).toDF("sym", "t", "qty")
    // backward, tolerance 2: match iff leftTime - matchTime <= 2
    val back = AsofJoinNative.join(t, quotes, Seq("sym"), "t", "t", Seq("px"),
        tolerance = Some(2L))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.get(3)).toMap
    assert(back(("A", 0L)) == null)   // no quote at-or-before 0
    assert(back(("A", 3L)) == 11.5)   // exact tie, gap 0
    assert(back(("A", 6L)) == null)   // nearest prior at 3, gap 3 > 2
    assert(back(("A", 99L)) == null)  // gap 92
    assert(back(("B", 2L)) == 20.0)   // gap 0
    assert(back(("B", 9L)) == 21.0)   // gap 0
    // tolerance-free run on the same input differs exactly on the
    // demoted rows (the merge itself is unchanged)
    val free = AsofJoinNative.join(t, quotes, Seq("sym"), "t", "t", Seq("px"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.get(3)).toMap
    assert(free(("A", 6L)) == 11.5 && free(("A", 99L)) == 12.0)
    // forward, tolerance 1: match iff matchTime - leftTime <= 1
    val fwd = AsofJoinNative.join(t, quotes, Seq("sym"), "t", "t", Seq("px"),
        direction = "forward", tolerance = Some(1L))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.get(3)).toMap
    assert(fwd(("A", 0L)) == 10.0)    // next at 1, gap 1
    assert(fwd(("A", 3L)) == 11.0)    // tie, payload-smallest dup
    assert(fwd(("A", 6L)) == 12.0)    // next at 7, gap 1
    assert(fwd(("B", 2L)) == 20.0)    // gap 0
    assert(fwd(("B", 9L)) == 21.0)    // gap 0
    assert(fwd(("A", 99L)) == null)   // nothing after
    // guards: negative tolerance and non-integral time types fail loudly
    intercept[IllegalArgumentException] {
      AsofJoinNative.join(t, quotes, Seq("sym"), "t", "t", Seq("px"),
        tolerance = Some(-1L))
    }
    val dbl = quotes.withColumn("td", col("t").cast("double"))
    val e = intercept[IllegalArgumentException] {
      AsofJoinNative.join(t.withColumn("td", col("t").cast("double")), dbl,
        Seq("sym"), "td", "td", Seq("px"), tolerance = Some(1L))
    }
    assert(e.getMessage.contains("integral-backed"))
  }

  test("native as-of: null left time and null-time right rows never match") {
    val l = Seq((java.lang.Long.valueOf(1L), "A"), (null.asInstanceOf[java.lang.Long], "A"))
      .toDF("t", "sym")
    val r = Seq((java.lang.Long.valueOf(0L), "A", 1.0),
      (null.asInstanceOf[java.lang.Long], "A", 99.0)).toDF("t", "sym", "px")
    val out = AsofJoinNative.join(l, r, Seq("sym"), "t", "t", Seq("px"))
      .collect().map(row => Option(row.get(0)) -> row.get(2)).toMap
    assert(out(Some(1L)) == 1.0)   // matches the t=0 quote, not the null-time one
    assert(out(None) == null)      // null left time -> no match
  }
}
