package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = // one hot key with 100 rows, two cold keys
    ((1 to 100).map(i => ("hot", i)) ++ Seq(("a", 1), ("b", 2))).toDF("k", "v")
  private lazy val dim = Seq(("hot", "H"), ("a", "A"), ("c", "C")).toDF("k", "name")

  test("saltedJoin: inner results equal the plain join, every row preserved") {
    val plain = skewed.join(dim, Seq("k")).orderBy("k", "v")
      .collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), buckets = 8)
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    assert(salted === plain)
    assert(salted.size === 101) // 100 hot + 1 a
  }

  test("saltedJoin: left join keeps unmatched skewed rows exactly once") {
    val out = Skew.saltedJoin(skewed, dim, Seq("k"), buckets = 4, joinType = "left")
      .filter(col("k") === "b").collect()
    assert(out.length === 1)
    assert(out.head.get(out.head.fieldIndex("name")) == null)
  }

  test("hotKeyStats: hottest-key count and total off one aggregate") {
    assert(Skew.hotKeyStats(skewed, Seq("k")) === (100L, 102L))
    assert(Skew.hotKeyStats(skewed.filter(lit(false)), Seq("k")) === (0L, 0L))
  }

  test("shouldEngageHotKeyDial: engages past the per-slot crossover only") {
    // hot key holds 100/102 rows: per-slot share at 4 slots = 25 -> engage
    assert(Skew.shouldEngageHotKeyDial(skewed, Seq("k"), slots = 4))
    // uniform frame: max per-key = 1 <= 102/4 -> stay on the plain path
    val uniform = (1 to 102).map(i => (s"k$i", i)).toDF("k", "v")
    assert(!Skew.shouldEngageHotKeyDial(uniform, Seq("k"), slots = 4))
    // empty input: no rows, nothing to route
    assert(!Skew.shouldEngageHotKeyDial(skewed.filter(lit(false)), Seq("k"), 4))
    // costFactor raises the bar: a multi-pass alternate path must beat
    // that many per-slot shares (100 <= 30 * 25)
    assert(!Skew.shouldEngageHotKeyDial(skewed, Seq("k"), slots = 4,
      costFactor = 30))
    assert(Skew.shouldEngageHotKeyDial(skewed, Seq("k"), slots = 4,
      costFactor = 3))
  }

  test("saltedJoin: deterministic across reruns (hash salt, not rand)") {
    def run() = Skew.saltedJoin(skewed.repartition(7), dim, Seq("k"), 8)
      .orderBy("k", "v").collect().map(_.toSeq).toSeq
    assert(run() === run())
  }

  test("heavyHitters: surfaces the hot key first") {
    val hh = Skew.heavyHitters(skewed, Seq("k"), 2).collect()
    assert(hh.head.getString(0) === "hot" && hh.head.getLong(1) === 100L)
  }

  test("hotKeySaltedJoin: identical result to the plain join, hot and cold paths both exercised") {
    val rng = new scala.util.Random(4)
    // key 7 is hot (100 rows); keys 0-9 cold
    val big = ((1 to 100).map(_ => (7L, rng.nextInt(100))) ++
      (0L until 10L).flatMap(k => (1 to 3).map(_ => (k, rng.nextInt(100)))))
      .toDF("k", "v")
    val small = (0L until 10L).map(k => (k, s"name_$k")).toDF("k", "name")
    val got = Skew.hotKeySaltedJoin(big, small, Seq("k"), buckets = 4, hotKeys = 2)
      .groupBy("k", "name").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val expect = big.join(small, Seq("k")).groupBy("k", "name").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expect)
  }
}
