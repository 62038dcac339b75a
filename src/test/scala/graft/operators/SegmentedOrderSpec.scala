package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the order-axis range bucketing under the three
  * per-key-sequential rewrites (runsTest / sprtBernoulli / pageHinkley):
  * bucket id monotone in the leader, ties co-bucketed, integral-only
  * leaders, constant leader degrading to one bucket. The kernels'
  * VALUE semantics are pinned in DiagnosticsSpec/MetricsSpec (whose
  * unit-step order columns already span many buckets, so the boundary
  * stitches are exercised there) and by the q292/q296/q317 oracles. */
class SegmentedOrderSpec extends SparkSpec {
  import spark.implicits._

  test("withBuckets: bucket id is monotone in the leader and ties co-bucket") {
    val df = Seq(("a", 5L), ("a", 5L), ("a", 105L), ("a", 2053L),
        ("b", 7L), ("b", 7L))
      .toDF("k", "t")
    val out = SegmentedOrder.withBuckets(df, Seq("k"), col("t"), nBuckets = 4)
      .select("k", "t", "__bkt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // per key: sort by leader -> bucket ids nondecreasing
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byT = rows.sortBy(_._2).map(_._3)
      assert(byT.zip(byT.tail).forall { case (x, y) => x <= y })
    }
    // equal leaders share a bucket
    assert(out.filter(r => r._1 == "a" && r._2 == 5L).map(_._3).distinct.length == 1)
    assert(out.filter(_._1 == "b").map(_._3).distinct.length == 1)
    // bucket ids stay inside [0, nBuckets)
    assert(out.forall(r => r._3 >= 0L && r._3 < 4L))
  }

  test("withBuckets: a constant leader degrades to one bucket per key") {
    val df = Seq(("a", 9L), ("a", 9L), ("a", 9L)).toDF("k", "t")
    val out = SegmentedOrder.withBuckets(df, Seq("k"), col("t"))
      .select("__bkt").distinct().collect()
    assert(out.length == 1 && out.head.getLong(0) == 0L)
  }

  test("leadOf: integral passes, struct takes its first field, double rejects") {
    val num = Seq((1L, 2.0)).toDF("t", "v")
    SegmentedOrder.leadOf(num, "t") // no throw
    val st = num.select(struct(col("t").as("ts"), col("v").as("id")).as("ord"))
    SegmentedOrder.leadOf(st, "ord") // no throw: first field integral
    val err = intercept[IllegalArgumentException] {
      SegmentedOrder.leadOf(num, "v")
    }
    assert(err.getMessage.contains("must be integral"))
  }
}
