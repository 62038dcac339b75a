package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan contracts: the shapes that make these operators survive a
  * 100x scale-up. Checked against the sf0.001 testdata so plan regressions
  * (a lost broadcast, a dropped pushdown, a second window sort) fail CI,
  * not the cluster. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("star join (q14) broadcasts every dimension — no sort-merge join") {
    val p = plan("q14_j123_star_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to SMJ")
  }

  test("flagship collapse (q00) broadcasts the part dimension") {
    val p = plan("q00_m2_ces_collapse")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("isin filter (q11) is pushed to the parquet scan") {
    val p = plan("q11_f2_isin_filter")
    assert(p.contains("PushedFilters: [In(l_returnflag"),
      s"expected In pushdown in scan:\n$p")
  }

  test("projection (q29) prunes the scan to exactly the used columns") {
    val p = plan("q29_fs_string_fns")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("p_partkey") && readSchema.contains("p_name"))
    assert(!readSchema.contains("p_retailprice"), s"unused column read: $readSchema")
  }

  test("multi-feature window query (q17) plans exactly one Window node") {
    val df = SparkEntry.queries("q17_w1_pct_change")(spark, dir)
    val n = df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Window ["))
    assert(n === 1, s"mom+yoy share one (partition, order) spec -> one WindowExec, got $n")
  }

  test("group-sum (q01) aggregates map-side (partial + final HashAggregate)") {
    val p = plan("q01_a1_groupsum")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "missing partial aggregation")
  }

  test("exact dedup (q44) shuffles digests, not document text") {
    val df = SparkEntry.queries("q44_x_dedup_exact")(spark, dir)
    val exchangeLines = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty)
    assert(exchangeLines.forall(l => l.contains("text_hash") || !l.contains("text#")),
      s"raw text crossed the shuffle: $exchangeLines")
  }

  test("monte-carlo (q32) contains no table scan — generated from range") {
    val p = plan("q32_u9_montecarlo_fan")
    assert(p.contains("Range ("))
    assert(!p.contains("FileScan"), "simulation should not read any table")
  }
}
