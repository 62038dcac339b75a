package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Co-located (bucketed) joins — the pre-shuffle story for repeatedly
  * joined 100 TB fact tables: both sides bucketed by the join key at write
  * time join with NO exchange at read time. Asserted on the physical plan,
  * not just documented. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans no shuffle exchange") {
    // managed tables land in the default warehouse; dropped at the end.
    // Also remove orphaned locations from aborted runs (DROP is a no-op
    // when the catalog entry is gone but the directory survived).
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        Files.walk(d.toPath).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.delete(p))
      }
    }

    val orders = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
    val lineitem = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    // force the shuffle-join path: at fixture scale the planner would just
    // broadcast (also exchange-free, but not the co-location story)
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = try {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("l_quantity")).as("qty"))
      j.collect() // materialize so AQE finalizes the plan (isFinalPlan=true)
      j
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.linesIterator
      .dropWhile(l => !l.contains("Join")).takeWhile(l => !l.contains("HashAggregate") || l.contains("Join"))
      .mkString("\n")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    // the join children read bucketed scans directly -> no hashpartitioning
    // exchange below the join (only the groupBy above may shuffle)
    val exchangesBelowJoin = plan.linesIterator
      .dropWhile(l => !l.contains("Join"))
      .count(l => l.contains("Exchange hashpartitioning") &&
        (l.contains("l_orderkey") || l.contains("o_orderkey")))
    assert(exchangesBelowJoin === 0,
      s"bucketed join should not re-shuffle on the bucket key:\n$plan")
    // correctness: same result as the plain parquet join
    val expect = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(sum(col("l_quantity")).as("qty"))
      .orderBy("o_orderpriority").collect()
    assert(joined.orderBy("o_orderpriority").collect() === expect)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
