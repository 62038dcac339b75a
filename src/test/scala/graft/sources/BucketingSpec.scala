package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_bucketing_$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("co-located join on matching bucketed tables plans NO Exchange") {
    val facts = (0L until 400L).map(i => (i % 40, i, (i % 7).toDouble)).toDF("k", "id", "v")
    val dims = (0L until 40L).map(i => (i, s"d$i")).toDF("k", "name")
    Bucketing.writeBucketedTable(facts, "graft_spec_facts", tmp("facts"), Seq("k"), 4, Seq("k"))
    Bucketing.writeBucketedTable(dims, "graft_spec_dims", tmp("dims"), Seq("k"), 4, Seq("k"))
    // pin SMJ: broadcast would hide the co-location; AQE off for a stable
    // plan string (restored after)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Bucketing.table(spark, "graft_spec_facts")
        .join(Bucketing.table(spark, "graft_spec_dims"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed co-located join still shuffles:\n$plan")
      // the scans really are bucketed (co-location, not coincidence)
      assert(plan.contains("Bucketed: true"), s"scan lost bucket metadata:\n$plan")
      // an IN-PARTITION Sort remains: since Spark 3 the scan reports no
      // output ordering unless spark.sql.legacy.bucketedTableScan
      // .outputOrdering is set — the sort is shuffle-free and per-split,
      // the Exchange elimination is the cost that matters at scale
      // and the result is the plain join's result
      assert(joined.count() === 400L)
      val sums = joined.groupBy("name").agg(sum("v").as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val expected = facts.join(dims, Seq("k")).groupBy("name").agg(sum("v").as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(sums === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("bucketed aggregation on the bucket key plans no Exchange") {
    val facts = (0L until 400L).map(i => (i % 40, i)).toDF("k", "id")
    Bucketing.writeBucketedTable(facts, "graft_spec_agg", tmp("agg"), Seq("k"), 4)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val agged = Bucketing.table(spark, "graft_spec_agg").groupBy("k").agg(count(lit(1)).as("n"))
      val plan = agged.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation still shuffles:\n$plan")
      assert(agged.collect().forall(_.getLong(1) == 10L))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("write is idempotent; mismatched key types would re-shuffle (doc contract)") {
    val df = (0L until 20L).map(i => (i, i * 2)).toDF("k", "v")
    val path = tmp("idem")
    Bucketing.writeBucketedTable(df, "graft_spec_idem", path, Seq("k"), 2)
    Bucketing.writeBucketedTable(df, "graft_spec_idem", path, Seq("k"), 2)
    assert(Bucketing.table(spark, "graft_spec_idem").count() === 20L)
  }
}
