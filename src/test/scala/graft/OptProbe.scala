package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** r17 optimization probe: where does the mid-band query's ~0.7 s go?
  *
  * A/B: the final deterministic `orderBy(k)` (range exchange + its
  * sampling job) vs `coalesce(1).sortWithinPartitions(k)` (narrow, no
  * sampling, identical total order) on contract-bounded grid outputs,
  * plus job/stage counts per variant via a listener.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "24h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    })

    def time(tag: String, reps: Int = 3)(f: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      jobs.set(0); stages.set(0)
      f.write.format("noop").mode("overwrite").save()
      Thread.sleep(300) // let listener drain
      println(f"PROBE $tag%-40s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")} jobs=${jobs.get} stages=${stages.get}")
    }

    import graft.sources.Tables
    import graft.functions.Cols

    // q270 kruskal-wallis (grid output: one row per mktsegment)
    def kwFrame = graft.operators.Metrics.kruskalWallis(
      Tables.orders(spark, d)
        .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
        .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long")),
      Seq("c_mktsegment"), "o_orderpriority", "cents")

    // q230 spearman (grid output: one row per returnflag)
    def spFrame = graft.operators.Profile.spearman(
      Tables.lineitem(spark, d)
        .withColumn("qty", floor(col("l_quantity") + 0.5))
        .withColumn("price_h", expr("floor(l_extendedprice + 0.5) div 100")),
      Seq("l_returnflag"), "qty", "price_h")

    // q07 histogram (tiny)
    def histFrame = Tables.lineitem(spark, d)
      .groupBy(floor(col("l_quantity") / 10).as("bin"))
      .agg(count(lit(1)).as("n"))

    for (round <- 1 to 2) {
      println(s"== round $round")
      time("kw orderBy")(kwFrame.orderBy("c_mktsegment"))
      time("kw coalesce1+swp")(kwFrame.coalesce(1).sortWithinPartitions("c_mktsegment"))
      time("kw no-order")(kwFrame)
      time("sp orderBy")(spFrame.orderBy("l_returnflag"))
      time("sp coalesce1+swp")(spFrame.coalesce(1).sortWithinPartitions("l_returnflag"))
      time("sp no-order")(spFrame)
      time("hist orderBy")(histFrame.orderBy("bin"))
      time("hist coalesce1+swp")(histFrame.coalesce(1).sortWithinPartitions("bin"))
      time("hist no-order")(histFrame)
    }
    spark.stop()
  }
}
