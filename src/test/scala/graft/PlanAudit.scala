package graft

import org.apache.spark.sql.SparkSession

/** Throwaway plan audit for the round-9 tier — run manually:
  * `sbt "Test/runMain graft.PlanAudit"`. Prints Exchange / Broadcast /
  * Window counts per query so plan regressions are visible at a glance
  * (the .explain("formatted") discipline, summarized). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    val dir = "/root/testdata/sf0.001"
    val qs = Seq("q259", "q276", "q277", "q278", "q279", "q280", "q281",
      "q282", "q283", "q284", "q286", "q287", "q288", "q289", "q291",
      "q292", "q294")
    qs.foreach { p =>
      val (name, fn) = SparkEntry.queries.find(_._1.startsWith(p)).get
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      val ex = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      val bc = plan.linesIterator.count(_.contains("BroadcastExchange"))
      val wd = plan.linesIterator.count(l =>
        l.trim.startsWith("Window") || l.contains("WindowExec"))
      val sc = plan.linesIterator.count(_.contains("Scan parquet"))
      println(f"PLAN $name%-32s shuffles=$ex%2d broadcasts=$bc%2d windows=$wd%2d scans=$sc%2d")
    }
    spark.stop()
  }
}
