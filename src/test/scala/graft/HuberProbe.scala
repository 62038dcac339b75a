package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway decomposition probe for q345 (round-14 verdict task 3):
  * times the huberLocation stages separately at sf0.1 to find where
  * the 3.4 s goes. Run: `sbt "Test/runMain graft.HuberProbe"`. */
object HuberProbe {
  private def time(label: String)(fn: => Unit): Unit = {
    val t0 = System.nanoTime(); fn
    println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    val d = "/root/testdata/sf0.1"

    def base = sources.Tables.lineitem(spark, d).withColumn("dollars",
      expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint) div 100"))
    def noop(df: DataFrame) = df.write.format("noop").mode("overwrite").save()

    // warm
    noop(base.limit(1000))

    time("scan only")(noop(base.select("l_returnflag", "dollars")))
    val hist = base.filter(col("dollars").isNotNull)
      .groupBy(col("l_returnflag"), col("dollars").as("__v"))
      .agg(count(lit(1)).as("__c"))
    time("hist build (no ckpt)")(noop(hist))
    time("hist build + localCheckpoint") {
      hist.localCheckpoint(true).count(); ()
    }
    for (it <- Seq(1, 2)) {
      time(s"full huberLocation iters=$it")(noop(
        operators.Sketch.huberLocation(base, Seq("l_returnflag"), "dollars",
          iters = it)))
    }
    // second run (steady state)
    time("full huberLocation iters=2 (run 2)")(noop(
      operators.Sketch.huberLocation(base, Seq("l_returnflag"), "dollars",
        iters = 2)))
    spark.stop()
  }
}
