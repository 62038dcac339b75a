package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway stage decomposition of q358 periodogram_auto_n at sf0.1:
  * times the monthly agg, the tail-selection windows, the coef-join
  * fan, and the full query, min-of-2 each after a warm pass. */
object Probe358 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    val d = "/root/testdata/sf0.1"
    def noop(df: DataFrame) = df.write.format("noop").mode("overwrite").save()
    def t2(tag: String)(fn: => Unit): Unit = {
      fn // warm
      def once: Double = { val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9 }
      val v = math.min(once, once)
      println(f"PROBE358 $tag%-22s $v%6.3f s")
    }
    def monthly = graft.sources.Tables.orders(spark, d)
      .groupBy(col("o_custkey").as("custkey"),
        graft.functions.Cols.monthStart(col("o_orderdate")).as("month"))
      .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"))
        .as("cents"))
    import org.apache.spark.sql.expressions.Window
    val k = Seq(col("custkey"))
    def tail = {
      val wDesc = Window.partitionBy(k: _*).orderBy(col("month").desc)
      monthly.filter(col("cents").isNotNull)
        .withColumn("__rnd", row_number().over(wDesc))
        .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(k: _*)))
        .withColumn("__nsel", expr(
          Seq(64, 32, 16, 8).map(n => s"when __cnt >= $n then $n")
            .mkString("case ", " ", " end")))
        .filter(col("__nsel").isNotNull && col("__rnd") <= col("__nsel"))
        .withColumn("__t", (col("__nsel") - col("__rnd")).cast("int"))
        .select(col("custkey"), col("__nsel"), col("__t"),
          col("cents").cast("long").as("__x"))
    }
    t2("monthly-agg")(noop(monthly))
    t2("tail-windows")(noop(tail))
    println("tail rows = " + tail.count())
    t2("full-q358")(noop(
      graft.stats.Diagnostics.periodogramAutoN(monthly, Seq("custkey"), "month", "cents")))
    spark.stop()
  }
}
