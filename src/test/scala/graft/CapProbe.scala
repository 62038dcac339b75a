package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: does streamingJoinDelta's maxIdsPerKey cap actually
  * fail loud on a key whose id history exceeds it? */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "24h")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    val dir = "/tmp/capprobe"
    spark.range(2000)
      .withColumn("event_id", col("id") + 1)
      .withColumn("ts", expr("timestamp_micros(1704067200000000L + id * 1000000L)"))
      .withColumn("user_id", lit(1L))
      .withColumn("event_type", expr("if(pmod(id, 2) = 0, 'click', 'purchase')"))
      .withColumn("value", lit(1.0d))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    try {
      val n = streaming.StreamingCollapse.streamingJoinDelta(spark, dir, maxIdsPerKey = 100).count()
      println(s"CAPPROBE NO-TRIP rows=$n")
    } catch {
      case e: Throwable =>
        val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(t => t.getClass.getSimpleName + ": " + Option(t.getMessage).getOrElse("").linesIterator.take(1).mkString).toSeq
        println("CAPPROBE TRIPPED " + msgs.mkString(" <- "))
    }
    spark.stop()
  }
}
