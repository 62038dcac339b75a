package graft

import org.apache.spark.sql.SparkSession

/** Probe 3: per-call fixed costs a twin pays before the stream starts —
  * the parquet footer/schema read and the symlink staging. */
object StreamProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    val d = "/root/testdata/sf0.1"
    def time[A](label: String, n: Int)(fn: => A): Unit = {
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => fn)
      println(f"PROBE3 $label%-40s ${(System.nanoTime() - t0) / 1e9 / n}%7.4f s/call (x$n)")
    }
    // warm
    spark.read.parquet(s"$d/events.parquet").schema
    time("footer read: events schema", 10) {
      spark.read.parquet(s"$d/events.parquet").schema
    }
    time("footer read: lineitem schema", 10) {
      spark.read.parquet(s"$d/lineitem.parquet").schema
    }
    spark.stop()
  }
}
