package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe 2: where does 0.8 s go in a tiny-grid readout (nmiFromCells on
  * ~100 rows)? AQE on/off, shuffle partitions, job counts. */
object StreamProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    import spark.implicits._
    def time[A](label: String)(fn: => A): A = {
      val t0 = System.nanoTime()
      val r = fn
      println(f"PROBE2 $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    // a tiny grid like a drained twin table: 2 halves x 8 langs x 6 sources
    val grid = (for (h <- 0 to 1; a <- 1 to 8; b <- 1 to 6)
      yield (h.toLong, s"l$a", s"s$b", (a * b + h).toLong))
      .toDF("half", "__a", "__b", "__c").localCheckpoint(true)

    def readout(): Unit =
      operators.Metrics.nmiFromCells(grid, Seq("half")).orderBy("half")
        .write.format("noop").mode("overwrite").save()

    def withConf[A](k: String, v: String)(fn: => A): A = {
      val prev = spark.conf.get(k)
      spark.conf.set(k, v)
      try fn finally spark.conf.set(k, prev)
    }

    readout(); readout() // warm
    val sc = spark.sparkContext
    def jobs[A](label: String)(fn: => A): Unit = {
      val before = sc.statusTracker.getJobIdsForGroup(null).length
      time(label)(fn)
      // jobs run in the default group; count via all job ids
    }
    time("aqe=on  sp=32 (x3)")((1 to 3).foreach(_ => readout()))
    withConf("spark.sql.adaptive.enabled", "false") {
      readout()
      time("aqe=off sp=32 (x3)")((1 to 3).foreach(_ => readout()))
    }
    withConf("spark.sql.shuffle.partitions", "4") {
      readout()
      time("aqe=on  sp=4  (x3)")((1 to 3).foreach(_ => readout()))
      withConf("spark.sql.adaptive.enabled", "false") {
        readout()
        time("aqe=off sp=4  (x3)")((1 to 3).foreach(_ => readout()))
      }
    }
    withConf("spark.sql.shuffle.partitions", "1") {
      withConf("spark.sql.adaptive.enabled", "false") {
        readout()
        time("aqe=off sp=1  (x3)")((1 to 3).foreach(_ => readout()))
      }
    }
    spark.stop()
  }
}
