package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Throwaway round-17 whole-engine two-decade sweep: runs named
  * registered members (SparkEntry.queries) against BOTH sf0.1 and the
  * [[Synth100xFull]] corpus in one session, min-of-2 each, and prints
  * per-member multipliers — the 100 TB evidence for the non-dedup tier
  * (the dedup/ANN family has its own dial-scaled sweep,
  * [[DialSweep100]]).
  *
  * `sbt "Test/runMain graft.Sweep100x [100x-dir] [q1,q2,...]"`
  * (prefix-matched names; default dir /tmp/graft100xf). */
object Sweep100x {
  def main(args: Array[String]): Unit = {
    val dir100 = args.headOption.getOrElse("/tmp/graft100xf")
    val names = if (args.length > 1)
      args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    else Seq.empty
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "24h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    def noop(df: DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    val members = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.exists(n.startsWith) }
    if (members.isEmpty) { System.err.println("no members matched"); sys.exit(2) }
    println(s"SWEEP100 ${members.size} members vs $dir100")
    members.foreach { case (name, fn) =>
      try {
        // warm + min-of-2 at sf0.1 (the in-session baseline: same host,
        // same JVM state — multipliers stay honest under ambient drift)
        noop(fn(spark, "/root/testdata/sf0.1"))
        val base = math.min(
          time(noop(fn(spark, "/root/testdata/sf0.1"))),
          time(noop(fn(spark, "/root/testdata/sf0.1"))))
        val t1 = time(noop(fn(spark, dir100)))
        // min-of-2 at 100x only below 20 s: noise matters most for small
        // numbers and those are cheap to re-run; past 20 s a second run
        // buys little honesty for a lot of wall (full-engine sweep
        // budget: 381 members in one session)
        val t100 = if (t1 > 20.0) t1
          else math.min(t1, time(noop(fn(spark, dir100))))
        println(f"SWEEP100 $name%-36s base=$base%7.2f  x100=$t100%8.2f  mult=${t100 / base}%7.1f")
        Console.out.flush()
      } catch {
        case e: Throwable =>
          println(s"SWEEP100 $name FAILED ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).linesIterator.toSeq.headOption.getOrElse(""))
      }
    }
    spark.stop()
  }
}
