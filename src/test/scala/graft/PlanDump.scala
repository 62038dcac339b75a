package graft

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for a set of registry queries to
  * `<outDir>/<query><suffix>.txt` — the r17 plan-evidence generator
  * (judge checks plan claims against these files).
  *
  * args: outDir suffix [comma-separated query prefixes | "all"]
  * NOTE: building a STREAMING twin's frame executes its drain; batch
  * frames stay lazy (plan-only).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names: Seq[String] = args.lift(2) match {
      case None | Some("all") => SparkEntry.queries.keys.toSeq.sorted
      case Some(ps) =>
        val pre = ps.split(",").map(_.trim).filter(_.nonEmpty)
        SparkEntry.queries.keys.filter(n => pre.exists(n.startsWith)).toSeq.sorted
    }
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "24h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, d)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, n + suffix + ".txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $n failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
