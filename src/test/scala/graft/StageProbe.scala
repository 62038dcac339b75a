package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17: within-session A/B of the final-sort strategies on row-scale
  * members — plain global orderBy vs staged (localCheckpoint under the
  * sort). */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    import graft.sources.Tables
    import graft.functions.Cols
    def t(tag: String)(f: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STPROBE $tag%-30s min=${ts.min}%.3f all=${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    def cal(): Unit = t("calibration")(
      spark.range(0L, 2000000000L, 1L, 32).selectExpr("sum((id * 2654435761) % 1000003) as s"))

    def q358plain = graft.stats.Diagnostics.periodogramAutoN(
      Tables.orders(spark, d)
        .groupBy(col("o_custkey").as("custkey"), Cols.monthStart(col("o_orderdate")).as("month"))
        .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")).as("cents")),
      Seq("custkey"), "month", "cents").orderBy("custkey", "k")

    def q392plain = {
      val corrupted = Tables.part(spark, d).filter(col("p_partkey") % 4 === 0)
        .withColumn("pos", (col("p_partkey") % length(col("p_name")) + 1).cast("int"))
        .select(col("p_partkey").as("c_key"),
          expr("concat(substring(p_name, 1, pos - 1), substring(p_name, pos + 1, 1000))").as("c_name"))
      graft.operators.FuzzyJoin.byEditDistanceQGram(
          corrupted, Tables.part(spark, d), "c_name", "p_name",
          payload = Seq("p_partkey"), maxDist = 2, q = 3)
        .select(col("c_key"), col("p_partkey"),
          col("edit_dist").cast("int").as("edit_dist"))
        .orderBy("c_key", "p_partkey")
    }

    import org.apache.spark.sql.graft.CompactOrder
    for (r <- 1 to 2) {
      println(s"== round $r"); cal()
      t("q358 plain orderBy")(q358plain)
      t("q358 staged")(CompactOrder.staged(q358plain))
      t("q392 plain orderBy")(q392plain)
      t("q392 staged")(CompactOrder.staged(q392plain))
    }
    spark.stop()
  }
}
