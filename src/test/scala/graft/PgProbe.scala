package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17: decompose q358 periodogramAutoN — monthly cells, windowed tail
  * selection, coef join + DECIMAL(38) DFT aggregation, readout. */
object PgProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    import graft.sources.Tables
    import graft.functions.Cols
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PGPROBE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def cal(): Unit = t("calibration") {
      spark.range(0L, 2000000000L, 1L, 32)
        .selectExpr("sum((id * 2654435761) % 1000003) as s")
        .write.format("noop").mode("overwrite").save()
    }
    def monthly = Tables.orders(spark, d)
      .groupBy(col("o_custkey").as("custkey"),
        Cols.monthStart(col("o_orderdate")).as("month"))
      .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")).as("cents"))
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    import graft.stats.Diagnostics
    val kk = Seq(col("custkey"))
    def coefDf = Diagnostics.AutoNCandidates.flatMap(n => Diagnostics.dftTableE15(n)
        .map { case (k2, t2, c2, s2) => (n, k2, t2, c2, s2) })
      .toDF("__n", "__k", "__t", "__c", "__s")
    def tail0 = {
      val wDesc = Window.partitionBy(kk: _*).orderBy(col("month").desc)
      monthly.filter(col("cents").isNotNull)
        .withColumn("__rnd", row_number().over(wDesc))
        .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(kk: _*)))
        .withColumn("__nsel", expr(
          Diagnostics.AutoNCandidates.sorted.reverse.map(n => s"when __cnt >= $n then $n")
            .mkString("case ", " ", " end")))
        .filter(col("__nsel").isNotNull && col("__rnd") <= col("__nsel"))
        .withColumn("__t", (col("__nsel") - col("__rnd")).cast("int"))
        .select(kk :+ col("__nsel") :+ col("__t") :+
          col("cents").cast("long").as("__x"): _*)
    }
    def sums0 = {
      val tl = tail0
      val cf = coefDf
      tl.join(broadcast(cf),
          tl("__nsel") === cf("__n") && tl("__t") === cf("__t"))
        .groupBy(kk :+ col("__nsel") :+ col("__k"): _*)
        .agg(sum(expr("cast(__x as decimal(38,0)) * __c")).as("__sc"),
          sum(expr("cast(__x as decimal(38,0)) * __s")).as("__ss"))
    }
    def sumsLong = {
      val tl = tail0
      val cf = coefDf
      tl.join(broadcast(cf),
          tl("__nsel") === cf("__n") && tl("__t") === cf("__t"))
        .groupBy(kk :+ col("__nsel") :+ col("__k"): _*)
        .agg(sum(expr("__x * __c")).as("__sc"),
          sum(expr("__x * __s")).as("__ss"))
    }
    for (r <- 1 to 3) {
      println(s"== round $r"); cal()
      t("monthly cells only")(noop(monthly))
      t("tail (2 windows)")(noop(tail0))
      t("sums decimal")(noop(sums0))
      t("sums long (sizing only)")(noop(sumsLong))
      t("full q358")(noop(SparkEntry.queries("q358_u6_periodogram_auto_n")(spark, d)))
    }
    spark.stop()
  }
}
