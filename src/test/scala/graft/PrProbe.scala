package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17: decompose q123 pagerank's driver-regime cost — footer count,
  * collect of (src,dst) strings, driver loop, output DF. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PRPROBE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (_ <- 1 to 3) {
      val li = graft.sources.Tables.lineitem(spark, d)
      val edges = li.select(
        concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
        concat(lit("p"), col("l_partkey").cast("string")).as("dst"))
      t("footer count")(edges.count())
      val raw = t("collect strings")(
        edges.filter(col("src").isNotNull && col("dst").isNotNull).collect())
      t("dedupe LinkedHashSet") {
        val seen = new java.util.LinkedHashSet[(String, String)]()
        raw.foreach(r => seen.add((r.getString(0), r.getString(1))))
        seen.size
      }
      t("full q123") {
        SparkEntry.queries("q123_x_pagerank")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
