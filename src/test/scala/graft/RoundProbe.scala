package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: is `round(double)` (BigDecimal-backed) the q226
  * bottleneck vs `floor(x + 0.5)` (pure double codegen)? */
object RoundProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/tmp/graft10x_b/lineitem.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (_ <- 1 to 2) {
      time("round   ") {
        li.select(
          round(col("l_quantity")).cast("long").as("a"),
          round(col("l_extendedprice")).cast("long").as("b"),
          round(col("l_discount") * 100).cast("long").as("c"),
          round(col("l_tax") * 100).cast("long").as("d"))
          .agg(sum(col("a") * col("b")), sum(col("c") * col("d")))
          .write.format("noop").mode("overwrite").save()
      }
      time("floorhalf") {
        li.select(
          floor(col("l_quantity") + 0.5).as("a"),
          floor(col("l_extendedprice") + 0.5).as("b"),
          floor(col("l_discount") * 100 + 0.5).as("c"),
          floor(col("l_tax") * 100 + 0.5).as("d"))
          .agg(sum(col("a") * col("b")), sum(col("c") * col("d")))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
