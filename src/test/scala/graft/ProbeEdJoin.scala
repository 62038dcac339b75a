package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway r17 probe: candidate-mass evidence for the q392 ed-join
  * 100x adjudication, against q139's fixed-prefix blocking on the same
  * perturbed part catalog. `sbt "Test/runMain graft.ProbeEdJoin"`. */
object ProbeEdJoin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft100xt")) {
      val part = graft.sources.Tables.part(spark, dir)
      val corrupted = part.filter(col("p_partkey") % 4 === 0)
        .withColumn("pos",
          (col("p_partkey") % length(col("p_name")) + 1).cast("int"))
        .select(col("p_partkey").as("c_key"),
          expr("concat(substring(p_name, 1, pos - 1), substring(p_name, pos + 1, 1000))")
            .as("c_name"))

      // q139 fixed-prefix blocking candidate mass (3-char blocks, the
      // length prefilter applied): Σ_blk |L_b|·|R_b|
      val lb = corrupted.groupBy(substring(col("c_name"), 1, 3).as("blk"))
        .agg(count(lit(1)).as("nl"))
      val rb = part.groupBy(substring(col("p_name"), 1, 3).as("blk"))
        .agg(count(lit(1)).as("nr"))
      val blockMass = lb.join(rb, Seq("blk"))
        .agg(sum(col("nl") * col("nr"))).collect()(0).get(0)

      // ed-join candidate pairs (the distinct pre-DP set) + matches
      val out = graft.operators.FuzzyJoin.byEditDistanceQGram(
        corrupted, part, "c_name", "p_name",
        payload = Seq("p_partkey"), maxDist = 2, q = 3)
      val nMatches = out.count()
      println(s"PROBE $dir q139blockMass=$blockMass edjoinMatches=$nMatches")
    }
    spark.stop()
  }
}
