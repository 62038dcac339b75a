package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway recall-vs-time sweep for the `suggestedNBits` dial (SURVEY
  * §8) — run manually: `sbt "Test/runMain graft.RecallSweep"` (expects
  * the 10x corpus at /tmp/graft10x_b from [[Synth10x]]).
  *
  * The dial's WALL-CLOCK side is measured (nBits=6 → 14.4 s, 9 → 2.6 s
  * on the 10x embeddings); this records the RECALL side of the same
  * trade so the default `targetBucket` is justified by both halves:
  * for each nBits, the q324 recall@k machinery (lshTopK vs brute-force
  * ground truth on a 64-query probe set, k = 10) plus the min-of-2
  * nearDupPairsBucketed wall time at q60's contract parameters
  * (threshold 0.4, nTables 3). */
object RecallSweep {
  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft10x_b"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    val emb = sources.Tables.embeddings(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val probe = emb.filter(col("vec_id") < 64)
    println(s"RECALL corpus n=$n suggestedNBits(n)=" +
      s"${sim.Similarity.suggestedNBits(n)} (targetBucket=32 default)")
    for (nBits <- 6 to 12) {
      def dup() = sim.Similarity.nearDupPairsBucketed(emb, "vec_id",
          "embedding", dim = 64, threshold = 0.4, nBits = nBits, nTables = 3)
        .write.format("noop").mode("overwrite").save()
      val t = math.min(time(dup()), time(dup()))
      val r = sim.Similarity.annRecall(emb, probe, "vec_id", "embedding",
          dim = 64, k = 10, nBits = nBits, nTables = 3)
        .agg(avg(col("recall_pm")).as("mean_pm"),
          min(col("recall_pm")).as("min_pm"))
        .head()
      println(f"RECALL nBits=$nBits%2d  nearDup=$t%6.2f s  " +
        f"recall@10 mean=${r.getDouble(0) / 1000}%.3f min=${r.getLong(1) / 1000.0}%.3f")
    }
    spark.stop()
  }
}
