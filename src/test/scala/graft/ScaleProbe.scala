package graft

import org.apache.spark.sql.SparkSession

/** Throwaway scale probe for SURVEY §8 sweeps — run manually:
  * `sbt "Test/runMain graft.ScaleProbe <embeddings-dir>"`. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(args(0) + "/embeddings.parquet")
    for (nb <- Seq(6, 10)) {
      val t0 = System.nanoTime
      val n = graft.sim.Similarity.nearDupPairsBucketed(e, "vec_id", "embedding",
        dim = 64, threshold = 0.85, nBits = nb, nTables = 2).count()
      println(f"PROBE nBits=$nb pairs=$n wall=${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
