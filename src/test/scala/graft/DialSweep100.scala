package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway two-decade (100x / sf1-equivalent) sweep of the banded
  * dedup/ANN family for SURVEY §8 — run manually after [[Synth100x]]:
  * `sbt "Test/runMain graft.DialSweep100"`.
  *
  * Each member runs at its REGISTERED operator shape; the LSH dials
  * scale with the corpus per their documented contract
  * (`suggestedNBits(n)` — the q60 10x lesson codified in round 10):
  * fixed nBits is quadratic BY CONTRACT, the dial is the scale path
  * this sweep is proving. Wall times are min-of-2; output row counts
  * printed so the linear-output regime is on record. */
object DialSweep100 {
  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft100x"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    def noop(df: DataFrame) = df.write.format("noop").mode("overwrite").save()

    val emb = sources.Tables.embeddings(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val nBits = sim.Similarity.suggestedNBits(n)
    println(s"SWEEP corpus n=$n suggestedNBits=$nBits")

    def run(label: String, mk: () => DataFrame): Unit = {
      val rows = mk().count()
      val t = math.min(time(noop(mk())), time(noop(mk())))
      println(f"SWEEP $label%-28s $t%7.2f s  rows=$rows")
    }

    run("q60 nearDupBucketed", () =>
      sim.Similarity.nearDupPairsBucketed(emb, "vec_id", "embedding",
        dim = 64, threshold = 0.4, nBits = nBits, nTables = 3))
    run("q119 crossNearDupBucketed", () =>
      sim.Similarity.crossNearDupBucketed(
        emb.filter(col("vec_id") % 5 =!= 0), emb.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", dim = 64, threshold = 0.4,
        nBits = nBits, nTables = 3))
    run("q52 lshTopK", () =>
      sim.Similarity.lshTopK(emb.filter(col("vec_id") < 200),
        "vec_id", "embedding", dim = 64, k = 3))
    run("q58 ivfTopK", () => {
      val vecs = emb.filter(col("vec_id") < 200)
      val model = sim.Ivf.train(vecs, "vec_id", "embedding", k = 8, iters = 3)
      sim.Ivf.topK(vecs, "vec_id", "embedding", model, k = 3, nProbe = 2)
    })

    val docs = sources.Tables.documents(spark, dir)
    val sigs = docs.select(col("doc_id"))
      .withColumn("content", multimodal.Multimodal.texturedImageCol(col("doc_id")))
      .withColumn("sig", multimodal.Multimodal.dHashCol(col("content")))
      .select("doc_id", "sig")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"SWEEP docs sigs n=${sigs.count()}")
    run("q131 hammingCandidates", () =>
      text.Dedup.hammingCandidates(sigs, "doc_id", "sig",
        bits = 56, bands = 4, maxHamming = 3))
    spark.stop()
  }
}
