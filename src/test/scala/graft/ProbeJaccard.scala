package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway r17 probe: q394 prefix-filter candidate/output mass at
  * sf0.1 vs the perturbed 100x corpus — is the 141x wall linear work on
  * fixed cores? `sbt "Test/runMain graft.ProbeJaccard"`. */
object ProbeJaccard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    val tE6 = sys.env.getOrElse("PROBE_TE6", "950000").toLong
    val dirs = if (sys.env.contains("PROBE_SF01_ONLY")) Seq("/root/testdata/sf0.1")
               else Seq("/root/testdata/sf0.1", "/tmp/graft100xt")
    for (dir <- dirs) {
      val docs = graft.sources.Tables.documents(spark, dir)
      val toks = docs.select(col("doc_id"),
        explode(array_distinct(graft.functions.Cols.tokens(col("text"))))
          .as("tok"))
      val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      val sorted = toks.join(dfreq, Seq("tok"))
        .groupBy("doc_id")
        .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("st"))
        .select(col("doc_id"), size(col("st")).as("n"),
          expr(s"slice(transform(st, s -> s.tok), 1, " +
            s"size(st) - cast(($tE6 * size(st) + 999999) div 1000000 as int) + 1)")
            .as("pref"))
      val keys = sorted.select(col("doc_id"), col("n"),
        posexplode(col("pref")).as(Seq("pos", "tok")))
      // candidate probe mass without materializing the join: Σ occ_a·occ_b
      // per token with the size filter ignored (upper bound), plus the
      // post-distinct candidate count (the real verify input)
      val occ = keys.groupBy("tok").agg(count(lit(1)).as("o"))
      val mass = occ.agg(sum(col("o") * (col("o") - 1) / 2)).collect()(0).get(0)
      def candCount(positional: Boolean): Long = {
        val base = col("a.tok") === col("b.tok") &&
          col("a.doc_id") < col("b.doc_id") &&
          least(col("a.n"), col("b.n")) * 1000000L >=
            lit(tE6) * greatest(col("a.n"), col("b.n"))
        val cond = if (positional) base &&
          (lit(1L) + least(col("a.n") - col("a.pos") - 1,
            col("b.n") - col("b.pos") - 1)) * (1000000L + tE6) >=
            lit(tE6) * (col("a.n") + col("b.n"))
          else base
        keys.as("a").join(keys.as("b"), cond)
          .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
      }
      val cand = candCount(positional = true)
      val candNoPos = candCount(positional = false)
      val out = graft.text.Dedup.jaccardJoinComplete(
        docs, "doc_id", "text", tE6).count()
      println(s"PROBE $dir prefixPairMass=$mass candidates=$cand candNoPos=$candNoPos matches=$out")
    }
    spark.stop()
  }
}
