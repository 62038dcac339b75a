package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway decomposition probe for q180 (round-16 verdict task 7). */
object BgProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    val d = "/root/testdata/sf0.1"
    def noop(df: DataFrame) = df.write.format("noop").mode("overwrite").save()
    def time(label: String)(fn: => Unit): Unit = {
      val t0 = System.nanoTime(); fn
      println(f"PROBE $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val docs = sources.Tables.documents(spark, d)
    noop(docs.limit(10))
    val toks = docs.filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        posexplode(functions.Cols.tokens(col("text"))).as(Seq("pos", "term")))
    time("toks explode")(noop(toks))
    time("counts")(noop(toks.groupBy("term").agg(count(lit(1)).as("c"))))
    val counts = toks.groupBy("term").agg(count(lit(1)).as("c"))
    val vocab = counts.filter(col("c") >= 2).select("term")
    val mapped = toks
      .join(broadcast(vocab.withColumn("__inv", lit(true))), Seq("term"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("__inv").isNotNull, col("term")).otherwise(lit("OOV")).as("m"))
    time("mapped")(noop(mapped))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val big = mapped.withColumn("m2", lead(col("m"), 1).over(w))
      .filter(col("m2").isNotNull)
    time("window bigrams")(noop(big))
    val docBig = big.groupBy(col("doc_id"), col("m").as("w1"), col("m2").as("w2"))
      .agg(count(lit(1)).as("nb"))
    time("docBig")(noop(docBig))
    time("full")(noop(text.LanguageModel.bigramNll(docs, "doc_id", "text")))
    time("full again")(noop(text.LanguageModel.bigramNll(docs, "doc_id", "text")))
    spark.stop()
  }
}
