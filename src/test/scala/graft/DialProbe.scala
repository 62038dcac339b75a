package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway scale-dial probe for SURVEY §8 — run manually:
  * `sbt "Test/runMain graft.DialProbe"` (expects the 10x corpus at
  * /tmp/graft10x_b from [[Synth10x]]).
  *
  * Measures the TWO round-8 tier members whose documented dials had no
  * numbers at the 10x (sf1-equivalent) decade:
  *   - q246 trimmedMean: the value grid over ~200k distinct dollar
  *     prices per flag is the cost driver — the documented dial is
  *     binning the value axis upstream (the ksDrift convention). Probe:
  *     exact dollars vs $8 bins (grid ~25k/flag).
  *   - q257 rougeN: the (pair, gram) overlap join's STRING keys are the
  *     cost driver — the dial is `hashGrams = true` (60-bit gram keys,
  *     8 bytes fixed vs tens per string). Probe: string vs hashed on
  *     the identical pair set.
  */
object DialProbe {
  private def time(fn: => Unit): Double = {
    val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft10x_b"
    // optional 2nd arg: probe-set selector ("all" | "aa")
    val sel = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)

    def probe(lbl: String)(fn: => org.apache.spark.sql.DataFrame): Unit = {
      def run() = time(fn.write.format("noop").mode("overwrite").save())
      val t = math.min(run(), run())
      println(f"DIALPROBE $lbl%-34s $t%7.2f s")
    }

    if (sel == "all") {
    val li = sources.Tables.lineitem(spark, dir)
    probe("q246 trimmedMean exact dollars") {
      operators.Sketch.trimmedMean(
        li.withColumn("price_d", floor(col("l_extendedprice") + 0.5)),
        Seq("l_returnflag"), "price_d", trimPermille = 50)
    }
    probe("q246 trimmedMean $8-binned") {
      operators.Sketch.trimmedMean(
        li.withColumn("price_d", floor(col("l_extendedprice") / 8 + 0.5) * 8),
        Seq("l_returnflag"), "price_d", trimPermille = 50)
    }

    // q309 partialCorrelation: the nine DECIMAL(38,0) sufficient sums are
    // the cost driver (the round-9 sweep's 6.95x outlier). Probe the
    // LONG-sum alternative (identical aggregate shape, 8-byte buffers):
    // cents framing ALREADY overflows 2^63 at sf0.1 (n*1e14), so a LONG
    // path must re-frame to dollars AND caps keys at ~9e8 rows — the
    // probe measures what that generality trade would buy.
    probe("q309 partialCorr DECIMAL cents") {
      operators.Profile.partialCorrelation(
        li.withColumn("qty", expr("cast(floor(l_quantity + 0.5) as bigint)"))
          .withColumn("cents", expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)"))
          .withColumn("disc_pm", expr("cast(floor(l_discount * 1000 + 0.5) as bigint)")),
        Seq("l_returnflag"), "qty", "cents", "disc_pm")
    }
    probe("q309 partialCorr LONG dollars") {
      operators.Profile.partialCorrelation(
        li.withColumn("qty", expr("cast(floor(l_quantity + 0.5) as bigint)"))
          .withColumn("dollars", expr("cast(floor(l_extendedprice + 0.5) as bigint)"))
          .withColumn("disc_pm", expr("cast(floor(l_discount * 1000 + 0.5) as bigint)")),
        Seq("l_returnflag"), "qty", "dollars", "disc_pm", longSums = true)
    }

    val docs = sources.Tables.documents(spark, dir)
    val pairs = docs.filter(pmod(col("doc_id"), lit(2L)) === 0)
      .select(col("doc_id").as("cand_id"), (col("doc_id") + 1).as("ref_id"))
    probe("q257 rougeN string grams") {
      text.Retrieval.rougeN(docs, "doc_id", "text", pairs, n = 2)
    }
    probe("q257 rougeN hashGrams=true") {
      text.Retrieval.rougeN(docs, "doc_id", "text", pairs, n = 2,
        hashGrams = true)
    }
    }

    // q343 adamicAdar: the `maxDegree` dial bounds the Σ deg² wedge
    // blowup by excluding hubs from the CENTER role — the documented
    // trade (a vanishing 1/ln tail of recall for the quadratic cost) had
    // no measured numbers. Probe the dial ladder on the 10x co-purchase
    // graph; also report the wedge count each setting admits.
    val li343 = sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val edges343 = li343.as("x").join(li343.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      .localCheckpoint()
    for (md <- Seq(50L, 200L, 800L, 3200L)) {
      probe(s"q343 adamicAdar maxDegree=$md") {
        operators.Graph.adamicAdar(edges343, "src", "dst",
          maxDegree = md, topK = 25)
      }
    }
    spark.stop()
  }
}
