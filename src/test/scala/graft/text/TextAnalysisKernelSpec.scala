package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity: the single-pass JVM kernels behind [[TextAnalysis.qualityFeatures]]
  * and [[TextAnalysis.languageId]] must agree with their expression-tree
  * specifications on every row, including the degenerate shapes (empty,
  * whitespace-only, punctuation-only, no-stopword, all-stopword, null). */
class TextAnalysisKernelSpec extends SparkSpec {
  import spark.implicits._

  private val edge = Seq(
    "",
    "   ",
    "a",
    "The quick brown fox jumps over the lazy dog",
    "the the the and and of",
    "!!! ??? ...",
    "MiXeD CaSe TEXT with 123 numbers and PUNCT!?",
    "\ttabs\tand\nnewlines\r\nmixed  spaces",
    "word",
    "ALLCAPS SENTENCE HERE",
    "a an and or of to in is it for on with as by at this that",
    "no stop words here whatsoever brown fox vulpine",
    "comma,separated,values;semicolons:colons",
    "trailing spaces   ",
    "   leading spaces",
    null.asInstanceOf[String])

  private def corpus = {
    val rng = new scala.util.Random(17)
    val words = Seq("the", "fox", "Run!", "jump42", "qUiCk", "a", "of", "zebra,", "dog.", "it")
    val rand = (1 to 200).map(_ =>
      (1 to rng.nextInt(30)).map(_ => words(rng.nextInt(words.length))).mkString(" "))
    (edge.filter(_ != null) ++ rand :+ null).zipWithIndex.map(_.swap).toDF("id", "text")
  }

  test("quality kernel matches the expression form on every row") {
    val df = corpus
    val kcol = TextAnalysis.qualityFeatures(col("text")).toMap
    val ecol = TextAnalysis.qualityFeaturesExpr(col("text")).toMap
    val names = Seq("n_tokens", "avg_token_len", "punct_ratio", "stopword_ratio", "upper_ratio")
    val out = df.select(
      (col("id") +: col("text") +:
        (names.map(n => kcol(n).as(s"k_$n")) ++ names.map(n => ecol(n).as(s"e_$n")))): _*)
      .collect()
    out.foreach { r =>
      names.foreach { n =>
        val k = r.getAs[Any](s"k_$n")
        val e = r.getAs[Any](s"e_$n")
        (k, e) match {
          case (null, null) => ()
          case (kd: Double, ed: Double) =>
            assert(kd == ed, s"[$n] '${r.get(1)}': kernel=$kd expr=$ed")
          case _ => assert(k == e, s"[$n] '${r.get(1)}': kernel=$k expr=$e")
        }
      }
    }
  }

  test("languageId kernel matches the expression form, single and multi list") {
    val lists = Map(
      "en" -> TextAnalysis.EnglishStopwords,
      "xx" -> Seq("fox", "zebra,", "qoph"))
    val df = corpus
      .withColumn("k1", TextAnalysis.languageId(col("text")))
      .withColumn("e1", TextAnalysis.languageIdExpr(col("text")))
      .withColumn("k2", TextAnalysis.languageId(col("text"), lists))
      .withColumn("e2", TextAnalysis.languageIdExpr(col("text"), lists))
    df.collect().foreach { r =>
      assert(r.getAs[String]("k1") == r.getAs[String]("e1"),
        s"single-list '${r.get(1)}': ${r.get(2)} vs ${r.get(3)}")
      assert(r.getAs[String]("k2") == r.getAs[String]("e2"),
        s"multi-list '${r.get(1)}': ${r.get(4)} vs ${r.get(5)}")
    }
  }

}
