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

  test("c4 kernel matches the expression form on every row") {
    // multi-line corpus: join edge strings into documents with planted
    // terminal punct, short lines, blocklist hits, and a doc blocklist hit
    val docs = Seq(
      "Good long line here.\nshort.\nno terminal punct\nAnother solid line!\njavascript heavy line.",
      "One fine sentence stands alone.",
      "",
      "   \n  \n",
      "lorem ipsum dolor sit amet.\nA perfectly good line.\nAnd another good one.\nAnd a third one too.",
      "Ends with quote \"\nends with question?\nends with bang!\nends with period.",
      "  leading spaces count fine.  \n\ttab lead line!\nword",
      "a.\nb!\nc?",
      null.asInstanceOf[String])
    val df = docs.zipWithIndex.map(_.swap).toDF("id", "text")
    val k = TextAnalysis.c4FeatsCol(col("text"), minWordsPerLine = 3,
      minLinesKept = 2)
    val e = TextAnalysis.c4FeatsExpr(col("text"), minWordsPerLine = 3,
      minLinesKept = 2)
    df.select(col("id"), col("text"), k.as("k"), e.as("e")).collect().foreach { r =>
      assert(r.getAs[Any]("k") == r.getAs[Any]("e"),
        s"'${r.get(1)}': kernel=${r.get(2)} expr=${r.get(3)}")
    }
  }

  test("c4 kernel rules fire individually") {
    val f = TextAnalysis.c4Kernel(
      "Good long line here.\nshort.\nno terminal punct here\nsolid javascript line.",
      3, ".!?\"", Seq("javascript"), 1, Seq("lorem ipsum"))
    // line 1 kept; line 2 fails min-words; line 3 fails punct; line 4 blocklist
    assert(f.keep && f.n_lines_kept == 1 && f.n_lines_dropped == 3)
    assert(f.clean_text == "Good long line here.")
    // doc blocklist kills an otherwise-surviving doc
    val g = TextAnalysis.c4Kernel("Lorem IPSUM is planted here today.",
      3, ".!?\"", Seq(), 1, Seq("lorem ipsum"))
    assert(!g.keep && g.n_lines_kept == 1)
    // min-lines threshold
    val h = TextAnalysis.c4Kernel("Only one good line here.",
      3, ".!?\"", Seq(), 2, Seq())
    assert(!h.keep)
    // empty text is ZERO lines (not one empty line), so with
    // minLinesKept = 0 nothing is spuriously counted as dropped
    val e = TextAnalysis.c4Kernel("", 3, ".!?\"", Seq(), 0, Seq())
    assert(e.keep && e.n_lines_kept == 0 && e.n_lines_dropped == 0 && e.clean_text == "")
  }

  test("normalize kernel matches the expression form on ASCII + precomposed Latin-1") {
    val docs = Seq(
      "", "   ", "plain ascii text",
      "Café au lait", "naïve RÉSUMÉ", "Ünïcôde Ça vâ",
      "MiXeD  CaSe   runs\tof\nwhitespace",
      "àèìòù ÁÉÍÓÚ ãõñ ç ÿ",
      "ends  with  spaces   ",
      null.asInstanceOf[String])
    val df = docs.zipWithIndex.map(_.swap).toDF("id", "text")
    df.select(col("text"),
        TextAnalysis.normalizeText(col("text")).as("k"),
        TextAnalysis.normalizeTextExpr(col("text")).as("e"))
      .collect().foreach { r =>
        assert(r.getAs[String]("k") == r.getAs[String]("e"),
          s"'${r.get(0)}': kernel=${r.get(1)} expr=${r.get(2)}")
      }
  }

  test("normalize kernel: decomposed input, control chars, idempotence") {
    // NFD input ('e' + combining acute) folds identically to precomposed
    assert(TextAnalysis.normalizeKernel("Cafe\u0301") == "cafe")
    assert(TextAnalysis.normalizeKernel("Caf\u00e9") == "cafe")
    // non-whitespace ISO controls are stripped outright (no space left)
    assert(TextAnalysis.normalizeKernel("a\u0007bc") == "abc")
    assert(TextAnalysis.normalizeKernel("a\u001cb") == "ab")
    // whitespace controls survive the strip and collapse to one space
    assert(TextAnalysis.normalizeKernel("a\tb") == "a b")
    assert(TextAnalysis.normalizeKernel("a \n b") == "a b")
    // idempotent: normalizing a normal form is the identity
    val once = TextAnalysis.normalizeKernel("\u00dcn\u00efc\u00f4de  \u00c7a v\u00e2 ")
    assert(TextAnalysis.normalizeKernel(once) == once)
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
