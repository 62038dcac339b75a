package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount: whitespace tokens; empty and blank -> 0") {
    val out = Seq("one two  three", "", "   ", "single").toDF("t")
      .select(TextAnalysis.tokenCount(col("t"))).collect().toSeq.map(_.getInt(0))
    assert(out === Seq(3, 0, 0, 1))
  }

  test("qualityFeatures: ratios on a known sentence") {
    val feats = TextAnalysis.qualityFeatures(col("t")).toMap
    val r = Seq("the cat, the hat!").toDF("t")
      .select(feats("n_tokens").as("n"), feats("stopword_ratio").as("sw"),
        feats("punct_ratio").as("p"), feats("avg_token_len").as("atl"))
      .collect().head
    assert(r.getAs[Int]("n") === 4)
    assert(approx(r.getAs[Double]("sw"), 0.5)) // "the" twice of 4 tokens
    assert(approx(r.getAs[Double]("p"), 2.0 / 17.0)) // ',' and '!' of 17 chars
    // tokens: "the","cat,","the","hat!" -> 14 chars / 4
    assert(approx(r.getAs[Double]("atl"), 14.0 / 4.0))
  }

  test("tokenEntropy: hand-quantized H = ln n - (1/n)*sum(c ln c)") {
    val df = Seq((1L, "a a b"), (2L, "x x x x"), (3L, "p q r"), (4L, "  "))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_distinct"), r.getAs[Long]("entropy_e9")))
    def q(x: Double): Long = math.floor(x * 1e9 + 0.5).toLong
    // doc 1: ln3 - (2 ln2)/3 via the quantized path
    val e1 = q(math.log(3)) - q(2 * math.log(2)) / 3
    assert(out.toSeq == Seq(
      (1L, 3L, 2L, e1),
      (2L, 4L, 1L, q(math.log(4)) - q(4 * math.log(4)) / 4),
      (3L, 3L, 3L, q(math.log(3)) - 0L))) // all-distinct: max entropy ln n
    // blank doc 4 absent; doc 2 (pure repetition) has entropy ~0
    assert(out(1)._4.abs <= 1)
  }

  test("languageId: stopword-rich english detected; gibberish -> und") {
    val out = Seq("the cat is on the mat and it is happy",
      "zzz qqq www kkk xxx").toDF("t")
      .select(TextAnalysis.languageId(col("t"))).as[String].collect().toSeq
    assert(out === Seq("en", "und"))
  }

  test("fingerprint: identical docs equal; short doc falls back to whole-text hash") {
    val out = Seq("a b c d e", "a b c d e", "hi").toDF("t")
      .select(TextAnalysis.fingerprint(col("t"))).as[Long].collect().toSeq
    assert(out(0) === out(1))
    assert(out(2) >= 0) // fallback path produced a hash, not null
  }

  test("subwordCount: splits on class boundaries") {
    val out = Seq("hello world42!").toDF("t")
      .select(TextAnalysis.subwordCount(col("t"))).collect().head.getInt(0)
    // "hello", "world", "42", "!"
    assert(out === 4)
  }

  test("cleanCorpus: composed filter + dedup keeps english, long-enough, unique docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),       // keep
      (2L, "the quick brown fox jumps over the lazy dog"),       // dup of 1 -> drop
      (3L, "short of it"),                                       // < minTokens -> drop
      (4L, "zx qw er ty ui op df gh"),                           // no stopwords -> und -> drop
      (5L, "!!! ??? the ;;; of ### and $$$ %%% ^^^"),            // punct-heavy -> drop
      (6L, "it is a fine day for the brown fox and the dog")     // keep
    ).toDF("doc_id", "text")
    val out = TextAnalysis.cleanCorpus(docs, "doc_id", "text",
        lang = "en", minTokens = 5, maxPunctRatio = 0.2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 6L), out.mkString(","))
    assert(out.head.getAs[Long]("n_tokens") == 9L)
  }

  test("repetitionFilter: drops repetitive docs, keeps clean and unmeasurable ones") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),  // clean -> keep
      (2L, "spam spam spam spam spam spam spam spam"),        // top-2gram ~1.0 -> drop
      (3L, "copy line\ncopy line\ncopy line\nother"),         // dup lines -> drop
      (4L, "ok"),                                             // too short to measure -> keep
      (5L, "a b c d e f a b c d e f a b c d e f")             // dup 5-grams -> drop
    ).toDF("doc_id", "text")
    val kept = TextAnalysis.repetitionFilter(docs, "text",
        maxDupLineFrac = 0.3, maxTop2GramFrac = 0.5, maxDup5GramFrac = 0.3)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(1L, 4L))
  }

  test("domainDivergence: zero for corpus-identical domains") {
    val docs = Seq(("a", "x y"), ("b", "x y")).toDF("source", "text")
    val out = TextAnalysis.domainDivergence(docs, "source", "text")
      .orderBy("source").collect()
    assert(out.map(_.getAs[Long]("kl_e9")).forall(_ == 0L),
      "every ratio is 1 -> every ln term is exactly 0")
    assert(out.map(r => (r.getAs[Long]("n_tokens"),
      r.getAs[Long]("n_distinct"))).toSeq == Seq((2L, 2L), (2L, 2L)))
  }

  test("domainDivergence: hand-computed KL for a 2-token skew") {
    // A: x x x y   B: y y y x  -> corpus is uniform {x: 4, y: 4}
    // KL(A ‖ corpus) = 0.75·ln(1.5) + 0.25·ln(0.5) ≈ 0.13081204 nats
    val docs = Seq(("a", "x x x y"), ("b", "y y y x")).toDF("source", "text")
    val out = TextAnalysis.domainDivergence(docs, "source", "text")
      .orderBy("source").collect()
    val expected = 0.75 * math.log(1.5) + 0.25 * math.log(0.5)
    out.foreach { r => // symmetric by construction
      assert(approx(r.getAs[Long]("kl_e9") / 1e9, expected, 2e-9),
        s"${r.getAs[Long]("kl_e9")} vs $expected")
    }
  }

  test("domainDivergence is non-negative and skips null/empty docs") {
    val docs = Seq(("a", "p p p p q"), ("b", "q r s t u"), ("a", "  "),
      (null, "p q")).toDF("source", "text")
    val out = TextAnalysis.domainDivergence(docs, "source", "text").collect()
    assert(out.length == 2)
    out.foreach(r => assert(r.getAs[Long]("kl_e9") >= 0L,
      "KL against a dominating corpus distribution is Gibbs-nonnegative"))
  }

  test("logOddsTerms: hand-computed Fightin'-Words z-scores, deterministic top-k") {
    // side 0: "apple apple banana"; side 1: "cherry banana"
    // V=3, na=3, nb=2; apple (2,0), banana (1,1), cherry (0,1)
    val docs = Seq((0, "apple apple banana"), (1, "cherry banana"))
      .toDF("side", "text")
    def z(ca: Long, cb: Long): Long = {
      val (na, nb, v) = (3.0, 2.0, 3.0)
      val d = math.log((ca + 1.0) / (na + v - ca - 1.0)) -
        math.log((cb + 1.0) / (nb + v - cb - 1.0))
      val va = 1.0 / (ca + 1.0) + 1.0 / (cb + 1.0)
      math.floor(d / math.sqrt(va) * 1e6 + 0.5).toLong
    }
    val out = TextAnalysis.logOddsTerms(docs, "side", "text", topK = 2)
      .collect().map(r => (r.getAs[String]("direction"), r.getAs[Int]("rank")) ->
        (r.getAs[String]("token"), r.getAs[Long]("z_e6"))).toMap
    assert(out(("a", 1)) == (("apple", z(2, 0))))
    assert(out(("a", 2)) == (("banana", z(1, 1))))
    assert(out(("b", 1)) == (("cherry", z(0, 1))))
    assert(out(("b", 2)) == (("banana", z(1, 1))))
    assert(z(2, 0) > 0 && z(0, 1) < 0)
  }

  test("vocabRichness: hand-computed Chao1 + Good-Turing; f2=0 correction") {
    // domain a: tokens p*3 q*2 r s -> N=7, D=4, f1=2 (r,s), f2=1 (q)
    // chao1 = 4 + 4/2 = 6.00; gt = 2*1e6 div 7 = 285714
    // domain b: t u v (all singletons) -> f2=0 correction:
    // chao1 = 3 + 3*2/2 = 6.00; gt = 1e6 (all mass unseen-ish)
    val docs = Seq(("a", "p p p q q r s"), ("b", "t u v"),
      ("a", null.asInstanceOf[String]), (null, "x")).toDF("source", "text")
    val out = TextAnalysis.vocabRichness(docs, "source", "text")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out.size == 2)
    val a = out("a")
    assert(a.getAs[Long]("n_tokens") == 7L && a.getAs[Long]("n_distinct") == 4L)
    assert(a.getAs[Long]("f1") == 2L && a.getAs[Long]("f2") == 1L)
    assert(a.getAs[Long]("chao1_e2") == 600L)
    assert(a.getAs[Long]("gt_unseen_e6") == 285714L)
    val b = out("b")
    assert(b.getAs[Long]("chao1_e2") == 600L)
    assert(b.getAs[Long]("gt_unseen_e6") == 1000000L)
  }

  test("readability: hand-computed Flesch over the vowel-group proxy") {
    // "the cat sat. it ran!" -> words 5, sentences 2, syllables 5
    // flesch = 206.835 - 1.015*2.5 - 84.6*1 = 119.6975
    val df = Seq((0L, "the cat sat. it ran!"),
      (1L, "xyz qrs"),      // no vowels: floor 1 syllable per word
      (2L, "unpunctuated stream of words"), // 1 run-on sentence
      (3L, null.asInstanceOf[String]), (4L, "   ")).toDF("doc_id", "text")
    val out = collectReadability(df)
    assert(out(0L).getAs[Long]("n_words") == 5L)
    assert(out(0L).getAs[Long]("n_sentences") == 2L)
    assert(out(0L).getAs[Long]("n_syllables") == 5L)
    assert(out(0L).getAs[Long]("flesch_e4") ==
      math.floor((206.835 - 1.015 * 2.5 - 84.6 * 1.0) * 1e4 + 0.5).toLong)
    assert(out(1L).getAs[Long]("n_syllables") == 2L) // one floor credit each
    assert(out(2L).getAs[Long]("n_sentences") == 1L)
    assert(out(3L).get(out(3L).fieldIndex("flesch_e4")) == null)
    assert(out(4L).get(out(4L).fieldIndex("flesch_e4")) == null)
  }

  private def collectReadability(df: org.apache.spark.sql.DataFrame) =
    TextAnalysis.readability(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("vocabJsd: 0 on identical sides, ln 2 on disjoint vocabularies") {
    val same = Seq((0, "a b c"), (1, "a b c")).toDF("side", "text")
    assert(TextAnalysis.vocabJsd(same, "side", "text")
      .collect().head.getAs[Long]("jsd_e9") == 0L)
    val disj = Seq((0, "a"), (1, "b")).toDF("side", "text")
    val r = TextAnalysis.vocabJsd(disj, "side", "text").collect().head
    // each one-sided token contributes floor(0.5*ln2*1e9 + 0.5) exactly
    val half = math.floor(0.5 * math.log(2.0) * 1e9 + 0.5).toLong
    assert(r.getAs[Long]("jsd_e9") == 2 * half)
    assert(r.getAs[Long]("n_vocab") == 2L)
  }

  test("vocabJsd: hand-computed asymmetric mix; empty side yields null") {
    // A = "a a b" (p_a=2/3, p_b=1/3), B = "a b b" (q_a=1/3, q_b=2/3)
    val df = Seq((0, "a a b"), (1, "a b b")).toDF("side", "text")
    val r = TextAnalysis.vocabJsd(df, "side", "text").collect().head
    def term(c: Long, n: Long, co: Long, no: Long): Long =
      if (c == 0) 0L
      else math.floor(0.5 * (c.toDouble / n.toDouble) *
        math.log(2.0 * c.toDouble * no.toDouble /
          (c.toDouble * no.toDouble + co.toDouble * n.toDouble)) * 1e9 + 0.5).toLong
    val exp = term(2, 3, 1, 3) + term(1, 3, 2, 3) + // token a: both sides
      term(1, 3, 2, 3) + term(2, 3, 1, 3)           // token b symmetric
    assert(r.getAs[Long]("jsd_e9") == exp, s"jsd=${r.getAs[Long]("jsd_e9")} exp=$exp")
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    // one empty side -> null jsd
    val one = Seq((0, "a b")).toDF("side", "text")
    val r1 = TextAnalysis.vocabJsd(one, "side", "text").collect().head
    assert(r1.get(r1.fieldIndex("jsd_e9")) == null)
  }
}
