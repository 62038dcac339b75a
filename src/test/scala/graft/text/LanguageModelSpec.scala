package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Corpus-LM perplexity scoring: hand-computed add-k unigram NLL on a
  * 3-doc corpus, the perplexity transform, the CCNet band filter, and
  * partition independence. */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // counts: a=3 b=2 c=1 d=1; minCount=2 -> vocab {a,b}, V=2, N=7, oov=2
  // k=0.5 -> denom = 7 + 0.5*(2+1) = 8.5; P(a)=3.5/8.5, P(b)=P(oov)=2.5/8.5
  private val docs = Seq(
    (1L, "a a b"),
    (2L, "a b c"),
    (3L, "d")
  ).toDF("doc_id", "text")

  private val pA = 3.5 / 8.5
  private val pOov = 2.5 / 8.5
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("unigramNll matches the hand-computed add-k unigram model") {
    val out = LanguageModel.unigramNll(docs, "doc_id", "text", minCount = 2L,
        k = 0.5, roundTo = 6)
      .orderBy("doc_id").collect()
    val expected = Seq(
      (1L, 3L, r6(-(2 * math.log(pA) + math.log(pOov)) / 3)),
      (2L, 3L, r6(-(math.log(pA) + 2 * math.log(pOov)) / 3)),
      (3L, 1L, r6(-math.log(pOov))))
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq == expected)
  }

  test("perplexity is exp(avg_nll); all-OOV doc scores highest") {
    val out = LanguageModel.perplexity(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(approx(out(2).getDouble(2), 1.0 / pOov, 1e-6)) // doc 3: pure OOV
    assert(out(2).getDouble(2) > out(0).getDouble(2))     // rarer -> higher ppl
  }

  test("perplexityBandFilter keeps only the middle band") {
    val nll = LanguageModel.unigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getDouble(2))
    val lo = nll.min + 1e-9 // exclude the most-probable doc (1)
    val hi = nll.max - 1e-9 // exclude the most-improbable doc (3)
    val kept = LanguageModel.perplexityBandFilter(docs, "doc_id", "text", lo, hi)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("importanceScore matches the hand-computed DSIR log-ratio") {
    // target = doc 1 only: counts a=2 b=1 -> vocab_t {a}, n_t=3, v_t=1, oov_t=1
    // p_t(a) = 2.5/4; p_t(b) = p_t(OOV) = 1.5/4
    val target = docs.filter($"doc_id" === 1L)
    val out = LanguageModel.importanceScore(docs, target, "doc_id", "text",
        minCount = 2L, k = 0.5, roundTo = 6)
      .orderBy("doc_id").collect()
    val ptA = 2.5 / 4.0
    val ptO = 1.5 / 4.0
    def lr(terms: Seq[(Double, Double)]): Double =
      r6(terms.map { case (pt, pc) => math.log(pt) - math.log(pc) }.sum)
    val expected = Seq(
      (1L, 3L, lr(Seq((ptA, pA), (ptA, pA), (ptO, pOov)))),          // a a b
      (2L, 3L, lr(Seq((ptA, pA), (ptO, pOov), (ptO, pOov)))),        // a b c
      (3L, 1L, lr(Seq((ptO, pOov)))))                                 // d
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq == expected)
    // the target document itself must rank most target-like
    assert(out.maxBy(_.getDouble(2)).getLong(0) == 1L)
  }

  test("importanceResample keeps the top-n by (score desc, id asc)") {
    val target = docs.filter($"doc_id" === 1L)
    val kept = LanguageModel.importanceResample(docs, target, "doc_id", "text", n = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.size == 2)
  }

  test("scores are partition-independent and ignore empty/null text") {
    val withJunk = docs.union(Seq((4L, ""), (5L, "   ")).toDF("doc_id", "text"))
      .union(Seq((6L, Option.empty[String])).toDF("doc_id", "text"))
    val a = LanguageModel.unigramNll(withJunk, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = LanguageModel.unigramNll(withJunk.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.map(_.getLong(0)) == Seq(1L, 2L, 3L)) // 4/5/6 produce no row
  }

  test("importanceScore fails loudly on an empty target set, not all-null scores") {
    val empty = docs.filter($"doc_id" < 0L)
    val e = intercept[Exception] {
      LanguageModel.importanceScore(docs, empty, "doc_id", "text").collect()
    }
    assert(e.getMessage.contains("no non-blank documents"),
      s"expected the empty-target raise_error, got: ${e.getMessage}")
  }

  test("bigramNll: unseen-order bigrams score worse than corpus-frequent ones") {
    // 'a b' appears 3x, 'b a' never; all tokens frequent (no OOV mapping)
    val docs = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "b a c")).toDF("doc_id", "text")
    val out = LanguageModel.bigramNll(docs, "doc_id", "text", minCount = 1L)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    val nll1 = out(0).getAs[Double]("avg_nll")
    val nll2 = out(1).getAs[Double]("avg_nll")
    assert(out(0).getAs[Long]("n_bigrams") == 8)
    assert(out(1).getAs[Long]("n_bigrams") == 2)
    assert(nll2 > nll1, s"unseen order should score worse: $nll2 <= $nll1")
  }

  test("bigramNll: closed-form check on a two-token corpus") {
    // corpus: single doc "x y". V = 2 types, bigram (x,y): c12=1, c1(x)=1
    // P(y|x) = (1+0.5)/(1+0.5*3) = 0.6 -> nll = -ln(0.6)
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    val r = LanguageModel.bigramNll(docs, "doc_id", "text", minCount = 1L)
      .collect().head
    assert(r.getAs[Long]("n_bigrams") == 1)
    assert(math.abs(r.getAs[Double]("avg_nll") - (-math.log(0.6))) < 1e-4)
  }

  test("bigramNll: rare tokens collapse to OOV before bigram stats") {
    // 'zzz' occurs once -> OOV with minCount=2; both docs then share the
    // mapped bigram (a, OOV) so doc 2 benefits from doc 1's statistics
    val docs = Seq(
      (1L, "a zzz a zzz"), // note: zzz occurs twice -> kept at minCount=2
      (2L, "a qqq")).toDF("doc_id", "text")
    val out = LanguageModel.bigramNll(docs, "doc_id", "text", minCount = 2L)
      .orderBy("doc_id").collect()
    // doc2's (a, qqq) maps to (a, OOV); it must still be scored (present)
    assert(out.length == 2)
    assert(out(1).getAs[Long]("n_bigrams") == 1)
    // single-token or empty docs are absent
    val single = Seq((1L, "only")).toDF("doc_id", "text")
    assert(LanguageModel.bigramNll(single, "doc_id", "text").count() == 0)
  }
}
