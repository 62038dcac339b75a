package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Corpus-level statistical language-model scoring — the CCNet/Gopher
  * "perplexity filter" signal: documents whose tokens are improbable
  * under a model fit on the corpus itself (boilerplate, gibberish,
  * wrong-language) score high and get filtered.
  *
  * The model is an add-k-smoothed unigram LM with a frequency-pruned
  * vocabulary: tokens seen fewer than `minCount` times collapse into a
  * single OOV type (the standard UNK mapping), so
  * `P(t) = (C(t') + k) / (N + k·(V+1))` with `t' = t` for vocabulary
  * tokens and `t' = OOV` otherwise. A document's score is its mean
  * negative log-likelihood per token (`avg_nll`); perplexity is the
  * monotone transform `exp(avg_nll)`, left to the caller so the
  * cross-engine comparison stays in log space where rounding is safe.
  *
  * Scale shape: one corpus pass builds (doc, term) frequencies with full
  * map-side combine; the global term counts derive from that aggregate
  * (never a second scan). The vocabulary after `minCount` pruning is
  * Zipf-truncated — small enough to broadcast at any corpus size where a
  * unigram LM is meaningful (drop the hint and the same plan
  * shuffle-joins on the term key if it is not). Scoring shuffles only
  * distinct (doc, term) pairs — never text. Everything downstream of the
  * tokenizer is expression-tree arithmetic, so the hot path stays in
  * whole-stage codegen.
  */
object LanguageModel {

  /** Per-document mean negative log-likelihood under the corpus unigram
    * LM. Output: (doc_id, n_tokens, avg_nll), one row per document with
    * at least one token. `avg_nll` is rounded to `roundTo` decimals so
    * the float sum is comparison-stable across engines.
    */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String,
                 minCount: Long = 2L, k: Double = 0.5,
                 roundTo: Int = 4): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(k > 0, "add-k smoothing needs k > 0")
    val tf = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        explode(Cols.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    // global term counts from the (doc, term) aggregate — no second scan
    val counts = tf.groupBy("term").agg(sum(col("tf")).as("c"))
    val vocab = counts.filter(col("c") >= minCount)
    // one row: corpus mass, vocabulary size, OOV mass — broadcast scalars
    val stats = counts.agg(
      sum(col("c")).as("n_total"),
      sum(when(col("c") >= minCount, 1L).otherwise(0L)).as("v_size"),
      coalesce(sum(when(col("c") < minCount, col("c"))), lit(0.0)).as("oov_c"))
    val p = (coalesce(col("c"), col("oov_c")) + lit(k)) /
      (col("n_total") + lit(k) * (col("v_size") + lit(1)))
    tf.join(broadcast(vocab), Seq("term"), "left")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        round(sum(col("tf") * -log(p)) / sum(col("tf")), roundTo).as("avg_nll"))
  }

  /** DSIR-style importance score (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): per-document
    * log-likelihood ratio of a TARGET-domain unigram LM to the corpus
    * unigram LM, `Σ_tokens [ln p_target(t) − ln p_corpus(t)]`. Documents
    * that look like the target domain score high; selecting the top mass
    * by score importance-resamples the corpus toward the target.
    * Output: (doc_id, n_tokens, log_ratio), rounded for cross-engine
    * stability. Both models share `minCount`/`k` smoothing and each maps
    * sub-`minCount` tokens to its own OOV type.
    *
    * Scale shape: two [[unigramNll]]-shaped passes (corpus + target —
    * the target sample is benchmark-sized, its pass is trivial) joined on
    * the pruned-vocab term key; scoring shuffles only distinct
    * (doc, term) pairs. */
  def importanceScore(corpus: DataFrame, target: DataFrame, idCol: String,
                      textCol: String, minCount: Long = 2L, k: Double = 0.5,
                      roundTo: Int = 4): DataFrame = {
    def tf(df: DataFrame) = df
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        explode(Cols.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"))
    def lm(t: DataFrame, suffix: String) = {
      val counts = t.groupBy("term").agg(sum(col("tf")).as("c"))
      val vocab = counts.filter(col("c") >= minCount)
        .withColumnRenamed("c", s"c_$suffix")
      val stats = counts.agg(
        sum(col("c")).as(s"n_$suffix"),
        sum(when(col("c") >= minCount, 1L).otherwise(0L)).as(s"v_$suffix"),
        coalesce(sum(when(col("c") < minCount, col("c"))), lit(0.0)).as(s"oov_$suffix"))
      (vocab, stats)
    }
    val corpusTf = tf(corpus)
    val (cv, cs) = lm(corpusTf, "c")
    val (tv, ts) = lm(tf(target), "t")
    def logp(cCol: Column, oovCol: Column, nCol: Column, vCol: Column) =
      log((coalesce(cCol, oovCol) + lit(k)) / (nCol + lit(k) * (vCol + lit(1))))
    // An empty target set makes the stats aggregate emit NULL n_t/v_t
    // (sum over zero rows), which would propagate to an all-null
    // log_ratio — plausible-looking, silently meaningless. Fail loudly
    // (same contract as domainMixSample's empty-stratum guard). An empty
    // CORPUS needs no guard: corpusTf is empty, so the output is empty.
    val nT = when(col("n_t").isNull, raise_error(lit(
      "importanceScore: target set has no non-blank documents"))).otherwise(col("n_t"))
    corpusTf
      .join(broadcast(cv), Seq("term"), "left")
      .join(broadcast(tv), Seq("term"), "left")
      .crossJoin(broadcast(cs)).crossJoin(broadcast(ts))
      .groupBy("doc_id")
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        round(sum(col("tf") *
          (logp(col("c_t"), col("oov_t"), nT, col("v_t")) -
           logp(col("c_c"), col("oov_c"), col("n_c"), col("v_c")))), roundTo)
          .as("log_ratio"))
  }

  /** Importance-resample the corpus toward the target domain: the `n`
    * highest-[[importanceScore]] documents (score-desc, id-asc total
    * order — deterministic), returned as the surviving corpus rows. */
  def importanceResample(corpus: DataFrame, target: DataFrame, idCol: String,
                         textCol: String, n: Int, minCount: Long = 2L,
                         k: Double = 0.5): DataFrame = {
    val top = importanceScore(corpus, target, idCol, textCol, minCount, k)
      .orderBy(col("log_ratio").desc, col("doc_id").asc)
      .limit(n)
      .select(col("doc_id"))
    corpus.join(top, corpus(idCol) === top("doc_id"), "leftsemi")
  }

  /** Perplexity view of [[unigramNll]]: `exp(avg_nll)`. */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
                 minCount: Long = 2L, k: Double = 0.5): DataFrame =
    unigramNll(docs, idCol, textCol, minCount, k, roundTo = 12)
      .select(col("doc_id"), col("n_tokens"), exp(col("avg_nll")).as("ppl"))

  /** Perplexity-band filter (CCNet keeps the middle band: very low =
    * boilerplate, very high = gibberish). Keeps the document rows whose
    * corpus-LM `avg_nll` lies in [lo, hi]. */
  def perplexityBandFilter(docs: DataFrame, idCol: String, textCol: String,
                           lo: Double, hi: Double, minCount: Long = 2L,
                           k: Double = 0.5): DataFrame = {
    val scored = unigramNll(docs, idCol, textCol, minCount, k)
      .filter(col("avg_nll").between(lo, hi))
      .select(col("doc_id"))
    docs.join(scored, docs(idCol) === scored("doc_id"), "leftsemi")
  }

  /** Per-document mean NLL under an add-k-smoothed BIGRAM LM — the
    * order-2 upgrade of [[unigramNll]] (a repetition of frequent tokens
    * in an unseen ORDER is exactly what a unigram model cannot see):
    * tokens below `minCount` map to one OOV type FIRST (so bigram
    * statistics are over the closed vocabulary — the standard UNK
    * pipeline), then `P(w₂|w₁) = (C(w₁w₂)+k) / (C(w₁)+k·(V+1))` with V
    * the mapped-type count. Documents shorter than 2 tokens have no
    * bigrams and are absent from the output.
    *
    * Scale shape: one tokenize pass (doc, pos, term); vocabulary mapping
    * is a broadcast join; the successor comes from ONE (doc)-partitioned
    * lead window (positions, not a self-join); bigram counts and left
    * counts re-aggregate from mapped rows. The bigram-type table is NOT
    * assumed broadcastable (unlike the pruned unigram vocab) — the
    * probability attach is a shuffle join on (w₁, w₂) over distinct
    * per-doc bigram rows. Scoring mirrors [[unigramNll]]'s rounding
    * contract: the per-doc float sum rounds to `roundTo` before
    * comparison. */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
                minCount: Long = 2L, k: Double = 0.5,
                roundTo: Int = 4): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(k > 0, "add-k smoothing needs k > 0")
    // \u0001 prefix keeps the sentinel outside the (ASCII, whitespace-
    // split) token alphabet: a corpus containing the literal word "OOV"
    // never merges into the OOV class. Spelling matches the q180 oracle's
    // chr(1)||'OOV' exactly so the two engines bin identically.
    val oov = "OOV"
    val toks = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"),
        posexplode(Cols.tokens(col(textCol))).as(Seq("pos", "term")))
      // lazy localCheckpoint (the brierDecomposition pattern): the
      // token table feeds both the vocabulary counts and the mapped
      // stream — uncheckpointed, the scan+tokenize+explode ran twice
      .localCheckpoint(false)
    val counts = toks.groupBy("term").agg(count(lit(1)).as("c"))
      // grid-sized, three consumers: the vocab broadcast and the two
      // grid-derived readouts (c1, vSize) below
      .localCheckpoint(false)
    val vocab = counts.filter(col("c") >= minCount).select("term")
    val mapped = toks
      .join(broadcast(vocab.withColumn("__inv", lit(true))), Seq("term"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("__inv").isNotNull, col("term")).otherwise(lit(oov)).as("m"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val big = mapped
      .withColumn("m2", lead(col("m"), 1).over(w))
      .filter(col("m2").isNotNull)
    val docBig = big.groupBy(col("doc_id"), col("m").as("w1"), col("m2").as("w2"))
      .agg(count(lit(1)).as("nb"))
    val c12 = docBig.groupBy(col("w1"), col("w2")).agg(sum(col("nb")).as("c12"))
    // unigram counts and vocabulary size read off the term-count GRID —
    // the mapped token stream collapses onto it exactly (each in-vocab
    // token keeps its term; every below-minCount token folds into the
    // OOV class), so re-scanning the token table for them was pure waste
    val c1 = counts.filter(col("c") >= minCount)
      .select(col("term").as("w1"), col("c").as("c1"))
      .unionByName(counts.filter(col("c") < minCount)
        .agg(sum(col("c")).as("c1")).filter(col("c1").isNotNull)
        .select(lit(oov).as("w1"), col("c1")))
    val vSize = counts.agg(
      (count_distinct(when(col("c") >= minCount, col("term"))) +
        when(count(when(col("c") < minCount, 1)) > 0, 1L).otherwise(0L))
        .as("v"))
    val p = (col("c12") + lit(k)) / (col("c1") + lit(k) * (col("v") + lit(1)))
    docBig
      .join(c12, Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .crossJoin(broadcast(vSize))
      .groupBy("doc_id")
      .agg(sum(col("nb")).as("n_bigrams"),
        round(sum(col("nb") * -log(p)) / sum(col("nb")), roundTo).as("avg_nll"))
  }
}
