package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Text-analysis operators for the training-data-pipeline surface
  * (builder brief: language-ID, quality scoring, token counting, document
  * fingerprinting). All pure expression trees over the `documents` table —
  * codegen'd, shuffle-free per-row transforms, so they stream through a
  * 100 TB corpus at scan speed.
  */
object TextAnalysis {

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "this", "that")

  /** Token count: whitespace tokenization (empty text → 0). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(Cols.tokens(text)))

  /** A BPE-ish sub-word unit count: maximal runs of letters, digits, or
    * punctuation (whitespace separates) — a cheap deterministic proxy for
    * tokenizer load estimation. Same regex runs verbatim in the DuckDB
    * oracle (`regexp_extract_all`). */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(trim(text), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"), lit(0)))

  /** Quality-score feature bundle: (n_tokens, avg token length, punctuation
    * ratio, stopword ratio, uppercase ratio). Ratios null-guarded. */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = Cols.tokens(text)
    // tokenCount, not raw size(toks): split("") yields [""], so raw size
    // reports 1 token for empty text while q41's tokenCount reports 0 —
    // the two features must agree for any consumer joining them
    val n = tokenCount(text).cast("double")
    val stopHits = size(filter(toks, t => t.isin(EnglishStopwords: _*))).cast("double")
    Seq(
      "n_tokens" -> tokenCount(text),
      "avg_token_len" -> Cols.safeDiv(length(concat_ws("", toks)).cast("double"), n),
      "punct_ratio" -> Cols.safeDiv(
        (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))).cast("double"),
        length(text).cast("double")),
      "stopword_ratio" -> Cols.safeDiv(stopHits, n),
      "upper_ratio" -> Cols.safeDiv(
        (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double"),
        length(text).cast("double"))
    )
  }

  /** Heuristic language-ID: stopword hit-rate against per-language stopword
    * lists; argmax language, `und` when no list scores above `minScore`.
    * (n-gram-free variant suited to whitespace languages; deterministic.) */
  def languageId(text: Column,
                 stoplists: Map[String, Seq[String]] = Map("en" -> EnglishStopwords),
                 minScore: Double = 0.05): Column = {
    val toks = Cols.tokens(lower(text))
    val n = nullif(size(toks).cast("double"), lit(0.0))
    val scored = stoplists.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct((size(filter(toks, t => t.isin(words: _*))).cast("double") / n).as("score"),
        lit(lang).as("lang"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    when(best.getField("score") >= minScore, best.getField("lang")).otherwise(lit("und"))
  }

  /** Document fingerprint: min portable-hash over word 3-shingles (a
    * rolling-hash winnowing analog). Equal fingerprints ⇒ near-dup
    * candidates. Short docs fall back to hashing the whole text.
    * Single-pass JVM implementation ([[TextHash.fingerprint]]). */
  def fingerprint(text: Column, k: Int = 3): Column = TextHash.fingerprintCol(text, k)

  /** Expression-tree form of [[fingerprint]] — parity-spec reference only. */
  private[text] def fingerprintExpr(text: Column, k: Int = 3): Column = {
    val sh = Cols.shingles(Cols.tokens(text), k)
    coalesce(array_min(transform(sh, s => Cols.hash32(s))), Cols.hash32(trim(text)))
  }
}
