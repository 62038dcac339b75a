package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Text-analysis operators for the training-data-pipeline surface
  * (builder brief: language-ID, quality scoring, token counting, document
  * fingerprinting). Shuffle-free per-row transforms over the `documents`
  * table: simple counts stay pure expression trees (codegen'd); the
  * token-loop features (quality bundle, language-ID) run as single-pass
  * JVM kernels behind deterministic UDFs — their expression forms use
  * higher-order array functions, which never enter codegen and evaluate
  * ~ms per doc interpreted. Each kernel keeps its expression form as a
  * parity-tested specification (TextAnalysisKernelSpec), the same
  * discipline as [[TextHash]].
  */
object TextAnalysis {

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "this", "that")

  /** Token count: whitespace tokenization (empty text → 0, null → null —
    * the explicit guard matters because non-ANSI `size(null)` is -1, so an
    * unguarded `otherwise(size(...))` would leak -1 for null text). */
  def tokenCount(text: Column): Column =
    when(text.isNull, lit(null).cast("int"))
      .when(length(trim(text)) === 0, lit(0))
      .otherwise(size(Cols.tokens(text)))

  /** A BPE-ish sub-word unit count: maximal runs of letters, digits, or
    * punctuation (whitespace separates) — a cheap deterministic proxy for
    * tokenizer load estimation. Same regex runs verbatim in the DuckDB
    * oracle (`regexp_extract_all`). */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(trim(text), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"), lit(0)))

  /** Struct returned by the single-pass quality kernel. `None` ratios mirror
    * the expression form's null-guarded divisions. */
  private[text] final case class QualityFeats(
      n_tokens: Int, avg_token_len: Option[Double], punct_ratio: Option[Double],
      stopword_ratio: Option[Double], upper_ratio: Option[Double])

  /** Single-pass JVM quality kernel — parity-tested against
    * [[qualityFeaturesExpr]] (TextAnalysisKernelSpec). The expression form
    * walks the token array through `filter`/`concat_ws` higher-order
    * functions, which never enter codegen (~ms per doc interpreted); one
    * traversal of the raw string + one of the token array computes the
    * whole bundle. Counts are CODE POINTS to match Spark's `length`. */
  private[text] def qualityKernel(text: String, stopwords: Set[String]): QualityFeats = {
    val trimmed = TextHash.sparkTrim(text)
    val toks: Array[String] =
      if (trimmed.isEmpty) Array.empty else trimmed.split("\\s+", -1)
    val n = toks.length
    var tokChars = 0L
    var stopHits = 0
    var ti = 0
    while (ti < n) {
      val t = toks(ti)
      tokChars += t.codePointCount(0, t.length)
      if (stopwords.contains(t)) stopHits += 1
      ti += 1
    }
    var punct = 0
    var upper = 0
    var len = 0
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      // regex-\s is the ASCII class [ \t\n\x0B\f\r]; anything else
      // non-alphanumeric (incl. non-ASCII) counts as punctuation — the
      // exact complement [^a-zA-Z0-9\s] of the expression form
      val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
      val isAl = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') || (cp >= '0' && cp <= '9')
      if (!isWs && !isAl) punct += 1
      if (cp >= 'A' && cp <= 'Z') upper += 1
      len += 1
      i += Character.charCount(cp)
    }
    QualityFeats(n,
      if (n == 0) None else Some(tokChars.toDouble / n),
      if (len == 0) None else Some(punct.toDouble / len),
      if (n == 0) None else Some(stopHits.toDouble / n),
      if (len == 0) None else Some(upper.toDouble / len))
  }

  /** One struct column (n_tokens, avg_token_len, punct_ratio,
    * stopword_ratio, upper_ratio) from the single-pass kernel. */
  def qualityFeaturesCol(text: Column,
                         stopwords: Seq[String] = EnglishStopwords): Column = {
    val stopSet = stopwords.toSet
    udf((t: String) => if (t == null) null else qualityKernel(t, stopSet)).apply(text)
  }

  /** Quality-score feature bundle: (n_tokens, avg token length, punctuation
    * ratio, stopword ratio, uppercase ratio). Ratios null-guarded. The
    * five columns are field views of ONE deterministic UDF call —
    * subexpression elimination keeps it a single kernel pass per row. */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val f = qualityFeaturesCol(text)
    Seq("n_tokens", "avg_token_len", "punct_ratio", "stopword_ratio", "upper_ratio")
      .map(name => name -> f.getField(name))
  }

  /** Expression-tree form of [[qualityFeatures]] — interpreted HOFs, kept
    * as the specification the kernel is parity-tested against. */
  private[text] def qualityFeaturesExpr(text: Column): Seq[(String, Column)] = {
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
    * lists; argmax language (ties break to the lexicographically larger
    * code, matching SQL `greatest` struct order), `und` when no list scores
    * above `minScore`. Single-pass JVM kernel, parity-tested against
    * [[languageIdExpr]]. */
  def languageId(text: Column,
                 stoplists: Map[String, Seq[String]] = Map("en" -> EnglishStopwords),
                 minScore: Double = 0.05): Column = {
    val lists = stoplists.toSeq.sortBy(_._1).map { case (l, ws) => (l, ws.toSet) }
    udf { (t: String) =>
      if (t == null) null
      else {
        // default-locale toLowerCase ON PURPOSE: Spark's lower() (the
        // parity spec / oracle path) takes UTF8String's non-ASCII slow
        // path through String.toLowerCase() with the default locale —
        // Locale.ROOT here would diverge on e.g. Turkish-locale JVMs
        val toks = TextHash.sparkTrim(t.toLowerCase).split("\\s+", -1)
        val n = toks.length.toDouble // raw size: [""] for empty, never 0
        var bestScore = Double.NegativeInfinity
        var bestLang = ""
        lists.foreach { case (lang, words) =>
          var hits = 0
          var i = 0
          while (i < toks.length) { if (words.contains(toks(i))) hits += 1; i += 1 }
          val score = hits / n
          if (score > bestScore || (score == bestScore && lang > bestLang)) {
            bestScore = score; bestLang = lang
          }
        }
        if (bestScore >= minScore) bestLang else "und"
      }
    }.apply(text)
  }

  /** Expression-tree form of [[languageId]] — parity-spec reference only.
    * Null-guarded: non-ANSI `size(null)` is -1, which would otherwise make
    * score = -1/-1 = 1.0 and misclassify null text as the first language. */
  private[text] def languageIdExpr(text: Column,
                 stoplists: Map[String, Seq[String]] = Map("en" -> EnglishStopwords),
                 minScore: Double = 0.05): Column = {
    val toks = Cols.tokens(lower(text))
    val n = when(text.isNull, lit(null).cast("double"))
      .otherwise(nullif(size(toks).cast("double"), lit(0.0)))
    val scored = stoplists.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct((size(filter(toks, t => t.isin(words: _*))).cast("double") / n).as("score"),
        lit(lang).as("lang"))
    }
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    when(text.isNull, lit(null).cast("string"))
      .when(best.getField("score") >= minScore, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Composed corpus-cleaning pass — the LLM training-data workflow the
    * extension operators exist for, in ONE plan: language filter
    * ([[languageId]]) + quality thresholds ([[qualityFeaturesCol]]) +
    * exact dedup over the SURVIVORS (keep each duplicate group's smallest
    * id). Dedup is a min-over-digest-partition window on a PROJECTED
    * frame (id, digest, features) — the text column is dropped before the
    * shuffle and the quality/langid kernels run exactly once per doc (a
    * self-join against [[Dedup.exact]] would re-execute them on both
    * branches). Null punct_ratio (empty text) is treated as 0 for the
    * threshold, but such docs are already dropped by `minTokens`.
    * Output: (id, n_tokens, punct_ratio) of the kept documents. */
  def cleanCorpus(docs: DataFrame, idCol: String, textCol: String,
                  lang: String = "en", minTokens: Int = 5,
                  maxPunctRatio: Double = 0.2): DataFrame = {
    val f = qualityFeaturesCol(col(textCol))
    val filtered = docs.select(col(idCol), col(textCol),
        f.getField("n_tokens").as("n_tokens"),
        f.getField("punct_ratio").as("punct_ratio"),
        languageId(col(textCol)).as("lang_pred"))
      .filter(col("lang_pred") === lang &&
        col("n_tokens") >= minTokens &&
        coalesce(col("punct_ratio"), lit(0.0)) <= maxPunctRatio)
    val slim = filtered.select(col(idCol),
      Dedup.exactDigest(col(textCol)).as("__digest"),
      col("n_tokens"), col("punct_ratio"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__digest")
    slim.withColumn("__keep", min(col(idCol)).over(w))
      .filter(col(idCol) === col("__keep"))
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        round(col("punct_ratio"), 4).as("punct_ratio"))
  }

  /** Gopher-style repetition filter (Rae et al. 2021 table A1, the
    * repetition axis of the quality rules): drop documents whose
    * duplicate-line fraction, top-2-gram coverage, or duplicated-5-gram
    * coverage exceeds its threshold. One [[Repetition.keepCol]] kernel
    * pass per row, no shuffle — composes with [[cleanCorpus]] upstream of
    * its dedup window. Null fractions (too few tokens/lines to measure)
    * PASS the filter: absence of evidence of repetition is not
    * repetition, and short docs are `minTokens`-gated elsewhere.
    * Output: the surviving rows of `docs`, unchanged. */
  def repetitionFilter(docs: DataFrame, textCol: String,
                       maxDupLineFrac: Double = 0.3,
                       maxTop2GramFrac: Double = 0.2,
                       maxDup5GramFrac: Double = 0.15): DataFrame = {
    docs.filter(Repetition.keepCol(col(textCol),
      maxDupLineFrac, maxTop2GramFrac, maxDup5GramFrac))
  }

  // ------------------------------------------------- C4-style line filter

  /** Struct returned by the single-pass C4 line-filter kernel. */
  private[text] final case class C4Feats(
      keep: Boolean, n_lines_kept: Int, n_lines_dropped: Int, clean_text: String)

  /** Single-pass C4-style line-filter kernel (Raffel et al. 2020 §2.2's
    * line-level heuristics, parameterized): a LINE survives iff its
    * trimmed form ends in a terminal-punctuation character, has at least
    * `minWordsPerLine` whitespace words, and contains (case-insensitively)
    * no blocklisted phrase; the DOCUMENT survives iff at least
    * `minLinesKept` lines survive and its lowercased full text contains no
    * document-level blocklisted phrase. Kept lines are re-joined verbatim
    * (untrimmed) with `\n` — the filter drops lines, it does not rewrite
    * them. Parity-tested against [[c4FeatsExpr]] (TextAnalysisKernelSpec). */
  private[text] def c4Kernel(text: String, minWordsPerLine: Int,
                             terminal: String, lineBlock: Seq[String],
                             minLinesKept: Int, docBlock: Seq[String]): C4Feats = {
    // empty text is ZERO lines, not one empty line ("".split yields [""])
    // — matches the q103 oracle's lined derivation and keeps
    // n_lines_dropped honest when minLinesKept = 0
    val lines = if (text.isEmpty) Array.empty[String] else text.split("\n", -1)
    val sb = new java.lang.StringBuilder
    var kept = 0
    var i = 0
    while (i < lines.length) {
      val raw = lines(i)
      val t = TextHash.sparkTrim(raw)
      val lower = raw.toLowerCase
      val ok = t.nonEmpty &&
        terminal.indexOf(t.charAt(t.length - 1)) >= 0 &&
        t.split("\\s+", -1).length >= minWordsPerLine &&
        !lineBlock.exists(lower.contains)
      if (ok) {
        if (kept > 0) sb.append('\n')
        sb.append(raw)
        kept += 1
      }
      i += 1
    }
    val docOk = kept >= minLinesKept && {
      val lt = text.toLowerCase
      !docBlock.exists(lt.contains)
    }
    C4Feats(docOk, kept, lines.length - kept, sb.toString)
  }

  /** One struct column (keep, n_lines_kept, n_lines_dropped, clean_text)
    * from the single-pass C4 kernel. Null text → null struct. */
  def c4FeatsCol(text: Column, minWordsPerLine: Int = 3,
                 terminal: String = ".!?\"", lineBlocklist: Seq[String] = Seq("javascript"),
                 minLinesKept: Int = 3,
                 docBlocklist: Seq[String] = Seq("lorem ipsum", "{")): Column = {
    val lb = lineBlocklist.map(_.toLowerCase)
    val db = docBlocklist.map(_.toLowerCase)
    udf((t: String) => if (t == null) null
      else c4Kernel(t, minWordsPerLine, terminal, lb, minLinesKept, db)).apply(text)
  }

  /** C4-style corpus cleaning pass: applies the line filter and keeps the
    * surviving documents. Shuffle-free — one kernel pass per row; the
    * document either survives with its kept lines re-joined or is dropped.
    * Output: (id, n_lines_kept, n_lines_dropped, clean_text). */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
              minWordsPerLine: Int = 3, terminal: String = ".!?\"",
              lineBlocklist: Seq[String] = Seq("javascript"),
              minLinesKept: Int = 3,
              docBlocklist: Seq[String] = Seq("lorem ipsum", "{")): DataFrame = {
    val f = c4FeatsCol(col(textCol), minWordsPerLine, terminal,
      lineBlocklist, minLinesKept, docBlocklist)
    docs.select(col(idCol), f.as("__c4"))
      .filter(col("__c4").getField("keep"))
      .select(col(idCol),
        col("__c4").getField("n_lines_kept").cast("long").as("n_lines_kept"),
        col("__c4").getField("n_lines_dropped").cast("long").as("n_lines_dropped"),
        col("__c4").getField("clean_text").as("clean_text"))
  }

  /** Expression-tree form of the C4 line filter — parity-spec reference
    * only (interpreted HOFs: the documented trap). */
  private[text] def c4FeatsExpr(text: Column, minWordsPerLine: Int = 3,
                 terminal: String = ".!?\"", lineBlocklist: Seq[String] = Seq("javascript"),
                 minLinesKept: Int = 3,
                 docBlocklist: Seq[String] = Seq("lorem ipsum", "{")): Column = {
    val lines = split(text, "\n", -1)
    val termClass = "[" + java.util.regex.Pattern.quote(terminal) + "]$"
    def lineOk(x: Column): Column = {
      val t = trim(x)
      val words = when(length(t) === 0, lit(0)).otherwise(size(split(t, "\\s+", -1)))
      length(t) > 0 && t.rlike(termClass) && words >= minWordsPerLine &&
        !lineBlocklist.map(b => lower(x).contains(b.toLowerCase))
          .foldLeft(lit(false))(_ || _)
    }
    val kept = filter(lines, lineOk _)
    val docOk = size(kept) >= minLinesKept &&
      !docBlocklist.map(b => lower(text).contains(b.toLowerCase))
        .foldLeft(lit(false))(_ || _)
    when(text.isNull, lit(null))
      // kernel contract: empty text is zero lines (split would say one)
      .when(length(text) === 0,
        struct(lit(0 >= minLinesKept).as("keep"), lit(0).as("n_lines_kept"),
          lit(0).as("n_lines_dropped"), lit("").as("clean_text")))
      .otherwise(struct(docOk.as("keep"),
        size(kept).as("n_lines_kept"),
        (size(lines) - size(kept)).as("n_lines_dropped"),
        array_join(kept, "\n").as("clean_text")))
  }

  // ------------------------------------------------ Unicode normalization

  /** Single-pass Unicode normalization kernel: NFD-decompose, drop
    * combining marks (accent folding), drop NON-WHITESPACE ISO control
    * characters (whitespace controls — tab/LF/CR/FF/VT — survive to the
    * collapse step, so `a\tb` becomes `a b`, not `ab`), NFC-recompose,
    * lowercase (default JVM locale — the same slow path Spark's `lower()`
    * takes, see [[languageId]]), collapse whitespace runs to single
    * spaces, trim. The step ORDER is the contract: accents fold before
    * lowercasing, whitespace collapses last — and matches the DuckDB
    * oracle formulation
    * `trim(regexp_replace(lower(strip_accents(nfc_normalize(x))), '\s+', ' ', 'g'))`
    * on control-free input. Parity-tested against [[normalizeTextExpr]]. */
  private[text] def normalizeKernel(text: String): String = {
    import java.text.Normalizer
    val nfd = Normalizer.normalize(text, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      val tpe = Character.getType(cp)
      val isMark = tpe == Character.NON_SPACING_MARK ||
        tpe == Character.COMBINING_SPACING_MARK || tpe == Character.ENCLOSING_MARK
      // regex-\s members pass through (collapsed later); every other
      // control is stripped — the enumeration matches Java regex \s
      // exactly (Character.isWhitespace would also spare \x1C-\x1F,
      // which \s+ then could NOT collapse)
      val isWsControl = cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
      val isBadControl = Character.isISOControl(cp) && !isWsControl
      if (!isMark && !isBadControl) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val recomposed = Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
    TextHash.sparkTrim(recomposed.toLowerCase.replaceAll("\\s+", " "))
  }

  /** Normalized-text column: accent-folded, control-stripped, lowercased,
    * whitespace-collapsed — the canonical form fed to dedup hashing so
    * `Café  x` and `cafe x` collide. Null → null. */
  def normalizeText(text: Column): Column =
    udf((t: String) => if (t == null) null else normalizeKernel(t)).apply(text)

  /** Expression-tree form of [[normalizeText]] for ASCII + precomposed
    * Latin-1 input — parity-spec reference only (Spark has no built-in
    * accent folding; the expr form enumerates the planted accent set). */
  private[text] def normalizeTextExpr(text: Column): Column = {
    val folded = translate(text,
      "áàâäãåéèêëíìîïóòôöõúùûüýÿçñÁÀÂÄÃÅÉÈÊËÍÌÎÏÓÒÔÖÕÚÙÛÜÝÇÑ",
      "aaaaaaeeeeiiiiooooouuuuyycnAAAAAAEEEEIIIIOOOOOUUUUYCN")
    // strip class = controls MINUS the regex-\s members \x09-\x0D, which
    // survive to the \s+ collapse (kernel contract)
    trim(regexp_replace(lower(regexp_replace(folded, "[\\x00-\\x08\\x0E-\\x1F\\x7F]", "")), "\\s+", " "))
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

  /** Per-domain KL divergence of the token unigram distribution against
    * the whole corpus — the domain-mix diagnostic (which sources skew the
    * training distribution, and by how many nats): `KL(p_d ‖ p) =
    * Σ_t (c_dt/n_d)·ln(c_dt·n / (n_d·c_t))`. Every term is well-defined
    * without smoothing because the corpus distribution dominates each
    * domain (`c_t ≥ c_dt > 0` for every token the domain contains).
    *
    * Determinism discipline: each term is computed per (domain, token)
    * row from EXACT integer counts (integer products < 2⁵³ are exact in
    * doubles; ÷ and ln then round identically per row), quantized to
    * integer nanonats via `floor(x·10⁹ + 0.5)`, and summed exactly —
    * no cross-row float accumulation, so `kl_e9` hash-matches a SQL
    * replay (the [[graft.operators.MonteCarlo]] quantization rule).
    *
    * Scale shape: one token-explode aggregate to (domain, token) counts
    * (map-side combine carries distinct tokens, not token instances),
    * one token-keyed re-aggregate for corpus counts joined back on the
    * same token key, and broadcast-sized domain/corpus totals — raw
    * rows are scanned once and never reshuffled.
    *
    * Output: `domainCol, n_tokens, n_distinct, kl_e9` (ascending KL ⇒
    * closest-to-corpus first). */
  def domainDivergence(docs: DataFrame, domainCol: String,
                       textCol: String): DataFrame = {
    val tok = docs
      .filter(col(domainCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(domainCol), explode(Cols.tokens(col(textCol))).as("__t"))
    val cdt = tok.groupBy(col(domainCol), col("__t"))
      .agg(count(lit(1)).as("__cdt"))
    val perDomain = cdt.groupBy(col(domainCol))
      .agg(sum(col("__cdt")).as("__nd"), count(lit(1)).as("n_distinct"))
    val ct = cdt.groupBy(col("__t")).agg(sum(col("__cdt")).as("__ct"))
    val total = cdt.agg(sum(col("__cdt")).as("__n"))
    val term = (col("__cdt").cast("double") / col("__nd")) *
      log((col("__cdt") * col("__n")).cast("double") /
        (col("__nd") * col("__ct")).cast("double"))
    cdt.join(ct, "__t")
      .join(broadcast(perDomain), domainCol)
      .crossJoin(broadcast(total))
      .withColumn("__term_e9", floor(term * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col(domainCol))
      .agg(max(col("__nd")).as("n_tokens"),
        max(col("n_distinct")).as("n_distinct"),
        sum(col("__term_e9")).as("kl_e9"))
  }

  /** Differential vocabulary analysis between two corpus sides — the
    * smoothed log-odds-ratio z-scores of Monroe et al.'s "Fightin'
    * Words": PER-TERM readouts of what distinguishes side A from side B
    * where [[vocabJsd]]/[[domainDivergence]] compress the difference to
    * one scalar. `δ_w = ln((c_aw+α)/(n_a+αV−c_aw−α)) −
    * ln((c_bw+α)/(n_b+αV−c_bw−α))`, `σ²_w ≈ 1/(c_aw+α) + 1/(c_bw+α)`,
    * `z_w = δ_w/σ_w`; emits the `topK` most A-leaning and most
    * B-leaning terms (Laplace α = 1 — the uninformative-Dirichlet
    * special case, documented).
    *
    * Exactness: counts/totals/V are exact integers off ONE
    * conditional-pivot aggregate; δ, σ, z are one fixed double tree
    * each per term, e6-quantized; ranking orders by the QUANTIZED
    * (z_e6, token) so the cut is total and deterministic.
    *
    * Scale shape: one token-keyed aggregate with map-side combine,
    * broadcast totals, then two TakeOrdered top-k passes (never a
    * global sort); the rank column is a window over the 2·topK
    * survivors. Output: `(direction 'a'|'b', rank, token, c_a, c_b,
    * z_e6)`. */
  def logOddsTerms(docs: DataFrame, sideCol: String, textCol: String,
                   topK: Int = 25): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val grid = docs
      .filter(col(sideCol).isNotNull && col(textCol).isNotNull &&
        length(trim(col(textCol))) > 0)
      .select(col(sideCol).as("__side"), explode(Cols.tokens(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col("__t"))
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("c_a"),
        sum(when(col("__side") =!= 0, 1L).otherwise(0L)).as("c_b"))
      .localCheckpoint(false)
    val tots = grid.agg(sum(col("c_a")).as("__na"), sum(col("c_b")).as("__nb"),
      count(lit(1)).as("__v"))
    val d = """(ln((cast(c_a as double) + 1.0)
              |   / (cast(__na as double) + cast(__v as double)
              |      - cast(c_a as double) - 1.0))
              | - ln((cast(c_b as double) + 1.0)
              |   / (cast(__nb as double) + cast(__v as double)
              |      - cast(c_b as double) - 1.0)))"""
      .stripMargin.replaceAll("\n", " ")
    val v = "(1.0 / (cast(c_a as double) + 1.0) + 1.0 / (cast(c_b as double) + 1.0))"
    val scored = grid.crossJoin(broadcast(tots))
      .withColumn("z_e6", expr(
        s"cast(floor($d / sqrt($v) * 1000000 + 0.5) as bigint)"))
      .select(col("__t").as("token"), col("c_a"), col("c_b"), col("z_e6"))
    val topA = scored.orderBy(col("z_e6").desc, col("token")).limit(topK)
      .withColumn("direction", lit("a"))
    val topB = scored.orderBy(col("z_e6").asc, col("token")).limit(topK)
      .withColumn("direction", lit("b"))
    val wRank = org.apache.spark.sql.expressions.Window.partitionBy(col("direction"))
      .orderBy(when(col("direction") === "a", -col("z_e6")).otherwise(col("z_e6")),
        col("token"))
    topA.unionByName(topB)
      .withColumn("rank", row_number().over(wRank))
      .select("direction", "rank", "token", "c_a", "c_b", "z_e6")
  }

  /** Per-domain vocabulary RICHNESS estimates — "how much vocabulary
    * exists beyond this sample": the Chao1 lower-bound estimator
    * `D + f₁²/(2f₂)` (bias-corrected `D + f₁(f₁−1)/2` when no
    * doubletons) over the frequency-of-frequencies, and the Good–Turing
    * unseen-probability mass `P₀ = f₁/N` — the two classic closed-form
    * answers to "is this corpus slice saturated or still growing",
    * which [[domainDivergence]]'s distance and `Corpus.zipfSlope`'s
    * shape statistic cannot give. (Chao 1984; Good 1953.)
    *
    * Exactness: D, N, f₁, f₂ are exact integer re-aggregations of the
    * (domain, token) count grid — no float crosses a row boundary;
    * Chao1 is ONE fixed double tree e2-quantized and the Good–Turing
    * mass is the exact integer `f₁·10⁶ div N`.
    *
    * Scale shape: one token explode → (domain, token) aggregate with
    * map-side combine → (domain, count) frequency grid → one grid fold.
    * Output: `(domainCol, n_tokens, n_distinct, f1, f2, chao1_e2,
    * gt_unseen_e6)`. */
  def vocabRichness(docs: DataFrame, domainCol: String,
                    textCol: String): DataFrame = {
    val cdt = docs
      .filter(col(domainCol).isNotNull && col(textCol).isNotNull &&
        length(trim(col(textCol))) > 0)
      .select(col(domainCol), explode(Cols.tokens(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(col(domainCol), col("__t"))
      .agg(count(lit(1)).as("__c"))
    cdt.groupBy(col(domainCol))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("__c") === 2L, 1L).otherwise(0L)).as("f2"))
      .withColumn("chao1_e2", expr(
        """cast(floor(case when f2 > 0 then
          |  cast(n_distinct as double)
          |    + cast(f1 as double) * cast(f1 as double)
          |      / (2.0 * cast(f2 as double))
          |else
          |  cast(n_distinct as double)
          |    + cast(f1 as double) * cast(f1 - 1 as double) / 2.0
          |end * 100 + 0.5) as bigint)""".stripMargin))
      .withColumn("gt_unseen_e6", expr("f1 * 1000000 div n_tokens"))
  }

  /** Jensen–Shannon divergence between the token unigram distributions
    * of two corpus sides (0 = baseline, 1 = candidate) — the bounded,
    * symmetric vocabulary-drift monitor beside [[domainDivergence]]'s
    * one-vs-corpus KL: `JSD = ½Σ p·ln(2p/(p+q)) + ½Σ q·ln(2q/(p+q))`,
    * always finite (a token absent from one side contributes `½p·ln 2`)
    * and capped at `ln 2` nats — the "how different is this refresh's
    * vocabulary" dial that KL blows up on.
    *
    * Determinism (the q153 discipline): the mixture ratio rides as the
    * integer form `2·c_a·n_b / (c_a·n_b + c_b·n_a)` — exact integer
    * counts per (token, side) off ONE conditional-pivot aggregate, each
    * side's term one fixed double tree e9-quantized per token, exact
    * integer sums. Bound: per-term products `c·n` must stay below 2⁵³
    * for double exactness (domainDivergence's published bound).
    *
    * Scale shape: one token explode → one token-keyed aggregate with
    * map-side combine (both sides pivot in the same pass — no
    * side-vs-side join), broadcast totals, one token-grid sum.
    * Output: one row `(n_a, n_b, n_vocab, jsd_e9)`; an empty side
    * yields `jsd_e9` null. */
  def vocabJsd(docs: DataFrame, sideCol: String, textCol: String): DataFrame = {
    val tok = docs
      .filter((col(sideCol) === 0 || col(sideCol) === 1) &&
        col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(sideCol).as("__side"), explode(Cols.tokens(col(textCol))).as("__t"))
    val grid = tok.groupBy(col("__t"))
      .agg(sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__cb"))
    jsdFromTokenGrid(grid)
  }

  /** The JSD readout over a per-token side-count grid (`__t, __ca,
    * __cb`) — ONE definition shared by the batch operator and the
    * streaming twin (whose complete-mode state IS this grid), the
    * driftFromComponentSums convention. */
  def jsdFromTokenGrid(grid: DataFrame): DataFrame = {
    val tots = grid.agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))
    grid.crossJoin(broadcast(tots))
      .withColumn("__ta", expr(
        """case when __ca > 0 and __na > 0 and __nb > 0 then
          |  cast(floor(0.5 * (cast(__ca as double) / cast(__na as double))
          |    * ln(2.0 * cast(__ca as double) * cast(__nb as double)
          |         / (cast(__ca as double) * cast(__nb as double)
          |            + cast(__cb as double) * cast(__na as double)))
          |    * 1000000000 + 0.5) as bigint)
          |else cast(0 as bigint) end""".stripMargin))
      .withColumn("__tb", expr(
        """case when __cb > 0 and __na > 0 and __nb > 0 then
          |  cast(floor(0.5 * (cast(__cb as double) / cast(__nb as double))
          |    * ln(2.0 * cast(__cb as double) * cast(__na as double)
          |         / (cast(__cb as double) * cast(__na as double)
          |            + cast(__ca as double) * cast(__nb as double)))
          |    * 1000000000 + 0.5) as bigint)
          |else cast(0 as bigint) end""".stripMargin))
      .groupBy()
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        count(lit(1)).as("n_vocab"),
        when(max(col("__na")) > 0 && max(col("__nb")) > 0,
          sum(col("__ta") + col("__tb"))).as("jsd_e9"))
  }

  /** Per-document Flesch reading-ease score — the classic readability
    * quality signal (Flesch 1948) beside the Gopher/C4 structural
    * filters: `206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words)` with a deterministic syllable PROXY
    * (vowel-group runs `[aeiouy]+` per lowercased word, floor one per
    * word — the standard heuristic; a dictionary syllabifier is out of
    * scope and would break the SQL replay). Sentences count terminal-
    * punctuation runs `[.!?]+`, floored at one so an unpunctuated
    * document reads as a single run-on sentence rather than dividing
    * by zero.
    *
    * Exactness: all three counts are exact integers from codegen'd
    * regexps (no UDF — `regexp_extract_all` + a `filter` HOF for the
    * vowel-less floor, both with DuckDB twins); the score is ONE fixed
    * double tree e4-quantized. Null/empty text emits null score.
    *
    * Scale shape: shuffle-free per-row kernel. Output: `(idCol,
    * n_words, n_sentences, n_syllables, flesch_e4)`. */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = TextAnalysis.tokenCount(t).cast("long")
    val sentences = greatest(lit(1L),
      size(regexp_extract_all(t, lit("[.!?]+"), lit(0))).cast("long"))
    // vowel-group runs across the doc + one floor-credit per vowel-less word
    val vgroups = size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0)))
      .cast("long")
    val novowel = size(filter(Cols.tokens(lower(t)),
      w => w.rlike("^[^aeiouy]*$") && length(w) > 0)).cast("long")
    val syll = vgroups + novowel
    docs.select(col(idCol),
      when(t.isNotNull && length(trim(t)) > 0, words).as("n_words"),
      when(t.isNotNull && length(trim(t)) > 0, sentences).as("n_sentences"),
      when(t.isNotNull && length(trim(t)) > 0, syll).as("n_syllables"))
      .withColumn("flesch_e4", expr(
        """case when n_words > 0 then
          |  cast(floor((206.835
          |    - 1.015 * (cast(n_words as double) / cast(n_sentences as double))
          |    - 84.6 * (cast(n_syllables as double) / cast(n_words as double)))
          |    * 10000 + 0.5) as bigint)
          |end""".stripMargin))
  }

  /** Per-document token Shannon entropy — the information-density quality
    * feature: `H = ln n − (1/n)·Σᵢ cᵢ·ln cᵢ` over the document's token
    * counts (nats). Low entropy at non-trivial length = repetition
    * (keyword stuffing, boilerplate loops) the Gopher fraction statistics
    * see only at fixed gram sizes; max entropy (`ln n`, all tokens
    * distinct) at short length = the hash-gibberish shape.
    *
    * Exactness (the q153/domainDivergence discipline): counts are exact
    * integers; each distinct token contributes ONE fixed-tree float term
    * `(cᵢ/n)·ln cᵢ`, e9-quantized per term and summed exactly, and the
    * `ln n` lead term is e9-quantized once — so `entropy_e9` is
    * reproducible bit-for-bit across engines. Tokens with cᵢ = 1
    * contribute 0 exactly (ln 1 = 0), on both sides of the oracle.
    *
    * Scale shape: one explode → one (doc, token) aggregate → one per-doc
    * aggregate, all sharing the doc_id shuffle; no window, no join.
    * Output: `(doc_id, n_tokens, n_distinct, entropy_e9)`. */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cnt = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).as("doc_id"), explode(Cols.tokens(col(textCol))).as("__t"))
      .groupBy(col("doc_id"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    cnt
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(floor((col("__c").cast("double") * log(col("__c").cast("double")))
          * lit(1e9) + lit(0.5)).cast("long")).as("__clnc_e9"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        (floor(log(col("n_tokens").cast("double")) * lit(1e9) + lit(0.5)).cast("long") -
          expr("__clnc_e9 div n_tokens")).as("entropy_e9"))
  }
}
