package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Lexical retrieval over a document corpus — the ranking half of the
  * training-data toolbox: BM25 is what scores crawl documents against a
  * quality-seed query set, retrieves contamination candidates for an
  * eval suite, and backs the lexical leg of any hybrid (BM25 + ANN)
  * retrieval stack. Stays Spark-first: the index is not materialized —
  * term frequencies, document frequencies, and lengths are computed as
  * one vocabulary-pruned aggregate chain per query batch.
  */
object Retrieval {

  /** BM25 top-k retrieval (Robertson–Spärck Jones with Lucene's
    * non-negative IDF `ln((N − df + 0.5)/(df + 0.5) + 1)`) of a literal
    * query batch against the corpus. The RANKING form of
    * [[graft.text.Corpus.bm25]] (which scores one query and returns
    * every match): a query BATCH fans out over one shared tf/df pass,
    * and the readout is per-query top-k ranks rather than raw scores —
    * with the per-term e9-integer-sum discipline in place of
    * Corpus.bm25's rounded double sum, so scores stay exact at any
    * term count. Query terms are deduped per query (bag-of-query-terms
    * with qtf = 1, the common retrieval form); documents are
    * whitespace-tokenized by the corpus convention
    * ([[graft.functions.Cols.tokens]]).
    *
    * Exactness: `tf`, `df`, `dl`, `N`, `Σdl` are exact integers;
    * `avgdl` never materializes (the length ratio rides as
    * `dl·N / Σdl` inside the tree). Each (query, term, doc)
    * contribution is ONE fixed double tree e9-quantized to a BIGINT,
    * so the per-document score is an ORDER-INDEPENDENT integer sum —
    * the only way a multi-term double sum hash-matches across engines
    * (the ljungBox discipline). Ranks tie-break by `doc_id`.
    *
    * Scale shape: doc lengths come off the un-exploded text (a map-only
    * pass); exploded tokens are pruned to the BROADCAST query
    * vocabulary BEFORE the tf shuffle, so the heavy (doc, token) grid
    * only ever contains query terms; df re-aggregates that grid and
    * broadcasts back (vocabulary-sized); the doc-length join shuffles
    * on `doc_id`, co-partitioned with the score aggregate.
    *
    * The final ranking has TWO plans, selected by `heap`:
    *   - `heap = false` (default): a per-query `row_number` window.
    *     Right at grid-sized candidate lists, but the window holds
    *     CORPUS-BOUNDED per-query lists through a sort — the exact
    *     shape the round-8 hot100 probe showed AQE cannot fix.
    *   - `heap = true`: [[graft.operators.TopK.perKeyAgg]]'s bounded
    *     buffer — each map task folds candidates into a ≤ topK entry
    *     list, only topK rows per query ever cross the shuffle, no
    *     sort. ENGAGE when matched candidates per query exceed the
    *     per-task row budget (the q260/q261 threshold: hot-key rows >
    *     rows/slots) — i.e. any broad query over a large corpus. The
    *     integer score rides the aggregator as double — exact below
    *     2⁵³ ≈ 9·10¹⁵ e9-units, a ~9·10⁶-term-hit document; the output
    *     casts back to BIGINT. Both paths emit identical rows
    *     (spec-pinned), tie-broken by `doc_id`.
    *
    * Output: `(query_id, doc_id, score_e9, rank)` for `rank ≤ topK`,
    * matched documents only. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Long, String)], topK: Int = 10,
               k1: Double = 1.2, b: Double = 0.75,
               heap: Boolean = false): DataFrame = {
    require(queries.nonEmpty, "bm25TopK needs at least one query")
    require(queries.map(_._1).distinct.size == queries.size,
      "query ids must be distinct")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
    val dls = base.select(col("doc_id"),
      TextAnalysis.tokenCount(col("__text")).cast("long").as("__dl"))
    val stats = dls.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__s"))
    val qterms = queries.flatMap { case (qid, qtext) =>
      qtext.trim.split("\\s+").filter(_.nonEmpty).distinct.map(t => (qid, t))
    }.toDF("query_id", "__tok")
    val vocab = qterms.select("__tok").distinct()
    val tfs = base
      .select(col("doc_id"), explode(Cols.tokens(col("__text"))).as("__tok"))
      .filter(col("__tok") =!= "")
      .join(broadcast(vocab), Seq("__tok"))
      .groupBy(col("doc_id"), col("__tok"))
      .agg(count(lit(1)).as("__tf"))
    val dfs = tfs.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val terms = tfs
      .join(broadcast(qterms), Seq("__tok"))
      .join(broadcast(dfs), Seq("__tok"))
      .join(dls, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("__term_e9", expr(
        s"""cast(floor(
           |  ln((cast(__n - __df as double) + 0.5) / (cast(__df as double) + 0.5) + 1.0)
           |  * (cast(__tf as double) * ($k1 + 1.0))
           |  / (cast(__tf as double)
           |     + $k1 * (1.0 - $b + $b * cast(__dl as double) * cast(__n as double) / cast(__s as double)))
           |  * 1000000000 + 0.5) as bigint)""".stripMargin))
    val scores = terms.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__term_e9")).as("score_e9"))
    if (heap) {
      graft.operators.TopK.perKeyAgg(scores, Seq("query_id"), "score_e9",
          "doc_id", topK)
        .select(col("query_id"), col("doc_id"),
          col("score_e9").cast("long").as("score_e9"), col("rank"))
    } else {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score_e9").desc, col("doc_id"))
      scores
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= topK)
    }
  }

  /** ROUGE-N between candidate/reference document pairs — the clipped
    * n-gram overlap behind summarization/generation eval: `overlap =
    * Σ_g min(count_cand(g), count_ref(g))`, `P = overlap/|cand grams|`,
    * `R = overlap/|ref grams|`, and the F1 collapse `2·overlap/(|cand| +
    * |ref|)` (algebraically `2PR/(P+R)` — the integer form needs no
    * guard). `pairs` carries `(cand_id, ref_id)`; both sides must have
    * at least `n` tokens (shorter docs have no n-grams — their pairs
    * drop, the inner-join contract).
    *
    * Exactness: overlap/totals are exact integers off ONE per-(doc,
    * gram) count grid; the three readouts are single double divisions
    * e6-quantized — nothing float crosses a row boundary.
    *
    * Scale shape: the gram grid shuffles (doc, gram) once with map-side
    * combine; the overlap join keys on (pair, gram) so only grams the
    * candidate actually has ever meet the reference side; totals ride
    * the un-exploded token count.
    *
    * `hashGrams` is the corpus-scale dial: the gram KEY crossing both
    * the count shuffle and the overlap join becomes the 60-bit
    * [[graft.text.TextHash.hash60Md5]] of the gram instead of its raw
    * string — a fixed 8 bytes per key where an n-gram string averages
    * tens (the round-8 sweep's 5.0× worst case was exactly this join's
    * string volume). The hash is applied BEFORE the first shuffle, so
    * no gram text ever leaves its scan task. Same-doc collisions merge
    * two gram types (probability ~ grams²/2⁶¹ — ~4·10⁻⁷ at a million
    * distinct grams, the [[graft.text.Dedup]] dupNgramCoverage bound);
    * the default stays exact-string and the two paths are spec-pinned
    * equal on collision-free corpora.
    *
    * Output: `(cand_id, ref_id, n_overlap,
    * n_cand, n_ref, p_e6, r_e6, f_e6)`. */
  def rougeN(docs: DataFrame, idCol: String, textCol: String,
             pairs: DataFrame, n: Int = 2,
             hashGrams: Boolean = false): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val base = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol).cast("long").as("doc_id"),
        Cols.tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= n)
    val exploded = base
      .select(col("doc_id"), explode(Cols.shingles(col("__tk"), n)).as("__gs"))
    val keyed =
      if (hashGrams)
        exploded.select(col("doc_id"),
          udf((s: String) => TextHash.hash60Md5(s)).apply(col("__gs")).as("__g"))
      else exploded.select(col("doc_id"), col("__gs").as("__g"))
    val grams = keyed
      .groupBy(col("doc_id"), col("__g")).agg(count(lit(1)).as("__c"))
    val tots = base.select(col("doc_id"),
      (size(col("__tk")) - lit(n - 1)).cast("long").as("__ng"))
    val ov = pairs
      .join(grams.select(col("doc_id").as("cand_id"), col("__g"),
        col("__c").as("__cc")), Seq("cand_id"))
      .join(grams.select(col("doc_id").as("ref_id"), col("__g"),
        col("__c").as("__cr")), Seq("ref_id", "__g"))
      .groupBy(col("cand_id"), col("ref_id"))
      .agg(sum(least(col("__cc"), col("__cr"))).as("n_overlap"))
    pairs
      .join(tots.select(col("doc_id").as("cand_id"), col("__ng").as("n_cand")),
        Seq("cand_id"))
      .join(tots.select(col("doc_id").as("ref_id"), col("__ng").as("n_ref")),
        Seq("ref_id"))
      // LEFT + 0: a pair sharing NO gram is the most informative row of a
      // generation audit — zero overlap must score 0, not vanish
      .join(ov, Seq("cand_id", "ref_id"), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("p_e6", expr(
        "cast(floor(cast(n_overlap as double) / cast(n_cand as double) * 1000000 + 0.5) as bigint)"))
      .withColumn("r_e6", expr(
        "cast(floor(cast(n_overlap as double) / cast(n_ref as double) * 1000000 + 0.5) as bigint)"))
      .withColumn("f_e6", expr(
        "cast(floor(2.0 * cast(n_overlap as double) / (cast(n_cand as double) + cast(n_ref as double)) * 1000000 + 0.5) as bigint)"))
      .select("cand_id", "ref_id", "n_overlap", "n_cand", "n_ref",
        "p_e6", "r_e6", "f_e6")
  }

  /** nDCG@k discount factors `1/log₂(r+1)` for ranks 1…k, e12-quantized
    * — generated driver-side once and INLINED into both engines (the
    * dftTableE15 / chi2Crit95E4 convention), so no query-time log
    * executes anywhere and every rel·discount product is an EXACT
    * integer. */
  def ndcgDiscountsE12(k: Int): IndexedSeq[Long] =
    (1 to k).map(r =>
      math.floor(1e12 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong)

  /** The discount lookup as a SQL CASE over `rankExpr` — ONE generator
    * shared by the Spark readout and the DuckDB oracle replay. */
  def ndcgDiscountSql(rankExpr: String, k: Int): String =
    ndcgDiscountsE12(k).zipWithIndex
      .map { case (v, i) => s"when $rankExpr = ${i + 1} then $v" }
      .mkString("case ", " ", " else 0 end")

  /** Per-query ranking-quality eval — nDCG@k and MRR@k of a scored
    * candidate list against graded relevance labels: the readout that
    * closes the retrieval loop ([[bm25TopK]] / the ANN stack produce
    * rankings; this scores them). `DCG@k = Σ_{r≤k} rel_r/log₂(r+1)`,
    * `nDCG = DCG/IDCG` (ideal = relevance-sorted), `MRR = 1/rank` of
    * the first relevant hit in the top k (0 when none — the standard
    * eval convention, distinct from "no candidates" which emits no
    * row).
    *
    * Exactness: with the [[ndcgDiscountsE12]] table inlined, every
    * DCG/IDCG term `rel·disc_e12` is an exact integer and both sums
    * are order-independent exact BIGINTs; nDCG is ONE double division
    * e6-quantized; MRR is `⌊10⁶/rank + ½⌋` (rank ≤ k keeps the double
    * exact). Ranking ties break by ascending `docCol` — the
    * deterministic-rank contract both engines share; the IDEAL ranking
    * ties the same way (tie order cannot change IDCG: equal rel ⇒
    * equal term).
    *
    * Scale shape: two per-query row_number windows sharing one
    * partitioning (candidate-list-sized by the retrieval contract —
    * ≤ a few hundred rows per query; for corpus-bounded lists pool
    * through [[graft.operators.TopK.perKeyAgg]] FIRST, the q255 heap
    * dial), then one map-side-combined aggregate. Output: `(keys…,
    * n_docs, dcg_num_e12, idcg_num_e12, ndcg_e6, first_rel_rank,
    * mrr_e6)`; keys with zero relevant docs anywhere emit null nDCG
    * (IDCG 0) and mrr 0. */
  def rankingMetrics(df: DataFrame, keyCols: Seq[String], docCol: String,
                     scoreCol: String, relCol: String, k: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "rankingMetrics needs at least one key column")
    require(k >= 1 && k <= 100, s"k must be in [1, 100], got $k")
    val keys = keyCols.map(col)
    val wScore = Window.partitionBy(keys: _*)
      .orderBy(col(scoreCol).desc, col(docCol).asc)
    val wIdeal = Window.partitionBy(keys: _*)
      .orderBy(col(relCol).desc, col(docCol).asc)
    val disc = ndcgDiscountSql("__r", k)
    val discI = ndcgDiscountSql("__ri", k)
    Cols.dropNullKeys(df, keyCols)
      .filter(col(docCol).isNotNull && col(scoreCol).isNotNull &&
        col(relCol).isNotNull)
      .withColumn("__rel", col(relCol).cast("long"))
      .withColumn("__r", row_number().over(wScore))
      .withColumn("__ri", row_number().over(wIdeal))
      .withColumn("__dt", expr(s"__rel * ($disc)"))
      .withColumn("__it", expr(s"__rel * ($discI)"))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__dt")).as("dcg_num_e12"),
        sum(col("__it")).as("idcg_num_e12"),
        min(when(col("__r") <= k && col("__rel") > 0, col("__r").cast("long")))
          .as("first_rel_rank"))
      .withColumn("ndcg_e6", expr(
        """case when idcg_num_e12 > 0 then
          |  cast(floor(cast(dcg_num_e12 as double)
          |    / cast(idcg_num_e12 as double) * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
      .withColumn("mrr_e6", expr(
        """case when first_rel_rank is not null then
          |  cast(floor(1000000.0 / cast(first_rel_rank as double) + 0.5)
          |       as bigint)
          |else cast(0 as bigint) end""".stripMargin))
  }
}
