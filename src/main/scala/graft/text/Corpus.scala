package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Corpus-construction operators for the training-data pipeline surface
  * (builder brief): relevance scoring, test-set decontamination,
  * deterministic sampling/splitting, per-stratum selection, and
  * concat-and-chunk sequence packing.
  *
  * Scale shape: everything is expression-tree filters, hash-keyed
  * groupBys, and broadcast joins of metadata-sized sides — full document
  * text never crosses a shuffle, and the only windows are per-stratum
  * (so packing/selection parallelize across strata at 100 TB).
  */
object Corpus {

  /** Okapi BM25 score of every document against a bag of query terms.
    * Output: (doc_id, bm25) for documents matching ≥1 term — rounded so
    * the cross-engine float sum is comparison-stable. For a query BATCH
    * with top-k ranks (and exact integer score sums), see
    * [[graft.text.Retrieval.bm25TopK]].
    *
    * idf uses the Lucene-style floor `ln(1 + (N − df + ½)/(df + ½))`
    * (always positive, no negative-idf cliff for terms in >half the
    * corpus).
    *
    * Scale shape: tokens are filtered to the query vocabulary BEFORE the
    * (doc, term) aggregate, so the only full-corpus pass is the codegen'd
    * scan + explode; everything shuffled afterwards is bounded by
    * |matches|. Document-frequency and corpus stats are tiny aggregates
    * broadcast back — the per-document side never re-shuffles. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           query: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           roundTo: Int = 4): DataFrame = {
    require(query.nonEmpty, "bm25 needs a non-empty query")
    val base = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).cast("double").as("dl"),
      Cols.tokens(col(textCol)).as("__toks"))
    // corpus stats: one row (N, avgdl) — broadcast, never a join key
    val stats = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(query: _*)) // prune before any shuffle
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast("double").as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), contrib.as("__c"))
      .groupBy("doc_id")
      .agg(round(sum(col("__c")), roundTo).as("bm25"))
  }

  /** Test-set decontamination report: for every corpus document sharing at
    * least one word `n`-gram with the held-out set, the number of matching
    * n-gram occurrences and distinct matching n-grams.
    * Output: (doc_id, n_hits, n_grams_hit). Clean documents are absent —
    * anti-joining this result against the corpus yields the
    * decontaminated training set.
    *
    * Scale shape: the held-out set is benchmark-sized by contract, so its
    * distinct n-grams broadcast; the corpus side is scan → explode →
    * broadcast-hash-join → per-doc aggregate. Full text never shuffles,
    * and unmatched n-grams (the overwhelming majority) die at the join.
    * If the test side ever outgrows broadcast, drop the hint — the same
    * plan shuffle-joins on the n-gram key. */
  def contamination(corpus: DataFrame, testSet: DataFrame,
                    idCol: String, textCol: String, n: Int = 8): DataFrame = {
    // JVM shingle kernel, not the transform/element_at expression form —
    // the HOFs evaluate interpreted and dominate the corpus-side scan
    def grams(df: DataFrame): Column =
      explode(TextHash.shinglesCol(col(textCol), n))
    val testGrams = testSet.select(grams(testSet).as("gram")).distinct()
    corpus.select(col(idCol).as("doc_id"), grams(corpus).as("gram"))
      .join(broadcast(testGrams), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), countDistinct(col("gram")).as("n_grams_hit"))
  }

  /** Decontamination at corpus scale: a BLOOM-FILTER prefilter in front
    * of [[contamination]]'s exact join. The held-out set's distinct
    * n-grams build one driver-side bloom (≈1.2 MB per million grams at
    * 1% fpp), broadcast once; the corpus side is then a pure per-row
    * "any gram might be contaminated?" filter — no explode, no shuffle —
    * and only the surviving candidates (true hits + ~fpp false
    * positives) pay the exact verify join. Blooms have NO false
    * negatives, so the final output is EXACT: identical to running the
    * full join, at a fraction of the shuffle.
    *
    * This is the shape that matters at 100 TB: the plain
    * [[contamination]] join explodes every corpus document into n-grams
    * before the broadcast join can drop them; here the overwhelmingly
    * clean majority dies in a codegen'd scan-side filter instead.
    * Output: the CLEAN corpus rows (contaminated documents anti-joined
    * away). */
  def bloomDecontaminate(corpus: DataFrame, testSet: DataFrame,
                         idCol: String, textCol: String, n: Int = 8,
                         fpp: Double = 0.01): DataFrame = {
    val spark = corpus.sparkSession
    // cached once: the gram lineage otherwise re-executes for the count,
    // the bloom build, AND the verify join (three jobs over one explode)
    val testGrams = testSet
      .select(explode(TextHash.shinglesCol(col(textCol), n)).as("gram"))
      .distinct()
      .persist()
    // benchmark-sized by contract (contamination's rationale) — the
    // count and the bloom build are two tiny jobs on the cached side
    val nGrams = math.max(1L, testGrams.count())
    val bf = testGrams.stat.bloomFilter("gram", nGrams, fpp)
    val bfB = spark.sparkContext.broadcast(bf)
    val anyHit = udf { (grams: scala.collection.Seq[String]) =>
      grams != null && grams.exists(bfB.value.mightContainString)
    }
    val candidates = corpus
      .select(col(idCol), TextHash.shinglesCol(col(textCol), n).as("__grams"))
      .filter(anyHit(col("__grams")))
    // dirty ids are tiny (contaminated docs only): materialize them
    // eagerly so the test-gram cache can be RELEASED here instead of
    // leaking until ContextCleaner reachability (the round-3 cache-
    // lifetime discipline); the bloom broadcast stays referenced by the
    // candidate filter's lineage and is reclaimed with the result
    val dirty = candidates
      .select(col(idCol), explode(col("__grams")).as("gram"))
      .join(broadcast(testGrams), Seq("gram"))
      .select(col(idCol)).distinct()
      .persist()
    dirty.count()
    testGrams.unpersist()
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  /** Deterministic hash bucket in [0, buckets) for a key — the portable
    * md5 [[Cols.hash32]], so the assignment is reproducible across runs,
    * engines, and cluster layouts (unlike `rand()`-based sampling, which
    * changes under retries and task re-execution). */
  def hashBucket(key: Column, buckets: Int): Column =
    Cols.hash32(key.cast("string")) % buckets

  /** Deterministic sample: keep rows whose key hashes into the first
    * `keep` of `buckets` buckets (≈ keep/buckets of the data). Same key ⇒
    * same verdict everywhere — the property train/val/test splits and
    * reproducible subsampling need at 100 TB, where rand()-sampling
    * breaks under task retries. A pure filter: pipelines into the scan. */
  def hashSample(df: DataFrame, keyCol: String, buckets: Int, keep: Int): DataFrame =
    df.filter(hashBucket(col(keyCol), buckets) < keep)

  /** Deterministic train/val/test split (any number of named slices):
    * `cuts` are cumulative permille fences over the key's hash bucket in
    * [0, 1000) — `("train",800),("val",900),("test",1000)` gives
    * 80/10/10. Same key ⇒ same slice across runs, engines, and cluster
    * layouts, and DISJOINT slices by construction — the property that
    * actually matters for contamination: a doc can never drift between
    * train and test under re-execution the way `randomSplit` allows.
    * Pure projection (no shuffle); the assignment expression pipelines
    * into the scan. Output adds `split`. */
  def hashSplit(df: DataFrame, keyCol: String,
                cuts: Seq[(String, Int)] = Seq(("train", 800), ("val", 900),
                  ("test", 1000))): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 1000,
      "cuts must be cumulative permille fences ending at 1000")
    require(cuts.map(_._2) == cuts.map(_._2).sorted && cuts.map(_._2).distinct
      .size == cuts.size, "cuts must be strictly increasing")
    val b = hashBucket(col(keyCol), 1000)
    val chained = cuts.tail.foldLeft(when(b < cuts.head._2, lit(cuts.head._1))) {
      case (w, (name, cut)) => w.when(b < cut, lit(name))
    }
    df.withColumn("split", chained)
  }

  /** Token-budget sampling: per domain, admit documents in deterministic
    * md5-rank order while the running token total stays within `budget` —
    * the "take ~B tokens per domain" pretraining recipe, reproducible
    * under retries (the rank is a pure key hash, so the admitted set is a
    * stable prefix per domain, not a rand() draw).
    *
    * Cumulative token counts are monotone, so `cum <= budget` keeps
    * exactly the rank-prefix that fits. One window shuffle partitioned by
    * domain; a single mega-domain serializes its own partition — shard
    * the recipe (domain, hash-bucket) when one domain dominates the
    * corpus. Output adds `n_tokens` (whitespace count). */
  def tokenBudgetSample(df: DataFrame, domainCol: String, keyCol: String,
                        textCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    Seq("n_tokens", "__cum").foreach(c => require(!df.columns.contains(c),
      s"tokenBudgetSample writes $c — rename the existing column"))
    val nTok = coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0))
    // explicit ROWS frame: the default RANGE frame makes rows that tie on
    // (hash, key) peers sharing one combined sum — duplicate keys near the
    // budget edge would then BOTH drop, breaking the prefix contract (and
    // the oracle's ROWS-frame cumsum)
    val w = Window.partitionBy(domainCol)
      .orderBy(Cols.hash32(col(keyCol).cast("string")), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", nTok)
      .withColumn("__cum", sum(col("n_tokens").cast("long")).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res):
    * the n rows with the largest key `u^(1/w)` are a weight-proportional
    * sample; ranking by the monotone transform `ln(u)/w` avoids pow's
    * underflow for tiny u and large w. `u` is a deterministic md5 uniform
    * of the key ((hash32 + 0.5) / 2^32 ∈ (0,1)), so — like [[hashSample]]
    * — the selection is reproducible across runs, engines, and task
    * retries, where `rand()` sampling is not. Weights must be positive
    * (fails loudly per the [[domainMixSample]] convention).
    *
    * Scale shape: the score is a pure per-row expression over the scan;
    * the global top-n is TakeOrderedAndProject (per-partition heaps + one
    * n-row merge at the driver), no full sort. For n too large for one
    * heap, pre-filter with a score threshold from a sample, then top-n. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    require(!df.columns.contains("__es"),
      "weightedSample writes __es — rename the existing column")
    val u = (Cols.hash32(col(keyCol).cast("string")).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    // NULL must be in the guard explicitly: `null <= 0` is null, which
    // `when` treats as false — a null weight would otherwise slip into the
    // otherwise-branch as a null score and silently enter the sample
    // whenever positive-weight rows run short.
    val es = when(col(weightCol).isNull || col(weightCol) <= 0, raise_error(concat(
        lit(s"weightedSample: null or non-positive weight in $weightCol for key "),
        col(keyCol).cast("string"))).cast("double"))
      .otherwise(log(u) / col(weightCol).cast("double"))
    df.withColumn("__es", es)
      .orderBy(col("__es").desc, col(keyCol))
      .limit(n)
      .drop("__es")
  }

  /** Top-`k` rows per stratum by an explicit ordering (e.g. best-quality
    * documents per source domain). One window, partitioned by the strata —
    * parallel across strata, no global sort. Ordering must be total
    * (include a unique tiebreak column) for deterministic output. */
  def topKPerStratum(df: DataFrame, strata: Seq[String],
                     order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Concat-and-chunk sequence packing (GPT-style pretraining batches):
    * documents are concatenated in `idCol` order within each stratum and
    * cut every `budget` tokens; each document reports the chunk its first
    * token lands in and its token offset within that chunk. Documents may
    * straddle chunk boundaries — that is the concat-and-chunk contract
    * (no padding waste), as opposed to first-fit bin packing, which is
    * inherently sequential and does not distribute.
    * Output: strata ++ (doc_id, n_tokens, bin, pos_in_bin).
    *
    * Scale shape: one prefix-sum window per stratum. Pack within natural
    * shards (source, date, ...) at 100 TB so no global sort exists; the
    * empty-strata form is for corpora that fit one partition's sort. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Int, strata: Seq[String] = Nil): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w0 = if (strata.isEmpty) Window.orderBy(col(idCol))
             else Window.partitionBy(strata.map(col): _*).orderBy(col(idCol))
    val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(strata.map(col) :+ col(idCol) :+
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"): _*)
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(strata.map(col) :+ col(idCol) :+ col("n_tokens") :+
        (col("__start") / budget).cast("long").as("bin") :+
        (col("__start") % budget).as("pos_in_bin"): _*)
  }

  /** Domain-mix sampling: downsample each domain so the surviving corpus
    * matches a target mixture (the pretraining "data recipe" — e.g. 50%
    * web, 30% wiki, 20% books) while keeping as much data as possible:
    * the binding domain (the one that runs out first at the target
    * shares) is kept whole and every other domain is hash-downsampled to
    * proportion.
    *
    * `weights` are integer mixture weights (5:3:2, not 0.5:0.3:0.2) so
    * every keep-threshold is EXACT integer arithmetic — no float
    * division whose last-ulp could flip a floor() across engines or
    * cluster layouts. Domains absent from `weights` are dropped.
    *
    * With `W = Σw`, domain counts `c_d`, the achievable total is
    * `T = min_d ⌊c_d·W/w_d⌋` and each domain keeps rows whose key hashes
    * below `⌊T·w_d·buckets / (W·c_d)⌋` of `buckets` — the deterministic
    * [[hashBucket]] filter, so membership is reproducible under retries
    * and across runs (`rand()` sampling is not).
    *
    * Scale shape: one small per-domain count aggregate; the per-domain
    * keep-thresholds broadcast back; the sample itself is a pure filter
    * that pipelines into the scan — no shuffle of the data being
    * sampled. */
  def domainMixSample(df: DataFrame, domainCol: String, keyCol: String,
                      weights: Map[String, Long],
                      buckets: Long = 10000L): DataFrame = {
    require(weights.nonEmpty, "domainMixSample needs target weights")
    require(weights.values.forall(_ > 0), "weights must be positive")
    val w = weights.values.sum
    val spark = df.sparkSession
    val wdf = spark.createDataFrame(weights.toSeq.map(t => (t._1, t._2)))
      .toDF(domainCol, "__w")
    // weights are the base side of the join: a weighted domain ABSENT
    // from the data must fail loudly (the recipe is unachievable), not
    // silently renormalize the mixture over the domains that do exist
    // (no broadcast hint: Spark cannot broadcast the preserved side of an
    // outer join, and both sides here are domain-cardinality tiny)
    val cnt = wdf
      .join(df.groupBy(domainCol).agg(count(lit(1)).as("__c")), Seq(domainCol), "left")
      .select(col(domainCol), col("__w"),
        when(col("__c").isNull, raise_error(concat(
          lit("domainMixSample: weighted domain absent from data: "),
          col(domainCol))).cast("long"))
          .otherwise(col("__c")).as("__c"))
    // T = min over domains of floor(c*W/w): largest total that the
    // scarcest domain can still cover at its target share
    val t = cnt.select(min(expr(s"__c * ${w}L DIV __w")).as("__t"))
    val keep = cnt.crossJoin(broadcast(t))
      .select(col(domainCol),
        expr(s"__t * __w * ${buckets}L DIV (${w}L * __c)").as("__keep"))
    df.join(broadcast(keep), Seq(domainCol))
      .filter(hashBucket(col(keyCol), buckets.toInt) < col("__keep"))
      .drop("__keep")
  }

  /** Curriculum binning: `nBins` equal-population difficulty bins per
    * stratum over an explicit ordering (e.g. corpus-LM `avg_nll`
    * ascending = cleanest text first). Partitioned by the strata so the
    * window parallelizes — a corpus-GLOBAL curriculum would serialize
    * the sort into one task; per-domain bins are the scale shape (and
    * what a mixture-balanced curriculum wants anyway). The ordering must
    * be total (include a unique tiebreak) for deterministic bins. */
  def curriculumBins(df: DataFrame, strata: Seq[String],
                     order: Seq[Column], nBins: Int): DataFrame = {
    require(nBins >= 1, "curriculumBins needs nBins >= 1")
    require(strata.nonEmpty,
      "curriculumBins needs >= 1 stratum column: a global ntile sorts the corpus in one task")
    val w = Window.partitionBy(strata.map(col): _*).orderBy(order: _*)
    df.withColumn("bin", ntile(nBins).over(w))
  }

  /** Corpus vocabulary statistics: the `k` most frequent word `n`-grams
    * with counts; ties break lexicographically. Partial (map-side)
    * aggregation absorbs hot n-grams before the shuffle, and top-k is a
    * TakeOrderedAndProject — no global sort materializes. */
  /** Zipf slope of the per-domain frequency/rank curve — the canonical
    * corpus-health profile: natural language sits near slope −1
    * (Zipf 1949); template/generated text flattens (repetition inflates
    * the head) and gibberish steepens. Fit is OLS of ln(freq) on
    * ln(rank) over the top `topV` vocabulary per domain.
    *
    * Exactness: ranks and counts are exact integers with a DETERMINISTIC
    * rank order (count desc, term asc); each row contributes
    * e3-quantized `x = ⌊ln(rank)·10³+0.5⌋`, `y = ⌊ln(count)·10³+0.5⌋`
    * (e3 keeps all four OLS sums and the final cross-multiplication
    * inside BIGINT — e9 would overflow Σxy·10⁶), the OLS sums are exact
    * integer aggregates, and the closed-form slope is ONE integer
    * division. The emitted `zipf_slope_neg_e6` is the NEGATED slope
    * (positive for Zipfian data): Spark's `div` truncates toward zero
    * while DuckDB's `//` floors, so only the positive orientation is
    * engine-portable. Single-token domains (degenerate fit) emit null.
    *
    * Output: `(domain, v, n_top_tokens, zipf_slope_neg_e6)`. */
  def zipfSlope(docs: DataFrame, domainCol: String, textCol: String,
                topV: Int = 100): DataFrame = {
    require(topV >= 2, s"topV must be >= 2, got $topV")
    val cnt = docs
      .filter(col(domainCol).isNotNull && col(textCol).isNotNull &&
        length(trim(col(textCol))) > 0)
      .select(col(domainCol).as("domain"), explode(Cols.tokens(col(textCol))).as("__t"))
      .groupBy(col("domain"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("__c").desc, col("__t").asc)
    def q(c: Column): Column =
      floor(log(c.cast("double")) * lit(1e3) + lit(0.5)).cast("long")
    cnt.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= topV)
      .select(col("domain"), col("__c"), q(col("__r")).as("__x"), q(col("__c")).as("__y"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("v"), sum(col("__c")).as("n_top_tokens"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col("domain"), col("v"), col("n_top_tokens"),
        expr("(__sx * __sy - v * __sxy) * 1000000 div nullif(v * __sxx - __sx * __sx, 0)")
          .as("zipf_slope_neg_e6"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — merge
    * any number of scored rankings of the same id space into one:
    * `RRF(d) = Σ_lists 1/(k + rank_list(d))`. The standard way to
    * combine lexical (BM25) and semantic (embedding) retrieval, or a
    * relevance signal with a quality prior — rank-space fusion needs no
    * score calibration between lists.
    *
    * Exactness: ranks are [[globalRank]] positions over the
    * DETERMINISTIC (score desc, id asc) order — no single-task window —
    * and each contribution is the EXACT integer `10⁹ div (k + rank)`,
    * summed exactly: the entire readout is integer arithmetic, no float
    * anywhere. Lists may cover different id subsets; `n_lists` reports
    * how many lists each id appeared in.
    *
    * Output: `(idCol, n_lists, rrf_e9)` — sort order left to the
    * caller ((rrf_e9 desc, id) is the retrieval convention). */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, scoreCol: String,
              kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    val ranked = rankings.map { df =>
      globalRank(df.select(col(idCol), col(scoreCol)),
          Seq(col(scoreCol).desc, col(idCol).asc), "__r0")
        .select(col(idCol), (col("__r0") + 1).as("__r"))
    }
    ranked.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"),
        sum(expr(s"1000000000 div ($kRrf + __r)")).as("rrf_e9"))
  }

  /** Deterministic hash-offset negative sampling — the contrastive-pair
    * builder: for every anchor, `k` pseudo-random negatives drawn
    * uniformly from the id space by hashing (anchor, j) onto the dense
    * 0-based id index ([[globalRank]] over id — scale-safe, no
    * single-task window). A draw landing on the anchor itself shifts to
    * the next index (mod N), so a negative is never the anchor.
    * Deterministic under retries and across engines (the md5-derived
    * [[Cols.hash32]]); sampling WITH replacement across j — the
    * standard contrastive setup (k ≪ N makes collisions rare and
    * harmless).
    *
    * Scale shape: one range-partitioned sort for the index, one
    * id-sized equi-join to resolve indices back to ids — no cross
    * join, cost O(N·k). Output: `(anchor_id, j, neg_id)`. */
  def negativeSample(items: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ids = globalRank(items.select(col(idCol)).filter(col(idCol).isNotNull),
      Seq(col(idCol).asc), "idx")
    val n = ids.count()
    require(n >= 2, s"negativeSample needs at least 2 items, got $n")
    val anchors = ids
      .withColumn("j", explode(sequence(lit(1), lit(k))))
      .withColumn("__h", Cols.hash32(
        concat(col(idCol).cast("string"), lit("_"), col("j").cast("string"))))
      .withColumn("__t0", col("__h") % n)
      .withColumn("__tidx",
        when(col("__t0") === col("idx"), (col("__t0") + 1) % n)
          .otherwise(col("__t0")))
    anchors
      .join(ids.select(col(idCol).as("neg_id"), col("idx").as("__tidx")),
        Seq("__tidx"))
      .select(col(idCol).as("anchor_id"), col("j"), col("neg_id"))
  }

  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    docs.select(explode(TextHash.shinglesCol(col(textCol), n)).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram"))
      .limit(k)

  /** Adjacent token pairs `(w1, w2)` — one row per bigram occurrence,
    * positions via an exploded index sequence over the token array
    * (codegen'd built-ins; the `size >= 2` guard keeps Spark's
    * descending `sequence(1, 0)` from fabricating pairs on one-token
    * docs, the DuckDB-parity trap [[graft.functions.Cols.shingles]]
    * documents). */
  /** Skip-gram pairs within `window` positions — the word2vec-style
    * context generalization of [[adjacentPairs]] (offset 1 only): one
    * pair per (position, offset ≤ window) with the LEFT token first.
    * Same explode-over-index shape, one narrow shuffle-free pass: the
    * offset fan-out happens inside a flattened array expression, so the
    * scan is still read once (window scans would be the naive form).
    *
    * @see [[skipgramPmi]] for the association readout over these pairs */
  private def windowPairs(docs: DataFrame, textCol: String,
                          window: Int): DataFrame = {
    val pairArrays = (1 to window).map { k =>
      zip_with(
        slice(col("__toks"), lit(1), greatest(size(col("__toks")) - k, lit(0))),
        slice(col("__toks"), lit(k + 1), greatest(size(col("__toks")) - k, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))
    }
    docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(Cols.tokens(col(textCol)).as("__toks"))
      .select(explode(flatten(array(pairArrays: _*))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
  }

  /** PMI collocations over a ±`window` skip-gram context — finds
    * associated-but-not-adjacent pairs ("new … york" with an adjective
    * between) that [[pmiCollocations]]'s strict adjacency misses. Same
    * integer-exact decision path: threshold by cross-multiplication
    * `c12·N ≥ r·c1·c2`, ratio emitted as one fixed double division. */
  def skipgramPmi(docs: DataFrame, textCol: String, window: Int,
                  minCount: Long, minRatio: Long): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(minCount >= 1, "minCount must be >= 1")
    require(minRatio >= 1, "minRatio must be >= 1 (below 1 selects anti-collocations)")
    val pairs = windowPairs(docs, textCol, window)
    val cPair = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val cLeft = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    val cRight = pairs.groupBy("w2").agg(count(lit(1)).as("c2"))
    val total = pairs.agg(count(lit(1)).as("n_pairs"))
    cPair.filter(col("c12") >= minCount)
      .join(broadcast(cLeft), Seq("w1"))
      .join(broadcast(cRight), Seq("w2"))
      .crossJoin(broadcast(total))
      // DECIMAL(38,0) widening on both cross-products: c12·N and r·c1·c2
      // wrap silently in BIGINT arithmetic on a large corpus (2^63 is only
      // ~9.2e18); a wrapped product flips the verdict, and Spark wraps where
      // DuckDB raises — a scale-latent cross-engine divergence
      .filter(col("c12").cast("decimal(38,0)") * col("n_pairs") >=
        lit(minRatio) * col("c1").cast("decimal(38,0)") * col("c2"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        col("n_pairs"),
        ((col("c12") * col("n_pairs")).cast("double") /
          (col("c1") * col("c2")).cast("double")).as("ratio"))
  }

  private def adjacentPairs(docs: DataFrame, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(Cols.tokens(col(textCol)).as("__toks"))
      .select(col("__toks"),
        explode(when(size(col("__toks")) >= 2,
            sequence(lit(1), size(col("__toks")) - 1))
          .otherwise(array().cast("array<int>"))).as("__i"))
      .select(element_at(col("__toks"), col("__i")).as("w1"),
        element_at(col("__toks"), col("__i") + 1).as("w2"))

  /** Bigram next-token table — the argmax continuation per context
    * token: for every `w1` with at least `minCount` outgoing pairs, the
    * `w2` maximizing the adjacent-pair count (ties break to the
    * LEXICOGRAPHICALLY SMALLEST `w2`, making the table deterministic),
    * with the continuation probability as the exact integer
    * `(c₁₂·10⁶) div c₁`. The greedy half of an n-gram language model
    * ([[LanguageModel.unigramNll]]'s sequel at order 2) and the
    * classic "suggest the next word" corpus artifact.
    *
    * Scale shape: one pair-count aggregate (shuffle bounded by the
    * distinct-bigram vocabulary) and one `min_by` fold per context —
    * both map-side-combining; no window, no sort. The tie-break rides
    * inside the `min_by` ordering struct `(−c₁₂, w2)`, so the argmax
    * is a single aggregate, not a rank-1 window filter. */
  def nextTokenTable(docs: DataFrame, textCol: String,
                     minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val cPair = adjacentPairs(docs, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    cPair.groupBy("w1")
      .agg(sum(col("c12")).as("c1"),
        min_by(struct(col("w2"), col("c12")),
          struct((-col("c12")).as("nc"), col("w2"))).as("__best"))
      .filter(col("c1") >= minCount)
      .select(col("w1"), col("__best.w2").as("w2"),
        col("__best.c12").as("c12"), col("c1"),
        expr("__best.c12 * 1000000L div c1").as("p_e6"))
  }

  /** PMI collocation mining — the association-strength complement of
    * [[topNgrams]]'s raw frequency: adjacent token pairs whose joint
    * count beats independence by a factor ≥ `minRatio`, i.e.
    * `PMI(w1,w2) = log(c₁₂·N / (c₁·c₂)) ≥ log(minRatio)`, with `c₁` =
    * occurrences of `w1` as a LEFT pair element, `c₂` = `w2` as a RIGHT
    * element, and `N` = total adjacent pairs (the standard bigram
    * positional-count convention — left/right marginals sum to N, so
    * the ratio is a calibrated probability ratio).
    *
    * Exactness (the q122/q128 discipline): the threshold is evaluated as
    * the INTEGER cross-multiplication `c₁₂·N ≥ minRatio·c₁·c₂` — no
    * logarithm ever executes, so there is no cross-engine libm ulp to
    * drift on — and the reported `ratio` is the single IEEE division
    * `(c₁₂·N) / (c₁·c₂)` of exact longs, bit-identical under replay.
    * Domain: `c₁₂·N < 2⁶³` bounds the corpus at ~3e9 adjacent pairs per
    * build (shard-and-merge counts beyond that).
    *
    * Scale shape: one explode over the positions array (codegen'd
    * builtins, no UDF), then three map-side-combining aggregates — the
    * pair count shuffle is bounded by the DISTINCT pair vocabulary
    * (Zipf-bounded), the marginals by the token vocabulary, and both
    * marginal frames broadcast back onto the pair frame. */
  def pmiCollocations(docs: DataFrame, textCol: String, minCount: Long,
                      minRatio: Long): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(minRatio >= 1, "minRatio must be >= 1 (below 1 selects anti-collocations)")
    val pairs = adjacentPairs(docs, textCol)
    val cPair = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val cLeft = pairs.groupBy("w1").agg(count(lit(1)).as("c1"))
    val cRight = pairs.groupBy("w2").agg(count(lit(1)).as("c2"))
    val total = pairs.agg(count(lit(1)).as("n_pairs"))
    cPair.filter(col("c12") >= minCount)
      .join(broadcast(cLeft), Seq("w1"))
      .join(broadcast(cRight), Seq("w2"))
      .crossJoin(broadcast(total))
      // DECIMAL(38,0) widening on both cross-products: c12·N and r·c1·c2
      // wrap silently in BIGINT arithmetic on a large corpus (2^63 is only
      // ~9.2e18); a wrapped product flips the verdict, and Spark wraps where
      // DuckDB raises — a scale-latent cross-engine divergence
      .filter(col("c12").cast("decimal(38,0)") * col("n_pairs") >=
        lit(minRatio) * col("c1").cast("decimal(38,0)") * col("c2"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        col("n_pairs"),
        ((col("c12") * col("n_pairs")).cast("double") /
          (col("c1") * col("c2")).cast("double")).as("ratio"))
  }

  /** Sliding-window document chunking with overlap — the
    * fixed-context-window split (RAG indexing, long-doc training
    * examples): window `k` covers tokens `[k·stride, k·stride +
    * chunkSize)`, for every start strictly inside the document. With
    * `stride < chunkSize` consecutive windows overlap by `chunkSize −
    * stride` tokens (the boundary-context overlap); a trailing window
    * shorter than `chunkSize` is kept (its tokens would otherwise lose
    * their only full-context appearance). Documents with no tokens
    * produce no chunks.
    *
    * Output: (idCol, chunk_id, n_tokens, chunk_text), one row per window.
    * Scale shape: explode + slice on the per-doc token array — one
    * narrow projection pass, no shuffle, no UDF; output rows ≈ input
    * tokens / stride regardless of document skew. */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, "chunkSize must be >= 1")
    require(stride >= 1 && stride <= chunkSize,
      "stride must be in [1, chunkSize] (stride > chunkSize drops tokens)")
    docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol), Cols.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), ((col("__n") - 1) / stride).cast("int")))
          .as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        least(lit(chunkSize), col("__n") - col("chunk_id") * stride)
          .cast("int").as("n_tokens"),
        concat_ws(" ",
          slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  /** Scale-safe GLOBAL row rank (0-based) in `order` — what
    * `row_number().over(Window.orderBy(...))` means, without its plan:
    * an un-partitioned window moves EVERY row to one task (Spark even
    * warns `WindowExec: No Partition Defined`), which at corpus scale
    * is the single-executor bottleneck. Here: range-repartition on the
    * order key (the same sampled range split `orderBy` itself uses),
    * sort within partitions, then one tiny count-per-partition job
    * whose cumulative offsets convert local indices to global ranks —
    * `zipWithIndex`'s two-pass trick, kept as the documented
    * per-partition-imperative exception to the no-RDD rule.
    *
    * `order` must totally order the rows (add a unique tiebreak
    * column), else ties land nondeterministically per run. Output: the
    * input columns plus `rankCol` (long, 0-based, dense in [0, n)). */
  def globalRank(df: DataFrame, order: Seq[Column], rankCol: String = "rank"): DataFrame = {
    require(order.nonEmpty, "globalRank needs at least one order column")
    require(!df.columns.contains(rankCol),
      s"globalRank emits `$rankCol` — rename the existing column")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val indexed = sorted.rdd.zipWithIndex.map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i) }
    spark.createDataFrame(indexed,
      org.apache.spark.sql.types.StructType(
        sorted.schema.fields :+
          org.apache.spark.sql.types.StructField(rankCol,
            org.apache.spark.sql.types.LongType, nullable = false)))
  }

  /** Balanced shard assignment for training-data loaders: rank docs by
    * `sizeCol` DESCENDING (ties broken by `keyCol`) and deal them
    * serpentine over `nShards` — pass 0 deals shards 0→n−1, pass 1
    * n−1→0, … — the boustrophedon round-robin that keeps every shard's
    * total within one pass-width of its neighbors (plain round-robin
    * systematically favors low shard ids within each pass; greedy
    * first-fit-decreasing balances marginally better but is inherently
    * sequential). The rank comes from [[globalRank]], so the whole
    * assignment is one range-partitioned sort — no single-task window,
    * no driver loop — and fully deterministic, hence SQL-replayable.
    *
    * Output: input columns plus `shard` (int in [0, nShards)). */
  def assignShards(df: DataFrame, keyCol: String, sizeCol: String,
                   nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    globalRank(df, Seq(col(sizeCol).desc, col(keyCol)), "__r")
      .withColumn("shard",
        when(expr(s"(__r div $nShards) % 2") === 0, col("__r") % nShards)
          .otherwise(lit(nShards - 1) - col("__r") % nShards)
        .cast("int"))
      .drop("__r")
  }

  /** Top-k TF-IDF terms per document — the classic keyword/vector
    * readout beside [[bm25]] (which scores DOCUMENTS for one query; this
    * emits each document's own strongest TERMS): `tfidf(t, d) =
    * tf_{t,d} · ln(N / df_t)`, both factors from exact integer counts.
    *
    * Determinism (the q153/q169 discipline): one float step per
    * (doc, term) row — `tf · ln(N/df)` as a fixed tree — quantized to
    * `score_e9` nanonats; ranking and the top-k cut happen on the
    * INTEGER score with the term string as total tiebreak, so the kept
    * set and order are engine-exact.
    *
    * Plan shape: one token explode → (doc, term) counts (map-side
    * combined); document frequencies re-aggregate FROM that table —
    * never a second scan — and broadcast back; the per-doc top-k is one
    * (doc)-partitioned rank window over doc-vocabulary-sized rows.
    * Stop-terms (df ≥ every doc) carry ln(1) = 0 and drop naturally. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val nDocs = docs.filter(length(trim(col(textCol))) > 0).count()
    val tf = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), explode(Cols.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("__df"))
    val score = col("tf").cast("double") *
      log(lit(nDocs).cast("double") / col("__df").cast("double"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_e9").desc, col("term"))
    tf.join(broadcast(dfreq), Seq("term"))
      .withColumn("score_e9", floor(score * lit(1e9) + lit(0.5)).cast("long"))
      .filter(col("score_e9") > 0) // stop-terms and ubiquitous tokens
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(idCol), col("__rn").as("rank"), col("term"), col("tf"),
        col("__df").as("doc_freq"), col("score_e9"))
  }

  /** Neyman-allocated stratified sample (Neyman 1934) — the
    * variance-optimal answer to "given a labeling/eval budget of
    * `nTotal` rows, how many from each stratum": `n_h ∝ N_h·S_h`, so
    * big AND volatile strata get the budget, and a uniform or
    * proportional split is strictly worse for estimating the mean of
    * `valueCol`. The principled version of [[domainMixSample]]'s
    * hand-set weights.
    *
    * Determinism end-to-end: the only float is each stratum's
    * `N_h·S_h` weight, e6-QUANTIZED IMMEDIATELY — allocation then runs
    * on exact integers (`base = w·nTotal div Σw`, leftover seats by
    * LARGEST REMAINDER `w·nTotal − base·Σw` with stratum-name
    * tie-break), and the sample itself is the md5-rank prefix per
    * stratum (the [[tokenBudgetSample]] convention). Allocations are
    * clamped to the stratum size (a tiny volatile stratum can't give
    * seats it doesn't have; the clamped total may fall short of
    * `nTotal` — documented, not silently redistributed). BIGINT bound:
    * `w_e6·nTotal < 2⁶³` — rescale `valueCol` upstream for
    * billion-row strata.
    *
    * Scale shape: ONE moment aggregate to the stratum grid; all
    * allocation windows run on the grid; the sample is one md5-rank
    * window over the rows. Output: sampled rows
    * `(stratumCol, keyCol, alloc, n_stratum)`. */
  def neymanSample(df: DataFrame, stratumCol: String, keyCol: String,
                   valueCol: String, nTotal: Long): DataFrame = {
    require(nTotal >= 1, s"nTotal must be >= 1, got $nTotal")
    val x = col(valueCol).cast("long")
    val grid = df.filter(col(stratumCol).isNotNull && x.isNotNull)
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__n"), sum(x).as("__s1"), sum(x * x).as("__s2"))
      .withColumn("__w", expr(
        """case when __n >= 2
          |       and (cast(__n as double) * __s2 - cast(__s1 as double) * __s1) > 0
          |  then cast(floor(cast(__n as double)
          |    * sqrt((cast(__n as double) * __s2 - cast(__s1 as double) * __s1)
          |           / (cast(__n as double) * (__n - 1))) * 1000000 + 0.5) as bigint)
          |  else cast(0 as bigint) end""".stripMargin))
    val wAll = Window.partitionBy(lit(1))
    val wRem = Window.partitionBy(lit(1))
      .orderBy(col("__rem").desc, col(stratumCol))
    val alloc = grid
      .withColumn("__tot", sum(col("__w")).over(wAll))
      .withColumn("__base", expr(s"__w * $nTotal div nullif(__tot, 0)"))
      .withColumn("__rem", expr(s"__w * $nTotal - __base * __tot"))
      .withColumn("__left", lit(nTotal) - sum(col("__base")).over(wAll))
      .withColumn("__rk", row_number().over(wRem))
      .withColumn("alloc",
        least(col("__base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L),
          col("__n")))
      .select(col(stratumCol), col("__n").as("n_stratum"), col("alloc"))
    val wRank = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.filter(col(stratumCol).isNotNull && x.isNotNull)
      .select(col(stratumCol), col(keyCol))
      .withColumn("__rn", row_number().over(wRank))
      .join(broadcast(alloc), Seq(stratumCol))
      .filter(col("__rn") <= col("alloc"))
      .select(col(stratumCol), col(keyCol), col("alloc"), col("n_stratum"))
  }

  /** Vocabulary coverage / OOV audit — build the top-N reference
    * vocabulary from the REFERENCE slice (rows matching `refFilter`,
    * ranked by token count with deterministic ties), then score every
    * key's token stream against it: the "what fraction of this source
    * falls outside the tokenizer's vocabulary" readout that decides
    * whether a fixed-vocab model can even read a new ingest (a 2% OOV
    * source tokenizes fine; a 30% one shreds into bytes and its loss
    * is garbage). Distinct-OOV counts separate "one weird token
    * repeated" from "a genuinely foreign vocabulary".
    *
    * Exactness: the reference set is a deterministic top-N
    * (`count DESC, token ASC` — the rankingMetrics tie convention);
    * OOV counts come from one broadcast-able left anti-style join;
    * rates are pure integer permille `div`. Scale shape: the reference
    * vocab is N-bounded (broadcast), the token stream aggregates
    * map-side per (key, token) BEFORE the vocab join — the heavy grid
    * is vocabulary-sized, never row-sized. Output: `(keys…, n_tokens,
    * n_oov, oov_pm, n_distinct, n_distinct_oov, distinct_oov_pm)`. */
  def vocabCoverage(df: DataFrame, keyCols: Seq[String], textCol: String,
                    refFilter: Column, topN: Int = 1000): DataFrame = {
    require(keyCols.nonEmpty, "vocabCoverage needs at least one key column")
    val k = keyCols.map(col)
    val grid = graft.functions.Cols.dropNullKeys(df, keyCols)
      .filter(col(textCol).isNotNull)
      .withColumn("__ref", refFilter)
      .select((k :+ col("__ref") :+
        explode(graft.functions.Cols.tokens(col(textCol))).as("__tok")): _*)
      .filter(col("__tok") =!= "")
      .groupBy(k :+ col("__tok"): _*)
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__ref"), 1L).otherwise(0L)).as("__nref"))
      .localCheckpoint(false)
    coverageFromGrid(grid, keyCols, topN)
  }

  /** The OOV readout over a per-(key, __tok) count grid (`__n` all
    * occurrences, `__nref` reference-slice occurrences) — ONE
    * definition shared by the batch operator and the streaming twin
    * (whose complete-mode state IS this grid), the chiSqFromCells
    * convention. The reference vocabulary re-derives from the grid
    * (global Σ__nref per token, `count DESC, token ASC` top-N). */
  def coverageFromGrid(grid: DataFrame, keyCols: Seq[String],
                       topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be positive, got $topN")
    val k = keyCols.map(col)
    // orderBy + limit plans as TakeOrderedAndProject — the distributed
    // top-N, where a row_number window would sort the whole vocabulary
    // in ONE partition; the (count DESC, token ASC) total order makes
    // the selected set identical
    val vocab = grid.groupBy(col("__tok"))
      .agg(sum(col("__nref")).as("__c"))
      .filter(col("__c") > 0)
      .orderBy(col("__c").desc, col("__tok").asc)
      .limit(topN)
      .select(col("__tok"), lit(true).as("__in"))
    grid
      .join(broadcast(vocab), Seq("__tok"), "left")
      .groupBy(k: _*)
      .agg(sum(col("__n")).as("n_tokens"),
        sum(when(col("__in").isNull, col("__n")).otherwise(0L)).as("n_oov"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_distinct_oov"))
      .withColumn("oov_pm", expr("n_oov * 1000 div n_tokens"))
      .withColumn("distinct_oov_pm",
        expr("n_distinct_oov * 1000 div n_distinct"))
  }

  /** Per-key Heaps'-law vocabulary growth — the corpus-health curve
    * `V(N) ≈ K·N^β`: bucket the documents into `buckets` ordered
    * chunks (by `docCol`), emit the cumulative (tokens, distinct
    * tokens) grid, and fit β by log-log OLS over the grid points. The
    * DIAGNOSTIC the scalar vocabulary stats can't give: a dedup'd
    * natural corpus grows at β ≈ 0.5; β drifting toward 1 means the
    * ingest is importing novel junk (IDs, hashes) and β collapsing
    * toward 0 means it's re-crawling what it already has — both
    * invisible to q280's point-estimate richness.
    *
    * Exactness: bucket = `(rank−1)·B div n_docs` (pure integer); V's
    * increments come from each token's MIN bucket (first appearance —
    * an exact grid aggregate, never a sequential scan); both cumsums
    * are exact integers; each grid point's `ln` pair is ONE fixed tree
    * e9-quantized to integers BEFORE the OLS sums (which accumulate as
    * DECIMAL), and β is one double division e6-quantized. Buckets
    * enter the OLS only once both cumulatives are positive. Keys with
    * < 2 usable grid points emit null β.
    *
    * Scale shape: the doc-rank window is doc-grid-sized per key; the
    * heavy (key, token) first-bucket aggregate is ONE map-side-combined
    * min; everything after is B-sized. Output: one row per (key,
    * bucket): `(keys…, bucket, tokens_cum, vocab_cum, beta_e6)` with β
    * repeated per key. */
  def vocabGrowth(df: DataFrame, keyCols: Seq[String], docCol: String,
                  textCol: String, buckets: Int = 16): DataFrame = {
    require(keyCols.nonEmpty, "vocabGrowth needs at least one key column")
    require(buckets >= 2 && buckets <= 1024,
      s"buckets must be in [2, 1024], got $buckets")
    val k = keyCols.map(col)
    val wKey = Window.partitionBy(k: _*)
    val wCum = wKey.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val docs = graft.functions.Cols.dropNullKeys(df, keyCols)
      .filter(col(docCol).isNotNull && col(textCol).isNotNull)
      .select((k :+ col(docCol).as("__doc") :+ col(textCol).as("__text")): _*)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(k: _*).orderBy(col("__doc"))).cast("long"))
      .withColumn("__nd", count(lit(1)).over(wKey))
      .withColumn("bucket", expr(s"(__rn - 1) * $buckets div __nd"))
      .localCheckpoint(false)
    val toks = docs
      .select((k :+ col("bucket") :+
        explode(graft.functions.Cols.tokens(col("__text"))).as("__tok")): _*)
      .filter(col("__tok") =!= "")
      .localCheckpoint(false)
    val nb = toks.groupBy(k :+ col("bucket"): _*)
      .agg(count(lit(1)).as("__nt"))
    val vb = toks.groupBy(k :+ col("__tok"): _*)
      .agg(min(col("bucket")).as("bucket"))
      .groupBy(k :+ col("bucket"): _*)
      .agg(count(lit(1)).as("__nv"))
    val grid = nb.join(vb, keyCols :+ "bucket", "left")
      .na.fill(0L, Seq("__nv"))
      .withColumn("tokens_cum", sum(col("__nt")).over(wCum))
      .withColumn("vocab_cum", sum(col("__nv")).over(wCum))
      .withColumn("__lx", expr(
        """case when tokens_cum > 0 and vocab_cum > 0 then
          |  cast(floor(ln(cast(tokens_cum as double)) * 1e9 + 0.5)
          |       as bigint) end""".stripMargin))
      .withColumn("__ly", expr(
        """case when tokens_cum > 0 and vocab_cum > 0 then
          |  cast(floor(ln(cast(vocab_cum as double)) * 1e9 + 0.5)
          |       as bigint) end""".stripMargin))
      .localCheckpoint(false)
    val fit = grid.filter(col("__lx").isNotNull)
      .groupBy(k: _*)
      .agg(count(lit(1)).as("__b"),
        sum(expr("cast(__lx as decimal(38,0))")).as("__sx"),
        sum(expr("cast(__ly as decimal(38,0))")).as("__sy"),
        sum(expr("cast(__lx as decimal(38,0)) * __lx")).as("__sxx"),
        sum(expr("cast(__lx as decimal(38,0)) * __ly")).as("__sxy"))
      .withColumn("beta_e6", expr(
        """case when __b >= 2 and __b * __sxx - __sx * __sx <> 0 then
          |  cast(floor(cast(__b * __sxy - __sx * __sy as double)
          |    / cast(__b * __sxx - __sx * __sx as double)
          |    * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
      .select((k :+ col("beta_e6")): _*)
    grid
      .join(fit, keyCols, "left")
      .select((k :+ col("bucket") :+ col("tokens_cum") :+
        col("vocab_cum") :+ col("beta_e6")): _*)
  }
}
