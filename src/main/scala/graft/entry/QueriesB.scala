package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.{Tables, ZOrder}
import graft.functions.Cols
import graft.operators.{CalendarOps, Cdc, Collapse, Features, Graph, MonteCarlo, RangeJoin, Sketch}
import graft.sim.Similarity
import graft.text.{Corpus, Dedup, TextAnalysis}
import graft.EntryHelpers._

/** Driver-contract query registry, second half (q176–q336). Merged into [[SparkEntry.queries]] — the driver
  * contract is unchanged; see SparkEntry's scaladoc for naming rules. */
private[graft] object QueriesB {
  private[graft] val m: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- extension: ABC / Pareto classification — items ranked by
    // revenue, integer cumulative-share class boundaries; window over
    // item-aggregate-sized rows
    "q176_x_abc_classes" -> gridTuned((s, d) => {
      val items = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_partkey"))
        .agg(sum(expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)"))
          .as("rev_cents"))
      Sketch.abcClassify(items, Seq("l_returnflag"), "l_partkey", "rev_cents")
        .filter(col("rank") <= 100)
        .orderBy("l_returnflag", "rank")
    }),

    // ---- extension: seasonal decomposition — centered 2x12 MA trend,
    // phase-mean seasonal, residual; exact-long cores, _e6 readouts
    "q177_x_seasonal_decompose" -> gridTuned((s, d) => {
      val m = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"),
          Cols.monthStart(col("o_orderdate")).as("month"))
        .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")).as("cents"))
      graft.operators.Features.seasonalDecompose(m, Seq("prio"), "month", "cents")
        .select(col("prio"), col("month"), col("cents"), col("trend_e6"),
          col("seasonal_e6"), col("resid_e6"))
        .orderBy("prio", "month")
    }),

    // ---- extension: Gini concentration — how unequal is revenue over
    // customers per segment; exact-long numerator, one window+aggregate
    "q178_x_gini" -> gridTuned((s, d) => {
      val custRev = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_custkey"))
        .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"))
          .as("rev_cents"))
      Sketch.gini(custRev, Seq("c_mktsegment"), "rev_cents")
        .orderBy("c_mktsegment")
    }),

    // ---- extension: exponential time-decay score — recency-weighted
    // engagement per user via whole-half-life bit shifts; the double
    // readout divides an exact long by 2^20, so it is itself exact
    "q179_x_decay_score" -> rowTuned((s, d) => {
      val e = Tables.events(s, d)
        .withColumn("tsu", expr("ts_ns div 1000"))
        .withColumn("cents", expr("cast(floor(value * 100 + 0.5) as bigint)"))
      graft.operators.Features.decayScore(e, Seq("user_id"), "tsu", "cents",
          halfLifeMicros = 7L * 86400L * 1000000L) // one week
        .orderBy("user_id")
    }),

    // ---- extension: bigram LM scoring — order-2 upgrade of q86's
    // unigram perplexity: OOV-closed vocabulary, lead-window successors,
    // shuffle-joined bigram stats (NOT assumed broadcastable)
    "q180_x_bigram_nll" -> rowTuned((s, d) =>
      graft.text.LanguageModel.bigramNll(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // ---- extension: streaming expectation counters — the q160 row-check
    // tier as standing complete-mode sums; drained state == batch verdict
    "q181_x_stream_expectations" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingExpectations(s, d, Seq(
        "value_nonneg" -> "value >= 0",
        "type_known" -> "event_type in ('view','click','purchase','signup')",
        "user_not_null" -> "user_id is not null"))),

    // ---- extension: streaming transition matrix — constant-size
    // last-event state per user, boundary + in-batch pairs; emitted
    // multiset == q171's batch lead-window pairs
    "q182_x_stream_transitions" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingTransitions(s, d)),

    // ---- extension: skip-gram PMI collocations — q143's association
    // mining widened to a ±2 context window (word2vec-style pairs), same
    // integer cross-multiplication threshold, no log in the decision path
    "q183_x_skipgram_pmi" -> gridTuned((s, d) =>
      graft.text.Corpus.skipgramPmi(
          Tables.documents(s, d), "text", window = 2, minCount = 5,
          minRatio = 15)
        // DECIMAL(38,0) widening: c12·n_pairs·1e6 wraps silently in BIGINT
        // once the corpus is large enough (c12·N·1e6 > 2^63); the oracle
        // widens to HUGEINT the same way, and the ratio itself fits BIGINT
        // (ratio ≤ N·1e6 / minCount)
        .withColumn("ratio_e6",
          expr("cast(c12 as decimal(38,0)) * n_pairs * 1000000 div (c1 * c2)"))
        .drop("ratio")
        .orderBy("w1", "w2")),

    // ---- extension: incremental join maintenance — the delta-join
    // identity Δ(A⋈B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB on insert-only orders ⋈
    // customer; the readout aggregates J₀ ∪ delta and the oracle is the
    // FULL recompute, so the hash match IS the identity proof
    "q184_x_join_delta" -> gridTuned((s, d) => {
      import graft.operators.Incremental
      val cut = "1996-01-01"
      val o = Tables.orders(s, d).select(col("o_custkey").as("custkey"),
        col("o_orderdate"), col("o_totalprice"))
      val c = Tables.customer(s, d).select(col("c_custkey").as("custkey"),
        col("c_mktsegment"))
      val oldL = o.filter(col("o_orderdate") < lit(cut))
      val dL = o.filter(col("o_orderdate") >= lit(cut) ||
        col("o_orderdate").isNull)
      val oldR = c.filter(col("custkey") % 3 =!= 0)
      val dR = c.filter(col("custkey") % 3 === 0)
      val maintained = oldL.join(oldR, Seq("custkey"))
        .unionByName(Incremental.joinDelta(oldL, dL, oldR, dR, Seq("custkey")))
      maintained.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          expr("sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))")
            .as("cents"))
        .orderBy("c_mktsegment")
    }),

    // ---- extension: Benford first-digit screen — fabrication test over
    // order totals (cents); digit from the LONG's decimal rendering,
    // shares exact integer permille-of-a-million, Benford expectation one
    // fixed log10 tree per digit
    "q185_x_benford" -> gridTuned((s, d) =>
      graft.operators.Profile.benfordDigits(
          Tables.orders(s, d).withColumn("cents",
            expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")),
          Seq("o_orderpriority"), "cents")
        .orderBy("o_orderpriority", "digit")),

    // ---- extension: composed data-quality suite (the Deequ shape end to
    // end) — expectations + profile + Benford over ONE planted-drift
    // table: a deterministic slice of lineitem re-enters with a negated
    // (orphaned) order key, an out-of-range quantity, and a nulled
    // return flag; each tier must flag exactly the planted corruption.
    // Unified long-format readout (tier, name, metric_a, metric_b).
    "q186_x_quality_suite" -> gridTuned((s, d) => {
      import graft.operators.{Expectations, Profile}
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_quantity",
        "l_returnflag", "l_linestatus", "l_extendedprice")
      val planted = li.unionByName(
        li.filter(col("l_orderkey") % 50 === 0)
          .withColumn("l_orderkey", -col("l_orderkey"))
          .withColumn("l_quantity",
            lit(-1).cast(li.schema("l_quantity").dataType))
          .withColumn("l_returnflag", lit(null).cast("string")))
        // lazy localCheckpoint (the brierDecomposition pattern): all
        // three suite tiers (expectations, profile, Benford) scan the
        // planted union — uncheckpointed it re-reads + re-unions thrice
        .localCheckpoint(false)
      val expect = Expectations.validate(planted,
          rowChecks = Seq(
            "quantity_range" -> (col("l_quantity") >= 1 &&
              col("l_quantity") <= 50),
            "returnflag_not_null" -> col("l_returnflag").isNotNull),
          refChecks = Seq(Expectations.RefCheck("fk_orders",
            Seq("l_orderkey"), Tables.orders(s, d), Seq("o_orderkey"))))
        .select(lit("expect").as("tier"), col("constraint").as("name"),
          col("n_rows").as("metric_a"), col("n_violations").as("metric_b"))
      val prof = Profile.profile(planted, Seq("l_quantity", "l_returnflag"))
        .select(lit("profile").as("tier"), col("col_name").as("name"),
          col("n_null").as("metric_a"), col("n_distinct").as("metric_b"))
      val ben = Profile.benfordDigits(
          planted.withColumn("cents",
            expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)")),
          Seq("l_linestatus"), "cents")
        .select(lit("benford").as("tier"),
          concat(col("l_linestatus"), lit(":"),
            col("digit").cast("string")).as("name"),
          col("share_e6").as("metric_a"), col("abs_dev_e6").as("metric_b"))
      expect.unionByName(prof).unionByName(ben).orderBy("tier", "name")
    }),

    // ---- extension: streaming incremental join maintenance — the
    // delta-join identity as a standing operator; every click×purchase
    // pair per user is emitted exactly once (when its later element
    // arrives), so the drained multiset IS the batch inner join
    "q187_x_stream_join_delta" -> rowTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingJoinDelta(s, d)),

    // ---- extension: sliced classifier evaluation — per-source ROC AUC
    // of the length signal against the is-English label, integer-exact
    // via the Mann-Whitney rank identity (midrank ties, one division)
    "q188_x_grouped_auc" -> gridTuned((s, d) =>
      graft.operators.Metrics.groupedAuc(
          Tables.documents(s, d).withColumn("is_en", col("lang") === "en"),
          Seq("source"), "n_chars", "is_en")
        .orderBy("source")),

    // ---- extension: subset-duplicate detection — directional token-set
    // containment at 1.0 (every token of the smaller doc appears in the
    // larger: the quote-swallowed-by-boilerplate shape Jaccard misses)
    "q189_x_containment" -> rowTuned((s, d) =>
      Dedup.tokenContainment(Tables.documents(s, d), "doc_id", "text",
          maxIdGap = 50, thresholdE6 = 1000000)
        .orderBy("id_a", "id_b")),

    // ---- extension: per-document token Shannon entropy — the
    // information-density quality feature (repetition ⇒ low entropy at
    // length); e9-quantized per-term, exact integer sum
    "q190_x_token_entropy" -> rowTuned((s, d) =>
      graft.text.TextAnalysis.tokenEntropy(
          Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // ---- extension: Zipf slope corpus profile — OLS of ln(freq) on
    // ln(rank) over each source's top-50 vocabulary, all-integer OLS
    // sums over e3-quantized logs, one closed-form division
    "q191_x_zipf_slope" -> gridTuned((s, d) =>
      Corpus.zipfSlope(Tables.documents(s, d), "source", "text", topV = 50)
        .orderBy("domain")),

    // ---- extension: reciprocal-rank fusion — BM25 relevance fused with
    // the entropy quality prior in rank space (no score calibration);
    // contributions are exact integers 1e9 div (60 + rank)
    "q192_x_rrf_fuse" -> rowTuned((s, d) => {
      val docs = Tables.documents(s, d)
      val bm = Corpus.bm25(docs, "doc_id", "text",
          query = Seq("join", "scan", "window"))
        .select(col("doc_id"), col("bm25").as("score"))
      val ent = graft.text.TextAnalysis.tokenEntropy(docs, "doc_id", "text")
        .select(col("doc_id"), col("entropy_e9").as("score"))
      Corpus.rrfFuse(Seq(bm, ent), "doc_id", "score", kRrf = 60)
        .orderBy(col("rrf_e9").desc, col("doc_id"))
    }),

    // ---- extension: deterministic hash-offset negative sampling — the
    // contrastive-pair builder; md5-hash draws onto the dense id index,
    // anchor-collision shifts one slot, O(N*k), no cross join
    "q193_x_negative_sample" -> rowTuned((s, d) =>
      Corpus.negativeSample(Tables.documents(s, d), "doc_id", k = 4)
        .orderBy("anchor_id", "j")),

    // ---- extension: REAL audio decode + per-window features — planted
    // WAV containers decoded with javax.sound.sampled (the audio twin of
    // q53/q54's imageio graduation); energy Σs² and zero crossings are
    // exact integers over the closed-form PCM, so the oracle replays the
    // decoded signal directly
    "q194_x_audio_features" -> gridTuned((s, d) => {
      import graft.multimodal.Multimodal
      val wavs = Tables.documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") < 300)
        .withColumn("content", Multimodal.plantedWavCol(col("doc_id")))
      Multimodal.audioWindowStats(wavs, "doc_id", "content", windowSize = 1000)
        .orderBy("doc_id", "win")
    }),

    // ---- extension: per-domain KS drift screen — each source's length
    // distribution vs the rest of the corpus, argmax chosen by
    // cross-multiplied cumulative counts (no float), one exact division
    "q195_x_ks_drift" -> gridTuned((s, d) =>
      graft.operators.Metrics.ksDrift(
          Tables.documents(s, d), "source", "n_chars")
        .orderBy("source"))
,
    // ---- extension: end-to-end corpus-cleaning funnel — the composed
    // pipeline a training-data run actually executes (quality filter →
    // exact dedup), read out as per-source survival counts at each
    // stage; every stage is the same operator the standalone queries
    // contract-check (q41/q42/q44/q68)
    "q196_x_corpus_funnel" -> gridTuned((s, d) => {
      import graft.text.{Dedup, TextAnalysis}
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val feats = TextAnalysis.qualityFeatures(col("text")).toMap
      val quality = docs.select(col("doc_id"), col("source"), col("text"),
          feats("n_tokens").as("n_tokens"),
          feats("punct_ratio").as("punct_ratio"),
          TextAnalysis.languageId(col("text")).as("lang_pred"))
        .filter(col("lang_pred") === "en" && col("n_tokens") >= 5 &&
          coalesce(col("punct_ratio"), lit(0.0)) <= 0.2)
      val kept = quality
        .select(col("doc_id"), col("source"),
          Dedup.exactDigest(col("text")).as("__dg"))
        .withColumn("__keep", min(col("doc_id")).over(Window.partitionBy("__dg")))
        .filter(col("doc_id") === col("__keep"))
      docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .join(quality.groupBy("source").agg(count(lit(1)).as("__nq")),
          Seq("source"), "left")
        .join(kept.groupBy("source").agg(count(lit(1)).as("__nk")),
          Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("__nq"), lit(0L)).as("n_quality"),
          coalesce(col("__nk"), lit(0L)).as("n_kept"))
        .orderBy("source")
    }),

    // ---- extension: snapshot drift report — profile two date-split
    // versions of orders and diff per column: integer-permille null
    // rates, distinct counts, string-range change flag
    "q197_x_profile_diff" -> gridTuned((s, d) => {
      val o = Tables.orders(s, d)
      val cut = "1996-01-01"
      graft.operators.Profile.profileDiff(
          o.filter(col("o_orderdate") < lit(cut)),
          o.filter(col("o_orderdate") >= lit(cut)),
          Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"))
        .orderBy("col_name")
    }),

    // ---- extension: per-domain PSI drift — the binned companion of
    // q195's KS (mass movement integrated over the range, not the worst
    // point); Laplace-smoothed from exact counts, e9-quantized terms
    "q198_x_psi_drift" -> gridTuned((s, d) =>
      graft.operators.Metrics.psiDrift(
          Tables.documents(s, d), "source", "n_chars",
          binWidth = 60L, nBins = 10)
        .orderBy("source")),

    // ---- extension: STREAMING PSI drift monitor — state is only the
    // per-(type, bin) count grid (complete mode, O(groups·bins));
    // drained counts == batch counts, so psi_e9 matches bit-for-bit
    "q199_x_stream_psi_drift" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingPsiDrift(s, d)),

    // ---- extension: point-in-time join — "which version was valid when
    // this event happened": q127's SCD2 history probed through the
    // native as-of join (latest valid_from <= t), with the valid_to
    // bound demoting probes that land in a DELETED interval to null —
    // the lakehouse time-travel read, composed from contract-checked
    // parts
    "q200_x_point_in_time_join" -> rowTuned((s, d) => {
      val o = Tables.orders(s, d)
      val changes = o.select(col("o_custkey").as("k"),
        col("o_orderkey").as("v"),
        when(col("o_orderkey") % 10 === 0, lit("D")).otherwise(lit("U")).as("op"),
        col("o_totalprice").as("price"))
      val hist = Cdc.scd2(changes, Seq("k"), "v", "op")
      val probes = o.filter(col("o_orderkey") % 13 === 0)
        .select(col("o_custkey").as("k"), col("o_orderkey").as("t"))
      org.apache.spark.sql.graft.AsofJoinNative.join(
          probes,
          hist.select(col("k"), col("valid_from"), col("valid_to"), col("price")),
          Seq("k"), "t", "valid_from", Seq("valid_to", "price"))
        .select(col("k"), col("t"),
          when(col("valid_to").isNull || col("t") < col("valid_to"),
            col("price")).as("price_asof"))
        .orderBy("k", "t")
    }),

    // ---- extension: trailing-k integer EWMA — exponentially-weighted
    // smoothing with NO float anywhere (integer weight recurrence, exact
    // long products, one integer division); all k lags stack on one
    // window sort
    "q201_x_ewma" -> gridTuned((s, d) => {
      val m = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("x"))
        .agg(expr("sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))")
          .as("cents"))
      graft.operators.Features.ewmaTrailing(m, Seq("prio"), "x", "cents",
          alphaE6 = 800000L, k = 8)
        .orderBy("prio", "x")
    }),

    // ---- extension: cross-domain quantile normalization — each
    // (source, n_chars) mapped to the global order statistic at its
    // within-source permille; integer ranks, actual global samples,
    // no interpolation
    "q202_x_quantile_normalize" -> rowTuned((s, d) =>
      graft.operators.Features.quantileNormalize(
          Tables.documents(s, d), "source", "n_chars")
        .orderBy("source", "n_chars")),

    // ---- extension: seasonal-naive MASE — "does last year beat last
    // month": the scale-free forecastability screen before anything
    // SARIMAX-shaped runs; integer errors, exact sums, one division
    "q203_x_mase" -> gridTuned((s, d) => {
      val m = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("x"))
        .agg(expr("sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))")
          .as("cents"))
      graft.operators.Metrics.lagForecastMase(m, Seq("prio"), "x", "cents",
          forecastLag = 12, baselineLag = 1)
        .orderBy("prio")
    }),

    // ---- extension: n-gram diversity profile — the distinct-n metric
    // (Li et al. 2016): per source, unique-gram permille at n = 1/2/3;
    // template or generated text collapses the ratio long before a
    // human reads it. Exact integer counts and one integer division.
    "q204_x_ngram_diversity" -> gridTuned((s, d) => {
      val docs = Tables.documents(s, d)
        .filter(col("source").isNotNull && col("text").isNotNull &&
          length(trim(col("text"))) > 0)
      val grams = (1 to 3).map { n =>
        docs.select(col("source"), lit(n).as("n"),
          explode(graft.text.TextHash.shinglesCol(col("text"), n)).as("gram"))
      }.reduce(_ unionByName _)
      grams.groupBy("source", "n")
        .agg(count(lit(1)).as("total_grams"),
          count_distinct(col("gram")).as("distinct_grams"))
        .withColumn("distinct_pm",
          expr("distinct_grams * 1000 div total_grams"))
        .orderBy("source", "n")
    }),

    // ---- extension: chi-square independence + Cramér's V — lang ×
    // source association in one cell-aggregate pass; per-cell terms
    // e6-quantized over exact longs, V from the already-quantized χ²
    "q205_x_chi_square" -> gridTuned((s, d) =>
      graft.operators.Profile.chiSquare(
        Tables.documents(s, d), "lang", "source")),

    // ---- extension: BUILT-IN session_window streaming sessionization —
    // the engine-managed twin of q110/q56's custom-state forms; drained
    // complete-mode windows reshape to the batch sessionStats verdict
    "q206_x_stream_session_window" -> rowTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingSessionWindows(s, d)),

    // ---- extension: REAL image resize — integer box-average thumbnails
    // over the real javax.imageio decode (partitioning boxes, div-floor
    // means: deterministic where library resamplers are not); the oracle
    // replays the planted pixel formula and the same box sums
    "q207_x_image_resize" -> gridTuned((s, d) => {
      import graft.multimodal.Multimodal
      val imgs = Tables.documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") < 200)
        .withColumn("content", Multimodal.plantedImageCol(col("doc_id")))
      Multimodal.resizedPixels(imgs, "doc_id", "content", outW = 4, outH = 3)
        .orderBy("doc_id", "oy", "ox")
    }),

    // ---- extension: STREAMING CDC snapshot — the standing twin of
    // q121's batch fold: one complete-mode max_by per key (O(keys)
    // state), tombstones dropped at readout; drained == batch, so the
    // oracle IS q121's
    "q208_x_stream_cdc_snapshot" -> rowTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingCdcSnapshot(s, d)),

    // ---- extension: IVF cluster quality — per-cluster member count +
    // exact sum of e6-quantized member-to-centroid cosines over the
    // q58-trained model; the coarse-quantizer fitness diagnostic, and
    // the oracle replays the training chain (ivfTrainCtes) end to end
    "q209_x_cluster_quality" -> gridTuned((s, d) => {
      val vecs = Tables.embeddings(s, d).filter(col("vec_id") < 200)
      val model = graft.sim.Ivf.train(vecs, "vec_id", "embedding",
        k = 8, iters = 3)
      graft.sim.Ivf.clusterQuality(vecs, "vec_id", "embedding", model)
        .orderBy("cluster")
    }),

    // ---- extension: REAL video decode — multi-frame animated-GIF
    // container, header probe → frameSampleIndices → decode ONLY the k
    // sampled frames (cost scales with k, not n_frames). Closes the
    // decode matrix: image (q54/q131/q207), audio (q194), video here.
    // Planted frames are closed-form, so the oracle replays the decoded
    // per-frame luminance sums bit-for-bit.
    "q210_x_video_frames" -> gridTuned((s, d) => {
      import graft.multimodal.Multimodal
      val vids = Tables.documents(s, d).select(col("doc_id"))
        .filter(col("doc_id") < 300)
        .withColumn("content", Multimodal.plantedVideoCol(col("doc_id")))
      Multimodal.videoFrameFeatures(vids, "doc_id", "content", k = 3)
        .orderBy("doc_id", "frame_idx")
    }),

    // ---- extension: seasonal-AR(1) CLS fit + 24-step forecast — the
    // second hash-checked slice of the SARIMAX fit→forecast pipeline
    // after q117's AR(1): steps 1..12 forecast off OBSERVED lag-12
    // values, steps 13..24 recurse on the earlier forecasts (the oracle
    // composes the two stages explicitly)
    "q211_u8_sar1_forecast" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.seasonalArForecast(
          Tables.orders(s, d)
            .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(round(sum(floor(col("o_totalprice") * 100 + 0.5)) / 1e8, 6).as("tot")),
          Nil, "month", "tot", season = 12, horizon = 24)
        .select(col("key"), col("season"), col("step"),
          round(col("forecast"), 4).as("forecast"))
        .orderBy("key", "step")),

    // ---- extension: fixed-lag ADF unit-root t-stat — the closed-form
    // slice of the q34 stationarity family: integer cents in, exact
    // DECIMAL sufficient sums, one fixed Cramer+cofactor double tree for
    // coefficient AND standard error (the first hash-checked member of
    // the ADF/KPSS tier)
    "q212_u56_adf_fixed" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.adfFixedLag(
          Tables.orders(s, d)
            .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("cents")),
          Nil, "month", "cents")),

    // ---- extension: MA(1) CLS grid fit + forecast — the moving-average
    // slice of the SARIMAX grid made hash-checkable: the innovations
    // recursion is replayed per θ candidate by a recursive CTE, argmin
    // over the fixed grid, one-step memory in the forecast
    "q213_u8_ma1_forecast" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.ma1Forecast(
          Tables.orders(s, d)
            .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(round(sum(floor(col("o_totalprice") * 100 + 0.5)) / 1e8, 6).as("tot")),
          Nil, "month", "tot", horizon = 6)
        .select(col("key"), round(col("theta"), 1).as("theta"),
          round(col("mu"), 6).as("mu"), col("step"),
          round(col("forecast"), 4).as("forecast"))
        .orderBy("key", "step")),

    // ---- extension: URL canonicalization + registrable domain — the
    // web-corpus dedup-key step (planted URLs: mixed-case scheme/host,
    // default and non-default ports, tracking params in every position,
    // fragments; ids 60 apart collapse to the SAME canonical, so the
    // n_dups readout proves the key actually merges)
    "q214_x_url_canonical" -> rowTuned((s, d) => {
      import graft.text.UrlOps
      val hosts = array(lit("Example.COM"), lit("news.example.co.uk"),
        lit("CDN.Media.org"), lit("shop.example.com.au"), lit("blog.sample.net"))
      val id = col("doc_id")
      val planted = Tables.documents(s, d).select(id)
        .withColumn("url", concat(
          when(pmod(id, lit(2)) === 0, lit("HTTP")).otherwise(lit("https")),
          lit("://"),
          element_at(hosts, (pmod(id, lit(5)) + 1).cast("int")),
          when(pmod(id, lit(3)) === 0, lit(":80"))
            .when(pmod(id, lit(3)) === 1, lit(":443")).otherwise(lit("")),
          lit("/p/"), pmod(id, lit(30)).cast("string"),
          when(pmod(id, lit(4)) === 0,
              concat(lit("?id="), pmod(id, lit(30)).cast("string"), lit("&utm_source=feed")))
            .when(pmod(id, lit(4)) === 1, lit("?utm_campaign=x&ref=y"))
            .when(pmod(id, lit(4)) === 2, lit(""))
            .otherwise(lit("?a=1&fbclid=zzz")),
          when(pmod(id, lit(7)) === 0, lit("#sec")).otherwise(lit(""))))
      planted.select(id, col("url"),
          UrlOps.canonicalUrl(col("url")).as("canonical"),
          UrlOps.registeredDomain(col("url")).as("domain"))
        .withColumn("n_dups", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("canonical"))))
        .orderBy("doc_id")
    }),

    // ---- extension: STREAMING ordered funnel — q147's standing twin;
    // per-user state is the chained-min time vector (O(#stages)), each
    // chain extension emits one advance row, drained counts == batch
    "q215_x_stream_funnel" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingFunnel(s, d,
        Seq("view", "click", "purchase"))),

    // ---- extension: Mann-Kendall trend test per priority — exact
    // integer S and tie-corrected 18·Var, one fixed double z expression;
    // the nonparametric drift screen beside q09's parametric fit
    "q216_x_mann_kendall" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.mannKendall(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("cents")),
          Seq("o_orderpriority"), "month", "cents")
        .orderBy("key")),

    // ---- extension: order-independent table checksum per source — the
    // cross-region replication-drift digest (commutative modular sums of
    // 60-bit md5 row fingerprints; ONE map-side-combined aggregate)
    "q217_x_table_checksum" -> gridTuned((s, d) =>
      graft.operators.Integrity.tableChecksum(Tables.documents(s, d),
          Seq("source"), Seq("doc_id", "text", "lang", "n_chars"))
        .orderBy("source")),

    // ---- extension: JOINT ARMA(1,1) CLS grid fit — q117 fit the AR
    // side, q213 the MA side; this fits both together with the
    // closed-form intercept (e linear in c), 361 candidates replayed by
    // ONE recursive CTE carrying (phi, theta, a, b)
    "q218_u8_arma11_forecast" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.arma11Forecast(
          Tables.orders(s, d)
            .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(round(sum(floor(col("o_totalprice") * 100 + 0.5)) / 1e8, 6).as("tot")),
          Nil, "month", "tot", horizon = 6)
        .select(col("key"), round(col("phi"), 1).as("phi"),
          round(col("theta"), 1).as("theta"), round(col("c"), 6).as("c"),
          col("step"), round(col("forecast"), 4).as("forecast"))
        .orderBy("key", "step")),

    // ---- extension: closed-form Naive Bayes quality scorer — q93's
    // hash-checkable sibling: same hashed-BoW features and label, but
    // counts + one ln per bucket instead of gradient descent, nanonat
    // integer sums end-to-end
    "q219_x_naive_bayes" -> rowTuned((s, d) =>
      graft.text.QualityClassifier.naiveBayes(
          Tables.documents(s, d).withColumn("label",
            array_contains(Cols.tokens(col("text")), "vector").cast("int")),
          "doc_id", "text", "label", dim = 512)
        .orderBy("doc_id")),

    // ---- extension: per-source Average Precision — the PR-curve
    // readout beside q188's ROC AUC; score = n_chars (heavy ties, so
    // the doc_id tie-break contract is exercised), label = contains
    // 'data'. Exact integer precision@k terms end-to-end
    "q220_x_avg_precision" -> gridTuned((s, d) =>
      graft.operators.Metrics.averagePrecision(
          Tables.documents(s, d)
            .withColumn("label", instr(col("text"), "data") > 0),
          Seq("source"), "n_chars", "label", "doc_id")
        .orderBy("source")),

    // ---- extension: reliability diagram + ECE numerators — planted
    // PERFECTLY-CALIBRATED score (label ⇔ an independent hash draw
    // below the score), so the gap columns read near-zero by
    // construction and any systematic bias would be visible
    "q221_x_calibration" -> gridTuned((s, d) =>
      graft.operators.Metrics.calibrationBins(
          Tables.documents(s, d)
            .withColumn("score_e6", pmod(col("doc_id") * 48271L, lit(1000001L)))
            .withColumn("label",
              pmod(col("doc_id") * 2654435761L, lit(1000000L)) < col("score_e6")),
          "score_e6", "label", nBins = 10)
        .orderBy("bin")),

    // ---- extension: Welch two-sample t-test per order status — the
    // A/B location readout (URGENT vs LOW totals); whole-dollar values
    // keep Σx² < 2⁶³ to sf10 (cents overflow at sf0.1 — measured)
    "q222_x_welch_ttest" -> gridTuned((s, d) =>
      graft.operators.Metrics.welchTTest(
          Tables.orders(s, d)
            .withColumn("dollars", floor(col("o_totalprice") + 0.5)),
          Seq("o_orderstatus"), "o_orderpriority", "dollars",
          "1-URGENT", "5-LOW")
        .orderBy("o_orderstatus")),

    // ---- extension: Cohen's kappa per lang — two 3-level length
    // raters, B a hash-noised version of A, so κ lands strictly inside
    // (0, 1) and the chance correction actually bites
    "q223_x_cohen_kappa" -> gridTuned((s, d) => {
      val noisy = col("n_chars") + pmod(col("doc_id") * 1103515245L, lit(211L)) - 105L
      def tier(c: org.apache.spark.sql.Column) =
        when(c >= 350, "hi").when(c >= 250, "mid").otherwise("lo")
      graft.operators.Metrics.cohenKappa(
          Tables.documents(s, d).filter(col("lang").isNotNull)
            .withColumn("rater_a", tier(col("n_chars")))
            .withColumn("rater_b", tier(noisy)),
          Seq("lang"), "rater_a", "rater_b")
        .orderBy("lang")
    }),

    // ---- extension: Theil-Sen robust trend slope — q216's Mann-Kendall
    // decides IF a priority drifts; this sizes BY HOW MUCH per month,
    // with 29% outlier breakdown (same monthly cents input, so the pair
    // reads side-by-side in one report)
    "q224_x_theil_sen" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.theilSen(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("cents")),
          Seq("o_orderpriority"), "month", "cents")
        .orderBy("key")),

    // ---- extension: Kaplan-Meier retention curves — per-cohort user
    // lifetimes in days (first event -> last event), CENSORED when the
    // user is still active in the final 14 days of the window; the
    // observation edge derives FROM the per-user aggregate (no second
    // scan of the events table)
    "q225_x_kaplan_meier" -> gridTuned((s, d) => {
      val per = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(min(expr("ts_ns div 1000")).as("first_us"),
          max(expr("ts_ns div 1000")).as("last_us"))
      graft.operators.Survival.kaplanMeier(
          graft.operators.Survival.lifetimeSubjects(per),
          Seq("cohort"), "dur_days", "churned")
        .orderBy("key", "duration")
    }),

    // ---- extension: numeric correlation panel — every lineitem metric
    // pair's Pearson r from ONE scan's exact integer moments (whole
    // dollars/percent quantization keeps Σx² < 2⁶³ through sf10)
    "q226_x_corr_pairs" -> gridTuned((s, d) =>
      graft.operators.Profile.corrPairs(
          Tables.lineitem(s, d).select(
            floor(col("l_quantity") + 0.5).as("qty"),
            floor(col("l_extendedprice") + 0.5).as("price_d"),
            floor(col("l_discount") * 100 + 0.5).as("disc_pct"),
            floor(col("l_tax") * 100 + 0.5).as("tax_pct")),
          Seq("qty", "price_d", "disc_pct", "tax_pct"))
        .orderBy("col_x", "col_y")),

    // ---- extension: Brier score + Murphy decomposition — q221's
    // planted calibrated score read as one row: reliability ~0 by
    // construction, resolution ~ uncertainty (a calibrated informative
    // score), every term on the e6 integer grid
    "q227_x_brier_decomp" -> gridTuned((s, d) =>
      graft.operators.Metrics.brierDecomposition(
          Tables.documents(s, d)
            .withColumn("score_e6", pmod(col("doc_id") * 48271L, lit(1000001L)))
            .withColumn("label",
              pmod(col("doc_id") * 2654435761L, lit(1000000L)) < col("score_e6")),
          "score_e6", "label", nBins = 10)),

    // ---- extension: single-changepoint localization — q167's CUSUM
    // flags THAT a shift exists, this names WHERE (two-segment SSE
    // argmin over monthly kilodollars; the kd rescale keeps the Σy²
    // prefix sums exact BIGINTs through sf100)
    "q228_x_changepoint" -> gridTuned((s, d) =>
      graft.operators.Features.singleChangepoint(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(expr("sum(floor(o_totalprice * 100 + 0.5)) div 100000")
              .as("kd")),
          Seq("o_orderpriority"), "month", "kd")
        .orderBy("o_orderpriority")),

    // ---- extension: supplier-concentration profile — HHI + top share
    // per return class, the domain-dominance screen a mean can't see
    "q229_x_concentration" -> gridTuned((s, d) =>
      graft.operators.Profile.concentration(
          Tables.lineitem(s, d), Seq("l_returnflag"), "l_suppkey")
        .orderBy("l_returnflag")),

    // ---- extension: Spearman rank correlation per return class —
    // monotone association over midranks (qty is 1..50, so the tie
    // machinery carries real weight beside q226's linear r). The
    // continuous price axis is BINNED to hundreds — the operator's
    // documented dial: the joint grid (50 × ~5k cells) is what keeps
    // the histogram-shaped plan grid-sized instead of row-sized
    "q230_x_spearman" -> gridTuned((s, d) =>
      graft.operators.Profile.spearman(
          Tables.lineitem(s, d)
            .withColumn("qty", floor(col("l_quantity") + 0.5))
            .withColumn("price_h",
              expr("floor(l_extendedprice + 0.5) div 100")),
          Seq("l_returnflag"), "qty", "price_h")
        .orderBy("l_returnflag")),

    // ---- extension: rolling-origin AR(1) backtest — q117 fits once on
    // everything; this refits at EVERY origin on the past only and
    // scores one-step-ahead, the protocol that separates in-sample fit
    // from forecast skill. Closed-form refits from prefix sums: one
    // window pass, no recursion
    "q231_x_ar1_backtest" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.ar1Backtest(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(expr("sum(floor(o_totalprice * 100 + 0.5)) div 100000")
              .as("kd")),
          Seq("o_orderpriority"), "month", "kd", minTrain = 12)
        .orderBy("o_orderpriority")),

    // ---- extension: k-anonymity / l-diversity audit — the privacy gate
    // over (nation, segment) quasi-identifiers with the account-balance
    // band as the sensitive attribute (+1000 shift keeps the banding on
    // non-negative integers, where both engines' integer division agree)
    "q232_x_k_anonymity" -> gridTuned((s, d) =>
      graft.operators.Profile.kAnonymity(
          Tables.customer(s, d).withColumn("balband",
            expr("(cast(round(c_acctbal) as bigint) + 1000) div 1000")),
          Seq("c_nationkey", "c_mktsegment"), "balband", k = 5)),

    // ---- extension: decile lift/gains table — the budget-decision
    // readout over q221's planted calibrated score: histogram deciles
    // (no global row sort; ties share a tile), two-step integer lift
    "q233_x_lift_table" -> gridTuned((s, d) =>
      graft.operators.Metrics.liftTable(
          Tables.documents(s, d)
            .withColumn("score_e6", pmod(col("doc_id") * 48271L, lit(1000001L)))
            .withColumn("label",
              pmod(col("doc_id") * 2654435761L, lit(1000000L)) < col("score_e6")),
          "score_e6", "label", nTiles = 10)
        .orderBy("tile")),

    // ---- extension: funnel time-to-convert — q147 says how many reach
    // each stage, this says how FAST (per-transition lag min / lower
    // median / max in seconds, exact rank-element median)
    "q234_x_conversion_lag" -> gridTuned((s, d) =>
      graft.operators.Funnel.conversionLag(
          Tables.events(s, d).withColumn("sec", expr("ts_ns div 1000000000")),
          Seq("user_id"), "sec", "event_type", Seq("view", "click", "purchase"))
        .orderBy("stage")),

    // ---- extension: isotonic calibration via the PAV minimax closed
    // form — the pooling LOOP becomes a B³ grid expression, so the
    // "iterative" fit hash-checks; output monotone by construction
    "q235_x_isotonic" -> gridTuned((s, d) =>
      graft.operators.Metrics.isotonicCalibration(
          Tables.documents(s, d)
            .withColumn("score_e6", pmod(col("doc_id") * 48271L, lit(1000001L)))
            .withColumn("label",
              pmod(col("doc_id") * 2654435761L, lit(1000000L)) < col("score_e6")),
          "score_e6", "label", nBins = 10)
        .orderBy("bin")),

    // ---- extension: STREAMING Kaplan-Meier — q225's standing twin:
    // state is ONE complete-mode per-user (min, max) pair; the curve is
    // a batch read of the drained snapshot, so drained == batch and the
    // oracle IS q225's
    "q236_x_stream_kaplan_meier" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingKaplanMeier(s, d)),

    // ---- extension: IVF centroid separation — the BETWEEN-cluster
    // half of q209's quality readout (merge-candidate detection); the
    // oracle replays the pairs off the identical Lloyd chain
    "q237_x_cluster_separation" -> gridTuned((s, d) => {
      val vecs = Tables.embeddings(s, d).filter(col("vec_id") < 200)
      val model = graft.sim.Ivf.train(vecs, "vec_id", "embedding",
        k = 8, iters = 3)
      graft.sim.Ivf.clusterSeparation(s, model)
        .orderBy("cluster_a", "cluster_b")
    }),

    // ---- extension: labeler-agreement audit — q43's heuristic langid
    // judged against the labeled lang by Cohen's kappa per source (the
    // eval tier composed over the text tier: "does the cheap classifier
    // agree with the ground truth beyond chance, and on which slices")
    "q238_x_langid_agreement" -> gridTuned((s, d) =>
      graft.operators.Metrics.cohenKappa(
          Tables.documents(s, d).filter(col("source").isNotNull)
            .withColumn("pred", TextAnalysis.languageId(col("text")))
            .withColumn("truth",
              when(col("lang") === "en", "en").otherwise("und")),
          Seq("source"), "pred", "truth")
        .orderBy("source")),

    // ---- extension: STREAMING lift table — q233's standing twin:
    // state is the per-score-value (count, positives) histogram;
    // drained counts == batch counts, so the oracle IS q233's
    "q239_x_stream_lift_table" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingLiftTable(s, d)),

    // ---- extension: two-variant funnel A/B — pooled two-proportion z
    // per stage transition between hash-split variants; the experiment
    // readout asked on the funnel itself
    "q240_x_funnel_ab" -> gridTuned((s, d) =>
      graft.operators.Funnel.funnelVariantZ(
          Tables.events(s, d)
            .withColumn("sec", expr("ts_ns div 1000000000"))
            .withColumn("variant",
              when(pmod(col("user_id"), lit(2L)) === 0, "A").otherwise("B")),
          Seq("user_id"), "variant", "sec", "event_type",
          Seq("view", "click", "purchase"), "A", "B")
        .orderBy("stage")),

    // ---- extension: CUPED variance reduction per segment — theta and
    // rho-squared from one integer-moment aggregate over per-customer
    // (1996, 1997) dekadollar totals (div 10 keeps Sigma-x-squared
    // exact through sf100)
    "q241_x_cuped" -> gridTuned((s, d) => {
      val per = Tables.orders(s, d)
        .filter(col("o_orderdate").isNotNull &&
          year(col("o_orderdate")).isin(1996, 1997))
        .groupBy(col("o_custkey"))
        .agg(
          sum(when(year(col("o_orderdate")) === 1996,
            expr("floor(o_totalprice + 0.5) div 10")).otherwise(0L)).as("x"),
          sum(when(year(col("o_orderdate")) === 1997,
            expr("floor(o_totalprice + 0.5) div 10")).otherwise(0L)).as("y"))
      val seg = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      graft.operators.Metrics.cuped(
          per.join(broadcast(seg), per("o_custkey") === seg("c_custkey")),
          Seq("c_mktsegment"), "x", "y")
        .orderBy("c_mktsegment")
    }),

    // ---- extension: dedup-subsystem evaluation — the MinHash-LSH
    // candidate pairs (q46's configuration) scored against exact-
    // duplicate ground truth as precision/recall/F1: the engine
    // evaluating its own approximate operator (recall is 1.0 BY
    // CONSTRUCTION for exact dups — identical text means identical
    // signature, every band collides — so the readout isolates
    // precision, the near-dup-but-not-exact overshoot)
    "q242_x_dedup_eval" -> gridTuned((s, d) => {
      val docs = Tables.documents(s, d)
      val pred = Dedup.minhashCandidates(docs, "doc_id", "text",
          k = MinhashK, bands = MinhashBands)
        .select(col("id_a"), col("id_b"), lit(1L).as("__p"))
      val dg = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), Dedup.exactDigest(col("text")).as("__h"))
      val truth = dg.as("x").join(dg.as("y"),
          col("x.__h") === col("y.__h") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          lit(1L).as("__t"))
      truth.join(pred, Seq("id_a", "id_b"), "full")
        .agg(
          sum(coalesce(col("__t"), lit(0L))).as("n_truth"),
          sum(coalesce(col("__p"), lit(0L))).as("n_pred"),
          sum(when(col("__t").isNotNull && col("__p").isNotNull, 1L)
            .otherwise(0L)).as("tp"))
        .withColumn("precision_e6", expr("tp * 1000000 div nullif(n_pred, 0)"))
        .withColumn("recall_e6", expr("tp * 1000000 div nullif(n_truth, 0)"))
        // F1 = 2tp/(|T| + |P|): ONE exact integer division, no p*r float
        .withColumn("f1_e6", expr("2 * tp * 1000000 div nullif(n_truth + n_pred, 0)"))
    }),

    // ---- extension: Neyman-allocated stratified sample — the
    // variance-optimal labeling-budget split (n_h proportional to
    // N_h*S_h), integer largest-remainder seats, md5-rank prefix draw
    "q243_x_neyman_sample" -> gridTuned((s, d) =>
      graft.text.Corpus.neymanSample(
          Tables.documents(s, d), "source", "doc_id", "n_chars", nTotal = 100)
        .orderBy("source", "doc_id")),

    // ---- extension: Gumbel block-maxima tail fit — "the daily order
    // peak exceeded once a year" per priority: method-of-moments over
    // per-day maxima (dollars), 365-block return level; the extreme-
    // value readout beside the mean-shaped profile tier
    "q244_x_gumbel_return" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.gumbelReturnLevel(
          Tables.orders(s, d)
            .withColumn("day", col("o_orderdate").cast("date"))
            .withColumn("dollars", floor(col("o_totalprice") + 0.5)),
          Seq("o_orderpriority"), "day", "dollars",
          returnT = 365, minBlocks = 30)
        .orderBy("o_orderpriority")),

    // ---- extension: STREAMING funnel A/B — q240's standing twin off
    // q215's advance stream (variant derives at readout, no extra
    // state; the shared variantZFromReach readout). Chains at the
    // stream's microsecond grain, so the oracle is q240's shape at
    // epoch_us, not the batch query's seconds
    "q245_x_stream_funnel_ab" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingFunnelAb(s, d,
        Seq("view", "click", "purchase"))),

    // ---- extension: exact trimmed mean per return class — tie-aware
    // rank trim on the value grid (the Olympic-scoring location
    // estimate beside q136's winsorize); whole dollars keep Σv·1e6
    // exact through sf100
    "q246_x_trimmed_mean" -> gridTuned((s, d) =>
      graft.operators.Sketch.trimmedMean(
          Tables.lineitem(s, d).withColumn("price_d",
            floor(col("l_extendedprice") + 0.5)),
          Seq("l_returnflag"), "price_d", trimPermille = 50)
        .orderBy("l_returnflag")),

    // ---- extension: Ljung-Box portmanteau white-noise test — q37's
    // rounded ACF fed into the Q statistic on the decided-on-rounded
    // convention; the residual diagnostic that closes the SARIMAX loop
    "q247_x_ljung_box" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.ljungBox(
          monthlyOrders(s, d).withColumn("tot", round(col("tot"), 2)),
          Nil, "month", "tot", nlags = 6, crit5E4 = 125916L)
        .orderBy("key")),

    // ---- extension: gap-capped funnel — q147's chain with each
    // transition bounded to 24h ("purchase within a day of the
    // click"); the conservative chained-min semantics, replayed exactly
    "q248_x_windowed_funnel" -> gridTuned((s, d) =>
      graft.operators.Funnel.conversionCounts(
          Tables.events(s, d).withColumn("sec", expr("ts_ns div 1000000000")),
          Seq("user_id"), "sec", "event_type",
          Seq("view", "click", "purchase"), maxGap = Some(86400L))
        .orderBy("stage")),

    // ---- extension: seasonal Mann-Kendall — q216 restricted to
    // within-phase pairs (Jan vs Jan), the trend test that does not
    // read the seasonal cycle itself as noise
    "q249_x_seasonal_mk" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.seasonalMannKendall(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long")
              .as("cents")),
          Seq("o_orderpriority"), "month", "cents", period = 12)
        .orderBy("key")),

    // ---- extension: embedding-space drift — per-label cosine between
    // the two parity cohorts' sum vectors (the "has the distribution
    // moved" monitor an index refresh watches); exact integer component
    // sums, DECIMAL cross-products, ONE final double tree
    "q250_x_centroid_drift" -> gridTuned((s, d) =>
      graft.sim.VectorOps.centroidDrift(
          Tables.embeddings(s, d)
            .withColumn("side", pmod(col("vec_id"), lit(2L)).cast("int")),
          Seq("label"), "side", "embedding")
        .orderBy("label")),

    // ---- extension: STREAMING centroid drift — q250's standing twin:
    // the complete-mode state IS the component-sum grid; drained ==
    // batch, one shared readout (driftFromComponentSums) and one oracle
    "q251_x_stream_centroid_drift" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingCentroidDrift(s, d)),

    // ---- extension: funnel experiment MDE — the PLANNING readout
    // beside q240's verdict: the smallest absolute rate difference the
    // current sample sizes can detect at 80% power / two-sided 5%
    // ((z_{0.975} + z_{0.8})·SE with the pooled-rate SE, literals
    // spelled identically in the oracle)
    "q252_x_funnel_mde" -> gridTuned((s, d) =>
      graft.operators.Funnel.funnelVariantZ(
          Tables.events(s, d)
            .withColumn("sec", expr("ts_ns div 1000000000"))
            .withColumn("variant",
              when(pmod(col("user_id"), lit(2L)) === 0, "A").otherwise("B")),
          Seq("user_id"), "variant", "sec", "event_type",
          Seq("view", "click", "purchase"), "A", "B")
        .withColumn("mde_e6", expr(
          """case when n_a > 0 and n_b > 0
            |       and (x_a + x_b) > 0 and (x_a + x_b) < (n_a + n_b) then
            |  cast(floor((1.959963984540054 + 0.8416212335729143)
            |    * sqrt(cast(x_a + x_b as double) / (n_a + n_b)
            |           * (1 - cast(x_a + x_b as double) / (n_a + n_b))
            |           * (cast(1 as double) / n_a + cast(1 as double) / n_b))
            |    * 1000000 + 0.5) as bigint) end""".stripMargin))
        .select(col("stage"), col("stage_name"), col("n_a"), col("n_b"),
          col("mde_e6"))
        .orderBy("stage")),

    // ---- extension: fixed-lag-0 KPSS level-stationarity — the second
    // hash-checked member of the q34 stationarity tier and ADF's polarity
    // mirror (q212 rejects a unit root; this ACCEPTS level-stationarity):
    // exact-integer scaled partial sums N_t = n·P_t − t·Σy over the same
    // monthly-cents series, one double division, e4-quantized
    "q253_u56_kpss_fixed" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.kpssFixedLag(
          Tables.orders(s, d)
            .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("cents")),
          Nil, "month", "cents")),

    // ---- extension: EXACT re-scanning windowed funnel — q248's
    // documented undercount repaired: stage i qualifies within 24h of
    // ANY qualifying stage-(i-1) event (a RANGE-frame existence window),
    // not just the chained earliest; reach here >= q248's per stage
    // (the PropertySpec ordering law)
    "q254_x_rescan_funnel" -> gridTuned((s, d) =>
      graft.operators.Funnel.rescanConversionCounts(
          Tables.events(s, d).withColumn("sec", expr("ts_ns div 1000000000")),
          Seq("user_id"), "sec", "event_type",
          Seq("view", "click", "purchase"), maxGap = Some(86400L))
        .orderBy("stage")),

    // ---- extension: BM25 top-k retrieval — the lexical ranking leg of
    // the training-data toolbox (quality-seed scoring, eval-suite
    // contamination candidates, hybrid retrieval): vocabulary-pruned tf
    // grid, Lucene IDF, per-term e9 quantization so the multi-term score
    // is an order-independent integer sum
    "q255_x_bm25_topk" -> gridTuned((s, d) =>
      graft.text.Retrieval.bm25TopK(
          Tables.documents(s, d), "doc_id", "text",
          Seq(0L -> "hash join table",
              1L -> "stream window batch",
              2L -> "fast scan filter slow"), topK = 10,
          // the corpus-scale bounded-heap ranking (<= topK rows per query
          // cross the shuffle, no sort); spec-pinned row-identical to the
          // window path, so the oracle checks the 100 TB plan
          heap = true)
        .orderBy("query_id", "rank")),

    // ---- extension: normalized mutual information — the label-
    // vocabulary-free agreement score beside q223's kappa (cluster ids
    // vs ground truth never share names); per-term e9 quantization
    // keeps the MI/entropy sums order-independent
    "q256_x_nmi" -> gridTuned((s, d) =>
      graft.operators.Metrics.normalizedMutualInfo(
          Tables.documents(s, d).withColumn("half", pmod(col("doc_id"), lit(2L))),
          Seq("half"), "lang", "source")
        .orderBy("half")),

    // ---- extension: ROUGE-N — clipped bigram overlap between
    // candidate/reference pairs (even doc vs its successor), the
    // summarization-eval readout; exact integer overlap/totals, three
    // e6-quantized divisions
    "q257_x_rouge_n" -> rowTuned((s, d) => {
      val docs = Tables.documents(s, d)
      graft.text.Retrieval.rougeN(
          docs, "doc_id", "text",
          docs.filter(pmod(col("doc_id"), lit(2L)) === 0)
            .select(col("doc_id").as("cand_id"),
              (col("doc_id") + 1).as("ref_id")),
          n = 2)
        .orderBy("cand_id")
    }),

    // ---- extension: Jensen-Shannon vocabulary divergence — the
    // bounded symmetric drift monitor beside q153's KL (English vs
    // non-English token distributions); mixture ratio rides as the
    // exact integer form 2*ca*nb/(ca*nb + cb*na), per-token e9 terms
    "q258_x_vocab_jsd" -> gridTuned((s, d) =>
      graft.text.TextAnalysis.vocabJsd(
          Tables.documents(s, d)
            .withColumn("side", when(col("lang") === "en", 0).otherwise(1)),
          "side", "text")),

    // ---- extension: MULTIPLICATIVE seasonal decomposition — the
    // ratio-to-moving-average classical method (q177 is the additive
    // twin; this one is right when seasonal amplitude scales with the
    // level): per-segment monthly revenue, mean-one seasonal indices,
    // x/(T·S) residual; e9-quantized ratios, exact integer phase means
    "q259_x_seasonal_decompose_mul" -> gridTuned((s, d) => {
      val m = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
          Cols.monthStart(col("o_orderdate")).as("month"))
        .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")).as("cents"))
      graft.operators.Features.seasonalDecomposeMul(m, Seq("seg"), "month", "cents")
        .select(col("seg"), col("month"), col("cents"), col("trend_e6"),
          col("seasonal_e6"), col("resid_e6"))
        .orderBy("seg", "month")
    }),

    // ---- extension: time-sliced sessionization — q110's semantics with
    // the hot-key dial engaged (the round-8 probe's mitigation, shipped):
    // per-(key, day-slice) local sessionization, micro-session re-merge,
    // global index joined back on the composite key; shares q110's oracle
    // because the rows are contractually identical
    "q260_x_sessions_timesliced" -> rowTuned((s, d) =>
      graft.operators.Sessionize.sessionStatsTimeSliced(
          Tables.events(s, d).select("user_id", "event_id", "ts"),
          "user_id", "ts", "event_id", gapMinutes = 720, sliceMinutes = 1440)
        .orderBy("user_id", "session_idx")),

    // ---- extension: aggregate-path funnel — q147's chained-min reach
    // computed as map-side-combinable conditional minima instead of a
    // per-key window (the funnel half of the round-8 hot-key dial);
    // shares q147's oracle, rows contractually identical
    "q261_x_funnel_agg" -> gridTuned((s, d) =>
      graft.operators.Funnel.conversionCountsAgg(
          Tables.events(s, d).withColumn("tsu", expr("ts_ns div 1000")),
          Seq("user_id"), "tsu", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("stage")),

    // ---- extension: Fleiss' kappa — q223's chance-corrected agreement
    // generalized to many ratings per item (items = users, ratings =
    // their events, categories = event types: "are a user's events
    // type-consistent beyond chance"), variable-n form
    "q262_x_fleiss_kappa" -> gridTuned((s, d) =>
      graft.operators.Metrics.fleissKappa(
          Tables.events(s, d)
            .withColumn("cohort", pmod(col("user_id"), lit(2L))),
          Seq("cohort"), "user_id", "event_type")
        .orderBy("cohort")),

    // ---- extension: exact sign test — distribution-free "up more often
    // than chance" per (segment, priority) revenue series; the binomial
    // tails are exact BigInt sums, quantized with pure integer
    // arithmetic, so the recursive-CTE oracle is bit-identical
    "q263_x_sign_test" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.signTest(
          monthlySegPrio(s, d),
          Seq("c_mktsegment", "o_orderpriority"), "month", "cents")
        .orderBy("c_mktsegment", "o_orderpriority")),

    // ---- extension: Benjamini-Hochberg step-up FDR over the q263
    // family — 25 hypotheses, integer threshold test, deterministic
    // tie-break; the guard every per-key test needs before anyone acts
    // on the smallest of 25 p-values
    "q264_x_bh_fdr" -> gridTuned((s, d) =>
      graft.operators.Metrics.bhCorrect(
          graft.stats.Diagnostics.signTest(
            monthlySegPrio(s, d),
            Seq("c_mktsegment", "o_orderpriority"), "month", "cents"),
          "p_e9", qPermille = 50,
          tieCols = Seq("c_mktsegment", "o_orderpriority"))
        .orderBy("rank")),

    // ---- extension: Holt-Winters additive triple smoothing — the
    // seasonal tier above q141's Holt: integer-cents init sums are
    // order-free, the recursion is a fixed IEEE sequence with exact
    // binary constants, and the oracle's recursive CTE carries the 12
    // seasonals as an ordered list — bit-for-bit replay
    "q265_x_holt_winters" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.holtWintersForecast(
          Tables.orders(s, d)
            .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long")
              .as("cents")),
          Nil, "month", "cents", period = 12, alpha = 0.5, beta = 0.25,
          gamma = 0.25, horizon = 12)
        .select(col("key"), col("n_obs"), round(col("level"), 4).as("level"),
          round(col("trend"), 4).as("trend"), col("step"), col("forecast"))
        .orderBy("step")),

    // ---- extension: streaming NMI twin — the complete-mode state IS
    // q256's cell grid; drained == batch, one shared readout and oracle
    "q266_x_stream_nmi" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingNmi(s, d)),

    // ---- extension: streaming vocabulary-JSD twin — state is the
    // per-token side-count grid (vocabulary-sized); shares q258's oracle
    "q267_x_stream_vocab_jsd" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingVocabJsd(s, d)),

    // ---- extension: Mann-Whitney U z-test — the nonparametric
    // two-sample location verdict completing q222 (Welch, parametric)
    // and q195 (KS, distributional); exact integer midranks, DECIMAL
    // tie term, one fixed z tree
    "q268_x_mann_whitney" -> gridTuned((s, d) =>
      graft.operators.Metrics.mannWhitney(
          Tables.events(s, d)
            .withColumn("variant",
              when(pmod(col("user_id"), lit(2L)) === 0, "A").otherwise("B"))
            .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
          Seq("event_type"), "variant", "cents", "A", "B")
        .orderBy("event_type")),

    // ---- extension: one-way ANOVA F + eta-squared — does order
    // priority explain order value per market segment; exact integer
    // group sums, floor-quantized sum-of-squares convention, one fixed
    // F tree
    "q269_x_anova" -> gridTuned((s, d) =>
      graft.operators.Metrics.anovaOneWay(
          Tables.orders(s, d)
            .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
            // DOLLAR quantization: the cents framing crossed the
            // operator's 2^63 S^2/n guard at sf0.1 (caught by the bench,
            // round 9); dollars keep every sufficient sum exact to ~sf500
            .withColumn("dollars", floor(col("o_totalprice") + 0.5).cast("long")),
          Seq("c_mktsegment"), "o_orderpriority", "dollars")
        .orderBy("c_mktsegment")),

    // ---- extension: Kruskal-Wallis H — q269's question answered by
    // ranks (no normality assumption); midranks on the value-count
    // grid, tie-corrected, chi2(4) 5% critical
    "q270_x_kruskal_wallis" -> gridTuned((s, d) =>
      graft.operators.Metrics.kruskalWallis(
          Tables.orders(s, d)
            .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
            .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long")),
          Seq("c_mktsegment"), "o_orderpriority", "cents")
        .orderBy("c_mktsegment")),

    // ---- extension: Brown-Forsythe — do the priorities even share a
    // variance (the assumption q269 quietly makes); ANOVA on exact
    // absolute deviations from each group's lower median
    "q271_x_brown_forsythe" -> gridTuned((s, d) =>
      graft.operators.Metrics.brownForsythe(
          Tables.orders(s, d)
            .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
            // dollar quantization — the q269 scale-ceiling fix
            .withColumn("dollars", floor(col("o_totalprice") + 0.5).cast("long")),
          Seq("c_mktsegment"), "o_orderpriority", "dollars")
        .orderBy("c_mktsegment")),

    // ---- extension: Flesch readability — the classic reading-ease
    // quality signal with a deterministic vowel-group syllable proxy;
    // pure codegen regexps, one fixed score tree
    "q272_x_readability" -> rowTuned((s, d) =>
      graft.text.TextAnalysis.readability(
          Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // ---- extension: McNemar paired test — do the char-length and
    // token-length quality filters disagree SYMMETRICALLY per source
    // (kappa says how often they agree; this says whether the
    // disagreements lean one way)
    "q273_x_mcnemar" -> gridTuned((s, d) =>
      graft.operators.Metrics.mcnemar(
          Tables.documents(s, d)
            .withColumn("a", col("n_chars") > 500)
            .withColumn("b", graft.text.TextAnalysis.tokenCount(col("text")) > 90),
          Seq("source"), "a", "b")
        .orderBy("source")),

    // ---- extension: Cochran-Armitage trend — does per-user purchase
    // conversion rise monotonically across ordered user tiers; exact
    // sufficient sums, one z tree
    "q274_x_cochran_armitage" -> gridTuned((s, d) =>
      graft.operators.Metrics.cochranArmitage(
          Tables.events(s, d)
            .filter(col("user_id").isNotNull)
            .groupBy(col("user_id"))
            .agg((max(when(col("event_type") === "purchase", 1).otherwise(0)) === 1)
              .as("converted"))
            .withColumn("dose", pmod(col("user_id"), lit(4L)))
            .withColumn("panel", pmod(expr("user_id div 4"), lit(2L))),
          Seq("panel"), "dose", "converted")
        .orderBy("panel")),

    // ---- extension: Poisson-bootstrap CI — distribution-free interval
    // for the mean order value per segment; counter-based integer
    // multiplicities, exact replicate means, exact-rank percentile
    // bounds — the whole resampling replays bit-for-bit
    "q275_x_bootstrap_ci" -> gridTuned((s, d) =>
      graft.operators.MonteCarlo.poissonBootstrapCi(
          Tables.orders(s, d)
            .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
            .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long")),
          Seq("c_mktsegment"), "o_orderkey", "cents",
          replicates = 200, alphaPermille = 50)
        .orderBy("c_mktsegment")),

    // ---- extension: fixed-64-point periodogram — the hash-checked
    // graduation of q34's U6 seasonal-period half: the e15-quantized
    // cos/sin table is generated ONCE driver-side and inlined into both
    // engines, so no trig executes at query time anywhere; exact DECIMAL
    // DFT sums, share-of-peak readout, dominant-period flag
    "q276_u6_periodogram_fixed" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.periodogramFixed(
          monthlyPriority(s, d), Seq("prio"), "month", "cents", n = 64)
        .orderBy("prio", "k"))
  ) ++ Map[String, (SparkSession, String) => DataFrame](

    // ---- extension: Fisher exact test — the rare-margin contingency
    // member (is the top-value tail independent of the user-hash split,
    // per event type); no UDF, no recursion: the hypergeometric support
    // is a k-grid with log-likelihood steps e15-quantized to integers,
    // exact DECIMAL cumsum, one exp per row, integer-ratio p
    "q277_x_fisher_exact" -> gridTuned((s, d) =>
      graft.operators.Metrics.fisherExact(
          Tables.events(s, d)
            .withColumn("even_user", pmod(col("user_id"), lit(2L)) === 0)
            .withColumn("top_value", col("value") >= 99.0),
          Seq("event_type"), "even_user", "top_value", maxRange = 1000000)
        .orderBy("event_type")),

    // ---- extension: Jarque-Bera normality screen — are segment order
    // values even roughly normal (the assumption q269/q222 quietly
    // make); two-pass integer-mean shift kills the cancellation, exact
    // DECIMAL central power sums, one fixed tree per readout
    "q278_x_jarque_bera" -> gridTuned((s, d) =>
      graft.operators.Metrics.jarqueBera(
          Tables.orders(s, d)
            .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
            .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long")),
          Seq("c_mktsegment"), "cents")
        .orderBy("c_mktsegment")),

    // ---- extension: log-rank test — does the A/B user-hash split churn
    // differently per cohort (the time-to-event A/B readout q240's
    // conversion z can't give: censoring-aware); suffix-sum at-risk
    // counts, e9-quantized E/V terms, one chi2 tree
    "q279_x_log_rank" -> gridTuned((s, d) => {
      val per = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(min(expr("ts_ns div 1000")).as("first_us"),
          max(expr("ts_ns div 1000")).as("last_us"))
      val gmax = per.agg(max(col("last_us")).as("gmax"))
      val subj = per.crossJoin(broadcast(gmax)).select(
        concat(lit("c"), pmod(col("user_id"), lit(3L)).cast("string")).as("cohort"),
        when(pmod(col("user_id"), lit(2L)) === 0, "A").otherwise("B").as("variant"),
        expr("(last_us - first_us) div 86400000000").as("dur_days"),
        (col("last_us") < col("gmax") - lit(1209600000000L)).as("churned"))
      graft.operators.Survival.logRank(subj, Seq("cohort"), "variant",
          "dur_days", "churned", "A", "B")
        .orderBy("cohort")
    }),

    // ---- extension: vocabulary richness — Chao1 + Good-Turing unseen
    // mass per source ("is this slice's vocabulary saturated or still
    // growing" — the collection-planning dial beside q191's Zipf shape);
    // exact integer frequency-of-frequencies, one fixed Chao1 tree
    "q280_x_vocab_richness" -> gridTuned((s, d) =>
      graft.text.TextAnalysis.vocabRichness(
          Tables.documents(s, d), "source", "text")
        .orderBy("source")),

    // ---- extension: Cramér-von Mises — q268's two-sample question by
    // INTEGRATED squared ECDF gap (many small persistent differences,
    // where KS reads only the single largest); exact cross-multiplied
    // integer numerator, one double division
    "q281_x_cramer_von_mises" -> gridTuned((s, d) =>
      graft.operators.Metrics.cramerVonMises(
          Tables.events(s, d)
            .withColumn("variant",
              when(pmod(col("user_id"), lit(2L)) === 0, "A").otherwise("B"))
            .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
          Seq("event_type"), "variant", "cents", "A", "B")
        .orderBy("event_type")),

    // ---- extension: decision stump — which document feature separates
    // English from non-English per source, and where's the cut (feature
    // screening / one boosting round); melted features, exact DECIMAL
    // Gini-score argmax, one fixed gain tree
    "q282_x_best_split" -> gridTuned((s, d) =>
      graft.operators.Regression.bestSplit(
          Tables.documents(s, d)
            .filter(col("text").isNotNull)
            .withColumn("is_en", col("lang") === "en")
            .select(col("source"), col("is_en"),
              expr("stack(2, 'chars_c', n_chars div 100, 'toks_d', " +
                "size(split(trim(text), '\\\\s+')) div 10) as (feat, v)")),
          Seq("source"), "feat", "v", "is_en")
        .orderBy("source", "feat")),

    // ---- extension: Newey-West HAC standard error — how overconfident
    // is the iid CI on autocorrelated monthly revenue, per priority;
    // two-pass integer-mean shift, L+1 lags on ONE window, exact
    // DECIMAL cross-sums, Bartlett-weighted lrv as one fixed tree
    "q283_x_newey_west" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.neweyWestSe(
          monthlyPriority(s, d), Seq("prio"), "month", "cents", maxLag = 4)
        .orderBy("prio")),

    // ---- extension: effect size — Cohen's d + Hedges g beside q222's
    // Welch significance (magnitude, not just p); the same six exact
    // sufficient sums, one fixed tree per readout, labeled verdict on
    // the rounded |d|
    "q284_x_effect_size" -> gridTuned((s, d) =>
      graft.operators.Metrics.effectSize(
          Tables.orders(s, d)
            .withColumn("dollars",
              expr("cast(round(o_totalprice) as bigint)")),
          Seq("o_orderstatus"), "o_orderpriority", "dollars",
          "1-URGENT", "5-LOW")
        .orderBy("o_orderstatus")),

    // ---- extension: streaming Cramér-von Mises — q281's standing twin:
    // complete-mode state IS the (key, value) side-count grid, readout
    // via the SHARED cvmFromGrid, drained == batch, one oracle
    "q285_x_stream_cvm" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingCvm(s, d)),

    // ---- extension: RFM segmentation — the classic customer grid with
    // exact quantile-fence scores (no global row window: fences come off
    // value-count grids, the weightedPercentiles convention) and the
    // conventional segment labels; monetary binned to dollars for the
    // fence grid, sums stay exact cents
    "q286_x_rfm_segments" -> gridTuned((s, d) =>
      graft.operators.Funnel.rfmSegments(
          Tables.events(s, d)
            .withColumn("us", expr("ts_ns div 1000"))
            .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
          "user_id", "us", "cents", buckets = 5, monetaryBin = 100L)
        .orderBy("r_score", "f_score", "m_score")),

    // ---- extension: Wilson score interval — honest conversion-rate CI
    // per event type (Wald collapses at rare events; this is q240's
    // per-cell uncertainty); exact integer (n, x), one fixed tree per
    // bound
    "q287_x_wilson_ci" -> gridTuned((s, d) =>
      graft.operators.Metrics.wilsonCi(
          Tables.events(s, d)
            .withColumn("converted", col("value") >= 95.0),
          Seq("event_type"), "converted")
        .orderBy("event_type")),

    // ---- extension: seasonal/trend strength — WHICH priorities'
    // revenue series are strongly seasonal vs trending (the Hyndman
    // feature screen over q177's decomposition); exact n*Sum(v^2) -
    // Sum(v)^2 variance forms over the already-quantized components
    "q288_x_seasonal_strength" -> gridTuned((s, d) =>
      graft.operators.Features.seasonalStrength(
          monthlyPriority(s, d), Seq("prio"), "month", "cents", period = 12)
        .orderBy("prio")),

    // ---- extension: median CI — distribution-free order-statistic
    // bounds per return flag (the robust companion of q275's bootstrap
    // mean CI at none of its replicate cost); exact cumulative-count
    // fences on whole-dollar prices
    "q289_x_median_ci" -> gridTuned((s, d) =>
      graft.operators.Sketch.medianCi(
          Tables.lineitem(s, d).withColumn("price_d",
            floor(col("l_extendedprice") + 0.5)),
          Seq("l_returnflag"), "price_d")
        .orderBy("l_returnflag")),

    // ---- extension: streaming decision stump — q282's standing twin:
    // complete-mode state IS the (source, feature, value) class-count
    // grid, readout via the SHARED bestSplitFromGrid, drained == batch
    "q290_x_stream_best_split" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingBestSplit(s, d)),

    // ---- extension: differential vocabulary — Monroe log-odds z-scores
    // of what distinguishes English from non-English text (per-TERM
    // where q258's JSD is one scalar); deterministic quantized top-k via
    // TakeOrdered, never a global sort
    "q291_x_log_odds_terms" -> gridTuned((s, d) =>
      graft.text.TextAnalysis.logOddsTerms(
          Tables.documents(s, d)
            .withColumn("side", when(col("lang") === "en", 0).otherwise(1)),
          "side", "text", topK = 25)
        .orderBy("direction", "rank")),

    // ---- extension: Wald SPRT — the peeking-safe sequential A/B verdict
    // per event type ("is the high-value rate 0.5 or 0.55, stop when the
    // evidence says"); e12-inlined log constants (no query-time
    // transcendentals), exact DECIMAL LLR walk, integer first-crossing
    "q292_x_sprt" -> gridTuned((s, d) =>
      graft.operators.Metrics.sprtBernoulli(
          Tables.events(s, d)
            .withColumn("hit", col("value") >= 50.0),
          Seq("event_type"), "ts_ns", "hit",
          p0 = 0.5, p1 = 0.55, alphaPermille = 50, betaPermille = 100,
          tieCols = Seq("event_id"))
        .orderBy("event_type")),

    // ---- extension: streaming Wald SPRT — q292's standing twin: O(1)
    // per-key (successes, trials, decision, n_at_decision) state, the
    // decision FREEZES at the first crossing (the sequential-test
    // contract); same inlined e12 constants, drained == batch on the
    // time-ordered landing convention, one oracle
    "q293_x_stream_sprt" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingSprt(s, d,
        p0 = 0.5, p1 = 0.55, alphaPermille = 50, betaPermille = 100)),

    // ---- extension: index of dispersion — are per-user event counts
    // Poisson or bursty, per event type (decides whether rate CIs can
    // use the Poisson shortcut); exact integer n*Sq - S^2 numerator,
    // chi2 verdict on the rounded value
    "q294_x_dispersion" -> gridTuned((s, d) =>
      graft.operators.Metrics.dispersionIndex(
          Tables.events(s, d)
            .filter(col("user_id").isNotNull && col("event_type").isNotNull)
            .groupBy(col("event_type"), col("user_id"))
            .agg(count(lit(1)).as("n_ev")),
          Seq("event_type"), "n_ev")
        .orderBy("event_type")),

    // ---- extension: Cochran's Q — do the three document filters
    // (length, token-count, english) pass different fractions of the
    // same items, per source (q273's McNemar generalized to k); one
    // exact-integer aggregate, k*SumC^2 - T^2 identity
    "q295_x_cochran_q" -> gridTuned((s, d) =>
      graft.operators.Metrics.cochranQ(
          Tables.documents(s, d)
            .filter(col("text").isNotNull)
            .withColumn("f_len", col("n_chars") > 500)
            .withColumn("f_tok",
              graft.text.TextAnalysis.tokenCount(col("text")) > 90)
            .withColumn("f_en", col("lang") === "en"),
          Seq("source"), Seq("f_len", "f_tok", "f_en"))
        .orderBy("source")),

    // ---- extension: runs test — is the above-median mark randomly
    // ORDERED in time per event type (clumping/alternation, the
    // sequence axis MK/Ljung-Box don't cover); exact integer run
    // counts off one lag window, one z tree
    "q296_x_runs_test" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.runsTest(
          Tables.events(s, d)
            .withColumn("hi", col("value") >= 50.0),
          Seq("event_type"), "ts_ns", "hi", tieCols = Seq("event_id"))
        .orderBy("event_type")),

    // ---- extension: chi-square independence — is language independent
    // of document length band, per source (the significance complement
    // of q256's NMI); exact (N*O - R*C)^2/(N*R*C) cell terms over the
    // FULL r x c grid (zero cells contribute), driver-inlined chi2
    // critical table
    "q297_x_chi_square" -> gridTuned((s, d) =>
      graft.operators.Metrics.chiSquareIndependence(
          Tables.documents(s, d)
            .filter(col("n_chars").isNotNull)
            .withColumn("len_band", least(expr("n_chars div 400"), lit(4L))),
          Seq("source"), "lang", "len_band")
        .orderBy("source")),

    // ---- extension: streaming chi-square twin — q297's standing
    // association monitor: complete-mode state IS the contingency-cell
    // grid, readout via the SHARED chiSqFromCells; drained == batch,
    // one oracle
    "q298_x_stream_chi_square" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingChiSquare(s, d)),

    // ---- extension: Durbin-Watson — after detrending monthly mean
    // order prices, do consecutive residuals still lean on each other
    // (lag-1 serial correlation of FITTED residuals — the axis q247
    // Ljung-Box reads on the raw series); exact scaled-integer
    // residuals, the n*D denominator cancels in the ratio
    "q299_x_durbin_watson" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.durbinWatson(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(expr(
                "sum(cast(floor(o_totalprice * 100 + 0.5) as bigint)) div count(1)")
              .as("cents")),
          Seq("o_orderpriority"), "month", "cents")
        .orderBy("o_orderpriority")),

    // ---- extension: Kendall tau-b — do busier months carry pricier
    // orders, per priority (concordance rank correlation with the
    // exact tie-corrected variance; q230's Spearman reads rank-linear
    // association, tau weighs every discordant PAIR); exact integer
    // S and tie sums, fixed double tau/z trees
    "q300_x_kendall_tau" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.kendallTau(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(count(lit(1)).as("n_orders"),
              expr(
                "sum(cast(floor(o_totalprice * 100 + 0.5) as bigint)) div count(1)")
                .as("cents")),
          Seq("o_orderpriority"), "n_orders", "cents")
        .orderBy("key")),

    // ---- extension: EMD + Hellinger histogram drift — how FAR did the
    // A/B value distributions move (transport cost, value units) and
    // how much do they still overlap (bounded geometric), per event
    // type: the two axes KS/CvM/PSI don't read; exact cross-multiplied
    // CDF integral, per-cell e9 Bhattacharyya terms
    "q301_x_hist_drift" -> gridTuned((s, d) =>
      graft.operators.Metrics.histogramDrift(
          Tables.events(s, d)
            .withColumn("variant",
              when(pmod(col("user_id"), lit(2L)) === 0, "A").otherwise("B"))
            .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
          Seq("event_type"), "variant", "cents", "A", "B")
        .orderBy("event_type")),

    // ---- extension: streaming EMD/Hellinger twin — q301's standing
    // distance monitor: complete-mode state IS the value-grid side
    // counts, readout via the SHARED histDriftFromGrid; drained ==
    // batch, one oracle
    "q302_x_stream_hist_drift" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingHistDrift(s, d)),

    // ---- extension: ranking eval — nDCG@10 + MRR@10 of a length-score
    // ranking against graded language relevance, per source (closes the
    // retrieval loop: q255 ranks, this scores the ranking); inlined
    // e12 discount table, exact integer DCG/IDCG sums, thinned
    // candidate lists (doc_id % 37) per the bounded-list contract
    "q303_x_ndcg_mrr" -> gridTuned((s, d) =>
      graft.text.Retrieval.rankingMetrics(
          Tables.documents(s, d)
            .filter(pmod(col("doc_id"), lit(37L)) === 0 &&
              col("n_chars").isNotNull)
            .withColumn("rel",
              when(col("lang") === "en", 2L)
                .when(col("lang").isin("de", "fr"), 1L)
                .otherwise(0L)),
          Seq("source"), "doc_id", "n_chars", "rel")
        .orderBy("source")),

    // ---- extension: Krippendorff alpha — do three length/token
    // annotators agree beyond chance when one of them only labels every
    // third document (MISSING ratings — the case Cohen/Fleiss can't
    // read honestly); per-item (m-1)-normalized coincidence pairs,
    // finite-sample (n-1) chance correction
    "q304_x_krippendorff" -> gridTuned((s, d) =>
      graft.operators.Metrics.krippendorffAlpha(
          Tables.documents(s, d)
            .filter(col("n_chars").isNotNull)
            .withColumn("v1",
              when(col("n_chars") > 500, "long").otherwise("short"))
            .withColumn("v2", when(col("text").isNotNull,
              when(graft.text.TextAnalysis.tokenCount(col("text")) > 90,
                "long").otherwise("short")))
            .withColumn("v3", when(pmod(col("doc_id"), lit(3L)) === 0,
              when(col("n_chars") > 480, "long").otherwise("short")))
            .select(col("source"), col("doc_id"),
              expr("stack(3, v1, v2, v3) as lab")),
          Seq("source"), "doc_id", "lab")
        .orderBy("source")),

    // ---- extension: Pettitt test — WHERE did the daily value level
    // shift, per event type, with a chance-calibrated verdict (the
    // rank-based complement of q228's SSE-argmin changepoint, which
    // locates but cannot calibrate); exact integer U walk, one
    // clamped p tree
    "q305_x_pettitt" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.pettitt(
          Tables.events(s, d)
            .filter(col("value").isNotNull)
            .groupBy(col("event_type"), to_date(col("ts")).as("day"))
            .agg(expr(
                "sum(cast(floor(value * 100 + 0.5) as bigint)) div count(1)")
              .as("cents")),
          Seq("event_type"), "day", "cents")
        .orderBy("key")),

    // ---- extension: Granger causality — does last month's order
    // VOLUME improve the prediction of this month's price level beyond
    // the level's own past, per priority (lead/lag direction q300's
    // contemporaneous tau can't read); nested Cramer OLS over exact
    // DECIMAL sums, F on the RSS drop, asymptotic chi2(1) verdict
    "q306_x_granger" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.grangerCausality(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(count(lit(1)).as("n_orders"),
              expr(
                "sum(cast(floor(o_totalprice * 100 + 0.5) as bigint)) div count(1)")
                .as("cents")),
          Seq("o_orderpriority"), "month", "n_orders", "cents")
        .orderBy("o_orderpriority")),

    // ---- extension: cross-correlation function — WHERE does the
    // volume/price lead-lag relationship peak, per priority (the lag
    // profile q306's single-lag Granger F can't show); exact DECIMAL
    // sums per (key, lag) off one range self-join, one r tree per lag
    "q307_x_cross_correlation" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.crossCorrelation(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(count(lit(1)).as("n_orders"),
              expr(
                "sum(cast(floor(o_totalprice * 100 + 0.5) as bigint)) div count(1)")
                .as("cents")),
          Seq("o_orderpriority"), "month", "n_orders", "cents")
        .orderBy("o_orderpriority", "lag")),

    // ---- extension: Mood's median test — do line statuses share a
    // price MEDIAN per return class (the outlier-proof k-group location
    // screen beside q270's rank-mean Kruskal-Wallis); exact value-grid
    // median fence, (status x side) contingency through the SHARED
    // chiSqFromCells identity
    "q308_x_mood_median" -> gridTuned((s, d) =>
      graft.operators.Metrics.moodMedianTest(
          Tables.lineitem(s, d)
            // DOLLAR quantization: cents make the median value grid
            // row-sized (~500k distinct at sf0.1); dollars shrink the
            // fence windows 100x at no cost to the median question
            .withColumn("dollars",
              expr("cast(floor(l_extendedprice + 0.5) as bigint)")),
          Seq("l_returnflag"), "l_linestatus", "dollars")
        .orderBy("l_returnflag")),

    // ---- extension: partial correlation — is the quantity-price
    // correlation real or do both just ride the discount, per return
    // class (the controlled readout q226's raw corr panel can't give).
    // DOLLAR framing + the guarded longSums fast path (round-10 probe:
    // 12.8x over DECIMAL cents at the 10x corpus; the n*max|v|^2 fence
    // holds to ~7.6e8 rows per key and RAISES past it)
    "q309_x_partial_corr" -> gridTuned((s, d) =>
      graft.operators.Profile.partialCorrelation(
          Tables.lineitem(s, d)
            .withColumn("qty", expr("cast(floor(l_quantity + 0.5) as bigint)"))
            .withColumn("dollars",
              expr("cast(floor(l_extendedprice + 0.5) as bigint)"))
            .withColumn("disc_pm",
              expr("cast(floor(l_discount * 1000 + 0.5) as bigint)")),
          Seq("l_returnflag"), "qty", "dollars", "disc_pm",
          longSums = true)
        .orderBy("l_returnflag")),

    // ---- extension: Engle-Granger cointegration — do monthly order
    // volume and revenue share a long-run equilibrium per priority
    // (each can wander; the SPREAD must not): OLS hedge ratio, then
    // the q212 ADF machinery on the quantized residuals against the
    // EG -3.34 critical
    "q310_x_engle_granger" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.engleGranger(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(count(lit(1)).as("n_orders"),
              expr("sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))")
                .as("cents")),
          Seq("o_orderpriority"), "month", "n_orders", "cents")
        .orderBy("o_orderpriority")),

    // ---- extension: Cronbach's alpha — do the three document-length
    // measurements (char-band, token-band, trimmed-length-band) form a
    // reliable composite scale per source (the numeric-scale
    // reliability complement of the kappa/alpha agreement family);
    // exact DECIMAL item/total variances, one signed alpha tree
    "q311_x_cronbach" -> gridTuned((s, d) =>
      graft.operators.Metrics.cronbachAlpha(
          Tables.documents(s, d)
            .filter(col("n_chars").isNotNull && col("text").isNotNull)
            .withColumn("i1", expr("n_chars div 100"))
            .withColumn("__tok",
              graft.text.TextAnalysis.tokenCount(col("text")).cast("long"))
            .withColumn("i2", expr("__tok div 10"))
            .withColumn("i3", expr("length(trim(text)) div 100")),
          Seq("source"), Seq("i1", "i2", "i3"))
        .orderBy("source")),

    // ---- extension: empirical-Bayes shrinkage — per-user purchase
    // rates pulled toward a beta prior fitted per cohort (a 1/1 user
    // must not outrank a 97/100 one — the honest rate ranking q287's
    // Wilson bound solves one-sided, solved point-wise); e9-quantized
    // rates, exact DECIMAL moment sums, fixed alpha/beta/shrunk trees
    "q312_x_eb_shrinkage" -> rowTuned((s, d) =>
      graft.operators.Metrics.ebShrinkRates(
          Tables.events(s, d)
            .filter(col("user_id").isNotNull && col("event_type").isNotNull)
            .groupBy(pmod(col("user_id"), lit(2L)).as("cohort"),
              col("user_id"))
            .agg(count(lit(1)).as("n_ev"),
              sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                .as("n_buy")),
          Seq("cohort"), "user_id", "n_buy", "n_ev")
        .orderBy("cohort", "entity")),

    // ---- extension: post-hoc pairwise Welch + BH — WHICH priority
    // pairs differ in mean order value per segment, with the 50
    // comparisons controlled as ONE FDR family (the step after q269's
    // ANOVA says "something differs"); welch trees verbatim, A&S
    // normal-tail p, q264's BH machinery
    "q313_x_pairwise_welch" -> gridTuned((s, d) =>
      graft.operators.Metrics.pairwiseWelch(
          Tables.orders(s, d)
            .join(Tables.customer(s, d),
              col("o_custkey") === col("c_custkey"))
            .withColumn("cents",
              expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")),
          Seq("c_mktsegment"), "o_orderpriority", "cents")
        .orderBy("rank")),

    // ---- extension: Friedman test — do the five priorities rank
    // consistently across MONTHS within each segment (blocked ranks:
    // every month is its own control, the repeated-measures axis q270's
    // pooled Kruskal-Wallis can't read); exact 2x midranks, Conover
    // tie-corrected T, the shared chi2 critical table
    "q314_x_friedman" -> gridTuned((s, d) =>
      graft.operators.Metrics.friedmanTest(
          monthlySegPrio(s, d),
          Seq("c_mktsegment"), "month", "o_orderpriority", "cents")
        .orderBy("c_mktsegment")),

    // ---- extension: Bland-Altman — do byte length and 6x token count
    // AGREE as document-size measurements per source (bias + limits of
    // agreement + share inside: the method-comparison readout a 0.99
    // correlation can't give); exact difference sums, two-pass within
    // count against the raw double limits
    "q315_x_bland_altman" -> gridTuned((s, d) =>
      graft.operators.Metrics.blandAltman(
          Tables.documents(s, d)
            .filter(col("n_chars").isNotNull && col("text").isNotNull)
            .withColumn("tok6",
              graft.text.TextAnalysis.tokenCount(col("text")).cast("long")
                * 6L),
          Seq("source"), "n_chars", "tok6")
        .orderBy("source")),

    // ---- extension: confusion point metrics — does the cheap byte
    // cut (n_chars > 500) recover the token cut (> 90), per source:
    // precision/recall/F1/accuracy and the imbalance-honest MCC at the
    // deployed threshold (q188's AUC ranks scores; this scores the cut)
    "q316_x_confusion_mcc" -> gridTuned((s, d) =>
      graft.operators.Metrics.confusionMetrics(
          Tables.documents(s, d)
            .filter(col("n_chars").isNotNull && col("text").isNotNull)
            .withColumn("pred", col("n_chars") > 500)
            .withColumn("y",
              graft.text.TextAnalysis.tokenCount(col("text")) > 90),
          Seq("source"), "pred", "y")
        .orderBy("source")),

    // ---- extension: Page-Hinkley drift test — has the event value
    // level drifted UPWARD, and when did we first know (self-centering
    // sequential detector: q305's Pettitt locates in hindsight, q167's
    // CUSUM needs a baseline; PH needs neither and its state is O(1));
    // per-row e9 terms over exact prefixes, integer first-crossing
    "q317_x_page_hinkley" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.pageHinkley(
          Tables.events(s, d)
            .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
            .withColumn("ord", struct(col("ts_ns"), col("event_id"))),
          Seq("event_type"), "ord", "cents")
        .orderBy("event_type")),

    // ---- extension: streaming Page-Hinkley twin — q317's standing
    // monitor: O(1) per-key (n, sum, m, min m, max PH, frozen alarm)
    // state replaying the IDENTICAL per-row tree; drained == batch on
    // the time-ordered landing convention, one oracle
    "q318_x_stream_page_hinkley" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingPageHinkley(s, d)),

    // ---- extension: top-k stability — is the per-type user
    // leaderboard churning between the month's halves (Jaccard of the
    // top-10 sets + mean rank displacement: the WHO-is-on-top monitor
    // PSI/KS distribution drift can't see); exact integer totals,
    // deterministic tie-break, pure integer readouts
    "q319_x_topk_stability" -> gridTuned((s, d) =>
      graft.operators.Metrics.topkStability(
          Tables.events(s, d)
            .withColumn("half",
              when(dayofmonth(col("ts")) < 16, "H1").otherwise("H2"))
            .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
          Seq("event_type"), "half", "user_id", "cents", "H1", "H2")
        .orderBy("event_type")),

    // ---- extension: ordinal association — gamma + both Somers' D over
    // COARSE monthly volume/price bands per priority (gamma ignores the
    // heavy banding ties, D_yx charges them to the dependent side —
    // the directional questions q300's symmetric tau-b can't answer)
    "q320_x_ordinal_assoc" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.ordinalAssociation(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(count(lit(1)).as("n_orders"),
              expr(
                "sum(cast(floor(o_totalprice * 100 + 0.5) as bigint)) div count(1)")
                .as("cents"))
            .withColumn("vol_band", expr("n_orders div 10"))
            .withColumn("price_band", expr("cents div 200000")),
          Seq("o_orderpriority"), "vol_band", "price_band")
        .orderBy("key")),

    // ---- extension: Heaps'-law vocabulary growth — the corpus-health
    // curve V(N) ~ K*N^beta per source (beta toward 1 = importing junk
    // novelty, toward 0 = re-crawling known text; q280's point
    // richness can't see the TRAJECTORY); ordered doc buckets,
    // min-bucket first appearances, quantized-ln OLS
    "q321_x_vocab_growth" -> gridTuned((s, d) =>
      graft.text.Corpus.vocabGrowth(
          Tables.documents(s, d), Seq("source"), "doc_id", "text",
          buckets = 16)
        .orderBy("source", "bucket")),

    // ---- extension: split-leakage audit — how many MinHash near-dup
    // pairs STRADDLE the train/val/test hash split (the eval-inflating
    // contamination a random split of a duplicated corpus guarantees;
    // q156 splits, q46 finds pairs — this closes the loop); exact
    // match-count means, banded join only
    "q322_x_split_leakage" -> rowTuned((s, d) =>
      graft.text.Dedup.splitLeakage(
          Tables.documents(s, d), "doc_id", "text",
          k = MinhashK, bands = MinhashBands)
        .orderBy("split_a", "split_b")),

    // ---- extension: embedding health audit — wrong-dim vectors, dead
    // near-zero rows, and the norm distribution per label (a bimodal
    // norm profile = two models mixed, the failure no centroid readout
    // shows); e3-quantized per-row norms, exact grid fences
    "q323_x_embedding_health" -> gridTuned((s, d) =>
      graft.sim.VectorOps.embeddingHealth(
          Tables.embeddings(s, d), Seq("label"), "embedding", dim = 64)
        .orderBy("label")),

    // ---- extension: ANN recall audit — q52's SRP-LSH index scored
    // against q49's brute-force ground truth on a probe set (the recall
    // number an ANN deployment must measure before trusting neighbors);
    // both sides share the ONE rounded-before-rank contract, recall is
    // a pure integer div
    "q324_x_ann_recall" -> gridTuned((s, d) => {
      val e = Tables.embeddings(s, d).filter(col("vec_id") < 200)
      graft.sim.Similarity.annRecall(e, e.filter(col("vec_id") < 32),
          "vec_id", "embedding", dim = 64, k = 3)
        .orderBy("query_id")
    }),

    // ---- extension: vocabulary coverage — what fraction of each
    // source's token stream falls OUTSIDE the English top-500 reference
    // vocab (the fixed-vocab tokenizer-readiness readout: 2% OOV
    // tokenizes, 30% shreds to bytes); broadcast N-bounded vocab,
    // vocabulary-sized join, integer permille rates
    "q325_x_vocab_coverage" -> gridTuned((s, d) =>
      graft.text.Corpus.vocabCoverage(
          Tables.documents(s, d), Seq("source"), "text",
          refFilter = col("lang") === "en", topN = 500)
        .orderBy("source")),

    // ---- extension: Hill tail index — how heavy is the document-length
    // upper tail per source (alpha <= 2 = infinite variance: mean-based
    // length monitoring is meaningless — the tail fact Zipf's token
    // slope and Gumbel's max-domain fit don't give); deterministic
    // order statistics, per-row e9 log-ratios, one division
    "q326_x_hill_tail" -> gridTuned((s, d) =>
      graft.operators.Sketch.hillTailIndex(
          Tables.documents(s, d), Seq("source"), "n_chars", "doc_id",
          k = 50)
        .orderBy("source")),

    // ---- extension: streaming vocab-coverage twin — q325's standing
    // tokenizer-readiness monitor: complete-mode state IS the
    // (source, token) count grid, the reference top-N re-derives from
    // the live grid each drain via the SHARED coverageFromGrid;
    // drained == batch, one oracle
    "q327_x_stream_vocab_coverage" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingVocabCoverage(s, d)),

    // ---- extension: quantile treatment effect — WHERE in the value
    // distribution does the A/B difference act, per event type (a mean
    // shift hides tail-only effects; q222 scores the mean, q301 the
    // whole curve — QTE reads the p10/p50/p90 fences); exact integer
    // order statistics, integer differences
    "q328_x_qte" -> gridTuned((s, d) =>
      graft.operators.Metrics.quantileTreatmentEffect(
          Tables.events(s, d)
            .withColumn("variant",
              when(pmod(col("user_id"), lit(2L)) === 0, "A").otherwise("B"))
            .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
          Seq("event_type"), "variant", "cents", "A", "B")
        .orderBy("event_type", "q_pct")),

    // ---- extension: dup-cluster size spectrum — the one-page dedup
    // report: clusters per size + corpus mass share, singletons
    // included (the shape says mirrored-hosts vs template-page vs
    // healthy BEFORE the keep-one finisher runs); pure integer counts
    // over q79's deterministic components
    "q329_x_dup_spectrum" -> rowTuned((s, d) =>
      graft.text.Dedup.dupClusterSpectrum(
          Tables.documents(s, d), "doc_id", "text",
          k = MinhashK, bands = MinhashBands, minEst = 0.5)
        .orderBy("cluster_size")),

    // ---- extension: Markov entropy rate — how predictable are user
    // event sequences per cohort (rate -> 0 = users on rails, -> ln K
    // = chaos; compresses q171's whole transition matrix into the one
    // scalar a bot-vs-organic screen wants); e9 conditional-entropy
    // terms, exact integer rate
    "q330_x_entropy_rate" -> gridTuned((s, d) =>
      graft.operators.Funnel.markovEntropyRate(
          Tables.events(s, d)
            .withColumn("cohort", pmod(col("user_id"), lit(2L)))
            .withColumn("tsu", expr("ts_ns div 1000")),
          Seq("cohort"), Seq("user_id"), "tsu", "event_type",
          tieCols = Seq("event_id"))
        .orderBy("cohort")),

    // ---- extension: TOST equivalence — PROVE the A/B high-value rates
    // are the same within ±50 permille, per event type (the "no worse
    // than" launch criterion a non-significant q240 z can never give);
    // exact counts, unpooled SE, verdict on both rounded one-sided z's
    "q331_x_tost_equivalence" -> gridTuned((s, d) =>
      graft.operators.Metrics.equivalenceTest(
          Tables.events(s, d)
            .filter(col("value").isNotNull)
            .withColumn("variant",
              when(pmod(col("user_id"), lit(2L)) === 0, "A").otherwise("B"))
            .withColumn("hi", col("value") >= 50.0),
          Seq("event_type"), "variant", "hi", "A", "B",
          marginPermille = 50)
        .orderBy("event_type")),

    // ---- extension: ratio-metric A/B — high-value events PER EVENT
    // with the delta-method USER-clustered SE, per event type (rows
    // cluster within users, so q331/q240's per-row z is anticonservative
    // for ratio metrics — this is the correct launch readout); exact
    // DECIMAL entity sums, fixed R/Var/z trees
    "q332_x_ratio_metric_ab" -> gridTuned((s, d) =>
      graft.operators.Metrics.ratioMetricAb(
          Tables.events(s, d)
            .filter(col("value").isNotNull && col("user_id").isNotNull)
            .groupBy(col("event_type"),
              when(pmod(col("user_id"), lit(2L)) === 0, "A").otherwise("B")
                .as("variant"),
              col("user_id"))
            .agg(sum(when(col("value") >= 50.0, 1L).otherwise(0L)).as("x_hi"),
              count(lit(1)).as("n_ev")),
          Seq("event_type"), "variant", "x_hi", "n_ev", "A", "B")
        .orderBy("event_type")),

    // ---- extension: streaming top-k stability twin — q319's standing
    // leaderboard-churn alarm: complete-mode state IS the (type, half,
    // user) total grid; rank cut + set join re-derive each drain via
    // the SHARED stabilityFromTotals; drained == batch, one oracle
    "q333_x_stream_topk_stability" -> gridTuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingTopkStability(s, d)),

    // ---- extension: survival summary — median retention + RMST(30d)
    // per cohort off q225's KM curve (the censoring-honest "average
    // days retained" the naive mean understates, and a median that
    // admits non-existence); exact step-integral of width*S_e9
    // products, exact median fence
    "q334_x_survival_summary" -> gridTuned((s, d) => {
      val per = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
        .groupBy(col("user_id"))
        .agg(min(expr("ts_ns div 1000")).as("first_us"),
          max(expr("ts_ns div 1000")).as("last_us"))
      graft.operators.Survival.survivalSummary(
          graft.operators.Survival.lifetimeSubjects(per),
          Seq("cohort"), "dur_days", "churned", horizon = 30L)
        .orderBy("key")
    }),

    // ---- extension: fixed-k BPE merge slice — the REAL incremental
    // learner's first 3 merges, hash-checked (the q235/q276 graduation:
    // bound the depth, the oracle unrolls count->argmax->apply rounds;
    // run-capped ASCII words make the 2-pass replace replay exact)
    "q335_x_bpe_merge_slice" -> gridTuned((s, d) =>
      graft.text.Bpe.mergeSliceDf(
        Tables.documents(s, d), "text", k = 3)),

    // ---- extension: SARX(1) — AR(1) WITH one exog regressor (monthly
    // order count), hash-checked: closed-form 3x3 Cramer CLS + the
    // hold-last-exog forecast recursion, extending the q117/q211/q213/
    // q218/q35 square one axis closer to q39/q69's full Kalman surface
    "q336_u8_sarx1_forecast" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.sarxForecast(
          Tables.orders(s, d)
            .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(round(sum(floor(col("o_totalprice") * 100 + 0.5)) / 1e8, 6)
              .as("tot"),
              round(count(lit(1)) / 1e3, 6).as("xn")),
          Nil, "month", "tot", "xn", horizon = 12)
        .select(col("key"), col("n_obs"),
          round(col("intercept"), 6).as("intercept"),
          round(col("ar_coef"), 6).as("ar_coef"),
          round(col("exog_coef"), 6).as("exog_coef"),
          col("step"), round(col("forecast"), 4).as("forecast"))
        .orderBy("key", "step")),

    // ---- extension: AIC auto-lag ADF over lags {0,1} — the lag-SELECTION
    // axis of the q34 stationarity family graduated (q212 tested the
    // fixed-lag regression; this hash-checks statsmodels' autolag
    // protocol itself: common-window candidate fits, rounded-AIC argmin,
    // winner refit on its full sample)
    "q337_u56_adf_autolag" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.adfAutoLag1(
          Tables.orders(s, d)
            .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("cents")),
          Nil, "month", "cents")),

    // ---- extension: local-level Kalman filter + concentrated-likelihood
    // grid MLE — the first slice where the KALMAN RECURSION itself is
    // oracle-replayed (recursive CTE per λ candidate), narrowing the
    // q39/q69 no_oracle core to just the continuous optimizer
    "q338_u8_local_level_kalman" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.localLevelForecast(
          Tables.orders(s, d)
            .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(round(sum(floor(col("o_totalprice") * 100 + 0.5)) / 1e8, 6).as("tot")),
          Nil, "month", "tot", horizon = 6)
        .select(col("key"), col("n_obs"), round(col("lambda"), 1).as("lambda"),
          round(col("r_hat"), 6).as("r_hat"), col("step"),
          round(col("forecast"), 4).as("forecast"),
          round(col("lo"), 4).as("lo"), round(col("hi"), 4).as("hi"))
        .orderBy("key", "step")),

    // ---- extension: fixed-3-iteration BATCH perceptron on word-presence
    // features — the all-integer slice of q93's iterative-GD axis (the
    // q335 fixed-k precedent): every update is an exact integer aggregate
    // a SQL oracle unrolls, narrowing the classifier no_oracle to the
    // float logistic loss only
    "q339_x_perceptron_slice" -> gridTuned((s, d) =>
      graft.text.QualityClassifier.perceptronSlice(
        Tables.documents(s, d), "text",
        words = Seq("table", "query", "scan", "data",
          "fast", "window", "agg", "stream"),
        targetWord = "vector", iters = 3)),

    // ---- extension: BPE ENCODE under the fixed-3-merge table — q335's
    // graduation extended from learning to encoding (tokenizer fertility
    // per doc, hash-checked; narrows q94's no_oracle to the
    // unbounded-rank encoder). Expression-only replace chains, no UDF
    "q340_x_bpe_encode_slice" -> rowTuned((s, d) =>
      graft.text.Bpe.encodeSliceDf(Tables.documents(s, d), "doc_id", "text", k = 3)
        .orderBy("doc_id")),

    // ---- extension: TextRank keyword extraction — token co-occurrence
    // graph (adjacent-token edges, symmetric, self-loops dropped) ∘ the
    // q123 integer-exact PageRank; top-25 keywords by rank. Pure
    // composition: the oracle reuses the q123 iteration chain verbatim
    // over the new edge CTE
    "q341_x_textrank_keywords" -> gridTuned((s, d) => {
      val toks = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"),
          posexplode(Cols.tokens(col("text"))).as(Seq("pos", "tok")))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val pairs = toks.withColumn("nxt", lead(col("tok"), 1).over(w))
        .filter(col("nxt").isNotNull && col("tok") =!= col("nxt"))
      val edges = pairs.select(col("tok").as("src"), col("nxt").as("dst"))
        .union(pairs.select(col("nxt").as("src"), col("tok").as("dst")))
      graft.operators.Graph.pageRank(edges, "src", "dst", iterations = 3)
        .orderBy(col("rank_scaled").desc, col("node")).limit(25)
    }),

    // ---- extension: coarsened-exact-matching ATT — the observational-
    // causal member the randomized A/B tier (CUPED/QTE/ratio-metric)
    // can't cover: strata = (priority, segment, month) cells, matched
    // strata weighted by treated share, overlap diagnostic reported
    "q342_x_cem_att" -> gridTuned((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("treat", col("o_custkey") % 3 === 0)
        .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        .withColumn("month", Cols.monthStart(col("o_orderdate")))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      graft.operators.Metrics.cemAtt(
        o.join(broadcast(c), o("o_custkey") === c("c_custkey")),
        "treat", "cents", Seq("o_orderpriority", "c_mktsegment", "month"))
    }),

    // ---- extension: Adamic-Adar link prediction over the co-purchase
    // item graph — "which not-yet-co-ordered part pair is most likely
    // next", rare shared neighbors weighted up; e9-quantized per-neighbor
    // terms keep the score an exact integer sum
    "q343_x_adamic_adar" -> gridTuned((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      graft.operators.Graph.adamicAdar(edges, "src", "dst",
        maxDegree = 200L, topK = 25)
    }),

    // ---- extension: streaming CEM ATT — q342's standing twin (state IS
    // the covariate-cell strata grid, stream-static dim join, shared
    // attFromStrata readout; drained == batch, one oracle)
    "q344_x_stream_cem_att" -> gridTuned((s: SparkSession, d: String) =>
      graft.streaming.StreamingCollapse.streamingCemAtt(s, d)),

    // ---- extension: Huber M-estimate of location — fixed-2-IRLS from
    // the exact median/MAD (the bounded-depth contract that makes IRLS
    // oracle-replayable); e9 per-VALUE weights, grid-shaped throughout
    "q345_x_huber_location" -> gridTuned((s, d) =>
      graft.operators.Sketch.huberLocation(
          Tables.lineitem(s, d).withColumn("dollars",
            expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint) div 100")),
          Seq("l_returnflag"), "dollars", iters = 2)
        .orderBy("l_returnflag")),

    // ---- extension: Hodges-Lehmann shift — the location estimate the
    // Mann-Whitney verdict implies (median of all pairwise differences),
    // computed at grid×grid, never rows×rows; quantity is the bounded
    // 50-value grid, sides = discounted vs not
    "q346_x_hodges_lehmann" -> gridTuned((s, d) =>
      graft.operators.Metrics.hodgesLehmann(
        Tables.lineitem(s, d)
          .withColumn("discounted", col("l_discount") >= 0.05),
        Seq("l_returnflag"), "discounted", "l_quantity"))
  )

  /** Round-10 closers (kept in a second map to stay under the file-size
    * discipline the registry split established). */
  private[graft] val m2: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- extension: pairwise DTW — alignment-tolerant series similarity
    // (which priorities' monthly revenue curves share a SHAPE), the
    // first DP-table recursion replayed by the oracle (row-carried
    // recursive CTE)
    "q347_x_dtw_pairwise" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.dtwPairwise(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(round(sum(floor(col("o_totalprice") * 100 + 0.5)) / 1e8, 6)
              .as("tot")),
          Seq("o_orderpriority"), "month", "tot")
        .orderBy("key_a", "key_b")),

    // ---- extension: sample-ratio-mismatch check — χ² goodness-of-fit
    // of the hashSplit's observed shares against the DESIGNED 80/10/10
    // (the first health gate of every A/B or split-based eval readout)
    "q348_x_srm_check" -> gridTuned((s, d) =>
      graft.operators.Metrics.srmCheck(
        Corpus.hashSplit(
          Tables.documents(s, d).filter(col("doc_id").isNotNull), "doc_id"),
        "split", Seq(("train", 800L), ("val", 100L), ("test", 100L)))),

    // ---- extension: Bartlett's equal-variance test — the parametric
    // likelihood-ratio screen beside Brown-Forsythe's robust one
    // (disagreement between the two itself flags heavy tails)
    "q349_x_bartlett" -> gridTuned((s, d) =>
      graft.operators.Metrics.bartlettTest(
        Tables.lineitem(s, d).withColumn("dollars",
          expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint) div 100")),
        "l_returnflag", "dollars")),

    // ---- extension: fixed-3-iteration LOGISTIC GD with the shared
    // e6-quantized sigmoid table — graduates q93's float-logistic-loss
    // residue (the one axis q339's perceptron couldn't reach: its update
    // never evaluates σ). Same word-presence features as q339 for
    // comparability; the NLL itself is a table readout, hash-checked
    "q350_x_logistic_slice" -> gridTuned((s, d) =>
      graft.text.QualityClassifier.logisticSlice(
        Tables.documents(s, d), "text",
        words = Seq("table", "query", "scan", "data",
          "fast", "window", "agg", "stream"),
        targetWord = "vector", iters = 3)),

    // ---- extension: dominant principal component by integer power
    // iteration over the exact scatter matrix — the embedding-collapse
    // (anisotropy λ1/trace) health monitor; one d²-grid pass over the
    // data, 3 exact matvec+rescale rounds, every step oracle-replayed
    "q351_x_pca_power_slice" -> gridTuned((s, d) =>
      graft.sim.VectorOps.pcaPowerSlice(
        Tables.embeddings(s, d), "embedding", dim = 64, iters = 3)),

    // ---- extension: 2x2 difference-in-differences per order priority —
    // the panel causal estimator beside q342's cross-sectional CEM
    // (treated = BUILDING-segment customers, post = H2'95+; parallel
    // trends nets out baseline gap + common shock). Dim side broadcast
    "q352_x_diff_in_diff" -> gridTuned((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("dollars", floor(col("o_totalprice") + lit(0.5)))
        .withColumn("post", col("o_orderdate") >= lit("1995-07-01").cast("date"))
      val c = Tables.customer(s, d).select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").as("treated"))
      graft.operators.Metrics.diffInDiff(
          o.join(broadcast(c), o("o_custkey") === c("c_custkey")),
          Seq("o_orderpriority"), "treated", "post", "dollars")
        .orderBy("o_orderpriority")
    }),

    // ---- extension: split conformal prediction — distribution-free
    // interval half-width q̂ from the calibration split's exact residual
    // order statistic (group-mean model on train, coverage audited on
    // test); the eval-tier guarantee beside q221 calibration / q287 CIs
    "q353_x_conformal_interval" -> gridTuned((s, d) =>
      graft.operators.Metrics.conformalIntervalFromBase(
        EntryHelpers.conformalLineitemBase(s, d),
        Seq("l_returnflag", "l_linestatus"))),

    // ---- extension: sharp regression discontinuity per order priority —
    // the third causal design beside q342 CEM (matching) and q352 DiD
    // (panel): local linear fits ±60 days around the H2'95 cutoff, jump
    // at the cutoff with intercept-variance t
    "q354_x_regression_discontinuity" -> gridTuned((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("dollars", floor(col("o_totalprice") + lit(0.5)))
        .withColumn("rdays",
          datediff(col("o_orderdate"), lit("1995-07-01").cast("date")))
      graft.operators.Regression.regressionDiscontinuity(
          o, Seq("o_orderpriority"), "rdays", "dollars",
          cutoff = 0L, bandwidth = 60L)
        .orderBy("o_orderpriority")
    }),

    // ---- extension: STREAMING twin of q352 DiD (state = the per-key
    // 2x2 moment grid, stream-static dim join, shared didFromMoments
    // readout; drained == batch, one oracle)
    "q355_x_stream_diff_in_diff" -> gridTuned((s: SparkSession, d: String) =>
      graft.streaming.StreamingCollapse.streamingDiffInDiff(s, d)),

    // ---- extension: IV / Wald LATE per order priority — the fourth
    // causal design (confounded treatment, hash-random encouragement):
    // synthetic design z = even nation, d = nation ≡ 0 (mod 3), so the
    // first stage is a known nonzero rate gap; reduced form and first
    // stage reported beside the ratio
    "q356_x_iv_wald" -> gridTuned((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("dollars", floor(col("o_totalprice") + lit(0.5)))
      val c = Tables.customer(s, d).select(col("c_custkey"),
        (col("c_nationkey") % 2 === 0).as("z"),
        (col("c_nationkey") % 3 === 0).as("dtreat"))
      graft.operators.Metrics.ivWald(
          o.join(broadcast(c), o("o_custkey") === c("c_custkey")),
          Seq("o_orderpriority"), "z", "dtreat", "dollars")
        .orderBy("o_orderpriority")
    }),

    // ---- extension: permutation placebo for q352's DiD — 19
    // hash-deterministic pseudo-assignments of the treatment unit
    // (customer), permutation p on the rounded e6 estimates
    // (Bertrand–Duflo–Mullainathan 2004's placebo recipe)
    "q357_x_did_placebo" -> gridTuned((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("dollars", floor(col("o_totalprice") + lit(0.5)))
        .withColumn("post", col("o_orderdate") >= lit("1995-07-01").cast("date"))
      val c = Tables.customer(s, d).select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").as("treated"))
      graft.operators.Metrics.didPlacebo(
          o.join(broadcast(c), o("o_custkey") === c("c_custkey")),
          Seq("o_orderpriority"), "o_custkey", "treated", "post", "dollars",
          reps = 19)
        .orderBy("o_orderpriority")
    }),

    // ---- extension: AUTO-LENGTH periodogram — hash-checks q34's
    // length-selection protocol itself (largest 2^k that fits, the FFT
    // prelude), then the q276 integer-table DFT at the SELECTED n;
    // per-customer monthly series vary in span, so every candidate branch
    // and the too-short drop all exercise in the gate
    "q358_u6_periodogram_auto_n" -> rowTuned((s, d) => {
      val m = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("custkey"),
          Cols.monthStart(col("o_orderdate")).as("month"))
        .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"))
          .as("cents"))
      graft.stats.Diagnostics.periodogramAutoN(
          m, Seq("custkey"), "month", "cents")
        .orderBy("custkey", "k")
    }),

    // ---- extension: STREAMING twin of q353 conformal — model + q̂
    // frozen batch-side, coverage monitored over the arriving test
    // stream (state = the 3-count row); drained == batch, one oracle
    "q359_x_stream_conformal" -> gridTuned((s: SparkSession, d: String) =>
      graft.streaming.StreamingCollapse.streamingConformal(s, d,
        Some(EntryHelpers.conformalLineitemBase(GraftSession.tune(s), d)))),

    // ---- extension: ternary-search refinement of the Kalman λ — the
    // CONTINUOUS-OPTIMIZER slice (q338 checked filter + grid argmin;
    // this checks the line-search STEP itself at e6-rounded probes),
    // narrowing q39/q69's optimizer residue to unbounded iteration only
    "q360_u8_kalman_ternary_refine" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.localLevelRefined(
          Tables.orders(s, d)
            .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(round(sum(floor(col("o_totalprice") * 100 + 0.5)) / 1e8, 6)
              .as("tot")),
          Nil, "month", "tot")
        .orderBy("key")),

    // ---- extension: t-closeness — the third privacy rung above q232's
    // k-anonymity/l-diversity (a class can pass both and still leak a
    // 99/1 sensitive skew): per-class total-variation distance to the
    // global sensitive distribution, pure counting
    "q361_x_t_closeness" -> gridTuned((s, d) =>
      graft.operators.Profile.tCloseness(
          Tables.customer(s, d).withColumn("bal_band",
            expr("cast(floor(c_acctbal / 2000) as bigint)")),
          Seq("c_nationkey", "c_mktsegment"), "bal_band")
        .orderBy("c_nationkey", "c_mktsegment")),

    // ---- extension: group-sequential A/B boundaries — the peeking-safe
    // middle between q240's fixed-horizon test and q292's per-row SPRT:
    // five chronological looks, cumulative Welch z against the shared
    // O'Brien-Fleming e4 ladder
    "q362_x_group_sequential" -> gridTuned((s, d) =>
      graft.operators.Metrics.groupSequential(
          Tables.events(s, d)
            .withColumn("look", expr("least(5, 1 + (dayofmonth(ts) - 1) div 6)"))
            .withColumn("arm", expr("user_id % 2 = 0"))
            .withColumn("cents", expr("cast(floor(value * 100 + 0.5) as bigint)")),
          "look", "arm", "cents",
          graft.operators.Metrics.obfBoundariesE4(5))
        .orderBy("look")),

    // ---- extension: Qn robust scale — 50% breakdown like the MAD but
    // 82% efficiency and no symmetry assumption (Rousseeuw–Croux 1993);
    // the k-th order statistic of the pairwise |difference| multiset
    // walked exactly over the value-grid cross (the q346 framing)
    "q363_x_qn_scale" -> gridTuned((s, d) =>
      graft.operators.Sketch.qnScale(
        Tables.lineitem(s, d), Seq("l_returnflag"), "l_quantity")),

    // ---- extension: STREAMING twin of q362 GST (state = the k-row
    // per-look Welch grid; looks literally arrive over time) and of
    // q363 Qn (state = the per-key value grid) — shared readouts,
    // drained == batch, one oracle each
    "q364_x_stream_group_sequential" -> gridTuned((s: SparkSession, d: String) =>
      graft.streaming.StreamingCollapse.streamingGroupSequential(s, d)),
    "q365_x_stream_qn_scale" -> gridTuned((s: SparkSession, d: String) =>
      graft.streaming.StreamingCollapse.streamingQnScale(s, d)),

    // ---- extension: STREAMING twin of q361 t-closeness (state = the
    // class x value grid; global dist re-derives from it at drain) —
    // the standing privacy-release monitor; drained == batch, one oracle
    "q367_x_stream_t_closeness" -> gridTuned((s: SparkSession, d: String) =>
      graft.streaming.StreamingCollapse.streamingTCloseness(s, d)),

    // ---- extension: PER-KEY local-level Kalman grid MLE — q338's
    // single-series oracle replay extended to the keyed kernel path (one
    // recursion per (key, λ)), narrowing q69's multikey ⊘ to the same
    // optimizer-only residue as q39
    "q366_u8_local_level_multikey" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.localLevelForecast(
          monthlyPriority(s, d)
            .withColumn("tot", round(col("cents") / 1e8, 6)),
          Seq("prio"), "month", "tot", horizon = 3)
        .select(col("key"), col("n_obs"), round(col("lambda"), 1).as("lambda"),
          round(col("r_hat"), 6).as("r_hat"), col("step"),
          round(col("forecast"), 4).as("forecast"),
          round(col("lo"), 4).as("lo"), round(col("hi"), 4).as("hi"))
        .orderBy("key", "step")),

    // ---- extension: AUTO-routed sessionization — the q260 hot-key dial
    // with the Skew.hotKeyStats probe choosing the route (plain window
    // below the per-slot crossover, time-sliced past it); shares q110's
    // oracle because BOTH routes are contractually identical rows
    "q368_x_sessions_auto" -> rowTuned((s, d) =>
      graft.operators.Sessionize.sessionStatsAuto(
          Tables.events(s, d).select("user_id", "event_id", "ts"),
          "user_id", "ts", "event_id", gapMinutes = 720, sliceMinutes = 1440)
        .orderBy("user_id", "session_idx")),

    // ---- extension: AUTO-routed funnel — the q261 aggregate dial with
    // the same probe-and-route; shares q147's oracle
    "q369_x_funnel_auto" -> gridTuned((s, d) =>
      graft.operators.Funnel.conversionCountsAuto(
          Tables.events(s, d).withColumn("tsu", expr("ts_ns div 1000")),
          Seq("user_id"), "tsu", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("stage")),

    // ---- extension: CANDIDATE-PERIOD seasonal power scan — graduates
    // q34's U6 `seasonalPeriod` arithmetic itself at DATA-DEPENDENT
    // series length (q276/q358 check Fourier-frequency DFTs at fixed/
    // auto n; q34's estimate scans periods p=2..24 over the whole
    // demeaned series — this hash-checks exactly that scan, and the
    // kernel now runs the SAME e15-table exact-integer arithmetic)
    "q370_u6_seasonal_grid" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.seasonalPeriodGrid(
          monthlyPriority(s, d), Seq("prio"), "month", "cents")
        .orderBy("prio", "p")),

    // ---- extension: BPE merge schedule WITH the data-dependent stop —
    // q335's fixed-k slice plus the learner's minPairCount termination,
    // hash-checked (each unrolled oracle round guards its argmax on the
    // threshold; sub-threshold rounds emit nothing and no-op the apply).
    // Narrows q92/q94's residue to rank-beyond-k only. minPairCount
    // sits between the sf0.01 rank-5 and rank-6 counts so the stop
    // branch genuinely exercises in the gate (6 of 8 scheduled rounds)
    "q371_x_bpe_merge_stop" -> gridTuned((s, d) =>
      graft.text.Bpe.mergeSliceDf(
        Tables.documents(s, d), "text", k = 8, minPairCount = 1850L)),

    // ---- extension: STREAMING twin of q370's seasonal scan (state =
    // the calendar-bounded per-(key, month) cents grid; ranks and the
    // period argmax re-derive at drain via the SHARED readout) — the
    // standing seasonality monitor; drained == batch, one oracle
    "q372_x_stream_seasonal_grid" -> gridTuned((s: SparkSession, d: String) =>
      graft.streaming.StreamingCollapse.streamingSeasonalGrid(s, d)),

    // ---- extension: Tukey HSD pairwise comparisons — WHICH priorities
    // differ once q269's F says some do (Tukey 1949; Kramer unequal-n
    // form), family-wise-safe vs the q222 per-pair Welch: studentized
    // range q per pair against the shared q(0.05; k, inf) e4 ladder
    "q373_x_tukey_hsd" -> gridTuned((s, d) =>
      graft.operators.Metrics.tukeyHsd(
          Tables.orders(s, d)
            .withColumn("dollars", floor(col("o_totalprice") + lit(0.5))),
          "o_orderpriority", "dollars")
        .orderBy("g_a", "g_b")),

    // ---- extension: Theta-method forecast (M3 winner) — theta0 trend
    // line from exact integer OLS sums + SES(alpha=1/2) over the theta2
    // line, equal-weight combination; the forecast tier between q141
    // Holt and the q39 SARIMAX surface, recursion oracle-replayed
    "q374_x_theta_forecast" -> gridTuned((s, d) =>
      graft.stats.Diagnostics.thetaForecast(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority").as("prio"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(expr("sum(cast(floor(o_totalprice * 100 + 0.5) as bigint)) div 100")
              .as("dollars")),
          Seq("prio"), "month", "dollars", alpha = 0.5, horizon = 6)
        .select(col("key"), col("n_obs"), round(col("slope"), 4).as("slope"),
          round(col("level"), 4).as("level"), col("step"),
          round(col("forecast"), 4).as("forecast"))
        .orderBy("key", "step")),

    // ---- extension: MMR-diversified top-k — the RAG retrieval staple
    // plain top-k misses (near-dup neighbors crowd out coverage): at
    // lambda=1/2 twice the greedy score is the exact INTEGER
    // rel_e4 − max(0, sim_e4), so selection is engine-replayable and
    // the oracle unrolls the k rounds over the shared pool
    "q375_x_mmr_topk" -> gridTuned((s, d) => {
      val e = Tables.embeddings(s, d)
      graft.sim.Similarity.mmrTopK(
          e.filter(col("vec_id") < 6), e.filter(col("vec_id") < 200),
          "vec_id", "embedding", k = 4, poolSize = 12)
        .orderBy("query_id", "step")
    }),

    // ---- extension: Breusch–Pagan heteroscedasticity — the regression
    // tier's variance diagnostic (Bartlett/BF need a grouping; this
    // catches variance drifting along a continuous axis): LM = n·R² of
    // the e0-quantized squared residuals on the month index.
    // KILODOLLAR grid (cents div 100000), not dollars: BP squares the
    // residual, so the per-row fence needs u < √1e15 ≈ 3.2e7 — monthly
    // dollar sums already breach that at sf0.1 (~1e8–1e9) and grow
    // linearly with volume; kilodollar sums (~1e5–1e6 at sf0.1) clear
    // the fence with ~30x headroom at sf1 and suu stays exact far past.
    "q376_x_breusch_pagan" -> gridTuned((s, d) =>
      graft.operators.Regression.breuschPagan(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority").as("prio"),
              expr("cast(year(o_orderdate) * 12 + month(o_orderdate) as bigint)")
                .as("xm"))
            .agg(expr("sum(cast(floor(o_totalprice * 100 + 0.5) as bigint)) div 100000")
              .as("kdollars")),
          Seq("prio"), "xm", "kdollars")
        .orderBy("prio")),

    // ---- extension: Cochran–Mantel–Haenszel — the confounder-safe
    // contingency member (q297's pooled chi-square is Simpson's-paradox-
    // blind; CMH conditions on the priority strata): synthetic design
    // exposure = even customer, outcome = high-value order
    "q377_x_cmh_test" -> gridTuned((s, d) =>
      graft.operators.Metrics.cmhTest(
          Tables.orders(s, d)
            .withColumn("expo", col("o_custkey") % 2 === 0)
            .withColumn("hi", col("o_totalprice") >= 150000.0),
          "o_orderpriority", "expo", "hi")),

    // ---- extension: STREAMING twin of q377 CMH (state = the
    // strata-bounded 2x2 count grid; shared cmhFromStrata readout) —
    // the standing confounder-held-fixed association monitor;
    // drained == batch, one oracle
    "q378_x_stream_cmh" -> gridTuned((s: SparkSession, d: String) =>
      graft.streaming.StreamingCollapse.streamingCmh(s, d)),

    // ---- extension: Yeo-Johnson λ GRID MLE — the q338-Kalman pattern
    // applied to q34's LAST unchecked kernel (the golden-section λ fit):
    // the scipy objective over a fixed e1 λ grid, per-(row, λ) z
    // e6-quantized so sums are order-free, argmax on exact integers.
    // q34's U4 residue narrows to the continuous refinement only.
    // Input demeaned by the exact integer per-key mean so BOTH sign
    // branches exercise in the gate at any SF
    "q379_u4_yeojohnson_grid" -> gridTuned((s, d) => {
      val m = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"),
          Cols.monthStart(col("o_orderdate")).as("month"))
        .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"))
          .as("cents"))
      val avg = m.groupBy(col("prio"))
        .agg(expr("sum(cents) div count(*)").as("avgc"))
      graft.stats.Diagnostics.yeoJohnsonGrid(
          m.join(broadcast(avg), Seq("prio"))
            .withColumn("x", expr("cast(cents - avgc as double) / 1e8")),
          Seq("prio"), "x")
        .orderBy("prio", "lambda_e1")
    }),

    // ---- extension: ternary refinement of the Yeo-Johnson λ — the
    // q360 pattern finishing U4: q379 checked the grid argmax; this
    // hash-checks the LINE-SEARCH STEP (2 ternary rounds at r6-rounded
    // probes, each one more parametrized replay of the q379 quantized
    // aggregation, comparisons on e6-rounded llf). U4's residue is now
    // unbounded iteration count only — U8's end state
    "q380_u4_yeojohnson_refine" -> gridTuned((s, d) => {
      val m = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"),
          Cols.monthStart(col("o_orderdate")).as("month"))
        .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"))
          .as("cents"))
      val avg = m.groupBy(col("prio"))
        .agg(expr("sum(cents) div count(*)").as("avgc"))
      graft.stats.Diagnostics.yeoJohnsonRefined(
          m.join(broadcast(avg), Seq("prio"))
            .withColumn("x", expr("cast(cents - avgc as double) / 1e8")),
          Seq("prio"), "x")
        .orderBy("key")
    }),

    // ---- extension: BPE merge ladder, k=16 — the verdict-#6 doubling-k
    // rung above q371's k=8: the REAL incremental learner's first 16
    // merges hash-checked against 16 unrolled count→argmax→apply oracle
    // rounds, bounding q92's unchecked residue to ranks beyond 32
    // (q382). minPairCount=1 exercises the no-threshold schedule q371's
    // stop variant deliberately cuts short
    "q381_x_bpe_merge_k16" -> gridTuned((s, d) =>
      graft.text.Bpe.mergeSliceDf(Tables.documents(s, d), "text", k = 16)),

    // ---- extension: BPE merge ladder, k=32 — the top rung: past this,
    // the only q92 surface a SQL oracle has not replayed is rank > 32
    // of the SAME per-round arithmetic (each rung checks every lower
    // rank again, so a divergence at any checked depth cannot hide)
    "q382_x_bpe_merge_k32" -> gridTuned((s, d) =>
      graft.text.Bpe.mergeSliceDf(Tables.documents(s, d), "text", k = 32)),

    // ---- extension: Jonckheere–Terpstra ordered trend — the k-group
    // ORDERED-alternative test closing the trend triangle (Mann-Kendall
    // q216 = one series over time, Cochran-Armitage q348 = binary
    // outcome over scores; this = a metric over ORDERED groups): does
    // order value trend across the priority tiers, whose label order
    // 1-URGENT < … < 5-LOW IS the test's ordering. Values on the
    // hundred-dollar grid keep the oracle's cell-pair join compact
    "q383_x_jonckheere_trend" -> gridTuned((s, d) =>
      graft.operators.Metrics.jonckheereTerpstra(
          Tables.orders(s, d)
            .withColumn("hdollars",
              expr("cast(floor(o_totalprice + 0.5) as bigint) div 100")),
          Seq("o_orderstatus"), "o_orderpriority", "hdollars")
        .orderBy("o_orderstatus")),

    // ---- extension: STREAMING twin of q383 Jonckheere-Terpstra
    // (state = the bounded (key, group, value)-count grid in complete
    // mode; shared jtFromCells kernel readout) — the standing
    // ordered-trend monitor; drained == batch, one oracle
    "q384_x_stream_jonckheere" -> gridTuned((s: SparkSession, d: String) =>
      graft.streaming.StreamingCollapse.streamingJonckheere(s, d)),

    // ---- extension: Dunn post-hoc — WHICH priority pairs differ after
    // the q383/q270 tier flags a key: pairwise mean-midrank z's off the
    // same (status, priority, hdollars) cell grid, tie-corrected,
    // A&S-26.2.17 p's, ONE BH family across keys (the q313 convention)
    "q385_x_dunn_posthoc" -> gridTuned((s, d) =>
      graft.operators.Metrics.dunnTest(
          Tables.orders(s, d)
            .withColumn("hdollars",
              expr("cast(floor(o_totalprice + 0.5) as bigint) div 100")),
          Seq("o_orderstatus"), "o_orderpriority", "hdollars")
        .orderBy("o_orderstatus", "group_a", "group_b")),

    // ---- extension: STREAMING twin of q385 (state = the same bounded
    // cell grid in complete mode; shared dunnFromCells readout incl.
    // the BH family) — the standing which-pairs-differ monitor;
    // drained == batch, one oracle
    "q386_x_stream_dunn" -> gridTuned((s: SparkSession, d: String) =>
      graft.streaming.StreamingCollapse.streamingDunn(s, d)),

    // ---- extension: Page's trend test — do the priorities trend in
    // label order CONSISTENTLY ACROSS months (the blocked ordered
    // alternative: q314 Friedman asks "differ at all within blocks",
    // q383 JT asks "trend, unblocked"; Page asks both at once), over
    // monthly revenue cells per status; within-month midranks, 1..k
    // ascending-label scores, classical no-tie variance
    "q387_x_page_trend" -> gridTuned((s, d) =>
      graft.operators.Metrics.pageTrend(
          Tables.orders(s, d)
            .groupBy(col("o_orderstatus"),
              Cols.monthStart(col("o_orderdate")).as("month"),
              col("o_orderpriority"))
            .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"))
              .as("cents")),
          Seq("o_orderstatus"), "month", "o_orderpriority", "cents")
        .orderBy("o_orderstatus")),

    // ---- extension: STREAMING twin of q387 (state = the (status,
    // month, priority) revenue-cell grid in complete mode — the
    // drained cells ARE pageTrend's input rows, so the batch operator
    // is the shared readout); drained == batch, one oracle
    "q388_x_stream_page_trend" -> gridTuned((s: SparkSession, d: String) =>
      graft.streaming.StreamingCollapse.streamingPageTrend(s, d)),

    // ---- extension: Quade test — Friedman (q314) weighted by each
    // month's within-block RANGE (a month where priorities barely
    // differ carries almost no evidence; Quade ranks block ranges and
    // weights the centered ranks — the standard power upgrade at small
    // k), same monthly revenue cells; f_e6 + dofs, no verdict (the
    // anovaOneWay no-F-table precedent)
    "q389_x_quade_test" -> gridTuned((s, d) =>
      graft.operators.Metrics.quadeTest(
          Tables.orders(s, d)
            .groupBy(col("o_orderstatus"),
              Cols.monthStart(col("o_orderdate")).as("month"),
              col("o_orderpriority"))
            .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"))
              .as("cents")),
          Seq("o_orderstatus"), "month", "o_orderpriority", "cents")
        .orderBy("o_orderstatus")),

    // ---- extension: STREAMING twin of q389 (the q388 pattern: state =
    // the monthly revenue-cell grid in complete mode, drained cells ARE
    // quadeTest's input rows); drained == batch, one oracle
    "q390_x_stream_quade" -> gridTuned((s: SparkSession, d: String) =>
      graft.streaming.StreamingCollapse.streamingQuade(s, d)),

    // ---- extension: BPE merge ladder, k=64 (round 17, verdict #7) —
    // one more doubling rung: every rank ≤ 64 of the real incremental
    // learner is now replayed by the unrolled count→argmax→apply
    // oracle, halving the q92/q94 unchecked residue again (rank > 64)
    "q391_x_bpe_merge_k64" -> gridTuned((s, d) =>
      graft.text.Bpe.mergeSliceDf(Tables.documents(s, d), "text", k = 64)),

    // ---- extension: EXACT fuzzy join (round 17) — q-gram prefix
    // filtering + deletion-neighborhood low-gram channel, recall-
    // COMPLETE (every pair with levenshtein ≤ 2), unlike q139's
    // prefix blocking: the corruption here deletes a character at ANY
    // position INCLUDING the first three, exactly the pairs q139's
    // block contract documents as missed. Oracle = unrestricted brute
    // force, so the hash check pins completeness, not just precision.
    "q392_x_edit_join_exact" -> tuned((s, d) => {
      val corrupted = Tables.part(s, d).filter(col("p_partkey") % 4 === 0)
        .withColumn("pos",
          (col("p_partkey") % length(col("p_name")) + 1).cast("int"))
        .select(col("p_partkey").as("c_key"),
          expr("concat(substring(p_name, 1, pos - 1), substring(p_name, pos + 1, 1000))")
            .as("c_name"))
      graft.operators.FuzzyJoin.byEditDistanceQGram(
          corrupted, Tables.part(s, d), "c_name", "p_name",
          payload = Seq("p_partkey"), maxDist = 2, q = 3)
        .select(col("c_key"), col("p_partkey"),
          col("edit_dist").cast("int").as("edit_dist"))
        .orderBy("c_key", "p_partkey")
    }),

    // ---- extension: wide-signature simhash pairs (round 17) — the
    // corpus-scale dial of q59, at the width the r17 probe found
    // silently broken: bits > 32 used to vote over a 32-bit token
    // hash, leaving every high band constant 0 (one all-docs bucket).
    // 60-bit signatures / 15-bit bands with real high-bit votes; the
    // oracle replays the 60-bit hash and signature bit-exactly
    "q393_x_simhash_pairs_wide" -> rowTuned((s, d) =>
      Dedup.simhashCandidates(Tables.documents(s, d), "doc_id", "text",
          bits = 60, bands = 4, maxHamming = 1)
        .orderBy("id_a", "id_b")),

    // ---- extension: exact all-pairs Jaccard join (round 17) — the
    // COMPLETE third point beside q55's by-contract quadratic baseline
    // and q46's probabilistic LSH: AllPairs prefix filtering under a
    // global df token order, integer-exact accept test. 0.95: the
    // synthetic corpus's ~31-token vocabulary makes low thresholds
    // intrinsically quadratic in TRUE pairs (7.7% of ALL pairs exceed
    // 0.9) — the threshold is the output dial
    "q394_x_jaccard_join_complete" -> tuned((s, d) =>
      Dedup.jaccardJoinComplete(Tables.documents(s, d), "doc_id", "text",
          thresholdE6 = 950000L)
        .orderBy("id_a", "id_b")),

    // ---- extension: BPE merge ladder, k=128 — one more doubling rung
    // (q381/q382/q391 pattern); the q92/q94 terminal residue halves
    // again to rank > 128 of the same hash-checked arithmetic
    "q395_x_bpe_merge_k128" -> gridTuned((s, d) =>
      graft.text.Bpe.mergeSliceDf(Tables.documents(s, d), "text", k = 128)),

    // ---- extension: product-quantization ADC ANN (round 17) — the
    // memory-compression scale path beside IVF (q58, list pruning) and
    // SRP-LSH (q52, bucket pruning): 8 sub-codebooks of 16 centroids
    // make a 64-float vector 8 codes (32x RAM cut) and scoring m table
    // lookups per corpus row. Training, encoding, and ADC are
    // deterministic (q58's Lloyd conventions, L2); the oracle replays
    // all three bit-for-bit
    "q396_x_pq_adc_topk" -> gridTuned((s, d) => {
      val e = Tables.embeddings(s, d)
      graft.sim.Pq.adcTopK(e, e.filter(col("vec_id") < 32),
          "vec_id", "embedding", dim = 64, m = 8, k = 16, iters = 2, topK = 3)
        .orderBy("query_id", "rank")
    })
  )
}
