package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation metrics over grouped predictions — the readout side of the
  * quality-classifier tier ([[graft.text.QualityClassifier]] trains;
  * this measures): does a score actually separate the classes, per
  * slice? Sliced evaluation is the 100 TB habit that catches the
  * classic failure of one global AUC hiding a domain where the ranking
  * is inverted.
  *
  * Everything here is integer-exact by construction (the q32/q153 float
  * discipline): AUC is computed from RANKS — the Mann-Whitney U
  * identity `AUC = U / (n₊·n₋)` with midrank tie handling — and ranks,
  * tie counts, and U are exact integers. The single division is emitted
  * as the exact integer `⌊2U·10⁶ / (2·n₊·n₋)⌋`, so the result
  * hash-matches a SQL replay bit-for-bit. No float sum ever crosses a
  * row boundary. */
object Metrics {

  /** [[graft.functions.Cols.dropNullKeys]] — the shared null-key
    * convention (a null key is not a key), aliased for call-site
    * brevity. */
  private def dropNullKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    graft.functions.Cols.dropNullKeys(df, keyCols)

  /** Per-group two-sample Kolmogorov–Smirnov drift statistic — each
    * group's `valueCol` distribution against the REST of the table:
    * `D_g = max_x |F_g(x) − F_rest(x)|`, the standard "did this domain
    * drift from the corpus" screen (distribution-free, sensitive to
    * location AND shape, unlike a mean/variance check).
    *
    * Integer-exact: ECDF differences are compared by cross-multiplied
    * CUMULATIVE COUNTS — `|cum_g·n_rest − cum_rest·n_g|` — so D's argmax
    * is chosen with no float; the one division is the exact integer
    * `⌊D_num·10⁶ / (n_g·n_rest)⌋`. BIGINT bound: `cum·n ≤ N²` — fine to
    * ~3·10⁹ rows; above that move the cross-products to DECIMAL(38,0).
    *
    * Scale shape: per-(group, value) counts map-side combine; the ECDF
    * runs over the DISTINCT-VALUE grid (V·G rows, not N·G — drift
    * screens run over binned/bounded-cardinality values at 100 TB; bin
    * first if `valueCol` is continuous). One window per group on the
    * grid, one final aggregate.
    *
    * Output: `(groupCol, n, n_rest, ks_e6)`. */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val base = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).as("__v"))
    val cs = base.groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
    val cg = cs.groupBy(col("__v")).agg(sum(col("__c")).as("__cg"))
    val sizes = cs.groupBy(col("__g")).agg(sum(col("__c")).as("n"))
    // total derives FROM the counts (one-row aggregate broadcast onto the
    // grid, psiFromCounts's shape) — NOT a driver-side count() over the raw
    // input, which would be a second full scan of the table per report
    val totalDf = cs.agg(sum(col("__c")).as("__total"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__v"))
    cg.crossJoin(sizes.select(col("__g")))
      .join(cs, Seq("__g", "__v"), "left")
      .withColumn("__cum_s", sum(coalesce(col("__c"), lit(0L))).over(w))
      .withColumn("__cum_g", sum(col("__cg")).over(w))
      .join(sizes, Seq("__g"))
      .crossJoin(broadcast(totalDf))
      .withColumn("__num", abs(col("__cum_s") * (col("__total") - col("n")) -
        (col("__cum_g") - col("__cum_s")) * col("n")))
      .groupBy(col("__g"), col("n"), col("__total"))
      .agg(max(col("__num")).as("__ks_num"))
      .select(col("__g").as(groupCol), col("n"),
        (col("__total") - col("n")).as("n_rest"),
        expr("__ks_num * 1000000 div nullif(n * (__total - n), 0)").as("ks_e6"))
  }

  /** Per-group Population Stability Index — the industry-standard model-
    * monitoring drift score, each group vs the REST over a FIXED bin
    * grid: `PSI = Σ_bins (p_g − p_rest)·ln(p_g/p_rest)`. Conventional
    * reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted. The
    * binned complement of [[ksDrift]]: KS finds the worst single point,
    * PSI integrates mass movement over the whole range — and its bin
    * counts are streaming-mergeable (see
    * [[graft.streaming.StreamingCollapse]]'s twin), which KS's argmax
    * is not.
    *
    * Determinism: bins are fixed integer arithmetic
    * (`clamp(v div binWidth, 0, nBins−1)`); probabilities are
    * Laplace-smoothed `(c+1)/(n+nBins)` from EXACT integer counts (zero
    * bins would blow up the log); each bin's term is ONE fixed float
    * tree e9-quantized, summed exactly — `psi_e9` hash-matches a SQL
    * replay. Per-term sign: `(p_g−p_rest)` and `ln(p_g/p_rest)` always
    * agree, so terms are non-negative and quantization never cancels.
    *
    * Scale shape: per-(group, bin) counts map-side combine; the readout
    * runs over the G·nBins grid. Output: `(groupCol, n, n_rest,
    * psi_e9)`. */
  def psiDrift(df: DataFrame, groupCol: String, valueCol: String,
               binWidth: Long, nBins: Int): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    val base = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"),
        greatest(lit(0L),
          least(expr(s"cast(floor(`$valueCol`) as bigint) div $binWidth"),
            lit(nBins - 1L))).as("__bin"))
    psiFromCounts(
      base.groupBy(col("__g"), col("__bin")).agg(count(lit(1)).as("__c")),
      nBins, groupCol)
  }

  /** PSI readout from a per-(group, bin) count table — `(__g, __bin,
    * __c)` columns. Split out so a STREAMING count state (complete-mode
    * aggregate, mergeable across micro-batches) can share the exact
    * readout with the batch operator: drained counts == batch counts ⇒
    * identical psi_e9. The grid, marginals, and total all derive FROM
    * the counts (no second scan of the raw data). */
  def psiFromCounts(counts: DataFrame, nBins: Int,
                    groupColName: String): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val spark = counts.sparkSession
    val cs = counts.select(col("__g"), col("__bin"), col("__c"))
    val cb = cs.groupBy(col("__bin")).agg(sum(col("__c")).as("__cbin"))
    val sizes = cs.groupBy(col("__g")).agg(sum(col("__c")).as("n"))
    val totalDf = cs.agg(sum(col("__c")).as("__total"))
    val bins = spark.range(nBins).select(col("id").as("__bin"))
    val ca = coalesce(col("__c"), lit(0L))
    val pa = (ca + 1).cast("double") / (col("n") + nBins).cast("double")
    val pb = (col("__cbin") - ca + 1).cast("double") /
      (col("__total") - col("n") + nBins).cast("double")
    bins.join(broadcast(cb), Seq("__bin"), "left")
      .withColumn("__cbin", coalesce(col("__cbin"), lit(0L)))
      .crossJoin(broadcast(sizes))
      .crossJoin(broadcast(totalDf))
      .join(cs, Seq("__g", "__bin"), "left")
      .withColumn("__term_e9",
        floor((pa - pb) * log(pa / pb) * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("__g"), col("n"), col("__total"))
      .agg(sum(col("__term_e9")).as("psi_e9"))
      .select(col("__g").as(groupColName), col("n"),
        (col("__total") - col("n")).as("n_rest"), col("psi_e9"))
  }

  /** Per-key MASE of a lag forecast (Hyndman & Koehler 2006) — the
    * scale-free forecast-accuracy readout: the `forecastLag`-naive
    * forecast's absolute error, scaled by the `baselineLag`-naive
    * error over the SAME evaluation support (rows where both lags
    * exist — unequal supports would bias the ratio). mase < 1e6 ⇒ the
    * forecast beats the baseline. Over an integer series everything is
    * exact: errors are integer absolute differences, sums are exact,
    * the ratio is one integer division.
    *
    * The canonical instantiation is seasonal-naive vs naive
    * (`forecastLag = season`, `baselineLag = 1`): "is there enough
    * seasonality that last year beats last month" — the model-selection
    * screen before anything SARIMAX-shaped runs ([[graft.stats.Sarimax]]).
    * Both lags stack on ONE (keys, order) window sort.
    *
    * Output: `(keys…, n_eval, err_forecast, err_baseline, mase_e6)`;
    * a zero baseline error (constant series) emits null. */
  def lagForecastMase(df: DataFrame, keys: Seq[String], orderCol: String,
                      valueCol: String, forecastLag: Int,
                      baselineLag: Int = 1): DataFrame = {
    require(forecastLag >= 1, s"forecastLag must be >= 1, got $forecastLag")
    require(baselineLag >= 1, s"baselineLag must be >= 1, got $baselineLag")
    val w =
      (if (keys.isEmpty) Window.partitionBy(lit(1))
       else Window.partitionBy(keys.map(col): _*)).orderBy(col(orderCol))
    val x = col(valueCol).cast("long")
    val lf = lag(x, forecastLag).over(w)
    val lb = lag(x, baselineLag).over(w)
    // one projection for both lags: a single WindowExec over one sort
    df.select(col("*"), lf.as("__lf"), lb.as("__lb"))
      .filter(col("__lf").isNotNull && col("__lb").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(x - col("__lf"))).as("err_forecast"),
        sum(abs(x - col("__lb"))).as("err_baseline"))
      .withColumn("mase_e6",
        expr("err_forecast * 1000000 div nullif(err_baseline, 0)"))
  }

  /** Per-group ROC AUC of `scoreCol` against boolean `labelCol` (true =
    * positive class), higher score ⇒ predicted positive.
    *
    * Midrank construction without a second scan: ascending `rank()` is
    * the MINIMUM row number of a tie run and the tie-run size `t` comes
    * from a count over the (group, score) partition, so twice the
    * midrank is `2·rank + t − 1` — an exact integer per row. Summed
    * over positives: `2U = Σ(2·rank + t − 1) − 2·n₊(n₊+1)/2`.
    *
    * Scale shape: one shuffle on the group columns; both windows and
    * the final aggregate share that partitioning (no second exchange).
    * Null scores/labels are excluded. Single-class groups (n₊ = 0 or
    * n₋ = 0) emit a null `auc_e6` — AUC is undefined there, and a
    * silent 0 or 1 would read as a (perfectly bad/good) ranking.
    *
    * Output: `(groupCols…, n_pos, n_neg, auc_e6)`. */
  def groupedAuc(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                 labelCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupedAuc needs at least one group column")
    val score = col(scoreCol)
    val label = col(labelCol)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(score)
    val wt = Window.partitionBy((groupCols.map(col) :+ score): _*)
    df.filter(score.isNotNull && label.isNotNull)
      .withColumn("__r2", lit(2) * rank().over(w) + count(lit(1)).over(wt) - 1)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(when(label, col("__r2")).otherwise(0L)).as("__s2"),
        sum(when(label, 1L).otherwise(0L)).as("n_pos"),
        sum(when(label, 0L).otherwise(1L)).as("n_neg"))
      .withColumn("auc_e6",
        expr("(__s2 - n_pos * (n_pos + 1)) * 1000000 div nullif(2 * n_pos * n_neg, 0)"))
      .drop("__s2")
  }

  /** Per-group Average Precision (the area under the precision–recall
    * curve by the step-function convention) — the rare-positive
    * complement of [[groupedAuc]]: AUC is tie-invariant under class
    * imbalance, AP collapses when the positives are buried, which is
    * exactly the regime of quality-classifier screens over web corpora
    * (a few good docs in a sea of boilerplate).
    *
    * `AP = (1/n₊) Σ_{k: label_k=+} precision@k` over the ranking by
    * `scoreCol` DESC. Score ties are broken by `tieCol` ASC — AP (unlike
    * rank-AUC) depends on the concrete permutation, so the tie-break is
    * part of the operator's contract, not a hash-stability hack; pass
    * the stable document id.
    *
    * Integer-exact: `precision@k = cum₊(k)/k` is emitted per positive
    * row as the exact integer `⌊cum₊·10⁹ / k⌋`, summed exactly, then one
    * `div n₊` — both quantizations replay bit-for-bit in SQL. BIGINT
    * bound: `cum₊·10⁹ ≤ n₊·10⁹` — safe to ~9·10⁹ positives per group.
    *
    * Scale shape: one shuffle on the group columns; the ranking window
    * and the final aggregate share that partitioning. Groups with no
    * positives emit null `ap_e9`.
    *
    * Output: `(groupCols…, n, n_pos, ap_e9)`. */
  def averagePrecision(df: DataFrame, groupCols: Seq[String],
                       scoreCol: String, labelCol: String,
                       tieCol: String): DataFrame = {
    require(groupCols.nonEmpty, "averagePrecision needs at least one group column")
    val score = col(scoreCol)
    val label = col(labelCol)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(score.desc, col(tieCol).asc)
    df.filter(score.isNotNull && label.isNotNull)
      .withColumn("__k", row_number().over(w).cast("long"))
      .withColumn("__cum", sum(when(label, 1L).otherwise(0L)).over(w))
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(label, 1L).otherwise(0L)).as("n_pos"),
        sum(when(label, expr("__cum * 1000000000 div __k")).otherwise(0L))
          .as("__ap_num"))
      .withColumn("ap_e9", expr("__ap_num div nullif(n_pos, 0)"))
      .drop("__ap_num")
  }

  /** Reliability (calibration) bins of an e6-scaled score against a
    * boolean label — "when the model says 0.9, does 0.9 of the slice
    * convert?": per equal-width score bin, the mean predicted
    * probability vs the observed positive rate, plus each bin's
    * |gap|·n contribution so `Σ ece_num_e6 div n_total` is the Expected
    * Calibration Error (Naeini et al. 2015) — the readout a score
    * must pass before its thresholds mean anything.
    *
    * `scoreE6Col` is an integer score in [0, 10⁶] (the e6 convention
    * every classifier in this engine emits — [[graft.text.QualityClassifier]],
    * [[groupedAuc]]'s inputs); `bin = min(score·nBins div 10⁶, nBins−1)`
    * is exact integer arithmetic, as are both rates:
    * `mean_score_e6 = Σscore div n`, `obs_rate_e6 = n₊·10⁶ div n`.
    * No float anywhere.
    *
    * Scale shape: ONE aggregate over (group-free) bins — per-(bin)
    * counts map-side combine; the grid is nBins rows. Empty bins are
    * absent (a LEFT join against a literal grid is the caller's
    * densification if needed). Output: `(bin, n, n_pos, mean_score_e6,
    * obs_rate_e6, gap_e6, ece_num_e6)`. */
  def calibrationBins(df: DataFrame, scoreE6Col: String, labelCol: String,
                      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val score = col(scoreE6Col)
    val label = col(labelCol)
    df.filter(score.isNotNull && label.isNotNull)
      .withColumn("__bin",
        least(expr(s"`$scoreE6Col` * $nBins div 1000000"), lit(nBins - 1L)))
      .groupBy(col("__bin").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(label, 1L).otherwise(0L)).as("n_pos"),
        sum(score.cast("long")).as("__ssum"))
      .withColumn("mean_score_e6", expr("__ssum div n"))
      .withColumn("obs_rate_e6", expr("n_pos * 1000000 div n"))
      .withColumn("gap_e6", abs(col("mean_score_e6") - col("obs_rate_e6")))
      .withColumn("ece_num_e6", col("gap_e6") * col("n"))
      .drop("__ssum")
  }

  /** Per-key Welch two-sample t-test between groups `groupA` and
    * `groupB` of `groupCol` over an INTEGER `valueCol` (cents — the
    * engine's money convention): the unequal-variance location test
    * that backs every A/B readout, with the Welch–Satterthwaite
    * degrees of freedom. The parametric companion of the rank tests
    * ([[groupedAuc]] IS Mann–Whitney; this is the t side).
    *
    * Exactness discipline (the q216 shape): the DATA-dependent part is
    * one conditional aggregate of exact integers — n, Σx, Σx² per side,
    * map-side combined, no float crossing a row boundary. The t
    * statistic and df are then ONE fixed-IEEE-order double expression
    * over those six integers, e4-quantized (`⌊x·10⁴ + 0.5⌋`) so a SQL
    * replay of the same expression tree hash-matches. Σx² accumulates
    * as DECIMAL(38,0) (shared [[twoSampleSums]] — no silent BIGINT
    * wrap; the oracle's HUGEINT matches through ~10³⁸).
    *
    * Keys where either side has n < 2 or both variances are 0 emit
    * null `t_e4`/`df_e4` (the test is undefined, and ±∞ would read as
    * an infinitely significant result). Output: `(keys…, n_a, n_b,
    * mean_a_e2, mean_b_e2, t_e4, df_e4)` — means as exact integer
    * `Σx·100 div n` (hundredths of a cent). */
  /** The six exact two-sample sufficient sums `(n, Σx, Σx²)` per side —
    * ONE definition shared by [[welchTTest]] and [[effectSize]] (both
    * document "the same six sums"; a hand-synced copy drifting in one
    * would silently desynchronize them). Squares accumulate as
    * DECIMAL(38,0) so Σx² cannot silently wrap where the HUGEINT
    * oracle keeps computing. */
  private def twoSampleSums(df: DataFrame, keyCols: Seq[String],
                            groupCol: String, valueCol: String,
                            groupA: String, groupB: String): DataFrame = {
    val g = col(groupCol)
    val x = col(valueCol).cast("long")
    val inA = g === groupA
    val inB = g === groupB
    dropNullKeys(df, keyCols)
      .filter((inA || inB) && g.isNotNull && x.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(when(inA, 1L).otherwise(0L)).as("n_a"),
        sum(when(inA, x).otherwise(0L)).as("__sa"),
        // square the LONG-cast column inside the decimal widening so
        // Σx² agrees with the truncated Σx for any input type (a raw
        // decimal*double would promote to an order-dependent float sum)
        sum(when(inA, expr(
            s"cast(cast(`$valueCol` as bigint) as decimal(38,0)) * cast(`$valueCol` as bigint)"))
          .otherwise(expr("cast(0 as decimal(38,0))"))).as("__qa"),
        sum(when(inB, 1L).otherwise(0L)).as("n_b"),
        sum(when(inB, x).otherwise(0L)).as("__sb"),
        sum(when(inB, expr(
            s"cast(cast(`$valueCol` as bigint) as decimal(38,0)) * cast(`$valueCol` as bigint)"))
          .otherwise(expr("cast(0 as decimal(38,0))"))).as("__qb"))
  }

  def welchTTest(df: DataFrame, keyCols: Seq[String], groupCol: String,
                 valueCol: String, groupA: String, groupB: String): DataFrame = {
    val agg = twoSampleSums(df, keyCols, groupCol, valueCol, groupA, groupB)
    // fixed double tree over the six exact integers; mirrored literally
    // in the SQL oracle so the IEEE evaluation order is identical
    val va = "((cast(__qa as double) - cast(__sa as double) * __sa / n_a) / (n_a - 1))"
    val vb = "((cast(__qb as double) - cast(__sb as double) * __sb / n_b) / (n_b - 1))"
    val se2 = s"($va / n_a + $vb / n_b)"
    agg
      .withColumn("mean_a_e2", expr("__sa * 100 div nullif(n_a, 0)"))
      .withColumn("mean_b_e2", expr("__sb * 100 div nullif(n_b, 0)"))
      .withColumn("t_e4", expr(
        s"""case when n_a >= 2 and n_b >= 2 and $se2 > 0 then
           |  cast(floor((cast(__sa as double) / n_a - cast(__sb as double) / n_b)
           |             / sqrt($se2) * 10000 + 0.5) as bigint)
           |end""".stripMargin))
      .withColumn("df_e4", expr(
        s"""case when n_a >= 2 and n_b >= 2 and $se2 > 0 then
           |  cast(floor($se2 * $se2 /
           |    ($va / n_a * ($va / n_a) / (n_a - 1) +
           |     $vb / n_b * ($vb / n_b) / (n_b - 1)) * 10000 + 0.5) as bigint)
           |end""".stripMargin))
      .drop("__sa", "__qa", "__sb", "__qb")
  }

  /** Per-key standardized effect size between two groups — Cohen's d
    * with the Hedges small-sample correction: the MAGNITUDE readout
    * beside [[welchTTest]]'s significance (a billion-row A/B makes a
    * 0.001σ difference "significant"; d says whether anyone should
    * care): `d = (x̄_A − x̄_B)/s_p`, pooled
    * `s_p² = ((n_A−1)s_A² + (n_B−1)s_B²)/(n_A+n_B−2)`,
    * `g = d·(1 − 3/(4(n_A+n_B) − 9))`.
    *
    * Exactness: the same six exact integer sufficient sums as
    * welchTTest (one map-side-combined conditional aggregate); d and g
    * are ONE fixed double tree each, e6-quantized. Keys with fewer
    * than 2 per side or zero pooled variance emit nulls. Output:
    * `(keys…, n_a, n_b, d_e6, g_e6, magnitude)` with the conventional
    * small/medium/large labels on |d| (0.2/0.5/0.8, decided on the
    * ROUNDED value so both engines agree). */
  def effectSize(df: DataFrame, keyCols: Seq[String], groupCol: String,
                 valueCol: String, groupA: String, groupB: String): DataFrame = {
    require(keyCols.nonEmpty, "effectSize needs at least one key column")
    val agg = twoSampleSums(df, keyCols, groupCol, valueCol, groupA, groupB)
    val va = "((cast(__qa as double) - cast(__sa as double) * __sa / n_a) / (n_a - 1))"
    val vb = "((cast(__qb as double) - cast(__sb as double) * __sb / n_b) / (n_b - 1))"
    val sp2 = s"((cast(n_a - 1 as double) * $va + cast(n_b - 1 as double) * $vb) / cast(n_a + n_b - 2 as double))"
    val dTree = s"((cast(__sa as double) / n_a - cast(__sb as double) / n_b) / sqrt($sp2))"
    agg
      .withColumn("d_e6", expr(
        s"""case when n_a >= 2 and n_b >= 2 and $sp2 > 0 then
           |  cast(floor($dTree * 1000000 + 0.5) as bigint) end""".stripMargin))
      .withColumn("g_e6", expr(
        s"""case when n_a >= 2 and n_b >= 2 and $sp2 > 0 then
           |  cast(floor($dTree * (1.0 - 3.0 / (4.0 * cast(n_a + n_b as double) - 9.0))
           |    * 1000000 + 0.5) as bigint) end""".stripMargin))
      .withColumn("magnitude", expr(
        """case when d_e6 is null then null
          |when abs(d_e6) < 200000 then 'negligible'
          |when abs(d_e6) < 500000 then 'small'
          |when abs(d_e6) < 800000 then 'medium'
          |else 'large' end""".stripMargin))
      .drop("__sa", "__qa", "__sb", "__qb")
  }

  /** Per-key Mann–Whitney U z-test between two groups — the
    * NONPARAMETRIC location test completing the two-sample family
    * ([[welchTTest]] is the parametric side; [[ksDrift]] tests the whole
    * distribution). The STATISTIC is [[groupedAuc]]'s under a different
    * normalization (AUC = U/(n_a·n_b) — deliberately cross-referenced,
    * not hidden); what this adds is the HYPOTHESIS-TEST readout: the
    * tie-corrected null variance
    * `Var(U) = n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1)))` and the normal
    * z with a significance verdict.
    *
    * Exactness: midranks ride as EXACT integers on the value-count grid
    * (`2·midrank = 2·cum_before + c + 1`), so `2U_a = Σc_a·2mr −
    * n_a(n_a+1)` is exact BIGINT; the tie term `Σ(t³−t)` accumulates as
    * DECIMAL(38,0) (a fully-tied 10⁷-row key would wrap BIGINT); z is
    * ONE fixed double tree e4-quantized and the verdict flips on the
    * ROUNDED z. No continuity correction (documented — both engines
    * replay the same convention). Keys with an empty side or zero
    * variance (all values tied) emit null z and null verdict.
    *
    * Scale shape: one map-side-combined value-count aggregate, one
    * ordered window over the DISTINCT-VALUE grid (bin continuous values
    * upstream — the ksDrift dial), one per-key fold. Output: `(keys…,
    * n_a, n_b, u_x2, z_e4, significant)` — `u_x2 = 2·U_a` stays exact
    * where U itself may be half-integral under ties. */
  def mannWhitney(df: DataFrame, keyCols: Seq[String], groupCol: String,
                  valueCol: String, groupA: String, groupB: String): DataFrame = {
    require(keyCols.nonEmpty, "mannWhitney needs at least one key column")
    val k = keyCols.map(col)
    val g = col(groupCol)
    val x = col(valueCol).cast("long")
    val inA = g === groupA
    val inB = g === groupB
    val grid = dropNullKeys(df, keyCols)
      .filter((inA || inB) && g.isNotNull && x.isNotNull)
      .groupBy(k :+ x.as("__v"): _*)
      .agg(sum(when(inA, 1L).otherwise(0L)).as("__ca"),
        sum(when(inB, 1L).otherwise(0L)).as("__cb"))
    val w = Window.partitionBy(k: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withRank = grid
      .withColumn("__c", col("__ca") + col("__cb"))
      .withColumn("__mr2",
        lit(2L) * coalesce(sum(col("__c")).over(w), lit(0L)) + col("__c") + 1L)
    val agg = withRank.groupBy(k: _*)
      .agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"),
        sum(col("__ca") * col("__mr2")).as("__r2a"),
        sum(expr("cast(__c as decimal(38,0)) * __c * __c - __c")).as("__t3"))
    val vd = """(cast(n_a as double) * cast(n_b as double) / 12.0
               | * (cast(n_a + n_b + 1 as double)
               |    - cast(__t3 as double)
               |      / (cast(n_a + n_b as double) * cast(n_a + n_b - 1 as double))))"""
      .stripMargin.replaceAll("\n", " ")
    agg
      .withColumn("u_x2", expr("__r2a - n_a * (n_a + 1)"))
      .withColumn("z_e4", expr(
        s"""case when n_a > 0 and n_b > 0 and n_a + n_b > 1 and $vd > 0 then
           |  cast(floor(cast(u_x2 - n_a * n_b as double) / (2.0 * sqrt($vd))
           |             * 10000 + 0.5) as bigint)
           |end""".stripMargin))
      .withColumn("significant",
        when(col("z_e4").isNotNull, abs(col("z_e4")) > 19600L))
      .drop("__r2a", "__t3")
  }

  /** Per-key two-sample Cramér–von Mises statistic between groups —
    * the INTEGRATED-gap companion of [[ksDrift]]/[[mannWhitney]]'s
    * family: KS reads the single largest ECDF gap (sensitive to one
    * sharp local difference), CvM sums the SQUARED gap over every
    * pooled observation (sensitive to many small persistent ones —
    * the shape-drift case KS underweights):
    * `T = Σ_v c_v·(F_A(v) − F_B(v))² · nm/N²` over the pooled
    * value-count grid, asymptotic 5% critical 0.461.
    *
    * Integer-exact numerator (the ksDrift discipline, squared): the gap
    * rides as the cross-multiplied integer `Δ_v = cumA_v·n_b −
    * cumB_v·n_a`, each term `c_v·Δ_v²` accumulates as DECIMAL(38,0)
    * (Δ ≤ n_a·n_b wraps BIGINT past ~3·10⁹ rows when squared), and T
    * is ONE double division `Σ / (N²·n_a·n_b)` e6-quantized, verdict
    * on the ROUNDED value. Keys with an empty side emit null.
    *
    * Scale shape: one map-side-combined value-count aggregate, one
    * ordered window over the DISTINCT-VALUE grid (bin continuous
    * values upstream — the ksDrift dial), one per-key fold. Output:
    * `(keys…, n_a, n_b, t_e6, significant)`. */
  def cramerVonMises(df: DataFrame, keyCols: Seq[String], groupCol: String,
                     valueCol: String, groupA: String,
                     groupB: String): DataFrame = {
    require(keyCols.nonEmpty, "cramerVonMises needs at least one key column")
    val k = keyCols.map(col)
    val g = col(groupCol)
    val x = col(valueCol).cast("long")
    val inA = g === groupA
    val inB = g === groupB
    val grid = dropNullKeys(df, keyCols)
      .filter((inA || inB) && g.isNotNull && x.isNotNull)
      .groupBy(k :+ x.as("__v"): _*)
      .agg(sum(when(inA, 1L).otherwise(0L)).as("__ca"),
        sum(when(inB, 1L).otherwise(0L)).as("__cb"))
    cvmFromGrid(grid, keyCols)
  }

  /** The CvM readout over a per-(key, __v) side-count grid (`__ca`,
    * `__cb`) — ONE definition shared by the batch operator and the
    * streaming twin (whose complete-mode state IS this grid), the
    * nmiFromCells convention. */
  def cvmFromGrid(grid: DataFrame, keyCols: Seq[String]): DataFrame = {
    val k = keyCols.map(col)
    val wCum = Window.partitionBy(k: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(k: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    grid
      .withColumn("__cuma", sum(col("__ca")).over(wCum))
      .withColumn("__cumb", sum(col("__cb")).over(wCum))
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
      .withColumn("__term", expr(
        """cast(__ca + __cb as decimal(38,0))
          |  * (cast(__cuma as decimal(38,0)) * __nb
          |     - cast(__cumb as decimal(38,0)) * __na)
          |  * (cast(__cuma as decimal(38,0)) * __nb
          |     - cast(__cumb as decimal(38,0)) * __na)""".stripMargin
          .replaceAll("\n", " ")))
      .groupBy(k: _*)
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(col("__term")).as("__u"))
      .withColumn("t_e6", expr(
        """case when n_a > 0 and n_b > 0 then
          |  cast(floor(cast(__u as double)
          |    / (cast(n_a + n_b as double) * cast(n_a + n_b as double)
          |       * cast(n_a as double) * cast(n_b as double))
          |    * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
      .withColumn("significant",
        when(col("t_e6").isNotNull, col("t_e6") > 461000L))
      .drop("__u")
  }

  /** Per-key A/B histogram drift DISTANCES — 1-D earth-mover (Wasserstein-1)
    * and Hellinger, the two axes the existing drift family doesn't read:
    * [[ksDrift]] takes the MAX CDF gap (one bad bin dominates),
    * [[cramerVonMises]] integrates SQUARED gaps (rank-weighted),
    * [[psiFromCounts]] is log-ratio (explodes on near-empty bins) —
    * EMD is the mass-transport cost in VALUE units ("how far did the
    * distribution move", the metric regression alarms want) and
    * Hellinger is the bounded [0, 1] geometric overlap (stable when
    * bins empty out, unlike PSI). `W₁ = Σᵢ |F_A(vᵢ) − F_B(vᵢ)|·Δvᵢ`,
    * `H = √(1 − Σᵢ √(pᵢqᵢ))`.
    *
    * Exactness: the EMD numerator is the EXACT DECIMAL integer
    * `Σ |cumA·n_B − cumB·n_A|·Δv` (cross-multiplied CDFs — the ksDrift
    * discipline), ONE division e6-quantized; the Bhattacharyya terms
    * `√(c_A·c_B/(n_A·n_B))` are each ONE fixed double tree e9-quantized
    * to BIGINT before the order-independent sum (the nmiFromCells
    * discipline), and `H` is one tree over the ALREADY-QUANTIZED
    * integer BC, clamped at 0 before the sqrt (quantization can push
    * identical distributions a hair past 1). No proportion float ever
    * crosses a row boundary.
    *
    * Scale shape: value-grid-shaped after the map-side-combined cell
    * aggregate (bin continuous values upstream — the q281 contract);
    * ONE sort per key shared by the cumulative and lead windows.
    * Output: `(keys…, n_a, n_b, emd_e6, bc_e9, hellinger_e6)`; a key
    * with an empty side emits nulls. */
  def histogramDrift(df: DataFrame, keyCols: Seq[String], groupCol: String,
                     valueCol: String, groupA: String,
                     groupB: String): DataFrame = {
    require(keyCols.nonEmpty, "histogramDrift needs at least one key column")
    val k = keyCols.map(col)
    val g = col(groupCol)
    val x = col(valueCol).cast("long")
    val inA = g === groupA
    val inB = g === groupB
    val grid = dropNullKeys(df, keyCols)
      .filter((inA || inB) && g.isNotNull && x.isNotNull)
      .groupBy(k :+ x.as("__v"): _*)
      .agg(sum(when(inA, 1L).otherwise(0L)).as("__ca"),
        sum(when(inB, 1L).otherwise(0L)).as("__cb"))
    histDriftFromGrid(grid, keyCols)
  }

  /** The EMD + Hellinger readout over a per-(key, __v) side-count grid
    * (`__ca`, `__cb`) — ONE definition shared by the batch operator and
    * the streaming twin (whose complete-mode state IS this grid), the
    * [[cvmFromGrid]] convention. */
  def histDriftFromGrid(grid: DataFrame, keyCols: Seq[String]): DataFrame = {
    val k = keyCols.map(col)
    val wOrd = Window.partitionBy(k: _*).orderBy(col("__v"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(k: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    grid
      .withColumn("__cuma", sum(col("__ca")).over(wCum))
      .withColumn("__cumb", sum(col("__cb")).over(wCum))
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
      .withColumn("__dv",
        coalesce(lead(col("__v"), 1).over(wOrd) - col("__v"), lit(0L)))
      .withColumn("__emdt", expr(
        """abs(cast(__cuma as decimal(38,0)) * __nb
          |    - cast(__cumb as decimal(38,0)) * __na) * __dv""".stripMargin
          .replaceAll("\n", " ")))
      .withColumn("__bct", expr(
        """case when __na > 0 and __nb > 0 then
          |  cast(floor(sqrt(cast(__ca as double) * __cb
          |      / (cast(__na as double) * __nb))
          |    * 1000000000 + 0.5) as bigint)
          |else cast(0 as bigint) end""".stripMargin))
      .groupBy(k: _*)
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(col("__emdt")).as("__emd"), sum(col("__bct")).as("bc_e9"))
      .withColumn("emd_e6", expr(
        """case when n_a > 0 and n_b > 0 then
          |  cast(floor(cast(__emd as double)
          |    / (cast(n_a as double) * cast(n_b as double))
          |    * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
      .withColumn("bc_e9",
        when(col("n_a") > 0 && col("n_b") > 0, col("bc_e9")))
      .withColumn("hellinger_e6", expr(
        """case when n_a > 0 and n_b > 0 then
          |  cast(floor(sqrt(cast(greatest(0, 1000000000 - bc_e9) as double)
          |      / 1000000000.0)
          |    * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
      .select(k :+ col("n_a") :+ col("n_b") :+ col("emd_e6") :+
        col("bc_e9") :+ col("hellinger_e6"): _*)
  }

  /** Per-key one-way ANOVA F over an integer value column — the
    * k-GROUP extension of [[welchTTest]] (equal-variance, classic
    * Fisher form): `F = (SSB/(k−1)) / (SSW/(n−k))` with
    * `SSB = Σ_g S_g²/n_g − S²/n`, `SSW = Q − Σ_g S_g²/n_g`, plus the
    * effect size `η² = SSB/(SSB + SSW)` — "does the group label explain
    * the metric at all", the screen before per-pair tests.
    *
    * Exactness: per-group `(n_g, S_g, Q_g)` are exact integers; each
    * `S_g²/n_g` is FLOOR-QUANTIZED to an exact integer via BigInt
    * division (a grid-sized udf — groups per key, not rows; DuckDB
    * replays it as HUGEINT `//`), so `Σ_g ⌊S_g²/n_g⌋` is an
    * order-independent integer sum and SSB/SSW are exact integers under
    * a DOCUMENTED floor convention (each ⌊·⌋ loses < 1 — far below the
    * e4 grain of F). BIGINT bound, FAIL-LOUD (the kruskalWallis
    * convention): each `⌊S_g²/n_g⌋` and SSW = Q − Σ⌊S_g²/n_g⌋ must fit
    * 2⁶³ ≈ 9.2·10¹⁸ — at cents-scale values (~1.5·10⁷ e2) that is
    * ~4·10⁴ rows per group for the square and far more for SSW; past it
    * the operator RAISES (never silently truncates — BigInt.toLong
    * would wrap, a non-ANSI DECIMAL→BIGINT cast would null). Bin or
    * re-scale values upstream. F is one fixed double tree e4-quantized;
    * η² is an integer permille-style `div`.
    *
    * Keys with k < 2 groups or zero within variance emit null F.
    * Output: `(keys…, k_groups, n, ssb, ssw, f_e4, eta2_e6)`. */
  def anovaOneWay(df: DataFrame, keyCols: Seq[String], groupCol: String,
                  valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "anovaOneWay needs at least one key column")
    val k = keyCols.map(col)
    val x = col(valueCol).cast("long")
    val floorDiv = udf((s: Long, n: Long) => {
      val v = (BigInt(s) * s) / n
      require(v.isValidLong,
        "anovaOneWay group square exceeds 2^63 — bin/rescale values upstream")
      v.toLong
    })
    val perGroup = dropNullKeys(df, keyCols)
      .filter(col(groupCol).isNotNull && x.isNotNull)
      .select(k :+ col(groupCol).as("__g") :+ x.as("__x"): _*)
      .groupBy(k :+ col("__g"): _*)
      .agg(count(lit(1)).as("__ng"), sum(col("__x")).as("__sg"),
        sum(expr("cast(__x as decimal(38,0)) * __x")).as("__qg"))
      .withColumn("__tg", floorDiv(col("__sg"), col("__ng")))
    perGroup.groupBy(k: _*)
      .agg(count(lit(1)).as("k_groups"), sum(col("__ng")).as("n"),
        sum(col("__sg")).as("__s"), sum(col("__qg")).as("__q"),
        sum(col("__tg")).as("__st"))
      // clamp at 0: the floors can push an exactly-zero SSB a few units
      // negative, and negative integer div diverges cross-engine
      .withColumn("ssb",
        greatest(lit(0L), col("__st") - floorDiv(col("__s"), col("n"))))
      // fail loud past 2^63 — a bare DECIMAL→BIGINT cast would silently
      // null under non-ANSI Spark (the floorDiv require's SQL-side twin)
      .withColumn("ssw", expr(
        """cast(if(cast(__q - __st as decimal(38,0)) <= 9223372036854775807,
          |       cast(__q - __st as decimal(38,0)),
          |       cast(raise_error(
          |         'anovaOneWay SSW exceeds 2^63 — bin/rescale values upstream')
          |            as decimal(38,0))) as bigint)""".stripMargin))
      .withColumn("f_e4", expr(
        """case when k_groups >= 2 and n > k_groups and ssw > 0 then
          |  cast(floor((cast(ssb as double) / cast(k_groups - 1 as double))
          |    / (cast(ssw as double) / cast(n - k_groups as double))
          |    * 10000 + 0.5) as bigint)
          |end""".stripMargin))
      // DECIMAL widening (the cohenKappa pe discipline): ssb·10⁶ wraps
      // BIGINT past ssb ≈ 9·10¹² — cents-scale squared sums get there
      .withColumn("eta2_e6", expr(
        """case when ssb + ssw > 0 then
          |  cast(cast(ssb as decimal(38,0)) * 1000000
          |       div (cast(ssb as decimal(38,0)) + ssw) as bigint)
          |end""".stripMargin))
      .drop("__s", "__q", "__st")
  }

  /** Studentized-range 5% critical values q(0.05; k, ∞), e4-quantized,
    * k = 2..10 (Harter 1960's table, the df→∞ row — the big-data
    * regime where N−k dwarfs any table df) — ONE literal table feeding
    * both engines (the obfBoundariesE4 precedent). */
  def tukeyQCritInfE4(k: Int): Long = {
    require(k >= 2 && k <= 10,
      s"tukeyQCritInfE4 inlines k in [2,10], got $k — extend the table")
    Seq(27718L, 33145L, 36332L, 38577L, 40301L,
      41696L, 42869L, 43866L, 44745L)(k - 2)
  }

  /** Tukey HSD pairwise comparisons after [[anovaOneWay]] — WHICH
    * groups differ once the F says "some do" (Tukey 1949): for every
    * group pair, the studentized range statistic
    * `q = |ȳ_a − ȳ_b| / √(MSW/2 · (1/n_a + 1/n_b))` (the
    * Tukey–Kramer unequal-n form) against the shared q(0.05; k, ∞)
    * critical value — the family-wise-safe follow-up the per-pair
    * Welch tests (q222) are not.
    *
    * Exactness (the anovaOneWay discipline): per-group moments are
    * exact integers; `Σ_g ⌊S_g²/n_g⌋` uses the same BigInt-guarded
    * floor so SSW is an exact integer; MSW, each mean, and q are ONE
    * fixed double tree each, q e4-quantized with the verdict on the
    * ROUNDED value against the literal [[tukeyQCritInfE4]] ladder.
    * Pairs come from the k-row group table (grid-sized self-join).
    * Groups with n < 2, or a zero MSW, null every q. Output: one row
    * per unordered pair — `(g_a, g_b, n_a, n_b, diff_e6, q_e4,
    * q_crit_e4, significant)`. */
  def tukeyHsd(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    val floorDiv = udf((s: Long, n: Long) => {
      val v = (BigInt(s) * s) / n
      require(v.isValidLong,
        "tukeyHsd group square exceeds 2^63 — bin/rescale values upstream")
      v.toLong
    })
    val perGroup = df
      .filter(col(groupCol).isNotNull && x.isNotNull)
      .select(col(groupCol).as("__g"), x.as("__x"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__ng"), sum(col("__x")).as("__sg"),
        sum(expr("cast(__x as decimal(38,0)) * __x")).as("__qg"))
      .withColumn("__tg", floorDiv(col("__sg"), col("__ng")))
      .localCheckpoint(false)
    val tot = perGroup.agg(
      count(lit(1)).as("__k"), sum(col("__ng")).as("__n"),
      sum(col("__qg")).as("__q"), sum(col("__tg")).as("__st"),
      min(col("__ng")).as("__minn"))
      .withColumn("__ssw", expr(
        """cast(if(cast(__q - __st as decimal(38,0)) <= 9223372036854775807,
          |       cast(__q - __st as decimal(38,0)),
          |       cast(raise_error(
          |         'tukeyHsd SSW exceeds 2^63 — bin/rescale values upstream')
          |            as decimal(38,0))) as bigint)""".stripMargin))
    val kCount = tot.head().getLong(0).toInt
    val critE4 = tukeyQCritInfE4(math.max(2, kCount))
    val pairs = perGroup.as("a").join(perGroup.as("b"),
        col("a.__g") < col("b.__g"))
      .select(col("a.__g").as("g_a"), col("b.__g").as("g_b"),
        col("a.__ng").as("n_a"), col("b.__ng").as("n_b"),
        col("a.__sg").as("__sa"), col("b.__sg").as("__sb"))
      .crossJoin(broadcast(tot.select(col("__k"), col("__n"), col("__ssw"),
        col("__minn"))))
    val msw = "(cast(__ssw as double) / cast(__n - __k as double))"
    val diff = "(cast(__sa as double) / n_a - cast(__sb as double) / n_b)"
    val se = s"sqrt($msw / 2.0 * (1.0 / n_a + 1.0 / n_b))"
    pairs
      .withColumn("diff_e6",
        expr(s"cast(floor($diff * 1000000 + 0.5) as bigint)"))
      .withColumn("q_e4", expr(
        s"""case when __k >= 2 and __n > __k and __ssw > 0 and __minn >= 2
           |then cast(floor(abs($diff) / $se * 10000 + 0.5) as bigint)
           |end""".stripMargin))
      .withColumn("q_crit_e4", lit(critE4))
      .withColumn("significant",
        when(col("q_e4").isNotNull, col("q_e4") > col("q_crit_e4")))
      .select("g_a", "g_b", "n_a", "n_b", "diff_e6", "q_e4", "q_crit_e4",
        "significant")
  }

  /** Cochran–Mantel–Haenszel test over STRATIFIED 2×2 tables (Mantel &
    * Haenszel 1959) — "is exposure associated with outcome once the
    * stratifying confounder is held fixed": per stratum the exposed-
    * positive cell `a` is compared to its hypergeometric expectation,
    * `CMH = (Σa − ΣE)² / ΣV` with `E = n₁m₁/N`,
    * `V = n₁n₂m₁m₂/(N²(N−1))`, against χ²(1) (5% critical 3.8415).
    * The contingency tier's confounder-safe member: q297's χ² pools
    * strata (Simpson's-paradox-blind); this one conditions on them.
    * Uncorrected form, documented — both engines replay it.
    *
    * Exactness (the bartlett per-group discipline): per-stratum counts
    * are exact integers off one conditional aggregate; E and V are ONE
    * fixed double tree each, e6-quantized to DECIMAL(38,0) via the
    * q349 floor identity, so the cross-strata sums are order-free
    * exact integers; the statistic is one double tree e4-quantized,
    * verdict on the ROUNDED value. Degenerate strata (N < 2) drop
    * loudly into `n_degenerate`; zero ΣV nulls the statistic.
    * Output: ONE row — `(k_strata, n_degenerate, n_total, sum_a,
    * cmh_e4, significant)`. */
  def cmhTest(df: DataFrame, strataCol: String, exposureCol: String,
              outcomeCol: String): DataFrame =
    cmhFromStrata(cmhStrata(df, strataCol, exposureCol, outcomeCol))

  /** The per-stratum 2×2 count grid behind [[cmhTest]] — split out (the
    * didMoments factoring) so the STREAMING twin can hold exactly this
    * strata-bounded grid as complete-mode state and share
    * [[cmhFromStrata]]'s readout. */
  def cmhStrata(df: DataFrame, strataCol: String, exposureCol: String,
                outcomeCol: String): DataFrame = {
    val e = col(exposureCol)
    val o = col(outcomeCol)
    df
      .filter(col(strataCol).isNotNull && e.isNotNull && o.isNotNull)
      .groupBy(col(strataCol))
      .agg(
        sum(when(e && o, 1L).otherwise(0L)).as("__a"),
        sum(when(e, 1L).otherwise(0L)).as("__n1"),
        sum(when(!e, 1L).otherwise(0L)).as("__n2"),
        sum(when(o, 1L).otherwise(0L)).as("__m1"),
        sum(when(!o, 1L).otherwise(0L)).as("__m2"),
        count(lit(1)).as("__nn"))
  }

  /** CMH readout over a [[cmhStrata]] grid — the single shared
    * implementation batch and twin both call, so parity cannot drift. */
  def cmhFromStrata(strata: DataFrame): DataFrame = {
    val eTree = "(cast(__n1 as double) * cast(__m1 as double) / cast(__nn as double))"
    val vTree = "(cast(__n1 as double) * cast(__n2 as double)" +
      " * cast(__m1 as double) * cast(__m2 as double)" +
      " / (cast(__nn as double) * cast(__nn as double) * cast(__nn - 1 as double)))"
    def floorDec(t: String) = // the q349 exact floor identity (t >= 0)
      s"""if($t * 1000000 >= 1e24,
         |   cast(raise_error('cmhTest per-stratum term >= 1e24 —
         | split strata upstream') as decimal(38,0)),
         |   cast(($t * 1000000 + 0.5) - (($t * 1000000 + 0.5) % 1.0D)
         |     as decimal(38,0)))""".stripMargin.replaceAll("\n", " ")
    strata
      .withColumn("__ok", col("__nn") >= 2L)
      .withColumn("__e6", when(col("__ok"), expr(floorDec(eTree))))
      .withColumn("__v6", when(col("__ok"), expr(floorDec(vTree))))
      .agg(
        count(when(col("__ok"), 1)).as("k_strata"),
        count(when(!col("__ok"), 1)).as("n_degenerate"),
        coalesce(sum(when(col("__ok"), col("__nn"))), lit(0L)).as("n_total"),
        coalesce(sum(when(col("__ok"), col("__a"))), lit(0L)).as("sum_a"),
        sum(col("__e6")).as("__se"), sum(col("__v6")).as("__sv"))
      .withColumn("cmh_e4", expr(
        """case when k_strata >= 1 and __sv > 0 then
          |  cast(floor(
          |    cast(cast(sum_a as decimal(38,0)) * 1000000 - __se as double)
          |    * cast(cast(sum_a as decimal(38,0)) * 1000000 - __se as double)
          |    / (cast(__sv as double) * 1000000.0)
          |    * 10000 + 0.5) as bigint) end""".stripMargin))
      .withColumn("significant",
        when(col("cmh_e4").isNotNull, col("cmh_e4") > 38415L))
      .select("k_strata", "n_degenerate", "n_total", "sum_a", "cmh_e4",
        "significant")
  }

  /** Per-key McNemar test over two PAIRED boolean columns — "do the two
    * classifiers/filters disagree SYMMETRICALLY" (the paired complement
    * of [[cohenKappa]]'s agreement rate: kappa says how often they
    * agree, McNemar says whether the disagreements lean one way):
    * `χ² = (b − c)²/(b + c)` over the discordant counts `b = |A ∧ ¬B|`,
    * `c = |¬A ∧ B|`. Uncorrected form (documented — both engines replay
    * the same convention); df = 1, 5% critical 3.8415.
    *
    * Exactness: b and c are exact integers from one map-side-combined
    * aggregate; `(b−c)²` widens through DECIMAL(38,0) (b, c can be
    * ~10⁹+ rows); χ² is a single double division e4-quantized with the
    * verdict on the ROUNDED value. Keys with no discordant pair emit
    * null (the test is undefined — agreement says nothing here).
    * Output: `(keys…, n, b_count, c_count, chi2_e4, significant)`. */
  def mcnemar(df: DataFrame, keyCols: Seq[String], aCol: String,
              bCol: String): DataFrame = {
    require(keyCols.nonEmpty, "mcnemar needs at least one key column")
    val a = col(aCol)
    val b = col(bCol)
    dropNullKeys(df, keyCols)
      .filter(a.isNotNull && b.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(a && !b, 1L).otherwise(0L)).as("b_count"),
        sum(when(!a && b, 1L).otherwise(0L)).as("c_count"))
      .withColumn("chi2_e4", expr(
        """case when b_count + c_count > 0 then
          |  cast(floor(cast(cast(b_count - c_count as decimal(38,0))
          |                  * (b_count - c_count) as double)
          |    / cast(b_count + c_count as double) * 10000 + 0.5) as bigint)
          |end""".stripMargin))
      .withColumn("significant",
        when(col("chi2_e4").isNotNull, col("chi2_e4") > 38415L))
  }

  /** Per-key index of dispersion over an integer count column — the
    * Poisson burstiness screen for count data (`D = s²/x̄`; a Poisson
    * process has D = 1, bursty/clumped arrivals D > 1): decides whether
    * a rate CI can use the Poisson/normal shortcut or the data is
    * overdispersed and needs [[graft.operators.MonteCarlo.poissonBootstrapCi]]
    * instead. Test: `(n−1)·D ~ χ²(n−1)`, one-sided 5% flag via the
    * Wilson–Hilferty-free normal tail `χ² > (n−1) + 1.645·√(2(n−1))`.
    *
    * Exactness: `(n−1)·s²·n = n·Σc² − (Σc)²` — the dispersion statistic
    * is the exact integer ratio `(n·Σc² − (Σc)²)/((n−1)·Σc)` (DECIMAL
    * numerator); D, χ², and the threshold are one fixed double tree
    * each, e4-quantized, verdict on the ROUNDED χ². Keys with n < 2 or
    * Σc = 0 emit nulls. Output: `(keys…, n_units, mean_e6, d_e4,
    * chi2_e4, overdispersed)`. */
  def dispersionIndex(df: DataFrame, keyCols: Seq[String],
                      countCol: String): DataFrame = {
    require(keyCols.nonEmpty, "dispersionIndex needs at least one key column")
    val c = col(countCol).cast("long")
    val sums = dropNullKeys(df, keyCols)
      .filter(c.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_units"), sum(c).as("__s"),
        sum(expr(s"cast(cast(`$countCol` as bigint) as decimal(38,0)) * cast(`$countCol` as bigint)"))
          .as("__q"))
    val num = "(cast(n_units as decimal(38,0)) * __q - cast(__s as decimal(38,0)) * __s)"
    val chi2 = s"(cast($num as double) / cast(__s as double))"
    sums
      .withColumn("mean_e6", expr("__s * 1000000 div n_units"))
      .withColumn("d_e4", expr(
        s"""case when n_units >= 2 and __s > 0 then
           |  cast(floor($chi2 / cast(n_units - 1 as double) * 10000 + 0.5)
           |       as bigint) end""".stripMargin))
      .withColumn("chi2_e4", expr(
        s"""case when n_units >= 2 and __s > 0 then
           |  cast(floor($chi2 * 10000 + 0.5) as bigint) end""".stripMargin))
      .withColumn("overdispersed", expr(
        s"""case when chi2_e4 is not null then
           |  cast(chi2_e4 as double) / 10000.0 >
           |    cast(n_units - 1 as double)
           |      + 1.645 * sqrt(2.0 * cast(n_units - 1 as double))
           |end""".stripMargin))
      .drop("__s", "__q")
  }

  /** The four e12-quantized SPRT constants for [[sprtBernoulli]] —
    * per-success / per-failure LLR increments and the two Wald decision
    * thresholds. Computed ONCE driver-side and inlined into both
    * engines (the dftTableE15 convention: no log evaluates at query
    * time anywhere, so the crossing tests are pure integer
    * comparisons). */
  def sprtConstantsE12(p0: Double, p1: Double, alphaPermille: Int,
                       betaPermille: Int): (Long, Long, Long, Long) = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"need distinct p0, p1 in (0, 1), got $p0, $p1")
    require(alphaPermille >= 1 && alphaPermille <= 500, s"bad alpha $alphaPermille")
    require(betaPermille >= 1 && betaPermille <= 500, s"bad beta $betaPermille")
    val a = alphaPermille / 1000.0
    val b = betaPermille / 1000.0
    def q(x: Double) = math.floor(x * 1e12 + 0.5).toLong
    (q(math.log(p1 / p0)), q(math.log((1 - p1) / (1 - p0))),
      q(math.log((1 - b) / a)), q(math.log(b / (1 - a))))
  }

  /** Per-key Wald SPRT over an ordered Bernoulli stream — the
    * SEQUENTIAL A/B readout ([[graft.operators.Funnel.funnelVariantZ]]
    * is the fixed-horizon test; this is the peeking-safe one: stop the
    * moment the evidence crosses a Wald boundary, with α/β guaranteed
    * by construction): H₀: p = p0 vs H₁: p = p1, accept H₁ when
    * `LLR ≥ ln((1−β)/α)`, accept H₀ when `LLR ≤ ln(β/(1−α))`.
    *
    * Exactness: the LLR after t observations is LINEAR in the success/
    * failure counts — `LLR = a·ln(p1/p0) + b·ln((1−p1)/(1−p0))` — so
    * with the four constants e12-quantized driver-side
    * ([[sprtConstantsE12]], inlined into BOTH engines) every partial
    * LLR is an EXACT DECIMAL integer and the first-crossing argmin is
    * pure integer comparison; no transcendental ever evaluates at
    * query time. Ties on `orderCol` break by `tieCols` (the bhCorrect
    * totality convention).
    *
    * Scale shape (round 17 — the [[graft.operators.SegmentedOrder]]
    * rewrite): the LLR after t observations is linear in `(a, t)`, so
    * each row's LLR is exactly reconstructible from its bucket's
    * ENTERING prefix `(rows-before, successes-before)` plus the
    * intra-bucket running counts. Rows bucket into ≤1024 order-range
    * segments per key; per-bucket (trials, successes) aggregates feed a
    * buckets-sized prefix window; the single row-scale window runs per
    * (key, bucket) — parallelism keys × buckets instead of one serial
    * sort task per key (the 100× sweep's q292 owner: 6 event types ×
    * 10M rows = 25 s on 32 mostly-idle cores). The final LLR needs no
    * row at all (linear in the per-key totals). Output: `(keys…,
    * n_total, decision 'accept_h1'|'accept_h0'|'continue', n_decision,
    * llr_final_e12)` — `n_decision` is the observation index at the
    * FIRST crossing (null while continuing). */
  def sprtBernoulli(df: DataFrame, keyCols: Seq[String], orderCol: String,
                    successCol: String, p0: Double, p1: Double,
                    alphaPermille: Int = 50, betaPermille: Int = 100,
                    tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "sprtBernoulli needs at least one key column")
    val (l1, l0, hi, lo) =
      sprtConstantsE12(p0, p1, alphaPermille, betaPermille)
    val k = keyCols.map(col)
    val s = col(successCol)
    val ordCols = col(orderCol) +: tieCols.map(col)
    val base = dropNullKeys(df, keyCols)
      .filter(s.isNotNull && col(orderCol).isNotNull)
    // lazy localCheckpoint (the q170 cells pattern): the bucketed rows
    // feed BOTH the per-bucket totals and the crossing pass — without
    // the cut, the scan + stats broadcast join recomputes per consumer
    val rows = graft.operators.SegmentedOrder.withBuckets(
      base.select(k ++ ordCols :+ s.as("__s"): _*),
      keyCols, graft.operators.SegmentedOrder.leadOf(base, orderCol))
      .localCheckpoint(false)
    // per-bucket totals -> buckets-sized entering prefixes (exclusive)
    val bt = rows.groupBy(k :+ col("__bkt"): _*)
      .agg(count(lit(1)).as("__bn"),
        sum(when(col("__s"), 1L).otherwise(0L)).as("__ba"))
    val wKexc = Window.partitionBy(k: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = bt
      .withColumn("__rnIn", coalesce(sum(col("__bn")).over(wKexc), lit(0L)))
      .withColumn("__aIn", coalesce(sum(col("__ba")).over(wKexc), lit(0L)))
      .select(k :+ col("__bkt") :+ col("__rnIn") :+ col("__aIn"): _*)
    val wB = Window.partitionBy(k :+ col("__bkt"): _*).orderBy(ordCols: _*)
    val wBC = wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val crossed = rows
      .join(broadcast(pre), keyCols :+ "__bkt")
      .withColumn("__rn", col("__rnIn") + row_number().over(wB))
      .withColumn("__a",
        col("__aIn") + sum(when(col("__s"), 1L).otherwise(0L)).over(wBC))
      .withColumn("__llr", expr(
        s"cast(__a as decimal(38,0)) * ${l1}L + cast(__rn - __a as decimal(38,0)) * ${l0}L"))
      .withColumn("__cross", expr(
        s"case when __llr >= ${hi}L then 1 when __llr <= ${lo}L then -1 else 0 end"))
    val firsts = crossed.groupBy(k: _*)
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("__s"), 1L).otherwise(0L)).as("__aTot"),
        // struct min = lexicographic on (__rn, __cross); __rn unique per
        // key, so this IS the first crossing's (index, direction)
        min(when(col("__cross") =!= 0,
          struct(col("__rn").as("rn"), col("__cross").as("c")))).as("__fc"))
    firsts
      .withColumn("decision", expr(
        """case when __fc.c = 1 then 'accept_h1'
          |when __fc.c = -1 then 'accept_h0'
          |else 'continue' end""".stripMargin))
      .withColumn("n_decision", col("__fc.rn").cast("long"))
      // LLR at the last observation is linear in the per-key totals —
      // the same decimal tree, no row access needed
      .withColumn("llr_final_e12", expr(
        s"cast(cast(__aTot as decimal(38,0)) * ${l1}L" +
          s" + cast(n_total - __aTot as decimal(38,0)) * ${l0}L as bigint)"))
      .select(k :+ col("n_total") :+ col("decision") :+ col("n_decision") :+
        col("llr_final_e12"): _*)
  }

  /** Per-key Wilson score interval for a conversion rate — the CI that
    * should replace the naive Wald `p̂ ± z√(p̂(1−p̂)/n)` everywhere (Wald
    * collapses to width 0 at p̂ ∈ {0, 1} and escapes [0, 1]; Wilson
    * stays honest at extreme rates and small n — exactly the rare-event
    * corners a funnel readout lives in):
    * `(p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)` at z = 1.96.
    *
    * Exactness: n and x are one map-side-combined exact aggregate; the
    * bounds are ONE fixed double tree each over the two integers,
    * e6-quantized; the point rate is the exact integer `x·10⁶ div n`.
    * Output: `(keys…, n, x, rate_e6, lo_e6, hi_e6)`; n = 0 keys are
    * absent by construction. */
  def wilsonCi(df: DataFrame, keyCols: Seq[String],
               successCol: String): DataFrame = {
    require(keyCols.nonEmpty, "wilsonCi needs at least one key column")
    val s = col(successCol)
    val z = "1.96"
    val p = "(cast(x as double) / cast(n as double))"
    val den = s"(1.0 + $z * $z / cast(n as double))"
    val ctr = s"($p + $z * $z / (2.0 * cast(n as double)))"
    val rad = s"($z * sqrt($p * (1.0 - $p) / cast(n as double) + $z * $z / (4.0 * cast(n as double) * cast(n as double))))"
    dropNullKeys(df, keyCols)
      .filter(s.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(s, 1L).otherwise(0L)).as("x"))
      .withColumn("rate_e6", expr("x * 1000000 div n"))
      .withColumn("lo_e6", expr(
        s"cast(floor(($ctr - $rad) / $den * 1000000 + 0.5) as bigint)"))
      .withColumn("hi_e6", expr(
        s"cast(floor(($ctr + $rad) / $den * 1000000 + 0.5) as bigint)"))
  }

  /** Per-key Jarque–Bera normality test over an integer value column —
    * the assumption screen UNDER the parametric tier ([[welchTTest]],
    * [[anovaOneWay]], OLS t-stats all quietly assume roughly normal
    * residuals; JB is the moment test that says when to reach for the
    * rank tests instead): `JB = n/6·(S² + (K−3)²/4)` over sample
    * skewness S and kurtosis K, χ²(2) 5% critical 5.9915.
    *
    * Exactness + CANCELLATION discipline: raw power sums of cents-scale
    * values lose the central moments to catastrophic cancellation
    * (μ⁴ ≫ m4), so this is TWO passes — the integer per-key mean
    * `c = Σx div n` joins back (grid-sized broadcast) and the moment
    * sums accumulate over the SHIFTED values `d = x − c` as exact
    * DECIMAL(38,0) (central moments are exactly shift-invariant, and
    * d ~ σ keeps d⁴ sums ~10³⁷ at a billion rows instead of 10⁴⁰+).
    * Skewness, kurtosis, and JB are then ONE fixed double tree each
    * over the five exact sums, e6/e4-quantized, verdict on the ROUNDED
    * statistic. Keys with n < 4 or zero variance emit nulls.
    *
    * Scale shape: two map-side-combined aggregates over two scans (the
    * mean cannot fold into its own shift); everything after is
    * grid-sized. Output: `(keys…, n, skew_e6, kurt_e6, jb_e4,
    * significant)`. */
  def jarqueBera(df: DataFrame, keyCols: Seq[String],
                 valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "jarqueBera needs at least one key column")
    val k = keyCols.map(col)
    val x = col(valueCol).cast("long")
    val base = dropNullKeys(df, keyCols).filter(x.isNotNull)
      .select(k :+ x.as("__x"): _*)
    val means = base.groupBy(k: _*)
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"))
      .withColumn("__c", expr("__sx div __n"))
      .select(k :+ col("__c"): _*)
    val sums = base.join(broadcast(means), keyCols)
      .withColumn("__d", col("__x") - col("__c"))
      .groupBy(k: _*)
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(__d as decimal(38,0))")).as("__s1"),
        sum(expr("cast(__d as decimal(38,0)) * __d")).as("__s2"),
        sum(expr("cast(__d as decimal(38,0)) * __d * __d")).as("__s3"),
        sum(expr("cast(__d as decimal(38,0)) * __d * __d * __d")).as("__s4"))
    // the fixed trees: μ = S1/n (small), central m2/m3/m4 via the shift
    // expansion — spelled once, mirrored literally in the oracle
    val mu = "(cast(__s1 as double) / cast(n as double))"
    val m2 = s"(cast(__s2 as double) / cast(n as double) - $mu * $mu)"
    val m3 = s"(cast(__s3 as double) / cast(n as double) - 3.0 * $mu * (cast(__s2 as double) / cast(n as double)) + 2.0 * $mu * $mu * $mu)"
    val m4 = s"(cast(__s4 as double) / cast(n as double) - 4.0 * $mu * (cast(__s3 as double) / cast(n as double)) + 6.0 * $mu * $mu * (cast(__s2 as double) / cast(n as double)) - 3.0 * $mu * $mu * $mu * $mu)"
    val sk = s"($m3 / power($m2, 1.5))"
    val ku = s"($m4 / ($m2 * $m2))"
    sums
      .withColumn("skew_e6", expr(
        s"""case when n >= 4 and $m2 > 0 then
           |  cast(floor($sk * 1000000 + 0.5) as bigint) end""".stripMargin))
      .withColumn("kurt_e6", expr(
        s"""case when n >= 4 and $m2 > 0 then
           |  cast(floor($ku * 1000000 + 0.5) as bigint) end""".stripMargin))
      .withColumn("jb_e4", expr(
        s"""case when n >= 4 and $m2 > 0 then
           |  cast(floor(cast(n as double) / 6.0
           |    * ($sk * $sk + ($ku - 3.0) * ($ku - 3.0) / 4.0)
           |    * 10000 + 0.5) as bigint) end""".stripMargin))
      .withColumn("significant",
        when(col("jb_e4").isNotNull, col("jb_e4") > 59915L))
      .drop("__s1", "__s2", "__s3", "__s4")
  }

  /** Per-key Fisher EXACT test on the 2×2 table of two boolean columns
    * — the small-table / rare-margin member completing the contingency
    * tier ([[mcnemar]] is paired, [[cochranArmitage]] is ordered-dose,
    * `Profile.chiSquare` is the large-n approximation this test
    * replaces when a margin is thin and the χ² expected-count
    * assumption fails). Two-sided, R's `fisher.test` convention: sum
    * the hypergeometric probabilities of every table as-or-less
    * probable than the observed one, with the relative tie tolerance
    * `P(k) ≤ P(obs)·(1 + 10⁻⁷)`.
    *
    * NO UDF AND NO RECURSION — the whole hypergeometric support is a
    * grid: explode `k = kmin..kmax`, write each step's LOG likelihood
    * ratio `ln((r1−k+1)(c1−k+1) / (k(n−r1−c1+k)))` as one fixed double
    * tree e15-quantized to an INTEGER, cumulative-sum those integers
    * (exact DECIMAL — order-free, unlike a float cumsum, which DuckDB's
    * segment-tree windows would re-associate), shift by the window max
    * and exponentiate ONCE per row, e15-quantize again so the
    * normalizing sums are integer and order-independent, and read
    * `p = Σ_selected / Σ_all` as exact integer division e9-quantized.
    * The tie tolerance is the pure integer comparison
    * `q·10⁷ ≤ q_obs·(10⁷+1)` on the quantized likelihoods. Working in
    * logs off a unit start (t(kmin) = 1) sidesteps both the huge
    * binomials (a BigInt Fisher caps at n ≈ 100 for a HUGEINT oracle)
    * and double overflow at the mode.
    *
    * Scale shape: ONE map-side-combined count aggregate; everything
    * after lives on the keys×range grid. `maxRange` caps the support
    * rows (`min(r1,c1)` + 1) and FAILS LOUD past it — at dense margins
    * the right tool is the χ² limit, not a bigger grid. Output:
    * `(keys…, n, n11, r1, c1, p_e9, significant)`. */
  def fisherExact(df: DataFrame, keyCols: Seq[String], aCol: String,
                  bCol: String, maxRange: Int = 10000): DataFrame = {
    require(keyCols.nonEmpty, "fisherExact needs at least one key column")
    require(maxRange >= 1, s"maxRange must be positive, got $maxRange")
    val k = keyCols.map(col)
    val a = col(aCol)
    val b = col(bCol)
    val counts = dropNullKeys(df, keyCols)
      .filter(a.isNotNull && b.isNotNull)
      .groupBy(k: _*)
      .agg(count(lit(1)).as("n"),
        sum(when(a && b, 1L).otherwise(0L)).as("n11"),
        sum(when(a && !b, 1L).otherwise(0L)).as("n10"),
        sum(when(!a && b, 1L).otherwise(0L)).as("n01"))
      .withColumn("r1", col("n11") + col("n10"))
      .withColumn("c1", col("n11") + col("n01"))
      .withColumn("__kmin", greatest(lit(0L), col("c1") - (col("n") - col("r1"))))
      // the fail-loud cap rides INSIDE the sequence bound so column
      // pruning cannot drop it
      .withColumn("__kmax", expr(
        s"""if(least(r1, c1) - greatest(0L, c1 - (n - r1)) < $maxRange,
           |   least(r1, c1),
           |   cast(raise_error(
           |     'fisherExact support exceeds maxRange — use chiSquare at dense margins')
           |        as bigint))""".stripMargin))
    val grid = counts
      .select(k ++ Seq(col("n"), col("n11"), col("r1"), col("c1"),
        col("__kmin"), explode(expr("sequence(__kmin, __kmax)")).as("__k")): _*)
      .withColumn("__lr15", expr(
        """case when __k = __kmin then cast(0 as bigint) else
          |  cast(floor(
          |    ln((cast(r1 - __k + 1 as double) * cast(c1 - __k + 1 as double))
          |       / (cast(__k as double) * cast(n - r1 - c1 + __k as double)))
          |    * 1000000000000000 + 0.5) as bigint)
          |end""".stripMargin))
    val wCum = Window.partitionBy(k: _*).orderBy(col("__k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(k: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val lik = grid
      .withColumn("__lnt", sum(expr("cast(__lr15 as decimal(38,0))")).over(wCum))
      .withColumn("__lmax", max(col("__lnt")).over(wAll))
      .withColumn("__q", expr(
        """cast(floor(exp(cast(__lnt - __lmax as double) / 1000000000000000.0)
          |  * 1000000000000000 + 0.5) as bigint)""".stripMargin))
      .withColumn("__qobs", max(when(col("__k") === col("n11"), col("__q"))).over(wAll))
    lik
      .withColumn("__sel", expr(
        "cast(__q as decimal(38,0)) * 10000000 <= cast(__qobs as decimal(38,0)) * 10000001"))
      .groupBy(k: _*)
      .agg(max(col("n")).as("n"), max(col("n11")).as("n11"),
        max(col("r1")).as("r1"), max(col("c1")).as("c1"),
        sum(expr("cast(__q as decimal(38,0))")).as("__den"),
        sum(expr("case when __sel then cast(__q as decimal(38,0)) else cast(0 as decimal(38,0)) end"))
          .as("__num"))
      .withColumn("p_e9", expr(
        """case when __den > 0 then
          |  cast((__num * 2000000000 + __den) div (2 * __den) as bigint)
          |end""".stripMargin))
      .withColumn("significant",
        when(col("p_e9").isNotNull, col("p_e9") < 50000000L))
      .drop("__den", "__num")
  }

  /** Per-key Cochran's Q test over k PAIRED boolean classifier columns
    * — [[mcnemar]] generalized beyond two: "do these k filters/taggers
    * pass different fractions of the same items" (the pre-check before
    * trusting any one of an ensemble):
    * `Q = k(k−1)·Σ_j(C_j − T/k)² / (k·T − Σ_i R_i²)` with `C_j` the
    * per-classifier pass totals, `R_i` each item's pass count,
    * `T = ΣR_i`; `Q ~ χ²(k−1)`, caller-supplied 5% critical.
    *
    * Exactness: ONE map-side-combined aggregate carries every
    * sufficient statistic as exact integers (`Σ_j C_j²` and `ΣR_i²`
    * widen through DECIMAL(38,0)); the numerator identity
    * `k·ΣC_j² − T²` avoids the fractional mean entirely, so Q is one
    * fixed double tree over exact integers, e4-quantized, verdict on
    * the ROUNDED value. Items with any null column drop (paired test —
    * every classifier must have voted). Keys where all items agree on
    * everything (denominator 0) emit null. Output: `(keys…, n_items,
    * q_e4, crit5_e4, significant)`. */
  def cochranQ(df: DataFrame, keyCols: Seq[String], classifierCols: Seq[String],
               crit5E4: Long = 59915L): DataFrame = {
    require(keyCols.nonEmpty, "cochranQ needs at least one key column")
    require(classifierCols.size >= 3,
      "cochranQ needs k >= 3 classifiers (use mcnemar for k = 2)")
    val kk = classifierCols.size
    val r = classifierCols.map(c => when(col(c), 1L).otherwise(0L)).reduce(_ + _)
    val sums = dropNullKeys(df, keyCols)
      .filter(classifierCols.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__r", r)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_items"),
        (sum(expr("cast(__r as decimal(38,0))")).as("__t") +:
          sum(expr("cast(__r as decimal(38,0)) * __r")).as("__r2") +:
          classifierCols.zipWithIndex.map { case (c, i) =>
            sum(when(col(c), 1L).otherwise(0L)).as(s"__c$i")
          }): _*)
    val sc2 = classifierCols.indices
      .map(i => s"cast(__c$i as decimal(38,0)) * __c$i").mkString(" + ")
    val num = s"(cast($kk as decimal(38,0)) * ($sc2) - __t * __t)"
    val den = s"(cast($kk as decimal(38,0)) * __t - __r2)"
    sums
      .withColumn("q_e4", expr(
        s"""case when $den > 0 then
           |  cast(floor(cast(${kk - 1} as double) * cast($num as double)
           |    / cast($den as double) * 10000 + 0.5) as bigint)
           |end""".stripMargin))
      .withColumn("crit5_e4", lit(crit5E4))
      .withColumn("significant",
        when(col("q_e4").isNotNull, col("q_e4") > crit5E4))
      .drop(Seq("__t", "__r2") ++ classifierCols.indices.map(i => s"__c$i"): _*)
  }

  /** Per-key Cochran–Armitage trend test — "does the conversion RATE
    * rise monotonically with the dose" over an ordered integer score
    * column (exposure tier, price band, A/B/n arm index): the
    * proportions analogue of [[graft.stats.Diagnostics.mannKendall]]'s
    * trend-in-a-series, and what a per-pair z matrix cannot answer
    * without multiplicity loss. `Z = (Σwᵢxᵢ − p̄·Σwᵢnᵢ) /
    * √(p̄(1−p̄)(Σwᵢ²nᵢ − (Σwᵢnᵢ)²/N))`.
    *
    * Exactness: the five sufficient statistics are exact integers (the
    * score products accumulate as DECIMAL(38,0) — w²·rows wraps BIGINT
    * past w ≈ 10⁶ at 10⁹ rows); Z is ONE fixed double tree
    * e4-quantized, verdict on the ROUNDED |z| > 1.96. Keys with zero
    * variance (constant dose, or p̄ ∈ {0, 1}) emit null.
    * Output: `(keys…, n, x, z_e4, significant)`. */
  def cochranArmitage(df: DataFrame, keyCols: Seq[String], scoreCol: String,
                      successCol: String): DataFrame = {
    require(keyCols.nonEmpty, "cochranArmitage needs at least one key column")
    val w = col(scoreCol).cast("long")
    val s = col(successCol)
    val vd = """(cast(x as double) / cast(n as double)
               | * (1.0 - cast(x as double) / cast(n as double))
               | * (cast(sw2n as double)
               |    - cast(swn as double) * cast(swn as double) / cast(n as double)))"""
      .stripMargin.replaceAll("\n", " ")
    dropNullKeys(df, keyCols)
      .filter(w.isNotNull && s.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(s, 1L).otherwise(0L)).as("x"),
        sum(w.cast("decimal(38,0)")).as("swn"),
        sum(when(s, w).otherwise(0L).cast("decimal(38,0)")).as("swx"),
        sum((w.cast("decimal(38,0)") * w)).as("sw2n"))
      .withColumn("z_e4", expr(
        s"""case when n > 0 and x > 0 and x < n and $vd > 0 then
           |  cast(floor((cast(swx as double)
           |      - cast(x as double) / cast(n as double) * cast(swn as double))
           |    / sqrt($vd) * 10000 + 0.5) as bigint)
           |end""".stripMargin))
      .withColumn("significant",
        when(col("z_e4").isNotNull, abs(col("z_e4")) > 19600L))
      .drop("swn", "swx", "sw2n")
  }

  /** Per-key Brown–Forsythe variance-equality test — the robust Levene
    * variant: [[anovaOneWay]]'s F computed over ABSOLUTE DEVIATIONS
    * FROM EACH GROUP'S MEDIAN, answering "do the groups even share a
    * variance" — the prerequisite every pooled-variance test quietly
    * assumes ([[welchTTest]] exists precisely because they often
    * don't; this is the test that tells you).
    *
    * Exactness: the group median is the EXACT LOWER MEDIAN off the
    * value-count grid (the trimmedMean rank convention — smallest value
    * whose cumulative count reaches ⌈n_g/2⌉), so the deviations
    * `|x − med_g|` are exact integers and the whole readout inherits
    * anovaOneWay's floor-quantized integer discipline verbatim.
    *
    * Scale shape: one grid aggregate, then the per-(key, group) median
    * rank walk runs IN-TASK over the collected grid (the round-15
    * grid-kernel discipline — [[GridFence.collectGrid]] bounds the
    * cells per key loudly), one broadcast-shaped join back onto the
    * rows, then anovaOneWay's single aggregate. Output: anovaOneWay's
    * with `f_e4` renamed `bf_e4`. */
  def brownForsythe(df: DataFrame, keyCols: Seq[String], groupCol: String,
                    valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "brownForsythe needs at least one key column")
    val k = keyCols.map(col)
    val x = col(valueCol).cast("long")
    val base = dropNullKeys(df, keyCols)
      .filter(col(groupCol).isNotNull && x.isNotNull)
      .select(k :+ col(groupCol).as("__g") :+ x.as("__x"): _*)
    // lower median per (key, group): smallest value whose cumulative
    // count reaches (nt+1) div 2 — the rank walk runs IN-TASK over the
    // collected per-group grid (the round-15 grid-kernel discipline,
    // identical fence; replaces two window exchanges)
    val medKern = udf((grid: Seq[Seq[Long]]) => {
      val cells = grid.map(a => (a(0), a(1))).sortBy(_._1).toArray
      val nt = cells.iterator.map(_._2).sum
      val target = (nt + 1L) / 2L
      var cum = 0L; var i = 0; var m = cells.last._1; var found = false
      while (i < cells.length && !found) {
        cum += cells(i)._2
        if (cum >= target) { m = cells(i)._1; found = true }
        i += 1
      }
      m
    })
    val med = base.groupBy(k :+ col("__g") :+ col("__x").as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(k :+ col("__g"): _*)
      .agg(GridFence.collectGrid(array(col("__v"), col("__c")),
        "brownForsythe").as("__grid"))
      .select(k :+ col("__g") :+ medKern(col("__grid")).as("__med"): _*)
    val dev = base.join(med, keyCols :+ "__g")
      .withColumn("__z", abs(col("__x") - col("__med")))
    anovaOneWay(dev, keyCols, "__g", "__z")
      .withColumnRenamed("f_e4", "bf_e4")
  }

  /** Per-key Kruskal–Wallis H — the k-GROUP rank test closing the
    * triangle ([[anovaOneWay]] parametric k-group, [[mannWhitney]]
    * nonparametric pair): `H = 12/(n(n+1)) · Σ_g R_g²/n_g − 3(n+1)`
    * over midranks, tie-corrected `H_c = H / (1 − Σ(t³−t)/(n³−n))`,
    * verdict against a caller-supplied χ²(k−1) 5% critical value.
    *
    * Exactness: midranks ride the shared value-count-grid form
    * (`2·mr = 2·cum_before + c + 1` — [[mannWhitney]]'s machinery), so
    * `2R_g` is exact as DECIMAL(38,0); each `(2R_g)²/n_g` floor-divides
    * via BigInt (arbitrary-precision intermediate) into DECIMAL(38,0),
    * and the per-key sum stays DECIMAL — the oracle mirrors with
    * HUGEINT. Tie cubes accumulate as DECIMAL(38,0). H and H_c are
    * one fixed double tree each, e4-quantized, verdict on the ROUNDED
    * H_c. Keys that are a single tie group (T = n³−n) emit null.
    *
    * Bound (round-10 re-frame; the old BIGINT term tripped its 2⁶³
    * fail-loud near sf10 — and unlike [[anovaOneWay]]'s S²/n this
    * ceiling is RANK-driven, `(2R_g)²/n_g ≈ 0.8n³`, so value
    * re-quantization cannot move it): the widened term holds to
    * `0.8n³ < 10³⁸` → n ≲ 5·10¹² rows per key, past any per-key
    * cardinality a 100 TB table produces. A fail-loud require remains
    * at the 10³⁸ edge.
    *
    * Scale shape: ONE map-side-combined cell-grid aggregate, then the
    * whole midrank/tie/H chain runs IN-TASK over the collected per-key
    * (group, value, count) grid (the Sketch.medMadGrid round-15
    * discipline — the old window partitioned by key already serialized
    * each key's full value grid into one task; the kernel keeps that
    * contract and drops the checkpoint, the window exchange, and both
    * grid joins). Every arithmetic term replicates the replaced SQL —
    * exact BigInt sums stand in for the DECIMAL(38,0) columns
    * (identical values inside the 10³⁸ envelope; past it the SQL sums
    * nulled silently, the kernel nulls EXPLICITLY at the same fence),
    * the rank-cube fail-loud `require` is unchanged, and each double
    * tree keeps the same operand order. Output: `(keys…, k_groups, n,
    * h_e4, hc_e4, crit5_e4, significant)`. */
  def kruskalWallis(df: DataFrame, keyCols: Seq[String], groupCol: String,
                    valueCol: String, crit5E4: Long = 94877L): DataFrame = {
    require(keyCols.nonEmpty, "kruskalWallis needs at least one key column")
    val k = keyCols.map(col)
    val x = col(valueCol).cast("long")
    val cells = dropNullKeys(df, keyCols)
      .filter(col(groupCol).isNotNull && x.isNotNull)
      .groupBy(k :+ col(groupCol).cast("string").as("__g") :+ x.as("__v"): _*)
      .agg(count(lit(1)).as("__cgv"))
    val cap = BigInt(10).pow(38)
    val kern = udf((gsIn: Seq[String], vsIn: Seq[Long], csIn: Seq[Long]) => {
      // materialize to arrays FIRST: the Seqs Spark hands a UDF are not
      // guaranteed O(1)-indexed, and the walks below index in a loop —
      // without this the kernel degrades quadratically on big grids
      val gs = gsIn.toArray; val vs = vsIn.toArray; val cs = csIn.toArray
      val m = gs.length
      // value grid: cv per distinct value, ascending — midrank
      // 2·mr = 2·cum_before + cv + 1, the mannWhitney identity
      val cvMap = scala.collection.mutable.TreeMap.empty[Long, Long]
      var i = 0
      while (i < m) { cvMap.update(vs(i), cvMap.getOrElse(vs(i), 0L) + cs(i)); i += 1 }
      var n = 0L
      val mr2 = scala.collection.mutable.HashMap.empty[Long, BigInt]
      var t3 = BigInt(0)
      cvMap.foreach { case (v, cv) =>
        mr2.update(v, BigInt(2L) * n + cv + 1L)
        n += cv
        t3 += (BigInt(cv) * cv * cv - cv)
      }
      // per-group 2R_g and n_g; (2R_g)²/n_g floor-divides in BigInt
      // with the unchanged fail-loud 10³⁸ fence
      val ng = scala.collection.mutable.HashMap.empty[String, Long]
      val r2g = scala.collection.mutable.HashMap.empty[String, BigInt]
      i = 0
      while (i < m) {
        val g = gs(i)
        ng.update(g, ng.getOrElse(g, 0L) + cs(i))
        r2g.update(g, r2g.getOrElse(g, BigInt(0)) + BigInt(cs(i)) * mr2(vs(i)))
        i += 1
      }
      var sr = BigInt(0)
      ng.keys.foreach { g =>
        val tg = r2g(g) * r2g(g) / ng(g)
        require(tg.abs < cap,
          "kruskalWallis rank cube exceeds DECIMAL(38,0) — split keys upstream")
        sr += tg
      }
      val kGroups = ng.size.toLong
      // past 10³⁸ the replaced DECIMAL sums nulled SILENTLY — null
      // explicitly at the same fence so the two forms never diverge
      val srOk = sr.abs < cap
      val t3Ok = t3.abs < cap
      val h = 12.0 / (n.toDouble * (n + 1L).toDouble) *
        (sr.toDouble / 4.0) - 3.0 * (n + 1L).toDouble
      val tie = 1.0 - t3.toDouble /
        (n.toDouble * n.toDouble * n.toDouble - n.toDouble)
      val hE4 =
        if (kGroups >= 2L && n >= 2L && srOk)
          Some(math.floor(h * 10000.0 + 0.5).toLong)
        else None
      val hcE4 =
        if (kGroups >= 2L && n >= 2L && srOk && t3Ok && tie > 0.0)
          Some(math.floor(h / tie * 10000.0 + 0.5).toLong)
        else None
      (kGroups, n, hE4, hcE4, hcE4.map(_ > crit5E4))
    })
    cells.groupBy(k: _*)
      .agg(GridFence.collectCells(col("__g"), col("__v"), col("__cgv"),
        "kruskalWallis").as("__cells"))
      .withColumn("__r", kern(
        expr("transform(__cells, x -> x.__g)"),
        expr("transform(__cells, x -> x.__v)"),
        expr("transform(__cells, x -> x.__cgv)")))
      .select(k :+ col("__r._1").as("k_groups") :+ col("__r._2").as("n") :+
        col("__r._3").as("h_e4") :+ col("__r._4").as("hc_e4") :+
        lit(crit5E4).as("crit5_e4") :+ col("__r._5").as("significant"): _*)
  }

  /** Per-key Jonckheere–Terpstra ordered-alternative trend test — the
    * k-group test [[kruskalWallis]] cannot be: KW asks "do the groups
    * differ AT ALL", JT asks "do they trend IN THE GIVEN ORDER"
    * (dose-response, priority tiers, quality buckets), which buys large
    * power when the ordering is real. Groups are ordered by the NATURAL
    * ascending order of `groupCol` (encode the intended order into the
    * labels — the TPC-H priority vocabulary `1-URGENT < … < 5-LOW`
    * already is one). Label-order contract: the kernel compares labels
    * in Java String (UTF-16 code unit) order while the SQL oracle
    * compares UTF-8 bytes — identical for ASCII labels, divergent only
    * past the BMP, so ordered-group labels are ASCII by contract. `J = Σ_{g<h} U_{gh}` over all ordered group
    * pairs, ties counted ½ (Hollander & Wolfe); the null mean and the
    * full TIE-CORRECTED variance are exact-integer functions of the
    * group sizes and tie-group sizes.
    *
    * Exactness: everything rides the doubled statistic — `2J` is an
    * exact integer (`Σ_{g<h} Σ_v c_h(v)·(2·cumlt_g(v) + c_g(v))`, the
    * midrank discipline), `2·E[J] = (n² − Σn_g²)/2·2` is exact
    * (`n² − Σn_g²` is even by the pair identity), and the three
    * variance terms T1/T2/T3 are exact BigInt sums mirrored by the
    * oracle's HUGEINT columns; z is ONE fixed double tree over those
    * integers, e4-quantized, verdict on the rounded value
    * (|z| > 1.96 two-sided).
    *
    * Scale shape: ONE map-side-combined (key, group, value)-grid
    * aggregate, then the pair walk runs IN-TASK over the collected
    * per-key grid (the [[kruskalWallis]] round-15 kernel discipline) —
    * O(G²·V) per key with G = group vocabulary (bounded by contract,
    * like funnel stages) and V the distinct-value grid. Keys with
    * fewer than 2 groups, n < 3, or zero variance (one tie class)
    * emit null z. Output: `(keys…, k_groups, n, j2, z_e4,
    * significant)`. */
  def jonckheereTerpstra(df: DataFrame, keyCols: Seq[String],
                         groupCol: String, valueCol: String): DataFrame =
    jtFromCells(jtCells(df, keyCols, groupCol, valueCol), keyCols)

  /** The (key, group, value)-count grid feeding [[jonckheereTerpstra]] —
    * exposed so a complete-mode streaming aggregate can BE the grid
    * (the cmhStrata split): drained state == the batch cells, so the
    * shared [[jtFromCells]] readout makes the twin oracle-identical. */
  private[graft] def jtCells(df: DataFrame, keyCols: Seq[String],
                             groupCol: String, valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "jonckheereTerpstra needs at least one key column")
    val k = keyCols.map(col)
    val x = col(valueCol).cast("long")
    dropNullKeys(df, keyCols)
      .filter(col(groupCol).isNotNull && x.isNotNull)
      .groupBy(k :+ col(groupCol).cast("string").as("__g") :+ x.as("__v"): _*)
      .agg(count(lit(1)).as("__cgv"))
  }

  /** [[jonckheereTerpstra]]'s kernel readout over an already-built
    * cell grid (`keys…, __g, __v, __cgv`). */
  private[graft] def jtFromCells(cells: DataFrame,
                                 keyCols: Seq[String]): DataFrame = {
    val k = keyCols.map(col)
    val kern = udf((gsIn: Seq[String], vsIn: Seq[Long], csIn: Seq[Long]) => {
      // arrays first — the UDF's Seqs are not O(1)-indexed (the
      // kruskalWallis round-15 lesson)
      val gs = gsIn.toArray; val vs = vsIn.toArray; val cs = csIn.toArray
      val m = gs.length
      // per-group sorted value grid + per-value tie totals
      val byGroup = scala.collection.mutable.TreeMap
        .empty[String, scala.collection.mutable.TreeMap[Long, Long]]
      val tie = scala.collection.mutable.HashMap.empty[Long, Long]
      var i = 0
      while (i < m) {
        val gm = byGroup.getOrElseUpdate(gs(i),
          scala.collection.mutable.TreeMap.empty[Long, Long])
        gm.update(vs(i), gm.getOrElse(vs(i), 0L) + cs(i))
        tie.update(vs(i), tie.getOrElse(vs(i), 0L) + cs(i))
        i += 1
      }
      val groups = byGroup.keys.toArray // ascending label order = the test's order
      val kG = groups.length.toLong
      val sizes = groups.map(g => byGroup(g).valuesIterator.sum)
      val n = sizes.sum
      // 2J: for each ordered pair (lo, hi), each hi-cell at value v adds
      // 2·(lo mass strictly below v) + (lo mass tied at v), all exact
      var j2 = BigInt(0)
      var lo = 0
      while (lo < groups.length - 1) {
        val loGrid = byGroup(groups(lo)).toArray // ascending v
        var hi = lo + 1
        while (hi < groups.length) {
          var li = 0; var cumLt = 0L
          byGroup(groups(hi)).foreach { case (v, ch) =>
            while (li < loGrid.length && loGrid(li)._1 < v) {
              cumLt += loGrid(li)._2; li += 1
            }
            val tied =
              if (li < loGrid.length && loGrid(li)._1 == v) loGrid(li)._2 else 0L
            j2 += BigInt(ch) * (2L * cumLt + tied)
          }
          hi += 1
        }
        lo += 1
      }
      // exact null moments: 2E[J] = (n² − Σn_g²)/2 · 2 → e2j = that;
      // tie-corrected Var(J) = T1/72 + T2/(36n(n−1)(n−2)) + T3/(8n(n−1))
      val sng2 = sizes.map(s => BigInt(s) * s).sum
      val e2j = (BigInt(n) * n - sng2) / 2
      def f1(t: Long) = BigInt(t) * (t - 1) * (2 * t + 5)
      def f2(t: Long) = BigInt(t) * (t - 1) * (t - 2)
      def f3(t: Long) = BigInt(t) * (t - 1)
      val t1 = f1(n) - sizes.map(f1).sum - tie.valuesIterator.map(f1).sum
      val t2 = sizes.map(f2).sum * tie.valuesIterator.map(f2).sum
      val t3 = sizes.map(f3).sum * tie.valuesIterator.map(f3).sum
      val zE4 =
        if (kG >= 2L && n >= 3L) {
          val varJ = t1.toDouble / 72.0 +
            t2.toDouble / (36.0 * n.toDouble * (n - 1L).toDouble * (n - 2L).toDouble) +
            t3.toDouble / (8.0 * n.toDouble * (n - 1L).toDouble)
          if (varJ > 0.0)
            Some(math.floor((j2 - e2j).toDouble / math.sqrt(4.0 * varJ)
              * 10000.0 + 0.5).toLong)
          else None
        } else None
      // j2 ≤ n²/2-ish: fail loud past the BIGINT readout bound (n per
      // key ≳ 4e9) rather than wrap silently — the kruskalWallis fence
      // convention
      require(j2 < BigInt(Long.MaxValue),
        "jonckheereTerpstra 2J exceeds BIGINT — split keys upstream")
      (kG, n, j2.toLong, zE4, zE4.map(z => math.abs(z) > 19600L))
    })
    cells.groupBy(k: _*)
      .agg(GridFence.collectCells(col("__g"), col("__v"), col("__cgv"),
        "jonckheereTerpstra").as("__cells"))
      .withColumn("__r", kern(
        expr("transform(__cells, x -> x.__g)"),
        expr("transform(__cells, x -> x.__v)"),
        expr("transform(__cells, x -> x.__cgv)")))
      .select(k :+ col("__r._1").as("k_groups") :+ col("__r._2").as("n") :+
        col("__r._3").as("j2") :+ col("__r._4").as("z_e4") :+
        col("__r._5").as("significant"): _*)
  }

  /** Per-key Dunn's post-hoc test — WHICH group pairs differ after
    * [[kruskalWallis]] flags a key, the nonparametric sibling of
    * [[pairwiseWelch]] (that one compares means and needs the
    * parametric tier's assumptions; this one compares MEAN MIDRANKS off
    * the pooled rank grid, Dunn 1964): for each ordered pair (i, j),
    * `z = (R̄_i − R̄_j) / sqrt((n(n+1)/12 − ΣT/(12(n−1)))·(1/n_i +
    * 1/n_j))` with the Σ(t³−t) tie correction, two-sided normal p, and
    * the whole k(k−1)/2-pair family Benjamini–Hochberg-corrected as ONE
    * family across keys via [[bhCorrect]] (the pairwiseWelch
    * convention).
    *
    * Exactness: midranks ride the (group, value, count) cell grid —
    * `2·mr = 2·cum_before + c_v + 1` ([[mannWhitney]]'s identity), so
    * `2R_g` is an exact BigInt mirrored by the oracle's HUGEINT; tie
    * cubes likewise. Each pair's d/s²/z/p is ONE fixed double tree over
    * those integers — the p tree is the Abramowitz–Stegun 26.2.17
    * Horner form VERBATIM from [[pairwiseWelch]], so both engines
    * replay it bit-for-bit; z is e4-floored, p e9-floored. Pairs where
    * the variance term degenerates (n < 2, or an all-tied key) emit
    * null z/p and drop from the BH family (the q313 convention).
    *
    * Scale shape: ONE map-side-combined cell-grid aggregate
    * ([[jtCells]] — the same grid the KW/JT kernels read), the rank
    * and pair arithmetic IN-TASK over the collected per-key grid
    * ([[GridFence]]-bounded), one pair-count-sized explode, then
    * bhCorrect's family-sized windows. Group labels order by the
    * ASCII contract ([[jonckheereTerpstra]]'s note). Output: `(keys…,
    * group_a, group_b, n_a, n_b, z_e4, p_e9, rank, rejected)`. */
  def dunnTest(df: DataFrame, keyCols: Seq[String], groupCol: String,
               valueCol: String, qPermille: Int = 50): DataFrame =
    dunnFromCells(jtCells(df, keyCols, groupCol, valueCol), keyCols, qPermille)

  /** [[dunnTest]]'s kernel readout over an already-built cell grid
    * (`keys…, __g, __v, __cgv`) — exposed so a complete-mode streaming
    * aggregate can BE the grid (the jtFromCells split). */
  private[graft] def dunnFromCells(cells: DataFrame, keyCols: Seq[String],
                                   qPermille: Int): DataFrame = {
    val k = keyCols.map(col)
    val kern = udf((gsIn: Seq[String], vsIn: Seq[Long], csIn: Seq[Long]) => {
      // arrays first — the UDF's Seqs are not O(1)-indexed (the
      // kruskalWallis round-15 lesson)
      val gs = gsIn.toArray; val vs = vsIn.toArray; val cs = csIn.toArray
      val m = gs.length
      // pooled value grid: cv per distinct value ascending; midrank
      // identity 2·mr = 2·cum_before + cv + 1; tie cubes Σ(t³ − t)
      val cvMap = scala.collection.mutable.TreeMap.empty[Long, Long]
      var i = 0
      while (i < m) { cvMap.update(vs(i), cvMap.getOrElse(vs(i), 0L) + cs(i)); i += 1 }
      var n = 0L
      val mr2 = scala.collection.mutable.HashMap.empty[Long, Long]
      var t3 = BigInt(0)
      cvMap.foreach { case (v, cv) =>
        mr2.update(v, 2L * n + cv + 1L)
        n += cv
        t3 += (BigInt(cv) * cv * cv - cv)
      }
      // per-group n_g and exact 2R_g
      val ng = scala.collection.mutable.HashMap.empty[String, Long]
      val r2g = scala.collection.mutable.HashMap.empty[String, BigInt]
      i = 0
      while (i < m) {
        val g = gs(i)
        ng.update(g, ng.getOrElse(g, 0L) + cs(i))
        r2g.update(g, r2g.getOrElse(g, BigInt(0)) + BigInt(cs(i)) * mr2(vs(i)))
        i += 1
      }
      val groups = ng.keys.toArray.sorted // ASCII label order, a total order
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long, Long, Option[Long], Option[Long])]
      var a = 0
      while (a < groups.length - 1) {
        var b = a + 1
        while (b < groups.length) {
          val (ga, gb) = (groups(a), groups(b))
          val (na, nb) = (ng(ga), ng(gb))
          // fixed double trees, operand order mirrored by the oracle
          val d = (r2g(ga).toDouble / na - r2g(gb).toDouble / nb) / 2.0
          val s2 = (n.toDouble * (n + 1L).toDouble / 12.0 -
            t3.toDouble / (12.0 * (n - 1L).toDouble)) * (1.0 / na + 1.0 / nb)
          val zp =
            if (n >= 2L && s2 > 0.0) {
              val z = d / math.sqrt(s2)
              // Abramowitz–Stegun 26.2.17 two-sided tail — the
              // pairwiseWelch Horner tree verbatim
              val zt = 1.0 / (1.0 + 0.2316419 * math.abs(z))
              val p = 2.0 * math.exp(-math.abs(z) * math.abs(z) / 2.0) *
                0.3989422804014327 *
                (zt * (0.319381530 + zt * (-0.356563782 +
                  zt * (1.781477937 + zt * (-1.821255978 +
                    zt * 1.330274429)))))
              (Some(math.floor(z * 10000.0 + 0.5).toLong),
                Some(math.floor(p * 1000000000.0 + 0.5).toLong))
            } else (None, None)
          out += ((ga, gb, na, nb, zp._1, zp._2))
          b += 1
        }
        a += 1
      }
      out.toSeq
    })
    val pairs = cells.groupBy(k: _*)
      .agg(GridFence.collectCells(col("__g"), col("__v"), col("__cgv"),
        "dunnTest").as("__cells"))
      .withColumn("__p", explode(kern(
        expr("transform(__cells, x -> x.__g)"),
        expr("transform(__cells, x -> x.__v)"),
        expr("transform(__cells, x -> x.__cgv)"))))
      .select(k :+ col("__p._1").as("group_a") :+ col("__p._2").as("group_b") :+
        col("__p._3").as("n_a") :+ col("__p._4").as("n_b") :+
        col("__p._5").as("z_e4") :+ col("__p._6").as("p_e9"): _*)
    bhCorrect(pairs, "p_e9", qPermille,
      tieCols = keyCols ++ Seq("group_a", "group_b"))
  }

  /** Brier score with the Murphy (1973) three-way decomposition —
    * `Brier = Reliability − Resolution + Uncertainty` over `nBins`
    * equal-width score bins: reliability is calibration error proper
    * (bin mean vs bin rate — [[calibrationBins]]'s gap, squared and
    * weighted), resolution is how much the bins separate the base
    * rate (a score can be perfectly calibrated and useless), and
    * uncertainty `ō(1−ō)` is the irreducible floor. The one-row
    * companion readout to [[calibrationBins]]' grid.
    *
    * Exactness: every term rides exact integers on the e6 grid. The
    * per-row Brier contribution `(s − y·10⁶)²` (≤ 10¹², exact) is
    * floor-scaled BY 10⁶ PER ROW before summing — the documented
    * overflow dial (Σd² itself would cap n at 9·10⁶ rows; the scaled
    * sum holds to 9·10¹²), and identical floors replay in SQL. Bin
    * means/rates are integer divisions; rel/res terms square those
    * quantized columns (re-scaled by 10⁶), so the whole decomposition
    * hash-matches.
    *
    * Scale shape: ONE map-side-combined aggregate over one scan onto
    * the nBins grid; totals derive FROM the grid (the psiFromCounts
    * shape — no second scan), and the readout is grid-sized. Output:
    * one row `(n, n_pos, brier_e6, reliability_e6, resolution_e6,
    * uncertainty_e6)`. */
  def brierDecomposition(df: DataFrame, scoreE6Col: String, labelCol: String,
                         nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val s = col(scoreE6Col)
    val y = col(labelCol)
    val bins = df.filter(s.isNotNull && y.isNotNull)
      .withColumn("__bin",
        least(expr(s"`$scoreE6Col` * $nBins div 1000000"), lit(nBins - 1L)))
      .withColumn("__d",
        s.cast("long") - when(y, 1000000L).otherwise(0L))
      .groupBy(col("__bin"))
      .agg(
        count(lit(1)).as("__n_b"),
        sum(when(y, 1L).otherwise(0L)).as("__p_b"),
        sum(s.cast("long")).as("__s_b"),
        sum(expr("__d * __d div 1000000")).as("__q_b"))
      // lazy localCheckpoint, not persist: the grid feeds BOTH the one-row
      // totals and the readout crossJoin, and checkpoint blocks give the
      // same compute-once/read-many sharing — but they are NOT registered
      // in the CacheManager (persist is, and lives until the session drops
      // it), so the ContextCleaner frees them once the result is
      // unreachable and repeated calls in a long-lived session cannot
      // accumulate cache entries. The non-fault-tolerant localCheckpoint
      // contract (executor loss fails the query) is moot on an
      // nBins-row grid.
      // LAZY (false), deliberately, engine-wide — the measured trade
      // (round 15 A/B, 15-query subset, back-to-back same host): eager
      // materialization runs ONE EXTRA JOB per checkpoint per call,
      // +10% on the affected queries (27.1 s lazy vs 29.8 s eager),
      // while lazy piggybacks the cache write on the first consumer's
      // job. Lazy's known cost is the flaky benign "Failed to update
      // accumulator" DAGScheduler burst (a checkpoint-finalization /
      // straggler task reporting after its execution's accumulators
      // unregistered — weak refs in AccumulatorContext): 0 events in
      // 6/6 eager runs vs bursts up to 301/run under lazy (q304, q308,
      // q314). The bench counts and phase-splits every event
      // (log_errors / log_errors_warmup + bench_errors.txt attribution)
      // — counted noise beats a 10% tax on a hot path that a real
      // cluster pays identically.
      .localCheckpoint(false)
    val tot = bins.agg(sum(col("__n_b")).as("n"), sum(col("__p_b")).as("n_pos"),
      sum(col("__q_b")).as("__qq"))
    bins.crossJoin(broadcast(tot))
      .withColumn("__mean_b", expr("__s_b div __n_b"))
      .withColumn("__obs_b", expr("__p_b * 1000000 div __n_b"))
      .withColumn("__obar", expr("n_pos * 1000000 div n"))
      .groupBy(col("n"), col("n_pos"), col("__qq"), col("__obar"))
      .agg(
        sum(expr("__n_b * ((__mean_b - __obs_b) * (__mean_b - __obs_b) div 1000000)"))
          .as("__rel"),
        sum(expr("__n_b * ((__obs_b - __obar) * (__obs_b - __obar) div 1000000)"))
          .as("__res"))
      .select(col("n"), col("n_pos"),
        expr("__qq div n").as("brier_e6"),
        expr("__rel div n").as("reliability_e6"),
        expr("__res div n").as("resolution_e6"),
        expr("__obar * (1000000 - __obar) div 1000000").as("uncertainty_e6"))
  }

  /** Decile lift/gains table of an integer score against a boolean
    * label — the campaign-targeting readout ("mailing the top 2 deciles
    * captures X% of responders at Y× the base rate") that turns a
    * classifier score into a budget decision; the ranking-economics
    * complement of [[groupedAuc]] (discrimination) and
    * [[calibrationBins]] (calibration).
    *
    * HISTOGRAM DECILES (the scalable form): rows never globally sort —
    * the score VALUE GRID is counted once (map-side combined), tiles
    * are assigned by the exact integer prefix rank
    * `tile = (cum_desc − c_v)·nTiles div n`, and ties share a tile (the
    * honest convention when scores are quantized; bin continuous
    * scores upstream). The single-partition windows run over the grid
    * and the nTiles readout, never the rows.
    *
    * Exactness: counts exact; rates `·10⁶ div`; cumulative lift is the
    * TWO-STEP integer quantization
    * `(cum₊·10⁶ div cum_n)·10⁶ div (tot₊·10⁶ div tot_n)` — documented
    * so the SQL replay floors identically (a single cross-multiplied
    * division would overflow BIGINT at ~3·10⁶ rows).
    *
    * Output: `(tile, n, n_pos, resp_rate_e6, cum_n, cum_pos,
    * cum_lift_e6)`, tile 0 = best-scored. */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
                nTiles: Int = 10): DataFrame = {
    val score = col(scoreCol)
    val label = col(labelCol)
    liftFromCounts(
      df.filter(score.isNotNull && label.isNotNull)
        .groupBy(score.as("__v"))
        .agg(count(lit(1)).as("__c"),
          sum(when(label, 1L).otherwise(0L)).as("__p")),
      nTiles)
  }

  /** Lift readout from a pre-counted `(__v, __c, __p)` score histogram —
    * split out so a STREAMING count state (complete-mode per-value
    * aggregate, mergeable across micro-batches) shares the exact
    * readout with [[liftTable]]: drained counts == batch counts ⇒
    * identical table (the psiFromCounts pattern). */
  def liftFromCounts(hist: DataFrame, nTiles: Int): DataFrame = {
    require(nTiles >= 2, s"nTiles must be >= 2, got $nTiles")
    val wDesc = Window.orderBy(col("__v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(1))
    val tiles = hist
      .withColumn("__cum", sum(col("__c")).over(wDesc))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__tp", sum(col("__p")).over(wAll))
      .withColumn("tile", expr(s"(__cum - __c) * $nTiles div __n"))
      .groupBy(col("tile"), col("__n"), col("__tp"))
      .agg(sum(col("__c")).as("n"), sum(col("__p")).as("n_pos"))
    val wTile = Window.orderBy(col("tile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tiles
      .withColumn("resp_rate_e6", expr("n_pos * 1000000 div n"))
      .withColumn("cum_n", sum(col("n")).over(wTile))
      .withColumn("cum_pos", sum(col("n_pos")).over(wTile))
      .withColumn("cum_lift_e6", expr(
        """(cum_pos * 1000000 div cum_n) * 1000000
          |  div nullif(__tp * 1000000 div __n, 0)""".stripMargin))
      .drop("__n", "__tp")
  }

  /** CUPED pre-experiment variance reduction (Deng et al. 2013) per
    * key — how much experiment sensitivity a pre-period covariate buys:
    * `θ = cov(x, y)/var(x)` (the adjustment coefficient for
    * `y_adj = y − θ(x − x̄)`) and the variance-reduction factor
    * `ρ² = corr(x, y)²` (adjusted variance = (1 − ρ²)·raw). The
    * power-planning readout every A/B platform computes before choosing
    * covariates — at ρ² = 0.5, half the experiment duration.
    *
    * Exactness: one map-side-combined aggregate of exact integer
    * moments (caller quantizes to dollars/cents and keeps Σx² < 2⁶³);
    * θ and ρ² are fixed double trees with each factor cast to double
    * BEFORE multiplying (the q228 overflow lesson), e6-quantized.
    * Degenerate keys (var(x) = 0 or var(y) = 0) emit nulls.
    *
    * Output: `(keys…, n, theta_e6, var_reduction_e6)`. */
  def cuped(df: DataFrame, keyCols: Seq[String], xCol: String,
            yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "cuped needs at least one key column")
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val vx = "(cast(n as double) * __qx - cast(__sx as double) * __sx)"
    val vy = "(cast(n as double) * __qy - cast(__sy as double) * __sy)"
    val cv = "(cast(n as double) * __sxy - cast(__sx as double) * __sy)"
    df.filter(x.isNotNull && y.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(x * x).as("__qx"),
        sum(y).as("__sy"), sum(y * y).as("__qy"),
        sum(x * y).as("__sxy"))
      .withColumn("theta_e6", expr(
        s"""case when n >= 2 and $vx > 0 then
           |  cast(floor($cv / $vx * 1000000 + 0.5) as bigint) end""".stripMargin))
      .withColumn("var_reduction_e6", expr(
        s"""case when n >= 2 and $vx > 0 and $vy > 0 then
           |  cast(floor($cv * $cv / ($vx * $vy) * 1000000 + 0.5) as bigint)
           |end""".stripMargin))
      .drop("__sx", "__qx", "__sy", "__qy", "__sxy")
  }

  /** Isotonic calibration of a binned score — PAV's solution via the
    * MINIMAX CLOSED FORM `iso(i) = max_{j≤i} min_{k≥i} avg(y_j..y_k)`
    * (Barlow et al. 1972: the pool-adjacent-violators fit equals the
    * prefix-suffix minimax of weighted range means), which turns the
    * data-dependent pooling LOOP into a pure GRID expression — the
    * trick that makes an "iterative" fit hash-checkable in SQL. The
    * monotone score→probability map [[calibrationBins]] diagnoses the
    * need for; Platt's logistic alternative imposes a shape, isotonic
    * only imposes order.
    *
    * Exactness: range means come from exact integer prefix sums over
    * the bin grid, e9-quantized per range (`p·10⁹ div n` — the
    * quantization IS the spec; min/max then compare exact integers).
    * Output is monotone nondecreasing in `bin` by construction.
    *
    * Scale shape: ONE row scan to the nBins grid (map-side combined);
    * the minimax runs over the B³ range grid (10³ rows at the default —
    * nothing), via two broadcast-joined windows. Output: `(bin, n,
    * n_pos, raw_rate_e6, iso_e9)`. */
  def isotonicCalibration(df: DataFrame, scoreE6Col: String, labelCol: String,
                          nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    // hard cap: the minimax readout builds a broadcast B(B+1)/2-row range
    // grid and a B³-shaped range join — mechanical at the default B=10,
    // a quarter-million-row accident at B=10,000. 64 bins ≈ 2,080 ranges
    // keeps the grid broadcast-trivial; recalibrate coarser, not wider.
    require(nBins <= 64, s"isotonicCalibration caps nBins at 64 (B^3 range grid), got $nBins")
    val s = col(scoreE6Col)
    val y = col(labelCol)
    val wOrd = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bins = df.filter(s.isNotNull && y.isNotNull)
      .withColumn("bin",
        least(expr(s"`$scoreE6Col` * $nBins div 1000000"), lit(nBins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(when(y, 1L).otherwise(0L)).as("n_pos"))
      .withColumn("__cp", sum(col("n_pos")).over(wOrd))
      .withColumn("__cn", sum(col("n")).over(wOrd))
      // lazy localCheckpoint (see brierDecomposition): compute-once sharing
      // across the three grid consumers without a CacheManager entry that
      // outlives the call
      .localCheckpoint(false)
    // range means over (j, k): prefix-sum differences on the tiny grid
    val j = bins.select(col("bin").as("__j"), col("__cp").as("__cpj"),
      col("__cn").as("__cnj"), col("n_pos").as("__pj"), col("n").as("__nj"))
    val k = bins.select(col("bin").as("__k"), col("__cp").as("__cpk"),
      col("__cn").as("__cnk"))
    val ranges = j.crossJoin(k).filter(col("__j") <= col("__k"))
      .select(col("__j"), col("__k"),
        expr("(__cpk - __cpj + __pj) * 1000000000 div (__cnk - __cnj + __nj)")
          .as("__avg_e9"))
    val iso = bins.select(col("bin").as("__i"))
      .join(broadcast(ranges),
        col("__j") <= col("__i") && col("__i") <= col("__k"))
      .groupBy(col("__i"), col("__j")).agg(min(col("__avg_e9")).as("__minr"))
      .groupBy(col("__i")).agg(max(col("__minr")).as("iso_e9"))
    bins.join(broadcast(iso), col("bin") === col("__i"))
      .withColumn("raw_rate_e6", expr("n_pos * 1000000 div n"))
      .select(col("bin"), col("n"), col("n_pos"), col("raw_rate_e6"),
        col("iso_e9"))
  }

  /** Per-key Cohen's kappa between two categorical raters — chance-
    * corrected agreement, THE cross-annotator / model-vs-model
    * consistency readout (two quality classifiers, a heuristic vs an
    * LLM labeler): `κ = (p_o − p_e)/(1 − p_e)` where `p_o` is observed
    * agreement and `p_e = Σ_c row_c·col_c / n²` the chance rate from
    * the marginals.
    *
    * Exactness: everything flows from ONE per-(key, a, b) cell-count
    * aggregate — the marginals are RE-AGGREGATIONS OF THE CELL GRID
    * (cells·classes rows), never a second row scan. With integers
    * `n`, `diag = Σ_c cell_cc`, `rc = Σ_c row_c·col_c`:
    * `po_e6 = diag·10⁶ div n`, `pe_e6 = rc·10⁶ div n²`, and
    * `κ = (n·diag − rc)/(n² − rc)` is an exact BIGINT rational — κ is
    * signed, so it is emitted through the one fixed double division
    * e6-quantized (the q216 signed-ratio convention; integer `div`
    * truncation differs cross-engine on negatives). BIGINT bound:
    * n² < 2⁶³ ⇒ n ≤ 3·10⁹ rows per key.
    *
    * Perfect-chance keys (`pe = 1`: both raters constant) emit null κ.
    * Output: `(keys…, n, po_e6, pe_e6, kappa_e6)`. */
  def cohenKappa(df: DataFrame, keyCols: Seq[String], raterACol: String,
                 raterBCol: String): DataFrame = {
    require(keyCols.nonEmpty, "cohenKappa needs at least one key column")
    val k = keyCols.map(col)
    val cells = df.filter(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .groupBy(k :+ col(raterACol).as("__a") :+ col(raterBCol).as("__b"): _*)
      .agg(count(lit(1)).as("__c"))
      // lazy localCheckpoint (see brierDecomposition): the cell grid feeds
      // three re-aggregations; checkpoint blocks share it without a
      // CacheManager entry that outlives the call
      .localCheckpoint(false)
    val rows = cells.groupBy(k :+ col("__a").as("__cls"): _*)
      .agg(sum(col("__c")).as("__row"))
    val cols_ = cells.groupBy(k :+ col("__b").as("__cls"): _*)
      .agg(sum(col("__c")).as("__col"))
    val rc = rows.join(cols_, keyCols :+ "__cls")
      .groupBy(k: _*).agg(sum(col("__row") * col("__col")).as("__rc"))
    val base = cells.groupBy(k: _*)
      .agg(sum(col("__c")).as("n"),
        sum(when(col("__a") === col("__b"), col("__c")).otherwise(0L)).as("__diag"))
    // LEFT join + 0: raters with DISJOINT label sets produce an EMPTY
    // marginal join (no shared class), which an inner join would silently
    // drop — but that key is total disagreement, the most important row
    // of an agreement audit: rc = 0 gives the well-defined κ = 0
    base.join(rc, keyCols, "left")
      .withColumn("__rc", coalesce(col("__rc"), lit(0L)))
      .withColumn("po_e6", expr("__diag * 1000000 div n"))
      // DECIMAL widening: rc·10⁶ wraps BIGINT at rc ≈ n² ≳ 9·10¹² (n over
      // ~3·10⁶ concentrated rows) — the decimal detour restores the
      // documented n ≤ 3·10⁹ bound
      .withColumn("pe_e6", expr(
        "cast(cast(__rc as decimal(38,0)) * 1000000 div (n * n) as bigint)"))
      .withColumn("kappa_e6", expr(
        """case when n * n - __rc <> 0 then
          |  cast(floor(cast(n * __diag - __rc as double) / (n * n - __rc)
          |             * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
      .drop("__diag", "__rc")
  }

  /** Per-key Fleiss' kappa — chance-corrected agreement generalized to
    * MANY ratings per item ([[cohenKappa]] is exactly two named raters;
    * Fleiss asks "do an item's n_i ratings agree beyond chance", the
    * multi-annotator / within-entity-consistency readout). Variable-n
    * form: per-item agreement `P_i = Σ_c n_ic(n_ic−1) / (n_i(n_i−1))`,
    * `P̄` its mean over items, chance rate `P̄e = Σ_c p_c²` from the
    * pooled category shares, `κ = (P̄ − P̄e)/(1 − P̄e)` — reduces to the
    * classic equal-n Fleiss (1971) when every item has the same count.
    *
    * Exactness: ONE (key, item, category) cell aggregate; `P_i` is one
    * fixed double tree over exact integers e9-quantized PER ITEM and
    * integer-summed (order-independent); `Σ n_c²` accumulates as
    * DECIMAL(38,0); κ is one fixed tree over the integer pieces,
    * e6-quantized, signed (floor(x+0.5) rounds identically on
    * negatives). Items with fewer than 2 ratings carry no agreement
    * evidence and drop; keys where one category takes every rating
    * (`P̄e = 1`) emit null κ.
    *
    * Scale shape: grid-shaped after the map-side-combined cell
    * aggregate, like [[cohenKappa]]. Output: `(keys…, n_items,
    * n_ratings, pbar_e6, pe_e6, kappa_e6)`. */
  def fleissKappa(df: DataFrame, keyCols: Seq[String], itemCol: String,
                  categoryCol: String): DataFrame = {
    require(keyCols.nonEmpty, "fleissKappa needs at least one key column")
    val k = keyCols.map(col)
    val cells = df.filter(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(k :+ col(itemCol).as("__it") :+ col(categoryCol).as("__c"): _*)
      .agg(count(lit(1)).as("__n"))
      // lazy localCheckpoint (the brierDecomposition pattern): the cell
      // grid feeds the per-item and per-category re-aggregations
      .localCheckpoint(false)
    val itemTot = cells.groupBy(k :+ col("__it"): _*)
      .agg(sum(col("__n")).as("__ni"),
        sum(col("__n") * (col("__n") - 1L)).as("__agree"))
      .filter(col("__ni") >= 2)
    val items = itemTot
      .withColumn("__pi_e9", expr(
        """cast(floor(cast(__agree as double) / cast(__ni * (__ni - 1) as double)
          |  * 1000000000 + 0.5) as bigint)""".stripMargin))
      .groupBy(k: _*)
      .agg(count(lit(1)).as("n_items"), sum(col("__ni")).as("n_ratings"),
        sum(col("__pi_e9")).as("__sp"))
    // pooled category shares over the SAME population P-bar averages:
    // single-rating items are out of the agreement mean, so they must be
    // out of the chance rate too (at uniform n this is the classic form)
    val cats = cells
      .join(itemTot.select(k :+ col("__it"): _*), keyCols :+ "__it")
      .groupBy(k :+ col("__c"): _*)
      .agg(sum(col("__n")).as("__nc"))
      .groupBy(k: _*)
      .agg(sum(col("__nc")).as("__nt"),
        sum(expr("cast(__nc as decimal(38,0)) * __nc")).as("__snc2"))
    items.join(cats, keyCols)
      .withColumn("pbar_e6", expr(
        """cast(floor(cast(__sp as double) / 1000000000.0 / cast(n_items as double)
          |  * 1000000 + 0.5) as bigint)""".stripMargin))
      .withColumn("pe_e6", expr(
        """cast(floor(cast(__snc2 as double)
          |  / (cast(__nt as double) * cast(__nt as double))
          |  * 1000000 + 0.5) as bigint)""".stripMargin))
      .withColumn("kappa_e6", expr(
        """case when cast(__snc2 as double)
          |       / (cast(__nt as double) * cast(__nt as double)) < 1.0 then
          |  cast(floor(
          |    (cast(__sp as double) / 1000000000.0 / cast(n_items as double)
          |     - cast(__snc2 as double)
          |       / (cast(__nt as double) * cast(__nt as double)))
          |    / (1.0 - cast(__snc2 as double)
          |       / (cast(__nt as double) * cast(__nt as double)))
          |    * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
      .select(k :+ col("n_items") :+ col("n_ratings") :+ col("pbar_e6") :+
        col("pe_e6") :+ col("kappa_e6"): _*)
  }

  /** Benjamini–Hochberg step-up FDR correction over a FAMILY of
    * hypotheses — the multiple-testing guard every per-key test in this
    * engine (sign test, Welch, Mann-Kendall…) needs before anyone reads
    * 125 p-values and acts on the smallest: rank the p's ascending,
    * find the largest k with `p_(k) ≤ k·q/m`, reject ranks 1..k.
    *
    * Exactness: with `p` carried as an e9 integer the threshold test is
    * PURE integer arithmetic — `p_e9·1000·m ≤ rank·q‰·10⁹` — so the
    * step-up boundary cannot drift between engines (a float threshold
    * would flip verdicts at exact-tie ranks). Both sides widen through
    * DECIMAL(38,0) (p_e9·1000·m wraps BIGINT once m ≈ 9.2·10⁶
    * hypotheses, and rank·q‰ would promote from 32-bit int too late),
    * so an oversized family stays exact instead of silently flipping
    * rejections. Ties on `p_e9` order by `tieCols` so the ranking is
    * total and deterministic.
    *
    * Scale shape: the family is grid-sized BY DEFINITION (one row per
    * hypothesis, not per observation), so the unpartitioned ranking
    * window is a documented single-partition contract (the
    * packSequences convention). Output: input columns plus
    * `(rank, rejected)`. */
  def bhCorrect(df: DataFrame, pE9Col: String, qPermille: Int,
                tieCols: Seq[String]): DataFrame = {
    require(qPermille >= 1 && qPermille <= 999,
      s"qPermille must be in [1, 999], got $qPermille")
    require(tieCols.nonEmpty, "bhCorrect needs tie-break columns")
    val wRank = Window.orderBy(col(pE9Col) +: tieCols.map(col): _*)
    val wAll = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.filter(col(pE9Col).isNotNull)
      .withColumn("rank", row_number().over(wRank))
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("__flag", expr(
        s"""cast($pE9Col as decimal(38,0)) * 1000 * __m
           |  <= cast(rank as decimal(38,0)) * $qPermille * 1000000000"""
          .stripMargin.replaceAll("\n", " ")))
      .withColumn("__kmax", max(when(col("__flag"), col("rank"))).over(wAll))
      .withColumn("rejected",
        coalesce(col("rank") <= col("__kmax"), lit(false)))
      .drop("__m", "__flag", "__kmax")
  }

  /** Per-key normalized mutual information between two categorical
    * columns — the information-theoretic agreement readout beside
    * [[cohenKappa]]'s chance-corrected one: κ needs the two columns to
    * share a label vocabulary (diagonal agreement); NMI does not, which
    * is what makes it THE external cluster-validation score (cluster ids
    * vs ground-truth labels never share names). `MI = Σ_cells
    * (n_ab/N)·ln(N·n_ab/(n_a·n_b))`, arithmetic-mean normalization
    * `NMI = MI / ((H_a + H_b)/2)` (the scikit-learn default).
    *
    * Exactness: ONE per-(key, a, b) cell aggregate; marginals and totals
    * are re-aggregations of the grid, never a second row scan. Every MI
    * and entropy TERM is one fixed double tree over exact integers,
    * e9-quantized to BIGINT before summing — the sums are order-
    * independent (the ljungBox/BM25 discipline; `floor(x + 0.5)` rounds
    * identically for the negative MI terms where integer `div` would
    * not). The final NMI is one double division of the integer sums,
    * e6-quantized. Degenerate keys (both columns constant ⇒ both
    * entropies 0) emit null `nmi_e6`.
    *
    * Scale shape: grid-shaped end-to-end after the map-side-combined
    * cell aggregate; the marginal joins key on (key, class) — cells ×
    * classes rows. Output: `(keys…, n, mi_e9, h_a_e9, h_b_e9,
    * nmi_e6)`. */
  def normalizedMutualInfo(df: DataFrame, keyCols: Seq[String], aCol: String,
                           bCol: String): DataFrame = {
    require(keyCols.nonEmpty, "normalizedMutualInfo needs at least one key column")
    val k = keyCols.map(col)
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(k :+ col(aCol).as("__a") :+ col(bCol).as("__b"): _*)
      .agg(count(lit(1)).as("__c"))
      // lazy localCheckpoint (see brierDecomposition): the cell grid
      // feeds three re-aggregations and the term join
      .localCheckpoint(false)
    nmiFromCells(cells, keyCols)
  }

  /** The NMI readout over a per-(key, __a, __b) cell-count grid (`__c`)
    * — ONE definition shared by the batch operator and the streaming
    * twin (whose complete-mode state IS this grid), the
    * driftFromComponentSums convention: shared-oracle bit-parity cannot
    * drift between hand-synced copies. */
  def nmiFromCells(cells: DataFrame, keyCols: Seq[String]): DataFrame = {
    val k = keyCols.map(col)
    val rowsM = cells.groupBy(k :+ col("__a"): _*).agg(sum(col("__c")).as("__na"))
    val colsM = cells.groupBy(k :+ col("__b"): _*).agg(sum(col("__c")).as("__nb"))
    val tot = cells.groupBy(k: _*).agg(sum(col("__c")).as("n"))
    def entE9(marg: DataFrame, cnt: String, out: String) =
      marg.join(tot, keyCols)
        .withColumn("__h", expr(
          s"""cast(floor(-(cast($cnt as double) / cast(n as double))
             |  * ln(cast($cnt as double) / cast(n as double))
             |  * 1000000000 + 0.5) as bigint)""".stripMargin))
        .groupBy(k: _*).agg(sum(col("__h")).as(out))
    val mi = cells
      .join(rowsM, keyCols :+ "__a")
      .join(colsM, keyCols :+ "__b")
      .join(tot, keyCols)
      .withColumn("__t", expr(
        """cast(floor((cast(__c as double) / cast(n as double))
          |  * ln(cast(n as double) * cast(__c as double)
          |       / (cast(__na as double) * cast(__nb as double)))
          |  * 1000000000 + 0.5) as bigint)""".stripMargin))
      .groupBy(k: _*).agg(sum(col("__t")).as("mi_e9"))
    tot
      .join(mi, keyCols)
      .join(entE9(rowsM, "__na", "h_a_e9"), keyCols)
      .join(entE9(colsM, "__nb", "h_b_e9"), keyCols)
      .withColumn("nmi_e6", expr(
        """case when h_a_e9 + h_b_e9 > 0 then
          |  cast(floor(cast(mi_e9 as double)
          |    / (0.5 * (cast(h_a_e9 as double) + cast(h_b_e9 as double)))
          |    * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
      .select(k :+ col("n") :+ col("mi_e9") :+ col("h_a_e9") :+
        col("h_b_e9") :+ col("nmi_e6"): _*)
  }

  /** Per-key Cronbach's α — internal-consistency RELIABILITY of k
    * parallel item columns: "do these k measurements of the same
    * construct hang together" (`α = k/(k−1)·(1 − Σᵢσᵢ²/σ_T²)` with σ_T²
    * the variance of the per-row item SUM). The scale-reliability
    * complement of the agreement family: [[cohenKappa]]/
    * [[krippendorffAlpha]] score categorical RATERS on items; Cronbach
    * scores numeric ITEMS as a composite scale (the ≥ 0.7 rule of
    * thumb before anyone averages the k columns into one score).
    *
    * Exactness: per-item `(Sᵢ, Qᵢ)` and the row-sum `(S_T, Q_T)` are
    * exact DECIMAL sums over caller-quantized integers; every variance
    * numerator `n·Q − S²` is exact DECIMAL, α is ONE fixed double tree
    * e6-quantized (signed — α can go negative when items anti-vary).
    * Rows with ANY null item drop (the paired contract); keys with
    * zero total variance emit null.
    *
    * Scale shape: ONE map-side-combined aggregate, 2k+3 numbers per
    * key. Output: `(keys…, n, k_items, alpha_e6)`. */
  def cronbachAlpha(df: DataFrame, keyCols: Seq[String],
                    itemCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "cronbachAlpha needs at least one key column")
    require(itemCols.size >= 2, "cronbachAlpha needs k >= 2 item columns")
    val k = keyCols.map(col)
    val kk = itemCols.size
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val items = itemCols.map(c => col(c).cast("long"))
    val total = items.reduce(_ + _)
    val sums = dropNullKeys(df, keyCols)
      .filter(items.map(_.isNotNull).reduce(_ && _))
      .groupBy(k: _*)
      .agg(count(lit(1)).as("n"),
        (items.zipWithIndex.flatMap { case (c, i) =>
          Seq(sum(dec(c)).as(s"__s$i"), sum(dec(c) * c).as(s"__q$i"))
        } :+ sum(dec(total)).as("__st") :+
          sum(dec(total) * total).as("__qt")): _*)
    val itemVarSum = itemCols.indices
      .map(i => s"cast(n * __q$i - __s$i * __s$i as double)")
      .mkString(" + ")
    val totVar = "cast(n * __qt - __st * __st as double)"
    sums
      .withColumn("k_items", lit(kk.toLong))
      .withColumn("alpha_e6", expr(
        s"""case when n >= 2 and $totVar > 0 then
           |  cast(floor(cast($kk as double) / cast(${kk - 1} as double)
           |    * (1.0 - ($itemVarSum) / $totVar)
           |    * 1000000 + 0.5) as bigint)
           |end""".stripMargin))
      .drop(itemCols.indices.flatMap(i => Seq(s"__s$i", s"__q$i")) ++
        Seq("__st", "__qt"): _*)
  }

  /** Per-key empirical-Bayes rate shrinkage — beta-prior moment fit over
    * the key's entities, then per-entity posterior-mean rates
    * `(x + α)/(n + α + β)`: the honest per-domain/per-user rate when
    * trial counts vary wildly (a 1/1 entity must NOT outrank a 97/100
    * one — the exact failure of raw-rate ranking that [[wilsonCi]]
    * bounds one-sided and this fixes point-wise). Prior by method of
    * moments on the entity rates: `c = μ(1−μ)/σ² − 1`, `α = μ·c`,
    * `β = (1−μ)·c`.
    *
    * Exactness: each entity rate is ONE fixed double tree e9-quantized
    * BEFORE crossing rows (the nmiFromCells discipline — a double mean
    * over entities would be order-dependent); μ/σ² come from exact
    * DECIMAL sums of those integers, α/β/shrunk are fixed trees over
    * them, e6-quantized. Keys with < 2 entities, zero rate variance,
    * or a non-positive moment estimate (`c ≤ 0` — rates MORE dispersed
    * than any beta allows) emit null prior and null shrunk rates (raw
    * rates remain).
    *
    * Scale shape: one aggregate for the prior (3 numbers per key), one
    * broadcast-sized join back; per-entity output rides the input
    * partitioning. Output: `(keys…, entity, x, n, rate_e9, alpha_e6,
    * beta_e6, shrunk_e6)`. */
  def ebShrinkRates(df: DataFrame, keyCols: Seq[String], entityCol: String,
                    xCol: String, nCol: String): DataFrame = {
    require(keyCols.nonEmpty, "ebShrinkRates needs at least one key column")
    val k = keyCols.map(col)
    val base = dropNullKeys(df, keyCols)
      .filter(col(entityCol).isNotNull && col(xCol).isNotNull &&
        col(nCol).isNotNull && col(nCol) > 0)
      .select((k :+ col(entityCol).as("entity") :+
        col(xCol).cast("long").as("x") :+ col(nCol).cast("long").as("n")): _*)
      .withColumn("rate_e9", expr(
        "cast(floor(cast(x as double) / cast(n as double) * 1e9 + 0.5) as bigint)"))
      .localCheckpoint(false)
    val prior = base.groupBy(k: _*)
      .agg(count(lit(1)).as("__m"),
        sum(expr("cast(rate_e9 as decimal(38,0))")).as("__sr"),
        sum(expr("cast(rate_e9 as decimal(38,0)) * rate_e9")).as("__qr"))
      .withColumn("__mu", expr(
        "cast(__sr as double) / cast(__m as double) / 1e9"))
      .withColumn("__var", expr(
        """case when __m >= 2 then
          |  cast(__m * __qr - __sr * __sr as double)
          |  / (cast(__m as double) * cast(__m - 1 as double)) / 1e18
          |end""".stripMargin))
      .withColumn("__c", expr(
        """case when __var > 0 then
          |  __mu * (1.0 - __mu) / __var - 1.0 end""".stripMargin))
      .withColumn("__alpha", expr("case when __c > 0 then __mu * __c end"))
      .withColumn("__beta", expr(
        "case when __c > 0 then (1.0 - __mu) * __c end"))
      .select((k :+ col("__alpha") :+ col("__beta")): _*)
    base.join(prior, keyCols)
      .withColumn("alpha_e6", expr(
        "cast(floor(__alpha * 1000000 + 0.5) as bigint)"))
      .withColumn("beta_e6", expr(
        "cast(floor(__beta * 1000000 + 0.5) as bigint)"))
      .withColumn("shrunk_e6", expr(
        """case when __alpha is not null then
          |  cast(floor((cast(x as double) + __alpha)
          |    / (cast(n as double) + __alpha + __beta)
          |    * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
      .drop("__alpha", "__beta")
  }

  /** Post-hoc pairwise Welch z with Benjamini–Hochberg control — the
    * step AFTER [[anovaOneWay]] flags "the groups differ": WHICH pairs
    * differ, with the multiplicity of all k(k−1)/2 comparisons
    * controlled in one FDR family ([[bhCorrect]]) instead of the
    * uncorrected per-pair t-tests that manufacture false positives.
    * Per pair: the [[welchTTest]] statistic; its two-sided p via the
    * Abramowitz–Stegun 26.2.17 normal-tail polynomial (elementary
    * exp/sqrt only — both engines replay the identical tree; the
    * normal approximation to Welch's t is the documented large-n
    * convention, exact small-sample df calibration is the caller's
    * refinement).
    *
    * Exactness: per-(key, group) sufficient sums are exact
    * (n, S, DECIMAL Q); the pair grid is a within-key self-join of the
    * GROUP-LEVEL sums (never rows); t reuses welchTTest's va/vb/se2
    * spelling verbatim; p is one fixed tree e9-quantized; the BH pass
    * inherits [[bhCorrect]]'s integer-threshold contract (ONE global
    * family across all keys — the whole-experiment FDR convention,
    * documented). Pairs with n < 2 a side or zero variance drop at the
    * BH filter (null p).
    *
    * Scale shape: group-grid-sized end-to-end after the one row
    * aggregate; the BH rank window is family-sized by definition.
    * Output: `(keys…, group_a, group_b, n_a, n_b, mean_a_e2,
    * mean_b_e2, t_e4, p_e9, rank, rejected)`. */
  def pairwiseWelch(df: DataFrame, keyCols: Seq[String], groupCol: String,
                    valueCol: String, qPermille: Int = 50): DataFrame = {
    require(keyCols.nonEmpty, "pairwiseWelch needs at least one key column")
    val k = keyCols.map(col)
    val x = col(valueCol).cast("long")
    val sums = dropNullKeys(df, keyCols)
      .filter(col(groupCol).isNotNull && x.isNotNull)
      .groupBy(k :+ col(groupCol).as("__g"): _*)
      .agg(count(lit(1)).as("__n"), sum(x).as("__s"),
        sum(expr(s"cast(cast(`$valueCol` as bigint) as decimal(38,0)) * cast(`$valueCol` as bigint)"))
          .as("__q"))
      .localCheckpoint(false)
    val a = sums.select((k :+ col("__g").as("group_a") :+
      col("__n").as("n_a") :+ col("__s").as("__sa") :+
      col("__q").as("__qa")): _*)
    val b = sums.select((k :+ col("__g").as("group_b") :+
      col("__n").as("n_b") :+ col("__s").as("__sb") :+
      col("__q").as("__qb")): _*)
    val va = "((cast(__qa as double) - cast(__sa as double) * __sa / n_a) / (n_a - 1))"
    val vb = "((cast(__qb as double) - cast(__sb as double) * __sb / n_b) / (n_b - 1))"
    val se2 = s"($va / n_a + $vb / n_b)"
    val pairs = a.join(b, keyCols).filter(col("group_a") < col("group_b"))
      .withColumn("__t", expr(
        s"""case when n_a >= 2 and n_b >= 2 and $se2 > 0 then
           |  (cast(__sa as double) / n_a - cast(__sb as double) / n_b)
           |    / sqrt($se2)
           |end""".stripMargin))
      // Abramowitz-Stegun 26.2.17 two-sided normal tail (Horner form)
      .withColumn("__zt", expr("1.0 / (1.0 + 0.2316419 * abs(__t))"))
      .withColumn("p_e9", expr(
        """case when __t is not null then
          |  cast(floor(2.0 * exp(-abs(__t) * abs(__t) / 2.0)
          |    * 0.3989422804014327
          |    * (__zt * (0.319381530 + __zt * (-0.356563782
          |       + __zt * (1.781477937 + __zt * (-1.821255978
          |       + __zt * 1.330274429)))))
          |    * 1000000000 + 0.5) as bigint)
          |end""".stripMargin))
      .withColumn("mean_a_e2", expr("__sa * 100 div nullif(n_a, 0)"))
      .withColumn("mean_b_e2", expr("__sb * 100 div nullif(n_b, 0)"))
      .withColumn("t_e4", expr(
        "cast(floor(__t * 10000 + 0.5) as bigint)"))
      .drop("__sa", "__qa", "__sb", "__qb", "__t", "__zt")
    bhCorrect(pairs, "p_e9", qPermille,
      tieCols = keyCols ++ Seq("group_a", "group_b"))
  }

  /** Per-key Friedman test — the BLOCKED nonparametric k-treatment
    * screen: "do the treatments rank consistently WITHIN each block"
    * (months, users, matched units), which [[kruskalWallis]] cannot
    * answer — pooling ranks across blocks lets between-block variation
    * swamp the treatment signal; Friedman ranks INSIDE each block so
    * every block is its own control. Tie-corrected (Conover) form:
    * `T = (k−1)·Σ_j(R_j − n(k+1)/2)² / (A − C)` with `A = Σ r²`,
    * `C = nk(k+1)²/4`, `T ~ χ²(k−1)` against the shared
    * [[chi2Crit95E4]] table. Blocks missing any treatment DROP (the
    * complete-design contract — an incomplete block has no within-block
    * comparison for the missing arm).
    *
    * Exactness: midranks carried as EXACT integers `2·r = 2·rank_min +
    * ties − 1`; every sum (R2_j, A·4, the centered squares) is exact
    * DECIMAL — the ×2/×4 scalings cancel in T, which is ONE double
    * division e6-quantized, verdict on the ROUNDED value. Keys where
    * every block ranks everything tied (A = C) emit null.
    *
    * Scale shape: one rank window per (key, block) sharing the block
    * partitioning, then treatment-grid aggregates. Output: `(keys…,
    * n_blocks, k_treatments, dof, chi2_e6, crit5_e4, significant)`. */
  def friedmanTest(df: DataFrame, keyCols: Seq[String], blockCol: String,
                   treatCol: String, valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "friedmanTest needs at least one key column")
    val k = keyCols.map(col)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val rows = dropNullKeys(df, keyCols)
      .filter(col(blockCol).isNotNull && col(treatCol).isNotNull &&
        col(valueCol).isNotNull)
      .select((k :+ col(blockCol).as("__b") :+ col(treatCol).as("__j") :+
        col(valueCol).cast("long").as("__v")): _*)
      // EAGER (round 16, the Mood playbook): the blocked-design inputs
      // are grid-sized (monthly cells), so eager materialization is a
      // measured wash on time while the lazy form was the engine's new
      // largest accumulator-burst magnet (252 events in one 5-query
      // subset run -> 0 eager, family totals 9.03 -> 8.97 s)
      .localCheckpoint(true)
    val kT = rows.groupBy(k: _*)
      .agg(countDistinct(col("__j")).as("__k"))
    val bSize = rows.groupBy(k :+ col("__b"): _*)
      .agg(count(lit(1)).as("__bc"), countDistinct(col("__j")).as("__bd"))
    val wRank = Window.partitionBy(k :+ col("__b"): _*).orderBy(col("__v"))
    val wTies = Window.partitionBy(k :+ col("__b") :+ col("__v"): _*)
    val ranked = rows
      .join(bSize, keyCols :+ "__b")
      .join(kT, keyCols)
      // complete design, one observation per cell: k distinct
      // treatments AND exactly k rows
      .filter(col("__bc") === col("__k") && col("__bd") === col("__k"))
      .withColumn("__r2",
        lit(2L) * rank().over(wRank) + count(lit(1)).over(wTies) - 1L)
    val perKey = ranked.groupBy(k: _*)
      .agg(countDistinct(col("__b")).as("n_blocks"), max(col("__k")).as("__kk"),
        sum(dec(col("__r2")) * col("__r2")).as("__a4"))
    val perTreat = ranked.groupBy(k :+ col("__j"): _*)
      .agg(sum(col("__r2")).as("__rj2"))
      .join(perKey, keyCols)
      .withColumn("__ct", expr(
        """(cast(__rj2 as decimal(38,0)) - cast(n_blocks as decimal(38,0))
          |   * (__kk + 1))
          |* (cast(__rj2 as decimal(38,0)) - cast(n_blocks as decimal(38,0))
          |   * (__kk + 1))""".stripMargin.replaceAll("\n", " ")))
      .groupBy(k: _*).agg(sum(col("__ct")).as("__num4"))
    perKey.join(perTreat, keyCols)
      .withColumn("k_treatments", col("__kk").cast("long"))
      .withColumn("dof", col("k_treatments") - 1L)
      .withColumn("__den4", expr(
        """__a4 - cast(n_blocks as decimal(38,0)) * __kk
          |  * (__kk + 1) * (__kk + 1)""".stripMargin.replaceAll("\n", " ")))
      .withColumn("chi2_e6", expr(
        """case when dof > 0 and __den4 > 0 then
          |  cast(floor(cast(__kk - 1 as double) * cast(__num4 as double)
          |    / cast(__den4 as double) * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
      .withColumn("crit5_e4",
        expr(s"cast((${chi2Crit95Sql("dof")}) as bigint)"))
      .withColumn("significant",
        when(col("chi2_e6").isNotNull && col("crit5_e4").isNotNull,
          col("chi2_e6") > col("crit5_e4") * 100L))
      .select((k :+ col("n_blocks") :+ col("k_treatments") :+ col("dof") :+
        col("chi2_e6") :+ col("crit5_e4") :+ col("significant")): _*)
  }

  /** Per-key Page's trend test — the BLOCKED ordered-alternative screen
    * completing the trend triangle's repeated-measures corner:
    * [[friedmanTest]] asks "do the treatments differ AT ALL within
    * blocks", [[jonckheereTerpstra]] asks "do unblocked groups trend in
    * the given order", Page asks BOTH — do the treatments trend in
    * their natural label order CONSISTENTLY ACROSS blocks (monthly
    * dose-response, priority tiers over time). `L = Σ_j s_j·R_j` over
    * within-block midranks with ascending-label scores `s_j = 1…k`;
    * large-sample `z = (L − n·k(k+1)²/4) / sqrt(n·k²(k+1)(k²−1)/144)`,
    * two-sided verdict at |z| > 1.96 (the [[jonckheereTerpstra]]
    * convention). The variance is the CLASSICAL no-tie form — midrank
    * ties only lose power (standard practice); both engines replay the
    * identical formula, so the readout stays hash-exact.
    *
    * Exactness: midranks carried as exact integers `2·r = 2·rank_min +
    * ties − 1` (the [[friedmanTest]] identity), scores from the dense
    * ascending-label rank (ASCII label contract), so `2L = Σ s_j·2R_j`
    * and `4E = n·k(k+1)²` are exact DECIMAL(38,0); z is ONE fixed
    * double tree `(2·l2 − e4) / (4·sqrt(V))`, e4-quantized, verdict on
    * the rounded value. Blocks missing any treatment DROP (the
    * complete-design contract); keys with k < 2 emit null z.
    *
    * Scale shape: one rank window per (key, block) sharing the block
    * partitioning, then treatment-grid aggregates — [[friedmanTest]]'s
    * plan with one extra grid-sized score window. Output: `(keys…,
    * n_blocks, k_treatments, l2, z_e4, significant)` (`l2` = the
    * doubled statistic 2L, the [[jonckheereTerpstra]] `j2`
    * convention). */
  def pageTrend(df: DataFrame, keyCols: Seq[String], blockCol: String,
                treatCol: String, valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "pageTrend needs at least one key column")
    val k = keyCols.map(col)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val rows = dropNullKeys(df, keyCols)
      .filter(col(blockCol).isNotNull && col(treatCol).isNotNull &&
        col(valueCol).isNotNull)
      .select((k :+ col(blockCol).as("__b") :+
        col(treatCol).cast("string").as("__j") :+
        col(valueCol).cast("long").as("__v")): _*)
      // EAGER — the friedmanTest round-16 measurement (wash on time,
      // zeroes the accumulator-burst class on these grid-sized inputs)
      .localCheckpoint(true)
    val kT = rows.groupBy(k: _*)
      .agg(countDistinct(col("__j")).as("__k"))
    val bSize = rows.groupBy(k :+ col("__b"): _*)
      .agg(count(lit(1)).as("__bc"), countDistinct(col("__j")).as("__bd"))
    val wRank = Window.partitionBy(k :+ col("__b"): _*).orderBy(col("__v"))
    val wTies = Window.partitionBy(k :+ col("__b") :+ col("__v"): _*)
    val ranked = rows
      .join(bSize, keyCols :+ "__b")
      .join(kT, keyCols)
      // complete design, one observation per cell: k distinct
      // treatments AND exactly k rows (the friedmanTest contract)
      .filter(col("__bc") === col("__k") && col("__bd") === col("__k"))
      .withColumn("__r2",
        lit(2L) * rank().over(wRank) + count(lit(1)).over(wTies) - 1L)
    val perKey = ranked.groupBy(k: _*)
      .agg(countDistinct(col("__b")).as("n_blocks"), max(col("__k")).as("__kk"))
    val wScore = Window.partitionBy(k: _*).orderBy(col("__j"))
    val perTreat = ranked.groupBy(k :+ col("__j"): _*)
      .agg(sum(col("__r2")).as("__rj2"))
      .withColumn("__s", dense_rank().over(wScore))
    val l2 = perTreat.groupBy(k: _*)
      .agg(sum(dec(col("__s")) * col("__rj2")).as("__l2"))
    perKey.join(l2, keyCols)
      .withColumn("k_treatments", col("__kk").cast("long"))
      // fail loud past 2^63 — a bare DECIMAL->BIGINT cast nulls
      // silently under non-ANSI Spark (the krippendorffAlpha convention)
      .withColumn("l2", expr(
        """cast(if(__l2 <= 9223372036854775807,
          |       __l2,
          |       cast(raise_error('pageTrend: 2L exceeds BIGINT — split keys upstream')
          |            as decimal(38,0))) as bigint)""".stripMargin))
      .withColumn("__e4", expr(
        """cast(n_blocks as decimal(38,0)) * k_treatments
          |  * (k_treatments + 1) * (k_treatments + 1)"""
          .stripMargin.replaceAll("\n", " ")))
      .withColumn("z_e4", expr(
        """case when n_blocks >= 1 and k_treatments >= 2 then
          |  cast(floor(cast(2 * __l2 - __e4 as double)
          |    / (4.0 * sqrt(cast(n_blocks as double) * k_treatments
          |        * k_treatments * (k_treatments + 1)
          |        * (k_treatments * k_treatments - 1) / 144.0))
          |    * 10000 + 0.5) as bigint)
          |end""".stripMargin))
      .withColumn("significant",
        when(col("z_e4").isNotNull, abs(col("z_e4")) > 19600L))
      .select((k :+ col("n_blocks") :+ col("k_treatments") :+ col("l2") :+
        col("z_e4") :+ col("significant")): _*)
  }

  /** Per-key Quade test — [[friedmanTest]] with blocks WEIGHTED by
    * their within-block RANGE (Quade 1979): a month where the
    * treatments barely differ carries almost no evidence, and Friedman
    * counts it equally — Quade ranks the block ranges and weights each
    * block's centered ranks by that rank, the standard power upgrade at
    * small k (k ≲ 5, exactly the priority-tier shape). `S_ij =
    * Q_i·(r_ij − (k+1)/2)`, `F = (n−1)·B/(A − B)` with `A = ΣS²`,
    * `B = (1/n)·Σ_j S_j²`, `F ~ F(k−1, (n−1)(k−1))`. Emits `f_e6` +
    * both dof WITHOUT a verdict column (the [[anovaOneWay]] precedent —
    * no F-table is inlined; the χ² tests carry verdicts because their
    * one-dof-family table is).
    *
    * Exactness: within-block midranks and block-range weights both ride
    * the `2·rank + ties − 1` integer identity, so `4·S_ij =
    * 2Q_i·(2r_ij − (k+1))` is an exact integer and A, B scale to exact
    * DECIMAL(38,0) sums (`16A = Σ(4S)²`, `16nB = Σ_j(Σ_i 4S)²`); the
    * 16s cancel and `F = (n−1)·SB4/(n·A4 − SB4)` is ONE double division
    * of exact integers, e6-quantized. Blocks missing any treatment DROP
    * (the complete-design contract); keys where A = B emit null F (no
    * error term left: every block internally tied, or the rankings
    * perfectly consistent — the F is formally infinite there).
    *
    * Scale shape: [[friedmanTest]]'s rank window per (key, block), one
    * block-grid weight window, then grid aggregates. Output: `(keys…,
    * n_blocks, k_treatments, dof1, dof2, f_e6)`. */
  def quadeTest(df: DataFrame, keyCols: Seq[String], blockCol: String,
                treatCol: String, valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "quadeTest needs at least one key column")
    val k = keyCols.map(col)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val rows = dropNullKeys(df, keyCols)
      .filter(col(blockCol).isNotNull && col(treatCol).isNotNull &&
        col(valueCol).isNotNull)
      .select((k :+ col(blockCol).as("__b") :+
        col(treatCol).cast("string").as("__j") :+
        col(valueCol).cast("long").as("__v")): _*)
      // EAGER — the friedmanTest round-16 measurement (wash on time,
      // zeroes the accumulator-burst class on these grid-sized inputs)
      .localCheckpoint(true)
    val kT = rows.groupBy(k: _*)
      .agg(countDistinct(col("__j")).as("__k"))
    val bSize = rows.groupBy(k :+ col("__b"): _*)
      .agg(count(lit(1)).as("__bc"), countDistinct(col("__j")).as("__bd"),
        (max(col("__v")) - min(col("__v"))).as("__rng"))
    val wRank = Window.partitionBy(k :+ col("__b"): _*).orderBy(col("__v"))
    val wTies = Window.partitionBy(k :+ col("__b") :+ col("__v"): _*)
    // complete blocks only, with their range (the friedmanTest contract)
    val blocks = bSize.join(kT, keyCols)
      .filter(col("__bc") === col("__k") && col("__bd") === col("__k"))
    // block weights: midrank of the block's range across the key's blocks
    val wQ = Window.partitionBy(k: _*).orderBy(col("__rng"))
    val wQt = Window.partitionBy(k :+ col("__rng"): _*)
    val weighted = blocks
      .withColumn("__q2",
        lit(2L) * rank().over(wQ) + count(lit(1)).over(wQt) - 1L)
    val ranked = rows
      .join(weighted.select((k :+ col("__b") :+ col("__k") :+
        col("__q2")): _*), keyCols :+ "__b")
      .withColumn("__r2",
        lit(2L) * rank().over(wRank) + count(lit(1)).over(wTies) - 1L)
      // 4·S_ij = 2Q_i · (2r_ij − (k+1)) — exact integers end to end
      .withColumn("__s4", dec(col("__q2")) * (col("__r2") - (col("__k") + 1L)))
    val perTreat = ranked.groupBy(k :+ col("__j"): _*)
      .agg(sum(col("__s4")).as("__sj4"))
      .groupBy(k: _*)
      .agg(sum(col("__sj4") * col("__sj4")).as("__sb4"),
        count(lit(1)).as("__kk"))
    val perKey = ranked.groupBy(k: _*)
      .agg(countDistinct(col("__b")).as("n_blocks"),
        sum(col("__s4") * col("__s4")).as("__a4"))
    perKey.join(perTreat, keyCols)
      .withColumn("k_treatments", col("__kk").cast("long"))
      .withColumn("dof1", col("k_treatments") - 1L)
      .withColumn("dof2", (col("n_blocks") - 1L) * (col("k_treatments") - 1L))
      .withColumn("f_e6", expr(
        """case when k_treatments >= 2 and n_blocks >= 2
          |       and cast(n_blocks as decimal(38,0)) * __a4 - __sb4 > 0 then
          |  cast(floor(cast((n_blocks - 1) * __sb4 as double)
          |    / cast(cast(n_blocks as decimal(38,0)) * __a4 - __sb4 as double)
          |    * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
      .select((k :+ col("n_blocks") :+ col("k_treatments") :+ col("dof1") :+
        col("dof2") :+ col("f_e6")): _*)
  }

  /** Per-key Bland–Altman agreement — do two MEASUREMENT METHODS agree
    * numerically: bias `d̄ = mean(a − b)`, limits of agreement
    * `d̄ ± 1.96·s_d`, and the share of pairs inside them (the
    * method-comparison readout correlation famously cannot give — two
    * instruments can correlate at 0.99 and still disagree by a constant
    * the downstream pipeline would swallow silently). The numeric
    * sibling of [[cohenKappa]]'s categorical agreement.
    *
    * Exactness: the difference sums `(n, Σd, Σd²)` are exact
    * (DECIMAL squares); bias/sd/limits are ONE fixed double tree each,
    * e6-quantized; the within-limits flag compares each EXACT integer d
    * against the raw double limits (identical comparison in both
    * engines), counted in a second pass over the SAME frame — the q278
    * two-pass trade, input re-scan bounded by a lazy checkpoint. Keys
    * with n < 2 emit null limits and share.
    *
    * Scale shape: two map-side-combined aggregates over one
    * checkpointed slim frame + a broadcast-sized stats join. Output:
    * `(keys…, n, bias_e6, sd_e6, loa_lo_e6, loa_hi_e6,
    * within_pm)`. */
  def blandAltman(df: DataFrame, keyCols: Seq[String], aCol: String,
                  bCol: String): DataFrame = {
    require(keyCols.nonEmpty, "blandAltman needs at least one key column")
    val k = keyCols.map(col)
    val base = dropNullKeys(df, keyCols)
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select((k :+ (col(aCol).cast("long") - col(bCol).cast("long"))
        .as("__d")): _*)
      .localCheckpoint(false)
    val stats = base.groupBy(k: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__d")).as("__sd"),
        sum(expr("cast(__d as decimal(38,0)) * __d")).as("__qd"))
      .withColumn("__bias", expr("cast(__sd as double) / cast(n as double)"))
      .withColumn("__s", expr(
        """case when n >= 2 then
          |  sqrt(cast(n * __qd - cast(__sd as decimal(38,0)) * __sd as double)
          |       / (cast(n as double) * cast(n - 1 as double))) end"""
          .stripMargin))
      .withColumn("__lo", expr("__bias - 1.96 * __s"))
      .withColumn("__hi", expr("__bias + 1.96 * __s"))
    val within = base.join(stats.select((k :+ col("__lo") :+ col("__hi")): _*),
        keyCols)
      .groupBy(k: _*)
      .agg(sum(when(col("__d") >= col("__lo") && col("__d") <= col("__hi"),
        1L).otherwise(0L)).as("__w"))
    stats.join(within, keyCols)
      .withColumn("bias_e6", expr("cast(floor(__bias * 1000000 + 0.5) as bigint)"))
      .withColumn("sd_e6", expr("cast(floor(__s * 1000000 + 0.5) as bigint)"))
      .withColumn("loa_lo_e6", expr("cast(floor(__lo * 1000000 + 0.5) as bigint)"))
      .withColumn("loa_hi_e6", expr("cast(floor(__hi * 1000000 + 0.5) as bigint)"))
      .withColumn("within_pm", expr(
        "case when __s is not null then __w * 1000 div n end"))
      .select((k :+ col("n") :+ col("bias_e6") :+ col("sd_e6") :+
        col("loa_lo_e6") :+ col("loa_hi_e6") :+ col("within_pm")): _*)
  }

  /** Per-key confusion-matrix point metrics — precision, recall, F1,
    * accuracy, and Matthews correlation from a boolean
    * (predicted, actual) pair: the THRESHOLDED complement of
    * [[groupedAuc]]/[[averagePrecision]] (those rank scores; this
    * scores the deployed cut), with MCC as the headline — the one
    * single-number summary that stays honest under class imbalance
    * (accuracy and F1 both inflate when one class dominates;
    * `MCC = (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)(TN+FN))` does
    * not).
    *
    * Exactness: the four cells are exact integers from ONE conditional
    * aggregate; every ratio is an integer permille/`div`; MCC is ONE
    * fixed double tree (DECIMAL cross-products — n⁴ wraps BIGINT past
    * n ≈ 55k), e6-quantized, signed. Degenerate margins (any factor 0)
    * emit null MCC; empty prediction or truth classes null their
    * ratios.
    *
    * Scale shape: ONE map-side-combined aggregate, four numbers per
    * key. Output: `(keys…, n, tp, fp, fn, tn, precision_pm, recall_pm,
    * f1_pm, accuracy_pm, mcc_e6)`. */
  def confusionMetrics(df: DataFrame, keyCols: Seq[String], predCol: String,
                       actualCol: String): DataFrame = {
    require(keyCols.nonEmpty, "confusionMetrics needs at least one key column")
    val p = col(predCol)
    val y = col(actualCol)
    dropNullKeys(df, keyCols)
      .filter(p.isNotNull && y.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(p && y, 1L).otherwise(0L)).as("tp"),
        sum(when(p && !y, 1L).otherwise(0L)).as("fp"),
        sum(when(!p && y, 1L).otherwise(0L)).as("fn"),
        sum(when(!p && !y, 1L).otherwise(0L)).as("tn"))
      .withColumn("precision_pm", expr("tp * 1000 div nullif(tp + fp, 0)"))
      .withColumn("recall_pm", expr("tp * 1000 div nullif(tp + fn, 0)"))
      .withColumn("f1_pm", expr(
        "2 * tp * 1000 div nullif(2 * tp + fp + fn, 0)"))
      .withColumn("accuracy_pm", expr("(tp + tn) * 1000 div n"))
      .withColumn("mcc_e6", expr(
        """case when (tp + fp) > 0 and (tp + fn) > 0 and (tn + fp) > 0
          |       and (tn + fn) > 0 then
          |  cast(floor(
          |    cast(cast(tp as decimal(38,0)) * tn
          |         - cast(fp as decimal(38,0)) * fn as double)
          |    / sqrt(cast(cast(tp + fp as decimal(38,0)) * (tp + fn)
          |                * (tn + fp) * (tn + fn) as double))
          |    * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
  }

  /** Per-key top-k set stability between two periods — "is the
    * leaderboard churning": Jaccard overlap of the A/B top-k item sets
    * plus the mean |rank displacement| over the common items. The
    * rank-CHURN monitor the drift family doesn't cover (PSI/KS watch
    * the value DISTRIBUTION; this watches WHO is on top — a dashboard's
    * top-10 can fully rotate while the histogram never moves).
    *
    * Exactness: per-(key, side, item) totals are exact integer sums;
    * ranks are deterministic (`value DESC, item ASC` — the
    * rankingMetrics tie convention); Jaccard and displacement are pure
    * integer `div` permille/centi readouts. An empty side yields
    * jaccard 0 (no overlap with a nonempty union) and null
    * displacement; both sides empty never emits (no rows).
    *
    * Scale shape: one aggregate, two bounded top-k windows (item lists
    * per key are leaderboard-sized by the k cut — pool through
    * TopK.perKeyAgg first if the item domain is corpus-bounded, the
    * q255 dial), one k-sized self-join. Output: `(keys…, k, n_a, n_b,
    * n_common, jaccard_pm, mean_disp_e2)`. */
  def topkStability(df: DataFrame, keyCols: Seq[String], sideCol: String,
                    itemCol: String, valueCol: String, sideA: String,
                    sideB: String, k: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "topkStability needs at least one key column")
    val keys = keyCols.map(col)
    val g = col(sideCol)
    val totals = dropNullKeys(df, keyCols)
      .filter((g === sideA || g === sideB) && col(itemCol).isNotNull &&
        col(valueCol).isNotNull)
      .groupBy(keys :+ when(g === sideA, "A").otherwise("B").as("__s") :+
        col(itemCol).as("__it"): _*)
      .agg(sum(col(valueCol).cast("long")).as("__v"))
    stabilityFromTotals(totals, keyCols, k)
  }

  /** The top-k stability readout over a per-(key, __s ∈ {A,B}, __it)
    * total grid (`__v`) — ONE definition shared by the batch operator
    * and the streaming twin (whose complete-mode state IS this grid),
    * the chiSqFromCells convention. */
  def stabilityFromTotals(totals: DataFrame, keyCols: Seq[String],
                          k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val keys = keyCols.map(col)
    val wRank = Window.partitionBy(keys :+ col("__s"): _*)
      .orderBy(col("__v").desc, col("__it").asc)
    val top = totals
      .withColumn("__r", row_number().over(wRank))
      .filter(col("__r") <= k)
      .localCheckpoint(false)
    val a = top.filter(col("__s") === "A")
      .select(keys :+ col("__it") :+ col("__r").as("__ra"): _*)
    val b = top.filter(col("__s") === "B")
      .select(keys :+ col("__it") :+ col("__r").as("__rb"): _*)
    val joined = a.join(b, keyCols :+ "__it", "full_outer")
    joined
      .groupBy(keys: _*)
      .agg(
        sum(when(col("__ra").isNotNull, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__rb").isNotNull, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__ra").isNotNull && col("__rb").isNotNull, 1L)
          .otherwise(0L)).as("n_common"),
        sum(when(col("__ra").isNotNull && col("__rb").isNotNull,
          abs(col("__ra") - col("__rb")).cast("long")).otherwise(0L))
          .as("__disp"))
      .withColumn("k", lit(k.toLong))
      .withColumn("jaccard_pm", expr(
        "case when n_a + n_b - n_common > 0 then n_common * 1000 div (n_a + n_b - n_common) end"))
      .withColumn("mean_disp_e2", expr(
        "case when n_common > 0 then __disp * 100 div n_common end"))
      .drop("__disp")
  }

  /** Per-key quantile treatment effect — the A/B difference AT EACH
    * QUANTILE (p10/p50/p90 by default): a mean shift ([[welchTTest]])
    * can hide a treatment that fattens one tail while thinning the
    * other; QTE shows WHERE in the distribution the effect acts (the
    * distributional readout between the scalar t-test and the full
    * [[histogramDrift]] curve). Lower-fence convention:
    * `Q_q = min v: cum ≥ ⌈q·n/100⌉` per side — exact value-grid order
    * statistics, no interpolation.
    *
    * Exactness: pure integer cumulative counts and fences; the effect
    * is an integer difference. Keys with an empty side emit nothing
    * for it (fence undefined). Scale shape: one side-count grid (bin
    * continuous values upstream — the q281 contract), ONE sort per key
    * shared by both cumulative windows, grid-sized aggregate. Output:
    * one row per (key, quantile): `(keys…, q_pct, q_a, q_b, qte)`. */
  def quantileTreatmentEffect(df: DataFrame, keyCols: Seq[String],
                              groupCol: String, valueCol: String,
                              groupA: String, groupB: String,
                              qs: Seq[Int] = Seq(10, 50, 90)): DataFrame = {
    require(keyCols.nonEmpty, "quantileTreatmentEffect needs at least one key column")
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 99),
      s"quantiles must be in [1, 99], got $qs")
    val k = keyCols.map(col)
    val g = col(groupCol)
    val x = col(valueCol).cast("long")
    val grid = dropNullKeys(df, keyCols)
      .filter((g === groupA || g === groupB) && x.isNotNull)
      .groupBy(k :+ x.as("__v"): _*)
      .agg(sum(when(g === groupA, 1L).otherwise(0L)).as("__ca"),
        sum(when(g === groupB, 1L).otherwise(0L)).as("__cb"))
    val wCum = Window.partitionBy(k: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(k: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cums = grid
      .withColumn("__cuma", sum(col("__ca")).over(wCum))
      .withColumn("__cumb", sum(col("__cb")).over(wCum))
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
    val fenceCols = qs.flatMap(q => Seq(
      min(when(expr(s"__cuma >= ($q * __na + 99) div 100 and __na > 0"),
        col("__v"))).as(s"__qa$q"),
      min(when(expr(s"__cumb >= ($q * __nb + 99) div 100 and __nb > 0"),
        col("__v"))).as(s"__qb$q")))
    val fences = cums.groupBy(k: _*).agg(fenceCols.head, fenceCols.tail: _*)
    val stackExpr = qs.map(q => s"${q}L, __qa$q, __qb$q").mkString(", ")
    fences
      .select((k :+ expr(
        s"stack(${qs.size}, $stackExpr) as (q_pct, q_a, q_b)")): _*)
      .filter(col("q_a").isNotNull && col("q_b").isNotNull)
      .withColumn("qte", col("q_a") - col("q_b"))
  }

  /** Per-key TOST equivalence test on proportions — proves the OPPOSITE
    * direction of the A/B family: a non-significant difference test
    * ([[graft.operators.Funnel]]'s z, [[welchTTest]]) never shows the
    * variants are the SAME (absence of evidence); TOST's two one-sided
    * tests against a margin ±δ do — `z_lo = (d + δ)/SE > 1.645` AND
    * `z_hi = (d − δ)/SE < −1.645` concludes |p_A − p_B| < δ at 5%
    * (the "no worse than" launch criterion, unpooled SE as standard
    * for equivalence).
    *
    * Exactness: the four counts are exact integers from ONE
    * conditional aggregate; d, SE, and both z's are fixed double trees
    * e6/e4-quantized; the verdict fires on the ROUNDED z's. Sides with
    * n = 0 or degenerate SE (both rates 0 or 1) emit null verdict.
    * Output: `(keys…, n_a, x_a, n_b, x_b, d_e6, se_e6, z_lo_e4,
    * z_hi_e4, equivalent)`. */
  def equivalenceTest(df: DataFrame, keyCols: Seq[String], groupCol: String,
                      successCol: String, groupA: String, groupB: String,
                      marginPermille: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "equivalenceTest needs at least one key column")
    require(marginPermille >= 1 && marginPermille <= 500,
      s"marginPermille must be in [1, 500], got $marginPermille")
    val g = col(groupCol)
    val s = col(successCol)
    val delta = marginPermille / 1000.0
    val pa = "(cast(x_a as double) / cast(n_a as double))"
    val pb = "(cast(x_b as double) / cast(n_b as double))"
    val se = s"sqrt($pa * (1.0 - $pa) / cast(n_a as double) + $pb * (1.0 - $pb) / cast(n_b as double))"
    dropNullKeys(df, keyCols)
      .filter((g === groupA || g === groupB) && s.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(when(g === groupA, 1L).otherwise(0L)).as("n_a"),
        sum(when(g === groupA && s, 1L).otherwise(0L)).as("x_a"),
        sum(when(g === groupB, 1L).otherwise(0L)).as("n_b"),
        sum(when(g === groupB && s, 1L).otherwise(0L)).as("x_b"))
      .withColumn("d_e6", expr(
        s"""case when n_a > 0 and n_b > 0 then
           |  cast(floor(($pa - $pb) * 1000000 + 0.5) as bigint) end"""
          .stripMargin))
      .withColumn("se_e6", expr(
        s"""case when n_a > 0 and n_b > 0 and $se > 0 then
           |  cast(floor($se * 1000000 + 0.5) as bigint) end""".stripMargin))
      .withColumn("z_lo_e4", expr(
        s"""case when n_a > 0 and n_b > 0 and $se > 0 then
           |  cast(floor(($pa - $pb + $delta) / $se * 10000 + 0.5) as bigint)
           |end""".stripMargin))
      .withColumn("z_hi_e4", expr(
        s"""case when n_a > 0 and n_b > 0 and $se > 0 then
           |  cast(floor(($pa - $pb - $delta) / $se * 10000 + 0.5) as bigint)
           |end""".stripMargin))
      .withColumn("equivalent",
        when(col("z_lo_e4").isNotNull,
          col("z_lo_e4") > 16450L && col("z_hi_e4") < -16450L))
  }

  /** Per-key ratio-metric A/B with the delta-method, USER-CLUSTERED
    * standard error — the correct test for "revenue per session /
    * conversions per event" metrics, where the naive per-row z
    * ([[graft.operators.Funnel]]'s) is wrong because rows cluster
    * within users: the unit of randomization is the ENTITY, so
    * `R = Σx/Σy` varies by entity-level covariation.
    * `Var(R) ≈ (s_x² + R²s_y² − 2R·s_xy) / (ȳ²·n)` per variant
    * (delta method over entity pairs), `z = (R_A − R_B)/√(V_A+V_B)`.
    * Input is PRE-AGGREGATED per entity (keys, variant, x, y) — the
    * ebShrinkRates convention.
    *
    * Exactness: the per-variant sufficient sums are exact DECIMAL
    * (the welchTTest va-spelling for each variance/covariance); R,
    * Var, and z are fixed double trees e6/e4-quantized, verdict on the
    * ROUNDED |z|. Sides with n < 2 entities, Σy = 0, or a
    * cancellation-negative variance sum emit null z.
    *
    * Scale shape: ONE map-side-combined conditional aggregate, twelve
    * numbers per key. Output: `(keys…, n_a, n_b, ratio_a_e6,
    * ratio_b_e6, z_e4, significant)`. */
  def ratioMetricAb(df: DataFrame, keyCols: Seq[String], variantCol: String,
                    xCol: String, yCol: String, groupA: String,
                    groupB: String): DataFrame = {
    require(keyCols.nonEmpty, "ratioMetricAb needs at least one key column")
    val g = col(variantCol)
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def side(tag: String, in: org.apache.spark.sql.Column) = Seq(
      sum(when(in, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(in, dec(x)).otherwise(dec(lit(0L)))).as(s"__sx$tag"),
      sum(when(in, dec(y)).otherwise(dec(lit(0L)))).as(s"__sy$tag"),
      sum(when(in, dec(x) * x).otherwise(dec(lit(0L)))).as(s"__qx$tag"),
      sum(when(in, dec(y) * y).otherwise(dec(lit(0L)))).as(s"__qy$tag"),
      sum(when(in, dec(x) * y).otherwise(dec(lit(0L)))).as(s"__xy$tag"))
    def trees(t: String): (String, String) = {
      val n = s"n_$t"
      val r = s"(cast(__sx$t as double) / cast(__sy$t as double))"
      val vx = s"((cast(__qx$t as double) - cast(__sx$t as double) * __sx$t / $n) / ($n - 1))"
      val vy = s"((cast(__qy$t as double) - cast(__sy$t as double) * __sy$t / $n) / ($n - 1))"
      val cxy = s"((cast(__xy$t as double) - cast(__sx$t as double) * __sy$t / $n) / ($n - 1))"
      val ybar = s"(cast(__sy$t as double) / cast($n as double))"
      val v = s"(($vx + $r * $r * $vy - 2.0 * $r * $cxy) / ($ybar * $ybar * cast($n as double)))"
      (r, v)
    }
    val (ra, va) = trees("a")
    val (rb, vb) = trees("b")
    val sideCols = side("a", g === groupA) ++ side("b", g === groupB)
    val sums = dropNullKeys(df, keyCols)
      .filter((g === groupA || g === groupB) && x.isNotNull && y.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(sideCols.head, sideCols.tail: _*)
    val ok = s"n_a >= 2 and n_b >= 2 and __sya > 0 and __syb > 0"
    sums
      .withColumn("ratio_a_e6", expr(
        s"case when n_a > 0 and __sya > 0 then cast(floor($ra * 1000000 + 0.5) as bigint) end"))
      .withColumn("ratio_b_e6", expr(
        s"case when n_b > 0 and __syb > 0 then cast(floor($rb * 1000000 + 0.5) as bigint) end"))
      .withColumn("z_e4", expr(
        s"""case when $ok and $va + $vb > 0 then
           |  cast(floor(($ra - $rb) / sqrt($va + $vb) * 10000 + 0.5)
           |       as bigint)
           |end""".stripMargin))
      .withColumn("significant",
        when(col("z_e4").isNotNull, abs(col("z_e4")) > 19600L))
      .drop(Seq("a", "b").flatMap(t =>
        Seq(s"__sx$t", s"__sy$t", s"__qx$t", s"__qy$t", s"__xy$t")): _*)
  }

  /** Per-key Mood's median test — "do the k groups share a MEDIAN": the
    * coarsest, most outlier-proof k-group location screen
    * ([[kruskalWallis]] compares mean ranks and needs comparable
    * shapes; Mood's only asks which side of the grand median each row
    * falls — the right test when tails are wild or values are heavily
    * censored). Rows flag `value > grand median` (per key, LOWER
    * median: min v with `cum ≥ ⌈n/2⌉` — the exact value-grid fence, no
    * interpolation), and the (group × flag) contingency runs through
    * the SHARED [[chiSqFromCells]] readout — df = k−1, the same
    * driver-inlined critical table.
    *
    * Exactness: the median fence is pure integer cumulative counts;
    * the χ² chain inherits chiSqFromCells' exact-identity contract.
    * Keys where every value falls on one side (all equal) have
    * c_levels = 1 ⇒ df 0 ⇒ null verdict, by construction.
    *
    * Scale shape: value-grid median (never a row sort; the rank walk
    * runs IN-TASK over the collected per-key grid — the
    * Sketch.medMadGrid discipline, identical `(n+1) div 2` fence), one
    * broadcast-sized median join back, then the grid-shaped χ² chain.
    * Output: chiSqFromCells' columns + `grand_median`. */
  def moodMedianTest(df: DataFrame, keyCols: Seq[String], groupCol: String,
                     valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "moodMedianTest needs at least one key column")
    val k = keyCols.map(col)
    val v = col(valueCol).cast("long")
    // EAGER (round 17, reversing the round-16 keep-lazy): the row-scale
    // vals frame was the engine's LAST timed accumulator-burst magnet
    // (stop()-racing stragglers reporting into an unregistered
    // checkpoint job). Re-measured at HEAD over three back-to-back
    // A/B pairs, calibrated: eager {2.34, 1.91, 2.27} vs lazy
    // {2.40, 2.43, 1.93} s — a wash (the r16 "+17% tax" was inside the
    // host's noise band), and eager retires the burst class for free.
    // Storage is identical either way — lazy materializes the same
    // blocks on first use; eager only moves the job to call time.
    val vals = dropNullKeys(df, keyCols)
      .filter(col(groupCol).isNotNull && v.isNotNull)
      .select((k :+ col(groupCol).as("__g") :+ v.as("__v")): _*)
      .localCheckpoint(true)
    val medKern = udf((grid: Seq[Seq[Long]]) => {
      val cells = grid.map(a => (a(0), a(1))).sortBy(_._1).toArray
      val n = cells.iterator.map(_._2).sum
      val target = (n + 1L) / 2L
      var cum = 0L; var i = 0; var m = cells.last._1; var found = false
      while (i < cells.length && !found) {
        cum += cells(i)._2
        if (cum >= target) { m = cells(i)._1; found = true }
        i += 1
      }
      m
    })
    val med = vals.groupBy(k :+ col("__v"): _*).agg(count(lit(1)).as("__c"))
      .groupBy(k: _*)
      .agg(GridFence.collectGrid(array(col("__v"), col("__c")),
        "moodMedianTest").as("__grid"))
      .select(k :+ medKern(col("__grid")).as("grand_median"): _*)
    // EAGER on the GRID-sized cells (≈ keys × groups × 2 rows),
    // deliberately: this frame was the engine's largest
    // accumulator-burst magnet under a lazy checkpoint (bursts up to
    // 400/run), and eager materialization of a tiny grid costs one
    // job floor — the one spot where the round-15 lazy-by-default
    // decision (see brierDecomposition) reverses profitably
    val cells = vals.join(med, keyCols)
      .groupBy(k :+ col("__g").as("__a") :+
        (col("__v") > col("grand_median")).as("__b"): _*)
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    chiSqFromCells(cells, keyCols).join(med, keyCols)
  }

  /** Per-key Krippendorff's α (nominal) — chance-corrected agreement for
    * MISSING-DATA annotation: [[cohenKappa]] needs exactly two named
    * raters, [[fleissKappa]] pools variable per-item rating counts but
    * corrects chance with the POPULATION category shares — α is the
    * coefficient built for "any number of raters, each labeling only
    * some items", normalizing each item's pairs by `m_i − 1`
    * (coincidence form) and correcting chance by the FINITE-SAMPLE
    * permutation (the `n − 1` in `D_e` — α of a tiny sample is honest
    * where κ overstates). `α = 1 − (n−1)·Σ_i (m_i² − Σ_c n_ic²)/(m_i−1)
    * / (n² − Σ_c n_c²)` over pairable items (m_i ≥ 2), `n = Σ m_i`.
    *
    * Exactness: ONE (key, item, category) cell aggregate; each item's
    * disagreement term is one fixed double tree over exact integers
    * e9-quantized PER ITEM and summed as DECIMAL(38,0)
    * (order-independent — the fleissKappa discipline); `n² − Σn_c²` is
    * exact DECIMAL; α is ONE fixed tree over the integer pieces,
    * e6-quantized, signed. Items with one rating carry no pair evidence
    * and drop (from n and the marginals both — the pairable-values
    * contract); keys where one category takes everything emit null α.
    *
    * Scale shape: grid-shaped after the map-side-combined cell
    * aggregate, like [[fleissKappa]]. Output: `(keys…, n_items,
    * n_ratings, d_o_e9, alpha_e6)`. */
  def krippendorffAlpha(df: DataFrame, keyCols: Seq[String], itemCol: String,
                        categoryCol: String): DataFrame = {
    require(keyCols.nonEmpty, "krippendorffAlpha needs at least one key column")
    val k = keyCols.map(col)
    val cells = dropNullKeys(df, keyCols)
      .filter(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(k :+ col(itemCol).as("__it") :+ col(categoryCol).as("__c"): _*)
      .agg(count(lit(1)).as("__n"))
      // lazy localCheckpoint (the fleissKappa pattern): the cell grid
      // feeds the per-item and per-category re-aggregations
      .localCheckpoint(false)
    val items = cells.groupBy(k :+ col("__it"): _*)
      .agg(sum(col("__n")).as("__mi"),
        sum(expr("cast(__n as decimal(38,0)) * __n")).as("__sq"))
      .filter(col("__mi") >= 2)
      .withColumn("__di", expr(
        """cast(floor(cast(cast(__mi as decimal(38,0)) * __mi - __sq as double)
          |  / cast(__mi - 1 as double) * 1000000000 + 0.5) as bigint)"""
          .stripMargin))
    val tot = items.groupBy(k: _*)
      .agg(count(lit(1)).as("n_items"), sum(col("__mi")).as("n_ratings"),
        sum(expr("cast(__di as decimal(38,0))")).as("__do"))
    val marg = cells
      .join(items.select(k :+ col("__it"): _*), keyCols :+ "__it")
      .groupBy(k :+ col("__c"): _*).agg(sum(col("__n")).as("__nc"))
      .groupBy(k: _*)
      .agg(sum(expr("cast(__nc as decimal(38,0)) * __nc")).as("__sc"))
    tot.join(marg, keyCols)
      .withColumn("__ne", expr(
        "cast(n_ratings as decimal(38,0)) * n_ratings - __sc"))
      // fail loud past 2^63 — a bare DECIMAL->BIGINT cast would silently
      // null under non-ANSI Spark (the anovaOneWay convention); ~10^9
      // pairable items at m ~ 10 raters gets within sight of the bound
      .withColumn("d_o_e9", expr(
        """cast(if(__do <= 9223372036854775807,
          |       __do,
          |       cast(raise_error('krippendorffAlpha: D_o exceeds 2^63 — sample items upstream')
          |            as decimal(38,0))) as bigint)""".stripMargin))
      .withColumn("alpha_e6", expr(
        """case when __ne > 0 then
          |  cast(floor((1.0 - cast(n_ratings - 1 as double)
          |      * cast(__do as double) / 1000000000.0
          |      / cast(__ne as double))
          |    * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
      .drop("__do", "__sc", "__ne")
  }

  /** Per-key χ² test of independence over two categorical columns — the
    * r×c contingency complement of [[normalizedMutualInfo]]: NMI scores
    * HOW MUCH the columns share, χ² answers IS the association even
    * SIGNIFICANT (the classical screen before trusting any slice-by
    * breakdown — "does language actually depend on source, or is the
    * NMI just small-sample noise"). `χ² = Σ_cells (O − E)²/E` with
    * `E = R·C/N`, df = (r−1)(c−1), 5% critical from the driver-inlined
    * [[chi2Crit95E4]] table (df ≤ 40 — past that the association
    * readout should be [[normalizedMutualInfo]], not a χ² verdict).
    * [[graft.operators.Profile.chiSquare]] is the GLOBAL profiling
    * sibling (one row, Cramér's V effect size, no verdict); this is
    * the per-slice significance screen, with a streaming twin whose
    * complete-mode state is the cell grid.
    *
    * Exactness: the observed-cells-only identity
    * `χ² = Σ_cells O²·N/(R·C) − N` (zero cells' `(0−E)²/E = E` terms
    * fold into the `−N`, so the statistic is the FULL-grid textbook
    * value without ever materializing empty cells); each term is ONE
    * fixed double tree over exact DECIMAL(38,0) integers (`O²·N ≤ N³`
    * — safe to N ≈ 4·10¹² per key, fail-loud above, the anovaOneWay
    * convention), e6-quantized to BIGINT before the order-independent
    * sum (the [[nmiFromCells]] discipline); the `−N·10⁶` subtraction
    * is exact, clamped at 0 (quantization can push an exactly-zero
    * association a few units negative — the anovaOneWay ssb clamp).
    * Keys with r = 1 or c = 1 (df 0) emit null; df > 40 emits the
    * statistic with null verdict.
    *
    * Scale shape: grid-shaped end-to-end after the map-side-combined
    * cell aggregate — marginals and totals re-aggregate the CELLS,
    * never the rows, and the term join keys on (key, class): no cross
    * join anywhere. Output: `(keys…, n, r_levels, c_levels, dof,
    * chi2_e6, crit5_e4, significant)`. */
  def chiSquareIndependence(df: DataFrame, keyCols: Seq[String], aCol: String,
                            bCol: String): DataFrame = {
    require(keyCols.nonEmpty, "chiSquareIndependence needs at least one key column")
    val k = keyCols.map(col)
    val cells = dropNullKeys(df, keyCols)
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(k :+ col(aCol).as("__a") :+ col(bCol).as("__b"): _*)
      .agg(count(lit(1)).as("__c"))
      // lazy localCheckpoint (see brierDecomposition): the cell grid
      // feeds two marginal re-aggregations and the term join
      .localCheckpoint(false)
    chiSqFromCells(cells, keyCols)
  }

  /** χ²₀.₉₅ critical values for df 1…40, e4-quantized — generated
    * driver-side once and INLINED into both engines (the dftTableE15 /
    * sprtConstantsE12 convention), so no inverse-χ² executes at query
    * time anywhere. df 1 = 38415 and df 2 = 59915 deliberately equal
    * [[mcnemar]]'s and [[cochranQ]]'s inline constants. */
  val chi2Crit95E4: IndexedSeq[Long] = IndexedSeq(
    38415L, 59915L, 78147L, 94877L, 110705L, 125916L, 140671L, 155073L,
    169190L, 183070L, 196751L, 210261L, 223620L, 236848L, 249958L, 262962L,
    275871L, 288693L, 301435L, 314104L, 326706L, 339244L, 351725L, 364150L,
    376525L, 388851L, 401133L, 413371L, 425570L, 437730L, 449853L, 461943L,
    473999L, 486024L, 498018L, 509985L, 521923L, 533835L, 545722L, 557585L)

  /** The χ²-critical lookup as a SQL CASE over `dofExpr` — ONE generator
    * shared by the Spark readout and the DuckDB oracle replay, so the
    * table cannot drift between engines. */
  def chi2Crit95Sql(dofExpr: String): String =
    chi2Crit95E4.zipWithIndex
      .map { case (v, i) => s"when $dofExpr = ${i + 1} then $v" }
      .mkString("case ", " ", " end")

  /** The χ² readout over a per-(key, __a, __b) cell-count grid (`__c`)
    * — ONE definition shared by the batch operator and the streaming
    * twin (whose complete-mode state IS this grid), the [[nmiFromCells]]
    * convention: shared-oracle bit-parity cannot drift between
    * hand-synced copies. */
  def chiSqFromCells(cells: DataFrame, keyCols: Seq[String]): DataFrame = {
    val k = keyCols.map(col)
    val rowsM = cells.groupBy(k :+ col("__a"): _*).agg(sum(col("__c")).as("__r"))
    val colsM = cells.groupBy(k :+ col("__b"): _*).agg(sum(col("__c")).as("__cc"))
    val tot = rowsM.groupBy(k: _*)
      .agg(count(lit(1)).as("r_levels"), sum(col("__r")).as("n"))
      .join(colsM.groupBy(k: _*).agg(count(lit(1)).as("c_levels")), keyCols)
    val chi = cells
      .join(rowsM, keyCols :+ "__a")
      .join(colsM, keyCols :+ "__b")
      .join(tot.select(k :+ col("n"): _*), keyCols)
      // fail loud past the DECIMAL(38,0) bound: O²·N ≤ N³ needs
      // N ≤ ~4·10¹² (the anovaOneWay convention — a bare overflow
      // would silently null where DuckDB HUGEINT keeps computing)
      .withColumn("__t", expr(
        """cast(floor(
          |  cast(if(n <= 4000000000000,
          |          cast(__c as decimal(38,0)) * __c * n,
          |          cast(raise_error('chiSquareIndependence: n exceeds 4e12 per key — pre-aggregate or sample upstream')
          |               as decimal(38,0))) as double)
          |  / cast(cast(__r as decimal(38,0)) * __cc as double)
          |  * 1000000 + 0.5) as bigint)""".stripMargin))
      .groupBy(k: _*).agg(sum(col("__t")).as("__s"))
    tot.join(chi, keyCols)
      .withColumn("dof", (col("r_levels") - 1) * (col("c_levels") - 1))
      .withColumn("chi2_e6",
        when(col("dof") > 0,
          greatest(lit(0L), col("__s") - col("n") * 1000000L)))
      .withColumn("crit5_e4",
        expr(s"cast((${chi2Crit95Sql("dof")}) as bigint)"))
      .withColumn("significant",
        when(col("chi2_e6").isNotNull && col("crit5_e4").isNotNull,
          col("chi2_e6") > col("crit5_e4") * 100L))
      .drop("__s")
  }

  /** Sample-ratio-mismatch check (SRM): χ² GOODNESS-OF-FIT of observed
    * arm counts against the DESIGNED allocation ratio — the first
    * health gate of every A/B readout (a biased assignment invalidates
    * every downstream metric before any of this tier's tests run;
    * `chiSquareIndependence` tests association between two OBSERVED
    * columns, this tests observed-vs-DESIGN — a different null).
    *
    * Exactness: with integer design weights `w` (W = Σw), each arm's
    * term `(O·W − N·w)²/(N·w·W)` is a ratio of exact DECIMALs —
    * e6-quantized per ARM before the integer sum. An observed arm
    * OUTSIDE the design RAISES (that arm is precisely the assignment
    * bug SRM exists to catch — a silent drop would hide it); designed
    * arms with zero observations participate with O = 0. Verdict
    * against the shared [[chi2Crit95E4]] table at df = k−1.
    *
    * Scale shape: one count-by-arm aggregate (map-side combined), then
    * arithmetic on k rows. Output: one row
    * `(n_total, n_arms, dof, chi2_e6, crit5_e4, srm_detected)`. */
  def srmCheck(df: DataFrame, armCol: String,
               expected: Seq[(String, Long)]): DataFrame = {
    require(expected.size >= 2, "srmCheck needs at least two designed arms")
    require(expected.forall(_._2 > 0L), "design weights must be positive")
    require(expected.map(_._1).distinct.size == expected.size,
      "design arm names must be distinct")
    require(expected.size <= 41, "df > 40 exceeds the chi2Crit95E4 table")
    val spark = df.sparkSession
    import spark.implicits._
    val bigW = expected.map(_._2).sum
    val exp = expected.toDF("__arm", "__w")
    val obs = df.filter(col(armCol).isNotNull)
      .groupBy(col(armCol).cast("string").as("__arm"))
      .agg(count(lit(1)).as("__o"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val joined = obs.join(broadcast(exp), Seq("__arm"), "full_outer")
      .select(col("__arm"), coalesce(col("__o"), lit(0L)).as("__o"),
        when(col("__w").isNull,
          expr("raise_error(concat('srmCheck: observed arm ''', __arm, " +
            "''' is not in the designed allocation'))").cast("long"))
          .otherwise(col("__w")).as("__w"))
    val tot = joined.agg(sum(col("__o")).as("__n"))
    val diff = dec(col("__o")) * lit(bigW) - dec(col("__n")) * col("__w")
    val term = floor(d(diff * diff) / d(dec(col("__n")) * col("__w") * lit(bigW))
      * 1e6 + 0.5).cast("long")
    val dof = expected.size - 1
    joined.crossJoin(broadcast(tot))
      .withColumn("__t", when(col("__n") > 0L, term))
      .agg(max(col("__n")).as("n_total"),
        count(lit(1)).cast("long").as("n_arms"),
        sum(col("__t")).as("chi2_e6"))
      .withColumn("dof", lit(dof.toLong))
      .withColumn("crit5_e4", lit(chi2Crit95E4(dof - 1)))
      .withColumn("srm_detected",
        when(col("chi2_e6").isNotNull, col("chi2_e6") > col("crit5_e4") * 100L))
      .select("n_total", "n_arms", "dof", "chi2_e6", "crit5_e4", "srm_detected")
  }

  /** Bartlett's test of equal variances across k groups — the
    * PARAMETRIC variance-homogeneity screen beside the robust
    * Brown–Forsythe (Bartlett is the likelihood-ratio test, most
    * powerful under normality but sensitive to heavy tails — report
    * both and disagreement ITSELF flags non-normality; Bartlett 1937):
    * `T = [(N−k)·ln s_p² − Σ(nᵢ−1)·ln sᵢ²] / C` with the finite-sample
    * correction `C = 1 + (Σ 1/(nᵢ−1) − 1/(N−k)) / (3(k−1))`, χ²(k−1).
    *
    * Exactness: per-group variance numerators `Qᵢ = nᵢ·Σx² − (Σx)²`
    * are exact DECIMALs; every per-group transcendental/rational term
    * is quantized to a fixed grid BEFORE its cross-group sum
    * (`ln sᵢ²` e9, `Qᵢ/nᵢ` e6, `1/(nᵢ−1)` e12), so all cross-group
    * sums are exact integers and the final T is one double tree.
    * The `Qᵢ/nᵢ` e6 term is UNBOUNDED in the data (it is ~nᵢ·σᵢ², so
    * lineitem dollars pass 2⁶³ already at ~2·10⁴ rows/group): it is
    * routed through DECIMAL(38,0), never a BIGINT cast (a non-ANSI
    * double→long cast would silently saturate at Long.MaxValue — the
    * q269/q271/q309 failure class), and RAISES past `Qᵢ/nᵢ ≥ 10²⁴`
    * (headroom: 41 groups × 10³⁰ e6-scaled < 10³⁸) — bin/rescale
    * values upstream. k−1 > 40 also RAISES (past the inlined
    * [[chi2Crit95E4]] table, the srmCheck convention).
    * Groups need nᵢ ≥ 2 and sᵢ² > 0 (a zero-variance group has a
    * −∞ log-likelihood — those emit a null verdict, not garbage).
    *
    * Scale shape: one aggregate to k group rows, then arithmetic.
    * Output: one row `(n_total, k, dof, bartlett_t_e6, crit5_e4,
    * heteroscedastic)`. */
  def bartlettTest(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val v = col(valueCol).cast("long")
    val g = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(dec(v)).as("sx"),
        sum(dec(v) * v).as("sxx"))
      .withColumn("q", dec(col("n")) * col("sxx") - col("sx") * col("sx"))
    // per-group quantized terms (each ONE fixed tree, summed as integers)
    val s2 = d(col("q")) / d(dec(col("n")) * (col("n") - lit(1L)))
    val rows = g
      .withColumn("__ok", col("n") > 1L && col("q") > 0)
      .withColumn("__ln_e9", when(col("__ok"),
        floor(log(s2) * 1e9 + 0.5).cast("long")))
      // Spark floor(double) returns LONG (saturating non-ANSI at 2⁶³) —
      // take floor as the exact double identity f − (f mod 1) instead
      // (exact for f ≥ 0: below 2⁵³ both terms are representable and the
      // subtraction result floor(f) is representable; at/above 2⁵³ the
      // fraction is 0), then the integer-valued double casts to
      // DECIMAL(38,0) exactly — bit-equal to DuckDB's
      // CAST(floor(...) AS HUGEINT) on the same tree
      .withColumn("__sp_e6", when(col("__ok"),
        when(d(col("q")) / d(col("n")) >= lit(1e24),
          expr("raise_error('bartlettTest: per-group sum-of-squares " +
            "q/n >= 1e24 exceeds the e6 quantization bound — " +
            "bin/rescale values upstream')").cast("decimal(38,0)"))
          .otherwise {
            val f = d(col("q")) / d(col("n")) * lit(1e6) + lit(0.5)
            (f - (f % lit(1.0))).cast("decimal(38,0)")
          }))
      .withColumn("__inv_e12", when(col("__ok"),
        floor(lit(1e12) / d(col("n") - lit(1L)) + 0.5).cast("long")))
    val agg = rows.agg(
      count(lit(1)).cast("long").as("k_all"),
      count(when(col("__ok"), 1)).cast("long").as("k"),
      coalesce(sum(when(col("__ok"), col("n"))), lit(0L)).as("n_total"),
      // widen: (nᵢ−1)·ln_e9 can pass 2⁶³ at 10¹² rows/group
      sum(when(col("__ok"), dec(col("n") - lit(1L)) * col("__ln_e9"))).as("swl"),
      sum(col("__sp_e6")).as("ssp"), sum(col("__inv_e12")).as("sinv"))
    val nk = d(col("n_total") - col("k"))
    val lnSp = log(d(col("ssp")) / 1e6 / nk)
    val c = lit(1.0) + (d(col("sinv")) / 1e12 - lit(1.0) / nk) /
      (lit(3.0) * d(col("k") - lit(1L)))
    val t = (nk * lnSp - d(col("swl")) / 1e9) / c
    val ok = col("k") > 1L && col("k") === col("k_all") && col("n_total") > col("k")
    agg
      .withColumn("dof", when(ok, col("k") - 1L))
      // |T|·1e6 past 2⁶³ would saturate the long floor — T ≈ (N−k)·Δln
      // only reaches 9·10¹² near 10¹² strongly-heteroscedastic rows;
      // fail loud there rather than clamp (the q349 lesson, applied to
      // the READOUT too)
      .withColumn("bartlett_t_e6", when(ok,
        when(abs(t) >= lit(9.0e12),
          expr("raise_error('bartlettTest: |T| >= 9e12 exceeds the e6 " +
            "readout bound')").cast("long"))
          .otherwise(floor(t * 1e6 + 0.5).cast("long"))))
      .withColumn("crit5_e4", when(ok,
        when(col("dof") > 40L,
          expr("raise_error('bartlettTest: k-1 > 40 exceeds the inlined " +
            "chi-square critical table')").cast("bigint"))
          .otherwise(expr(s"cast((${chi2Crit95Sql("dof")}) as bigint)"))))
      .withColumn("heteroscedastic", when(ok,
        col("bartlett_t_e6") > col("crit5_e4") * 100L))
      .select(col("n_total"), col("k"), col("dof"), col("bartlett_t_e6"),
        col("crit5_e4"), col("heteroscedastic"))
  }

  /** Hodges–Lehmann shift estimator between two sides per key — the
    * LOCATION ESTIMATE the Mann–Whitney test implies (HL is the shift
    * Δ that centers the MW statistic; Hodges & Lehmann 1963): the
    * median of ALL pairwise differences `x_a − x_b`. Robust like the
    * median-of-each-side difference but ~95% Gaussian-efficient, and
    * the natural companion readout to [[mannWhitney]]'s verdict —
    * "the treatment shifts the distribution by ABOUT THIS MUCH".
    *
    * Exactness: pure integers end to end — the pairwise-difference
    * DISTRIBUTION is the cross of the two per-side VALUE GRIDS with
    * multiplicity `c_a·c_b`, and the estimate is the exact lower
    * weighted median (the house `(500·n + 999) div 1000` fence). No
    * float anywhere.
    *
    * Scale shape: the cross runs at grid×grid per key, NEVER rows×rows
    * — cost is `|gridA|·|gridB|`, so `valueCol` must be bounded-
    * cardinality (quantize upstream: dollars not cents, the q146
    * framing). That contract is what makes an O(n²)-pair estimator
    * feasible at 100 TB: a million rows over a 1k-value grid is a 1M
    * cross, not 10¹². Output: `(keys…, n_a, n_b, n_pairs, hl_shift)`;
    * keys missing either side emit nothing. */
  def hodgesLehmann(df: DataFrame, keyCols: Seq[String], sideCol: String,
                    valueCol: String): DataFrame = {
    val k = keyCols.map(col)
    val base = dropNullKeys(df, keyCols)
      .filter(col(sideCol).isNotNull && col(valueCol).isNotNull)
    val side = col(sideCol).cast("boolean")
    def grid(cond: org.apache.spark.sql.Column, v: String, c: String) =
      base.filter(cond)
        .groupBy(k :+ col(valueCol).cast("long").as(v): _*)
        .agg(count(lit(1)).as(c))
    val ga = grid(side, "__va", "__ca")
    val gb = grid(!side, "__vb", "__cb")
    val diffs = (if (keyCols.isEmpty) ga.crossJoin(gb)
                 else ga.join(gb, keyCols))
      .groupBy(k :+ (col("__va") - col("__vb")).as("__d"): _*)
      .agg(sum(col("__ca") * col("__cb")).as("__c"))
    val wCum = (if (keyCols.isEmpty) Window.partitionBy(lit(1))
                else Window.partitionBy(k: _*)).orderBy(col("__d"))
    val wAll = if (keyCols.isEmpty) Window.partitionBy(lit(1))
               else Window.partitionBy(k: _*)
    val sides = base.groupBy(k: _*)
      .agg(count(when(side, 1)).as("n_a"), count(when(!side, 1)).as("n_b"))
    val hl = diffs
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .filter(col("__cum") >= expr("(500 * __n + 999) div 1000"))
      .groupBy(k: _*).agg(min(col("__d")).as("hl_shift"), max(col("__n")).as("n_pairs"))
    val joined = if (keyCols.isEmpty) sides.crossJoin(hl)
                 else sides.join(hl, keyCols)
    val out = joined.select(
      k :+ col("n_a") :+ col("n_b") :+ col("n_pairs") :+ col("hl_shift"): _*)
    if (keyCols.isEmpty) out else out.orderBy(k: _*)
  }

  /** Coarsened-exact-matching ATT (Iacus–King–Porro CEM): stratify on
    * the (caller-coarsened) covariate cells, keep strata with BOTH
    * treated and control units, weight each matched stratum's
    * treated-vs-control mean gap by its treated share — the
    * observational-causal answer the A/B tier (CUPED, QTE, ratio-metric)
    * cannot give when assignment was NOT randomized. Also reports how
    * many treated units matching DROPPED — the overlap diagnostic that
    * decides whether the estimate is usable at all.
    *
    * Exactness: integer-quantized `valueCol` (caller's cents/dollars
    * framing), per-stratum sums exact DECIMAL; each stratum's mean gap
    * goes through ONE fixed double tree and is e6-quantized BEFORE the
    * cross-strata sum, so the sum is an exact integer in any partition
    * order (the float-sum-never-crosses-a-row-boundary discipline —
    * cross-strata float addition would be order-dependent). The final
    * `att_e6 = floor(Σ nₜₛ·gap_e6ₛ / Nₜ + 0.5)` is one double division
    * (floor(x+0.5) is round-half-up for BOTH signs in both engines —
    * gaps go negative, so no integer `div`, the Spark-truncates/DuckDB-
    * floors divergence).
    *
    * Scale shape: ONE shuffle on the covariate cells (conditional sums,
    * map-side combined), then a scalar aggregate — strata count is
    * covariate-cardinality-bounded, rows are not. Output: one row
    * `(n_strata_matched, n_treated_matched, n_control_matched,
    * n_treated_dropped, att_e6)`. */
  def cemAtt(df: DataFrame, treatCol: String, valueCol: String,
             covCols: Seq[String]): DataFrame = {
    require(covCols.nonEmpty, "cemAtt needs at least one covariate column")
    attFromStrata(cemStrata(df, treatCol, valueCol, covCols))
  }

  /** The CEM stratum grid — `(covCols…, nt, nc, st, sc)` per covariate
    * cell. Split out so the streaming twin's complete-mode state can BE
    * this grid (the `chiSqFromCells` shared-readout convention). */
  def cemStrata(df: DataFrame, treatCol: String, valueCol: String,
                covCols: Seq[String]): DataFrame = {
    val base = dropNullKeys(df, covCols)
      .filter(col(treatCol).isNotNull && col(valueCol).isNotNull)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val t = col(treatCol).cast("boolean")
    val v = col(valueCol).cast("long")
    base.groupBy(covCols.map(col): _*)
      .agg(count(when(t, 1)).as("nt"), count(when(!t, 1)).as("nc"),
        sum(when(t, dec(v))).as("st"), sum(when(!t, dec(v))).as("sc"))
  }

  /** The ATT readout over a [[cemStrata]] grid — ONE definition shared
    * by the batch operator and the streaming twin, so their oracle
    * parity cannot drift between hand-synced copies. */
  def attFromStrata(strata: DataFrame): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val matched = col("nt") > 0L && col("nc") > 0L
    // the per-stratum mean gap is OUTCOME-scaled (unbounded in the
    // data): past 9·10¹² the e6 long floor would silently saturate
    // where the oracle's HUGEINT cast fail-louds — raise instead
    val rawGap = d(col("st")) / d(col("nt")) - d(col("sc")) / d(col("nc"))
    val gapE6 = when(abs(rawGap) >= lit(9.0e12),
      expr("raise_error('attFromStrata: |stratum mean gap| >= 9e12 " +
        "exceeds the e6 readout bound — rescale outcomes upstream')")
        .cast("long"))
      .otherwise(floor(rawGap * 1e6 + 0.5).cast("long"))
    strata
      .withColumn("__g", when(matched, gapE6))
      .agg(
        count(when(matched, 1)).as("n_strata_matched"),
        coalesce(sum(when(matched, col("nt"))), lit(0L)).as("n_treated_matched"),
        coalesce(sum(when(matched, col("nc"))), lit(0L)).as("n_control_matched"),
        coalesce(sum(when(!matched, col("nt"))), lit(0L)).as("n_treated_dropped"),
        coalesce(sum(when(matched, dec(col("nt")) * col("__g"))), dec(lit(0)))
          .as("__num"))
      .withColumn("att_e6",
        when(col("n_treated_matched") > 0L,
          floor(d(col("__num")) / d(col("n_treated_matched")) + 0.5).cast("long")))
      .drop("__num")
  }

  /** Per-key 2×2 difference-in-differences — the panel causal estimator
    * beside [[cemAtt]]'s cross-sectional matching: with a treated group,
    * a pre/post period split, and the parallel-trends assumption,
    * `DiD = (ȳ₁₁ − ȳ₁₀) − (ȳ₀₁ − ȳ₀₀)` nets out both the group's
    * baseline gap and the common time shock (Card & Krueger 1994's
    * design). The SE treats the four cell means as independent — the
    * saturated-regression robust variance `Σ sᵢ²/nᵢ` over the cells.
    *
    * Exactness: twelve exact integer moments per key (count / LONG sum /
    * DECIMAL(38,0) sum-of-squares per cell — the [[welchTTest]]
    * discipline, one map-side-combined conditional aggregate), then
    * `did_e6`, `t_e4` are ONE fixed double tree each, mirrored literally
    * in the SQL oracle. Cells with n < 2 (or zero variance everywhere)
    * emit null t; a MISSING cell nulls the estimate too — a 2×2 with an
    * empty cell is not a DiD. `significant` decides on the ROUNDED t at
    * |t| > 1.96 so both engines agree. Rows with null group/period/value
    * drop.
    *
    * Output: `(keys…, n_00, n_01, n_10, n_11, mean_00_e2…mean_11_e2,
    * did_e6, t_e4, significant)` — cell suffix = <treat><post>. */
  def diffInDiff(df: DataFrame, keyCols: Seq[String], treatCol: String,
                 postCol: String, valueCol: String): DataFrame =
    didFromMoments(didMoments(df, keyCols, treatCol, postCol, valueCol))

  /** The per-key 2×2 moment grid behind [[diffInDiff]] — count / LONG
    * sum / DECIMAL(38,0) sum-of-squares per cell, one map-side-combined
    * conditional aggregate. Split out (the cemStrata/attFromStrata
    * factoring) so the STREAMING twin can hold exactly this grid as
    * complete-mode state and share [[didFromMoments]]'s readout. */
  def didMoments(df: DataFrame, keyCols: Seq[String], treatCol: String,
                 postCol: String, valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "diffInDiff needs at least one key column")
    val t = col(treatCol)
    val p = col(postCol)
    val x = col(valueCol).cast("long")
    val cells = Seq(("00", !t && !p), ("01", !t && p),
      ("10", t && !p), ("11", t && p))
    val aggs = cells.flatMap { case (c, cond) => Seq(
      sum(when(cond, 1L).otherwise(0L)).as(s"n_$c"),
      sum(when(cond, x).otherwise(0L)).as(s"__s$c"),
      sum(when(cond, expr(
          s"cast(cast(`$valueCol` as bigint) as decimal(38,0)) * cast(`$valueCol` as bigint)"))
        .otherwise(expr("cast(0 as decimal(38,0))"))).as(s"__q$c"))
    }
    dropNullKeys(df, keyCols)
      .filter(t.isNotNull && p.isNotNull && x.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** DiD readout over a [[didMoments]] grid — the single shared
    * implementation both the batch operator and the streaming twin call,
    * so estimate parity cannot drift between hand-synced copies. */
  def didFromMoments(moments: DataFrame): DataFrame = {
    val cells = Seq("00", "01", "10", "11")
    def v(c: String) =
      s"((cast(__q$c as double) - cast(__s$c as double) * __s$c / n_$c) / (n_$c - 1))"
    def m(c: String) = s"(cast(__s$c as double) / n_$c)"
    val allN1 = cells.map(c => s"n_$c >= 1").mkString(" and ")
    val allN2 = cells.map(c => s"n_$c >= 2").mkString(" and ")
    val did = s"((${m("11")} - ${m("10")}) - (${m("01")} - ${m("00")}))"
    val se2 = cells.map(c => s"${v(c)} / n_$c").mkString(" + ")
    // FLOOR division, not Spark's truncate-toward-zero `div`: the q352
    // oracle quantizes with DuckDB `//` (floor), and the two diverge on a
    // NEGATIVE cell sum — the identity keeps a generic (possibly negative)
    // value domain bit-identical across engines; same integers on the
    // non-negative TPC-H domain
    def meanE2(c: String) = expr(
      s"""case when n_$c > 0 then
         |  (__s$c * 100 div n_$c)
         |  - (case when __s$c * 100 % n_$c != 0 and __s$c < 0
         |     then 1 else 0 end) end""".stripMargin)
    moments
      .withColumn("mean_00_e2", meanE2("00"))
      .withColumn("mean_01_e2", meanE2("01"))
      .withColumn("mean_10_e2", meanE2("10"))
      .withColumn("mean_11_e2", meanE2("11"))
      .withColumn("did_e6", expr(
        s"""case when $allN1 then
           |  cast(floor($did * 1000000 + 0.5) as bigint) end""".stripMargin))
      .withColumn("t_e4", expr(
        s"""case when $allN2 and ($se2) > 0 then
           |  cast(floor($did / sqrt($se2) * 10000 + 0.5) as bigint)
           |end""".stripMargin))
      .withColumn("significant",
        when(col("t_e4").isNotNull, abs(col("t_e4")) > 19600L))
      .drop(cells.flatMap(c => Seq(s"__s$c", s"__q$c")): _*)
  }

  /** O'Brien–Fleming-shaped boundary ladder for [[groupSequential]],
    * e4-quantized: `bound_k = c·√(K/k)` — early looks pay a much higher
    * bar, the final look sits near the fixed-horizon critical value
    * (O'Brien & Fleming 1979). Computed ONCE here and interpolated into
    * both engines (the discount-table precedent). */
  def obfBoundariesE4(k: Int, c: Double = 2.04): Seq[Long] = {
    require(k >= 1 && k <= 20, s"looks in [1,20], got $k")
    (1 to k).map(i => math.floor(c * math.sqrt(k.toDouble / i) * 1e4 + 0.5).toLong)
  }

  /** Group-sequential A/B monitoring — the PEEKING-SAFE test the funnel
    * A/B (q240) and SPRT (q292) bracket from either side: k interim
    * LOOKS at cumulative data, each compared against a spending
    * boundary so the family-wise α stays controlled (Pocock 1977;
    * O'Brien & Fleming 1979). SPRT re-decides per observation;
    * fixed-horizon waits for all data; this is the industry-standard
    * middle (weekly experiment reviews).
    *
    * Exactness: per-look Welch moments (exact longs/DECIMAL — the
    * [[welchTTest]] discipline) cumulate over the LOOK GRID (a window
    * over k rows, not rows of data); z is the welch tree e4-quantized;
    * the boundary ladder is a shared literal table; `reject` compares
    * ROUNDED z to the rounded boundary so engines agree; `stopped`
    * marks every look at or after the first rejection (the monitor's
    * "this experiment already ended" flag).
    *
    * Output: one row per look — `(look, n_a, n_b, z_e4, bound_e4,
    * reject, stopped)`. */
  def groupSequential(df: DataFrame, lookCol: String, groupCol: String,
                      valueCol: String, boundariesE4: Seq[Long]): DataFrame = {
    require(boundariesE4.nonEmpty, "groupSequential needs a boundary ladder")
    gsFromMoments(
      gsMoments(df, lookCol, groupCol, valueCol, boundariesE4.length),
      boundariesE4)
  }

  /** The per-look Welch moment grid behind [[groupSequential]] — split
    * out (the didMoments factoring) so the STREAMING twin can hold
    * exactly this k-row grid as complete-mode state and share
    * [[gsFromMoments]]'s readout. */
  def gsMoments(df: DataFrame, lookCol: String, groupCol: String,
                valueCol: String, k: Int): DataFrame = {
    val a = col(groupCol)
    val x = col(valueCol).cast("long")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    df
      .filter(a.isNotNull && x.isNotNull &&
        col(lookCol).isNotNull && col(lookCol).between(1, k))
      .groupBy(col(lookCol).cast("int").as("look"))
      .agg(
        sum(when(a, 1L).otherwise(0L)).as("__na"),
        sum(when(a, x).otherwise(0L)).as("__sa"),
        sum(when(a, dec(x) * x).otherwise(dec(lit(0)))).as("__qa"),
        sum(when(!a, 1L).otherwise(0L)).as("__nb"),
        sum(when(!a, x).otherwise(0L)).as("__sb"),
        sum(when(!a, dec(x) * x).otherwise(dec(lit(0)))).as("__qb"))
  }

  /** Sequential-boundary readout over a [[gsMoments]] grid — shared by
    * the batch operator and the streaming twin so parity cannot drift. */
  def gsFromMoments(perLook: DataFrame, boundariesE4: Seq[Long]): DataFrame = {
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("look"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    import perLook.sparkSession.implicits._
    val bounds = boundariesE4.zipWithIndex
      .map { case (b, i) => (i + 1, b) }.toDF("look", "bound_e4")
    val va = "((cast(qa as double) - cast(sa as double) * sa / n_a) / (n_a - 1))"
    val vb = "((cast(qb as double) - cast(sb as double) * sb / n_b) / (n_b - 1))"
    val se2 = s"($va / n_a + $vb / n_b)"
    perLook
      .withColumn("n_a", sum(col("__na")).over(wCum))
      .withColumn("sa", sum(col("__sa")).over(wCum))
      .withColumn("qa", sum(col("__qa")).over(wCum))
      .withColumn("n_b", sum(col("__nb")).over(wCum))
      .withColumn("sb", sum(col("__sb")).over(wCum))
      .withColumn("qb", sum(col("__qb")).over(wCum))
      .join(broadcast(bounds), Seq("look"))
      .withColumn("z_e4", expr(
        s"""case when n_a >= 2 and n_b >= 2 and $se2 > 0 then
           |  cast(floor((cast(sa as double) / n_a - cast(sb as double) / n_b)
           |             / sqrt($se2) * 10000 + 0.5) as bigint)
           |end""".stripMargin))
      .withColumn("reject",
        when(col("z_e4").isNotNull, abs(col("z_e4")) > col("bound_e4")))
      .withColumn("__first",
        min(when(col("reject"), col("look"))).over(wAll))
      .withColumn("stopped",
        col("__first").isNotNull && col("look") >= col("__first"))
      .select("look", "n_a", "n_b", "z_e4", "bound_e4", "reject", "stopped")
  }

  /** Permutation placebo test for [[diffInDiff]] — the design-validity
    * inference the causal tier was missing: re-estimate the DiD under
    * `reps` DETERMINISTIC pseudo-assignments of treatment (md5 of
    * unit-id ⊕ replicate index — reproducible under retries, the
    * hashSplit discipline, never rand()), and report the permutation
    * p-value `(1 + #{|DiD_b| ≥ |DiD_obs|}) / (reps + 1)` (Fisher's exact
    * randomization logic; Bertrand–Duflo–Mullainathan 2004 recommend
    * exactly this placebo for DiD). Comparisons run on the ROUNDED e6
    * estimates so both engines agree bit-for-bit.
    *
    * Scale shape: the replicate axis explodes rows×reps BEFORE the
    * moment aggregate (broadcast range join — data crosses the wire
    * once; the aggregate map-side combines to keys×reps×4 cells), so
    * cost is linear in reps — `reps` is the documented dial (default 19
    * ⇒ p resolution 0.05). The md5 runs ONCE per row (replicate b reads
    * BIT b of the unit hash — a per-(unit,b) hash measured ~9x the whole
    * query at 10×, and md5 bits are the same independent coin flips);
    * reps ≤ 30 bounds the bit budget. Placebo replicates whose 2×2
    * loses a cell emit null and are excluded from the denominator,
    * counted loudly in `n_reps`.
    *
    * Output: `(keys…, did_obs_e6, n_reps, n_ge, p_e6)`. */
  def didPlacebo(df: DataFrame, keyCols: Seq[String], unitCol: String,
                 treatCol: String, postCol: String, valueCol: String,
                 reps: Int = 19): DataFrame = {
    require(reps >= 1 && reps <= 30, s"reps in [1,30] (hash bits), got $reps")
    // ONE pool for observed AND placebo estimates: a permutation test
    // compares the observed statistic against re-randomizations of the
    // SAME population, so rows that cannot enter a replicate (null unit —
    // nothing to pseudo-assign; null real treatment — excluded from the
    // observed 2×2 by didMoments) are excluded from BOTH sides up front
    val pool = df.filter(col(unitCol).isNotNull && col(treatCol).isNotNull)
    val obs = didFromMoments(didMoments(pool, keyCols, treatCol, postCol, valueCol))
      .select(keyCols.map(col) :+ col("did_e6").as("did_obs_e6"): _*)
    import df.sparkSession.implicits._
    val bs = (1 to reps).map(b => (b.toLong, 1L << b)).toDF("__b", "__pw")
    val expl = pool
      .withColumn("__uh",
        graft.functions.Cols.hash32(col(unitCol).cast("string")))
      .crossJoin(broadcast(bs))
      .withColumn("__tb", expr("(__uh div __pw) % 2 = 0"))
    val plac = didFromMoments(
        didMoments(expl, keyCols :+ "__b", "__tb", postCol, valueCol))
      .select(keyCols.map(col) :+ col("did_e6").as("__did_b"): _*)
    plac.join(obs, keyCols)
      .groupBy(keyCols.map(col): _*)
      .agg(
        max(col("did_obs_e6")).as("did_obs_e6"),
        count(when(col("__did_b").isNotNull, 1)).as("n_reps"),
        count(when(abs(col("__did_b")) >= abs(col("did_obs_e6")), 1)).as("n_ge"))
      .withColumn("p_e6", expr(
        """case when did_obs_e6 is not null and n_reps > 0
          |then (1 + n_ge) * 1000000 div (n_reps + 1) end""".stripMargin))
  }

  /** Per-key instrumental-variables Wald estimator — the FOURTH causal
    * design, for when treatment itself is confounded but an
    * ENCOURAGEMENT (instrument z) is as-good-as-random: the local
    * average treatment effect is the ratio of the reduced form to the
    * first stage, `LATE = (ȳ_{z=1} − ȳ_{z=0}) / (d̄_{z=1} − d̄_{z=0})`
    * (Wald 1940; Angrist–Imbens–Rubin 1996). Equals 2SLS with one binary
    * instrument. Both components are reported — the first stage IS the
    * weak-instrument diagnostic, and the reduced form is the
    * intention-to-treat readout.
    *
    * Exactness: six exact integer moments per key (n / Σd / Σy per
    * instrument side, d ∈ {0,1}, y integral — one map-side-combined
    * conditional aggregate); first stage, ITT, and LATE are ONE fixed
    * double tree each, e6-quantized, mirrored literally in the oracle.
    * An instrument side with n = 0 or a zero first stage nulls the LATE
    * (reported components stay). Output: `(keys…, n_z0, n_z1, fs_e6,
    * itt_e6, late_e6)`. */
  def ivWald(df: DataFrame, keyCols: Seq[String], instCol: String,
             treatCol: String, valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "ivWald needs at least one key column")
    val z = col(instCol)
    val dcol = col(treatCol).cast("long")
    val y = col(valueCol).cast("long")
    def mean(s: String, n: String) = s"(cast($s as double) / $n)"
    val fs = s"(${mean("__d1", "n_z1")} - ${mean("__d0", "n_z0")})"
    val itt = s"(${mean("__y1", "n_z1")} - ${mean("__y0", "n_z0")})"
    val okC = "n_z0 >= 1 and n_z1 >= 1"
    dropNullKeys(df, keyCols)
      .filter(z.isNotNull && dcol.isNotNull && y.isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(when(!z, 1L).otherwise(0L)).as("n_z0"),
        sum(when(z, 1L).otherwise(0L)).as("n_z1"),
        sum(when(!z, dcol).otherwise(0L)).as("__d0"),
        sum(when(z, dcol).otherwise(0L)).as("__d1"),
        sum(when(!z, y).otherwise(0L)).as("__y0"),
        sum(when(z, y).otherwise(0L)).as("__y1"))
      .withColumn("fs_e6", expr(
        s"case when $okC then cast(floor($fs * 1000000 + 0.5) as bigint) end"))
      .withColumn("itt_e6", expr(
        s"case when $okC then cast(floor($itt * 1000000 + 0.5) as bigint) end"))
      .withColumn("late_e6", expr(
        s"""case when $okC and $fs != 0 then
           |  cast(floor($itt / $fs * 1000000 + 0.5) as bigint) end""".stripMargin))
      .drop("__d0", "__d1", "__y0", "__y1")
  }

  /** Split conformal prediction — the distribution-free interval
    * guarantee (Vovk; Lei et al. 2018) every model-quality readout in
    * the eval tier implicitly leans on: fit ANY point model on the train
    * split (here the saturated group-mean model over `groupCols`), take
    * the `⌈(n_cal+1)(1−α)⌉`-th smallest absolute residual on the
    * CALIBRATION split as the interval half-width q̂, and coverage on
    * the held-out test split is ≥ 1−α by exchangeability alone — no
    * distributional assumption. The test-side readout checks that
    * promise empirically.
    *
    * Exactness (hash-checkable): values enter as integers (caller
    * quantizes — the bartlett/welch convention, non-negative domain),
    * predictions are e2 floor-means of exact DECIMAL sums, residuals are
    * integer e2 gaps, and q̂ is an EXACT order statistic — residual
    * value-grid → cumulative counts → first value at rank
    * `k = ⌈(n_cal+1)(1000−αpermille)/1000⌉` (pure integer ceiling) — the
    * [[MonteCarlo]] exact-percentile shape, never a sort-limit on rows.
    * Coverage is an integer-div permillion.
    *
    * Scale shape: the model is a groupCols-grid broadcast back onto the
    * calibration/test sides; the order statistic aggregates the residual
    * GRID (bounded by distinct residual values), map-side combined; the
    * readout is one row. Test/cal rows whose group never appeared in
    * train can't be scored — counted out loudly, never silently dropped.
    * Calibration smaller than the rank (k > n_cal) yields the infinite
    * interval: null q̂, null coverage (documented degenerate).
    *
    * Output: ONE row — `n_train, n_cal, k, qhat_e2, n_test_scored,
    * n_test_unscored, n_covered, cov_e6`. */
  def conformalInterval(df: DataFrame, splitCol: String,
                        groupCols: Seq[String], valueCol: String,
                        alphaPermille: Int = 100,
                        trainTag: String = "train", calTag: String = "val",
                        testTag: String = "test"): DataFrame = {
    val (base, model, nTrain, qhat) =
      conformalFit(df, splitCol, groupCols, valueCol, alphaPermille,
        trainTag, calTag)
    val counts = conformalTestCounts(
      base.filter(col("__sp") === testTag), model, qhat, groupCols)
    conformalAssemble(nTrain, qhat, counts)
  }

  /** [[conformalInterval]] over a pre-built [[conformalBase]] frame —
    * the entry point the q353 registry query uses so it can share one
    * memoized base with the q359 streaming twin. */
  private[graft] def conformalIntervalFromBase(base: DataFrame,
                                               groupCols: Seq[String],
                                               alphaPermille: Int = 100,
                                               trainTag: String = "train",
                                               calTag: String = "val",
                                               testTag: String = "test")
      : DataFrame = {
    val (b, model, nTrain, qhat) =
      conformalFitFromBase(base, groupCols, alphaPermille, trainTag, calTag)
    val counts = conformalTestCounts(
      b.filter(col("__sp") === testTag), model, qhat, groupCols)
    conformalAssemble(nTrain, qhat, counts)
  }

  /** The batch-side half of [[conformalInterval]], split out (the
    * didMoments factoring) so the STREAMING coverage twin can freeze
    * the model + q̂ and share every readout: returns the checkpointed
    * 3-column base, the group-mean model, the train count, and the
    * one-row q̂ frame from the exact calibration order statistic. */
  private[graft] def conformalFit(df: DataFrame, splitCol: String,
                                  groupCols: Seq[String], valueCol: String,
                                  alphaPermille: Int, trainTag: String,
                                  calTag: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) =
    conformalFitFromBase(conformalBase(df, splitCol, groupCols, valueCol),
      groupCols, alphaPermille, trainTag, calTag)

  /** The checkpointed 3-narrow-column admission frame every conformal
    * consumer (model, calibration, test, the streaming twin's batch fit)
    * reads from. Split out of [[conformalFit]] so the q353 batch query
    * and the q359 streaming twin can SHARE one base per (session, data
    * dir) — the md5 split hash over the corpus is the measured cost
    * driver, and the twin pair was paying it twice. */
  private[graft] def conformalBase(df: DataFrame, splitCol: String,
                                   groupCols: Seq[String],
                                   valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "conformalInterval needs grouping features")
    val y = col(valueCol).cast("long")
    // localCheckpoint: three consumers (model, calibration, test) would
    // otherwise each re-run the upstream scan INCLUDING the md5 split
    // hash — the measured cost driver at 10x (the embeddingHealth
    // precedent); the checkpointed projection is 3 narrow columns
    dropNullKeys(df, groupCols)
      .filter(col(splitCol).isNotNull && y.isNotNull)
      .select(groupCols.map(col) :+ col(splitCol).as("__sp") :+
        (y * 100L).as("__y2"): _*)
      .localCheckpoint(false)
  }

  /** [[conformalFit]] over a pre-built [[conformalBase]] frame. */
  private[graft] def conformalFitFromBase(base: DataFrame,
                                          groupCols: Seq[String],
                                          alphaPermille: Int, trainTag: String,
                                          calTag: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(alphaPermille >= 1 && alphaPermille <= 999,
      s"alphaPermille in [1,999], got $alphaPermille")
    val model = base.filter(col("__sp") === trainTag)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__ng"),
        sum(col("__y2").cast("decimal(38,0)")).as("__sg"))
      // `div` is EXACT integral division on the DECIMAL sum (a decimal
      // `/` would round to scale-6 before floor — wrong once the
      // remainder/n fraction crosses 1−5e−7 at large n); non-negative
      // domain makes truncation = floor in both engines
      .withColumn("__yhat2", expr("__sg div __ng").cast("long"))
      .select((groupCols.map(col) :+ col("__yhat2")): _*)
    val nTrain = base.filter(col("__sp") === trainTag)
      .agg(count(lit(1)).as("n_train"))
    // exact order statistic over the residual value grid
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("__r2"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val keep = 1000 - alphaPermille
    val qhat = base.filter(col("__sp") === calTag)
      .join(broadcast(model), groupCols, "left")
      .withColumn("__r2", abs(col("__y2") - col("__yhat2")))
      .filter(col("__r2").isNotNull)
      .groupBy(col("__r2")).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__k", expr(s"((__n + 1) * $keep + 999) div 1000"))
      .agg(max(col("__n")).as("n_cal"), max(col("__k")).as("k"),
        min(when(col("__cum") >= col("__k"), col("__r2"))).as("qhat_e2"))
    (base, model, nTrain, qhat)
  }

  /** Coverage counts over a (possibly STREAMING) test frame against the
    * frozen model + q̂ — the state a complete-mode twin holds is exactly
    * this 3-long row. */
  private[graft] def conformalTestCounts(test: DataFrame, model: DataFrame,
                                         qhat: DataFrame,
                                         groupCols: Seq[String]): DataFrame =
    test
      .join(broadcast(model), groupCols, "left")
      .withColumn("__r2", abs(col("__y2") - col("__yhat2")))
      .crossJoin(broadcast(qhat))
      .agg(
        count(when(col("__yhat2").isNotNull, 1)).as("n_test_scored"),
        count(when(col("__yhat2").isNull, 1)).as("n_test_unscored"),
        count(when(col("__r2") <= col("qhat_e2"), 1)).as("n_covered"))

  /** Final readout shared by batch and twin: one row. */
  private[graft] def conformalAssemble(nTrain: DataFrame, qhat: DataFrame,
                                       counts: DataFrame): DataFrame =
    nTrain.crossJoin(qhat).crossJoin(counts)
      .withColumn("cov_e6", expr(
        """case when qhat_e2 is not null and n_test_scored > 0
          |then n_covered * 1000000 div n_test_scored end""".stripMargin))
      .select("n_train", "n_cal", "k", "qhat_e2", "n_test_scored",
        "n_test_unscored", "n_covered", "cov_e6")
}
