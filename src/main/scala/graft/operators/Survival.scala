package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kaplan–Meier survival estimation — retention/churn curves over
  * right-censored durations, the product-limit estimator
  * `S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)` (Kaplan & Meier 1958). The
  * training-data-ops reading: "how long does a user/document/session
  * survive", where subjects still alive at the observation edge are
  * CENSORED (they contribute risk-set time but no event) — dropping
  * them, the naive mistake, biases every retention curve downward.
  *
  * Exactness: the survival step is a QUANTIZED INTEGER RECURRENCE —
  * `s ← s·(nᵢ − dᵢ) div nᵢ` on an e9 grid, exact BIGINT products and
  * one truncating division per event time (all quantities positive, so
  * truncation is floor in both engines) — which a recursive CTE replays
  * bit-for-bit. Per-step quantization drift vs the real-valued product
  * is < #steps·10⁻⁹ — far below any decision threshold a retention
  * curve feeds.
  *
  * Scale shape: the subject rows collapse to a per-(key, duration)
  * LIFETABLE by one map-side-combined aggregate — the sequential fold
  * then runs over the lifetable grid (distinct durations per key, ~10³
  * for daily grain), each key's walk inside its executor via
  * `groupByKey.flatMapGroups` (the [[graft.stats.Diagnostics]] layout:
  * a million cohorts = a million independent folds, no driver
  * involvement). BIGINT bound: 10⁹·n_risk < 2⁶³ ⇒ ~9·10⁹ subjects per
  * cohort. */
object Survival {

  private val kmSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("duration", LongType),
    StructField("n_risk", LongType),
    StructField("d_events", LongType),
    StructField("c_censored", LongType),
    StructField("s_e9", LongType)))

  /** The q225/q236 shared subject derivation over a per-user
    * `(user_id, first_us, last_us)` frame: cohort = `user_id mod 3`,
    * duration in days, churned ⇔ inactive in the final 14 days of the
    * window (the edge derives FROM the frame — no second scan). ONE
    * definition on purpose: the batch query, the streaming twin, and
    * the shared SQL oracle all depend on these exact constants, and a
    * hand-synced copy drifting in one of them would silently break the
    * drained == batch bit-parity the q236 design rests on. */
  def lifetimeSubjects(perUser: DataFrame): DataFrame = {
    val gmax = perUser.agg(max(col("last_us")).as("gmax"))
    perUser.crossJoin(broadcast(gmax))
      .select(
        concat(lit("c"), pmod(col("user_id"), lit(3L)).cast("string")).as("cohort"),
        expr("(last_us - first_us) div 86400000000").as("dur_days"),
        (col("last_us") < col("gmax") - lit(1209600000000L)).as("churned"))
  }

  /** One row per subject in `df`: an integer `durationCol` (time grain
    * chosen by the caller) and a boolean `eventCol` (true = the event
    * was observed; false = right-censored at that duration). Output:
    * one lifetable row per (key, distinct duration) —
    * `(key, duration, n_risk, d_events, c_censored, s_e9)`, with
    * `s_e9` the survival estimate AFTER the events at that duration.
    * Censored-only times carry the running estimate unchanged (the
    * standard lifetable convention). */
  def kaplanMeier(df: DataFrame, keyCols: Seq[String], durationCol: String,
                  eventCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyExpr =
      if (keyCols.isEmpty) lit("all") else concat_ws("|", keyCols.map(col): _*)
    val lifetable = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(keyExpr.as("key"), col(durationCol).cast("long").as("dur"))
      .agg(
        sum(when(col(eventCol), 1L).otherwise(0L)).as("d"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("c"))
      .as[(String, Long, Long, Long)]
    lifetable
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2)
        var atRisk = 0L
        rows.foreach(r => atRisk += r._3 + r._4)
        var s = 1000000000L
        rows.iterator.map { case (_, dur, d, c) =>
          val n = atRisk
          if (d > 0) s = s * (n - d) / n
          atRisk -= d + c
          Row(key, dur, n, d, c, s)
        }
      }(Encoders.row(kmSchema))
      .toDF()
  }

  /** Per-key LOG-RANK test between two survival curves — the hypothesis
    * test completing [[kaplanMeier]] (KM draws the curves; log-rank says
    * whether variant A's churn differs from B's beyond chance — the A/B
    * readout for time-to-event metrics, where a plain conversion z
    * ignores censoring): at each pooled event time,
    * `E_A = d·n_A/n`, `V = d·(n_A/n)(1−n_A/n)(n−d)/(n−1)`, and
    * `χ² = (O_A − E_A)² / ΣV` against χ²(1) 5% critical 3.8415.
    *
    * Fully distributed, no per-key kernel: the subject rows collapse to
    * a per-(key, duration) lifetable with per-group event/total counts;
    * the at-risk counts are SUFFIX sums (one duration-DESC window per
    * key); each event time's E and V are ONE fixed double tree each,
    * e9-quantized to integers so the sums are order-independent
    * (the NMI discipline); the final χ² is one fixed tree over the
    * integer sums, e4-quantized, verdict on the ROUNDED value. Keys
    * with events but zero variance (e.g. one group empty) emit null
    * χ²; keys with NO uncensored event at all emit NOTHING — every
    * lifetable row is filtered before the fold, so there is no row to
    * carry nulls (join back to the cohort list if presence matters).
    * Ties: deaths at equal durations share one pooled time — the
    * standard convention.
    *
    * Scale shape: one map-side-combined lifetable aggregate, one window
    * over the duration grid, one grid fold. Output: `(keys…, n_a, n_b,
    * o_a, e_a_e9, v_e9, chi2_e4, significant)` — n_a/n_b are the
    * at-risk counts at the EARLIEST pooled event time (subjects
    * censored strictly before any event carry no test information). */
  def logRank(df: DataFrame, keyCols: Seq[String], groupCol: String,
              durationCol: String, eventCol: String, groupA: String,
              groupB: String): DataFrame = {
    require(keyCols.nonEmpty, "logRank needs at least one key column")
    val k = keyCols.map(col)
    val g = col(groupCol)
    val inA = g === groupA
    val inB = g === groupB
    val grid = graft.functions.Cols.dropNullKeys(df, keyCols)
      .filter((inA || inB) && col(durationCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(k :+ col(durationCol).cast("long").as("__dur"): _*)
      .agg(
        sum(when(inA && col(eventCol), 1L).otherwise(0L)).as("__da"),
        sum(when(inB && col(eventCol), 1L).otherwise(0L)).as("__db"),
        sum(when(inA, 1L).otherwise(0L)).as("__ra"),
        sum(when(inB, 1L).otherwise(0L)).as("__rb"))
    val wSuffix = org.apache.spark.sql.expressions.Window
      .partitionBy(k: _*).orderBy(col("__dur").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val risk = grid
      .withColumn("__na", sum(col("__ra")).over(wSuffix))
      .withColumn("__nb", sum(col("__rb")).over(wSuffix))
      .filter(col("__da") + col("__db") > 0)
      .withColumn("__nt", col("__na") + col("__nb"))
      .withColumn("__dt", col("__da") + col("__db"))
      .withColumn("__e9", expr(
        """cast(floor(cast(__dt as double) * cast(__na as double)
          |  / cast(__nt as double) * 1000000000 + 0.5) as bigint)""".stripMargin))
      .withColumn("__v9", expr(
        """case when __nt > 1 then
          |  cast(floor(cast(__dt as double)
          |    * (cast(__na as double) / cast(__nt as double))
          |    * (1.0 - cast(__na as double) / cast(__nt as double))
          |    * (cast(__nt - __dt as double) / cast(__nt - 1 as double))
          |    * 1000000000 + 0.5) as bigint)
          |else cast(0 as bigint) end""".stripMargin))
    risk.groupBy(k: _*)
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(col("__da")).as("o_a"), sum(col("__e9")).as("e_a_e9"),
        sum(col("__v9")).as("v_e9"))
      .withColumn("chi2_e4", expr(
        """case when v_e9 > 0 then
          |  cast(floor(
          |    (cast(o_a as double) * 1000000000 - cast(e_a_e9 as double))
          |    * (cast(o_a as double) * 1000000000 - cast(e_a_e9 as double))
          |    / (cast(v_e9 as double) * 1000000000)
          |    * 10000 + 0.5) as bigint)
          |end""".stripMargin))
      .withColumn("significant",
        when(col("chi2_e4").isNotNull, col("chi2_e4") > 38415L))
  }

  /** Survival SUMMARY off the [[kaplanMeier]] curve — median survival
    * time and the restricted mean survival time
    * `RMST(τ) = ∫₀^τ S(t) dt`: the two scalars a churn/latency report
    * needs when the full curve is too much and the plain mean is
    * WRONG (censoring makes the naive mean an underestimate; RMST is
    * the honest "average days retained within the first τ" — and
    * unlike the median it exists even when S never crosses ½).
    *
    * Exactness: the step-function integral is a sum of exact integer
    * `width · S_e9` products (lag carries the previous step's S, with
    * S = 10⁹ before the first event time), the tail past the last step
    * closes at `S_last`, and everything clips at the horizon; median is
    * the exact fence `min t: S_e9 ≤ 5·10⁸` (null when the curve never
    * crosses — the documented non-existence case). One `div 10⁶` emits
    * RMST in milli-duration-units.
    *
    * Scale shape: kaplanMeier's lifetable kernel + one lag window and
    * one aggregate over the duration grid. Output: `(key, n_subjects,
    * rmst_e3, median_duration)`. */
  def survivalSummary(df: DataFrame, keyCols: Seq[String],
                      durationCol: String, eventCol: String,
                      horizon: Long): DataFrame = {
    require(horizon > 0, s"horizon must be positive, got $horizon")
    import org.apache.spark.sql.expressions.Window
    val km = kaplanMeier(df, keyCols, durationCol, eventCol)
      .localCheckpoint(false)
    val w = Window.partitionBy(col("key")).orderBy(col("duration"))
    val wDesc = Window.partitionBy(col("key")).orderBy(col("duration").desc)
    val lagd = km
      .withColumn("__pdur", lag(col("duration"), 1, 0L).over(w))
      .withColumn("__psv", lag(col("s_e9"), 1, 1000000000L).over(w))
      .withColumn("__area", expr(
        s"""cast(greatest(0, least(duration, $horizon)
           |  - least(__pdur, $horizon)) as decimal(38,0)) * __psv"""
          .stripMargin.replaceAll("\n", " ")))
    val agg = lagd.groupBy(col("key"))
      .agg(sum(expr("d_events + c_censored")).as("n_subjects"),
        sum(col("__area")).as("__a1"))
    val lastS = km.withColumn("__r", row_number().over(wDesc))
      .filter(col("__r") === 1)
      .select(col("key"), col("s_e9").as("__lsv"),
        col("duration").as("__maxdur"))
    val med = km.filter(col("s_e9") <= 500000000L)
      .groupBy(col("key")).agg(min(col("duration")).as("median_duration"))
    agg.join(lastS, "key")
      .join(med, Seq("key"), "left")
      .withColumn("rmst_e3", expr(
        s"""cast((__a1 + cast(greatest(0, $horizon - __maxdur)
           |  as decimal(38,0)) * __lsv) div 1000000 as bigint)"""
          .stripMargin.replaceAll("\n", " ")))
      .select(col("key"), col("n_subjects"), col("rmst_e3"),
        col("median_duration"))
  }
}
