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
}
