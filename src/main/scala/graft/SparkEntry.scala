package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.{Tables, ZOrder}
import graft.functions.Cols
import graft.operators.{CalendarOps, Cdc, Collapse, Features, Graph, MonteCarlo, RangeJoin, Sketch}
import graft.sim.Similarity
import graft.text.{Corpus, Dedup, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query naming: `q<nn>_<survey-id>_<desc>` where `<survey-id>` is the
  * SURVEY.md §2 operator id the query exercises (a1 = §2.5 A1, w8 = §2.6 W8,
  * j4 = §2.4 J4, u9 = §2.11 U9, …; x* = builder-brief extension operators).
  * Every query has a DuckDB oracle in [[oracleSql]] unless inherently
  * non-SQL (noted inline). All queries ORDER BY a deterministic key and
  * alias every computed column identically on both sides.
  */
object SparkEntry {

  /** Flagship (driver smoke-checks rows>0 on sf0.001): the CES career
    * collapse re-expressed over the TPC-H-shaped tables — scan → broadcast
    * dim join → routing predicate → long-format stack → weighted monthly
    * collapse (SURVEY M0-M2 end-to-end). */
  def entry(spark: SparkSession): DataFrame =
    cesCollapse(GraftSession.tune(spark), "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- helpers

  private def tuned(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, d) => f(GraftSession.tune(s), d)

  /** Register a temp directory for recursive deletion at JVM exit (once
    * per path): scratch sinks like q85's JSONL staging copy must not
    * accumulate across runs. Deletion happens at exit, not eagerly — the
    * returned DataFrame reads the path lazily after the query builder
    * returns. */
  private val cleanupRegistered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def cleanupOnExit(path: String): Unit =
    if (cleanupRegistered.add(path)) {
      sys.addShutdownHook {
        val root = java.nio.file.Paths.get(path)
        if (java.nio.file.Files.exists(root)) {
          java.nio.file.Files.walk(root)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        }
      }
    }

  /** Monthly orders series used by the window/time-series queries
    * (the engine's analog of the reference's per-career monthly table). */
  private def monthlyOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
      .agg(sum(col("o_totalprice")).as("tot"), count(lit(1)).as("n"))

  private val MonthlySql =
    "SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month, " +
      "sum(o_totalprice) AS tot, count(*) AS n FROM orders GROUP BY 1"

  private def wMonth = Features.keyWindow(Nil, "month")

  /** Flagship pipeline: lineitem facts joined to the part dimension,
    * routed into "careers" by the F5 prefix predicate, collapsed monthly to
    * (Σ quantity, quantity-weighted mean price) via [[Collapse.collapse]]. */
  private def cesCollapse(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val part = Tables.part(s, dir)
    val career = when(Cols.codeMatches(col("p_type"), Nil, Seq("STA")), lit("standard"))
      .when(Cols.codeMatches(col("p_type"), Nil, Seq("PRO")), lit("promo"))
      .otherwise(lit("other"))
    val f = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(career.as("career"), Cols.monthStart(col("l_shipdate")).as("month"),
        col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val long = f.selectExpr("career", "month", "l_partkey AS wkey",
      "stack(2, 'qty', l_quantity, 'price', l_extendedprice) AS (measure, value)")
    Collapse.collapse(long,
        dateCol = "month", measureCol = "measure", valueCol = "value",
        weightMeasure = "qty", valueMeasure = "price", weightKey = "wkey",
        extraKeys = Seq("career"), sumAs = "employment", wmeanAs = "avg_price")
      .select(col("career"), col("month"),
        round(col("employment"), 2).as("employment"),
        round(col("avg_price"), 4).as("avg_price"))
      .orderBy("career", "month")
  }

  // Mirrors Collapse.collapse's two-level aggregation algebra (see its
  // Scaladoc): partials per part, no weights join.
  private val CesCollapseSql =
    """WITH f AS (
      |  SELECT CASE WHEN p_type LIKE 'STA%' THEN 'standard'
      |              WHEN p_type LIKE 'PRO%' THEN 'promo'
      |              ELSE 'other' END AS career,
      |         CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
      |         l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |p AS (
      |  SELECT career, month, l_partkey,
      |         sum(l_quantity) AS w,
      |         sum(l_extendedprice) AS s,
      |         count(CASE WHEN l_extendedprice IS NOT NULL THEN 1 END) AS n
      |  FROM f GROUP BY 1, 2, 3)
      |SELECT career, month, round(sum(w), 2) AS employment,
      |       round(sum(w * s) / nullif(sum(w * n), 0), 4) AS avg_price
      |FROM p GROUP BY 1, 2 ORDER BY career, month""".stripMargin

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q00_m2_ces_collapse" -> tuned(cesCollapse),

    // ---- aggregations (SURVEY §2.5)
    "q01_a1_groupsum" -> tuned((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q02_a2_weighted_mean" -> tuned((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(Collapse.weightedMean(col("l_extendedprice"), col("l_quantity")), 4)
          .as("wavg_price"))
        .orderBy("l_returnflag")),

    "q03_a3_distinct" -> tuned((s, d) =>
      Tables.customer(s, d)
        .select("c_mktsegment", "c_nationkey").distinct()
        .orderBy("c_mktsegment", "c_nationkey")),

    "q04_a4_value_counts" -> tuned((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("o_orderpriority")).limit(10)),

    // money rides as exact integer CENTS through the mean (integer sums
    // are exact in any order), and the final 4-dp rounding is the
    // explicit floor(x + 0.5) form: a float avg of 2-decimal values lands
    // on knife-edge .xxxx5 rationals (56.20875 at sf0.1) where Spark's
    // BigDecimal HALF_UP and DuckDB's scaled-multiply round() legitimately
    // disagree — floor of the identical IEEE product cannot
    "q05_a5_dedupe_mean" -> tuned((s, d) =>
      CalendarOps.dedupeByMonth(
          Tables.events(s, d)
            .withColumn("month", Cols.monthStart(col("ts")))
            .withColumn("value", round(col("value") * 100)),
          Seq("user_id"), "month", Seq("value"), CalendarOps.MeanPolicy)
        .select(col("user_id"), col("month"),
          (floor(col("value") * 100 + 0.5) / 10000.0).as("avg_value"))
        .orderBy("user_id", "month")),

    "q06_a6_summary" -> tuned((s, d) =>
      Tables.orders(s, d).agg(
        min(col("o_orderdate")).cast("date").as("min_date"),
        max(col("o_orderdate")).cast("date").as("max_date"),
        count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"))),

    "q07_a7_histogram" -> tuned((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(floor(col("l_quantity") / 5.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

    "q08_a8_quantiles" -> tuned((s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(round(percentile(col("value"), lit(0.05)), 4).as("p05"),
          round(percentile(col("value"), lit(0.5)), 4).as("p50"),
          round(percentile(col("value"), lit(0.95)), 4).as("p95"))
        .orderBy("event_type")),

    "q09_a9_drift_fit" -> tuned((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(col("o_totalprice")).as("tot"))
      MonteCarlo.fitDrift(daily, Nil, "day", "tot", 60)
        .select(round(col("mu"), 2).as("mu"), round(col("sigma"), 2).as("sigma"))
    }),

    // ---- filters (SURVEY §2.3)
    "q10_f1_regex_filter" -> tuned((s, d) =>
      Tables.events(s, d)
        .filter(col("event_type").rlike("^(purchase|refund)$"))
        .select("event_id", "event_type", "value")
        .orderBy("event_id")),

    "q11_f2_isin_filter" -> tuned((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")),

    "q12_f4_contains_ci" -> tuned((s, d) =>
      Tables.documents(s, d)
        .filter(Cols.containsCI(col("text"), "SPARK"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),

    "q13_f5_code_predicate" -> tuned((s, d) =>
      Tables.part(s, d)
        .filter(Cols.codeMatches(col("p_type"), Seq("ECONOMY"), Seq("STA", "PRO")))
        .select("p_partkey", "p_brand", "p_type")
        .orderBy("p_partkey")),

    // ---- joins (SURVEY §2.4)
    "q14_j123_star_join" -> tuned((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"), "left")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
        .groupBy("r_name")
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy("r_name")
    }),

    "q15_j4_composite_key_join" -> tuned((s, d) => {
      val li = Tables.lineitem(s, d)
      val wts = li.groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity")).as("w"))
      li.join(wts, Seq("l_partkey", "l_suppkey"), "left")
        .groupBy("l_returnflag")
        .agg(round(Collapse.weightedMean(col("l_extendedprice"), col("w")), 4)
          .as("wavg_price"))
        .orderBy("l_returnflag")
    }),

    "q16_j6_month_align_join" -> tuned((s, d) => {
      val shipM = Tables.lineitem(s, d)
        .groupBy(Cols.monthStart(col("l_shipdate")).as("month"))
        .agg(count(lit(1)).as("n_ship"), round(sum(col("l_quantity")), 2).as("sum_qty"))
      val ordM = Tables.orders(s, d)
        .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"), round(avg(col("o_totalprice")), 4).as("avg_price"))
      shipM.join(ordM, Seq("month"), "left").orderBy("month")
    }),

    // ---- window / time-series (SURVEY §2.6)
    "q17_w1_pct_change" -> tuned((s, d) =>
      monthlyOrders(s, d)
        .select(col("month"), round(col("tot"), 2).as("tot"),
          round(Features.pctChange(col("tot"), 1, wMonth), 4).as("mom_pct"),
          round(Features.pctChange(col("tot"), 12, wMonth), 4).as("yoy_pct"))
        .orderBy("month")),

    // monthly totals ride as exact integer cents (q05's rationale: the
    // float-summed rolling mean lands on a .xx5 rounding boundary at
    // sf0.1; integer sums are exact in any order)
    "q18_w23_rolling_mean_std" -> tuned((s, d) =>
      Tables.orders(s, d)
        .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).as("tot_c"))
        .select(col("month"),
          // floor form for the mean: cents_sum/6 hits exact .5 rationals
          // (q05's rationale); the std is irrational — plain round is safe
          (floor(Features.rollingMean(col("tot_c"), 6, wMonth) + 0.5) / 100.0)
            .as("roll_mean6"),
          round(Features.rollingStd(col("tot_c"), 6, wMonth) / 100.0, 2).as("roll_std6"))
        .orderBy("month")),

    "q19_w4_rolling_corr" -> tuned((s, d) =>
      monthlyOrders(s, d)
        .select(col("month"),
          round(Features.rollingCorr(col("tot"), col("n"), 12, wMonth), 4).as("roll_corr12"))
        .orderBy("month")),

    "q20_w5_rolling_median" -> tuned((s, d) =>
      monthlyOrders(s, d)
        .select(col("month"),
          round(Features.rollingMedian(col("tot"), 13, 6, wMonth), 2).as("roll_med13"))
        .orderBy("month")),

    "q21_w6_base100_index" -> tuned((s, d) =>
      monthlyOrders(s, d)
        .select(col("month"),
          round(Features.base100(col("tot"), wMonth), 4).as("tot_index"))
        .orderBy("month")),

    "q22_w7_diffs" -> tuned((s, d) =>
      monthlyOrders(s, d)
        .select(col("month"),
          round(Features.diff(col("tot"), 1, wMonth), 2).as("d1"),
          round(Features.diff(col("tot"), 12, wMonth), 2).as("d12"))
        .orderBy("month")),

    "q23_w8_month_grid" -> tuned((s, d) =>
      CalendarOps.monthGrid(monthlyOrders(s, d), Nil, "month")
        .select(col("month"), col("n"), round(col("tot"), 2).as("tot"))
        .orderBy("month")),

    "q24_w9_cumsum" -> tuned((s, d) =>
      monthlyOrders(s, d)
        .select(col("month"),
          round(Features.cumSum(col("tot"), wMonth), 2).as("cum_tot"))
        .orderBy("month")),

    "q25_w10_last_obs" -> tuned((s, d) =>
      Features.tailRows(Tables.events(s, d), Seq("user_id"), Seq("ts", "event_id"), 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          round(col("value"), 2).as("last_value"))
        .orderBy("user_id")),

    "q26_w11_tail_rows" -> tuned((s, d) =>
      Features.tailRows(Tables.events(s, d), Seq("user_id"), Seq("ts", "event_id"), 5)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_recent"), round(avg(col("value")), 4).as("avg_recent"))
        .orderBy("user_id")),

    // ---- sort / limit (SURVEY §2.7)
    "q27_o12_topk" -> tuned((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"),
          col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)),

    // ---- set ops (SURVEY §2.8)
    "q28_set_union" -> tuned((s, d) => {
      val sup = Tables.supplier(s, d).select(col("s_name").as("name"), lit("supplier").as("kind"))
      val cus = Tables.customer(s, d).select(col("c_name").as("name"), lit("customer").as("kind"))
      sup.unionByName(cus).orderBy("kind", "name")
    }),

    // ---- scalar functions (SURVEY §2.9)
    "q29_fs_string_fns" -> tuned((s, d) =>
      Tables.part(s, d).select(
          col("p_partkey"),
          lower(trim(col("p_name"))).as("name_lc"),
          regexp_replace(col("p_type"), " ", "_").as("type_u"),
          lpad(col("p_size").cast("string"), 3, "0").as("size_pad"),
          concat_ws(":", col("p_brand"), col("p_type")).as("brand_type"),
          substring(col("p_type"), 1, 4).as("type4"))
        .orderBy("p_partkey")),

    "q30_fd_date_fns" -> tuned((s, d) =>
      Tables.orders(s, d).select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          Cols.monthStart(col("o_orderdate")).as("month_start"),
          Cols.monthEnd(col("o_orderdate")).as("month_end"),
          make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("md"))
        .orderBy("o_orderkey")),

    "q31_fm_math_null_fns" -> tuned((s, d) =>
      Tables.events(s, d).select(
          col("event_id"),
          round(Cols.safeLog(col("value")), 4).as("log_value"),
          round(Cols.clipMin(col("value") - 100, 0.0), 2).as("over100"),
          coalesce(nullif(col("event_type"), lit("error")), lit("unknown")).as("etype_filled"),
          round(abs(col("value") - 50), 2).as("dist50"))
        .orderBy("event_id")),

    // ---- calendar scaffolding (SURVEY §2.9 F-D4)
    "q33_fd4_future_months" -> tuned((s, d) =>
      graft.operators.CalendarOps.futureMonths(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"), Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(count(lit(1)).as("n")),
          Seq("o_orderpriority"), "month", horizon = 6)
        .orderBy("o_orderpriority", "month")),

    // ---- diagnostics layer (SURVEY §2.11 U4-U6; no SQL oracle —
    // statsmodels-shaped statistics, validated in ScalaTest instead)
    "q34_u56_stationarity" -> tuned((s, d) =>
      graft.stats.Diagnostics.stationarity(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority"), Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(round(sum(col("o_totalprice")), 2).as("tot")),
          Seq("o_orderpriority"), "month", "tot")
        .select(col("key"), col("n_obs"), round(col("adf_stat"), 4).as("adf_stat"),
          col("adf_stationary_5pct"), round(col("kpss_stat"), 4).as("kpss_stat"),
          col("kpss_stationary_5pct"), round(col("yj_lambda"), 4).as("yj_lambda"),
          col("seasonal_period"))
        .orderBy("key")),

    // the FULL AIC grid (p = 1, 2, 3), hash-checked: each candidate's
    // conditional-least-squares fit is closed-form in the lag sufficient
    // sums (2x2/3x3/4x4 Cramer in the oracle), the AIC argmin replays over
    // the same three candidates, and the winner's forecast recursion runs
    // with the unused higher-lag coefficients pinned to exact 0.0 (x + 0.0
    // is bit-exact). Series rides as q117's scaled cents (round(/1e8, 6))
    // so the 4-decimal quantization grain sits ~10^4 above kernel-vs-
    // Cramer last-bit noise.
    "q35_u8_ar_forecast" -> tuned((s, d) =>
      graft.stats.Diagnostics.arForecast(
          Tables.orders(s, d)
            .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(round(sum(floor(col("o_totalprice") * 100 + 0.5)) / 1e8, 6).as("tot")),
          Nil, "month", "tot", horizon = 12)
        .select(col("key"), col("order"), col("step"),
          round(col("forecast"), 4).as("forecast"))
        .orderBy("key", "step")),

    // the ORACLE-CHECKED projection of the SARIMAX path: restrict the AIC
    // grid to the pure AR(1) candidate, whose conditional-least-squares
    // fit is closed-form simple regression and whose h-step forecast is
    // the plain recursion f(h) = c + a·f(h-1) — both SQL-expressible, so
    // the whole fit→forecast pipeline hash-checks against DuckDB. The
    // series rides as exact integer cents (q18's discipline) before the
    // one scale division, keeping the aggregate order-independent.
    "q117_u8_ar1_forecast" -> tuned((s, d) =>
      graft.stats.Diagnostics.arForecast(
          Tables.orders(s, d)
            .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(round(sum(floor(col("o_totalprice") * 100 + 0.5)) / 1e8, 6).as("tot")),
          Nil, "month", "tot", horizon = 12, orders = Seq(1))
        .select(col("key"), col("order"), col("step"),
          round(col("forecast"), 4).as("forecast"))
        .orderBy("key", "step")),

    // ---- full U8: seasonal+exog SARIMAX over the reference's 5-candidate
    // grid (notebook cells 27/30/32). Kalman-MLE statistics — no SQL
    // oracle; the estimator is validated against closed-form likelihoods
    // and planted-process recovery in SarimaxSpec, and this query's
    // output is golden-pinned in ForecastPipelineSpec.
    "q39_u8_sarimax_grid" -> tuned((s, d) =>
      graft.stats.Diagnostics.sarimaxForecast(
          monthlyOrders(s, d).withColumn("tot", round(col("tot") / 1e6, 6)),
          Nil, "month", "tot", Some("n"), horizon = 12)
        .select(col("key"), col("order"), col("seasonal"),
          round(col("aic"), 2).as("aic"), col("step"),
          round(col("forecast"), 4).as("forecast"))
        .orderBy("key", "step")),

    // multi-key variant: one grid fit per priority, all fitting INSIDE
    // their executors concurrently — the scale-out shape for a million
    // series. Rows-only like q39 (Kalman-MLE statistics).
    "q69_u8_sarimax_multikey" -> tuned((s, d) =>
      graft.stats.Diagnostics.sarimaxForecast(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority").as("prio"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(round(sum(col("o_totalprice")) / 1e6, 6).as("tot"),
              count(lit(1)).as("n")),
          Seq("prio"), "month", "tot", Some("n"), horizon = 6)
        .select(col("key"), col("order"), col("seasonal"),
          round(col("aic"), 2).as("aic"), col("step"),
          round(col("forecast"), 4).as("forecast"))
        .orderBy("key", "step")),

    // ---- composed U9∘U8: the reference's monte_carlo_forecast pipeline
    // (cell 27) — fit, simulate exog RW paths, forecast every path, fan
    // quantiles over FORECASTS. The white-noise candidate makes the fit
    // closed-form OLS, so the whole pipeline is exactly SQL-expressible.
    "q40_u9u8_mc_forecast_fan" -> tuned((s, d) =>
      graft.operators.ForecastPipeline.sarimaxMonteCarloFan(
          monthlyOrders(s, d).withColumn("tot", round(col("tot") / 1e6, 6)),
          Nil, "month", "tot", Some("n"), horizon = 24, sims = 500, seed = 42L,
          candidates = Seq(graft.stats.Sarimax.SarimaxSpec(0, 1, 0, 0, 0, 0, 12)))
        .select(col("key") +: col("step") +:
          Seq("p05", "p10", "p50", "p90", "p95", "mean", "std", "min", "max")
            .map(c => round(col(c), 4).as(c)): _*)
        .orderBy("step")),

    // ---- J6 with prefix renames + selective zero-fill (SURVEY S5/P7/F-N1;
    // reference exog merge with gdelt_* renames and fillna(0) on the model
    // exog only). The exog side is restricted to 1995+ so both the filled
    // (x_rev -> 0.0) and unfilled (x_disc -> null) paths get exercised.
    "q61_j6_align_prefix_fill" -> tuned((s, d) => {
      val df = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"),
          Cols.monthStart(col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n"))
      val exog = Tables.lineitem(s, d)
        .filter(year(col("l_shipdate")) >= 1995)
        .groupBy(Cols.monthStart(col("l_shipdate")).as("emonth"))
        .agg(round(sum(col("l_extendedprice")), 2).as("rev"),
          round(avg(col("l_discount")), 6).as("disc"))
      graft.operators.ExogJoin.alignMonthly(df, exog, "month", "emonth",
          prefix = "x_", fillZero = Seq("rev"))
        .select(col("prio"), col("month"), col("n"), col("x_rev"), col("x_disc"))
        .orderBy("prio", "month")
    }),

    // ---- S7 long export: stack measures into (date, measure, value)
    "q62_s7_export_long" -> tuned((s, d) =>
      graft.operators.ExogJoin.exportLong(
          monthlyOrders(s, d).withColumn("tot", round(col("tot"), 2))
            .withColumn("n", col("n").cast("double")),
          Nil, "month", Seq("tot", "n"))
        .orderBy("month", "measure")),

    // ---- S7 wide export: pivot a measure into per-key columns
    "q63_s7_export_wide" -> tuned((s, d) => {
      val long = graft.operators.ExogJoin.exportLong(
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority").as("prio"),
            Cols.monthStart(col("o_orderdate")).as("month"))
          .agg(round(sum(col("o_totalprice")), 2).as("tot")),
        Seq("prio"), "month", Seq("tot"))
      graft.operators.ExogJoin.exportWide(long, "prio", "month",
        "measure", "value", "tot")
    }),

    // ---- W5∘W10 composite: last-point outlier repair (reference cell 28)
    "q64_w5w10_outlier_repair" -> tuned((s, d) =>
      graft.operators.Features.repairLastOutlier(
          Tables.orders(s, d)
            .groupBy(col("o_orderpriority").as("prio"),
              Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(round(sum(col("o_totalprice")), 2).as("tot")),
          Seq("prio"), "month", "tot", n = 13, minPeriods = 6)
        .select(col("prio"), col("month"), col("tot"),
          round(col("repaired"), 2).as("repaired"))
        .orderBy("prio", "month")),

    // ---- correlogram diagnostics (SURVEY §2.11 U7; ACF is plain SQL —
    // oracle-checked; PACF (Durbin-Levinson) is validated in ScalaTest)
    "q37_u7_acf" -> tuned((s, d) =>
      graft.stats.Diagnostics.correlogram(
          monthlyOrders(s, d).withColumn("tot", round(col("tot"), 2)),
          Nil, "month", "tot", nlags = 6)
        .select(col("lag"), round(col("acf"), 4).as("acf"))
        .orderBy("lag")),

    // ---- equality filter (SURVEY §2.3 F3 — the reference's seasonal=='S')
    "q38_f3_equality_filter" -> tuned((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("tot"))
        .orderBy("o_orderpriority")),

    // ---- Yeo-Johnson closed-form transform (SURVEY §2.11 U4)
    "q36_u4_yeojohnson" -> tuned((s, d) =>
      Tables.events(s, d).select(
          col("event_id"),
          round(Cols.yeoJohnson(col("value") - 50, 0.5), 5).as("yj_half"),
          round(Cols.yeoJohnson(col("value") - 50, 0.0), 5).as("yj_log"),
          round(Cols.yeoJohnson(col("value") - 50, 2.0), 5).as("yj_two"))
        .orderBy("event_id")),

    // ---- Monte-Carlo simulation + fan (SURVEY §2.11 U9 / §2.6 W9 / §2.5 A8)
    "q32_u9_montecarlo_fan" -> tuned((s, d) =>
      MonteCarlo.fan(
          MonteCarlo.simulatePaths(s, sims = 1000, horizon = 36,
            start = 100.0, mu = 0.5, sigma = 2.0, seed = 42L, clipMin = Some(0.0)))
        .select(col("step") +:
          Seq("p05", "p10", "p50", "p90", "p95", "mean", "std", "min", "max")
            .map(c => round(col(c), 4).as(c)): _*)
        .orderBy("step")),

    // ---- extension: text analysis (builder brief)
    "q41_x_tokens_fingerprint" -> tuned((s, d) =>
      Tables.documents(s, d).select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")),

    "q42_x_quality_score" -> tuned((s, d) => {
      val feats = TextAnalysis.qualityFeatures(col("text")).toMap
      Tables.documents(s, d).select(
          col("doc_id"),
          feats("n_tokens").cast("long").as("n_tokens"),
          round(feats("avg_token_len"), 4).as("avg_token_len"),
          round(feats("punct_ratio"), 4).as("punct_ratio"),
          round(feats("stopword_ratio"), 4).as("stopword_ratio"))
        .orderBy("doc_id")
    }),

    "q43_x_langid" -> tuned((s, d) =>
      Tables.documents(s, d).select(
          col("doc_id"), col("lang"),
          TextAnalysis.languageId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    "q57_x_subword_count" -> tuned((s, d) =>
      Tables.documents(s, d).select(
          col("doc_id"),
          TextAnalysis.subwordCount(col("text")).cast("long").as("n_subwords"))
        .orderBy("doc_id")),

    // ---- extension: dedup (builder brief)
    "q44_x_dedup_exact" -> tuned((s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")
        .orderBy("text_hash")),

    "q45_x_minhash_sig" -> tuned((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id") +: Dedup.minhashSigCols(col("text"), MinhashK): _*)
        .orderBy("doc_id")),

    "q46_x_minhash_lsh_pairs" -> tuned((s, d) =>
      Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text",
          k = MinhashK, bands = MinhashBands)
        .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy("id_a", "id_b")),

    "q47_x_simhash" -> tuned((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), Dedup.simhash(col("text"), SimhashBits).as("simhash"))
        .orderBy("doc_id")),

    // 32-bit signature (vs q47's 16): 8-bit bands keep buckets sparse —
    // the documented at-scale sizing; 16-bit bands of 4 bits collide ~16x
    // more and explode the candidate join
    "q59_x_simhash_pairs" -> tuned((s, d) =>
      Dedup.simhashCandidates(Tables.documents(s, d), "doc_id", "text",
          bits = 32, bands = 4, maxHamming = 1)
        .orderBy("id_a", "id_b")),

    // ---- extension: skew toolbox correctness (salting is semantically the
    // identity on the join result — the oracle is the PLAIN join)
    "q65_x_salted_join" -> tuned((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey").as("okey"), col("l_quantity"))
      val ords = Tables.orders(s, d).select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      graft.operators.Skew.saltedJoin(li, ords, Seq("okey"), buckets = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy("o_orderpriority")
    }),

    // partial salting: only heavy-hitter keys pay replication; oracle is
    // again the plain join
    "q67_x_hotkey_salted_join" -> tuned((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey").as("okey"), col("l_quantity"))
      val ords = Tables.orders(s, d).select(col("o_orderkey").as("okey"), col("o_orderpriority"))
      graft.operators.Skew.hotKeySaltedJoin(li, ords, Seq("okey"), buckets = 8, hotKeys = 16)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy("o_orderpriority")
    }),

    // composed corpus-cleaning pass: langid + quality thresholds + exact
    // dedup in one plan (the LLM-pipeline workflow end-to-end)
    "q68_x_corpus_clean" -> tuned((s, d) =>
      TextAnalysis.cleanCorpus(Tables.documents(s, d), "doc_id", "text",
          lang = "en", minTokens = 5, maxPunctRatio = 0.2)
        .orderBy("doc_id")),

    "q48_x_ngram_jaccard" -> tuned((s, d) =>
      Dedup.ngramJaccard(Tables.documents(s, d), "doc_id", "text",
          maxIdGap = 50, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")),

    // ---- extension: similarity search (builder brief)
    "q49_x_cosine_topk" -> tuned((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 32), e, "vec_id", "embedding", k = 3)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- extension: embedding-cosine near-dup dedup (builder brief) —
    // exact form, oracle-checked; the LSH-bucketed scale path is q52
    // threshold 0.4: the synthetic embeddings' cosine distribution tops out
    // ~0.51 (sf0.01) / ~0.60 (sf0.1), so 0.8 would pass vacuously on empty
    // output; 0.4 exercises the scoring kernel on real pairs (59 @ sf0.01)
    "q55_x_embed_neardup" -> tuned((s, d) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.4)
        .orderBy("id_a", "id_b")),

    // the SCALE path: SRP-bucketed candidates, no all-pairs, no driver
    // collect. The oracle inlines the same hyperplane signs and replicates
    // the bucketing exactly, so this checks the algorithm, not just recall.
    "q60_x_embed_neardup_bucketed" -> tuned((s, d) =>
      Similarity.nearDupPairsBucketed(Tables.embeddings(s, d), "vec_id", "embedding",
          dim = 64, threshold = 0.4, nBits = 6, nTables = 3)
        .orderBy("id_a", "id_b")),

    // ---- extension: JSON props (SURVEY §2.9 note)
    "q50_x_json_extract" -> tuned((s, d) =>
      Tables.events(s, d).select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // ---- extension: multimodal binary columns (builder brief). Payloads
    // synthesized from document text (no media files in the testdata);
    // the plumbing — binary column, typed metadata struct, metadata math —
    // is the real, oracle-checked surface.
    "q53_x_multimodal_meta" -> tuned((s, d) => {
      import graft.multimodal.Multimodal
      val media = Tables.documents(s, d).select(
        col("doc_id"),
        col("text").cast("binary").as("content"),
        struct(lit("image").as("media_type"), lit("png").as("format"),
          (lit(640) + col("doc_id") % 1280).cast("int").as("width"),
          (lit(360) + col("doc_id") % 720).cast("int").as("height"),
          lit(null).cast("int").as("sample_rate"),
          (col("n_chars") % 7 * 50).cast("int").as("n_frames")).as("meta"))
      Multimodal.withPayloadStats(media, "content")
        .select(col("doc_id"), col("payload_bytes"), col("payload_digest"),
          Multimodal.resizePlan(col("meta"), 960).getField("out_width").as("out_width"),
          Multimodal.resizePlan(col("meta"), 960).getField("out_height").as("out_height"),
          size(Multimodal.frameSampleIndices(col("meta"), 4)).cast("long").as("n_sampled"),
          element_at(Multimodal.frameSampleIndices(col("meta"), 4), -1).as("last_frame"))
        .orderBy("doc_id")
    }),

    // REAL image decode (javax.imageio): plant a deterministic BMP per doc
    // (pixel channels are modular functions of doc_id), decode it back on
    // executors, and emit exact integer pixel sums + a floor-quantized
    // mean luminance. BMP is lossless (PNG parity-specced), so the oracle
    // recomputes the decoded pixels in closed form — the decode stage is
    // hash-checked end-to-end, not just its plumbing.
    "q54_x_media_features" -> tuned((s, d) => {
      import graft.multimodal.Multimodal
      val media = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("content", Multimodal.plantedImageCol(col("doc_id")))
      Multimodal.withImageStats(media, "content")
        .select(col("doc_id"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"),
          floor((col("sum_r") + col("sum_g") + col("sum_b")) * lit(10000.0)
              / (lit(3.0) * col("width") * col("height")) + lit(0.5))
            .cast("long").as("mean_lum_x10k"))
        .orderBy("doc_id")
    }),

    // ---- extension: structured streaming (SURVEY §2.10)
    "q51_x_stream_weekly" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.weeklyEventStats(s, d)),

    // ---- extension: stateful streaming sessionization (gap 3 days);
    // single-batch file stream -> deterministic, islands-SQL oracle
    "q56_x_stream_sessions" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.eventSessions(s, d, gapMinutes = 3 * 24 * 60)),

    // ---- extension: streaming exact dedup (order-independent aggregate ->
    // the finished stream state equals the batch result; shares q44's oracle)
    "q66_x_stream_dedup" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingExactDedup(s, d)),

    // ---- extension: streaming minhash-LSH near-dup (standing band-bucket
    // index via flatMapGroupsWithState; equals the batch candidate set ->
    // shares q46's oracle)
    "q78_x_stream_neardup" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingNearDupPairs(s, d,
        k = MinhashK, bands = MinhashBands)),

    // ---- extension: duplicate-cluster resolution (pairs -> components ->
    // keep-one-per-cluster decision; min-label propagation, no driver graph)
    "q79_x_dup_clusters" -> tuned((s, d) =>
      Dedup.duplicateClusters(Tables.documents(s, d), "doc_id", "text",
          k = MinhashK, bands = MinhashBands, minEst = 0.5)
        .orderBy("doc_id")),

    // ---- extension: LSH-bucketed ANN. Approximate-but-DETERMINISTIC:
    // the srpSigns hyperplanes are inlined into the DuckDB oracle, which
    // replays bucketing + re-rank exactly (same trick as q60)
    "q52_x_lsh_ann" -> tuned((s, d) =>
      Similarity.lshTopK(
          Tables.embeddings(s, d).filter(col("vec_id") < 200),
          "vec_id", "embedding", dim = 64, k = 3)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")),

    // ---- extension: IVF ANN — approximate but fully deterministic, so
    // the whole train/probe/re-rank pipeline is SQL-replayed in the
    // oracle (ivfTopKSql), same discipline as q52's hyperplane replay
    "q58_x_ivf_ann" -> tuned((s, d) => {
      val vecs = Tables.embeddings(s, d).filter(col("vec_id") < 200)
      val model = graft.sim.Ivf.train(vecs, "vec_id", "embedding", k = 8, iters = 3)
      graft.sim.Ivf.topK(vecs, "vec_id", "embedding", model, k = 3, nProbe = 2)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- extension: corpus construction (builder brief) — relevance
    // scoring, decontamination, deterministic splits, per-stratum
    // selection, sequence packing, vocabulary stats (graft.text.Corpus)
    "q70_x_bm25" -> tuned((s, d) =>
      Corpus.bm25(Tables.documents(s, d), "doc_id", "text",
          query = Seq("join", "scan", "window"))
        .orderBy("doc_id")),

    "q71_x_contamination" -> tuned((s, d) => {
      val docs = Tables.documents(s, d)
      Corpus.contamination(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),

    "q72_x_hash_sample" -> tuned((s, d) =>
      Corpus.hashSample(Tables.documents(s, d), "doc_id", buckets = 10, keep = 3)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),

    "q73_x_topk_stratum" -> tuned((s, d) =>
      Corpus.topKPerStratum(
          Tables.documents(s, d).select("doc_id", "source", "n_chars"),
          strata = Seq("source"),
          order = Seq(col("n_chars").desc, col("doc_id").asc), k = 5)
        .orderBy("source", "rank")),

    "q74_x_pack_sequences" -> tuned((s, d) =>
      Corpus.packSequences(Tables.documents(s, d), "doc_id", "text",
          budget = 64, strata = Seq("source"))
        .orderBy("source", "doc_id")),

    // ordered internally (count desc, ngram) — deterministic at the k cut
    "q75_x_top_ngrams" -> tuned((s, d) =>
      Corpus.topNgrams(Tables.documents(s, d), "text", n = 2, k = 25)),

    // ---- extension: bounded-state top-k aggregate (same output contract
    // as the q73 window form; shuffles ≤ k rows per stratum, not all rows)
    "q76_x_topk_agg" -> tuned((s, d) =>
      operators.TopK.perKeyAgg(
          Tables.documents(s, d).select("doc_id", "source", "n_chars"),
          strata = Seq("source"), scoreCol = "n_chars", idCol = "doc_id", k = 5)
        .orderBy("source", "rank")),

    // ---- extension: backward as-of join (pandas merge_asof / DuckDB
    // ASOF JOIN) — union + forward-fill rewrite, one shuffle + sort
    "q77_x_asof_join" -> tuned((s, d) => {
      val right = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"), Cols.monthStart(col("o_orderdate")).as("month"))
        .agg(round(sum(col("o_totalprice")), 2).as("tot"), count(lit(1)).as("n"))
        .filter(col("n") >= 45) // sparse series: as-of must reach back
        .select("o_orderpriority", "month", "tot")
      val left = Tables.orders(s, d)
        .filter(col("o_orderkey") % 97 === 0)
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
      operators.AsofJoin.asofJoin(left, right, keys = Seq("o_orderpriority"),
          leftTime = "o_orderdate", rightTime = "month", payload = Seq("tot"))
        .orderBy("o_orderkey")
    }),

    // ---- extension: Gopher repetition stats (single-pass JVM kernel).
    // The testdata docs are single-line, so the line axis runs over the
    // deterministic 2-token-chunk derivation (linedText) — 181/500 docs
    // then carry real within-doc duplicate lines; the n-gram axes run on
    // the raw token stream either way (newlines are \s to the tokenizer)
    "q80_x_repetition" -> tuned((s, d) => {
      val f = graft.text.Repetition.statsCol(linedText(col("text")))
      Tables.documents(s, d).select(col("doc_id"),
          // null text -> null struct; the oracle coalesces n_lines to 0
          coalesce(f.getField("n_lines").cast("long"), lit(0L)).as("n_lines"),
          round(f.getField("dup_line_frac"), 4).as("dup_line_frac"),
          round(f.getField("dup_line_char_frac"), 4).as("dup_line_char_frac"),
          round(f.getField("top_2gram_char_frac"), 4).as("top_2gram_char_frac"),
          round(f.getField("dup_5gram_char_frac"), 4).as("dup_5gram_char_frac"))
        .orderBy("doc_id")
    }),

    // ---- extension: corpus-wide line-level dedup (CCNet/RefinedWeb
    // paragraph dedup) — same lined derivation; boilerplate lines survive
    // only at their globally-first (doc_id, pos) occurrence
    "q81_x_line_dedup" -> tuned((s, d) =>
      Dedup.lineDedup(
          Tables.documents(s, d).select(col("doc_id"), linedText(col("text")).as("text")),
          "doc_id", "text")
        .orderBy("doc_id")),

    // ---- extension: PII redaction audit — planted deterministic PII
    // (email on doc_id%3, IPv4 on %2, phone on %5: counts vary 0/1) over
    // RE2-safe regexes the oracle runs verbatim; codegen'd, no UDF
    "q82_x_pii_redact" -> tuned((s, d) => {
      val pii = concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact u"), col("doc_id"), lit("@example.com"))).otherwise(""),
        when(col("doc_id") % 2 === 0,
          concat(lit(" from 10."), col("doc_id") % 256, lit(".0."), col("doc_id") % 100))
          .otherwise(""),
        when(col("doc_id") % 5 === 0,
          concat(lit(" tel 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
            lit("-0199"))).otherwise(""))
      val cols = col("doc_id") +:
        graft.text.Redact.piiCounts(pii).map { case (n, c) => c.as(n) } :+
        graft.text.Redact.redact(pii).as("text_redacted")
      Tables.documents(s, d).select(cols: _*).orderBy("doc_id")
    }),

    // ---- extension: SemDeDup semantic near-dup (IVF-cluster-bounded
    // pairwise cosine); the oracle replays the full deterministic Lloyd
    // train → assign → within-cluster pair → round-then-threshold chain
    // (ivfSemanticDedupSql), graduating this from rows-only to hash-checked
    "q83_x_semantic_dedup" -> tuned((s, d) => {
      val vecs = Tables.embeddings(s, d).filter(col("vec_id") < 200)
      val model = graft.sim.Ivf.train(vecs, "vec_id", "embedding", k = 8, iters = 3)
      graft.sim.Ivf.semanticDedupPairs(vecs, "vec_id", "embedding", model, threshold = 0.35)
        .orderBy("id_a", "id_b")
    }),

    // ---- extension: composed Gopher repetition filter (q80's kernel as a
    // cleaning DECISION; thresholds keep 348/500 at sf0.01 — non-vacuous)
    "q84_x_gopher_filter" -> tuned((s, d) =>
      graft.text.TextAnalysis.repetitionFilter(
          Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"),
            linedText(col("text")).as("text")),
          "text", maxDupLineFrac = 0.12, maxTop2GramFrac = 0.09, maxDup5GramFrac = 0.05)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),

    // ---- extension: JSONL sink + source round-trip (the training-corpus
    // interchange format) — write per-partition part files, read back with
    // an explicit schema, aggregate; oracle is the same aggregate straight
    // off the parquet table, so the round-trip must be lossless
    "q85_x_jsonl_roundtrip" -> tuned((s, d) => {
      val docs = Tables.documents(s, d)
      val key = graft.text.TextHash.hash32(d).toHexString
      val path = s"${sys.props("java.io.tmpdir")}/graft_jsonl_$key"
      cleanupOnExit(path) // the staging copy must not outlive the JVM
      graft.sources.Sinks.jsonl(docs, path)
      graft.sources.Sinks.readJsonl(s, path, docs.schema)
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"))
        .orderBy("source")
    }),

    // ---- extension: corpus-LM perplexity scoring (CCNet-style quality
    // signal) — add-k unigram LM with minCount vocab pruning; avg_nll is
    // the log-space score (ppl = exp of it), rounded for cross-engine
    // stability
    "q86_x_perplexity" -> tuned((s, d) =>
      graft.text.LanguageModel.unigramNll(
          Tables.documents(s, d), "doc_id", "text", minCount = 2L, k = 0.5)
        .orderBy("doc_id")),

    // ---- extension: domain-mix sampling (the pretraining data recipe) —
    // integer-weight targets 5:3:1:1 over four sources, deterministic
    // hash-bucket membership; the binding domain keeps everything
    "q87_x_domain_mix" -> tuned((s, d) =>
      Corpus.domainMixSample(
          Tables.documents(s, d).select("doc_id", "source", "n_chars"),
          "source", "doc_id",
          weights = Map("src0" -> 5L, "src1" -> 3L, "src2" -> 1L, "src3" -> 1L))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),

    // ---- extension: DSIR importance scoring — target domain = the
    // German documents; log-ratio of target-LM to corpus-LM likelihood
    // ranks how target-like each corpus document is
    "q88_x_importance_score" -> tuned((s, d) => {
      val docs = Tables.documents(s, d)
      graft.text.LanguageModel.importanceScore(
          docs, docs.filter(col("lang") === "de"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- extension: curriculum binning — 4 equal-population difficulty
    // bins per source over corpus-LM avg_nll (cleanest text first)
    "q89_x_curriculum_bins" -> tuned((s, d) => {
      val docs = Tables.documents(s, d)
      val scored = graft.text.LanguageModel.unigramNll(docs, "doc_id", "text")
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
      Corpus.curriculumBins(scored, Seq("source"),
          Seq(col("avg_nll").asc, col("doc_id").asc), nBins = 4)
        .select("doc_id", "source", "avg_nll", "bin")
        .orderBy("doc_id")
    }),

    // ---- extension: range (point-in-interval) join — sampled orders
    // against per-priority month validity windows via the binned
    // equi-join rewrite (the naive non-equi predicate would plan a
    // BroadcastNestedLoopJoin; PlanSpec pins the rewrite's plan shape)
    "q90_x_range_join" -> tuned((s, d) => {
      val orders = Tables.orders(s, d)
      val windows = orders
        .groupBy(col("o_orderpriority"),
          Cols.monthStart(col("o_orderdate")).as("w_start"))
        .agg(round(sum(col("o_totalprice")), 2).as("tot"))
        .withColumn("w_end", last_day(col("w_start")))
      val sampled = orders.filter(col("o_orderkey") % 97 === 0)
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
      graft.operators.RangeJoin.rangeJoinDays(
          sampled, windows, Seq("o_orderpriority"),
          "o_orderdate", "w_start", "w_end", payload = Seq("tot"), binDays = 16)
        .orderBy("o_orderkey")
    }),

    // ---- extension: hive-partitioned sink + partition-pruned readback —
    // write documents partitioned by source, read ONE partition back; the
    // scan must touch only that directory (PartitionedSinkSpec pins the
    // PartitionFilters plan contract); oracle = the same aggregate
    // straight off the unpartitioned table, so the layout must be lossless
    "q91_x_partitioned_sink" -> tuned((s, d) => {
      val docs = Tables.documents(s, d)
      val key = graft.text.TextHash.hash32(d).toHexString
      val path = s"${sys.props("java.io.tmpdir")}/graft_part_$key"
      cleanupOnExit(path)
      graft.sources.Sinks.writePartitioned(docs, path, Seq("source"))
      s.read.parquet(path)
        .filter(col("source") === "src3")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang")
    }),

    // ---- extension: bucketed co-located join — bucketBy pre-hash-
    // partitions BOTH tables on disk, so the fact⋈dim equi-join reads
    // co-located splits and plans NO Exchange (BucketingSpec asserts the
    // plan); the write-once shuffle amortizes over every later run.
    // Revenue rides as exact integer cents (q18's discipline).
    "q118_x_bucketed_join" -> tuned((s, d) => {
      import graft.sources.Bucketing
      val key = graft.text.TextHash.hash32(d).toHexString
      val base = s"${sys.props("java.io.tmpdir")}/graft_bucket_$key"
      cleanupOnExit(base)
      Bucketing.writeBucketedTable(Tables.customer(s, d)
          .select("c_custkey", "c_nationkey"),
        s"graft_b_customer_$key", s"$base/customer", Seq("c_custkey"), 8, Seq("c_custkey"))
      Bucketing.writeBucketedTable(Tables.orders(s, d)
          .select("o_custkey", "o_totalprice"),
        s"graft_b_orders_$key", s"$base/orders", Seq("o_custkey"), 8, Seq("o_custkey"))
      Bucketing.table(s, s"graft_b_orders_$key")
        .join(Bucketing.table(s, s"graft_b_customer_$key"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(floor(col("o_totalprice") * 100 + 0.5)) / 100.0, 2).as("revenue"))
        .orderBy("c_nationkey")
    }),

    // ---- extension: BPE tokenizer-vocabulary induction (Sennrich 2016)
    // — iterative argmax over distributed pair counts is not
    // SQL-expressible, so no oracle (rows-only); the merge sequence is
    // pinned by BpeSpec's hand-computed fixture
    // 1000 merges: the in-memory learner makes vocab-scale merge counts
    // free (one corpus pass + driver-side rounds); the old distributed
    // loop paid ~3 Spark jobs PER MERGE and capped out at ~10.
    "q92_x_bpe_merges" -> tuned((s, d) => {
      import s.implicits._
      graft.text.Bpe.learnMerges(Tables.documents(s, d), "text", numMerges = 1000)
        .map(m => (m.rank, m.left, m.right, m.pairCount))
        .toDF("rank", "left", "right", "pair_count")
        .orderBy("rank")
    }),

    // ---- extension: GPT-3-style quality classifier — logistic
    // regression on hashed bag-of-words, trained on a text-derived
    // reference label (docs mentioning "vector": the testdata's lang and
    // source columns are random w.r.t. tokens, i.e. unlearnable) and
    // scoring the whole corpus. Iterative GD is not SQL-expressible
    // (rows-only); separation pinned by QualityClassifierSpec. Scores
    // rounded: cross-partition float summation order can differ in the
    // last ulp.
    "q93_x_quality_classifier" -> tuned((s, d) => {
      val docs = Tables.documents(s, d)
      val labeled = docs.withColumn("label",
        array_contains(Cols.tokens(col("text")), "vector").cast("int"))
      val model = graft.text.QualityClassifier.train(
        labeled, "text", "label", dim = 512, iters = 25, lr = 5.0)
      labeled.select(col("doc_id"), col("label"),
          round(graft.text.QualityClassifier.scoreCol(col("text"), model), 3).as("score"))
        .orderBy("doc_id")
    }),

    // ---- extension: BPE encode under a corpus-learned merge table — the
    // token-count a training pipeline budgets by. Merge learning is the
    // model fit (q92); encode is one codegen-boundary UDF pass per doc.
    // Greedy rank-ordered merging is not SQL-expressible (rows-only);
    // encode semantics pinned by BpeSpec.
    "q94_x_bpe_encode" -> tuned((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = graft.text.Bpe.learnMerges(docs, "text", numMerges = 6)
      // non-ANSI size(null) = -1: null texts must surface as null counts
      def sz(c: Column) = when(col("text").isNull, lit(null).cast("int")).otherwise(size(c))
      docs.select(col("doc_id"),
          sz(graft.text.Bpe.encodeCol(col("text"), merges)).as("n_subwords"),
          sz(Cols.tokens(col("text"))).as("n_words"))
        .orderBy("doc_id")
    }),

    // ---- extension: sliding-window chunking with overlap (context-window
    // split for RAG/long-doc training) — 32-token windows, stride 24
    // (8-token overlap); explode+slice, no shuffle
    "q95_x_chunk_docs" -> tuned((s, d) =>
      Corpus.chunkDocs(Tables.documents(s, d), "doc_id", "text",
          chunkSize = 32, stride = 24)
        .orderBy("doc_id", "chunk_id")),

    // ---- extension: ORC round-trip (the second columnar interchange
    // format) — write documents as ORC, explicit-schema read back,
    // aggregate; oracle = the same aggregate off the parquet table, so
    // the ORC path must be lossless (same contract as q85's JSONL)
    "q96_x_orc_roundtrip" -> tuned((s, d) => {
      val docs = Tables.documents(s, d)
      val key = graft.text.TextHash.hash32(d).toHexString
      val path = s"${sys.props("java.io.tmpdir")}/graft_orc_$key"
      cleanupOnExit(path)
      graft.sources.Sinks.orc(docs, path)
      graft.sources.Sinks.readOrc(s, path, docs.schema)
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"))
        .orderBy("source")
    }),

    // ---- extension: int8 embedding quantization round-trip metrics —
    // the 4x-compression knob of a 100 TB vector store. Per-row kernel,
    // shuffle-free; the oracle replays the exact formula (explicit
    // floor(x/s + 0.5) rounding, double dequant) in DuckDB list ops
    "q97_x_embed_quantize" -> tuned((s, d) => {
      val m = graft.sim.VectorOps.int8MetricsCol(col("embedding"))
      Tables.embeddings(s, d).select(col("vec_id"),
          round(m.getField("scale"), 6).as("scale"),
          round(m.getField("max_abs_err"), 6).as("max_abs_err"),
          round(m.getField("cos_fidelity"), 4).as("cos_fidelity"))
        .orderBy("vec_id")
    }),

    // ---- extension: cross-corpus duplicated n-gram coverage (the
    // detection half of Lee et al. exact-substring dedup) — 5-grams
    // occurring >= 2 times corpus-wide, per-doc covered-token fraction
    // via analytic interval union (no covered-position explode)
    "q98_x_dup_ngram_coverage" -> tuned((s, d) =>
      Dedup.dupNgramCoverage(Tables.documents(s, d), "doc_id", "text",
          n = 5, minCount = 2L)
        .withColumn("dup_frac", round(col("dup_frac"), 4))
        .orderBy("doc_id")),

    // ---- extension: watermarked stream-stream inner join (clicks x
    // same-user purchases within 60 min) — finite file stream + inner
    // join + append mode == the batch join, so the oracle is plain SQL
    "q99_x_stream_join" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.clickPurchaseJoin(s, d, windowMinutes = 60)),

    // ---- extension: the removal half of exact-substring dedup — cut
    // q98's duplicated spans out of the text, keep the unique remainder
    "q100_x_remove_dup_spans" -> tuned((s, d) =>
      Dedup.removeDupSpans(Tables.documents(s, d), "doc_id", "text",
          n = 5, minCount = 2L)
        .orderBy("doc_id")),

    // ---- extension: per-domain token-budget sampling (the "~B tokens
    // per domain" pretraining recipe) — deterministic md5-rank prefix
    // until the running token total fits the budget
    "q101_x_token_budget" -> tuned((s, d) =>
      Corpus.tokenBudgetSample(Tables.documents(s, d), "source", "doc_id",
          "text", budget = 2000L)
        .select("doc_id", "source", "n_tokens")
        .orderBy("doc_id")),

    // ---- extension: stream-static enrichment join — arriving events pick
    // up a broadcast per-user profile (no streaming state); complete-mode
    // aggregate over the finite stream == the batch SQL
    "q102_x_stream_static_join" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.enrichedEventStats(s, d)),

    // ---- extension: C4-style line-level cleaning (Raffel et al. 2020
    // §2.2) over the lined derivation with deterministic terminal-punct
    // planting ((doc_id + line) % 3 → '.'/none/'!'), so every rule fires
    // non-vacuously on punctuation-free testdata: the punct rule drops
    // ~1/3 of lines, min-words drops the odd 1-token tail line, the
    // blocklist drops lines containing "spark", min-lines drops short docs
    "q103_x_c4_line_clean" -> tuned((s, d) =>
      graft.text.TextAnalysis.c4Clean(
          Tables.documents(s, d).select(col("doc_id"),
            linedPunctText(col("text"), col("doc_id")).as("text")),
          "doc_id", "text",
          minWordsPerLine = 2, terminal = ".!?\"",
          lineBlocklist = Seq("spark"), minLinesKept = 5,
          docBlocklist = Seq("lorem ipsum"))
        .orderBy("doc_id")),

    // ---- extension: Unicode canonicalization (accent fold + control
    // strip + casefold + whitespace collapse) — the canonical form fed to
    // dedup hashing; planted accented tokens (doc_id % 4) exercise the
    // fold on the all-ASCII corpus, oracle = DuckDB's native
    // strip_accents/nfc_normalize composition
    "q104_x_normalize_text" -> tuned((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.text.TextAnalysis.normalizeText(
            concat(col("text"), lit(" "),
              element_at(
                array(lit("Café"), lit("naïve"), lit("Ünïcôde"), lit("résumé")),
                (col("doc_id") % 4 + 1).cast("int")))).as("norm_text"))
        .withColumn("n_chars_norm", length(col("norm_text")).cast("long"))
        .orderBy("doc_id")),

    // ---- extension: XML round-trip (Spark 4 built-in XML source — the
    // format of arXiv/PubMed/Wikipedia feeds) — write documents as XML,
    // explicit-schema read back, aggregate; oracle = the same aggregate
    // off the parquet table (lossless contract, same as q85/q96)
    "q105_x_xml_roundtrip" -> tuned((s, d) => {
      val docs = Tables.documents(s, d)
      val key = graft.text.TextHash.hash32(d).toHexString
      val path = s"${sys.props("java.io.tmpdir")}/graft_xml_$key"
      cleanupOnExit(path)
      graft.sources.Sinks.xml(docs, path)
      graft.sources.Sinks.readXml(s, path, docs.schema)
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"))
        .orderBy("source")
    }),

    // ---- extension: dedup finisher — duplicate clusters resolved to one
    // BEST-QUALITY representative each (longest doc wins, ties to min id);
    // singletons pass through as their own cluster
    "q106_x_dedup_best" -> tuned((s, d) =>
      graft.text.Dedup.dedupByQuality(
          Tables.documents(s, d).withColumn("n_tokens",
            graft.text.TextAnalysis.tokenCount(col("text")).cast("long")),
          "doc_id", "text", "n_tokens",
          k = MinhashK, bands = MinhashBands, minEst = 0.5)
        .orderBy("doc_id")),

    // ---- extension: group-wise embedding centroid via the typed
    // QuantCentroid Aggregator (map-side partial aggregation; quantized
    // integer sums make float aggregation order-proof across engines)
    "q107_x_vector_centroid" -> tuned((s, d) =>
      Tables.embeddings(s, d)
        .groupBy(col("label").as("grp"))
        .agg(graft.sim.VectorAgg.centroid(col("embedding"), dim = 64).as("c"))
        .select(col("grp"), col("c").getField("ns").as("ns"),
          posexplode(col("c").getField("sums")).as(Seq("pos", "sum_q")))
        // per-dimension count (= the oracle's count(*) per (grp, dim));
        // equal to the vector count here because embeddings are fixed-dim
        .select(col("grp"), (col("pos") + 1).as("dim"), col("sum_q"),
          element_at(col("ns"), col("pos") + 1).as("n"),
          (col("sum_q").cast("double") /
            element_at(col("ns"), col("pos") + 1)).as("mean_q"))
        .orderBy("grp", "dim")),

    // ---- extension: weighted sampling without replacement (Efraimidis–
    // Spirakis over deterministic md5 uniforms) — longer documents
    // (weight = n_chars) are proportionally likelier; selection is a pure
    // expression + top-n, reproducible under retries
    "q108_x_weighted_sample" -> tuned((s, d) =>
      Corpus.weightedSample(
          Tables.documents(s, d).select("doc_id", "source", "n_chars"),
          "doc_id", "n_chars", n = 120)
        .orderBy("doc_id")),

    // ---- extension: bloom-prefiltered decontamination — q71's exact
    // semantics (the bloom has no false negatives; the verify join kills
    // its false positives) behind a per-row broadcast-bloom filter, so
    // the clean majority never explodes into n-grams
    "q109_x_bloom_decontaminate" -> tuned((s, d) => {
      val docs = Tables.documents(s, d)
      Corpus.bloomDecontaminate(
          docs.filter(col("source") =!= "src0")
            .select("doc_id", "source", "n_chars", "text"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", n = 3)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // ---- extension: batch gap sessionization (the offline twin of q56's
    // streaming sessions) — lag-mark + running-sum over ONE shared window
    // sort; 12h gap ≈ 22 sessions/user on the testdata
    "q110_x_batch_sessions" -> tuned((s, d) =>
      graft.operators.Sessionize.sessionStats(
          Tables.events(s, d).select("user_id", "event_id", "ts"),
          "user_id", "ts", "event_id", gapMinutes = 720)
        .orderBy("user_id", "session_idx")),

    // ---- extension: two-stage quantized ANN — int8 coarse pool (4x
    // smaller corpus representation) + exact cosine re-rank; every stage
    // deterministic, so unlike LSH/IVF this approximate path is
    // oracle-checked end-to-end
    "q111_x_quantized_ann" -> tuned((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.quantizedTopK(e.filter(col("vec_id") < 32), e,
          "vec_id", "embedding", k = 3, refine = 4)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .orderBy("query_id", "rank")
    }),

    // ---- extension: the NATIVE as-of join (custom LogicalPlan +
    // Strategy + AsofJoinExec, q77's derivation in OUTER mode) — one
    // streaming merge per partition with O(1) state, vs q77's
    // union+window rewrite; oracle = DuckDB ASOF LEFT JOIN
    "q112_x_native_asof_join" -> tuned((s, d) => {
      val right = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"), Cols.monthStart(col("o_orderdate")).as("month"))
        .agg(round(sum(col("o_totalprice")), 2).as("tot"), count(lit(1)).as("n"))
        .filter(col("n") >= 45)
        // o_orderdate is a TIMESTAMP: the native join compares raw
        // internal values, so the month boundary rides as midnight
        // timestamp (DuckDB's date-vs-timestamp promotion does the same)
        .select(col("o_orderpriority"),
          col("month").cast("timestamp_ntz").as("month"), col("tot"))
      val left = Tables.orders(s, d)
        .filter(col("o_orderkey") % 97 === 0)
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
      org.apache.spark.sql.graft.AsofJoinNative.join(left, right,
          keys = Seq("o_orderpriority"), leftTime = "o_orderdate",
          rightTime = "month", payload = Seq("tot"))
        .orderBy("o_orderkey")
    }),

    // ---- extension: FORWARD as-of (next-observation join) through the
    // same native exec — DuckDB can only express it by negating both
    // time axes into a backward ASOF, which is exactly what the oracle
    // does (right (key, month) is unique, so the tie caveat is moot)
    "q113_x_forward_asof_join" -> tuned((s, d) => {
      val right = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"), Cols.monthStart(col("o_orderdate")).as("month"))
        .agg(round(sum(col("o_totalprice")), 2).as("tot"), count(lit(1)).as("n"))
        .filter(col("n") >= 45)
        .select(col("o_orderpriority"),
          col("month").cast("timestamp_ntz").as("month"), col("tot"))
      val left = Tables.orders(s, d)
        .filter(col("o_orderkey") % 97 === 0)
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
      org.apache.spark.sql.graft.AsofJoinNative.join(left, right,
          keys = Seq("o_orderpriority"), leftTime = "o_orderdate",
          rightTime = "month", payload = Seq("tot"), direction = "forward")
        .orderBy("o_orderkey")
    }),

    // ---- extension: the SQL surface itself — cosine_sim registered via
    // GraftExtensions runs from plain spark.sql with no Scala import;
    // adjacent-vector pairs keep the plan a broadcast-free self-join
    "q114_x_sql_cosine" -> tuned((s, d) => {
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      Tables.embeddings(s, d).createOrReplaceTempView("graft_embeddings")
      s.sql("""SELECT a.vec_id,
                      round(cosine_sim(a.embedding, b.embedding), 4) AS cos_next
               FROM graft_embeddings a
               JOIN graft_embeddings b ON b.vec_id = a.vec_id + 1
               ORDER BY a.vec_id""")
    }),

    // ---- extension: FUZZY decontamination — cross-corpus near-dup
    // candidates (held-out side = doc_id % 5 == 0, 15 straddling pairs
    // at sf0.01): the MinHash analog of q71's exact n-gram check,
    // catching paraphrased benchmark leakage exact grams miss
    "q115_x_cross_neardup" -> tuned((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.minhashCandidatesCross(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", k = MinhashK, bands = MinhashBands)
        .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4).as("est_jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // ---- extension: SEMANTIC contamination — the embedding tier of the
    // decontamination trilogy (exact n-grams q71/q109, MinHash fuzzy
    // q115): corpus embeddings against a broadcast held-out side through
    // the codegen'd cosine, threshold 0.4 (25 pairs at sf0.01)
    "q116_x_semantic_contamination" -> tuned((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.crossNearDup(
          e.filter(col("vec_id") % 5 =!= 0),
          e.filter(col("vec_id") % 5 === 0),
          "vec_id", "embedding", threshold = 0.4)
        .orderBy("id_a", "id_b")
    }),

    // ---- extension: q116's SCALE PATH — when the held-out side grows
    // with the corpus (q55→q60 relationship, cross-corpus): SRP-bucketed
    // candidates instead of the exact cross product, |c_bucket|·|h_bucket|
    // per bucket; nBits scales by Similarity.suggestedNBits at real size.
    // Deterministic, so the oracle replays bucketing exactly (q60's trick)
    "q119_x_semantic_decon_bucketed" -> tuned((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.crossNearDupBucketed(
          e.filter(col("vec_id") % 5 =!= 0),
          e.filter(col("vec_id") % 5 === 0),
          "vec_id", "embedding", dim = 64, threshold = 0.4,
          nBits = 6, nTables = 3)
        .orderBy("id_a", "id_b")
    }),

    // ---- extension: TOLERANCE-bounded as-of join (pandas merge_asof
    // tolerance) through the same native exec — q112's derivation with a
    // 15-day bound: a nearest-prior match farther back than the bound is
    // demoted to null payload. The merge is unchanged (tolerance is an
    // O(1) accept test on the unique candidate); the oracle applies the
    // identical test as a CASE over DuckDB's ASOF join epoch gap
    "q120_x_tolerance_asof_join" -> tuned((s, d) => {
      val right = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"), Cols.monthStart(col("o_orderdate")).as("month"))
        .agg(round(sum(col("o_totalprice")), 2).as("tot"), count(lit(1)).as("n"))
        .filter(col("n") >= 45)
        .select(col("o_orderpriority"),
          col("month").cast("timestamp_ntz").as("month"), col("tot"))
      val left = Tables.orders(s, d)
        .filter(col("o_orderkey") % 97 === 0)
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
      org.apache.spark.sql.graft.AsofJoinNative.join(left, right,
          keys = Seq("o_orderpriority"), leftTime = "o_orderdate",
          rightTime = "month", payload = Seq("tot"),
          tolerance = Some(15L * 86400L * 1000000L)) // 15 days in micros
        .orderBy("o_orderkey")
    }),

    // ---- extension: CDC changelog compaction (merge-on-read upsert):
    // orders replayed as a per-customer changelog (version = o_orderkey,
    // every 10th event a tombstone) folded to the current snapshot via
    // ONE max_by aggregation — map-side combine, no window sort; the
    // oracle replays the fold as a DuckDB window (same answer, the
    // contract is the RESULT not the plan)
    "q121_x_cdc_snapshot" -> tuned((s, d) => {
      val changes = Tables.orders(s, d)
        .select(col("o_custkey").as("k"), col("o_orderkey").as("v"),
          when(col("o_orderkey") % 10 === 0, lit("D")).otherwise(lit("U")).as("op"),
          col("o_totalprice").as("price"))
      Cdc.applyChanges(changes, Seq("k"), "v", "op")
        .orderBy("k")
    }),

    // ---- extension: KMV distinct-count sketch — the mergeable
    // cardinality tier: k smallest distinct md5-60 hashes per group as a
    // bounded typed-Aggregator buffer (map-side combine; count DISTINCT
    // at 100 TB shuffles every value, the sketch ships k longs). Unlike
    // HLL++ the k-minimum set is exactly SQL-replayable, so even the
    // approximate estimate hash-matches (q111's property, for cardinality)
    "q122_x_kmv_distinct" -> tuned((s, d) => {
      Sketch.kmvDistinct(Tables.orders(s, d),
          Seq("o_orderpriority"), "o_custkey", k = 128)
        .orderBy("o_orderpriority")
    }),

    // ---- extension: PageRank over the supplier→part supply graph —
    // the link-based quality prior of web-corpus curation, in exact
    // fixed-point arithmetic (d = 17/20, integer division on a 1e12
    // grid): long sums are order-exact, so the iterative result
    // hash-matches an unrolled DuckDB replay — no "approximately equal"
    // escape hatch. Parts have no out-edges, exercising the
    // dangling-mass redistribution every round
    "q123_x_pagerank" -> tuned((s, d) => {
      val li = Tables.lineitem(s, d)
      val edges = li.select(
        concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
        concat(lit("p"), col("l_partkey").cast("string")).as("dst"))
      Graph.pageRank(edges, "src", "dst", iterations = 3)
        .orderBy("node")
    }),

    // ---- extension: Z-order (Morton) clustering — the multi-dimension
    // data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER): bit-spread
    // interleave as five mask rounds of built-in bitwise ops (pure
    // codegen; the write path range-partitions+sorts on the z value so
    // file min/max stats prune BOTH dimensions — layout asserted in
    // ZOrderSpec, the integer curve itself oracle-checked here)
    "q124_x_zorder_morton" -> tuned((s, d) => {
      Tables.orders(s, d).filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"),
          ZOrder.mortonCol(col("o_custkey") % 2048, col("o_orderkey") % 2048)
            .as("zval"))
        .orderBy("o_orderkey")
    }),

    // ---- extension: CROSS-corpus span excision — the decontamination
    // trilogy's removal half (q71/q109 drop whole contaminated docs;
    // this cuts only the contaminated span, q100's machinery pointed at
    // a held-out side): corpus = doc_id % 5 != 0, held-out = the rest,
    // 5-gram hits excised, rebuilt text hash-checked
    "q125_x_cross_span_excision" -> tuned((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.removeContaminatedSpans(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", n = 5)
        .orderBy("doc_id")
    }),

    // ---- extension: triangle counting — the clustering-coefficient /
    // community-density primitive of link-graph curation, as the
    // degree-ordered wedge closure (out-degree under the orientation is
    // O(√m), so the wedge self-join stays bounded on power-law graphs —
    // the property that makes this feasible on a web graph where a raw
    // neighbor self-join explodes at hub nodes). Edges are a
    // deterministic 1013-node graph derived from orders; counts exact
    // longs, so the oracle replays the identical orientation
    "q126_x_triangle_count" -> tuned((s, d) => {
      val edges = Tables.orders(s, d).select(
        (col("o_orderkey") % 1013).cast("string").as("src"),
        ((col("o_orderkey") * 7 + col("o_custkey")) % 1013).cast("string").as("dst"))
      Graph.triangleCounts(edges, "src", "dst").orderBy("node")
    }),

    // ---- extension: SCD Type 2 — the full-history complement of
    // q121's snapshot fold over the SAME changelog: every surviving
    // change becomes a dimension row with [valid_from, valid_to)
    // closed by the key's next event (deletes close but emit nothing).
    // One window shuffle — the minimum interval construction needs
    "q127_x_scd2_history" -> tuned((s, d) => {
      val changes = Tables.orders(s, d)
        .select(col("o_custkey").as("k"), col("o_orderkey").as("v"),
          when(col("o_orderkey") % 10 === 0, lit("D")).otherwise(lit("U")).as("op"),
          col("o_totalprice").as("price"))
      Cdc.scd2(changes, Seq("k"), "v", "op")
        .orderBy("k", "valid_from")
    }),

    // ---- extension: count-min sketch — the mergeable FREQUENCY
    // sketch beside q122's cardinality KMV: 4×1024 long counters,
    // map-side combine ships 32 KB per task where an exact
    // groupBy(value).count() shuffles every distinct value. Fixed-prime
    // affine row hashes over the md5-60 pre-hash make even the
    // approximate estimates SQL-replayable; probes cover the 7 planted
    // hot keys plus two cold ones (est >= true always, equal here —
    // the sketch is far wider than the distinct count)
    "q128_x_cms_heavy_hitters" -> tuned((s, d) => {
      import s.implicits._
      val vals = Tables.lineitem(s, d).select(
        when(col("l_orderkey") % 3 === 0,
          concat(lit("hot"), (col("l_partkey") % 7).cast("string")))
          .otherwise(concat(lit("cold"), col("l_partkey").cast("string")))
          .as("val"))
      val probes = ((0 to 6).map(i => s"hot$i") ++ Seq("cold1", "cold7")).toDF("k")
      val nTrue = vals.groupBy(col("val").as("k")).agg(count(lit(1)).as("n_true"))
      Sketch.cmsEstimates(vals, "val", probes, "k")
        .join(nTrue, Seq("k"), "left")
        .select(col("k"), col("n_est"), coalesce(col("n_true"), lit(0L)).as("n_true"))
        .orderBy("k")
    }),

    // ---- extension: CUBE multi-level subtotals — the reporting-tier
    // aggregation pandas reaches with concat'd groupbys; here ONE
    // Expand+Aggregate pair (each input row fans to its 4 grouping
    // sets before the shuffle, so partial aggregation still combines
    // map-side — no N-pass rescan). Quantities ride as exact longs;
    // grouping_id disambiguates real nulls from subtotal rows
    "q129_x_cube_subtotals" -> tuned((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
        .orderBy("gid", "l_returnflag", "l_linestatus")
    }),

    // ---- extension: binned-quantile sketch — the DETERMINISTIC
    // approximate-percentile tier beside exact q08 and
    // approx_percentile q32: (group, bin) counts are mergeable and the
    // shuffle carries bins, not rows; unlike GK/t-digest the estimate
    // is arrival-order-independent, so it hash-matches. Prices ride as
    // exact cents; ranks are per-mille integer arithmetic end to end
    "q130_x_binned_quantiles" -> tuned((s, d) => {
      val cents = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
      Sketch.binnedQuantiles(cents, Seq("l_returnflag"), "cents",
          binWidth = 500000L, qPermille = Seq(500, 950, 990))
        .orderBy("l_returnflag", "q_permille")
    }),

    // ---- extension: perceptual image dedup — dHash (56-bit luminance
    // difference grid over the REAL javax.imageio decode) + the banded
    // Hamming join shared with SimHash text dedup. The fixture plants
    // 5-image clusters (same base, small red-channel brightness shift):
    // md5 sees 5 distinct payloads, dHash clusters them — the property
    // perceptual hashing buys. Banded join = full recall at hamming<=3,
    // so the oracle replays the decode in closed form and brute-forces
    // the same filter
    "q131_x_image_phash_neardup" -> tuned((s, d) => {
      import graft.multimodal.Multimodal
      val sigs = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("content", Multimodal.texturedImageCol(col("doc_id")))
        .withColumn("sig", Multimodal.dHashCol(col("content")))
        .select("doc_id", "sig")
      Dedup.hammingCandidates(sigs, "doc_id", "sig",
          bits = 56, bands = 4, maxHamming = 3)
        .orderBy("id_a", "id_b")
    }),

    // ---- extension: balanced data-loader sharding — size-descending
    // serpentine deal over 8 shards via the scale-safe global rank
    // (range-partitioned sort + zipWithIndex offsets; an unpartitioned
    // row_number() window would drag the corpus through ONE task). The
    // per-shard totals prove the balance and hash-check the whole
    // assignment; the oracle's window replay is fine AT ORACLE SCALE —
    // that plan is exactly what the operator exists to avoid
    "q132_x_balanced_shards" -> tuned((s, d) => {
      Corpus.assignShards(Tables.documents(s, d).select("doc_id", "n_chars"),
          "doc_id", "n_chars", nShards = 8)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"),
          min("doc_id").as("first_doc"))
        .orderBy("shard")
    }),

    // ---- extension: STREAMING count-min heavy hitters — q128's sketch
    // as complete-mode streaming state: elementwise-add merge makes
    // micro-batch slicing invisible, so the drained sketch equals the
    // batch sketch and the probe reads hash-match the same SQL replay.
    // Fixed 32 KB state regardless of key cardinality — the standing
    // frequency monitor a per-key streaming count can't afford at scale
    "q133_x_stream_cms" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingCmsHeavyHitters(s, d,
        probes = Seq("click:7", "view:23", "error:0", "purchase:39", "signup:999"))),

    // ---- extension: size-targeted compaction (Delta OPTIMIZE-style
    // small-files maintenance) — scatter lineitem into 64 tiny files,
    // compact by Catalyst's size stats, read back and aggregate: the
    // oracle off the ORIGINAL table proves the rewrite lossless (q96's
    // round-trip contract, for the maintenance op). File-count targeting
    // itself is asserted in SinksSpec
    "q134_x_compacted_sink" -> tuned((s, d) => {
      val key = graft.text.TextHash.hash32(d).toHexString
      val frag = s"${sys.props("java.io.tmpdir")}/graft_frag_$key"
      val comp = s"${sys.props("java.io.tmpdir")}/graft_comp_$key"
      cleanupOnExit(frag); cleanupOnExit(comp)
      Tables.lineitem(s, d).select("l_orderkey", "l_returnflag", "l_quantity")
        .repartition(64).write.mode("overwrite").parquet(frag)
      graft.sources.Sinks.writeCompacted(
        s.read.parquet(frag), comp, targetFileBytes = 1L * 1024 * 1024)
      s.read.parquet(comp)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // ---- extension: interval-OVERLAP join (session intersection /
    // validity-window overlap) — q90's binning rewrite generalized to
    // intervals on BOTH sides, with the first-shared-bin predicate
    // replacing a corpus-wide DISTINCT: two order-validity windows
    // under the same priority, 10-day bins; naive Spark plans a
    // nested-loop product here
    "q135_x_interval_overlap_join" -> tuned((s, d) => {
      val o = Tables.orders(s, d)
      def win(modK: Int, spanMod: Int, pfx: String) = o
        .filter(col("o_orderkey") % modK === 0)
        .select(col("o_orderkey").as(s"${pfx}_key"),
          col("o_orderpriority").as("prio"),
          to_date(col("o_orderdate")).as(s"${pfx}_s"),
          date_add(to_date(col("o_orderdate")),
            (col("o_orderkey") % spanMod).cast("int")).as(s"${pfx}_e"))
      val l = win(13, 20, "l")
      val r = win(17, 15, "r")
      RangeJoin.intervalOverlapJoin(l, r, Seq("prio"),
          "l_s", "l_e", "r_s", "r_e", payload = Seq("r_key"),
          binWidth = 10.0 * 86400)
        .select(col("l_key"), col("r_key"), col("prio"))
        .orderBy("l_key", "r_key")
    }),

    // ---- extension: winsorization at exact order statistics — clip
    // prices into [p05, p95] of their group; bounds are exact rank
    // ELEMENTS (q130's histogram at binWidth=1 — no interpolation, no
    // floats), so the clipped sum and tail counts ride exact integers
    "q136_x_winsorize" -> tuned((s, d) => {
      val cents = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
      Sketch.winsorize(cents, Seq("l_returnflag"), "cents", 50, 950)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("cents_w")).as("sum_clipped"),
          sum(col("is_low").cast("long")).as("n_low"),
          sum(col("is_high").cast("long")).as("n_high"))
        .orderBy("l_returnflag")
    }),

    // ---- extension: INTERSECT / EXCEPT — the §2.8 set-op inventory
    // beyond q28's union: customers ordering on the even-key stream vs
    // the mod-3 stream; Spark plans both as left-semi/anti over the
    // deduped sides
    "q137_x_set_ops" -> tuned((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_orderkey") % 2 === 0).select("o_custkey").distinct()
      val b = o.filter(col("o_orderkey") % 3 === 0).select("o_custkey").distinct()
      a.intersect(b).withColumn("op", lit("intersect"))
        .union(a.except(b).withColumn("op", lit("except")))
        .groupBy("op")
        .agg(count(lit(1)).as("n"),
          min("o_custkey").as("min_key"), max("o_custkey").as("max_key"))
        .orderBy("op")
    }),

    // ---- extension: column profiling — per-column null/distinct/range
    // reconnaissance as ONE column-pruned scan (all aggregates in a
    // single agg; stack pivots the wide row). Exact distincts by
    // design — a profile runs once; monitoring uses the sketches
    "q138_x_profile" -> tuned((s, d) =>
      graft.operators.Profile.profile(Tables.orders(s, d),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority"))
        .orderBy("col_name")),

    // ---- extension: fuzzy key join (record linkage) — prefix-blocked
    // levenshtein match instead of the O(|L|·|R|) DP cross product: a
    // corrupted part-name stream (one char deleted past position 3, so
    // the 3-char block key survives — the documented recall contract)
    // re-linked to the catalog at edit distance <= 2
    "q139_x_fuzzy_join" -> tuned((s, d) => {
      val corrupted = Tables.part(s, d).filter(col("p_partkey") % 4 === 0)
        .withColumn("pos",
          (lit(3) + col("p_partkey") % (length(col("p_name")) - 3)).cast("int"))
        .select(col("p_partkey").as("c_key"),
          expr("concat(substring(p_name, 1, pos), substring(p_name, pos + 2, 1000))")
            .as("c_name"))
      graft.operators.FuzzyJoin.byEditDistance(
          corrupted, Tables.part(s, d), "c_name", "p_name",
          payload = Seq("p_partkey"), maxDist = 2, prefixLen = 3)
        .select(col("c_key"), col("p_partkey"), col("edit_dist").cast("int").as("edit_dist"))
        .orderBy("c_key", "p_partkey")
    }),

    // ---- extension: batch MERGE (upsert) — the copy-on-write lakehouse
    // write beside q121's merge-on-read fold and q127's SCD2 history:
    // one mutation batch (updates + deletes + inserts on negated keys)
    // applied as target-LEFT-ANTI-source ∪ surviving-source — the
    // broadcast anti join never shuffles the snapshot side
    "q140_x_merge_upsert" -> tuned((s, d) => {
      val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
      val target = Tables.orders(s, d).select(col("o_orderkey").as("k"),
        cents.as("price_cents"), col("o_orderstatus").as("status"))
      val o = Tables.orders(s, d)
      val source = o.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 20 === 0, lit("D")).otherwise(lit("U")).as("op"),
          (cents + 12345).as("price_cents"), lit("M").as("status"))
        .unionByName(o.filter(col("o_orderkey") % 7 === 0)
          .select((-col("o_orderkey")).as("k"), lit("U").as("op"),
            cents.as("price_cents"), lit("N").as("status")))
      Cdc.merge(target, source, Seq("k"), "op")
        .filter(abs(col("k")) % 3 === 0)
        .orderBy("k")
    }),

    // ---- extension: Holt linear-trend exponential smoothing — the
    // smoothing tier between q117's fitted AR(1) and a moving average;
    // exact-binary-fraction constants (α=1/2, β=1/4) make the per-series
    // recursion bit-replayable by a recursive CTE (the q117 property for
    // smoothers), so even the floating-point state hash-checks
    "q141_x_holt_forecast" -> tuned((s, d) =>
      graft.stats.Diagnostics.holtForecast(
          Tables.orders(s, d)
            .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(round(sum(floor(col("o_totalprice") * 100 + 0.5)) / 1e8, 6).as("tot")),
          Nil, "month", "tot", alpha = 0.5, beta = 0.25, horizon = 12)
        .select(col("key"), col("n_obs"), round(col("level"), 4).as("level"),
          round(col("trend"), 4).as("trend"), col("step"),
          round(col("forecast"), 4).as("forecast"))
        .orderBy("key", "step")),

    // ---- extension: grouped OLS trend — one least-squares line per key
    // as ONE map-side-combining aggregate over the five sufficient sums
    // (no per-series kernel, no window): exact long sums, one IEEE
    // division — the declarative scale-out form of "fit a trend to a
    // billion series". y rides whole dollars (cents div 100) to keep
    // n·Σxy far under 2⁶³ at any bench scale
    "q142_x_grouped_ols" -> tuned((s, d) => {
      val m = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("x"))
        .agg(expr("sum(cast(floor(o_totalprice * 100 + 0.5) as bigint)) div 100")
          .as("y"))
      graft.operators.Regression.groupedOls(m, Seq("prio"), "x", "y")
        .orderBy("prio")
    }),

    // ---- extension: PMI collocation mining — association strength over
    // adjacent token pairs with the threshold as an INTEGER
    // cross-multiplication (c₁₂·N ≥ 20·c₁·c₂ and c₁₂ ≥ 5): no log ever
    // executes, so no libm ulp to drift on; the reported score is the
    // exact integer (c₁₂·N·10⁶) div (c₁·c₂)
    "q143_x_pmi_collocations" -> tuned((s, d) =>
      graft.text.Corpus.pmiCollocations(
          Tables.documents(s, d), "text", minCount = 5, minRatio = 20)
        // DECIMAL(38,0): c12·N·1e6 wraps BIGINT on a large corpus (q183's
        // ADVICE finding applies here identically); result fits BIGINT
        .withColumn("ratio_e6",
          expr("cast(c12 as decimal(38,0)) * n_pairs * 1000000 div (c1 * c2)"))
        .drop("ratio")
        .orderBy("w1", "w2")),

    // ---- extension: linear gap interpolation (pandas
    // interpolate(method='linear')) — interior nulls of a keyed series
    // filled by the straight line between nearest non-null neighbors,
    // positioned by the numeric x (distance-weighted, not row-weighted);
    // the interpolant is per-row fixed-order IEEE arithmetic, so the
    // filled values hash-match without quantization
    "q144_x_interpolate" -> tuned((s, d) => {
      val m = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("x"))
        .agg((floor(sum(floor(col("o_totalprice") * 100 + 0.5)) / 1e8 * 1e6 + 0.5) / 1e6)
          .as("y0"))
        .select(col("prio"), col("x"),
          when(col("x") % 4 =!= 1, col("y0")).as("y"))
      graft.operators.Features.interpolateLinear(m, Seq("prio"), "x", "y",
          outCol = "interp")
        .select(col("prio"), col("x"), col("y"),
          (floor(col("interp") * 1e6 + 0.5) / 1e6).as("interp"))
        .orderBy("prio", "x")
    }),

    // ---- extension: STREAMING KMV distinct cardinality — one k-minimum
    // sketch per event_type as complete-mode streaming state; the buffer
    // merge is a sorted set union (micro-batch-slicing-independent), so
    // the drained state equals the batch q122 sketch and the estimate
    // replays in SQL
    "q145_x_stream_kmv" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingKmvDistinct(s, d)),

    // ---- extension: median/MAD robust outlier detection — the
    // fat-tail-safe z-score: both bounds are EXACT rank elements
    // (q130's binWidth=1 discipline), so the verdicts ride exact
    // integers; k=1 keeps the flag count nontrivial on a thin-tailed
    // uniform metric (k is the caller's tail dial)
    "q146_x_mad_outliers" -> tuned((s, d) => {
      val v = Tables.lineitem(s, d).select(col("l_returnflag"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint) div 100")
          .as("dollars"))
      Sketch.madOutliers(v, Seq("l_returnflag"), "dollars", k = 1)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), max("med").as("med"), max("mad").as("mad"),
          sum(col("is_outlier").cast("long")).as("n_out"))
        .orderBy("l_returnflag")
    }),

    // ---- extension: ordered-stage funnel (view → click → purchase) —
    // per-user stage chain as ONE shuffle of chained unordered windows;
    // micros on both sides (DuckDB truncates parquet NANOS to micros,
    // the q56 convention), so strict-after verdicts agree exactly
    "q147_x_funnel" -> tuned((s, d) =>
      graft.operators.Funnel.conversionCounts(
          Tables.events(s, d).withColumn("tsu", expr("ts_ns div 1000")),
          Seq("user_id"), "tsu", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("stage")),

    // ---- extension: bigram next-token table — the greedy order-2 LM
    // readout: argmax continuation per context with a lexicographic
    // tie-break INSIDE one min_by aggregate (no rank window), and the
    // continuation probability as the exact integer (c12·10⁶) div c1
    "q148_x_next_token" -> tuned((s, d) =>
      graft.text.Corpus.nextTokenTable(Tables.documents(s, d), "text",
          minCount = 5)
        .orderBy("w1")),

    // ---- extension: mergeable-sketch composition — per-shard KMV
    // buffers merged back per priority equal q122's direct build
    // EXACTLY (k-min of a union is a function of each side's k-mins),
    // so the merged estimates replay against the identical oracle:
    // the incremental-pipeline law (daily sketches → monthly
    // cardinality, no rescan) as a checked contract
    "q149_x_kmv_merge" -> tuned((s, d) => {
      val sh = Sketch.kmvSketch(
        Tables.orders(s, d).withColumn("shard", col("o_custkey") % 4),
        Seq("o_orderpriority", "shard"), "o_custkey")
      Sketch.kmvMergeSketches(sh, Seq("o_orderpriority"), "sketch")
        .orderBy("o_orderpriority")
    }),

    // ---- extension: cohort retention matrix — first-active-week
    // cohorts over integral epoch-weeks; the whole matrix rides exact
    // integers (counts and a permille integer division)
    "q150_x_cohort_retention" -> tuned((s, d) =>
      graft.operators.Funnel.cohortRetention(
          Tables.events(s, d)
            .withColumn("week", expr("ts_ns div 86400000000000 div 7")),
          "user_id", "week")
        .orderBy("cohort", "offset")),

    // ---- extension: HLL register table built per shard then MERGED —
    // max-over-rows is the HLL composition law, so the oracle is the
    // direct unsharded register build (same discipline as q149)
    "q151_x_hll_registers" -> tuned((s, d) => {
      val sh = Sketch.hllRegisters(
        Tables.orders(s, d).withColumn("shard", col("o_custkey") % 4),
        Seq("o_orderpriority", "shard"), "o_custkey", p = 6)
      Sketch.hllMergeRegisters(sh, Seq("o_orderpriority"))
        .orderBy("o_orderpriority", "bucket")
    }),

    // ---- extension: incremental aggregate maintenance — a pre-cutoff
    // snapshot of mergeable (n, Σ, Σ², min, max) partials absorbs the
    // post-cutoff delta without rescanning history; the oracle is the
    // single-pass recompute the monoid law guarantees it equals
    "q152_x_incremental_agg" -> tuned((s, d) => {
      import graft.operators.Incremental
      val li = Tables.lineitem(s, d)
      val cut = "1995-01-01"
      val snap = Incremental.partialAgg(
        li.filter(col("l_shipdate") < lit(cut)), Seq("l_suppkey"), "l_quantity")
      val delta = li.filter(col("l_shipdate") >= lit(cut) ||
        col("l_shipdate").isNull)
      val merged = Incremental.mergePartials(
        Seq(snap, Incremental.partialAgg(delta, Seq("l_suppkey"), "l_quantity")),
        Seq("l_suppkey"))
      Incremental.withDerived(merged).orderBy("l_suppkey")
    }),

    // ---- extension: per-source KL divergence from the corpus token
    // distribution — integer-count ratios per row, nanonat quantization,
    // exact integer sum (the q32 float-determinism discipline)
    "q153_x_kl_domains" -> tuned((s, d) =>
      graft.text.TextAnalysis.domainDivergence(
          Tables.documents(s, d), "source", "text")
        .orderBy("source")),

    // ---- extension: first/last-touch conversion attribution — both
    // conditional scans share one (user, time, id)-sorted window
    "q154_x_attribution" -> tuned((s, d) =>
      graft.operators.Funnel.touchAttribution(
          Tables.events(s, d).withColumn("tsu", expr("ts_ns div 1000")),
          Seq("user_id"), "tsu", "event_id", "event_type",
          Seq("view", "click"), "purchase")
        .orderBy("first_touch", "last_touch")),

    // ---- extension: rolling 4-week active users — exact windowed
    // count(DISTINCT) via membership explosion AFTER per-user dedup
    "q155_x_rolling_active" -> tuned((s, d) =>
      graft.operators.Funnel.rollingActiveUsers(
          Tables.events(s, d)
            .withColumn("week", expr("ts_ns div 86400000000000 div 7")),
          "user_id", "week", windowPeriods = 4)
        .orderBy("period")),

    // ---- extension: deterministic stratified train/val/test split —
    // hash fences keep slices disjoint under retries; readout is the
    // per-(source, split) census with integer permille shares
    "q156_x_hash_split" -> tuned((s, d) => {
      val split = Corpus.hashSplit(Tables.documents(s, d), "doc_id")
      val counts = split.groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n"))
      counts
        .withColumn("__tot", sum(col("n"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
        .withColumn("share_permille", expr("n * 1000 div __tot"))
        .drop("__tot")
        .orderBy("source", "split")
    }),

    // ---- extension: streaming SLIDING-window stats — 28d window / 7d
    // slide as one stateful aggregate; drained complete-mode state
    // equals the batch 4-offset explosion the oracle replays
    "q157_x_stream_sliding" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.slidingEventStats(s, d)),

    // ---- extension: KMV sketch set algebra — pairwise audience overlap
    // (union/Jaccard/intersection estimates) read from stored sketches;
    // raw events are scanned once, every pair answered from buffers
    "q158_x_kmv_overlap" -> tuned((s, d) => {
      val sk = Sketch.kmvSketch(Tables.events(s, d), Seq("event_type"), "user_id")
      Sketch.kmvPairOverlaps(sk, "event_type", "sketch")
        .orderBy("g1", "g2")
    }),

    // ---- extension: snapshot reconciliation — symmetric diff of two
    // table states by key; unchanged keys die inside the join stage
    "q159_x_table_diff" -> tuned((s, d) => {
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey",
        "o_orderstatus", "o_totalprice", "o_orderpriority")
      val before = o.filter(col("o_orderkey") % 97 =!= 0)
      val after = o.filter(col("o_orderkey") % 89 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 13 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
      graft.operators.Cdc.tableDiff(before, after, Seq("o_orderkey"))
        .select(col("o_orderkey"), col("op"), col("n_diff_cols"),
          array_join(col("diff_cols"), ",").as("diff_str"))
        .orderBy("o_orderkey")
    }),

    // ---- extension: data-quality expectation suite — every row-level
    // check + the unique-key check fold into ONE aggregate over ONE scan;
    // the FK check is a key-projected anti-join
    "q160_x_expectations" -> tuned((s, d) => {
      val li = Tables.lineitem(s, d)
      graft.operators.Expectations.validate(li,
        rowChecks = Seq(
          "orderkey_not_null" -> col("l_orderkey").isNotNull,
          "quantity_range" -> (col("l_quantity") >= 1 && col("l_quantity") <= 50),
          "returnflag_domain" -> col("l_returnflag").isin("A", "N", "R"),
          "price_positive" -> (col("l_extendedprice") > 0)),
        uniqueKey = Some(("pk_unique", Seq("l_orderkey", "l_linenumber"))),
        refChecks = Seq(graft.operators.Expectations.RefCheck(
          "fk_orders", Seq("l_orderkey"), Tables.orders(s, d), Seq("o_orderkey"))))
    }),

    // ---- extension: 2-D Pareto frontier — best (price, date) trade-offs
    // among urgent orders; local frontier prune then exact global pass
    "q161_x_skyline" -> tuned((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .withColumn("price_cents", expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"))
        .withColumn("day_no", datediff(to_date(col("o_orderdate")), lit("1970-01-01")))
      graft.operators.Skyline.pareto2d(o, "price_cents", "day_no")
        .select("o_orderkey", "price_cents", "day_no")
        .orderBy("o_orderkey")
    }),

    // ---- extension: time-weighted average — the step-function integral
    // per user (bursts don't over-weight); one window + one aggregate on
    // the same partitioning, exact micros x cents
    "q162_x_twap" -> tuned((s, d) => {
      val e = Tables.events(s, d)
        .withColumn("tsu", expr("ts_ns div 1000"))
        .withColumn("cents", expr("cast(floor(value * 100 + 0.5) as bigint)"))
      graft.operators.Features.timeWeightedAvg(e, Seq("user_id"), "tsu", "cents",
          tieCols = Seq("event_id"))
        .orderBy("user_id")
    }),

    // ---- extension: two-feature grouped OLS — price ~ quantity +
    // discount per return flag; nine exact sufficient sums, Cramer solve
    // as a fixed double expression tree the oracle replays bit-for-bit
    "q163_x_ols2" -> tuned((s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumn("cents", expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)"))
        .withColumn("qty", col("l_quantity").cast("long"))
        .withColumn("disc_pm", expr("cast(floor(l_discount * 1000 + 0.5) as bigint)"))
      graft.operators.Regression.groupedOls2(li, Seq("l_returnflag"),
          "qty", "disc_pm", "cents")
        .orderBy("l_returnflag")
    }),

    // ---- extension: boilerplate line strip — lines in >10% of a
    // source's docs (and >=2 docs) are template, removed from EVERY doc;
    // the df-threshold complement of q81's keep-first-occurrence
    "q164_x_boilerplate" -> tuned((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), linedText(col("text")).as("lt"))
      Dedup.stripBoilerplate(docs, "doc_id", "lt", "source", maxPermille = 100)
        .orderBy("doc_id")
    }),

    // ---- extension: last-writer-wins per-FIELD consolidation — partial
    // updates merge instead of wiping older fields (vs q121's whole-row
    // latest); one max_by-per-column aggregate
    "q165_x_lww_consolidate" -> tuned((s, d) => {
      val base = Tables.orders(s, d)
        .filter(col("o_orderkey") % 7 < 3)
        .select(col("o_orderkey"), lit(1).as("ver"),
          col("o_orderstatus").as("status"), col("o_totalprice").as("price"))
      val u2 = base.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit(2).as("ver"),
          lit("U2").as("status"), lit(null).cast("double").as("price"))
      val u3 = base.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), lit(3).as("ver"),
          lit(null).cast("string").as("status"),
          (col("price") + 1000).as("price"))
      graft.operators.Cdc.lwwConsolidate(
          base.unionByName(u2).unionByName(u3), Seq("o_orderkey"), "ver")
        .orderBy("o_orderkey")
    }),

    // ---- extension: market-basket pair affinity — parts co-purchased
    // within an order, integer-exact lift/confidence; the self-join fans
    // out per basket (bounded), never globally
    "q166_x_copurchase" -> tuned((s, d) =>
      graft.operators.Affinity.coOccurrence(
          Tables.lineitem(s, d), "l_orderkey", "l_partkey", minSupport = 2)
        .orderBy("item1", "item2")),

    // ---- extension: CUSUM level-shift screen — drift of the cumulative
    // deviation above its running minimum, exact n-scaled longs, over
    // monthly order revenue per priority
    "q167_x_cusum" -> tuned((s, d) => {
      val m = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"),
          Cols.monthStart(col("o_orderdate")).as("month"))
        .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")).as("cents"))
      graft.operators.Features.cusumDrift(m, Seq("prio"), "month", "cents")
        .select(col("prio"), col("month"), col("n"), col("dev_scaled"),
          col("drift_scaled"))
        .orderBy("prio", "month")
    }),

    // ---- extension: interval-union coverage — net covered time per user
    // from overlapping event intervals (derived deterministic durations);
    // islands merged on one window sort, exact micros
    "q168_x_interval_union" -> tuned((s, d) => {
      val e = Tables.events(s, d).select(col("user_id"),
        expr("ts_ns div 1000").as("s"),
        expr("ts_ns div 1000 + (event_id % 997 + 1) * 1000000").as("e"))
      graft.operators.RangeJoin.intervalUnionLength(e, Seq("user_id"), "s", "e")
        .orderBy("user_id")
    }),

    // ---- extension: mutual information between categorical column
    // pairs — association profiling with nanonat-quantized exact sums
    // (the q153 discipline applied to I(X;Y))
    "q169_x_mutual_info" -> tuned((s, d) => {
      def mi(df: DataFrame, x: String, y: String, label: String) =
        graft.operators.Profile.mutualInfo(df, x, y)
          .select(lit(label).as("pair"), col("n_rows"), col("nx_distinct"),
            col("ny_distinct"), col("mi_e9"))
      mi(Tables.orders(s, d), "o_orderpriority", "o_orderstatus", "prio_status")
        .unionByName(mi(Tables.lineitem(s, d), "l_returnflag", "l_linestatus",
          "flag_status"))
        .unionByName(mi(Tables.events(s, d)
            .withColumn("ub", col("user_id") % 10),
          "event_type", "ub", "type_userbucket"))
        .orderBy("pair")
    }),

    // ---- extension: EXACT weighted percentiles — quantity-weighted
    // price quantiles per return flag; integer cross-multiplied rank
    // crossing, k percentiles from one window+aggregate pass
    "q170_x_weighted_percentiles" -> tuned((s, d) => {
      val li = Tables.lineitem(s, d)
        .withColumn("cents", expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)"))
        .withColumn("qty", col("l_quantity").cast("long"))
      Sketch.weightedPercentiles(li, Seq("l_returnflag"), "cents", "qty",
          Seq(250, 500, 750, 900))
        .orderBy("l_returnflag")
    }),

    // ---- extension: first-order transition matrix — what users do next,
    // with integer-permille conditional probabilities; one lead window +
    // matrix-sized re-aggregate
    "q171_x_event_transitions" -> tuned((s, d) =>
      graft.operators.Funnel.transitionMatrix(
          Tables.events(s, d).withColumn("tsu", expr("ts_ns div 1000")),
          Seq("user_id"), "tsu", "event_type", tieCols = Seq("event_id"))
        .orderBy("from_state", "to_state")),

    // ---- extension: ROLLUP hierarchy subtotals — region > nation >
    // grand total in ONE Expand+Aggregate pair (q129's cube, restricted
    // to the hierarchy's prefixes); gid disambiguates subtotal rows
    "q172_x_rollup" -> tuned((s, d) => {
      val c = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      c.rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)")).as("bal_cents"),
          grouping_id().cast("int").as("gid"))
        .orderBy("gid", "r_name", "n_name")
    }),

    // ---- extension: per-group feature scaling — z-score + min-max from
    // one broadcast stats pass; event rows never shuffle
    "q173_x_standardize" -> tuned((s, d) => {
      val e = Tables.events(s, d)
        .withColumn("cents", expr("cast(floor(value * 100 + 0.5) as bigint)"))
        .select("event_id", "event_type", "cents")
      graft.operators.Features.standardize(e, Seq("event_type"), "cents")
        .orderBy("event_id")
    }),

    // ---- extension: TF-IDF top terms per document — each doc's
    // strongest keywords (q70's BM25 scores docs for a query; this emits
    // doc-side vectors); nanonat-quantized scores, integer-ranked top-k
    "q174_x_tfidf" -> tuned((s, d) =>
      Corpus.tfidfTopTerms(Tables.documents(s, d), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")),

    // ---- extension: top navigation paths — session-truncated state
    // sequences counted corpus-wide; the path rebuild rides q110's
    // sessionize partitioning, the count is path-matrix-sized
    "q175_x_top_paths" -> tuned((s, d) =>
      graft.operators.Sessionize.topPaths(
          Tables.events(s, d), "user_id", "ts", "event_id", "event_type",
          gapMinutes = 30, maxLen = 3, k = 25)),

    // ---- extension: ABC / Pareto classification — items ranked by
    // revenue, integer cumulative-share class boundaries; window over
    // item-aggregate-sized rows
    "q176_x_abc_classes" -> tuned((s, d) => {
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
    "q177_x_seasonal_decompose" -> tuned((s, d) => {
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
    "q178_x_gini" -> tuned((s, d) => {
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
    "q179_x_decay_score" -> tuned((s, d) => {
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
    "q180_x_bigram_nll" -> tuned((s, d) =>
      graft.text.LanguageModel.bigramNll(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // ---- extension: streaming expectation counters — the q160 row-check
    // tier as standing complete-mode sums; drained state == batch verdict
    "q181_x_stream_expectations" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingExpectations(s, d, Seq(
        "value_nonneg" -> "value >= 0",
        "type_known" -> "event_type in ('view','click','purchase','signup')",
        "user_not_null" -> "user_id is not null"))),

    // ---- extension: streaming transition matrix — constant-size
    // last-event state per user, boundary + in-batch pairs; emitted
    // multiset == q171's batch lead-window pairs
    "q182_x_stream_transitions" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingTransitions(s, d)),

    // ---- extension: skip-gram PMI collocations — q143's association
    // mining widened to a ±2 context window (word2vec-style pairs), same
    // integer cross-multiplication threshold, no log in the decision path
    "q183_x_skipgram_pmi" -> tuned((s, d) =>
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
    "q184_x_join_delta" -> tuned((s, d) => {
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
    "q185_x_benford" -> tuned((s, d) =>
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
    "q186_x_quality_suite" -> tuned((s, d) => {
      import graft.operators.{Expectations, Profile}
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_quantity",
        "l_returnflag", "l_linestatus", "l_extendedprice")
      val planted = li.unionByName(
        li.filter(col("l_orderkey") % 50 === 0)
          .withColumn("l_orderkey", -col("l_orderkey"))
          .withColumn("l_quantity",
            lit(-1).cast(li.schema("l_quantity").dataType))
          .withColumn("l_returnflag", lit(null).cast("string")))
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
    "q187_x_stream_join_delta" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingJoinDelta(s, d)),

    // ---- extension: sliced classifier evaluation — per-source ROC AUC
    // of the length signal against the is-English label, integer-exact
    // via the Mann-Whitney rank identity (midrank ties, one division)
    "q188_x_grouped_auc" -> tuned((s, d) =>
      graft.operators.Metrics.groupedAuc(
          Tables.documents(s, d).withColumn("is_en", col("lang") === "en"),
          Seq("source"), "n_chars", "is_en")
        .orderBy("source")),

    // ---- extension: subset-duplicate detection — directional token-set
    // containment at 1.0 (every token of the smaller doc appears in the
    // larger: the quote-swallowed-by-boilerplate shape Jaccard misses)
    "q189_x_containment" -> tuned((s, d) =>
      Dedup.tokenContainment(Tables.documents(s, d), "doc_id", "text",
          maxIdGap = 50, thresholdE6 = 1000000)
        .orderBy("id_a", "id_b")),

    // ---- extension: per-document token Shannon entropy — the
    // information-density quality feature (repetition ⇒ low entropy at
    // length); e9-quantized per-term, exact integer sum
    "q190_x_token_entropy" -> tuned((s, d) =>
      graft.text.TextAnalysis.tokenEntropy(
          Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // ---- extension: Zipf slope corpus profile — OLS of ln(freq) on
    // ln(rank) over each source's top-50 vocabulary, all-integer OLS
    // sums over e3-quantized logs, one closed-form division
    "q191_x_zipf_slope" -> tuned((s, d) =>
      Corpus.zipfSlope(Tables.documents(s, d), "source", "text", topV = 50)
        .orderBy("domain")),

    // ---- extension: reciprocal-rank fusion — BM25 relevance fused with
    // the entropy quality prior in rank space (no score calibration);
    // contributions are exact integers 1e9 div (60 + rank)
    "q192_x_rrf_fuse" -> tuned((s, d) => {
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
    "q193_x_negative_sample" -> tuned((s, d) =>
      Corpus.negativeSample(Tables.documents(s, d), "doc_id", k = 4)
        .orderBy("anchor_id", "j")),

    // ---- extension: REAL audio decode + per-window features — planted
    // WAV containers decoded with javax.sound.sampled (the audio twin of
    // q53/q54's imageio graduation); energy Σs² and zero crossings are
    // exact integers over the closed-form PCM, so the oracle replays the
    // decoded signal directly
    "q194_x_audio_features" -> tuned((s, d) => {
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
    "q195_x_ks_drift" -> tuned((s, d) =>
      graft.operators.Metrics.ksDrift(
          Tables.documents(s, d), "source", "n_chars")
        .orderBy("source"))
,
    // ---- extension: end-to-end corpus-cleaning funnel — the composed
    // pipeline a training-data run actually executes (quality filter →
    // exact dedup), read out as per-source survival counts at each
    // stage; every stage is the same operator the standalone queries
    // contract-check (q41/q42/q44/q68)
    "q196_x_corpus_funnel" -> tuned((s, d) => {
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
    "q197_x_profile_diff" -> tuned((s, d) => {
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
    "q198_x_psi_drift" -> tuned((s, d) =>
      graft.operators.Metrics.psiDrift(
          Tables.documents(s, d), "source", "n_chars",
          binWidth = 60L, nBins = 10)
        .orderBy("source")),

    // ---- extension: STREAMING PSI drift monitor — state is only the
    // per-(type, bin) count grid (complete mode, O(groups·bins));
    // drained counts == batch counts, so psi_e9 matches bit-for-bit
    "q199_x_stream_psi_drift" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingPsiDrift(s, d)),

    // ---- extension: point-in-time join — "which version was valid when
    // this event happened": q127's SCD2 history probed through the
    // native as-of join (latest valid_from <= t), with the valid_to
    // bound demoting probes that land in a DELETED interval to null —
    // the lakehouse time-travel read, composed from contract-checked
    // parts
    "q200_x_point_in_time_join" -> tuned((s, d) => {
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
    "q201_x_ewma" -> tuned((s, d) => {
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
    "q202_x_quantile_normalize" -> tuned((s, d) =>
      graft.operators.Features.quantileNormalize(
          Tables.documents(s, d), "source", "n_chars")
        .orderBy("source", "n_chars")),

    // ---- extension: seasonal-naive MASE — "does last year beat last
    // month": the scale-free forecastability screen before anything
    // SARIMAX-shaped runs; integer errors, exact sums, one division
    "q203_x_mase" -> tuned((s, d) => {
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
    "q204_x_ngram_diversity" -> tuned((s, d) => {
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
    "q205_x_chi_square" -> tuned((s, d) =>
      graft.operators.Profile.chiSquare(
        Tables.documents(s, d), "lang", "source")),

    // ---- extension: BUILT-IN session_window streaming sessionization —
    // the engine-managed twin of q110/q56's custom-state forms; drained
    // complete-mode windows reshape to the batch sessionStats verdict
    "q206_x_stream_session_window" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingSessionWindows(s, d)),

    // ---- extension: REAL image resize — integer box-average thumbnails
    // over the real javax.imageio decode (partitioning boxes, div-floor
    // means: deterministic where library resamplers are not); the oracle
    // replays the planted pixel formula and the same box sums
    "q207_x_image_resize" -> tuned((s, d) => {
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
    "q208_x_stream_cdc_snapshot" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingCdcSnapshot(s, d)),

    // ---- extension: IVF cluster quality — per-cluster member count +
    // exact sum of e6-quantized member-to-centroid cosines over the
    // q58-trained model; the coarse-quantizer fitness diagnostic, and
    // the oracle replays the training chain (ivfTrainCtes) end to end
    "q209_x_cluster_quality" -> tuned((s, d) => {
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
    "q210_x_video_frames" -> tuned((s, d) => {
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
    "q211_u8_sar1_forecast" -> tuned((s, d) =>
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
    "q212_u56_adf_fixed" -> tuned((s, d) =>
      graft.stats.Diagnostics.adfFixedLag(
          Tables.orders(s, d)
            .groupBy(Cols.monthStart(col("o_orderdate")).as("month"))
            .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("cents")),
          Nil, "month", "cents")),

    // ---- extension: MA(1) CLS grid fit + forecast — the moving-average
    // slice of the SARIMAX grid made hash-checkable: the innovations
    // recursion is replayed per θ candidate by a recursive CTE, argmin
    // over the fixed grid, one-step memory in the forecast
    "q213_u8_ma1_forecast" -> tuned((s, d) =>
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
    "q214_x_url_canonical" -> tuned((s, d) => {
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
    "q215_x_stream_funnel" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingFunnel(s, d,
        Seq("view", "click", "purchase"))),

    // ---- extension: Mann-Kendall trend test per priority — exact
    // integer S and tie-corrected 18·Var, one fixed double z expression;
    // the nonparametric drift screen beside q09's parametric fit
    "q216_x_mann_kendall" -> tuned((s, d) =>
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
    "q217_x_table_checksum" -> tuned((s, d) =>
      graft.operators.Integrity.tableChecksum(Tables.documents(s, d),
          Seq("source"), Seq("doc_id", "text", "lang", "n_chars"))
        .orderBy("source")),

    // ---- extension: JOINT ARMA(1,1) CLS grid fit — q117 fit the AR
    // side, q213 the MA side; this fits both together with the
    // closed-form intercept (e linear in c), 361 candidates replayed by
    // ONE recursive CTE carrying (phi, theta, a, b)
    "q218_u8_arma11_forecast" -> tuned((s, d) =>
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
    "q219_x_naive_bayes" -> tuned((s, d) =>
      graft.text.QualityClassifier.naiveBayes(
          Tables.documents(s, d).withColumn("label",
            array_contains(Cols.tokens(col("text")), "vector").cast("int")),
          "doc_id", "text", "label", dim = 512)
        .orderBy("doc_id")),

    // ---- extension: per-source Average Precision — the PR-curve
    // readout beside q188's ROC AUC; score = n_chars (heavy ties, so
    // the doc_id tie-break contract is exercised), label = contains
    // 'data'. Exact integer precision@k terms end-to-end
    "q220_x_avg_precision" -> tuned((s, d) =>
      graft.operators.Metrics.averagePrecision(
          Tables.documents(s, d)
            .withColumn("label", instr(col("text"), "data") > 0),
          Seq("source"), "n_chars", "label", "doc_id")
        .orderBy("source")),

    // ---- extension: reliability diagram + ECE numerators — planted
    // PERFECTLY-CALIBRATED score (label ⇔ an independent hash draw
    // below the score), so the gap columns read near-zero by
    // construction and any systematic bias would be visible
    "q221_x_calibration" -> tuned((s, d) =>
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
    "q222_x_welch_ttest" -> tuned((s, d) =>
      graft.operators.Metrics.welchTTest(
          Tables.orders(s, d)
            .withColumn("dollars", floor(col("o_totalprice") + 0.5)),
          Seq("o_orderstatus"), "o_orderpriority", "dollars",
          "1-URGENT", "5-LOW")
        .orderBy("o_orderstatus")),

    // ---- extension: Cohen's kappa per lang — two 3-level length
    // raters, B a hash-noised version of A, so κ lands strictly inside
    // (0, 1) and the chance correction actually bites
    "q223_x_cohen_kappa" -> tuned((s, d) => {
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
    "q224_x_theil_sen" -> tuned((s, d) =>
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
    "q225_x_kaplan_meier" -> tuned((s, d) => {
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
    "q226_x_corr_pairs" -> tuned((s, d) =>
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
    "q227_x_brier_decomp" -> tuned((s, d) =>
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
    "q228_x_changepoint" -> tuned((s, d) =>
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
    "q229_x_concentration" -> tuned((s, d) =>
      graft.operators.Profile.concentration(
          Tables.lineitem(s, d), Seq("l_returnflag"), "l_suppkey")
        .orderBy("l_returnflag")),

    // ---- extension: Spearman rank correlation per return class —
    // monotone association over midranks (qty is 1..50, so the tie
    // machinery carries real weight beside q226's linear r). The
    // continuous price axis is BINNED to hundreds — the operator's
    // documented dial: the joint grid (50 × ~5k cells) is what keeps
    // the histogram-shaped plan grid-sized instead of row-sized
    "q230_x_spearman" -> tuned((s, d) =>
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
    "q231_x_ar1_backtest" -> tuned((s, d) =>
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
    "q232_x_k_anonymity" -> tuned((s, d) =>
      graft.operators.Profile.kAnonymity(
          Tables.customer(s, d).withColumn("balband",
            expr("(cast(round(c_acctbal) as bigint) + 1000) div 1000")),
          Seq("c_nationkey", "c_mktsegment"), "balband", k = 5)),

    // ---- extension: decile lift/gains table — the budget-decision
    // readout over q221's planted calibrated score: histogram deciles
    // (no global row sort; ties share a tile), two-step integer lift
    "q233_x_lift_table" -> tuned((s, d) =>
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
    "q234_x_conversion_lag" -> tuned((s, d) =>
      graft.operators.Funnel.conversionLag(
          Tables.events(s, d).withColumn("sec", expr("ts_ns div 1000000000")),
          Seq("user_id"), "sec", "event_type", Seq("view", "click", "purchase"))
        .orderBy("stage")),

    // ---- extension: isotonic calibration via the PAV minimax closed
    // form — the pooling LOOP becomes a B³ grid expression, so the
    // "iterative" fit hash-checks; output monotone by construction
    "q235_x_isotonic" -> tuned((s, d) =>
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
    "q236_x_stream_kaplan_meier" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingKaplanMeier(s, d)),

    // ---- extension: IVF centroid separation — the BETWEEN-cluster
    // half of q209's quality readout (merge-candidate detection); the
    // oracle replays the pairs off the identical Lloyd chain
    "q237_x_cluster_separation" -> tuned((s, d) => {
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
    "q238_x_langid_agreement" -> tuned((s, d) =>
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
    "q239_x_stream_lift_table" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingLiftTable(s, d)),

    // ---- extension: two-variant funnel A/B — pooled two-proportion z
    // per stage transition between hash-split variants; the experiment
    // readout asked on the funnel itself
    "q240_x_funnel_ab" -> tuned((s, d) =>
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
    "q241_x_cuped" -> tuned((s, d) => {
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
    "q242_x_dedup_eval" -> tuned((s, d) => {
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
    "q243_x_neyman_sample" -> tuned((s, d) =>
      graft.text.Corpus.neymanSample(
          Tables.documents(s, d), "source", "doc_id", "n_chars", nTotal = 100)
        .orderBy("source", "doc_id")),

    // ---- extension: Gumbel block-maxima tail fit — "the daily order
    // peak exceeded once a year" per priority: method-of-moments over
    // per-day maxima (dollars), 365-block return level; the extreme-
    // value readout beside the mean-shaped profile tier
    "q244_x_gumbel_return" -> tuned((s, d) =>
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
    "q245_x_stream_funnel_ab" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingFunnelAb(s, d,
        Seq("view", "click", "purchase"))),

    // ---- extension: exact trimmed mean per return class — tie-aware
    // rank trim on the value grid (the Olympic-scoring location
    // estimate beside q136's winsorize); whole dollars keep Σv·1e6
    // exact through sf100
    "q246_x_trimmed_mean" -> tuned((s, d) =>
      graft.operators.Sketch.trimmedMean(
          Tables.lineitem(s, d).withColumn("price_d",
            floor(col("l_extendedprice") + 0.5)),
          Seq("l_returnflag"), "price_d", trimPermille = 50)
        .orderBy("l_returnflag")),

    // ---- extension: Ljung-Box portmanteau white-noise test — q37's
    // rounded ACF fed into the Q statistic on the decided-on-rounded
    // convention; the residual diagnostic that closes the SARIMAX loop
    "q247_x_ljung_box" -> tuned((s, d) =>
      graft.stats.Diagnostics.ljungBox(
          monthlyOrders(s, d).withColumn("tot", round(col("tot"), 2)),
          Nil, "month", "tot", nlags = 6, crit5E4 = 125916L)
        .orderBy("key")),

    // ---- extension: gap-capped funnel — q147's chain with each
    // transition bounded to 24h ("purchase within a day of the
    // click"); the conservative chained-min semantics, replayed exactly
    "q248_x_windowed_funnel" -> tuned((s, d) =>
      graft.operators.Funnel.conversionCounts(
          Tables.events(s, d).withColumn("sec", expr("ts_ns div 1000000000")),
          Seq("user_id"), "sec", "event_type",
          Seq("view", "click", "purchase"), maxGap = Some(86400L))
        .orderBy("stage")),

    // ---- extension: seasonal Mann-Kendall — q216 restricted to
    // within-phase pairs (Jan vs Jan), the trend test that does not
    // read the seasonal cycle itself as noise
    "q249_x_seasonal_mk" -> tuned((s, d) =>
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
    "q250_x_centroid_drift" -> tuned((s, d) =>
      graft.sim.VectorOps.centroidDrift(
          Tables.embeddings(s, d)
            .withColumn("side", pmod(col("vec_id"), lit(2L)).cast("int")),
          Seq("label"), "side", "embedding")
        .orderBy("label")),

    // ---- extension: STREAMING centroid drift — q250's standing twin:
    // the complete-mode state IS the component-sum grid; drained ==
    // batch, one shared readout (driftFromComponentSums) and one oracle
    "q251_x_stream_centroid_drift" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingCentroidDrift(s, d)),

    // ---- extension: funnel experiment MDE — the PLANNING readout
    // beside q240's verdict: the smallest absolute rate difference the
    // current sample sizes can detect at 80% power / two-sided 5%
    // ((z_{0.975} + z_{0.8})·SE with the pooled-rate SE, literals
    // spelled identically in the oracle)
    "q252_x_funnel_mde" -> tuned((s, d) =>
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
    "q253_u56_kpss_fixed" -> tuned((s, d) =>
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
    "q254_x_rescan_funnel" -> tuned((s, d) =>
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
    "q255_x_bm25_topk" -> tuned((s, d) =>
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
    "q256_x_nmi" -> tuned((s, d) =>
      graft.operators.Metrics.normalizedMutualInfo(
          Tables.documents(s, d).withColumn("half", pmod(col("doc_id"), lit(2L))),
          Seq("half"), "lang", "source")
        .orderBy("half")),

    // ---- extension: ROUGE-N — clipped bigram overlap between
    // candidate/reference pairs (even doc vs its successor), the
    // summarization-eval readout; exact integer overlap/totals, three
    // e6-quantized divisions
    "q257_x_rouge_n" -> tuned((s, d) => {
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
    "q258_x_vocab_jsd" -> tuned((s, d) =>
      graft.text.TextAnalysis.vocabJsd(
          Tables.documents(s, d)
            .withColumn("side", when(col("lang") === "en", 0).otherwise(1)),
          "side", "text")),

    // ---- extension: MULTIPLICATIVE seasonal decomposition — the
    // ratio-to-moving-average classical method (q177 is the additive
    // twin; this one is right when seasonal amplitude scales with the
    // level): per-segment monthly revenue, mean-one seasonal indices,
    // x/(T·S) residual; e9-quantized ratios, exact integer phase means
    "q259_x_seasonal_decompose_mul" -> tuned((s, d) => {
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
    "q260_x_sessions_timesliced" -> tuned((s, d) =>
      graft.operators.Sessionize.sessionStatsTimeSliced(
          Tables.events(s, d).select("user_id", "event_id", "ts"),
          "user_id", "ts", "event_id", gapMinutes = 720, sliceMinutes = 1440)
        .orderBy("user_id", "session_idx")),

    // ---- extension: aggregate-path funnel — q147's chained-min reach
    // computed as map-side-combinable conditional minima instead of a
    // per-key window (the funnel half of the round-8 hot-key dial);
    // shares q147's oracle, rows contractually identical
    "q261_x_funnel_agg" -> tuned((s, d) =>
      graft.operators.Funnel.conversionCountsAgg(
          Tables.events(s, d).withColumn("tsu", expr("ts_ns div 1000")),
          Seq("user_id"), "tsu", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("stage")),

    // ---- extension: Fleiss' kappa — q223's chance-corrected agreement
    // generalized to many ratings per item (items = users, ratings =
    // their events, categories = event types: "are a user's events
    // type-consistent beyond chance"), variable-n form
    "q262_x_fleiss_kappa" -> tuned((s, d) =>
      graft.operators.Metrics.fleissKappa(
          Tables.events(s, d)
            .withColumn("cohort", pmod(col("user_id"), lit(2L))),
          Seq("cohort"), "user_id", "event_type")
        .orderBy("cohort")),

    // ---- extension: exact sign test — distribution-free "up more often
    // than chance" per (segment, priority) revenue series; the binomial
    // tails are exact BigInt sums, quantized with pure integer
    // arithmetic, so the recursive-CTE oracle is bit-identical
    "q263_x_sign_test" -> tuned((s, d) =>
      graft.stats.Diagnostics.signTest(
          monthlySegPrio(s, d),
          Seq("c_mktsegment", "o_orderpriority"), "month", "cents")
        .orderBy("c_mktsegment", "o_orderpriority")),

    // ---- extension: Benjamini-Hochberg step-up FDR over the q263
    // family — 25 hypotheses, integer threshold test, deterministic
    // tie-break; the guard every per-key test needs before anyone acts
    // on the smallest of 25 p-values
    "q264_x_bh_fdr" -> tuned((s, d) =>
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
    "q265_x_holt_winters" -> tuned((s, d) =>
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
    "q266_x_stream_nmi" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingNmi(s, d)),

    // ---- extension: streaming vocabulary-JSD twin — state is the
    // per-token side-count grid (vocabulary-sized); shares q258's oracle
    "q267_x_stream_vocab_jsd" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingVocabJsd(s, d)),

    // ---- extension: Mann-Whitney U z-test — the nonparametric
    // two-sample location verdict completing q222 (Welch, parametric)
    // and q195 (KS, distributional); exact integer midranks, DECIMAL
    // tie term, one fixed z tree
    "q268_x_mann_whitney" -> tuned((s, d) =>
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
    "q269_x_anova" -> tuned((s, d) =>
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
    "q270_x_kruskal_wallis" -> tuned((s, d) =>
      graft.operators.Metrics.kruskalWallis(
          Tables.orders(s, d)
            .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
            .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long")),
          Seq("c_mktsegment"), "o_orderpriority", "cents")
        .orderBy("c_mktsegment")),

    // ---- extension: Brown-Forsythe — do the priorities even share a
    // variance (the assumption q269 quietly makes); ANOVA on exact
    // absolute deviations from each group's lower median
    "q271_x_brown_forsythe" -> tuned((s, d) =>
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
    "q272_x_readability" -> tuned((s, d) =>
      graft.text.TextAnalysis.readability(
          Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // ---- extension: McNemar paired test — do the char-length and
    // token-length quality filters disagree SYMMETRICALLY per source
    // (kappa says how often they agree; this says whether the
    // disagreements lean one way)
    "q273_x_mcnemar" -> tuned((s, d) =>
      graft.operators.Metrics.mcnemar(
          Tables.documents(s, d)
            .withColumn("a", col("n_chars") > 500)
            .withColumn("b", graft.text.TextAnalysis.tokenCount(col("text")) > 90),
          Seq("source"), "a", "b")
        .orderBy("source")),

    // ---- extension: Cochran-Armitage trend — does per-user purchase
    // conversion rise monotonically across ordered user tiers; exact
    // sufficient sums, one z tree
    "q274_x_cochran_armitage" -> tuned((s, d) =>
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
    "q275_x_bootstrap_ci" -> tuned((s, d) =>
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
    "q276_u6_periodogram_fixed" -> tuned((s, d) =>
      graft.stats.Diagnostics.periodogramFixed(
          monthlyPriority(s, d), Seq("prio"), "month", "cents", n = 64)
        .orderBy("prio", "k"))
  ) ++ Map[String, (SparkSession, String) => DataFrame](

    // ---- extension: Fisher exact test — the rare-margin contingency
    // member (is the top-value tail independent of the user-hash split,
    // per event type); no UDF, no recursion: the hypergeometric support
    // is a k-grid with log-likelihood steps e15-quantized to integers,
    // exact DECIMAL cumsum, one exp per row, integer-ratio p
    "q277_x_fisher_exact" -> tuned((s, d) =>
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
    "q278_x_jarque_bera" -> tuned((s, d) =>
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
    "q279_x_log_rank" -> tuned((s, d) => {
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
    "q280_x_vocab_richness" -> tuned((s, d) =>
      graft.text.TextAnalysis.vocabRichness(
          Tables.documents(s, d), "source", "text")
        .orderBy("source")),

    // ---- extension: Cramér-von Mises — q268's two-sample question by
    // INTEGRATED squared ECDF gap (many small persistent differences,
    // where KS reads only the single largest); exact cross-multiplied
    // integer numerator, one double division
    "q281_x_cramer_von_mises" -> tuned((s, d) =>
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
    "q282_x_best_split" -> tuned((s, d) =>
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
    "q283_x_newey_west" -> tuned((s, d) =>
      graft.stats.Diagnostics.neweyWestSe(
          monthlyPriority(s, d), Seq("prio"), "month", "cents", maxLag = 4)
        .orderBy("prio")),

    // ---- extension: effect size — Cohen's d + Hedges g beside q222's
    // Welch significance (magnitude, not just p); the same six exact
    // sufficient sums, one fixed tree per readout, labeled verdict on
    // the rounded |d|
    "q284_x_effect_size" -> tuned((s, d) =>
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
    "q285_x_stream_cvm" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingCvm(s, d)),

    // ---- extension: RFM segmentation — the classic customer grid with
    // exact quantile-fence scores (no global row window: fences come off
    // value-count grids, the weightedPercentiles convention) and the
    // conventional segment labels; monetary binned to dollars for the
    // fence grid, sums stay exact cents
    "q286_x_rfm_segments" -> tuned((s, d) =>
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
    "q287_x_wilson_ci" -> tuned((s, d) =>
      graft.operators.Metrics.wilsonCi(
          Tables.events(s, d)
            .withColumn("converted", col("value") >= 95.0),
          Seq("event_type"), "converted")
        .orderBy("event_type")),

    // ---- extension: seasonal/trend strength — WHICH priorities'
    // revenue series are strongly seasonal vs trending (the Hyndman
    // feature screen over q177's decomposition); exact n*Sum(v^2) -
    // Sum(v)^2 variance forms over the already-quantized components
    "q288_x_seasonal_strength" -> tuned((s, d) =>
      graft.operators.Features.seasonalStrength(
          monthlyPriority(s, d), Seq("prio"), "month", "cents", period = 12)
        .orderBy("prio")),

    // ---- extension: median CI — distribution-free order-statistic
    // bounds per return flag (the robust companion of q275's bootstrap
    // mean CI at none of its replicate cost); exact cumulative-count
    // fences on whole-dollar prices
    "q289_x_median_ci" -> tuned((s, d) =>
      graft.operators.Sketch.medianCi(
          Tables.lineitem(s, d).withColumn("price_d",
            floor(col("l_extendedprice") + 0.5)),
          Seq("l_returnflag"), "price_d")
        .orderBy("l_returnflag")),

    // ---- extension: streaming decision stump — q282's standing twin:
    // complete-mode state IS the (source, feature, value) class-count
    // grid, readout via the SHARED bestSplitFromGrid, drained == batch
    "q290_x_stream_best_split" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingBestSplit(s, d)),

    // ---- extension: differential vocabulary — Monroe log-odds z-scores
    // of what distinguishes English from non-English text (per-TERM
    // where q258's JSD is one scalar); deterministic quantized top-k via
    // TakeOrdered, never a global sort
    "q291_x_log_odds_terms" -> tuned((s, d) =>
      graft.text.TextAnalysis.logOddsTerms(
          Tables.documents(s, d)
            .withColumn("side", when(col("lang") === "en", 0).otherwise(1)),
          "side", "text", topK = 25)
        .orderBy("direction", "rank")),

    // ---- extension: Wald SPRT — the peeking-safe sequential A/B verdict
    // per event type ("is the high-value rate 0.5 or 0.55, stop when the
    // evidence says"); e12-inlined log constants (no query-time
    // transcendentals), exact DECIMAL LLR walk, integer first-crossing
    "q292_x_sprt" -> tuned((s, d) =>
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
    "q293_x_stream_sprt" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingSprt(s, d,
        p0 = 0.5, p1 = 0.55, alphaPermille = 50, betaPermille = 100)),

    // ---- extension: index of dispersion — are per-user event counts
    // Poisson or bursty, per event type (decides whether rate CIs can
    // use the Poisson shortcut); exact integer n*Sq - S^2 numerator,
    // chi2 verdict on the rounded value
    "q294_x_dispersion" -> tuned((s, d) =>
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
    "q295_x_cochran_q" -> tuned((s, d) =>
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
    "q296_x_runs_test" -> tuned((s, d) =>
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
    "q297_x_chi_square" -> tuned((s, d) =>
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
    "q298_x_stream_chi_square" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingChiSquare(s, d)),

    // ---- extension: Durbin-Watson — after detrending monthly mean
    // order prices, do consecutive residuals still lean on each other
    // (lag-1 serial correlation of FITTED residuals — the axis q247
    // Ljung-Box reads on the raw series); exact scaled-integer
    // residuals, the n*D denominator cancels in the ratio
    "q299_x_durbin_watson" -> tuned((s, d) =>
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
    "q300_x_kendall_tau" -> tuned((s, d) =>
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
    "q301_x_hist_drift" -> tuned((s, d) =>
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
    "q302_x_stream_hist_drift" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingHistDrift(s, d)),

    // ---- extension: ranking eval — nDCG@10 + MRR@10 of a length-score
    // ranking against graded language relevance, per source (closes the
    // retrieval loop: q255 ranks, this scores the ranking); inlined
    // e12 discount table, exact integer DCG/IDCG sums, thinned
    // candidate lists (doc_id % 37) per the bounded-list contract
    "q303_x_ndcg_mrr" -> tuned((s, d) =>
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
    "q304_x_krippendorff" -> tuned((s, d) =>
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
    "q305_x_pettitt" -> tuned((s, d) =>
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
    "q306_x_granger" -> tuned((s, d) =>
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
    "q307_x_cross_correlation" -> tuned((s, d) =>
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
    "q308_x_mood_median" -> tuned((s, d) =>
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
    "q309_x_partial_corr" -> tuned((s, d) =>
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
    "q310_x_engle_granger" -> tuned((s, d) =>
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
    "q311_x_cronbach" -> tuned((s, d) =>
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
    "q312_x_eb_shrinkage" -> tuned((s, d) =>
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
    "q313_x_pairwise_welch" -> tuned((s, d) =>
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
    "q314_x_friedman" -> tuned((s, d) =>
      graft.operators.Metrics.friedmanTest(
          monthlySegPrio(s, d),
          Seq("c_mktsegment"), "month", "o_orderpriority", "cents")
        .orderBy("c_mktsegment")),

    // ---- extension: Bland-Altman — do byte length and 6x token count
    // AGREE as document-size measurements per source (bias + limits of
    // agreement + share inside: the method-comparison readout a 0.99
    // correlation can't give); exact difference sums, two-pass within
    // count against the raw double limits
    "q315_x_bland_altman" -> tuned((s, d) =>
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
    "q316_x_confusion_mcc" -> tuned((s, d) =>
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
    "q317_x_page_hinkley" -> tuned((s, d) =>
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
    "q318_x_stream_page_hinkley" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingPageHinkley(s, d)),

    // ---- extension: top-k stability — is the per-type user
    // leaderboard churning between the month's halves (Jaccard of the
    // top-10 sets + mean rank displacement: the WHO-is-on-top monitor
    // PSI/KS distribution drift can't see); exact integer totals,
    // deterministic tie-break, pure integer readouts
    "q319_x_topk_stability" -> tuned((s, d) =>
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
    "q320_x_ordinal_assoc" -> tuned((s, d) =>
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
    "q321_x_vocab_growth" -> tuned((s, d) =>
      graft.text.Corpus.vocabGrowth(
          Tables.documents(s, d), Seq("source"), "doc_id", "text",
          buckets = 16)
        .orderBy("source", "bucket")),

    // ---- extension: split-leakage audit — how many MinHash near-dup
    // pairs STRADDLE the train/val/test hash split (the eval-inflating
    // contamination a random split of a duplicated corpus guarantees;
    // q156 splits, q46 finds pairs — this closes the loop); exact
    // match-count means, banded join only
    "q322_x_split_leakage" -> tuned((s, d) =>
      graft.text.Dedup.splitLeakage(
          Tables.documents(s, d), "doc_id", "text",
          k = MinhashK, bands = MinhashBands)
        .orderBy("split_a", "split_b")),

    // ---- extension: embedding health audit — wrong-dim vectors, dead
    // near-zero rows, and the norm distribution per label (a bimodal
    // norm profile = two models mixed, the failure no centroid readout
    // shows); e3-quantized per-row norms, exact grid fences
    "q323_x_embedding_health" -> tuned((s, d) =>
      graft.sim.VectorOps.embeddingHealth(
          Tables.embeddings(s, d), Seq("label"), "embedding", dim = 64)
        .orderBy("label")),

    // ---- extension: ANN recall audit — q52's SRP-LSH index scored
    // against q49's brute-force ground truth on a probe set (the recall
    // number an ANN deployment must measure before trusting neighbors);
    // both sides share the ONE rounded-before-rank contract, recall is
    // a pure integer div
    "q324_x_ann_recall" -> tuned((s, d) => {
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
    "q325_x_vocab_coverage" -> tuned((s, d) =>
      graft.text.Corpus.vocabCoverage(
          Tables.documents(s, d), Seq("source"), "text",
          refFilter = col("lang") === "en", topN = 500)
        .orderBy("source")),

    // ---- extension: Hill tail index — how heavy is the document-length
    // upper tail per source (alpha <= 2 = infinite variance: mean-based
    // length monitoring is meaningless — the tail fact Zipf's token
    // slope and Gumbel's max-domain fit don't give); deterministic
    // order statistics, per-row e9 log-ratios, one division
    "q326_x_hill_tail" -> tuned((s, d) =>
      graft.operators.Sketch.hillTailIndex(
          Tables.documents(s, d), Seq("source"), "n_chars", "doc_id",
          k = 50)
        .orderBy("source")),

    // ---- extension: streaming vocab-coverage twin — q325's standing
    // tokenizer-readiness monitor: complete-mode state IS the
    // (source, token) count grid, the reference top-N re-derives from
    // the live grid each drain via the SHARED coverageFromGrid;
    // drained == batch, one oracle
    "q327_x_stream_vocab_coverage" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingVocabCoverage(s, d)),

    // ---- extension: quantile treatment effect — WHERE in the value
    // distribution does the A/B difference act, per event type (a mean
    // shift hides tail-only effects; q222 scores the mean, q301 the
    // whole curve — QTE reads the p10/p50/p90 fences); exact integer
    // order statistics, integer differences
    "q328_x_qte" -> tuned((s, d) =>
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
    "q329_x_dup_spectrum" -> tuned((s, d) =>
      graft.text.Dedup.dupClusterSpectrum(
          Tables.documents(s, d), "doc_id", "text",
          k = MinhashK, bands = MinhashBands, minEst = 0.5)
        .orderBy("cluster_size")),

    // ---- extension: Markov entropy rate — how predictable are user
    // event sequences per cohort (rate -> 0 = users on rails, -> ln K
    // = chaos; compresses q171's whole transition matrix into the one
    // scalar a bot-vs-organic screen wants); e9 conditional-entropy
    // terms, exact integer rate
    "q330_x_entropy_rate" -> tuned((s, d) =>
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
    "q331_x_tost_equivalence" -> tuned((s, d) =>
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
    "q332_x_ratio_metric_ab" -> tuned((s, d) =>
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
    "q333_x_stream_topk_stability" -> tuned((s, d) =>
      graft.streaming.StreamingCollapse.streamingTopkStability(s, d)),

    // ---- extension: survival summary — median retention + RMST(30d)
    // per cohort off q225's KM curve (the censoring-honest "average
    // days retained" the naive mean understates, and a median that
    // admits non-existence); exact step-integral of width*S_e9
    // products, exact median fence
    "q334_x_survival_summary" -> tuned((s, d) => {
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
    "q335_x_bpe_merge_slice" -> tuned((s, d) =>
      graft.text.Bpe.mergeSliceDf(
        Tables.documents(s, d), "text", k = 3)),

    // ---- extension: SARX(1) — AR(1) WITH one exog regressor (monthly
    // order count), hash-checked: closed-form 3x3 Cramer CLS + the
    // hold-last-exog forecast recursion, extending the q117/q211/q213/
    // q218/q35 square one axis closer to q39/q69's full Kalman surface
    "q336_u8_sarx1_forecast" -> tuned((s, d) =>
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
        .orderBy("key", "step"))
  )

  /** q286's oracle: the identical fence grids + score cases in DuckDB
    * (buckets fixed at 5, monetary bin 100 — the shipped settings). */
  private def rfmSql: String = {
    val b = 5
    def fenceCte(dim: String): String = {
      val fences = (1 until b).map(i =>
        s"min(CASE WHEN cum * $b >= $i * n THEN v END) AS ${dim}_t$i")
        .mkString(", ")
      s"""f_$dim AS (SELECT $fences FROM (
         |  SELECT v, CAST(sum(c) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum,
         |    CAST(sum(c) OVER () AS BIGINT) AS n
         |  FROM (SELECT $dim AS v, CAST(count(*) AS BIGINT) AS c
         |        FROM dims GROUP BY 1)))""".stripMargin
    }
    def scoreAsc(dim: String): String =
      (1 until b).map(i =>
        s"(CASE WHEN $dim > ${dim}_t$i THEN 1 ELSE 0 END)").mkString(" + ") +
        " + 1"
    s"""WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      |  FROM events
      |  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL),
      |pu AS (SELECT user_id, max(us) AS lastu, CAST(count(*) AS BIGINT) AS f,
      |         CAST(sum(v) AS BIGINT) AS m
      |       FROM e GROUP BY 1),
      |g AS (SELECT max(lastu) AS gmax FROM pu),
      |dims AS (SELECT user_id, (gmax - lastu) // 86400000000 AS r, f, m,
      |           m // 100 AS mb
      |         FROM pu CROSS JOIN g),
      |${fenceCte("r")},
      |${fenceCte("f")},
      |${fenceCte("mb")},
      |sc AS (SELECT $b + 1 - (${scoreAsc("r")}) AS rs,
      |         ${scoreAsc("f")} AS fs,
      |         ${scoreAsc("mb")} AS ms, m
      |       FROM dims CROSS JOIN f_r CROSS JOIN f_f CROSS JOIN f_mb)
      |SELECT CAST(rs AS INT) AS r_score, CAST(fs AS INT) AS f_score,
      |  CAST(ms AS INT) AS m_score,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(m) AS BIGINT) AS monetary_sum,
      |  CASE
      |    WHEN rs >= ${b - 1} AND fs >= ${b - 1}
      |      AND ms >= ${b - 1} THEN 'champion'
      |    WHEN fs >= ${b - 1} THEN 'loyal'
      |    WHEN ms >= ${b - 1} THEN 'big_spender'
      |    WHEN rs <= 2 AND fs >= 3 THEN 'at_risk'
      |    WHEN rs <= 2 THEN 'churned'
      |    ELSE 'other' END AS segment
      |FROM sc GROUP BY rs, fs, ms
      |ORDER BY r_score, f_score, m_score""".stripMargin
  }

  /** q283's oracle: the identical shifted lag-cross-sum trees in DuckDB
    * (maxLag fixed at 4 — the shipped query's setting). */
  private def neweyWestSql: String = {
    val maxLag = 4
    val mu = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
    val g0 = s"((CAST(g0 AS DOUBLE) - $mu * CAST(s1 AS DOUBLE)) / CAST(n AS DOUBLE))"
    val gl = (1 to maxLag).map { l =>
      s"((CAST(sl$l AS DOUBLE) - $mu * (CAST(a$l AS DOUBLE) + CAST(b$l AS DOUBLE)) + CAST(n - $l AS DOUBLE) * $mu * $mu) / CAST(n AS DOUBLE))"
    }
    val lrv = (Seq(g0) ++ gl.zipWithIndex.map { case (g, i) =>
      val l = i + 1
      s"2.0 * (1.0 - ${l}.0 / ${maxLag + 1}.0) * $g"
    }).mkString("(", " + ", ")")
    val lagCols = (1 to maxLag).map(l =>
      s"lag(d, $l) OVER (PARTITION BY prio ORDER BY month) AS d$l").mkString(", ")
    val lagSums = (1 to maxLag).map(l =>
      s"""sum(CAST(d AS HUGEINT) * d$l) AS sl$l,
         |  sum(CASE WHEN d$l IS NOT NULL THEN CAST(d AS HUGEINT)
         |      ELSE CAST(0 AS HUGEINT) END) AS a$l,
         |  sum(coalesce(CAST(d$l AS HUGEINT), CAST(0 AS HUGEINT))) AS b$l"""
        .stripMargin.replaceAll("\n", " ")).mkString(",\n        |  ")
    s"""WITH m AS (SELECT o_orderpriority AS prio,
      |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1, 2),
      |mn AS (SELECT prio, CAST(count(*) AS BIGINT) AS nn,
      |         CAST(sum(cents) AS BIGINT) AS sy,
      |         CAST(sum(cents) AS BIGINT) // CAST(count(*) AS BIGINT) AS c
      |       FROM m GROUP BY 1),
      |d0 AS (SELECT m.prio, m.month, m.cents - mn.c AS d, mn.sy
      |       FROM m JOIN mn ON m.prio = mn.prio),
      |lg AS (SELECT *, $lagCols FROM d0),
      |su AS (SELECT prio, CAST(count(*) AS BIGINT) AS n, max(sy) AS sy,
      |  sum(CAST(d AS HUGEINT)) AS s1,
      |  sum(CAST(d AS HUGEINT) * d) AS g0,
      |  $lagSums
      |  FROM lg GROUP BY 1)
      |SELECT prio, n,
      |  CAST(CAST(sy AS HUGEINT) * 1000000 // n AS BIGINT) AS mean_e6,
      |  CASE WHEN n > $maxLag AND $g0 > 0 THEN
      |    CAST(floor(sqrt($g0 / CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
      |  END AS se_iid_e6,
      |  CASE WHEN n > $maxLag AND $g0 > 0 AND $lrv > 0 THEN
      |    CAST(floor(sqrt($lrv / CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
      |  END AS se_hac_e6,
      |  CASE WHEN n > $maxLag AND $g0 > 0 AND $lrv > 0 THEN
      |    CAST(floor(sqrt($lrv / $g0) * 10000 + 0.5) AS BIGINT)
      |  END AS inflation_e4
      |FROM su ORDER BY prio""".stripMargin
  }

  /** q278's oracle: the identical shifted-moment trees in DuckDB. */
  private def jarqueBeraSql: String = {
    val mu = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
    val m2 = s"(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - $mu * $mu)"
    val m3 = s"(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) - 3.0 * $mu * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) + 2.0 * $mu * $mu * $mu)"
    val m4 = s"(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) - 4.0 * $mu * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)) + 6.0 * $mu * $mu * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) - 3.0 * $mu * $mu * $mu * $mu)"
    val sk = s"($m3 / power($m2, 1.5))"
    val ku = s"($m4 / ($m2 * $m2))"
    s"""WITH e AS (
      |  SELECT c_mktsegment AS k,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_totalprice IS NOT NULL AND c_mktsegment IS NOT NULL),
      |mn AS (SELECT k, CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS c
      |       FROM e GROUP BY 1),
      |su AS (SELECT e.k, CAST(count(*) AS BIGINT) AS n,
      |         sum(CAST(e.x - mn.c AS HUGEINT)) AS s1,
      |         sum(CAST(e.x - mn.c AS HUGEINT) * (e.x - mn.c)) AS s2,
      |         sum(CAST(e.x - mn.c AS HUGEINT) * (e.x - mn.c) * (e.x - mn.c))
      |           AS s3,
      |         sum(CAST(e.x - mn.c AS HUGEINT) * (e.x - mn.c) * (e.x - mn.c)
      |             * (e.x - mn.c)) AS s4
      |       FROM e JOIN mn ON e.k = mn.k GROUP BY 1)
      |SELECT k AS c_mktsegment, n,
      |  CASE WHEN n >= 4 AND $m2 > 0 THEN
      |    CAST(floor($sk * 1000000 + 0.5) AS BIGINT) END AS skew_e6,
      |  CASE WHEN n >= 4 AND $m2 > 0 THEN
      |    CAST(floor($ku * 1000000 + 0.5) AS BIGINT) END AS kurt_e6,
      |  CASE WHEN n >= 4 AND $m2 > 0 THEN
      |    CAST(floor(CAST(n AS DOUBLE) / 6.0
      |      * ($sk * $sk + ($ku - 3.0) * ($ku - 3.0) / 4.0)
      |      * 10000 + 0.5) AS BIGINT) END AS jb_e4,
      |  CASE WHEN n >= 4 AND $m2 > 0 THEN
      |    CAST(floor(CAST(n AS DOUBLE) / 6.0
      |      * ($sk * $sk + ($ku - 3.0) * ($ku - 3.0) / 4.0)
      |      * 10000 + 0.5) AS BIGINT) > 59915 END AS significant
      |FROM su ORDER BY c_mktsegment""".stripMargin
  }

  /** Monthly revenue cents per order priority — the 5-series grid shared
    * by q177 (additive decomposition) and q276 (fixed periodogram). */
  private def monthlyPriority(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("prio"),
        Cols.monthStart(col("o_orderdate")).as("month"))
      .agg(sum(expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")).as("cents"))

  /** Monthly revenue cents per (market segment, order priority) — the
    * 25-series hypothesis family shared by q263/q264. */
  private def monthlySegPrio(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"),
        Cols.monthStart(col("o_orderdate")).as("month"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).cast("long").as("cents"))

  /** Deterministic 2-token-per-line derivation shared by q80/q81 and
    * their oracles: the testdata documents are single-line word streams,
    * so line-grain operators need a reproducible multi-line view. Chunk
    * the whitespace tokens two per line ('\n'-joined); the DuckDB oracle
    * builds the identical string with list_transform/range. Tokens are
    * ASCII (no spaces), so chunk text and char counts agree bit-for-bit
    * across engines. */
  private[graft] def linedText(text: Column): Column = udf(linedKernel).apply(text)

  /** Single-pass JVM form of [[linedTextExpr]] (parity: LinedTextSpec).
    * The expression form runs `transform`+`slice` interpreted per row —
    * the documented HOF trap — and dominated q80/q81/q84's per-doc cost. */
  private[graft] val linedKernel: String => String = { t =>
    if (t == null) null
    else {
      val trimmed = graft.text.TextHash.sparkTrim(t)
      if (trimmed.isEmpty) ""
      else {
        val toks = trimmed.split("\\s+", -1)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < toks.length) {
          if (i > 0) sb.append(if (i % 2 == 0) '\n' else ' ')
          sb.append(toks(i))
          i += 1
        }
        sb.toString
      }
    }
  }

  /** Expression-tree form of [[linedText]] — parity-spec reference only.
    * The isNull guard is load-bearing: without it, non-ANSI size(null) =
    * -1 walks into sequence(0, -1) — a DESCENDING sequence — and null
    * text yields "\n" instead of null. */
  private[graft] def linedTextExpr(text: Column): Column = {
    val toks = Cols.tokens(text)
    val nChunks = ceil(size(toks) / lit(2.0)).cast("int")
    when(text.isNull, lit(null).cast("string"))
      .when(length(trim(text)) === 0, lit(""))
      .otherwise(array_join(
        transform(sequence(lit(0), nChunks - 1),
          i => concat_ws(" ", slice(toks, i * 2 + 1, lit(2)))),
        "\n"))
  }

  /** [[linedText]] plus deterministic terminal-punctuation planting for
    * q103: line i of doc d ends with '.' when (d+i)%3==0, '!' when
    * (d+i)%3==2, and nothing otherwise. The DuckDB oracle replays the
    * same CASE over the same chunk derivation. Single-pass kernel
    * (parity: LinedTextSpec vs [[linedPunctTextExpr]]). */
  private[graft] def linedPunctText(text: Column, id: Column): Column =
    udf(linedPunctKernel).apply(text, id)

  private[graft] val linedPunctKernel: (String, java.lang.Long) => String = { (t, id) =>
    if (t == null || id == null) null
    else {
      val trimmed = graft.text.TextHash.sparkTrim(t)
      if (trimmed.isEmpty) ""
      else {
        val toks = trimmed.split("\\s+", -1)
        val sb = new java.lang.StringBuilder
        var i = 0
        var line = 0L
        while (i < toks.length) {
          if (i > 0 && i % 2 == 0) {
            appendPunct(sb, id + line); line += 1; sb.append('\n')
          } else if (i > 0) sb.append(' ')
          sb.append(toks(i))
          i += 1
        }
        appendPunct(sb, id + line)
        sb.toString
      }
    }
  }

  private def appendPunct(sb: java.lang.StringBuilder, k: Long): Unit =
    (k % 3) match {
      case 0 => sb.append('.')
      case 2 => sb.append('!')
      case _ => ()
    }

  /** Expression-tree form of [[linedPunctText]] — parity-spec reference
    * only (same null/empty guards as [[linedTextExpr]]). */
  private[graft] def linedPunctTextExpr(text: Column, id: Column): Column = {
    val toks = Cols.tokens(text)
    val nChunks = ceil(size(toks) / lit(2.0)).cast("int")
    when(text.isNull || id.isNull, lit(null).cast("string"))
      .when(length(trim(text)) === 0, lit(""))
      .otherwise(array_join(
        transform(sequence(lit(0), nChunks - 1), i =>
          concat(concat_ws(" ", slice(toks, i * 2 + 1, lit(2))),
            when((id + i) % 3 === 0, lit("."))
              .when((id + i) % 3 === 2, lit("!"))
              .otherwise(lit("")))),
        "\n"))
  }

  private val MinhashK = 8
  private val MinhashBands = 4
  private val SimhashBits = 16

  // ------------------------------------------------------------ oracle SQL

  /** Portable 32-bit hash in DuckDB SQL (mirrors [[Cols.hash32]]). */
  private def dkHash32(x: String): String =
    s"CAST('0x' || substring(md5($x), 1, 8) AS BIGINT)"

  // the single source of the (a, b) affine family — a private copy here
  // could silently desynchronize the oracle from the engine
  private def minhashAB(i: Int): (Long, Long) = graft.text.TextHash.minhashAB(i)

  /** Shared doc→signature CTE prefix for the minhash oracles. */
  private val MinhashCte: String = {
    val sigExprs = (0 until MinhashK).map { i =>
      val (a, b) = minhashAB(i)
      s"coalesce(list_min(list_transform(hs, h -> (h * $a + $b) % 4294967311)), fb) AS mh$i"
    }.mkString(",\n    ")
    s"""WITH t AS (
       |  SELECT doc_id, trim(text) AS tt,
       |         regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, tt,
       |         CASE WHEN len(toks) >= 3
       |              THEN list_transform(generate_series(1, len(toks) - 2),
       |                     i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
       |              ELSE CAST([] AS VARCHAR[]) END AS sh
       |  FROM t),
       |h AS (
       |  SELECT doc_id,
       |         list_transform(sh, x -> ${dkHash32("x")}) AS hs,
       |         ${dkHash32("tt")} AS fb
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |    $sigExprs
       |  FROM h)""".stripMargin
  }

  private val CosSimSql: String = {
    def dot(l: String, r: String) =
      s"list_sum(list_transform(generate_series(1, 64), i -> CAST($l.embedding[i] AS DOUBLE) * CAST($r.embedding[i] AS DOUBLE)))"
    s"round(${dot("q", "c")} / nullif(sqrt(${dot("q", "q")}) * sqrt(${dot("c", "c")}), 0), 4)"
  }

  /** Shared doc→simhash-signature CTE (`s(doc_id, sig)`), width-param. */
  private def simhashSigCte(nBits: Int): String = {
    val bits = (0 until nBits).map { i =>
      s"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_transform(regexp_split_to_array(trim(text), '\\s+'),
       |                        x -> ${dkHash32("x")}) AS hs
       |  FROM documents),
       |s AS (SELECT doc_id, CAST($bits AS BIGINT) AS sig FROM t)""".stripMargin
  }

  private val SimhashSql: String =
    s"${simhashSigCte(SimhashBits)}\nSELECT doc_id, sig AS simhash FROM s ORDER BY doc_id"

  /** q59: banded simhash candidates at the at-scale signature width
    * (32-bit, 8-bit bands → sparse buckets). maxHamming (1) ≤ bands-1
    * (3), so the banded join has FULL recall and the all-pairs Hamming
    * filter is an exact oracle of the algorithm's output. */
  private val SimhashPairsSql: String =
    s"""${simhashSigCte(32)}
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
       |FROM s a JOIN s b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 1
       |ORDER BY id_a, id_b""".stripMargin

  /** q60: SRP-bucketed embedding near-dup pairs. The hyperplane sign
    * matrices are generated from the SAME [[Similarity.srpSigns]] the
    * engine uses and inlined as list literals, so DuckDB replicates the
    * bucketing bit-exactly (±1·float products summed in identical order)
    * — the oracle checks the bucketed algorithm itself, not a recall
    * approximation of it. */
  /** SRP bucket key as DuckDB SQL: the engine's own hyperplane sign
    * matrix ([[graft.sim.Similarity.srpSigns]]) inlined as list literals,
    * ±1·float products summed in identical index order — bit-exact replay
    * of `Similarity.srpKey`. Shared by the q60 and q52 oracles. */
  private def srpKeySqlExpr(t: Int, nBits: Int, dim: Int): String = {
    val signs = graft.sim.Similarity.srpSigns(t, nBits, dim)
    (0 until nBits).map { b =>
      val lst = signs(b).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"(CASE WHEN list_sum(list_transform(generate_series(1,$dim), i -> CAST(embedding[i] AS DOUBLE) * ($lst)[i])) >= 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
  }

  private def nearDupBucketedSql(nBits: Int, nTables: Int, dim: Int,
                                 threshold: Double): String = {
    val tables = (0 until nTables)
      .map(t => s"SELECT vec_id AS id, embedding, $t AS t, ${srpKeySqlExpr(t, nBits, dim)} AS key FROM embeddings")
      .mkString("\n  UNION ALL\n  ")
    def dot(l: String, r: String) =
      s"list_sum(list_transform(generate_series(1, $dim), i -> CAST($l[i] AS DOUBLE) * CAST($r[i] AS DOUBLE)))"
    val cos = s"round(${dot("e_a", "e_b")} / nullif(sqrt(${dot("e_a", "e_a")}) * sqrt(${dot("e_b", "e_b")}), 0), 4)"
    s"""WITH k AS (
       |  $tables),
       |c AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM k a JOIN k b ON a.t = b.t AND a.key = b.key AND a.id < b.id),
       |j AS (
       |  SELECT c.id_a, c.id_b, ea.embedding AS e_a, eb.embedding AS e_b
       |  FROM c JOIN embeddings ea ON ea.vec_id = c.id_a
       |         JOIN embeddings eb ON eb.vec_id = c.id_b)
       |SELECT id_a, id_b, $cos AS cos_sim FROM j
       |WHERE $cos >= $threshold ORDER BY id_a, id_b""".stripMargin
  }

  /** q123: the integer-exact PageRank iteration UNROLLED (standard SQL
    * recursive CTEs disallow aggregates over the recursive reference, so
    * a fixed iteration count expands to chained CTEs — identical
    * arithmetic to [[graft.operators.Graph.pageRank]]: d = 17/20 and the
    * 1e12 grid through `//` floor division, long sums order-exact). */
  private def pageRankSql(iters: Int): String = {
    val S = "1000000000000"
    val head = s"""WITH e AS (
      |  SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
      |                  'p' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |nn AS (SELECT count(*) AS n FROM nodes),
      |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
      |r0 AS (SELECT node, CAST($S AS BIGINT) // n AS r FROM nodes, nn)""".stripMargin
    val its = (1 to iters).map { i =>
      val p = s"r${i - 1}"
      // CAST the sums: DuckDB sum(BIGINT) widens to HUGEINT, which
      // pandas reads as float64 — the q110 dtype-drift lesson
      s"""d$i AS (SELECT CAST(COALESCE(sum(r), 0) AS BIGINT) AS dm
        |       FROM $p LEFT JOIN deg ON $p.node = deg.src WHERE deg.src IS NULL),
        |c$i AS (SELECT e.dst AS node, CAST(sum((17 * r) // (20 * deg)) AS BIGINT) AS m
        |        FROM e JOIN deg ON e.src = deg.src JOIN $p ON e.src = $p.node
        |        GROUP BY 1),
        |r$i AS (SELECT nodes.node,
        |          CAST((3 * $S) // (20 * nn.n) + (17 * d$i.dm) // (20 * nn.n)
        |            + COALESCE(c$i.m, 0) AS BIGINT) AS r
        |        FROM nodes CROSS JOIN nn CROSS JOIN d$i
        |        LEFT JOIN c$i ON nodes.node = c$i.node)""".stripMargin
    }.mkString(",\n")
    s"""$head,
      |$its
      |SELECT node, r AS rank_scaled, CAST(r AS DOUBLE) / $S.0 AS pagerank
      |FROM r$iters ORDER BY node""".stripMargin
  }

  /** q119: SRP-bucketed CROSS-corpus near-dup — the same hyperplane
    * replay, with the corpus/held-out split (vec_id % 5) applied before
    * bucketing on both sides. */
  private def crossNearDupBucketedSql(nBits: Int, nTables: Int, dim: Int,
                                      threshold: Double): String = {
    def keys(src: String) = (0 until nTables)
      .map(t => s"SELECT id, embedding, $t AS t, ${srpKeySqlExpr(t, nBits, dim)} AS key FROM $src")
      .mkString("\n  UNION ALL\n  ")
    def dot(l: String, r: String) =
      s"list_sum(list_transform(generate_series(1, $dim), i -> CAST($l[i] AS DOUBLE) * CAST($r[i] AS DOUBLE)))"
    val cos = s"round(${dot("e_a", "e_b")} / nullif(sqrt(${dot("e_a", "e_a")}) * sqrt(${dot("e_b", "e_b")}), 0), 4)"
    s"""WITH c AS (SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id % 5 != 0),
       |h AS (SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id % 5 = 0),
       |kc AS (
       |  ${keys("c")}),
       |kh AS (
       |  ${keys("h")}),
       |p AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM kc a JOIN kh b ON a.t = b.t AND a.key = b.key),
       |j AS (
       |  SELECT p.id_a, p.id_b, ca.embedding AS e_a, hb.embedding AS e_b
       |  FROM p JOIN c ca ON ca.id = p.id_a JOIN h hb ON hb.id = p.id_b)
       |SELECT id_a, id_b, $cos AS cos_sim FROM j
       |WHERE $cos >= $threshold ORDER BY id_a, id_b""".stripMargin
  }

  /** q52: SRP-LSH ANN top-k. Same hyperplane replay as [[nearDupBucketedSql]]
    * but with lshTopK's semantics: DIRECTED candidate pairs (every id is a
    * query), union of `nTables` bucket tables, exact-cosine re-rank to k.
    * The approximate path is fully deterministic, so it oracle-checks
    * end-to-end — the bucketing IS the algorithm, not noise around it. */
  private def lshTopKSql(nBits: Int, nTables: Int, dim: Int, k: Int,
                         maxId: Long): String = {
    val tables = (0 until nTables)
      .map(t => s"SELECT id, embedding, $t AS t, ${srpKeySqlExpr(t, nBits, dim)} AS key FROM v")
      .mkString("\n  UNION ALL\n  ")
    def dot(l: String, r: String) =
      s"list_sum(list_transform(generate_series(1, $dim), i -> CAST($l[i] AS DOUBLE) * CAST($r[i] AS DOUBLE)))"
    val cos = s"round(${dot("e_a", "e_b")} / nullif(sqrt(${dot("e_a", "e_a")}) * sqrt(${dot("e_b", "e_b")}), 0), 4)"
    s"""WITH v AS (SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id < $maxId),
       |k AS (
       |  $tables),
       |c AS (
       |  SELECT DISTINCT a.id AS query_id, b.id AS neighbor_id
       |  FROM k a JOIN k b ON a.t = b.t AND a.key = b.key AND a.id <> b.id),
       |j AS (
       |  SELECT c.query_id, c.neighbor_id, ea.embedding AS e_a, eb.embedding AS e_b
       |  FROM c JOIN v ea ON ea.id = c.query_id
       |         JOIN v eb ON eb.id = c.neighbor_id),
       |s AS (SELECT query_id, neighbor_id, $cos AS cos_sim FROM j),
       |r AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM s)
       |SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** q198/q199: PSI drift replay — the same fixed-bin grid, Laplace
    * smoothing from exact integer counts, and per-bin e9 term
    * quantization as [[graft.operators.Metrics.psiFromCounts]]; the
    * float tree is structured identically on both engines so the
    * quantized terms agree bit-for-bit. */
  private def psiDriftSql(src: String, groupCol: String, valueCol: String,
                          where: String, binWidth: Long, nBins: Int,
                          outName: String): String = {
    val B = nBins
    s"""WITH b AS (SELECT $groupCol AS g,
      |    greatest(0, least(CAST(floor($valueCol) AS BIGINT) // $binWidth,
      |      ${B - 1})) AS bin
      |  FROM $src WHERE $where),
      |cs AS (SELECT g, bin, count(*) AS c FROM b GROUP BY 1, 2),
      |cb AS (SELECT bin, CAST(sum(c) AS BIGINT) AS cbin FROM cs GROUP BY 1),
      |sz AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM cs GROUP BY 1),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cs),
      |bins AS (SELECT unnest(generate_series(0, ${B - 1})) AS bin),
      |grid AS (SELECT sz.g, sz.n, bins.bin, COALESCE(cb.cbin, 0) AS cbin
      |         FROM bins LEFT JOIN cb USING (bin) CROSS JOIN sz),
      |t AS (SELECT grid.g, grid.n, tot.total,
      |    CAST(floor((
      |        (COALESCE(cs.c, 0) + 1) / CAST(grid.n + $B AS DOUBLE)
      |      - (grid.cbin - COALESCE(cs.c, 0) + 1)
      |        / CAST(tot.total - grid.n + $B AS DOUBLE))
      |      * ln(((COALESCE(cs.c, 0) + 1) / CAST(grid.n + $B AS DOUBLE))
      |         / ((grid.cbin - COALESCE(cs.c, 0) + 1)
      |            / CAST(tot.total - grid.n + $B AS DOUBLE)))
      |      * 1e9 + 0.5) AS BIGINT) AS term
      |  FROM grid LEFT JOIN cs ON cs.g = grid.g AND cs.bin = grid.bin
      |  CROSS JOIN tot)
      |SELECT g AS $outName, n, total - n AS n_rest,
      |  CAST(sum(term) AS BIGINT) AS psi_e9
      |FROM t GROUP BY g, n, total ORDER BY $outName""".stripMargin
  }

  /** q58: the FULL IVF pipeline — seed-free Lloyd training + probe +
    * re-rank — replayed in SQL, so the oracle is SF-independent (no
    * baked-in centroid literals). Training is deterministic on both
    * sides: initial centroids are the k lowest-id vectors (index = id
    * rank), assignment argmin breaks ties to the lower centroid index,
    * and each update rounds the per-dim double mean to FLOAT — the cast
    * absorbs the ~1e-15 summation-order drift between engines (float
    * grid spacing ~6e-8), which is what makes the iterated averages
    * cross-engine exact in practice. Empty clusters keep their previous
    * centroid via the COALESCE carry-over, mirroring Ivf.train. */
  private def ivfDot(dim: Int)(l: String, r: String) =
    s"list_sum(list_transform(generate_series(1, $dim), i -> CAST($l[i] AS DOUBLE) * CAST($r[i] AS DOUBLE)))"

  private def ivfCos(dim: Int)(l: String, r: String) = {
    val dot = ivfDot(dim) _
    s"(${dot(l, r)} / nullif(sqrt(${dot(l, l)}) * sqrt(${dot(r, r)}), 0))"
  }

  /** The Lloyd-training CTE chain shared by q58 and q209: `v` (the
    * vector set), `c0…c<iters>` (centroid tables), plus an assign
    * snippet builder. Returns (cteText, finalCentroidCte, assignFn). */
  private def ivfTrainCtes(kClusters: Int, iters: Int, dim: Int,
                           maxId: Long): (String, String, (String, String) => String) = {
    val assignCos = ivfCos(dim)("v.embedding", "c.cv")
    def assign(prev: String, rnPred: String) =
      s"""(SELECT id, embedding, cid FROM (
         |  SELECT v.id, v.embedding, c.cid,
         |    row_number() OVER (PARTITION BY v.id
         |      ORDER BY $assignCos DESC, c.cid) AS rn
         |  FROM v CROSS JOIN $prev c) t WHERE $rnPred)""".stripMargin
    val head =
      s"""WITH v AS (SELECT CAST(vec_id AS BIGINT) AS id, embedding
         |  FROM embeddings WHERE vec_id < $maxId AND embedding IS NOT NULL),
         |dims AS (SELECT unnest(generate_series(1, $dim)) AS dim),
         |c0 AS (SELECT cid, cv FROM (
         |  SELECT row_number() OVER (ORDER BY id) - 1 AS cid, embedding AS cv
         |  FROM v) t WHERE cid < $kClusters)""".stripMargin
    val its = (1 to iters).map { i =>
      val p = s"c${i - 1}"
      s"""a$i AS ${assign(p, "rn = 1")},
         |s$i AS (SELECT cid, dim,
         |    sum(CAST(embedding[dim] AS DOUBLE)) AS s, count(*) AS n
         |  FROM a$i CROSS JOIN dims GROUP BY 1, 2),
         |u$i AS (SELECT cid, list(CAST(s / n AS FLOAT) ORDER BY dim) AS cv
         |        FROM s$i GROUP BY cid),
         |c$i AS (SELECT p.cid, COALESCE(u.cv, p.cv) AS cv
         |        FROM $p p LEFT JOIN u$i u ON p.cid = u.cid)""".stripMargin
    }.mkString(",\n")
    (s"$head,\n$its", s"c$iters", assign)
  }

  private def ivfTopKSql(kClusters: Int, iters: Int, dim: Int, topK: Int,
                         nProbe: Int, maxId: Long): String = {
    def cos(l: String, r: String) = ivfCos(dim)(l, r)
    val (ctes, fin, assign) = ivfTrainCtes(kClusters, iters, dim, maxId)
    val rerank = s"round(${cos("ea.embedding", "eb.embedding")}, 4)"
    s"""$ctes,
       |corp AS ${assign(fin, "rn = 1")},
       |qry AS ${assign(fin, s"rn <= $nProbe")},
       |cand AS (SELECT DISTINCT q.id AS query_id, corp.id AS neighbor_id
       |  FROM qry q JOIN corp ON q.cid = corp.cid
       |  WHERE q.id <> corp.id),
       |sc AS (SELECT cand.query_id, cand.neighbor_id, $rerank AS cos_sim
       |  FROM cand JOIN v ea ON ea.id = cand.query_id
       |            JOIN v eb ON eb.id = cand.neighbor_id),
       |r AS (SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM sc)
       |SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
       |FROM r WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin
  }

  /** q250/q251 shared oracle: per-row e6 component quantization, exact
    * integer sums per (label, side, component), HUGEINT cross-products,
    * one double tree — the streaming twin maintains the identical grid,
    * so both queries replay one SQL. */
  /** The exact-binomial sign-test oracle CTEs over the (segment,
    * priority) monthly-revenue family — shared by q263 (the p-values)
    * and q264 (the BH step-up over them). Binomial coefficients build
    * through a recursive HUGEINT CTE via the always-divisible
    * `C(n,i+1) = C(n,i)·(n−i)/(i+1)`; the e9 quantization is the pure
    * integer `(num·2·10⁹ + tot) // (2·tot)` the Spark kernel computes
    * with BigInt — bit-identical by construction. */
  private lazy val SignTestCtes: String =
    """rev AS (
      |  SELECT c_mktsegment AS seg, o_orderpriority AS prio,
      |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |         CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2, 3),
      |d AS (SELECT seg, prio,
      |             y - lag(y) OVER (PARTITION BY seg, prio ORDER BY month) AS df
      |      FROM rev),
      |g AS (SELECT seg, prio, CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum(CASE WHEN df > 0 THEN 1 ELSE 0 END) AS BIGINT) AS k
      |      FROM d WHERE df IS NOT NULL AND df <> 0 GROUP BY 1, 2),
      |rec(seg, prio, n, k, i, c) AS (
      |  SELECT seg, prio, n, k, CAST(0 AS BIGINT), CAST(1 AS HUGEINT) FROM g
      |  UNION ALL
      |  SELECT seg, prio, n, k, i + 1, c * (n - i) // (i + 1)
      |  FROM rec WHERE i < n),
      |t AS (SELECT seg, prio, max(n) AS n, max(k) AS k,
      |             sum(CASE WHEN i <= k THEN c END) AS lo,
      |             sum(CASE WHEN i >= k THEN c END) AS hi,
      |             sum(c) AS tot
      |      FROM rec GROUP BY 1, 2),
      |p AS (SELECT seg, prio, n, k,
      |        CAST(least(CAST(1000000000 AS HUGEINT),
      |          (2 * least(lo, hi) * 2000000000 + tot) // (2 * tot))
      |          AS BIGINT) AS p_e9
      |      FROM t)""".stripMargin

  /** The chained-min funnel-reach oracle — ONE definition shared by q147
    * (window path) and q261 (the aggregate hot-key dial), because the two
    * plans are contractually the same rows. */
  private lazy val FunnelReachSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS t, event_type AS s FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase') AND ts IS NOT NULL),
      |w0 AS (SELECT *, min(CASE WHEN s = 'view' THEN t END)
      |         OVER (PARTITION BY user_id) AS t0 FROM e),
      |w1 AS (SELECT *, min(CASE WHEN s = 'click' AND t > t0 THEN t END)
      |         OVER (PARTITION BY user_id) AS t1 FROM w0),
      |w2 AS (SELECT *, min(CASE WHEN s = 'purchase' AND t > t1 THEN t END)
      |         OVER (PARTITION BY user_id) AS t2 FROM w1),
      |u AS (SELECT DISTINCT user_id,
      |        CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END +
      |        CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END +
      |        CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS completed
      |      FROM w2),
      |st AS (SELECT * FROM (VALUES (0, 'view'), (1, 'click'), (2, 'purchase'))
      |       v(stage, stage_name))
      |SELECT st.stage, st.stage_name, count(*) AS n_reached
      |FROM u CROSS JOIN st WHERE u.completed > st.stage
      |GROUP BY 1, 2 ORDER BY st.stage""".stripMargin

  /** The batch-sessions oracle (lag-mark + ROWS-frame running sum, exact
    * integer microseconds) — ONE definition shared by q110 (plain per-key
    * window) and q260 (the time-sliced hot-key dial), because the two
    * plans are contractually the same rows. */
  private lazy val BatchSessionsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
      |m AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN lag(us) OVER w IS NULL
      |           OR us - lag(us) OVER w > 43200000000 THEN 1 ELSE 0 END AS new
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |x AS (
      |  SELECT user_id, us,
      |    CAST(sum(new) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
      |  FROM m)
      |SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(min(us) AS BIGINT) AS start_us, CAST(max(us) AS BIGINT) AS end_us,
      |  CAST(max(us) - min(us) AS BIGINT) AS duration_us
      |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private lazy val CentroidDriftSql: String =
    """WITH g AS (SELECT unnest(generate_series(1, 64)) AS i),
        |c AS (SELECT label, CAST(vec_id % 2 AS INT) AS side, g.i,
        |        CAST(floor(embedding[g.i] * 1e6 + 0.5) AS BIGINT) AS q
        |      FROM embeddings CROSS JOIN g WHERE embedding IS NOT NULL),
        |s AS (SELECT label, side, i, CAST(sum(q) AS BIGINT) AS sv,
        |        CAST(count(*) AS BIGINT) AS c
        |      FROM c GROUP BY 1, 2, 3),
        |j AS (SELECT a.label, a.i, a.sv AS sa, a.c AS ca, b.sv AS sb, b.c AS cb
        |      FROM s a JOIN s b ON a.label = b.label AND a.i = b.i
        |        AND a.side = 0 AND b.side = 1),
        |f AS (SELECT label, max(ca) AS n_a, max(cb) AS n_b,
        |        sum(CAST(sa AS HUGEINT) * sb) AS ab,
        |        sum(CAST(sa AS HUGEINT) * sa) AS aa,
        |        sum(CAST(sb AS HUGEINT) * sb) AS bb
        |      FROM j GROUP BY 1)
        |SELECT label, n_a, n_b,
        |  CASE WHEN aa > 0 AND bb > 0 THEN
        |    CAST(floor(CAST(ab AS DOUBLE)
        |      / sqrt(CAST(aa AS DOUBLE) * CAST(bb AS DOUBLE))
        |      * 1000000 + 0.5) AS BIGINT)
        |  END AS drift_cos_e6
        |FROM f ORDER BY label""".stripMargin

  /** q233/q239 shared oracle: histogram deciles on the score value
    * grid (DESC), the two-step integer lift quantization — the
    * streaming twin maintains the identical per-value counts, so both
    * queries replay one SQL. */
  private lazy val LiftTableSql: String =
    """WITH d AS (
        |  SELECT (doc_id * 48271) % 1000001 AS s,
        |         (doc_id * 2654435761) % 1000000 < (doc_id * 48271) % 1000001 AS y
        |  FROM documents),
        |h AS (SELECT s AS v, CAST(count(*) AS BIGINT) AS c,
        |        CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p
        |      FROM d GROUP BY 1),
        |t AS (SELECT *,
        |        CAST(sum(c) OVER (ORDER BY v DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |        CAST(sum(c) OVER () AS BIGINT) AS n0,
        |        CAST(sum(p) OVER () AS BIGINT) AS tp
        |      FROM h),
        |g AS (SELECT (cum - c) * 10 // n0 AS tile, n0, tp,
        |        CAST(sum(c) AS BIGINT) AS n, CAST(sum(p) AS BIGINT) AS n_pos
        |      FROM t GROUP BY 1, 2, 3),
        |r AS (SELECT *,
        |        CAST(sum(n) OVER (ORDER BY tile
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
        |        CAST(sum(n_pos) OVER (ORDER BY tile
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
        |      FROM g)
        |SELECT tile, n, n_pos, n_pos * 1000000 // n AS resp_rate_e6, cum_n, cum_pos,
        |  (cum_pos * 1000000 // cum_n) * 1000000
        |    // nullif(tp * 1000000 // n0, 0) AS cum_lift_e6
        |FROM r ORDER BY tile""".stripMargin

  /** q225/q236 shared oracle: per-user (min, max) lifetimes, censoring
    * at the observation edge, lifetable, and the recursive-CTE e9
    * survival walk — the streaming twin maintains the identical
    * per-user state, so both queries replay one SQL. */
  private lazy val KaplanMeierCtes: String =
    """WITH RECURSIVE e AS (
        |  SELECT user_id, epoch_us(ts) AS us FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |per AS (SELECT user_id, min(us) AS f, max(us) AS l FROM e GROUP BY 1),
        |g AS (SELECT max(l) AS gm FROM per),
        |s AS (SELECT 'c' || CAST(user_id % 3 AS VARCHAR) AS key,
        |        (l - f) // 86400000000 AS dur,
        |        l < gm - 1209600000000 AS ev
        |      FROM per CROSS JOIN g),
        |lt AS (SELECT key, dur,
        |         CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |         CAST(sum(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS c
        |       FROM s GROUP BY 1, 2),
        |o AS (SELECT key, dur, d, c,
        |        row_number() OVER (PARTITION BY key ORDER BY dur) AS rn,
        |        CAST(sum(d + c) OVER (PARTITION BY key) AS BIGINT) AS tot,
        |        CAST(coalesce(sum(d + c) OVER (PARTITION BY key ORDER BY dur
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |          AS cumprev
        |      FROM lt),
        |rec(key, rn, sv) AS (
        |  SELECT key, rn,
        |    CASE WHEN d > 0 THEN 1000000000 * (tot - cumprev - d) // (tot - cumprev)
        |         ELSE CAST(1000000000 AS BIGINT) END
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.key, o.rn,
        |    CASE WHEN o.d > 0
        |         THEN rec.sv * (o.tot - o.cumprev - o.d) // (o.tot - o.cumprev)
        |         ELSE rec.sv END
        |  FROM rec JOIN o ON o.key = rec.key AND o.rn = rec.rn + 1)""".stripMargin

  private lazy val KaplanMeierSql: String =
    s"""$KaplanMeierCtes
        |SELECT o.key, o.dur AS duration, (o.tot - o.cumprev) AS n_risk,
        |  o.d AS d_events, o.c AS c_censored, rec.sv AS s_e9
        |FROM o JOIN rec ON o.key = rec.key AND o.rn = rec.rn
        |ORDER BY o.key, duration""".stripMargin

  /** q209: cluster-quality readout over the same trained centroids —
    * per-cluster member count and the EXACT sum of e6-quantized
    * member-to-centroid cosines (no mean emitted: a negative sum would
    * hit the div-truncate vs //-floor sign trap). */
  private def ivfClusterQualitySql(kClusters: Int, iters: Int, dim: Int,
                                   maxId: Long): String = {
    val (ctes, fin, assign) = ivfTrainCtes(kClusters, iters, dim, maxId)
    val cs = ivfCos(dim)("a.embedding", "c.cv")
    s"""$ctes,
       |asg AS ${assign(fin, "rn = 1")},
       |j AS (SELECT a.cid, CAST(floor($cs * 1e6 + 0.5) AS BIGINT) AS cs_e6
       |  FROM asg a JOIN $fin c ON a.cid = c.cid)
       |SELECT CAST(cid AS INT) AS cluster, count(*) AS n,
       |  CAST(sum(cs_e6) AS BIGINT) AS sum_cos_e6
       |FROM j GROUP BY 1 ORDER BY cluster""".stripMargin
  }

  /** q237: centroid-pair separation over the same trained centroids —
    * the between-cluster half of [[ivfClusterQualitySql]]'s readout;
    * floor(x·1e6 + 0.5) handles negative cosines identically to the
    * JVM kernel (floor is floor on both engines). */
  private def ivfClusterSeparationSql(kClusters: Int, iters: Int, dim: Int,
                                      maxId: Long): String = {
    val (ctes, fin, _) = ivfTrainCtes(kClusters, iters, dim, maxId)
    val cs = ivfCos(dim)("c1.cv", "c2.cv")
    // coalesce mirrors the JVM kernel's null→0 on a zero-norm centroid
    // (ivfCos emits NULL there via its nullif guard)
    s"""$ctes
       |SELECT CAST(c1.cid AS INT) AS cluster_a, CAST(c2.cid AS INT) AS cluster_b,
       |  CAST(floor(coalesce($cs, 0) * 1e6 + 0.5) AS BIGINT) AS cos_e6
       |FROM $fin c1 JOIN $fin c2 ON c1.cid < c2.cid
       |ORDER BY cluster_a, cluster_b""".stripMargin
  }

  /** q83: SemDeDup pairs over the same trained centroids — within-cluster
    * pairwise cosine, rounded to 4 decimals, thresholded AFTER rounding
    * exactly as [[graft.sim.Ivf.semanticDedupPairs]] does. The training
    * chain is the deterministic Lloyd replay ([[ivfTrainCtes]]), so the
    * whole seed→assign→pair→score pipeline hash-checks like q58/q209. */
  private def ivfSemanticDedupSql(kClusters: Int, iters: Int, dim: Int,
                                  threshold: Double, maxId: Long): String = {
    val (ctes, fin, assign) = ivfTrainCtes(kClusters, iters, dim, maxId)
    val cs = s"round(${ivfCos(dim)("a.embedding", "b.embedding")}, 4)"
    s"""$ctes,
       |asg AS ${assign(fin, "rn = 1")},
       |sc AS (SELECT a.id AS id_a, b.id AS id_b, $cs AS cos_sim
       |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.id < b.id)
       |SELECT id_a, id_b, cos_sim FROM sc
       |WHERE cos_sim >= $threshold ORDER BY id_a, id_b""".stripMargin
  }

  private val MonteCarloSql: String = {
    val p = "4294967311"
    val counter = dkHash32("concat_ws('_', 42, sim_id, step)")
    s"""WITH grid AS (
       |  SELECT s.sim_id, st.step
       |  FROM (SELECT unnest(generate_series(0, 999)) AS sim_id) s,
       |       (SELECT unnest(generate_series(1, 36)) AS step) st),
       |z AS (
       |  SELECT sim_id, step,
       |    sqrt(-2.0 * ln(((c * 683077 + 104729) % $p + 1.0) / 4294967312.0))
       |      * cos(2 * pi() * (((c * 999331 + 15487469) % $p) / 4294967311.0)) AS z
       |  FROM (SELECT sim_id, step, $counter AS c FROM grid)),
       |paths AS (
       |  SELECT sim_id, step,
       |    greatest(100.0 + sum(0.5 + 2.0 * z) OVER (PARTITION BY sim_id ORDER BY step
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS value
       |  FROM z)
       |SELECT step,
       |  round(quantile_cont(value, 0.05), 4) AS p05,
       |  round(quantile_cont(value, 0.10), 4) AS p10,
       |  round(quantile_cont(value, 0.50), 4) AS p50,
       |  round(quantile_cont(value, 0.90), 4) AS p90,
       |  round(quantile_cont(value, 0.95), 4) AS p95,
       |  round(avg(value), 4) AS mean,
       |  round(stddev_samp(value), 4) AS std,
       |  round(min(value), 4) AS min,
       |  round(max(value), 4) AS max
       |FROM paths GROUP BY step ORDER BY step""".stripMargin
  }

  /** q40: the composed monte_carlo_forecast pipeline in pure SQL. The
    * white-noise SARIMAX candidate (0,1,0)(0,0,0) has a CLOSED-FORM MLE —
    * OLS of Δy on [1, Δx] — so fit, drift estimation, path simulation
    * (same counter-based RNG as [[MonteCarloSql]], key='all' mixed in) and
    * per-path forecast y_j = lastY + j·c + β·(x_j − lastX) are all exactly
    * expressible; quantile_cont matches Spark's exact percentile. */
  private val McForecastSql: String = {
    val p = "4294967311"
    val counter = dkHash32("concat_ws('_', 42, 'all', sim_id, step)")
    s"""WITH m AS (
       |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       |         round(sum(o_totalprice)/1000000.0, 6) AS tot,
       |         CAST(count(*) AS DOUBLE) AS x
       |  FROM orders GROUP BY 1),
       |o AS (SELECT tot, x, row_number() OVER (ORDER BY month) AS rn FROM m),
       |nn AS (SELECT max(rn) AS nr FROM o),
       |dd AS (SELECT tot - lag(tot) OVER (ORDER BY rn) AS dy,
       |              x - lag(x) OVER (ORDER BY rn) AS dx FROM o),
       |ols AS (SELECT regr_intercept(dy, dx) AS c, regr_slope(dy, dx) AS beta
       |        FROM dd WHERE dy IS NOT NULL),
       |lastv AS (SELECT o.tot AS lastY, o.x AS lastX FROM o, nn WHERE o.rn = nn.nr),
       |tdx AS (SELECT x - lag(x) OVER (ORDER BY rn) AS dxx
       |        FROM (SELECT x, rn FROM o, nn WHERE rn > nr - 60)),
       |drift AS (SELECT avg(dxx) AS mu, stddev_samp(dxx) AS sigma
       |          FROM tdx WHERE dxx IS NOT NULL),
       |grid AS (
       |  SELECT s.sim_id, st.step
       |  FROM (SELECT unnest(generate_series(0, 499)) AS sim_id) s,
       |       (SELECT unnest(generate_series(1, 24)) AS step) st),
       |z AS (
       |  SELECT sim_id, step,
       |    sqrt(-2.0 * ln(((c * 683077 + 104729) % $p + 1.0) / 4294967312.0))
       |      * cos(2 * pi() * (((c * 999331 + 15487469) % $p) / 4294967311.0)) AS z
       |  FROM (SELECT sim_id, step, $counter AS c FROM grid)),
       |xp AS (
       |  SELECT sim_id, step,
       |    greatest(lastv.lastX + sum(drift.mu + drift.sigma * z) OVER (
       |      PARTITION BY sim_id ORDER BY step
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS xs
       |  FROM z, lastv, drift),
       |fc AS (
       |  SELECT sim_id, step,
       |    lastv.lastY + step * ols.c + ols.beta * (xp.xs - lastv.lastX) AS value
       |  FROM xp, lastv, ols)
       |SELECT 'all' AS key, step,
       |  round(quantile_cont(value, 0.05), 4) AS p05,
       |  round(quantile_cont(value, 0.10), 4) AS p10,
       |  round(quantile_cont(value, 0.50), 4) AS p50,
       |  round(quantile_cont(value, 0.90), 4) AS p90,
       |  round(quantile_cont(value, 0.95), 4) AS p95,
       |  round(avg(value), 4) AS mean,
       |  round(stddev_samp(value), 4) AS std,
       |  round(min(value), 4) AS min,
       |  round(max(value), 4) AS max
       |FROM fc GROUP BY step ORDER BY step""".stripMargin
  }

  def oracleSql: Map[String, String] = {
    val m = oracleSqlBase
    // streaming twins whose drained complete-mode state equals the batch
    // aggregate share the batch oracle VERBATIM — one definition, one gate
    m ++ Map(
      "q266_x_stream_nmi" -> m("q256_x_nmi"),
      "q267_x_stream_vocab_jsd" -> m("q258_x_vocab_jsd"),
      "q285_x_stream_cvm" -> m("q281_x_cramer_von_mises"),
      "q290_x_stream_best_split" -> m("q282_x_best_split"),
      "q293_x_stream_sprt" -> m("q292_x_sprt"),
      "q298_x_stream_chi_square" -> m("q297_x_chi_square"),
      "q302_x_stream_hist_drift" -> m("q301_x_hist_drift"),
      "q318_x_stream_page_hinkley" -> m("q317_x_page_hinkley"),
      "q327_x_stream_vocab_coverage" -> m("q325_x_vocab_coverage"),
      "q333_x_stream_topk_stability" -> m("q319_x_topk_stability"))
  }

  private lazy val oracleSqlBase: Map[String, String] = Map(
    "q00_m2_ces_collapse" -> CesCollapseSql,

    "q01_a1_groupsum" ->
      ("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n " +
        "FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"),

    "q02_a2_weighted_mean" ->
      ("SELECT l_returnflag, round(sum(CASE WHEN l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL " +
        "THEN l_extendedprice * l_quantity END) / nullif(sum(CASE WHEN l_extendedprice IS NOT NULL " +
        "THEN l_quantity END), 0), 4) AS wavg_price FROM lineitem GROUP BY 1 ORDER BY 1"),

    "q03_a3_distinct" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer ORDER BY 1, 2",

    "q04_a4_value_counts" ->
      ("SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1 " +
        "ORDER BY n DESC, o_orderpriority LIMIT 10"),

    "q05_a5_dedupe_mean" ->
      ("SELECT user_id, CAST(date_trunc('month', ts) AS DATE) AS month, " +
        "floor(avg(round(value * 100)) * 100 + 0.5) / 10000.0 AS avg_value " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),

    "q06_a6_summary" ->
      ("SELECT CAST(min(o_orderdate) AS DATE) AS min_date, CAST(max(o_orderdate) AS DATE) AS max_date, " +
        "count(*) AS n, round(min(o_totalprice), 2) AS min_price, " +
        "round(max(o_totalprice), 2) AS max_price FROM orders"),

    "q07_a7_histogram" ->
      ("SELECT CAST(floor(l_quantity / 5.0) AS BIGINT) AS bucket, count(*) AS n " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),

    "q08_a8_quantiles" ->
      ("SELECT event_type, round(quantile_cont(value, 0.05), 4) AS p05, " +
        "round(quantile_cont(value, 0.5), 4) AS p50, " +
        "round(quantile_cont(value, 0.95), 4) AS p95 FROM events GROUP BY 1 ORDER BY 1"),

    "q09_a9_drift_fit" ->
      ("""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day, sum(o_totalprice) AS tot FROM orders GROUP BY 1),
        |t AS (SELECT day, tot FROM (SELECT day, tot, row_number() OVER (ORDER BY day DESC) AS rn FROM d) WHERE rn <= 60),
        |x AS (SELECT tot - lag(tot) OVER (ORDER BY day) AS dx FROM t)
        |SELECT round(avg(dx), 2) AS mu, round(stddev_samp(dx), 2) AS sigma FROM x""".stripMargin),

    "q10_f1_regex_filter" ->
      ("SELECT event_id, event_type, value FROM events " +
        "WHERE regexp_matches(event_type, '^(purchase|refund)$') ORDER BY event_id"),

    "q11_f2_isin_filter" ->
      ("SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem " +
        "WHERE l_returnflag IN ('A', 'R') ORDER BY 1, 2"),

    "q12_f4_contains_ci" ->
      ("SELECT doc_id, lang, n_chars FROM documents " +
        "WHERE contains(lower(text), 'spark') ORDER BY doc_id"),

    "q13_f5_code_predicate" ->
      ("SELECT p_partkey, p_brand, p_type FROM part " +
        "WHERE p_type IN ('ECONOMY') OR p_type LIKE 'STA%' OR p_type LIKE 'PRO%' ORDER BY 1"),

    "q14_j123_star_join" ->
      ("SELECT r_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders, " +
        "count(DISTINCT o_custkey) AS n_customers FROM orders " +
        "LEFT JOIN customer ON o_custkey = c_custkey " +
        "LEFT JOIN nation ON c_nationkey = n_nationkey " +
        "LEFT JOIN region ON n_regionkey = r_regionkey GROUP BY 1 ORDER BY 1"),

    "q15_j4_composite_key_join" ->
      ("""WITH w AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS w FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, round(sum(CASE WHEN l_extendedprice IS NOT NULL AND w.w IS NOT NULL
        |  THEN l_extendedprice * w.w END) / nullif(sum(CASE WHEN l_extendedprice IS NOT NULL THEN w.w END), 0), 4) AS wavg_price
        |FROM lineitem LEFT JOIN w ON lineitem.l_partkey = w.l_partkey AND lineitem.l_suppkey = w.l_suppkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    "q16_j6_month_align_join" ->
      ("""WITH s AS (SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        |  count(*) AS n_ship, round(sum(l_quantity), 2) AS sum_qty FROM lineitem GROUP BY 1),
        |o AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  count(*) AS n_orders, round(avg(o_totalprice), 4) AS avg_price FROM orders GROUP BY 1)
        |SELECT s.month, s.n_ship, s.sum_qty, o.n_orders, o.avg_price
        |FROM s LEFT JOIN o ON s.month = o.month ORDER BY s.month""".stripMargin),

    "q17_w1_pct_change" ->
      (s"""WITH m AS ($MonthlySql)
        |SELECT month, round(tot, 2) AS tot,
        |  round((tot / lag(tot, 1) OVER (ORDER BY month) - 1) * 100, 4) AS mom_pct,
        |  round((tot / lag(tot, 12) OVER (ORDER BY month) - 1) * 100, 4) AS yoy_pct
        |FROM m ORDER BY month""".stripMargin),

    "q18_w23_rolling_mean_std" ->
      ("""WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    sum(round(o_totalprice * 100)) AS tot_c
        |  FROM orders GROUP BY 1)
        |SELECT month,
        |  floor(CASE WHEN count(tot_c) OVER w6 >= 6 THEN avg(tot_c) OVER w6 END + 0.5) / 100.0 AS roll_mean6,
        |  round(CASE WHEN count(tot_c) OVER w6 >= 6 THEN stddev_samp(tot_c) OVER w6 END / 100.0, 2) AS roll_std6
        |FROM m WINDOW w6 AS (ORDER BY month ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
        |ORDER BY month""".stripMargin),

    "q19_w4_rolling_corr" ->
      (s"""WITH m AS ($MonthlySql)
        |SELECT month,
        |  round(CASE WHEN count(tot) OVER w12 >= 12 THEN corr(tot, n) OVER w12 END, 4) AS roll_corr12
        |FROM m WINDOW w12 AS (ORDER BY month ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
        |ORDER BY month""".stripMargin),

    "q20_w5_rolling_median" ->
      (s"""WITH m AS ($MonthlySql)
        |SELECT month,
        |  round(CASE WHEN count(tot) OVER w13 >= 6 THEN median(tot) OVER w13 END, 2) AS roll_med13
        |FROM m WINDOW w13 AS (ORDER BY month ROWS BETWEEN 12 PRECEDING AND CURRENT ROW)
        |ORDER BY month""".stripMargin),

    "q21_w6_base100_index" ->
      (s"""WITH m AS ($MonthlySql)
        |SELECT month, round(tot / first_value(tot) OVER (ORDER BY month
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100, 4) AS tot_index
        |FROM m ORDER BY month""".stripMargin),

    "q22_w7_diffs" ->
      (s"""WITH m AS ($MonthlySql)
        |SELECT month, round(tot - lag(tot, 1) OVER (ORDER BY month), 2) AS d1,
        |  round(tot - lag(tot, 12) OVER (ORDER BY month), 2) AS d12
        |FROM m ORDER BY month""".stripMargin),

    "q23_w8_month_grid" ->
      (s"""WITH m AS ($MonthlySql),
        |b AS (SELECT min(month) AS lo, max(month) AS hi FROM m),
        |g AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month FROM b)
        |SELECT g.month, m.n, round(m.tot, 2) AS tot
        |FROM g LEFT JOIN m ON g.month = m.month ORDER BY g.month""".stripMargin),

    "q24_w9_cumsum" ->
      (s"""WITH m AS ($MonthlySql)
        |SELECT month, round(sum(tot) OVER (ORDER BY month
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_tot
        |FROM m ORDER BY month""".stripMargin),

    "q25_w10_last_obs" ->
      ("""SELECT user_id, event_id AS last_event_id, round(value, 2) AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin),

    "q26_w11_tail_rows" ->
      ("""SELECT user_id, count(*) AS n_recent, round(avg(value), 4) AS avg_recent
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn <= 5 GROUP BY 1 ORDER BY 1""".stripMargin),

    "q27_o12_topk" ->
      ("SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice, o_orderpriority " +
        "FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"),

    "q28_set_union" ->
      ("SELECT * FROM (SELECT s_name AS name, 'supplier' AS kind FROM supplier " +
        "UNION ALL SELECT c_name AS name, 'customer' AS kind FROM customer) " +
        "ORDER BY kind, name"),

    "q29_fs_string_fns" ->
      ("SELECT p_partkey, lower(trim(p_name)) AS name_lc, " +
        "regexp_replace(p_type, ' ', '_', 'g') AS type_u, " +
        "lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad, " +
        "concat_ws(':', p_brand, p_type) AS brand_type, " +
        "substring(p_type, 1, 4) AS type4 FROM part ORDER BY p_partkey"),

    "q30_fd_date_fns" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y, " +
        "CAST(month(o_orderdate) AS BIGINT) AS m, " +
        "CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start, " +
        "last_day(o_orderdate) AS month_end, " +
        "make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS md " +
        "FROM orders ORDER BY o_orderkey"),

    "q31_fm_math_null_fns" ->
      ("SELECT event_id, round(CASE WHEN value > 0 THEN ln(value) END, 4) AS log_value, " +
        "round(greatest(value - 100, 0), 2) AS over100, " +
        "coalesce(nullif(event_type, 'error'), 'unknown') AS etype_filled, " +
        "round(abs(value - 50), 2) AS dist50 FROM events ORDER BY event_id"),

    "q32_u9_montecarlo_fan" -> MonteCarloSql,

    "q40_u9u8_mc_forecast_fan" -> McForecastSql,

    "q61_j6_align_prefix_fill" ->
      ("""WITH df AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |e AS (
        |  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS emonth,
        |         round(sum(l_extendedprice), 2) AS rev,
        |         round(avg(l_discount), 6) AS disc
        |  FROM lineitem WHERE year(l_shipdate) >= 1995 GROUP BY 1)
        |SELECT prio, month, n, coalesce(e.rev, 0.0) AS x_rev, e.disc AS x_disc
        |FROM df LEFT JOIN e ON month = emonth
        |ORDER BY prio, month""".stripMargin),

    "q62_s7_export_long" ->
      (s"""WITH m AS ($MonthlySql)
        |SELECT month, 'tot' AS measure, round(tot, 2) AS value FROM m
        |UNION ALL
        |SELECT month, 'n' AS measure, CAST(n AS DOUBLE) AS value FROM m
        |ORDER BY month, measure""".stripMargin),

    "q63_s7_export_wide" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(o_totalprice), 2) AS tot
        |  FROM orders GROUP BY 1, 2)
        |SELECT month,
        |  max(CASE WHEN prio = '1-URGENT' THEN tot END) AS "1-URGENT",
        |  max(CASE WHEN prio = '2-HIGH' THEN tot END) AS "2-HIGH",
        |  max(CASE WHEN prio = '3-MEDIUM' THEN tot END) AS "3-MEDIUM",
        |  max(CASE WHEN prio = '4-NOT SPECIFIED' THEN tot END) AS "4-NOT SPECIFIED",
        |  max(CASE WHEN prio = '5-LOW' THEN tot END) AS "5-LOW"
        |FROM m GROUP BY month ORDER BY month""".stripMargin),

    "q64_w5w10_outlier_repair" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(o_totalprice), 2) AS tot
        |  FROM orders GROUP BY 1, 2),
        |w AS (
        |  SELECT prio, month, tot,
        |    CASE WHEN count(tot) OVER win >= 6 THEN median(tot) OVER win END AS med
        |  FROM m
        |  WINDOW win AS (PARTITION BY prio ORDER BY month
        |                 ROWS BETWEEN 12 PRECEDING AND CURRENT ROW)),
        |l AS (
        |  SELECT prio, month, tot,
        |    lag(med) OVER (PARTITION BY prio ORDER BY month) AS med_prev,
        |    lag(tot) OVER (PARTITION BY prio ORDER BY month) AS tot_prev,
        |    month = max(month) OVER (PARTITION BY prio) AS is_last
        |  FROM w)
        |SELECT prio, month, tot,
        |  round(CASE WHEN is_last AND coalesce(med_prev, tot_prev) IS NOT NULL
        |             THEN coalesce(med_prev, tot_prev) ELSE tot END, 2) AS repaired
        |FROM l ORDER BY prio, month""".stripMargin),

    "q33_fd4_future_months" ->
      ("""WITH m AS (SELECT o_orderpriority, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  count(*) AS n FROM orders GROUP BY 1, 2),
        |last AS (SELECT o_orderpriority, max(month) AS lastm FROM m GROUP BY 1)
        |SELECT o_orderpriority,
        |  CAST(unnest(generate_series(lastm + INTERVAL 1 MONTH, lastm + INTERVAL 6 MONTH, INTERVAL 1 MONTH)) AS DATE) AS month
        |FROM last ORDER BY 1, 2""".stripMargin),

    "q37_u7_acf" ->
      (s"""WITH m AS ($MonthlySql),
        |s AS (SELECT row_number() OVER (ORDER BY month) AS t, round(tot, 2) AS v FROM m),
        |st AS (SELECT avg(v) AS mu, count(*) AS n FROM s),
        |c0 AS (SELECT sum((v - mu) * (v - mu)) / max(n) AS c0 FROM s, st),
        |g AS (
        |  SELECT l.lag, sum((a.v - st.mu) * (b.v - st.mu)) / max(st.n) AS cov
        |  FROM (SELECT unnest(generate_series(1, 6)) AS lag) l
        |  JOIN s a ON true JOIN s b ON a.t = b.t + l.lag, st
        |  GROUP BY l.lag)
        |SELECT lag, round(cov / c0.c0, 4) AS acf FROM g, c0 ORDER BY lag""".stripMargin),

    "q38_f3_equality_filter" ->
      ("SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS tot " +
        "FROM orders WHERE o_orderstatus = 'F' GROUP BY 1 ORDER BY 1"),

    "q36_u4_yeojohnson" ->
      ("""SELECT event_id,
        |  round(CASE WHEN value - 50 >= 0 THEN (sqrt(value - 50 + 1) - 1) / 0.5
        |             ELSE -((1 - (value - 50)) * sqrt(1 - (value - 50)) - 1) / 1.5 END, 5) AS yj_half,
        |  round(CASE WHEN value - 50 >= 0 THEN ln(1 + (value - 50))
        |             ELSE -((1 - (value - 50)) * (1 - (value - 50)) - 1) / 2.0 END, 5) AS yj_log,
        |  round(CASE WHEN value - 50 >= 0 THEN ((value - 50 + 1) * (value - 50 + 1) - 1) / 2.0
        |             ELSE -ln(1 - (value - 50)) END, 5) AS yj_two
        |FROM events ORDER BY event_id""".stripMargin),

    "q41_x_tokens_fingerprint" ->
      (s"""$MinhashCte
        |SELECT t.doc_id,
        |  CAST(CASE WHEN length(t.tt) = 0 THEN 0 ELSE len(t.toks) END AS BIGINT) AS n_tokens,
        |  coalesce(list_min(list_transform(sh.sh, x -> ${dkHash32("x")})), h.fb) AS fingerprint
        |FROM t JOIN sh ON t.doc_id = sh.doc_id JOIN h ON t.doc_id = h.doc_id
        |ORDER BY t.doc_id""".stripMargin),

    "q42_x_quality_score" -> {
      val stop = TextAnalysis.EnglishStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t0 AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
        |t AS (SELECT doc_id, text,
        |        CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[]) ELSE toks END AS toks
        |      FROM t0)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  round(CAST(length(array_to_string(toks, '')) AS DOUBLE) / nullif(len(toks), 0), 4) AS avg_token_len,
        |  round(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
        |    / nullif(length(text), 0), 4) AS punct_ratio,
        |  round(CAST(len(list_filter(toks, x -> x IN ($stop))) AS DOUBLE) / nullif(len(toks), 0), 4) AS stopword_ratio
        |FROM t ORDER BY doc_id""".stripMargin
    },

    "q43_x_langid" -> {
      val stop = TextAnalysis.EnglishStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN CAST(len(list_filter(toks, x -> x IN ($stop))) AS DOUBLE) / nullif(len(toks), 0) >= 0.05
        |       THEN 'en' ELSE 'und' END AS lang_pred
        |FROM t ORDER BY doc_id""".stripMargin
    },

    "q57_x_subword_count" ->
      ("""SELECT doc_id,
        |  CAST(len(regexp_extract_all(trim(text), '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+')) AS BIGINT) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin),

    "q44_x_dedup_exact" ->
      ("SELECT md5(trim(text)) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies " +
        "FROM documents GROUP BY 1 ORDER BY 1"),

    "q66_x_stream_dedup" ->
      ("SELECT md5(trim(text)) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies " +
        "FROM documents GROUP BY 1 ORDER BY 1"),

    "q65_x_salted_join" ->
      ("SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 2) AS qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY 1"),

    "q67_x_hotkey_salted_join" ->
      ("SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 2) AS qty " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY 1"),

    "q68_x_corpus_clean" -> {
      val stop = TextAnalysis.EnglishStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH b AS (
        |  SELECT doc_id, text,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks,
        |    regexp_split_to_array(trim(lower(text)), '\\s+') AS ltoks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
        |      / nullif(length(text), 0) AS punct_ratio,
        |    CASE WHEN CAST(len(list_filter(ltoks, x -> x IN ($stop))) AS DOUBLE)
        |              / nullif(len(ltoks), 0) >= 0.05
        |         THEN 'en' ELSE 'und' END AS lang_pred
        |  FROM b),
        |f AS (
        |  SELECT * FROM q
        |  WHERE lang_pred = 'en' AND n_tokens >= 5
        |    AND coalesce(punct_ratio, 0.0) <= 0.2),
        |k AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY md5(trim(text)))
        |SELECT f.doc_id, n_tokens, round(punct_ratio, 4) AS punct_ratio
        |FROM f JOIN k USING (doc_id) ORDER BY doc_id""".stripMargin
    },

    "q45_x_minhash_sig" ->
      (s"""$MinhashCte
        |SELECT doc_id, ${(0 until MinhashK).map(i => s"mh$i").mkString(", ")}
        |FROM sig ORDER BY doc_id""".stripMargin),

    "q46_x_minhash_lsh_pairs" -> {
      val rows = MinhashK / MinhashBands
      val bandConds = (0 until MinhashBands).map { b =>
        (b * rows until (b + 1) * rows).map(i => s"a.mh$i = b.mh$i").mkString("(", " AND ", ")")
      }.mkString(" OR ")
      val eqSum = (0 until MinhashK)
        .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""$MinhashCte
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST($eqSum AS DOUBLE) / $MinhashK, 4) AS est_jaccard
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($bandConds)
        |ORDER BY id_a, id_b""".stripMargin
    },

    "q78_x_stream_neardup" -> {
      val rows = MinhashK / MinhashBands
      val bandConds = (0 until MinhashBands).map { b =>
        (b * rows until (b + 1) * rows).map(i => s"a.mh$i = b.mh$i").mkString("(", " AND ", ")")
      }.mkString(" OR ")
      val eqSum = (0 until MinhashK)
        .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""$MinhashCte
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST($eqSum AS DOUBLE) / $MinhashK, 4) AS est_jaccard
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($bandConds)
        |ORDER BY id_a, id_b""".stripMargin
    },

    // transitive closure over the qualifying pairs (est >= 0.5 <=> eq
    // components >= k/2, an exact integer compare); cluster id = min id
    // reachable. Recursive CTE is test-scale only — the engine side is the
    // scalable label-propagation loop.
    "q79_x_dup_clusters" ->
      s"""$DupReachCte
        |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,

    "q47_x_simhash" -> SimhashSql,

    "q59_x_simhash_pairs" -> SimhashPairsSql,

    "q60_x_embed_neardup_bucketed" ->
      nearDupBucketedSql(nBits = 6, nTables = 3, dim = 64, threshold = 0.4),

    "q52_x_lsh_ann" ->
      lshTopKSql(nBits = 8, nTables = 2, dim = 64, k = 3, maxId = 200L),

    // full Lloyd-training replay — graduates q58 from rows-only to
    // hash-checked (the training, probe, and re-rank are ALL
    // deterministic; see ivfTopKSql)
    "q58_x_ivf_ann" ->
      ivfTopKSql(kClusters = 8, iters = 3, dim = 64, topK = 3,
        nProbe = 2, maxId = 200L),

    // same trained model as q58; within-cluster pairs + rounded-then-
    // thresholded cosine — graduates q83 from rows-only to hash-checked
    "q83_x_semantic_dedup" ->
      ivfSemanticDedupSql(kClusters = 8, iters = 3, dim = 64,
        threshold = 0.35, maxId = 200L),

    "q119_x_semantic_decon_bucketed" ->
      crossNearDupBucketedSql(nBits = 6, nTables = 3, dim = 64, threshold = 0.4),

    // q112's ASOF oracle with the 15-day tolerance as a CASE over the
    // epoch gap — DuckDB has no ASOF tolerance clause, but the nearest
    // prior match is already unique, so the post-join test is identical
    // to the merge-side accept test (15 d = 1_296_000_000_000 us)
    "q120_x_tolerance_asof_join" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(o_totalprice), 2) AS tot, count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT o_orderpriority, month, tot FROM m WHERE n >= 45),
        |l AS (SELECT o_orderkey, o_orderpriority, o_orderdate FROM orders
        |      WHERE o_orderkey % 97 = 0)
        |SELECT l.o_orderkey, l.o_orderpriority, l.o_orderdate,
        |       CASE WHEN epoch_us(l.o_orderdate) - epoch_us(CAST(r.month AS TIMESTAMP))
        |                 <= 1296000000000 THEN r.tot END AS tot
        |FROM l ASOF LEFT JOIN r
        |  ON l.o_orderpriority = r.o_orderpriority AND l.o_orderdate >= r.month
        |ORDER BY o_orderkey""".stripMargin),

    // the fold replayed as a window: latest version per key, delete
    // tombstoned — (k, v) is unique (o_orderkey), so both forms agree;
    // price passes through untouched (no cross-engine arithmetic)
    "q121_x_cdc_snapshot" ->
      ("""WITH ch AS (
        |  SELECT o_custkey AS k, o_orderkey AS v,
        |         CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
        |         o_totalprice AS price
        |  FROM orders),
        |r AS (SELECT *, row_number() OVER (PARTITION BY k ORDER BY v DESC) AS rn
        |      FROM ch)
        |SELECT k, v, price FROM r WHERE rn = 1 AND op <> 'D'
        |ORDER BY k""".stripMargin),

    // the interval build is one lead() over the same changelog; the
    // delete's own row is filtered AFTER the window so it still closes
    // its predecessor — (k, v) is unique, so the order is total
    "q127_x_scd2_history" ->
      ("""WITH ch AS (
        |  SELECT o_custkey AS k, o_orderkey AS v,
        |         CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
        |         o_totalprice AS price
        |  FROM orders),
        |w AS (SELECT k, v, op, price,
        |        lead(v) OVER (PARTITION BY k ORDER BY v) AS valid_to
        |      FROM ch)
        |SELECT k, v AS valid_from, valid_to, valid_to IS NULL AS is_current, price
        |FROM w WHERE op <> 'D'
        |ORDER BY k, valid_from""".stripMargin),

    // the counter grid replayed as a GROUP BY over (row, bucket) with
    // the same fixed-prime affine hashes; a probe's estimate is the min
    // over its 4 cells (absent cell = 0). All-positive BIGINT modular
    // arithmetic — no overflow, no negative-mod drift
    "q128_x_cms_heavy_hitters" ->
      ("""WITH v AS (
        |  SELECT CASE WHEN l_orderkey % 3 = 0
        |              THEN 'hot' || CAST(l_partkey % 7 AS VARCHAR)
        |              ELSE 'cold' || CAST(l_partkey AS VARCHAR) END AS val
        |  FROM lineitem),
        |par AS (SELECT * FROM (VALUES (0, 1299709, 104729), (1, 15485863, 1299721),
        |          (2, 32452843, 7919), (3, 49979687, 17389)) t(i, a, b)),
        |h AS (SELECT CAST('0x' || substring(md5(val), 1, 15) AS BIGINT) % 2147483647 AS hm
        |      FROM v),
        |cells AS (
        |  SELECT p.i, ((p.a * h.hm + p.b) % 2147483647) % 1024 AS bucket,
        |         count(*) AS c
        |  FROM h CROSS JOIN par p GROUP BY 1, 2),
        |probes(k) AS (VALUES ('hot0'),('hot1'),('hot2'),('hot3'),('hot4'),('hot5'),
        |  ('hot6'),('cold1'),('cold7')),
        |ph AS (SELECT k, CAST('0x' || substring(md5(k), 1, 15) AS BIGINT) % 2147483647 AS hm
        |       FROM probes),
        |pb AS (SELECT ph.k, p.i, ((p.a * ph.hm + p.b) % 2147483647) % 1024 AS bucket
        |       FROM ph CROSS JOIN par p),
        |est AS (SELECT pb.k, min(coalesce(cells.c, 0)) AS n_est
        |        FROM pb LEFT JOIN cells ON pb.i = cells.i AND pb.bucket = cells.bucket
        |        GROUP BY pb.k),
        |tc AS (SELECT val AS k, count(*) AS n_true FROM v GROUP BY val)
        |SELECT est.k, n_est, coalesce(tc.n_true, 0) AS n_true
        |FROM est LEFT JOIN tc ON est.k = tc.k
        |ORDER BY est.k""".stripMargin),

    // GROUPING() carries the same bit order as Spark's grouping_id
    // (first listed column = MSB); DuckDB sums of BIGINT widen to
    // HUGEINT, so both aggregates are cast back explicitly
    "q129_x_cube_subtotals" ->
      ("""SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin),

    // the same histogram: cents // binWidth counts, cumulative window,
    // first bin reaching the integer per-mille rank. // floors and div
    // truncates — equal on the operator's non-negative domain
    "q130_x_binned_quantiles" ->
      ("""WITH v AS (
        |  SELECT l_returnflag, CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 500000 AS bin
        |  FROM lineitem),
        |c AS (SELECT l_returnflag, bin, count(*) AS cnt FROM v GROUP BY 1, 2),
        |cc AS (SELECT l_returnflag, bin, cnt,
        |         sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum,
        |         sum(cnt) OVER (PARTITION BY l_returnflag) AS n
        |       FROM c),
        |q(q_permille) AS (VALUES (500), (950), (990))
        |SELECT l_returnflag, q_permille,
        |  CAST(min(bin) * 500000 AS BIGINT) AS est, CAST(max(n) AS BIGINT) AS n
        |FROM cc CROSS JOIN q
        |WHERE cum >= (q_permille * n + 999) // 1000
        |GROUP BY l_returnflag, q_permille
        |ORDER BY l_returnflag, q_permille""".stripMargin),

    // the decode replayed in closed form (q54's trick, textured
    // fixture): integer cell sums on the constant 16x12 grid, bits by
    // cross-multiplied means (empty cells = mean 0), then a brute-force
    // Hamming filter — equal to the banded join's output because
    // maxHamming <= bands-1 keeps full recall
    "q131_x_image_phash_neardup" ->
      ("""WITH dim AS (
        |  SELECT doc_id, doc_id // 5 AS base, doc_id % 5 AS v FROM documents),
        |dd AS (SELECT doc_id, base, v, 8 + base % 9 AS w, 6 + base % 7 AS h,
        |              base % 11 + 3 AS t FROM dim),
        |g AS (SELECT x.i AS x, y.i AS y
        |      FROM generate_series(0, 15) x(i), generate_series(0, 11) y(i)),
        |px AS (
        |  SELECT doc_id, (x * 9) // w AS cx, (y * 7) // h AS cy,
        |    (31*base + 7*x + 13*y + x*y*t + 3*v) % 256
        |    + (17*base + 11*x + 5*y + x*y*(t+2)) % 256
        |    + (23*base + 3*x + 19*y + x*y*(t+5)) % 256 AS lum
        |  FROM dd JOIN g ON g.x < dd.w AND g.y < dd.h),
        |cells AS (SELECT doc_id, cy, cx, CAST(sum(lum) AS BIGINT) AS s,
        |                 CAST(count(*) AS BIGINT) AS c
        |          FROM px GROUP BY 1, 2, 3),
        |grid AS (SELECT d.doc_id, cy.i AS cy, cx.i AS cx
        |         FROM (SELECT DISTINCT doc_id FROM documents) d,
        |              generate_series(0, 6) cy(i), generate_series(0, 8) cx(i)),
        |fc AS (SELECT grid.doc_id, grid.cy, grid.cx,
        |              coalesce(cells.s, 0) AS s, coalesce(cells.c, 0) AS c
        |       FROM grid LEFT JOIN cells
        |         ON grid.doc_id = cells.doc_id AND grid.cy = cells.cy
        |            AND grid.cx = cells.cx),
        |bits AS (
        |  SELECT a.doc_id, a.cy, a.cx,
        |         CASE WHEN a.s * b.c > b.s * a.c THEN 1 ELSE 0 END AS bit
        |  FROM fc a JOIN fc b ON a.doc_id = b.doc_id AND a.cy = b.cy
        |                      AND b.cx = a.cx + 1),
        |sig AS (SELECT doc_id,
        |          CAST(sum(CAST(bit AS BIGINT) << (cy * 8 + cx)) AS BIGINT) AS sig
        |        FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3
        |ORDER BY id_a, id_b""".stripMargin),

    // the serpentine deal replayed as a window (acceptable at oracle
    // scale): 0-based size-desc rank, even pass deals 0..7, odd 7..0
    "q132_x_balanced_shards" ->
      ("""WITH r AS (
        |  SELECT doc_id, n_chars,
        |         row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS rk
        |  FROM documents),
        |s AS (SELECT doc_id, n_chars,
        |        CASE WHEN (rk // 8) % 2 = 0 THEN rk % 8 ELSE 7 - rk % 8 END AS shard
        |      FROM r)
        |SELECT CAST(shard AS INT) AS shard, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       min(doc_id) AS first_doc
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin),

    // q128's counter replay over the event-stream key derivation; the
    // streaming sketch drains to the identical grid because CMS merge
    // is order-independent
    "q133_x_stream_cms" ->
      ("""WITH v AS (
        |  SELECT event_type || ':' || CAST(user_id % 40 AS VARCHAR) AS val
        |  FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |par AS (SELECT * FROM (VALUES (0, 1299709, 104729), (1, 15485863, 1299721),
        |          (2, 32452843, 7919), (3, 49979687, 17389)) t(i, a, b)),
        |h AS (SELECT CAST('0x' || substring(md5(val), 1, 15) AS BIGINT) % 2147483647 AS hm
        |      FROM v),
        |cells AS (
        |  SELECT p.i, ((p.a * h.hm + p.b) % 2147483647) % 1024 AS bucket,
        |         count(*) AS c
        |  FROM h CROSS JOIN par p GROUP BY 1, 2),
        |probes(k) AS (VALUES ('click:7'),('view:23'),('error:0'),('purchase:39'),
        |  ('signup:999')),
        |ph AS (SELECT k, CAST('0x' || substring(md5(k), 1, 15) AS BIGINT) % 2147483647 AS hm
        |       FROM probes),
        |pb AS (SELECT ph.k, p.i, ((p.a * ph.hm + p.b) % 2147483647) % 1024 AS bucket
        |       FROM ph CROSS JOIN par p)
        |SELECT pb.k, min(coalesce(cells.c, 0)) AS n_est
        |FROM pb LEFT JOIN cells ON pb.i = cells.i AND pb.bucket = cells.bucket
        |GROUP BY pb.k
        |ORDER BY pb.k""".stripMargin),

    // compaction must be a pure rewrite: the aggregate off the original
    // table is the oracle for the compacted copy
    "q134_x_compacted_sink" ->
      ("""SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    // binning + first-shared-bin + exact filter == the plain overlap
    // join; the oracle brute-forces it (fine at oracle scale)
    "q135_x_interval_overlap_join" ->
      ("""WITH l AS (
        |  SELECT o_orderkey AS l_key, o_orderpriority AS prio,
        |         CAST(o_orderdate AS DATE) AS l_s,
        |         CAST(o_orderdate AS DATE) + CAST(o_orderkey % 20 AS INT) AS l_e
        |  FROM orders WHERE o_orderkey % 13 = 0),
        |r AS (
        |  SELECT o_orderkey AS r_key, o_orderpriority AS prio,
        |         CAST(o_orderdate AS DATE) AS r_s,
        |         CAST(o_orderdate AS DATE) + CAST(o_orderkey % 15 AS INT) AS r_e
        |  FROM orders WHERE o_orderkey % 17 = 0)
        |SELECT l_key, r_key, prio
        |FROM l JOIN r USING (prio)
        |WHERE l_s <= r_e AND r_s <= l_e
        |ORDER BY l_key, r_key""".stripMargin),

    // exact rank elements via row_number (same element the histogram's
    // first-cum-cross picks — ties collapse to the same value); the
    // clip and tail counts are pure integer arithmetic
    "q136_x_winsorize" ->
      ("""WITH v AS (
        |  SELECT l_returnflag AS g,
        |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM lineitem),
        |n AS (SELECT g, count(*) AS n FROM v GROUP BY g),
        |r AS (SELECT v.g, c, row_number() OVER (PARTITION BY v.g ORDER BY c) AS rn, n.n
        |      FROM v JOIN n USING (g)),
        |b AS (SELECT g,
        |        min(CASE WHEN rn = (50 * n + 999) // 1000 THEN c END) AS lo,
        |        min(CASE WHEN rn = (950 * n + 999) // 1000 THEN c END) AS hi
        |      FROM r GROUP BY g)
        |SELECT v.g AS l_returnflag, count(*) AS n,
        |  CAST(sum(least(greatest(c, lo), hi)) AS BIGINT) AS sum_clipped,
        |  CAST(sum(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(sum(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM v JOIN b USING (g)
        |GROUP BY v.g
        |ORDER BY v.g""".stripMargin),

    "q137_x_set_ops" ->
      ("""WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 0),
        |b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 3 = 0),
        |u AS (
        |  SELECT 'intersect' AS op, o_custkey
        |  FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |  UNION ALL
        |  SELECT 'except' AS op, o_custkey
        |  FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
        |SELECT op, count(*) AS n, min(o_custkey) AS min_key,
        |       max(o_custkey) AS max_key
        |FROM u GROUP BY op ORDER BY op""".stripMargin),

    // string-cast min/max: bytewise order agrees across engines, and a
    // profile's range is for eyeballing, not arithmetic
    "q138_x_profile" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderpriority").map(c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
          |  count(*) - count($c) AS n_null,
          |  count(DISTINCT $c) AS n_distinct,
          |  min(CAST($c AS VARCHAR)) AS min_value,
          |  max(CAST($c AS VARCHAR)) AS max_value FROM orders""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

    // the same blocked join: 3-char-prefix equality + length band +
    // exact levenshtein — the blocking IS the operator contract (q60's
    // convention: the oracle replays the algorithm, not a different one)
    "q139_x_fuzzy_join" ->
      ("""WITH c AS (
        |  SELECT p_partkey AS c_key,
        |         3 + p_partkey % (length(p_name) - 3) AS pos, p_name
        |  FROM part WHERE p_partkey % 4 = 0),
        |cc AS (SELECT c_key,
        |         substring(p_name, 1, pos) || substring(p_name, pos + 2) AS c_name
        |       FROM c),
        |cand AS (
        |  SELECT cc.c_key, p.p_partkey,
        |         levenshtein(cc.c_name, p.p_name) AS edit_dist
        |  FROM cc JOIN part p
        |    ON substring(cc.c_name, 1, 3) = substring(p.p_name, 1, 3)
        |  WHERE abs(length(cc.c_name) - length(p.p_name)) <= 2)
        |SELECT c_key, p_partkey, CAST(edit_dist AS INT) AS edit_dist
        |FROM cand WHERE edit_dist <= 2
        |ORDER BY c_key, p_partkey""".stripMargin),

    // KMV replayed exactly: k-th smallest distinct 60-bit hash per group
    // (the sketch's kept set is deterministic and order-independent);
    // below-k groups report the exact count. (k-1)·2^60 is mantissa-exact
    // and the division one IEEE op, so even n_est hash-matches
    "q122_x_kmv_distinct" ->
      ("""WITH h AS (
        |  SELECT DISTINCT o_orderpriority,
        |    CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT) AS hk
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |r AS (SELECT o_orderpriority, hk,
        |        row_number() OVER (PARTITION BY o_orderpriority ORDER BY hk) AS rn,
        |        count(*) OVER (PARTITION BY o_orderpriority) AS nd
        |      FROM h)
        |SELECT o_orderpriority,
        |  CASE WHEN nd >= 128
        |       THEN floor((127.0 * 1152921504606846976.0 / hk) * 100.0 + 0.5) / 100.0
        |       ELSE CAST(nd AS DOUBLE) END AS n_est,
        |  hk AS kth_hash,
        |  CAST(LEAST(nd, 128) AS INT) AS n_kept
        |FROM r WHERE rn = LEAST(nd, 128)
        |ORDER BY o_orderpriority""".stripMargin),

    "q123_x_pagerank" -> pageRankSql(iters = 3),

    // the identical degree-ordered orientation: every triangle is one
    // strict (degree, node) chain a<b<c, counted once as a wedge at a
    // closed by the oriented edge b->c; row-value comparisons replay
    // Spark's struct ordering
    "q126_x_triangle_count" ->
      ("""WITH raw AS (
        |  SELECT CAST(o_orderkey % 1013 AS VARCHAR) AS s,
        |         CAST((o_orderkey * 7 + o_custkey) % 1013 AS VARCHAR) AS t
        |  FROM orders),
        |und AS (
        |  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
        |  FROM raw WHERE s <> t AND s IS NOT NULL AND t IS NOT NULL),
        |deg AS (
        |  SELECT node, count(*) AS d FROM (
        |    SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und)
        |  GROUP BY node),
        |oriented AS (
        |  SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS lo,
        |         CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS hi,
        |         CASE WHEN (da.d, u.a) < (db.d, u.b) THEN db.d ELSE da.d END AS dhi
        |  FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node),
        |wedges AS (
        |  SELECT e1.lo AS u, e1.hi AS v, e2.hi AS w
        |  FROM oriented e1 JOIN oriented e2 ON e1.lo = e2.lo
        |  WHERE (e1.dhi, e1.hi) < (e2.dhi, e2.hi)),
        |tris AS (
        |  SELECT u, v, w FROM wedges
        |  JOIN oriented e3 ON wedges.v = e3.lo AND wedges.w = e3.hi)
        |SELECT node, count(*) AS n_tri FROM (
        |  SELECT u AS node FROM tris
        |  UNION ALL SELECT v AS node FROM tris
        |  UNION ALL SELECT w AS node FROM tris)
        |GROUP BY node ORDER BY node""".stripMargin),

    // the same five spread rounds (standard Morton bit-spreading masks)
    // as a CTE chain — integer-exact in any engine with & | <<
    "q124_x_zorder_morton" ->
      ("""WITH pts AS (SELECT o_orderkey, o_custkey % 2048 AS x, o_orderkey % 2048 AS y
        |             FROM orders WHERE o_orderkey % 7 = 0),
        |s0 AS (SELECT o_orderkey, x & 4294967295 AS vx, y & 4294967295 AS vy FROM pts),
        |s1 AS (SELECT o_orderkey, (vx | (vx << 16)) & 281470681808895 AS vx,
        |               (vy | (vy << 16)) & 281470681808895 AS vy FROM s0),
        |s2 AS (SELECT o_orderkey, (vx | (vx << 8)) & 71777214294589695 AS vx,
        |               (vy | (vy << 8)) & 71777214294589695 AS vy FROM s1),
        |s3 AS (SELECT o_orderkey, (vx | (vx << 4)) & 1085102592571150095 AS vx,
        |               (vy | (vy << 4)) & 1085102592571150095 AS vy FROM s2),
        |s4 AS (SELECT o_orderkey, (vx | (vx << 2)) & 3689348814741910323 AS vx,
        |               (vy | (vy << 2)) & 3689348814741910323 AS vy FROM s3),
        |s5 AS (SELECT o_orderkey, (vx | (vx << 1)) & 6148914691236517205 AS vx,
        |               (vy | (vy << 1)) & 6148914691236517205 AS vy FROM s4)
        |SELECT o_orderkey, vx | (vy << 1) AS zval FROM s5
        |ORDER BY o_orderkey""".stripMargin),

    // q100's rebuild with the dup set replaced by the HELD-OUT gram set
    // (doc_id % 5 split, q115's convention); grams compare as strings
    // where the engine compares 60-bit hashes — the q98 collision caveat
    "q125_x_cross_span_excision" ->
      ("""WITH t AS (
        |  SELECT doc_id, text, CASE WHEN text IS NULL OR length(trim(text)) = 0
        |         THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        |  FROM documents),
        |b AS (SELECT doc_id, toks FROM t WHERE doc_id % 5 <> 0),
        |hb AS (SELECT doc_id, toks FROM t WHERE doc_id % 5 = 0),
        |g AS (SELECT doc_id, unnest(range(1, len(toks) - 3)) AS i, toks
        |      FROM b WHERE len(toks) >= 5),
        |gg AS (SELECT doc_id, i - 1 AS pos, array_to_string(toks[i : i + 4], ' ') AS gram FROM g),
        |hg AS (SELECT unnest(range(1, len(toks) - 3)) AS i, toks
        |       FROM hb WHERE len(toks) >= 5),
        |hgg AS (SELECT DISTINCT array_to_string(toks[i : i + 4], ' ') AS gram FROM hg),
        |dp AS (SELECT doc_id, pos FROM gg JOIN hgg USING (gram)),
        |cover AS (SELECT DISTINCT doc_id, p FROM
        |  (SELECT doc_id, unnest(generate_series(pos, pos + 4)) AS p FROM dp)),
        |tp AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok FROM
        |  (SELECT doc_id, unnest(generate_series(1, len(toks))) AS i, toks FROM b)),
        |kept AS (
        |  SELECT tp.doc_id, tp.pos, tp.tok FROM tp
        |  LEFT JOIN cover c ON tp.doc_id = c.doc_id AND tp.pos = c.p
        |  WHERE c.p IS NULL),
        |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean
        |        FROM kept GROUP BY doc_id),
        |rem AS (SELECT doc_id, count(*) AS n_removed FROM cover GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(rem.n_removed, 0) AS BIGINT) AS n_removed,
        |  CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(agg.text_clean, '') END AS text_clean
        |FROM documents d
        |LEFT JOIN agg ON d.doc_id = agg.doc_id
        |LEFT JOIN rem ON d.doc_id = rem.doc_id
        |WHERE d.doc_id % 5 <> 0
        |ORDER BY d.doc_id""".stripMargin),

    // bucketing changes the PLAN, not the answer: the oracle is the plain
    // join + aggregate (integer-cents sum; one division at the end)
    "q118_x_bucketed_join" ->
      ("""SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(round(o_totalprice * 100)) / 100.0, 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // AR(1) CLS fit mirrored with Spark's exact normal-equation formulas
    // (beta = inv(X'X)X'y expanded for the 2x2 case) and the forecast
    // recursion f(h) = c + a·f(h-1) as a recursive CTE — same op order as
    // TimeSeriesStats.forecastAr, so 4-decimal rounding is stable.
    "q117_u8_ar1_forecast" ->
      ("""WITH RECURSIVE m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(round(o_totalprice * 100)) / 1e8, 6) AS y
        |  FROM orders GROUP BY 1),
        |o AS (SELECT row_number() OVER (ORDER BY month) AS t, y FROM m),
        |p AS (SELECT a.y AS yt, b.y AS yl FROM o a JOIN o b ON b.t = a.t - 1),
        |f AS (SELECT CAST(count(*) AS DOUBLE) AS cnt, sum(yt) AS sy, sum(yl) AS sx,
        |             sum(yt*yl) AS sxy, sum(yl*yl) AS sxx FROM p),
        |c AS (SELECT (sxx*sy - sx*sxy) / (cnt*sxx - sx*sx) AS c0,
        |             (cnt*sxy - sx*sy) / (cnt*sxx - sx*sx) AS a1 FROM f),
        |l AS (SELECT y AS ylast FROM o ORDER BY t DESC LIMIT 1),
        |rec AS (
        |  SELECT 0 AS step, ylast AS fv FROM l
        |  UNION ALL
        |  SELECT rec.step + 1, c.c0 + c.a1 * rec.fv FROM rec, c WHERE rec.step < 12)
        |SELECT 'all' AS key, 1 AS "order", CAST(step AS INT) AS step,
        |       round(fv, 4) AS forecast
        |FROM rec WHERE step >= 1 ORDER BY step""".stripMargin),

    // SARX(1) CLS: the 3x3 normal equations solved by the IDENTICAL det3
    // cofactor expansion the Spark kernel spells (term-for-term), then
    // the hold-last-exog recursion f(h) = c + a·f(h-1) + b·x_T as a
    // recursive CTE — same IEEE op order as Diagnostics.sarxForecast
    "q336_u8_sarx1_forecast" ->
      ("""WITH RECURSIVE m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(round(o_totalprice * 100)) / 1e8, 6) AS y,
        |         round(count(*) / 1e3, 6) AS xv
        |  FROM orders GROUP BY 1),
        |o AS (SELECT row_number() OVER (ORDER BY month) AS t, y, xv FROM m),
        |p AS (SELECT a.y AS yt, b.y AS yl, a.xv AS xt
        |      FROM o a JOIN o b ON b.t = a.t - 1),
        |f AS (SELECT CAST(count(*) AS DOUBLE) AS cnt, sum(yl) AS sl,
        |             sum(xt) AS sx, sum(yt) AS sy,
        |             sum(yl*yl) AS sll, sum(yl*xt) AS slx, sum(xt*xt) AS sxx,
        |             sum(yl*yt) AS sly, sum(xt*yt) AS sxy FROM p),
        |c AS (SELECT
        |    (cnt*(sll*sxx - slx*slx) - sl*(sl*sxx - slx*sx)
        |       + sx*(sl*slx - sll*sx)) AS det,
        |    (sy*(sll*sxx - slx*slx) - sl*(sly*sxx - slx*sxy)
        |       + sx*(sly*slx - sll*sxy)) AS detc,
        |    (cnt*(sly*sxx - slx*sxy) - sy*(sl*sxx - slx*sx)
        |       + sx*(sl*sxy - sly*sx)) AS deta,
        |    (cnt*(sll*sxy - sly*slx) - sl*(sl*sxy - sly*sx)
        |       + sy*(sl*slx - sll*sx)) AS detb
        |  FROM f),
        |k AS (SELECT detc/det AS c0, deta/det AS a1, detb/det AS b1 FROM c),
        |nn AS (SELECT CAST(count(*) AS INT) AS n_obs FROM o),
        |l AS (SELECT y AS ylast, xv AS xlast FROM o ORDER BY t DESC LIMIT 1),
        |rec AS (
        |  SELECT 0 AS step, ylast AS fv FROM l
        |  UNION ALL
        |  SELECT rec.step + 1, k.c0 + k.a1 * rec.fv + k.b1 * l.xlast
        |  FROM rec, k, l WHERE rec.step < 12)
        |SELECT 'all' AS key, nn.n_obs,
        |       round(k.c0, 6) AS intercept, round(k.a1, 6) AS ar_coef,
        |       round(k.b1, 6) AS exog_coef,
        |       CAST(step AS INT) AS step, round(fv, 4) AS forecast
        |FROM rec, k, nn WHERE step >= 1 ORDER BY step""".stripMargin),

    "q48_x_ngram_jaccard" ->
      ("""WITH toks AS (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS tok FROM documents),
        |sizes AS (SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 50
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, round(CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter), 4) AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        |WHERE CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin),

    "q55_x_embed_neardup" -> {
      def dot(l: String, r: String) =
        s"list_sum(list_transform(generate_series(1, 64), i -> CAST($l.embedding[i] AS DOUBLE) * CAST($r.embedding[i] AS DOUBLE)))"
      val cos = s"round(${dot("a", "b")} / nullif(sqrt(${dot("a", "a")}) * sqrt(${dot("b", "b")}), 0), 4)"
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, $cos AS cos_sim
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE $cos >= 0.4 ORDER BY id_a, id_b""".stripMargin
    },

    "q49_x_cosine_topk" ->
      (s"""WITH scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, $CosSimSql AS cos_sim
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 32 AND c.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 3
        |ORDER BY query_id, rank""".stripMargin),

    "q50_x_json_extract" ->
      ("SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events ORDER BY event_id"),

    "q53_x_multimodal_meta" ->
      ("""WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS payload_bytes, md5(text) AS payload_digest,
        |         CAST(640 + doc_id % 1280 AS INT) AS w, CAST(360 + doc_id % 720 AS INT) AS h,
        |         CAST(n_chars % 7 * 50 AS INT) AS n_frames
        |  FROM documents),
        |r AS (
        |  SELECT *, least(1.0, 960.0 / greatest(w, h)) AS scale FROM m)
        |SELECT doc_id, payload_bytes, payload_digest,
        |  CAST(round(w * scale) AS INT) AS out_width,
        |  CAST(round(h * scale) AS INT) AS out_height,
        |  CAST(least(n_frames, 4) AS BIGINT) AS n_sampled,
        |  CASE WHEN n_frames <= 0 THEN NULL
        |       WHEN n_frames <= 4 THEN n_frames - 1
        |       ELSE CAST(floor(3 * n_frames / 4) AS INT) END AS last_frame
        |FROM r ORDER BY doc_id""".stripMargin),

    // replays the planted-image pixel formulas in closed form (the BMP
    // fixture is lossless, so decoded pixels == planted pixels); the grid is
    // the constant 16x12 max image size filtered per-doc because DuckDB's
    // generate_series takes no lateral column bounds. Integer sums ride
    // exact; the one double (mean luminance) is floor(x+0.5)-quantized.
    "q54_x_media_features" ->
      ("""WITH d AS (
        |  SELECT doc_id, CAST(8 + doc_id % 9 AS BIGINT) AS width,
        |         CAST(6 + doc_id % 7 AS BIGINT) AS height FROM documents),
        |g AS (SELECT x.i AS x, y.i AS y
        |      FROM generate_series(0, 15) x(i), generate_series(0, 11) y(i)),
        |s AS (
        |  SELECT d.doc_id, d.width, d.height,
        |    CAST(sum((31*d.doc_id + 7*g.x + 13*g.y) % 256) AS BIGINT) AS sum_r,
        |    CAST(sum((17*d.doc_id + 11*g.x + 5*g.y) % 256) AS BIGINT) AS sum_g,
        |    CAST(sum((23*d.doc_id + 3*g.x + 19*g.y) % 256) AS BIGINT) AS sum_b
        |  FROM d JOIN g ON g.x < d.width AND g.y < d.height
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, width, height, sum_r, sum_g, sum_b,
        |  CAST(floor((sum_r + sum_g + sum_b) * 10000.0
        |    / (3.0 * width * height) + 0.5) AS BIGINT) AS mean_lum_x10k
        |FROM s ORDER BY doc_id""".stripMargin),

    "q56_x_stream_sessions" -> {
      val gapMicros = 3L * 24 * 60 * 60 * 1000000
      // epoch_us is exact int64; epoch_ns/1000 would round-trip through a
      // double and lose the low digits. DuckDB truncates parquet NANOS to
      // micros on read, matching the Spark side's `ts div 1000`.
      s"""WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tsu, value FROM events),
        |m AS (
        |  SELECT *, CASE WHEN tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu) > $gapMicros
        |                 THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tsu
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM m),
        |agg AS (
        |  SELECT user_id, sess, min(tsu) AS session_start, max(tsu) AS session_end,
        |         CAST(count(*) AS INT) AS n_events, round(sum(value), 2) AS sum_value
        |  FROM s GROUP BY 1, 2),
        |last AS (SELECT user_id, max(sess) AS mx FROM agg GROUP BY 1)
        |SELECT a.user_id, a.session_start, a.session_end, a.n_events, a.sum_value
        |FROM agg a JOIN last l ON a.user_id = l.user_id AND a.sess < l.mx
        |ORDER BY a.user_id, a.session_start""".stripMargin
    },

    "q51_x_stream_weekly" ->
      ("""WITH e AS (
        |  SELECT CAST(CAST(to_timestamp(CAST(floor(epoch(ts) / 604800) * 604800 AS BIGINT)) AS TIMESTAMP) AS DATE) AS week,
        |         event_type, value
        |  FROM events)
        |SELECT week, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // mirrors Corpus.bm25's exact operation order (left-assoc products,
    // Lucene-floor idf); dl sums are integer-valued doubles, so avgdl is
    // bit-identical across engines
    "q70_x_bm25" ->
      ("""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        |  FROM documents),
        |base AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks FROM t),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM base),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf, max(dl) AS dl
        |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM base)
        |  WHERE term IN ('join', 'scan', 'window') GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
        |SELECT doc_id,
        |  round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1.0)
        |        / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
        |FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    "q71_x_contamination" ->
      ("""WITH t AS (
        |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source,
        |    unnest(CASE WHEN len(toks) >= 3
        |           THEN list_transform(generate_series(1, len(toks) - 2),
        |                  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |           ELSE CAST([] AS VARCHAR[]) END) AS gram
        |  FROM t),
        |tg AS (SELECT DISTINCT gram FROM g WHERE source = 'src0')
        |SELECT doc_id, count(*) AS n_hits, count(DISTINCT gram) AS n_grams_hit
        |FROM g JOIN tg USING (gram) WHERE source != 'src0'
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    "q72_x_hash_sample" ->
      (s"""SELECT doc_id, source, n_chars FROM documents
        |WHERE ${dkHash32("CAST(doc_id AS VARCHAR)")} % 10 < 3
        |ORDER BY doc_id""".stripMargin),

    "q73_x_topk_stratum" ->
      ("""WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents)
        |SELECT doc_id, source, n_chars, rank FROM r WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin),

    // floor() not CAST for bin: DuckDB CAST(double AS BIGINT) rounds,
    // Spark's cast truncates; starts are non-negative so floor == truncate
    "q74_x_pack_sequences" ->
      ("""WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents),
        |w AS (
        |  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS strt
        |  FROM t)
        |SELECT source, doc_id, n_tokens,
        |  CAST(floor(strt / 64.0) AS BIGINT) AS bin,
        |  CAST(strt % 64 AS BIGINT) AS pos_in_bin
        |FROM w ORDER BY source, doc_id""".stripMargin),

    "q75_x_top_ngrams" ->
      ("""WITH t AS (
        |  SELECT CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        |  FROM documents),
        |g AS (
        |  SELECT unnest(CASE WHEN len(toks) >= 2
        |         THEN list_transform(generate_series(1, len(toks) - 1),
        |                i -> concat_ws(' ', toks[i], toks[i+1]))
        |         ELSE CAST([] AS VARCHAR[]) END) AS ngram
        |  FROM t)
        |SELECT ngram, count(*) AS n FROM g GROUP BY 1
        |ORDER BY n DESC, ngram LIMIT 25""".stripMargin),

    // the aggregate path rides the score as double — cast to match
    "q76_x_topk_agg" ->
      ("""WITH r AS (
        |  SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents)
        |SELECT source, doc_id, n_chars, rank FROM r WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin),

    "q77_x_asof_join" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(o_totalprice), 2) AS tot, count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT o_orderpriority, month, tot FROM m WHERE n >= 45),
        |l AS (SELECT o_orderkey, o_orderpriority, o_orderdate FROM orders
        |      WHERE o_orderkey % 97 = 0)
        |SELECT l.o_orderkey, l.o_orderpriority, l.o_orderdate, r.tot,
        |       r.month AS asof_month
        |FROM l ASOF JOIN r
        |  ON l.o_orderpriority = r.o_orderpriority AND l.o_orderdate >= r.month
        |ORDER BY o_orderkey""".stripMargin),

    "q80_x_repetition" ->
      (s"""$RepCtes
        |SELECT d.doc_id, coalesce(ls.n_lines, 0) AS n_lines,
        |  round(ls.dlf, 4) AS dup_line_frac,
        |  round(ls.dlcf, 4) AS dup_line_char_frac,
        |  round(CAST(t2.cov AS DOUBLE) / tc.tot, 4) AS top_2gram_char_frac,
        |  round(d5.cov / tc.tot, 4) AS dup_5gram_char_frac
        |FROM documents d
        |LEFT JOIN ls USING (doc_id) LEFT JOIN tc USING (doc_id)
        |LEFT JOIN t2 USING (doc_id) LEFT JOIN d5 USING (doc_id)
        |ORDER BY doc_id""".stripMargin),

    "q84_x_gopher_filter" ->
      (s"""$RepCtes
        |SELECT d.doc_id, d.source, d.n_chars
        |FROM documents d
        |LEFT JOIN ls USING (doc_id) LEFT JOIN tc USING (doc_id)
        |LEFT JOIN t2 USING (doc_id) LEFT JOIN d5 USING (doc_id)
        |WHERE coalesce(ls.dlf, 0.0) <= 0.12
        |  AND coalesce(CAST(t2.cov AS DOUBLE) / tc.tot, 0.0) <= 0.09
        |  AND coalesce(d5.cov / tc.tot, 0.0) <= 0.05
        |ORDER BY doc_id""".stripMargin),

    "q85_x_jsonl_roundtrip" ->
      ("""SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
        |FROM documents GROUP BY source ORDER BY source""".stripMargin),

    "q86_x_perplexity" ->
      ("""WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents WHERE length(trim(text)) > 0),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM tok GROUP BY 1, 2),
        |cnt AS (SELECT term, sum(tf) AS c FROM tf GROUP BY 1),
        |vocab AS (SELECT term, c FROM cnt WHERE c >= 2),
        |st AS (
        |  SELECT sum(c) AS n_total,
        |    sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS v_size,
        |    coalesce(sum(CASE WHEN c < 2 THEN c END), 0) AS oov_c
        |  FROM cnt)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round(sum(tf * -ln((coalesce(v.c, st.oov_c) + 0.5)
        |        / (st.n_total + 0.5 * (st.v_size + 1)))) / sum(tf), 4) AS avg_nll
        |FROM tf LEFT JOIN vocab v USING (term) CROSS JOIN st
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // integer-exact mixture math (DuckDB // is BIGINT floor division,
    // mirroring Spark's DIV) — no float floor() to flip across engines
    "q87_x_domain_mix" ->
      (s"""WITH w(source, wt) AS (
        |  VALUES ('src0', 5), ('src1', 3), ('src2', 1), ('src3', 1)),
        |cnt AS (
        |  SELECT source, count(*) AS c FROM documents GROUP BY 1),
        |j AS (SELECT source, c, wt FROM cnt JOIN w USING (source)),
        |t AS (SELECT min(c * 10 // wt) AS t FROM j),
        |r AS (
        |  SELECT source, (t.t * wt * 10000) // (10 * c) AS keep
        |  FROM j CROSS JOIN t)
        |SELECT d.doc_id, d.source, d.n_chars
        |FROM documents d JOIN r USING (source)
        |WHERE ${dkHash32("CAST(doc_id AS VARCHAR)")} % 10000 < r.keep
        |ORDER BY doc_id""".stripMargin),

    "q88_x_importance_score" ->
      ("""WITH tok AS (
        |  SELECT doc_id, lang,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents WHERE length(trim(text)) > 0),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM tok GROUP BY 1, 2),
        |ttf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM tok WHERE lang = 'de' GROUP BY 1, 2),
        |cc AS (SELECT term, sum(tf) AS c FROM tf GROUP BY 1),
        |tc AS (SELECT term, sum(tf) AS c FROM ttf GROUP BY 1),
        |cv AS (SELECT term, c AS c_c FROM cc WHERE c >= 2),
        |tv AS (SELECT term, c AS c_t FROM tc WHERE c >= 2),
        |cs AS (
        |  SELECT sum(c) AS n_c,
        |    sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS v_c,
        |    coalesce(sum(CASE WHEN c < 2 THEN c END), 0) AS oov_c FROM cc),
        |ts AS (
        |  SELECT sum(c) AS n_t,
        |    sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS v_t,
        |    coalesce(sum(CASE WHEN c < 2 THEN c END), 0) AS oov_t FROM tc)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round(sum(tf * (
        |    ln((coalesce(tv.c_t, ts.oov_t) + 0.5) / (ts.n_t + 0.5 * (ts.v_t + 1))) -
        |    ln((coalesce(cv.c_c, cs.oov_c) + 0.5) / (cs.n_c + 0.5 * (cs.v_c + 1))))), 4)
        |    AS log_ratio
        |FROM tf LEFT JOIN cv USING (term) LEFT JOIN tv USING (term)
        |CROSS JOIN cs CROSS JOIN ts
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    "q89_x_curriculum_bins" ->
      ("""WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents WHERE length(trim(text)) > 0),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM tok GROUP BY 1, 2),
        |cnt AS (SELECT term, sum(tf) AS c FROM tf GROUP BY 1),
        |vocab AS (SELECT term, c FROM cnt WHERE c >= 2),
        |st AS (
        |  SELECT sum(c) AS n_total,
        |    sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS v_size,
        |    coalesce(sum(CASE WHEN c < 2 THEN c END), 0) AS oov_c
        |  FROM cnt),
        |nll AS (
        |  SELECT doc_id,
        |    round(sum(tf * -ln((coalesce(v.c, st.oov_c) + 0.5)
        |          / (st.n_total + 0.5 * (st.v_size + 1)))) / sum(tf), 4) AS avg_nll
        |  FROM tf LEFT JOIN vocab v USING (term) CROSS JOIN st
        |  GROUP BY doc_id)
        |SELECT d.doc_id, d.source, nll.avg_nll,
        |  CAST(ntile(4) OVER (PARTITION BY d.source
        |    ORDER BY nll.avg_nll ASC, d.doc_id ASC) AS INT) AS bin
        |FROM documents d JOIN nll USING (doc_id)
        |ORDER BY doc_id""".stripMargin),

    "q90_x_range_join" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS w_start,
        |    last_day(CAST(date_trunc('month', o_orderdate) AS DATE)) AS w_end,
        |    round(sum(o_totalprice), 2) AS tot
        |  FROM orders GROUP BY 1, 2),
        |l AS (
        |  SELECT o_orderkey, o_orderpriority, o_orderdate FROM orders
        |  WHERE o_orderkey % 97 = 0)
        |SELECT l.o_orderkey, l.o_orderpriority, l.o_orderdate, m.tot
        |FROM l JOIN m ON l.o_orderpriority = m.o_orderpriority
        |  AND l.o_orderdate BETWEEN m.w_start AND m.w_end
        |ORDER BY o_orderkey""".stripMargin),

    "q91_x_partitioned_sink" ->
      ("""SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE source = 'src3'
        |GROUP BY lang ORDER BY lang""".stripMargin),

    // DuckDB list slices are 1-based inclusive (toks[a:b] = tokens a..b,
    // clamped), matching Spark's 1-based length-clamped slice()
    "q95_x_chunk_docs" ->
      ("""WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents WHERE length(trim(text)) > 0),
        |c AS (
        |  SELECT doc_id, toks,
        |    unnest(range(0, (len(toks) - 1) // 24 + 1)) AS k
        |  FROM t)
        |SELECT doc_id, CAST(k AS INT) AS chunk_id,
        |  CAST(least(32, len(toks) - k * 24) AS INT) AS n_tokens,
        |  array_to_string(toks[k*24+1 : k*24+32], ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin),

    // identical to q85's oracle: the round-trip contract is that the ORC
    // staging copy aggregates exactly like the parquet original
    "q96_x_orc_roundtrip" ->
      ("""SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
        |FROM documents GROUP BY source ORDER BY source""".stripMargin),

    // exact formula replay: scale = maxAbs/127, codes = clamped
    // floor(x/scale + 0.5), dequant stays double — both engines do the
    // same double arithmetic, rounding only smooths summation order
    "q97_x_embed_quantize" -> {
      def lsum(body: String) =
        s"list_sum(list_transform(generate_series(1, 64), i -> $body))"
      (s"""WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, embedding, scale,
        |    list_transform(embedding, x -> CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE)
        |      ELSE greatest(-127.0, least(127.0, floor(CAST(x AS DOUBLE) / scale + 0.5))) END
        |      * scale) AS deq
        |  FROM s)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  round(list_max(list_transform(generate_series(1, 64),
        |    i -> abs(CAST(embedding[i] AS DOUBLE) - deq[i]))), 6) AS max_abs_err,
        |  round(${lsum("CAST(embedding[i] AS DOUBLE) * deq[i]")}
        |    / nullif(sqrt(${lsum("CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)")})
        |        * sqrt(${lsum("deq[i] * deq[i]")}), 0), 4) AS cos_fidelity
        |FROM q ORDER BY vec_id""".stripMargin)
    },

    // groups by the gram STRING where the engine groups by its 60-bit md5
    // hash — identical up to a ~4e-7 collision probability at 1M grams;
    // covered_tokens via count(DISTINCT covered position) == the engine's
    // analytic interval union
    "q98_x_dup_ngram_coverage" ->
      (s"""$DupGramCtes,
        |cov AS (
        |  SELECT doc_id, count(DISTINCT pos) AS dup_grams,
        |    count(DISTINCT p) AS covered_tokens
        |  FROM (SELECT doc_id, pos, unnest(generate_series(pos, pos + 4)) AS p FROM dp)
        |  GROUP BY doc_id)
        |SELECT b.doc_id, CAST(b.n_tokens AS INT) AS n_tokens,
        |  CAST(coalesce(cov.dup_grams, 0) AS BIGINT) AS dup_grams,
        |  CAST(coalesce(cov.covered_tokens, 0) AS BIGINT) AS covered_tokens,
        |  round(CASE WHEN b.n_tokens = 0 THEN 0.0
        |    ELSE coalesce(cov.covered_tokens, 0) / CAST(b.n_tokens AS DOUBLE) END, 4) AS dup_frac
        |FROM b LEFT JOIN cov USING (doc_id) ORDER BY doc_id""".stripMargin),

    // kept tokens = positions outside the covered set; string_agg ORDER BY
    // pos rebuilds with the same single-space normalization as the engine
    "q100_x_remove_dup_spans" ->
      (s"""$DupGramCtes,
        |cover AS (SELECT DISTINCT doc_id, p FROM
        |  (SELECT doc_id, unnest(generate_series(pos, pos + 4)) AS p FROM dp)),
        |tp AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok FROM
        |  (SELECT doc_id, unnest(generate_series(1, len(toks))) AS i, toks FROM b)),
        |kept AS (
        |  SELECT tp.doc_id, tp.pos, tp.tok FROM tp
        |  LEFT JOIN cover c ON tp.doc_id = c.doc_id AND tp.pos = c.p
        |  WHERE c.p IS NULL),
        |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_clean
        |        FROM kept GROUP BY doc_id),
        |rem AS (SELECT doc_id, count(*) AS n_removed FROM cover GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(rem.n_removed, 0) AS BIGINT) AS n_removed,
        |  CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(agg.text_clean, '') END AS text_clean
        |FROM documents d
        |LEFT JOIN agg ON d.doc_id = agg.doc_id
        |LEFT JOIN rem ON d.doc_id = rem.doc_id
        |ORDER BY d.doc_id""".stripMargin),

    "q101_x_token_budget" ->
      (s"""WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_tokens,
        |    ${dkHash32("CAST(doc_id AS VARCHAR)")} AS rk
        |  FROM documents),
        |c AS (
        |  SELECT *, sum(CAST(n_tokens AS BIGINT)) OVER (PARTITION BY source
        |    ORDER BY rk, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, source, n_tokens FROM c WHERE cum <= 2000
        |ORDER BY doc_id""".stripMargin),

    "q99_x_stream_join" ->
      ("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  round(p.value, 2) AS purchase_value
        |FROM events c JOIN events p
        |  ON c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.user_id = c.user_id AND p.ts >= c.ts
        | AND p.ts <= c.ts + INTERVAL 60 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin),

    "q102_x_stream_static_join" ->
      ("""WITH ua AS (SELECT user_id, avg(value) AS user_avg FROM events GROUP BY 1)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(abs(e.value - ua.user_avg)), 2) AS sum_absdev
        |FROM events e JOIN ua USING (user_id)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin),

    // the lined derivation with the q103 punct CASE, then the C4 rules
    // replayed with list_filter: terminal punct, >= 2 words, no "spark",
    // >= 5 surviving lines
    "q103_x_c4_line_clean" ->
      ("""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        |  FROM documents),
        |pl AS (
        |  SELECT doc_id,
        |    list_transform(range(0, CAST(ceil(len(toks) / 2.0) AS BIGINT)),
        |      i -> array_to_string(toks[i*2+1:i*2+2], ' ') ||
        |           CASE WHEN (doc_id + i) % 3 = 0 THEN '.'
        |                WHEN (doc_id + i) % 3 = 2 THEN '!'
        |                ELSE '' END) AS la
        |  FROM t),
        |f AS (
        |  SELECT doc_id,
        |    list_filter(la, x -> regexp_matches(x, '[.!?"]$')
        |      AND len(regexp_split_to_array(trim(x), '\s+')) >= 2
        |      AND NOT contains(lower(x), 'spark')) AS kept,
        |    len(la) AS n_lines
        |  FROM pl)
        |SELECT f.doc_id, CAST(len(kept) AS BIGINT) AS n_lines_kept,
        |  CAST(n_lines - len(kept) AS BIGINT) AS n_lines_dropped,
        |  array_to_string(kept, chr(10)) AS clean_text
        |FROM f JOIN pl ON f.doc_id = pl.doc_id
        |WHERE len(kept) >= 5
        |  AND NOT contains(lower(array_to_string(pl.la, chr(10))), 'lorem ipsum')
        |ORDER BY f.doc_id""".stripMargin),

    // DuckDB's native strip_accents/nfc_normalize compose to the same
    // canonical form as the JVM kernel (NFD → drop marks → NFC → lower →
    // collapse \s+ → trim); planted tokens are the only non-ASCII content
    "q104_x_normalize_text" ->
      ("""WITH p AS (
        |  SELECT doc_id,
        |    text || ' ' ||
        |      (['Café', 'naïve', 'Ünïcôde', 'résumé'])[CAST(doc_id % 4 AS INT) + 1] AS praw
        |  FROM documents),
        |n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(strip_accents(nfc_normalize(praw))),
        |      '\s+', ' ', 'g')) AS norm_text
        |  FROM p)
        |SELECT doc_id, norm_text, CAST(length(norm_text) AS BIGINT) AS n_chars_norm
        |FROM n ORDER BY doc_id""".stripMargin),

    // identical to q96's oracle: the XML staging copy must aggregate
    // exactly like the parquet original
    "q105_x_xml_roundtrip" ->
      ("""SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
        |FROM documents GROUP BY source ORDER BY source""".stripMargin),

    // q79's component labels + left join (singletons = own cluster) +
    // argmax-by-(n_tokens, min id) window — the same representative rule
    // as Dedup.dedupByQuality
    "q106_x_dedup_best" ->
      s"""$DupReachCte,
        |labels AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        |  FROM reach GROUP BY src),
        |sc AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents),
        |j AS (
        |  SELECT s.doc_id, coalesce(l.cluster_id, s.doc_id) AS cluster_id, s.n_tokens
        |  FROM sc s LEFT JOIN labels l USING (doc_id)),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY n_tokens DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY cluster_id) AS cnt
        |  FROM j)
        |SELECT doc_id, cluster_id, CAST(cnt AS BIGINT) AS n_members, n_tokens
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // per-dimension quantized integer sums (floor(x*1e6 + 0.5), exact in
    // any order) + one double division of two exact integers — the mean
    // is bit-identical across engines with no rounding knife-edge
    "q107_x_vector_centroid" ->
      ("""WITH x AS (
        |  SELECT label AS grp, unnest(embedding) AS e,
        |         generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings),
        |q AS (
        |  SELECT grp, dim,
        |    CAST(floor(CAST(e AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS eq
        |  FROM x)
        |SELECT grp, CAST(dim AS INT) AS dim, CAST(sum(eq) AS BIGINT) AS sum_q,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(eq) AS DOUBLE) / count(*) AS mean_q
        |FROM q GROUP BY grp, dim ORDER BY grp, dim""".stripMargin),

    // the same ES key ln(u)/w over the same md5 uniform; the score column
    // itself is NOT output (ln's last-ulp can differ between libm and the
    // JVM), only the selected set — score GAPS between ranked docs are
    // orders of magnitude above one ulp, so the set is engine-stable
    "q108_x_weighted_sample" ->
      (s"""WITH s AS (
        |  SELECT doc_id, source, n_chars,
        |    ln((CAST(${dkHash32("CAST(doc_id AS VARCHAR)")} AS DOUBLE) + 0.5)
        |       / 4294967296.0) / n_chars AS es
        |  FROM documents)
        |SELECT doc_id, source, n_chars FROM (
        |  SELECT * FROM s ORDER BY es DESC, doc_id LIMIT 120)
        |ORDER BY doc_id""".stripMargin),

    // q71's gram derivation, inverted: the CLEAN corpus (no shared gram
    // with the held-out side) — the bloom prefilter is invisible to the
    // result by the no-false-negative contract
    "q109_x_bloom_decontaminate" ->
      ("""WITH t AS (
        |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, source,
        |    unnest(CASE WHEN len(toks) >= 3
        |           THEN list_transform(generate_series(1, len(toks) - 2),
        |                  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |           ELSE CAST([] AS VARCHAR[]) END) AS gram
        |  FROM t),
        |tg AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |dirty AS (
        |  SELECT DISTINCT g.doc_id FROM g JOIN tg USING (gram)
        |  WHERE g.source != 'src0')
        |SELECT doc_id, source, n_chars FROM documents
        |WHERE source != 'src0' AND doc_id NOT IN (SELECT doc_id FROM dirty)
        |ORDER BY doc_id""".stripMargin),

    // the same lag-mark + ROWS-frame running sum in DuckDB window SQL;
    // gaps compare in exact integer microseconds on both sides
    "q110_x_batch_sessions" -> BatchSessionsSql,

    // IDENTICAL oracle: the time-sliced path is the hot-key dial on the
    // same semantics — micro-session re-merge reproduces byGap exactly
    // (the SessionizeSpec slice-invariance law), so one SQL serves both
    "q260_x_sessions_timesliced" -> BatchSessionsSql,

    // q97's quantize/dequantize replay feeds the coarse cosine; pool of
    // refine*k = 12 by (rounded coarse desc, id), then q49's exact cosine
    // re-ranks the pool — deterministic at every stage
    "q111_x_quantized_ann" -> {
      def lsum(body: String) =
        s"list_sum(list_transform(generate_series(1, 64), i -> $body))"
      (s"""WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings),
        |d AS (
        |  SELECT vec_id, embedding,
        |    list_transform(embedding, x -> CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE)
        |      ELSE greatest(-127.0, least(127.0, floor(CAST(x AS DOUBLE) / scale + 0.5))) END
        |      * scale) AS deq
        |  FROM s),
        |qs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 32),
        |coarse AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(${lsum("CAST(q.embedding[i] AS DOUBLE) * c.deq[i]")}
        |      / nullif(sqrt(${lsum("CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)")})
        |          * sqrt(${lsum("c.deq[i] * c.deq[i]")}), 0), 4) AS cs
        |  FROM qs q JOIN d c ON c.vec_id <> q.vec_id),
        |pool AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS r
        |  FROM coarse),
        |ex AS (
        |  SELECT p.query_id, p.neighbor_id, $CosSimSql AS cos_sim
        |  FROM pool p
        |  JOIN embeddings q ON q.vec_id = p.query_id
        |  JOIN embeddings c ON c.vec_id = p.neighbor_id
        |  WHERE p.r <= 12),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM ex)
        |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin)
    },

    // q77's derivation through DuckDB's native ASOF LEFT JOIN — the
    // outer-mode twin checking AsofJoinExec's streaming merge
    "q112_x_native_asof_join" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(o_totalprice), 2) AS tot, count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT o_orderpriority, month, tot FROM m WHERE n >= 45),
        |l AS (SELECT o_orderkey, o_orderpriority, o_orderdate FROM orders
        |      WHERE o_orderkey % 97 = 0)
        |SELECT l.o_orderkey, l.o_orderpriority, l.o_orderdate, r.tot
        |FROM l ASOF LEFT JOIN r
        |  ON l.o_orderpriority = r.o_orderpriority AND l.o_orderdate >= r.month
        |ORDER BY o_orderkey""".stripMargin),

    // forward as-of via the negation law: backward ASOF over -epoch_us
    // picks the largest -rt <= -lt, i.e. the SMALLEST rt >= lt
    "q113_x_forward_asof_join" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority, CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(o_totalprice), 2) AS tot, count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT o_orderpriority, -epoch_us(CAST(month AS TIMESTAMP)) AS nt, tot
        |      FROM m WHERE n >= 45),
        |l AS (SELECT o_orderkey, o_orderpriority, o_orderdate,
        |             -epoch_us(o_orderdate) AS nt
        |      FROM orders WHERE o_orderkey % 97 = 0)
        |SELECT l.o_orderkey, l.o_orderpriority, l.o_orderdate, r.tot
        |FROM l ASOF LEFT JOIN r
        |  ON l.o_orderpriority = r.o_orderpriority AND l.nt >= r.nt
        |ORDER BY o_orderkey""".stripMargin),

    // q49's cosine formula over adjacent-id pairs — checks the codegen'd
    // expression through the registered SQL function surface
    "q114_x_sql_cosine" ->
      (s"""SELECT q.vec_id, $CosSimSql AS cos_next
        |FROM embeddings q JOIN embeddings c ON c.vec_id = q.vec_id + 1
        |ORDER BY q.vec_id""".stripMargin),

    // q46's band-collision predicate with the cross-corpus constraint
    // (a = training side, b = held-out side) instead of a < b
    "q115_x_cross_neardup" -> {
      val rows = MinhashK / MinhashBands
      val bandConds = (0 until MinhashBands).map { b =>
        (b * rows until (b + 1) * rows).map(i => s"a.mh$i = b.mh$i").mkString("(", " AND ", ")")
      }.mkString(" OR ")
      val eqSum = (0 until MinhashK)
        .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""$MinhashCte
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST($eqSum AS DOUBLE) / $MinhashK, 4) AS est_jaccard
        |FROM sig a JOIN sig b
        |  ON a.doc_id % 5 != 0 AND b.doc_id % 5 = 0 AND ($bandConds)
        |ORDER BY id_a, id_b""".stripMargin
    },

    // q55's exact cosine formula with the cross-side constraint
    "q116_x_semantic_contamination" -> {
      def dot(l: String, r: String) =
        s"list_sum(list_transform(generate_series(1, 64), i -> CAST($l.embedding[i] AS DOUBLE) * CAST($r.embedding[i] AS DOUBLE)))"
      val cos = s"round(${dot("a", "b")} / nullif(sqrt(${dot("a", "a")}) * sqrt(${dot("b", "b")}), 0), 4)"
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, $cos AS cos_sim
         |FROM embeddings a JOIN embeddings b
         |  ON a.vec_id % 5 != 0 AND b.vec_id % 5 = 0
         |WHERE $cos >= 0.4 ORDER BY id_a, id_b""".stripMargin
    }
  ) ++ LinedOracles

  /** Shared duplicated-5-gram detection CTEs (q98/q100): per-doc token
    * arrays, 1-based gram starts, corpus-duplicated grams, and the
    * duplicated start positions `dp(doc_id, pos)` (0-based). */
  private lazy val DupGramCtes: String =
    """WITH t AS (
      |  SELECT doc_id, CASE WHEN text IS NULL OR length(trim(text)) = 0
      |         THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
      |  FROM documents),
      |b AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t),
      |g AS (
      |  SELECT doc_id, unnest(range(1, len(toks) - 3)) AS i, toks
      |  FROM b WHERE len(toks) >= 5),
      |gg AS (SELECT doc_id, i - 1 AS pos, array_to_string(toks[i : i + 4], ' ') AS gram FROM g),
      |dup AS (SELECT gram FROM gg GROUP BY gram HAVING count(*) >= 2),
      |dp AS (SELECT doc_id, pos FROM gg JOIN dup USING (gram))""".stripMargin

  /** Shared repetition-stat CTE block (q80/q84): per-doc line groups,
    * line-axis stats, token char totals, 2-gram top coverage, duplicated
    * 5-gram coverage — all over the [[LinedCte]] derivation. */
  private lazy val RepCtes: String =
      (s"""$LinedCte,
        |lg AS (
        |  SELECT doc_id, line, count(*) AS c, length(line) AS ll
        |  FROM (SELECT doc_id, unnest(la) AS line FROM lined)
        |  WHERE length(line) > 0 GROUP BY doc_id, line),
        |ls AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
        |    CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dlf,
        |    CAST(sum(CASE WHEN c > 1 THEN (c-1)*ll ELSE 0 END) AS DOUBLE)
        |      / nullif(sum(c*ll), 0) AS dlcf
        |  FROM lg GROUP BY doc_id),
        |tc AS (
        |  SELECT doc_id, sum(length(x)) AS tot
        |  FROM (SELECT doc_id, unnest(toks) AS x FROM lined) GROUP BY doc_id),
        |g2 AS (
        |  SELECT doc_id, gram, count(*) AS c, length(gram) - 1 AS gl
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |          i -> toks[i] || ' ' || toks[i+1])) AS gram FROM lined)
        |  GROUP BY doc_id, gram),
        |t2 AS (
        |  SELECT doc_id, c * gl AS cov FROM (
        |    SELECT doc_id, c, gl,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram DESC) AS rn
        |    FROM g2) WHERE rn = 1),
        |g5 AS (
        |  SELECT doc_id, gram, count(*) AS c, length(gram) - 4 AS gl
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
        |               toks[i+3] || ' ' || toks[i+4])) AS gram FROM lined)
        |  GROUP BY doc_id, gram),
        |d5 AS (
        |  SELECT doc_id, CAST(sum(CASE WHEN c > 1 THEN c * gl ELSE 0 END) AS DOUBLE) AS cov
        |  FROM g5 GROUP BY doc_id)""".stripMargin)

  /** q81/q82 oracles, split out next to the [[LinedCte]]/[[RepCtes]]
    * blocks they share (merged into [[oracleSql]]). */
  private val LinedOracles: Map[String, String] = Map(
    "q81_x_line_dedup" ->
      (s"""$LinedCte,
        |l AS (
        |  SELECT doc_id, line, i FROM (
        |    SELECT doc_id, unnest(la) AS line,
        |           unnest(range(1, len(la) + 1)) AS i
        |    FROM lined)
        |  WHERE length(line) > 0),
        |k AS (
        |  SELECT doc_id, i, line,
        |    row_number() OVER (PARTITION BY line ORDER BY doc_id, i) AS rn
        |  FROM l),
        |cnt AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |  FROM k GROUP BY doc_id),
        |agg AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt
        |  FROM k WHERE rn = 1 GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(cnt.n_lines, 0) AS n_lines,
        |  coalesce(cnt.n_kept, 0) AS n_kept,
        |  coalesce(agg.txt, '') AS text_dedup
        |FROM documents d
        |LEFT JOIN cnt USING (doc_id) LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin),

    "q82_x_pii_redact" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phone = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
      s"""WITH p AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 2 = 0
        |         THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
        |              CAST(doc_id % 100 AS VARCHAR)
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |         THEN ' tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
        |              '-0199'
        |         ELSE '' END AS pii
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(pii, '$email')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(pii, '$ip')) AS INT) AS n_ips,
        |  CAST(len(regexp_extract_all(pii, '$phone')) AS INT) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(pii,
        |    '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'),
        |    '$phone', '<PHONE>', 'g') AS text_redacted
        |FROM p ORDER BY doc_id""".stripMargin
    },

    // the MERGE rewrite replayed literally: target rows whose key is
    // absent from the source batch, plus the source's non-delete rows
    "q140_x_merge_upsert" ->
      ("""WITH t AS (
        |  SELECT o_orderkey AS k,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
        |         o_orderstatus AS status
        |  FROM orders),
        |src AS (
        |  SELECT o_orderkey AS k,
        |         CASE WHEN o_orderkey % 20 = 0 THEN 'D' ELSE 'U' END AS op,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 12345 AS price_cents,
        |         'M' AS status
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT -o_orderkey, 'U',
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 'N'
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |m AS (
        |  SELECT t.* FROM t ANTI JOIN src ON t.k = src.k
        |  UNION ALL
        |  SELECT k, price_cents, status FROM src WHERE op <> 'D')
        |SELECT k, price_cents, status FROM m WHERE abs(k) % 3 = 0
        |ORDER BY k""".stripMargin),

    // the Holt recursion replayed with the identical op order — the new
    // level is recomputed inline for the trend update (same expression,
    // same bits); α=1/2, β=1/4 are exact binary fractions so 1−α, 1−β
    // are too
    "q141_x_holt_forecast" ->
      ("""WITH RECURSIVE m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(round(o_totalprice * 100)) / 1e8, 6) AS y
        |  FROM orders GROUP BY 1),
        |o AS (SELECT row_number() OVER (ORDER BY month) AS t, y FROM m),
        |rec AS (
        |  SELECT 1 AS t,
        |         (SELECT y FROM o WHERE t = 1) AS l,
        |         (SELECT y FROM o WHERE t = 2) - (SELECT y FROM o WHERE t = 1) AS b
        |  UNION ALL
        |  SELECT rec.t + 1,
        |         0.5 * o.y + 0.5 * (rec.l + rec.b),
        |         0.25 * ((0.5 * o.y + 0.5 * (rec.l + rec.b)) - rec.l) + 0.75 * rec.b
        |  FROM rec JOIN o ON o.t = rec.t + 1),
        |fin AS (SELECT l, b FROM rec ORDER BY t DESC LIMIT 1),
        |n AS (SELECT CAST(count(*) AS INT) AS n_obs FROM o)
        |SELECT 'all' AS key, n.n_obs, round(fin.l, 4) AS level,
        |       round(fin.b, 4) AS trend, CAST(h AS INT) AS step,
        |       round(fin.l + h * fin.b, 4) AS forecast
        |FROM fin, n, generate_series(1, 12) AS g(h)
        |ORDER BY step""".stripMargin),

    // the five sufficient sums as exact BIGINTs, slope = one division of
    // two exact longs, intercept = the same fixed op sequence as the
    // Spark expression; y in whole dollars (cents // 100) for 2^63
    // headroom
    "q142_x_grouped_ols" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS x,
        |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) // 100 AS y
        |  FROM orders GROUP BY 1, 2),
        |s AS (SELECT prio, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x * y) AS sxy, sum(x * x) AS sxx
        |      FROM m GROUP BY 1),
        |c AS (SELECT prio, n, sx, sy,
        |        CASE WHEN n * sxx - sx * sx <> 0
        |             THEN CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
        |        END AS b
        |      FROM s)
        |SELECT prio, n, floor(b * 1000000.0 + 0.5) / 1000000.0 AS slope,
        |  floor(((CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))
        |        * 1000000.0 + 0.5) / 1000000.0 AS intercept
        |FROM c ORDER BY prio""".stripMargin),

    // adjacent pairs via positional unnest over the same whitespace
    // tokenization; the threshold and score are pure integer arithmetic
    // (no log, no division until the final exact // )
    "q143_x_pmi_collocations" ->
      ("""WITH t AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS l
        |  FROM documents
        |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |ix AS (SELECT unnest(generate_series(1, len(l) - 1)) AS i, l FROM t),
        |p AS (SELECT l[i] AS w1, l[i + 1] AS w2 FROM ix),
        |cp AS (SELECT w1, w2, count(*) AS c12 FROM p GROUP BY 1, 2),
        |m1 AS (SELECT w1, count(*) AS c1 FROM p GROUP BY 1),
        |m2 AS (SELECT w2, count(*) AS c2 FROM p GROUP BY 1),
        |n AS (SELECT count(*) AS n_pairs FROM p)
        |SELECT cp.w1, cp.w2, cp.c12, m1.c1, m2.c2, n.n_pairs,
        |       CAST((CAST(cp.c12 AS HUGEINT) * n.n_pairs * 1000000)
        |         // (m1.c1 * m2.c2) AS BIGINT) AS ratio_e6
        |FROM cp JOIN m1 ON cp.w1 = m1.w1 JOIN m2 ON cp.w2 = m2.w2 CROSS JOIN n
        |WHERE cp.c12 >= 5
        |  AND CAST(cp.c12 AS HUGEINT) * n.n_pairs
        |    >= 20 * CAST(m1.c1 AS HUGEINT) * m2.c2
        |ORDER BY cp.w1, cp.w2""".stripMargin),

    // neighbor discovery via IGNORE NULLS windows over the same sort,
    // then the identical fixed-order interpolant expression
    "q144_x_interpolate" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS x,
        |         floor(sum(round(o_totalprice * 100)) / 1e8 * 1e6 + 0.5) / 1e6 AS y0
        |  FROM orders GROUP BY 1, 2),
        |g AS (SELECT prio, x, CASE WHEN x % 4 <> 1 THEN y0 END AS y FROM m),
        |w AS (SELECT prio, x, y,
        |        last_value(y IGNORE NULLS) OVER
        |          (PARTITION BY prio ORDER BY x
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |        last_value(CASE WHEN y IS NOT NULL THEN x END IGNORE NULLS) OVER
        |          (PARTITION BY prio ORDER BY x
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS px,
        |        first_value(y IGNORE NULLS) OVER
        |          (PARTITION BY prio ORDER BY x
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |        first_value(CASE WHEN y IS NOT NULL THEN x END IGNORE NULLS) OVER
        |          (PARTITION BY prio ORDER BY x
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
        |      FROM g)
        |SELECT prio, x, y,
        |  floor((CASE WHEN y IS NOT NULL THEN y
        |              WHEN pv IS NOT NULL AND nv IS NOT NULL
        |              THEN pv + (nv - pv) * (x - px) / (nx - px) END)
        |        * 1e6 + 0.5) / 1e6 AS interp
        |FROM w ORDER BY prio, x""".stripMargin),

    // q122's KMV replay pointed at the event stream: the drained
    // complete-mode state is slicing-independent, so the streaming
    // sketch equals this batch SQL exactly
    "q145_x_stream_kmv" ->
      ("""WITH h AS (
        |  SELECT DISTINCT event_type,
        |    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hk
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, hk,
        |        row_number() OVER (PARTITION BY event_type ORDER BY hk) AS rn,
        |        count(*) OVER (PARTITION BY event_type) AS nd
        |      FROM h)
        |SELECT event_type,
        |  CASE WHEN nd >= 128
        |       THEN floor((127.0 * 1152921504606846976.0 / hk) * 100.0 + 0.5) / 100.0
        |       ELSE CAST(nd AS DOUBLE) END AS n_est,
        |  hk AS kth_hash,
        |  CAST(LEAST(nd, 128) AS INT) AS n_kept
        |FROM r WHERE rn = LEAST(nd, 128)
        |ORDER BY event_type""".stripMargin),

    // exact rank elements replayed as first-value-reaching-the-rank
    // over (group, value) counts — med and MAD each one pass; windowed
    // cums compare only (never output), so HUGEINT drift cannot bite;
    // n_out is CAST to BIGINT (the q110 lesson)
    "q146_x_mad_outliers" ->
      ("""WITH v AS (
        |  SELECT l_returnflag AS g,
        |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 100 AS x
        |  FROM lineitem),
        |c AS (SELECT g, x, count(*) AS c FROM v GROUP BY 1, 2),
        |w AS (SELECT g, x, sum(c) OVER (PARTITION BY g ORDER BY x) AS cum,
        |             sum(c) OVER (PARTITION BY g) AS n FROM c),
        |med AS (SELECT g, min(x) AS med FROM w
        |        WHERE cum >= (500 * n + 999) // 1000 GROUP BY 1),
        |d AS (SELECT v.g, v.x, abs(v.x - med.med) AS dev, med.med
        |      FROM v JOIN med ON v.g = med.g),
        |dc AS (SELECT g, dev, count(*) AS c FROM d GROUP BY 1, 2),
        |dw AS (SELECT g, dev, sum(c) OVER (PARTITION BY g ORDER BY dev) AS cum,
        |              sum(c) OVER (PARTITION BY g) AS n FROM dc),
        |mad AS (SELECT g, min(dev) AS mad FROM dw
        |        WHERE cum >= (500 * n + 999) // 1000 GROUP BY 1)
        |SELECT d.g AS l_returnflag, count(*) AS n, max(d.med) AS med,
        |       max(mad.mad) AS mad,
        |       CAST(sum(CASE WHEN d.dev > 1 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_out
        |FROM d JOIN mad ON d.g = mad.g GROUP BY 1 ORDER BY 1""".stripMargin),

    // the identical chained-window derivation: each stage's min is
    // conditional on the previous stage's windowed min; micros via
    // epoch_us (exact int64 — epoch_ns/1000 would round-trip a double)
    "q147_x_funnel" -> FunnelReachSql,

    // IDENTICAL oracle: the aggregate path is the hot-key dial on the
    // same chained-min semantics (the FunnelSpec equality law)
    "q261_x_funnel_agg" -> FunnelReachSql,

    // the same cell grid, per-item e9 agreement terms, HUGEINT pooled
    // category squares, one signed fixed tree; single-rating items and
    // their ratings are out of BOTH the mean and the chance rate
    "q262_x_fleiss_kappa" ->
      ("""WITH r AS (
        |  SELECT CAST(user_id % 2 AS BIGINT) AS cohort, user_id AS it,
        |         event_type AS c
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |cells AS (SELECT cohort, it, c, CAST(count(*) AS BIGINT) AS n
        |          FROM r GROUP BY 1, 2, 3),
        |itot AS (SELECT cohort, it, CAST(sum(n) AS BIGINT) AS ni,
        |                CAST(sum(n * (n - 1)) AS BIGINT) AS agree
        |         FROM cells GROUP BY 1, 2 HAVING sum(n) >= 2),
        |items AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_items,
        |                 CAST(sum(ni) AS BIGINT) AS n_ratings,
        |                 CAST(sum(CAST(floor(CAST(agree AS DOUBLE)
        |                   / CAST(ni * (ni - 1) AS DOUBLE)
        |                   * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS sp
        |          FROM itot GROUP BY 1),
        |cats AS (SELECT cohort, CAST(sum(nc) AS BIGINT) AS nt,
        |                sum(CAST(nc AS HUGEINT) * nc) AS snc2
        |         FROM (SELECT cells.cohort, cells.c,
        |                      CAST(sum(cells.n) AS BIGINT) AS nc
        |               FROM cells JOIN itot ON cells.cohort = itot.cohort
        |                 AND cells.it = itot.it
        |               GROUP BY 1, 2) GROUP BY 1)
        |SELECT i.cohort, n_items, n_ratings,
        |  CAST(floor(CAST(sp AS DOUBLE) / 1000000000.0 / CAST(n_items AS DOUBLE)
        |    * 1000000 + 0.5) AS BIGINT) AS pbar_e6,
        |  CAST(floor(CAST(snc2 AS DOUBLE)
        |    / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE))
        |    * 1000000 + 0.5) AS BIGINT) AS pe_e6,
        |  CASE WHEN CAST(snc2 AS DOUBLE)
        |         / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)) < 1.0 THEN
        |    CAST(floor((CAST(sp AS DOUBLE) / 1000000000.0
        |        / CAST(n_items AS DOUBLE)
        |      - CAST(snc2 AS DOUBLE)
        |        / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)))
        |      / (1.0 - CAST(snc2 AS DOUBLE)
        |        / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)))
        |      * 1000000 + 0.5) AS BIGINT) END AS kappa_e6
        |FROM items i JOIN cats ON i.cohort = cats.cohort
        |ORDER BY i.cohort""".stripMargin),

    "q263_x_sign_test" ->
      (s"""WITH RECURSIVE $SignTestCtes
        |SELECT seg AS c_mktsegment, prio AS o_orderpriority,
        |       n AS n_eff, k AS k_pos, p_e9
        |FROM p ORDER BY 1, 2""".stripMargin),

    // rank by (p, tie cols), integer step-up boundary, max passing rank
    // rescues everything below it
    "q264_x_bh_fdr" ->
      (s"""WITH RECURSIVE $SignTestCtes,
        |r AS (SELECT *, CAST(row_number() OVER (ORDER BY p_e9, seg, prio)
        |               AS INT) AS rank,
        |             CAST(count(*) OVER () AS BIGINT) AS m
        |      FROM p),
        |f AS (SELECT *, max(CASE WHEN p_e9 * 1000 * m
        |               <= rank * 50 * CAST(1000000000 AS BIGINT) THEN rank END)
        |               OVER () AS kmax
        |      FROM r)
        |SELECT seg AS c_mktsegment, prio AS o_orderpriority,
        |       n AS n_eff, k AS k_pos, p_e9, rank,
        |       coalesce(rank <= kmax, false) AS rejected
        |FROM f ORDER BY rank""".stripMargin),

    // the identical recursion with the 12 seasonals as an ordered LIST
    // recursion column: s[1] is s_{t-m}, the update appends the new
    // seasonal; l_t's expression repeats verbatim inside b and s (same
    // double); integer-cents init sums are order-free
    "q265_x_holt_winters" ->
      ("""WITH RECURSIVE m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |o AS (SELECT row_number() OVER (ORDER BY month) AS t, y FROM m),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
        |i1 AS (SELECT CAST(sum(y) AS BIGINT) AS s1 FROM o WHERE t <= 12),
        |i2 AS (SELECT CAST(sum(y) AS BIGINT) AS s2 FROM o
        |       WHERE t > 12 AND t <= 24),
        |s0 AS (SELECT list(CAST(y AS DOUBLE) - CAST(i1.s1 AS DOUBLE) / 12.0
        |                   ORDER BY t) AS s
        |       FROM o, i1 WHERE t <= 12),
        |init AS (SELECT CAST(12 AS BIGINT) AS t,
        |                CAST(i1.s1 AS DOUBLE) / 12.0 AS l,
        |                (CAST(i2.s2 AS DOUBLE) / 12.0
        |                 - CAST(i1.s1 AS DOUBLE) / 12.0) / 12.0 AS b,
        |                s0.s AS s
        |         FROM i1, i2, s0),
        |rec(t, l, b, s) AS (
        |  SELECT t, l, b, s FROM init
        |  UNION ALL
        |  SELECT r.t + 1,
        |    0.5 * (CAST(o.y AS DOUBLE) - r.s[1]) + 0.5 * (r.l + r.b),
        |    0.25 * ((0.5 * (CAST(o.y AS DOUBLE) - r.s[1])
        |             + 0.5 * (r.l + r.b)) - r.l) + 0.75 * r.b,
        |    r.s[2:] || [0.25 * (CAST(o.y AS DOUBLE)
        |      - (0.5 * (CAST(o.y AS DOUBLE) - r.s[1]) + 0.5 * (r.l + r.b)))
        |      + 0.75 * r.s[1]]
        |  FROM rec r JOIN o ON o.t = r.t + 1),
        |fin AS (SELECT r.l, r.b, r.s FROM rec r, nn WHERE r.t = nn.n)
        |SELECT 'all' AS key, CAST(nn.n AS INT) AS n_obs,
        |  round(fin.l, 4) AS level, round(fin.b, 4) AS trend,
        |  CAST(h.h AS INT) AS step,
        |  floor((fin.l + h.h * fin.b + fin.s[((h.h - 1) % 12) + 1])
        |    * 10000 + 0.5) / 10000 AS forecast
        |FROM fin, nn, (SELECT unnest(generate_series(1, 12)) AS h) h
        |ORDER BY step""".stripMargin),

    // argmax continuation as the rank-1 row of (c12 DESC, w2) per
    // context — same answer as the min_by((w2,c12), (−c12,w2)) fold;
    // c1 and p_e6 CAST/​integer-div to BIGINT
    "q148_x_next_token" ->
      ("""WITH t AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS l
        |  FROM documents
        |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |ix AS (SELECT unnest(generate_series(1, len(l) - 1)) AS i, l FROM t),
        |p AS (SELECT l[i] AS w1, l[i + 1] AS w2 FROM ix),
        |cp AS (SELECT w1, w2, count(*) AS c12 FROM p GROUP BY 1, 2),
        |tot AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM cp GROUP BY 1),
        |r AS (SELECT cp.*, row_number() OVER
        |        (PARTITION BY cp.w1 ORDER BY cp.c12 DESC, cp.w2) AS rn FROM cp)
        |SELECT r.w1, r.w2, r.c12, tot.c1,
        |       CAST((r.c12 * 1000000) // tot.c1 AS BIGINT) AS p_e6
        |FROM r JOIN tot ON r.w1 = tot.w1
        |WHERE rn = 1 AND tot.c1 >= 5
        |ORDER BY r.w1""".stripMargin),

    // merging per-shard k-min sets reproduces the unsharded sketch
    // exactly, so the oracle IS q122's replay pointed at the same
    // grouping
    "q149_x_kmv_merge" ->
      ("""WITH h AS (
        |  SELECT DISTINCT o_orderpriority,
        |    CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT) AS hk
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |r AS (SELECT o_orderpriority, hk,
        |        row_number() OVER (PARTITION BY o_orderpriority ORDER BY hk) AS rn,
        |        count(*) OVER (PARTITION BY o_orderpriority) AS nd
        |      FROM h)
        |SELECT o_orderpriority,
        |  CASE WHEN nd >= 128
        |       THEN floor((127.0 * 1152921504606846976.0 / hk) * 100.0 + 0.5) / 100.0
        |       ELSE CAST(nd AS DOUBLE) END AS n_est,
        |  hk AS kth_hash,
        |  CAST(LEAST(nd, 128) AS INT) AS n_kept
        |FROM r WHERE rn = LEAST(nd, 128)
        |ORDER BY o_orderpriority""".stripMargin),

    // (a div b) div 7 == a div 7b for positive ints — mirrored literally
    "q150_x_cohort_retention" ->
      ("""WITH a AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 // 7 AS w
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT user_id, w,
        |        min(w) OVER (PARTITION BY user_id) AS cohort FROM a),
        |g AS (SELECT cohort, w - cohort AS "offset", count(*) AS n_users
        |      FROM c GROUP BY 1, 2)
        |SELECT cohort, "offset", n_users,
        |  n_users * 1000 // max(CASE WHEN "offset" = 0 THEN n_users END)
        |    OVER (PARTITION BY cohort) AS retained_permille
        |FROM g ORDER BY cohort, "offset"""".stripMargin),

    // direct unsharded register build: bucket = low 6 hash bits, rho =
    // 1 + leading zeros of the remaining 54 (bit length via bin())
    "q151_x_hll_registers" ->
      ("""WITH h AS (
        |  SELECT o_orderpriority,
        |    CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15) AS BIGINT) AS hk
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |b AS (SELECT o_orderpriority, hk % 64 AS bucket, hk // 64 AS rest FROM h)
        |SELECT o_orderpriority, bucket,
        |  CAST(max(CASE WHEN rest = 0 THEN 55
        |                ELSE 55 - length(bin(rest)) END) AS INT) AS rho
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // the monoid law: merged partials == single-pass recompute
    "q152_x_incremental_agg" ->
      ("""WITH r AS (
        |  SELECT l_suppkey, CAST(l_quantity AS BIGINT) AS q FROM lineitem
        |  WHERE l_quantity IS NOT NULL),
        |a AS (
        |  SELECT l_suppkey, count(*) AS n, CAST(sum(q) AS BIGINT) AS sum_v,
        |    CAST(sum(q * q) AS BIGINT) AS sumsq_v,
        |    min(q) AS min_v, max(q) AS max_v
        |  FROM r GROUP BY 1)
        |SELECT l_suppkey, n, sum_v, sumsq_v, min_v, max_v,
        |  sum_v * 1000000 // n AS mean_e6,
        |  (n * sumsq_v - sum_v * sum_v) * 1000000 // (n * n) AS var_e6
        |FROM a ORDER BY l_suppkey""".stripMargin),

    "q153_x_kl_domains" ->
      ("""WITH tok AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents WHERE source IS NOT NULL AND length(trim(text)) > 0),
        |cdt AS (SELECT source, t, count(*) AS cdt FROM tok GROUP BY 1, 2),
        |pd AS (SELECT source, CAST(sum(cdt) AS BIGINT) AS nd,
        |         count(*) AS ndist FROM cdt GROUP BY 1),
        |ct AS (SELECT t, CAST(sum(cdt) AS BIGINT) AS ct FROM cdt GROUP BY 1),
        |tot AS (SELECT CAST(sum(cdt) AS BIGINT) AS n FROM cdt)
        |SELECT source, max(nd) AS n_tokens, max(ndist) AS n_distinct,
        |  CAST(sum(CAST(floor((CAST(cdt AS DOUBLE) / nd) *
        |    ln(CAST(cdt * n AS DOUBLE) / CAST(nd * ct AS DOUBLE)) * 1e9 + 0.5)
        |    AS BIGINT)) AS BIGINT) AS kl_e9
        |FROM cdt JOIN ct USING (t) JOIN pd USING (source) CROSS JOIN tot
        |GROUP BY source ORDER BY source""".stripMargin),

    "q154_x_attribution" ->
      ("""WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_id, event_type AS s
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase') AND ts IS NOT NULL),
        |w AS (SELECT *,
        |    first_value(CASE WHEN s IN ('view', 'click') THEN s END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY t, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS f,
        |    last_value(CASE WHEN s IN ('view', 'click') THEN s END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY t, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS l
        |  FROM e)
        |SELECT coalesce(f, '(none)') AS first_touch,
        |  coalesce(l, '(none)') AS last_touch, count(*) AS n_conversions
        |FROM w WHERE s = 'purchase' GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // each distinct (user, week) pair feeds the 4 windows ending at
    // week..week+3; trim to observed weeks
    "q155_x_rolling_active" ->
      ("""WITH p AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 // 7 AS w
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |x AS (SELECT user_id, unnest(generate_series(w, w + 3)) AS period FROM p)
        |SELECT period, count(DISTINCT user_id) AS active_users
        |FROM x WHERE period <= (SELECT max(w) FROM p)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    "q156_x_hash_split" ->
      (s"""WITH s AS (
        |  SELECT source,
        |    CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (SELECT source,
        |          ${dkHash32("CAST(doc_id AS VARCHAR)")} % 1000 AS b
        |        FROM documents)),
        |c AS (SELECT source, split, count(*) AS n FROM s GROUP BY 1, 2)
        |SELECT source, split, n,
        |  CAST(n * 1000 // sum(n) OVER (PARTITION BY source) AS BIGINT)
        |    AS share_permille
        |FROM c ORDER BY source, split""".stripMargin),

    // the 4-offset window explosion: epoch-aligned 7d starts, 28d span
    "q157_x_stream_sliding" ->
      ("""WITH e AS (
        |  SELECT epoch_us(ts) // 86400000000 // 7 AS wk, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |x AS (
        |  SELECT DATE '1970-01-01' + INTERVAL ((wk - k.k) * 7) DAY AS window_start,
        |    event_type, cents
        |  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k)
        |SELECT CAST(window_start AS DATE) AS window_start, event_type,
        |  count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // replay of the k-minimum union walk: the k_eff smallest distinct
    // hashes of each pair, coincidence-counted against both sides
    "q158_x_kmv_overlap" ->
      ("""WITH h AS (
        |  SELECT DISTINCT event_type,
        |    CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hk
        |  FROM events WHERE user_id IS NOT NULL),
        |t AS (SELECT DISTINCT event_type FROM h),
        |p AS (SELECT a.event_type AS g1, b.event_type AS g2
        |      FROM t a JOIN t b ON a.event_type < b.event_type),
        |u AS (SELECT p.g1, p.g2, h.hk,
        |        max(CASE WHEN h.event_type = p.g1 THEN 1 ELSE 0 END) AS in1,
        |        max(CASE WHEN h.event_type = p.g2 THEN 1 ELSE 0 END) AS in2
        |      FROM p JOIN h ON h.event_type IN (p.g1, p.g2)
        |      GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (PARTITION BY g1, g2 ORDER BY hk) AS rn,
        |        count(*) OVER (PARTITION BY g1, g2) AS nd
        |      FROM u),
        |f AS (SELECT g1, g2, LEAST(nd, 128) AS k_eff, max(nd) AS nd2,
        |        max(CASE WHEN rn = LEAST(nd, 128) THEN hk END) AS kth,
        |        sum(CASE WHEN rn <= LEAST(nd, 128) AND in1 = 1 AND in2 = 1
        |            THEN 1 ELSE 0 END) AS nc
        |      FROM r GROUP BY 1, 2, 3)
        |SELECT g1, g2, CAST(k_eff AS INT) AS k_eff, CAST(nc AS INT) AS n_common,
        |  CASE WHEN nd2 >= 128
        |       THEN floor((127.0 * 1152921504606846976.0 / kth) * 100.0 + 0.5) / 100.0
        |       ELSE CAST(nd2 AS DOUBLE) END AS union_est,
        |  CAST(CAST(nc AS BIGINT) * 1000000 // k_eff AS BIGINT) AS jaccard_e6,
        |  floor(union_est * n_common / k_eff * 100.0 + 0.5) / 100.0 AS inter_est
        |FROM f ORDER BY g1, g2""".stripMargin),

    "q159_x_table_diff" ->
      ("""WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |             o_totalprice, o_orderpriority FROM orders),
        |b AS (SELECT * FROM o WHERE o_orderkey % 97 <> 0),
        |a AS (SELECT o_orderkey, o_custkey,
        |        CASE WHEN o_orderkey % 13 = 0 THEN 'X'
        |             ELSE o_orderstatus END AS o_orderstatus,
        |        o_totalprice, o_orderpriority
        |      FROM o WHERE o_orderkey % 89 <> 0),
        |j AS (SELECT coalesce(b.o_orderkey, a.o_orderkey) AS o_orderkey,
        |        b.o_orderkey IS NOT NULL AS in_b,
        |        a.o_orderkey IS NOT NULL AS in_a,
        |        CASE WHEN NOT (b.o_custkey IS NOT DISTINCT FROM a.o_custkey)
        |             THEN 'o_custkey' END AS d1,
        |        CASE WHEN NOT (b.o_orderpriority IS NOT DISTINCT FROM a.o_orderpriority)
        |             THEN 'o_orderpriority' END AS d2,
        |        CASE WHEN NOT (b.o_orderstatus IS NOT DISTINCT FROM a.o_orderstatus)
        |             THEN 'o_orderstatus' END AS d3,
        |        CASE WHEN NOT (b.o_totalprice IS NOT DISTINCT FROM a.o_totalprice)
        |             THEN 'o_totalprice' END AS d4
        |      FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey),
        |s AS (SELECT *,
        |        CASE WHEN NOT in_b THEN 'added' WHEN NOT in_a THEN 'removed'
        |             WHEN d1 IS NOT NULL OR d2 IS NOT NULL OR d3 IS NOT NULL
        |               OR d4 IS NOT NULL THEN 'changed' END AS op
        |      FROM j)
        |SELECT o_orderkey, op,
        |  CASE WHEN op = 'changed' THEN
        |    CAST((d1 IS NOT NULL)::INT + (d2 IS NOT NULL)::INT +
        |         (d3 IS NOT NULL)::INT + (d4 IS NOT NULL)::INT AS INT)
        |  END AS n_diff_cols,
        |  CASE WHEN op = 'changed' THEN concat_ws(',', d1, d2, d3, d4)
        |  END AS diff_str
        |FROM s WHERE op IS NOT NULL ORDER BY o_orderkey""".stripMargin),

    // row checks: CASE WHEN pred THEN 0 ELSE 1 mirrors Spark's
    // when(pred, 0).otherwise(1) — NULL predicates fall to the violation
    // branch in both engines
    "q160_x_expectations" ->
      ("""WITH rc AS (SELECT count(*) AS n,
        |    sum(CASE WHEN l_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS v_nn,
        |    sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 0 ELSE 1 END) AS v_q,
        |    sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END) AS v_rf,
        |    sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END) AS v_p,
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v_u
        |  FROM lineitem),
        |fk AS (SELECT count(*) AS n,
        |    sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS v
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT * FROM (
        |  SELECT 'orderkey_not_null' AS "constraint", n AS n_rows,
        |    CAST(v_nn AS BIGINT) AS n_violations, v_nn = 0 AS passed FROM rc
        |  UNION ALL SELECT 'quantity_range', n, CAST(v_q AS BIGINT), v_q = 0 FROM rc
        |  UNION ALL SELECT 'returnflag_domain', n, CAST(v_rf AS BIGINT), v_rf = 0 FROM rc
        |  UNION ALL SELECT 'price_positive', n, CAST(v_p AS BIGINT), v_p = 0 FROM rc
        |  UNION ALL SELECT 'pk_unique', n, CAST(v_u AS BIGINT), v_u = 0 FROM rc
        |  UNION ALL SELECT 'fk_orders', n, CAST(v AS BIGINT), v = 0 FROM fk)
        |ORDER BY "constraint"""".stripMargin),

    "q161_x_skyline" ->
      ("""WITH o AS (SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_no
        |  FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT b.o_orderkey, b.price_cents, CAST(b.day_no AS INT) AS day_no
        |FROM o b
        |WHERE NOT EXISTS (SELECT 1 FROM o a
        |  WHERE a.price_cents >= b.price_cents AND a.day_no <= b.day_no
        |    AND (a.price_cents > b.price_cents OR a.day_no < b.day_no))
        |ORDER BY b.o_orderkey""".stripMargin),

    // gap attribution among equal timestamps follows the (tsu, event_id)
    // tie order on both sides; twap is one IEEE division of exact longs
    "q162_x_twap" ->
      ("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |g AS (SELECT user_id, cents,
        |    lead(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id) - tsu AS gap
        |  FROM e)
        |SELECT user_id, count(*) AS n_obs, CAST(sum(gap) AS BIGINT) AS span,
        |  CASE WHEN sum(gap) > 0 THEN
        |    floor(CAST(sum(gap * cents) AS DOUBLE) / CAST(sum(gap) AS DOUBLE) * 100 + 0.5) / 100
        |  END AS twap
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin),

    // Cramer expansion spelled in the IDENTICAL order as the Spark
    // expression tree — IEEE doubles then agree bit-for-bit
    "q163_x_ols2" ->
      ("""WITH b AS (SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(floor(l_discount * 1000 + 0.5) AS BIGINT) AS disc_pm,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |s AS (SELECT l_returnflag, count(*) AS n,
        |    sum(qty) AS s1, sum(disc_pm) AS s2, sum(cents) AS sy,
        |    sum(qty * qty) AS s11, sum(qty * disc_pm) AS s12,
        |    sum(disc_pm * disc_pm) AS s22,
        |    sum(qty * cents) AS s1y, sum(disc_pm * cents) AS s2y
        |  FROM b GROUP BY l_returnflag),
        |d AS (SELECT l_returnflag, n,
        |    CAST(n AS DOUBLE) AS dn, CAST(s1 AS DOUBLE) AS d1,
        |    CAST(s2 AS DOUBLE) AS d2, CAST(sy AS DOUBLE) AS dy,
        |    CAST(s11 AS DOUBLE) AS d11, CAST(s12 AS DOUBLE) AS d12,
        |    CAST(s22 AS DOUBLE) AS d22,
        |    CAST(s1y AS DOUBLE) AS d1y, CAST(s2y AS DOUBLE) AS d2y
        |  FROM s),
        |c AS (SELECT l_returnflag, n,
        |    dn * (d11 * d22 - d12 * d12) - d1 * (d1 * d22 - d12 * d2)
        |      + d2 * (d1 * d12 - d11 * d2) AS det,
        |    dy * (d11 * d22 - d12 * d12) - d1 * (d1y * d22 - d12 * d2y)
        |      + d2 * (d1y * d12 - d11 * d2y) AS det_a,
        |    dn * (d1y * d22 - d12 * d2y) - dy * (d1 * d22 - d12 * d2)
        |      + d2 * (d1 * d2y - d1y * d2) AS det_b1,
        |    dn * (d11 * d2y - d1y * d12) - d1 * (d1 * d2y - d1y * d2)
        |      + dy * (d1 * d12 - d11 * d2) AS det_b2
        |  FROM d)
        |SELECT l_returnflag, n,
        |  CASE WHEN det <> 0 THEN floor(det_a / det * 1000000 + 0.5) / 1000000 END AS intercept,
        |  CASE WHEN det <> 0 THEN floor(det_b1 / det * 1000000 + 0.5) / 1000000 END AS b1,
        |  CASE WHEN det <> 0 THEN floor(det_b2 / det * 1000000 + 0.5) / 1000000 END AS b2
        |FROM c ORDER BY l_returnflag""".stripMargin),

    "q164_x_boilerplate" ->
      (s"""$LinedCte,
        |l0 AS (SELECT doc_id, unnest(la) AS line,
        |         unnest(range(1, len(la) + 1)) AS i
        |       FROM lined),
        |l AS (SELECT l0.doc_id, d.source, l0.line, l0.i
        |      FROM l0 JOIN documents d USING (doc_id)
        |      WHERE length(l0.line) > 0),
        |gs AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        |df AS (SELECT source, line, count(DISTINCT doc_id) AS df
        |       FROM l GROUP BY source, line),
        |boiler AS (SELECT df.source, df.line FROM df JOIN gs USING (source)
        |           WHERE df.df >= 2 AND df.df * 1000 > 100 * gs.n_docs),
        |k AS (SELECT l.doc_id, l.source, l.line, l.i,
        |        b.line IS NOT NULL AS is_b
        |      FROM l LEFT JOIN boiler b
        |        ON l.source = b.source AND l.line = b.line),
        |cnt AS (SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_lines,
        |        CAST(sum(CASE WHEN NOT is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |        string_agg(CASE WHEN NOT is_b THEN line END, chr(10) ORDER BY i) AS txt
        |        FROM k GROUP BY doc_id, source)
        |SELECT d.doc_id, d.source,
        |  coalesce(cnt.n_lines, 0) AS n_lines,
        |  coalesce(cnt.n_kept, 0) AS n_kept,
        |  coalesce(cnt.txt, '') AS text_clean
        |FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.doc_id
        |ORDER BY d.doc_id""".stripMargin),

    // arg_max skips rows whose ORDER argument is NULL — exactly the
    // per-field non-null filter Spark's max_by(when(...)) applies
    "q165_x_lww_consolidate" ->
      ("""WITH base AS (SELECT o_orderkey, 1 AS ver,
        |    o_orderstatus AS status, o_totalprice AS price
        |  FROM orders WHERE o_orderkey % 7 < 3),
        |u2 AS (SELECT o_orderkey, 2 AS ver, 'U2' AS status,
        |    CAST(NULL AS DOUBLE) AS price
        |  FROM base WHERE o_orderkey % 3 = 0),
        |u3 AS (SELECT o_orderkey, 3 AS ver, CAST(NULL AS VARCHAR) AS status,
        |    price + 1000 AS price
        |  FROM base WHERE o_orderkey % 5 = 0),
        |c AS (SELECT * FROM base UNION ALL SELECT * FROM u2
        |      UNION ALL SELECT * FROM u3)
        |SELECT o_orderkey,
        |  arg_max(status, CASE WHEN status IS NOT NULL THEN ver END) AS status,
        |  arg_max(price, CASE WHEN price IS NOT NULL THEN ver END) AS price,
        |  max(ver) AS last_version, count(*) AS n_updates
        |FROM c GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin),

    "q166_x_copurchase" ->
      ("""WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |nb AS (SELECT count(DISTINCT b) AS n FROM it),
        |ic AS (SELECT i, count(*) AS c FROM it GROUP BY i),
        |p AS (SELECT a.i AS item1, b.i AS item2, count(*) AS c12
        |      FROM it a JOIN it b ON a.b = b.b AND a.i < b.i
        |      GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p.item1, p.item2, p.c12,
        |  c1.c AS c1, c2.c AS c2,
        |  p.c12 * nb.n * 1000000 // (c1.c * c2.c) AS lift_e6,
        |  p.c12 * 1000000 // c1.c AS conf_e6
        |FROM p
        |JOIN ic c1 ON c1.i = p.item1
        |JOIN ic c2 ON c2.i = p.item2
        |CROSS JOIN nb
        |ORDER BY p.item1, p.item2""".stripMargin),

    "q167_x_cusum" ->
      ("""WITH m AS (SELECT o_orderpriority AS prio,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2),
        |w AS (SELECT prio, month,
        |    count(*) OVER (PARTITION BY prio) AS n,
        |    cents * count(*) OVER (PARTITION BY prio)
        |      - sum(cents) OVER (PARTITION BY prio) AS dev_scaled
        |  FROM m),
        |c AS (SELECT prio, month, n, dev_scaled,
        |    sum(dev_scaled) OVER (PARTITION BY prio ORDER BY month
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM w)
        |SELECT prio, month, n, CAST(dev_scaled AS BIGINT) AS dev_scaled,
        |  CAST(cum - min(cum) OVER (PARTITION BY prio ORDER BY month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS drift_scaled
        |FROM c ORDER BY prio, month""".stripMargin),

    "q168_x_interval_union" ->
      ("""WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + (event_id % 997 + 1) * 1000000 AS e
        |  FROM events),
        |mk AS (SELECT user_id, s, e,
        |    CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS new_isl
        |  FROM iv WHERE s IS NOT NULL AND e IS NOT NULL AND e >= s),
        |isl AS (SELECT user_id, s, e,
        |    sum(new_isl) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
        |  FROM mk),
        |g AS (SELECT user_id, isl_id, count(*) AS n, min(s) AS ms, max(e) AS me
        |      FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n) AS BIGINT) AS n_intervals,
        |  count(*) AS n_islands,
        |  CAST(sum(me - ms) AS BIGINT) AS covered,
        |  CAST(max(me) - min(ms) AS BIGINT) AS span
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin),

    // per-cell terms from exact integer counts, one fixed float tree per
    // cell, nanonat-quantized then summed exactly (the q153 discipline)
    "q169_x_mutual_info" -> {
      def miSql(src: String, label: String) =
        s"""SELECT '$label' AS pair, t.n_rows, t.nx_distinct, t.ny_distinct, t.mi_e9
           |FROM (
           |  WITH cells AS (SELECT x, y, count(*) AS c FROM ($src) GROUP BY x, y),
           |  cx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM cells GROUP BY x),
           |  cy AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM cells GROUP BY y),
           |  tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells)
           |  SELECT max(tot.n) AS n_rows,
           |    count(DISTINCT cells.x) AS nx_distinct,
           |    count(DISTINCT cells.y) AS ny_distinct,
           |    CAST(sum(CAST(floor(
           |      (CAST(cells.c AS DOUBLE) / tot.n) *
           |      ln(CAST(cells.c * tot.n AS DOUBLE) / CAST(cx.cx * cy.cy AS DOUBLE))
           |      * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS mi_e9
           |  FROM cells JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN tot
           |) t""".stripMargin
      Seq(
        miSql("SELECT o_orderpriority AS x, o_orderstatus AS y FROM orders " +
          "WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL",
          "prio_status"),
        miSql("SELECT l_returnflag AS x, l_linestatus AS y FROM lineitem " +
          "WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL",
          "flag_status"),
        miSql("SELECT event_type AS x, user_id % 10 AS y FROM events " +
          "WHERE event_type IS NOT NULL AND user_id IS NOT NULL",
          "type_userbucket"))
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) u ORDER BY pair")
    },

    "q170_x_weighted_percentiles" ->
      ("""WITH b AS (SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |w AS (SELECT l_returnflag, cents, qty,
        |    sum(qty) OVER (PARTITION BY l_returnflag ORDER BY cents, qty
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(qty) OVER (PARTITION BY l_returnflag) AS totw
        |  FROM b)
        |SELECT l_returnflag, CAST(sum(qty) AS BIGINT) AS total_weight,
        |  min(CASE WHEN cumw * 1000 >= 250 * totw THEN cents END) AS p250,
        |  min(CASE WHEN cumw * 1000 >= 500 * totw THEN cents END) AS p500,
        |  min(CASE WHEN cumw * 1000 >= 750 * totw THEN cents END) AS p750,
        |  min(CASE WHEN cumw * 1000 >= 900 * totw THEN cents END) AS p900
        |FROM w GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    "q171_x_event_transitions" ->
      ("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
        |t AS (SELECT event_type AS from_state,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY tsu, event_id)
        |      AS to_state
        |  FROM e),
        |c AS (SELECT from_state, to_state, count(*) AS n FROM t
        |      WHERE to_state IS NOT NULL GROUP BY 1, 2),
        |o AS (SELECT from_state, CAST(sum(n) AS BIGINT) AS ot FROM c GROUP BY 1)
        |SELECT c.from_state, c.to_state, c.n, c.n * 1000 // o.ot AS p_permille
        |FROM c JOIN o USING (from_state)
        |ORDER BY c.from_state, c.to_state""".stripMargin),

    "q172_x_rollup" ->
      ("""SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS bal_cents,
        |  CAST(GROUPING(r_name, n_name) AS INT) AS gid
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name, n_name""".stripMargin),

    // variance determinant in DOUBLE (identical tree to the Spark
    // expression); numerator stays exact long
    "q173_x_standardize" ->
      ("""WITH e AS (SELECT event_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |s AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS sx,
        |    CAST(sum(cents * cents) AS BIGINT) AS sxx,
        |    min(cents) AS mn, max(cents) AS mx
        |  FROM e WHERE cents IS NOT NULL GROUP BY 1),
        |d AS (SELECT *,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den2
        |  FROM s)
        |SELECT e.event_id, e.event_type, e.cents,
        |  CASE WHEN den2 > 0 THEN CAST(floor(
        |    CAST(n * e.cents - sx AS DOUBLE) / sqrt(den2) * 1000000 + 0.5)
        |    AS BIGINT) END AS z_e6,
        |  CASE WHEN mx > mn THEN (e.cents - mn) * 1000000 // (mx - mn)
        |  END AS minmax_e6
        |FROM e JOIN d USING (event_type) ORDER BY e.event_id""".stripMargin),

    "q174_x_tfidf" ->
      ("""WITH t AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents WHERE length(trim(text)) > 0),
        |nd AS (SELECT count(DISTINCT doc_id) AS n
        |       FROM documents WHERE length(trim(text)) > 0),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.doc_freq,
        |    CAST(floor(CAST(tf.tf AS DOUBLE) *
        |      ln(CAST(nd.n AS DOUBLE) / CAST(df.doc_freq AS DOUBLE))
        |      * 1000000000 + 0.5) AS BIGINT) AS score_e9
        |  FROM tf JOIN df USING (term) CROSS JOIN nd),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score_e9 DESC, term) AS rank
        |      FROM sc WHERE score_e9 > 0)
        |SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, doc_freq, score_e9
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin),

    "q175_x_top_paths" ->
      ("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
        |  FROM events),
        |m AS (SELECT *, CASE WHEN us - lag(us) OVER w IS NULL
        |        OR us - lag(us) OVER w > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS nw
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM m),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
        |        ORDER BY us, event_id) AS rn
        |      FROM s),
        |p AS (SELECT user_id, sid,
        |        string_agg(event_type, '>' ORDER BY rn) AS path
        |      FROM r WHERE rn <= 3 GROUP BY user_id, sid)
        |SELECT path, count(*) AS n_sessions FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 25""".stripMargin),

    "q176_x_abc_classes" ->
      ("""WITH items AS (SELECT l_returnflag, l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS rev_cents
        |  FROM lineitem GROUP BY 1, 2),
        |w AS (SELECT *,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY rev_cents DESC, l_partkey) AS rank,
        |    sum(rev_cents) OVER (PARTITION BY l_returnflag
        |      ORDER BY rev_cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(rev_cents) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM items)
        |SELECT l_returnflag, l_partkey, rev_cents, CAST(rank AS INT) AS rank,
        |  CAST(cum * 1000 // tot AS BIGINT) AS cum_permille,
        |  CASE WHEN cum * 1000 <= 800 * tot THEN 'A'
        |       WHEN cum * 1000 <= 950 * tot THEN 'B' ELSE 'C' END AS abc_class
        |FROM w WHERE rank <= 100
        |ORDER BY l_returnflag, rank""".stripMargin),

    // trend/seasonal/residual readouts replay the identical double trees
    // off the exact-long rolling sums
    "q177_x_seasonal_decompose" ->
      ("""WITH m AS (SELECT o_orderpriority AS prio,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1, 2),
        |w AS (SELECT *,
        |    ((row_number() OVER o) - 1) % 12 AS ph,
        |    CASE WHEN count(cents) OVER a = 12
        |      THEN sum(cents) OVER a END AS sa,
        |    CASE WHEN count(cents) OVER b = 12
        |      THEN sum(cents) OVER b END AS sb
        |  FROM m
        |  WINDOW o AS (PARTITION BY prio ORDER BY month),
        |    a AS (PARTITION BY prio ORDER BY month
        |          ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING),
        |    b AS (PARTITION BY prio ORDER BY month
        |          ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)),
        |t AS (SELECT *, CAST(sa + sb AS BIGINT) AS t2p,
        |        CAST(24 * cents - (sa + sb) AS BIGINT) AS det
        |      FROM w),
        |se AS (SELECT prio, ph, CAST(sum(det) AS BIGINT) AS sn,
        |         count(*) AS sc
        |       FROM t WHERE det IS NOT NULL GROUP BY 1, 2)
        |SELECT t.prio, t.month, t.cents,
        |  CAST(floor(CAST(t.t2p AS DOUBLE) / 24 * 1000000 + 0.5) AS BIGINT)
        |    AS trend_e6,
        |  CAST(floor(CAST(se.sn AS DOUBLE) / (CAST(se.sc AS DOUBLE) * 24)
        |    * 1000000 + 0.5) AS BIGINT) AS seasonal_e6,
        |  CAST(floor((CAST(t.cents AS DOUBLE) - CAST(t.t2p AS DOUBLE) / 24
        |    - CAST(se.sn AS DOUBLE) / (CAST(se.sc AS DOUBLE) * 24))
        |    * 1000000 + 0.5) AS BIGINT) AS resid_e6
        |FROM t LEFT JOIN se ON t.prio = se.prio AND t.ph = se.ph
        |ORDER BY t.prio, t.month""".stripMargin),

    "q178_x_gini" ->
      ("""WITH cr AS (SELECT c_mktsegment, o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT c_mktsegment, rev,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY rev) AS i
        |  FROM cr)
        |SELECT c_mktsegment, count(*) AS n, CAST(sum(rev) AS BIGINT) AS total,
        |  CASE WHEN sum(rev) > 0 THEN CAST(floor(
        |    CAST(2 * sum(i * rev) - (count(*) + 1) * sum(rev) AS DOUBLE) /
        |    CAST(count(*) * sum(rev) AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
        |  END AS gini_e6
        |FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // weights are whole-half-life bit shifts; the final division by 2^20
    // is exact even in DOUBLE
    "q179_x_decay_score" ->
      ("""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |k AS (SELECT user_id, tsu, cents,
        |    (max(tsu) OVER (PARTITION BY user_id) - tsu) // 604800000000 AS hl,
        |    max(tsu) OVER (PARTITION BY user_id) AS last_us
        |  FROM e)
        |SELECT user_id, count(*) AS n_events, max(last_us) AS last_us,
        |  CAST(sum(CASE WHEN hl <= 20 THEN cents << CAST(20 - hl AS INT)
        |    ELSE 0 END) AS BIGINT) / 1048576.0 AS decay_score
        |FROM k GROUP BY user_id ORDER BY user_id""".stripMargin),

    // identical smoothing tree; chr(1)||'OOV' replays the OOV
    // sentinel; round(x, 4) agrees half-up in both engines (q86 contract)
    "q180_x_bigram_nll" ->
      ("""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |tok AS (SELECT doc_id, unnest(toks) AS term,
        |          unnest(range(1, len(toks) + 1)) AS pos
        |        FROM t),
        |c AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
        |mp AS (SELECT tok.doc_id, tok.pos,
        |         CASE WHEN c.c >= 2 THEN tok.term
        |              ELSE chr(1) || 'OOV' END AS m
        |       FROM tok JOIN c USING (term)),
        |bg AS (SELECT doc_id, m AS w1,
        |         lead(m) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        |       FROM mp),
        |db AS (SELECT doc_id, w1, w2, count(*) AS nb FROM bg
        |       WHERE w2 IS NOT NULL GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, CAST(sum(nb) AS BIGINT) AS c12 FROM db GROUP BY 1, 2),
        |c1 AS (SELECT m AS w1, count(*) AS c1 FROM mp GROUP BY 1),
        |v AS (SELECT count(DISTINCT m) AS v FROM mp)
        |SELECT db.doc_id, CAST(sum(db.nb) AS BIGINT) AS n_bigrams,
        |  round(sum(db.nb * -ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * (v.v + 1))))
        |    / sum(db.nb), 4) AS avg_nll
        |FROM db JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin),

    "q181_x_stream_expectations" ->
      ("""WITH rc AS (SELECT count(*) AS n,
        |    sum(CASE WHEN value >= 0 THEN 0 ELSE 1 END) AS v1,
        |    sum(CASE WHEN event_type IN ('view','click','purchase','signup')
        |        THEN 0 ELSE 1 END) AS v2,
        |    sum(CASE WHEN user_id IS NOT NULL THEN 0 ELSE 1 END) AS v3
        |  FROM events)
        |SELECT * FROM (
        |  SELECT 'type_known' AS "constraint", n AS n_rows,
        |    CAST(v2 AS BIGINT) AS n_violations, v2 = 0 AS passed FROM rc
        |  UNION ALL SELECT 'user_not_null', n, CAST(v3 AS BIGINT), v3 = 0 FROM rc
        |  UNION ALL SELECT 'value_nonneg', n, CAST(v1 AS BIGINT), v1 = 0 FROM rc)
        |ORDER BY "constraint"""".stripMargin),

    // the streaming emission is pair-for-pair the batch lead window, so
    // the oracle IS q171's
    "q182_x_stream_transitions" ->
      ("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
        |t AS (SELECT event_type AS from_state,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY tsu, event_id)
        |      AS to_state
        |  FROM e),
        |c AS (SELECT from_state, to_state, count(*) AS n FROM t
        |      WHERE to_state IS NOT NULL GROUP BY 1, 2),
        |o AS (SELECT from_state, CAST(sum(n) AS BIGINT) AS ot FROM c GROUP BY 1)
        |SELECT c.from_state, c.to_state, c.n, c.n * 1000 // o.ot AS p_permille
        |FROM c JOIN o USING (from_state)
        |ORDER BY c.from_state, c.to_state""".stripMargin),

    // q143's pair derivation with an extra offset dimension k ∈ {1, 2};
    // generate_series(1, len-k) is empty when len <= k, matching the
    // slice-length guard on the Spark side
    "q183_x_skipgram_pmi" ->
      ("""WITH t AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS l
        |  FROM documents
        |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |ks AS (SELECT unnest(generate_series(1, 2)) AS k),
        |ix AS (SELECT unnest(generate_series(1, len(l) - k)) AS i, l, k
        |       FROM t CROSS JOIN ks),
        |p AS (SELECT l[i] AS w1, l[i + k] AS w2 FROM ix),
        |cp AS (SELECT w1, w2, count(*) AS c12 FROM p GROUP BY 1, 2),
        |m1 AS (SELECT w1, count(*) AS c1 FROM p GROUP BY 1),
        |m2 AS (SELECT w2, count(*) AS c2 FROM p GROUP BY 1),
        |n AS (SELECT count(*) AS n_pairs FROM p)
        |SELECT cp.w1, cp.w2, cp.c12, m1.c1, m2.c2, n.n_pairs,
        |       CAST((CAST(cp.c12 AS HUGEINT) * n.n_pairs * 1000000)
        |         // (m1.c1 * m2.c2) AS BIGINT) AS ratio_e6
        |FROM cp JOIN m1 ON cp.w1 = m1.w1 JOIN m2 ON cp.w2 = m2.w2 CROSS JOIN n
        |WHERE cp.c12 >= 5
        |  AND CAST(cp.c12 AS HUGEINT) * n.n_pairs
        |    >= 15 * CAST(m1.c1 AS HUGEINT) * m2.c2
        |ORDER BY cp.w1, cp.w2""".stripMargin),

    // the oracle is the FULL join recomputed from scratch — hash equality
    // against the maintained J₀ ∪ joinDelta readout proves the identity
    "q184_x_join_delta" ->
      ("""SELECT c_mktsegment,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // same digit extraction from the decimal rendering; the Benford
    // constants land >= 9e-3 away from a floor boundary, so libm log10
    // vs ln-ratio ulps cannot flip them
    "q185_x_benford" ->
      ("""WITH v AS (SELECT o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL
        |    AND CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > 0),
        |d AS (SELECT o_orderpriority,
        |    CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
        |    count(*) AS n_d
        |  FROM v GROUP BY 1, 2),
        |t AS (SELECT *, CAST(sum(n_d) OVER (PARTITION BY o_orderpriority)
        |        AS BIGINT) AS n FROM d),
        |b AS (SELECT *,
        |    n_d * 1000000 // n AS share_e6,
        |    CAST(floor(log10(1 + 1.0 / digit) * 1e6 + 0.5) AS BIGINT)
        |      AS benford_e6
        |  FROM t)
        |SELECT o_orderpriority, digit, n_d, n, share_e6, benford_e6,
        |  abs(share_e6 - benford_e6) AS abs_dev_e6
        |FROM b ORDER BY o_orderpriority, digit""".stripMargin),

    // the same planted corruption replayed, then each tier's readout in
    // the unified (tier, name, metric_a, metric_b) long format
    "q186_x_quality_suite" ->
      ("""WITH base AS (SELECT l_orderkey, l_quantity, l_returnflag,
        |    l_linestatus, l_extendedprice FROM lineitem),
        |p AS (
        |  SELECT * FROM base
        |  UNION ALL
        |  SELECT -l_orderkey, -1, CAST(NULL AS VARCHAR), l_linestatus,
        |         l_extendedprice
        |  FROM base WHERE l_orderkey % 50 = 0),
        |rc AS (SELECT count(*) AS n,
        |    sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
        |        THEN 0 ELSE 1 END) AS v_q,
        |    sum(CASE WHEN l_returnflag IS NOT NULL THEN 0 ELSE 1 END) AS v_rf
        |  FROM p),
        |fk AS (SELECT count(*) AS n,
        |    sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS v
        |  FROM p LEFT JOIN orders o ON p.l_orderkey = o.o_orderkey),
        |expect AS (
        |  SELECT 'expect' AS tier, 'quantity_range' AS name,
        |    n AS metric_a, CAST(v_q AS BIGINT) AS metric_b FROM rc
        |  UNION ALL SELECT 'expect', 'returnflag_not_null', n,
        |    CAST(v_rf AS BIGINT) FROM rc
        |  UNION ALL SELECT 'expect', 'fk_orders', n, CAST(v AS BIGINT) FROM fk),
        |prof AS (
        |  SELECT 'profile' AS tier, 'l_quantity' AS name,
        |    count(*) - count(l_quantity) AS metric_a,
        |    count(DISTINCT l_quantity) AS metric_b FROM p
        |  UNION ALL
        |  SELECT 'profile', 'l_returnflag', count(*) - count(l_returnflag),
        |    count(DISTINCT l_returnflag) FROM p),
        |c AS (SELECT l_linestatus,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v FROM p
        |  WHERE l_extendedprice IS NOT NULL
        |    AND CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) > 0),
        |dd AS (SELECT l_linestatus,
        |    CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT) AS digit,
        |    count(*) AS n_d
        |  FROM c GROUP BY 1, 2),
        |t AS (SELECT *, CAST(sum(n_d) OVER (PARTITION BY l_linestatus)
        |        AS BIGINT) AS n FROM dd),
        |ben AS (SELECT 'benford' AS tier,
        |    l_linestatus || ':' || CAST(digit AS VARCHAR) AS name,
        |    n_d * 1000000 // n AS metric_a,
        |    abs(n_d * 1000000 // n -
        |      CAST(floor(log10(1 + 1.0 / digit) * 1e6 + 0.5) AS BIGINT))
        |      AS metric_b
        |  FROM t)
        |SELECT tier, name, CAST(metric_a AS BIGINT) AS metric_a,
        |       CAST(metric_b AS BIGINT) AS metric_b
        |FROM (SELECT * FROM expect UNION ALL SELECT * FROM prof
        |      UNION ALL SELECT * FROM ben)
        |ORDER BY tier, name""".stripMargin),

    // the maintained emission == the batch join, so the oracle IS the
    // batch join
    "q187_x_stream_join_delta" ->
      ("""SELECT c.user_id, c.event_id AS left_id, p.event_id AS right_id
        |FROM events c JOIN events p ON c.user_id = p.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND c.event_id IS NOT NULL AND p.event_id IS NOT NULL
        |ORDER BY c.user_id, left_id, right_id""".stripMargin),

    // the same midrank construction: 2·avg_rank = 2·rank() + ties − 1,
    // exact integer U, one integer division
    "q188_x_grouped_auc" ->
      ("""WITH d AS (SELECT source, n_chars AS s, (lang = 'en') AS pos
        |  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
        |r AS (SELECT source, pos,
        |    2 * rank() OVER (PARTITION BY source ORDER BY s)
        |      + count(*) OVER (PARTITION BY source, s) - 1 AS r2
        |  FROM d),
        |a AS (SELECT source,
        |    CAST(sum(CASE WHEN pos THEN r2 ELSE 0 END) AS BIGINT) AS s2,
        |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
        |  FROM r GROUP BY 1)
        |SELECT source, n_pos, n_neg,
        |  (s2 - n_pos * (n_pos + 1)) * 1000000
        |    // nullif(2 * n_pos * n_neg, 0) AS auc_e6
        |FROM a ORDER BY source""".stripMargin),

    // q48's candidate generation with the containment readout: exact
    // distinct-token intersection, integer cross-mult threshold on the
    // smaller side, both directions as exact integer divisions
    "q189_x_containment" ->
      ("""WITH toks AS (SELECT doc_id,
        |    unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS tok
        |  FROM documents),
        |sizes AS (SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |    AND b.doc_id - a.doc_id <= 50
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, n_inter, sa.n_tok AS n_a, sb.n_tok AS n_b,
        |  n_inter * 1000000 // sa.n_tok AS cont_a_e6,
        |  n_inter * 1000000 // sb.n_tok AS cont_b_e6
        |FROM inter JOIN sizes sa ON sa.doc_id = id_a
        |           JOIN sizes sb ON sb.doc_id = id_b
        |WHERE n_inter * 1000000 >= 1000000 * least(sa.n_tok, sb.n_tok)
        |ORDER BY id_a, id_b""".stripMargin),

    // per-term e9 quantization then exact integer sum; c=1 terms are 0
    // exactly on both engines (ln 1 = 0)
    "q190_x_token_entropy" ->
      ("""WITH tok AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |c AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS n_distinct,
        |    CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
        |      * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS clnc
        |  FROM c GROUP BY 1)
        |SELECT doc_id, n_tokens, n_distinct,
        |  CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
        |    - clnc // n_tokens AS entropy_e9
        |FROM a ORDER BY doc_id""".stripMargin),

    // deterministic (count desc, term asc) rank, e3-quantized logs,
    // integer OLS sums, negated-slope orientation (Spark div truncates,
    // DuckDB // floors — only the positive direction is portable)
    "q191_x_zipf_slope" ->
      ("""WITH tok AS (SELECT source AS domain,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
        |    AND length(trim(text)) > 0),
        |c AS (SELECT domain, t, count(*) AS c FROM tok GROUP BY 1, 2),
        |r AS (SELECT domain, c,
        |    row_number() OVER (PARTITION BY domain ORDER BY c DESC, t ASC) AS rk
        |  FROM c),
        |q AS (SELECT domain, c,
        |    CAST(floor(ln(CAST(rk AS DOUBLE)) * 1e3 + 0.5) AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(c AS DOUBLE)) * 1e3 + 0.5) AS BIGINT) AS y
        |  FROM r WHERE rk <= 50),
        |a AS (SELECT domain, count(*) AS v, CAST(sum(c) AS BIGINT) AS n_top_tokens,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM q GROUP BY 1)
        |SELECT domain, v, n_top_tokens,
        |  (sx * sy - v * sxy) * 1000000
        |    // nullif(v * sxx - sx * sx, 0) AS zipf_slope_neg_e6
        |FROM a ORDER BY domain""".stripMargin),

    // q70's BM25 and q190's entropy re-ranked by (score desc, id) and
    // fused with the exact integer 1e9 // (60 + rank) contributions
    "q192_x_rrf_fuse" ->
      ("""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        |  FROM documents),
        |base AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, toks FROM t),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM base),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf, max(dl) AS dl
        |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM base)
        |  WHERE term IN ('join', 'scan', 'window') GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        |bm AS (SELECT doc_id,
        |  round(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1.0)
        |        / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats GROUP BY doc_id),
        |etok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tk
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |ec AS (SELECT doc_id, tk, count(*) AS c FROM etok GROUP BY 1, 2),
        |ea AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
        |      * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS clnc
        |  FROM ec GROUP BY 1),
        |ent AS (SELECT doc_id,
        |    CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
        |      - clnc // n_tokens AS score
        |  FROM ea),
        |ra AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM bm),
        |rb AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM ent),
        |u AS (SELECT doc_id, r FROM ra UNION ALL SELECT doc_id, r FROM rb)
        |SELECT doc_id, count(*) AS n_lists,
        |  CAST(sum(1000000000 // (60 + r)) AS BIGINT) AS rrf_e9
        |FROM u GROUP BY 1 ORDER BY rrf_e9 DESC, doc_id""".stripMargin),

    // same md5 draw onto the dense row_number index, same +1 shift on
    // anchor collision
    "q193_x_negative_sample" ->
      ("""WITH ids AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS idx
        |  FROM documents WHERE doc_id IS NOT NULL),
        |nn AS (SELECT count(*) AS n FROM ids),
        |a AS (SELECT doc_id, idx, j,
        |    CAST('0x' || substring(md5(doc_id || '_' || j), 1, 8) AS BIGINT) AS h
        |  FROM ids CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS j) js),
        |t AS (SELECT doc_id AS anchor_id, j,
        |    CASE WHEN h % n = idx THEN (h % n + 1) % n ELSE h % n END AS tidx
        |  FROM a CROSS JOIN nn)
        |SELECT t.anchor_id, CAST(t.j AS INT) AS j, ids.doc_id AS neg_id
        |FROM t JOIN ids ON ids.idx = t.tidx
        |ORDER BY t.anchor_id, j""".stripMargin),

    // the WAV payload is lossless framing around closed-form PCM, so the
    // oracle regenerates the decoded samples and replays both window
    // statistics as exact integers
    "q194_x_audio_features" ->
      ("""WITH d AS (SELECT doc_id, 4000 + (doc_id % 5) * 800 AS ns
        |  FROM documents WHERE doc_id < 300),
        |s AS (SELECT doc_id, i,
        |    ((doc_id * 2654435761 + i * 40503) % 65536) - 32768 AS v
        |  FROM d CROSS JOIN (SELECT unnest(generate_series(0, 7199)) AS i) g
        |  WHERE i < ns),
        |w AS (SELECT doc_id, i // 1000 AS win, v,
        |    lag(v) OVER (PARTITION BY doc_id, i // 1000 ORDER BY i) AS pv
        |  FROM s)
        |SELECT doc_id, CAST(win AS INT) AS win, count(*) AS n_samples,
        |  CAST(sum(v * v) AS BIGINT) AS sumsq,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND ((v >= 0) <> (pv >= 0))
        |      THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        |FROM w GROUP BY 1, 2 ORDER BY doc_id, win""".stripMargin),

    // the same distinct-value grid, per-group cumulative counts, and
    // cross-multiplied ECDF comparison
    "q195_x_ks_drift" ->
      ("""WITH b AS (SELECT source AS g, n_chars AS v FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        |cs AS (SELECT g, v, count(*) AS c FROM b GROUP BY 1, 2),
        |cg AS (SELECT v, CAST(sum(c) AS BIGINT) AS cg FROM cs GROUP BY 1),
        |sz AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM cs GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cs),
        |grid AS (SELECT sz.g, cg.v, cg.cg FROM cg CROSS JOIN sz),
        |cum AS (SELECT grid.g, grid.v,
        |    CAST(sum(COALESCE(cs.c, 0)) OVER
        |      (PARTITION BY grid.g ORDER BY grid.v) AS BIGINT) AS cum_s,
        |    CAST(sum(grid.cg) OVER
        |      (PARTITION BY grid.g ORDER BY grid.v) AS BIGINT) AS cum_g
        |  FROM grid LEFT JOIN cs ON cs.g = grid.g AND cs.v = grid.v),
        |num AS (SELECT cum.g, sz.n, tot.total,
        |    max(abs(cum_s * (tot.total - sz.n) - (cum_g - cum_s) * sz.n))
        |      AS ks_num
        |  FROM cum JOIN sz ON sz.g = cum.g CROSS JOIN tot
        |  GROUP BY 1, 2, 3)
        |SELECT g AS source, n, total - n AS n_rest,
        |  ks_num * 1000000 // nullif(n * (total - n), 0) AS ks_e6
        |FROM num ORDER BY source""".stripMargin),

    // q68's quality + dedup replay, read out as per-source stage counts
    "q196_x_corpus_funnel" -> {
      val stop = TextAnalysis.EnglishStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH b AS (
        |  SELECT doc_id, source, text,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks,
        |    regexp_split_to_array(trim(lower(text)), '\\s+') AS ltoks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, source, text, CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
        |      / nullif(length(text), 0) AS punct_ratio,
        |    CASE WHEN CAST(len(list_filter(ltoks, x -> x IN ($stop))) AS DOUBLE)
        |              / nullif(len(ltoks), 0) >= 0.05
        |         THEN 'en' ELSE 'und' END AS lang_pred
        |  FROM b),
        |f AS (
        |  SELECT * FROM q
        |  WHERE lang_pred = 'en' AND n_tokens >= 5
        |    AND coalesce(punct_ratio, 0.0) <= 0.2),
        |k AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY md5(trim(text))),
        |base AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |qc AS (SELECT source, count(*) AS n_quality FROM f GROUP BY 1),
        |kc AS (SELECT f.source, count(*) AS n_kept
        |       FROM f JOIN k USING (doc_id) GROUP BY 1)
        |SELECT base.source, base.n_docs,
        |  CAST(COALESCE(qc.n_quality, 0) AS BIGINT) AS n_quality,
        |  CAST(COALESCE(kc.n_kept, 0) AS BIGINT) AS n_kept
        |FROM base LEFT JOIN qc USING (source) LEFT JOIN kc USING (source)
        |ORDER BY base.source""".stripMargin
    },

    // same fixed-bin grid, Laplace smoothing, and e9 term quantization;
    // the streaming variant drains the identical count grid first
    "q198_x_psi_drift" ->
      psiDriftSql("documents", "source", "n_chars",
        "source IS NOT NULL AND n_chars IS NOT NULL", 60L, 10, "source"),

    "q199_x_stream_psi_drift" ->
      psiDriftSql("events", "event_type", "value",
        "event_type IS NOT NULL AND value IS NOT NULL", 50L, 10, "event_type"),

    // q127's history rebuilt inline, probed with DuckDB's native ASOF
    // LEFT JOIN; the valid_to CASE is the deleted-interval demotion
    "q200_x_point_in_time_join" ->
      ("""WITH ch AS (SELECT o_custkey AS k, o_orderkey AS v,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
        |    o_totalprice AS price FROM orders),
        |w AS (SELECT k, v, op, price,
        |    lead(v) OVER (PARTITION BY k ORDER BY v) AS valid_to FROM ch),
        |h AS (SELECT k, v AS valid_from, valid_to, price
        |      FROM w WHERE op <> 'D'),
        |p AS (SELECT o_custkey AS k, o_orderkey AS t FROM orders
        |      WHERE o_orderkey % 13 = 0)
        |SELECT p.k, p.t,
        |  CASE WHEN h.valid_to IS NULL OR p.t < h.valid_to
        |       THEN h.price END AS price_asof
        |FROM p ASOF LEFT JOIN h ON p.k = h.k AND p.t >= h.valid_from
        |ORDER BY p.k, p.t""".stripMargin),

    // the identical integer weight recurrence (shared via
    // Features.ewmaWeights — single source, the minhashAB discipline),
    // lag terms as exact long products, one integer division
    "q201_x_ewma" -> {
      val ws = graft.operators.Features.ewmaWeights(800000L, 8)
      def lagY(j: Int) = if (j == 0) "cents" else s"lag(cents, $j) OVER win"
      val num = ws.zipWithIndex
        .map { case (w, j) => s"COALESCE(${lagY(j)} * $w, 0)" }.mkString(" + ")
      val den = ws.zipWithIndex
        .map { case (w, j) =>
          s"CASE WHEN ${lagY(j)} IS NOT NULL THEN $w ELSE 0 END" }
        .mkString(" + ")
      s"""WITH m AS (SELECT o_orderpriority AS prio,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS x,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2),
        |t AS (SELECT prio, x, cents, ($num) AS num, ($den) AS den
        |  FROM m WINDOW win AS (PARTITION BY prio ORDER BY x))
        |SELECT prio, x, cents, CAST(num // den AS BIGINT) AS ewma
        |FROM t ORDER BY prio, x""".stripMargin
    },

    // within-group min-rank permille, global row_number order statistic,
    // equi-join on the computed index
    "q202_x_quantile_normalize" ->
      ("""WITH b AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
        |  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        |r AS (SELECT g, v, rank() OVER (PARTITION BY g ORDER BY v) AS rk,
        |    count(*) OVER (PARTITION BY g) AS n FROM b),
        |p AS (SELECT DISTINCT g, v,
        |    CASE WHEN n = 1 THEN 0
        |         ELSE CAST((rk - 1) * 1000 // (n - 1) AS BIGINT) END AS permille
        |  FROM r),
        |gidx AS (SELECT v AS gv, row_number() OVER (ORDER BY v) - 1 AS gi
        |         FROM b),
        |nn AS (SELECT count(*) AS ng FROM b)
        |SELECT p.g AS source, p.v AS n_chars, p.permille,
        |  gidx.gv AS norm_value
        |FROM p CROSS JOIN nn
        |JOIN gidx ON gidx.gi = p.permille * (nn.ng - 1) // 1000
        |ORDER BY source, n_chars""".stripMargin),

    // both lags over one named window, common evaluation support,
    // exact integer errors and one division
    "q203_x_mase" ->
      ("""WITH m AS (SELECT o_orderpriority AS prio,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS x,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2),
        |l AS (SELECT prio, x, cents,
        |    lag(cents, 12) OVER win AS lf, lag(cents, 1) OVER win AS lb
        |  FROM m WINDOW win AS (PARTITION BY prio ORDER BY x)),
        |a AS (SELECT prio, count(*) AS n_eval,
        |    CAST(sum(abs(cents - lf)) AS BIGINT) AS err_forecast,
        |    CAST(sum(abs(cents - lb)) AS BIGINT) AS err_baseline
        |  FROM l WHERE lf IS NOT NULL AND lb IS NOT NULL GROUP BY 1)
        |SELECT prio, n_eval, err_forecast, err_baseline,
        |  err_forecast * 1000000 // nullif(err_baseline, 0) AS mase_e6
        |FROM a ORDER BY prio""".stripMargin),

    // the same space-joined k-grams (range is end-exclusive: L-k+1 grams)
    "q204_x_ngram_diversity" ->
      ("""WITH t AS (SELECT source, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
        |    AND length(trim(text)) > 0),
        |g1 AS (SELECT source, 1 AS n, unnest(toks) AS gram FROM t),
        |g2 AS (SELECT source, 2 AS n,
        |    unnest(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1])) AS gram
        |  FROM t WHERE len(toks) >= 2),
        |g3 AS (SELECT source, 3 AS n,
        |    unnest(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
        |  FROM t WHERE len(toks) >= 3),
        |u AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2
        |      UNION ALL SELECT * FROM g3)
        |SELECT source, n, count(*) AS total_grams,
        |  count(DISTINCT gram) AS distinct_grams,
        |  count(DISTINCT gram) * 1000 // count(*) AS distinct_pm
        |FROM u GROUP BY 1, 2 ORDER BY source, n""".stripMargin),

    // identical float tree per cell over the exact long products
    // (observed-cells identity chi2 = sum o^2*n/(r*c) - n); V derives
    // from the quantized chi2 so both engines sqrt the same int
    "q205_x_chi_square" ->
      ("""WITH cells AS (SELECT lang AS x, source AS y, count(*) AS o
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |cx AS (SELECT x, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |cy AS (SELECT y, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |t AS (SELECT
        |    CAST(floor(CAST(o * o AS DOUBLE) * CAST(n AS DOUBLE)
        |      / CAST(r * c AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS t_e6,
        |    n, cells.x, cells.y
        |  FROM cells JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN tot),
        |a AS (SELECT max(n) AS n_rows,
        |    count(DISTINCT x) AS nx_levels, count(DISTINCT y) AS ny_levels,
        |    CAST(sum(t_e6) - max(n) * 1000000 AS BIGINT) AS chi2_e6
        |  FROM t)
        |SELECT n_rows, nx_levels, ny_levels, chi2_e6,
        |  CAST(floor(sqrt(CAST(chi2_e6 AS DOUBLE) / 1e6 /
        |    CAST(nullif(n_rows * least(nx_levels - 1, ny_levels - 1), 0)
        |      AS DOUBLE))
        |    * 1e6 + 0.5) AS BIGINT) AS cramers_v_e6
        |FROM a""".stripMargin),

    // q110's session derivation with the streaming twin's null filters;
    // the strict-gap boundary difference cannot bite (no micros-exact
    // gap tie exists, asserted by the session-window spec)
    "q206_x_stream_session_window" ->
      ("""WITH e AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |m AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 43200000000 THEN 1 ELSE 0 END AS new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |x AS (
        |  SELECT user_id, us,
        |    CAST(sum(new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_idx
        |  FROM m)
        |SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(us) AS BIGINT) AS start_us, CAST(max(us) AS BIGINT) AS end_us,
        |  CAST(max(us) - min(us) AS BIGINT) AS duration_us
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // q138's per-column profile on both date halves, joined and diffed;
    // null rates as integer permille, range change on the string casts
    "q197_x_profile_diff" -> {
      def side(pred: String, sfx: String) =
        Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate").map(c =>
          s"""SELECT '$c' AS col_name, count(*) AS n_$sfx,
            |  (count(*) - count($c)) * 1000 // nullif(count(*), 0) AS null_pm_$sfx,
            |  count(DISTINCT $c) AS distinct_$sfx,
            |  min(CAST($c AS VARCHAR)) AS mn_$sfx,
            |  max(CAST($c AS VARCHAR)) AS mx_$sfx
            |FROM orders WHERE $pred""".stripMargin)
          .mkString("\nUNION ALL\n")
      s"""WITH a AS (${side("o_orderdate < DATE '1996-01-01'", "before")}),
        |b AS (${side("o_orderdate >= DATE '1996-01-01'", "after")})
        |SELECT a.col_name, n_before, n_after, null_pm_before, null_pm_after,
        |  distinct_before, distinct_after,
        |  (mn_before IS DISTINCT FROM mn_after
        |    OR mx_before IS DISTINCT FROM mx_after) AS range_changed
        |FROM a JOIN b ON a.col_name = b.col_name
        |ORDER BY a.col_name""".stripMargin
    },

    // the q53/q54 planted-pixel replay with the same partitioning box
    // bounds and div-floor channel means
    "q207_x_image_resize" ->
      ("""WITH d AS (SELECT doc_id AS s FROM documents WHERE doc_id < 200),
        |dims AS (SELECT s, CAST(8 + s % 9 AS BIGINT) AS w,
        |    CAST(6 + s % 7 AS BIGINT) AS h FROM d),
        |op AS (SELECT s, w, h, gx.ox, gy.oy
        |  FROM dims
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS ox) gx
        |  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS oy) gy),
        |box AS (SELECT s, ox, oy,
        |    ox * w // 4 AS x0, (ox + 1) * w // 4 AS x1,
        |    oy * h // 3 AS y0, (oy + 1) * h // 3 AS y1 FROM op),
        |px AS (SELECT s, ox, oy, gx.x, gy.y
        |  FROM box
        |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS x) gx
        |  CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS y) gy
        |  WHERE gx.x >= x0 AND gx.x < x1 AND gy.y >= y0 AND gy.y < y1),
        |c AS (SELECT s, ox, oy,
        |    CAST(sum((31 * s + 7 * x + 13 * y) % 256) AS BIGINT) AS rs,
        |    CAST(sum((17 * s + 11 * x + 5 * y) % 256) AS BIGINT) AS gs,
        |    CAST(sum((23 * s + 3 * x + 19 * y) % 256) AS BIGINT) AS bs,
        |    count(*) AS np
        |  FROM px GROUP BY 1, 2, 3)
        |SELECT s AS doc_id, CAST(ox AS INT) AS ox, CAST(oy AS INT) AS oy,
        |  CAST(rs // np AS INT) AS r, CAST(gs // np AS INT) AS g,
        |  CAST(bs // np AS INT) AS b
        |FROM c ORDER BY doc_id, oy, ox""".stripMargin),

    // the drained max_by snapshot == the batch fold, so the oracle is
    // q121's latest-version-per-key replay
    "q208_x_stream_cdc_snapshot" ->
      ("""WITH ch AS (
        |  SELECT o_custkey AS k, o_orderkey AS v,
        |         CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
        |         o_totalprice AS price
        |  FROM orders),
        |r AS (SELECT *, row_number() OVER (PARTITION BY k ORDER BY v DESC) AS rn
        |      FROM ch)
        |SELECT k, v, price FROM r WHERE rn = 1 AND op <> 'D'
        |ORDER BY k""".stripMargin),

    "q209_x_cluster_quality" ->
      ivfClusterQualitySql(kClusters = 8, iters = 3, dim = 64, maxId = 200L),

    // the planted-frame closed form v = (29s + 31f + 7x + 13y) mod 256
    // replayed over the SAME k=3 evenly-spaced frame sampling
    // (fidx = i·n div 3) the frameSampleIndices plan picks
    "q210_x_video_frames" ->
      ("""WITH d AS (SELECT doc_id AS s, 4 + doc_id % 4 AS n
        |  FROM documents WHERE doc_id < 300),
        |f AS (SELECT s, n, CAST(i * n // 3 AS INT) AS fidx
        |  FROM d CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS i) g),
        |px AS (SELECT s, n, fidx, gx.x, gy.y
        |  FROM f
        |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS x) gx
        |  CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS y) gy),
        |c AS (SELECT s, n, fidx,
        |    CAST(sum((29 * s + 31 * fidx + 7 * x + 13 * y) % 256) AS BIGINT)
        |      AS sum_gray
        |  FROM px GROUP BY 1, 2, 3)
        |SELECT s AS doc_id, CAST(n AS INT) AS n_frames, fidx AS frame_idx,
        |  CAST(16 AS INT) AS width, CAST(12 AS INT) AS height, sum_gray
        |FROM c ORDER BY doc_id, frame_idx""".stripMargin),

    // q117's OLS shape at lag 12; the h>12 recursion composes to
    // c0 + phi*(c0 + phi*y) — the IDENTICAL IEEE op order the JVM
    // kernel executes, so the rounded forecasts hash-match
    "q211_u8_sar1_forecast" ->
      ("""WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(round(o_totalprice * 100)) / 1e8, 6) AS y
        |  FROM orders GROUP BY 1),
        |o AS (SELECT row_number() OVER (ORDER BY month) AS t, y FROM m),
        |p AS (SELECT a.y AS yt, b.y AS yl FROM o a JOIN o b ON b.t = a.t - 12),
        |f AS (SELECT CAST(count(*) AS DOUBLE) AS cnt, sum(yt) AS sy,
        |             sum(yl) AS sx, sum(yt*yl) AS sxy, sum(yl*yl) AS sxx
        |      FROM p),
        |c AS (SELECT (sxx*sy - sx*sxy) / (cnt*sxx - sx*sx) AS c0,
        |             (cnt*sxy - sx*sy) / (cnt*sxx - sx*sx) AS phi FROM f),
        |nn AS (SELECT CAST(max(t) AS BIGINT) AS n FROM o),
        |s1 AS (SELECT CAST(h.h AS INT) AS step, c.c0 + c.phi * o.y AS fv
        |  FROM (SELECT unnest(generate_series(1, 12)) AS h) h
        |  CROSS JOIN c CROSS JOIN nn
        |  JOIN o ON o.t = nn.n + h.h - 12),
        |s2 AS (SELECT CAST(step + 12 AS INT) AS step, c.c0 + c.phi * fv AS fv
        |  FROM s1 CROSS JOIN c)
        |SELECT 'all' AS key, CAST(12 AS INT) AS season, step,
        |       round(fv, 4) AS forecast
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
        |ORDER BY step""".stripMargin),

    // HUGEINT sufficient sums (exact — Σy² of a cents series overflows
    // BIGINT), then the IDENTICAL first-row-cofactor double tree the
    // Spark operator emits; t rounded to 4 before the crit5 comparison
    "q212_u56_adf_fixed" ->
      ("""WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |o AS (SELECT month, cents, lag(cents) OVER (ORDER BY month) AS ylag FROM m),
        |g AS (SELECT CAST(o.ylag AS HUGEINT) AS x,
        |             CAST(lag(o.cents - o.ylag) OVER (ORDER BY o.month) AS HUGEINT) AS z,
        |             CAST(o.cents - o.ylag AS HUGEINT) AS yv
        |      FROM o),
        |h AS (SELECT x, z, yv FROM g WHERE z IS NOT NULL),
        |s AS (SELECT count(*) AS n, CAST(count(*) AS DOUBLE) AS nn,
        |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(z) AS DOUBLE) AS sz,
        |  CAST(sum(yv) AS DOUBLE) AS sy,
        |  CAST(sum(x*x) AS DOUBLE) AS sxx, CAST(sum(z*z) AS DOUBLE) AS szz,
        |  CAST(sum(x*z) AS DOUBLE) AS sxz, CAST(sum(x*yv) AS DOUBLE) AS sxy,
        |  CAST(sum(z*yv) AS DOUBLE) AS szy, CAST(sum(yv*yv) AS DOUBLE) AS syy
        |  FROM h),
        |c AS (SELECT n, nn, sxy,
        |  nn*(sxx*szz - sxz*sxz) - sx*(sx*szz - sxz*sz) + sz*(sx*sxz - sxx*sz) AS det,
        |  sy*(sxx*szz - sxz*sxz) - sx*(sxy*szz - sxz*szy) + sz*(sxy*sxz - sxx*szy) AS detb0,
        |  nn*(sxy*szz - sxz*szy) - sy*(sx*szz - sxz*sz) + sz*(sx*szy - sxy*sz) AS detb1,
        |  nn*(sxx*szy - sxy*sxz) - sx*(sx*szy - sxy*sz) + sy*(sx*sxz - sxx*sz) AS detb2,
        |  sy, szy, syy, sz, szz
        |  FROM s),
        |r AS (SELECT n, det, detb1,
        |  (syy - (detb0*sy + detb1*sxy + detb2*szy) / det) / (nn - 3.0)
        |    * (nn*szz - sz*sz) / det AS varb1
        |  FROM c),
        |t AS (SELECT n,
        |  CASE WHEN det <> 0 THEN floor((detb1/det) * 10000 + 0.5) / 10000 END AS coef,
        |  CASE WHEN det <> 0 AND n > 3
        |       THEN floor(((detb1/det) / sqrt(varb1)) * 10000 + 0.5) / 10000 END AS adf_t
        |  FROM r)
        |SELECT 'all' AS key, n AS n_obs, coef, adf_t, -2.86 AS crit5,
        |       adf_t < -2.86 AS stationary5
        |FROM t""".stripMargin),

    // the innovations recursion e_t = (y_t - mu) - th*e_{t-1} replayed
    // per grid candidate by ONE recursive CTE (th rides along as a
    // recursion column); argmin by (sse, th) matches the kernel's
    // ascending-theta first-minimum
    "q213_u8_ma1_forecast" ->
      ("""WITH RECURSIVE m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(round(o_totalprice * 100)) / 1e8, 6) AS y
        |  FROM orders GROUP BY 1),
        |o AS (SELECT row_number() OVER (ORDER BY month) AS t, y FROM m),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(y) / count(*) AS mu FROM o),
        |cand AS (SELECT CAST(k AS DOUBLE) / 10.0 AS th
        |         FROM (SELECT unnest(generate_series(-9, 9)) AS k)),
        |rec(th, t, e) AS (
        |  SELECT c.th, CAST(1 AS BIGINT) AS t, o.y - st.mu AS e
        |  FROM cand c CROSS JOIN st JOIN o ON o.t = 1
        |  UNION ALL
        |  SELECT r.th, r.t + 1, o.y - st.mu - r.th * r.e
        |  FROM rec r JOIN o ON o.t = r.t + 1 CROSS JOIN st),
        |sse AS (SELECT th, sum(e * e) AS sse FROM rec GROUP BY th),
        |le AS (SELECT r.th, r.e AS elast FROM rec r CROSS JOIN st WHERE r.t = st.n),
        |best AS (SELECT s.th, l.elast FROM sse s JOIN le l ON s.th = l.th
        |         ORDER BY s.sse, s.th LIMIT 1)
        |SELECT 'all' AS key, round(b.th, 1) AS theta, round(st.mu, 6) AS mu,
        |       CAST(h.step AS INT) AS step,
        |       round(CASE WHEN h.step = 1 THEN st.mu + b.th * b.elast
        |                  ELSE st.mu END, 4) AS forecast
        |FROM best b CROSS JOIN st
        |CROSS JOIN (SELECT unnest(generate_series(1, 6)) AS step) h
        |ORDER BY step""".stripMargin),

    // same planting, same regex decomposition, list_filter for the
    // parameter-exact tracking strip (DuckDB's filter-HOF twin)
    "q214_x_url_canonical" ->
      ("""WITH p AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://' ||
        |    (['Example.COM','news.example.co.uk','CDN.Media.org',
        |      'shop.example.com.au','blog.sample.net'])[CAST(doc_id % 5 AS INT) + 1] ||
        |    (CASE doc_id % 3 WHEN 0 THEN ':80' WHEN 1 THEN ':443' ELSE '' END) ||
        |    '/p/' || CAST(doc_id % 30 AS VARCHAR) ||
        |    (CASE doc_id % 4
        |       WHEN 0 THEN '?id=' || CAST(doc_id % 30 AS VARCHAR) || '&utm_source=feed'
        |       WHEN 1 THEN '?utm_campaign=x&ref=y'
        |       WHEN 2 THEN ''
        |       ELSE '?a=1&fbclid=zzz' END) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END) AS url
        |  FROM documents),
        |c AS (SELECT doc_id, url,
        |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  lower(regexp_replace(regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ':[0-9]+$', '')) AS host,
        |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*:([0-9]+)', 1) AS port,
        |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
        |  regexp_extract(url, '\?([^#]*)', 1) AS q
        |  FROM p),
        |k AS (SELECT *, list_filter(string_split(q, '&'),
        |    x -> NOT regexp_matches(x, '^(utm_[a-z_]+|fbclid|gclid)=') AND x <> '') AS kept
        |  FROM c),
        |u AS (SELECT doc_id, url,
        |  scheme || '://' ||
        |  (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |          OR (scheme = 'https' AND port = '443')
        |        THEN host ELSE host || ':' || port END) ||
        |  (CASE WHEN path = '' THEN '/' ELSE path END) ||
        |  (CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&') ELSE '' END)
        |    AS canonical,
        |  (CASE WHEN len(string_split(host, '.')) <= 2 THEN host
        |        WHEN (string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1])
        |          IN ('co.uk','org.uk','ac.uk','gov.uk','co.jp','com.au','co.nz','com.br','co.in')
        |        THEN string_split(host, '.')[-3] || '.' || string_split(host, '.')[-2]
        |          || '.' || string_split(host, '.')[-1]
        |        ELSE string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1] END)
        |    AS domain
        |  FROM k)
        |SELECT doc_id, url, canonical, domain,
        |       count(*) OVER (PARTITION BY canonical) AS n_dups
        |FROM u ORDER BY doc_id""".stripMargin),

    // drained streaming funnel == the batch funnel — q147's oracle
    "q215_x_stream_funnel" ->
      ("""WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_type AS s FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase') AND ts IS NOT NULL),
        |w0 AS (SELECT *, min(CASE WHEN s = 'view' THEN t END)
        |         OVER (PARTITION BY user_id) AS t0 FROM e),
        |w1 AS (SELECT *, min(CASE WHEN s = 'click' AND t > t0 THEN t END)
        |         OVER (PARTITION BY user_id) AS t1 FROM w0),
        |w2 AS (SELECT *, min(CASE WHEN s = 'purchase' AND t > t1 THEN t END)
        |         OVER (PARTITION BY user_id) AS t2 FROM w1),
        |u AS (SELECT DISTINCT user_id,
        |        CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END +
        |        CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END +
        |        CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS completed
        |      FROM w2),
        |st AS (SELECT * FROM (VALUES (0, 'view'), (1, 'click'), (2, 'purchase'))
        |       v(stage, stage_name))
        |SELECT st.stage, st.stage_name, count(*) AS n_reached
        |FROM u CROSS JOIN st WHERE u.completed > st.stage
        |GROUP BY 1, 2 ORDER BY st.stage""".stripMargin),

    // pairwise self-join replay of the kernel's O(n²) pair walk — S and
    // 18·Var exact integers, z the same fixed double expression
    "q216_x_mann_kendall" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority AS k,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2),
        |o AS (SELECT k, row_number() OVER (PARTITION BY k ORDER BY month) AS t, y
        |      FROM m),
        |p AS (SELECT a.k,
        |        CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sg
        |      FROM o a JOIN o b ON a.k = b.k AND b.t > a.t),
        |s AS (SELECT k, CAST(coalesce(sum(sg), 0) AS BIGINT) AS s FROM p GROUP BY k),
        |n AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM o GROUP BY k),
        |tg AS (SELECT k, y, CAST(count(*) AS BIGINT) AS c FROM o
        |       GROUP BY k, y HAVING count(*) > 1),
        |tt AS (SELECT k, CAST(coalesce(sum(c*(c-1)*(2*c+5)), 0) AS BIGINT) AS tsum
        |       FROM tg GROUP BY k),
        |v AS (SELECT n.k, n.n, s.s,
        |        n.n*(n.n-1)*(2*n.n+5) - coalesce(tt.tsum, 0) AS var18
        |      FROM n JOIN s ON n.k = s.k LEFT JOIN tt ON n.k = tt.k),
        |z AS (SELECT *,
        |        CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var18 / 18.0)
        |             WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var18 / 18.0)
        |             ELSE 0.0 END AS zz
        |      FROM v),
        |r AS (SELECT k, n, s, var18, floor(zz * 10000 + 0.5) / 10000 AS z FROM z)
        |SELECT k AS key, CAST(n AS INT) AS n_obs, s AS s_stat, var18, z,
        |  CASE WHEN z > 1.96 THEN 'increasing'
        |       WHEN z < -1.96 THEN 'decreasing'
        |       ELSE 'no_trend' END AS trend
        |FROM r ORDER BY key""".stripMargin),

    // identical fingerprint construction: md5 over chr(1)-joined fields,
    // 15 hex chars -> BIGINT, commutative modular sums
    "q217_x_table_checksum" ->
      ("""WITH f AS (
        |  SELECT source,
        |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || chr(1) || text
        |      || chr(1) || lang || chr(1) || CAST(n_chars AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS fp
        |  FROM documents)
        |SELECT source, count(*) AS n_rows,
        |  CAST(sum(fp % 1000000007) AS BIGINT) AS digest_a,
        |  CAST(sum(fp % 998244353) AS BIGINT) AS digest_b,
        |  min(fp) AS fp_min, max(fp) AS fp_max
        |FROM f GROUP BY source ORDER BY source""".stripMargin),

    // the (a, b) linear-in-c innovations recursion per (phi, theta)
    // candidate in ONE recursive CTE; c* = sab/sbb and SSE_min =
    // saa - sab^2/sbb closed-form; forecast by a second recursion
    "q218_u8_arma11_forecast" ->
      ("""WITH RECURSIVE m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(round(o_totalprice * 100)) / 1e8, 6) AS y
        |  FROM orders GROUP BY 1),
        |o AS (SELECT row_number() OVER (ORDER BY month) AS t, y FROM m),
        |nn AS (SELECT CAST(max(t) AS BIGINT) AS n FROM o),
        |cand AS (SELECT p.ph, q.th
        |  FROM (SELECT CAST(k AS DOUBLE) / 10.0 AS ph
        |        FROM (SELECT unnest(generate_series(-9, 9)) AS k)) p
        |  CROSS JOIN (SELECT CAST(k AS DOUBLE) / 10.0 AS th
        |        FROM (SELECT unnest(generate_series(-9, 9)) AS k)) q),
        |rec(ph, th, t, a, b) AS (
        |  SELECT c.ph, c.th, CAST(2 AS BIGINT),
        |         o2.y - c.ph * o1.y - c.th * 0.0, 1.0 - c.th * 0.0
        |  FROM cand c, o o1, o o2 WHERE o1.t = 1 AND o2.t = 2
        |  UNION ALL
        |  SELECT r.ph, r.th, r.t + 1,
        |         o2.y - r.ph * o1.y - r.th * r.a,
        |         1.0 - r.th * r.b
        |  FROM rec r JOIN o o1 ON o1.t = r.t JOIN o o2 ON o2.t = r.t + 1),
        |s AS (SELECT r.ph, r.th,
        |        sum(r.a * r.a) AS saa, sum(r.a * r.b) AS sab, sum(r.b * r.b) AS sbb,
        |        max(CASE WHEN r.t = nn.n THEN r.a END) AS alast,
        |        max(CASE WHEN r.t = nn.n THEN r.b END) AS blast
        |      FROM rec r CROSS JOIN nn GROUP BY r.ph, r.th),
        |best AS (SELECT ph, th, sab / sbb AS c0,
        |                alast - (sab / sbb) * blast AS elast
        |         FROM s ORDER BY saa - sab * sab / sbb, ph, th LIMIT 1),
        |ly AS (SELECT o.y FROM o CROSS JOIN nn WHERE o.t = nn.n),
        |fc(step, f) AS (
        |  SELECT 1, b.c0 + b.ph * ly.y + b.th * b.elast
        |  FROM best b CROSS JOIN ly
        |  UNION ALL
        |  SELECT fc.step + 1, b.c0 + b.ph * fc.f
        |  FROM fc CROSS JOIN best b WHERE fc.step < 6)
        |SELECT 'all' AS key, round(b.ph, 1) AS phi, round(b.th, 1) AS theta,
        |       round(b.c0, 6) AS c, CAST(fc.step AS INT) AS step,
        |       round(fc.f, 4) AS forecast
        |FROM fc CROSS JOIN best b ORDER BY step""".stripMargin),

    // same md5-bucket hashing, one ln per bucket over exact integer
    // products, nanonat-quantized then integer-summed per doc
    "q219_x_naive_bayes" ->
      (s"""WITH d AS (
        |  SELECT doc_id, text,
        |    CASE WHEN list_contains(regexp_split_to_array(trim(text), '\\s+'), 'vector')
        |         THEN 1 ELSE 0 END AS y
        |  FROM documents
        |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |t AS (SELECT doc_id, y, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        |      FROM d),
        |b AS (SELECT doc_id, y, ${dkHash32("tok")} % 512 AS bk FROM t),
        |cnt AS (SELECT bk, CAST(sum(y) AS BIGINT) AS np,
        |               CAST(sum(1 - y) AS BIGINT) AS nn
        |        FROM b GROUP BY bk),
        |tot AS (SELECT CAST(sum(np) AS BIGINT) AS tp, CAST(sum(nn) AS BIGINT) AS tn
        |        FROM cnt),
        |w AS (SELECT bk,
        |        CAST(floor(ln(CAST((np + 1) * (tn + 512) AS DOUBLE) /
        |                      CAST((nn + 1) * (tp + 512) AS DOUBLE)) * 1e9 + 0.5)
        |          AS BIGINT) AS w
        |      FROM cnt CROSS JOIN tot),
        |pr AS (SELECT CASE WHEN sum(y) > 0 AND sum(1 - y) > 0
        |         THEN CAST(floor(ln(CAST(sum(y) AS DOUBLE) / sum(1 - y)) * 1e9 + 0.5)
        |                AS BIGINT) END AS pw
        |       FROM d)
        |SELECT b.doc_id, b.y AS label,
        |       CAST(pr.pw + sum(w.w) AS BIGINT) AS score_nn,
        |       pr.pw + sum(w.w) > 0 AS pred
        |FROM b JOIN w ON b.bk = w.bk CROSS JOIN pr
        |GROUP BY b.doc_id, b.y, pr.pw
        |ORDER BY b.doc_id""".stripMargin),

    // same ranking (score DESC, doc_id tie-break), exact integer
    // precision@k numerators, two integer divisions
    "q220_x_avg_precision" ->
      ("""WITH d AS (
        |  SELECT source, doc_id, n_chars AS s,
        |         strpos(text, 'data') > 0 AS y
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND text IS NOT NULL),
        |r AS (SELECT source, y,
        |    row_number() OVER (PARTITION BY source ORDER BY s DESC, doc_id) AS k,
        |    sum(CASE WHEN y THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY source ORDER BY s DESC, doc_id) AS cum
        |  FROM d)
        |SELECT source, count(*) AS n,
        |  CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(sum(CASE WHEN y THEN cum * 1000000000 // k ELSE 0 END)
        |    // nullif(sum(CASE WHEN y THEN 1 ELSE 0 END), 0) AS BIGINT) AS ap_e9
        |FROM r GROUP BY source ORDER BY source""".stripMargin),

    // identical planted score/label hashes (doc_id positive, so % == pmod)
    // and the same all-integer per-bin readout
    "q221_x_calibration" ->
      ("""WITH d AS (
        |  SELECT (doc_id * 48271) % 1000001 AS s,
        |         (doc_id * 2654435761) % 1000000 < (doc_id * 48271) % 1000001 AS y
        |  FROM documents),
        |g AS (SELECT least(s * 10 // 1000000, 9) AS bin, count(*) AS n,
        |        CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |        CAST(sum(s) AS BIGINT) AS ssum
        |      FROM d GROUP BY 1)
        |SELECT bin, n, n_pos,
        |  ssum // n AS mean_score_e6,
        |  n_pos * 1000000 // n AS obs_rate_e6,
        |  abs(ssum // n - n_pos * 1000000 // n) AS gap_e6,
        |  abs(ssum // n - n_pos * 1000000 // n) * n AS ece_num_e6
        |FROM g ORDER BY bin""".stripMargin),

    // six exact integer sums per status, then the SAME fixed double
    // tree (IEEE order mirrored character-for-character) for t and df
    "q222_x_welch_ttest" ->
      ("""WITH o AS (
        |  SELECT o_orderstatus AS st, o_orderpriority AS pr,
        |         CAST(round(o_totalprice) AS BIGINT) AS x
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        |    AND o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL),
        |a AS (SELECT st,
        |    CAST(sum(CASE WHEN pr = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN pr = '1-URGENT' THEN x ELSE 0 END) AS BIGINT) AS sa,
        |    sum(CASE WHEN pr = '1-URGENT' THEN CAST(x AS HUGEINT) * x
        |        ELSE CAST(0 AS HUGEINT) END) AS qa,
        |    CAST(sum(CASE WHEN pr = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN pr = '5-LOW' THEN x ELSE 0 END) AS BIGINT) AS sb,
        |    sum(CASE WHEN pr = '5-LOW' THEN CAST(x AS HUGEINT) * x
        |        ELSE CAST(0 AS HUGEINT) END) AS qb
        |  FROM o GROUP BY st)
        |SELECT st AS o_orderstatus, n_a, n_b,
        |  sa * 100 // nullif(n_a, 0) AS mean_a_e2,
        |  sb * 100 // nullif(n_b, 0) AS mean_b_e2,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND
        |    (((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n_a) / (n_a - 1)) / n_a
        |     + ((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n_b) / (n_b - 1)) / n_b) > 0
        |  THEN CAST(floor((CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b)
        |    / sqrt((((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n_a) / (n_a - 1)) / n_a
        |      + ((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n_b) / (n_b - 1)) / n_b))
        |    * 10000 + 0.5) AS BIGINT) END AS t_e4,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND
        |    (((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n_a) / (n_a - 1)) / n_a
        |     + ((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n_b) / (n_b - 1)) / n_b) > 0
        |  THEN CAST(floor(
        |    (((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n_a) / (n_a - 1)) / n_a
        |     + ((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n_b) / (n_b - 1)) / n_b)
        |    * (((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n_a) / (n_a - 1)) / n_a
        |     + ((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n_b) / (n_b - 1)) / n_b)
        |    / (((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n_a) / (n_a - 1)) / n_a
        |       * (((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n_a) / (n_a - 1)) / n_a)
        |       / (n_a - 1)
        |     + ((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n_b) / (n_b - 1)) / n_b
        |       * (((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n_b) / (n_b - 1)) / n_b)
        |       / (n_b - 1))
        |    * 10000 + 0.5) AS BIGINT) END AS df_e4
        |FROM a ORDER BY st""".stripMargin),

    // cell grid -> marginals -> Σrow·col, all exact integers; κ through
    // the one signed double division (the q216 convention)
    "q223_x_cohen_kappa" ->
      ("""WITH d AS (
        |  SELECT lang,
        |    CASE WHEN n_chars >= 350 THEN 'hi'
        |         WHEN n_chars >= 250 THEN 'mid' ELSE 'lo' END AS a,
        |    CASE WHEN n_chars + (doc_id * 1103515245) % 211 - 105 >= 350 THEN 'hi'
        |         WHEN n_chars + (doc_id * 1103515245) % 211 - 105 >= 250 THEN 'mid'
        |         ELSE 'lo' END AS b
        |  FROM documents WHERE lang IS NOT NULL),
        |c AS (SELECT lang, a, b, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2, 3),
        |rm AS (SELECT lang, a AS cls, CAST(sum(c) AS BIGINT) AS r FROM c GROUP BY 1, 2),
        |cm AS (SELECT lang, b AS cls, CAST(sum(c) AS BIGINT) AS cc FROM c GROUP BY 1, 2),
        |rc AS (SELECT rm.lang, CAST(sum(r * cc) AS BIGINT) AS rc
        |       FROM rm JOIN cm ON rm.lang = cm.lang AND rm.cls = cm.cls GROUP BY 1),
        |bs AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS diag
        |       FROM c GROUP BY 1),
        |rj AS (SELECT bs.lang, bs.n, bs.diag, coalesce(rc.rc, 0) AS rc
        |       FROM bs LEFT JOIN rc ON bs.lang = rc.lang)
        |SELECT lang, n,
        |  diag * 1000000 // n AS po_e6,
        |  CAST(CAST(rc AS HUGEINT) * 1000000 // (n * n) AS BIGINT) AS pe_e6,
        |  CASE WHEN n * n - rc <> 0 THEN
        |    CAST(floor(CAST(n * diag - rc AS DOUBLE) / (n * n - rc)
        |               * 1000000 + 0.5) AS BIGINT) END AS kappa_e6
        |FROM rj ORDER BY lang""".stripMargin),

    // q216's monthly input, the same pairwise self-join, each slope the
    // same one fixed double op; LOWER median by row_number = (m+1)//2
    "q224_x_theil_sen" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority AS k,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2),
        |o AS (SELECT k, row_number() OVER (PARTITION BY k ORDER BY month) AS t, y
        |      FROM m),
        |p AS (SELECT a.k,
        |        CAST(floor(CAST(b.y - a.y AS DOUBLE) * 1000000 / (b.t - a.t) + 0.5)
        |          AS BIGINT) AS sl
        |      FROM o a JOIN o b ON a.k = b.k AND b.t > a.t),
        |r AS (SELECT k, sl, row_number() OVER (PARTITION BY k ORDER BY sl) AS rn,
        |        CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS m FROM p),
        |n AS (SELECT k, CAST(count(*) AS INT) AS n_obs FROM o GROUP BY k)
        |SELECT r.k AS key, n.n_obs, r.m AS n_pairs, r.sl AS slope_e6
        |FROM r JOIN n ON r.k = n.k
        |WHERE r.rn = (r.m + 1) // 2
        |ORDER BY key""".stripMargin),

    // lifetable from the same per-user aggregate; the e9 survival
    // recurrence replayed by a recursive CTE (positive operands, so //
    // and the kernel's truncating Long division agree)
    "q225_x_kaplan_meier" -> KaplanMeierSql,

    // the streaming twin maintains the SAME per-user (min, max) state
    // and reads the curve off the drained snapshot — drained == batch,
    // so the oracle is identical
    "q236_x_stream_kaplan_meier" -> KaplanMeierSql,

    "q237_x_cluster_separation" ->
      ivfClusterSeparationSql(kClusters = 8, iters = 3, dim = 64, maxId = 200L),

    // q43's langid CTE composed into q223's kappa chain
    "q238_x_langid_agreement" -> {
      val stop = graft.text.TextAnalysis.EnglishStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (
        |  SELECT source, lang,
        |         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
        |  FROM documents WHERE source IS NOT NULL),
        |d AS (SELECT source,
        |    CASE WHEN CAST(len(list_filter(toks, x -> x IN ($stop))) AS DOUBLE)
        |           / nullif(len(toks), 0) >= 0.05
        |         THEN 'en' ELSE 'und' END AS a,
        |    CASE WHEN lang = 'en' THEN 'en' ELSE 'und' END AS b
        |  FROM t),
        |d2 AS (SELECT * FROM d WHERE a IS NOT NULL AND b IS NOT NULL),
        |c AS (SELECT source, a, b, CAST(count(*) AS BIGINT) AS c
        |      FROM d2 GROUP BY 1, 2, 3),
        |rm AS (SELECT source, a AS cls, CAST(sum(c) AS BIGINT) AS r
        |       FROM c GROUP BY 1, 2),
        |cm AS (SELECT source, b AS cls, CAST(sum(c) AS BIGINT) AS cc
        |       FROM c GROUP BY 1, 2),
        |rc AS (SELECT rm.source, CAST(sum(r * cc) AS BIGINT) AS rc
        |       FROM rm JOIN cm ON rm.source = cm.source AND rm.cls = cm.cls
        |       GROUP BY 1),
        |bs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS diag
        |       FROM c GROUP BY 1),
        |rj AS (SELECT bs.source, bs.n, bs.diag, coalesce(rc.rc, 0) AS rc
        |       FROM bs LEFT JOIN rc ON bs.source = rc.source)
        |SELECT source, n,
        |  diag * 1000000 // n AS po_e6,
        |  CAST(CAST(rc AS HUGEINT) * 1000000 // (n * n) AS BIGINT) AS pe_e6,
        |  CASE WHEN n * n - rc <> 0 THEN
        |    CAST(floor(CAST(n * diag - rc AS DOUBLE) / (n * n - rc)
        |               * 1000000 + 0.5) AS BIGINT) END AS kappa_e6
        |FROM rj ORDER BY source""".stripMargin
    },

    // one moment aggregate, the pair grid from a VALUES table, the same
    // fixed double r tree per pair
    "q226_x_corr_pairs" ->
      ("""WITH b AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS qty,
        |         CAST(round(l_extendedprice) AS BIGINT) AS price_d,
        |         CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
        |         CAST(round(l_tax * 100) AS BIGINT) AS tax_pct
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(qty) AS BIGINT) AS s_qty,
        |    CAST(sum(qty * qty) AS BIGINT) AS q_qty,
        |    CAST(sum(price_d) AS BIGINT) AS s_price,
        |    CAST(sum(price_d * price_d) AS BIGINT) AS q_price,
        |    CAST(sum(disc_pct) AS BIGINT) AS s_disc,
        |    CAST(sum(disc_pct * disc_pct) AS BIGINT) AS q_disc,
        |    CAST(sum(tax_pct) AS BIGINT) AS s_tax,
        |    CAST(sum(tax_pct * tax_pct) AS BIGINT) AS q_tax,
        |    CAST(sum(qty * price_d) AS BIGINT) AS p_qty_price,
        |    CAST(sum(qty * disc_pct) AS BIGINT) AS p_qty_disc,
        |    CAST(sum(qty * tax_pct) AS BIGINT) AS p_qty_tax,
        |    CAST(sum(price_d * disc_pct) AS BIGINT) AS p_price_disc,
        |    CAST(sum(price_d * tax_pct) AS BIGINT) AS p_price_tax,
        |    CAST(sum(disc_pct * tax_pct) AS BIGINT) AS p_disc_tax
        |  FROM b),
        |p AS (SELECT * FROM (VALUES
        |    ('qty', 'price_d'), ('qty', 'disc_pct'), ('qty', 'tax_pct'),
        |    ('price_d', 'disc_pct'), ('price_d', 'tax_pct'),
        |    ('disc_pct', 'tax_pct')) v(col_x, col_y)),
        |e AS (SELECT p.col_x, p.col_y, a.n,
        |    CASE p.col_x WHEN 'qty' THEN s_qty WHEN 'price_d' THEN s_price
        |      WHEN 'disc_pct' THEN s_disc ELSE s_tax END AS sx,
        |    CASE p.col_x WHEN 'qty' THEN q_qty WHEN 'price_d' THEN q_price
        |      WHEN 'disc_pct' THEN q_disc ELSE q_tax END AS qx,
        |    CASE p.col_y WHEN 'qty' THEN s_qty WHEN 'price_d' THEN s_price
        |      WHEN 'disc_pct' THEN s_disc ELSE s_tax END AS sy,
        |    CASE p.col_y WHEN 'qty' THEN q_qty WHEN 'price_d' THEN q_price
        |      WHEN 'disc_pct' THEN q_disc ELSE q_tax END AS qy,
        |    CASE WHEN p.col_x = 'qty' AND p.col_y = 'price_d' THEN p_qty_price
        |         WHEN p.col_x = 'qty' AND p.col_y = 'disc_pct' THEN p_qty_disc
        |         WHEN p.col_x = 'qty' AND p.col_y = 'tax_pct' THEN p_qty_tax
        |         WHEN p.col_x = 'price_d' AND p.col_y = 'disc_pct' THEN p_price_disc
        |         WHEN p.col_x = 'price_d' AND p.col_y = 'tax_pct' THEN p_price_tax
        |         ELSE p_disc_tax END AS sxy
        |  FROM p CROSS JOIN a)
        |SELECT col_x, col_y, n,
        |  CASE WHEN n >= 2 AND (CAST(n AS DOUBLE) * qx - CAST(sx AS DOUBLE) * sx)
        |      * (CAST(n AS DOUBLE) * qy - CAST(sy AS DOUBLE) * sy) > 0 THEN
        |    CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / sqrt((CAST(n AS DOUBLE) * qx - CAST(sx AS DOUBLE) * sx)
        |             * (CAST(n AS DOUBLE) * qy - CAST(sy AS DOUBLE) * sy))
        |      * 1000000 + 0.5) AS BIGINT) END AS r_e6
        |FROM e ORDER BY col_x, col_y""".stripMargin),

    // q221's planted hashes; per-row floored Brier terms, bin means and
    // rates as integer divisions, rel/res re-scaled per bin — every
    // floor replayed
    "q227_x_brier_decomp" ->
      ("""WITH d AS (
        |  SELECT (doc_id * 48271) % 1000001 AS s,
        |         (doc_id * 2654435761) % 1000000 < (doc_id * 48271) % 1000001 AS y
        |  FROM documents),
        |b AS (SELECT least(s * 10 // 1000000, 9) AS bin,
        |        CAST(count(*) AS BIGINT) AS n_b,
        |        CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p_b,
        |        CAST(sum(s) AS BIGINT) AS s_b,
        |        CAST(sum((s - CASE WHEN y THEN 1000000 ELSE 0 END)
        |             * (s - CASE WHEN y THEN 1000000 ELSE 0 END) // 1000000)
        |          AS BIGINT) AS q_b
        |      FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n_b) AS BIGINT) AS n,
        |        CAST(sum(p_b) AS BIGINT) AS n_pos,
        |        CAST(sum(q_b) AS BIGINT) AS qq FROM b),
        |e AS (SELECT n_b, s_b // n_b AS mean_b, p_b * 1000000 // n_b AS obs_b,
        |        t.n, t.n_pos, t.qq, n_pos * 1000000 // n AS obar
        |      FROM b CROSS JOIN t)
        |SELECT n, n_pos, qq // n AS brier_e6,
        |  CAST(sum(n_b * ((mean_b - obs_b) * (mean_b - obs_b) // 1000000))
        |    AS BIGINT) // n AS reliability_e6,
        |  CAST(sum(n_b * ((obs_b - obar) * (obs_b - obar) // 1000000))
        |    AS BIGINT) // n AS resolution_e6,
        |  obar * (1000000 - obar) // 1000000 AS uncertainty_e6
        |FROM e GROUP BY n, n_pos, qq, obar""".stripMargin),

    // the same exact-integer prefix sums on one ROWS window, the same
    // fixed double cost tree, argmin on the ROUNDED cost with split-
    // index tie-break
    "q228_x_changepoint" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority AS k,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(sum(round(o_totalprice * 100)) AS BIGINT) // 100000 AS y
        |  FROM orders GROUP BY 1, 2),
        |o AS (SELECT k, month, y,
        |        CAST(row_number() OVER (PARTITION BY k ORDER BY month) AS BIGINT) AS t,
        |        CAST(sum(y) OVER (PARTITION BY k ORDER BY month
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c1,
        |        CAST(sum(y * y) OVER (PARTITION BY k ORDER BY month
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c2,
        |        CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
        |        CAST(sum(y) OVER (PARTITION BY k) AS BIGINT) AS t1,
        |        CAST(sum(y * y) OVER (PARTITION BY k) AS BIGINT) AS t2
        |      FROM m),
        |c AS (SELECT *,
        |        CAST(floor(((CAST(t AS DOUBLE) * c2 - CAST(c1 AS DOUBLE) * c1) / t
        |          + (CAST(n - t AS DOUBLE) * (t2 - c2)
        |             - CAST(t1 - c1 AS DOUBLE) * (t1 - c1)) / (n - t))
        |          * 10000 + 0.5) AS BIGINT) AS cost_e4,
        |        CAST(floor((CAST(n AS DOUBLE) * t2 - CAST(t1 AS DOUBLE) * t1)
        |          / n * 10000 + 0.5) AS BIGINT) AS total_e4
        |      FROM o WHERE n >= 4 AND t >= 1 AND t < n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY k ORDER BY cost_e4, t) AS rk
        |      FROM c)
        |SELECT k AS o_orderpriority, n AS n_obs, t AS split_t, month AS split_ord,
        |  cost_e4, total_e4 AS total_cost_e4, total_e4 - cost_e4 AS gain_e4
        |FROM r WHERE rk = 1 ORDER BY k""".stripMargin),

    // count grid -> Σc², max c, all integer divisions
    "q229_x_concentration" ->
      ("""WITH g AS (
        |  SELECT l_returnflag, l_suppkey, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1, 2)
        |SELECT l_returnflag, CAST(sum(c) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(max(c) AS BIGINT) * 1000000 // CAST(sum(c) AS BIGINT) AS top_share_e6,
        |  CAST(CAST(sum(c * c) AS HUGEINT) * 1000000
        |    // (CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT)) AS BIGINT) AS hhi_e6
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin),

    // the same doubled-midrank identity per axis, then q226's fixed
    // double r tree over the exact rank moments
    "q230_x_spearman" ->
      ("""WITH d AS (
        |  SELECT l_returnflag AS g,
        |         CAST(round(l_quantity) AS BIGINT) AS x,
        |         CAST(round(l_extendedprice) AS BIGINT) // 100 AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |r AS (SELECT g,
        |    2 * rank() OVER (PARTITION BY g ORDER BY x)
        |      + count(*) OVER (PARTITION BY g, x) - 1 AS rx,
        |    2 * rank() OVER (PARTITION BY g ORDER BY y)
        |      + count(*) OVER (PARTITION BY g, y) - 1 AS ry
        |  FROM d),
        |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(rx * rx) AS BIGINT) AS qx,
        |    CAST(sum(ry) AS BIGINT) AS sy, CAST(sum(ry * ry) AS BIGINT) AS qy,
        |    CAST(sum(rx * ry) AS BIGINT) AS sxy
        |  FROM r GROUP BY 1)
        |SELECT g AS l_returnflag, n,
        |  CASE WHEN n >= 2 AND (CAST(n AS DOUBLE) * qx - CAST(sx AS DOUBLE) * sx)
        |      * (CAST(n AS DOUBLE) * qy - CAST(sy AS DOUBLE) * sy) > 0 THEN
        |    CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / sqrt((CAST(n AS DOUBLE) * qx - CAST(sx AS DOUBLE) * sx)
        |             * (CAST(n AS DOUBLE) * qy - CAST(sy AS DOUBLE) * sy))
        |      * 1000000 + 0.5) AS BIGINT) END AS rho_e6
        |FROM a ORDER BY g""".stripMargin),

    // the same prefix-sum closed forms per origin (two window layers:
    // lag/lead/rank, then the running sums), the same phi/forecast
    // double tree, e4 errors, one integer division
    "q231_x_ar1_backtest" ->
      ("""WITH m0 AS (
        |  SELECT o_orderpriority AS k,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(sum(round(o_totalprice * 100)) AS BIGINT) // 100000 AS y
        |  FROM orders GROUP BY 1, 2),
        |o1 AS (SELECT k, month, y,
        |        CAST(row_number() OVER w AS BIGINT) AS t,
        |        lag(y) OVER w AS lg, lead(y) OVER w AS nxt,
        |        first_value(y) OVER (PARTITION BY k ORDER BY month
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y1
        |      FROM m0 WINDOW w AS (PARTITION BY k ORDER BY month)),
        |o2 AS (SELECT *,
        |        CAST(sum(y) OVER wr AS BIGINT) AS cum1,
        |        CAST(sum(y * y) OVER wr AS BIGINT) AS cum2,
        |        CAST(sum(y * coalesce(lg, 0)) OVER wr AS BIGINT) AS cumL
        |      FROM o1 WINDOW wr AS (PARTITION BY k ORDER BY month
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT k, y, nxt, t - 1 AS m, cum1 - y AS sx, cum1 - y1 AS sy,
        |        cumL AS sxy, cum2 - y * y AS sxx
        |      FROM o2 WHERE t >= 12 AND nxt IS NOT NULL),
        |f AS (SELECT * FROM s WHERE m * sxx - sx * sx <> 0),
        |e AS (SELECT k,
        |    CAST(floor(abs(CAST(nxt AS DOUBLE) -
        |      ((CAST(sy AS DOUBLE)
        |        - (CAST(m * sxy - sx * sy AS DOUBLE) / (m * sxx - sx * sx)) * sx) / m
        |       + (CAST(m * sxy - sx * sy AS DOUBLE) / (m * sxx - sx * sx)) * y))
        |      * 10000 + 0.5) AS BIGINT) AS em,
        |    abs(nxt - y) * 10000 AS en
        |  FROM f)
        |SELECT k AS o_orderpriority, CAST(count(*) AS BIGINT) AS n_origins,
        |  CAST(sum(em) AS BIGINT) AS err_model_e4,
        |  CAST(sum(en) AS BIGINT) AS err_naive_e4,
        |  CAST(sum(em) AS BIGINT) * 1000000
        |    // nullif(CAST(sum(en) AS BIGINT), 0) AS mase_e6
        |FROM e GROUP BY k ORDER BY k""".stripMargin),

    // equivalence-class grid with exact per-class distinct, one-row
    // re-aggregation, one integer division
    "q232_x_k_anonymity" ->
      ("""WITH c AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         (CAST(round(c_acctbal) AS BIGINT) + 1000) // 1000 AS balband
        |  FROM customer),
        |g AS (SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |        CAST(count(DISTINCT balband) AS BIGINT) AS l
        |      FROM c GROUP BY 1, 2)
        |SELECT CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(n) AS BIGINT) AS min_class_size,
        |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_below_k,
        |  CAST(min(l) AS BIGINT) AS min_l_diversity,
        |  CAST(sum(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT) AS classes_l1,
        |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) * 1000000
        |    // nullif(CAST(sum(n) AS BIGINT), 0) AS share_below_k_e6
        |FROM g""".stripMargin),

    // the same histogram-decile assignment ((cum-c)*10 // n on the value
    // grid, DESC) and the documented two-step lift quantization
    "q233_x_lift_table" -> LiftTableSql,

    // drained per-value counts == batch counts, identical readout
    "q239_x_stream_lift_table" -> LiftTableSql,

    // q215's chained-min construction on seconds, per-transition lags,
    // exact lower-median rank walk over the lag grid
    "q234_x_conversion_lag" ->
      ("""WITH e AS (
        |  SELECT user_id, event_type AS s, epoch_us(ts) // 1000000 AS t
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase') AND ts IS NOT NULL),
        |w0 AS (SELECT *, min(CASE WHEN s = 'view' THEN t END)
        |         OVER (PARTITION BY user_id) AS t0 FROM e),
        |w1 AS (SELECT *, min(CASE WHEN s = 'click' AND t > t0 THEN t END)
        |         OVER (PARTITION BY user_id) AS t1 FROM w0),
        |w2 AS (SELECT *, min(CASE WHEN s = 'purchase' AND t > t1 THEN t END)
        |         OVER (PARTITION BY user_id) AS t2 FROM w1),
        |u AS (SELECT DISTINCT user_id, t0, t1, t2 FROM w2),
        |lg AS (SELECT 1 AS stage, t1 - t0 AS lag FROM u WHERE t1 IS NOT NULL
        |       UNION ALL
        |       SELECT 2, t2 - t1 FROM u WHERE t2 IS NOT NULL),
        |c AS (SELECT stage, lag, CAST(count(*) AS BIGINT) AS c FROM lg GROUP BY 1, 2),
        |m AS (SELECT stage, min(lag) AS median_lag FROM (
        |        SELECT *, CAST(sum(c) OVER (PARTITION BY stage ORDER BY lag
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |          CAST(sum(c) OVER (PARTITION BY stage) AS BIGINT) AS n
        |        FROM c) x
        |      WHERE cum >= (n + 1) // 2 GROUP BY stage),
        |a AS (SELECT stage, CAST(count(*) AS BIGINT) AS n_pairs,
        |        min(lag) AS min_lag, max(lag) AS max_lag
        |      FROM lg GROUP BY 1),
        |sn AS (SELECT * FROM (VALUES (1, 'view->click'), (2, 'click->purchase'))
        |       v(stage, stage_name))
        |SELECT a.stage, sn.stage_name, a.n_pairs, a.min_lag, m.median_lag, a.max_lag
        |FROM a JOIN m ON a.stage = m.stage JOIN sn ON a.stage = sn.stage
        |ORDER BY a.stage""".stripMargin),

    // the same minimax grid: range means from prefix-sum differences,
    // e9-quantized BEFORE the min/max so every comparison is integer
    "q235_x_isotonic" ->
      ("""WITH d AS (
        |  SELECT (doc_id * 48271) % 1000001 AS s,
        |         (doc_id * 2654435761) % 1000000 < (doc_id * 48271) % 1000001 AS y
        |  FROM documents),
        |b AS (SELECT least(s * 10 // 1000000, 9) AS bin,
        |        CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p
        |      FROM d GROUP BY 1),
        |c AS (SELECT *,
        |        CAST(sum(p) OVER (ORDER BY bin
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cp,
        |        CAST(sum(n) OVER (ORDER BY bin
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn
        |      FROM b),
        |r AS (SELECT j.bin AS bj, k.bin AS bk,
        |        (k.cp - j.cp + j.p) * 1000000000 // (k.cn - j.cn + j.n) AS avg_e9
        |      FROM c j JOIN c k ON j.bin <= k.bin),
        |mi AS (SELECT i.bin AS bi, r.bj, min(r.avg_e9) AS minr
        |       FROM c i JOIN r ON r.bj <= i.bin AND i.bin <= r.bk
        |       GROUP BY 1, 2),
        |iso AS (SELECT bi AS bin, CAST(max(minr) AS BIGINT) AS iso_e9
        |        FROM mi GROUP BY 1)
        |SELECT b.bin, b.n, b.p AS n_pos, b.p * 1000000 // b.n AS raw_rate_e6,
        |  iso.iso_e9
        |FROM b JOIN iso ON b.bin = iso.bin ORDER BY b.bin""".stripMargin),

    // the same chained funnel / densify / z pipeline at the stream's
    // MICROSECOND grain (q215's epoch_us convention)
    "q245_x_stream_funnel_ab" ->
      ("""WITH e AS (
        |  SELECT user_id,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS var,
        |         event_type AS s, epoch_us(ts) AS t
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase') AND ts IS NOT NULL),
        |w0 AS (SELECT *, min(CASE WHEN s = 'view' THEN t END)
        |         OVER (PARTITION BY user_id) AS t0 FROM e),
        |w1 AS (SELECT *, min(CASE WHEN s = 'click' AND t > t0 THEN t END)
        |         OVER (PARTITION BY user_id) AS t1 FROM w0),
        |w2 AS (SELECT *, min(CASE WHEN s = 'purchase' AND t > t1 THEN t END)
        |         OVER (PARTITION BY user_id) AS t2 FROM w1),
        |u AS (SELECT DISTINCT user_id, var,
        |        CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END +
        |        CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END +
        |        CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS completed
        |      FROM w2),
        |st AS (SELECT * FROM (VALUES (0), (1), (2)) v(stage)),
        |r AS (SELECT var, st.stage, CAST(count(*) AS BIGINT) AS rch
        |      FROM u CROSS JOIN st WHERE u.completed > st.stage GROUP BY 1, 2),
        |g AS (SELECT v.var, st.stage
        |      FROM (VALUES ('A'), ('B')) v(var) CROSS JOIN st),
        |dn AS (SELECT g.var, g.stage, coalesce(r.rch, 0) AS rch
        |       FROM g LEFT JOIN r ON g.var = r.var AND g.stage = r.stage),
        |tr AS (SELECT var, stage,
        |         lag(rch) OVER (PARTITION BY var ORDER BY stage) AS n, rch AS x
        |       FROM dn),
        |t2 AS (SELECT * FROM tr WHERE stage >= 1),
        |a AS (SELECT stage, n AS n_a, x AS x_a FROM t2 WHERE var = 'A'),
        |b AS (SELECT stage, n AS n_b, x AS x_b FROM t2 WHERE var = 'B'),
        |sn AS (SELECT * FROM (VALUES (1, 'view->click'), (2, 'click->purchase'))
        |       v(stage, stage_name))
        |SELECT a.stage, sn.stage_name, n_a, x_a, n_b, x_b,
        |  x_a * 1000000 // nullif(n_a, 0) AS rate_a_e6,
        |  x_b * 1000000 // nullif(n_b, 0) AS rate_b_e6,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |         AND (x_a + x_b) > 0 AND (x_a + x_b) < (n_a + n_b) THEN
        |    CAST(floor((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
        |      / sqrt(CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)
        |             * (1 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
        |             * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
        |      * 10000 + 0.5) AS BIGINT) END AS z_e4
        |FROM a JOIN b ON a.stage = b.stage JOIN sn ON a.stage = sn.stage
        |ORDER BY a.stage""".stripMargin),

    // q215's chained funnel per variant, lagged reach per transition,
    // the same pooled two-proportion z tree e4-quantized
    "q240_x_funnel_ab" ->
      ("""WITH e AS (
        |  SELECT user_id,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS var,
        |         event_type AS s, epoch_us(ts) // 1000000 AS t
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase') AND ts IS NOT NULL),
        |w0 AS (SELECT *, min(CASE WHEN s = 'view' THEN t END)
        |         OVER (PARTITION BY user_id) AS t0 FROM e),
        |w1 AS (SELECT *, min(CASE WHEN s = 'click' AND t > t0 THEN t END)
        |         OVER (PARTITION BY user_id) AS t1 FROM w0),
        |w2 AS (SELECT *, min(CASE WHEN s = 'purchase' AND t > t1 THEN t END)
        |         OVER (PARTITION BY user_id) AS t2 FROM w1),
        |u AS (SELECT DISTINCT user_id, var,
        |        CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END +
        |        CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END +
        |        CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS completed
        |      FROM w2),
        |st AS (SELECT * FROM (VALUES (0), (1), (2)) v(stage)),
        |r AS (SELECT var, st.stage, CAST(count(*) AS BIGINT) AS rch
        |      FROM u CROSS JOIN st WHERE u.completed > st.stage GROUP BY 1, 2),
        |g AS (SELECT v.var, st.stage
        |      FROM (VALUES ('A'), ('B')) v(var) CROSS JOIN st),
        |dn AS (SELECT g.var, g.stage, coalesce(r.rch, 0) AS rch
        |       FROM g LEFT JOIN r ON g.var = r.var AND g.stage = r.stage),
        |tr AS (SELECT var, stage,
        |         lag(rch) OVER (PARTITION BY var ORDER BY stage) AS n, rch AS x
        |       FROM dn),
        |t2 AS (SELECT * FROM tr WHERE stage >= 1),
        |a AS (SELECT stage, n AS n_a, x AS x_a FROM t2 WHERE var = 'A'),
        |b AS (SELECT stage, n AS n_b, x AS x_b FROM t2 WHERE var = 'B'),
        |sn AS (SELECT * FROM (VALUES (1, 'view->click'), (2, 'click->purchase'))
        |       v(stage, stage_name))
        |SELECT a.stage, sn.stage_name, n_a, x_a, n_b, x_b,
        |  x_a * 1000000 // nullif(n_a, 0) AS rate_a_e6,
        |  x_b * 1000000 // nullif(n_b, 0) AS rate_b_e6,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |         AND (x_a + x_b) > 0 AND (x_a + x_b) < (n_a + n_b) THEN
        |    CAST(floor((CAST(x_a AS DOUBLE) / n_a - CAST(x_b AS DOUBLE) / n_b)
        |      / sqrt(CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)
        |             * (1 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
        |             * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
        |      * 10000 + 0.5) AS BIGINT) END AS z_e4
        |FROM a JOIN b ON a.stage = b.stage JOIN sn ON a.stage = sn.stage
        |ORDER BY a.stage""".stripMargin),

    // one integer-moment aggregate over per-customer year totals, the
    // same cast-before-multiply theta / rho-squared trees
    "q241_x_cuped" ->
      ("""WITH p AS (
        |  SELECT o_custkey,
        |    CAST(sum(CASE WHEN year(o_orderdate) = 1996
        |      THEN CAST(floor(o_totalprice + 0.5) AS BIGINT) // 10 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN year(o_orderdate) = 1997
        |      THEN CAST(floor(o_totalprice + 0.5) AS BIGINT) // 10 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND year(o_orderdate) IN (1996, 1997)
        |  GROUP BY 1),
        |j AS (SELECT c.c_mktsegment, p.x, p.y
        |      FROM p JOIN customer c ON p.o_custkey = c.c_custkey),
        |a AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS qx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(y * y) AS BIGINT) AS qy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM j GROUP BY 1)
        |SELECT c_mktsegment, n,
        |  CASE WHEN n >= 2
        |         AND (CAST(n AS DOUBLE) * qx - CAST(sx AS DOUBLE) * sx) > 0 THEN
        |    CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / (CAST(n AS DOUBLE) * qx - CAST(sx AS DOUBLE) * sx)
        |      * 1000000 + 0.5) AS BIGINT) END AS theta_e6,
        |  CASE WHEN n >= 2
        |         AND (CAST(n AS DOUBLE) * qx - CAST(sx AS DOUBLE) * sx) > 0
        |         AND (CAST(n AS DOUBLE) * qy - CAST(sy AS DOUBLE) * sy) > 0 THEN
        |    CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |      / ((CAST(n AS DOUBLE) * qx - CAST(sx AS DOUBLE) * sx)
        |         * (CAST(n AS DOUBLE) * qy - CAST(sy AS DOUBLE) * sy))
        |      * 1000000 + 0.5) AS BIGINT) END AS var_reduction_e6
        |FROM a ORDER BY c_mktsegment""".stripMargin),

    // q46's band-collision pairs FULL-joined against trim-equal text
    // pairs; counts and three exact integer divisions
    "q242_x_dedup_eval" -> {
      val rows = MinhashK / MinhashBands
      val bandConds = (0 until MinhashBands).map { b =>
        (b * rows until (b + 1) * rows).map(i => s"a.mh$i = b.mh$i").mkString("(", " AND ", ")")
      }.mkString(" OR ")
      s"""$MinhashCte,
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |      FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($bandConds)),
        |tr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |       FROM documents a JOIN documents b
        |         ON a.doc_id < b.doc_id AND trim(a.text) = trim(b.text)
        |       WHERE a.text IS NOT NULL AND b.text IS NOT NULL),
        |m AS (SELECT tr.id_a AS ta, p.id_a AS pa
        |      FROM tr FULL JOIN p ON tr.id_a = p.id_a AND tr.id_b = p.id_b)
        |SELECT
        |  CAST(sum(CASE WHEN ta IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
        |  CAST(sum(CASE WHEN pa IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pred,
        |  CAST(sum(CASE WHEN ta IS NOT NULL AND pa IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS tp,
        |  CAST(sum(CASE WHEN ta IS NOT NULL AND pa IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000
        |    // nullif(CAST(sum(CASE WHEN pa IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT), 0)
        |    AS precision_e6,
        |  CAST(sum(CASE WHEN ta IS NOT NULL AND pa IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000
        |    // nullif(CAST(sum(CASE WHEN ta IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT), 0)
        |    AS recall_e6,
        |  2 * CAST(sum(CASE WHEN ta IS NOT NULL AND pa IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000
        |    // nullif(CAST(sum(CASE WHEN ta IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |       + CAST(sum(CASE WHEN pa IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT), 0)
        |    AS f1_e6
        |FROM m""".stripMargin
    },

    // the same e6-quantized N*S weights, exact integer seats with
    // largest-remainder, the same md5-rank prefix per stratum
    "q243_x_neyman_sample" ->
      ("""WITH g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(n_chars) AS BIGINT) AS s1,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
        |  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT *,
        |    CASE WHEN n >= 2
        |           AND (CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) > 0
        |      THEN CAST(floor(CAST(n AS DOUBLE)
        |        * sqrt((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
        |               / (CAST(n AS DOUBLE) * (n - 1))) * 1000000 + 0.5) AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS w
        |  FROM g),
        |t AS (SELECT *, CAST(sum(w) OVER () AS BIGINT) AS tot FROM w),
        |b AS (SELECT *, w * 100 // nullif(tot, 0) AS base,
        |        w * 100 - (w * 100 // nullif(tot, 0)) * tot AS rem FROM t),
        |l AS (SELECT *, 100 - CAST(sum(base) OVER () AS BIGINT) AS leftover,
        |        row_number() OVER (ORDER BY rem DESC, source) AS rk FROM b),
        |al AS (SELECT source, n AS n_stratum,
        |        least(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END, n) AS alloc
        |       FROM l),
        |r AS (SELECT source, doc_id,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |      FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL)
        |SELECT r.source, r.doc_id, al.alloc, al.n_stratum
        |FROM r JOIN al ON r.source = al.source WHERE r.rn <= al.alloc
        |ORDER BY r.source, r.doc_id""".stripMargin),

    // daily-max grid, the same MOM double tree with identical pi/gamma
    // literals, e4 floors
    "q244_x_gumbel_return" ->
      ("""WITH mx AS (
        |  SELECT o_orderpriority AS k, CAST(o_orderdate AS DATE) AS day,
        |         CAST(max(CAST(floor(o_totalprice + 0.5) AS BIGINT)) AS BIGINT) AS m
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        |  GROUP BY 1, 2),
        |mo AS (SELECT k, CAST(count(*) AS BIGINT) AS n_blocks,
        |         CAST(sum(m) AS BIGINT) AS s1, CAST(sum(m * m) AS BIGINT) AS s2
        |       FROM mx GROUP BY 1),
        |f AS (SELECT * FROM mo WHERE n_blocks >= 30
        |       AND CAST(n_blocks AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1 > 0)
        |SELECT k AS o_orderpriority, n_blocks,
        |  CAST(floor((CAST(s1 AS DOUBLE) / n_blocks - 0.5772156649015329
        |    * (sqrt((CAST(n_blocks AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
        |         / (CAST(n_blocks AS DOUBLE) * (n_blocks - 1)))
        |       * sqrt(CAST(6 AS DOUBLE)) / 3.141592653589793))
        |    * 10000 + 0.5) AS BIGINT) AS mu_e4,
        |  CAST(floor((sqrt((CAST(n_blocks AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
        |         / (CAST(n_blocks AS DOUBLE) * (n_blocks - 1)))
        |       * sqrt(CAST(6 AS DOUBLE)) / 3.141592653589793)
        |    * 10000 + 0.5) AS BIGINT) AS beta_e4,
        |  CAST(floor(((CAST(s1 AS DOUBLE) / n_blocks - 0.5772156649015329
        |    * (sqrt((CAST(n_blocks AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
        |         / (CAST(n_blocks AS DOUBLE) * (n_blocks - 1)))
        |       * sqrt(CAST(6 AS DOUBLE)) / 3.141592653589793))
        |    - (sqrt((CAST(n_blocks AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
        |         / (CAST(n_blocks AS DOUBLE) * (n_blocks - 1)))
        |       * sqrt(CAST(6 AS DOUBLE)) / 3.141592653589793)
        |      * ln(-ln(1 - CAST(1 AS DOUBLE) / 365)))
        |    * 10000 + 0.5) AS BIGINT) AS rl_e4
        |FROM f ORDER BY k""".stripMargin),

    // the same tie-aware rank trim on the value grid: full rows below
    // the boundary plus the boundary's partial multiplicity, all exact
    "q246_x_trimmed_mean" ->
      ("""WITH h AS (
        |  SELECT l_returnflag AS g,
        |         CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS v,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
        |w0 AS (SELECT *,
        |    CAST(sum(c) OVER wa AS BIGINT) AS cumA,
        |    CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS n,
        |    CAST(sum(v * c) OVER (PARTITION BY g) AS BIGINT) AS s
        |  FROM h
        |  WINDOW wa AS (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |w AS (SELECT *, n - cumA + c AS cumD FROM w0),
        |k AS (SELECT *, n * 50 // 1000 AS kk FROM w),
        |a AS (SELECT g, max(n) AS n, max(s) AS s, max(kk) AS kk,
        |    CAST(sum(CASE WHEN cumA <= kk THEN v * c ELSE 0 END) AS BIGINT)
        |      AS botFull,
        |    max(CASE WHEN cumA <= kk THEN cumA END) AS botCnt,
        |    min(CASE WHEN cumA > kk THEN v END) AS lo,
        |    CAST(sum(CASE WHEN cumD <= kk THEN v * c ELSE 0 END) AS BIGINT)
        |      AS topFull,
        |    max(CASE WHEN cumD <= kk THEN cumD END) AS topCnt,
        |    max(CASE WHEN cumD > kk THEN v END) AS hi
        |  FROM k GROUP BY g)
        |SELECT g AS l_returnflag, n, kk AS n_trimmed_each,
        |  (s - (botFull + (kk - coalesce(botCnt, 0)) * lo)
        |     - (topFull + (kk - coalesce(topCnt, 0)) * hi)) * 1000000
        |    // nullif(n - 2 * kk, 0) AS trimmed_mean_e6
        |FROM a ORDER BY g""".stripMargin),

    // q37's rounded-ACF CTE feeding the Q statistic: per-term e9
    // quantization, exact integer sum, one integer division
    "q247_x_ljung_box" ->
      (s"""WITH m AS ($MonthlySql),
        |s AS (SELECT row_number() OVER (ORDER BY month) AS t, round(tot, 2) AS v
        |      FROM m),
        |st AS (SELECT avg(v) AS mu, count(*) AS n FROM s),
        |c0 AS (SELECT sum((v - mu) * (v - mu)) / max(n) AS c0 FROM s, st),
        |g AS (
        |  SELECT l.lag, sum((a.v - st.mu) * (b.v - st.mu)) / max(st.n) AS cov
        |  FROM (SELECT unnest(generate_series(1, 6)) AS lag) l
        |  JOIN s a ON true JOIN s b ON a.t = b.t + l.lag, st
        |  GROUP BY l.lag),
        |r AS (SELECT lag, round(cov / c0.c0, 4) AS acf FROM g, c0),
        |q AS (SELECT CAST(sum(CAST(floor(acf * acf / (st.n - lag) * 1e9 + 0.5)
        |          AS BIGINT)) AS BIGINT) AS sum_e9,
        |        CAST(max(st.n) AS BIGINT) AS n
        |      FROM r, st)
        |SELECT 'all' AS key, CAST(n AS INT) AS n_obs, CAST(6 AS INT) AS h_lags,
        |  n * (n + 2) * sum_e9 // 100000 AS q_e4,
        |  CAST(125916 AS BIGINT) AS crit5_e4,
        |  n * (n + 2) * sum_e9 // 100000 > 125916 AS autocorrelated
        |FROM q""".stripMargin),

    // the q215 chained mins with each step additionally bounded to the
    // 24h gap (seconds grain)
    "q248_x_windowed_funnel" ->
      ("""WITH e AS (
        |  SELECT user_id, event_type AS s, epoch_us(ts) // 1000000 AS t
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase') AND ts IS NOT NULL),
        |w0 AS (SELECT *, min(CASE WHEN s = 'view' THEN t END)
        |         OVER (PARTITION BY user_id) AS t0 FROM e),
        |w1 AS (SELECT *, min(CASE WHEN s = 'click' AND t > t0
        |           AND t <= t0 + 86400 THEN t END)
        |         OVER (PARTITION BY user_id) AS t1 FROM w0),
        |w2 AS (SELECT *, min(CASE WHEN s = 'purchase' AND t > t1
        |           AND t <= t1 + 86400 THEN t END)
        |         OVER (PARTITION BY user_id) AS t2 FROM w1),
        |u AS (SELECT DISTINCT user_id,
        |        CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END +
        |        CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END +
        |        CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS completed
        |      FROM w2),
        |st AS (SELECT * FROM (VALUES (0, 'view'), (1, 'click'), (2, 'purchase'))
        |       v(stage, stage_name))
        |SELECT st.stage, st.stage_name, count(*) AS n_reached
        |FROM u CROSS JOIN st WHERE u.completed > st.stage
        |GROUP BY 1, 2 ORDER BY st.stage""".stripMargin),

    // q216's pairwise replay restricted to (b.t - a.t) % 12 = 0, with
    // the per-phase base/tie variance terms
    "q249_x_seasonal_mk" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority AS k,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2),
        |o AS (SELECT k, row_number() OVER (PARTITION BY k ORDER BY month) AS t, y
        |      FROM m),
        |p AS (SELECT a.k,
        |        CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sg
        |      FROM o a JOIN o b ON a.k = b.k AND b.t > a.t
        |        AND (b.t - a.t) % 12 = 0),
        |s AS (SELECT k, CAST(coalesce(sum(sg), 0) AS BIGINT) AS s FROM p GROUP BY k),
        |np AS (SELECT k, (t - 1) % 12 AS ph, CAST(count(*) AS BIGINT) AS n
        |       FROM o GROUP BY 1, 2),
        |v1 AS (SELECT k, CAST(sum(n * (n - 1) * (2 * n + 5)) AS BIGINT) AS base
        |       FROM np GROUP BY 1),
        |tg AS (SELECT k, (t - 1) % 12 AS ph, y, CAST(count(*) AS BIGINT) AS c
        |       FROM o GROUP BY 1, 2, 3 HAVING count(*) > 1),
        |tt AS (SELECT k, CAST(coalesce(sum(c * (c - 1) * (2 * c + 5)), 0) AS BIGINT)
        |         AS tsum FROM tg GROUP BY 1),
        |nn AS (SELECT k, CAST(count(*) AS INT) AS n FROM o GROUP BY k),
        |v AS (SELECT nn.k, nn.n, s.s,
        |        v1.base - coalesce(tt.tsum, 0) AS var18
        |      FROM nn JOIN s ON nn.k = s.k JOIN v1 ON nn.k = v1.k
        |        LEFT JOIN tt ON nn.k = tt.k
        |      WHERE nn.n >= 14),
        |z AS (SELECT *,
        |        CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var18 / 18.0)
        |             WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var18 / 18.0)
        |             ELSE 0.0 END AS zz
        |      FROM v),
        |r AS (SELECT k, n, s, var18, floor(zz * 10000 + 0.5) / 10000 AS z FROM z)
        |SELECT k AS key, n AS n_obs, s AS s_stat, var18, z,
        |  CASE WHEN z > 1.96 THEN 'increasing'
        |       WHEN z < -1.96 THEN 'decreasing'
        |       ELSE 'no_trend' END AS trend
        |FROM r ORDER BY key""".stripMargin),

    // the same per-row e6 component quantization, exact integer sums per
    // (label, side, component), HUGEINT cross-products, one double tree
    "q250_x_centroid_drift" -> CentroidDriftSql,

    // drained component sums == batch sums, identical readout
    "q251_x_stream_centroid_drift" -> CentroidDriftSql,

    // q240's chained funnel / densified reach with the MDE tree (the
    // same power/alpha literals) instead of the z verdict
    "q252_x_funnel_mde" ->
      ("""WITH e AS (
        |  SELECT user_id,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS var,
        |         event_type AS s, epoch_us(ts) // 1000000 AS t
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase') AND ts IS NOT NULL),
        |w0 AS (SELECT *, min(CASE WHEN s = 'view' THEN t END)
        |         OVER (PARTITION BY user_id) AS t0 FROM e),
        |w1 AS (SELECT *, min(CASE WHEN s = 'click' AND t > t0 THEN t END)
        |         OVER (PARTITION BY user_id) AS t1 FROM w0),
        |w2 AS (SELECT *, min(CASE WHEN s = 'purchase' AND t > t1 THEN t END)
        |         OVER (PARTITION BY user_id) AS t2 FROM w1),
        |u AS (SELECT DISTINCT user_id, var,
        |        CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END +
        |        CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END +
        |        CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS completed
        |      FROM w2),
        |st AS (SELECT * FROM (VALUES (0), (1), (2)) v(stage)),
        |r AS (SELECT var, st.stage, CAST(count(*) AS BIGINT) AS rch
        |      FROM u CROSS JOIN st WHERE u.completed > st.stage GROUP BY 1, 2),
        |g AS (SELECT v.var, st.stage
        |      FROM (VALUES ('A'), ('B')) v(var) CROSS JOIN st),
        |dn AS (SELECT g.var, g.stage, coalesce(r.rch, 0) AS rch
        |       FROM g LEFT JOIN r ON g.var = r.var AND g.stage = r.stage),
        |tr AS (SELECT var, stage,
        |         lag(rch) OVER (PARTITION BY var ORDER BY stage) AS n, rch AS x
        |       FROM dn),
        |t2 AS (SELECT * FROM tr WHERE stage >= 1),
        |a AS (SELECT stage, n AS n_a, x AS x_a FROM t2 WHERE var = 'A'),
        |b AS (SELECT stage, n AS n_b, x AS x_b FROM t2 WHERE var = 'B'),
        |sn AS (SELECT * FROM (VALUES (1, 'view->click'), (2, 'click->purchase'))
        |       v(stage, stage_name))
        |SELECT a.stage, sn.stage_name, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |         AND (x_a + x_b) > 0 AND (x_a + x_b) < (n_a + n_b) THEN
        |    CAST(floor((1.959963984540054 + 0.8416212335729143)
        |      * sqrt(CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)
        |             * (1 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
        |             * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
        |      * 1000000 + 0.5) AS BIGINT) END AS mde_e6
        |FROM a JOIN b ON a.stage = b.stage JOIN sn ON a.stage = sn.stage
        |ORDER BY a.stage""".stripMargin),

    // HUGEINT scaled partial sums N_t = n*P_t - t*Sy (exact — no demeaned
    // float crosses a row boundary), then the IDENTICAL single double
    // division the Spark operator emits; eta rounded to 4 before the
    // crit5 comparison
    "q253_u56_kpss_fixed" ->
      ("""WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |o AS (SELECT cents,
        |             row_number() OVER (ORDER BY month) AS t,
        |             sum(cents) OVER (ORDER BY month ROWS UNBOUNDED PRECEDING) AS p,
        |             count(*) OVER () AS n,
        |             sum(cents) OVER () AS sy,
        |             sum(CAST(cents AS HUGEINT) * cents) OVER () AS syy
        |      FROM m),
        |nt AS (SELECT n, sy, syy,
        |              CAST(n AS HUGEINT) * p - CAST(t AS HUGEINT) * sy AS nt
        |       FROM o),
        |s AS (SELECT max(n) AS n,
        |             max(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy) AS varn,
        |             sum(nt * nt) AS snn
        |      FROM nt),
        |t AS (SELECT n,
        |  CASE WHEN varn > 0 AND n > 1 THEN
        |    floor(CAST(snn AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(varn AS DOUBLE))
        |      * 10000 + 0.5) / 10000 END AS eta
        |  FROM s)
        |SELECT 'all' AS key, n AS n_obs, eta AS kpss_eta, 0.463 AS crit5,
        |       eta < 0.463 AS stationary5
        |FROM t""".stripMargin),

    // the FULL AR AIC grid replayed: per candidate p the CLS fit is a
    // Cramer solve over lag sufficient sums (dets GENERATED, not
    // hand-spelled), aic = rows*(ln(2*pi*max(rss,1e-300)/rows) + 1)
    // + 2*(p+1) exactly as the kernel computes it, argmin by (aic, p)
    // matching minByOption's first-minimum, then the q117 forecast
    // recursion generalized to 3 carried lags with exact-0.0 unused
    // coefficients. Kernel (Gauss-Jordan) vs oracle (Cramer) differ in
    // last bits only — the 4-decimal grain on the ~27-unit scaled series
    // sits orders of magnitude above it (the q117 precedent).
    "q35_u8_ar_forecast" -> {
      def det3(m: Seq[Seq[String]]): String = {
        val Seq(Seq(a, b, c), Seq(d, e, f), Seq(g, h, i)) = m: @unchecked
        s"($a*($e*$i - $f*$h) - $b*($d*$i - $f*$g) + $c*($d*$h - $e*$g))"
      }
      def det4(m: Seq[Seq[String]]): String = {
        def minor(cut: Int) = m.drop(1).map(r =>
          r.zipWithIndex.collect { case (v, j) if j != cut => v })
        val terms = m.head.zipWithIndex.map { case (v, j) =>
          val sign = if (j % 2 == 0) "+" else "-"
          s"$sign $v*${det3(minor(j))}"
        }
        s"(${terms.mkString(" ")})"
      }
      def swapCol(m: Seq[Seq[String]], c: Int, rhs: Seq[String]) =
        m.zip(rhs).map { case (row, r) => row.updated(c, r) }
      val a2 = Seq(Seq("cnt", "s1", "s2"), Seq("s1", "s11", "s12"),
        Seq("s2", "s12", "s22"))
      val r2 = Seq("sy", "s1y", "s2y")
      val a3 = Seq(Seq("cnt", "s1", "s2", "s3"), Seq("s1", "s11", "s12", "s13"),
        Seq("s2", "s12", "s22", "s23"), Seq("s3", "s13", "s23", "s33"))
      val r3 = Seq("sy", "s1y", "s2y", "s3y")
      s"""WITH RECURSIVE m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(round(o_totalprice * 100)) / 1e8, 6) AS y
        |  FROM orders GROUP BY 1),
        |o AS (SELECT row_number() OVER (ORDER BY month) AS t, y,
        |             lag(y, 1) OVER (ORDER BY month) AS l1,
        |             lag(y, 2) OVER (ORDER BY month) AS l2,
        |             lag(y, 3) OVER (ORDER BY month) AS l3
        |      FROM m),
        |f1 AS (SELECT CAST(count(*) AS DOUBLE) AS cnt, sum(y) AS sy,
        |              sum(y*y) AS syy, sum(l1) AS s1, sum(l1*l1) AS s11,
        |              sum(l1*y) AS s1y
        |       FROM o WHERE l1 IS NOT NULL),
        |g1 AS (SELECT cnt, syy, sy, s1y,
        |              (sy*s11 - s1*s1y) / (cnt*s11 - s1*s1) AS b0,
        |              (cnt*s1y - s1*sy) / (cnt*s11 - s1*s1) AS b1
        |       FROM f1 WHERE (cnt*s11 - s1*s1) <> 0 AND cnt > 4),
        |c1 AS (SELECT 1 AS p, cnt, b0, b1, CAST(0 AS DOUBLE) AS b2,
        |              CAST(0 AS DOUBLE) AS b3,
        |              syy - (b0*sy + b1*s1y) AS rss FROM g1),
        |f2 AS (SELECT CAST(count(*) AS DOUBLE) AS cnt, sum(y) AS sy,
        |              sum(y*y) AS syy, sum(l1) AS s1, sum(l2) AS s2,
        |              sum(l1*l1) AS s11, sum(l1*l2) AS s12, sum(l2*l2) AS s22,
        |              sum(l1*y) AS s1y, sum(l2*y) AS s2y
        |       FROM o WHERE l2 IS NOT NULL),
        |g2 AS (SELECT cnt, syy, sy, s1y, s2y,
        |              ${det3(swapCol(a2, 0, r2))} / ${det3(a2)} AS b0,
        |              ${det3(swapCol(a2, 1, r2))} / ${det3(a2)} AS b1,
        |              ${det3(swapCol(a2, 2, r2))} / ${det3(a2)} AS b2
        |       FROM f2 WHERE ${det3(a2)} <> 0 AND cnt > 6),
        |c2 AS (SELECT 2 AS p, cnt, b0, b1, b2, CAST(0 AS DOUBLE) AS b3,
        |              syy - (b0*sy + b1*s1y + b2*s2y) AS rss FROM g2),
        |f3 AS (SELECT CAST(count(*) AS DOUBLE) AS cnt, sum(y) AS sy,
        |              sum(y*y) AS syy, sum(l1) AS s1, sum(l2) AS s2,
        |              sum(l3) AS s3, sum(l1*l1) AS s11, sum(l1*l2) AS s12,
        |              sum(l1*l3) AS s13, sum(l2*l2) AS s22, sum(l2*l3) AS s23,
        |              sum(l3*l3) AS s33, sum(l1*y) AS s1y, sum(l2*y) AS s2y,
        |              sum(l3*y) AS s3y
        |       FROM o WHERE l3 IS NOT NULL),
        |g3 AS (SELECT cnt, syy, sy, s1y, s2y, s3y,
        |              ${det4(swapCol(a3, 0, r3))} / ${det4(a3)} AS b0,
        |              ${det4(swapCol(a3, 1, r3))} / ${det4(a3)} AS b1,
        |              ${det4(swapCol(a3, 2, r3))} / ${det4(a3)} AS b2,
        |              ${det4(swapCol(a3, 3, r3))} / ${det4(a3)} AS b3
        |       FROM f3 WHERE ${det4(a3)} <> 0 AND cnt > 8),
        |c3 AS (SELECT 3 AS p, cnt, b0, b1, b2, b3,
        |              syy - (b0*sy + b1*s1y + b2*s2y + b3*s3y) AS rss FROM g3),
        |cands AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
        |          UNION ALL SELECT * FROM c3),
        |aics AS (SELECT p, b0, b1, b2, b3,
        |                cnt*(ln(2*pi()*greatest(rss, 1e-300)/cnt) + 1)
        |                  + 2*(p + 1) AS aic
        |         FROM cands),
        |w AS (SELECT * FROM aics ORDER BY aic, p LIMIT 1),
        |seeds AS (SELECT max(CASE WHEN rn = 1 THEN y END) AS s1v,
        |                 max(CASE WHEN rn = 2 THEN y END) AS s2v,
        |                 max(CASE WHEN rn = 3 THEN y END) AS s3v
        |          FROM (SELECT y, row_number() OVER (ORDER BY t DESC) AS rn
        |                FROM o) WHERE rn <= 3),
        |rec(step, f1v, f2v, f3v) AS (
        |  SELECT 0, s1v, s2v, s3v FROM seeds
        |  UNION ALL
        |  SELECT rec.step + 1,
        |         w.b0 + w.b1*rec.f1v + w.b2*rec.f2v + w.b3*rec.f3v,
        |         rec.f1v, rec.f2v
        |  FROM rec, w WHERE rec.step < 12)
        |SELECT 'all' AS key, CAST(w.p AS INT) AS "order",
        |       CAST(step AS INT) AS step, round(f1v, 4) AS forecast
        |FROM rec, w WHERE step >= 1 ORDER BY step""".stripMargin
    },

    // per-event existence flags over the same RANGE frame — a stage-i
    // event qualifies iff any qualifying stage-(i-1) event sits in
    // [t - 86400, t - 1]; completed is the per-user count of reached
    // stages (prefix-shaped: q_i nonempty requires q_{i-1} nonempty)
    "q254_x_rescan_funnel" ->
      ("""WITH e AS (
        |  SELECT user_id, event_type AS s, epoch_us(ts) // 1000000 AS t
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase') AND ts IS NOT NULL),
        |w0 AS (SELECT *, s = 'view' AS q0 FROM e),
        |w1 AS (SELECT *, s = 'click' AND coalesce(
        |         max(CASE WHEN q0 THEN 1 ELSE 0 END) OVER (
        |           PARTITION BY user_id ORDER BY t
        |           RANGE BETWEEN 86400 PRECEDING AND 1 PRECEDING), 0) = 1 AS q1
        |       FROM w0),
        |w2 AS (SELECT *, s = 'purchase' AND coalesce(
        |         max(CASE WHEN q1 THEN 1 ELSE 0 END) OVER (
        |           PARTITION BY user_id ORDER BY t
        |           RANGE BETWEEN 86400 PRECEDING AND 1 PRECEDING), 0) = 1 AS q2
        |       FROM w1),
        |u AS (SELECT user_id,
        |        max(CASE WHEN q0 THEN 1 ELSE 0 END) +
        |        max(CASE WHEN q1 THEN 1 ELSE 0 END) +
        |        max(CASE WHEN q2 THEN 1 ELSE 0 END) AS completed
        |      FROM w2 GROUP BY user_id),
        |st AS (SELECT * FROM (VALUES (0, 'view'), (1, 'click'), (2, 'purchase'))
        |       v(stage, stage_name))
        |SELECT st.stage, st.stage_name, count(*) AS n_reached
        |FROM u CROSS JOIN st WHERE u.completed > st.stage
        |GROUP BY 1, 2 ORDER BY st.stage""".stripMargin),

    // the identical tf/df/dl sufficient stats and the IDENTICAL per-term
    // double tree e9-quantized BEFORE the per-document sum (integer sum =
    // order-independent); rank ties break on doc_id in both engines
    "q255_x_bm25_topk" ->
      ("""WITH q(query_id, tok) AS (VALUES
        |    (CAST(0 AS BIGINT), 'hash'), (0, 'join'), (0, 'table'),
        |    (1, 'stream'), (1, 'window'), (1, 'batch'),
        |    (2, 'fast'), (2, 'scan'), (2, 'filter'), (2, 'slow')),
        |d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |dl AS (SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS dl
        |       FROM d),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS s
        |       FROM dl),
        |tk AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |       FROM d),
        |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM tk
        |       WHERE tok <> '' AND tok IN (SELECT DISTINCT tok FROM q)
        |       GROUP BY 1, 2),
        |dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
        |t AS (SELECT q.query_id, tf.doc_id,
        |        CAST(floor(
        |          ln((CAST(st.n - dfc.df AS DOUBLE) + 0.5) / (CAST(dfc.df AS DOUBLE) + 0.5) + 1.0)
        |          * (CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
        |          / (CAST(tf.tf AS DOUBLE)
        |             + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE) * CAST(st.n AS DOUBLE) / CAST(st.s AS DOUBLE)))
        |          * 1000000000 + 0.5) AS BIGINT) AS term_e9
        |      FROM tf JOIN q ON tf.tok = q.tok JOIN dfc ON tf.tok = dfc.tok
        |      JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
        |sc AS (SELECT query_id, doc_id, CAST(sum(term_e9) AS BIGINT) AS score_e9
        |       FROM t GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (
        |        PARTITION BY query_id ORDER BY score_e9 DESC, doc_id) AS INT) AS rank
        |      FROM sc)
        |SELECT query_id, doc_id, score_e9, rank FROM r WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin),

    // one cell grid, marginals re-aggregated from it, every MI/entropy
    // term e9-quantized BEFORE summing (order-independence), the same
    // single-division NMI readout
    "q256_x_nmi" ->
      ("""WITH d AS (
        |  SELECT CAST(doc_id % 2 AS BIGINT) AS half, lang, source
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL),
        |c AS (SELECT half, lang, source, CAST(count(*) AS BIGINT) AS c
        |      FROM d GROUP BY 1, 2, 3),
        |ra AS (SELECT half, lang, CAST(sum(c) AS BIGINT) AS na FROM c GROUP BY 1, 2),
        |cb AS (SELECT half, source, CAST(sum(c) AS BIGINT) AS nb FROM c GROUP BY 1, 2),
        |t AS (SELECT half, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
        |mi AS (SELECT c.half, CAST(sum(CAST(floor(
        |         (CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
        |         * ln(CAST(t.n AS DOUBLE) * CAST(c.c AS DOUBLE)
        |              / (CAST(ra.na AS DOUBLE) * CAST(cb.nb AS DOUBLE)))
        |         * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS mi_e9
        |       FROM c JOIN ra ON c.half = ra.half AND c.lang = ra.lang
        |       JOIN cb ON c.half = cb.half AND c.source = cb.source
        |       JOIN t ON c.half = t.half GROUP BY 1),
        |ha AS (SELECT ra.half, CAST(sum(CAST(floor(
        |         -(CAST(na AS DOUBLE) / CAST(n AS DOUBLE))
        |         * ln(CAST(na AS DOUBLE) / CAST(n AS DOUBLE))
        |         * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS h_a_e9
        |       FROM ra JOIN t ON ra.half = t.half GROUP BY 1),
        |hb AS (SELECT cb.half, CAST(sum(CAST(floor(
        |         -(CAST(nb AS DOUBLE) / CAST(n AS DOUBLE))
        |         * ln(CAST(nb AS DOUBLE) / CAST(n AS DOUBLE))
        |         * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS h_b_e9
        |       FROM cb JOIN t ON cb.half = t.half GROUP BY 1)
        |SELECT t.half, t.n, mi.mi_e9, ha.h_a_e9, hb.h_b_e9,
        |  CASE WHEN ha.h_a_e9 + hb.h_b_e9 > 0 THEN
        |    CAST(floor(CAST(mi.mi_e9 AS DOUBLE)
        |      / (0.5 * (CAST(ha.h_a_e9 AS DOUBLE) + CAST(hb.h_b_e9 AS DOUBLE)))
        |      * 1000000 + 0.5) AS BIGINT) END AS nmi_e6
        |FROM t JOIN mi ON t.half = mi.half JOIN ha ON t.half = ha.half
        |JOIN hb ON t.half = hb.half
        |ORDER BY t.half""".stripMargin),

    // the same per-(doc, gram) count grid and clipped-min overlap; pairs
    // with zero shared grams survive the LEFT join with 0
    "q257_x_rouge_n" ->
      ("""WITH tk AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |b AS (SELECT doc_id, t FROM tk WHERE len(t) >= 2),
        |g AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram
        |      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        |            FROM b)),
        |gc AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
        |       FROM g GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(len(t) - 1 AS BIGINT) AS ng FROM b),
        |p AS (SELECT doc_id AS cand_id, doc_id + 1 AS ref_id
        |      FROM documents WHERE doc_id % 2 = 0),
        |ov AS (SELECT p.cand_id, p.ref_id,
        |         CAST(sum(least(ca.c, cb.c)) AS BIGINT) AS n_overlap
        |       FROM p JOIN gc ca ON ca.doc_id = p.cand_id
        |       JOIN gc cb ON cb.doc_id = p.ref_id AND cb.gram = ca.gram
        |       GROUP BY 1, 2)
        |SELECT p.cand_id, p.ref_id,
        |  coalesce(ov.n_overlap, 0) AS n_overlap, tc.ng AS n_cand, tr.ng AS n_ref,
        |  CAST(floor(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE)
        |    / CAST(tc.ng AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS p_e6,
        |  CAST(floor(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE)
        |    / CAST(tr.ng AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS r_e6,
        |  CAST(floor(2.0 * CAST(coalesce(ov.n_overlap, 0) AS DOUBLE)
        |    / (CAST(tc.ng AS DOUBLE) + CAST(tr.ng AS DOUBLE)) * 1000000 + 0.5)
        |    AS BIGINT) AS f_e6
        |FROM p JOIN tot tc ON tc.doc_id = p.cand_id
        |JOIN tot tr ON tr.doc_id = p.ref_id
        |LEFT JOIN ov ON ov.cand_id = p.cand_id AND ov.ref_id = p.ref_id
        |ORDER BY p.cand_id""".stripMargin),

    // one conditional-pivot token grid, the IDENTICAL per-side double
    // trees e9-quantized per token, exact integer sum
    "q258_x_vocab_jsd" ->
      ("""WITH d AS (
        |  SELECT CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS side, text
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |tk AS (SELECT side, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |       FROM d),
        |g AS (SELECT t,
        |        CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |        CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |      FROM tk GROUP BY t),
        |tt AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
        |       FROM g),
        |terms AS (SELECT na, nb,
        |    CASE WHEN ca > 0 AND na > 0 AND nb > 0 THEN
        |      CAST(floor(0.5 * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
        |        * ln(2.0 * CAST(ca AS DOUBLE) * CAST(nb AS DOUBLE)
        |             / (CAST(ca AS DOUBLE) * CAST(nb AS DOUBLE)
        |                + CAST(cb AS DOUBLE) * CAST(na AS DOUBLE)))
        |        * 1000000000 + 0.5) AS BIGINT) ELSE 0 END AS ta,
        |    CASE WHEN cb > 0 AND na > 0 AND nb > 0 THEN
        |      CAST(floor(0.5 * (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
        |        * ln(2.0 * CAST(cb AS DOUBLE) * CAST(na AS DOUBLE)
        |             / (CAST(cb AS DOUBLE) * CAST(na AS DOUBLE)
        |                + CAST(ca AS DOUBLE) * CAST(nb AS DOUBLE)))
        |        * 1000000000 + 0.5) AS BIGINT) ELSE 0 END AS tb
        |  FROM g CROSS JOIN tt)
        |SELECT max(na) AS n_a, max(nb) AS n_b,
        |  CAST(count(*) AS BIGINT) AS n_vocab,
        |  CASE WHEN max(na) > 0 AND max(nb) > 0
        |       THEN CAST(sum(ta + tb) AS BIGINT) END AS jsd_e9
        |FROM terms""".stripMargin),

    // q177's window replay with the multiplicative readouts: e9-quantized
    // ratio per interior row, exact integer phase-mean rounding
    // (2*sn+sc)//(2*sc), mean-one normalizer, the IDENTICAL double trees
    "q259_x_seasonal_decompose_mul" ->
      ("""WITH m AS (SELECT c_mktsegment AS seg,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |w AS (SELECT *,
        |    ((row_number() OVER o) - 1) % 12 AS ph,
        |    CASE WHEN count(cents) OVER a = 12
        |      THEN sum(cents) OVER a END AS sa,
        |    CASE WHEN count(cents) OVER b = 12
        |      THEN sum(cents) OVER b END AS sb
        |  FROM m
        |  WINDOW o AS (PARTITION BY seg ORDER BY month),
        |    a AS (PARTITION BY seg ORDER BY month
        |          ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING),
        |    b AS (PARTITION BY seg ORDER BY month
        |          ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)),
        |t AS (SELECT *, CAST(sa + sb AS BIGINT) AS t2p,
        |    CASE WHEN sa + sb > 0 THEN
        |      CAST(floor(CAST(cents AS DOUBLE) * 24 / CAST(sa + sb AS DOUBLE)
        |        * 1000000000 + 0.5) AS BIGINT) END AS r9
        |  FROM w),
        |se AS (SELECT seg, ph, CAST(sum(r9) AS BIGINT) AS sn,
        |         CAST(count(*) AS BIGINT) AS sc
        |       FROM t WHERE r9 IS NOT NULL GROUP BY 1, 2),
        |se2 AS (SELECT *, CAST((2 * sn + sc) // (2 * sc) AS BIGINT) AS a9
        |        FROM se),
        |nm AS (SELECT seg, CAST(sum(a9) AS BIGINT) AS m9,
        |         CAST(count(*) AS BIGINT) AS np
        |       FROM se2 GROUP BY 1)
        |SELECT t.seg, t.month, t.cents,
        |  CAST(floor(CAST(t.t2p AS DOUBLE) / 24 * 1000000 + 0.5) AS BIGINT)
        |    AS trend_e6,
        |  CASE WHEN nm.m9 > 0 THEN
        |    CAST(floor((CAST(se2.a9 AS DOUBLE) * nm.np / CAST(nm.m9 AS DOUBLE))
        |      * 1000000 + 0.5) AS BIGINT) END AS seasonal_e6,
        |  CASE WHEN t.t2p > 0 AND nm.m9 > 0 THEN
        |    CAST(floor(CAST(t.cents AS DOUBLE) * 24 / CAST(t.t2p AS DOUBLE)
        |      / (CAST(se2.a9 AS DOUBLE) * nm.np / CAST(nm.m9 AS DOUBLE))
        |      * 1000000 + 0.5) AS BIGINT) END AS resid_e6
        |FROM t LEFT JOIN se2 ON t.seg = se2.seg AND t.ph = se2.ph
        |LEFT JOIN nm ON t.seg = nm.seg
        |ORDER BY t.seg, t.month""".stripMargin),

    // the same value-count grid midranks (2*mr = 2*cum_before + c + 1),
    // HUGEINT tie term, the IDENTICAL z tree; verdict on the ROUNDED z
    "q268_x_mann_whitney" -> {
      val vd = """(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
                 | * (CAST(n_a + n_b + 1 AS DOUBLE)
                 |    - CAST(t3 AS DOUBLE)
                 |      / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b - 1 AS DOUBLE))))"""
        .stripMargin.replaceAll("\n", " ")
      s"""WITH e AS (
        |  SELECT event_type AS k,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS g,
        |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |grid AS (SELECT k, v,
        |           CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |           CAST(sum(CASE WHEN g = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |         FROM e GROUP BY 1, 2),
        |r AS (SELECT *, ca + cb AS c,
        |        2 * coalesce(sum(ca + cb) OVER (PARTITION BY k ORDER BY v
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          + ca + cb + 1 AS mr2
        |      FROM grid),
        |a AS (SELECT k, CAST(sum(ca) AS BIGINT) AS n_a,
        |             CAST(sum(cb) AS BIGINT) AS n_b,
        |             CAST(sum(ca * mr2) AS BIGINT) AS r2a,
        |             sum(CAST(c AS HUGEINT) * c * c - c) AS t3
        |      FROM r GROUP BY 1),
        |f AS (SELECT k, n_a, n_b, r2a - n_a * (n_a + 1) AS u_x2, t3 FROM a),
        |z AS (SELECT k, n_a, n_b, u_x2,
        |        CASE WHEN n_a > 0 AND n_b > 0 AND n_a + n_b > 1 AND $vd > 0 THEN
        |          CAST(floor(CAST(u_x2 - n_a * n_b AS DOUBLE) / (2.0 * sqrt($vd))
        |                     * 10000 + 0.5) AS BIGINT)
        |        END AS z_e4
        |      FROM f)
        |SELECT k AS event_type, n_a, n_b, u_x2, z_e4,
        |  CASE WHEN z_e4 IS NOT NULL THEN abs(z_e4) > 19600 END AS significant
        |FROM z ORDER BY event_type""".stripMargin
    },

    // the same floor-quantized sum-of-squares convention (HUGEINT //),
    // the identical F tree, HUGEINT-widened eta2
    "q269_x_anova" ->
      ("""WITH e AS (
        |  SELECT c_mktsegment AS k, o_orderpriority AS g,
        |         CAST(floor(o_totalprice + 0.5) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
        |    AND c_mktsegment IS NOT NULL),
        |pg AS (SELECT k, g, CAST(count(*) AS BIGINT) AS ng,
        |              CAST(sum(x) AS BIGINT) AS sg,
        |              sum(CAST(x AS HUGEINT) * x) AS qg
        |       FROM e GROUP BY 1, 2),
        |pt AS (SELECT *, CAST(CAST(sg AS HUGEINT) * sg // ng AS BIGINT) AS tg
        |       FROM pg),
        |a AS (SELECT k, CAST(count(*) AS BIGINT) AS k_groups,
        |             CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s,
        |             sum(qg) AS q, CAST(sum(tg) AS BIGINT) AS st
        |      FROM pt GROUP BY 1),
        |b AS (SELECT k, k_groups, n,
        |             greatest(0, st - CAST(CAST(s AS HUGEINT) * s // n AS BIGINT))
        |               AS ssb,
        |             CAST(q - st AS BIGINT) AS ssw
        |      FROM a)
        |SELECT k AS c_mktsegment, k_groups, n, ssb, ssw,
        |  CASE WHEN k_groups >= 2 AND n > k_groups AND ssw > 0 THEN
        |    CAST(floor((CAST(ssb AS DOUBLE) / CAST(k_groups - 1 AS DOUBLE))
        |      / (CAST(ssw AS DOUBLE) / CAST(n - k_groups AS DOUBLE))
        |      * 10000 + 0.5) AS BIGINT)
        |  END AS f_e4,
        |  CASE WHEN ssb + ssw > 0 THEN
        |    CAST(CAST(ssb AS HUGEINT) * 1000000 // (CAST(ssb AS HUGEINT) + ssw)
        |         AS BIGINT)
        |  END AS eta2_e6
        |FROM b ORDER BY c_mktsegment""".stripMargin),

    // the same midrank grid, HUGEINT floor squares and tie cubes, the
    // identical H and correction trees; verdict on the ROUNDED Hc
    "q270_x_kruskal_wallis" -> {
      val h = """(12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
                | * (CAST(sr AS DOUBLE) / 4.0) - 3.0 * CAST(n + 1 AS DOUBLE))"""
        .stripMargin.replaceAll("\n", " ")
      val tie = """(1.0 - CAST(t3 AS DOUBLE)
                  | / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                  |    - CAST(n AS DOUBLE)))""".stripMargin.replaceAll("\n", " ")
      s"""WITH e AS (
        |  SELECT c_mktsegment AS k, o_orderpriority AS g,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
        |    AND c_mktsegment IS NOT NULL),
        |cells AS (SELECT k, g, x AS v, CAST(count(*) AS BIGINT) AS cgv
        |          FROM e GROUP BY 1, 2, 3),
        |vals AS (SELECT k, v, CAST(sum(cgv) AS BIGINT) AS cv
        |         FROM cells GROUP BY 1, 2),
        |vr AS (SELECT *, 2 * coalesce(sum(cv) OVER (PARTITION BY k ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          + cv + 1 AS mr2
        |       FROM vals),
        |pg AS (SELECT c.k, c.g, CAST(sum(c.cgv) AS BIGINT) AS ng,
        |              sum(CAST(c.cgv AS HUGEINT) * vr.mr2) AS r2g
        |       FROM cells c JOIN vr ON c.k = vr.k AND c.v = vr.v
        |       GROUP BY 1, 2),
        |pt AS (SELECT k, r2g * r2g // ng AS tg
        |       FROM pg),
        |top AS (SELECT k, CAST(count(*) AS BIGINT) AS k_groups,
        |               sum(tg) AS sr
        |        FROM pt GROUP BY 1),
        |ties AS (SELECT k, CAST(sum(cv) AS BIGINT) AS n,
        |                sum(CAST(cv AS HUGEINT) * cv * cv - cv) AS t3
        |         FROM vals GROUP BY 1),
        |h0 AS (SELECT top.k AS k, k_groups, n,
        |        CASE WHEN k_groups >= 2 AND n >= 2 THEN
        |          CAST(floor($h * 10000 + 0.5) AS BIGINT) END AS h_e4,
        |        CASE WHEN k_groups >= 2 AND n >= 2 AND $tie > 0 THEN
        |          CAST(floor($h / $tie * 10000 + 0.5) AS BIGINT) END AS hc_e4
        |       FROM top JOIN ties ON top.k = ties.k)
        |SELECT k AS c_mktsegment, k_groups, n, h_e4, hc_e4,
        |  CAST(94877 AS BIGINT) AS crit5_e4,
        |  CASE WHEN hc_e4 IS NOT NULL THEN hc_e4 > 94877 END AS significant
        |FROM h0 ORDER BY c_mktsegment""".stripMargin
    },

    // lower medians off the value grid, exact |x - med| deviations,
    // then q269's floor-quantized ANOVA verbatim
    "q271_x_brown_forsythe" ->
      ("""WITH e0 AS (
        |  SELECT c_mktsegment AS k, o_orderpriority AS g,
        |         CAST(floor(o_totalprice + 0.5) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
        |    AND c_mktsegment IS NOT NULL),
        |mg AS (SELECT k, g, x AS v, CAST(count(*) AS BIGINT) AS c
        |       FROM e0 GROUP BY 1, 2, 3),
        |mc AS (SELECT *, CAST(sum(c) OVER (PARTITION BY k, g ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cum,
        |          CAST(sum(c) OVER (PARTITION BY k, g) AS BIGINT) AS nt
        |       FROM mg),
        |md AS (SELECT k, g, min(v) AS med FROM mc
        |       WHERE cum >= (nt + 1) // 2 GROUP BY 1, 2),
        |e AS (SELECT e0.k, e0.g, abs(e0.x - md.med) AS x
        |      FROM e0 JOIN md ON e0.k = md.k AND e0.g = md.g),
        |pg AS (SELECT k, g, CAST(count(*) AS BIGINT) AS ng,
        |              CAST(sum(x) AS BIGINT) AS sg,
        |              sum(CAST(x AS HUGEINT) * x) AS qg
        |       FROM e GROUP BY 1, 2),
        |pt AS (SELECT *, CAST(CAST(sg AS HUGEINT) * sg // ng AS BIGINT) AS tg
        |       FROM pg),
        |a AS (SELECT k, CAST(count(*) AS BIGINT) AS k_groups,
        |             CAST(sum(ng) AS BIGINT) AS n, CAST(sum(sg) AS BIGINT) AS s,
        |             sum(qg) AS q, CAST(sum(tg) AS BIGINT) AS st
        |      FROM pt GROUP BY 1),
        |b AS (SELECT k, k_groups, n,
        |             greatest(0, st - CAST(CAST(s AS HUGEINT) * s // n AS BIGINT))
        |               AS ssb,
        |             CAST(q - st AS BIGINT) AS ssw
        |      FROM a)
        |SELECT k AS c_mktsegment, k_groups, n, ssb, ssw,
        |  CASE WHEN k_groups >= 2 AND n > k_groups AND ssw > 0 THEN
        |    CAST(floor((CAST(ssb AS DOUBLE) / CAST(k_groups - 1 AS DOUBLE))
        |      / (CAST(ssw AS DOUBLE) / CAST(n - k_groups AS DOUBLE))
        |      * 10000 + 0.5) AS BIGINT)
        |  END AS bf_e4,
        |  CASE WHEN ssb + ssw > 0 THEN
        |    CAST(CAST(ssb AS HUGEINT) * 1000000 // (CAST(ssb AS HUGEINT) + ssw)
        |         AS BIGINT)
        |  END AS eta2_e6
        |FROM b ORDER BY c_mktsegment""".stripMargin),

    // the same regexp counts (vowel-group runs + a floor credit per
    // vowel-less word via list_filter) and the identical score tree
    "q272_x_readability" ->
      ("""WITH r AS (
        |  SELECT doc_id,
        |    text IS NOT NULL AND length(trim(text)) > 0 AS ok,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS w,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS snt,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      + len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |          t -> NOT regexp_matches(t, '[aeiouy]') AND length(t) > 0)) AS syl
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN ok THEN CAST(w AS BIGINT) END AS n_words,
        |  CASE WHEN ok THEN CAST(snt AS BIGINT) END AS n_sentences,
        |  CASE WHEN ok THEN CAST(syl AS BIGINT) END AS n_syllables,
        |  CASE WHEN ok AND w > 0 THEN
        |    CAST(floor((206.835
        |      - 1.015 * (CAST(w AS DOUBLE) / CAST(snt AS DOUBLE))
        |      - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)))
        |      * 10000 + 0.5) AS BIGINT)
        |  END AS flesch_e4
        |FROM r ORDER BY doc_id""".stripMargin),

    // discordant counts off one aggregate, DECIMAL-widened square, the
    // identical chi-square division; verdict on the ROUNDED value
    "q273_x_mcnemar" ->
      ("""WITH d AS (
        |  SELECT source,
        |    n_chars > 500 AS a,
        |    (CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END) > 90 AS b
        |  FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL AND text IS NOT NULL),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
        |          AS b_count,
        |        CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
        |          AS c_count
        |      FROM d GROUP BY 1),
        |h AS (SELECT *, CASE WHEN b_count + c_count > 0 THEN
        |        CAST(floor(CAST(CAST(b_count - c_count AS HUGEINT)
        |                        * (b_count - c_count) AS DOUBLE)
        |          / CAST(b_count + c_count AS DOUBLE) * 10000 + 0.5) AS BIGINT)
        |      END AS chi2_e4 FROM g)
        |SELECT source, n, b_count, c_count, chi2_e4,
        |  CASE WHEN chi2_e4 IS NOT NULL THEN chi2_e4 > 38415 END AS significant
        |FROM h ORDER BY source""".stripMargin),

    // per-user conversion fold, the five exact sufficient sums, the
    // identical z tree; verdict on the ROUNDED |z|
    "q274_x_cochran_armitage" -> {
      val vd = """(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                 | * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                 | * (CAST(sw2n AS DOUBLE)
                 |    - CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE) / CAST(n AS DOUBLE)))"""
        .stripMargin.replaceAll("\n", " ")
      s"""WITH u AS (
        |  SELECT user_id, CAST(user_id % 4 AS BIGINT) AS w,
        |         CAST((user_id // 4) % 2 AS BIGINT) AS panel,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1 AS s
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |a AS (SELECT panel, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |        CAST(sum(w) AS HUGEINT) AS swn,
        |        CAST(sum(CASE WHEN s THEN w ELSE 0 END) AS HUGEINT) AS swx,
        |        sum(CAST(w AS HUGEINT) * w) AS sw2n
        |      FROM u GROUP BY 1),
        |z AS (SELECT panel, n, x,
        |        CASE WHEN n > 0 AND x > 0 AND x < n AND $vd > 0 THEN
        |          CAST(floor((CAST(swx AS DOUBLE)
        |              - CAST(x AS DOUBLE) / CAST(n AS DOUBLE) * CAST(swn AS DOUBLE))
        |            / sqrt($vd) * 10000 + 0.5) AS BIGINT)
        |        END AS z_e4
        |      FROM a)
        |SELECT panel, n, x, z_e4,
        |  CASE WHEN z_e4 IS NOT NULL THEN abs(z_e4) > 19600 END AS significant
        |FROM z ORDER BY panel""".stripMargin
    },

    // the IDENTICAL counter-based resampling: same affine hash, the
    // Poisson thresholds interpolated from the operator's single source
    // (MonteCarlo.PoissonThresholdsE31), exact integer means and ranks
    "q275_x_bootstrap_ci" -> {
      val ts = graft.operators.MonteCarlo.PoissonThresholdsE31
      val wCase = ts.zipWithIndex.map { case (t, i) => s"WHEN h <= $t THEN $i" }
        .mkString("CASE ", " ", " ELSE 7 END")
      s"""WITH base AS (
        |  SELECT c_mktsegment AS k, o_orderkey AS id,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL),
        |reps AS (SELECT k, x, b.b AS b,
        |           ((id % 1000003) * 1103515245 + b.b * 2654435761 + 54321)
        |             % 2147483647 AS h
        |         FROM base
        |         CROSS JOIN (SELECT unnest(generate_series(0, 199)) AS b) b),
        |wts AS (SELECT k, b, x, $wCase AS w FROM reps),
        |rm AS (SELECT k, b, sum(CAST(w AS HUGEINT) * x) AS swx,
        |              CAST(sum(w) AS BIGINT) AS sw
        |       FROM wts GROUP BY 1, 2 HAVING sum(w) > 0),
        |mm AS (SELECT k, b,
        |              CAST(CAST(swx AS HUGEINT) * 1000000 // sw AS BIGINT) AS m
        |       FROM rm),
        |rk AS (SELECT k, b, m,
        |         CAST(row_number() OVER (PARTITION BY k ORDER BY m, b) AS BIGINT)
        |           AS rn,
        |         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS nr
        |       FROM mm),
        |bounds AS (SELECT k, max(nr) AS n_reps,
        |             max(CASE WHEN rn = (nr * 50 + 1999) // 2000 THEN m END)
        |               AS lo_e6,
        |             max(CASE WHEN rn = (nr * 1950 + 1999) // 2000 THEN m END)
        |               AS hi_e6
        |           FROM rk GROUP BY 1),
        |f AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |             CAST(CAST(sum(x) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
        |               AS mean_e6
        |      FROM base GROUP BY 1)
        |SELECT f.k AS c_mktsegment, n, mean_e6, n_reps, lo_e6, hi_e6
        |FROM f JOIN bounds ON f.k = bounds.k
        |ORDER BY c_mktsegment""".stripMargin
    },

    // the IDENTICAL inlined e15 cos/sin table (dftTableSql — one
    // definition, two engines, zero trig at query time), HUGEINT DFT
    // sums, the same (sc/1e15)^2 + (ss/1e15)^2 power tree
    "q276_u6_periodogram_fixed" -> {
      s"""WITH m AS (SELECT o_orderpriority AS prio,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT prio, cents,
        |    row_number() OVER (PARTITION BY prio ORDER BY month DESC) AS rnd
        |  FROM m),
        |tl AS (SELECT prio, cents, 64 - rnd AS t,
        |         count(*) OVER (PARTITION BY prio) AS cnt
        |       FROM r WHERE rnd <= 64),
        |tf AS (SELECT * FROM tl WHERE cnt = 64),
        |coef(k, t, c, s) AS (VALUES ${graft.stats.Diagnostics.dftTableSql(64)}),
        |su AS (SELECT prio, k,
        |         sum(CAST(cents AS HUGEINT) * c) AS sc,
        |         sum(CAST(cents AS HUGEINT) * s) AS ss
        |       FROM tf JOIN coef ON tf.t = coef.t GROUP BY 1, 2),
        |ik AS (SELECT *,
        |         ((CAST(sc AS DOUBLE) / 1e15) * (CAST(sc AS DOUBLE) / 1e15)
        |          + (CAST(ss AS DOUBLE) / 1e15) * (CAST(ss AS DOUBLE) / 1e15))
        |           AS p
        |       FROM su),
        |mx AS (SELECT *, max(p) OVER (PARTITION BY prio) AS mp FROM ik)
        |SELECT prio, k,
        |  CAST(floor(CAST(64 AS DOUBLE) / CAST(k AS DOUBLE) * 1000 + 0.5)
        |    AS BIGINT) AS period_e3,
        |  CASE WHEN mp > 0 THEN CAST(floor(p / mp * 1000000 + 0.5) AS BIGINT)
        |    END AS share_e6,
        |  CASE WHEN mp > 0 THEN p = mp END AS is_peak
        |FROM mx ORDER BY prio, k""".stripMargin
    },

    // the IDENTICAL k-grid hypergeometric: e15-quantized log-ratio
    // steps, HUGEINT cumsum, one exp per row, the 1e-7 tie tolerance as
    // integer comparison, exact integer p
    "q277_x_fisher_exact" ->
      ("""WITH e AS (
        |  SELECT event_type AS key,
        |         (user_id % 2 = 0) AS a, (value >= 99.0) AS b
        |  FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |    AND value IS NOT NULL),
        |c AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        |        CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |        CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01
        |      FROM e GROUP BY 1),
        |m AS (SELECT *, n11 + n10 AS r1, n11 + n01 AS c1,
        |        greatest(CAST(0 AS BIGINT), (n11 + n01) - (n - (n11 + n10)))
        |          AS kmin,
        |        least(n11 + n10, n11 + n01) AS kmax
        |      FROM c),
        |g AS (SELECT key, n, n11, r1, c1, kmin,
        |        unnest(generate_series(kmin, kmax)) AS k
        |      FROM m),
        |lr AS (SELECT *,
        |        CASE WHEN k = kmin THEN CAST(0 AS BIGINT) ELSE
        |          CAST(floor(
        |            ln((CAST(r1 - k + 1 AS DOUBLE) * CAST(c1 - k + 1 AS DOUBLE))
        |               / (CAST(k AS DOUBLE) * CAST(n - r1 - c1 + k AS DOUBLE)))
        |            * 1000000000000000 + 0.5) AS BIGINT)
        |        END AS lr15
        |      FROM g),
        |cu0 AS (SELECT *,
        |        sum(CAST(lr15 AS HUGEINT)) OVER (PARTITION BY key ORDER BY k
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnt
        |      FROM lr),
        |cu AS (SELECT *,
        |        max(lnt) OVER (PARTITION BY key) AS lmax
        |      FROM cu0),
        |q AS (SELECT *,
        |        CAST(floor(exp(CAST(lnt - lmax AS DOUBLE) / 1000000000000000.0)
        |          * 1000000000000000 + 0.5) AS BIGINT) AS qv
        |      FROM cu),
        |qo AS (SELECT *,
        |        max(CASE WHEN k = n11 THEN qv END) OVER (PARTITION BY key)
        |          AS qobs
        |      FROM q),
        |agg AS (SELECT key, max(n) AS n, max(n11) AS n11, max(r1) AS r1,
        |          max(c1) AS c1,
        |          sum(CAST(qv AS HUGEINT)) AS den,
        |          sum(CASE WHEN CAST(qv AS HUGEINT) * 10000000
        |                     <= CAST(qobs AS HUGEINT) * 10000001
        |                   THEN CAST(qv AS HUGEINT) ELSE CAST(0 AS HUGEINT) END)
        |            AS num
        |        FROM qo GROUP BY 1)
        |SELECT key AS event_type, n, n11, r1, c1,
        |  CASE WHEN den > 0 THEN
        |    CAST((num * 2000000000 + den) // (2 * den) AS BIGINT) END AS p_e9,
        |  CASE WHEN den > 0 THEN
        |    CAST((num * 2000000000 + den) // (2 * den) AS BIGINT) < 50000000
        |  END AS significant
        |FROM agg ORDER BY event_type""".stripMargin),

    // two-pass integer-mean shift (c = sum // n, floor == trunc on the
    // positive sums), HUGEINT central power sums, the IDENTICAL moment
    // trees
    "q278_x_jarque_bera" -> jarqueBeraSql,

    // the q225 subject derivation + a variant split, per-group
    // lifetable, suffix-sum at-risk windows, the IDENTICAL e9 term and
    // chi2 trees
    "q279_x_log_rank" ->
      ("""WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |per AS (SELECT user_id, min(us) AS f, max(us) AS l FROM e GROUP BY 1),
        |g AS (SELECT max(l) AS gm FROM per),
        |s AS (SELECT 'c' || CAST(user_id % 3 AS VARCHAR) AS cohort,
        |        CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v,
        |        (l - f) // 86400000000 AS dur,
        |        l < gm - 1209600000000 AS ev
        |      FROM per CROSS JOIN g),
        |lt AS (SELECT cohort, dur,
        |         CAST(sum(CASE WHEN v = 'A' AND ev THEN 1 ELSE 0 END) AS BIGINT)
        |           AS da,
        |         CAST(sum(CASE WHEN v = 'B' AND ev THEN 1 ELSE 0 END) AS BIGINT)
        |           AS db,
        |         CAST(sum(CASE WHEN v = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ra,
        |         CAST(sum(CASE WHEN v = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS rb
        |       FROM s GROUP BY 1, 2),
        |rk AS (SELECT *,
        |         CAST(sum(ra) OVER (PARTITION BY cohort ORDER BY dur DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS na,
        |         CAST(sum(rb) OVER (PARTITION BY cohort ORDER BY dur DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS nb
        |       FROM lt),
        |ev AS (SELECT *, na + nb AS nt, da + db AS dt FROM rk
        |       WHERE da + db > 0),
        |tm AS (SELECT *,
        |         CAST(floor(CAST(dt AS DOUBLE) * CAST(na AS DOUBLE)
        |           / CAST(nt AS DOUBLE) * 1000000000 + 0.5) AS BIGINT) AS e9,
        |         CASE WHEN nt > 1 THEN
        |           CAST(floor(CAST(dt AS DOUBLE)
        |             * (CAST(na AS DOUBLE) / CAST(nt AS DOUBLE))
        |             * (1.0 - CAST(na AS DOUBLE) / CAST(nt AS DOUBLE))
        |             * (CAST(nt - dt AS DOUBLE) / CAST(nt - 1 AS DOUBLE))
        |             * 1000000000 + 0.5) AS BIGINT)
        |         ELSE CAST(0 AS BIGINT) END AS v9
        |       FROM ev),
        |agg AS (SELECT cohort, max(na) AS n_a, max(nb) AS n_b,
        |          CAST(sum(da) AS BIGINT) AS o_a,
        |          CAST(sum(e9) AS BIGINT) AS e_a_e9,
        |          CAST(sum(v9) AS BIGINT) AS v_e9
        |        FROM tm GROUP BY 1)
        |SELECT cohort, n_a, n_b, o_a, e_a_e9, v_e9,
        |  CASE WHEN v_e9 > 0 THEN
        |    CAST(floor(
        |      (CAST(o_a AS DOUBLE) * 1000000000 - CAST(e_a_e9 AS DOUBLE))
        |      * (CAST(o_a AS DOUBLE) * 1000000000 - CAST(e_a_e9 AS DOUBLE))
        |      / (CAST(v_e9 AS DOUBLE) * 1000000000)
        |      * 10000 + 0.5) AS BIGINT) END AS chi2_e4,
        |  CASE WHEN v_e9 > 0 THEN
        |    CAST(floor(
        |      (CAST(o_a AS DOUBLE) * 1000000000 - CAST(e_a_e9 AS DOUBLE))
        |      * (CAST(o_a AS DOUBLE) * 1000000000 - CAST(e_a_e9 AS DOUBLE))
        |      / (CAST(v_e9 AS DOUBLE) * 1000000000)
        |      * 10000 + 0.5) AS BIGINT) > 38415
        |  END AS significant
        |FROM agg ORDER BY cohort""".stripMargin),

    // exact integer D/N/f1/f2 off the (source, token) grid; the
    // IDENTICAL Chao1 tree with the f2=0 bias correction
    "q280_x_vocab_richness" ->
      ("""WITH tk AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents
        |  WHERE source IS NOT NULL AND text IS NOT NULL
        |    AND length(trim(text)) > 0),
        |g AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
        |      FROM tk WHERE t <> '' GROUP BY 1, 2),
        |a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |        CAST(count(*) AS BIGINT) AS n_distinct,
        |        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |        CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |      FROM g GROUP BY 1)
        |SELECT source, n_tokens, n_distinct, f1, f2,
        |  CAST(floor(CASE WHEN f2 > 0 THEN
        |    CAST(n_distinct AS DOUBLE)
        |      + CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE)
        |        / (2.0 * CAST(f2 AS DOUBLE))
        |  ELSE
        |    CAST(n_distinct AS DOUBLE)
        |      + CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE) / 2.0
        |  END * 100 + 0.5) AS BIGINT) AS chao1_e2,
        |  f1 * 1000000 // n_tokens AS gt_unseen_e6
        |FROM a ORDER BY source""".stripMargin),

    // the same pooled value-count grid and cumulative windows as q268,
    // HUGEINT squared-gap terms, the IDENTICAL one-division T tree
    "q281_x_cramer_von_mises" ->
      ("""WITH e AS (
        |  SELECT event_type AS k,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS g,
        |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |grid AS (SELECT k, v,
        |           CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |             AS ca,
        |           CAST(sum(CASE WHEN g = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |             AS cb
        |         FROM e GROUP BY 1, 2),
        |w AS (SELECT *,
        |        CAST(sum(ca) OVER (PARTITION BY k ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cuma,
        |        CAST(sum(cb) OVER (PARTITION BY k ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cumb,
        |        CAST(sum(ca) OVER (PARTITION BY k) AS BIGINT) AS na,
        |        CAST(sum(cb) OVER (PARTITION BY k) AS BIGINT) AS nb
        |      FROM grid),
        |t AS (SELECT k, na, nb,
        |        CAST(ca + cb AS HUGEINT)
        |          * (CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)
        |          * (CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)
        |          AS term
        |      FROM w),
        |a AS (SELECT k, max(na) AS n_a, max(nb) AS n_b, sum(term) AS u
        |      FROM t GROUP BY 1)
        |SELECT k AS event_type, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST(floor(CAST(u AS DOUBLE)
        |      / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b AS DOUBLE)
        |         * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |      * 1000000 + 0.5) AS BIGINT) END AS t_e6,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST(floor(CAST(u AS DOUBLE)
        |      / (CAST(n_a + n_b AS DOUBLE) * CAST(n_a + n_b AS DOUBLE)
        |         * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |      * 1000000 + 0.5) AS BIGINT) > 461000
        |  END AS significant
        |FROM a ORDER BY event_type""".stripMargin),

    // the same melted feature grid (UNION ALL), cumulative windows,
    // HUGEINT Gini score with // floor, (score desc, v) argmax, the
    // IDENTICAL gain tree
    "q282_x_best_split" ->
      ("""WITH m AS (
        |  SELECT source, (lang = 'en') AS y, 'chars_c' AS feat,
        |         n_chars // 100 AS v
        |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang IS NOT NULL
        |  UNION ALL
        |  SELECT source, (lang = 'en') AS y, 'toks_d' AS feat,
        |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |           // 10 AS v
        |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
        |    AND lang IS NOT NULL),
        |g AS (SELECT source, feat, v, CAST(count(*) AS BIGINT) AS c,
        |        CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p
        |      FROM m GROUP BY 1, 2, 3),
        |w AS (SELECT *,
        |        CAST(sum(c) OVER (PARTITION BY source, feat ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS nl,
        |        CAST(sum(p) OVER (PARTITION BY source, feat ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS pl,
        |        CAST(sum(c) OVER (PARTITION BY source, feat) AS BIGINT) AS n,
        |        CAST(sum(p) OVER (PARTITION BY source, feat) AS BIGINT) AS pos
        |      FROM g),
        |s AS (SELECT *,
        |        (CAST(pl AS HUGEINT) * pl
        |         + CAST(nl - pl AS HUGEINT) * (nl - pl)) * 2000000000 // nl
        |        + (CAST(pos - pl AS HUGEINT) * (pos - pl)
        |           + CAST((n - nl) - (pos - pl) AS HUGEINT)
        |             * ((n - nl) - (pos - pl))) * 2000000000 // (n - nl)
        |          AS score
        |      FROM w WHERE nl < n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source, feat
        |        ORDER BY score DESC, v) AS rn
        |      FROM s)
        |SELECT source, feat, v AS threshold, n, pos AS n_pos, nl AS n_left,
        |  pl AS pos_left,
        |  CAST(floor(
        |    (CAST(score AS DOUBLE) / 2000000000.0
        |     - (CAST(pos AS DOUBLE) * pos + CAST(n - pos AS DOUBLE) * (n - pos))
        |       / CAST(n AS DOUBLE))
        |    / CAST(n AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS gain_e6
        |FROM r WHERE rn = 1 ORDER BY source, feat""".stripMargin),

    // two-pass integer-mean shift, the IDENTICAL Bartlett lrv tree over
    // HUGEINT lag cross-sums
    "q283_x_newey_west" -> neweyWestSql,

    // the IDENTICAL fence grids (cum*b >= i*n) and score cases
    "q286_x_rfm_segments" -> rfmSql,

    // q177's window replay wrapped as a CTE, exact n*q - s*s variance
    // forms, clamp AFTER rounding
    "q288_x_seasonal_strength" -> {
      def strength(q: String, s: String) =
        s"""CASE WHEN n_used * $q - $s * $s > 0 THEN
           |  greatest(CAST(0 AS BIGINT),
           |    CAST(floor((1.0 - CAST(n_used * qr - sr * sr AS DOUBLE)
           |      / CAST(n_used * $q - $s * $s AS DOUBLE))
           |      * 1000000 + 0.5) AS BIGINT))
           |END""".stripMargin
      s"""WITH m AS (SELECT o_orderpriority AS prio,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1, 2),
        |w AS (SELECT *,
        |    ((row_number() OVER o) - 1) % 12 AS ph,
        |    CASE WHEN count(cents) OVER a = 12
        |      THEN sum(cents) OVER a END AS sa,
        |    CASE WHEN count(cents) OVER b = 12
        |      THEN sum(cents) OVER b END AS sb
        |  FROM m
        |  WINDOW o AS (PARTITION BY prio ORDER BY month),
        |    a AS (PARTITION BY prio ORDER BY month
        |          ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING),
        |    b AS (PARTITION BY prio ORDER BY month
        |          ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)),
        |t AS (SELECT *, CAST(sa + sb AS BIGINT) AS t2p,
        |        CAST(24 * cents - (sa + sb) AS BIGINT) AS det
        |      FROM w),
        |se AS (SELECT prio, ph, CAST(sum(det) AS BIGINT) AS sn,
        |         count(*) AS sc
        |       FROM t WHERE det IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT t.prio, t.cents,
        |    CAST(floor(CAST(t.t2p AS DOUBLE) / 24 * 1000000 + 0.5) AS BIGINT)
        |      AS trend_e6,
        |    CAST(floor(CAST(se.sn AS DOUBLE) / (CAST(se.sc AS DOUBLE) * 24)
        |      * 1000000 + 0.5) AS BIGINT) AS seasonal_e6,
        |    CAST(floor((CAST(t.cents AS DOUBLE) - CAST(t.t2p AS DOUBLE) / 24
        |      - CAST(se.sn AS DOUBLE) / (CAST(se.sc AS DOUBLE) * 24))
        |      * 1000000 + 0.5) AS BIGINT) AS resid_e6
        |  FROM t LEFT JOIN se ON t.prio = se.prio AND t.ph = se.ph
        |  WHERE t.t2p IS NOT NULL),
        |f AS (SELECT prio, cents * 1000000 - trend_e6 AS det6,
        |        cents * 1000000 - seasonal_e6 AS des6, resid_e6
        |      FROM c WHERE resid_e6 IS NOT NULL),
        |su AS (SELECT prio, CAST(count(*) AS BIGINT) AS n_used,
        |    sum(CAST(resid_e6 AS HUGEINT)) AS sr,
        |    sum(CAST(resid_e6 AS HUGEINT) * resid_e6) AS qr,
        |    sum(CAST(det6 AS HUGEINT)) AS sd,
        |    sum(CAST(det6 AS HUGEINT) * det6) AS qd,
        |    sum(CAST(des6 AS HUGEINT)) AS ss,
        |    sum(CAST(des6 AS HUGEINT) * des6) AS qs
        |  FROM f GROUP BY 1)
        |SELECT prio, n_used,
        |  ${strength("qd", "sd")} AS f_seasonal_e6,
        |  ${strength("qs", "ss")} AS f_trend_e6
        |FROM su ORDER BY prio""".stripMargin
    },

    // the same lag-window run counts, HUGEINT 2*n1*n0, the IDENTICAL
    // mu/sigma/z trees
    "q296_x_runs_test" -> {
      val tn = "(CAST(2 AS HUGEINT) * n_true * (n - n_true))"
      val mu = s"(CAST($tn AS DOUBLE) / CAST(n AS DOUBLE) + 1.0)"
      val v = s"(CAST($tn AS DOUBLE) * (CAST($tn AS DOUBLE) - CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))"
      s"""WITH e AS (
        |  SELECT event_type AS k, epoch_ns(ts) AS t, event_id,
        |         (value >= 50.0) AS f
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL),
        |w AS (SELECT k, f,
        |        lag(f, 1) OVER (PARTITION BY k ORDER BY t, event_id) AS pf
        |      FROM e),
        |su AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
        |         CAST(sum(CASE WHEN pf IS NOT NULL AND pf <> f THEN 1
        |               ELSE 0 END) + 1 AS BIGINT) AS n_runs
        |       FROM w GROUP BY 1)
        |SELECT k AS event_type, n, n_true, n_runs,
        |  CASE WHEN n_true > 0 AND n_true < n AND n > 1 AND $v > 0 THEN
        |    CAST(floor((CAST(n_runs AS DOUBLE) - $mu) / sqrt($v)
        |      * 10000 + 0.5) AS BIGINT) END AS z_e4,
        |  CASE WHEN n_true > 0 AND n_true < n AND n > 1 AND $v > 0 THEN
        |    abs(CAST(floor((CAST(n_runs AS DOUBLE) - $mu) / sqrt($v)
        |      * 10000 + 0.5) AS BIGINT)) > 19600
        |  END AS significant
        |FROM su ORDER BY event_type""".stripMargin
    },

    // q225's recursive KM chain + the lag/segment step integral, tail
    // closure at S_last, exact median fence, the IDENTICAL div 1e6
    "q334_x_survival_summary" -> {
      s"""$KaplanMeierCtes,
        |km AS (SELECT o.key, o.dur, o.tot, o.d, o.c, rec.sv
        |       FROM o JOIN rec ON o.key = rec.key AND o.rn = rec.rn),
        |lagd AS (SELECT key, dur, sv, tot, d, c,
        |           lag(dur, 1, 0) OVER (PARTITION BY key ORDER BY dur)
        |             AS pdur,
        |           lag(sv, 1, 1000000000) OVER (PARTITION BY key
        |             ORDER BY dur) AS psv
        |         FROM km),
        |seg AS (SELECT key, tot, dur, sv,
        |          CAST(greatest(0, least(dur, 30) - least(pdur, 30))
        |               AS HUGEINT) * psv AS area
        |        FROM lagd),
        |ag AS (SELECT key, CAST(max(tot) AS BIGINT) AS n_subjects,
        |         sum(area) AS a1, CAST(max(dur) AS BIGINT) AS maxdur
        |       FROM seg GROUP BY 1),
        |lastS AS (SELECT key, sv AS lsv FROM
        |            (SELECT key, sv, row_number() OVER (PARTITION BY key
        |               ORDER BY dur DESC) AS r FROM km)
        |          WHERE r = 1),
        |med AS (SELECT key, CAST(min(dur) AS BIGINT) AS median_duration
        |        FROM km WHERE sv <= 500000000 GROUP BY 1)
        |SELECT ag.key, n_subjects,
        |  CAST((a1 + CAST(greatest(0, 30 - maxdur) AS HUGEINT) * lsv)
        |       // 1000000 AS BIGINT) AS rmst_e3,
        |  med.median_duration
        |FROM ag JOIN lastS ON lastS.key = ag.key
        |LEFT JOIN med ON med.key = ag.key
        |ORDER BY ag.key""".stripMargin
    },

    // the learner's 3 merge rounds unrolled: pair-count -> argmax
    // (count DESC, then lexicographically smallest (l, r)) -> 2-pass
    // delimited replace (exact greedy under the run-capped contract —
    // see Bpe.mergeSliceDf's scaladoc for the proof sketch)
    "q335_x_bpe_merge_slice" -> {
      val run5 = ('a' to 'z').map(c => c.toString * 5).mkString("|")
      def pairCte(p: String, sIn: String): String =
        s"""$p AS (
           |  SELECT syms[i] AS l, syms[i + 1] AS r,
           |         CAST(sum(c) AS BIGINT) AS cnt
           |  FROM (SELECT c,
           |          list_filter(string_split(s, '|'), x -> x <> '') AS syms,
           |          unnest(generate_series(1,
           |            len(list_filter(string_split(s, '|'), x -> x <> '')) - 1))
           |            AS i
           |        FROM $sIn)
           |  GROUP BY 1, 2)""".stripMargin
      def applyCte(sOut: String, sIn: String, m: String): String =
        s"""$sOut AS (
           |  SELECT replace(replace(s,
           |      '|' || (SELECT l FROM $m) || '|' || (SELECT r FROM $m) || '|',
           |      '|' || (SELECT l || r FROM $m) || '|'),
           |      '|' || (SELECT l FROM $m) || '|' || (SELECT r FROM $m) || '|',
           |      '|' || (SELECT l || r FROM $m) || '|') AS s, c FROM $sIn)""".stripMargin
      s"""WITH wraw AS (
         |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
         |  FROM documents WHERE text IS NOT NULL),
         |w AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM wraw
         |  WHERE length(w) BETWEEN 2 AND 9
         |    AND NOT regexp_matches(w, '$run5')
         |  GROUP BY 1),
         |s0 AS (SELECT '|' || array_to_string(string_split(w, ''), '|') || '|'
         |         AS s, c FROM w),
         |${pairCte("p0", "s0")},
         |m0 AS (SELECT l, r, cnt FROM p0 ORDER BY cnt DESC, l, r LIMIT 1),
         |${applyCte("s1", "s0", "m0")},
         |${pairCte("p1", "s1")},
         |m1 AS (SELECT l, r, cnt FROM p1 ORDER BY cnt DESC, l, r LIMIT 1),
         |${applyCte("s2", "s1", "m1")},
         |${pairCte("p2", "s2")},
         |m2 AS (SELECT l, r, cnt FROM p2 ORDER BY cnt DESC, l, r LIMIT 1)
         |SELECT CAST(0 AS BIGINT) AS rank, l AS left_sym, r AS right_sym,
         |       cnt AS pair_count FROM m0
         |UNION ALL SELECT CAST(1 AS BIGINT), l, r, cnt FROM m1
         |UNION ALL SELECT CAST(2 AS BIGINT), l, r, cnt FROM m2
         |ORDER BY rank""".stripMargin
    },

    // the same per-user (x, y) grid, HUGEINT side sums, the IDENTICAL
    // welch-spelled variance/covariance and delta-method z trees
    "q332_x_ratio_metric_ab" -> {
      def tree(t: String) = {
        val n = s"n_$t"
        val r = s"(CAST(sx$t AS DOUBLE) / CAST(sy$t AS DOUBLE))"
        val vx = s"((CAST(qx$t AS DOUBLE) - CAST(sx$t AS DOUBLE) * sx$t / $n) / ($n - 1))"
        val vy = s"((CAST(qy$t AS DOUBLE) - CAST(sy$t AS DOUBLE) * sy$t / $n) / ($n - 1))"
        val cxy = s"((CAST(xy$t AS DOUBLE) - CAST(sx$t AS DOUBLE) * sy$t / $n) / ($n - 1))"
        val ybar = s"(CAST(sy$t AS DOUBLE) / CAST($n AS DOUBLE))"
        (r, s"(($vx + $r * $r * $vy - 2.0 * $r * $cxy) / ($ybar * $ybar * CAST($n AS DOUBLE)))")
      }
      val (ra, va) = tree("a")
      val (rb, vb) = tree("b")
      def sideSums(t: String, cond: String) =
        s"""CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS n_$t,
           |        sum(CASE WHEN $cond THEN CAST(x AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS sx$t,
           |        sum(CASE WHEN $cond THEN CAST(y AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS sy$t,
           |        sum(CASE WHEN $cond THEN CAST(x AS HUGEINT) * x ELSE CAST(0 AS HUGEINT) END) AS qx$t,
           |        sum(CASE WHEN $cond THEN CAST(y AS HUGEINT) * y ELSE CAST(0 AS HUGEINT) END) AS qy$t,
           |        sum(CASE WHEN $cond THEN CAST(x AS HUGEINT) * y ELSE CAST(0 AS HUGEINT) END) AS xy$t""".stripMargin
      s"""WITH pu AS (
        |  SELECT event_type AS k,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v,
        |         user_id,
        |         CAST(sum(CASE WHEN value >= 50.0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS x,
        |         CAST(count(*) AS BIGINT) AS y
        |  FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |    AND value IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |c AS (SELECT k,
        |        ${sideSums("a", "v = 'A'")},
        |        ${sideSums("b", "v = 'B'")}
        |      FROM pu GROUP BY 1),
        |r AS (SELECT k, n_a, n_b,
        |        CASE WHEN n_a > 0 AND sya > 0 THEN
        |          CAST(floor($ra * 1000000 + 0.5) AS BIGINT) END
        |          AS ratio_a_e6,
        |        CASE WHEN n_b > 0 AND syb > 0 THEN
        |          CAST(floor($rb * 1000000 + 0.5) AS BIGINT) END
        |          AS ratio_b_e6,
        |        CASE WHEN n_a >= 2 AND n_b >= 2 AND sya > 0 AND syb > 0
        |              AND $va + $vb > 0 THEN
        |          CAST(floor(($ra - $rb) / sqrt($va + $vb) * 10000 + 0.5)
        |               AS BIGINT) END AS z_e4
        |      FROM c)
        |SELECT k AS event_type, n_a, n_b, ratio_a_e6, ratio_b_e6, z_e4,
        |  CASE WHEN z_e4 IS NOT NULL THEN abs(z_e4) > 19600 END
        |    AS significant
        |FROM r ORDER BY event_type""".stripMargin
    },

    // the same counts and unpooled-SE trees, delta inlined as 0.05,
    // verdict on both rounded one-sided z's
    "q331_x_tost_equivalence" -> {
      val pa = "(CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
      val pb = "(CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
      val se = s"sqrt($pa * (1.0 - $pa) / CAST(n_a AS DOUBLE) + $pb * (1.0 - $pb) / CAST(n_b AS DOUBLE))"
      s"""WITH e AS (
        |  SELECT event_type AS k,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS v,
        |         (value >= 50.0) AS hi
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |c AS (SELECT k,
        |        CAST(sum(CASE WHEN v = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_a,
        |        CAST(sum(CASE WHEN v = 'A' AND hi THEN 1 ELSE 0 END)
        |             AS BIGINT) AS x_a,
        |        CAST(sum(CASE WHEN v = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_b,
        |        CAST(sum(CASE WHEN v = 'B' AND hi THEN 1 ELSE 0 END)
        |             AS BIGINT) AS x_b
        |      FROM e GROUP BY 1),
        |r AS (SELECT k, n_a, x_a, n_b, x_b,
        |        CASE WHEN n_a > 0 AND n_b > 0 THEN
        |          CAST(floor(($pa - $pb) * 1000000 + 0.5) AS BIGINT) END
        |          AS d_e6,
        |        CASE WHEN n_a > 0 AND n_b > 0 AND $se > 0 THEN
        |          CAST(floor($se * 1000000 + 0.5) AS BIGINT) END AS se_e6,
        |        CASE WHEN n_a > 0 AND n_b > 0 AND $se > 0 THEN
        |          CAST(floor(($pa - $pb + 0.05) / $se * 10000 + 0.5)
        |               AS BIGINT) END AS z_lo_e4,
        |        CASE WHEN n_a > 0 AND n_b > 0 AND $se > 0 THEN
        |          CAST(floor(($pa - $pb - 0.05) / $se * 10000 + 0.5)
        |               AS BIGINT) END AS z_hi_e4
        |      FROM c)
        |SELECT k AS event_type, n_a, x_a, n_b, x_b, d_e6, se_e6,
        |  z_lo_e4, z_hi_e4,
        |  CASE WHEN z_lo_e4 IS NOT NULL THEN
        |    z_lo_e4 > 16450 AND z_hi_e4 < -16450 END AS equivalent
        |FROM r ORDER BY event_type""".stripMargin
    },

    // q79's reach chain + singleton coalesce, pure integer spectrum
    "q329_x_dup_spectrum" ->
      (s"""$DupReachCte,
        |cl AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        |       FROM reach GROUP BY src),
        |al AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cl
        |       FROM (SELECT doc_id FROM documents
        |             WHERE doc_id IS NOT NULL) d
        |       LEFT JOIN cl ON cl.doc_id = d.doc_id),
        |sz AS (SELECT cl, CAST(count(*) AS BIGINT) AS cluster_size
        |       FROM al GROUP BY 1),
        |sp AS (SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
        |       FROM sz GROUP BY 1),
        |s2 AS (SELECT *, cluster_size * n_clusters AS n_docs FROM sp),
        |tot2 AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tt FROM s2)
        |SELECT cluster_size, n_clusters, n_docs,
        |  n_docs * 1000 // tt AS doc_share_pm
        |FROM s2, tot2 ORDER BY cluster_size""".stripMargin),

    // the same lead-window transition grid, e9 conditional-entropy
    // terms, HUGEINT ns*h products, the IDENTICAL rate div and
    // predictability tree
    "q330_x_entropy_rate" ->
      ("""WITH e AS (
        |  SELECT user_id % 2 AS g, user_id AS u,
        |         epoch_ns(ts) // 1000 AS t, event_id, event_type AS s
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |l AS (SELECT g, s,
        |        lead(s) OVER (PARTITION BY g, u ORDER BY t, event_id) AS nxt
        |      FROM e),
        |cells AS (SELECT g, s AS f, nxt, CAST(count(*) AS BIGINT) AS c
        |          FROM l WHERE nxt IS NOT NULL GROUP BY 1, 2, 3),
        |ft AS (SELECT g, f, CAST(sum(c) AS BIGINT) AS ns
        |       FROM cells GROUP BY 1, 2),
        |hs AS (SELECT cells.g, cells.f, max(ns) AS ns,
        |         CAST(sum(CAST(floor(
        |             -(CAST(c AS DOUBLE) / CAST(ns AS DOUBLE))
        |             * ln(CAST(c AS DOUBLE) / CAST(ns AS DOUBLE))
        |             * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS hsv
        |       FROM cells JOIN ft ON ft.g = cells.g AND ft.f = cells.f
        |       GROUP BY 1, 2),
        |a AS (SELECT g, CAST(sum(ns) AS BIGINT) AS n_transitions,
        |        sum(CAST(ns AS HUGEINT) * hsv) AS num
        |      FROM hs GROUP BY 1),
        |st AS (SELECT g, f AS s FROM cells
        |       UNION SELECT g, nxt FROM cells),
        |k AS (SELECT g, CAST(count(*) AS BIGINT) AS n_states
        |      FROM st GROUP BY 1),
        |a2 AS (SELECT a.g, n_transitions, num, n_states
        |       FROM a JOIN k ON k.g = a.g)
        |SELECT g AS cohort, n_transitions, n_states,
        |  CAST(num // n_transitions AS BIGINT) AS entropy_rate_e9,
        |  CASE WHEN n_states >= 2 THEN
        |    CAST(floor((1.0
        |      - CAST(CAST(num // n_transitions AS BIGINT) AS DOUBLE) / 1e9
        |      / ln(CAST(n_states AS DOUBLE)))
        |      * 1000000 + 0.5) AS BIGINT) END AS predictability_e6
        |FROM a2 ORDER BY cohort""".stripMargin),

    // the same A/B value grid as q281/q301, the IDENTICAL ceil fences
    // per side, stacked rows, integer differences
    "q328_x_qte" ->
      ("""WITH e AS (
        |  SELECT event_type AS k,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS g,
        |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |grid AS (SELECT k, v,
        |           CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |             AS ca,
        |           CAST(sum(CASE WHEN g = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |             AS cb
        |         FROM e GROUP BY 1, 2),
        |w AS (SELECT *,
        |        CAST(sum(ca) OVER (PARTITION BY k ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cuma,
        |        CAST(sum(cb) OVER (PARTITION BY k ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cumb,
        |        CAST(sum(ca) OVER (PARTITION BY k) AS BIGINT) AS na,
        |        CAST(sum(cb) OVER (PARTITION BY k) AS BIGINT) AS nb
        |      FROM grid),
        |f AS (SELECT k,
        |        min(CASE WHEN cuma >= (10 * na + 99) // 100 AND na > 0
        |              THEN v END) AS qa10,
        |        min(CASE WHEN cumb >= (10 * nb + 99) // 100 AND nb > 0
        |              THEN v END) AS qb10,
        |        min(CASE WHEN cuma >= (50 * na + 99) // 100 AND na > 0
        |              THEN v END) AS qa50,
        |        min(CASE WHEN cumb >= (50 * nb + 99) // 100 AND nb > 0
        |              THEN v END) AS qb50,
        |        min(CASE WHEN cuma >= (90 * na + 99) // 100 AND na > 0
        |              THEN v END) AS qa90,
        |        min(CASE WHEN cumb >= (90 * nb + 99) // 100 AND nb > 0
        |              THEN v END) AS qb90
        |      FROM w GROUP BY 1)
        |SELECT k AS event_type, q_pct, q_a, q_b, q_a - q_b AS qte
        |FROM (
        |  SELECT k, CAST(10 AS BIGINT) AS q_pct, qa10 AS q_a, qb10 AS q_b
        |  FROM f
        |  UNION ALL
        |  SELECT k, CAST(50 AS BIGINT), qa50, qb50 FROM f
        |  UNION ALL
        |  SELECT k, CAST(90 AS BIGINT), qa90, qb90 FROM f)
        |WHERE q_a IS NOT NULL AND q_b IS NOT NULL
        |ORDER BY event_type, q_pct""".stripMargin),

    // the same deterministic order statistics, per-row e9 ln ratios
    // against the k+1 fence, the IDENTICAL k*1e15/S alpha tree
    "q326_x_hill_tail" ->
      ("""WITH b AS (
        |  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS x
        |  FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
        |    AND n_chars > 0 AND doc_id IS NOT NULL),
        |r AS (SELECT source, x,
        |        CAST(row_number() OVER (PARTITION BY source
        |          ORDER BY x DESC, doc_id ASC) AS BIGINT) AS rr,
        |        CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |      FROM b),
        |r2 AS (SELECT *, least(50, n - 1) AS k FROM r
        |       WHERE rr <= least(50, n - 1) + 1),
        |f AS (SELECT source, x AS xf FROM r2 WHERE rr = k + 1),
        |t AS (SELECT r2.source, r2.n, r2.k, f.xf,
        |        CAST(floor(ln(CAST(r2.x AS DOUBLE) / CAST(f.xf AS DOUBLE))
        |          * 1e9 + 0.5) AS BIGINT) AS lr
        |      FROM r2 JOIN f ON f.source = r2.source WHERE r2.rr <= r2.k),
        |a AS (SELECT source, CAST(max(n) AS BIGINT) AS n_pos,
        |        CAST(max(k) AS BIGINT) AS k_used,
        |        CAST(max(xf) AS BIGINT) AS x_kplus1,
        |        CAST(sum(lr) AS BIGINT) AS s
        |      FROM t GROUP BY 1)
        |SELECT source, n_pos, k_used, x_kplus1,
        |  CASE WHEN s > 0 AND k_used >= 2 THEN
        |    CAST(floor(CAST(k_used AS DOUBLE) * 1.0e15 / CAST(s AS DOUBLE)
        |      + 0.5) AS BIGINT) END AS tail_alpha_e6
        |FROM a ORDER BY source""".stripMargin),

    // the same english top-500 (count DESC, token ASC), LEFT-join OOV
    // classification at the (source, token) grid, integer permilles
    "q325_x_vocab_coverage" ->
      ("""WITH tk AS (
        |  SELECT source, (lang = 'en') AS ref,
        |         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents
        |  WHERE source IS NOT NULL AND text IS NOT NULL),
        |t2 AS (SELECT * FROM tk WHERE tok <> ''),
        |vc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM t2
        |       WHERE ref GROUP BY 1),
        |vr AS (SELECT tok FROM
        |         (SELECT *, row_number() OVER (ORDER BY c DESC, tok ASC)
        |            AS r FROM vc)
        |       WHERE r <= 500),
        |g AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n
        |      FROM t2 GROUP BY 1, 2),
        |a AS (SELECT g.source,
        |        CAST(sum(n) AS BIGINT) AS n_tokens,
        |        CAST(sum(CASE WHEN vr.tok IS NULL THEN n ELSE 0 END)
        |             AS BIGINT) AS n_oov,
        |        CAST(count(*) AS BIGINT) AS n_distinct,
        |        CAST(sum(CASE WHEN vr.tok IS NULL THEN 1 ELSE 0 END)
        |             AS BIGINT) AS n_distinct_oov
        |      FROM g LEFT JOIN vr ON vr.tok = g.tok GROUP BY 1)
        |SELECT source, n_tokens, n_oov, n_oov * 1000 // n_tokens AS oov_pm,
        |  n_distinct, n_distinct_oov,
        |  n_distinct_oov * 1000 // n_distinct AS distinct_oov_pm
        |FROM a ORDER BY source""".stripMargin),

    // the q52 SRP chain + the q49 brute chain in one WITH, both ranked
    // under the rounded-before-rank contract, LEFT-join hit count
    "q324_x_ann_recall" -> {
      val (nBits, nTables, dim, k, maxId, maxQ) = (8, 2, 64, 3, 200L, 32L)
      val tables = (0 until nTables)
        .map(t => s"SELECT id, embedding, $t AS t, ${srpKeySqlExpr(t, nBits, dim)} AS key FROM v")
        .mkString("\n  UNION ALL\n  ")
      def dot(l: String, r: String) =
        s"list_sum(list_transform(generate_series(1, $dim), i -> CAST($l[i] AS DOUBLE) * CAST($r[i] AS DOUBLE)))"
      val cosAB = s"round(${dot("e_a", "e_b")} / nullif(sqrt(${dot("e_a", "e_a")}) * sqrt(${dot("e_b", "e_b")}), 0), 4)"
      val cosQ = s"round(${dot("q.embedding", "c2.embedding")} / nullif(sqrt(${dot("q.embedding", "q.embedding")}) * sqrt(${dot("c2.embedding", "c2.embedding")}), 0), 4)"
      s"""WITH v AS (SELECT vec_id AS id, embedding FROM embeddings
        |           WHERE vec_id < $maxId),
        |kt AS (
        |  $tables),
        |c AS (
        |  SELECT DISTINCT a.id AS query_id, b.id AS neighbor_id
        |  FROM kt a JOIN kt b ON a.t = b.t AND a.key = b.key AND a.id <> b.id),
        |j AS (
        |  SELECT c.query_id, c.neighbor_id, ea.embedding AS e_a,
        |         eb.embedding AS e_b
        |  FROM c JOIN v ea ON ea.id = c.query_id
        |         JOIN v eb ON eb.id = c.neighbor_id),
        |s AS (SELECT query_id, neighbor_id, $cosAB AS cos_sim FROM j),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM s),
        |lsh AS (SELECT query_id, neighbor_id FROM r
        |        WHERE rank <= $k AND query_id < $maxQ),
        |ts AS (SELECT q.id AS query_id, c2.id AS neighbor_id,
        |         $cosQ AS cos_sim
        |       FROM v q JOIN v c2 ON q.id < $maxQ AND c2.id <> q.id),
        |tr AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM ts),
        |truth AS (SELECT query_id, neighbor_id FROM tr WHERE rank <= $k),
        |h AS (SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_truth,
        |        CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0
        |                 END) AS BIGINT) AS n_hits
        |      FROM truth t LEFT JOIN lsh l
        |        ON l.query_id = t.query_id AND l.neighbor_id = t.neighbor_id
        |      GROUP BY 1)
        |SELECT query_id, n_truth, n_hits, n_hits * 1000 // n_truth
        |  AS recall_pm
        |FROM h ORDER BY query_id""".stripMargin
    },

    // the same per-row norm tree (list_transform sum, the CosSimSql
    // float-fold convention) e3-quantized before any cross-row sum,
    // integer counts/mean, the IDENTICAL ceil-fence percentiles
    "q323_x_embedding_health" ->
      ("""WITH b AS (
        |  SELECT label AS k, len(embedding) AS d,
        |         CAST(floor(sqrt(list_sum(list_transform(embedding,
        |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |           * 1000 + 0.5) AS BIGINT) AS ne3
        |  FROM embeddings
        |  WHERE label IS NOT NULL AND embedding IS NOT NULL),
        |s AS (SELECT k, CAST(count(*) AS BIGINT) AS n_vecs,
        |        CAST(sum(CASE WHEN d <> 64 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_bad_dim,
        |        CAST(sum(CASE WHEN ne3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_zero,
        |        CAST(sum(ne3) AS BIGINT) // count(*) AS mean_norm_e3
        |      FROM b GROUP BY 1),
        |g AS (SELECT k, ne3, CAST(count(*) AS BIGINT) AS c
        |      FROM b GROUP BY 1, 2),
        |w AS (SELECT k, ne3,
        |        CAST(sum(c) OVER (PARTITION BY k ORDER BY ne3
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum,
        |        CAST(sum(c) OVER (PARTITION BY k) AS BIGINT) AS n
        |      FROM g),
        |p AS (SELECT k,
        |        min(CASE WHEN cum >= (5 * n + 99) // 100 THEN ne3 END)
        |          AS p05_e3,
        |        min(CASE WHEN cum >= (50 * n + 99) // 100 THEN ne3 END)
        |          AS p50_e3,
        |        min(CASE WHEN cum >= (95 * n + 99) // 100 THEN ne3 END)
        |          AS p95_e3
        |      FROM w GROUP BY 1)
        |SELECT s.k AS label, n_vecs, n_bad_dim, n_zero, mean_norm_e3,
        |       p05_e3, p50_e3, p95_e3
        |FROM s JOIN p ON p.k = s.k ORDER BY label""".stripMargin),

    // the q46 signature/band chain + the q156 split CASE, the IDENTICAL
    // least/greatest pair class and integer match-count mean
    "q322_x_split_leakage" -> {
      val rows = MinhashK / MinhashBands
      val bandConds = (0 until MinhashBands).map { b =>
        (b * rows until (b + 1) * rows).map(i => s"a.mh$i = b.mh$i")
          .mkString("(", " AND ", ")")
      }.mkString(" OR ")
      val eqSum = (0 until MinhashK)
        .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""$MinhashCte,
        |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST($eqSum AS BIGINT) AS m
        |       FROM sig a JOIN sig b
        |         ON a.doc_id < b.doc_id AND ($bandConds)),
        |sp AS (SELECT doc_id,
        |         CASE WHEN bb < 800 THEN 'train' WHEN bb < 900 THEN 'val'
        |              ELSE 'test' END AS split
        |       FROM (SELECT doc_id,
        |               ${dkHash32("CAST(doc_id AS VARCHAR)")} % 1000 AS bb
        |             FROM documents WHERE doc_id IS NOT NULL)),
        |j AS (SELECT least(sa.split, sb.split) AS split_a,
        |        greatest(sa.split, sb.split) AS split_b, m
        |      FROM pr JOIN sp sa ON sa.doc_id = pr.id_a
        |      JOIN sp sb ON sb.doc_id = pr.id_b),
        |g AS (SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs,
        |        CAST(sum(m) AS BIGINT) AS sm
        |      FROM j GROUP BY 1, 2)
        |SELECT split_a, split_b, split_a <> split_b AS crossing, n_pairs,
        |  sm * 1000000 // ($MinhashK * n_pairs) AS mean_est_j_e6
        |FROM g ORDER BY split_a, split_b""".stripMargin
    },

    // the same ordered buckets, min-bucket first appearances, IDENTICAL
    // e9-quantized ln pairs and DECIMAL OLS slope tree
    "q321_x_vocab_growth" ->
      ("""WITH d0 AS (
        |  SELECT source, doc_id, text FROM documents
        |  WHERE source IS NOT NULL AND doc_id IS NOT NULL
        |    AND text IS NOT NULL),
        |r AS (SELECT source, text,
        |        CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |             AS BIGINT) AS rn,
        |        CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS nd
        |      FROM d0),
        |b AS (SELECT source, (rn - 1) * 16 // nd AS bucket, text FROM r),
        |t AS (SELECT source, bucket,
        |        unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |      FROM b),
        |t2 AS (SELECT * FROM t WHERE tok <> ''),
        |nb AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS nt
        |       FROM t2 GROUP BY 1, 2),
        |vb AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS nv FROM
        |         (SELECT source, tok, min(bucket) AS bucket FROM t2
        |          GROUP BY 1, 2)
        |       GROUP BY 1, 2),
        |g AS (SELECT nb.source, nb.bucket, nb.nt, coalesce(vb.nv, 0) AS nv
        |      FROM nb LEFT JOIN vb
        |        ON vb.source = nb.source AND vb.bucket = nb.bucket),
        |c AS (SELECT source, bucket,
        |        CAST(sum(nt) OVER w AS BIGINT) AS tokens_cum,
        |        CAST(sum(nv) OVER w AS BIGINT) AS vocab_cum
        |      FROM g WINDOW w AS (PARTITION BY source ORDER BY bucket
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |l AS (SELECT *,
        |        CASE WHEN tokens_cum > 0 AND vocab_cum > 0 THEN
        |          CAST(floor(ln(CAST(tokens_cum AS DOUBLE)) * 1e9 + 0.5)
        |               AS BIGINT) END AS lx,
        |        CASE WHEN tokens_cum > 0 AND vocab_cum > 0 THEN
        |          CAST(floor(ln(CAST(vocab_cum AS DOUBLE)) * 1e9 + 0.5)
        |               AS BIGINT) END AS ly
        |      FROM c),
        |f AS (SELECT source, CAST(count(*) AS BIGINT) AS bq,
        |        sum(CAST(lx AS HUGEINT)) AS sx, sum(CAST(ly AS HUGEINT)) AS sy,
        |        sum(CAST(lx AS HUGEINT) * lx) AS sxx,
        |        sum(CAST(lx AS HUGEINT) * ly) AS sxy
        |      FROM l WHERE lx IS NOT NULL GROUP BY 1),
        |bt AS (SELECT source,
        |         CASE WHEN bq >= 2 AND bq * sxx - sx * sx <> 0 THEN
        |           CAST(floor(CAST(bq * sxy - sx * sy AS DOUBLE)
        |             / CAST(bq * sxx - sx * sx AS DOUBLE)
        |             * 1000000 + 0.5) AS BIGINT) END AS beta_e6
        |       FROM f)
        |SELECT l.source, l.bucket, tokens_cum, vocab_cum, bt.beta_e6
        |FROM l LEFT JOIN bt ON bt.source = l.source
        |ORDER BY l.source, l.bucket""".stripMargin),

    // the same banded monthly frame, the pair self-join with per-pair
    // sign CASE counts, the IDENTICAL e6 division trees
    "q320_x_ordinal_assoc" ->
      ("""WITH m0 AS (
        |  SELECT o_orderpriority AS k,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(count(*) AS BIGINT) AS n_orders,
        |         CAST(sum(round(o_totalprice * 100)) AS BIGINT)
        |           // count(*) AS cents
        |  FROM orders GROUP BY 1, 2),
        |m AS (SELECT k, month, n_orders // 10 AS x,
        |        cents // 200000 AS yb FROM m0),
        |p AS (SELECT a.k,
        |        CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END
        |          AS sx,
        |        CASE WHEN b.yb > a.yb THEN 1 WHEN b.yb < a.yb THEN -1
        |          ELSE 0 END AS sy
        |      FROM m a JOIN m b ON a.k = b.k AND b.month > a.month),
        |g AS (SELECT k, CAST(count(*) AS BIGINT) AS np,
        |        CAST(sum(CASE WHEN sx <> 0 AND sy <> 0 AND sx = sy
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |        CAST(sum(CASE WHEN sx <> 0 AND sy <> 0 AND sx <> sy
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |        CAST(sum(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END)
        |             AS BIGINT) AS tx,
        |        CAST(sum(CASE WHEN sx <> 0 AND sy = 0 THEN 1 ELSE 0 END)
        |             AS BIGINT) AS ty
        |      FROM p GROUP BY 1),
        |n AS (SELECT k, CAST(count(*) AS INT) AS n_obs FROM m GROUP BY 1)
        |SELECT n.k AS key, n_obs, c AS c_pairs, d AS d_pairs,
        |  CASE WHEN c + d > 0 THEN
        |    CAST(floor(CAST(c - d AS DOUBLE) / CAST(c + d AS DOUBLE)
        |      * 1000000 + 0.5) AS BIGINT) END AS gamma_e6,
        |  CASE WHEN c + d + ty > 0 THEN
        |    CAST(floor(CAST(c - d AS DOUBLE) / CAST(c + d + ty AS DOUBLE)
        |      * 1000000 + 0.5) AS BIGINT) END AS somers_d_yx_e6,
        |  CASE WHEN c + d + tx > 0 THEN
        |    CAST(floor(CAST(c - d AS DOUBLE) / CAST(c + d + tx AS DOUBLE)
        |      * 1000000 + 0.5) AS BIGINT) END AS somers_d_xy_e6
        |FROM n JOIN g ON g.k = n.k
        |WHERE n_obs >= 3 ORDER BY key""".stripMargin),

    // the same half-month split and cents totals, the IDENTICAL
    // (v DESC, item ASC) rank cut, full-outer top-set join, integer
    // jaccard/displacement readouts
    "q319_x_topk_stability" ->
      ("""WITH e AS (
        |  SELECT event_type AS kk,
        |         CASE WHEN day(ts) < 16 THEN 'A' ELSE 'B' END AS s2,
        |         user_id AS it,
        |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
        |  FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |    AND value IS NOT NULL),
        |t AS (SELECT kk, s2, it, CAST(sum(x) AS BIGINT) AS v
        |      FROM e GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (PARTITION BY kk, s2
        |        ORDER BY v DESC, it ASC) AS rr FROM t),
        |tk AS (SELECT * FROM r WHERE rr <= 10),
        |a AS (SELECT kk, it, rr AS ra FROM tk WHERE s2 = 'A'),
        |b AS (SELECT kk, it, rr AS rb FROM tk WHERE s2 = 'B'),
        |j AS (SELECT coalesce(a.kk, b.kk) AS kk, ra, rb
        |      FROM a FULL OUTER JOIN b ON a.kk = b.kk AND a.it = b.it),
        |g AS (SELECT kk,
        |        CAST(sum(CASE WHEN ra IS NOT NULL THEN 1 ELSE 0 END)
        |             AS BIGINT) AS n_a,
        |        CAST(sum(CASE WHEN rb IS NOT NULL THEN 1 ELSE 0 END)
        |             AS BIGINT) AS n_b,
        |        CAST(sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
        |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
        |        CAST(sum(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
        |                 THEN abs(ra - rb) ELSE 0 END) AS BIGINT) AS disp
        |      FROM j GROUP BY 1)
        |SELECT kk AS event_type, n_a, n_b, n_common,
        |  CAST(10 AS BIGINT) AS k,
        |  CASE WHEN n_a + n_b - n_common > 0 THEN
        |    n_common * 1000 // (n_a + n_b - n_common) END AS jaccard_pm,
        |  CASE WHEN n_common > 0 THEN disp * 100 // n_common END
        |    AS mean_disp_e2
        |FROM g ORDER BY event_type""".stripMargin),

    // the same (ts, event_id) ordering, per-row e9 term tree over the
    // exact integer prefixes, cumulative-min PH walk, integer
    // first-crossing against the inlined lambda_e9
    "q317_x_page_hinkley" ->
      ("""WITH e AS (
        |  SELECT event_type AS k, epoch_ns(ts) AS t, event_id,
        |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL),
        |w AS (SELECT k, x,
        |        CAST(row_number() OVER (PARTITION BY k ORDER BY t, event_id)
        |             AS BIGINT) AS i,
        |        CAST(sum(x) OVER (PARTITION BY k ORDER BY t, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS p
        |      FROM e),
        |t9 AS (SELECT k, i,
        |         CAST(floor((CAST(x AS DOUBLE)
        |           - CAST(p AS DOUBLE) / CAST(i AS DOUBLE) - 0.0)
        |           * 1e9 + 0.5) AS BIGINT) AS tt
        |       FROM w),
        |m AS (SELECT k, i,
        |        CAST(sum(tt) OVER (PARTITION BY k ORDER BY i
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS mv
        |      FROM t9),
        |ph AS (SELECT k, i, mv - min(mv) OVER (PARTITION BY k ORDER BY i
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phv
        |       FROM m),
        |a AS (SELECT k, CAST(count(*) AS BIGINT) AS n_obs,
        |        CAST(max(phv) AS BIGINT) AS max_ph_e9,
        |        min(CASE WHEN phv > 50000000000000 THEN i END)
        |          AS first_alarm_t
        |      FROM ph GROUP BY 1)
        |SELECT k AS event_type, n_obs, max_ph_e9, first_alarm_t,
        |  first_alarm_t IS NOT NULL AS alarmed
        |FROM a ORDER BY event_type""".stripMargin),

    // the same d = n_chars - 6*tokens derivation (q295's tokenCount
    // replay), HUGEINT difference sums, the IDENTICAL bias/sd/limit
    // trees and raw-double within comparison
    "q315_x_bland_altman" ->
      ("""WITH b AS (
        |  SELECT source,
        |    CAST(n_chars AS BIGINT)
        |      - (CASE WHEN length(trim(text)) = 0 THEN 0
        |          ELSE len(regexp_split_to_array(trim(text), '\s+')) END)
        |        * 6 AS d
        |  FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
        |    AND text IS NOT NULL),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(d) AS BIGINT) AS sd,
        |        sum(CAST(d AS HUGEINT) * d) AS qd
        |      FROM b GROUP BY 1),
        |s2 AS (SELECT source, n,
        |         CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS bias,
        |         CASE WHEN n >= 2 THEN
        |           sqrt(CAST(n * qd - CAST(sd AS HUGEINT) * sd AS DOUBLE)
        |                / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
        |         END AS sdd
        |       FROM s),
        |s3 AS (SELECT source, n, bias, sdd,
        |         bias - 1.96 * sdd AS lo, bias + 1.96 * sdd AS hi
        |       FROM s2),
        |w AS (SELECT b.source,
        |        CAST(sum(CASE WHEN d >= lo AND d <= hi THEN 1 ELSE 0 END)
        |             AS BIGINT) AS wn
        |      FROM b JOIN s3 ON s3.source = b.source GROUP BY 1)
        |SELECT s3.source, n,
        |  CAST(floor(bias * 1000000 + 0.5) AS BIGINT) AS bias_e6,
        |  CAST(floor(sdd * 1000000 + 0.5) AS BIGINT) AS sd_e6,
        |  CAST(floor(lo * 1000000 + 0.5) AS BIGINT) AS loa_lo_e6,
        |  CAST(floor(hi * 1000000 + 0.5) AS BIGINT) AS loa_hi_e6,
        |  CASE WHEN sdd IS NOT NULL THEN wn * 1000 // n END AS within_pm
        |FROM s3 JOIN w ON w.source = s3.source ORDER BY s3.source""".stripMargin),

    // the same pred/actual cuts, exact integer cells, integer permille
    // ratios, the IDENTICAL HUGEINT MCC tree
    "q316_x_confusion_mcc" ->
      ("""WITH b AS (
        |  SELECT source, n_chars > 500 AS pred,
        |    (CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END) > 90
        |      AS y
        |  FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
        |    AND text IS NOT NULL),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CASE WHEN pred AND y THEN 1 ELSE 0 END) AS BIGINT)
        |          AS tp,
        |        CAST(sum(CASE WHEN pred AND NOT y THEN 1 ELSE 0 END)
        |             AS BIGINT) AS fp,
        |        CAST(sum(CASE WHEN NOT pred AND y THEN 1 ELSE 0 END)
        |             AS BIGINT) AS fn,
        |        CAST(sum(CASE WHEN NOT pred AND NOT y THEN 1 ELSE 0 END)
        |             AS BIGINT) AS tn
        |      FROM b GROUP BY 1)
        |SELECT source, n, tp, fp, fn, tn,
        |  tp * 1000 // nullif(tp + fp, 0) AS precision_pm,
        |  tp * 1000 // nullif(tp + fn, 0) AS recall_pm,
        |  2 * tp * 1000 // nullif(2 * tp + fp + fn, 0) AS f1_pm,
        |  (tp + tn) * 1000 // n AS accuracy_pm,
        |  CASE WHEN (tp + fp) > 0 AND (tp + fn) > 0 AND (tn + fp) > 0
        |        AND (tn + fn) > 0 THEN
        |    CAST(floor(
        |      CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn
        |           AS DOUBLE)
        |      / sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn)
        |                  * (tn + fp) * (tn + fn) AS DOUBLE))
        |      * 1000000 + 0.5) AS BIGINT) END AS mcc_e6
        |FROM s ORDER BY source""".stripMargin),

    // the same monthly seg x prio grid, 2*rank + ties - 1 midranks,
    // HUGEINT centered squares, the IDENTICAL Conover T tree and
    // chi2Crit95 CASE
    "q314_x_friedman" -> {
      val crit = graft.operators.Metrics.chi2Crit95Sql("dof")
      s"""WITH m AS (
        |  SELECT c_mktsegment AS k, o_orderpriority AS j,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS b,
        |         CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2, 3),
        |kt AS (SELECT k, CAST(count(DISTINCT j) AS BIGINT) AS kk
        |       FROM m GROUP BY 1),
        |bs AS (SELECT k, b, CAST(count(*) AS BIGINT) AS bc,
        |         CAST(count(DISTINCT j) AS BIGINT) AS bd
        |       FROM m GROUP BY 1, 2),
        |cm AS (SELECT m.k, m.b, m.j, m.v, kt.kk
        |       FROM m JOIN bs ON bs.k = m.k AND bs.b = m.b
        |       JOIN kt ON kt.k = m.k
        |       WHERE bs.bc = kt.kk AND bs.bd = kt.kk),
        |rk AS (SELECT k, b, j, kk,
        |         2 * rank() OVER (PARTITION BY k, b ORDER BY v)
        |           + count(*) OVER (PARTITION BY k, b, v) - 1 AS r2
        |       FROM cm),
        |pk AS (SELECT k, CAST(count(DISTINCT b) AS BIGINT) AS n_blocks,
        |         CAST(max(kk) AS BIGINT) AS kk,
        |         sum(CAST(r2 AS HUGEINT) * r2) AS a4
        |       FROM rk GROUP BY 1),
        |pt AS (SELECT rk.k,
        |         sum((CAST(rj2 AS HUGEINT) - CAST(n_blocks AS HUGEINT)
        |              * (pk.kk + 1))
        |             * (CAST(rj2 AS HUGEINT) - CAST(n_blocks AS HUGEINT)
        |                * (pk.kk + 1))) AS num4
        |       FROM (SELECT k, j, CAST(sum(r2) AS BIGINT) AS rj2
        |             FROM rk GROUP BY 1, 2) rk
        |       JOIN pk ON pk.k = rk.k GROUP BY 1),
        |fin AS (SELECT pk.k, n_blocks, kk AS k_treatments, kk - 1 AS dof,
        |          a4 - CAST(n_blocks AS HUGEINT) * kk * (kk + 1) * (kk + 1)
        |            AS den4,
        |          num4
        |        FROM pk JOIN pt ON pt.k = pk.k)
        |SELECT k AS c_mktsegment, n_blocks, k_treatments, dof,
        |  CASE WHEN dof > 0 AND den4 > 0 THEN
        |    CAST(floor(CAST(k_treatments - 1 AS DOUBLE)
        |      * CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE)
        |      * 1000000 + 0.5) AS BIGINT) END AS chi2_e6,
        |  CAST(($crit) AS BIGINT) AS crit5_e4,
        |  CASE WHEN dof > 0 AND den4 > 0 AND ($crit) IS NOT NULL THEN
        |    CAST(floor(CAST(k_treatments - 1 AS DOUBLE)
        |      * CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE)
        |      * 1000000 + 0.5) AS BIGINT) > CAST(($crit) AS BIGINT) * 100
        |  END AS significant
        |FROM fin ORDER BY c_mktsegment""".stripMargin
    },

    // the same group sums and pair self-join, welchTTest's va/vb/se2
    // trees verbatim, the IDENTICAL A&S 26.2.17 Horner tail, q264's
    // BH rank/kmax replay
    "q313_x_pairwise_welch" -> {
      val va = "((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n_a) / (n_a - 1))"
      val vb = "((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n_b) / (n_b - 1))"
      val se2 = s"($va / n_a + $vb / n_b)"
      s"""WITH b0 AS (
        |  SELECT c_mktsegment AS k, o_orderpriority AS g,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IS NOT NULL AND o_orderpriority IS NOT NULL
        |    AND o_totalprice IS NOT NULL),
        |s AS (SELECT k, g, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(v) AS BIGINT) AS sv,
        |        sum(CAST(v AS HUGEINT) * v) AS qv
        |      FROM b0 GROUP BY 1, 2),
        |p AS (SELECT a.k, a.g AS group_a, b.g AS group_b,
        |        a.n AS n_a, b.n AS n_b, a.sv AS sa, a.qv AS qa,
        |        b.sv AS sb, b.qv AS qb
        |      FROM s a JOIN s b ON a.k = b.k AND a.g < b.g),
        |t AS (SELECT *,
        |        CASE WHEN n_a >= 2 AND n_b >= 2 AND $se2 > 0 THEN
        |          (CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b)
        |            / sqrt($se2) END AS tt
        |      FROM p),
        |z AS (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(tt)) AS zt FROM t),
        |q AS (SELECT k, group_a, group_b, n_a, n_b,
        |        sa * 100 // n_a AS mean_a_e2, sb * 100 // n_b AS mean_b_e2,
        |        CAST(floor(tt * 10000 + 0.5) AS BIGINT) AS t_e4,
        |        CASE WHEN tt IS NOT NULL THEN
        |          CAST(floor(2.0 * exp(-abs(tt) * abs(tt) / 2.0)
        |            * 0.3989422804014327
        |            * (zt * (0.319381530 + zt * (-0.356563782
        |               + zt * (1.781477937 + zt * (-1.821255978
        |               + zt * 1.330274429)))))
        |            * 1000000000 + 0.5) AS BIGINT)
        |        END AS p_e9
        |      FROM z),
        |r AS (SELECT *, CAST(row_number() OVER (ORDER BY p_e9, k, group_a,
        |               group_b) AS INT) AS rank,
        |             CAST(count(*) OVER () AS BIGINT) AS m
        |      FROM q WHERE p_e9 IS NOT NULL),
        |f AS (SELECT *, max(CASE WHEN p_e9 * 1000 * m
        |               <= rank * 50 * CAST(1000000000 AS BIGINT) THEN rank END)
        |               OVER () AS kmax
        |      FROM r)
        |SELECT k AS c_mktsegment, group_a, group_b, n_a, n_b,
        |       mean_a_e2, mean_b_e2, t_e4, p_e9, rank,
        |       coalesce(rank <= kmax, false) AS rejected
        |FROM f ORDER BY rank""".stripMargin
    },

    // the same per-user (x, n) grid, e9 rate quantization BEFORE any
    // cross-entity sum, HUGEINT moment sums, the IDENTICAL
    // mu/var/c/alpha/beta/shrunk trees
    "q312_x_eb_shrinkage" ->
      ("""WITH pu AS (
        |  SELECT user_id % 2 AS cohort, user_id AS entity,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |                  END) AS BIGINT) AS x
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |b AS (SELECT cohort, entity, x, n,
        |        CAST(floor(CAST(x AS DOUBLE) / CAST(n AS DOUBLE) * 1e9 + 0.5)
        |             AS BIGINT) AS rate_e9
        |      FROM pu WHERE n > 0),
        |p AS (SELECT cohort, CAST(count(*) AS BIGINT) AS m,
        |        sum(CAST(rate_e9 AS HUGEINT)) AS sr,
        |        sum(CAST(rate_e9 AS HUGEINT) * rate_e9) AS qr
        |      FROM b GROUP BY 1),
        |p2 AS (SELECT cohort,
        |         CAST(sr AS DOUBLE) / CAST(m AS DOUBLE) / 1e9 AS mu,
        |         CASE WHEN m >= 2 THEN CAST(m * qr - sr * sr AS DOUBLE)
        |           / (CAST(m AS DOUBLE) * CAST(m - 1 AS DOUBLE)) / 1e18
        |         END AS varr
        |       FROM p),
        |p3 AS (SELECT cohort, mu,
        |         CASE WHEN varr > 0 THEN mu * (1.0 - mu) / varr - 1.0 END AS c
        |       FROM p2),
        |p4 AS (SELECT cohort, CASE WHEN c > 0 THEN mu * c END AS alpha,
        |         CASE WHEN c > 0 THEN (1.0 - mu) * c END AS beta
        |       FROM p3)
        |SELECT b.cohort, entity, x, n, rate_e9,
        |  CAST(floor(alpha * 1000000 + 0.5) AS BIGINT) AS alpha_e6,
        |  CAST(floor(beta * 1000000 + 0.5) AS BIGINT) AS beta_e6,
        |  CASE WHEN alpha IS NOT NULL THEN
        |    CAST(floor((CAST(x AS DOUBLE) + alpha)
        |      / (CAST(n AS DOUBLE) + alpha + beta)
        |      * 1000000 + 0.5) AS BIGINT) END AS shrunk_e6
        |FROM b JOIN p4 ON p4.cohort = b.cohort
        |ORDER BY b.cohort, entity""".stripMargin),

    // the same three band items (q295's tokenCount replay), HUGEINT
    // item/total variance numerators, the IDENTICAL k/(k-1) alpha tree
    "q311_x_cronbach" ->
      ("""WITH b AS (
        |  SELECT source,
        |         n_chars // 100 AS i1,
        |         (CASE WHEN length(trim(text)) = 0 THEN 0
        |            ELSE len(regexp_split_to_array(trim(text), '\s+')) END)
        |           // 10 AS i2,
        |         length(trim(text)) // 100 AS i3
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND text IS NOT NULL
        |    AND source IS NOT NULL),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(i1 AS HUGEINT)) AS s0,
        |        sum(CAST(i1 AS HUGEINT) * i1) AS q0,
        |        sum(CAST(i2 AS HUGEINT)) AS s1,
        |        sum(CAST(i2 AS HUGEINT) * i2) AS q1,
        |        sum(CAST(i3 AS HUGEINT)) AS s2,
        |        sum(CAST(i3 AS HUGEINT) * i3) AS q2,
        |        sum(CAST(i1 + i2 + i3 AS HUGEINT)) AS st,
        |        sum(CAST(i1 + i2 + i3 AS HUGEINT) * (i1 + i2 + i3)) AS qt
        |      FROM b GROUP BY 1)
        |SELECT source, n, CAST(3 AS BIGINT) AS k_items,
        |  CASE WHEN n >= 2 AND CAST(n * qt - st * st AS DOUBLE) > 0 THEN
        |    CAST(floor(CAST(3 AS DOUBLE) / CAST(2 AS DOUBLE)
        |      * (1.0 - (CAST(n * q0 - s0 * s0 AS DOUBLE)
        |                + CAST(n * q1 - s1 * s1 AS DOUBLE)
        |                + CAST(n * q2 - s2 * s2 AS DOUBLE))
        |               / CAST(n * qt - st * st AS DOUBLE))
        |      * 1000000 + 0.5) AS BIGINT)
        |  END AS alpha_e6
        |FROM s ORDER BY source""".stripMargin),

    // the same OLS windows and per-row residual tree (centi-unit
    // quantized), then q212's ADF det/varb1 chain PER KEY against the
    // EG -3.34 critical; beta off the same b column
    "q310_x_engle_granger" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority AS k,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(count(*) AS BIGINT) AS x,
        |         CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2),
        |w AS (SELECT k, month, x, y,
        |        CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
        |        sum(CAST(x AS HUGEINT)) OVER (PARTITION BY k) AS sx,
        |        sum(CAST(y AS HUGEINT)) OVER (PARTITION BY k) AS sy,
        |        sum(CAST(x AS HUGEINT) * x) OVER (PARTITION BY k) AS sxx,
        |        sum(CAST(x AS HUGEINT) * y) OVER (PARTITION BY k) AS sxy
        |      FROM m),
        |bb AS (SELECT *, CAST(n AS HUGEINT) * sxx - sx * sx AS dd FROM w),
        |r0 AS (SELECT k, month, x, y,
        |         CASE WHEN dd <> 0 THEN
        |           CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
        |             / CAST(dd AS DOUBLE) END AS b,
        |         CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd,
        |         CAST(n AS DOUBLE) AS nd
        |       FROM bb),
        |r1 AS (SELECT k, month, b, (syd - b * sxd) / nd AS a, x, y FROM r0),
        |rq AS (SELECT k, month, b,
        |         CAST(floor((CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE))
        |           * 100 + 0.5) AS BIGINT) AS rv
        |       FROM r1 WHERE b IS NOT NULL),
        |beta AS (SELECT k, floor(max(b) * 1000000 + 0.5) / 1000000 AS beta
        |         FROM rq GROUP BY 1),
        |o AS (SELECT k, month, rv,
        |        lag(rv) OVER (PARTITION BY k ORDER BY month) AS ylag
        |      FROM rq),
        |g AS (SELECT k, CAST(ylag AS HUGEINT) AS xx,
        |        CAST(lag(rv - ylag) OVER (PARTITION BY k ORDER BY month)
        |             AS HUGEINT) AS zz,
        |        CAST(rv - ylag AS HUGEINT) AS yv
        |      FROM o),
        |h AS (SELECT * FROM g WHERE zz IS NOT NULL),
        |s AS (SELECT k, count(*) AS n, CAST(count(*) AS DOUBLE) AS nn,
        |        CAST(sum(xx) AS DOUBLE) AS sx, CAST(sum(zz) AS DOUBLE) AS sz,
        |        CAST(sum(yv) AS DOUBLE) AS sy,
        |        CAST(sum(xx*xx) AS DOUBLE) AS sxx,
        |        CAST(sum(zz*zz) AS DOUBLE) AS szz,
        |        CAST(sum(xx*zz) AS DOUBLE) AS sxz,
        |        CAST(sum(xx*yv) AS DOUBLE) AS sxy,
        |        CAST(sum(zz*yv) AS DOUBLE) AS szy,
        |        CAST(sum(yv*yv) AS DOUBLE) AS syy
        |      FROM h GROUP BY 1),
        |c AS (SELECT k, n, nn, sxy,
        |        nn*(sxx*szz - sxz*sxz) - sx*(sx*szz - sxz*sz)
        |          + sz*(sx*sxz - sxx*sz) AS det,
        |        sy*(sxx*szz - sxz*sxz) - sx*(sxy*szz - sxz*szy)
        |          + sz*(sxy*sxz - sxx*szy) AS detb0,
        |        nn*(sxy*szz - sxz*szy) - sy*(sx*szz - sxz*sz)
        |          + sz*(sx*szy - sxy*sz) AS detb1,
        |        nn*(sxx*szy - sxy*sxz) - sx*(sx*szy - sxy*sz)
        |          + sy*(sx*sxz - sxx*sz) AS detb2,
        |        sy, szy, syy, sz, szz
        |      FROM s),
        |r AS (SELECT k, n, det, detb1,
        |        (syy - (detb0*sy + detb1*sxy + detb2*szy) / det) / (nn - 3.0)
        |          * (nn*szz - sz*sz) / det AS varb1
        |      FROM c),
        |t AS (SELECT k, n,
        |        CASE WHEN det <> 0 THEN
        |          floor((detb1/det) * 10000 + 0.5) / 10000 END AS coef,
        |        CASE WHEN det <> 0 AND n > 3 THEN
        |          floor(((detb1/det) / sqrt(varb1)) * 10000 + 0.5) / 10000
        |        END AS adf_t
        |      FROM r)
        |SELECT t.k AS o_orderpriority, n AS n_obs, coef, adf_t,
        |  -3.34 AS crit5, adf_t < -3.34 AS cointegrated, beta.beta
        |FROM t JOIN beta ON beta.k = t.k
        |ORDER BY o_orderpriority""".stripMargin),

    // the same quantized columns, HUGEINT sums, the IDENTICAL pairwise
    // r trees composed into the partial/t trees, verdict on rounded |t|
    "q309_x_partial_corr" ->
      ("""WITH b AS (
        |  SELECT l_returnflag AS k,
        |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
        |         CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y,
        |         CAST(floor(l_discount * 1000 + 0.5) AS BIGINT) AS z
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
        |s AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |        sum(CAST(z AS HUGEINT)) AS sz,
        |        sum(CAST(x AS HUGEINT) * x) AS sxx,
        |        sum(CAST(y AS HUGEINT) * y) AS syy,
        |        sum(CAST(z AS HUGEINT) * z) AS szz,
        |        sum(CAST(x AS HUGEINT) * y) AS sxy,
        |        sum(CAST(x AS HUGEINT) * z) AS sxz,
        |        sum(CAST(y AS HUGEINT) * z) AS syz
        |      FROM b GROUP BY 1),
        |rr AS (SELECT k, n,
        |        CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE)
        |              * CAST(n * syy - sy * sy AS DOUBLE) > 0 THEN
        |          CAST(n * sxy - sx * sy AS DOUBLE)
        |            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |                   * CAST(n * syy - sy * sy AS DOUBLE)) END AS rxy,
        |        CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE)
        |              * CAST(n * szz - sz * sz AS DOUBLE) > 0 THEN
        |          CAST(n * sxz - sx * sz AS DOUBLE)
        |            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |                   * CAST(n * szz - sz * sz AS DOUBLE)) END AS rxz,
        |        CASE WHEN CAST(n * syy - sy * sy AS DOUBLE)
        |              * CAST(n * szz - sz * sz AS DOUBLE) > 0 THEN
        |          CAST(n * syz - sy * sz AS DOUBLE)
        |            / sqrt(CAST(n * syy - sy * sy AS DOUBLE)
        |                   * CAST(n * szz - sz * sz AS DOUBLE)) END AS ryz
        |      FROM s),
        |pp AS (SELECT *, (1.0 - rxz * rxz) * (1.0 - ryz * ryz) AS den
        |       FROM rr),
        |pq AS (SELECT *, CASE WHEN den > 0 THEN
        |         (rxy - rxz * ryz) / sqrt(den) END AS pr FROM pp),
        |pt AS (SELECT *, CASE WHEN n > 3 AND 1.0 - pr * pr > 0 THEN
        |         pr * sqrt(CAST(n - 3 AS DOUBLE) / (1.0 - pr * pr)) END AS t
        |       FROM pq),
        |pe AS (SELECT k, n, rxy, rxz, ryz, pr,
        |         CAST(floor(t * 10000 + 0.5) AS BIGINT) AS t_e4
        |       FROM pt)
        |SELECT k AS l_returnflag, n AS n_obs,
        |  CAST(floor(rxy * 1000000 + 0.5) AS BIGINT) AS r_xy_e6,
        |  CAST(floor(rxz * 1000000 + 0.5) AS BIGINT) AS r_xz_e6,
        |  CAST(floor(ryz * 1000000 + 0.5) AS BIGINT) AS r_yz_e6,
        |  CAST(floor(pr * 1000000 + 0.5) AS BIGINT) AS partial_e6,
        |  t_e4,
        |  CASE WHEN t_e4 IS NOT NULL THEN abs(t_e4) > 19600 END AS significant
        |FROM pe ORDER BY l_returnflag""".stripMargin),

    // the same integer median fence (cum >= (n+1)//2), the q297
    // observed-cells identity over the (mode, side) contingency, the
    // same inlined critical CASE
    "q308_x_mood_median" -> {
      val crit = graft.operators.Metrics.chi2Crit95Sql("dof")
      s"""WITH vals AS (
        |  SELECT l_returnflag AS k, l_linestatus AS g,
        |         CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS v
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |    AND l_extendedprice IS NOT NULL),
        |vg AS (SELECT k, v, CAST(count(*) AS BIGINT) AS c
        |       FROM vals GROUP BY 1, 2),
        |mw AS (SELECT k, v,
        |         CAST(sum(c) OVER (PARTITION BY k ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum,
        |         CAST(sum(c) OVER (PARTITION BY k) AS BIGINT) AS n
        |       FROM vg),
        |med AS (SELECT k, min(v) AS grand_median FROM mw
        |        WHERE cum >= (n + 1) // 2 GROUP BY 1),
        |cells AS (SELECT vals.k, vals.g AS a,
        |            (vals.v > med.grand_median) AS b,
        |            CAST(count(*) AS BIGINT) AS c
        |          FROM vals JOIN med ON med.k = vals.k GROUP BY 1, 2, 3),
        |rm AS (SELECT k, a, CAST(sum(c) AS BIGINT) AS r FROM cells GROUP BY 1, 2),
        |cm AS (SELECT k, b, CAST(sum(c) AS BIGINT) AS cc FROM cells GROUP BY 1, 2),
        |tot AS (SELECT k, CAST(count(*) AS BIGINT) AS r_levels,
        |          CAST(sum(r) AS BIGINT) AS n FROM rm GROUP BY 1),
        |tc AS (SELECT k, CAST(count(*) AS BIGINT) AS c_levels FROM cm GROUP BY 1),
        |terms AS (
        |  SELECT ce.k, CAST(floor(
        |      CAST(CAST(ce.c AS HUGEINT) * ce.c * t.n AS DOUBLE)
        |      / CAST(CAST(rm.r AS HUGEINT) * cm.cc AS DOUBLE)
        |      * 1000000 + 0.5) AS BIGINT) AS tt
        |  FROM cells ce
        |  JOIN rm ON rm.k = ce.k AND rm.a = ce.a
        |  JOIN cm ON cm.k = ce.k AND cm.b = ce.b
        |  JOIN tot t ON t.k = ce.k),
        |chi AS (SELECT k, CAST(sum(tt) AS BIGINT) AS s FROM terms GROUP BY 1),
        |r AS (SELECT tot.k, tot.r_levels, tot.n, tc.c_levels,
        |        (tot.r_levels - 1) * (tc.c_levels - 1) AS dof,
        |        greatest(0, chi.s - tot.n * 1000000) AS chi
        |      FROM tot JOIN tc ON tc.k = tot.k JOIN chi ON chi.k = tot.k)
        |SELECT r.k AS l_returnflag, r_levels, n, c_levels, dof,
        |  CASE WHEN dof > 0 THEN chi END AS chi2_e6,
        |  CAST(($crit) AS BIGINT) AS crit5_e4,
        |  CASE WHEN dof > 0 AND ($crit) IS NOT NULL
        |    THEN chi > CAST(($crit) AS BIGINT) * 100 END AS significant,
        |  med.grand_median
        |FROM r JOIN med ON med.k = r.k ORDER BY l_returnflag""".stripMargin
    },

    // the same monthly frame, the range self-join at |lag| <= 6,
    // HUGEINT sums per (key, lag), the IDENTICAL r tree
    "q307_x_cross_correlation" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority AS k,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(count(*) AS BIGINT) AS x,
        |         CAST(sum(round(o_totalprice * 100)) AS BIGINT)
        |           // count(*) AS y
        |  FROM orders GROUP BY 1, 2),
        |o AS (SELECT k, x, y,
        |        CAST(row_number() OVER (PARTITION BY k ORDER BY month)
        |             AS BIGINT) AS t
        |      FROM m),
        |p AS (SELECT a.k, b.t - a.t AS lag, a.x, b.y
        |      FROM o a JOIN o b
        |        ON a.k = b.k AND b.t >= a.t - 6 AND b.t <= a.t + 6),
        |s AS (SELECT k, lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |        sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |        sum(CAST(x AS HUGEINT) * x) AS sxx,
        |        sum(CAST(y AS HUGEINT) * y) AS syy,
        |        sum(CAST(x AS HUGEINT) * y) AS sxy
        |      FROM p GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT k AS o_orderpriority, lag, n_pairs,
        |  CASE WHEN (n_pairs * sxx - sx * sx) > 0
        |        AND (n_pairs * syy - sy * sy) > 0 THEN
        |    CAST(floor(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
        |             * CAST(n_pairs * syy - sy * sy AS DOUBLE))
        |      * 1000000 + 0.5) AS BIGINT) END AS r_e6
        |FROM s ORDER BY o_orderpriority, lag""".stripMargin),

    // the same monthly (count, integer-mean) frame as q300, HUGEINT
    // sufficient sums, the IDENTICAL Cramer cofactor expansions and
    // RSS/F double trees spelled in the same written order
    "q306_x_granger" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority AS k,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(count(*) AS BIGINT) AS x,
        |         CAST(sum(round(o_totalprice * 100)) AS BIGINT)
        |           // count(*) AS yv
        |  FROM orders GROUP BY 1, 2),
        |l AS (SELECT k, yv AS y,
        |        lag(yv) OVER (PARTITION BY k ORDER BY month) AS z,
        |        lag(x) OVER (PARTITION BY k ORDER BY month) AS xl
        |      FROM m),
        |ff AS (SELECT * FROM l WHERE z IS NOT NULL AND xl IS NOT NULL),
        |s AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
        |        sum(CAST(z AS HUGEINT)) AS sz_, sum(CAST(xl AS HUGEINT)) AS sx_,
        |        sum(CAST(y AS HUGEINT)) AS sy_,
        |        sum(CAST(z AS HUGEINT) * z) AS szz_,
        |        sum(CAST(xl AS HUGEINT) * xl) AS sxx_,
        |        sum(CAST(z AS HUGEINT) * xl) AS szx_,
        |        sum(CAST(z AS HUGEINT) * y) AS szy_,
        |        sum(CAST(xl AS HUGEINT) * y) AS sxy_,
        |        sum(CAST(y AS HUGEINT) * y) AS syy_
        |      FROM ff GROUP BY 1),
        |dd AS (SELECT k, n, CAST(n AS DOUBLE) AS nn,
        |         CAST(sz_ AS DOUBLE) AS sz, CAST(sx_ AS DOUBLE) AS sx,
        |         CAST(sy_ AS DOUBLE) AS sy, CAST(szz_ AS DOUBLE) AS szz,
        |         CAST(sxx_ AS DOUBLE) AS sxx, CAST(szx_ AS DOUBLE) AS szx,
        |         CAST(szy_ AS DOUBLE) AS szy, CAST(sxy_ AS DOUBLE) AS sxy,
        |         CAST(syy_ AS DOUBLE) AS syy
        |       FROM s),
        |e AS (SELECT k, n, nn, syy, szy, sxy, sy,
        |        nn * szz - sz * sz AS det2,
        |        syy - ((sy * szz - szy * sz) * sy
        |               + (nn * szy - sz * sy) * szy)
        |              / (nn * szz - sz * sz) AS rssr,
        |        nn * (szz * sxx - szx * szx) - sz * (sz * sxx - szx * sx)
        |          + sx * (sz * szx - szz * sx) AS det,
        |        sy * (szz * sxx - szx * szx) - sz * (szy * sxx - szx * sxy)
        |          + sx * (szy * szx - szz * sxy) AS b0,
        |        nn * (szy * sxx - szx * sxy) - sy * (sz * sxx - szx * sx)
        |          + sx * (sz * sxy - szy * sx) AS b1,
        |        nn * (szz * sxy - szy * szx) - sz * (sz * sxy - szy * sx)
        |          + sy * (sz * szx - szz * sx) AS b2
        |      FROM dd),
        |g AS (SELECT k, n, nn, det2, det, b2, rssr,
        |        syy - (b0 * sy + b1 * szy + b2 * sxy) / det AS rssu
        |      FROM e),
        |r AS (SELECT k, n AS n_obs,
        |        CASE WHEN n > 3 AND det2 <> 0 AND det <> 0 AND rssu > 0
        |          THEN floor(b2 / det * 1000000 + 0.5) / 1000000
        |        END AS xlag_coef,
        |        CASE WHEN n > 3 AND det2 <> 0 AND det <> 0 AND rssu > 0
        |          THEN greatest(0, CAST(floor((rssr - rssu)
        |            / (rssu / (nn - 3.0)) * 10000 + 0.5) AS BIGINT))
        |        END AS f_e4
        |      FROM g)
        |SELECT k AS o_orderpriority, n_obs, xlag_coef, f_e4,
        |  CAST(38415 AS BIGINT) AS crit5_e4,
        |  CASE WHEN f_e4 IS NOT NULL THEN f_e4 > 38415 END AS significant
        |FROM r ORDER BY o_orderpriority""".stripMargin),

    // the same daily integer-mean grid, V_t = sum sgn(x_t - x_j) via
    // self-join, running-sum U walk, the IDENTICAL clamped p tree and
    // first-argmax tie-break
    "q305_x_pettitt" ->
      ("""WITH m AS (
        |  SELECT event_type AS k, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |           // count(*) AS y
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |o AS (SELECT k, y,
        |        CAST(row_number() OVER (PARTITION BY k ORDER BY day)
        |             AS BIGINT) AS t,
        |        CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n
        |      FROM m),
        |v AS (SELECT a.k, a.t, a.n,
        |        CAST(sum(CASE WHEN a.y > b.y THEN 1
        |              WHEN a.y < b.y THEN -1 ELSE 0 END) AS BIGINT) AS vt
        |      FROM o a JOIN o b ON a.k = b.k GROUP BY a.k, a.t, a.n),
        |u AS (SELECT k, t, n,
        |        CAST(sum(vt) OVER (PARTITION BY k ORDER BY t
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS ut
        |      FROM v),
        |kk AS (SELECT k, CAST(max(n) AS INT) AS n_obs, max(n) AS n,
        |         max(abs(ut)) AS kstat
        |       FROM u WHERE t < n GROUP BY k HAVING max(n) >= 3),
        |tc AS (SELECT u.k, CAST(min(u.t) AS INT) AS t_change
        |       FROM u JOIN kk ON kk.k = u.k AND abs(u.ut) = kk.kstat
        |         AND u.t < u.n
        |       GROUP BY u.k),
        |r AS (SELECT kk.k, n_obs, kstat AS k_stat, t_change,
        |        CAST(floor(least(1.0, 2.0 * exp(-6.0
        |            * (CAST(kstat AS DOUBLE) * CAST(kstat AS DOUBLE))
        |            / CAST(n*n*n + n*n AS DOUBLE)))
        |          * 1000000000 + 0.5) AS BIGINT) AS p_e9
        |      FROM kk JOIN tc ON tc.k = kk.k)
        |SELECT k AS key, n_obs, k_stat, t_change, p_e9,
        |  p_e9 < 50000000 AS significant
        |FROM r ORDER BY key""".stripMargin),

    // the same three-annotator melt (q295's tokenCount replay, the
    // every-third-doc missing rater), per-item HUGEINT coincidence
    // terms e9-quantized, the IDENTICAL (n-1)-corrected alpha tree
    "q304_x_krippendorff" ->
      ("""WITH d0 AS (
        |  SELECT source, doc_id, n_chars, text FROM documents
        |  WHERE n_chars IS NOT NULL AND source IS NOT NULL
        |    AND doc_id IS NOT NULL),
        |r AS (
        |  SELECT source, doc_id,
        |    CASE WHEN n_chars > 500 THEN 'long' ELSE 'short' END AS lab
        |  FROM d0
        |  UNION ALL
        |  SELECT source, doc_id,
        |    CASE WHEN (CASE WHEN length(trim(text)) = 0 THEN 0
        |          ELSE len(regexp_split_to_array(trim(text), '\s+')) END) > 90
        |      THEN 'long' ELSE 'short' END
        |  FROM d0 WHERE text IS NOT NULL
        |  UNION ALL
        |  SELECT source, doc_id,
        |    CASE WHEN n_chars > 480 THEN 'long' ELSE 'short' END
        |  FROM d0 WHERE doc_id % 3 = 0),
        |cells AS (SELECT source AS g, doc_id AS it, lab,
        |            CAST(count(*) AS BIGINT) AS c
        |          FROM r GROUP BY 1, 2, 3),
        |items AS (SELECT g, it, CAST(sum(c) AS BIGINT) AS mi,
        |            sum(CAST(c AS HUGEINT) * c) AS sq
        |          FROM cells GROUP BY 1, 2 HAVING sum(c) >= 2),
        |di AS (SELECT g, it, mi,
        |         CAST(floor(CAST(CAST(mi AS HUGEINT) * mi - sq AS DOUBLE)
        |           / CAST(mi - 1 AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)
        |           AS di
        |       FROM items),
        |tot AS (SELECT g, CAST(count(*) AS BIGINT) AS n_items,
        |          CAST(sum(mi) AS BIGINT) AS n_ratings,
        |          sum(CAST(di AS HUGEINT)) AS do_
        |        FROM di GROUP BY 1),
        |marg AS (SELECT g, sum(CAST(nc AS HUGEINT) * nc) AS sc FROM
        |           (SELECT cells.g, cells.lab, CAST(sum(cells.c) AS BIGINT)
        |              AS nc
        |            FROM cells JOIN items
        |              ON items.g = cells.g AND items.it = cells.it
        |            GROUP BY 1, 2) c2 GROUP BY 1)
        |SELECT tot.g AS source, n_items, n_ratings,
        |  CAST(do_ AS BIGINT) AS d_o_e9,
        |  CASE WHEN CAST(n_ratings AS HUGEINT) * n_ratings - sc > 0 THEN
        |    CAST(floor((1.0 - CAST(n_ratings - 1 AS DOUBLE)
        |        * CAST(do_ AS DOUBLE) / 1000000000.0
        |        / CAST(CAST(n_ratings AS HUGEINT) * n_ratings - sc
        |               AS DOUBLE))
        |      * 1000000 + 0.5) AS BIGINT) END AS alpha_e6
        |FROM tot JOIN marg ON marg.g = tot.g ORDER BY source""".stripMargin),

    // the same thinned candidates and rel CASE, the IDENTICAL inlined
    // e12 discount CASE in both engines (ndcgDiscountSql — one
    // generator), exact integer DCG/IDCG sums, the same mrr tree
    "q303_x_ndcg_mrr" -> {
      val disc = graft.text.Retrieval.ndcgDiscountSql("r", 10)
      val discI = graft.text.Retrieval.ndcgDiscountSql("ri", 10)
      s"""WITH c AS (
        |  SELECT source, doc_id, n_chars AS s,
        |         CASE WHEN lang = 'en' THEN 2
        |              WHEN lang IN ('de', 'fr') THEN 1 ELSE 0 END AS rel
        |  FROM documents
        |  WHERE doc_id % 37 = 0 AND n_chars IS NOT NULL
        |    AND source IS NOT NULL AND doc_id IS NOT NULL),
        |w AS (SELECT source, rel,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY s DESC, doc_id ASC) AS r,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY rel DESC, doc_id ASC) AS ri
        |      FROM c),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(rel * ($disc)) AS BIGINT) AS dcg_num_e12,
        |        CAST(sum(rel * ($discI)) AS BIGINT) AS idcg_num_e12,
        |        min(CASE WHEN r <= 10 AND rel > 0 THEN CAST(r AS BIGINT) END)
        |          AS first_rel_rank
        |      FROM w GROUP BY 1)
        |SELECT source, n_docs, dcg_num_e12, idcg_num_e12,
        |  CASE WHEN idcg_num_e12 > 0 THEN
        |    CAST(floor(CAST(dcg_num_e12 AS DOUBLE)
        |      / CAST(idcg_num_e12 AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
        |  END AS ndcg_e6,
        |  first_rel_rank,
        |  CASE WHEN first_rel_rank IS NOT NULL THEN
        |    CAST(floor(1000000.0 / CAST(first_rel_rank AS DOUBLE) + 0.5)
        |         AS BIGINT)
        |  ELSE CAST(0 AS BIGINT) END AS mrr_e6
        |FROM a ORDER BY source""".stripMargin
    },

    // the same value grid and A/B derivation as q281, the IDENTICAL
    // cross-multiplied |cumA*nb - cumB*na|*dv EMD integral and per-cell
    // e9 Bhattacharyya terms, clamp-before-sqrt Hellinger
    "q301_x_hist_drift" ->
      ("""WITH e AS (
        |  SELECT event_type AS k,
        |         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS g,
        |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |grid AS (SELECT k, v,
        |           CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |             AS ca,
        |           CAST(sum(CASE WHEN g = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |             AS cb
        |         FROM e GROUP BY 1, 2),
        |w AS (SELECT *,
        |        CAST(sum(ca) OVER (PARTITION BY k ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cuma,
        |        CAST(sum(cb) OVER (PARTITION BY k ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS cumb,
        |        CAST(sum(ca) OVER (PARTITION BY k) AS BIGINT) AS na,
        |        CAST(sum(cb) OVER (PARTITION BY k) AS BIGINT) AS nb,
        |        coalesce(lead(v) OVER (PARTITION BY k ORDER BY v) - v, 0)
        |          AS dv
        |      FROM grid),
        |t AS (SELECT k, na, nb,
        |        abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na)
        |          * dv AS emdt,
        |        CASE WHEN na > 0 AND nb > 0 THEN
        |          CAST(floor(sqrt(CAST(ca AS DOUBLE) * cb
        |              / (CAST(na AS DOUBLE) * nb))
        |            * 1000000000 + 0.5) AS BIGINT)
        |        ELSE CAST(0 AS BIGINT) END AS bct
        |      FROM w),
        |a AS (SELECT k, max(na) AS n_a, max(nb) AS n_b,
        |        sum(emdt) AS emd, CAST(sum(bct) AS BIGINT) AS bc
        |      FROM t GROUP BY 1)
        |SELECT k AS event_type, n_a, n_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST(floor(CAST(emd AS DOUBLE)
        |      / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |      * 1000000 + 0.5) AS BIGINT) END AS emd_e6,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN bc END AS bc_e9,
        |  CASE WHEN n_a > 0 AND n_b > 0 THEN
        |    CAST(floor(sqrt(CAST(greatest(0, 1000000000 - bc) AS DOUBLE)
        |        / 1000000000.0)
        |      * 1000000 + 0.5) AS BIGINT) END AS hellinger_e6
        |FROM a ORDER BY event_type""".stripMargin),

    // the same monthly (count, integer-mean) grid, the pair self-join
    // sign products, the IDENTICAL tie sums and tau/z double trees
    "q300_x_kendall_tau" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority AS k,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(count(*) AS BIGINT) AS x,
        |         CAST(sum(round(o_totalprice * 100)) AS BIGINT)
        |           // count(*) AS y
        |  FROM orders GROUP BY 1, 2),
        |p AS (SELECT a.k,
        |        (CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
        |        * (CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END)
        |          AS sg
        |      FROM m a JOIN m b ON a.k = b.k AND b.month > a.month),
        |s AS (SELECT k, CAST(coalesce(sum(sg), 0) AS BIGINT) AS s
        |      FROM p GROUP BY k),
        |n AS (SELECT k, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY k),
        |tx AS (SELECT k, CAST(sum(c*(c-1)) AS BIGINT) AS x2,
        |         CAST(sum(c*(c-1)*(2*c+5)) AS BIGINT) AS x25,
        |         CAST(sum(c*(c-1)*(c-2)) AS BIGINT) AS x3
        |       FROM (SELECT k, x, CAST(count(*) AS BIGINT) AS c FROM m
        |             GROUP BY k, x HAVING count(*) > 1) GROUP BY k),
        |ty AS (SELECT k, CAST(sum(c*(c-1)) AS BIGINT) AS y2,
        |         CAST(sum(c*(c-1)*(2*c+5)) AS BIGINT) AS y25,
        |         CAST(sum(c*(c-1)*(c-2)) AS BIGINT) AS y3
        |       FROM (SELECT k, y, CAST(count(*) AS BIGINT) AS c FROM m
        |             GROUP BY k, y HAVING count(*) > 1) GROUP BY k),
        |v AS (SELECT n.k, n.n, s.s,
        |        coalesce(tx.x2, 0) AS x2, coalesce(tx.x25, 0) AS x25,
        |        coalesce(tx.x3, 0) AS x3, coalesce(ty.y2, 0) AS y2,
        |        coalesce(ty.y25, 0) AS y25, coalesce(ty.y3, 0) AS y3
        |      FROM n JOIN s ON n.k = s.k
        |      LEFT JOIN tx ON n.k = tx.k LEFT JOIN ty ON n.k = ty.k
        |      WHERE n.n >= 3),
        |d AS (SELECT *, n*(n-1)//2 - x2//2 AS dx, n*(n-1)//2 - y2//2 AS dy
        |      FROM v),
        |r AS (SELECT k, CAST(n AS INT) AS n_obs, s AS s_stat,
        |        CASE WHEN dx > 0 AND dy > 0 THEN
        |          CAST(floor(CAST(s AS DOUBLE)
        |            / sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE))
        |            * 1000000 + 0.5) AS BIGINT) END AS tau_b_e6,
        |        CASE WHEN dx > 0 AND dy > 0 THEN
        |          CAST(n*(n-1)*(2*n+5) - x25 - y25 AS DOUBLE) / 18.0
        |          + CAST(x3 AS DOUBLE) * CAST(y3 AS DOUBLE)
        |            / (9.0 * n * (n-1) * (n-2))
        |          + CAST(x2 AS DOUBLE) * CAST(y2 AS DOUBLE)
        |            / (2.0 * n * (n-1)) END AS var
        |      FROM d),
        |r2 AS (SELECT k, n_obs, s_stat, tau_b_e6,
        |         CASE WHEN var > 0 THEN
        |           CAST(floor(CAST(s_stat AS DOUBLE) / sqrt(var)
        |             * 10000 + 0.5) AS BIGINT) END AS z_e4
        |       FROM r)
        |SELECT k AS key, n_obs, s_stat, tau_b_e6, z_e4,
        |  CASE WHEN z_e4 IS NOT NULL THEN abs(z_e4) > 19600 END AS significant
        |FROM r2 ORDER BY key""".stripMargin),

    // the same monthly integer-mean series, the IDENTICAL scaled
    // residual E = n*D*y - D*Sy - n*N*u over HUGEINT windows, the same
    // one-division dw tree and rounded-band verdict
    "q299_x_durbin_watson" ->
      ("""WITH m AS (
        |  SELECT o_orderpriority AS k,
        |         date_trunc('month', o_orderdate) AS month,
        |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           // count(*) AS y
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderdate IS NOT NULL
        |  GROUP BY 1, 2),
        |w AS (SELECT k, month, CAST(y AS BIGINT) AS y,
        |        CAST(row_number() OVER (PARTITION BY k ORDER BY month)
        |             AS BIGINT) AS t,
        |        CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
        |        CAST(sum(y) OVER (PARTITION BY k) AS BIGINT) AS sy
        |      FROM m),
        |u AS (SELECT *, 2 * t - n - 1 AS uu FROM w),
        |s AS (SELECT k, month, y, uu, n, sy,
        |        sum(CAST(uu AS HUGEINT) * y) OVER (PARTITION BY k) AS nn,
        |        sum(CAST(uu AS HUGEINT) * uu) OVER (PARTITION BY k) AS dd
        |      FROM u),
        |e AS (SELECT k, month, n,
        |        CAST(n AS HUGEINT) * dd * y - dd * CAST(sy AS HUGEINT)
        |          - CAST(n AS HUGEINT) * nn * uu AS ee
        |      FROM s),
        |l AS (SELECT k, n, ee,
        |        lag(ee) OVER (PARTITION BY k ORDER BY month) AS pe FROM e),
        |a AS (SELECT k, CAST(max(n) AS BIGINT) AS n_obs,
        |        sum(ee * ee) AS see,
        |        sum(CASE WHEN pe IS NOT NULL THEN (ee - pe) * (ee - pe)
        |              ELSE CAST(0 AS HUGEINT) END) AS sdd
        |      FROM l GROUP BY 1 HAVING max(n) >= 3),
        |r AS (SELECT k, n_obs,
        |        CASE WHEN see > 0 THEN
        |          CAST(floor(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)
        |            * 1000000 + 0.5) AS BIGINT) END AS dw_e6
        |      FROM a)
        |SELECT k AS o_orderpriority, n_obs, dw_e6,
        |  CASE WHEN dw_e6 IS NOT NULL THEN
        |    CASE WHEN dw_e6 < 1500000 THEN 'positive'
        |         WHEN dw_e6 > 2500000 THEN 'negative'
        |         ELSE 'none' END END AS autocorr
        |FROM r ORDER BY o_orderpriority""".stripMargin),

    // the same least-capped band, the IDENTICAL observed-cells-only
    // identity sum(O^2*N/(R*C)) - N over HUGEINT integers (zero cells
    // fold into the -N), the same inlined chi2Crit95 CASE — one
    // definition, two engines
    "q297_x_chi_square" -> {
      val crit = graft.operators.Metrics.chi2Crit95Sql("dof")
      s"""WITH base AS (
        |  SELECT source AS k, lang AS a, least(n_chars // 400, 4) AS b
        |  FROM documents
        |  WHERE source IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL),
        |cells AS (SELECT k, a, b, CAST(count(*) AS BIGINT) AS c
        |          FROM base GROUP BY 1, 2, 3),
        |rm AS (SELECT k, a, CAST(sum(c) AS BIGINT) AS r FROM cells GROUP BY 1, 2),
        |cm AS (SELECT k, b, CAST(sum(c) AS BIGINT) AS cc FROM cells GROUP BY 1, 2),
        |tot AS (SELECT k, CAST(count(*) AS BIGINT) AS r_levels,
        |          CAST(sum(r) AS BIGINT) AS n FROM rm GROUP BY 1),
        |tc AS (SELECT k, CAST(count(*) AS BIGINT) AS c_levels FROM cm GROUP BY 1),
        |terms AS (
        |  SELECT ce.k, CAST(floor(
        |      CAST(CAST(ce.c AS HUGEINT) * ce.c * t.n AS DOUBLE)
        |      / CAST(CAST(rm.r AS HUGEINT) * cm.cc AS DOUBLE)
        |      * 1000000 + 0.5) AS BIGINT) AS tt
        |  FROM cells ce
        |  JOIN rm ON rm.k = ce.k AND rm.a = ce.a
        |  JOIN cm ON cm.k = ce.k AND cm.b = ce.b
        |  JOIN tot t ON t.k = ce.k),
        |chi AS (SELECT k, CAST(sum(tt) AS BIGINT) AS s FROM terms GROUP BY 1),
        |r AS (SELECT tot.k, tot.r_levels, tot.n, tc.c_levels,
        |        (tot.r_levels - 1) * (tc.c_levels - 1) AS dof,
        |        greatest(0, chi.s - tot.n * 1000000) AS chi
        |      FROM tot JOIN tc ON tc.k = tot.k JOIN chi ON chi.k = tot.k)
        |SELECT k AS source, r_levels, n, c_levels, dof,
        |  CASE WHEN dof > 0 THEN chi END AS chi2_e6,
        |  CAST(($crit) AS BIGINT) AS crit5_e4,
        |  CASE WHEN dof > 0 AND ($crit) IS NOT NULL
        |    THEN chi > CAST(($crit) AS BIGINT) * 100 END AS significant
        |FROM r ORDER BY source""".stripMargin
    },

    // the q273 filter derivations + the english flag, HUGEINT
    // sufficient sums, the IDENTICAL k*SumC^2 - T^2 tree
    "q295_x_cochran_q" ->
      ("""WITH d AS (
        |  SELECT source,
        |    n_chars > 500 AS a,
        |    (CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END) > 90
        |      AS b,
        |    (lang = 'en') AS c
        |  FROM documents
        |  WHERE source IS NOT NULL AND text IS NOT NULL
        |    AND n_chars IS NOT NULL AND lang IS NOT NULL),
        |r AS (SELECT *,
        |        CAST(CASE WHEN a THEN 1 ELSE 0 END
        |          + CASE WHEN b THEN 1 ELSE 0 END
        |          + CASE WHEN c THEN 1 ELSE 0 END AS BIGINT) AS rr
        |      FROM d),
        |su AS (SELECT source, CAST(count(*) AS BIGINT) AS n_items,
        |         sum(CAST(rr AS HUGEINT)) AS t,
        |         sum(CAST(rr AS HUGEINT) * rr) AS r2,
        |         CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |         CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |         CAST(sum(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |       FROM r GROUP BY 1)
        |SELECT source, n_items,
        |  CASE WHEN CAST(3 AS HUGEINT) * t - r2 > 0 THEN
        |    CAST(floor(CAST(2 AS DOUBLE)
        |      * CAST(CAST(3 AS HUGEINT)
        |          * (CAST(c0 AS HUGEINT) * c0 + CAST(c1 AS HUGEINT) * c1
        |             + CAST(c2 AS HUGEINT) * c2) - t * t AS DOUBLE)
        |      / CAST(CAST(3 AS HUGEINT) * t - r2 AS DOUBLE)
        |      * 10000 + 0.5) AS BIGINT) END AS q_e4,
        |  CAST(59915 AS BIGINT) AS crit5_e4,
        |  CASE WHEN CAST(3 AS HUGEINT) * t - r2 > 0 THEN
        |    CAST(floor(CAST(2 AS DOUBLE)
        |      * CAST(CAST(3 AS HUGEINT)
        |          * (CAST(c0 AS HUGEINT) * c0 + CAST(c1 AS HUGEINT) * c1
        |             + CAST(c2 AS HUGEINT) * c2) - t * t AS DOUBLE)
        |      / CAST(CAST(3 AS HUGEINT) * t - r2 AS DOUBLE)
        |      * 10000 + 0.5) AS BIGINT) > 59915
        |  END AS significant
        |FROM su ORDER BY source""".stripMargin),

    // per-(type, user) counts, HUGEINT n*Sq - S^2, the IDENTICAL chi2
    // and threshold trees
    "q294_x_dispersion" -> {
      val num = "(CAST(n_units AS HUGEINT) * q - CAST(s AS HUGEINT) * s)"
      val chi2 = s"(CAST($num AS DOUBLE) / CAST(s AS DOUBLE))"
      s"""WITH pu AS (
        |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_units,
        |        CAST(sum(c) AS BIGINT) AS s,
        |        sum(CAST(c AS HUGEINT) * c) AS q
        |      FROM pu GROUP BY 1),
        |r AS (SELECT event_type, n_units, s * 1000000 // n_units AS mean_e6,
        |        CASE WHEN n_units >= 2 AND s > 0 THEN
        |          CAST(floor($chi2 / CAST(n_units - 1 AS DOUBLE) * 10000 + 0.5)
        |               AS BIGINT) END AS d_e4,
        |        CASE WHEN n_units >= 2 AND s > 0 THEN
        |          CAST(floor($chi2 * 10000 + 0.5) AS BIGINT) END AS chi2_e4
        |      FROM a)
        |SELECT event_type, n_units, mean_e6, d_e4, chi2_e4,
        |  CASE WHEN chi2_e4 IS NOT NULL THEN
        |    CAST(chi2_e4 AS DOUBLE) / 10000.0 >
        |      CAST(n_units - 1 AS DOUBLE)
        |        + 1.645 * sqrt(2.0 * CAST(n_units - 1 AS DOUBLE))
        |  END AS overdispersed
        |FROM r ORDER BY event_type""".stripMargin
    },

    // the SAME four e12 constants (sprtConstantsE12 — one definition,
    // two engines), HUGEINT linear LLR, integer crossing argmin
    "q292_x_sprt" -> {
      val (l1, l0, hi, lo) =
        graft.operators.Metrics.sprtConstantsE12(0.5, 0.55, 50, 100)
      s"""WITH e AS (
        |  SELECT event_type AS k, epoch_ns(ts) AS t, event_id,
        |         (value >= 50.0) AS s
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND ts IS NOT NULL),
        |w AS (SELECT k, s,
        |        row_number() OVER (PARTITION BY k ORDER BY t, event_id)
        |          AS rn,
        |        CAST(sum(CASE WHEN s THEN 1 ELSE 0 END)
        |          OVER (PARTITION BY k ORDER BY t, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS a
        |      FROM e),
        |l AS (SELECT *,
        |        CAST(a AS HUGEINT) * ${l1} + CAST(rn - a AS HUGEINT) * ${l0}
        |          AS llr,
        |        CASE WHEN CAST(a AS HUGEINT) * ${l1}
        |               + CAST(rn - a AS HUGEINT) * ${l0} >= ${hi} THEN 1
        |             WHEN CAST(a AS HUGEINT) * ${l1}
        |               + CAST(rn - a AS HUGEINT) * ${l0} <= ${lo} THEN -1
        |             ELSE 0 END AS crs
        |      FROM w),
        |f AS (SELECT *, min(CASE WHEN crs <> 0 THEN rn END)
        |        OVER (PARTITION BY k) AS first_rn,
        |        max(rn) OVER (PARTITION BY k) AS n_all
        |      FROM l)
        |SELECT k AS event_type, CAST(max(rn) AS BIGINT) AS n_total,
        |  CASE max(CASE WHEN rn = first_rn THEN crs END)
        |    WHEN 1 THEN 'accept_h1' WHEN -1 THEN 'accept_h0'
        |    ELSE 'continue' END AS decision,
        |  CAST(max(first_rn) AS BIGINT) AS n_decision,
        |  CAST(max(CASE WHEN rn = n_all THEN llr END) AS BIGINT)
        |    AS llr_final_e12
        |FROM f GROUP BY 1 ORDER BY event_type""".stripMargin
    },

    // the q258 conditional-pivot token grid, the IDENTICAL delta/z
    // trees, quantized (z, token) ordering on both LIMIT cuts
    "q291_x_log_odds_terms" -> {
      val d = """(ln((CAST(c_a AS DOUBLE) + 1.0)
                |   / (CAST(na AS DOUBLE) + CAST(v AS DOUBLE)
                |      - CAST(c_a AS DOUBLE) - 1.0))
                | - ln((CAST(c_b AS DOUBLE) + 1.0)
                |   / (CAST(nb AS DOUBLE) + CAST(v AS DOUBLE)
                |      - CAST(c_b AS DOUBLE) - 1.0)))"""
        .stripMargin.replaceAll("\n", " ")
      val va = "(1.0 / (CAST(c_a AS DOUBLE) + 1.0) + 1.0 / (CAST(c_b AS DOUBLE) + 1.0))"
      s"""WITH doc AS (
        |  SELECT CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS side, text
        |  FROM documents WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |tk AS (SELECT side, unnest(regexp_split_to_array(trim(text), '\\s+'))
        |         AS t
        |       FROM doc),
        |g AS (SELECT t AS token,
        |        CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS c_a,
        |        CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS c_b
        |      FROM tk WHERE t <> '' GROUP BY 1),
        |tt AS (SELECT CAST(sum(c_a) AS BIGINT) AS na,
        |         CAST(sum(c_b) AS BIGINT) AS nb,
        |         CAST(count(*) AS BIGINT) AS v
        |       FROM g),
        |sc AS (SELECT token, c_a, c_b,
        |         CAST(floor($d / sqrt($va) * 1000000 + 0.5) AS BIGINT) AS z_e6
        |       FROM g CROSS JOIN tt),
        |ta AS (SELECT 'a' AS direction, token, c_a, c_b, z_e6 FROM sc
        |       ORDER BY z_e6 DESC, token LIMIT 25),
        |tb AS (SELECT 'b' AS direction, token, c_a, c_b, z_e6 FROM sc
        |       ORDER BY z_e6 ASC, token LIMIT 25),
        |u AS (SELECT * FROM ta UNION ALL SELECT * FROM tb)
        |SELECT direction,
        |  CAST(row_number() OVER (PARTITION BY direction
        |    ORDER BY CASE WHEN direction = 'a' THEN -z_e6 ELSE z_e6 END,
        |      token) AS INT) AS rank,
        |  token, c_a, c_b, z_e6
        |FROM u ORDER BY direction, rank""".stripMargin
    },

    // the trimmedMean value grid with cumulative fences, the IDENTICAL
    // fixed rank trees of n alone
    "q289_x_median_ci" ->
      ("""WITH g AS (
        |  SELECT l_returnflag, CAST(floor(l_extendedprice + 0.5) AS BIGINT)
        |    AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY 1, 2),
        |w AS (SELECT *,
        |    CAST(sum(c) OVER (PARTITION BY l_returnflag ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum,
        |    CAST(sum(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |  FROM g),
        |r AS (SELECT *,
        |    greatest(CAST(1 AS BIGINT),
        |      CAST(floor((CAST(n AS DOUBLE) - 1.96 * sqrt(CAST(n AS DOUBLE)))
        |        / 2.0) AS BIGINT)) AS lr,
        |    least(n,
        |      CAST(ceil(1.0 + (CAST(n AS DOUBLE) + 1.96 * sqrt(CAST(n AS DOUBLE)))
        |        / 2.0) AS BIGINT)) AS ur
        |  FROM w)
        |SELECT l_returnflag, max(n) AS n,
        |  min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS median,
        |  min(CASE WHEN cum >= lr THEN v END) AS lo,
        |  min(CASE WHEN cum >= ur THEN v END) AS hi
        |FROM r GROUP BY 1 ORDER BY l_returnflag""".stripMargin),

    // exact (n, x), the IDENTICAL Wilson trees at z = 1.96
    "q287_x_wilson_ci" -> {
      val z = "1.96"
      val p = "(CAST(x AS DOUBLE) / CAST(n AS DOUBLE))"
      val den = s"(1.0 + $z * $z / CAST(n AS DOUBLE))"
      val ctr = s"($p + $z * $z / (2.0 * CAST(n AS DOUBLE)))"
      val rad = s"($z * sqrt($p * (1.0 - $p) / CAST(n AS DOUBLE) + $z * $z / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))"
      s"""WITH a AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN value >= 95.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS x
        |  FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1)
        |SELECT event_type, n, x, x * 1000000 // n AS rate_e6,
        |  CAST(floor(($ctr - $rad) / $den * 1000000 + 0.5) AS BIGINT) AS lo_e6,
        |  CAST(floor(($ctr + $rad) / $den * 1000000 + 0.5) AS BIGINT) AS hi_e6
        |FROM a ORDER BY event_type""".stripMargin
    },

    // q222's six sufficient sums, the IDENTICAL pooled-d and Hedges
    // trees, magnitude labels on the ROUNDED |d|
    "q284_x_effect_size" -> {
      val va = "((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n_a) / (n_a - 1))"
      val vb = "((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n_b) / (n_b - 1))"
      val sp2 = s"((CAST(n_a - 1 AS DOUBLE) * $va + CAST(n_b - 1 AS DOUBLE) * $vb) / CAST(n_a + n_b - 2 AS DOUBLE))"
      val dT = s"((CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b) / sqrt($sp2))"
      s"""WITH o AS (
        |  SELECT o_orderstatus AS st, o_orderpriority AS pr,
        |         CAST(round(o_totalprice) AS BIGINT) AS x
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        |    AND o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL),
        |a AS (SELECT st,
        |    CAST(sum(CASE WHEN pr = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN pr = '1-URGENT' THEN x ELSE 0 END) AS BIGINT)
        |      AS sa,
        |    sum(CASE WHEN pr = '1-URGENT' THEN CAST(x AS HUGEINT) * x
        |        ELSE CAST(0 AS HUGEINT) END) AS qa,
        |    CAST(sum(CASE WHEN pr = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN pr = '5-LOW' THEN x ELSE 0 END) AS BIGINT) AS sb,
        |    sum(CASE WHEN pr = '5-LOW' THEN CAST(x AS HUGEINT) * x
        |        ELSE CAST(0 AS HUGEINT) END) AS qb
        |  FROM o GROUP BY st),
        |r AS (SELECT st, n_a, n_b,
        |    CASE WHEN n_a >= 2 AND n_b >= 2 AND $sp2 > 0 THEN
        |      CAST(floor($dT * 1000000 + 0.5) AS BIGINT) END AS d_e6,
        |    CASE WHEN n_a >= 2 AND n_b >= 2 AND $sp2 > 0 THEN
        |      CAST(floor($dT * (1.0 - 3.0 / (4.0 * CAST(n_a + n_b AS DOUBLE) - 9.0))
        |        * 1000000 + 0.5) AS BIGINT) END AS g_e6
        |  FROM a)
        |SELECT st AS o_orderstatus, n_a, n_b, d_e6, g_e6,
        |  CASE WHEN d_e6 IS NULL THEN NULL
        |    WHEN abs(d_e6) < 200000 THEN 'negligible'
        |    WHEN abs(d_e6) < 500000 THEN 'small'
        |    WHEN abs(d_e6) < 800000 THEN 'medium'
        |    ELSE 'large' END AS magnitude
        |FROM r ORDER BY o_orderstatus""".stripMargin
    }
  )

  /** Recursive transitive-closure CTE over the MinHash candidate pairs —
    * the connected-components oracle shared by q79 (cluster labels) and
    * q106 (quality-based representative selection). Ends at `reach`;
    * consumers add the final SELECT. */
  private lazy val DupReachCte: String = {
    val rows = MinhashK / MinhashBands
    val bandConds = (0 until MinhashBands).map { b =>
      (b * rows until (b + 1) * rows).map(i => s"a.mh$i = b.mh$i").mkString("(", " AND ", ")")
    }.mkString(" OR ")
    val eqSum = (0 until MinhashK)
      .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
    val cte = "WITH RECURSIVE" + MinhashCte.stripPrefix("WITH")
    s"""$cte,
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($bandConds)
      |  WHERE $eqSum >= ${MinhashK / 2}),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM p
      |          UNION SELECT id_b, id_a FROM p),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)""".stripMargin
  }

  /** Shared 2-token-per-line derivation for the q80/q81 oracles — the SQL
    * twin of [[linedText]]: `la` is the line array, `toks` the raw token
    * array (DuckDB range() is end-exclusive; list slices are 1-based
    * inclusive, matching Spark's 1-based `slice`). */
  private lazy val LinedCte: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
      |         ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
      |  FROM documents),
      |lined AS (
      |  SELECT doc_id, toks,
      |    list_transform(range(0, CAST(ceil(len(toks) / 2.0) AS BIGINT)),
      |      i -> array_to_string(toks[i*2+1:i*2+2], ' ')) AS la
      |  FROM t)""".stripMargin
}
