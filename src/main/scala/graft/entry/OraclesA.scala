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

/** DuckDB oracle registry, first tranche (q00–q116). Merged into [[SparkEntry.oracleSql]]. */
private[graft] object OraclesA {
  private[graft] val m: Map[String, String] = Map(
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

    // AIC auto-lag ADF {0,1}: ONE aggregate with FILTER splitting the
    // common window (z non-null — the q212 ten) from the full lag-0
    // window (6 more sums); both candidate AICs e6-rounded BEFORE the
    // argmin, winner refit — every double tree spelled term-for-term
    // as Diagnostics.adfAutoLag1 emits it
    "q337_u56_adf_autolag" ->
      ("""WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |o AS (SELECT month, cents, lag(cents) OVER (ORDER BY month) AS ylag FROM m),
        |g AS (SELECT CAST(o.ylag AS HUGEINT) AS x,
        |             CAST(lag(o.cents - o.ylag) OVER (ORDER BY o.month) AS HUGEINT) AS z,
        |             CAST(o.cents - o.ylag AS HUGEINT) AS yv
        |      FROM o),
        |h AS (SELECT x, z, yv FROM g WHERE yv IS NOT NULL),
        |s AS (SELECT
        |  count(*) FILTER (WHERE z IS NOT NULL) AS n,
        |  CAST(count(*) FILTER (WHERE z IS NOT NULL) AS DOUBLE) AS nn,
        |  CAST(sum(x) FILTER (WHERE z IS NOT NULL) AS DOUBLE) AS sx,
        |  CAST(sum(z) FILTER (WHERE z IS NOT NULL) AS DOUBLE) AS sz,
        |  CAST(sum(yv) FILTER (WHERE z IS NOT NULL) AS DOUBLE) AS sy,
        |  CAST(sum(x*x) FILTER (WHERE z IS NOT NULL) AS DOUBLE) AS sxx,
        |  CAST(sum(z*z) FILTER (WHERE z IS NOT NULL) AS DOUBLE) AS szz,
        |  CAST(sum(x*z) FILTER (WHERE z IS NOT NULL) AS DOUBLE) AS sxz,
        |  CAST(sum(x*yv) FILTER (WHERE z IS NOT NULL) AS DOUBLE) AS sxy,
        |  CAST(sum(z*yv) FILTER (WHERE z IS NOT NULL) AS DOUBLE) AS szy,
        |  CAST(sum(yv*yv) FILTER (WHERE z IS NOT NULL) AS DOUBLE) AS syy,
        |  count(*) AS n0i, CAST(count(*) AS DOUBLE) AS n0,
        |  CAST(sum(x) AS DOUBLE) AS sx0, CAST(sum(yv) AS DOUBLE) AS sy0,
        |  CAST(sum(x*x) AS DOUBLE) AS sxx0, CAST(sum(x*yv) AS DOUBLE) AS sxy0,
        |  CAST(sum(yv*yv) AS DOUBLE) AS syy0
        |  FROM h),
        |c AS (SELECT s.*,
        |  nn*(sxx*szz - sxz*sxz) - sx*(sx*szz - sxz*sz) + sz*(sx*sxz - sxx*sz) AS det,
        |  sy*(sxx*szz - sxz*sxz) - sx*(sxy*szz - sxz*szy) + sz*(sxy*sxz - sxx*szy) AS detb0,
        |  nn*(sxy*szz - sxz*szy) - sy*(sx*szz - sxz*sz) + sz*(sx*szy - sxy*sz) AS detb1,
        |  nn*(sxx*szy - sxy*sxz) - sx*(sx*szy - sxy*sz) + sy*(sx*sxz - sxx*sz) AS detb2,
        |  nn*sxx - sx*sx AS det2c,
        |  n0*sxx0 - sx0*sx0 AS det2f
        |  FROM s),
        |r AS (SELECT c.*,
        |  syy - (detb0*sy + detb1*sxy + detb2*szy) / det AS rss1,
        |  (nn*sxy - sx*sy) / det2c AS b1c,
        |  (n0*sxy0 - sx0*sy0) / det2f AS b1f,
        |  (det <> 0 AND det2c <> 0 AND det2f <> 0 AND n > 3) AS ok
        |  FROM c),
        |r2 AS (SELECT r.*,
        |  syy - (sy - b1c*sx)/nn*sy - b1c*sxy AS rss0,
        |  syy0 - (sy0 - b1f*sx0)/n0*sy0 - b1f*sxy0 AS rssf
        |  FROM r),
        |r3 AS (SELECT r2.* REPLACE (
        |  (ok AND rss0 > 0 AND rss1 > 0 AND rssf > 0) AS ok) FROM r2),
        |a AS (SELECT r3.*,
        |  CASE WHEN ok THEN floor((nn*(ln(6.283185307179586*rss0/nn) + 1.0) + 4.0) * 1e6 + 0.5)/1e6 END AS aic0,
        |  CASE WHEN ok THEN floor((nn*(ln(6.283185307179586*rss1/nn) + 1.0) + 6.0) * 1e6 + 0.5)/1e6 END AS aic1
        |  FROM r3),
        |sel AS (SELECT a.*,
        |  CASE WHEN ok THEN (CASE WHEN aic1 < aic0 THEN 1 ELSE 0 END) END AS lagsel
        |  FROM a),
        |t AS (SELECT sel.*,
        |  CASE WHEN ok THEN floor((CASE WHEN lagsel = 1
        |    THEN (detb1/det) / sqrt(rss1/(nn - 3.0)*(nn*szz - sz*sz)/det)
        |    ELSE b1f / sqrt(rssf/(n0 - 2.0)*n0/det2f) END) * 10000 + 0.5)/10000
        |  END AS adf_t
        |  FROM sel)
        |SELECT 'all' AS key, CAST(lagsel AS INT) AS lag,
        |       CASE WHEN ok THEN (CASE WHEN lagsel = 1 THEN n ELSE n0i END) END AS n_obs,
        |       aic0, aic1, adf_t, -2.86 AS crit5,
        |       adf_t < -2.86 AS stationary5
        |FROM t""".stripMargin),

    // local-level Kalman: the scaled filter (v, f=P+1, k=P/f, m+=kv,
    // P←P(1−k)+λ) replayed per λ candidate by ONE recursive CTE carrying
    // (m, p, Σv²/f, Σln f); concentrated r̂ = Σ(v²/f)/(n−1); argmin by
    // (nll, λ) matches the kernel's ascending-grid first-minimum. Every
    // double literal CAST so the recursion columns stay DOUBLE (DuckDB
    // bare 0.1 is DECIMAL — the type would infect the whole recursion)
    "q338_u8_local_level_kalman" ->
      ("""WITH RECURSIVE m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(round(o_totalprice * 100)) / 1e8, 6) AS y
        |  FROM orders GROUP BY 1),
        |o AS (SELECT row_number() OVER (ORDER BY month) AS t, y FROM m),
        |nn AS (SELECT CAST(count(*) AS INT) AS n FROM o),
        |cand AS (SELECT CAST(unnest([0.1, 0.5, 1.0, 2.0, 10.0]) AS DOUBLE) AS lam),
        |rec(lam, t, mm, p, sv, slf) AS (
        |  SELECT c.lam, CAST(1 AS BIGINT) AS t, o.y, c.lam + 1.0,
        |         CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)
        |  FROM cand c JOIN o ON o.t = 1
        |  UNION ALL
        |  SELECT r.lam, r.t + 1,
        |    r.mm + (r.p/(r.p + 1.0)) * (o.y - r.mm),
        |    r.p * (1.0 - r.p/(r.p + 1.0)) + r.lam,
        |    r.sv + (o.y - r.mm)*(o.y - r.mm)/(r.p + 1.0),
        |    r.slf + ln(r.p + 1.0)
        |  FROM rec r JOIN o ON o.t = r.t + 1),
        |fin AS (SELECT r.lam, r.mm, r.p, r.sv/(nn.n - 1.0) AS rhat,
        |               (nn.n - 1.0)*ln(r.sv/(nn.n - 1.0)) + r.slf AS nll
        |        FROM rec r CROSS JOIN nn WHERE r.t = nn.n),
        |best AS (SELECT * FROM fin ORDER BY nll, lam LIMIT 1)
        |SELECT 'all' AS key, nn.n AS n_obs, round(b.lam, 1) AS lambda,
        |       round(b.rhat, 6) AS r_hat, CAST(h.h AS INT) AS step,
        |       round(b.mm, 4) AS forecast,
        |       round(b.mm - 1.96 * sqrt(b.rhat * (b.p + (h.h - 1.0) * b.lam + 1.0)), 4) AS lo,
        |       round(b.mm + 1.96 * sqrt(b.rhat * (b.p + (h.h - 1.0) * b.lam + 1.0)), 4) AS hi
        |FROM (SELECT unnest(generate_series(1, 6)) AS h) h
        |CROSS JOIN best b CROSS JOIN nn
        |ORDER BY step""".stripMargin),

    // Qn scale: value-grid self-cross (strict upper triangle + C(c,2)
    // zero-diff ties), exact cumulative walk to the k = C(h,2) order
    // statistic, one double multiply by the consistency factor
    "q363_x_qn_scale" ->
      ("""WITH b AS (
        |  SELECT l_returnflag AS g, CAST(floor(l_quantity) AS BIGINT) AS v
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL),
        |grid AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
        |         FROM b GROUP BY 1, 2),
        |cr AS (SELECT a.g, a.v - bb.v AS d, CAST(a.c AS HUGEINT) * bb.c AS cnt
        |       FROM grid a JOIN grid bb ON a.g = bb.g AND a.v > bb.v),
        |ties AS (SELECT g, CAST(0 AS BIGINT) AS d,
        |           CAST(c AS HUGEINT) * (c - 1) // 2 AS cnt
        |         FROM grid WHERE c >= 2),
        |diffs AS (SELECT g, d, sum(cnt) AS cd
        |          FROM (SELECT * FROM cr UNION ALL SELECT * FROM ties)
        |          GROUP BY 1, 2),
        |counts AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1),
        |ks AS (SELECT g, n,
        |         ((n // 2 + 1) * (n // 2)) // 2 AS k,
        |         (n * (n - 1)) // 2 AS n_pairs
        |       FROM counts WHERE ((n // 2 + 1) * (n // 2)) // 2 >= 1),
        |cum AS (SELECT g, d,
        |          sum(cd) OVER (PARTITION BY g ORDER BY d
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |        FROM diffs),
        |sel AS (SELECT cum.g, ks.n, ks.n_pairs, ks.k, min(cum.d) AS dk
        |        FROM cum JOIN ks ON ks.g = cum.g
        |        WHERE cum.cm >= ks.k GROUP BY 1, 2, 3, 4)
        |SELECT g AS l_returnflag, n, n_pairs, k, dk,
        |  CAST(floor(2.2219 * CAST(dk AS DOUBLE) * 10000 + 0.5) AS BIGINT)
        |    AS qn_e4
        |FROM sel ORDER BY 1""".stripMargin),

    // group-sequential: per-look Welch moments cumulated over the look
    // grid, the SAME z tree, the SAME OBF e4 ladder interpolated from
    // Metrics.obfBoundariesE4; reject on rounded values, stopped = at or
    // after the first rejection
    "q362_x_group_sequential" -> {
      val bdVals = graft.operators.Metrics.obfBoundariesE4(5).zipWithIndex
        .map { case (b, i) => s"(${i + 1}, $b)" }.mkString(", ")
      val va = "((CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n_a) / (n_a - 1))"
      val vb = "((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * sb / n_b) / (n_b - 1))"
      val se2 = s"($va / n_a + $vb / n_b)"
      s"""WITH e AS (
         |  SELECT least(5, 1 + (day(ts) - 1) // 6) AS look,
         |         (user_id % 2 = 0) AS a,
         |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
         |  FROM events
         |  WHERE user_id IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL),
         |pl AS (SELECT look,
         |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na0,
         |    CAST(sum(CASE WHEN a THEN x ELSE 0 END) AS BIGINT) AS sa0,
         |    sum(CASE WHEN a THEN CAST(x AS HUGEINT) * x
         |        ELSE CAST(0 AS HUGEINT) END) AS qa0,
         |    CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS nb0,
         |    CAST(sum(CASE WHEN NOT a THEN x ELSE 0 END) AS BIGINT) AS sb0,
         |    sum(CASE WHEN NOT a THEN CAST(x AS HUGEINT) * x
         |        ELSE CAST(0 AS HUGEINT) END) AS qb0
         |  FROM e GROUP BY 1),
         |cm AS (SELECT look,
         |    sum(na0) OVER w AS n_a, sum(sa0) OVER w AS sa,
         |    sum(qa0) OVER w AS qa,
         |    sum(nb0) OVER w AS n_b, sum(sb0) OVER w AS sb,
         |    sum(qb0) OVER w AS qb
         |  FROM pl
         |  WINDOW w AS (ORDER BY look
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |bd(look, bound_e4) AS (VALUES $bdVals),
         |z AS (SELECT cm.look, CAST(cm.n_a AS BIGINT) AS n_a,
         |    CAST(cm.n_b AS BIGINT) AS n_b, CAST(bd.bound_e4 AS BIGINT)
         |      AS bound_e4,
         |    CASE WHEN n_a >= 2 AND n_b >= 2 AND $se2 > 0 THEN
         |      CAST(floor((CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b)
         |                 / sqrt($se2) * 10000 + 0.5) AS BIGINT)
         |    END AS z_e4
         |  FROM cm JOIN bd ON bd.look = cm.look),
         |f AS (SELECT z.*, CASE WHEN z_e4 IS NOT NULL
         |        THEN abs(z_e4) > bound_e4 END AS reject FROM z),
         |g AS (SELECT f.*, min(CASE WHEN reject THEN look END) OVER ()
         |        AS fr FROM f)
         |SELECT look, n_a, n_b, z_e4, bound_e4, reject,
         |       (fr IS NOT NULL AND look >= fr) AS stopped
         |FROM g ORDER BY look""".stripMargin
    },

    // t-closeness: class×value count grid, |c_gv·N − c_v·n_g| in
    // HUGEINT + the missing-value mass n_g·(N − Σ c_v present), one
    // double division to e6
    "q361_x_t_closeness" ->
      ("""WITH b AS (
        |  SELECT c_nationkey AS nk, c_mktsegment AS seg,
        |         CAST(floor(c_acctbal / 2000) AS BIGINT) AS v
        |  FROM customer
        |  WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
        |    AND c_acctbal IS NOT NULL),
        |cell AS (SELECT nk, seg, v, CAST(count(*) AS BIGINT) AS cgv
        |         FROM b GROUP BY 1, 2, 3),
        |gl AS (SELECT v, CAST(count(*) AS BIGINT) AS cv FROM b GROUP BY 1),
        |tot AS (SELECT CAST(sum(cv) AS BIGINT) AS nn FROM gl),
        |j AS (SELECT cell.nk, cell.seg, cell.cgv, gl.cv, tot.nn,
        |        sum(cgv) OVER (PARTITION BY nk, seg) AS ng
        |      FROM cell JOIN gl USING (v) CROSS JOIN tot),
        |a AS (SELECT nk, seg, CAST(max(ng) AS BIGINT) AS n,
        |        CAST(count(*) AS BIGINT) AS n_values,
        |        sum(abs(CAST(cgv AS HUGEINT) * nn - CAST(cv AS HUGEINT) * ng))
        |          AS t1,
        |        CAST(sum(cv) AS HUGEINT) AS cvsum, max(nn) AS nn
        |      FROM j GROUP BY 1, 2)
        |SELECT nk AS c_nationkey, seg AS c_mktsegment, n, n_values,
        |  CAST(floor(CAST(t1 + CAST(n AS HUGEINT) * (nn - cvsum) AS DOUBLE)
        |    / (2.0 * CAST(n AS DOUBLE) * CAST(nn AS DOUBLE))
        |    * 1000000 + 0.5) AS BIGINT) AS tvd_e6
        |FROM a ORDER BY 1, 2""".stripMargin),

    // Kalman λ ternary refinement: the q338 recursion replayed for the
    // grid, then per refinement-round probe pair (e6-rounded λ's —
    // bit-identical in both engines), then the midpoint; bracket CASEs
    // generated from the same Scala grid the kernel uses
    "q360_u8_kalman_ternary_refine" -> {
      val grid = Seq(0.1, 0.5, 1.0, 2.0, 10.0)
      def rec(name: String, cand: String) =
        s"""$name(lam, t, mm, p, sv, slf) AS (
           |  SELECT c.lam, CAST(1 AS BIGINT) AS t, o.y, c.lam + 1.0,
           |         CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)
           |  FROM $cand c JOIN o ON o.t = 1
           |  UNION ALL
           |  SELECT r.lam, r.t + 1,
           |    r.mm + (r.p/(r.p + 1.0)) * (o.y - r.mm),
           |    r.p * (1.0 - r.p/(r.p + 1.0)) + r.lam,
           |    r.sv + (o.y - r.mm)*(o.y - r.mm)/(r.p + 1.0),
           |    r.slf + ln(r.p + 1.0)
           |  FROM $name r JOIN o ON o.t = r.t + 1)""".stripMargin
      def fin(name: String, recName: String) =
        s"""$name AS (SELECT r.lam, r.mm, r.p, r.sv/(nn.n - 1.0) AS rhat,
           |               (nn.n - 1.0)*ln(r.sv/(nn.n - 1.0)) + r.slf AS nll
           |        FROM $recName r CROSS JOIN nn WHERE r.t = nn.n)""".stripMargin
      val loCase = grid.indices.map(i =>
        if (i == 0) s"WHEN ${grid(0)} THEN ${grid(0) / 2}"
        else s"WHEN ${grid(i)} THEN ${grid(i - 1)}").mkString(" ")
      val hiCase = grid.indices.map(i =>
        if (i == grid.length - 1) s"WHEN ${grid.last} THEN ${grid.last * 2}"
        else s"WHEN ${grid(i)} THEN ${grid(i + 1)}").mkString(" ")
      def roundStep(i: Int, bndPrev: String) =
        s"""pr$i AS (SELECT lo, hi, lam0,
           |  floor((lo + (hi - lo) / 3.0) * 1e6 + 0.5)/1e6 AS p1,
           |  floor((hi - (hi - lo) / 3.0) * 1e6 + 0.5)/1e6 AS p2 FROM $bndPrev),
           |cand$i AS (SELECT p1 AS lam FROM pr$i UNION SELECT p2 FROM pr$i),
           |${rec(s"rec$i", s"cand$i")},
           |${fin(s"fin$i", s"rec$i")},
           |bnd$i AS (SELECT
           |    CASE WHEN f1.nll < f2.nll THEN pr.lo ELSE pr.p1 END AS lo,
           |    CASE WHEN f1.nll < f2.nll THEN pr.p2 ELSE pr.hi END AS hi,
           |    pr.lam0
           |  FROM pr$i pr JOIN fin$i f1 ON f1.lam = pr.p1
           |  JOIN fin$i f2 ON f2.lam = pr.p2)""".stripMargin
      s"""WITH RECURSIVE m AS (
         |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |         round(sum(round(o_totalprice * 100)) / 1e8, 6) AS y
         |  FROM orders GROUP BY 1),
         |o AS (SELECT row_number() OVER (ORDER BY month) AS t, y FROM m),
         |nn AS (SELECT CAST(count(*) AS INT) AS n FROM o),
         |cand0 AS (SELECT CAST(unnest([${grid.mkString(", ")}]) AS DOUBLE)
         |            AS lam),
         |${rec("rec0", "cand0")},
         |${fin("fin0", "rec0")},
         |best0 AS (SELECT * FROM fin0 ORDER BY nll, lam LIMIT 1),
         |bnd0 AS (SELECT b.lam AS lam0,
         |    CASE b.lam $loCase END AS lo,
         |    CASE b.lam $hiCase END AS hi
         |  FROM best0 b),
         |${roundStep(1, "bnd0")},
         |${roundStep(2, "bnd1")},
         |candf AS (SELECT floor((lo + hi) / 2.0 * 1e6 + 0.5)/1e6 AS lam
         |          FROM bnd2),
         |${rec("recf", "candf")},
         |${fin("finf", "recf")}
         |SELECT 'all' AS key, CAST(nn.n AS INT) AS n_obs,
         |  CAST(floor(b.lam0 * 1e6 + 0.5) AS BIGINT) AS lambda0_e6,
         |  CAST(floor(f.lam * 1e6 + 0.5) AS BIGINT) AS lam_hat_e6,
         |  CAST(floor(f.rhat * 1e6 + 0.5) AS BIGINT) AS r_hat_e6,
         |  CAST(floor(f.nll * 1e6 + 0.5) AS BIGINT) AS nll_e6,
         |  CAST(floor(f.mm * 1e4 + 0.5) AS BIGINT) AS forecast_e4
         |FROM finf f CROSS JOIN bnd2 b CROSS JOIN nn""".stripMargin
    },

    // per-KEY local-level Kalman: the q338 recursion with key carried
    // through the recursive state (one replay per (key, λ)), per-key
    // argmin via (nll, lam) row_number — q338's protocol at the keyed
    // kernel path q69 actually runs
    "q366_u8_local_level_multikey" ->
      ("""WITH RECURSIVE m AS (
        |  SELECT o_orderpriority AS key,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS DOUBLE) / 1e8, 6) AS y
        |  FROM orders GROUP BY 1, 2),
        |o AS (SELECT key,
        |        row_number() OVER (PARTITION BY key ORDER BY month) AS t, y
        |      FROM m),
        |nn AS (SELECT key, CAST(count(*) AS INT) AS n FROM o GROUP BY 1
        |       HAVING count(*) >= 3),
        |cand AS (SELECT CAST(unnest([0.1, 0.5, 1.0, 2.0, 10.0]) AS DOUBLE)
        |           AS lam),
        |rec(key, lam, t, mm, p, sv, slf) AS (
        |  SELECT o.key, c.lam, CAST(1 AS BIGINT) AS t, o.y, c.lam + 1.0,
        |         CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)
        |  FROM cand c JOIN o ON o.t = 1 JOIN nn ON nn.key = o.key
        |  UNION ALL
        |  SELECT r.key, r.lam, r.t + 1,
        |    r.mm + (r.p/(r.p + 1.0)) * (o.y - r.mm),
        |    r.p * (1.0 - r.p/(r.p + 1.0)) + r.lam,
        |    r.sv + (o.y - r.mm)*(o.y - r.mm)/(r.p + 1.0),
        |    r.slf + ln(r.p + 1.0)
        |  FROM rec r JOIN o ON o.key = r.key AND o.t = r.t + 1),
        |fin AS (SELECT r.key, r.lam, r.mm, r.p, r.sv/(nn.n - 1.0) AS rhat,
        |               (nn.n - 1.0)*ln(r.sv/(nn.n - 1.0)) + r.slf AS nll
        |        FROM rec r JOIN nn ON nn.key = r.key WHERE r.t = nn.n),
        |best AS (SELECT * FROM (SELECT fin.*,
        |           row_number() OVER (PARTITION BY key ORDER BY nll, lam)
        |             AS rk FROM fin) WHERE rk = 1)
        |SELECT b.key, nn.n AS n_obs, round(b.lam, 1) AS lambda,
        |       round(b.rhat, 6) AS r_hat, CAST(h.h AS INT) AS step,
        |       round(b.mm, 4) AS forecast,
        |       round(b.mm - 1.96 * sqrt(b.rhat * (b.p + (h.h - 1.0) * b.lam + 1.0)), 4) AS lo,
        |       round(b.mm + 1.96 * sqrt(b.rhat * (b.p + (h.h - 1.0) * b.lam + 1.0)), 4) AS hi
        |FROM (SELECT unnest(generate_series(1, 3)) AS h) h
        |CROSS JOIN best b JOIN nn ON nn.key = b.key
        |ORDER BY b.key, step""".stripMargin),

    // batch perceptron, 3 iterations UNROLLED (zero-init makes iteration
    // 1 the class-weighted feature sums); all-integer — margins, updates
    // and confusion replay exactly; max() carries each weight constant
    // through the next aggregate (the kpss-oracle trick); sums CAST to
    // BIGINT (DuckDB HUGEINT drift)
    "q339_x_perceptron_slice" -> {
      val words = Seq("table", "query", "scan", "data",
        "fast", "window", "agg", "stream")
      val xs = "x0" +: words.indices.map(j => s"x${j + 1}")
      def margin(p: String) = xs.zipWithIndex
        .map { case (x, j) => s"$p$j*$x" }.mkString(" + ")
      def step(prev: String, out: Char) = xs.zipWithIndex.map { case (x, j) =>
        s"CAST(max($prev$j) + coalesce(sum(CASE WHEN yv*(${margin(prev)}) <= 0 THEN yv*$x END), 0) AS BIGINT) AS $out$j"
      }.mkString(",\n  ")
      s"""WITH f AS (
         |  SELECT CAST(1 AS BIGINT) AS x0,
         |         ${words.zipWithIndex.map { case (w, j) =>
                      s"CAST(list_contains(toks, '$w') AS BIGINT) AS x${j + 1}"
                    }.mkString(",\n         ")},
         |         CASE WHEN list_contains(toks, 'vector') THEN CAST(1 AS BIGINT)
         |              ELSE CAST(-1 AS BIGINT) END AS yv
         |  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS toks
         |        FROM documents WHERE text IS NOT NULL) t),
         |i1 AS (SELECT ${xs.zipWithIndex.map { case (x, j) =>
                  s"CAST(sum(yv*$x) AS BIGINT) AS a$j" }.mkString(", ")}
         |       FROM f),
         |i2 AS (SELECT ${step("a", 'b')}
         |  FROM f CROSS JOIN i1),
         |i3 AS (SELECT ${step("b", 'c')}
         |  FROM f CROSS JOIN i2),
         |conf AS (SELECT
         |    ${xs.indices.map(j => s"max(c$j) AS w$j").mkString(", ")},
         |    count(*) FILTER (WHERE yv = 1 AND (${margin("c")}) > 0) AS tp,
         |    count(*) FILTER (WHERE yv = -1 AND (${margin("c")}) > 0) AS fp,
         |    count(*) FILTER (WHERE yv = -1 AND NOT ((${margin("c")}) > 0)) AS tn,
         |    count(*) FILTER (WHERE yv = 1 AND NOT ((${margin("c")}) > 0)) AS fn
         |  FROM f CROSS JOIN i3)
         |SELECT ${xs.indices.map(j => s"w$j").mkString(", ")}, tp, fp, tn, fn,
         |       CASE WHEN tp+fp+tn+fn = 0 THEN 0
         |            ELSE (tp+tn)*1000000 // (tp+fp+tn+fn) END AS acc_e6
         |FROM conf""".stripMargin
    },

    // BPE encode slice: the q335 learn chain (3 pair-count→argmax→apply
    // rounds over the word-frequency table) re-used verbatim, then the
    // SAME 2-pass boundary-delimited replace applied rank-sequentially
    // to every DOC word occurrence; fertility readout per doc
    "q340_x_bpe_encode_slice" -> {
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
      def rep2(expr: String, m: String): String = {
        val pat = s"'|' || (SELECT l FROM $m) || '|' || (SELECT r FROM $m) || '|'"
        val rp = s"'|' || (SELECT l || r FROM $m) || '|'"
        s"replace(replace($expr, $pat, $rp), $pat, $rp)"
      }
      def applyCte(sOut: String, sIn: String, m: String): String =
        s"""$sOut AS (
           |  SELECT ${rep2("s", m)} AS s, c FROM $sIn)""".stripMargin
      def applyDocCte(sOut: String, sIn: String, m: String): String =
        s"""$sOut AS (
           |  SELECT doc_id, ${rep2("s", m)} AS s FROM $sIn)""".stripMargin
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
         |m2 AS (SELECT l, r, cnt FROM p2 ORDER BY cnt DESC, l, r LIMIT 1),
         |wd AS (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
         |    FROM documents WHERE text IS NOT NULL)
         |  WHERE length(w) BETWEEN 2 AND 9 AND NOT regexp_matches(w, '$run5')),
         |d0 AS (SELECT doc_id, '|' || array_to_string(string_split(w, ''), '|')
         |         || '|' AS s FROM wd),
         |${applyDocCte("d1", "d0", "m0")},
         |${applyDocCte("d2", "d1", "m1")},
         |${applyDocCte("d3", "d2", "m2")}
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(length(s) - length(replace(s, '|', '')) - 1) AS BIGINT)
         |         AS n_subwords
         |FROM d3 GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // TextRank = adjacent-token co-occurrence edges (symmetric, no
    // self-loops) pushed through the q123 PageRank iteration chain
    // verbatim; top-25 by (rank DESC, node)
    "q341_x_textrank_keywords" -> pageRankSqlOver(
      """t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |       FROM documents WHERE text IS NOT NULL),
        |u AS (SELECT toks[i] AS tok, toks[i + 1] AS nxt
        |      FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
        |            FROM t)),
        |e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT tok AS src, nxt AS dst FROM u WHERE tok <> nxt
        |    UNION ALL
        |    SELECT nxt, tok FROM u WHERE tok <> nxt))""".stripMargin,
      iters = 3,
      tail = """SELECT node, r AS rank_scaled,
        |       CAST(r AS DOUBLE) / 1000000000000.0 AS pagerank
        |FROM r3 ORDER BY rank_scaled DESC, node LIMIT 25""".stripMargin),

    // CEM: covariate-cell strata with HUGEINT value sums; each matched
    // stratum's mean gap e6-quantized through the IDENTICAL double tree
    // BEFORE the cross-strata integer sum; att = one final double
    // division, floor(x+0.5) (round-half-up both signs, both engines)
    "q342_x_cem_att" ->
      ("""WITH j AS (
        |  SELECT o.o_custkey % 3 = 0 AS treat,
        |         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
        |         o.o_orderpriority AS pr, c.c_mktsegment AS seg,
        |         CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |s AS (SELECT pr, seg, month,
        |        count(*) FILTER (WHERE treat) AS nt,
        |        count(*) FILTER (WHERE NOT treat) AS nc,
        |        sum(CASE WHEN treat THEN CAST(cents AS HUGEINT) END) AS st,
        |        sum(CASE WHEN NOT treat THEN CAST(cents AS HUGEINT) END) AS sc
        |      FROM j GROUP BY 1, 2, 3),
        |g AS (SELECT nt, nc,
        |        CAST(floor((CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
        |            - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)) * 1e6 + 0.5)
        |          AS BIGINT) AS gap_e6,
        |        (nt > 0 AND nc > 0) AS matched
        |      FROM s),
        |a AS (SELECT
        |    count(*) FILTER (WHERE matched) AS n_strata_matched,
        |    CAST(coalesce(sum(nt) FILTER (WHERE matched), 0) AS BIGINT)
        |      AS n_treated_matched,
        |    CAST(coalesce(sum(nc) FILTER (WHERE matched), 0) AS BIGINT)
        |      AS n_control_matched,
        |    CAST(coalesce(sum(nt) FILTER (WHERE NOT matched), 0) AS BIGINT)
        |      AS n_treated_dropped,
        |    coalesce(sum(CAST(nt AS HUGEINT) * gap_e6) FILTER (WHERE matched), 0)
        |      AS num
        |  FROM g)
        |SELECT n_strata_matched, n_treated_matched, n_control_matched,
        |       n_treated_dropped,
        |       CASE WHEN n_treated_matched > 0
        |            THEN CAST(floor(CAST(num AS DOUBLE)
        |                   / CAST(n_treated_matched AS DOUBLE) + 0.5) AS BIGINT)
        |       END AS att_e6
        |FROM a""".stripMargin),

    // Adamic-Adar: canonical string pairs, symmetric adjacency with the
    // center's degree, hub centers dropped at the dial, per-neighbor
    // 1/ln(deg) e9-quantized BEFORE the integer sum, existing edges
    // anti-joined out, top-25 by (score DESC, pair)
    "q343_x_adamic_adar" ->
      ("""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pr AS (SELECT DISTINCT
        |         least(CAST(x.pk AS VARCHAR), CAST(y.pk AS VARCHAR)) AS a,
        |         greatest(CAST(x.pk AS VARCHAR), CAST(y.pk AS VARCHAR)) AS b
        |       FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
        |        FROM (SELECT a AS node FROM pr UNION ALL SELECT b FROM pr)
        |        GROUP BY 1),
        |adj AS (SELECT j.z, j.n,
        |          CAST(floor(1e9 / ln(CAST(deg.d AS DOUBLE)) + 0.5) AS BIGINT)
        |            AS term
        |        FROM (SELECT a AS z, b AS n FROM pr
        |              UNION ALL SELECT b, a FROM pr) j
        |        JOIN deg ON j.z = deg.node WHERE deg.d <= 200),
        |sc AS (SELECT w1.n AS node_a, w2.n AS node_b,
        |         CAST(count(*) AS BIGINT) AS n_common,
        |         CAST(sum(w1.term) AS BIGINT) AS aa_e9
        |       FROM adj w1 JOIN adj w2 ON w1.z = w2.z AND w1.n < w2.n
        |       GROUP BY 1, 2)
        |SELECT sc.node_a, sc.node_b, sc.n_common, sc.aa_e9
        |FROM sc LEFT JOIN pr ON sc.node_a = pr.a AND sc.node_b = pr.b
        |WHERE pr.a IS NULL
        |ORDER BY aa_e9 DESC, node_a, node_b LIMIT 25""".stripMargin),

    // Huber IRLS unrolled twice over the (group, dollar)-grid: q146's
    // exact median/MAD chain, then per iteration the IDENTICAL e9
    // weight CASE inside both HUGEINT sums and ONE double division;
    // max() carries med/mad/c through each aggregate
    "q345_x_huber_location" -> {
      def wexpr(m: String, hc: String) =
        s"""(CASE WHEN abs(CAST(c.x AS DOUBLE) - $m) <= $hc THEN 1000000000
           |      ELSE CAST(floor($hc / abs(CAST(c.x AS DOUBLE) - $m) * 1e9 + 0.5)
           |           AS BIGINT) END)""".stripMargin
      def iter(out: String, prev: String) =
        s"""${out}s AS (SELECT c.g, max($prev.med) AS med, max($prev.mad) AS mad,
           |    max($prev.hc) AS hc,
           |    sum(CAST(c.c * ${wexpr(s"$prev.m", s"$prev.hc")} AS HUGEINT) * c.x)
           |      AS num,
           |    sum(CAST(c.c * ${wexpr(s"$prev.m", s"$prev.hc")} AS HUGEINT)) AS den
           |  FROM c JOIN $prev ON c.g = $prev.g GROUP BY c.g),
           |$out AS (SELECT g, med, mad, hc,
           |           CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS m FROM ${out}s)""".stripMargin
      s"""WITH v AS (
         |  SELECT l_returnflag AS g,
         |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 100 AS x
         |  FROM lineitem),
         |c AS (SELECT g, x, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
         |w AS (SELECT g, x, sum(c) OVER (PARTITION BY g ORDER BY x) AS cum,
         |             sum(c) OVER (PARTITION BY g) AS n FROM c),
         |med AS (SELECT g, min(x) AS med FROM w
         |        WHERE cum >= (500 * n + 999) // 1000 GROUP BY 1),
         |dc AS (SELECT c.g, abs(c.x - med.med) AS dev, sum(c.c) AS c
         |       FROM c JOIN med ON c.g = med.g GROUP BY 1, 2),
         |dw AS (SELECT g, dev, sum(c) OVER (PARTITION BY g ORDER BY dev) AS cum,
         |              sum(c) OVER (PARTITION BY g) AS n FROM dc),
         |mad AS (SELECT g, min(dev) AS mad FROM dw
         |        WHERE cum >= (500 * n + 999) // 1000 GROUP BY 1),
         |nn AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
         |p0 AS (SELECT med.g, med.med, mad.mad,
         |         1.345 * (1.4826 * CAST(mad.mad AS DOUBLE)) AS hc,
         |         CAST(med.med AS DOUBLE) AS m
         |       FROM med JOIN mad ON med.g = mad.g),
         |${iter("p1", "p0")},
         |${iter("p2", "p1")}
         |SELECT p2.g AS l_returnflag, nn.n, p2.med, p2.mad,
         |       CAST(floor(p2.m * 1e6 + 0.5) AS BIGINT) AS huber_e6
         |FROM p2 JOIN nn ON p2.g = nn.g ORDER BY 1""".stripMargin
    },

    // HL shift: per-side value grids crossed with multiplicity ca·cb,
    // exact lower weighted median on the difference grid (the house
    // (500n+999)//1000 fence); whole-number quantities make the BIGINT
    // cast engine-agnostic
    "q346_x_hodges_lehmann" ->
      ("""WITH b AS (
        |  SELECT l_returnflag AS k, l_discount >= 0.05 AS side,
        |         CAST(l_quantity AS BIGINT) AS v FROM lineitem),
        |ga AS (SELECT k, v AS va, count(*) AS ca FROM b WHERE side GROUP BY 1, 2),
        |gb AS (SELECT k, v AS vb, count(*) AS cb FROM b WHERE NOT side GROUP BY 1, 2),
        |d AS (SELECT ga.k, va - vb AS d, CAST(sum(ca * cb) AS BIGINT) AS c
        |      FROM ga JOIN gb ON ga.k = gb.k GROUP BY 1, 2),
        |w AS (SELECT k, d, sum(c) OVER (PARTITION BY k ORDER BY d) AS cum,
        |             sum(c) OVER (PARTITION BY k) AS n FROM d),
        |hl AS (SELECT k, min(d) AS hl_shift, CAST(max(n) AS BIGINT) AS n_pairs
        |       FROM w WHERE cum >= (500 * n + 999) // 1000 GROUP BY 1),
        |s AS (SELECT k, count(*) FILTER (WHERE side) AS n_a,
        |             count(*) FILTER (WHERE NOT side) AS n_b FROM b GROUP BY 1)
        |SELECT s.k AS l_returnflag, s.n_a, s.n_b, hl.n_pairs, hl.hl_shift
        |FROM s JOIN hl ON s.k = hl.k ORDER BY 1""".stripMargin),

    // DTW: the DP table replayed CELL-BY-CELL in row-major order by one
    // recursive CTE — state carries (j, i, previous DP row, partial
    // current row) per pair; at i = n_a the rows rotate. dp(i', j) =
    // |sa[i']−sb[j]| + least(least(prev[i'+1], cur[i']), prev[i']) with
    // 1-indexed lists (prev[p] = dp(p−1, j−1)) — the kernel's tree
    // term-for-term. Infinity seeds make the borders exact
    "q347_x_dtw_pairwise" ->
      ("""WITH RECURSIVE m AS (
        |  SELECT o_orderpriority AS k,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         round(sum(round(o_totalprice * 100)) / 1e8, 6) AS y
        |  FROM orders GROUP BY 1, 2),
        |ser AS (SELECT k, list(y ORDER BY month) AS s,
        |               CAST(count(*) AS BIGINT) AS n FROM m GROUP BY 1),
        |p AS (SELECT a.k AS ka, b.k AS kb, a.s AS sa, b.s AS sb,
        |             a.n AS na, b.n AS nb
        |      FROM ser a JOIN ser b ON a.k < b.k),
        |rec(ka, kb, j, i, prev, cur) AS (
        |  SELECT ka, kb, CAST(1 AS BIGINT) AS j, CAST(0 AS BIGINT) AS i,
        |         list_concat([CAST(0 AS DOUBLE)],
        |           list_transform(generate_series(1, CAST(na AS INT)),
        |             x -> CAST('infinity' AS DOUBLE))) AS prev,
        |         [CAST('infinity' AS DOUBLE)] AS cur
        |  FROM p
        |  UNION ALL
        |  SELECT r.ka, r.kb,
        |         CASE WHEN r.i = p.na THEN r.j + 1 ELSE r.j END,
        |         CASE WHEN r.i = p.na THEN 0 ELSE r.i + 1 END,
        |         CASE WHEN r.i = p.na THEN r.cur ELSE r.prev END,
        |         CASE WHEN r.i = p.na THEN [CAST('infinity' AS DOUBLE)]
        |              ELSE list_append(r.cur,
        |                abs(p.sa[CAST(r.i + 1 AS INT)] - p.sb[CAST(r.j AS INT)])
        |                  + least(least(r.prev[CAST(r.i + 2 AS INT)],
        |                                r.cur[CAST(r.i + 1 AS INT)]),
        |                          r.prev[CAST(r.i + 1 AS INT)])) END
        |  FROM rec r JOIN p ON r.ka = p.ka AND r.kb = p.kb
        |  WHERE NOT (r.i = p.na AND r.j = p.nb)),
        |fin AS (SELECT r.ka, r.kb, p.na, p.nb,
        |               r.cur[CAST(p.na + 1 AS INT)] AS dtw
        |        FROM rec r JOIN p ON r.ka = p.ka AND r.kb = p.kb
        |        WHERE r.i = p.na AND r.j = p.nb)
        |SELECT ka AS key_a, kb AS key_b, CAST(na AS INT) AS n_a,
        |       CAST(nb AS INT) AS n_b,
        |       floor(dtw * 1e4 + 0.5) / 1e4 AS dtw,
        |       floor(dtw / (na + nb) * 1e6 + 0.5) / 1e6 AS dtw_norm
        |FROM fin ORDER BY key_a, key_b""".stripMargin),

    // SRM: the q322 split replay (dkHash32 permille buckets), designed
    // weights as VALUES, per-arm (O·W − N·w)²/(N·w·W) e6-quantized
    // before the integer sum; crit pulled from the SAME chi2Crit95E4
    // table entry the Spark side inlines
    "q348_x_srm_check" -> {
      val crit = graft.operators.Metrics.chi2Crit95E4(1) // df = 2
      s"""WITH sp AS (
         |  SELECT CASE WHEN bb < 800 THEN 'train' WHEN bb < 900 THEN 'val'
         |              ELSE 'test' END AS arm
         |  FROM (SELECT ${dkHash32("CAST(doc_id AS VARCHAR)")} % 1000 AS bb
         |        FROM documents WHERE doc_id IS NOT NULL)),
         |o AS (SELECT arm, CAST(count(*) AS BIGINT) AS o FROM sp GROUP BY 1),
         |e AS (SELECT * FROM (VALUES ('train', 800), ('val', 100),
         |        ('test', 100)) t(arm, w)),
         |j AS (SELECT e.arm, CAST(e.w AS BIGINT) AS w, coalesce(o.o, 0) AS o
         |      FROM e LEFT JOIN o ON e.arm = o.arm),
         |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM j),
         |t AS (SELECT CAST(floor(
         |        CAST((CAST(o AS HUGEINT)*1000 - CAST(nn.n AS HUGEINT)*w)
         |           * (CAST(o AS HUGEINT)*1000 - CAST(nn.n AS HUGEINT)*w) AS DOUBLE)
         |        / CAST(CAST(nn.n AS HUGEINT)*w*1000 AS DOUBLE) * 1e6 + 0.5)
         |      AS BIGINT) AS term
         |      FROM j CROSS JOIN nn WHERE nn.n > 0)
         |SELECT nn.n AS n_total, CAST(3 AS BIGINT) AS n_arms,
         |       CAST(2 AS BIGINT) AS dof,
         |       (SELECT CAST(sum(term) AS BIGINT) FROM t) AS chi2_e6,
         |       CAST($crit AS BIGINT) AS crit5_e4,
         |       (SELECT CAST(sum(term) AS BIGINT) FROM t) > ${crit * 100L}
         |         AS srm_detected
         |FROM nn""".stripMargin
    },

    // Bartlett: exact HUGEINT variance numerators, per-group ln/ratio
    // terms quantized (e9/e6/e12) BEFORE the cross-group integer sums,
    // the IDENTICAL correction/statistic tree, shared crit table CASE
    "q349_x_bartlett" -> {
      val crit = graft.operators.Metrics.chi2Crit95Sql("dof")
      s"""WITH v AS (
         |  SELECT l_returnflag AS g,
         |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) // 100 AS x
         |  FROM lineitem),
         |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
         |        sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(x AS HUGEINT)*x) AS sxx
         |      FROM v GROUP BY 1),
         |b AS (SELECT g, n, CAST(n AS HUGEINT)*sxx - sx*sx AS q FROM a),
         |r AS (SELECT g, n, q, (n > 1 AND q > 0) AS ok,
         |        CASE WHEN n > 1 AND q > 0 THEN CAST(floor(
         |          ln(CAST(q AS DOUBLE)
         |             / CAST(CAST(n AS HUGEINT)*(n-1) AS DOUBLE)) * 1e9 + 0.5)
         |          AS BIGINT) END AS ln_e9,
         |        CASE WHEN n > 1 AND q > 0 THEN CAST(floor(
         |          CAST(q AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5)
         |          AS HUGEINT) END AS sp_e6,
         |        CASE WHEN n > 1 AND q > 0 THEN CAST(floor(
         |          1e12 / CAST(n - 1 AS DOUBLE) + 0.5) AS BIGINT) END AS inv_e12
         |      FROM b),
         |ag AS (SELECT CAST(count(*) AS BIGINT) AS k_all,
         |        CAST(count(*) FILTER (WHERE ok) AS BIGINT) AS k,
         |        CAST(coalesce(sum(n) FILTER (WHERE ok), 0) AS BIGINT) AS n_total,
         |        sum(CAST(n - 1 AS HUGEINT) * ln_e9) FILTER (WHERE ok) AS swl,
         |        sum(sp_e6) AS ssp,
         |        CAST(sum(inv_e12) AS BIGINT) AS sinv
         |      FROM r),
         |f AS (SELECT ag.*, (k > 1 AND k = k_all AND n_total > k) AS allok,
         |        CAST(n_total - k AS DOUBLE) AS nk FROM ag),
         |f2 AS (SELECT f.*,
         |        (nk * ln(CAST(ssp AS DOUBLE) / 1e6 / nk)
         |           - CAST(swl AS DOUBLE) / 1e9)
         |        / (1.0 + (CAST(sinv AS DOUBLE) / 1e12 - 1.0 / nk)
         |           / (3.0 * CAST(k - 1 AS DOUBLE))) AS t
         |      FROM f),
         |f3 AS (SELECT f2.*,
         |        CASE WHEN allok THEN k - 1 END AS dof,
         |        CASE WHEN allok THEN CAST(floor(t * 1e6 + 0.5) AS BIGINT) END
         |          AS bartlett_t_e6
         |      FROM f2),
         |f4 AS (SELECT f3.*,
         |        CASE WHEN allok THEN CAST(($crit) AS BIGINT) END AS crit5_e4
         |      FROM f3)
         |SELECT n_total, k, dof, bartlett_t_e6, crit5_e4,
         |       CASE WHEN allok THEN bartlett_t_e6 > crit5_e4 * 100 END
         |         AS heteroscedastic
         |FROM f4""".stripMargin
    },

    // logistic GD, 3 iterations UNROLLED (the q339 pattern) — the sigmoid
    // and NLL are the SAME literal e6 tables the Spark plan uses
    // (interpolated from QualityClassifier.sigmoidTableE6 at SQL-build
    // time, the q276 discount-table precedent), z bucketed to the nearest
    // tenth via the posmod floor-div identity (negative z buckets
    // identically in both engines), weight step = floor-div by n
    "q350_x_logistic_slice" -> {
      val words = Seq("table", "query", "scan", "data",
        "fast", "window", "agg", "stream")
      val xs = "x0" +: words.indices.map(j => s"x${j + 1}")
      val sig = graft.text.QualityClassifier.sigmoidTableE6
        .mkString("[", ", ", "]")
      val nllp = graft.text.QualityClassifier.nllPosTableE6
        .mkString("[", ", ", "]")
      val nlln = graft.text.QualityClassifier.nllNegTableE6
        .mkString("[", ", ", "]")
      def fdiv(a: String, m: String) =
        s"((($a) - ((($a) % ($m) + ($m)) % ($m))) // ($m))"
      def margin(p: String) = xs.zipWithIndex
        .map { case (x, j) => s"$p$j*$x" }.mkString(" + ")
      def bucket(z: String) =
        s"greatest(least(${fdiv(s"($z) + 50000", "100000")}, 60), -60)"
      def err(p: String) =
        s"(list_extract($sig, CAST(${bucket(margin(p))} + 61 AS INT)) - y*1000000)"
      def step(prev: String, out: Char) = xs.zipWithIndex.map { case (x, j) =>
        s"CAST(max($prev$j) - ${fdiv(
          s"CAST(coalesce(sum(${err(prev)}*$x), 0) AS BIGINT)", "max(nd)")} AS BIGINT) AS $out$j"
      }.mkString(",\n  ")
      s"""WITH f AS (
         |  SELECT CAST(1 AS BIGINT) AS x0,
         |         ${words.zipWithIndex.map { case (w, j) =>
                      s"CAST(list_contains(toks, '$w') AS BIGINT) AS x${j + 1}"
                    }.mkString(",\n         ")},
         |         CAST(list_contains(toks, 'vector') AS BIGINT) AS y
         |  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS toks
         |        FROM documents WHERE text IS NOT NULL) t),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM f),
         |i0 AS (SELECT ${xs.indices.map(j =>
                  s"CAST(0 AS BIGINT) AS a$j").mkString(", ")}),
         |i1 AS (SELECT ${step("a", 'b')}
         |  FROM f CROSS JOIN i0 CROSS JOIN nn),
         |i2 AS (SELECT ${step("b", 'c')}
         |  FROM f CROSS JOIN i1 CROSS JOIN nn),
         |i3 AS (SELECT ${step("c", 'd')}
         |  FROM f CROSS JOIN i2 CROSS JOIN nn),
         |conf AS (SELECT
         |    ${xs.indices.map(j => s"max(d$j) AS w$j").mkString(", ")},
         |    CAST(sum(CASE WHEN y = 1
         |      THEN list_extract($nllp, CAST(${bucket(margin("d"))} + 61 AS INT))
         |      ELSE list_extract($nlln, CAST(${bucket(margin("d"))} + 61 AS INT))
         |      END) AS BIGINT) AS nll_e6,
         |    count(*) FILTER (WHERE y = 1 AND (${margin("d")}) > 0) AS tp,
         |    count(*) FILTER (WHERE y = 0 AND (${margin("d")}) > 0) AS fp,
         |    count(*) FILTER (WHERE y = 0 AND NOT ((${margin("d")}) > 0)) AS tn,
         |    count(*) FILTER (WHERE y = 1 AND NOT ((${margin("d")}) > 0)) AS fn
         |  FROM f CROSS JOIN i3)
         |SELECT ${xs.indices.map(j => s"w$j").mkString(", ")}, nll_e6,
         |       tp, fp, tn, fn,
         |       CASE WHEN tp+fp+tn+fn = 0 THEN 0
         |            ELSE (tp+tn)*1000000 // (tp+fp+tn+fn) END AS acc_e6
         |FROM conf""".stripMargin
    },

    // auto-N periodogram: the length-selection CASE + the q276 integer
    // DFT at the selected n; ONE combined coefficient table (all
    // candidates) rendered from the same Scala definition both engines
    // share
    "q358_u6_periodogram_auto_n" -> {
      val selCase = graft.stats.Diagnostics.AutoNCandidates.sorted.reverse
        .map(n => s"WHEN cnt >= $n THEN $n").mkString("CASE ", " ", " END")
      s"""WITH m AS (SELECT o_custkey AS ck,
         |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM orders GROUP BY 1, 2),
         |r AS (SELECT ck, cents,
         |    row_number() OVER (PARTITION BY ck ORDER BY month DESC) AS rnd,
         |    count(*) OVER (PARTITION BY ck) AS cnt
         |  FROM m),
         |sel AS (SELECT *, $selCase AS nsel FROM r),
         |tf AS MATERIALIZED (SELECT ck, cents, nsel, nsel - rnd AS t
         |      FROM sel WHERE nsel IS NOT NULL AND rnd <= nsel),
         |coef(n, k, t, c, s) AS (VALUES ${graft.stats.Diagnostics.dftTableAutoSql}),
         |su AS (SELECT ck, nsel, k,
         |         sum(CAST(cents AS HUGEINT) * c) AS sc,
         |         sum(CAST(cents AS HUGEINT) * s) AS ss
         |       FROM tf JOIN coef ON tf.nsel = coef.n AND tf.t = coef.t
         |       GROUP BY 1, 2, 3),
         |ik AS (SELECT *,
         |         ((CAST(sc AS DOUBLE) / 1e15) * (CAST(sc AS DOUBLE) / 1e15)
         |          + (CAST(ss AS DOUBLE) / 1e15) * (CAST(ss AS DOUBLE) / 1e15))
         |           AS p
         |       FROM su),
         |mx AS (SELECT *, max(p) OVER (PARTITION BY ck) AS mp FROM ik)
         |SELECT ck AS custkey, CAST(nsel AS INT) AS n_sel, k,
         |  CAST(floor(CAST(nsel AS DOUBLE) / CAST(k AS DOUBLE) * 1000 + 0.5)
         |    AS BIGINT) AS period_e3,
         |  CASE WHEN mp > 0 THEN CAST(floor(p / mp * 1000000 + 0.5) AS BIGINT)
         |    END AS share_e6,
         |  CASE WHEN mp > 0 THEN p = mp END AS is_peak
         |FROM mx ORDER BY custkey, k""".stripMargin
    },

    // DiD permutation placebo: the q352 moment/readout trees replayed
    // once on the real assignment and once per md5 pseudo-assignment
    // (dkHash32(unit ⊕ b) % 2), p on the rounded e6 estimates
    "q357_x_did_placebo" -> {
      def cells(t: String) = Seq(("00", s"NOT $t AND NOT p"),
        ("01", s"NOT $t AND p"), ("10", s"$t AND NOT p"), ("11", s"$t AND p"))
      def moments(t: String) = cells(t).map { case (c, w) =>
        s"""CAST(sum(CASE WHEN $w THEN 1 ELSE 0 END) AS BIGINT) AS n_$c,
           |    CAST(sum(CASE WHEN $w THEN x ELSE 0 END) AS BIGINT) AS s$c""".stripMargin
      }.mkString(",\n    ")
      def m(c: String) = s"(CAST(s$c AS DOUBLE) / n_$c)"
      val did = s"((${m("11")} - ${m("10")}) - (${m("01")} - ${m("00")}))"
      val allN1 = cells("t").map { case (c, _) => s"n_$c >= 1" }.mkString(" AND ")
      val didSel =
        s"""CASE WHEN $allN1 THEN
           |      CAST(floor($did * 1000000 + 0.5) AS BIGINT) END""".stripMargin
      val tb = s"((${dkHash32("CAST(unit AS VARCHAR)")}) // CAST(power(2, b) AS BIGINT))"
      s"""WITH o AS MATERIALIZED (
         |  SELECT o_orderpriority AS k, o_custkey AS unit,
         |         (c_mktsegment = 'BUILDING') AS t,
         |         (o_orderdate >= DATE '1995-07-01') AS p,
         |         CAST(floor(o_totalprice + 0.5) AS BIGINT) AS x
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
         |    AND c_mktsegment IS NOT NULL AND o_orderdate IS NOT NULL),
         |a0 AS (SELECT k,
         |    ${moments("t")}
         |  FROM o GROUP BY k),
         |f0 AS (SELECT k, $didSel AS did_obs_e6 FROM a0),
         |pe AS MATERIALIZED (
         |  SELECT k, b, ($tb % 2 = 0) AS tb, p, x
         |  FROM o CROSS JOIN (SELECT unnest(generate_series(1, 19)) AS b) bs
         |  WHERE unit IS NOT NULL),
         |a1 AS (SELECT k, b,
         |    ${moments("tb")}
         |  FROM pe GROUP BY k, b),
         |f1 AS (SELECT k, $didSel AS did_b FROM a1),
         |g AS (SELECT f1.k, max(f0.did_obs_e6) AS did_obs_e6,
         |        CAST(count(*) FILTER (WHERE did_b IS NOT NULL) AS BIGINT)
         |          AS n_reps,
         |        CAST(count(*) FILTER (WHERE abs(did_b) >= abs(f0.did_obs_e6))
         |          AS BIGINT) AS n_ge
         |      FROM f1 JOIN f0 ON f1.k = f0.k GROUP BY f1.k)
         |SELECT k AS o_orderpriority, did_obs_e6, n_reps, n_ge,
         |       CASE WHEN did_obs_e6 IS NOT NULL AND n_reps > 0
         |            THEN (1 + n_ge) * 1000000 // (n_reps + 1) END AS p_e6
         |FROM g ORDER BY k""".stripMargin
    },

    // IV Wald: six exact moments per key, the SAME mean-gap double trees
    // (first stage, ITT, ratio) the Spark expr uses
    "q356_x_iv_wald" -> {
      def mean(s: String, n: String) = s"(CAST($s AS DOUBLE) / $n)"
      val fs = s"(${mean("d1", "n_z1")} - ${mean("d0", "n_z0")})"
      val itt = s"(${mean("y1", "n_z1")} - ${mean("y0", "n_z0")})"
      val okC = "n_z0 >= 1 AND n_z1 >= 1"
      s"""WITH o AS (
         |  SELECT o_orderpriority AS k,
         |         (c_nationkey % 2 = 0) AS z,
         |         CAST(c_nationkey % 3 = 0 AS BIGINT) AS dt,
         |         CAST(floor(o_totalprice + 0.5) AS BIGINT) AS y
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
         |    AND c_nationkey IS NOT NULL),
         |a AS (SELECT k,
         |    CAST(sum(CASE WHEN NOT z THEN 1 ELSE 0 END) AS BIGINT) AS n_z0,
         |    CAST(sum(CASE WHEN z THEN 1 ELSE 0 END) AS BIGINT) AS n_z1,
         |    CAST(sum(CASE WHEN NOT z THEN dt ELSE 0 END) AS BIGINT) AS d0,
         |    CAST(sum(CASE WHEN z THEN dt ELSE 0 END) AS BIGINT) AS d1,
         |    CAST(sum(CASE WHEN NOT z THEN y ELSE 0 END) AS BIGINT) AS y0,
         |    CAST(sum(CASE WHEN z THEN y ELSE 0 END) AS BIGINT) AS y1
         |  FROM o GROUP BY k)
         |SELECT k AS o_orderpriority, n_z0, n_z1,
         |  CASE WHEN $okC THEN
         |    CAST(floor($fs * 1000000 + 0.5) AS BIGINT) END AS fs_e6,
         |  CASE WHEN $okC THEN
         |    CAST(floor($itt * 1000000 + 0.5) AS BIGINT) END AS itt_e6,
         |  CASE WHEN $okC AND $fs != 0 THEN
         |    CAST(floor($itt / $fs * 1000000 + 0.5) AS BIGINT) END AS late_e6
         |FROM a ORDER BY k""".stripMargin
    },

    // sharp RDD: six exact moments per side per key, then the SAME fixed
    // double trees (slope, intercept, RSS, intercept variance) the Spark
    // expr uses; u = days from the cutoff, sides u<0 / u>=0 within ±60
    "q354_x_regression_discontinuity" -> {
      val sides = Seq(("l", "u < 0"), ("r", "u >= 0"))
      val moments = sides.map { case (s, w) =>
        s"""CAST(sum(CASE WHEN $w THEN 1 ELSE 0 END) AS BIGINT) AS n_$s,
           |    CAST(sum(CASE WHEN $w THEN u ELSE 0 END) AS BIGINT) AS su$s,
           |    CAST(sum(CASE WHEN $w THEN y ELSE 0 END) AS BIGINT) AS sy$s,
           |    sum(CASE WHEN $w THEN CAST(u AS HUGEINT) * y
           |        ELSE CAST(0 AS HUGEINT) END) AS suy$s,
           |    sum(CASE WHEN $w THEN CAST(u AS HUGEINT) * u
           |        ELSE CAST(0 AS HUGEINT) END) AS suu$s,
           |    sum(CASE WHEN $w THEN CAST(y AS HUGEINT) * y
           |        ELSE CAST(0 AS HUGEINT) END) AS syy$s""".stripMargin
      }.mkString(",\n    ")
      def den(s: String) =
        s"(CAST(n_$s AS DOUBLE) * CAST(suu$s AS DOUBLE) - CAST(su$s AS DOUBLE) * CAST(su$s AS DOUBLE))"
      def b(s: String) =
        s"((CAST(n_$s AS DOUBLE) * CAST(suy$s AS DOUBLE) - CAST(su$s AS DOUBLE) * CAST(sy$s AS DOUBLE)) / ${den(s)})"
      def a(s: String) =
        s"((CAST(sy$s AS DOUBLE) - ${b(s)} * CAST(su$s AS DOUBLE)) / CAST(n_$s AS DOUBLE))"
      def rss(s: String) =
        s"(CAST(syy$s AS DOUBLE) - ${a(s)} * CAST(sy$s AS DOUBLE) - ${b(s)} * CAST(suy$s AS DOUBLE))"
      def va(s: String) =
        s"((${rss(s)} / (CAST(n_$s AS DOUBLE) - 2.0)) * CAST(suu$s AS DOUBLE) / ${den(s)})"
      val okEst = s"n_l >= 2 AND n_r >= 2 AND ${den("l")} != 0 AND ${den("r")} != 0"
      val okT = s"$okEst AND n_l >= 3 AND n_r >= 3 AND (${va("l")} + ${va("r")}) > 0"
      val tau = s"(${a("r")} - ${a("l")})"
      s"""WITH o AS (
         |  SELECT o_orderpriority AS k,
         |         CAST(date_diff('day', DATE '1995-07-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS u,
         |         CAST(floor(o_totalprice + 0.5) AS BIGINT) AS y
         |  FROM orders
         |  WHERE o_orderpriority IS NOT NULL AND o_orderdate IS NOT NULL
         |    AND o_totalprice IS NOT NULL
         |    AND date_diff('day', DATE '1995-07-01', CAST(o_orderdate AS DATE)) BETWEEN -60 AND 60),
         |ag AS (SELECT k,
         |    $moments
         |  FROM o GROUP BY k),
         |f AS (SELECT k AS o_orderpriority, n_l, n_r,
         |    CASE WHEN $okEst THEN
         |      CAST(floor(${a("l")} * 1000000 + 0.5) AS BIGINT) END AS a_l_e6,
         |    CASE WHEN $okEst THEN
         |      CAST(floor(${a("r")} * 1000000 + 0.5) AS BIGINT) END AS a_r_e6,
         |    CASE WHEN $okEst THEN
         |      CAST(floor(${b("l")} * 1000000 + 0.5) AS BIGINT) END AS b_l_e6,
         |    CASE WHEN $okEst THEN
         |      CAST(floor(${b("r")} * 1000000 + 0.5) AS BIGINT) END AS b_r_e6,
         |    CASE WHEN $okEst THEN
         |      CAST(floor($tau * 1000000 + 0.5) AS BIGINT) END AS tau_e6,
         |    CASE WHEN $okT THEN
         |      CAST(floor($tau / sqrt(${va("l")} + ${va("r")}) * 10000 + 0.5)
         |        AS BIGINT) END AS t_e4
         |  FROM ag)
         |SELECT f.*, CASE WHEN t_e4 IS NOT NULL THEN abs(t_e4) > 19600 END
         |         AS significant
         |FROM f ORDER BY o_orderpriority""".stripMargin
    },

    // split conformal: md5 split replayed, train group means as EXACT
    // integral division of HUGEINT sums (non-negative ⇒ truncation =
    // floor = Spark's decimal `div`), q̂ as the exact rank-k order
    // statistic over the calibration residual grid, coverage on test
    "q353_x_conformal_interval" -> {
      val key = dkHash32(
        "CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)")
      s"""WITH b AS MATERIALIZED (
         |  SELECT rf, ls,
         |         CASE WHEN bb < 800 THEN 'train' WHEN bb < 900 THEN 'val'
         |              ELSE 'test' END AS sp,
         |         y2
         |  FROM (SELECT l_returnflag AS rf, l_linestatus AS ls,
         |          $key % 1000 AS bb,
         |          CAST(floor(l_extendedprice + 0.5) AS BIGINT) * 100 AS y2
         |        FROM lineitem
         |        WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
         |          AND l_extendedprice IS NOT NULL)),
         |m AS MATERIALIZED (
         |  SELECT rf, ls,
         |         CAST(sum(CAST(y2 AS HUGEINT)) // count(*) AS BIGINT) AS yhat2
         |  FROM b WHERE sp = 'train' GROUP BY 1, 2),
         |ntr AS (SELECT CAST(count(*) AS BIGINT) AS n_train
         |        FROM b WHERE sp = 'train'),
         |cal AS (SELECT abs(b.y2 - m.yhat2) AS r2
         |        FROM b JOIN m ON b.rf = m.rf AND b.ls = m.ls
         |        WHERE b.sp = 'val'),
         |g AS (SELECT r2, CAST(count(*) AS BIGINT) AS c FROM cal GROUP BY 1),
         |gc AS (SELECT r2,
         |         sum(c) OVER (ORDER BY r2
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         sum(c) OVER () AS n FROM g),
         |q AS (SELECT CAST(max(n) AS BIGINT) AS n_cal,
         |        CAST(max(((n + 1) * 900 + 999) // 1000) AS BIGINT) AS k,
         |        min(CASE WHEN cum >= ((n + 1) * 900 + 999) // 1000
         |                 THEN r2 END) AS qhat_e2
         |      FROM gc),
         |t AS (SELECT b.y2, m.yhat2, abs(b.y2 - m.yhat2) AS r2
         |      FROM b LEFT JOIN m ON b.rf = m.rf AND b.ls = m.ls
         |      WHERE b.sp = 'test'),
         |f AS (SELECT
         |        CAST(count(*) FILTER (WHERE t.yhat2 IS NOT NULL) AS BIGINT)
         |          AS n_test_scored,
         |        CAST(count(*) FILTER (WHERE t.yhat2 IS NULL) AS BIGINT)
         |          AS n_test_unscored,
         |        CAST(count(*) FILTER (WHERE t.r2 <= q.qhat_e2) AS BIGINT)
         |          AS n_covered
         |      FROM t CROSS JOIN q)
         |SELECT ntr.n_train, q.n_cal, q.k, q.qhat_e2, f.*,
         |       CASE WHEN q.qhat_e2 IS NOT NULL AND f.n_test_scored > 0
         |            THEN f.n_covered * 1000000 // f.n_test_scored END AS cov_e6
         |FROM ntr CROSS JOIN q CROSS JOIN f""".stripMargin
    },

    // 2x2 DiD: twelve exact integer moments per key, then the SAME
    // fixed double trees the Spark expr uses (did, robust SE over the
    // four independent cell means), e6/e4 readouts; significant decided
    // on the rounded t
    "q352_x_diff_in_diff" -> {
      val cells = Seq(("00", "NOT t AND NOT p"), ("01", "NOT t AND p"),
        ("10", "t AND NOT p"), ("11", "t AND p"))
      val moments = cells.map { case (c, w) =>
        s"""CAST(sum(CASE WHEN $w THEN 1 ELSE 0 END) AS BIGINT) AS n_$c,
           |    CAST(sum(CASE WHEN $w THEN x ELSE 0 END) AS BIGINT) AS s$c,
           |    sum(CASE WHEN $w THEN CAST(x AS HUGEINT) * x
           |        ELSE CAST(0 AS HUGEINT) END) AS q$c""".stripMargin
      }.mkString(",\n    ")
      def v(c: String) =
        s"((CAST(q$c AS DOUBLE) - CAST(s$c AS DOUBLE) * s$c / n_$c) / (n_$c - 1))"
      def m(c: String) = s"(CAST(s$c AS DOUBLE) / n_$c)"
      val did = s"((${m("11")} - ${m("10")}) - (${m("01")} - ${m("00")}))"
      val se2 = cells.map { case (c, _) => s"${v(c)} / n_$c" }.mkString(" + ")
      val allN1 = cells.map { case (c, _) => s"n_$c >= 1" }.mkString(" AND ")
      val allN2 = cells.map { case (c, _) => s"n_$c >= 2" }.mkString(" AND ")
      s"""WITH o AS (
         |  SELECT o_orderpriority AS k,
         |         (c_mktsegment = 'BUILDING') AS t,
         |         (o_orderdate >= DATE '1995-07-01') AS p,
         |         CAST(floor(o_totalprice + 0.5) AS BIGINT) AS x
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
         |    AND c_mktsegment IS NOT NULL AND o_orderdate IS NOT NULL),
         |a AS (SELECT k,
         |    $moments
         |  FROM o GROUP BY k),
         |f AS (SELECT k AS o_orderpriority,
         |    n_00, n_01, n_10, n_11,
         |    s00 * 100 // nullif(n_00, 0) AS mean_00_e2,
         |    s01 * 100 // nullif(n_01, 0) AS mean_01_e2,
         |    s10 * 100 // nullif(n_10, 0) AS mean_10_e2,
         |    s11 * 100 // nullif(n_11, 0) AS mean_11_e2,
         |    CASE WHEN $allN1 THEN
         |      CAST(floor($did * 1000000 + 0.5) AS BIGINT) END AS did_e6,
         |    CASE WHEN $allN2 AND ($se2) > 0 THEN
         |      CAST(floor($did / sqrt($se2) * 10000 + 0.5) AS BIGINT)
         |    END AS t_e4
         |  FROM a)
         |SELECT f.*, CASE WHEN t_e4 IS NOT NULL THEN abs(t_e4) > 19600 END
         |         AS significant
         |FROM f ORDER BY o_orderpriority""".stripMargin
    },

    // PCA power iteration, 3 rescaled matvecs + Rayleigh UNROLLED — the
    // scatter matrix S = n·Σxx − (Σx)(Σx)ᵀ in exact HUGEINT from per-row
    // e6 components, A = fdiv(S·1e6, max|S|), all rescales and readouts
    // the same posmod floor-div identity the Spark driver uses
    "q351_x_pca_power_slice" -> {
      def fdiv(a: String, m: String) =
        s"((($a) - ((($a) % ($m) + ($m)) % ($m))) // ($m))"
      def mv(out: String, vin: String) =
        s"""$out AS MATERIALIZED (SELECT am.i, sum(am.av * v.v) AS u
           |  FROM am JOIN $vin v ON v.i = am.j GROUP BY 1)""".stripMargin
      def rescale(out: String, uin: String) =
        s"""$out AS MATERIALIZED (SELECT i, ${fdiv("u * 1000000",
             s"(SELECT max(abs(u)) FROM $uin)")} AS v FROM $uin)""".stripMargin
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, i,
         |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5)
         |           AS BIGINT) AS x
         |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g
         |  WHERE embedding IS NOT NULL AND len(embedding) = 64),
         |nn AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings
         |       WHERE embedding IS NOT NULL AND len(embedding) = 64),
         |sx AS MATERIALIZED (SELECT i, CAST(sum(x) AS HUGEINT) AS sx FROM e GROUP BY 1),
         |sxx AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
         |          sum(CAST(a.x AS HUGEINT) * b.x) AS sxx
         |        FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY 1, 2),
         |s AS MATERIALIZED (SELECT sxx.i, sxx.j, nn.n * sxx.sxx - sa.sx * sb.sx AS sv
         |      FROM sxx JOIN sx sa ON sa.i = sxx.i
         |      JOIN sx sb ON sb.i = sxx.j CROSS JOIN nn),
         |mx AS MATERIALIZED (SELECT max(abs(sv)) AS m FROM s),
         |am AS MATERIALIZED (SELECT i, j,
         |         ${fdiv("sv * 1000000", "(SELECT m FROM mx)")} AS av FROM s),
         |v0 AS MATERIALIZED (SELECT unnest(generate_series(1, 64)) AS i,
         |              CAST(1000000 AS HUGEINT) AS v),
         |${mv("u1", "v0")},
         |${rescale("v1", "u1")},
         |${mv("u2", "v1")},
         |${rescale("v2", "u2")},
         |${mv("u3", "v2")},
         |${rescale("v3", "u3")},
         |${mv("u4", "v3")},
         |ray AS MATERIALIZED (SELECT ${fdiv(
             "(SELECT sum(u4.u * v3.v) FROM u4 JOIN v3 ON v3.i = u4.i) * 1000000",
             "(SELECT sum(v * v) FROM v3)")} AS ray_e6),
         |tr AS MATERIALIZED (SELECT sum(sv) AS t FROM s WHERE i = j),
         |top AS MATERIALIZED (SELECT i, CASE WHEN v > 0 THEN 1 WHEN v < 0 THEN -1 ELSE 0 END
         |          AS sg FROM v3 ORDER BY abs(v) DESC, i LIMIT 1),
         |f1 AS MATERIALIZED (SELECT CAST(nn.n AS BIGINT) AS n,
         |         CAST(${fdiv("ray.ray_e6 * mx.m",
             "nn.n * nn.n * 1000000000000000000")} AS BIGINT) AS lam1_e6,
         |         CAST(${fdiv("tr.t", "nn.n * nn.n * 1000000")} AS BIGINT)
         |           AS trace_e6,
         |         CAST(ray.ray_e6 AS BIGINT) AS ray_e6,
         |         CAST(top.i AS INT) AS top_dim, CAST(top.sg AS INT) AS top_sign
         |       FROM nn CROSS JOIN ray CROSS JOIN tr
         |       CROSS JOIN mx CROSS JOIN top)
         |SELECT n, lam1_e6, trace_e6,
         |       CASE WHEN trace_e6 > 0
         |            THEN CAST(${fdiv("CAST(lam1_e6 AS HUGEINT) * 1000000",
             "trace_e6")} AS BIGINT)
         |            ELSE CAST(0 AS BIGINT) END AS anis_e6,
         |       ray_e6, top_dim, top_sign
         |FROM f1""".stripMargin
    },

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
  )
}
