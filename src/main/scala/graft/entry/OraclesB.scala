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

/** DuckDB oracle registry, second tranche (q81–q252). Merged into [[SparkEntry.oracleSql]]. */
private[graft] object OraclesB {
  private[graft] val m: Map[String, String] = Map(
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
  )
}
