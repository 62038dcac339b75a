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

/** DuckDB oracle registry, third tranche (q253–q284). Merged into [[SparkEntry.oracleSql]]. */
private[graft] object OraclesC {
  private[graft] val m: Map[String, String] = Map(
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
    },

    // candidate-period seasonal scan: the SAME (p, r) e15 trig table
    // inlined (seasonalTableSql — one definition, both engines), exact
    // HUGEINT demeaned sums via n·Σxc − Σx·Σc, the identical double
    // power tree, smallest-p argmax
    "q370_u6_seasonal_grid" -> {
      val ikD = "((CAST(sc AS DOUBLE) / 1e15) * (CAST(sc AS DOUBLE) / 1e15)" +
        " + (CAST(ss AS DOUBLE) / 1e15) * (CAST(ss AS DOUBLE) / 1e15))"
      s"""WITH m AS (SELECT o_orderpriority AS prio,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1, 2),
        |b AS (SELECT prio, CAST(floor(cents) AS BIGINT) AS x,
        |        row_number() OVER (PARTITION BY prio ORDER BY month) - 1 AS t,
        |        CAST(count(*) OVER (PARTITION BY prio) AS BIGINT) AS n,
        |        CAST(sum(cents) OVER (PARTITION BY prio) AS BIGINT) AS sy
        |      FROM m),
        |tab(p, r, c, s) AS (VALUES ${graft.stats.Diagnostics.seasonalTableSql(24)}),
        |j AS (SELECT b.prio, CAST(max(b.n) AS HUGEINT) AS n,
        |        CAST(max(b.sy) AS HUGEINT) AS sy, tab.p,
        |        sum(CAST(b.x AS HUGEINT) * tab.c) AS xc,
        |        sum(CAST(b.x AS HUGEINT) * tab.s) AS xs,
        |        sum(CAST(tab.c AS HUGEINT)) AS cc,
        |        sum(CAST(tab.s AS HUGEINT)) AS cs
        |      FROM b JOIN tab ON tab.p <= b.n // 2 AND b.t % tab.p = tab.r
        |      WHERE b.n >= 4
        |      GROUP BY b.prio, tab.p),
        |pw AS (SELECT prio, p, n * xc - sy * cc AS sc, n * xs - sy * cs AS ss
        |       FROM j),
        |ik AS (SELECT prio, p, $ikD AS ik FROM pw),
        |mx AS (SELECT prio, p, ik, max(ik) OVER (PARTITION BY prio) AS mik
        |       FROM ik),
        |bst AS (SELECT *, min(CASE WHEN ik = mik THEN p END)
        |          OVER (PARTITION BY prio) AS bestp
        |        FROM mx)
        |SELECT prio, CAST(p AS INT) AS p,
        |  CASE WHEN mik > 0 THEN CAST(floor(ik / mik * 1000000 + 0.5) AS BIGINT)
        |  END AS share_e6,
        |  p = bestp AS is_best
        |FROM bst ORDER BY prio, p""".stripMargin
    },

    // q335's unrolled count->argmax->apply rounds PLUS the learner's
    // minPairCount stop: each round's argmax is guarded on the
    // threshold (a sub-threshold round emits nothing and the apply
    // no-ops, which — counts being non-increasing — carries the stop
    // through every later round). AS MATERIALIZED throughout: the
    // 8-round chain re-expands exponentially under DuckDB's default
    // CTE inlining (the q351 lesson).
    "q371_x_bpe_merge_stop" -> {
      val k = 8
      val minCnt = 1850L
      val run5 = ('a' to 'z').map(c => c.toString * 5).mkString("|")
      def pairCte(p: String, sIn: String): String =
        s"""$p AS MATERIALIZED (
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
        s"""$sOut AS MATERIALIZED (
           |  SELECT CASE WHEN (SELECT count(*) FROM $m) = 0 THEN s
           |    ELSE replace(replace(s,
           |      '|' || (SELECT l FROM $m) || '|' || (SELECT r FROM $m) || '|',
           |      '|' || (SELECT l || r FROM $m) || '|'),
           |      '|' || (SELECT l FROM $m) || '|' || (SELECT r FROM $m) || '|',
           |      '|' || (SELECT l || r FROM $m) || '|') END AS s, c
           |  FROM $sIn)""".stripMargin
      val rounds = (0 until k).map { i =>
        val apply =
          if (i == 0) ""
          else applyCte(s"s$i", s"s${i - 1}", s"m${i - 1}") + ",\n"
        s"""$apply${pairCte(s"p$i", s"s$i")},
           |m$i AS MATERIALIZED (SELECT l, r, cnt FROM p$i WHERE cnt >= $minCnt
           |  ORDER BY cnt DESC, l, r LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val union = (0 until k).map(i =>
        s"SELECT CAST($i AS BIGINT) AS rank, l AS left_sym, r AS right_sym, cnt AS pair_count FROM m$i")
        .mkString("\nUNION ALL ")
      s"""WITH wraw AS MATERIALIZED (
         |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
         |  FROM documents WHERE text IS NOT NULL),
         |w AS MATERIALIZED (
         |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM wraw
         |  WHERE length(w) BETWEEN 2 AND 9
         |    AND NOT regexp_matches(w, '$run5')
         |  GROUP BY 1),
         |s0 AS MATERIALIZED (
         |  SELECT '|' || array_to_string(string_split(w, ''), '|') || '|'
         |    AS s, c FROM w),
         |$rounds
         |SELECT * FROM ($union) ORDER BY rank""".stripMargin
    },

    // Tukey HSD: the anovaOneWay integer discipline (HUGEINT // group
    // squares, exact SSW), pairwise studentized range as the identical
    // double tree, verdict on the ROUNDED q against the shared
    // q(0.05; 5, inf) e4 literal
    "q373_x_tukey_hsd" -> {
      val critE4 = graft.operators.Metrics.tukeyQCritInfE4(5)
      val msw = "(CAST(ssw AS DOUBLE) / CAST(n - k AS DOUBLE))"
      val diff = "(CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b)"
      val se = s"sqrt($msw / 2.0 * (1.0 / n_a + 1.0 / n_b))"
      s"""WITH o AS (
        |  SELECT o_orderpriority AS g,
        |         CAST(floor(o_totalprice + 0.5) AS BIGINT) AS x
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
        |pg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |         CAST(sum(x) AS BIGINT) AS sg,
        |         sum(CAST(x AS HUGEINT) * x) AS qg,
        |         (CAST(sum(x) AS HUGEINT) * CAST(sum(x) AS BIGINT))
        |           // CAST(count(*) AS BIGINT) AS tg
        |       FROM o GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |          CAST(sum(ng) AS BIGINT) AS n,
        |          CAST(sum(qg) - sum(tg) AS BIGINT) AS ssw,
        |          CAST(min(ng) AS BIGINT) AS minn
        |        FROM pg),
        |pr AS (SELECT a.g AS g_a, b.g AS g_b, a.ng AS n_a, b.ng AS n_b,
        |         a.sg AS sa, b.sg AS sb
        |       FROM pg a JOIN pg b ON a.g < b.g)
        |SELECT g_a, g_b, n_a, n_b,
        |  CAST(floor($diff * 1000000 + 0.5) AS BIGINT) AS diff_e6,
        |  CASE WHEN k >= 2 AND n > k AND ssw > 0 AND minn >= 2 THEN
        |    CAST(floor(abs($diff) / $se * 10000 + 0.5) AS BIGINT)
        |  END AS q_e4,
        |  CAST($critE4 AS BIGINT) AS q_crit_e4,
        |  CASE WHEN k >= 2 AND n > k AND ssw > 0 AND minn >= 2 THEN
        |    CAST(floor(abs($diff) / $se * 10000 + 0.5) AS BIGINT) > $critE4
        |  END AS significant
        |FROM pr CROSS JOIN tot ORDER BY g_a, g_b""".stripMargin
    },

    // Theta method: exact-integer OLS sums (closed-form st/stt), the
    // identical a/b double trees, the SES(1/2) recursion over the
    // theta2 line replayed per key (the q366 key-carrying recursion)
    "q374_x_theta_forecast" ->
      ("""WITH RECURSIVE m AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) // 100 AS y
        |  FROM orders GROUP BY 1, 2),
        |o AS (SELECT prio,
        |        CAST(row_number() OVER (PARTITION BY prio ORDER BY month)
        |          AS BIGINT) AS t, y
        |      FROM m),
        |s AS (SELECT prio, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(t) AS BIGINT) AS st, CAST(sum(t * t) AS BIGINT) AS stt,
        |        CAST(sum(y) AS BIGINT) AS sy, CAST(sum(t * y) AS BIGINT) AS sty
        |      FROM o GROUP BY 1),
        |c AS (SELECT prio, n,
        |        CAST(n * sty - st * sy AS DOUBLE)
        |          / CAST(n * stt - st * st AS DOUBLE) AS b,
        |        (CAST(sy AS DOUBLE)
        |          - CAST(n * sty - st * sy AS DOUBLE)
        |            / CAST(n * stt - st * st AS DOUBLE)
        |            * CAST(st AS DOUBLE)) / n AS a
        |      FROM s WHERE n >= 3 AND n * stt - st * st <> 0),
        |rec AS (
        |  SELECT o.prio, CAST(1 AS BIGINT) AS t,
        |         2.0 * o.y - (c.a + c.b * 1) AS l, c.a AS a, c.b AS b, c.n AS n
        |  FROM o JOIN c ON o.prio = c.prio WHERE o.t = 1
        |  UNION ALL
        |  SELECT rec.prio, rec.t + 1,
        |         0.5 * (2.0 * o.y - (rec.a + rec.b * (rec.t + 1))) + 0.5 * rec.l,
        |         rec.a, rec.b, rec.n
        |  FROM rec JOIN o ON o.prio = rec.prio AND o.t = rec.t + 1),
        |fin AS (SELECT prio, a, b, n, l FROM (
        |          SELECT *, row_number() OVER (PARTITION BY prio ORDER BY t DESC)
        |            AS rn FROM rec) WHERE rn = 1)
        |SELECT prio AS key, CAST(n AS INT) AS n_obs, round(b, 4) AS slope,
        |       round(l, 4) AS level, CAST(h AS INT) AS step,
        |       round(0.5 * (a + b * (n + h)) + 0.5 * l, 4) AS forecast
        |FROM fin CROSS JOIN generate_series(1, 6) AS g(h)
        |ORDER BY key, step""".stripMargin),

    // MMR: the same brute-force pool (round-before-rank cosines, id
    // ties), pool-pair sims e4-floored from the RAW cosine (the kernel's
    // convention), and the k greedy rounds unrolled — each round's
    // argmax on the exact integer rel − greatest(0, sims to selected).
    // MATERIALIZED: the round chain re-references pool/pp (q351 lesson)
    "q375_x_mmr_topk" -> {
      val dim = 64; val k = 4; val poolSize = 12
      def dot(l: String, r: String) =
        s"list_sum(list_transform(generate_series(1, $dim), i -> CAST($l[i] AS DOUBLE) * CAST($r[i] AS DOUBLE)))"
      def cosRaw(l: String, r: String) =
        s"(${dot(l, r)} / nullif(sqrt(${dot(l, l)}) * sqrt(${dot(r, r)}), 0))"
      val rounds = (2 to k).map { r =>
        val prev = (1 until r).map(j => s"s$j")
        val excl = prev.map(p => s"p.id <> $p.id").mkString(" AND ")
        val joins = prev.map(p =>
          s"JOIN $p ON $p.query_id = p.query_id").mkString("\n         |  ") +
          "\n         |  " + prev.zipWithIndex.map { case (p, i) =>
            s"JOIN pp x$i ON x$i.query_id = p.query_id AND x$i.ia = p.id AND x$i.ib = $p.id"
          }.mkString("\n         |  ")
        val sims = prev.indices.map(i => s"x$i.s").mkString(", ")
        s"""r$r AS (SELECT p.query_id, p.id, p.rel,
           |    p.rel - greatest(0, $sims) AS sc
           |  FROM pool p
           |  $joins
           |  WHERE $excl),
           |s$r AS MATERIALIZED (SELECT query_id, id, rel, sc FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY sc DESC, id) AS rn FROM r$r) WHERE rn = 1)"""
          .stripMargin
      }.mkString(",\n")
      val union = (1 to k).map(r =>
        s"SELECT CAST(query_id AS BIGINT) AS query_id, CAST($r AS INT) AS step, CAST(id AS BIGINT) AS neighbor_id, rel AS rel_e4, sc AS score2_e4 FROM s$r")
        .mkString("\nUNION ALL ")
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id < 6),
         |c AS MATERIALIZED (
         |  SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id < 200),
         |scq AS MATERIALIZED (
         |  SELECT q.id AS query_id, c.id AS nid,
         |         round(${cosRaw("q.embedding", "c.embedding")}, 4) AS cs
         |  FROM q JOIN c ON q.id <> c.id),
         |pool AS MATERIALIZED (
         |  SELECT query_id, nid AS id,
         |         CAST(floor(cs * 10000 + 0.5) AS BIGINT) AS rel
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |          ORDER BY cs DESC, nid) AS rn FROM scq)
         |  WHERE rn <= $poolSize),
         |pe AS MATERIALIZED (
         |  SELECT pool.query_id, pool.id, c.embedding
         |  FROM pool JOIN c ON c.id = pool.id),
         |pp AS MATERIALIZED (
         |  SELECT a.query_id, a.id AS ia, b.id AS ib,
         |    CAST(floor(${cosRaw("a.embedding", "b.embedding")} * 10000 + 0.5)
         |      AS BIGINT) AS s
         |  FROM pe a JOIN pe b ON a.query_id = b.query_id AND a.id <> b.id),
         |s1 AS MATERIALIZED (SELECT query_id, id, rel, rel AS sc FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY rel DESC, id) AS rn FROM pool) WHERE rn = 1),
         |$rounds
         |SELECT * FROM ($union) ORDER BY query_id, step""".stripMargin
    },

    // Breusch–Pagan: the q142 fit trees, per-row squared residual
    // floor-quantized (HUGEINT — the q349 identity's oracle side),
    // exact auxiliary sums, one R²/LM double tree. Kilodollar grid
    // (// 100000) mirroring the registration's fence-headroom rescale.
    "q376_x_breusch_pagan" -> {
      val b = "(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))"
      val a = s"((CAST(sy AS DOUBLE) - $b * CAST(sx AS DOUBLE)) / n)"
      val res = "(CAST(u.y AS DOUBLE) - (f.a + f.b * CAST(u.x AS DOUBLE)))"
      val num = "(CAST(n AS HUGEINT) * sxu - CAST(sx AS HUGEINT) * su)"
      val denU = "(CAST(n AS HUGEINT) * suu - su * su)"
      val r2 = s"(CAST($num AS DOUBLE) * CAST($num AS DOUBLE)" +
        s" / (CAST(den AS DOUBLE) * CAST($denU AS DOUBLE)))"
      s"""WITH m AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS x,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) // 100000 AS y
        |  FROM orders GROUP BY 1, 2),
        |s AS (SELECT prio, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |        CAST(sum(x * y) AS BIGINT) AS sxy,
        |        CAST(sum(x * x) AS BIGINT) AS sxx
        |      FROM m GROUP BY 1),
        |f AS (SELECT prio, n, sx, n * sxx - sx * sx AS den,
        |        $b AS b, $a AS a
        |      FROM s WHERE n * sxx - sx * sx <> 0),
        |uu AS (SELECT u.prio, u.x,
        |         CAST(floor($res * $res + 0.5) AS HUGEINT) AS uq
        |       FROM m u JOIN f ON u.prio = f.prio),
        |ax AS (SELECT f.prio, max(f.n) AS n, max(f.sx) AS sx,
        |         max(f.den) AS den, max(f.b) AS b,
        |         sum(uu.uq) AS su, sum(uu.uq * uu.x) AS sxu,
        |         sum(uu.uq * uu.uq) AS suu
        |       FROM uu JOIN f ON uu.prio = f.prio GROUP BY f.prio)
        |SELECT prio, n, floor(b * 1000000 + 0.5) / 1000000 AS slope,
        |  CASE WHEN n >= 3 AND den != 0 AND $denU > 0 THEN
        |    CAST(floor(n * $r2 * 10000 + 0.5) AS BIGINT) END AS lm_e4,
        |  CASE WHEN n >= 3 AND den != 0 AND $denU > 0 THEN
        |    CAST(floor(n * $r2 * 10000 + 0.5) AS BIGINT) > 38415
        |  END AS heteroscedastic
        |FROM ax ORDER BY prio""".stripMargin
    },

    // CMH: per-stratum exact 2x2 counts, E/V each one double tree
    // e6-floored to HUGEINT (the bartlett per-group discipline), exact
    // cross-strata sums, one readout tree on the rounded value
    "q377_x_cmh_test" -> {
      val eT = "(CAST(n1 AS DOUBLE) * CAST(m1 AS DOUBLE) / CAST(nn AS DOUBLE))"
      val vT = "(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)" +
        " * CAST(m1 AS DOUBLE) * CAST(m2 AS DOUBLE)" +
        " / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE)))"
      val num = "CAST(CAST(sum_a AS HUGEINT) * 1000000 - se AS DOUBLE)"
      s"""WITH o AS (
        |  SELECT o_orderpriority AS st, (o_custkey % 2 = 0) AS e,
        |         (o_totalprice >= 150000.0) AS y
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_custkey IS NOT NULL
        |    AND o_totalprice IS NOT NULL),
        |g AS (SELECT st,
        |        CAST(sum(CASE WHEN e AND y THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |        CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |        CAST(sum(CASE WHEN NOT e THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |        CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS m1,
        |        CAST(sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT) AS m2,
        |        CAST(count(*) AS BIGINT) AS nn
        |      FROM o GROUP BY 1),
        |t AS (SELECT *, nn >= 2 AS ok,
        |        CASE WHEN nn >= 2 THEN
        |          CAST(floor($eT * 1000000 + 0.5) AS HUGEINT) END AS e6,
        |        CASE WHEN nn >= 2 THEN
        |          CAST(floor($vT * 1000000 + 0.5) AS HUGEINT) END AS v6
        |      FROM g),
        |ag AS (SELECT CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
        |          AS k_strata,
        |        CAST(sum(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_degenerate,
        |        CAST(coalesce(sum(CASE WHEN ok THEN nn END), 0) AS BIGINT)
        |          AS n_total,
        |        CAST(coalesce(sum(CASE WHEN ok THEN a END), 0) AS BIGINT)
        |          AS sum_a,
        |        sum(e6) AS se, sum(v6) AS sv
        |      FROM t)
        |SELECT k_strata, n_degenerate, n_total, sum_a,
        |  CASE WHEN k_strata >= 1 AND sv > 0 THEN
        |    CAST(floor($num * $num / (CAST(sv AS DOUBLE) * 1000000.0)
        |      * 10000 + 0.5) AS BIGINT) END AS cmh_e4,
        |  CASE WHEN k_strata >= 1 AND sv > 0 THEN
        |    CAST(floor($num * $num / (CAST(sv AS DOUBLE) * 1000000.0)
        |      * 10000 + 0.5) AS BIGINT) > 38415
        |  END AS significant
        |FROM ag""".stripMargin
    },

    // Yeo-Johnson grid: the identical branch trees (ln/power spelled the
    // same), per-(row, λ) e6 quantization BEFORE the exact HUGEINT sums,
    // the identical σ²/llf double trees, smallest-λ argmax
    "q379_u4_yeojohnson_grid" -> {
      val lam = "(CAST(lambda_e1 AS DOUBLE) / 10.0)"
      val z =
        s"""(CASE
           |  WHEN x >= 0 AND lambda_e1 = 0 THEN ln(1.0 + x)
           |  WHEN x >= 0 THEN (power(x + 1.0, $lam) - 1.0) / $lam
           |  WHEN lambda_e1 = 20 THEN -ln(1.0 - x)
           |  ELSE -(power(1.0 - x, 2.0 - $lam) - 1.0) / (2.0 - $lam)
           |END)""".stripMargin.replaceAll("\n", " ")
      val sl = "(CASE WHEN x >= 0 THEN ln(1.0 + x) ELSE -ln(1.0 - x) END)"
      val v = """((CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
                | - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))
                | / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e12)"""
        .stripMargin.replaceAll("\n", " ")
      val llf = s"(-0.5 * n * ln($v) + ($lam - 1.0) * (CAST(sl AS DOUBLE) / 1e6))"
      s"""WITH m AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2),
        |av AS (SELECT prio, CAST(sum(cents) AS BIGINT)
        |           // CAST(count(*) AS BIGINT) AS avgc
        |       FROM m GROUP BY 1),
        |b AS (SELECT m.prio, CAST(m.cents - av.avgc AS DOUBLE) / 1e8 AS x
        |      FROM m JOIN av ON m.prio = av.prio),
        |g AS (SELECT CAST(unnest(generate_series(-50, 50)) AS BIGINT)
        |        AS lambda_e1),
        |r AS (SELECT prio, lambda_e1,
        |        CAST(floor($z * 1000000 + 0.5) AS HUGEINT) AS zq,
        |        CAST(floor($sl * 1000000 + 0.5) AS BIGINT) AS slq
        |      FROM b CROSS JOIN g),
        |p AS (SELECT prio, lambda_e1, CAST(count(*) AS BIGINT) AS n,
        |        sum(zq) AS sz, sum(zq * zq) AS szz,
        |        CAST(sum(slq) AS BIGINT) AS sl
        |      FROM r GROUP BY 1, 2),
        |q AS (SELECT prio, lambda_e1, n,
        |        CASE WHEN n >= 3 AND $v > 0 THEN
        |          CAST(floor($llf * 1000000 + 0.5) AS BIGINT) END AS llf_e6
        |      FROM p),
        |w AS (SELECT *, max(llf_e6) OVER (PARTITION BY prio) AS mx FROM q),
        |w2 AS (SELECT *, min(CASE WHEN llf_e6 = mx THEN lambda_e1 END)
        |         OVER (PARTITION BY prio) AS bl FROM w)
        |SELECT prio, lambda_e1, n, llf_e6,
        |  CASE WHEN mx IS NOT NULL THEN lambda_e1 = bl END AS is_best
        |FROM w2 ORDER BY prio, lambda_e1""".stripMargin
    },

    // YJ ternary refinement: the q379 grid argmax replayed, then two
    // unrolled ternary rounds — probe λ's are the identical r6 trees,
    // each probe one more rows×λ quantized aggregation, comparisons on
    // the e6-rounded llf with the kernel's tie rule (f1 = f2 keeps the
    // left bracket edge). MATERIALIZED: b is re-joined five times.
    "q380_u4_yeojohnson_refine" -> {
      def z(lam: String) =
        s"""(CASE
           |  WHEN x >= 0 AND $lam = 0.0 THEN ln(1.0 + x)
           |  WHEN x >= 0 THEN (power(x + 1.0, $lam) - 1.0) / $lam
           |  WHEN $lam = 2.0 THEN -ln(1.0 - x)
           |  ELSE -(power(1.0 - x, 2.0 - $lam) - 1.0) / (2.0 - $lam)
           |END)""".stripMargin.replaceAll("\n", " ")
      val sl = "(CASE WHEN x >= 0 THEN ln(1.0 + x) ELSE -ln(1.0 - x) END)"
      val v = "((CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)" +
        " - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))" +
        " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e12)"
      def llf(lam: String) =
        s"(-0.5 * n * ln($v) + ($lam - 1.0) * (CAST(sl AS DOUBLE) / 1e6))"
      // evaluate the e6 llf at every (prio, lam) of `src` (MUST expose
      // prio + a DOUBLE column named lam)
      def eval(name: String, src: String) =
        s"""$name AS MATERIALIZED (
           |  SELECT prio, lam, CAST(count(*) AS BIGINT) AS n,
           |    sum(zq) AS sz, sum(zq * zq) AS szz,
           |    CAST(sum(slq) AS BIGINT) AS sl
           |  FROM (SELECT b.prio, s.lam,
           |          CAST(floor(${z("s.lam")} * 1000000 + 0.5) AS HUGEINT) AS zq,
           |          CAST(floor($sl * 1000000 + 0.5) AS BIGINT) AS slq
           |        FROM b JOIN ($src) s ON b.prio = s.prio)
           |  GROUP BY 1, 2),
           |${name}f AS MATERIALIZED (
           |  SELECT prio, lam, n,
           |    CASE WHEN n >= 3 AND $v > 0 THEN
           |      CAST(floor(${llf("lam")} * 1000000 + 0.5) AS BIGINT) END AS llf
           |  FROM $name)""".stripMargin
      def r6(e: String) = s"(floor(($e) * 1000000 + 0.5) / 1000000)"
      def probes(name: String, brTbl: String) =
        s"""$name AS (SELECT prio,
           |    ${r6(s"lo + (hi - lo) / 3.0")} AS lam1,
           |    ${r6(s"hi - (hi - lo) / 3.0")} AS lam2, lo, hi
           |  FROM $brTbl)""".stripMargin
      def step(cmpName: String, prTbl: String, evTbl: String) =
        s"""$cmpName AS (SELECT p.prio,
           |    CASE WHEN coalesce(a.llf, -9000000000000000000)
           |           < coalesce(c.llf, -9000000000000000000)
           |         THEN p.lam1 ELSE p.lo END AS lo,
           |    CASE WHEN coalesce(a.llf, -9000000000000000000)
           |           < coalesce(c.llf, -9000000000000000000)
           |         THEN p.hi ELSE p.lam2 END AS hi
           |  FROM $prTbl p
           |  JOIN $evTbl a ON a.prio = p.prio AND a.lam = p.lam1
           |  JOIN $evTbl c ON c.prio = p.prio AND c.lam = p.lam2)""".stripMargin
      s"""WITH m AS MATERIALIZED (
         |  SELECT o_orderpriority AS prio,
         |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders GROUP BY 1, 2),
         |av AS MATERIALIZED (SELECT prio, CAST(sum(cents) AS BIGINT)
         |    // CAST(count(*) AS BIGINT) AS avgc
         |  FROM m GROUP BY 1),
         |b AS MATERIALIZED (
         |  SELECT m.prio, CAST(m.cents - av.avgc AS DOUBLE) / 1e8 AS x
         |  FROM m JOIN av ON m.prio = av.prio),
         |gsrc AS (SELECT DISTINCT b.prio,
         |    CAST(g.le1 AS DOUBLE) / 10.0 AS lam, g.le1
         |  FROM b CROSS JOIN (SELECT CAST(unnest(generate_series(-50, 50))
         |    AS BIGINT) AS le1) g),
         |${eval("ge", "SELECT prio, lam FROM gsrc")},
         |gw AS MATERIALIZED (SELECT gef.prio,
         |    min(CASE WHEN gef.llf = mx.mxl THEN gsrc.le1 END) AS bl
         |  FROM gef
         |  JOIN (SELECT prio, max(llf) AS mxl FROM gef GROUP BY 1) mx
         |    ON mx.prio = gef.prio
         |  JOIN gsrc ON gsrc.prio = gef.prio AND gsrc.lam = gef.lam
         |  WHERE mx.mxl IS NOT NULL
         |  GROUP BY 1),
         |br1 AS (SELECT prio,
         |    CAST(greatest(-50, bl - 1) AS DOUBLE) / 10.0 AS lo,
         |    CAST(least(50, bl + 1) AS DOUBLE) / 10.0 AS hi, bl
         |  FROM gw),
         |${probes("pr1", "br1")},
         |${eval("e1",
            "SELECT prio, lam1 AS lam FROM pr1 UNION ALL SELECT prio, lam2 FROM pr1")},
         |${step("br2", "pr1", "e1f")},
         |${probes("pr2", "br2")},
         |${eval("e2",
            "SELECT prio, lam1 AS lam FROM pr2 UNION ALL SELECT prio, lam2 FROM pr2")},
         |${step("br3", "pr2", "e2f")},
         |ph AS (SELECT prio, ${r6("(lo + hi) / 2.0")} AS lam FROM br3),
         |${eval("eh", "SELECT prio, lam FROM ph")}
         |SELECT eh2.prio AS key, eh2.n,
         |  CAST(gw.bl * 100000 AS BIGINT) AS lam0_e6,
         |  CAST(floor(eh2.lam * 1000000 + 0.5) AS BIGINT) AS lam_hat_e6,
         |  eh2.llf AS llf_e6
         |FROM ehf eh2 JOIN gw ON gw.prio = eh2.prio
         |WHERE eh2.llf IS NOT NULL
         |ORDER BY key""".stripMargin
    },

    // BPE merge ladder rungs (verdict #6): the q371 round shape —
    // MATERIALIZED count→argmax→2-pass-replace-apply per rank, the
    // empty-argmax guard no-oping exhausted rounds — unrolled to k=16
    // and k=32 with no threshold (minCnt=1), so the only q92 surface
    // left unreplayed is rank > 32 of the same arithmetic
    "q381_x_bpe_merge_k16" -> bpeMergeLadderSql(16),
    "q382_x_bpe_merge_k32" -> bpeMergeLadderSql(32),

    // Jonckheere–Terpstra: cell-pair join over the (key, group, value)
    // grid for the exact doubled statistic (ties counted once, strict
    // pairs twice), HUGEINT moment sums, one z double tree mirroring
    // the kernel's operand order term for term
    "q383_x_jonckheere_trend" -> {
      val varj = """(CAST(t1 AS DOUBLE) / 72.0
                   | + CAST(t2 AS DOUBLE) / (36.0 * CAST(n AS DOUBLE)
                   |     * CAST(n - 1 AS DOUBLE) * CAST(n - 2 AS DOUBLE))
                   | + CAST(t3 AS DOUBLE) / (8.0 * CAST(n AS DOUBLE)
                   |     * CAST(n - 1 AS DOUBLE)))"""
        .stripMargin.replaceAll("\n", " ")
      val z = s"(CAST(j2 - e2j AS DOUBLE) / sqrt(4.0 * $varj))"
      s"""WITH base AS (
        |  SELECT o_orderstatus AS k, CAST(o_orderpriority AS VARCHAR) AS g,
        |         CAST(floor(o_totalprice + 0.5) AS BIGINT) // 100 AS v
        |  FROM orders
        |  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
        |    AND o_totalprice IS NOT NULL),
        |cells AS MATERIALIZED (
        |  SELECT k, g, v, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2, 3),
        |jj AS (SELECT a.k,
        |        CAST(sum(CASE WHEN a.v < b.v THEN 2 * CAST(a.c AS HUGEINT) * b.c
        |                      WHEN a.v = b.v THEN CAST(a.c AS HUGEINT) * b.c
        |                      ELSE 0 END) AS HUGEINT) AS j2
        |      FROM cells a JOIN cells b ON a.k = b.k AND a.g < b.g
        |      GROUP BY 1),
        |sizes AS (SELECT k, g, CAST(sum(c) AS BIGINT) AS ng
        |          FROM cells GROUP BY 1, 2),
        |gstats AS (SELECT k, CAST(count(*) AS BIGINT) AS k_groups,
        |             CAST(sum(ng) AS BIGINT) AS n,
        |             sum(CAST(ng AS HUGEINT) * ng) AS sng2,
        |             sum(CAST(ng AS HUGEINT) * (ng - 1) * (2 * ng + 5)) AS g1,
        |             sum(CAST(ng AS HUGEINT) * (ng - 1) * (ng - 2)) AS g2,
        |             sum(CAST(ng AS HUGEINT) * (ng - 1)) AS g3
        |           FROM sizes GROUP BY 1),
        |tstats AS (SELECT k,
        |             sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS u1,
        |             sum(CAST(t AS HUGEINT) * (t - 1) * (t - 2)) AS u2,
        |             sum(CAST(t AS HUGEINT) * (t - 1)) AS u3
        |           FROM (SELECT k, v, CAST(sum(c) AS BIGINT) AS t
        |                 FROM cells GROUP BY 1, 2) GROUP BY 1),
        |mo AS (SELECT g.k, g.k_groups, g.n,
        |         COALESCE(jj.j2, 0) AS j2,
        |         (CAST(g.n AS HUGEINT) * g.n - g.sng2) // 2 AS e2j,
        |         CAST(g.n AS HUGEINT) * (g.n - 1) * (2 * g.n + 5)
        |           - g.g1 - t.u1 AS t1,
        |         g.g2 * t.u2 AS t2, g.g3 * t.u3 AS t3
        |       FROM gstats g
        |       LEFT JOIN jj ON g.k = jj.k
        |       JOIN tstats t ON g.k = t.k)
        |SELECT k AS o_orderstatus, k_groups, n, CAST(j2 AS BIGINT) AS j2,
        |  CASE WHEN k_groups >= 2 AND n >= 3 AND $varj > 0 THEN
        |    CAST(floor($z * 10000 + 0.5) AS BIGINT) END AS z_e4,
        |  CASE WHEN k_groups >= 2 AND n >= 3 AND $varj > 0 THEN
        |    abs(CAST(floor($z * 10000 + 0.5) AS BIGINT)) > 19600
        |  END AS significant
        |FROM mo ORDER BY o_orderstatus""".stripMargin
    },

    // Dunn post-hoc: midranks off the pooled value grid (2·mr =
    // 2·cum_before + cv + 1), HUGEINT 2R_g and tie cubes mirroring the
    // kernel's BigInt sums, the q313 A&S-26.2.17 Horner p tree and BH
    // replay verbatim; the streaming twin q386 drains the same grid
    // through the same readout, so this oracle serves both.
    "q385_x_dunn_posthoc" -> dunnSql,
    "q386_x_stream_dunn" -> dunnSql,

    // Page's trend: within-month midranks (the friedmanTest 2·rank +
    // ties − 1 identity), 1..k ascending-label scores via dense_rank,
    // HUGEINT 2L and n·k(k+1)² mirroring the engine's DECIMAL sums, the
    // identical one-division z tree; the streaming twin q388 drains the
    // same monthly revenue-cell grid into the same readout, one oracle.
    "q387_x_page_trend" -> pageSql,
    "q388_x_stream_page_trend" -> pageSql,

    // Quade: within-month midranks + block-range weights, both on the
    // 2·rank + ties − 1 identity; 4S = 2Q·(2r − (k+1)) exact, HUGEINT
    // A4/SB4 sums mirroring the engine's DECIMAL, one F division; the
    // streaming twin q390 drains the same grid, one oracle.
    "q389_x_quade_test" -> quadeSql,
    "q390_x_stream_quade" -> quadeSql,

    // BPE merge ladder, k=64 (round 17): the q381/q382 rung doubled
    // once more — same unrolled per-rank arithmetic, deeper
    "q391_x_bpe_merge_k64" -> bpeMergeLadderSql(64),

    // exact fuzzy join: the oracle is UNRESTRICTED brute force (length
    // band is a levenshtein lower bound, not a recall cut) — matching
    // hashes prove the q-gram prefix + deletion-neighborhood candidate
    // set is complete, not merely precise
    "q392_x_edit_join_exact" ->
      ("""WITH c AS (
        |  SELECT p_partkey AS c_key,
        |         p_partkey % length(p_name) + 1 AS pos, p_name
        |  FROM part WHERE p_partkey % 4 = 0),
        |cc AS (SELECT c_key,
        |         substring(p_name, 1, pos - 1) || substring(p_name, pos + 1) AS c_name
        |       FROM c)
        |SELECT cc.c_key, p.p_partkey,
        |       CAST(levenshtein(cc.c_name, p.p_name) AS INT) AS edit_dist
        |FROM cc JOIN part p
        |  ON abs(length(cc.c_name) - length(p.p_name)) <= 2
        |WHERE levenshtein(cc.c_name, p.p_name) <= 2
        |ORDER BY c_key, p_partkey""".stripMargin),

    // wide simhash: the q59 oracle at 60 bits (hash60 votes)
    "q393_x_simhash_pairs_wide" -> simhashPairsSql(60),

    // exact Jaccard join: unrestricted brute force (list_intersect over
    // distinct token sets), the same integer cross-multiplied accept —
    // the hash match pins the prefix-filter candidate set's completeness
    "q394_x_jaccard_join_complete" ->
      ("""WITH t AS (
        |  SELECT doc_id,
        |         list_distinct(regexp_split_to_array(trim(text), '\s+')) AS toks
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         len(list_intersect(a.toks, b.toks)) AS i,
        |         len(a.toks) AS na, len(b.toks) AS nb
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(i AS BIGINT) AS n_inter,
        |       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |       CAST(i * 1000000 // (na + nb - i) AS BIGINT) AS jaccard_e6
        |FROM p WHERE i * 1950000 >= 950000 * (na + nb)
        |ORDER BY id_a, id_b""".stripMargin),

    // BPE merge ladder, k=128: the rung doubled once more
    "q395_x_bpe_merge_k128" -> bpeMergeLadderSql(128),

    // PQ-ADC: training + encoding + scoring replayed bit-for-bit
    "q396_x_pq_adc_topk" ->
      pqAdcTopKSql(m = 8, kCent = 16, iters = 2, dim = 64, topK = 3,
        maxQueryId = 32L)
  )

  private lazy val quadeSql: String =
    """WITH cellsrc AS MATERIALIZED (
      |  SELECT o_orderstatus AS k,
      |         CAST(date_trunc('month', o_orderdate) AS DATE) AS b,
      |         CAST(o_orderpriority AS VARCHAR) AS j,
      |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |              AS BIGINT) AS v
      |  FROM orders
      |  WHERE o_orderstatus IS NOT NULL AND o_orderdate IS NOT NULL
      |    AND o_orderpriority IS NOT NULL
      |  GROUP BY 1, 2, 3),
      |kt AS (SELECT k, CAST(count(DISTINCT j) AS BIGINT) AS kk
      |       FROM cellsrc GROUP BY 1),
      |bs AS (SELECT k, b, CAST(count(*) AS BIGINT) AS bc,
      |         CAST(count(DISTINCT j) AS BIGINT) AS bd,
      |         max(v) - min(v) AS rng
      |       FROM cellsrc GROUP BY 1, 2),
      |blocks AS MATERIALIZED (
      |  SELECT bs.k, bs.b, bs.rng, kt.kk
      |  FROM bs JOIN kt ON bs.k = kt.k
      |  WHERE bs.bc = kt.kk AND bs.bd = kt.kk),
      |wq AS MATERIALIZED (
      |  SELECT k, b, kk,
      |    2 * rank() OVER (PARTITION BY k ORDER BY rng)
      |      + count(*) OVER (PARTITION BY k, rng) - 1 AS q2
      |  FROM blocks),
      |ranked AS MATERIALIZED (
      |  SELECT c.k, c.b, c.j,
      |    CAST(w.q2 AS HUGEINT)
      |      * (2 * rank() OVER (PARTITION BY c.k, c.b ORDER BY c.v)
      |         + count(*) OVER (PARTITION BY c.k, c.b, c.v) - 1
      |         - (w.kk + 1)) AS s4
      |  FROM cellsrc c JOIN wq w ON c.k = w.k AND c.b = w.b),
      |pt AS (SELECT k, j, sum(s4) AS sj4 FROM ranked GROUP BY 1, 2),
      |sb AS (SELECT k, sum(sj4 * sj4) AS sb4,
      |         CAST(count(*) AS BIGINT) AS kk
      |       FROM pt GROUP BY 1),
      |pk AS (SELECT k, CAST(count(DISTINCT b) AS BIGINT) AS n_blocks,
      |         sum(s4 * s4) AS a4
      |       FROM ranked GROUP BY 1)
      |SELECT pk.k AS o_orderstatus, pk.n_blocks, sb.kk AS k_treatments,
      |  sb.kk - 1 AS dof1, (pk.n_blocks - 1) * (sb.kk - 1) AS dof2,
      |  CASE WHEN sb.kk >= 2 AND pk.n_blocks >= 2
      |        AND CAST(pk.n_blocks AS HUGEINT) * pk.a4 - sb.sb4 > 0 THEN
      |    CAST(floor(CAST((pk.n_blocks - 1) * sb.sb4 AS DOUBLE)
      |      / CAST(CAST(pk.n_blocks AS HUGEINT) * pk.a4 - sb.sb4 AS DOUBLE)
      |      * 1000000 + 0.5) AS BIGINT)
      |  END AS f_e6
      |FROM pk JOIN sb ON pk.k = sb.k ORDER BY o_orderstatus""".stripMargin

  private lazy val pageSql: String =
    """WITH cellsrc AS MATERIALIZED (
      |  SELECT o_orderstatus AS k,
      |         CAST(date_trunc('month', o_orderdate) AS DATE) AS b,
      |         CAST(o_orderpriority AS VARCHAR) AS j,
      |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |              AS BIGINT) AS v
      |  FROM orders
      |  WHERE o_orderstatus IS NOT NULL AND o_orderdate IS NOT NULL
      |    AND o_orderpriority IS NOT NULL
      |  GROUP BY 1, 2, 3),
      |kt AS (SELECT k, CAST(count(DISTINCT j) AS BIGINT) AS kk
      |       FROM cellsrc GROUP BY 1),
      |bs AS (SELECT k, b, CAST(count(*) AS BIGINT) AS bc,
      |         CAST(count(DISTINCT j) AS BIGINT) AS bd
      |       FROM cellsrc GROUP BY 1, 2),
      |ranked AS MATERIALIZED (
      |  SELECT c.k, c.b, c.j,
      |    2 * rank() OVER (PARTITION BY c.k, c.b ORDER BY c.v)
      |      + count(*) OVER (PARTITION BY c.k, c.b, c.v) - 1 AS r2
      |  FROM cellsrc c
      |  JOIN bs ON c.k = bs.k AND c.b = bs.b
      |  JOIN kt ON c.k = kt.k
      |  WHERE bs.bc = kt.kk AND bs.bd = kt.kk),
      |pk AS (SELECT k, CAST(count(DISTINCT b) AS BIGINT) AS n_blocks
      |       FROM ranked GROUP BY 1),
      |pt AS (SELECT k, j, CAST(sum(r2) AS BIGINT) AS rj2
      |       FROM ranked GROUP BY 1, 2),
      |sc AS (SELECT k, j, rj2,
      |         CAST(dense_rank() OVER (PARTITION BY k ORDER BY j) AS BIGINT) AS s
      |       FROM pt),
      |l2 AS (SELECT k, sum(CAST(s AS HUGEINT) * rj2) AS l2,
      |         CAST(count(*) AS BIGINT) AS kk
      |       FROM sc GROUP BY 1),
      |mo AS (SELECT pk.k, pk.n_blocks, l2.kk AS k_treatments, l2.l2,
      |         CAST(pk.n_blocks AS HUGEINT) * l2.kk * (l2.kk + 1)
      |           * (l2.kk + 1) AS e4
      |       FROM pk JOIN l2 ON pk.k = l2.k)
      |SELECT k AS o_orderstatus, n_blocks, k_treatments,
      |  CAST(l2 AS BIGINT) AS l2,
      |  CASE WHEN n_blocks >= 1 AND k_treatments >= 2 THEN
      |    CAST(floor(CAST(2 * l2 - e4 AS DOUBLE)
      |      / (4.0 * sqrt(CAST(n_blocks AS DOUBLE) * k_treatments
      |          * k_treatments * (k_treatments + 1)
      |          * (k_treatments * k_treatments - 1) / 144.0))
      |      * 10000 + 0.5) AS BIGINT)
      |  END AS z_e4,
      |  CASE WHEN n_blocks >= 1 AND k_treatments >= 2 THEN
      |    abs(CAST(floor(CAST(2 * l2 - e4 AS DOUBLE)
      |      / (4.0 * sqrt(CAST(n_blocks AS DOUBLE) * k_treatments
      |          * k_treatments * (k_treatments + 1)
      |          * (k_treatments * k_treatments - 1) / 144.0))
      |      * 10000 + 0.5) AS BIGINT)) > 19600
      |  END AS significant
      |FROM mo ORDER BY o_orderstatus""".stripMargin

  private lazy val dunnSql: String =
    """WITH base AS (
      |  SELECT o_orderstatus AS k, CAST(o_orderpriority AS VARCHAR) AS g,
      |         CAST(floor(o_totalprice + 0.5) AS BIGINT) // 100 AS v
      |  FROM orders
      |  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
      |    AND o_totalprice IS NOT NULL),
      |cells AS MATERIALIZED (
      |  SELECT k, g, v, CAST(count(*) AS BIGINT) AS c
      |  FROM base GROUP BY 1, 2, 3),
      |vgrid AS MATERIALIZED (
      |  SELECT k, v, CAST(sum(c) AS BIGINT) AS cv FROM cells GROUP BY 1, 2),
      |mr AS MATERIALIZED (
      |  SELECT k, v, cv,
      |    2 * (CAST(sum(cv) OVER (PARTITION BY k ORDER BY v) AS BIGINT) - cv)
      |      + cv + 1 AS mr2
      |  FROM vgrid),
      |tot AS (SELECT k, CAST(sum(cv) AS BIGINT) AS n,
      |          sum(CAST(cv AS HUGEINT) * cv * cv - cv) AS t3
      |        FROM vgrid GROUP BY 1),
      |grp AS (SELECT c.k, c.g, CAST(sum(c.c) AS BIGINT) AS ng,
      |          sum(CAST(c.c AS HUGEINT) * m.mr2) AS r2
      |        FROM cells c JOIN mr m ON c.k = m.k AND c.v = m.v
      |        GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.k, a.g AS group_a, b.g AS group_b, a.ng AS n_a, b.ng AS n_b,
      |         a.r2 AS r2a, b.r2 AS r2b, t.n, t.t3
      |  FROM grp a JOIN grp b ON a.k = b.k AND a.g < b.g
      |  JOIN tot t ON a.k = t.k),
      |zz AS (
      |  SELECT k, group_a, group_b, n_a, n_b, n,
      |    (CAST(r2a AS DOUBLE) / n_a - CAST(r2b AS DOUBLE) / n_b) / 2.0 AS d,
      |    (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE) / 12.0
      |       - CAST(t3 AS DOUBLE) / (12.0 * CAST(n - 1 AS DOUBLE)))
      |      * (1.0 / n_a + 1.0 / n_b) AS s2
      |  FROM pairs),
      |zc AS (
      |  SELECT k, group_a, group_b, n_a, n_b,
      |    CASE WHEN n >= 2 AND s2 > 0 THEN d / sqrt(s2) END AS z
      |  FROM zz),
      |zt AS (SELECT *, 1.0 / (1.0 + 0.2316419 * abs(z)) AS w FROM zc),
      |q AS (SELECT k, group_a, group_b, n_a, n_b,
      |        CAST(floor(z * 10000 + 0.5) AS BIGINT) AS z_e4,
      |        CASE WHEN z IS NOT NULL THEN
      |          CAST(floor(2.0 * exp(-abs(z) * abs(z) / 2.0)
      |            * 0.3989422804014327
      |            * (w * (0.319381530 + w * (-0.356563782
      |               + w * (1.781477937 + w * (-1.821255978
      |               + w * 1.330274429)))))
      |            * 1000000000 + 0.5) AS BIGINT)
      |        END AS p_e9
      |      FROM zt),
      |r AS (SELECT *, CAST(row_number() OVER (ORDER BY p_e9, k, group_a,
      |               group_b) AS INT) AS rank,
      |             CAST(count(*) OVER () AS BIGINT) AS m
      |      FROM q WHERE p_e9 IS NOT NULL),
      |f AS (SELECT *, max(CASE WHEN p_e9 * 1000 * m
      |               <= rank * 50 * CAST(1000000000 AS BIGINT) THEN rank END)
      |               OVER () AS kmax
      |      FROM r)
      |SELECT k AS o_orderstatus, group_a, group_b, n_a, n_b, z_e4, p_e9,
      |       rank, coalesce(rank <= kmax, false) AS rejected
      |FROM f ORDER BY o_orderstatus, group_a, group_b""".stripMargin

  /** q371's unrolled BPE merge oracle at depth `k`, minCnt=1 (the
    * no-stop ladder): each round re-counts pairs over the materialized
    * vocab strings, picks the (cnt DESC, l, r) argmax, and applies it
    * via the 2-pass boundary-delimited replace whose exactness proof
    * lives on `Bpe.mergeSliceDf` (run-capped length-2..9 words). The
    * empty-argmax guard keeps deeper-than-vocabulary rounds no-ops on
    * both engines. */
  private def bpeMergeLadderSql(k: Int): String = {
    val run5 = ('a' to 'z').map(c => c.toString * 5).mkString("|")
    def pairCte(p: String, sIn: String): String =
      s"""$p AS MATERIALIZED (
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
      s"""$sOut AS MATERIALIZED (
         |  SELECT CASE WHEN (SELECT count(*) FROM $m) = 0 THEN s
         |    ELSE replace(replace(s,
         |      '|' || (SELECT l FROM $m) || '|' || (SELECT r FROM $m) || '|',
         |      '|' || (SELECT l || r FROM $m) || '|'),
         |      '|' || (SELECT l FROM $m) || '|' || (SELECT r FROM $m) || '|',
         |      '|' || (SELECT l || r FROM $m) || '|') END AS s, c
         |  FROM $sIn)""".stripMargin
    val rounds = (0 until k).map { i =>
      val apply =
        if (i == 0) ""
        else applyCte(s"s$i", s"s${i - 1}", s"m${i - 1}") + ",\n"
      s"""$apply${pairCte(s"p$i", s"s$i")},
         |m$i AS MATERIALIZED (SELECT l, r, cnt FROM p$i WHERE cnt >= 1
         |  ORDER BY cnt DESC, l, r LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val union = (0 until k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rank, l AS left_sym, r AS right_sym, cnt AS pair_count FROM m$i")
      .mkString("\nUNION ALL ")
    s"""WITH wraw AS MATERIALIZED (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |w AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM wraw
       |  WHERE length(w) BETWEEN 2 AND 9
       |    AND NOT regexp_matches(w, '$run5')
       |  GROUP BY 1),
       |s0 AS MATERIALIZED (
       |  SELECT '|' || array_to_string(string_split(w, ''), '|') || '|'
       |    AS s, c FROM w),
       |$rounds
       |SELECT * FROM ($union) ORDER BY rank""".stripMargin
  }
}
