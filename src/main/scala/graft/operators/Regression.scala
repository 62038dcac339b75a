package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped ordinary-least-squares trend fit — one `y = a + b·x` line per
  * key, computed declaratively from the five classical sufficient sums
  * (n, Σx, Σy, Σxy, Σx²). This is the scale-out form of "fit a trend to
  * every series": a 100 TB corpus with a billion keys runs it as ONE
  * map-side-combining aggregation — no per-series collect, no window, no
  * iterative solver — where the reference's per-series
  * `statsmodels`/`numpy.polyfit` loop is driver-bound
  * (`EDA Notebooks/Current Employment Statistics EDA.ipynb` cell 27 fits
  * one model at a time; `graft.stats.Diagnostics` keeps that shape for
  * the models that NEED per-series kernels — a straight line does not).
  *
  * Exactness contract (the q117/q122 discipline): with INTEGRAL `x` and
  * `y` (cast upstream; quantize money to cents first), all five sums are
  * exact longs and order-independent, the slope is ONE IEEE division of
  * two exact longs — `(n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)` — and the
  * intercept is the fixed op sequence `(Σy − b·Σx) / n`. Both are
  * bit-identical in any engine replaying the same expression, so the
  * approximate-looking doubles still hash-match a SQL oracle.
  *
  * Domain: the caller keeps `n·|Σxy|` and `n·Σx²` under 2⁶³ (true for
  * any per-key series whose length × x-range × y-range stays below ~1e18
  * — centuries of monthly data in cents clears it by orders of
  * magnitude). A key with fewer than 2 distinct x values has a singular
  * design (denominator 0) and reports null slope/intercept rather than
  * failing the job — the [[graft.stats.Diagnostics]] degenerate-series
  * convention. */
object Regression {

  /** One row per key: `n`, `slope`, `intercept` (rounded to `roundTo`
    * decimals via the knife-edge-safe `floor(x·10^r + 0.5)` form). */
  def groupedOls(df: DataFrame, keyCols: Seq[String], xCol: String,
                 yCol: String, roundTo: Int = 6): DataFrame = {
    require(keyCols.nonEmpty, "groupedOls needs at least one key column")
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val sums = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
      den.cast("double")
    val icept = (col("sy").cast("double") - col("__b") * col("sx").cast("double")) /
      col("n").cast("double")
    val q = math.pow(10, roundTo)
    def rnd(c: org.apache.spark.sql.Column) = floor(c * q + 0.5) / q
    sums
      .withColumn("__b", when(den =!= 0, slope))
      .select(keyCols.map(col) :+ col("n") :+
        rnd(col("__b")).as("slope") :+
        rnd(when(den =!= 0, icept)).as("intercept"): _*)
  }

  /** Breusch–Pagan heteroscedasticity test over the per-key simple OLS
    * (Breusch & Pagan 1979, Koenker's studentized LM form): fit
    * `y = a + b·x` ([[groupedOls]]'s exact-sum trees), then ask whether
    * the SQUARED RESIDUALS trend with x — `LM = n·R²(u ~ x)` against
    * χ²(1) (5% critical 3.8415). The regression tier's variance
    * diagnostic beside the group-variance tests (Bartlett q349,
    * Brown–Forsythe q271): those need a grouping; this catches variance
    * drifting along a CONTINUOUS axis (time, size) — the classic "is
    * the OLS SE trustworthy" screen.
    *
    * Exactness: the fit's sums are exact longs; a/b are fixed double
    * trees; each row's `u = (y − a − b·x)²` is ONE fixed tree
    * floor-quantized to an exact integer via the q349 floor identity
    * (u ≥ 0; DECIMAL(38,0) — u is value-scale-unbounded, behind a
    * 1e15 fail-loud fence: the auxiliary sums square u AGAIN, so the
    * fence must keep n·u² inside 38 digits, u < 1e15 → u² < 1e30 →
    * suu < n·1e30, exact through n ≈ 10⁸ — a 1e24 fence would let suu
    * silently null on Spark's ANSI-off DECIMAL while DuckDB's HUGEINT
    * side errors, the exact cross-engine divergence the fence exists
    * to prevent; a belt-and-braces post-agg check keeps any residual
    * overflow loud too), so the auxiliary sums are order-free exact
    * integers and R²/LM are one double tree each, LM e4-quantized with
    * the verdict on the ROUNDED value. Keys with a singular design or
    * constant u emit null.
    *
    * Scale shape: one aggregate for the fit, one broadcast-size join
    * of the k-row coefficient table back onto the rows, one aggregate
    * for the auxiliary sums — two map-side-combined passes, no window.
    * Output: `(keys…, n, slope, lm_e4, heteroscedastic)`. */
  def breuschPagan(df: DataFrame, keyCols: Seq[String], xCol: String,
                   yCol: String, roundTo: Int = 6): DataFrame = {
    require(keyCols.nonEmpty, "breuschPagan needs at least one key column")
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val base = graft.functions.Cols.dropNullKeys(df, keyCols)
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(keyCols.map(col) :+ x.as("__x") :+ y.as("__y"): _*)
    val sums = base.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("sx"),
        sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"))
      .withColumn("__den", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("__b", when(col("__den") =!= 0L,
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          col("__den").cast("double")))
      .withColumn("__a",
        (col("sy").cast("double") - col("__b") * col("sx").cast("double")) /
          col("n").cast("double"))
    val res = "(cast(__y as double) - (__a + __b * cast(__x as double)))"
    val aux = base.join(broadcast(sums), keyCols)
      .filter(col("__b").isNotNull)
      // the q349 floor identity: u is value-scale-unbounded, so floor
      // lands in DECIMAL(38,0) exactly (never a saturating long floor).
      // Fence at 1e15, NOT the per-row 38-digit limit: suu squares u
      // again, so u < 1e15 keeps suu = Σu² < n·1e30 exact through
      // n ≈ 10⁸ on both engines
      .withColumn("__u", expr(
        s"""if($res * $res >= 1e15,
           |   cast(raise_error('breuschPagan squared residual >= 1e15 —
           | rescale values upstream (the auxiliary regression squares it
           | again)') as decimal(38,0)),
           |   cast(($res * $res + 0.5) - (($res * $res + 0.5) % 1.0D)
           |     as decimal(38,0)))""".stripMargin.replaceAll("\n", " ")))
      .groupBy(keyCols.map(col): _*)
      .agg(max(col("n")).as("n"), max(col("sx")).as("sx"),
        max(col("__den")).as("__den"), max(col("__b")).as("__b"),
        sum(col("__u")).as("su"),
        sum(col("__u") * col("__x")).as("sxu"),
        sum(col("__u") * col("__u")).as("suu"))
      // belt-and-braces: with ANSI off a DECIMAL(38,0) sum that still
      // overflows (n beyond the fence's 10⁸ envelope) nulls SILENTLY —
      // turn that back into a loud failure so Spark never diverges
      // quietly from the oracle's erroring HUGEINT side
      .withColumn("suu", expr(
        """if(su is not null and suu is null,
          |   cast(raise_error('breuschPagan auxiliary sum suu overflowed
          | DECIMAL(38,0) — rescale values or reduce group size')
          |     as decimal(38,0)), suu)""".stripMargin.replaceAll("\n", " ")))
      // the POST-agg products bind TIGHTER than the sums: su·su inside
      // denU breaches 38 digits once su > ~10¹⁹ — with per-row u near
      // the 1e15 fence that is n ≈ 10⁴, far inside suu's n ≈ 10⁸
      // envelope — and n·sxu inside num is value·x-scale-dependent.
      // Null-checking the computed product against its (non-null)
      // inputs catches EVERY decimal overflow in the tree, loudly,
      // with no per-term envelope arithmetic to get wrong.
      .withColumn("__num",
        expr("(cast(n as decimal(38,0)) * sxu - cast(sx as decimal(38,0)) * su)"))
      .withColumn("__denU", expr("(cast(n as decimal(38,0)) * suu - su * su)"))
      .withColumn("__num", expr(
        """if(su is not null and sxu is not null and __num is null,
          |   cast(raise_error('breuschPagan auxiliary product
          | n*sxu - sx*su overflowed DECIMAL(38,0) — rescale values
          | upstream') as decimal(38,0)), __num)"""
          .stripMargin.replaceAll("\n", " ")))
      .withColumn("__denU", expr(
        """if(su is not null and suu is not null and __denU is null,
          |   cast(raise_error('breuschPagan auxiliary product
          | n*suu - su*su overflowed DECIMAL(38,0) — rescale values
          | upstream (su*su binds at su ~ 1e19)') as decimal(38,0)),
          | __denU)""".stripMargin.replaceAll("\n", " ")))
    val num = "__num"
    val denU = "__denU"
    val r2 = s"(cast($num as double) * cast($num as double)" +
      s" / (cast(__den as double) * cast($denU as double)))"
    val q = math.pow(10, roundTo)
    aux
      .withColumn("lm_e4", expr(
        s"""case when n >= 3 and __den != 0 and $denU > 0 then
           |  cast(floor(n * $r2 * 10000 + 0.5) as bigint) end""".stripMargin))
      .withColumn("heteroscedastic",
        when(col("lm_e4").isNotNull, col("lm_e4") > 38415L))
      .select(keyCols.map(col) :+ col("n") :+
        (floor(col("__b") * q + 0.5) / q).as("slope") :+
        col("lm_e4") :+ col("heteroscedastic"): _*)
  }

  /** Two-feature grouped OLS — `y = a + b1·x1 + b2·x2` per key, solved by
    * Cramer's rule on the 3×3 normal equations whose entries are the nine
    * classical sufficient sums. Same scale shape as [[groupedOls]]: ONE
    * map-side-combining aggregation for a billion keys, no solver loop.
    *
    * Exactness: the sums are exact longs (integral inputs, caller
    * quantizes). The determinants multiply three sums, which CAN exceed
    * 2⁶³ for long series — so the Cramer arithmetic runs in DOUBLE, as a
    * FIXED expression tree (each 3×3 determinant expanded in one written
    * order). IEEE doubles make every engine replaying the same tree
    * produce the same bits, so the result still hash-matches a SQL
    * oracle spelling out the identical expansion (the q142 contract,
    * extended from one division to a fixed product-sum tree).
    *
    * A singular design (collinear features, constant columns, n < 3)
    * reports null coefficients rather than failing the job. */
  def groupedOls2(df: DataFrame, keyCols: Seq[String], x1Col: String,
                  x2Col: String, yCol: String, roundTo: Int = 6): DataFrame = {
    require(keyCols.nonEmpty, "groupedOls2 needs at least one key column")
    val x1 = col(x1Col).cast("long")
    val x2 = col(x2Col).cast("long")
    val y = col(yCol).cast("long")
    val sums = df
      .filter(col(x1Col).isNotNull && col(x2Col).isNotNull && col(yCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x1).as("s1"), sum(x2).as("s2"), sum(y).as("sy"),
        sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"), sum(x2 * x2).as("s22"),
        sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"))
    // M = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], rhs = [sy,s1y,s2y];
    // det(M) and the three column-replaced determinants, each expanded in
    // one fixed order (cofactors along the first row)
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val (nn, s1, s2, sy) = (d(col("n")), d(col("s1")), d(col("s2")), d(col("sy")))
    val (s11, s12, s22) = (d(col("s11")), d(col("s12")), d(col("s22")))
    val (s1y, s2y) = (d(col("s1y")), d(col("s2y")))
    def det3(a11: org.apache.spark.sql.Column, a12: org.apache.spark.sql.Column,
             a13: org.apache.spark.sql.Column, a21: org.apache.spark.sql.Column,
             a22: org.apache.spark.sql.Column, a23: org.apache.spark.sql.Column,
             a31: org.apache.spark.sql.Column, a32: org.apache.spark.sql.Column,
             a33: org.apache.spark.sql.Column) =
      a11 * (a22 * a33 - a23 * a32) - a12 * (a21 * a33 - a23 * a31) +
        a13 * (a21 * a32 - a22 * a31)
    val det = det3(nn, s1, s2, s1, s11, s12, s2, s12, s22)
    val detA = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    val detB1 = det3(nn, sy, s2, s1, s1y, s12, s2, s2y, s22)
    val detB2 = det3(nn, s1, sy, s1, s11, s1y, s2, s12, s2y)
    val q = math.pow(10, roundTo)
    def rnd(c: org.apache.spark.sql.Column) = floor(c * q + 0.5) / q
    sums.select(keyCols.map(col) :+ col("n") :+
      rnd(when(det =!= 0.0, detA / det)).as("intercept") :+
      rnd(when(det =!= 0.0, detB1 / det)).as("b1") :+
      rnd(when(det =!= 0.0, detB2 / det)).as("b2"): _*)
  }

  /** Best single-feature split per (key, feature) by EXACT Gini gain —
    * the decision STUMP that backs feature screening for a quality
    * classifier ("which signal separates good from bad documents at
    * all, and where's the cut") and one boosting round; the supervised
    * complement of [[graft.operators.Profile.mutualInfo]]'s symmetric
    * association. Features arrive MELTED — `(featureCol, valueCol)`
    * rows — so one call screens every feature in one plan.
    *
    * Exactness: candidate thresholds are the feature's distinct values
    * (bin continuous features upstream — the ksDrift dial); per
    * threshold the child class counts come from ONE cumulative window
    * over the (key, feature, value) grid, and the selection score
    * `Q = (pos_l² + neg_l²)·2·10⁹ div n_l + (pos_r² + neg_r²)·2·10⁹
    * div n_r` is exact DECIMAL integer arithmetic (maximizing Q
    * minimizes weighted child Gini — the algebra drops the constant
    * parent terms), so the ARGMAX cannot drift cross-engine; ties
    * break on the smaller threshold. The gain readout is one fixed
    * double tree over the integers, e6-quantized.
    *
    * Scale shape: one map-side-combined (key, feature, value) count
    * aggregate; windows and the rank run on the value grid. Output:
    * one row per (keys…, feature): `(…, feature, threshold, n, n_pos,
    * n_left, pos_left, gain_e6)`. */
  def bestSplit(df: DataFrame, keyCols: Seq[String], featureCol: String,
                valueCol: String, labelCol: String): DataFrame = {
    val x = col(valueCol).cast("long")
    val y = col(labelCol)
    val grid = graft.functions.Cols.dropNullKeys(df, keyCols :+ featureCol)
      .filter(x.isNotNull && y.isNotNull)
      .groupBy((keyCols.map(col) :+ col(featureCol)) :+ x.as("__v"): _*)
      .agg(count(lit(1)).as("__c"),
        sum(when(y, 1L).otherwise(0L)).as("__p"))
    bestSplitFromGrid(grid, keyCols, featureCol)
  }

  /** The stump readout over a per-(key, feature, __v) grid carrying
    * `(__c, __p)` counts — ONE definition shared by the batch operator
    * and the streaming twin (whose complete-mode state IS this grid),
    * the cvmFromGrid convention. */
  def bestSplitFromGrid(grid: DataFrame, keyCols: Seq[String],
                        featureCol: String): DataFrame = {
    val k = keyCols.map(col) :+ col(featureCol)
    val wCum = Window.partitionBy(k: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(k: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scored = grid
      .withColumn("__nl", sum(col("__c")).over(wCum))
      .withColumn("__pl", sum(col("__p")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__pos", sum(col("__p")).over(wAll))
      .filter(col("__nl") < col("__n")) // the max value splits nothing off
      // each quotient is bounded by child_n·2e9, so the score fits BIGINT
      // iff n ≲ 4.6e9 per (key, feature) — FAIL LOUD past it (Spark's
      // non-ANSI div would silently null and corrupt the argmax where
      // the HUGEINT oracle keeps computing; the anovaOneWay convention)
      .withColumn("__score", expr(
        """if(__n <= 4600000000,
          | (cast(__pl as decimal(38,0)) * __pl
          |  + cast(__nl - __pl as decimal(38,0)) * (__nl - __pl))
          |   * 2000000000 div __nl
          |+ (cast(__pos - __pl as decimal(38,0)) * (__pos - __pl)
          |   + cast((__n - __nl) - (__pos - __pl) as decimal(38,0))
          |     * ((__n - __nl) - (__pos - __pl)))
          |   * 2000000000 div (__n - __nl),
          | cast(raise_error(
          |   'bestSplit score exceeds 2^63 past ~4.6e9 rows per (key, feature) — sample or pre-aggregate upstream')
          |      as bigint))""".stripMargin
          .replaceAll("\n", " ")))
    val wRank = Window.partitionBy(k: _*)
      .orderBy(col("__score").desc, col("__v"))
    scored
      .withColumn("__rn", row_number().over(wRank))
      .filter(col("__rn") === 1)
      .withColumn("gain_e6", expr(
        """cast(floor(
          |  (cast(__score as double) / 2000000000.0
          |   - (cast(__pos as double) * __pos
          |      + cast(__n - __pos as double) * (__n - __pos))
          |     / cast(__n as double))
          |  / cast(__n as double) * 1000000 + 0.5) as bigint)""".stripMargin))
      .select(keyCols.map(col) :+ col(featureCol) :+
        col("__v").as("threshold") :+ col("__n").as("n") :+
        col("__pos").as("n_pos") :+ col("__nl").as("n_left") :+
        col("__pl").as("pos_left") :+ col("gain_e6"): _*)
  }

  /** Sharp regression discontinuity per key — the third causal-design
    * member beside q342's matching (CEM) and q352's panel (DiD): when
    * treatment switches ON at a running-variable cutoff, the jump
    * `τ = α_R − α_L` between two LOCAL LINEAR fits at the cutoff is the
    * effect (Thistlethwaite & Campbell 1960; Imbens & Lemieux 2008).
    * Sides fit within ±`bandwidth` of the cutoff: left `u ∈ [−h, 0)`,
    * right `u ∈ [0, h]`, u = running − cutoff.
    *
    * Exactness ([[groupedOls]] extended to two sides + intercept SE):
    * per side the six sufficient sums (n, Σu, Σy exact longs; Σuy, Σu²,
    * Σy² DECIMAL(38,0) — the welch widening) in ONE map-side-combined
    * conditional aggregate; slope/intercept/RSS/intercept-variance
    * `Var(α̂) = s²·Σu²/(nΣu² − (Σu)²)` are FIXED double trees mirrored
    * literally in the SQL oracle; τ at e6, t at e4, `significant` on the
    * rounded t. Sides with n < 2 or a singular design null the estimate;
    * the t additionally needs n ≥ 3 per side and positive variance.
    *
    * Output: `(keys…, n_l, n_r, a_l_e6, a_r_e6, b_l_e6, b_r_e6, tau_e6,
    * t_e4, significant)`. */
  def regressionDiscontinuity(df: DataFrame, keyCols: Seq[String],
                              runCol: String, yCol: String,
                              cutoff: Long, bandwidth: Long): DataFrame = {
    require(keyCols.nonEmpty, "regressionDiscontinuity needs key columns")
    require(bandwidth >= 2, s"bandwidth >= 2, got $bandwidth")
    val u = col(runCol).cast("long") - lit(cutoff)
    val y = col(yCol).cast("long")
    val sides = Seq(("l", u < 0L), ("r", u >= 0L))
    val decProd = (a: String, b: String) =>
      expr(s"cast(cast($a as decimal(38,0)) * cast($b as decimal(38,0)) as decimal(38,0))")
    val aggs = sides.flatMap { case (s, cond) => Seq(
      sum(when(cond, 1L).otherwise(0L)).as(s"n_$s"),
      sum(when(cond, u).otherwise(0L)).as(s"__su$s"),
      sum(when(cond, y).otherwise(0L)).as(s"__sy$s"),
      sum(when(cond, decProd("__u", "__yv"))
        .otherwise(expr("cast(0 as decimal(38,0))"))).as(s"__suy$s"),
      sum(when(cond, decProd("__u", "__u"))
        .otherwise(expr("cast(0 as decimal(38,0))"))).as(s"__suu$s"),
      sum(when(cond, decProd("__yv", "__yv"))
        .otherwise(expr("cast(0 as decimal(38,0))"))).as(s"__syy$s"))
    }
    def den(s: String) =
      s"(cast(n_$s as double) * cast(__suu$s as double) - cast(__su$s as double) * cast(__su$s as double))"
    def b(s: String) =
      s"((cast(n_$s as double) * cast(__suy$s as double) - cast(__su$s as double) * cast(__sy$s as double)) / ${den(s)})"
    def a(s: String) =
      s"((cast(__sy$s as double) - ${b(s)} * cast(__su$s as double)) / cast(n_$s as double))"
    def rss(s: String) =
      s"(cast(__syy$s as double) - ${a(s)} * cast(__sy$s as double) - ${b(s)} * cast(__suy$s as double))"
    def va(s: String) =
      s"((${rss(s)} / (cast(n_$s as double) - 2.0)) * cast(__suu$s as double) / ${den(s)})"
    val okEst = s"n_l >= 2 and n_r >= 2 and ${den("l")} != 0 and ${den("r")} != 0"
    val okT = s"$okEst and n_l >= 3 and n_r >= 3 and (${va("l")} + ${va("r")}) > 0"
    val tau = s"(${a("r")} - ${a("l")})"
    graft.functions.Cols.dropNullKeys(df, keyCols)
      .filter(col(runCol).isNotNull && y.isNotNull)
      .withColumn("__u", u).withColumn("__yv", y)
      .filter(col("__u") >= -bandwidth && col("__u") <= bandwidth)
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("a_l_e6", expr(
        s"case when $okEst then cast(floor(${a("l")} * 1000000 + 0.5) as bigint) end"))
      .withColumn("a_r_e6", expr(
        s"case when $okEst then cast(floor(${a("r")} * 1000000 + 0.5) as bigint) end"))
      .withColumn("b_l_e6", expr(
        s"case when $okEst then cast(floor(${b("l")} * 1000000 + 0.5) as bigint) end"))
      .withColumn("b_r_e6", expr(
        s"case when $okEst then cast(floor(${b("r")} * 1000000 + 0.5) as bigint) end"))
      .withColumn("tau_e6", expr(
        s"case when $okEst then cast(floor($tau * 1000000 + 0.5) as bigint) end"))
      .withColumn("t_e4", expr(
        s"""case when $okT then
           |  cast(floor($tau / sqrt(${va("l")} + ${va("r")}) * 10000 + 0.5) as bigint)
           |end""".stripMargin))
      .withColumn("significant",
        when(col("t_e4").isNotNull, abs(col("t_e4")) > 19600L))
      .drop(sides.flatMap { case (s, _) =>
        Seq(s"__su$s", s"__sy$s", s"__suy$s", s"__suu$s", s"__syy$s") }: _*)
  }
}
