package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Single-pass JVM vector kernels for `array<float>` embeddings.
  *
  * Bit-compatible with the expression forms in [[graft.functions.Cols]]
  * (cast-to-double then sequential left-to-right accumulation — asserted by
  * `VectorOpsParitySpec`), but fast: Spark's higher-order `zip_with` /
  * `aggregate` evaluate interpreted (~30µs per element), which makes an
  * all-pairs cosine stage ~100x slower than these loops. Same trade as
  * [[graft.text.TextHash]].
  */
object VectorOps {

  def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  def l2norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  /** Cosine with zero-norm guard (null, not NaN) — matches
    * [[graft.functions.Cols.cosine]]. */
  def cosine(a: Array[Float], b: Array[Float]): java.lang.Double = {
    val den = l2norm(a) * l2norm(b)
    if (den == 0.0) null else Double.box(dot(a, b) / den)
  }

  // ----------------------------------------------------- int8 quantization

  /** Symmetric int8 scalar quantization scale: maxAbs/127 (0.0 for the
    * all-zero vector — codes are then all 0 and dequant is exact). */
  def int8Scale(a: Array[Float]): Double = {
    var m = 0.0
    var i = 0
    while (i < a.length) { val v = math.abs(a(i).toDouble); if (v > m) m = v; i += 1 }
    m / 127.0
  }

  /** Quantize to int8 codes. Rounding is floor(x/scale + 0.5) — explicit
    * and engine-portable (no banker's/HALF_UP ambiguity to mismatch an
    * oracle), clamped to [-127, 127]. */
  def quantizeInt8(a: Array[Float], scale: Double): Array[Byte] = {
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) {
      val q = if (scale == 0.0) 0.0 else math.floor(a(i).toDouble / scale + 0.5)
      out(i) = math.max(-127.0, math.min(127.0, q)).toByte
      i += 1
    }
    out
  }

  def dequantizeInt8(codes: Array[Byte], scale: Double): Array[Float] = {
    val out = new Array[Float](codes.length)
    var i = 0
    while (i < codes.length) { out(i) = (codes(i) * scale).toFloat; i += 1 }
    out
  }

  final case class Int8Metrics(scale: Double, max_abs_err: Double,
                               cos_fidelity: Option[Double])

  /** One-pass quantize→dequantize round-trip metrics. Dequantized values
    * stay in double (`code * scale`) — no float round-trip, so an oracle
    * computing the same formula in doubles matches bit-for-bit modulo
    * summation order. max_abs_err ≤ scale/2 by construction (the rounding
    * half-interval); cos_fidelity is cosine(original, dequantized), None
    * only for the all-zero vector. */
  def int8Metrics(a: Array[Float]): Int8Metrics = {
    val s = int8Scale(a)
    var maxErr = 0.0
    var dotAD = 0.0
    var na = 0.0
    var nd = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble
      val q = if (s == 0.0) 0.0 else math.max(-127.0, math.min(127.0, math.floor(x / s + 0.5)))
      val dq = q * s
      val e = math.abs(x - dq)
      if (e > maxErr) maxErr = e
      dotAD += x * dq
      na += x * x
      nd += dq * dq
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nd)
    Int8Metrics(s, maxErr, if (den == 0.0) None else Some(dotAD / den))
  }

  // ------------------------------------------------------------- Column API

  def cosineCol(a: Column, b: Column): Column =
    udf((x: Array[Float], y: Array[Float]) =>
      if (x == null || y == null) null else cosine(x, y)).apply(a, b)

  def dotCol(a: Column, b: Column): Column =
    udf((x: Array[Float], y: Array[Float]) =>
      if (x == null || y == null) null else Double.box(dot(x, y))).apply(a, b)

  /** struct(scale, max_abs_err, cos_fidelity) of the int8 round trip —
    * per-row, shuffle-free, embarrassingly parallel. */
  def int8MetricsCol(v: Column): Column =
    udf((x: Array[Float]) => if (x == null) null else int8Metrics(x)).apply(v)

  /** Embedding-space drift between two cohorts of a vector column —
    * per group, the cosine between the UNNORMALIZED SUM VECTORS of the
    * two sides (proportional to the centroid cosine — the scalar "has
    * the embedding distribution moved" monitor an index/model-refresh
    * pipeline watches; cos → 1 means the new data lives where the old
    * did, and a falling value flags retrain-the-quantizer before
    * recall silently decays).
    *
    * Exactness: each component e6-quantizes PER ROW (`⌊v·10⁶ + 0.5⌋` —
    * exact float-to-int, replayable), the per-(group, side, component)
    * sums are exact BIGINTs, and the cosine is ONE fixed double tree
    * over the two integer vectors, e6-quantized. The dimension
    * explodes once (rows·dim), aggregates map-side to the
    * group·2·dim grid, and the tree runs on the grid. Bounds: per
    * component `n·10⁶·max|v| < 2⁶³`, and (tighter) the readout's
    * cross-product sum `Σ_dim sa·sb < 10³⁸` — see
    * [[driftFromComponentSums]]; both clear ~10⁹ unit-scale rows with
    * orders of magnitude to spare.
    *
    * Output: `(groupCols…, n_a, n_b, drift_cos_e6)`. Groups missing
    * either side are DROPPED (the side join is inner — a one-sided
    * group has no drift to report); a group present on both sides with
    * a zero-norm sum emits null `drift_cos_e6`. `sideCol` must carry
    * 0 (baseline) / 1 (candidate); rows with any other side value are
    * ignored. */
  def centroidDrift(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
                    sideCol: String, vecCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(groupCols.nonEmpty, "centroidDrift needs at least one group column")
    val g = groupCols.map(col)
    val comps = df
      .filter(col(sideCol).isNotNull && col(vecCol).isNotNull)
      .select(g :+ col(sideCol).as("__side") :+
        posexplode(col(vecCol)).as(Seq("__i", "__v")): _*)
      .groupBy(g :+ col("__side") :+ col("__i"): _*)
      .agg(sum(floor(col("__v") * 1e6 + 0.5).cast("long")).as("__s"),
        count(lit(1)).as("__c"))
    driftFromComponentSums(comps, groupCols)
  }

  /** The drift readout over a per-(group, __side, __i) component-sum
    * grid (`__s` exact integer sums, `__c` counts) — ONE definition
    * shared by the batch operator and the streaming twin (whose
    * complete-mode state IS this grid), so the shared-oracle bit-parity
    * cannot drift between hand-synced copies. DECIMAL cross-products,
    * not double: a per-component double product summed across the
    * dimension would accumulate in engine-dependent order — the exact
    * wide-integer sums keep the ONLY float step the final fixed tree.
    * DECIMAL bound: the CROSS-PRODUCT sum `Σ_dim sa·sb` must stay below
    * 10³⁸ (tighter than the per-component 2⁶³ bound — per-component sums
    * past ~1.2·10¹⁸ would overflow the dim-64 product sum), i.e.
    * unit-scale component sums are safe to ~10¹⁸ rows per side.
    *
    * ONE conditional pivot, not an A-side/B-side self-join: filtered
    * branches would each replan the grid's whole upstream lineage (for
    * the batch caller that is two posexplode scans of the embeddings
    * table; for the streaming twin it was a memory-sink self-join that
    * needed a lineage-severing checkpoint). The sides land as columns in
    * a single pass; a component row missing either side drops, which IS
    * the inner-join contract (one-sided groups emit nothing). */
  def driftFromComponentSums(comps: org.apache.spark.sql.DataFrame,
                             groupCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val g = groupCols.map(col)
    comps
      .groupBy(g :+ col("__i"): _*)
      .agg(
        max(when(col("__side") === 0, col("__s"))).as("__sa"),
        max(when(col("__side") === 0, col("__c"))).as("__ca"),
        max(when(col("__side") === 1, col("__s"))).as("__sb"),
        max(when(col("__side") === 1, col("__c"))).as("__cb"))
      .filter(col("__sa").isNotNull && col("__sb").isNotNull)
      .groupBy(g: _*)
      .agg(
        max(col("__ca")).as("n_a"), max(col("__cb")).as("n_b"),
        sum(expr("cast(__sa as decimal(38,0)) * __sb")).as("__ab"),
        sum(expr("cast(__sa as decimal(38,0)) * __sa")).as("__aa"),
        sum(expr("cast(__sb as decimal(38,0)) * __sb")).as("__bb"))
      .withColumn("drift_cos_e6", expr(
        """case when __aa > 0 and __bb > 0 then
          |  cast(floor(cast(__ab as double)
          |    / sqrt(cast(__aa as double) * cast(__bb as double))
          |    * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
      .drop("__ab", "__aa", "__bb")
  }

  /** Per-key embedding HEALTH audit — the hygiene screen an ANN/semantic
    * stack needs before it trusts a vector column: wrong-dimension
    * vectors (a schema drift that silently zero-pads or truncates
    * downstream), near-zero vectors (dead rows that cosine sends to
    * NaN/arbitrary neighbors), and the norm DISTRIBUTION (p05/p50/p95 +
    * mean — an unnormalized-mixture fingerprint; a bimodal norm profile
    * means two embedding models got mixed, which no single centroid
    * readout shows).
    *
    * Exactness: each row's norm is one fixed left-fold double tree over
    * the floats, e3-quantized BEFORE crossing rows (the coarse quantum
    * absorbs the engines' float-sum association differences — the q114 CosSimSql
    * convention); counts and the mean are exact integers; percentiles
    * are exact value-grid fences `min v: cum ≥ ⌈q·n/100⌉`. Output:
    * `(keys…, n_vecs, n_bad_dim, n_zero, mean_norm_e3, p05_e3, p50_e3,
    * p95_e3)`. */
  def embeddingHealth(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
                      vecCol: String,
                      dim: Int = 64): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "embeddingHealth needs at least one key column")
    val k = keyCols.map(col)
    val base = graft.functions.Cols.dropNullKeys(df, keyCols)
      .filter(col(vecCol).isNotNull)
      .withColumn("__d", size(col(vecCol)))
      .withColumn("__ne3", expr(
        s"""cast(floor(sqrt(aggregate($vecCol, cast(0.0 as double),
           |  (a, x) -> a + cast(x as double) * cast(x as double)))
           |  * 1000 + 0.5) as bigint)""".stripMargin))
      .localCheckpoint(false)
    val stats = base.groupBy(k: _*)
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("__d") =!= dim, 1L).otherwise(0L)).as("n_bad_dim"),
        sum(when(col("__ne3") === 0L, 1L).otherwise(0L)).as("n_zero"),
        expr("sum(__ne3) div count(1)").as("mean_norm_e3"))
    val wCum = Window.partitionBy(k: _*).orderBy(col("__ne3"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(k: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val fences = base.groupBy(k :+ col("__ne3"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .groupBy(k: _*)
      .agg(
        min(when(expr("__cum >= (5 * __n + 99) div 100"), col("__ne3")))
          .as("p05_e3"),
        min(when(expr("__cum >= (50 * __n + 99) div 100"), col("__ne3")))
          .as("p50_e3"),
        min(when(expr("__cum >= (95 * __n + 99) div 100"), col("__ne3")))
          .as("p95_e3"))
    stats.join(fences, keyCols)
  }

  /** Dominant principal component of an embedding column by fixed-`iters`
    * POWER ITERATION over the exact integer covariance — the eigen-axis
    * the embedding toolbox lacked (anisotropy is the standard "are my
    * embeddings collapsing into one direction" health readout: a rising
    * λ₁/trace means cosine scores are being dominated by a single common
    * direction and ANN recall will decay; Mu & Viswanath 2018's
    * all-but-the-top observation).
    *
    * Exactness contract (hash-checkable end-to-end, the q338/q350
    * fixed-iteration precedent): components e6-quantize PER ROW, the
    * d²-grid second moments and d-grid sums are exact DECIMAL(38,0)
    * aggregates, and the scatter matrix `S = n·Σxx − (Σx)(Σx)ᵀ`
    * (= n²·Cov, exact integers) is normalized to `A = ⌊S·10⁶/max|S|⌋`
    * via the shared posmod floor-div identity. Power iteration then runs
    * in pure integers: `u = A·v`, rescale `v ← ⌊u·10⁶/max|u|⌋`, `iters`
    * times from the all-ones vector; Rayleigh quotient, λ₁ and trace
    * readouts are single floor-divs of exact integers. A SQL oracle
    * replays every step; sign is pinned by the deterministic start.
    *
    * Scale shape: ONE pass over the data builds the (d², d, 1) moment
    * grids — per-row outer products explode rows·d² wide but hash-agg
    * combines map-side, so only d²-sized partials shuffle. The driver
    * iterates on the d×d integer matrix (d ≤ 128 by contract — 16 KB of
    * state, the IVF-centroid discipline). Bound: n²·10¹²·max|x|² < 10³⁸
    * → safe past 10¹² unit-scale rows; fenced fail-loud.
    *
    * Output: ONE row — `n`, `lam1_e6` (top covariance eigenvalue, raw
    * units), `trace_e6` (total variance), `anis_e6` = λ₁/trace,
    * `ray_e6` (Rayleigh quotient in A-units), `top_dim` (1-based argmax
    * |loading|, ties → smallest), `top_sign`. */
  def pcaPowerSlice(df: org.apache.spark.sql.DataFrame, vecCol: String,
                    dim: Int, iters: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(dim >= 2 && dim <= 128, s"dim in [2,128] by contract, got $dim")
    require(iters >= 1, "iters >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(transform(col(vecCol),
        x => floor(x.cast("double") * lit(1e6) + lit(0.5))).as("xq"))
    // ONE mapPartitions pass accumulates the d² outer-product grid, the
    // d sums, and the count as per-partition partials (the genuine
    // per-partition-imperative case — the declarative posexplode form
    // pushes rows·d² rows through the aggregate and measured ~10x slower
    // at 10x data; EXACT integers make any accumulation order
    // bit-identical, so the kernel cannot drift from the oracle). Long
    // accumulators flush to BigInteger every 1024 rows; per-row products
    // are fenced so 1024 of them cannot wrap (|x| < 94 raw units —
    // orders of magnitude above unit-scale embeddings).
    val d = dim
    val partials = base.as[Array[Long]].mapPartitions { it =>
      val accL = new Array[Long](d * d + d)
      val accB = new Array[java.math.BigInteger](d * d + d)
      var cnt = 0L
      var sinceFlush = 0
      def flush(): Unit = {
        var i = 0
        while (i < accL.length) {
          if (accL(i) != 0L) {
            val b = java.math.BigInteger.valueOf(accL(i))
            accB(i) = if (accB(i) == null) b else accB(i).add(b)
            accL(i) = 0L
          }
          i += 1
        }
        sinceFlush = 0
      }
      while (it.hasNext) {
        val x = it.next()
        var i = 0
        while (i < d) {
          val xi = x(i)
          require(math.abs(xi) < 94000000L,
            s"pcaPowerSlice: |component| $xi >= 9.4e7 e6 — 1024-row flush bound")
          var j = 0
          val row = i * d
          while (j < d) {
            accL(row + j) += xi * x(j)
            j += 1
          }
          accL(d * d + i) += xi
          i += 1
        }
        cnt += 1
        sinceFlush += 1
        if (sinceFlush >= 1024) flush()
      }
      flush()
      Iterator.range(0, d * d + d).filter(accB(_) != null)
        .map(k => (k, new java.math.BigDecimal(accB(k)))) ++
        Iterator.single((d * d + d, new java.math.BigDecimal(cnt)))
    }
    val grid = partials.toDF("k", "p")
      .groupBy("k").agg(sum(col("p").cast("decimal(38,0)")).as("s"))
      .collect()
    val momentOf = grid.map(r =>
      r.getInt(0) -> BigInt(r.getAs[java.math.BigDecimal]("s").toBigIntegerExact))
      .toMap
    val n = momentOf.getOrElse(d * d + d, BigInt(0)).toLong
    require(n >= 2, s"pcaPowerSlice: need >= 2 vectors, got $n")
    val sxx = Array.tabulate(dim * dim)(k => momentOf.getOrElse(k, BigInt(0)))
    val sx = Array.tabulate(dim)(i => momentOf.getOrElse(dim * dim + i, BigInt(0)))
    // floor-div by positive m — the same (a − posmod(a,m))/m identity the
    // oracle uses; BigInt.mod is the non-negative posmod
    def fdiv(a: BigInt, m: BigInt): BigInt = (a - a.mod(m)) / m
    val e6 = BigInt(1000000)
    val nB = BigInt(n)
    val s = Array.tabulate(dim, dim)((i, j) =>
      nB * sxx(i * dim + j) - sx(i) * sx(j))
    val maxS = s.flatten.map(_.abs).max
    require(maxS > 0, "pcaPowerSlice: zero scatter (constant embeddings)")
    require(maxS < BigInt(10).pow(37), s"pcaPowerSlice: |S| $maxS within 10x of DECIMAL(38,0)")
    val a = Array.tabulate(dim, dim)((i, j) => fdiv(s(i)(j) * e6, maxS))
    var v = Array.fill(dim)(e6)
    def matvec(x: Array[BigInt]): Array[BigInt] =
      Array.tabulate(dim)(i => (0 until dim).map(j => a(i)(j) * x(j)).sum)
    var it = 0
    while (it < iters) {
      val u = matvec(v)
      val mu = u.map(_.abs).max
      require(mu > 0, "pcaPowerSlice: power iterate vanished")
      v = u.map(ui => fdiv(ui * e6, mu))
      it += 1
    }
    val u = matvec(v)
    val rayE6 = fdiv(u.zip(v).map { case (ui, vi) => ui * vi }.sum * e6,
      v.map(vi => vi * vi).sum)
    // λ(A) = λ(S)·10⁶/max|S|, λ(Cov) = λ(S)/n², components e6 ⇒ raw
    // variance = /10¹²; e6 readout of raw λ₁ ⇒ ⌊ray·max|S| / (n²·10¹⁸)⌋
    val lam1E6 = fdiv(rayE6 * maxS, nB * nB * BigInt(10).pow(18))
    val traceE6 = fdiv((0 until dim).map(i => s(i)(i)).sum, nB * nB * e6)
    require(lam1E6.abs < BigInt("9000000000000000000") &&
      traceE6.abs < BigInt("9000000000000000000"),
      "pcaPowerSlice: readout within 2% of the long fence")
    val anisE6 = if (traceE6 > 0) fdiv(lam1E6 * e6, traceE6).toLong else 0L
    val topDim = (0 until dim).minBy(i => (-v(i).abs, i))
    spark.range(1).select(
      lit(n).as("n"),
      lit(lam1E6.toLong).as("lam1_e6"),
      lit(traceE6.toLong).as("trace_e6"),
      lit(anisE6).as("anis_e6"),
      lit(rayE6.toLong).as("ray_e6"),
      lit(topDim + 1).as("top_dim"),
      lit(v(topDim).signum).as("top_sign"))
  }
}
