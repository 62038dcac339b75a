package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.text.TextHash

/** KMV (k-minimum-values) distinct-count sketch — the mergeable
  * cardinality sketch tier (Bar-Yossef et al. 2002; the idea behind
  * Theta/HLL-family sketches). Unlike `approx_count_distinct`'s HLL++,
  * KMV over a FIXED hash is exactly replayable in plain SQL: the k
  * smallest distinct 60-bit md5 hashes of a group are a deterministic,
  * ORDER-INDEPENDENT set, so even the approximate estimate
  * hash-matches a DuckDB oracle (the q111 property, for cardinality).
  *
  * Estimator: with `hk` = k-th smallest of the distinct hash values in
  * `[0, 2^60)`, `n̂ = (k-1) · 2^60 / hk` (the classic unbiased KMV
  * form); a group with fewer than k distinct values reports its EXACT
  * distinct count. Standard error ≈ 1/√(k−2) — k=128 gives ~9%.
  *
  * Scale shape: one typed Aggregator with a ≤k-long sorted buffer per
  * (task, group) — map-side partial aggregation collapses each
  * executor's rows to one k-bounded array per group before the
  * shuffle, the same bounded-state contract as [[TopK.perKeyAgg]].
  * `count(DISTINCT x)` by comparison shuffles every distinct value;
  * at 100 TB the sketch is the only affordable per-group cardinality,
  * and merged buffers compose across corpora (union = merge, no rescan).
  *
  * The hash is [[TextHash.hash60Md5]] over the value's string form —
  * portable (`CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)`), and
  * 60 bits keeps birthday collisions (which would undercount) harmless
  * at any per-group cardinality that fits a cluster. */
object Sketch {

  /** `n_est`: estimated distinct count (exact when fewer than k
    * distinct); `kth_hash`: largest retained hash (the k-th smallest
    * overall, 0 for an empty group); `n_kept`: retained hash count
    * (= min(k, true distinct count)). */
  final case class Kmv(n_est: Double, kth_hash: Long, n_kept: Int)

  /** Bounded-buffer KMV aggregator over pre-hashed values. The buffer
    * is a sorted, duplicate-free, ≤k array of hash values; reduce is a
    * binary-search insert, merge a linear sorted-union — both drop
    * everything past the k-th minimum. */
  final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Kmv] {
    require(k >= 3, s"KMV needs k >= 3 (estimator divides by k-2 variance), got $k")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      if (h < 0) return buf // null-value sentinel (hashes live in [0, 2^60))
      val i = java.util.Arrays.binarySearch(buf, h)
      if (i >= 0) buf                             // duplicate hash: a sketch of a SET
      else {
        val ins = -i - 1
        if (ins >= k) buf                         // larger than the k-th minimum
        else {
          val n = math.min(buf.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val out = new Array[Long](math.min(a.length + b.length, k))
        var i = 0; var j = 0; var o = 0
        while (o < out.length && (i < a.length || j < b.length)) {
          val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
          val v = if (takeA) a(i) else b(j)
          if (takeA) i += 1 else j += 1
          if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
          else () // cross-partition duplicate collapses
        }
        if (o == out.length) out else java.util.Arrays.copyOf(out, o)
      }
    }

    override def finish(buf: Array[Long]): Kmv =
      if (buf.isEmpty) Kmv(0.0, 0L, 0)
      else if (buf.length < k) Kmv(buf.length.toDouble, buf.last, buf.length)
      else {
        // (k-1)·2^60 is exact in a double (small mantissa · power of 2);
        // the division is ONE IEEE op — bit-identical cross-engine
        val est = (k - 1).toDouble * 1152921504606846976.0 / buf(k - 1).toDouble
        Kmv(math.floor(est * 100.0 + 0.5) / 100.0, buf(k - 1), k)
      }

    override def bufferEncoder: Encoder[Array[Long]] = implicitly(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
    override def outputEncoder: Encoder[Kmv] = Encoders.product[Kmv]
  }

  private val hash60 = udf((s: String) => if (s == null) None else Some(TextHash.hash60Md5(s)))

  // ---------------------------------------------------------------- CMS

  /** Count-min row-hash constants (Cormen-style `(a·x + b) mod p mod w`
    * with p = 2³¹−1): fixed primes so the sketch — like KMV above — is
    * exactly replayable in portable SQL. `x < p` and `a < p` keep every
    * product under 2⁶², so the arithmetic is overflow-free in any
    * 64-bit engine. */
  private[graft] val CmsP = 2147483647L
  private[graft] val CmsA = Array(1299709L, 15485863L, 32452843L, 49979687L)
  private[graft] val CmsB = Array(104729L, 1299721L, 7919L, 17389L)

  /** Count-min sketch (Cormode & Muthukrishnan 2005) — the mergeable
    * FREQUENCY sketch completing the cardinality tier above: `depth`
    * rows of `width` counters; an item increments one counter per row,
    * a point estimate is the MIN over its row counters — always an
    * overestimate, within `e·N/width` of truth with probability
    * `1 − exp(−depth)`.
    *
    * Scale shape: the buffer is a fixed `depth·width` long array
    * (default 4·1024 = 32 KB) regardless of input size — map-side
    * partial aggregation collapses each task to ONE buffer, merge is
    * elementwise add, and sketches from disjoint corpora compose
    * (union = add, no rescan). An exact `groupBy(value).count()` on a
    * heavy-tailed 100 TB corpus shuffles every distinct value; the CMS
    * ships 32 KB per task and answers the heavy-hitter question the
    * pipeline actually asks.
    *
    * Determinism: counter sums are exact longs and the row hashes are
    * the fixed-prime affine family above, so estimates hash-match a
    * DuckDB oracle replaying the identical arithmetic (the q122
    * property, for frequencies). Depth is fixed at [[CmsA]].length = 4. */
  final class CmsAgg(width: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(width >= 2, s"CMS width must be >= 2, got $width")
    private val d = CmsA.length

    override def zero: Array[Long] = new Array[Long](d * width)

    override def reduce(buf: Array[Long], hm: Long): Array[Long] = {
      if (hm < 0) return buf // null-value sentinel: ignored, not counted
      var i = 0
      while (i < d) {
        buf(i * width + (((CmsA(i) * hm + CmsB(i)) % CmsP) % width).toInt) += 1L
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] = implicitly(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
    override def outputEncoder: Encoder[Array[Long]] = implicitly(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
  }

  /** The pre-hash every CMS path shares: 60-bit md5 reduced mod p. */
  private def cmsPreHash(c: Column): Column = hash60(c.cast("string")) % lit(CmsP)

  /** The CMS update as an aggregate COLUMN (null values ignored by the
    * pre-hash) — usable in any aggregation context, including a
    * Structured Streaming complete-mode aggregate, where the buffer
    * becomes the standing per-key state (merge = elementwise add makes
    * micro-batch slicing invisible, the q66 order-independence
    * property for sketches). */
  def cmsAggCol(value: Column, width: Int = 1024): Column =
    udaf(new CmsAgg(width), Encoders.scalaLong)
      .apply(coalesce(cmsPreHash(value), lit(-1L)))

  /** Point-estimate probe frequencies against an ALREADY-BUILT one-row
    * sketch frame (from [[cmsAggCol]], batch or a drained streaming
    * table). Output: `probes`' columns plus `n_est` — the min-over-rows
    * counter read via built-in `element_at`/`least` (codegen'd; the
    * 32 KB sketch rides a broadcast nested-loop join of exactly one
    * row). The probe side is contractually SMALL (a heavy-hitter
    * shortlist, a watch list). */
  def cmsEstimatesFromSketch(sketch: DataFrame, sketchCol: String,
                             probes: DataFrame, probeCol: String,
                             width: Int = 1024): DataFrame = {
    require(probes.columns.contains(probeCol), s"probe column $probeCol not found")
    val reads = CmsA.indices.map { i =>
      element_at(col("__cms"),
        (lit(i * width) + ((lit(CmsA(i)) * col("__phm") + lit(CmsB(i))) % lit(CmsP)) % lit(width))
          .cast("int") + lit(1))
    }
    probes.withColumn("__phm", cmsPreHash(col(probeCol)))
      .crossJoin(broadcast(sketch.select(col(sketchCol).as("__cms"))))
      .withColumn("n_est", least(reads: _*))
      .drop("__phm", "__cms")
  }

  /** Build one CMS over `valueCol` (nulls ignored) and point-estimate
    * the frequency of every probe row: [[cmsAggCol]] ∘
    * [[cmsEstimatesFromSketch]] in one call for the batch path. */
  def cmsEstimates(df: DataFrame, valueCol: String, probes: DataFrame,
                   probeCol: String, width: Int = 1024): DataFrame = {
    val sketch = df.filter(col(valueCol).isNotNull)
      .agg(cmsAggCol(col(valueCol), width).as("__sk"))
    cmsEstimatesFromSketch(sketch, "__sk", probes, probeCol, width)
  }

  // ------------------------------------------------------- quantiles

  /** Fixed-width-bin quantile sketch — the deterministic member of the
    * approximate-quantile family (exact fan: q08; `approx_percentile`
    * dial: q32). The sketch is the (group, bin) count histogram:
    * mergeable (bin counts add), bounded (|range| ÷ `binWidth` cells
    * per group — the analyst picks the resolution), and — unlike
    * GK/KLL/t-digest, whose buffers depend on arrival order — exactly
    * reproducible, so the estimates hash-match a SQL replay.
    *
    * Estimate: the q-quantile is the lower edge of the first bin whose
    * cumulative count reaches `ceil(q·n)` — a one-sided bound within
    * `binWidth` of the exact quantile. Quantiles are passed in
    * PER-MILLE (950 = p95): the rank threshold `⌈q‰·n / 1000⌉` stays
    * in integer arithmetic end to end — `ceil(0.95 · n)` in doubles
    * flips at binary-representation knife edges, the documented
    * cross-engine trap.
    *
    * Scale shape: one map-side-combining aggregate over (group, bin) —
    * the shuffle carries bin COUNTS, not rows — then the per-group bin
    * grid collects into ONE task where all the rank walks run in-memory
    * (the [[huberLocation]]/[[medMadGrid]] grid-kernel discipline: a
    * window partitioned by group already serialized each group's whole
    * grid into one task; the kernel keeps that contract and drops the
    * two window exchanges + the quantile cross join). `valueCol` must
    * be integral (cast upstream; for money, quantize to cents first)
    * and non-negative bins assume non-negative values (integer `div`
    * truncates toward zero, SQL `//` floors — they agree on
    * non-negatives, the operator's documented domain). */
  def binnedQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      binWidth: Long, qPermille: Seq[Int]): DataFrame = {
    require(groupCols.nonEmpty, "binnedQuantiles needs at least one group column")
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(qPermille.nonEmpty && qPermille.forall(q => q >= 1 && q <= 1000),
      s"quantiles must be per-mille in [1, 1000], got $qPermille")
    val g = groupCols.map(col)
    val counts = df.filter(col(valueCol).isNotNull)
      .withColumn("__bin", expr(s"`$valueCol` div $binWidth"))
      .groupBy(g :+ col("__bin"): _*).agg(count(lit(1)).as("__c"))
    val qArr = qPermille.toArray
    // per-group kernel: sort the bin grid once, walk every requested
    // rank — `(q‰·n + 999) div 1000` is the identical integer fence as
    // the window path this replaced (first bin whose cum reaches it)
    val kern = udf((grid: Seq[Seq[Long]]) => {
      val cells = grid.map(a => (a(0), a(1))).sortBy(_._1).toArray
      val n = cells.iterator.map(_._2).sum
      qArr.toSeq.map { q =>
        val target = (q.toLong * n + 999L) / 1000L
        var cum = 0L; var i = 0; var est = cells.last._1
        var found = false
        while (i < cells.length && !found) {
          cum += cells(i)._2
          if (cum >= target) { est = cells(i)._1; found = true }
          i += 1
        }
        (q, est * binWidth, n)
      }
    })
    counts.groupBy(g: _*)
      .agg(GridFence.collectGrid(array(col("__bin").cast("long"), col("__c")),
        "binnedQuantiles").as("__grid"))
      .withColumn("__q", explode(kern(col("__grid"))))
      .select(g :+ col("__q._1").as("q_permille") :+ col("__q._2").as("est") :+
        col("__q._3").as("n"): _*)
  }

  /** Per-group winsorization at EXACT order statistics: clip `valueCol`
    * into `[element(⌈pLow·n⌉), element(⌈pHigh·n⌉)]` of its group's
    * sorted values — the robust-stats clamp that keeps a fat-tailed
    * metric aggregatable without letting one outlier own the sum.
    *
    * The bounds come from [[binnedQuantiles]] at `binWidth = 1`, where
    * the histogram degenerates to exact value counts and "first bin
    * reaching the rank" becomes "smallest value whose cumulative count
    * reaches the rank" — the exact rank element, no interpolation (the
    * interpolated form averages two values in floating point, the
    * cross-engine trap; the rank element is a value that EXISTS in the
    * data, integer end to end). The shuffle still carries (group,
    * value) COUNTS, not rows — for quantized metrics (cents, token
    * counts) that is the distinct-value count per group, which is how
    * this stays cheap where a sort-based exact percentile shuffles
    * everything.
    *
    * Output: input columns plus `<valueCol>_w` (clipped), `is_low`,
    * `is_high` flags. The bounds frame is group-sized — broadcast back. */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                pLowPermille: Int, pHighPermille: Int): DataFrame = {
    require(pLowPermille < pHighPermille,
      s"pLow ($pLowPermille) must be < pHigh ($pHighPermille)")
    val bounds = binnedQuantiles(df, groupCols, valueCol, 1L,
        Seq(pLowPermille, pHighPermille))
      .groupBy(groupCols.map(col): _*)
      .agg(min(when(col("q_permille") === pLowPermille, col("est"))).as("__lo"),
        min(when(col("q_permille") === pHighPermille, col("est"))).as("__hi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .withColumn("is_low", col(valueCol) < col("__lo"))
      .withColumn("is_high", col(valueCol) > col("__hi"))
      .drop("__lo", "__hi")
  }

  /** [[KmvAgg]] with the raw buffer as output — the SKETCH-VALUED form
    * for pipelines that store per-shard sketches and merge them later
    * (daily partition sketches → monthly cardinality, no rescan). */
  final class KmvBufAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    private val inner = new KmvAgg(k)
    override def zero: Array[Long] = inner.zero
    override def reduce(buf: Array[Long], h: Long): Array[Long] = inner.reduce(buf, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = implicitly(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
    override def outputEncoder: Encoder[Array[Long]] = implicitly(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
  }

  /** Merge ALREADY-BUILT KMV buffers (the k-minimum set union — the
    * mergeable-sketch composition law: merge(sketch(A), sketch(B)) =
    * sketch(A ∪ B), exactly, because the k smallest of a union is a
    * function of each side's k smallest). */
  final class KmvMergeAgg(k: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    private val inner = new KmvAgg(k)
    override def zero: Array[Long] = inner.zero
    override def reduce(buf: Array[Long], s: Array[Long]): Array[Long] =
      inner.merge(buf, if (s == null) inner.zero else s)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] = implicitly(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
    override def outputEncoder: Encoder[Array[Long]] = implicitly(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
  }

  /** Per-group KMV BUFFER (the ≤k sorted minimum hashes) as `sketch` —
    * the storable/mergeable form of [[kmvDistinct]]. */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int = 128): DataFrame = {
    require(groupCols.nonEmpty, "kmvSketch needs at least one group column")
    val agg = udaf(new KmvBufAgg(k), Encoders.scalaLong)
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(coalesce(hash60(col(valueCol).cast("string")), lit(-1L))).as("sketch"))
  }

  /** Union per-shard sketch buffers back to coarser groups and read the
    * estimate — output matches [[kmvDistinct]] of the unsharded data
    * exactly (`groupCols…, n_est, kth_hash, n_kept`). The estimate read
    * is pure built-in column arithmetic over the merged buffer: the same
    * `(k−1)·2⁶⁰ / kth` one-division form as [[KmvAgg.finish]]. */
  def kmvMergeSketches(sketches: DataFrame, groupCols: Seq[String],
                       sketchCol: String, k: Int = 128): DataFrame = {
    require(groupCols.nonEmpty, "kmvMergeSketches needs at least one group column")
    val enc = implicitly(
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
    val agg = udaf(new KmvMergeAgg(k), enc)
    val merged = sketches.groupBy(groupCols.map(col): _*)
      .agg(agg(col(sketchCol)).as("__s"))
    val nKept = size(col("__s"))
    val kth = coalesce(element_at(col("__s"), nKept), lit(0L))
    val est = when(nKept < k, nKept.cast("double"))
      .otherwise(floor((lit((k - 1).toDouble) * lit(1152921504606846976.0) /
        kth.cast("double")) * 100.0 + 0.5) / 100.0)
    merged.select(groupCols.map(col) :+ est.as("n_est") :+
      kth.as("kth_hash") :+ nKept.as("n_kept"): _*)
  }

  /** The KMV update as an aggregate COLUMN (nulls ignored via the same
    * sentinel convention as [[cmsAggCol]]) — usable in any aggregation
    * context, including a complete-mode streaming aggregate where the
    * k-minimum buffer becomes the standing per-key state: merge is a
    * sorted union (order- and micro-batch-slicing-independent), so the
    * drained state equals the batch sketch exactly. Output is the
    * `(n_est, kth_hash, n_kept)` struct of [[Kmv]]. */
  def kmvAggCol(value: Column, k: Int = 128): Column =
    udaf(new KmvAgg(k), Encoders.scalaLong)
      .apply(coalesce(hash60(value.cast("string")), lit(-1L)))

  /** The "smallest value whose cumulative count reaches `⌈q‰·n⌉`" walk
    * of [[binnedQuantiles]] over a PRE-COUNTED `(group, value, count)`
    * frame — for operators that already hold a histogram and need a
    * single exact rank element from it without re-aggregating rows. */
  private def lowerRankElement(counts: DataFrame, groupCols: Seq[String],
                               vCol: String, cCol: String, permille: Int,
                               outCol: String): DataFrame = {
    val g = groupCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy(col(vCol))
    val wAll = Window.partitionBy(g: _*)
    counts
      .withColumn("__cum", sum(col(cCol)).over(wCum))
      .withColumn("__n", sum(col(cCol)).over(wAll))
      .filter(col("__cum") >= expr(s"($permille * __n + 999) div 1000"))
      .groupBy(g: _*).agg(min(col(vCol)).as(outCol))
  }

  /** Per-group robust outlier detection via the median/MAD rule — the
    * fat-tail-safe sibling of the z-score (mean and stddev are
    * themselves dragged by the outliers they're meant to find; the
    * median and the median absolute deviation have 50% breakdown).
    * Flags `|x − median| > k·MAD`.
    *
    * Exactness (the [[winsorize]] discipline): both the median and the
    * MAD are EXACT RANK ELEMENTS (lower median), so for integral
    * `valueCol` every bound and the flag comparison ride exact
    * integers end to end; no interpolated float ever materializes, and
    * the verdicts hash-match a SQL replay.
    *
    * Scale shape: ONE (group, value)-count aggregate over the rows —
    * the deviation histogram is a FUNCTION of the value histogram once
    * the median is known (`count(dev) = Σ count(v) over |v − med| =
    * dev`), so the MAD walk re-bins the histogram, not the data. Both
    * rank walks and the re-bin run over distinct-value counts; the two
    * histogram branches share one identical aggregate subtree, which
    * Spark's ReuseExchange collapses to a single shuffle. The
    * group-sized bound frame broadcasts back onto the rows — the row
    * side is scanned once for the histogram and once for the flags,
    * never shuffled. Output: input columns + `med`, `mad`,
    * `is_outlier`.
    *
    * Integral fast path (the [[huberLocation]] grid-kernel precedent):
    * for byte/short/int/long values both rank walks and the deviation
    * re-bin run IN-TASK over the collected per-group grid
    * ([[medMadGrid]] — bit-identical integer fences), replacing the two
    * histogram window exchanges with one map-side-combined aggregate.
    * A window partitioned by group already serialized each group's
    * whole grid into one task, so the per-group state contract is
    * unchanged. Non-integral values keep the window path (rank
    * elements of doubles are exact as VALUES, but a Long grid isn't).
    * Note: the fast path emits `med`/`mad` as LONG regardless of the
    * input's integral width; the window path preserves the input type. */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Long = 3L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val reserved = Seq("med", "mad", "is_outlier")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"madOutliers emits `$c` — rename the existing column"))
    val g = groupCols.map(col)
    val integral = df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val bounds =
      if (integral) {
        val hist = df.filter(col(valueCol).isNotNull)
          .groupBy(g :+ col(valueCol).cast("long").as("__v"): _*)
          .agg(count(lit(1)).as("__c"))
        val kern = udf((grid: Seq[Seq[Long]]) => {
          val (_, med, mad, _) =
            medMadGrid(grid.map(a => (a(0), a(1))).toArray)
          (med, mad)
        })
        hist.groupBy(g: _*)
          .agg(GridFence.collectGrid(array(col("__v"), col("__c")),
            "madOutliers").as("__grid"))
          .withColumn("__mm", kern(col("__grid")))
          .select(g :+ col("__mm._1").as("med") :+ col("__mm._2").as("mad"): _*)
      } else {
        val hist = df.filter(col(valueCol).isNotNull)
          .groupBy(g :+ col(valueCol).as("__v"): _*).agg(count(lit(1)).as("__c"))
        val med = lowerRankElement(hist, groupCols, "__v", "__c", 500, "med")
        val devHist = hist.join(broadcast(med), groupCols)
          .groupBy(g :+ abs(col("__v") - col("med")).as("__dev"): _*)
          .agg(sum(col("__c")).as("__c"))
        val mad = lowerRankElement(devHist, groupCols, "__dev", "__c", 500, "mad")
        med.join(mad, groupCols)
      }
    df.join(broadcast(bounds), groupCols)
      .withColumn("is_outlier",
        abs(col(valueCol) - col("med")) > lit(k) * col("mad"))
  }

  /** Per-group Huber M-estimate of location, fixed-`iters` IRLS — the
    * robust-location COMPLETION of this tier: the median (50% breakdown,
    * but throws away efficiency) and the trimmed/winsorized means (hard
    * cutoffs) bracket it; Huber's ψ keeps full weight inside
    * `c = 1.345·1.4826·MAD` (95% Gaussian efficiency at the classic
    * tuning) and downweights beyond PROPORTIONALLY, the standard robust
    * mean (Huber 1964). Fixed iteration count from the exact median —
    * the q335/q339 bounded-depth contract that keeps IRLS (otherwise
    * "iterative, no oracle") SQL-replayable as `iters` unrolled
    * aggregates.
    *
    * Exactness: median and MAD are exact rank elements off the value
    * GRID ([[madOutliers]]'s machinery); each IRLS step quantizes the
    * per-VALUE weight `min(1, c/|v−m|)` to e9 BEFORE the sums, so
    * `Σ c_v·w_v·v / Σ c_v·w_v` is a ratio of exact DECIMAL integers and
    * one double division — no float sum ever crosses a row boundary.
    * `MAD = 0` degenerates safely: only `v = m` keeps weight, the
    * iterate stays put.
    *
    * Scale shape: ONE map-side-combined (group, value)-grid aggregate
    * over the rows, then ONE collect of each group's grid into its
    * task, where the rank walks and the `iters` reweighted sums run
    * in-memory (round-14: this replaced 7 grid-wide exchanges — two
    * rank windows, the dev re-bin, the n pass, per-iteration
    * broadcast joins — with one; sf0.1 3.4 → ~2 s). The per-group
    * state is the VALUE GRID, bounded by the value range exactly as
    * the previous rank-window path assumed (a window partitioned by
    * group already serialized each group's whole grid into one task —
    * the kernel keeps that contract and drops the exchanges). The
    * in-task arithmetic is the oracle's, term for term: exact long
    * cum-counts and the `(500n+999) div 1000` fence for med/MAD,
    * `c·w` products summed as BigInt (the DECIMAL(38,0)/HUGEINT
    * side), one correctly-rounded toDouble per ratio — every float op
    * the same fixed tree on both engines.
    * Output: `groupCols…, n, med, mad, huber_e6`. */
  def huberLocation(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    iters: Int = 2): DataFrame = {
    require(groupCols.nonEmpty, "huberLocation needs at least one group column")
    require(iters >= 1 && iters <= 4,
      s"iters must be in [1,4] (the unrolled-oracle contract), got $iters")
    val g = groupCols.map(col)
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol).cast("long").as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val nIters = iters
    val kernel = udf((grid: Seq[Seq[Long]]) =>
      huberKernel(grid.map(a => (a(0), a(1))).toArray, nIters))
    hist.groupBy(g: _*)
      .agg(GridFence.collectGrid(array(col("__v"), col("__c")),
        "huberLocation").as("__grid"))
      .withColumn("__r", kernel(col("__grid")))
      .select(g :+ col("__r._1").as("n") :+ col("__r._2").as("med") :+
        col("__r._3").as("mad") :+ col("__r._4").as("huber_e6"): _*)
  }

  /** Exact lower-median + MAD over one group's sorted-on-demand
    * (value, count) grid — the shared first half of [[huberKernel]] and
    * the integral-type fast path of [[madOutliers]]. Same integer
    * fences as the SQL rank walk (`(500n + 999) div 1000`), so results
    * are bit-identical to the window path it replaces.
    * Returns `(n, med, mad, sortedCells)`. */
  private[graft] def medMadGrid(raw: Array[(Long, Long)])
      : (Long, Long, Long, Array[(Long, Long)]) = {
      val cells = raw.sortBy(_._1)
      val n = cells.iterator.map(_._2).sum
      // lower rank element: min v with cum >= (500n + 999) div 1000 —
      // the identical integer fence as the SQL rank walk
      def rankElem(sorted: Array[(Long, Long)], tot: Long): Long = {
        val target = (500L * tot + 999L) / 1000L
        var cum = 0L; var i = 0
        while (i < sorted.length) {
          cum += sorted(i)._2
          if (cum >= target) return sorted(i)._1
          i += 1
        }
        sorted.last._1
      }
      val med = rankElem(cells, n)
      val devAgg = scala.collection.mutable.TreeMap.empty[Long, Long]
      cells.foreach { case (v, c) =>
        val dev = math.abs(v - med)
        devAgg.update(dev, devAgg.getOrElse(dev, 0L) + c)
      }
      val devCells = devAgg.toArray
      val mad = rankElem(devCells, n)
      (n, med, mad, cells)
  }

  /** The in-task Huber IRLS kernel over one group's (value, count)
    * grid — package-private so the wrap-boundary arithmetic is
    * spec-reachable without synthesizing 10⁹ rows. */
  private[graft] def huberKernel(raw: Array[(Long, Long)],
                                 nIters: Int): (Long, Long, Long, Long) = {
      val (n, med, mad, cells) = medMadGrid(raw)
      val hc = 1.345 * (1.4826 * mad.toDouble)
      var m = med.toDouble
      var it = 0
      while (it < nIters) {
        var num = BigInt(0); var den = BigInt(0)
        cells.foreach { case (v, c) =>
          val dd = math.abs(v.toDouble - m)
          val w = if (dd <= hc) 1000000000L
                  else math.floor(hc / dd * 1e9 + 0.5).toLong
          // widen BEFORE multiplying: c·w as a Long wraps past ~9.2e9
          // rows of one value at full weight (inside the 100 TB
          // envelope for a degenerate hot key)
          val cw = BigInt(c) * w
          num += cw * v
          den += cw
        }
        m = num.toDouble / den.toDouble
        it += 1
      }
      // the M-location is VALUE-scaled (unbounded): fail loud past the
      // e6 long-floor bound rather than silently saturate
      if (math.abs(m) >= 9.0e12)
        throw new IllegalStateException("huberLocation: |m| >= 9e12 " +
          "exceeds the e6 readout bound — rescale values upstream")
      (n, med, mad, math.floor(m * 1e6 + 0.5).toLong)
  }

  /** Per-group distinct-count estimate of `valueCol` (hashed via its
    * string form; nulls are ignored, matching `count(DISTINCT …)`).
    * Output: `groupCols…, n_est, kth_hash, n_kept`. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 128): DataFrame = {
    require(groupCols.nonEmpty, "kmvDistinct needs at least one group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(kmvAggCol(col(valueCol), k).as("__s"))
      .select(groupCols.map(col) :+ col("__s.n_est").as("n_est") :+
        col("__s.kth_hash").as("kth_hash") :+ col("__s.n_kept").as("n_kept"): _*)
  }

  /** Per-group HyperLogLog REGISTER TABLE — the sub-stream-max form of
    * the Flajolet HLL sketch over the same 60-bit hash as [[kmvDistinct]]:
    * `bucket` = low `p` hash bits, `rho` = 1 + leading zeros of the
    * remaining `60−p` bits (so `rho ∈ [1, 61−p]`, with the all-zero
    * remainder pinned to `61−p`). One row per (group, OCCUPIED bucket);
    * absent buckets are register 0 by convention.
    *
    * Kept in exploded relational form — `max` over rows IS the HLL merge
    * law, so register tables from disjoint shards union+re-aggregate to
    * exactly the whole-data table (the same composition law as
    * [[kmvMergeSketches]], here for free from the algebra), partial
    * aggregation is map-side, and every value is a small exact integer
    * the driver can hash against a SQL replay (`length(bin(x))` is the
    * bit length in Spark and DuckDB alike). At 100 TB the sketch is the
    * point: 2^p rows per group regardless of input rows.
    *
    * Output: `groupCols…, bucket, rho`. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   p: Int = 6): DataFrame = {
    require(groupCols.nonEmpty, "hllRegisters needs at least one group column")
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1L << p
    val rhoMax = 60 - p + 1
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+
        hash60(col(valueCol).cast("string")).as("__hk"): _*)
      .withColumn("bucket", col("__hk") % m)
      .withColumn("__rest", expr(s"__hk div $m"))
      .withColumn("__rho",
        when(col("__rest") === 0, lit(rhoMax))
          .otherwise(lit(rhoMax) - length(expr("bin(__rest)"))))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("__rho")).as("rho"))
  }

  /** Pairwise set-algebra readout over per-group KMV sketches — the
    * distinct-overlap questions ("how many users do segments A and B
    * share?") answered from k-sized sketches instead of a raw
    * self-join, for every unordered group pair.
    *
    * The k-minimum set of `A ∪ B` is computable FROM the two buffers
    * (merge law), and membership of its elements in each side's buffer
    * is EXACT: `x ∈ kmin(A∪B) ∧ x ∈ A ⟹ x ≤ kth(A∪B) ≤ kth(A) ⟹ x ∈
    * buffer(A)`. So `n_common` (union-sample elements present in both
    * sides) is a true size-`k_eff` coincidence count, `jaccard ≈
    * n_common/k_eff`, and `|A∩B| ≈ jaccard · est(A∪B)` — the classic
    * KMV intersection estimator, here as pure deterministic array
    * arithmetic over stored buffers, so the whole readout hash-matches
    * a SQL replay of the same k-minimum walk. Below-k unions are exact.
    *
    * Scale shape: the sketch table is group-cardinality-sized; the pair
    * frame is its broadcast self-join (G² tiny rows), and raw data is
    * never rescanned — the same sketches answer every pair. Output:
    * `g1, g2, k_eff, n_common, union_est, jaccard_e6, inter_est`. */
  def kmvPairOverlaps(sketches: DataFrame, groupCol: String,
                      sketchCol: String, k: Int = 128): DataFrame = {
    val a = sketches.select(col(groupCol).as("g1"), col(sketchCol).as("__a"))
    val b = sketches.select(col(groupCol).as("g2"), col(sketchCol).as("__b"))
    val merged0 = array_sort(array_union(col("__a"), col("__b")))
    a.join(broadcast(b), col("g1") < col("g2"))
      .withColumn("__u", merged0)
      .withColumn("k_eff", least(size(col("__u")), lit(k)))
      .withColumn("__m", slice(col("__u"), lit(1), col("k_eff")))
      .withColumn("__kth", element_at(col("__m"), col("k_eff")))
      .withColumn("union_est",
        when(size(col("__u")) < k, size(col("__u")).cast("double"))
          .otherwise(floor((lit((k - 1).toDouble) * lit(1152921504606846976.0) /
            col("__kth").cast("double")) * 100.0 + 0.5) / 100.0))
      .withColumn("n_common", size(filter(col("__m"),
        x => array_contains(col("__a"), x) && array_contains(col("__b"), x))))
      .withColumn("jaccard_e6",
        expr("cast(n_common as bigint) * 1000000 div k_eff"))
      .withColumn("inter_est",
        floor(col("union_est") * col("n_common") / col("k_eff") * 100.0 + 0.5)
          / 100.0)
      .select("g1", "g2", "k_eff", "n_common", "union_est", "jaccard_e6",
        "inter_est")
  }

  /** Union per-shard register tables back to coarser groups — `max`
    * over rows is the HLL merge law, so the result equals
    * [[hllRegisters]] of the unsharded data exactly. */
  def hllMergeRegisters(registers: DataFrame,
                        groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "hllMergeRegisters needs a group column")
    registers.groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** The estimate readout of [[hllRegisters]]: per group, the
    * bias-corrected harmonic mean `α_m·m²/Σ2^{−rho}` (absent buckets
    * contribute 2⁰ each), with the standard linear-counting fallback
    * `m·ln(m/V)` when the raw estimate is below `2.5m` and empty
    * buckets remain. Output: `groupCols…, n_est`. */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
                  p: Int = 6): DataFrame = {
    val m = (1L << p).toDouble
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    registers.groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), -col("rho"))).as("__z"),
        count(lit(1)).as("__v"))
      .withColumn("__zfull", col("__z") + (lit(m) - col("__v")))
      .withColumn("__raw", lit(alpha) * lit(m) * lit(m) / col("__zfull"))
      .withColumn("n_est",
        when(col("__raw") <= lit(2.5 * m) && col("__v") < lit(m),
          lit(m) * log(lit(m) / (lit(m) - col("__v"))))
          .otherwise(col("__raw")))
      .select(groupCols.map(col) :+ col("n_est"): _*)
  }

  /** EXACT weighted percentiles per group — the survey-statistics /
    * importance-sampling readout ([[binnedQuantiles]] is unweighted and
    * approximate; weighted quantiles have no Spark built-in at all):
    * the weighted q-quantile is the smallest value whose cumulative
    * weight reaches q of the total, i.e. `min(value | cumw·1000 ≥
    * q‰·totw)` — an integer cross-multiplication, no weight
    * normalization ever happens in floats.
    *
    * Plan shape (round 17 — the bucketed distributed crossing): the
    * round-16 form ran ONE (keys)-partitioned row window, which is a
    * single sort task PER KEY — with 3 return flags that caps
    * parallelism at 3 forever, and the whole-engine 100× sweep caught
    * it as the only member scaling ~linearly with data on 32 cores
    * (86.6× wall for 100× rows, every peer 2–22×). The rewrite keeps
    * the identical value semantics with no per-key serialization:
    *   1. (keys, value) weight-cell aggregate — THE row-scale shuffle,
    *      map-side combined (shrinks when values repeat, never grows);
    *   2. per-key (min, max, total) stats → ≤1024 value-range buckets;
    *      bucket weight sums are a second cells-scale combine;
    *   3. bucket prefix sums + per-permille crossing-bucket pick run on
    *      the BUCKET table (≤1024 rows/key — the only window left);
    *   4. only crossing-bucket cells survive a broadcast semi-join and
    *      collect per (key, permille) through [[GridFence]] (site
    *      `weightedPercentiles` — adversarial all-mass-in-one-bucket
    *      concentration fails loud, the quantize-upstream contract);
    *      the exact rank walk folds in-task over the sorted cell grid.
    * Null values sort first in the round-16 window and could never be
    * an answer (min skips null); here they form bucket −1, whose weight
    * enters every prefix — same fences, same answers.
    *
    * `valueCol` integral (cents upstream), `weightCol` integral positive
    * (fails loudly on ≤ 0 / null — silent zero weights would shift every
    * quantile after them). Caller keeps `totw·1000` under 2⁶³. */
  def weightedPercentiles(df: DataFrame, groupCols: Seq[String],
                          valueCol: String, weightCol: String,
                          permilles: Seq[Int]): DataFrame = {
    require(groupCols.nonEmpty, "weightedPercentiles needs at least one group column")
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1, 1000], got $permilles")
    val k = groupCols.map(col)
    val v = col(valueCol).cast("long")
    val wgt = col(weightCol).cast("long")
    val guarded = when(wgt.isNull || wgt <= 0, raise_error(concat(
        lit(s"weightedPercentiles: null or non-positive weight in $weightCol"),
        lit(" at value "), v.cast("string")))).otherwise(wgt)
    // lazy localCheckpoint (the brierDecomposition pattern): the cell
    // grid feeds the stats pass, the bucket pass, and the survivor join
    val cells = df.select((k :+ v.as("__v") :+ guarded.as("__w")): _*)
      .groupBy(k :+ col("__v"): _*).agg(sum(col("__w")).as("__w"))
      .localCheckpoint(false)
    val stats = cells.groupBy(k: _*)
      .agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
        sum(col("__w")).as("__tot"))
      .withColumn("__bw",
        greatest(lit(1L), expr("(__mx - __mn + 1024) div 1024")))
    val withB = cells.join(broadcast(stats), groupCols)
      .withColumn("__b",
        when(col("__v").isNull, lit(-1L))
          .otherwise(expr("(__v - __mn) div __bw")))
    val buckets = withB.groupBy(k :+ col("__b"): _*)
      .agg(sum(col("__w")).as("__wb"), max(col("__tot")).as("__tot"))
    // the ONLY window: bucket-table-sized (≤ 1025 rows per key)
    val pre = buckets.withColumn("__cb",
      coalesce(sum(col("__wb")).over(Window.partitionBy(k: _*).orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // crossing bucket per permille: min b ≥ 0 whose cumulative reaches
    // the target (a crossing inside the null bucket propagates to the
    // first value-carrying bucket — cum is nondecreasing)
    val targets = pre
      .withColumn("__p", explode(array(permilles.map(p => lit(p)): _*)))
      .filter(col("__b") >= 0 &&
        (col("__cb") + col("__wb")) * 1000 >= col("__p") * col("__tot"))
      .groupBy(k :+ col("__p"): _*)
      .agg(min(struct(col("__b"), col("__cb"))).as("__t"))
      // rename the key columns out of the way: targets shares withB's
      // lineage, and a qualified self-join would hit the ambiguous-
      // reference trap
      .select(groupCols.map(c => col(c).as(s"__t_$c")) ++
        Seq(col("__p"), col("__t.__b").as("__tb"), col("__t.__cb").as("__cb")): _*)
    val surv = withB.join(broadcast(targets),
      groupCols.map(c => col(c) === col(s"__t_$c")).reduce(_ && _) &&
        col("__b") === col("__tb"))
      .select((k :+ col("__p") :+ col("__cb") :+
        col("__tot") :+ col("__v") :+ col("__w")): _*)
    val walk = surv
      .groupBy(k :+ col("__p") :+ col("__cb") :+ col("__tot"): _*)
      .agg(GridFence.collectGrid(array(col("__v"), col("__w")),
        "weightedPercentiles").as("__grid"))
      .withColumn("__ans", expr(
        """aggregate(array_sort(__grid),
          |  named_struct('cum', __cb, 'ans', cast(null as bigint)),
          |  (acc, x) -> named_struct(
          |    'cum', acc.cum + x[1],
          |    'ans', if(acc.ans is null and (acc.cum + x[1]) * 1000 >= __p * __tot,
          |              x[0], acc.ans)),
          |  acc -> acc.ans)""".stripMargin))
    val pivot = walk.groupBy(k: _*)
      .agg(min(when(col("__p") === permilles.head, col("__ans"))).as(s"p${permilles.head}"),
        permilles.tail.map(p =>
          min(when(col("__p") === p, col("__ans"))).as(s"p$p")): _*)
    stats.select(k :+ col("__tot").as("total_weight"): _*)
      .join(pivot, groupCols, "left")
      .select((k :+ col("total_weight")) ++ permilles.map(p => col(s"p$p")): _*)
  }

  /** Per-group distribution-free confidence interval for the MEDIAN by
    * exact order statistics — the binomial argument (no normality, no
    * bootstrap, no resampling cost): ranks
    * `l = max(1, ⌊(n − z√n)/2⌋)` and `u = min(n, ⌈1 + (n + z√n)/2⌉)`
    * bracket the median with ≈95% coverage at z = 1.96, and the bounds
    * are the l-th and u-th smallest VALUES — the robust companion of
    * [[graft.operators.MonteCarlo.poissonBootstrapCi]]'s mean CI at
    * none of its ×replicates cost.
    *
    * Exactness: ranks are a fixed double tree of n alone (floor/ceil —
    * both engines agree on the same double); the order statistics come
    * off the (group, value) count grid by cumulative-count fences
    * (`min v with cum ≥ k` — the trimmedMean convention, integer
    * comparisons). The median itself is the lower median
    * `k = (n+1) div 2`. Groups with n < 2 emit the value as all three.
    *
    * Scale shape: ONE map-side-combined histogram aggregate; the rank
    * walks run IN-TASK over the collected per-group value grid (the
    * [[medMadGrid]] discipline — a window partitioned by group already
    * serialized the grid into one task; the kernel drops the window
    * exchange, bit-identical fences). Bin continuous values upstream —
    * the ksDrift dial. Output: `(groupCols…, n, median, lo, hi)`. */
  def medianCi(df: DataFrame, groupCols: Seq[String],
               valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "medianCi needs at least one group column")
    val k = groupCols.map(col)
    val v = col(valueCol).cast("long")
    val grid = graft.functions.Cols.dropNullKeys(df, groupCols)
      .filter(v.isNotNull)
      .groupBy(k :+ v.as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val kern = udf((g: Seq[Seq[Long]]) => {
      val cells = g.map(a => (a(0), a(1))).sortBy(_._1).toArray
      val n = cells.iterator.map(_._2).sum
      // the identical double trees as the SQL ranks: floor/ceil on the
      // same IEEE expression, then the same greatest/least clamps
      val rt = 1.96 * math.sqrt(n.toDouble)
      val lr = math.max(1L, math.floor((n.toDouble - rt) / 2.0).toLong)
      val ur = math.min(n, math.ceil(1.0 + (n.toDouble + rt) / 2.0).toLong)
      def firstAtOrAbove(rank: Long): Long = {
        var cum = 0L; var i = 0
        while (i < cells.length) {
          cum += cells(i)._2
          if (cum >= rank) return cells(i)._1
          i += 1
        }
        cells.last._1
      }
      (n, firstAtOrAbove((n + 1L) / 2L), firstAtOrAbove(lr), firstAtOrAbove(ur))
    })
    grid.groupBy(k: _*)
      .agg(GridFence.collectGrid(array(col("__v"), col("__c")),
        "medianCi").as("__grid"))
      .withColumn("__r", kern(col("__grid")))
      .select(k :+ col("__r._1").as("n") :+ col("__r._2").as("median") :+
        col("__r._3").as("lo") :+ col("__r._4").as("hi"): _*)
  }

  /** ABC / Pareto classification per group — the inventory-analysis
    * staple: items ranked by consumption, class A while the cumulative
    * share is within `aPermille`‰, B within `bPermille`‰, C after.
    * The share test is integer cross-multiplication (`cum·1000 ≤
    * limit·total`), cumulative share INCLUSIVE of the current item (the
    * standard convention), ranked by `(value desc, item)` so ties are a
    * total order.
    *
    * Plan shape: ONE (group)-partitioned window over item-aggregate-
    * sized rows (the caller usually aggregates raw rows to items first).
    * Output adds `rank`, `cum_permille`, `abc_class`. */
  def abcClassify(df: DataFrame, groupCols: Seq[String], itemCol: String,
                  valueCol: String, aPermille: Int = 800,
                  bPermille: Int = 950): DataFrame = {
    require(groupCols.nonEmpty, "abcClassify needs at least one group column")
    require(aPermille >= 1 && bPermille > aPermille && bPermille <= 1000,
      s"need 1 <= aPermille < bPermille <= 1000, got $aPermille/$bPermille")
    val v = col(valueCol).cast("long")
    val part = Window.partitionBy(groupCols.map(col): _*)
    val ord = part.orderBy(v.desc, col(itemCol))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("rank", row_number().over(ord))
      .withColumn("__cum", sum(v).over(run))
      .withColumn("__tot", sum(v).over(part))
      .withColumn("cum_permille", expr("__cum * 1000 div __tot"))
      .withColumn("abc_class",
        when(col("__cum") * 1000 <= lit(aPermille) * col("__tot"), "A")
          .when(col("__cum") * 1000 <= lit(bPermille) * col("__tot"), "B")
          .otherwise("C"))
      .drop("__cum", "__tot")
  }

  /** Gini concentration coefficient per group — "how unequal is this
    * distribution" (revenue over customers, tokens over domains): for
    * values sorted ascending, `G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)`.
    * Numerator and denominator are EXACT DECIMAL(38,0) (round-11: the
    * old LONG route WRAPPED silently — `i·xᵢ` is n·max(x) per row and
    * Σ i·xᵢ ≈ n²·x̄/2 passes 2⁶³ near 10⁶ cents-valued rows per group,
    * exactly the q349/q178 overflow class; the oracle's HUGEINT sums
    * never had the hazard). The single IEEE division lands in
    * `gini_e6` (|G| ≤ 1, so the e6 readout cannot saturate). Equal
    * values commute in Σ i·xᵢ, so any stable sort gives the same sum —
    * deterministic without a tiebreak. Requires non-negative values
    * (fails loudly: a negative would make G meaningless silently).
    *
    * ONE window + aggregate on the same partitioning. */
  def gini(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "gini needs at least one group column")
    val v0 = col(valueCol).cast("long")
    val v = when(v0 < 0, raise_error(concat(
        lit(s"gini: negative value in $valueCol: "), v0.cast("string"))))
      .otherwise(v0)
    val ord = Window.partitionBy(groupCols.map(col): _*).orderBy(v0)
    df.filter(v0.isNotNull)
      .withColumn("__i", row_number().over(ord))
      .withColumn("__ix", col("__i").cast("decimal(38,0)") * v)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(v0).as("total"),
        sum(col("__ix")).as("__six"))
      .withColumn("gini_e6",
        when(col("total") > 0, floor(
          (lit(2L).cast("decimal(38,0)") * col("__six") -
            (col("n") + 1).cast("decimal(38,0)") * col("total")).cast("double") /
            (col("n").cast("decimal(38,0)") * col("total")).cast("double")
            * 1e6 + 0.5).cast("long")))
      .drop("__six")
  }

  /** Per-group trimmed mean by EXACT ranks — drop the lowest and
    * highest `k = n·trimPermille div 1000` observations and average the
    * rest: the location estimate that survives fat tails without
    * [[winsorize]]'s clamping bias (winsorize REPLACES the tails with
    * the fence values, pulling the mean toward them; trimming removes
    * them outright — the Olympic-scoring convention).
    *
    * Tie-exact without sorting rows: on the per-(group, value) count
    * grid, rows whose cumulative count ≤ k are fully trimmed, and the
    * BOUNDARY value contributes its partial multiplicity
    * `(k − cum_below)·v` — all exact integers, so
    * `trimmed_mean_e6 = (Σ − bottom − top)·10⁶ div (n − 2k)`
    * hash-matches a SQL replay. BIGINT bounds: `Σ|v|·10⁶ < 2⁶³`.
    *
    * Scale shape: ONE map-side-combined histogram aggregate; the
    * cumulative walks and the boundary assembly run IN-TASK over the
    * collected per-group value grid (the [[medMadGrid]] discipline —
    * a window partitioned by group already serialized the grid into
    * one task; the kernel drops both window exchanges, term-identical
    * Long arithmetic incl. the documented wrap contract). Bin
    * continuous values upstream — the ksDrift dial. Output:
    * `(groupCols…, n, n_trimmed_each, trimmed_mean_e6)`; groups with
    * `n − 2k ≤ 0` emit null. */
  def trimmedMean(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  trimPermille: Int = 50): DataFrame = {
    require(groupCols.nonEmpty, "trimmedMean needs at least one group column")
    require(trimPermille >= 0 && trimPermille < 500,
      s"trimPermille must be in [0, 500), got $trimPermille")
    val g = groupCols.map(col)
    val x = col(valueCol).cast("long")
    val hist = df.filter(x.isNotNull)
      .groupBy(g :+ x.as("__v"): _*).agg(count(lit(1)).as("__c"))
    val trim = trimPermille.toLong
    val kern = udf((grid: Seq[Seq[Long]]) => {
      val cells = grid.map(a => (a(0), a(1))).sortBy(_._1).toArray
      val n = cells.iterator.map(_._2).sum
      val s = cells.iterator.map { case (v, c) => v * c }.sum
      val k = n * trim / 1000L
      // ascending walk: fully-trimmed bottom cells (cum <= k), the
      // boundary value lo = min v with cum > k; the descending
      // cumulative is n - cumA + c (decreasing in ascending order), so
      // the top side falls out of the SAME pass — identical terms to
      // the window form this replaced
      var cumA = 0L
      var botFull = 0L; var botCnt = 0L; var lo = 0L; var loSet = false
      var topFull = 0L; var topCnt = 0L; var hi = 0L; var hiSet = false
      cells.foreach { case (v, c) =>
        cumA += c
        val cumD = n - cumA + c
        if (cumA <= k) { botFull += v * c; botCnt = cumA }
        else if (!loSet) { lo = v; loSet = true }
        if (cumD <= k) { topFull += v * c; if (topCnt == 0L) topCnt = cumD }
        else { hi = v; hiSet = true } // last cell with cumD > k = max v
      }
      val denom = n - 2L * k
      if (denom <= 0L || !loSet || !hiSet) (n, k, None: Option[Long])
      else {
        val bot = botFull + (k - botCnt) * lo
        val top = topFull + (k - topCnt) * hi
        (n, k, Some((s - bot - top) * 1000000L / denom))
      }
    })
    hist.groupBy(g: _*)
      .agg(GridFence.collectGrid(array(col("__v"), col("__c")),
        "trimmedMean").as("__grid"))
      .withColumn("__r", kern(col("__grid")))
      .select(g :+ col("__r._1").as("n") :+
        col("__r._2").as("n_trimmed_each") :+
        col("__r._3").as("trimmed_mean_e6"): _*)
  }

  /** Per-key Hill tail-index estimator — "how heavy is the upper tail":
    * `α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1))` over the k largest order
    * statistics. The TAIL diagnostic the existing family can't give:
    * Zipf's slope fits rank-frequency of TOKENS, Gumbel return levels
    * assume the max-domain, winsorize/MAD just clip — Hill measures the
    * power-law exponent of any positive metric's tail (α ≤ 2 means
    * infinite variance: mean-based monitoring of that metric is
    * statistically meaningless, the single most actionable fact about
    * a latency/size column). Small α = heavy tail.
    *
    * Exactness: order statistics are deterministic
    * (`value DESC, tieCol ASC` row_number); each log-ratio is ONE fixed
    * tree e9-quantized PER ROW (the nmiFromCells discipline), the sum
    * is an exact integer, and α is one double division e6-quantized.
    * Keys with fewer than k+1 positive values use `k = n − 1` (the
    * standard truncation); keys with exactly 2 positive values, or a
    * zero ratio sum (top k+1 values all equal), emit null α; a
    * single-value key emits nothing.
    *
    * Scale shape: one top-(k+1) window per key (leaderboard-sized cut
    * — pool through TopK.perKeyAgg first if per-key rows are
    * corpus-bounded, the q255 dial), then one aggregate. Output:
    * `(keys…, n_pos, k_used, x_kplus1, tail_alpha_e6)`. */
  def hillTailIndex(df: DataFrame, keyCols: Seq[String], valueCol: String,
                    tieCol: String, k: Int = 50): DataFrame = {
    require(keyCols.nonEmpty, "hillTailIndex needs at least one key column")
    require(k >= 2, s"k must be >= 2, got $k")
    val g = keyCols.map(col)
    val v = col(valueCol).cast("long")
    val wRank = Window.partitionBy(g: _*)
      .orderBy(col("__x").desc, col("__tb").asc)
    val wAll = Window.partitionBy(g: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = graft.functions.Cols.dropNullKeys(df, keyCols)
      .filter(v.isNotNull && v > 0 && col(tieCol).isNotNull)
      .select((g :+ v.as("__x") :+ col(tieCol).as("__tb")): _*)
      .withColumn("__r", row_number().over(wRank).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__k", least(lit(k.toLong), col("__n") - 1L))
      .filter(col("__r") <= col("__k") + 1L)
    val fence = ranked.filter(col("__r") === col("__k") + 1L)
      .select((g :+ col("__x").as("__xf")): _*)
    ranked.filter(col("__r") <= col("__k"))
      .join(fence, keyCols)
      .withColumn("__lr", expr(
        """cast(floor(ln(cast(__x as double) / cast(__xf as double))
          |  * 1e9 + 0.5) as bigint)""".stripMargin))
      .groupBy(g: _*)
      .agg(max(col("__n")).as("n_pos"), max(col("__k")).as("k_used"),
        max(col("__xf")).as("x_kplus1"), sum(col("__lr")).as("__s"))
      .withColumn("tail_alpha_e6", expr(
        """case when __s > 0 and k_used >= 2 then
          |  cast(floor(cast(k_used as double) * 1.0e15
          |    / cast(__s as double) + 0.5) as bigint)
          |end""".stripMargin))
      .drop("__s")
  }

  /** Qn robust scale per key (Rousseeuw & Croux 1993) — the efficient
    * robust-scale completion beside the MAD (q146) and the Huber
    * location (q345): `Qn = d·{|xᵢ − xⱼ| : i < j}₍ₖ₎` with
    * `k = C(h,2), h = ⌊n/2⌋+1` and the Gaussian consistency factor
    * d = 2.2219. 50% breakdown like the MAD but 82% efficiency (vs the
    * MAD's 37%) and no symmetry assumption — the right dispersion
    * readout for skewed metrics.
    *
    * Exactness (the q346 grid×grid framing): the O(n²) pair multiset is
    * the self-cross of the per-key VALUE GRID with multiplicity `ca·cb`
    * (plus `C(c,2)` zero-diffs per tied value), so the k-th order
    * statistic is an exact cumulative-count walk over the DIFFERENCE
    * grid — integers end-to-end; the consistency factor is ONE double
    * multiply of the exact integer d₍ₖ₎ at readout. Bounded-cardinality
    * value domain by contract (quantize/bin upstream — the q146/q308
    * convention). Keys with n < 2 have no pairs and drop.
    *
    * Output: `(keys…, n, n_pairs, k, dk, qn_e4)`. */
  def qnScale(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    qnFromGrid(qnGrid(df, keyCols, valueCol), keyCols)

  /** The per-key VALUE GRID behind [[qnScale]] — split out (the
    * didMoments factoring) so the streaming twin can hold exactly this
    * grid as complete-mode state and share [[qnFromGrid]]'s readout. */
  def qnGrid(df: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "qnScale needs at least one key column")
    graft.functions.Cols.dropNullKeys(df, keyCols)
      .filter(col(valueCol).isNotNull)
      // floor, not a bare cast: Spark's cast-to-long truncates while
      // DuckDB's CAST rounds, so a fractional input would silently
      // diverge between engines; explicit floor() on BOTH sides makes
      // the quantization engine-independent (identity on integral input)
      .groupBy(keyCols.map(col) :+
        floor(col(valueCol)).cast("long").as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
  }

  /** Qn readout over a [[qnGrid]] — everything (n, pairs, the k-th
    * difference walk) derives from the grid alone, so the batch operator
    * and the streaming twin cannot drift. */
  def qnFromGrid(grid: DataFrame, keyCols: Seq[String]): DataFrame = {
    val k = keyCols.map(col)
    val cross = grid.as("a").join(grid.as("b"),
        keyCols.map(c => col(s"a.$c") === col(s"b.$c"))
          .reduce(_ && _) && col("a.__v") > col("b.__v"))
      .select(keyCols.map(c => col(s"a.$c").as(c)) :+
        (col("a.__v") - col("b.__v")).as("__d") :+
        // DECIMAL: ca·cb passes 2⁶³ once a single value holds ~3e9 rows
        (col("a.__c").cast("decimal(38,0)") * col("b.__c")).as("__cnt"): _*)
    val ties = grid.filter(col("__c") >= 2)
      .select(k :+ lit(0L).as("__d") :+
        // c(c−1) is even, so the decimal halving is exact at any scale
        expr("cast(cast(__c as decimal(38,0)) * (__c - 1) / 2 as decimal(38,0))")
          .as("__cnt"): _*)
    val diffs = cross.unionByName(ties)
      .groupBy(k :+ col("__d"): _*)
      .agg(sum(col("__cnt")).as("__cd"))
    val wCum = Window.partitionBy(k: _*).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val counts = grid.groupBy(k: _*).agg(sum(col("__c")).as("n"))
      .withColumn("__h", expr("n div 2 + 1"))
      .withColumn("k", expr("__h * (__h - 1) div 2"))
      .withColumn("n_pairs", expr("n * (n - 1) div 2"))
      .filter(col("k") >= 1L)
    diffs
      .withColumn("__cum", sum(col("__cd")).over(wCum))
      .join(counts, keyCols)
      .filter(col("__cum") >= col("k"))
      .groupBy(k: _*)
      .agg(max(col("n")).as("n"), max(col("n_pairs")).as("n_pairs"),
        max(col("k")).as("k"), min(col("__d")).as("dk"))
      .withColumn("qn_e4",
        expr("cast(floor(2.2219 * cast(dk as double) * 10000 + 0.5) as bigint)"))
      .orderBy(k: _*)
  }
}
