package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality classifier over hashed bag-of-words features — the
  * GPT-3/LLaMA-style data-selection filter: train logistic regression to
  * distinguish a positive reference set (curated text) from the raw
  * corpus, then keep documents the model scores as reference-like.
  *
  * Features are hashed token counts (feature-hashing trick, fixed `dim`),
  * L2-normalized per document so the decision is length-invariant.
  * Training is full-batch gradient descent: each iteration is ONE
  * distributed gradient aggregate (`treeAggregate`, map-side combined);
  * the driver holds only the `dim`-sized weight vector — a model fit,
  * same discipline as IVF's centroids. Deterministic: zero-initialized
  * weights, fixed iteration count, and the md5-derived token hash
  * ([[TextHash.hash32]]) — no RNG anywhere. (Float summation order across
  * partitions can differ in the last ulp; scores are rounded before any
  * cross-run comparison.)
  */
object QualityClassifier {

  final case class Model(weights: Array[Double], bias: Double, dim: Int)

  /** Hashed, L2-normalized token-count features. One JVM pass per doc. */
  private[text] def features(text: String, dim: Int): Array[(Int, Double)] = {
    val toks = TextHash.tokenize(text)
    if (toks.length == 1 && toks(0).isEmpty) return Array.empty // empty/blank text
    val counts = new java.util.HashMap[Integer, Double]()
    toks.foreach { t =>
      val idx = (TextHash.hash32(t) % dim).toInt
      counts.merge(idx, 1.0, (a, b) => a + b)
    }
    var norm = 0.0
    counts.values.forEach(v => norm += v * v)
    val s = 1.0 / math.sqrt(norm)
    val out = new Array[(Int, Double)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(i) = (e.getKey.intValue(), e.getValue * s)
      i += 1
    }
    java.util.Arrays.sort(out, Ordering.by((p: (Int, Double)) => p._1))
    out
  }

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Train on `docs` with a 0/1 `labelCol` (1 = reference-like). Batch
    * GD on the logistic loss with L2 regularization. */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            dim: Int = 1024, iters: Int = 30, lr: Double = 1.0,
            l2: Double = 1e-4): Model = {
    require(dim >= 2 && iters >= 1, "dim >= 2, iters >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val data = docs
      // an unlabeled row would NPE inside the primitive-Double tuple
      // decoder mid-job — drop it here with the null texts
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0 &&
        col(labelCol).isNotNull)
      .select(col(labelCol).cast("double").as("y"), col(textCol).as("t"))
      .as[(Double, String)]
      .map { case (y, t) => (y, features(t, dim)) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = data.count().toDouble
    require(n > 0, "no non-empty training documents")
    val rdd = data.rdd // one Dataset->RDD plan, reused every iteration

    val w = new Array[Double](dim)
    var b = 0.0
    var iter = 0
    while (iter < iters) {
      val bcW = spark.sparkContext.broadcast(w.clone())
      val bcB = b
      // gradient(dim) ++ bias gradient at index dim
      val grad = rdd.treeAggregate(new Array[Double](dim + 1))(
        seqOp = (g, row) => {
          val (y, xs) = row
          var z = bcB
          xs.foreach { case (i, v) => z += bcW.value(i) * v }
          val err = sigmoid(z) - y
          xs.foreach { case (i, v) => g(i) += err * v }
          g(dim) += err
          g
        },
        combOp = (a, c) => { var i = 0; while (i < a.length) { a(i) += c(i); i += 1 }; a })
      var i = 0
      while (i < dim) {
        w(i) -= lr * (grad(i) / n + l2 * w(i))
        i += 1
      }
      b -= lr * grad(dim) / n
      bcW.destroy()
      iter += 1
    }
    data.unpersist()
    Model(w, b, dim)
  }

  /** Reference-likeness score in (0, 1): `sigmoid(w·x + b)`. Null text →
    * null; empty text → sigmoid(b). */
  def scoreCol(text: Column, model: Model): Column =
    udf { (t: String) =>
      if (t == null) null.asInstanceOf[java.lang.Double]
      else {
        var z = model.bias
        features(t, model.dim).foreach { case (i, v) => z += model.weights(i) * v }
        java.lang.Double.valueOf(sigmoid(z))
      }
    }.apply(text)

  /** Keep documents scoring at least `threshold` under the model. */
  def filterByQuality(docs: DataFrame, textCol: String, model: Model,
                      threshold: Double): DataFrame =
    docs.filter(scoreCol(col(textCol), model) >= threshold)

  /** Multinomial Naive Bayes over the SAME hashed bag-of-words features —
    * the closed-form sibling of [[train]]: no gradient iterations means
    * every number is one fixed expression over exact counts, so unlike
    * the logistic fit this classifier is END-TO-END hash-checkable by a
    * SQL oracle (q219 vs q93's rows-only).
    *
    * Per-bucket log-likelihood-ratio with Laplace smoothing, ONE `ln`
    * per bucket over a ratio of exact integer products —
    * `w_b = ln( (n⁺_b+1)(N⁻+dim) / ((n⁻_b+1)(N⁺+dim)) )` — quantized to
    * nanonat longs so per-doc sums are integer-exact in any order (the
    * q153/q169 float discipline). Doc score = class-prior nanonats +
    * Σ_token w_bucket; predicted positive when > 0.
    *
    * Scale shape: one token-explode aggregate (map-side combined) for
    * the dim-bounded bucket table, broadcast back onto the exploded
    * tokens, one per-doc sum — text crosses the wire once as tokens,
    * the model is O(dim). Degenerate single-class corpora emit null
    * scores (a ±∞ prior would otherwise overflow silently).
    *
    * Output: `(idCol, label, score_nn, pred)`. */
  def naiveBayes(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: String, dim: Int = 512): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    val base = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0 &&
        col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol).cast("int").as("__y"), col(textCol))
    val toks = base
      .select(col(idCol), col("__y"),
        explode(graft.functions.Cols.tokens(col(textCol))).as("__t"))
      .withColumn("__b", graft.functions.Cols.hash32(col("__t")) % dim)
    val bucket = toks.groupBy("__b").agg(
      sum(col("__y")).cast("long").as("np"),
      sum(lit(1) - col("__y")).cast("long").as("nn"))
    val tot = bucket.agg(sum(col("np")).as("tp"), sum(col("nn")).as("tn"))
    val nanonat = (c: Column) => floor(log(c) * lit(1e9) + lit(0.5)).cast("long")
    val w = bucket.crossJoin(broadcast(tot))
      .select(col("__b"), nanonat(
        ((col("np") + 1) * (col("tn") + dim)).cast("double") /
          ((col("nn") + 1) * (col("tp") + dim)).cast("double")).as("__w"))
    val prior = base.agg(sum(col("__y")).cast("long").as("dp"),
        sum(lit(1) - col("__y")).cast("long").as("dn"))
      .select(when(col("dp") > 0 && col("dn") > 0,
        nanonat(col("dp").cast("double") / col("dn"))).as("__pw"))
    toks.join(broadcast(w), Seq("__b"))
      .groupBy(col(idCol), col("__y").as("label"))
      .agg(sum(col("__w")).as("__s"))
      .crossJoin(broadcast(prior))
      .select(col(idCol), col("label"),
        (col("__pw") + col("__s")).as("score_nn"),
        (col("__pw") + col("__s") > 0).as("pred"))
  }

  /** The shared sigmoid lookup table for [[logisticSlice]] — σ(b/10)
    * e6-quantized for buckets b ∈ [−60, 60]. Computed ONCE here and
    * interpolated as literals into BOTH the Spark plan and the DuckDB
    * oracle SQL (the q276 discount-table precedent), so the two engines
    * share the table by construction — no cross-library `exp` agreement
    * is assumed anywhere. */
  val sigmoidTableE6: IndexedSeq[Long] = (-60 to 60).map { b =>
    math.floor(1e6 / (1.0 + math.exp(-b / 10.0)) + 0.5).toLong
  }

  /** −ln σ and −ln(1−σ) e6-quantized, derived FROM the already-quantized
    * [[sigmoidTableE6]] values (not from a fresh `exp`), so the logistic
    * LOSS itself is a pure integer readout of the shared table. */
  val nllPosTableE6: IndexedSeq[Long] = sigmoidTableE6.map { s =>
    math.floor(-math.log(s / 1e6) * 1e6 + 0.5).toLong
  }
  val nllNegTableE6: IndexedSeq[Long] = sigmoidTableE6.map { s =>
    math.floor(-math.log(1.0 - s / 1e6) * 1e6 + 0.5).toLong
  }

  /** Fixed-iteration LOGISTIC-regression GD over named-word presence
    * features with a table-quantized sigmoid — the hash-checkable slice
    * of [[train]]'s float-logistic-loss axis, the one residue q339's
    * all-integer perceptron could not reach (its update never evaluates
    * σ). The sigmoid is [[sigmoidTableE6]]: z e6-quantized, bucketed to
    * the nearest tenth (round-half-up via exact floor-div — both engines
    * use the same `(a − posmod(a,m))/m` identity, so negative z buckets
    * identically), clamped to [−6, 6], looked up. Every downstream number
    * — error `σ_e6(z) − y·10⁶`, gradient sums, the floor-div weight step
    * `wⱼ ← wⱼ − ⌊Σerr·xⱼ / n⌋`, and the per-doc NLL from
    * [[nllPosTableE6]]/[[nllNegTableE6]] — is exact integer arithmetic,
    * so a SQL oracle unrolls the iterations bit-for-bit (the q339/q335
    * fixed-k precedent). This graduates q93's unchecked surface down to
    * the continuous optimizer (float dot products / unquantized σ) only.
    *
    * Scale shape: `iters` distributed aggregates over a persisted narrow
    * projection (1+k int columns + label); the driver holds ONLY the
    * (1+k)-sized weight vector — the [[train]]/IVF sufficient-statistics
    * discipline. Per-doc NLL ≤ ~6.01e6 (σ clamped to [2473e−6,
    * 997527e−6]), so the cross-corpus long sum is safe to ~1.5e12 docs —
    * fenced fail-loud past 9e18 anyway.
    *
    * Output: ONE row — final e6 weights `w0..wk`, total `nll_e6`,
    * confusion counts at the z > 0 decision, integer-exact `acc_e6`. */
  def logisticSlice(docs: DataFrame, textCol: String,
                    words: Seq[String], targetWord: String,
                    iters: Int): DataFrame = {
    require(words.nonEmpty && iters >= 1, "words nonempty, iters >= 1")
    val toks = graft.functions.Cols.tokens(col(textCol))
    val feats = docs.filter(col(textCol).isNotNull)
      .select((lit(1L).as("x0") +:
        words.zipWithIndex.map { case (w, j) =>
          array_contains(toks, w).cast("long").as(s"x${j + 1}") } :+
        array_contains(toks, targetWord).cast("long").as("y")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val k = words.length + 1
    try {
      val n = feats.count()
      require(n > 0, "no non-null training documents")
      val sigArr = array(sigmoidTableE6.map(lit): _*)
      // z is ≤ (1+k)·max|w| ≤ ~1e8 here — far below 2^53, so the double
      // division after the exact posmod subtraction is exact
      def zOf(w: Array[Long]): Column =
        (0 until k).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)
      def bucketOf(z: Column): Column = {
        val a = z + lit(50000L)
        val fd = ((a - pmod(a, lit(100000L))) / lit(100000.0)).cast("long")
        greatest(least(fd, lit(60L)), lit(-60L))
      }
      def sigOf(z: Column): Column =
        element_at(sigArr, (bucketOf(z) + lit(61L)).cast("int"))
      var w = new Array[Long](k)
      var it = 0
      while (it < iters) {
        val err = sigOf(zOf(w)) - col("y") * lit(1000000L)
        val g = feats.agg(
          coalesce(sum(err * col("x0")), lit(0L)).as("g0"),
          (1 until k).map(j =>
            coalesce(sum(err * col(s"x$j")), lit(0L)).as(s"g$j")): _*).head()
        w = Array.tabulate(k)(j => w(j) - Math.floorDiv(g.getLong(j), n))
        it += 1
      }
      val z = zOf(w)
      val pos = z > 0L
      val nll = when(col("y") === 1L,
        element_at(array(nllPosTableE6.map(lit): _*),
          (bucketOf(z) + lit(61L)).cast("int")))
        .otherwise(element_at(array(nllNegTableE6.map(lit): _*),
          (bucketOf(z) + lit(61L)).cast("int")))
      val c = feats.agg(
        sum(nll).as("nll"),
        count(when(col("y") === 1L && pos, 1)).as("tp"),
        count(when(col("y") === 0L && pos, 1)).as("fp"),
        count(when(col("y") === 0L && !pos, 1)).as("tn"),
        count(when(col("y") === 1L && !pos, 1)).as("fn")).head()
      val (nllE6, tp, fp, tn, fn) =
        (c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3), c.getLong(4))
      require(math.abs(nllE6) < 9000000000000000000L,
        s"logisticSlice: nll_e6 $nllE6 within 2% of the long fence")
      val one = docs.sparkSession.range(1)
      val withW = (0 until k).foldLeft(one.select()) { (df, j) =>
        df.withColumn(s"w$j", lit(w(j))) }
      withW.withColumn("nll_e6", lit(nllE6))
        .withColumn("tp", lit(tp)).withColumn("fp", lit(fp))
        .withColumn("tn", lit(tn)).withColumn("fn", lit(fn))
        .withColumn("acc_e6", lit {
          val total = tp + fp + tn + fn
          if (total == 0L) 0L else (tp + tn) * 1000000L / total
        })
    } finally feats.unpersist()
  }

  /** Fixed-iteration BATCH perceptron over named-word presence features —
    * the hash-checkable slice of [[train]]'s iterative-GD axis (the
    * q335-BPE fixed-k precedent applied to the classifier): ALL-INTEGER
    * arithmetic, so unlike the float logistic loss every engine agrees
    * bit-for-bit and a SQL oracle can unroll the iterations.
    *
    * Features: `x₀ = 1` (bias) and `xⱼ = [wordⱼ ∈ tokens]` for the given
    * word list; label `y = +1` if `targetWord ∈ tokens` else `−1`. One
    * batch iteration: `Δw = Σ_{y·(w·x) ≤ 0} y·x` (the classic perceptron
    * update summed over ALL currently-misclassified docs — order-free,
    * unlike the sequential variant), `w ← w + Δw`. Zero-init makes
    * iteration 1 the class-weighted feature sums. Integer sums are exact
    * in any accumulation order — the determinism the float GD in [[train]]
    * fundamentally cannot offer (its scores round before comparison).
    *
    * Scale shape: `iters` distributed aggregates over a persisted
    * narrow projection (9 int columns); the driver holds ONLY the
    * (1+words)-sized weight vector per round — the IVF-centroid /
    * [[train]] sufficient-statistics discipline. Output: ONE row —
    * final weights `w0..wk`, confusion counts, `acc_e6`
    * (integer-div accuracy, exact). */
  def perceptronSlice(docs: DataFrame, textCol: String,
                      words: Seq[String], targetWord: String,
                      iters: Int): DataFrame = {
    require(words.nonEmpty && iters >= 1, "words nonempty, iters >= 1")
    val toks = graft.functions.Cols.tokens(col(textCol))
    val feats = docs.filter(col(textCol).isNotNull)
      .select((lit(1L).as("x0") +:
        words.zipWithIndex.map { case (w, j) =>
          array_contains(toks, w).cast("long").as(s"x${j + 1}") } :+
        when(array_contains(toks, targetWord), 1L).otherwise(-1L).as("yv")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val k = words.length + 1
    try {
      var w = new Array[Long](k)
      var it = 0
      while (it < iters) {
        val margin = (0 until k).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)
        val miscl = col("yv") * margin <= 0L
        val upd = feats.agg(
          coalesce(sum(when(miscl, col("yv") * col("x0"))), lit(0L)).as("d0"),
          (1 until k).map(j =>
            coalesce(sum(when(miscl, col("yv") * col(s"x$j"))), lit(0L))
              .as(s"d$j")): _*).head()
        w = Array.tabulate(k)(j => w(j) + upd.getLong(j))
        it += 1
      }
      val margin = (0 until k).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)
      val pos = margin > 0L
      // materialize the confusion EAGERLY — the result frame below is
      // built from literals, so the cache can be dropped on exit
      val c = feats.agg(
        count(when(col("yv") === 1L && pos, 1)).as("tp"),
        count(when(col("yv") === -1L && pos, 1)).as("fp"),
        count(when(col("yv") === -1L && !pos, 1)).as("tn"),
        count(when(col("yv") === 1L && !pos, 1)).as("fn")).head()
      val (tp, fp, tn, fn) = (c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3))
      val one = docs.sparkSession.range(1)
      val withW = (0 until k).foldLeft(one.select()) { (df, j) =>
        df.withColumn(s"w$j", lit(w(j))) }
      withW.withColumn("tp", lit(tp)).withColumn("fp", lit(fp))
        .withColumn("tn", lit(tn)).withColumn("fn", lit(fn))
        .withColumn("acc_e6", lit {
          val total = tp + fp + tn + fn
          if (total == 0L) 0L else (tp + tn) * 1000000L / total
        })
    } finally feats.unpersist()
  }
}
