package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Builder-brief extension operator.
  *
  * Two paths:
  *   - [[bruteForceTopK]] — exact cosine top-k; the correctness baseline.
  *     Query side must be small (it is broadcast); corpus side streams.
  *   - [[lshTopK]] — sign-random-projection LSH: bucket by the sign pattern
  *     of `nBits` fixed pseudo-random hyperplanes, compare only within
  *     buckets. At 100 TB the bucket join replaces the all-pairs cross
  *     product; recall is tuned by `nBits`/`nTables`.
  *
  * Hyperplanes are derived from the same counter-based deterministic
  * randoms as [[graft.operators.MonteCarlo]] — reproducible, no driver RNG.
  */
object Similarity {

  /** Exact cosine top-k of `corpus` for every row of `queries`.
    * Output: (query_id, neighbor_id, cos_sim, rank). Cosine is rounded to
    * `roundTo` decimals BEFORE ranking so ranking is stable across
    * float-summation orders; ties break on neighbor id. Scoring is the
    * native codegen'd [[org.apache.spark.sql.graft.CosineSim]] expression
    * — ~2x the UDF kernel (no per-row Array[Float] conversion), ~100x the
    * interpreted higher-order-function form. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     roundTo: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val pairs = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
    rankExact(pairs, k, roundTo)
  }

  /** The one place the exact-ranking contract lives (shared by
    * [[bruteForceTopK]] and [[quantizedTopK]]'s re-rank, and replayed by
    * their DuckDB oracles): codegen'd cosine over (__qv, __cv), rounded
    * BEFORE ranking so float-summation order cannot flip ranks, ties to
    * the smaller neighbor id. */
  private def rankExact(pairs: DataFrame, k: Int, roundTo: Int): DataFrame = {
    val scored = pairs.select(col("query_id"), col("neighbor_id"),
      round(org.apache.spark.sql.graft.CosineSim(col("__qv"), col("__cv")), roundTo)
        .as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Two-stage quantized top-k: an int8-quantized COARSE pass ranks a
    * `refine`·k candidate pool per query, then the exact codegen'd cosine
    * re-ranks only the pool — the standard re-rank ANN shape (IVF-PQ's
    * ancestor). The corpus streams as codes+scale (4x smaller than
    * float32: at 100 TB of embeddings that is the difference between
    * spilling and not); the refine factor buys back the quantization
    * error, and every stage is deterministic (portable floor rounding,
    * round-before-rank, id tiebreaks), so the result is engine-replayable
    * — unlike LSH/IVF this approximate path still hash-matches an oracle.
    * Output: (query_id, neighbor_id, cos_sim, rank), exact scores. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame,
                    idCol: String, vecCol: String, k: Int,
                    refine: Int = 4, roundTo: Int = 4): DataFrame = {
    require(refine >= 1, s"refine must be >= 1, got $refine")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val quant = udf((v: Array[Float]) =>
      if (v == null) null
      else { val s = VectorOps.int8Scale(v); (VectorOps.quantizeInt8(v, s), s) })
    val c = corpus
      .select(col(idCol).as("neighbor_id"), quant(col(vecCol)).as("__q"))
      .select(col("neighbor_id"),
        col("__q").getField("_1").as("__codes"),
        col("__q").getField("_2").as("__scale"))
    // coarse cosine(q_float, dequantized c) — index-ascending double
    // accumulation, the same order the DuckDB replay sums in
    val coarse = udf((qv: Array[Float], codes: Array[Byte], scale: Double) => {
      if (qv == null || codes == null) null
      else {
        var dot = 0.0; var nq = 0.0; var nc = 0.0
        val n = math.min(qv.length, codes.length)
        var i = 0
        while (i < n) {
          val cd = codes(i) * scale
          dot += qv(i).toDouble * cd
          nc += cd * cd
          i += 1
        }
        while (i < codes.length) { val cd = codes(i) * scale; nc += cd * cd; i += 1 }
        var j = 0
        while (j < qv.length) { nq += qv(j).toDouble * qv(j); j += 1 }
        val den = math.sqrt(nq) * math.sqrt(nc)
        if (den == 0.0) null else java.lang.Double.valueOf(dot / den)
      }
    })
    val pool = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(coarse(col("__qv"), col("__codes"), col("__scale")), roundTo).as("__coarse"))
    val wp = Window.partitionBy("query_id")
      .orderBy(col("__coarse").desc, col("neighbor_id"))
    val cand = pool.withColumn("__r", row_number().over(wp))
      .filter(col("__r") <= k * refine)
      .select("query_id", "neighbor_id")
    // exact re-rank joins float vectors back onto the SMALL pool only
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    rankExact(cand.join(cv, Seq("neighbor_id")).join(broadcast(q), Seq("query_id")), k, roundTo)
  }

  /** MMR-diversified top-k (Carbonell & Goldstein 1998) — the RAG
    * retrieval staple plain top-k misses: near-duplicate neighbors
    * crowd out coverage, so each step picks
    * `argmax λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)` over the remaining
    * relevance pool. Fixed λ = ½, so TWICE the score is the INTEGER
    * `rel_e4 − maxsim_e4` — the greedy argmax runs on exact integers
    * (e4 = ⌊cos·10⁴ + ½⌋ of the round-before-rank cosines, ties to the
    * smaller id; the similarity term is CLAMPED AT 0 — an anti-similar
    * already-selected item never boosts a candidate, and the clamp also
    * covers the empty first-step set), so the whole selection is
    * engine-replayable and a DuckDB oracle unrolls the k rounds.
    *
    * Scale shape: the relevance pool is [[bruteForceTopK]] here
    * (swap in an ANN pool at corpus scale — the greedy only sees
    * `poolSize` rows per query); within-pool sims and the k-step
    * greedy run INSIDE each query's executor group
    * (`groupByKey.flatMapGroups` over ≤ poolSize candidates — the
    * Diagnostics per-key-kernel shape). Output: one row per
    * (query_id, step 1..k) with `neighbor_id, rel_e4, score2_e4`. */
  def mmrTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, poolSize: Int): DataFrame = {
    require(k >= 1 && poolSize >= k,
      s"need poolSize >= k >= 1, got k=$k poolSize=$poolSize")
    val spark = queries.sparkSession
    import spark.implicits._
    val pool = bruteForceTopK(queries, corpus, idCol, vecCol, poolSize)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val rows = pool.join(cv, Seq("neighbor_id"))
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        expr("cast(floor(cos_sim * 10000 + 0.5) as bigint)"), col("__cv"))
      .as[(Long, Long, Long, Array[Float])]
    def cosE4(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) 0L else math.floor(dot / den * 1e4 + 0.5).toLong
    }
    rows.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cands = it.toArray.sortBy(_._2)
        val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
        val steps = math.min(k, cands.length)
        (1 to steps).iterator.map { step =>
          var bestIdx = -1
          var bestScore = Long.MinValue
          var i = 0
          while (i < cands.length) {
            if (!selected.contains(i)) {
              var maxSim = 0L
              selected.foreach { s =>
                val sim = cosE4(cands(i)._4, cands(s)._4)
                if (sim > maxSim) maxSim = sim
              }
              val score = cands(i)._3 - maxSim
              // strict >: equal scores keep the earlier (smaller-id)
              // candidate — cands is id-sorted
              if (score > bestScore) { bestScore = score; bestIdx = i }
            }
            i += 1
          }
          selected += bestIdx
          (qid, step, cands(bestIdx)._2, cands(bestIdx)._3, bestScore)
        }
      }
      .toDF("query_id", "step", "neighbor_id", "rel_e4", "score2_e4")
  }

  /** Deterministic ±1 hyperplane component for (table, bit, i) — the
    * portable-hash sign pattern, computed once per (table, nBits, dim) on
    * the driver and closed over by the bucket UDF. */
  private def srpSign(table: Int, bit: Int, i: Int): Double = {
    val h = graft.text.TextHash.hash32(s"${table}_${bit}_$i")
    if ((h * 327673L + 12289L) % 4294967311L % 2 == 0) 1.0 else -1.0
  }

  /** The full sign matrix for one table — exposed so the DuckDB oracle can
    * inline the same hyperplanes and replicate the bucketing exactly. */
  def srpSigns(table: Int, nBits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nBits, dim)((b, i) => srpSign(table, b, i))

  /** Corpus-scaled SRP bucket width: enough bits that the EXPECTED bucket
    * holds ~`targetBucket` vectors, i.e. ceil(log2(n / targetBucket)).
    * The banded candidate join costs Σ bucketSize² per table — with a
    * corpus-independent `nBits` that term is quadratic in n, with this
    * scaling it is ~n·targetBucket (linear). Clamped to [4, 24]; raise
    * `nTables` to buy recall back when n pushes `nBits` up. */
  def suggestedNBits(n: Long, targetBucket: Int = 32): Int = {
    require(targetBucket > 0, s"targetBucket must be positive, got $targetBucket")
    val bits = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(24, math.max(4, bits))
  }

  /** LSH bucket key for one hash table: packed sign pattern of `nBits`
    * random hyperplanes. One UDF pass computes all bits (the expression
    * form re-walked the vector per bit, interpreted — nBits×dim× slower). */
  def srpKey(vec: Column, dim: Int, nBits: Int, table: Int = 0): Column = {
    val signs = srpSigns(table, nBits, dim)
    udf((v: Array[Float]) => {
      if (v == null) null
      else {
        var key = 0L
        var b = 0
        while (b < nBits) {
          val s = signs(b)
          var proj = 0.0
          val n = math.min(dim, v.length)
          var i = 0
          while (i < n) { proj += s(i) * v(i); i += 1 }
          if (proj >= 0) key |= (1L << b)
          b += 1
        }
        Long.box(key)
      }
    }).apply(vec)
  }

  /** Bucketed ANN top-k: candidates share an SRP bucket in at least one of
    * `nTables` tables; exact cosine re-rank within candidates. */
  def lshTopK(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
              k: Int, nBits: Int = 8, nTables: Int = 2): DataFrame = {
    val keyed = vectors.select(
      col(idCol).as("id"), col(vecCol).as("__v"),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"), srpKey(col(vecCol), dim, nBits, t).as("key"))): _*)).as("bk"))
    val cands = keyed.as("a").join(keyed.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"),
        col("a.__v").as("__qv"), col("b.__v").as("__cv"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cands.select(col("query_id"), col("neighbor_id"),
      round(org.apache.spark.sql.graft.CosineSim(col("__qv"), col("__cv")), 4).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** ANN recall@k audit — the approximate index ([[lshTopK]]) scored
    * against the brute-force ground truth ([[bruteForceTopK]]) on a
    * bounded PROBE query set: the number an ANN deployment must
    * measure before trusting its neighbors (nBits/nTables tune recall
    * invisibly — q52's plan can silently drop to 0.4 recall on a
    * harder corpus and nothing else would notice). Per query:
    * `recall = |truth ∩ approx| / |truth|`.
    *
    * Exactness: both sides share the ONE exact-ranking contract
    * (cosine rounded BEFORE ranking, ties to the smaller neighbor id —
    * rankExact), so the sets are deterministic and the recall is a
    * pure integer `div`. Scale shape: the probe set is
    * benchmark-sized by contract (broadcast through bruteForceTopK);
    * the LSH side is the production banded join — never all-pairs.
    * Output: `(query_id, n_truth, n_hits, recall_pm)`. */
  def annRecall(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, dim: Int, k: Int, nBits: Int = 8,
                nTables: Int = 2): DataFrame = {
    val truth = bruteForceTopK(queries, corpus, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val qIds = queries.select(col(idCol).as("query_id")).distinct()
    val approx = lshTopK(corpus, idCol, vecCol, dim, k, nBits, nTables)
      .join(qIds, Seq("query_id"), "left_semi")
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
    truth
      .join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .withColumn("recall_pm", expr("n_hits * 1000 div n_truth"))
  }

  /** Embedding-cosine near-duplicate pairs, SCALE PATH (builder-brief
    * dedup mode): candidates share an SRP bucket in ≥1 of `nTables`
    * tables, exact cosine on candidates only, keep pairs ≥ `threshold`.
    * No all-pairs stage and no driver-side collect — this is the default
    * at corpus scale; recall is tuned by `nBits`/`nTables` (fewer bits
    * or more tables → higher recall, more candidates).
    *
    * `nBits` MUST grow with the corpus ([[suggestedNBits]]): the
    * candidate stage costs Σ bucketSize² over 2^nBits buckets per table,
    * so a fixed `nBits` is quadratic in n (measured: 10x the vectors at
    * nBits=6 cost 13.6x; re-dialing to suggestedNBits(n)=9 brought the
    * same corpus back to 2.5x — linear scaling restored).
    * [[nearDupPairs]] is the exact all-pairs variant for broadcast-sized
    * corpora. */
  def nearDupPairsBucketed(vectors: DataFrame, idCol: String, vecCol: String,
                           dim: Int, threshold: Double, nBits: Int = 8,
                           nTables: Int = 2, roundTo: Int = 4,
                           release: Boolean = false): DataFrame = {
    // persist + eager count: the self-join would otherwise run the srpKey
    // UDF pipeline on both sides (same discipline as minhashCandidates).
    // Candidate discovery shuffles (id, bucket) ONLY — the 64-float
    // vectors re-attach after the distinct, so the wide rows never pass
    // through the pair-explosion shuffle (narrow-pair trick).
    val keyed = vectors.select(
        col(idCol).cast("long").as("id"),
        explode(array((0 until nTables).map(t =>
          struct(lit(t).as("t"), srpKey(col(vecCol), dim, nBits, t).as("key"))): _*)).as("bk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    keyed.count()
    val pairs = keyed.as("a").join(keyed.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val slim = vectors.select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"))
    val out = pairs
      .join(slim.select(col("id").as("id_a"), col("__v").as("__qv")), Seq("id_a"))
      .join(slim.select(col("id").as("id_b"), col("__v").as("__cv")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(org.apache.spark.sql.graft.CosineSim(col("__qv"), col("__cv")), roundTo).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
    if (release) {
      // standing-session discipline: materialize the (small,
      // above-threshold pairs) result so the bucket-key cache over the
      // whole corpus can be dropped NOW instead of accumulating one
      // corpus-sized cache per dedup pass until the ContextCleaner runs.
      // One-shot callers (bench, verify, pipelines that consume `out`
      // exactly once) leave this off — the extra eager count() costs a
      // full second pass over the pair join for no benefit there.
      val outP = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      outP.count()
      keyed.unpersist()
      outP
    } else out
  }

  /** Embedding-cosine near-duplicate pairs, exact all-pairs variant:
    * every unordered pair with cosine ≥ `threshold`.
    *
    * Inherently one-side-broadcast shaped (like [[bruteForceTopK]]'s query
    * side) — correct for broadcast-sized corpora and as the recall oracle
    * for [[nearDupPairsBucketed]], which is the default at scale. The
    * scoring loop is `mapPartitions` over a broadcast corpus with
    * pre-computed norms: a crossJoin + per-pair UDF pays row machinery and
    * two array conversions per candidate (~6x slower measured), while here
    * only above-threshold pairs ever materialize as rows.
    *
    * NOTE: the corpus side is collected EAGERLY at call time (it must fit
    * on the driver, like any broadcast build side); the broadcast is
    * released by Spark's ContextCleaner when the returned frame becomes
    * unreachable. */
  def nearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, roundTo: Int = 4): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val slim = vectors
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)
      .as[(Long, Array[Float])]
    val corpus = slim.collect().map { case (id, v) => (id, v, VectorOps.l2norm(v)) }
    val bc = spark.sparkContext.broadcast(corpus)
    val scale = math.pow(10, roundTo)
    // Pre-filter floor (r17): HALF_UP rounding at `roundTo` decimals
    // moves a value by at most 0.5·10^-roundTo, so a raw cosine below
    // `threshold − 0.5·10^-roundTo` can never round up to ≥ threshold —
    // reject it on the raw double and reserve the exact-decimal
    // BigDecimal (allocation + context per call) for the boundary band
    // and survivors only. Profiled: the all-pairs kernel was spending
    // most of its time constructing 12.5M BigDecimals at sf0.1 to
    // reject pairs far below threshold. The 1e-12 slack over-admits
    // (never rejects) against double representation error; admitted
    // pairs still pass through the EXACT BigDecimal test, so output is
    // bit-identical.
    val rawFloor = threshold - 0.5 / scale - 1e-12
    slim.mapPartitions { it =>
      val cs = bc.value
      it.flatMap { case (id, v) =>
        val nv = VectorOps.l2norm(v)
        cs.iterator
          .filter(_._1 > id)
          .flatMap { case (cid, cv, cn) =>
            val den = nv * cn
            if (den == 0.0) None
            else {
              val raw = VectorOps.dot(v, cv) / den
              if (raw < rawFloor) None
              else {
                // same rounding as Spark's round(): exact-decimal HALF_UP
                val cos = BigDecimal(raw)
                  .setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (cos >= threshold) Some((id, cid, cos)) else None
              }
            }
          }
      }
    }.toDF("id_a", "id_b", "cos_sim")
  }

  /** CROSS-corpus semantic contamination: (corpus, held-out) pairs whose
    * embedding cosine reaches `threshold` — the embedding tier of the
    * decontamination trilogy (exact n-grams → MinHash fuzzy →
    * semantic). The held-out side broadcasts (benchmark-sized by
    * contract) and the corpus side streams through a codegen'd
    * [[org.apache.spark.sql.graft.CosineSim]] filter — no corpus
    * shuffle, no driver collect of the big side, only above-threshold
    * pairs materialize. Output: (id_a from `corpus`, id_b from
    * `heldout`, cos_sim rounded BEFORE the threshold, q55's
    * oracle-stability convention). */
  def crossNearDup(corpus: DataFrame, heldout: DataFrame, idCol: String,
                   vecCol: String, threshold: Double,
                   roundTo: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("id_a"), col(vecCol).as("__cv"))
    val h = heldout.select(col(idCol).as("id_b"), col(vecCol).as("__hv"))
    c.crossJoin(broadcast(h))
      .select(col("id_a"), col("id_b"),
        round(org.apache.spark.sql.graft.CosineSim(col("__cv"), col("__hv")), roundTo)
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** [[crossNearDup]]'s SCALE PATH for held-out sides too large to
    * broadcast-cross (the q55→q60 relationship, cross-corpus): both sides
    * bucket by the same SRP hyperplanes, candidates are bucket collisions
    * in ≥1 of `nTables` tables, exact cosine re-scores candidates only.
    * Cost per bucket is |corpus bucket|·|heldout bucket| instead of the
    * full product — with `nBits` scaled to the TOTAL row count
    * ([[suggestedNBits]]) the work stays ~linear as both sides grow,
    * where the exact cross is quadratic. Narrow-pair trick throughout:
    * only (id, bucket) shuffles; vectors re-attach after the distinct. */
  def crossNearDupBucketed(corpus: DataFrame, heldout: DataFrame,
                           idCol: String, vecCol: String, dim: Int,
                           threshold: Double, nBits: Int = 8,
                           nTables: Int = 2, roundTo: Int = 4): DataFrame = {
    def keyed(df: DataFrame, idName: String) = df.select(
      col(idCol).cast("long").as(idName),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"), srpKey(col(vecCol), dim, nBits, t).as("key"))): _*)).as("bk"))
    val pairs = keyed(corpus, "id_a").as("a")
      .join(keyed(heldout, "id_b").as("b"), col("a.bk") === col("b.bk"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val cv = corpus.select(col(idCol).cast("long").as("id_a"), col(vecCol).as("__cv"))
    val hv = heldout.select(col(idCol).cast("long").as("id_b"), col(vecCol).as("__hv"))
    pairs.join(cv, Seq("id_a")).join(hv, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(org.apache.spark.sql.graft.CosineSim(col("__cv"), col("__hv")), roundTo)
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
