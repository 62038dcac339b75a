package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)), // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f)), // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)) // opposite of 0
  ).toDF("vec_id", "embedding")

  test("mmrTopK: near-dup neighbors defer to diverse ones; plain top-k would not") {
    // query 0 = (1,0,0); 1 and 2 are the SAME direction (rel ties at
    // 0.9939, sim(1,2) = 1), 3 is diverse-but-relevant, 4 orthogonal.
    // Plain top-2 = {1, 2}; MMR: 1, then 3 (712 = 8000 - 7288), then 4
    // (score 0 beats 2's 9939 - 10000 < 0), then 2.
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(1.8f, 0.2f, 0.0f)),
      (3L, Array(0.8f, -0.6f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrTopK(corpus.filter(col("vec_id") === 0L), corpus,
        "vec_id", "embedding", k = 4, poolSize = 4)
      .orderBy("step").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 3L, 4L, 2L))
    // step 1's score is pure relevance; step 3 (id 4) scores exactly 0
    assert(out(0).getAs[Long]("score2_e4") == out(0).getAs[Long]("rel_e4"))
    assert(out(2).getAs[Long]("rel_e4") == 0L &&
      out(2).getAs[Long]("score2_e4") == 0L)
    // the clamp: 2's final score is rel - 10000 (full sim), never boosted
    assert(out(3).getAs[Long]("score2_e4") ==
      out(3).getAs[Long]("rel_e4") - 10000L)
  }

  test("bruteForceTopK: exact cosine ranking with deterministic tiebreaks") {
    val out = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect().toSeq
    assert(out.map(_.getAs[Long]("neighbor_id")) === Seq(1L, 2L, 3L))
    assert(approx(out(1).getAs[Double]("cos_sim"), 0.0))
    assert(approx(out(2).getAs[Double]("cos_sim"), -1.0))
  }

  test("bruteForceTopK: self-pairs excluded, k bounds output per query") {
    val out = Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", k = 2)
      .collect().toSeq
    assert(!out.exists(r => r.getAs[Long]("query_id") == r.getAs[Long]("neighbor_id")))
    assert(out.groupBy(_.getAs[Long]("query_id")).values.forall(_.size <= 2))
  }

  test("quantizedTopK: exact scores, high recall vs brute force on a random corpus") {
    val rng = new scala.util.Random(7)
    val corpus = (0L until 200L).map(i =>
      (i, Array.fill(16)(rng.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 10)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cos_sim")).toMap
    val exact = asMap(Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 5))
    val quant = asMap(Similarity.quantizedTopK(queries, corpus, "vec_id", "embedding",
      k = 5, refine = 4))
    // returned scores are EXACT cosines (re-rank stage), never quantized
    quant.foreach { case (pair, cs) =>
      exact.get(pair).foreach(e => assert(e == cs, s"$pair: $cs vs $e")) }
    // int8 + refine=4 recovers nearly all true neighbors at dim 16
    val recall = quant.keySet.count(exact.keySet).toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("quantizedTopK: refine >= corpus size reproduces brute force exactly") {
    val out = Similarity.quantizedTopK(
      vecs.filter(col("vec_id") === 0), vecs, "vec_id", "embedding", k = 3, refine = 10)
      .orderBy("rank").collect().toSeq
    assert(out.map(_.getAs[Long]("neighbor_id")) === Seq(1L, 2L, 3L))
  }

  test("crossNearDup: corpus-vs-held pairs only, threshold inclusive on rounded cosine") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),   // identical to held 100
      (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to both held
      (3L, Array(0.9f, 0.1f, 0.0f))    // close to held 100
    ).toDF("vec_id", "embedding")
    val held = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.crossNearDup(corpus, held, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 100L)) == 1.0)
    assert(out.contains((3L, 100L)) && out((3L, 100L)) >= 0.9)
    assert(out.size == 2, s"only the two above-threshold cross pairs: $out")
    // never corpus-corpus or held-held
    assert(out.keySet.forall { case (a, b) => a < 100L && b >= 100L })
  }

  test("crossNearDupBucketed: subset of exact cross pairs, identical vectors always found") {
    val rng = new scala.util.Random(31)
    val corpus = (0L until 40L).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat)))
    val held = ((100L until 110L).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat)))
      :+ (199L, corpus.head._2)) // planted exact contamination
    val cDf = corpus.toDF("vec_id", "embedding")
    val hDf = held.toDF("vec_id", "embedding")
    val bucketed = Similarity.crossNearDupBucketed(cDf, hDf, "vec_id", "embedding",
        dim = 16, threshold = 0.3, nBits = 4, nTables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Similarity.crossNearDup(cDf, hDf, "vec_id", "embedding", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bucketed.subsetOf(exact), s"bucketed pairs not in exact set: ${bucketed -- exact}")
    assert(bucketed.exists(p => p._1 == 0L && p._2 == 199L && p._3 == 1.0),
      "planted exact contamination missed: identical vectors share every bucket")
  }

  test("srpKey: deterministic bucket keys; identical vectors share buckets") {
    val two = Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val keys = two.select(Similarity.srpKey(col("embedding"), 3, 8)).as[Long].collect().toSeq
    assert(keys(0) === keys(1))
  }

  test("lshTopK: finds the exact duplicate as top neighbor") {
    val dupes = Seq(
      (0L, Array.tabulate(8)(i => i.toFloat)),
      (1L, Array.tabulate(8)(i => i.toFloat)),
      (2L, Array.tabulate(8)(i => (7 - i).toFloat))
    ).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(dupes, "vec_id", "embedding", dim = 8, k = 2)
      .filter(col("query_id") === 0 && col("rank") === 1).collect()
    assert(out.nonEmpty)
    assert(out.head.getAs[Long]("neighbor_id") === 1L)
    assert(approx(out.head.getAs[Double]("cos_sim"), 1.0))
  }

  test("nearDupPairsBucketed: subset of exact pairs, identical vectors always found") {
    val rng = new scala.util.Random(11)
    val vecs = (0L until 30L).map(i => (i, Array.fill(16)(rng.nextGaussian().toFloat)))
    // planted exact duplicate: identical vectors share every SRP bucket
    val df = (vecs :+ (100L, vecs.head._2)).toDF("vec_id", "embedding")
    val bucketed = Similarity.nearDupPairsBucketed(df, "vec_id", "embedding",
        dim = 16, threshold = 0.3, nBits = 4, nTables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = Similarity.nearDupPairs(df, "vec_id", "embedding", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bucketed.subsetOf(exact), s"bucketed pairs not in exact set: ${bucketed -- exact}")
    assert(bucketed.exists(p => p._1 == 0L && p._2 == 100L && p._3 == 1.0),
      "identical pair missed by bucketing")
  }

  test("suggestedNBits: log2 corpus scaling, clamped") {
    assert(Similarity.suggestedNBits(2048, targetBucket = 32) == 6)   // 2k corpus -> 64 buckets
    assert(Similarity.suggestedNBits(20480, targetBucket = 32) == 10) // 10x corpus -> +log2(10) bits
    assert(Similarity.suggestedNBits(1) == 4)                         // floor clamp
    assert(Similarity.suggestedNBits(Long.MaxValue) == 24)            // ceiling clamp
  }

  test("annRecall: exact-duplicate neighbors are always found (k=1 recall 1000)") {
    // duplicates hash identically in EVERY SRP table, so the LSH side is
    // guaranteed to contain the true top-1 — a deterministic recall floor
    val vecs = Seq(
      (1L, Array(1f, 2f, 3f, 4f)), (2L, Array(1f, 2f, 3f, 4f)),
      (3L, Array(-4f, 3f, -2f, 1f)), (4L, Array(-4f, 3f, -2f, 1f)),
      (5L, Array(9f, -1f, 0f, 2f)), (6L, Array(0f, 5f, -5f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.annRecall(vecs, vecs.filter(col("vec_id").isin(1L, 3L)),
        "vec_id", "embedding", dim = 4, k = 1, nBits = 2, nTables = 2)
      .collect().map(r => r.getAs[Long]("query_id") -> r).toMap
    assert(out.keySet == Set(1L, 3L))
    assert(out.values.forall(_.getAs[Long]("n_truth") == 1L))
    assert(out.values.forall(_.getAs[Long]("recall_pm") == 1000L))
  }
}
