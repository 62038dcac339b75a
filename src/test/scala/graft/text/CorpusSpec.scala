package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Corpus-construction operators: BM25 relevance, decontamination,
  * deterministic hash splits, per-stratum top-k, sequence packing,
  * vocabulary stats. Fixtures are hand-computable. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 matches the hand-computed Okapi score on a 3-doc corpus") {
    val docs = Seq(
      (1L, "spark spark rocks"),   // tf(spark)=2, dl=3
      (2L, "spark is neat"),       // tf(spark)=1, dl=3
      (3L, "ducks fly home away")  // no match, dl=4
    ).toDF("doc_id", "text")
    val out = Corpus.bm25(docs, "doc_id", "text", query = Seq("spark"), roundTo = 6)
      .orderBy("doc_id").collect()
    // N=3, avgdl=10/3, df(spark)=2, idf=ln(1+(3-2+0.5)/(2+0.5))=ln(1.6)
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def score(tf: Double, dl: Double): Double = {
      val avgdl = 10.0 / 3.0
      BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // doc 3 absent
    assert(approx(out(0).getDouble(1), score(2, 3), 1e-9))
    assert(approx(out(1).getDouble(1), score(1, 3), 1e-9))
  }

  test("contamination counts matching n-gram occurrences and distinct grams") {
    val corpus = Seq(
      (1L, "a b c d e"),     // shares "a b c" and "b c d" with the test set
      (2L, "x y z w"),       // clean
      (3L, "a b c a b c q")  // "a b c" twice, "b c a"/"c a b" unseen
    ).toDF("doc_id", "text")
    val testSet = Seq((100L, "a b c d q r")).toDF("doc_id", "text")
    val out = Corpus.contamination(corpus, testSet, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 2L), (3L, 2L, 1L))) // doc 2 absent (clean)
  }

  test("hashSample is deterministic, partition-independent, and partitions the corpus") {
    val df = spark.range(0, 1000).toDF("id").withColumn("id", col("id"))
    val kept = Corpus.hashSample(df, "id", buckets = 10, keep = 3)
    val keptIds = kept.collect().map(_.getLong(0)).toSet
    // same verdict under a different physical layout
    val keptRepart = Corpus.hashSample(df.repartition(7), "id", buckets = 10, keep = 3)
      .collect().map(_.getLong(0)).toSet
    assert(keptIds == keptRepart)
    // complement bucket filter yields exactly the rest
    val rest = df.filter(Corpus.hashBucket(col("id"), 10) >= 3)
      .collect().map(_.getLong(0)).toSet
    assert(keptIds.intersect(rest).isEmpty)
    assert(keptIds.size + rest.size == 1000)
    // ≈ 30% within generous bounds (md5 is uniform)
    assert(keptIds.size > 200 && keptIds.size < 400, s"got ${keptIds.size}")
  }

  test("hashSplit: exhaustive, disjoint, retry-stable slices near the fences") {
    val df = spark.range(0, 2000).toDF("id")
    val out = Corpus.hashSplit(df, "id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    assert(out.size == 2000, "every row gets exactly one slice")
    val bySlice = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(bySlice.keySet == Set("train", "val", "test"))
    // ~80/10/10 within generous uniform-hash bounds
    assert(bySlice("train") > 1400 && bySlice("train") < 1800, bySlice.toString)
    assert(bySlice("val") > 100 && bySlice("val") < 320, bySlice.toString)
    // physical layout must not change any verdict (the retry property)
    val repart = Corpus.hashSplit(df.repartition(7), "id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    assert(repart == out)
    // the slice is the documented function of the hash bucket
    val buckets = df.select(col("id"),
      Corpus.hashBucket(col("id").cast("string"), 1000).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, s) =>
      val b = buckets(id)
      val expect = if (b < 800) "train" else if (b < 900) "val" else "test"
      assert(s == expect, s"id=$id bucket=$b")
    }
  }

  test("hashSplit rejects malformed fences") {
    val df = spark.range(0, 1).toDF("id")
    intercept[IllegalArgumentException] {
      Corpus.hashSplit(df, "id", Seq(("a", 500), ("b", 900)))
    }
    intercept[IllegalArgumentException] {
      Corpus.hashSplit(df, "id", Seq(("a", 900), ("b", 500), ("c", 1000)))
    }
  }

  test("bloomDecontaminate equals the exact anti-join (no false negatives survive)") {
    val corpus = Seq(
      (1L, "a b c d e f g h"),       // shares "c d e" with test
      (2L, "p q r s t u v w"),       // clean
      (3L, "x y z c d e q q"),       // shares "c d e"
      (4L, "mm nn oo pp qq rr"),     // clean
      (5L, "")                       // no grams -> clean
    ).toDF("doc_id", "text")
    val test = Seq((100L, "c d e zz ww")).toDF("doc_id", "text")
    val got = Corpus.bloomDecontaminate(corpus, test, "doc_id", "text", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // exact semantics: contaminated docs 1 and 3 gone, everything else kept
    val exact = corpus.join(
        Corpus.contamination(corpus, test, "doc_id", "text", n = 3)
          .withColumnRenamed("doc_id", "doc_id"),
        Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == exact)
    assert(got == Set(2L, 4L, 5L))
  }

  test("weightedSample matches the local Efraimidis-Spirakis replay and is retry-stable") {
    val rows = (1L to 300L).map(i => (i, 10L + (i % 47) * 3L))
    val df = rows.toDF("id", "w")
    def localTop(n: Int): Set[Long] = rows
      .map { case (id, w) =>
        val u = (TextHash.hash32(id.toString) + 0.5) / 4294967296.0
        (id, math.log(u) / w)
      }
      .sortBy { case (id, es) => (-es, id) }.take(n).map(_._1).toSet
    val got = Corpus.weightedSample(df, "id", "w", n = 40)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == localTop(40))
    // partition-layout-proof: same set under a different layout
    val got2 = Corpus.weightedSample(df.repartition(11), "id", "w", n = 40)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got2 == got)
    // weights matter: heavy keys are over-represented vs the uniform rate
    val heavy = rows.filter(_._2 >= 100L).map(_._1).toSet
    val heavyShare = got.count(heavy).toDouble / 40
    val popShare = heavy.size.toDouble / 300
    assert(heavyShare > popShare, s"heavy=$heavyShare pop=$popShare")
  }

  test("weightedSample rejects non-positive weights loudly") {
    val df = Seq((1L, 5L), (2L, 0L)).toDF("id", "w")
    val e = intercept[Exception] {
      Corpus.weightedSample(df, "id", "w", n = 1).collect()
    }
    assert(e.getMessage != null)
  }

  test("topKPerStratum keeps k rows per stratum by the given order") {
    val df = Seq(
      ("a", 1L, 10), ("a", 2L, 30), ("a", 3L, 20),
      ("b", 4L, 5), ("b", 5L, 5)
    ).toDF("src", "id", "score")
    val out = Corpus.topKPerStratum(df, Seq("src"),
        Seq(col("score").desc, col("id").asc), k = 2)
      .orderBy("src", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq(("a", 2L, 1), ("a", 3L, 2), ("b", 4L, 1), ("b", 5L, 2)))
  }

  test("packSequences assigns chunk and offset by the running token count") {
    val docs = Seq(
      ("s", 1L, "t1 t2 t3"),          // start 0  -> bin 0, pos 0
      ("s", 2L, "t1 t2 t3 t4"),       // start 3  -> bin 0, pos 3
      ("s", 3L, "t1 t2"),             // start 7  -> bin 0, pos 7 (straddles)
      ("s", 4L, "t1"),                // start 9  -> bin 1, pos 1
      ("t", 5L, "t1 t2 t3 t4 t5")     // start 0  -> bin 0, pos 0 (own stratum)
    ).toDF("src", "doc_id", "text")
    val out = Corpus.packSequences(docs, "doc_id", "text", budget = 8, strata = Seq("src"))
      .orderBy("src", "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 3L, 0L, 0L), (2L, 4L, 0L, 3L), (3L, 2L, 0L, 7L),
      (4L, 1L, 1L, 1L), (5L, 5L, 0L, 0L)))
  }

  test("JVM shingle kernel matches the expression form (incl. tab/empty edges)") {
    import graft.functions.Cols
    val texts = Seq("a b c d", "a b", "", "  x  y  z ", "\tlead tab toks here",
      "one", "a  b   c", "p q r s t u v w")
    val df = texts.toDF("text")
    for (k <- Seq(2, 3, 5)) {
      val got = df.select(TextHash.shinglesCol(col("text"), k).as("s")).collect()
        .map(_.getSeq[String](0).toList)
      val want = df.select(Cols.shingles(Cols.tokens(col("text")), k).as("s")).collect()
        .map(_.getSeq[String](0).toList)
      assert(got.toSeq == want.toSeq, s"k=$k")
    }
  }

  test("topNgrams counts bigrams with lexicographic tie-break") {
    val docs = Seq(
      (1L, "a b a b"),   // "a b" x2, "b a" x1
      (2L, "a b c"),     // "a b", "b c"
      (3L, "z")          // too short: no bigrams
    ).toDF("doc_id", "text")
    val out = Corpus.topNgrams(docs, "text", n = 2, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("domainMixSample keeps the exact hash-threshold membership per domain") {
    // a:100 rows, b:100 rows, weights 3:1 (W=4)
    // T = min(100*4 DIV 3, 100*4 DIV 1) = 133
    // keep_a = 133*3*10000 DIV (4*100) = 9975; keep_b = 133*1*10000 DIV 400 = 3325
    val df = ((0L until 100L).map(i => (i, "a")) ++
      (100L until 200L).map(i => (i, "b")) ++
      Seq((900L, "junk"))).toDF("id", "dom")
    val kept = Corpus.domainMixSample(df, "dom", "id",
        weights = Map("a" -> 3L, "b" -> 1L))
      .select("id", "dom").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // independent md5 (non-circular: java MessageDigest, not Cols.hash32)
    def h(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val expected =
      ((0L until 100L).filter(h(_) % 10000 < 9975).map((_, "a")) ++
       (100L until 200L).filter(h(_) % 10000 < 3325).map((_, "b"))).toSet
    assert(kept == expected)
    assert(!kept.exists(_._2 == "junk")) // unweighted domains drop
    // partition independence (retry-safe membership)
    val again = Corpus.domainMixSample(df.repartition(7), "dom", "id",
        weights = Map("a" -> 3L, "b" -> 1L))
      .select("id", "dom").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == kept)
  }

  test("curriculumBins assigns equal-population bins per stratum") {
    val df = Seq(
      ("s1", 1L, 0.1), ("s1", 2L, 0.4), ("s1", 3L, 0.2), ("s1", 4L, 0.9),
      ("s2", 5L, 0.5), ("s2", 6L, 0.3)
    ).toDF("src", "id", "score")
    val out = Corpus.curriculumBins(df, Seq("src"),
        Seq(col("score").asc, col("id").asc), nBins = 2)
      .select("id", "bin").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // s1 ordered by score: 1(.1) 3(.2) 2(.4) 4(.9) -> bins 1,1,2,2
    assert(out == Map(1L -> 1, 3L -> 1, 2L -> 2, 4L -> 2, 6L -> 1, 5L -> 2))
    intercept[IllegalArgumentException] {
      Corpus.curriculumBins(df, Nil, Seq(col("score")), 2)
    }
  }

  test("domainMixSample fails loudly when a weighted domain is absent") {
    val df = (0L until 10L).map(i => (i, "a")).toDF("id", "dom")
    val ex = intercept[Exception] {
      Corpus.domainMixSample(df, "dom", "id",
        weights = Map("a" -> 1L, "ghost" -> 1L)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("ghost")))
  }

  test("chunkDocs: overlap windows, clamped tail, no chunks for blank docs") {
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (2L, "a b"),                           // shorter than one chunk
      (3L, "   "),                           // blank -> no rows
      (4L, "x")
    ).toDF("id", "text")
    val out = Corpus.chunkDocs(docs, "id", "text", chunkSize = 4, stride = 3)
      .orderBy("id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq(
      // doc 1: starts 0,3,6,9 — 1-token overlap (chunkSize-stride), 1-token tail kept
      (1L, 0, 4, "t0 t1 t2 t3"), (1L, 1, 4, "t3 t4 t5 t6"),
      (1L, 2, 4, "t6 t7 t8 t9"), (1L, 3, 1, "t9"),
      (2L, 0, 2, "a b"),
      (4L, 0, 1, "x")))
    val ex = intercept[IllegalArgumentException] {
      Corpus.chunkDocs(docs, "id", "text", chunkSize = 4, stride = 5)
    }
    assert(ex.getMessage.contains("stride"))
  }

  test("tokenBudgetSample keeps the maximal md5-rank prefix within budget per domain") {
    import graft.functions.Cols
    val docs = Seq.tabulate(20) { i =>
      (i.toLong, if (i % 2 == 0) "d0" else "d1", Seq.fill(i % 5 + 1)("w").mkString(" "))
    }.toDF("doc_id", "domain", "text")
    val kept = Corpus.tokenBudgetSample(docs, "domain", "doc_id", "text", budget = 9L)
    // within budget per domain
    val tot = kept.groupBy("domain").agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tot.values.forall(_ <= 9L) && tot.nonEmpty)
    // prefix property: every kept row ranks strictly before every dropped
    // row of the same domain (rank = the same md5 hash the engine uses)
    val ranked = docs
      .withColumn("rk", Cols.hash32(col("doc_id").cast("string")))
      .join(kept.select(col("doc_id"), lit(1).as("k")), Seq("doc_id"), "left")
      .collect().map(r => (r.getAs[String]("domain"), r.getAs[Long]("rk"),
        r.getAs[Any]("k") != null))
    ranked.groupBy(_._1).foreach { case (_, rows) =>
      val keptMax = rows.filter(_._3).map(_._2)
      val dropMin = rows.filterNot(_._3).map(_._2)
      if (keptMax.nonEmpty && dropMin.nonEmpty)
        assert(keptMax.max < dropMin.min, "kept set is not a rank prefix")
    }
    // deterministic under re-evaluation
    val again = Corpus.tokenBudgetSample(docs, "domain", "doc_id", "text", budget = 9L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === kept.select("doc_id").collect().map(_.getLong(0)).toSet)
    // output-name collision guard fails loudly
    val ex = intercept[IllegalArgumentException] {
      Corpus.tokenBudgetSample(docs.withColumnRenamed("text", "n_tokens"),
        "domain", "doc_id", "n_tokens", budget = 9L)
    }
    assert(ex.getMessage.contains("n_tokens"))
  }

  test("globalRank equals an unpartitioned row_number, without its plan") {
    val df = (1 to 500).map(i => (i.toLong, (i * 37) % 101)).toDF("id", "v")
      .repartition(13)
    val got = Corpus.globalRank(df, Seq(col("v"), col("id")), "rk")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val expect = (1 to 500).map(i => (i.toLong, (i * 37) % 101))
      .sortBy { case (id, v) => (v, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> i.toLong }.toMap
    assert(got == expect)
  }

  test("globalRank output is dense and collision-guarded") {
    val df = Seq((1L, 5), (2L, 3), (3L, 9)).toDF("id", "v")
    val ranks = Corpus.globalRank(df, Seq(col("v")), "rk")
      .collect().map(_.getLong(2)).sorted
    assert(ranks.toSeq == Seq(0L, 1L, 2L))
    val ex = intercept[IllegalArgumentException] {
      Corpus.globalRank(df.withColumnRenamed("v", "rank"), Seq(col("id"))) }
    assert(ex.getMessage.contains("rank"))
  }

  test("assignShards: serpentine deal matches the model and balances totals") {
    // sizes with heavy skew; 4 shards
    val docs = (1 to 40).map(i => (i.toLong, ((i * i * 13) % 997 + 1).toLong))
      .toDF("id", "sz").repartition(7)
    val got = Corpus.assignShards(docs, "id", "sz", nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // model: sort desc by (sz, id asc), serpentine
    val order = (1 to 40).map(i => (i.toLong, ((i * i * 13) % 997 + 1).toLong))
      .sortBy { case (id, sz) => (-sz, id) }
    val model = order.zipWithIndex.map { case ((id, sz), r) =>
      val s = if ((r / 4) % 2 == 0) r % 4 else 3 - r % 4
      (id, sz, s) }.toSet
    assert(got.toSet == model)
    // balance: serpentine keeps shard totals within the largest item
    val totals = got.groupBy(_._3).view.mapValues(_.map(_._2).sum).values.toSeq
    val spread = totals.max - totals.min
    val maxItem = order.head._2
    assert(spread <= maxItem, s"spread $spread exceeds max item $maxItem")
    assert(totals.size == 4)
  }

  test("pmiCollocations: hand-computed counts, integer threshold, no log") {
    // 8 pairs total: "new york" ×3 (c1(new)=3, c2(york)=3),
    // "the the" ×2 plus "the" in other pairs diluting its marginals
    val docs = Seq(
      (1L, "new york new york"),      // pairs: (new,york) (york,new) (new,york)
      (2L, "the the the"),            // pairs: (the,the) ×2
      (3L, "new york is big")         // pairs: (new,york) (york,is) (is,big)
    ).toDF("doc_id", "text")
    val out = Corpus.pmiCollocations(docs, "text", minCount = 3, minRatio = 2)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c12"), r.getAs[Long]("c1"), r.getAs[Long]("c2"),
        r.getAs[Long]("n_pairs")))
    // (new,york): c12=3, c1(new as left)=3, c2(york as right)=3, N=8
    // ratio = 3·8/(3·3) = 2.67 ≥ 2 -> selected
    // (the,the): c12=2 < minCount -> out; (york,new): c12=1 -> out
    assert(out.toSeq == Seq(("new", "york", 3L, 3L, 3L, 8L)))
  }

  test("pmiCollocations: the ratio is the exact division of the integer counts") {
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    // pairs: (a,b)(b,a)(a,b)(b,a)(a,b) -> N=5, c12(a,b)=3, c1(a)=3, c2(b)=3
    val r = Corpus.pmiCollocations(docs, "text", minCount = 3, minRatio = 1)
      .filter(col("w1") === "a").collect().head
    assert(r.getAs[Double]("ratio") == 15.0 / 9.0)
  }

  test("nextTokenTable: argmax continuation with lexicographic tie-break") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog sat"),
      (4L, "the cat sat")
    ).toDF("doc_id", "text")
    val out = Corpus.nextTokenTable(docs, "text")
      .orderBy("w1").collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c12"), r.getAs[Long]("c1"), r.getAs[Long]("p_e6")))
    // "the"->"cat" 3 of 4; "cat"->"sat" 2 of 3; "sat"/"ran" never left
    assert(out.toSeq == Seq(
      ("cat", "sat", 2L, 3L, 666666L),
      ("dog", "sat", 1L, 1L, 1000000L),
      ("the", "cat", 3L, 4L, 750000L)))
  }

  test("nextTokenTable: count ties break to the smaller continuation") {
    val docs = Seq((1L, "a z a b a b a z")).toDF("doc_id", "text")
    // pairs from a: (a,z)(a,b)(a,b)(a,z) -> tie 2-2 -> 'b' wins
    val r = Corpus.nextTokenTable(docs, "text")
      .filter(col("w1") === "a").collect().head
    assert(r.getAs[String]("w2") == "b")
    assert(r.getAs[Long]("c12") == 2L)
  }

  test("nextTokenTable minCount prunes rare contexts") {
    val docs = Seq((1L, "x y x y q r")).toDF("doc_id", "text")
    val keys = Corpus.nextTokenTable(docs, "text", minCount = 2)
      .collect().map(_.getString(0)).toSet
    assert(keys == Set("x", "y")) // q and r have c1 = 1
  }

  test("pmiCollocations: one-token and empty docs contribute no pairs") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "  "), (4L, "a b a b a b"))
      .toDF("doc_id", "text")
    val r = Corpus.pmiCollocations(docs, "text", minCount = 1, minRatio = 1)
    assert(r.agg(max(col("n_pairs"))).collect().head.getLong(0) == 5L)
  }

  test("rrfFuse: hand-computed integer contributions across two lists") {
    val a = Seq((1L, 9.0), (2L, 5.0), (3L, 1.0)).toDF("id", "score")
    val b = Seq((2L, 100L), (3L, 50L)).toDF("id", "score") // id 1 absent
    val out = Corpus.rrfFuse(Seq(a, b), "id", "score", kRrf = 60)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_lists"), r.getAs[Long]("rrf_e9")))
    def c(rank: Int): Long = 1000000000L / (60 + rank)
    assert(out.toSeq == Seq(
      (1L, 1L, c(1)),          // list a rank 1 only
      (2L, 2L, c(2) + c(1)),   // a rank 2, b rank 1
      (3L, 2L, c(3) + c(2))))
  }

  test("rrfFuse: score ties break by id ascending, deterministically") {
    val a = Seq((5L, 1.0), (3L, 1.0), (4L, 1.0)).toDF("id", "score")
    val out = Corpus.rrfFuse(Seq(a), "id", "score")
      .orderBy(col("rrf_e9").desc, col("id")).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(3L, 4L, 5L))
  }

  test("negativeSample: deterministic, never the anchor, k per anchor") {
    val items = (1L to 20L).map(i => Tuple1(i * 10)).toDF("doc_id")
    val out = Corpus.negativeSample(items, "doc_id", k = 3)
    val rows = out.collect()
      .map(r => (r.getAs[Long]("anchor_id"), r.getAs[Int]("j"),
        r.getAs[Long]("neg_id")))
    assert(rows.length == 60, "k rows per anchor")
    assert(rows.forall { case (a, _, n) => a != n }, "never self-paired")
    // re-run is bit-identical (hash-offset draws, no RNG state)
    val again = Corpus.negativeSample(items, "doc_id", k = 3).collect()
      .map(r => (r.getAs[Long]("anchor_id"), r.getAs[Int]("j"),
        r.getAs[Long]("neg_id")))
    assert(rows.sorted.toSeq == again.sorted.toSeq)
    // negatives must come from the id universe
    val universe = (1L to 20L).map(_ * 10).toSet
    assert(rows.forall { case (_, _, n) => universe.contains(n) })
  }

  test("zipfSlope: integer OLS over e3-quantized logs, deterministic rank") {
    // one domain, counts 4/2/1 -> ranks 1/2/3 by (count desc, term asc)
    val docs = Seq((1L, "a a a a b b c", "d1")).toDF("doc_id", "text", "src")
    val r = Corpus.zipfSlope(docs, "src", "text", topV = 50).collect().head
    def q(x: Double): Long = math.floor(x * 1e3 + 0.5).toLong
    val pts = Seq((q(math.log(1)), q(math.log(4))),
      (q(math.log(2)), q(math.log(2))), (q(math.log(3)), q(math.log(1))))
    val v = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val expected = (sx * sy - v * sxy) * 1000000L / (v * sxx - sx * sx)
    assert(r.getAs[Long]("v") == 3L)
    assert(r.getAs[Long]("n_top_tokens") == 7L)
    assert(r.getAs[Long]("zipf_slope_neg_e6") == expected)
    // natural-ish Zipf data slopes near -1: sanity band on the sign/scale
    assert(expected > 900000L && expected < 1600000L)
  }

  test("zipfSlope: a single-token domain has a degenerate fit -> null") {
    val docs = Seq((1L, "solo solo solo", "d1")).toDF("doc_id", "text", "src")
    val r = Corpus.zipfSlope(docs, "src", "text").collect().head
    assert(r.isNullAt(r.fieldIndex("zipf_slope_neg_e6")))
  }

  test("skipgramPmi: window=1 reduces to pmiCollocations exactly") {
    val docs = Seq(
      (1L, "new york new york"),
      (2L, "the the the"),
      (3L, "new york is big")).toDF("doc_id", "text")
    def bag(df: org.apache.spark.sql.DataFrame) = df
      .select("w1", "w2", "c12", "c1", "c2", "n_pairs")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sorted
    assert(bag(Corpus.skipgramPmi(docs, "text", window = 1,
        minCount = 1, minRatio = 1)) ==
      bag(Corpus.pmiCollocations(docs, "text", minCount = 1, minRatio = 1)))
  }

  test("skipgramPmi: window=2 hand-computed counts over 'a b c'") {
    val docs = Seq((1L, "a b c"), (2L, "x")).toDF("doc_id", "text")
    // k=1 pairs: (a,b) (b,c); k=2 pairs: (a,c); N=3 — one-token doc adds
    // none. (a,c) itself fails the ratio cross-mult (1·3 < 2·2) but its
    // contribution shows in N=3 and in the marginals c1(a)=2, c2(c)=2.
    val out = Corpus.skipgramPmi(docs, "text", window = 2,
        minCount = 1, minRatio = 1)
      .orderBy("w1", "w2").collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c12"), r.getAs[Long]("c1"), r.getAs[Long]("c2"),
        r.getAs[Long]("n_pairs")))
    assert(out.toSeq == Seq(
      ("a", "b", 1L, 2L, 1L, 3L),
      ("b", "c", 1L, 1L, 2L, 3L)))
  }

  test("skipgramPmi: matches a brute-force window scan on random-ish text") {
    val words = Seq("red", "blue", "green", "red", "red", "blue")
    val docs = (1L to 6L).map { i =>
      (i, (0 until 7).map(j => words(((i * 3 + j * 5) % 6).toInt)).mkString(" "))
    }.toDF("doc_id", "text")
    val window = 3
    val rows = docs.collect().map(_.getString(1))
    val pairs = rows.flatMap { t =>
      val w = t.split("\\s+")
      for (i <- w.indices; k <- 1 to window if i + k < w.length)
        yield (w(i), w(i + k))
    }
    val n = pairs.length.toLong
    val cp = pairs.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val c1 = pairs.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    val c2 = pairs.groupBy(_._2).map { case (k, xs) => k -> xs.length.toLong }
    val expected = cp.collect {
      case ((w1, w2), c12) if c12 >= 2 && c12 * n >= 1 * c1(w1) * c2(w2) =>
        (w1, w2, c12, c1(w1), c2(w2), n)
    }.toSeq.sorted
    val got = Corpus.skipgramPmi(docs, "text", window, minCount = 2, minRatio = 1)
      .select("w1", "w2", "c12", "c1", "c2", "n_pairs")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sorted
    assert(got == expected)
  }

  test("tfidfTopTerms: rare terms outrank common ones; stop-terms drop") {
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "cherry cherry cherry common")).toDF("doc_id", "text")
    val out = Corpus.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
    // 'common' is in all 3 docs: ln(3/3)=0 -> dropped everywhere
    assert(!out.exists(_.getAs[String]("term") == "common"))
    // doc 1 top term: apple (tf 2, df 1) over banana (tf 1, df 2)
    val d1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    assert(d1.head.getAs[String]("term") == "apple")
    assert(d1.head.getAs[Long]("tf") == 2 && d1.head.getAs[Long]("doc_freq") == 1)
    assert(d1.map(_.getAs[String]("term")).toSeq == Seq("apple", "banana"))
    // score check: apple = 2·ln(3) nanonats
    assert(d1.head.getAs[Long]("score_e9") ==
      math.floor(2 * math.log(3.0) * 1e9 + 0.5).toLong)
  }

  test("tfidfTopTerms: k bounds output per doc; empty docs contribute nothing") {
    val docs = Seq((1L, "a b c d e"), (2L, "x y"), (3L, "   "))
      .toDF("doc_id", "text")
    val out = Corpus.tfidfTopTerms(docs, "doc_id", "text", k = 3)
    assert(out.filter(col("doc_id") === 1L).count() == 3) // 5 candidates cut to k
    assert(out.filter(col("doc_id") === 2L).count() == 2)
    assert(out.filter(col("doc_id") === 3L).count() == 0) // blank doc: no terms, and
    // it must not inflate N either (scores stay ln(2)-based, not ln(3))
    assert(out.filter(col("doc_id") === 2L).collect().head.getAs[Long]("score_e9") ==
      math.floor(math.log(2.0) * 1e9 + 0.5).toLong)
  }

  test("neymanSample: volatile strata win seats, allocations clamp and sum") {
    import spark.implicits._
    // stratum a: 10 rows, constant (S=0 -> weight 0, zero seats)
    // stratum b: 10 rows, high spread; c: 10 rows, low spread
    val rows =
      (1L to 10L).map(i => ("a", i, 100L)) ++
      (11L to 20L).map(i => ("b", i, if (i % 2 == 0) 0L else 1000L)) ++
      (21L to 30L).map(i => ("c", i, 100L + (i % 2)))
    val df = rows.toDF("src", "id", "v")
    val out = Corpus.neymanSample(df, "src", "id", "v", nTotal = 12)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("a"), "zero-variance stratum must get no seats")
    // b's weight dominates c's by ~1000x -> b clamps at its size 10
    assert(bySrc("b") == 10L)
    assert(bySrc.values.sum <= 12L)
    // per-row alloc column matches the realized sample size
    val alloc = out.filter(col("src") === "b").select("alloc").distinct()
      .collect().head.getLong(0)
    assert(alloc == 10L)
    // determinism: same input -> identical sampled ids
    val again = Corpus.neymanSample(df, "src", "id", "v", nTotal = 12)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again == out.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("vocabCoverage: top-N reference vocab, OOV mass and distinct rates") {
    // ref slice "r": counts a=3 b=2 c=1 -> top-2 vocab {a, b}
    val rows = Seq(("r", "a a a b b c"), ("x", "a c d d")).toDF("g", "t")
    val out = Corpus.vocabCoverage(rows, Seq("g"), "t",
        refFilter = col("g") === "r", topN = 2)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("r").getAs[Long]("n_tokens") == 6L)
    assert(out("r").getAs[Long]("n_oov") == 1L)       // the single c
    assert(out("r").getAs[Long]("oov_pm") == 166L)
    assert(out("r").getAs[Long]("distinct_oov_pm") == 333L)
    assert(out("x").getAs[Long]("n_oov") == 3L)       // c + d + d
    assert(out("x").getAs[Long]("oov_pm") == 750L)
    assert(out("x").getAs[Long]("n_distinct_oov") == 2L)
    assert(out("x").getAs[Long]("distinct_oov_pm") == 666L)
  }

  test("vocabGrowth: hand-computed two-bucket grid and log-log beta; single point null") {
    // docs 1-2 -> bucket 0 (tokens a,b,a,c), docs 3-4 -> bucket 1 (a,b,d,e)
    // N cum = (4, 8); first buckets: a,b,c -> 0; d,e -> 1 -> V cum = (3, 5)
    val k = Seq(("k", 1L, "a b"), ("k", 2L, "a c"), ("k", 3L, "a b"),
      ("k", 4L, "d e"))
    val s = Seq(("s", 1L, "x y"))
    val out = Corpus.vocabGrowth((k ++ s).toDF("g", "doc", "t"),
      Seq("g"), "doc", "t", buckets = 2).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("bucket")) -> r).toMap
    assert(out(("k", 0L)).getAs[Long]("tokens_cum") == 4L)
    assert(out(("k", 0L)).getAs[Long]("vocab_cum") == 3L)
    assert(out(("k", 1L)).getAs[Long]("tokens_cum") == 8L)
    assert(out(("k", 1L)).getAs[Long]("vocab_cum") == 5L)
    // replay the quantized-ln OLS with BigInt sums
    def q(v: Double) = BigInt(math.floor(math.log(v) * 1e9 + 0.5).toLong)
    val (x1, y1, x2, y2) = (q(4.0), q(3.0), q(8.0), q(5.0))
    val num = 2 * (x1 * y1 + x2 * y2) - (x1 + x2) * (y1 + y2)
    val den = 2 * (x1 * x1 + x2 * x2) - (x1 + x2) * (x1 + x2)
    val beta = math.floor(num.toDouble / den.toDouble * 1e6 + 0.5).toLong
    assert(out(("k", 0L)).getAs[Long]("beta_e6") == beta)
    assert(math.abs(beta - 736966L) < 5, s"beta=$beta")
    val rs = out(("s", 0L))
    assert(rs.get(rs.fieldIndex("beta_e6")) == null)
  }
}
