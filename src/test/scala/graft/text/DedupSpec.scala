package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("lineDedup: boilerplate lines survive only at first (id, pos) occurrence") {
    val lined = Seq(
      (1L, "header\nalpha beta\nfooter"),
      (2L, "header\ngamma delta\nfooter"), // header+footer dup'd away
      (3L, "header\nheader\nunique line"), // within-doc repeat too
      (4L, ""),                            // no non-empty lines
      (5L, "header\nfooter")               // everything duplicated
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(lined, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(out.map(_.getAs[String]("text_dedup")) === Seq(
      "header\nalpha beta\nfooter", "gamma delta", "unique line", "", ""))
    assert(out.map(_.getAs[Long]("n_lines")) === Seq(3L, 3L, 3L, 0L, 2L))
    assert(out.map(_.getAs[Long]("n_kept")) === Seq(3L, 1L, 1L, 0L, 0L))
  }

  test("lineDedup: keeps doc count and original line order") {
    val lined = Seq(
      (10L, "z last\na first\nm middle"),
      (11L, "m middle\nz last\nnew one")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(lined, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(out.size === 2)
    // doc 10 keeps all three in ORIGINAL order (not sorted content order)
    assert(out.head.getAs[String]("text_dedup") === "z last\na first\nm middle")
    assert(out(1).getAs[String]("text_dedup") === "new one")
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup
    (4L, "completely different text about spark engines here")
  ).toDF("doc_id", "text")

  test("exact: identical normalized text groups together, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("keep_id").collect().toSeq
    assert(out.size === 3)
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") === 1L)
  }

  test("minhash signatures: deterministic; exact dups share full signature") {
    val sigs = docs.select(col("doc_id") +: Dedup.minhashSigCols(col("text"), k = 8): _*)
      .orderBy("doc_id").collect().toSeq
    val s1 = (0 until 8).map(i => sigs(0).getAs[Long](s"mh$i"))
    val s2 = (0 until 8).map(i => sigs(1).getAs[Long](s"mh$i"))
    val s4 = (0 until 8).map(i => sigs(3).getAs[Long](s"mh$i"))
    assert(s1 === s2)
    assert(s1 !== s4)
  }

  test("minhashCandidates: exact dups surface with est_jaccard 1.0; distinct docs don't pair") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text", k = 8, bands = 4)
      .collect().toSeq
    val p12 = pairs.find(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(p12.isDefined && approx(p12.get.getAs[Double]("est_jaccard"), 1.0))
    assert(!pairs.exists(r => r.getAs[Long]("id_b") == 4L || r.getAs[Long]("id_a") == 4L))
  }

  test("simhash: equal text -> equal signature; near-dup closer in Hamming than far doc") {
    val out = docs.select(col("doc_id"), Dedup.simhash(col("text"), 16).as("sh"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq.map(_._2)
    assert(out(0) === out(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(out(0), out(2)) < ham(out(0), out(3)))
  }

  test("ngramJaccard: near-dup pair above threshold, distinct docs excluded") {
    val out = Dedup.ngramJaccard(docs, "doc_id", "text", maxIdGap = 10, threshold = 0.5)
      .collect().toSeq
    val p13 = out.find(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 3L)
    assert(p13.isDefined)
    // tokens: 8 distinct each ("the" repeats), 7 shared -> 7/9
    assert(approx(p13.get.getAs[Double]("jaccard"), 7.0 / 9.0, 1e-9))
    assert(!out.exists(r => r.getAs[Long]("id_b") == 4L))
  }

  test("tokenContainment: subset doc detected at 1.0 that Jaccard misses") {
    val d = Seq(
      (1L, "x y z w"),   // superset
      (2L, "x y"),       // fully contained in 1 -> cont(2->1) = 1.0
      (3L, "x q")        // only half contained anywhere
    ).toDF("doc_id", "text")
    val out = Dedup.tokenContainment(d, "doc_id", "text",
        maxIdGap = 10, thresholdE6 = 1000000)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("n_inter"), r.getAs[Long]("cont_a_e6"),
        r.getAs[Long]("cont_b_e6")))
    assert(out.toSeq == Seq((1L, 2L, 2L, 500000L, 1000000L)))
    // the same pair's Jaccard is 2/4 = 0.5 — below a 0.9 near-dup bar
    val jac = Dedup.ngramJaccard(d, "doc_id", "text", 10, 0.9).collect()
    assert(jac.isEmpty)
  }

  test("tokenContainment: id-gap bucketing bounds the candidate set") {
    val d = Seq((1L, "x y"), (100L, "x y")).toDF("doc_id", "text")
    val out = Dedup.tokenContainment(d, "doc_id", "text",
      maxIdGap = 10, thresholdE6 = 0)
    assert(out.collect().isEmpty, "pairs beyond the id gap are out of scope")
  }

  test("simhashCandidates: full recall at maxHamming <= bands-1 (matches all-pairs filter)") {
    val rng = new scala.util.Random(3)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val base = (1 to 40).map(i =>
      (i.toLong, (1 to 12).map(_ => words(rng.nextInt(words.length))).mkString(" ")))
    // plant exact dups (hamming 0) and a one-word variant
    val corpus = (base :+ (100L, base.head._2) :+ (101L, base.head._2 + " omega"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashCandidates(corpus, "doc_id", "text",
        bits = 16, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute-force oracle over signatures
    val sigs = corpus.select(col("doc_id"), Dedup.simhash(col("text"), 16).as("s"))
      .as[(Long, Long)].collect()
    val expect = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(got.contains((1L, 100L, 0)), "planted exact dup not found")
  }

  test("simhash wide signatures (bits > 32) carry real high-bit votes") {
    // the r17 regression: bits > 32 voted over a 32-bit hash, so every
    // bit >= 32 was permanently 0 — one constant high band, one
    // all-docs bucket. Pin: 60-bit sigs of diverse docs differ in the
    // HIGH 28 bits, and bits <= 32 behavior is unchanged vs before.
    val d = (1 to 30).map(i => (i.toLong,
      (1 to 20).map(j => s"w${i * 31 + j * 7}").mkString(" "))).toDF("doc_id", "text")
    val wide = d.select(Dedup.simhash(col("text"), 60).as("s"))
      .as[Long].collect()
    assert(wide.map(_ >>> 32).distinct.length > 1,
      "high 28 bits constant across diverse docs — the 32-bit vote-source bug")
    assert(wide.forall(_ >= 0L), "60-bit signatures must stay BIGINT-positive")
    val e = intercept[Exception] {
      d.select(Dedup.simhash(col("text"), 64).as("s")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("at most 60 bits")))
  }

  test("simhashCandidates at 60 bits: full recall vs all-pairs filter") {
    val rng = new scala.util.Random(7)
    val words = (1 to 500).map(i => s"tok$i")
    val base = (1 to 40).map(i =>
      (i.toLong, (1 to 15).map(_ => words(rng.nextInt(words.length))).mkString(" ")))
    val corpus = (base :+ (100L, base.head._2)).toDF("doc_id", "text")
    val got = Dedup.simhashCandidates(corpus, "doc_id", "text",
        bits = 60, bands = 4, maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = corpus.select(col("doc_id"), Dedup.simhash(col("text"), 60).as("s"))
      .as[(Long, Long)].collect()
    val expect = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 1
    } yield (ia, ib, h)).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(got.contains((1L, 100L, 0)), "planted exact dup not found")
  }

  test("jaccardJoinComplete equals brute force — no id-gap, exact at the threshold") {
    val rng = new scala.util.Random(11)
    val words = (1 to 40).map(i => s"w$i")
    val base = (1 to 50).map(i => (i.toLong * 1000, // ids far apart: no gap dial
      (1 to 12).map(_ => words(rng.nextInt(words.length))).distinct.mkString(" ")))
    // plant an exact dup and a one-token variant at a huge id distance
    val corpus = (base :+ (900000L, base.head._2) :+
      (901000L, base.head._2 + " extraword")).toDF("doc_id", "text")
    val tE6 = 500000L
    val got = Dedup.jaccardJoinComplete(corpus, "doc_id", "text", tE6)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("n_inter"), r.getAs[Long]("jaccard_e6"))).toSet
    val sets = corpus.as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split("\\s+").distinct.toSet) }
    val expect = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      i = (sa & sb).size
      if i * (1000000L + tE6) >= tE6 * (sa.size + sb.size)
    } yield (ia, ib, i.toLong, i * 1000000L / (sa.size + sb.size - i))).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(got.exists(p => p._1 == 1000L && p._2 == 900000L && p._4 == 1000000L),
      "planted far-id exact dup not found (the no-gap-dial point)")
    // ngramJaccard with a gap dial misses exactly that pair
    val gapped = Dedup.ngramJaccard(corpus, "doc_id", "text",
      maxIdGap = 50, threshold = 0.5).collect()
    assert(!gapped.exists(r => r.getAs[Long]("id_b") == 900000L))
  }

  test("jaccardJoinComplete integer threshold boundary is exact") {
    // J = 2/4 = 0.5 exactly: accepted at tE6=500000, rejected at 500001
    val d = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    assert(Dedup.jaccardJoinComplete(d, "doc_id", "text", 500000L).count() == 1)
    assert(Dedup.jaccardJoinComplete(d, "doc_id", "text", 500001L).count() == 0)
  }

  test("hammingCandidates: generic over precomputed signatures, null sigs dropped") {
    // 56-bit sigs: 1-2 differ by 2 bits, 3 is 1 flipped in 5 bits (> max),
    // 4 duplicates 1 exactly, 5 has a null signature
    val s1 = 0x00FF00FF00FFL
    val sigs = Seq(
      (1L, Option(s1)), (2L, Option(s1 ^ 0x3L)), (3L, Option(s1 ^ 0x1F0000L)),
      (4L, Option(s1)), (5L, Option.empty[Long])
    ).toDF("id", "s")
    val got = Dedup.hammingCandidates(sigs, "id", "s", bits = 56, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 2), (1L, 4L, 0), (2L, 4L, 2)))
  }

  test("connectedComponents: chain needs multiple propagation rounds; components split") {
    // chain 1-2-3-4-5 (diameter 4 > one round) and separate pair 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(edges, "id_a", "id_b")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
    // the DISTRIBUTED min-label loop (forced via driverMaxEdges = 0) must
    // produce the identical labeling
    val dist = Dedup.connectedComponents(edges, "id_a", "id_b", driverMaxEdges = 0L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dist.toSeq == out.toSeq)
  }

  test("connectedComponents: driver union-find matches distributed loop on a random graph") {
    val rng = new scala.util.Random(23)
    val edges = (0 until 300).map(_ => (rng.nextInt(120).toLong, rng.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val dist = Dedup.connectedComponents(edges, "id_a", "id_b", driverMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(fast == dist)
  }

  test("duplicateClusters: transitive near-dups share one cluster, uniques absent") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base), (7L, base),            // exact dups -> cluster 1
      (3L, "totally different words entirely here today now ok fine yes"),
      (4L, base + " tailword")                       // near-dup of 1 via shingles
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateClusters(docs, "doc_id", "text",
        k = 8, bands = 4, minEst = 0.5)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val m = out.toMap
    assert(m(1L) == 1L && m(2L) == 1L && m(7L) == 1L)
    assert(m.get(4L).forall(_ == 1L)) // near-dup may or may not pass 0.5; if present, same cluster
    assert(!m.contains(3L), "unique doc must be absent")
  }

  test("minhashCandidatesCross: flags corpus docs near-duplicating held-out docs, nothing else") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, base),                          // near-dup of held-out 100
      (2L, base + " tail"),                // likely near-dup too
      (3L, "totally different words entirely here today now ok fine yes")
    ).toDF("doc_id", "text")
    val held = Seq(
      (100L, base),
      (101L, "unrelated held out benchmark text nothing shared at all")
    ).toDF("doc_id", "text")
    val out = Dedup.minhashCandidatesCross(corpus, held, "doc_id", "text",
        k = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.contains((1L, 100L)) && out((1L, 100L)) == 1.0)
    // ids come from the declared sides, never corpus-corpus or held-held
    assert(out.keySet.forall { case (a, b) => Set(1L, 2L, 3L)(a) && Set(100L, 101L)(b) })
    assert(!out.keySet.exists(_._2 == 101L), "unrelated held-out doc must not pair")
    assert(!out.keySet.exists(_._1 == 3L), "unrelated corpus doc must not pair")
  }

  test("minhash candidates: null-text docs never band-collide (no phantom pairs)") {
    // a null signature would otherwise reduce every band key to the bare
    // band index and pair all null-text docs with each other
    val docs = Seq(
      (1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "real words here today fine ok sure yes")
    ).toDF("doc_id", "text")
    assert(Dedup.minhashCandidates(docs, "doc_id", "text", k = 8, bands = 4).count() == 0)
    val held = Seq((100L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(Dedup.minhashCandidatesCross(docs, held, "doc_id", "text",
      k = 8, bands = 4).count() == 0)
  }

  test("dedupByQuality: best-scoring member represents the cluster; singletons pass through") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base), (2L, base), (7L, base + " longer tail here"), // cluster of 3; 7 is longest
      (3L, "totally different words entirely here today now ok fine yes")
    ).toDF("doc_id", "text")
      .withColumn("n_tokens", TextAnalysis.tokenCount(org.apache.spark.sql.functions.col("text")).cast("long"))
    val out = Dedup.dedupByQuality(docs, "doc_id", "text", "n_tokens",
        k = 8, bands = 4, minEst = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exactly one representative per cluster
    assert(out.map(_._2).distinct.length == out.length)
    // doc 3 is a singleton: its own cluster, 1 member
    assert(out.exists { case (id, cid, n, _) => id == 3L && cid == 3L && n == 1L })
    // the base cluster's representative is its longest member if 7 joined it
    val cluster1 = out.filter(_._2 == 1L)
    if (cluster1.exists(_._3 >= 3L)) // 7's near-dup membership depends on minEst
      assert(cluster1.head._1 == 7L, s"longest doc must represent: $cluster1")
    // every input doc is accounted for exactly once across clusters
    assert(out.map(_._3).sum == 4L)
  }

  test("dupNgramCoverage: interval union over corpus-duplicated grams") {
    val corpus = Seq(
      (1L, "a b c d e"),  // "a b c" shared with doc 2
      (2L, "a b c x y"),
      (3L, "z z z z"),    // "z z z" twice WITHIN the doc; overlap unions to 4
      (4L, "short"),      // 1 token, no 3-grams
      (5L, ""),           // 0 tokens
      (6L, null: String)  // null text -> 0 tokens
    ).toDF("doc_id", "text")
    val out = Dedup.dupNgramCoverage(corpus, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (1L, 5, 1L, 3L, 0.6),
      (2L, 5, 1L, 3L, 0.6),
      (3L, 4, 2L, 4L, 1.0),
      (4L, 1, 0L, 0L, 0.0),
      (5L, 0, 0L, 0L, 0.0),
      (6L, 0, 0L, 0L, 0.0)))
  }

  test("removeDupSpans: cuts covered tokens, keeps the unique remainder in order") {
    val corpus = Seq(
      (1L, "a b c d e"),   // "a b c" dup'd with doc 2 -> keep "d e"
      (2L, "x a b c y"),   // interior span -> keep "x y"
      (3L, "z z z z"),     // fully duplicated within itself -> ""
      (4L, "unique words only"),
      (5L, ""),
      (6L, null: String),
      (7L, "\tp q")        // leading tab -> leading EMPTY token: the
                           // string_agg-style rebuild keeps its separator
    ).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(corpus, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[String]("text_clean")))
    assert(out.toSeq === Seq(
      (1L, 3L, "d e"),
      (2L, 3L, "x y"),
      (3L, 4L, ""),
      (4L, 0L, "unique words only"),
      (5L, 0L, ""),
      (6L, 0L, null),
      (7L, 0L, " p q")))
  }

  test("removeContaminatedSpans: cuts held-out grams only, corpus-internal dups survive") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps high"), // "the quick brown" leaks -> cut 3
      (2L, "alpha beta gamma delta"),         // clean -> untouched
      (3L, "the quick brown the quick brown") // two hits, overlapping cover
    ).toDF("doc_id", "text")
    val held = Seq((100L, "the quick brown dog")).toDF("doc_id", "text")
    val out = Dedup.removeContaminatedSpans(corpus, held, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[String]("text_clean")))
    assert(out.toSeq === Seq(
      (1L, 3L, "fox jumps high"),
      (2L, 0L, "alpha beta gamma delta"),
      (3L, 6L, "")))
    // held-out docs never appear in the output
    assert(!out.map(_._1).contains(100L))
    // direction matters: nothing in the corpus contaminates the corpus
    val selfClean = Dedup.removeContaminatedSpans(
        corpus.filter($"doc_id" === 2L), held, "doc_id", "text", n = 3)
      .collect()(0)
    assert(selfClean.getLong(1) == 0L)
  }

  test("removeDupSpans + dupNgramCoverage agree: n_removed == covered_tokens") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val cov = Dedup.dupNgramCoverage(docs, "doc_id", "text", n = 5)
      .select("doc_id", "covered_tokens")
    val rem = Dedup.removeDupSpans(docs, "doc_id", "text", n = 5)
      .select("doc_id", "n_removed")
    val joined = cov.join(rem, "doc_id")
    assert(joined.filter(col("covered_tokens") =!= col("n_removed")).isEmpty)
    // non-vacuous: the testdata plants duplicate documents
    assert(rem.filter(col("n_removed") > 0).count() > 0)
  }

  test("dupNgramCoverage: non-overlapping duplicated spans add independently") {
    // doc 20 repeats doc 21's gram at positions 0 and 4 (gap 4 > n=2):
    // covered = 2 + 2; the middle grams are unique
    val corpus = Seq(
      (20L, "p q m n p q"),
      (21L, "p q")
    ).toDF("doc_id", "text")
    val out = Dedup.dupNgramCoverage(corpus, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((20L, 6, 2L, 4L), (21L, 2, 1L, 2L)))
  }

  test("stripBoilerplate removes high-df lines per group, keeps rare ones") {
    // 4 docs on site s1: "FOOTER" in 3/4 (750 permille) -> boilerplate at
    // threshold 500; "unique N" lines survive. s2 has its own counts.
    val docs = Seq(
      (1L, "s1", "unique 1\nFOOTER"),
      (2L, "s1", "unique 2\nFOOTER"),
      (3L, "s1", "FOOTER\nunique 3"),
      (4L, "s1", "unique 4"),
      (5L, "s2", "FOOTER\nother")).toDF("doc_id", "src", "text")
    val out = Dedup.stripBoilerplate(docs, "doc_id", "text", "src", 500)
      .orderBy("doc_id").collect()
    // s2's FOOTER is 100% df but in only ONE doc: the minDocs floor keeps
    // it (single-doc groups must not strip to nothing)
    assert(out.map(_.getAs[String]("text_clean")).toSeq == Seq(
      "unique 1", "unique 2", "unique 3", "unique 4", "FOOTER\nother"))
    assert(out.map(_.getAs[Long]("n_kept")).toSeq == Seq(1L, 1L, 1L, 1L, 2L))
  }

  test("stripBoilerplate: within-doc repeats count the doc once; empty docs survive") {
    val docs = Seq(
      (1L, "s", "ad\nad\nbody"), // 'ad' repeats in doc 1 but df = 2 docs
      (2L, "s", "ad\nmore"),
      (3L, "s", "clean"),
      (4L, "s", "")).toDF("doc_id", "src", "text")
    // df(ad) = 2 of 4 docs = 500 permille; threshold 400 -> stripped
    val out = Dedup.stripBoilerplate(docs, "doc_id", "text", "src", 400)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    assert(out(0).getAs[String]("text_clean") == "body")
    assert(out(0).getAs[Long]("n_lines") == 3 && out(0).getAs[Long]("n_kept") == 1)
    assert(out(3).getAs[String]("text_clean") == "")
    // threshold 600: df 500 permille is NOT boilerplate, everything stays
    val keep = Dedup.stripBoilerplate(docs, "doc_id", "text", "src", 600)
      .orderBy("doc_id").collect()
    assert(keep(0).getAs[String]("text_clean") == "ad\nad\nbody")
  }

  test("dupClusterSpectrum: two pairs and a singleton give the hand spectrum") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three four five six seven eight nine ten eleven"
    val docs = Seq((1L, a), (2L, a), (3L, b), (4L, b),
      (5L, "totally unrelated text about something else entirely here"))
      .toDF("doc_id", "text")
    val out = Dedup.dupClusterSpectrum(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("cluster_size") -> r).toMap
    assert(out(1L).getAs[Long]("n_clusters") == 1L)
    assert(out(1L).getAs[Long]("doc_share_pm") == 200L)
    assert(out(2L).getAs[Long]("n_clusters") == 2L)
    assert(out(2L).getAs[Long]("n_docs") == 4L)
    assert(out(2L).getAs[Long]("doc_share_pm") == 800L)
  }

  test("splitLeakage: one identical pair lands in its split class with est 1.0") {
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, dup), (2L, dup),
      (3L, "completely different words appear in this document body text"),
      (4L, "yet another unrelated piece of writing about nothing at all"))
      .toDF("doc_id", "text")
    val out = Dedup.splitLeakage(docs, "doc_id", "text").collect()
    assert(out.length == 1, out.mkString(";"))
    val r = out.head
    assert(r.getAs[Long]("n_pairs") == 1L)
    assert(r.getAs[Long]("mean_est_j_e6") == 1000000L)
    // expected split class derived from the SAME hashSplit the audit uses
    val sp = Corpus.hashSplit(docs.select(col("doc_id")), "doc_id")
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("split"))
      .toMap
    val (lo, hi) = (Seq(sp(1L), sp(2L)).min, Seq(sp(1L), sp(2L)).max)
    assert(r.getAs[String]("split_a") == lo && r.getAs[String]("split_b") == hi)
    assert(r.getAs[Boolean]("crossing") == (sp(1L) != sp(2L)))
  }
}
