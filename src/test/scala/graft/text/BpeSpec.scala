package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE merge learning against the hand-computed Sennrich-style fixture
  * (no end-of-word marker, ties to lexicographic-smallest pair). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // word frequencies low:5 lower:2 newest:6 widest:3
  // pair counts r0: es=9 st=9 (tie -> (e,s)), we=8, lo=7, ow=7, ne=6, ew=6 ...
  // r1: (es,t)=9; r2: lo=7 ow=7 (tie -> (l,o))
  private val docs = Seq(
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
     Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
  ).toDF("text")

  test("learnMerges reproduces the classic merge sequence with deterministic ties") {
    val merges = Bpe.learnMerges(docs, "text", numMerges = 3)
    assert(merges.map(m => (m.rank, m.left, m.right, m.pairCount)) == Seq(
      (0, "e", "s", 9L), (1, "es", "t", 9L), (2, "l", "o", 7L)))
  }

  test("learnMerges stops early below minPairCount") {
    val tiny = Seq("ab cd").toDF("text")
    assert(Bpe.learnMerges(tiny, "text", numMerges = 5, minPairCount = 2L).isEmpty)
  }

  test("encodeCol applies merges in rank order; unknown words stay chars") {
    val merges = Bpe.learnMerges(docs, "text", numMerges = 3)
    val enc = Seq("newest low lox", "").toDF("t")
      .select(Bpe.encodeCol(col("t"), merges).as("s"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[String](0).toList)
    // newest -> n e w est ; low -> lo w ; lox -> lo x
    assert(enc(0) == List("n", "e", "w", "est", "lo", "w", "lo", "x"))
    assert(enc(1) == Nil)
  }

  test("applyMerge is a single greedy left-to-right pass") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toList == List("aa", "a"))
    assert(Bpe.charSyms("a😀b").toList == List("a", "😀", "b"))
  }

  /** Slow reference learner: full recount + argmax scan each round — the
    * definitionally-correct implementation the incremental one must match. */
  private def bruteForce(words: Array[(String, Long)], numMerges: Int,
                         minPairCount: Long): Seq[(String, String, Long)] = {
    var vocab = words.map { case (w, c) => (Bpe.charSyms(w), c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (out.size < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (s, c) =>
        (0 until s.length - 1).foreach(i => counts((s(i), s(i + 1))) =
          counts.getOrElse((s(i), s(i + 1)), 0L) + c)
      }
      if (counts.isEmpty) done = true
      else {
        val (p, n) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        if (n < minPairCount) done = true
        else {
          out += ((p._1, p._2, n))
          vocab = vocab.map { case (s, c) => (Bpe.applyMerge(s, p._1, p._2), c) }
        }
      }
    }
    out.toSeq
  }

  test("incremental learner matches brute-force recount on a randomized vocab") {
    val rng = new scala.util.Random(42)
    val sylls = Array("ab", "cd", "ef", "gh", "xy", "lo", "we", "st", "er", "an")
    val words = Array.tabulate(300) { _ =>
      val w = (0 until 1 + rng.nextInt(4)).map(_ => sylls(rng.nextInt(sylls.length))).mkString
      (w, 1L + rng.nextInt(20).toLong)
    }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
    val fast = Bpe.learnMergesLocal(words, 40, 2L).map(m => (m.left, m.right, m.pairCount))
    assert(fast == bruteForce(words, 40, 2L))
  }

  test("mergeSliceDf: real learner over the run-capped corpus, hand-checked merges") {
    import spark.implicits._
    // planted corpus (weights via repetition): "erer" exercises the
    // adjacent-chain case the oracle's 2-pass replace must handle, and
    // "reed" the l==r doubled-char case; excluded: length-1, length-10+,
    // and a 5-run word
    val docs = (Seq.fill(4)("the erer") ++ Seq.fill(3)("reed the") ++
      Seq("a abcdefghij aaaaax erer")).toDF("text")
    val out = graft.text.Bpe.mergeSliceDf(docs, "text", k = 3).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[Long]("pair_count")))
    // corpus words: the x7, erer x5, reed x3 ("a", "abcdefghij", "aaaaax"
    // filtered). pairs: (e,r) from erer = 2 each -> 10; (r,e) from
    // erer 1 each -> 5, from reed 1 each -> 3 -> 8; (t,h)/(h,e) 7;
    // (e,e) 3; (e,d) 3. argmax1 = (e,r) 10. after merge: erer -> [er,er]:
    // (er,er) 5; (r,e): reed only -> 3; (t,h)/(h,e) 7 -> argmax2 = (h,e)
    // (ties (t,h) 7, lexicographic h < t). after: the -> [t,he]: (t,he) 7
    // -> argmax3 = (t,he) 7
    assert(out.toSeq == Seq((0L, "e", "r", 10L), (1L, "h", "e", 7L),
      (2L, "t", "he", 7L)))
  }

  test("mergeSliceDf: minPairCount stop ends the schedule early (the q371 contract)") {
    import spark.implicits._
    // same fixture as above: counts run 10, 7, 7, then (er,er) 5 — a
    // threshold of 7 admits exactly the first three merges of a k=5
    // schedule and the data-dependent stop cuts the rest
    val docs = (Seq.fill(4)("the erer") ++ Seq.fill(3)("reed the") ++
      Seq("a abcdefghij aaaaax erer")).toDF("text")
    val out = graft.text.Bpe.mergeSliceDf(docs, "text", k = 5,
        minPairCount = 7L).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[Long]("pair_count")))
    assert(out.toSeq == Seq((0L, "e", "r", 10L), (1L, "h", "e", 7L),
      (2L, "t", "he", 7L)))
  }

  test("encodeSliceDf: hand-checked fertility under the learned 3-merge table") {
    import spark.implicits._
    // same planted corpus as the mergeSliceDf check → merges (e,r),
    // (h,e), (t,he). Encodes: the→[the] 1; erer→[er,er] 2 (the 2-pass
    // adjacent-chain case); reed→[r,e,e,d] 4 (no merge applies);
    // doc 7's only contract word is erer (others filtered)
    val docs = ((0 until 4).map(i => (i.toLong, "the erer")) ++
      (4 until 7).map(i => (i.toLong, "reed the")) ++
      Seq((7L, "a abcdefghij aaaaax erer"))).toDF("doc_id", "text")
    val out = graft.text.Bpe.encodeSliceDf(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_subwords")))
    assert(out.take(4).forall { case (_, w, s) => w == 2L && s == 3L },
      s"docs 0-3: ${out.take(4).toSeq}")
    assert(out.slice(4, 7).forall { case (_, w, s) => w == 2L && s == 5L },
      s"docs 4-6: ${out.slice(4, 7).toSeq}")
    assert(out(7) == ((7L, 1L, 2L)), s"doc 7: ${out(7)}")
  }

  test("encodeSliceDf: matches the rank-priority encoder word-for-word on the contract corpus") {
    import spark.implicits._
    // richer corpus: merges interact ((e,r) then (er,er)); for every
    // contract word the rank-sequential replace chain must give the
    // same subword count as encodeCol's priority loop
    val docs = Seq((0L, "erer erer erer rere the there these"),
      (1L, "reed the erer deer"), (2L, "banana bandana cabana")).toDF("doc_id", "text")
    val words = docs.select(explode(
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .filter(length(col("w")).between(2, 9))
    val merges = Bpe.learnMerges(words, "w", numMerges = 3, minPairCount = 1L)
    val prioCounts = docs.select(col("doc_id"),
        Bpe.encodeCol(col("text"), merges).as("syms"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Seq[String]]("syms").length).toMap
    val sliceCounts = graft.text.Bpe.encodeSliceDf(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_subwords")).toMap
    // every word in these docs is a contract word (2-9 chars, no 5-run),
    // so whole-doc counts are comparable
    sliceCounts.foreach { case (id, n) =>
      assert(n == prioCounts(id).toLong, s"doc $id: slice=$n prio=${prioCounts(id)}")
    }
  }

  test("1k-merge round-trip: vocab-scale learning terminates fast, counts non-increasing") {
    val rng = new scala.util.Random(7)
    val alpha = "abcdefghijklmnop"
    val words = Array.tabulate(5000) { _ =>
      val w = (0 until 3 + rng.nextInt(8)).map(_ => alpha(rng.nextInt(alpha.length))).mkString
      (w, 1L + rng.nextInt(50).toLong)
    }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
    val t0 = System.nanoTime()
    val merges = Bpe.learnMergesLocal(words, 1000, 2L)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.size == 1000, s"expected 1000 merges, got ${merges.size}")
    assert(secs < 30.0, s"1k merges took $secs s — the in-memory learner regressed")
    // chosen counts are non-increasing: a merge only creates pairs at its
    // own occurrence sites, so no later pair can out-count an earlier best
    val counts = merges.map(_.pairCount)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // ranks are dense 0..n-1 and every merge's pair really disappears from
    // a re-encode of itself (left+right concatenation is the new symbol)
    assert(merges.map(_.rank) == (0 until 1000))
  }
}
