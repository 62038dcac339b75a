package graft.text

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def refTerm(tf: Long, df: Long, dl: Long, n: Long, s: Long,
                      k1: Double = 1.2, b: Double = 0.75): Long = {
    val idf = math.log(((n - df).toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
    val v = idf * (tf.toDouble * (k1 + 1.0)) /
      (tf.toDouble + k1 * (1.0 - b + b * dl.toDouble * n.toDouble / s.toDouble))
    math.floor(v * 1e9 + 0.5).toLong
  }

  test("bm25TopK matches the hand-computed scores and tie-breaks by doc_id") {
    val docs = Seq((0L, "a b a"), (1L, "b c"), (2L, "a")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq(0L -> "a b"))
      .orderBy("rank").collect()
    // N=3, S=6; df(a)=2, df(b)=2; dl = 3, 2, 1
    val exp = Map(
      0L -> (refTerm(2, 2, 3, 3, 6) + refTerm(1, 2, 3, 3, 6)), // a twice + b once
      1L -> refTerm(1, 2, 2, 3, 6),
      2L -> refTerm(1, 2, 1, 3, 6))
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("score_e9") == exp(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}")
    }
    // ranks follow score desc
    val ranked = out.map(r => (r.getAs[Int]("rank"), r.getAs[Long]("score_e9")))
    assert(ranked.sortBy(_._1).map(_._2).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("bm25TopK: repeated query terms dedup; unmatched docs absent; topK caps") {
    val docs = Seq((0L, "x x x"), (1L, "y"), (2L, "x y"), (3L, "z")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(7L -> "x x y"), topK = 2).collect()
    // doc 3 matches nothing -> absent; topK=2 keeps the best two of three
    assert(out.length == 2)
    assert(out.forall(_.getAs[Long]("query_id") == 7L))
    assert(!out.map(_.getAs[Long]("doc_id")).contains(3L))
    // dedup: "x x y" scores like "x y" (qtf never multiplies)
    val dedup = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(7L -> "x y"), topK = 2).collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_e9"))).toSet ==
      dedup.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_e9"))).toSet)
  }

  test("bm25TopK: heap path emits rows identical to the window path") {
    // enough docs that ties, the topK cutoff, and multi-query fan-out all
    // exercise the bounded buffer's merge; equality is the q260/q261
    // same-rows/skew-immune-plan law
    val docs = (0L until 40L).map { i =>
      val words = Seq.fill((i % 5 + 1).toInt)(s"w${i % 7}") ++
        Seq.fill(2)(s"w${(i + 1) % 7}") :+ "common"
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val qs = Seq(1L -> "w0 common", 2L -> "w3 w4", 3L -> "absentterm")
    for (k <- Seq(1, 3, 10)) {
      val win = Retrieval.bm25TopK(docs, "doc_id", "text", qs, topK = k)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("score_e9"), r.getAs[Int]("rank"))).toSet
      val heap = Retrieval.bm25TopK(docs, "doc_id", "text", qs, topK = k,
          heap = true)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("score_e9"), r.getAs[Int]("rank"))).toSet
      assert(win == heap, s"k=$k")
      assert(win.nonEmpty)
    }
  }

  test("rougeN: clipped bigram overlap, zero-overlap pairs kept, short docs drop") {
    val docs = Seq(
      (0L, "a b c"),    // bigrams {a b, b c}
      (1L, "b c d"),    // bigrams {b c, c d}
      (2L, "a b a b"),  // bigrams {a b x2, b a}
      (3L, "a b"),      // bigram {a b}
      (4L, "x y"), (5L, "p q"), // disjoint pair
      (6L, "solo"), (7L, "t u") // 6 has no bigram -> pair drops
    ).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (2L, 3L), (4L, 5L), (6L, 7L))
      .toDF("cand_id", "ref_id")
    val out = Retrieval.rougeN(docs, "doc_id", "text", pairs, n = 2)
      .collect().map(r => r.getAs[Long]("cand_id") -> r).toMap
    assert(out.keySet == Set(0L, 2L, 4L))
    // (0,1): overlap {b c} = 1 of 2 vs 2 -> P = R = 1/2, F = 2*1/4
    assert(out(0L).getAs[Long]("n_overlap") == 1L)
    assert(out(0L).getAs[Long]("p_e6") == 500000L)
    assert(out(0L).getAs[Long]("r_e6") == 500000L)
    assert(out(0L).getAs[Long]("f_e6") == 500000L)
    // (2,3): clipped min(2,1) for "a b" -> ov 1; P = 1/3, R = 1
    assert(out(2L).getAs[Long]("n_overlap") == 1L)
    assert(out(2L).getAs[Long]("p_e6") == 333333L)
    assert(out(2L).getAs[Long]("r_e6") == 1000000L)
    assert(out(2L).getAs[Long]("f_e6") == 500000L)
    // disjoint: kept with zeros
    assert(out(4L).getAs[Long]("n_overlap") == 0L)
    assert(out(4L).getAs[Long]("f_e6") == 0L)
  }

  test("rougeN: hashGrams path emits rows identical to the string path") {
    val docs = (0L until 30L).map { i =>
      (i, (0 until 12).map(j => s"w${(i + j) % 9}").mkString(" "))
    }.toDF("doc_id", "text")
    val pairs = (0L until 30L by 2).map(i => (i, i + 1)).toDF("cand_id", "ref_id")
    def rows(hash: Boolean) =
      Retrieval.rougeN(docs, "doc_id", "text", pairs, n = 2, hashGrams = hash)
        .collect().map(r => (r.getAs[Long]("cand_id"), r.getAs[Long]("ref_id"),
          r.getAs[Long]("n_overlap"), r.getAs[Long]("p_e6"),
          r.getAs[Long]("r_e6"), r.getAs[Long]("f_e6"))).toSet
    assert(rows(hash = false) == rows(hash = true))
    assert(rows(hash = false).nonEmpty)
  }

  test("rankingMetrics: hand-computed DCG sums; no-relevant null; beyond-k zero") {
    // q1 ranking by score: d1(rel0), d2(rel2), d3(rel1), d4(rel2)
    // disc_e12 = (1e12, 630929753571, 5e11, 430676558073)
    val q1 = Seq(("q1", 1L, 90L, 0L), ("q1", 2L, 80L, 2L),
      ("q1", 3L, 70L, 1L), ("q1", 4L, 60L, 2L))
    val q2 = Seq(("q2", 1L, 9L, 0L), ("q2", 2L, 8L, 0L))
    val out = Retrieval.rankingMetrics((q1 ++ q2).toDF("q", "doc", "s", "rel"),
      Seq("q"), "doc", "s", "rel")
      .collect().map(r => r.getAs[String]("q") -> r).toMap
    val dcg = 2L * 630929753571L + 500000000000L + 2L * 430676558073L
    val idcg = 2L * 1000000000000L + 2L * 630929753571L + 500000000000L
    assert(out("q1").getAs[Long]("dcg_num_e12") == dcg)
    assert(out("q1").getAs[Long]("idcg_num_e12") == idcg)
    assert(out("q1").getAs[Long]("ndcg_e6") ==
      math.floor(dcg.toDouble / idcg.toDouble * 1e6 + 0.5).toLong)
    assert(out("q1").getAs[Long]("first_rel_rank") == 2L)
    assert(out("q1").getAs[Long]("mrr_e6") == 500000L)
    val r2 = out("q2")
    assert(r2.get(r2.fieldIndex("ndcg_e6")) == null)
    assert(r2.getAs[Long]("mrr_e6") == 0L)
    // k = 2 with the only relevant doc at rank 3: DCG 0 but IDCG > 0
    // -> ndcg exactly 0, mrr 0 (the "retrieved nothing useful" readout)
    val q3 = Seq(("q3", 1L, 90L, 0L), ("q3", 2L, 80L, 0L), ("q3", 3L, 70L, 1L))
    val r3 = Retrieval.rankingMetrics(q3.toDF("q", "doc", "s", "rel"),
      Seq("q"), "doc", "s", "rel", k = 2).collect().head
    assert(r3.getAs[Long]("ndcg_e6") == 0L)
    assert(r3.getAs[Long]("mrr_e6") == 0L)
  }

  test("bm25TopK: a rarer term outranks a common one at equal tf and length") {
    // 'rare' appears in 1 of 4 docs, 'common' in 3 of 4
    val docs = Seq((0L, "rare pad"), (1L, "common pad"), (2L, "common x"),
      (3L, "common y")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(0L -> "rare common")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank")).toMap
    assert(out(0L) == 1, s"rare-term doc should rank first: $out")
  }
}
