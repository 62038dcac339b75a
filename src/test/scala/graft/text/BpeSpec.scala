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
}
