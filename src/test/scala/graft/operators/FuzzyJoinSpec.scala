package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val catalog = Seq(
    (1L, "small ring"), (2L, "small wing"), (3L, "large ring"),
    (4L, "blue bolt"), (5L, "blu bolt"), (6L, "red widget")
  ).toDF("pid", "name")

  test("byEditDistance finds within-block matches at the exact threshold") {
    val probes = Seq((10L, "smal ring"), (11L, "blue bolt"), (12L, "green gear"))
      .toDF("qid", "qname")
    val got = FuzzyJoin.byEditDistance(probes, catalog, "qname", "name",
        payload = Seq("pid"), maxDist = 2, prefixLen = 3)
      .select("qid", "pid", "edit_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // "smal ring": dist 1 to "small ring", 2 to "small wing"; "large ring"
    // shares no 3-prefix (blocked out by contract)
    // "blue bolt": exact to 4, dist 1 to "blu bolt"
    assert(got == Set((10L, 1L, 1), (10L, 2L, 2), (11L, 4L, 0), (11L, 5L, 1)))
  }

  test("byEditDistance equals brute force restricted to the block contract") {
    // random-ish words; brute force with the same prefix rule
    val words = (1 to 60).map(i => (i.toLong,
      s"${"abcde" (i % 5)}${"xyz" (i % 3)}w${i % 7}item${i % 4}"))
    val l = words.filter(_._1 % 2 == 0).toDF("qid", "qname")
    val r = words.toDF("pid", "name")
    val got = FuzzyJoin.byEditDistance(l, r, "qname", "name",
        payload = Seq("pid"), maxDist = 2, prefixLen = 3)
      .select("qid", "pid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      (qid, qn) <- words.filter(_._1 % 2 == 0); (pid, pn) <- words
      if qn.take(3) == pn.take(3) && lev(qn, pn) <= 2
    } yield (qid, pid)).toSet
    assert(got == expect)
    assert(expect.size > words.count(_._1 % 2 == 0), "fixture has no fuzzy (non-self) matches")
  }

  test("null keys never match; reserved and colliding names are rejected") {
    val l = Seq((1L, Option.empty[String]), (2L, Option("abc"))).toDF("qid", "qname")
    val out = FuzzyJoin.byEditDistance(l, catalog, "qname", "name",
      payload = Seq("pid"), maxDist = 2, prefixLen = 1)
    assert(!out.select("qid").collect().map(_.getLong(0)).contains(1L))
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.byEditDistance(l.withColumnRenamed("qid", "edit_dist"), catalog,
        "qname", "name", payload = Seq("pid")) }
    assert(e.getMessage.contains("edit_dist"))
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("byEditDistanceQGram equals UNRESTRICTED brute force (recall-complete)") {
    // same fixture as the blocked test, plus probes whose edit hits the
    // FIRST characters — the pairs prefix blocking misses by contract
    val words = (1 to 60).map(i => (i.toLong,
      s"${"abcde" (i % 5)}${"xyz" (i % 3)}w${i % 7}item${i % 4}"))
    val probes = words.filter(_._1 % 2 == 0).map { case (id, w) =>
      (id, if (id % 4 == 0) w.drop(1) else w) } // half corrupted at pos 0
    val l = probes.toDF("qid", "qname")
    val r = words.toDF("pid", "name")
    val got = FuzzyJoin.byEditDistanceQGram(l, r, "qname", "name",
        payload = Seq("pid"), maxDist = 2, q = 3)
      .select("qid", "pid", "edit_dist").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    val expect = (for {
      (qid, qn) <- probes; (pid, pn) <- words
      if lev(qn, pn) <= 2
    } yield (qid, pid, lev(qn, pn))).toSet
    assert(got == expect)
    // the fixture exercises the completeness claim: at least one match
    // whose edit touches the 3-char prefix (invisible to byEditDistance)
    val blocked = (for {
      (qid, qn) <- probes; (pid, pn) <- words
      if qn.take(3) == pn.take(3) && lev(qn, pn) <= 2
    } yield (qid, pid, lev(qn, pn))).toSet
    assert((expect -- blocked).nonEmpty, "fixture has no prefix-breaking match")
  }

  test("byEditDistanceQGram low-gram channel: short and repetitive keys") {
    // every key here has < maxDist*q+1 = 7 distinct 3-grams: shorts go
    // through the deletion channel; "aaaaaaaaaa" (one distinct gram) must
    // still find its one-substitution neighbor
    val l = Seq((1L, "ab"), (2L, "aaaaaaaaaa"), (3L, "xyz")).toDF("qid", "qname")
    val r = Seq((10L, "axb"), (11L, "aaaabaaaaa"), (12L, "qqq"), (13L, "xy"))
      .toDF("pid", "name")
    val got = FuzzyJoin.byEditDistanceQGram(l, r, "qname", "name",
        payload = Seq("pid"), maxDist = 2, q = 3)
      .select("qid", "pid", "edit_dist").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    // note ("ab","xy") at dist 2: both deletion neighborhoods reach ""
    assert(got == Set((1L, 10L, 1), (2L, 11L, 1), (3L, 13L, 1), (1L, 13L, 2)))
  }

  test("byEditDistanceQGram maxDist=0 is exact equality; nulls drop") {
    val l = Seq((1L, Option("blue bolt")), (2L, Option.empty[String]))
      .toDF("qid", "qname")
    val got = FuzzyJoin.byEditDistanceQGram(l, catalog, "qname", "name",
        payload = Seq("pid"), maxDist = 0)
      .select("qid", "pid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 4L)))
  }

  test("byEditDistanceQGram duplicate keys fan out payload rows") {
    val l = Seq((1L, "blu bolt"), (2L, "blu bolt")).toDF("qid", "qname")
    val r = Seq((10L, "blue bolt"), (11L, "blue bolt")).toDF("pid", "name")
    val got = FuzzyJoin.byEditDistanceQGram(l, r, "qname", "name",
        payload = Seq("pid"), maxDist = 1)
      .select("qid", "pid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)))
  }

  test("byEditDistanceQGram fences long low-complexity keys loudly") {
    val l = Seq((1L, "ab" * 60)).toDF("qid", "qname") // 120 chars, 3 distinct grams
    val e = intercept[Exception] {
      FuzzyJoin.byEditDistanceQGram(l, catalog, "qname", "name",
        payload = Seq("pid"), maxDist = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("deletion-neighborhood cap")))
  }
}
