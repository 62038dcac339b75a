package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ColsSpec extends SparkSpec {
  import spark.implicits._

  test("codeMatches: exact OR prefix, null-safe false (F5 / naics_mask parity)") {
    val df = Seq(Some("31100"), Some("54151"), Some("99999"), None)
      .toDF("code")
    val out = df.select(Cols.codeMatches(col("code"), Seq("99999"), Seq("31", "54")).as("m"))
      .as[Boolean].collect().toSeq
    assert(out === Seq(true, true, true, false)) // null -> false, never null
  }

  test("codeMatches: empty exact and prefixes -> all false") {
    val df = Seq("a", "b").toDF("code")
    val out = df.select(Cols.codeMatches(col("code"), Nil, Nil)).as[Boolean].collect().toSeq
    assert(out === Seq(false, false))
  }

  test("containsCI: case-insensitive, null -> false (F4)") {
    val df = Seq(Some("Software Developer"), Some("mechanic"), None).toDF("name")
    val out = df.select(Cols.containsCI(col("name"), "SOFT")).as[Boolean].collect().toSeq
    assert(out === Seq(true, false, false))
  }

  test("makeMonthDate: valid M01..M12 -> first of month, junk -> null (F-D1)") {
    val df = Seq(("2020", "M03"), ("2020", "M13"), ("bad", "M01"), ("2021", "Q01"))
      .toDF("year", "period")
    val out = df.select(Cols.makeMonthDate(col("year"), col("period")).cast("string"))
      .collect().toSeq.map(_.get(0))
    assert(out === Seq("2020-03-01", null, null, null))
  }

  test("toDoubleCoerce: junk -> null (pandas to_numeric errors=coerce)") {
    val out = Seq("1.5", "x", "", "2").toDF("v")
      .select(Cols.toDoubleCoerce(col("v"))).collect().toSeq.map(_.get(0))
    assert(out === Seq(1.5, null, null, 2.0))
  }

  test("monthStart / monthEnd") {
    val df = Seq("2020-02-17").toDF("d").select(to_date(col("d")).as("d"))
    val r = df.select(Cols.monthStart(col("d")).cast("string"),
      Cols.monthEnd(col("d")).cast("string")).collect().head
    assert(r.getString(0) === "2020-02-01")
    assert(r.getString(1) === "2020-02-29")
  }

  test("safeLog: nonpositive -> null, not -inf/NaN (F-M1)") {
    val out = Seq(math.E, 0.0, -1.0).toDF("v")
      .select(Cols.safeLog(col("v"))).collect().toSeq.map(_.get(0))
    assert(approx(out.head.asInstanceOf[Double], 1.0))
    assert(out(1) == null && out(2) == null)
  }

  test("safeDiv: zero or null denominator -> null") {
    val df = Seq((1.0, 2.0), (1.0, 0.0)).toDF("n", "d")
    val out = df.select(Cols.safeDiv(col("n"), col("d"))).collect().toSeq.map(_.get(0))
    assert(out === Seq(0.5, null))
  }

  test("hash32: deterministic, in [0, 2^32), md5-derived") {
    val out = Seq("abc", "abc", "xyz").toDF("s")
      .select(Cols.hash32(col("s"))).as[Long].collect().toSeq
    assert(out(0) === out(1))
    assert(out(0) !== out(2))
    assert(out.forall(h => h >= 0 && h < (1L << 32)))
    // md5("abc") = 900150983cd24fb0... -> 0x90015098
    assert(out(0) === 0x90015098L)
  }

  test("shingles: k=3 word shingles; short docs -> empty array") {
    val df = Seq("a b c d", "a b").toDF("t")
    val out = df.select(Cols.shingles(Cols.tokens(col("t")), 3)).collect().toSeq
    assert(out(0).getSeq[String](0) === Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](0) === Seq.empty)
  }

  test("dot / l2norm / cosine on float arrays") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(2.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val out = df.select(Cols.dot(col("a"), col("b")), Cols.cosine(col("a"), col("b")))
      .collect().toSeq
    assert(approx(out(0).getDouble(0), 0.0) && approx(out(0).getDouble(1), 0.0))
    assert(approx(out(1).getDouble(0), 2.0) && approx(out(1).getDouble(1), 1.0))
  }

  test("cosine: zero-norm vector -> null, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(Cols.cosine(col("a"), col("b"))).collect().head.get(0) == null)
  }

  test("affineHash: stays in [0, p), rejects overflow-prone multipliers") {
    val df = Seq(4294967295L).toDF("h") // max hash32 value
    val out = df.select(Cols.affineHash(col("h"), 1048576L, 7L)).as[Long].collect().head
    assert(out >= 0 && out < 4294967311L)
    assertThrows[IllegalArgumentException](Cols.affineHash(col("h"), (1L << 20) + 1, 0L))
  }
}
