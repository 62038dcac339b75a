package graft

import org.apache.spark.sql.functions._

/** Parity: the JVM [[EntryHelpers.linedKernel]] vs the expression form of
  * the 2-token-per-line derivation shared by q80/q81/q84 and their
  * oracles. */
class LinedTextSpec extends SparkSpec {
  import spark.implicits._

  test("linedText kernel matches the expression form on edge fixtures") {
    val texts = Seq("a b c d", "a b c", "a", "", "   ", "\t", "  x  y  z ",
      "tab\there now", "one two three four five", null)
    val df = texts.toDF("text")
    val got = df.select(EntryHelpers.linedText(col("text"))).collect().map(_.get(0))
    val want = df.select(EntryHelpers.linedTextExpr(col("text"))).collect().map(_.get(0))
    got.zip(want).zip(texts).foreach { case ((g, w), t) =>
      assert(g == w, s"for input '$t'")
    }
    // shape sanity: pairs joined by \n
    assert(got(0) == "a b\nc d")
    assert(got(1) == "a b\nc")
  }

  test("linedPunctText kernel matches the expression form across id offsets") {
    val texts = Seq("a b c d e f", "a b c", "a", "", "   ", "x y", null)
    val rows = for (t <- texts; id <- Seq(0L, 1L, 2L, 7L)) yield (t, id)
    val df = rows.toDF("text", "id")
    val got = df.select(EntryHelpers.linedPunctText(col("text"), col("id"))).collect().map(_.get(0))
    val want = df.select(EntryHelpers.linedPunctTextExpr(col("text"), col("id"))).collect().map(_.get(0))
    got.zip(want).zip(rows).foreach { case ((g, w), r) =>
      assert(g == w, s"for input $r: kernel=$g expr=$w")
    }
    // shape sanity: doc id 0 → lines 0,1,2 get '.', nothing, '!'
    val d0 = df.filter(col("text") === "a b c d e f" && col("id") === 0)
      .select(EntryHelpers.linedPunctText(col("text"), col("id"))).head.getString(0)
    assert(d0 == "a b.\nc d\ne f!")
  }
}
