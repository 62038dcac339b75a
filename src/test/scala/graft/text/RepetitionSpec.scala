package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  /** Declarative collections reference the single-pass kernel is checked
    * against (same definitions, independent control flow). */
  private def ref(text: String): Repetition.RepStats = {
    def cp(s: String): Long = s.codePointCount(0, s.length).toLong
    val lines = text.split("\n", -1).filter(_.nonEmpty).toSeq
    val lineGroups = lines.groupBy(identity).view.mapValues(_.size).toMap
    val nLines = lines.size
    val lineChars = lines.map(cp).sum
    val dupLines = lineGroups.valuesIterator.map(c => c - 1).sum
    val dupLineChars = lineGroups.collect { case (l, c) if c > 1 => (c - 1) * cp(l) }.sum
    val trimmed = TextHash.sparkTrim(text)
    val toks = if (trimmed.isEmpty) Seq.empty else trimmed.split("\\s+", -1).toSeq
    val tokChars = toks.map(cp).sum
    def grams(n: Int): Seq[String] = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    def gramFrac(n: Int, top: Boolean): Option[Double] = {
      val gs = grams(n)
      if (gs.isEmpty || tokChars == 0) None
      else {
        val groups = gs.groupBy(identity).view.mapValues(_.size).toMap
        // ties break by CODE-POINT order (UTF-8/DuckDB byte order), same
        // as the kernel — String's natural Ordering is UTF-16 and differs
        val cpOrd: Ordering[String] = (a, b) => Repetition.cpCompare(a, b)
        val cov =
          if (top) {
            val (g, c) = groups.maxBy { case (g, c) => (c, g) }(Ordering.Tuple2(Ordering.Int, cpOrd))
            c * (cp(g) - (n - 1))
          } else groups.collect { case (g, c) if c > 1 => c * (cp(g) - (n - 1)) }.sum
        Some(cov.toDouble / tokChars)
      }
    }
    Repetition.RepStats(
      nLines,
      if (nLines == 0) None else Some(dupLines.toDouble / nLines),
      if (lineChars == 0) None else Some(dupLineChars.toDouble / lineChars),
      gramFrac(2, top = true),
      gramFrac(5, top = false))
  }

  private val fixtures = Seq(
    "",
    "   ",
    "one",
    "a b a b",
    "x\ny\nx\n",
    "line one\nline one\nline two\n\nline one",
    "a b c d e a b c d e a b c d e",   // repeated 5-gram
    "😀 x 😀 x 😀",                      // surrogate pairs: cp != UTF-16 len
    "tab\tseparated words tab\tseparated",
    "solo\n\n\n"
  )

  test("kernel matches the declarative reference on edge fixtures") {
    fixtures.foreach { t =>
      val k = Repetition.kernel(t)
      val r = ref(t)
      assert(k.n_lines === r.n_lines, s"n_lines for '$t'")
      def cmp(a: Option[Double], b: Option[Double], what: String): Unit = (a, b) match {
        case (Some(x), Some(y)) => assert(approx(x, y), s"$what for '$t': $x vs $y")
        case _ => assert(a === b, s"$what for '$t'")
      }
      cmp(k.dup_line_frac, r.dup_line_frac, "dup_line_frac")
      cmp(k.dup_line_char_frac, r.dup_line_char_frac, "dup_line_char_frac")
      cmp(k.top_2gram_char_frac, r.top_2gram_char_frac, "top_2gram_char_frac")
      cmp(k.dup_5gram_char_frac, r.dup_5gram_char_frac, "dup_5gram_char_frac")
    }
  }

  test("kernel matches the reference on random word soup") {
    val rng = new Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "yy", "zzz")
    (0 until 50).foreach { _ =>
      val nTok = rng.nextInt(30)
      val t = (0 until nTok).map { i =>
        vocab(rng.nextInt(vocab.size)) + (if (rng.nextInt(6) == 0) "\n" else "")
      }.mkString(" ")
      val k = Repetition.kernel(t)
      val r = ref(t)
      assert(k.n_lines === r.n_lines)
      assert(k.top_2gram_char_frac.isDefined === r.top_2gram_char_frac.isDefined)
      k.top_2gram_char_frac.zip(r.top_2gram_char_frac).foreach { case (a, b) => assert(approx(a, b)) }
      k.dup_5gram_char_frac.zip(r.dup_5gram_char_frac).foreach { case (a, b) => assert(approx(a, b)) }
      k.dup_line_char_frac.zip(r.dup_line_char_frac).foreach { case (a, b) => assert(approx(a, b)) }
    }
  }

  test("hand-computed values: repeated 2-gram coverage") {
    // toks [a b a b]: 2-grams "a b"x2, "b a"x1 -> top covers 2*2 chars of 4
    val k = Repetition.kernel("a b a b")
    assert(k.top_2gram_char_frac === Some(1.0))
    assert(k.dup_5gram_char_frac === None) // < 5 tokens
    assert(k.n_lines === 1)
    assert(k.dup_line_frac === Some(0.0))
  }

  test("hand-computed values: duplicate lines") {
    val k = Repetition.kernel("x\ny\nx\n")
    assert(k.n_lines === 3)
    assert(k.dup_line_frac.exists(approx(_, 1.0 / 3)))
    assert(k.dup_line_char_frac.exists(approx(_, 1.0 / 3)))
  }

  test("statsCol: null text -> null struct; DataFrame round-trip") {
    val df = Seq((1L, "a b a b"), (2L, null)).toDF("id", "text")
      .select(col("id"), Repetition.statsCol(col("text")).as("s"))
      .orderBy("id").collect().toSeq
    assert(df(0).getStruct(1).getAs[Double]("top_2gram_char_frac") === 1.0)
    assert(df(1).isNullAt(1))
  }

  test("top-gram tie-break compares code points (UTF-8 byte order), not UTF-16") {
    // U+E000 (private use, one UTF-16 unit) vs U+1F600 emoji (surrogate
    // pair): Java compareTo ranks U+E000 ABOVE the emoji; UTF-8 byte
    // order (= code-point order = DuckDB's binary ORDER BY) ranks the
    // emoji higher
    val pu = "\uE000"
    val emoji = new String(Character.toChars(0x1F600))
    assert(Repetition.cpCompare(emoji, pu) > 0)
    assert(emoji.compareTo(pu) < 0) // the UTF-16 trap being avoided
    // 2-grams "<pu> z" x2 and "<emoji> zzzz" x2 tie at the top with
    // different coverage, so the comparator choice is observable:
    // code-point winner "<emoji> zzzz" covers 2*5 of the 15 token cp;
    // the UTF-16 winner "<pu> z" would cover only 2*2
    val k = Repetition.kernel(s"$pu z $pu z s $emoji zzzz $emoji zzzz")
    assert(k.top_2gram_char_frac.exists(approx(_, 10.0 / 15)))
  }
}
