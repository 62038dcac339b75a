package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style repetition statistics (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", table A1):
  * the per-document repetition signals a training-data quality filter
  * thresholds on. Shuffle-free per-row transform — one single-pass JVM
  * kernel per document (the same discipline as [[TextHash]] /
  * [[TextAnalysis.qualityKernel]]: token-loop features never enter
  * codegen as expression trees, so the loop runs once in JVM code).
  *
  * Definitions (deterministic, mirrored verbatim by the DuckDB oracle):
  *  - lines = text split on '\n'; empty lines excluded.
  *    `dup_line_frac`      = (n_lines − n_distinct_lines) / n_lines
  *    `dup_line_char_frac` = chars in repeat occurrences (beyond each
  *                           line's first) / chars in all non-empty lines
  *  - tokens = whitespace split of the trimmed text (Cols.tokens).
  *    `top_2gram_char_frac` = chars covered by ALL occurrences of the
  *        most frequent 2-gram / total token chars (ties break to the
  *        lexicographically greatest gram — SQL `ORDER BY c DESC, gram
  *        DESC` replicable); null when fewer than 2 tokens.
  *    `dup_5gram_char_frac` = chars covered by all occurrences of every
  *        5-gram that occurs more than once / total token chars
  *        (overlapping occurrences double-count, as in Gopher); null when
  *        fewer than 5 tokens.
  * Char counts are code points, matching Spark `length` and DuckDB
  * `length`.
  */
object Repetition {

  private[text] final case class RepStats(
      n_lines: Int,
      dup_line_frac: Option[Double],
      dup_line_char_frac: Option[Double],
      top_2gram_char_frac: Option[Double],
      dup_5gram_char_frac: Option[Double])

  private def cp(s: String): Long = s.codePointCount(0, s.length).toLong

  /** Code-point lexicographic compare — identical to UTF-8 byte order
    * (UTF-8 preserves code-point order), which is what the DuckDB
    * oracle's binary-collation `ORDER BY gram DESC` compares. Java
    * `String.compareTo` compares UTF-16 units instead, which ranks BMP
    * chars in [U+E000, U+FFFF] ABOVE supplementary chars — a divergent
    * tie winner on non-ASCII corpora. */
  private[text] def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** n-gram repetition mass: (chars covered by the top gram's occurrences,
    * chars covered by duplicated grams' occurrences, total grams). One
    * HashMap pass; gram char length excludes the joining spaces. */
  private def gramStats(toks: Array[String], n: Int): (Long, Long, Int) = {
    val m = new java.util.HashMap[String, Int]()
    var i = 0
    val ng = toks.length - n + 1
    val sb = new java.lang.StringBuilder
    while (i < ng) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      m.merge(sb.toString, 1, Integer.sum)
      i += 1
    }
    var topCov = 0L
    var topCount = -1
    var topGram: String = null
    var dupCov = 0L
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val g = e.getKey
      val c = e.getValue
      val occChars = cp(g) - (n - 1) // tokens carry no spaces
      if (c > topCount || (c == topCount && cpCompare(g, topGram) > 0)) {
        topCount = c; topGram = g; topCov = c * occChars
      }
      if (c > 1) dupCov += c.toLong * occChars
    }
    (topCov, dupCov, ng)
  }

  private[text] def kernel(text: String): RepStats = {
    // ---- line stats
    val lines = text.split("\n", -1)
    val lineCount = new java.util.HashMap[String, Int]()
    var nLines = 0
    var lineChars = 0L
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (l.nonEmpty) {
        nLines += 1
        lineChars += cp(l)
        lineCount.merge(l, 1, Integer.sum)
      }
      i += 1
    }
    var dupLines = 0
    var dupLineChars = 0L
    val it = lineCount.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > 1) {
        dupLines += e.getValue - 1
        dupLineChars += (e.getValue - 1).toLong * cp(e.getKey)
      }
    }
    // ---- token n-gram stats
    val trimmed = TextHash.sparkTrim(text)
    val toks: Array[String] =
      if (trimmed.isEmpty) Array.empty else trimmed.split("\\s+", -1)
    var tokChars = 0L
    i = 0
    while (i < toks.length) { tokChars += cp(toks(i)); i += 1 }
    val (top2, _, n2) = gramStats(toks, 2)
    val (_, dup5, n5) = gramStats(toks, 5)
    RepStats(
      nLines,
      if (nLines == 0) None else Some(dupLines.toDouble / nLines),
      if (lineChars == 0) None else Some(dupLineChars.toDouble / lineChars),
      if (n2 <= 0 || tokChars == 0) None else Some(top2.toDouble / tokChars),
      if (n5 <= 0 || tokChars == 0) None else Some(dup5.toDouble / tokChars))
  }

  /** One struct column (n_lines, dup_line_frac, dup_line_char_frac,
    * top_2gram_char_frac, dup_5gram_char_frac); null text → null struct.
    * Deterministic UDF — subexpression elimination keeps field views of
    * one call to a single kernel pass per row. */
  def statsCol(text: Column): Column =
    udf((t: String) => if (t == null) null else kernel(t)).apply(text)

  /** Boolean keep-decision for the Gopher repetition filter as ONE UDF
    * call: a Filter predicate referencing several fields of [[statsCol]]
    * would re-run the kernel per field after predicate pushdown inlines
    * the alias (FilterExec does not share subexpressions the way the
    * Project path does). Null text and null fractions (too-short docs)
    * pass, mirroring the coalesce(…, 0.0) ≤ threshold semantics. */
  def keepCol(text: Column, maxDupLineFrac: Double, maxTop2GramFrac: Double,
              maxDup5GramFrac: Double): Column =
    udf { (t: String) =>
      if (t == null) true
      else {
        val s = kernel(t)
        s.dup_line_frac.getOrElse(0.0) <= maxDupLineFrac &&
        s.top_2gram_char_frac.getOrElse(0.0) <= maxTop2GramFrac &&
        s.dup_5gram_char_frac.getOrElse(0.0) <= maxDup5GramFrac
      }
    }.apply(text)
}
