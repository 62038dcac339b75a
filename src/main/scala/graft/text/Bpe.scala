package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — tokenizer
  * vocabulary induction over the corpus, the step upstream of every
  * token-count estimate a training pipeline makes.
  *
  * Work split: Spark does the one thing that is corpus-sized — the single
  * pass that aggregates word frequencies — and the merge learning runs
  * in-memory on the driver over that collected vocab. The vocab is
  * Zipf-bounded (~1e5–1e7 distinct words at ANY corpus size, a few
  * hundred MB worst case), so it fits one JVM the same way a broadcast
  * join's build side does; distributed merge rounds would pay a
  * driver-synchronized job per merge (~100k+ jobs for a 32k–50k-merge
  * production vocab) to iterate state that fits in memory. The learner
  * keeps incremental pair statistics (an inverted pair→words index +
  * an ordered argmax set), so each merge costs the total length of the
  * words it touches, not a full vocab recount — 50k merges run in
  * seconds. Encoding ([[encodeCol]]) stays distributed: that side IS
  * corpus-sized.
  *
  * Convention: within-word character symbols, no end-of-word marker;
  * count ties break to the lexicographically smallest (left, right)
  * pair, so the merge table is deterministic.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** One greedy left-to-right merge application (the standard BPE step). */
  private[text] def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Split a word into single-character symbols (code points, so a
    * surrogate pair is one symbol, matching the code-point discipline of
    * the rest of the text stack). */
  private[text] def charSyms(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Learn `numMerges` merges from the corpus. Stops early when no pair
    * reaches `minPairCount`. One distributed corpus pass (word counts),
    * then in-memory learning over the collected Zipf-bounded vocab. */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    // the single corpus pass: word frequencies, COLLECTED — the vocab is
    // the model state here, and like a broadcast build side it must fit
    // one JVM (see the object doc for why this beats distributed rounds)
    val words = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(explode(Cols.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .collect()
    learnMergesLocal(words, numMerges, minPairCount)
  }

  /** In-memory BPE merge learning over a (word, count) vocab.
    *
    * Incremental statistics, the standard learner shape: a pair→count
    * map mirrored into an ordered set for O(log n) argmax, plus a
    * pair→word-indexes inverted index so a merge re-counts only the
    * words that actually contain the merged pair. Chosen counts are
    * non-increasing (a merge can only create pairs at its own
    * occurrence sites), so nothing ever needs re-sorting wholesale. */
  private[text] def learnMergesLocal(words: Array[(String, Long)], numMerges: Int,
                                     minPairCount: Long): Seq[Merge] = {
    import scala.collection.mutable
    val syms = words.map { case (w, _) => charSyms(w) }
    val cnts = words.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    // argmax order: count DESC, then lexicographically smallest (l, r)
    val order = mutable.TreeSet.empty[(Long, String, String)](
      Ordering.by { case (n, l, r) => (-n, l, r) })

    def pairsOf(s: Array[String]): Iterator[(String, String)] =
      (0 until s.length - 1).iterator.map(i => (s(i), s(i + 1)))

    def bump(p: (String, String), delta: Long): Unit = {
      val old = pairCount.getOrElse(p, 0L)
      if (old != 0L) order.remove((old, p._1, p._2))
      val now = old + delta
      if (now > 0L) { pairCount(p) = now; order.add((now, p._1, p._2)) }
      else pairCount.remove(p)
    }

    var wi = 0
    while (wi < syms.length) {
      pairsOf(syms(wi)).foreach { p =>
        bump(p, cnts(wi))
        pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wi
      }
      wi += 1
    }

    val merges = mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      if (order.isEmpty || order.head._1 < minPairCount) done = true
      else {
        val (n, l, r) = order.head
        merges += Merge(rank, l, r, n)
        val affected = pairWords.getOrElse((l, r), mutable.BitSet.empty).toArray
        affected.foreach { i =>
          val old = syms(i)
          pairsOf(old).foreach { q =>
            bump(q, -cnts(i))
            pairWords.get(q).foreach(_ -= i)
          }
          val next = applyMerge(old, l, r)
          syms(i) = next
          pairsOf(next).foreach { q =>
            bump(q, cnts(i))
            pairWords.getOrElseUpdate(q, mutable.BitSet.empty) += i
          }
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Fixed-k hash-checked SLICE of [[learnMerges]] (the q235/q276
    * graduation pattern: bound the iteration depth and the oracle can
    * replay it): runs the REAL incremental learner over a
    * run-constrained `[a-z]+` word corpus and emits the first `k`
    * merges as a DataFrame the DuckDB oracle reproduces by unrolling k
    * pair-count→argmax→apply rounds.
    *
    * Why the slice contract makes the replay EXACT:
    * - Corpus: words are `[a-z]+` runs of `lower(text)`, length 2–9,
    *   excluding 5+ single-char runs (a 26-way `a{5}|b{5}|…`
    *   alternation — RE2-safe, no backreferences). ASCII-only symbols
    *   mean byte = code point = collation unit in both engines, so the
    *   learner's (count DESC, lexicographically smallest (l, r))
    *   argmax order is the SQL `ORDER BY cnt DESC, l, r LIMIT 1`.
    * - Merge application: the oracle holds each word as a
    *   `|`-delimited symbol string and applies a merge as TWO nested
    *   literal `replace(s, '|l|r|', '|lr|')` calls. One replace scans
    *   left-to-right over non-overlapping matches continuing AFTER each
    *   replacement — exactly greedy BPE except that a match consumes
    *   the trailing delimiter, hiding an IMMEDIATELY-adjacent next
    *   occurrence; those hidden occurrences are never adjacent to each
    *   other (in a chain `lrlrlr…` the first pass matches alternate
    *   occurrences), so one second pass always finishes the round —
    *   PROVIDED no run of ≥5 identical symbols exists (at 5+ the
    *   even/odd split changes the segmentation: `aaaaaa` greedy is
    *   `aa aa aa` but two passes give `aa a aa a`). The word contract
    *   guarantees that: char runs ≥5 are filtered, and a run of ≥5
    *   multi-char symbols needs ≥10 chars — past the length-9 cap.
    * - Counting: the learner counts every adjacent index pair; with
    *   runs capped under 5 a same-symbol pair run contributes the same
    *   count to both engines' adjacent-pair explosions.
    *
    * k is bounded (the unrolled-SQL contract; tested at k = 3), so the
    * driver-side learner cost is corpus-pass + O(vocab) — unchanged.
    * Output: `(rank, left_sym, right_sym, pair_count)`, one row per
    * merge.
    *
    * `minPairCount` > 1 additionally carries the learner's DATA-DEPENDENT
    * STOP into the slice (the q371 graduation): a round whose best pair
    * count falls below it emits nothing and the schedule ends there —
    * the oracle replays the same guard per unrolled round (chosen counts
    * are non-increasing, so once a round's argmax is sub-threshold every
    * later round's is too, and the empty-round no-op apply preserves
    * that on the SQL side without an explicit carry). This narrows the
    * q92/q94 `no_oracle` residue to rank-beyond-k only: count→argmax→
    * apply (q335), encode (q340), and now the stop protocol are all
    * hash-checked. */
  def mergeSliceDf(docs: DataFrame, textCol: String, k: Int,
                   minPairCount: Long = 1L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val run5 = ('a' to 'z').map(c => c.toString * 5).mkString("|")
    val words = docs
      .filter(col(textCol).isNotNull)
      .select(explode(expr(s"regexp_extract_all(lower(`$textCol`), '[a-z]+', 0)")).as("w"))
      .filter(length(col("w")).between(2, 9) && !col("w").rlike(run5))
    val ms = learnMerges(words, "w", k, minPairCount)
    ms.map(m => (m.rank.toLong, m.left, m.right, m.pairCount))
      .toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** Fixed-k hash-checked ENCODE slice — the q335 graduation extended
    * from learning to ENCODING (narrows q94's `no_oracle` to the
    * unbounded-rank greedy encoder): learns the first `k` merges over
    * the contract word corpus (same machinery as [[mergeSliceDf]]),
    * then encodes each doc's contract words by applying the merges
    * RANK-SEQUENTIALLY, each rank exhausted by the 2-pass
    * boundary-delimited `replace` whose exactness proof lives on
    * [[mergeSliceDf]] (it is per-segmentation, so it applies at every
    * rank: a ≥5-symbol run needs ≥10 chars — past the length-9 cap).
    *
    * Rank-sequential == the standard rank-priority encoder
    * ([[encodeCol]]) iff no merge's OUTPUT symbol equals a LOWER-rank
    * merge's left or right input (the only way an exhausted pair can
    * re-emerge — a merge inserts its output BETWEEN the neighbors, so
    * new adjacency requires symbol equality; self-recreation is
    * impossible since `l`/`r` are nonempty). That precondition is
    * asserted FAIL-LOUD driver-side on the k learned merges, so a
    * pathological merge table raises instead of silently diverging
    * from greedy BPE.
    *
    * The whole encode is EXPRESSION-ONLY (literal `replace` chains —
    * codegen'd, no UDF): per word `s₀ = '|c₁|c₂|…|'`, per rank two
    * nested replaces, `n_subwords = length(s) − length(replace(s,
    * '|', '')) − 1`. Output per doc: `(doc_id, n_words, n_subwords)`
    * over the contract words (docs with none emit nothing — both
    * engines drop them in the same explode).
    *
    * Scale shape: one corpus pass to learn (Zipf-bounded vocab), then
    * a shuffle-free explode→encode→re-group per doc; the merge table
    * rides the plan as literals. */
  def encodeSliceDf(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val run5 = ('a' to 'z').map(c => c.toString * 5).mkString("|")
    val words = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(expr(s"regexp_extract_all(lower(`$textCol`), '[a-z]+', 0)")).as("w"))
      .filter(length(col("w")).between(2, 9) && !col("w").rlike(run5))
    val ms = learnMerges(words, "w", k, minPairCount = 1L).sortBy(_.rank)
    // fail-loud precondition: rank-sequential == rank-priority encode
    ms.zipWithIndex.foreach { case (m, i) =>
      val out = m.left + m.right
      val lower = ms.take(i).flatMap(p => Seq(p.left, p.right))
      require(!lower.contains(out),
        s"encodeSliceDf: merge $i output '$out' equals a lower-rank input " +
          "symbol — rank-sequential replay would diverge from greedy BPE")
    }
    // the per-rank 2-pass replace chain, built textually (symbols are
    // [a-z] only, no quoting hazards); literal replace has the same
    // left-to-right continue-after-replacement semantics in Spark and
    // DuckDB, so the mergeSliceDf exactness proof carries over
    val sExpr = ms.foldLeft("concat('|', concat_ws('|', split(w, '')), '|')") {
      (s, m) =>
        val pat = s"|${m.left}|${m.right}|"
        val rep = s"|${m.left}${m.right}|"
        s"replace(replace($s, '$pat', '$rep'), '$pat', '$rep')"
    }
    words
      .withColumn("__s", expr(sExpr))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("__s")) - length(regexp_replace(col("__s"), "\\|", "")) - 1)
          .as("n_subwords"))
  }

  /** Encode text with a learned merge table: per word, repeatedly apply
    * the lowest-rank applicable merge until none applies (the standard
    * BPE encoder). Returns the sub-word symbol array column. */
  def encodeCol(text: org.apache.spark.sql.Column, merges: Seq[Merge]): org.apache.spark.sql.Column = {
    val ranked = merges.sortBy(_.rank).map(m => (m.left, m.right)).toArray
    udf { (t: String) =>
      if (t == null) null
      else {
        val toks = TextHash.tokenize(t)
        if (toks.length == 1 && toks(0).isEmpty) Array.empty[String]
        else toks.flatMap { w =>
          var syms = charSyms(w)
          var changed = true
          while (changed && syms.length > 1) {
            changed = false
            var mi = 0
            while (!changed && mi < ranked.length) {
              val (l, r) = ranked(mi)
              var i = 0
              while (!changed && i < syms.length - 1) {
                if (syms(i) == l && syms(i + 1) == r) changed = true
                i += 1
              }
              if (changed) syms = applyMerge(syms, l, r)
              mi += 1
            }
          }
          syms
        }
      }
    }.apply(text)
  }
}
