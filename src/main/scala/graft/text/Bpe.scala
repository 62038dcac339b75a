package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — tokenizer
  * vocabulary induction over the corpus, the step upstream of every
  * token-count estimate a training pipeline makes.
  *
  * The corpus is read ONCE into a word-frequency table; the merge loop
  * then iterates over that vocab-sized frame (Zipf-truncated: orders of
  * magnitude smaller than the corpus and nearly size-independent), so
  * `numMerges` costs `numMerges` vocab-sized shuffles, not corpus
  * passes. Each round collects exactly one row to the driver (the
  * argmax pair — the model fit, same discipline as IVF's centroids);
  * the evolving symbol table stays distributed, re-rooted on an RDD
  * barrier per round (iterative-lineage discipline, see
  * [[Dedup.connectedComponents]]).
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
    * reaches `minPairCount`. */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the single corpus pass: word frequencies
    val words = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(explode(Cols.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
    // The merge loop iterates over the VOCAB frame, which is Zipf-bounded
    // (~1e5-1e7 words at any corpus size) — at the session's
    // shuffle-partition count every round pays jobs of mostly-empty
    // tasks. Bound the loop's parallelism to the vocab's actual size
    // (~50k words/partition), not the corpus's. One cached count sizes it
    // (the same action that materializes the corpus pass).
    val wordsCached = words.persist(lvl)
    val vocabParts = math.max(1, math.min(
      words.sparkSession.sparkContext.defaultParallelism,
      (wordsCached.count() / 50000L).toInt))
    var vocab: Dataset[(Array[String], Long)] =
      wordsCached.repartition(vocabParts)
        .map { case (w, c) => (charSyms(w), c) }.persist(lvl)
    vocab.count()
    wordsCached.unpersist()

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val best = vocab
        .flatMap { case (syms, c) =>
          (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), c))
        }
        .toDF("l", "r", "c")
        .groupBy("l", "r").agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minPairCount) done = true
      else {
        val (l, r, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, n)
        val nextPlan = vocab.map { case (syms, c) => (applyMerge(syms, l, r), c) }
          .toDF("syms", "cnt")
        // RDD barrier: without it round k's plan re-derives every prior
        // round's map from the base table (iterative-lineage trap)
        val next = spark.createDataFrame(nextPlan.rdd, nextPlan.schema)
          .as[(Array[String], Long)].persist(lvl)
        next.count()
        vocab.unpersist()
        vocab = next
        rank += 1
      }
    }
    vocab.unpersist()
    merges.toSeq
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
