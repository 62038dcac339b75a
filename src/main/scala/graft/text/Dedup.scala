package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Deduplication operators (builder brief: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard). Hashes are the portable md5-derived family from
  * [[Cols]], so signatures are bit-reproducible across engines and runs.
  *
  * Scale shape: everything is groupBy/join on hash-derived keys — no
  * pairwise O(n²) stage ever touches the full corpus. Candidate pairs come
  * from band buckets (LSH) whose sizes are data-bounded; the exact-verify
  * join runs only on candidates.
  */
object Dedup {

  /** Exact dedup: group identical normalized text, keep the smallest id.
    * One hash-shuffle on a 32-byte digest instead of the full document —
    * the at-scale trick is to shuffle md5(text), never text itself. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    docs
      .select(col(idCol), md5(trim(col(textCol))).as("text_hash"))
      .groupBy("text_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** MinHash signature columns `mh0..mh{k-1}` for a document: min over word
    * `shingleK`-shingles of k independent affine hashes. */
  def minhashSigCols(text: Column, k: Int, shingleK: Int = 3): Seq[Column] = {
    val sh = Cols.shingles(Cols.tokens(text), shingleK)
    val hs = transform(sh, s => Cols.hash32(s))
    (0 until k).map { i =>
      // distinct (a,b) per hash function; a odd, ≤ 2^20 (overflow-safe)
      val a = 2L * (104729L * (i + 1) % 524287L) + 1L
      val b = 94906249L * (i + 1) % 4294967311L
      coalesce(array_min(transform(hs, h => Cols.affineHash(h, a, b))),
        Cols.hash32(trim(text))).as(s"mh$i")
    }
  }

  /** MinHash + LSH near-dup candidate pairs: signatures → band keys
    * (`bands` bands of `k/bands` rows) → self-join per band bucket →
    * distinct candidate pairs with estimated Jaccard = fraction of equal
    * signature components. */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 12, bands: Int = 6, shingleK: Int = 3): DataFrame = {
    val rows = k / bands
    val sigs = docs.select(col(idCol).as("doc_id") +: minhashSigCols(col(textCol), k, shingleK): _*)
    val banded = sigs.select(
      (col("doc_id") +:
        (0 until k).map(i => col(s"mh$i"))) :+
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            concat_ws("_", (b * rows until (b + 1) * rows).map(i => col(s"mh$i")): _*).as("key"))
        }: _*)).as("bk"): _*)
    val a = banded.as("a")
    val bside = banded.as("b")
    val pairs = a.join(bside,
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a") +: col("b.doc_id").as("id_b") +:
        (0 until k).map(i =>
          (col(s"a.mh$i") === col(s"b.mh$i")).cast("int").as(s"eq$i")): _*)
      .distinct()
    pairs.select(col("id_a"), col("id_b"),
      ((0 until k).map(i => col(s"eq$i")).reduce(_ + _).cast("double") / k).as("est_jaccard"))
  }

  /** SimHash signature (`bits`-wide, default 16): per bit, majority vote of
    * token-hash bits. Near-dups have small Hamming distance. */
  def simhash(text: Column, bits: Int = 16): Column = {
    val hs = transform(Cols.tokens(text), t => Cols.hash32(t))
    (0 until bits).map { i =>
      val votes = aggregate(hs, lit(0L),
        (acc, h) => acc + when(shiftright(h, i) % 2 === 1, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Exact token-set Jaccard for candidate pairs within `band`-bounded id
    * distance (banded candidate generation keeps the join linear; at scale
    * the candidates come from [[minhashCandidates]] instead). */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   maxIdGap: Long, threshold: Double): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(Cols.tokens(col(textCol)))).as("tok"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val inter = toks.as("a").join(toks.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("b.doc_id") - col("a.doc_id") <= maxIdGap)
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "id_a", "n_tok" -> "n_a")), Seq("id_a"))
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "id_b", "n_tok" -> "n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
