package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-key top-k as a partial-aggregable bounded buffer — the
  * sort-free alternative to the `row_number() over (...) <= k` window.
  *
  * Honest comparison against Spark 4's window path: Catalyst's
  * `InferWindowGroupLimit` already bounds the exchange for rank-limit
  * filters (a partial `WindowGroupLimitExec` keeps ≤ k rows per key per
  * map partition before the shuffle), so shuffle VOLUME is comparable.
  * What the window path still pays at 100 TB is sorting: a full local
  * sort of every input partition feeds the partial group-limit, and a
  * full sort of the shuffled partition feeds WindowExec. This aggregate
  * never sorts the data — each map task folds rows into a ≤ k-entry
  * sorted buffer (O(n·k) worst case, O(n) when most rows miss the
  * cutoff, vs O(n log n) sort), and the reduce side merges k-entry
  * buffers.
  *
  * The trade: ObjectHashAggregate (no whole-stage codegen) and a
  * struct-typed buffer. For small k it wins; when k is a large fraction
  * of the group size, the window form
  * ([[graft.text.Corpus.topKPerStratum]]) is the right plan. Both are
  * offered; q73/q76 pin them to identical output.
  */
object TopK {

  /** (score, id) entry; ordering is score DESC then id ASC — ties are
    * deterministic, matching `ORDER BY score DESC, id` in the window
    * form. */
  private[operators] final case class Entry(score: Double, id: Long)

  private[operators] val desc: Ordering[Entry] =
    Ordering.by((e: Entry) => (-e.score, e.id))

  /** Sorted-insert into a buffer already sorted by [[desc]], capped at k.
    * Buffers are ≤ k elements, so linear insertion beats heap constant
    * factors. */
  private[operators] def insert(buf: List[Entry], e: Entry, k: Int): List[Entry] = {
    if (buf.lengthCompare(k) >= 0 && desc.gteq(e, buf.last)) buf
    else {
      val (lt, ge) = buf.span(b => desc.lt(b, e))
      (lt ::: e :: ge).take(k)
    }
  }

  private[operators] def merge(a: List[Entry], b: List[Entry], k: Int): List[Entry] =
    b.foldLeft(a)((acc, e) => insert(acc, e, k))

  /** Encoder-friendly wrapper: a bare List is not a Product, so the
    * buffer/output ride inside a single-field case class. */
  private[operators] final case class Buf(es: List[Entry])

  private final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Buf, Buf] {
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, in: (Double, Long)): Buf =
      Buf(insert(b.es, Entry(in._1, in._2), k))
    override def merge(a: Buf, b: Buf): Buf = Buf(TopK.merge(a.es, b.es, k))
    override def finish(r: Buf): Buf = r
    override def bufferEncoder: Encoder[Buf] = Encoders.product
    override def outputEncoder: Encoder[Buf] = Encoders.product
  }

  /** Top-k rows per stratum by `scoreCol` (desc, `idCol` asc tiebreak).
    * Output: strata ++ (idCol, scoreCol, rank), rank 1-based — the same
    * shape as the window form, produced with a bounded-state aggregate.
    * The score rides as double and the id as long (the id round-trips
    * exactly; the score column is re-read by joining nothing — it IS the
    * double).
    *
    * Null scores/ids are EXCLUDED up front (the primitive-tuple encoder
    * would otherwise decode them as 0.0/0 and rank garbage); the window
    * form ranks null scores last instead, so the two paths only diverge
    * on groups smaller than k that contain nulls. */
  def perKeyAgg(df: DataFrame, strata: Seq[String], scoreCol: String,
                idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val topk = udaf(new TopKAgg(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    df.filter(col(scoreCol).isNotNull && col(idCol).isNotNull)
      .groupBy(strata.map(col): _*)
      .agg(topk(col(scoreCol).cast("double"), col(idCol).cast("long")).as("__topk"))
      .select(strata.map(col) :+ posexplode(col("__topk.es")).as(Seq("__pos", "__e")): _*)
      .select(strata.map(col) :+
        col("__e.id").as(idCol) :+
        col("__e.score").as(scoreCol) :+
        (col("__pos") + 1).cast("int").as("rank"): _*)
  }
}
