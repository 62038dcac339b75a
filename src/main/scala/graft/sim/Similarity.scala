package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Builder-brief extension operator.
  *
  * Two paths:
  *   - [[bruteForceTopK]] — exact cosine top-k; the correctness baseline.
  *     Query side must be small (it is broadcast); corpus side streams.
  *   - [[lshTopK]] — sign-random-projection LSH: bucket by the sign pattern
  *     of `nBits` fixed pseudo-random hyperplanes, compare only within
  *     buckets. At 100 TB the bucket join replaces the all-pairs cross
  *     product; recall is tuned by `nBits`/`nTables`.
  *
  * Hyperplanes are derived from the same counter-based deterministic
  * randoms as [[graft.operators.MonteCarlo]] — reproducible, no driver RNG.
  */
object Similarity {

  /** Exact cosine top-k of `corpus` for every row of `queries`.
    * Output: (query_id, neighbor_id, cos_sim, rank). Cosine is rounded to
    * `roundTo` decimals BEFORE ranking so ranking is stable across
    * float-summation orders; ties break on neighbor id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int,
                     roundTo: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Cols.cosine(col("__qv"), col("__cv")), roundTo).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Sign bit of ⟨v, h_b⟩ for pseudo-random hyperplane b (components are
    * deterministic ±1 patterns from the portable hash). */
  private def srpBit(vec: Column, dim: Int, bit: Int, table: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), lit(dim - 1)), (x, i) => {
        val h = Cols.affineHash(
          Cols.hash32(concat_ws("_", lit(table), lit(bit), i)), 327673, 12289)
        when(h % 2 === 0, x.cast("double")).otherwise(-x.cast("double"))
      }),
      lit(0.0), (acc, v) => acc + v)
    when(proj >= 0, lit(1L << bit)).otherwise(lit(0L))
  }

  /** LSH bucket key for one hash table: packed sign pattern of `nBits`
    * random hyperplanes. */
  def srpKey(vec: Column, dim: Int, nBits: Int, table: Int = 0): Column =
    (0 until nBits).map(b => srpBit(vec, dim, b, table)).reduce(_ + _)

  /** Bucketed ANN top-k: candidates share an SRP bucket in at least one of
    * `nTables` tables; exact cosine re-rank within candidates. */
  def lshTopK(vectors: DataFrame, idCol: String, vecCol: String, dim: Int,
              k: Int, nBits: Int = 8, nTables: Int = 2): DataFrame = {
    val keyed = vectors.select(
      col(idCol).as("id"), col(vecCol).as("__v"),
      explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"), srpKey(col(vecCol), dim, nBits, t).as("key"))): _*)).as("bk"))
    val cands = keyed.as("a").join(keyed.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("neighbor_id"),
        col("a.__v").as("__qv"), col("b.__v").as("__cv"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cands.select(col("query_id"), col("neighbor_id"),
      round(Cols.cosine(col("__qv"), col("__cv")), 4).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
