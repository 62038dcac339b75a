package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows not dominated on a
  * (maximize, minimize) criteria pair — `a` dominates `b` when
  * `a.max ≥ b.max ∧ a.min ≤ b.min` with at least one strict. The classic
  * use is "best trade-offs": highest-value earliest orders, cheapest
  * fastest suppliers, etc.
  *
  * Distributed shape (the standard two-phase skyline): a LOCAL frontier
  * pass per input partition first — a row dominated within its partition
  * is dominated globally, so the prune is lossless — then the union of
  * local survivors (frontier-sized, not data-sized) collapses to one
  * partition for the exact GLOBAL pass. Neither phase compares all
  * pairs: within a partition, sorting by `max` descending reduces
  * dominance to two window minima —
  *   - `min(minv)` over rows with STRICTLY greater `maxv` (a range frame
  *     on the value, not row offsets, so ties never leak into their own
  *     comparison set): dominated when that min ≤ own `minv`;
  *   - `min(minv)` over the EQUAL-`maxv` group: dominated when < own
  *     `minv` (strictness moves to the comparison because the dominator
  *     ties on `maxv`).
  * Equal-(maxv, minv) duplicates dominate each other in neither
  * direction and all survive — set semantics, no arbitrary keep-one.
  *
  * Exactness contract: both criteria are cast to LONG (quantize money to
  * cents, dates to epoch days upstream) so comparisons are exact and the
  * result is a deterministic SET — output equality with the oracle's
  * NOT-EXISTS definition is row-for-row.
  *
  * Scale caveat (documented, verified in SkylineSpec): the global pass
  * input is Σ per-partition frontier sizes. For anti-correlated criteria
  * the frontier itself can approach n and no skyline algorithm avoids
  * that; for independent or correlated criteria (the common case) local
  * frontiers are ~O(log n) each and the single-partition pass is
  * trivial. */
object Skyline {

  private def frontierPass(df: DataFrame, pid: Column, maxV: Column,
                           minV: Column): DataFrame = {
    val marked = df.withColumn("__pid", pid)
    val strictlyAbove = Window.partitionBy(col("__pid"))
      .orderBy(col("__maxv").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val tiedOnMax = Window.partitionBy(col("__pid"), col("__maxv"))
    marked
      .withColumn("__m1", min(col("__minv")).over(strictlyAbove))
      .withColumn("__m2", min(col("__minv")).over(tiedOnMax))
      .filter((col("__m1").isNull || col("__m1") > col("__minv")) &&
        col("__m2") >= col("__minv"))
      .drop("__pid", "__m1", "__m2")
  }

  /** Frontier rows of `df`, maximizing `maxCol` and minimizing `minCol`
    * (both cast to long internally; the original columns pass through
    * untouched). Null criteria rows are excluded — a null is neither
    * dominated nor dominating. */
  def pareto2d(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    Seq("__maxv", "__minv", "__pid", "__m1", "__m2").foreach(c =>
      require(!df.columns.contains(c), s"pareto2d writes $c — rename the existing column"))
    val typed = df
      .filter(col(maxCol).isNotNull && col(minCol).isNotNull)
      .withColumn("__maxv", col(maxCol).cast("long"))
      .withColumn("__minv", col(minCol).cast("long"))
    val local = frontierPass(typed, spark_partition_id(), col("__maxv"), col("__minv"))
    // survivors are frontier-sized: exact global pass on one partition
    frontierPass(local.coalesce(1), lit(0), col("__maxv"), col("__minv"))
      .drop("__maxv", "__minv")
  }
}
