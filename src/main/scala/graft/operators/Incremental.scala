package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keep a per-group statistics table
  * current by merging partial aggregates from new data into a stored
  * snapshot, WITHOUT rescanning history. The 100 TB motivation: a daily
  * delta is a few GB; the union-of-raw recompute rereads the whole fact
  * table, the partial-merge path reads `|snapshot| + |delta|` where the
  * snapshot is group-cardinality-sized.
  *
  * The statistic set `(n, sum, sumsq, min, max)` is chosen to be a
  * COMMUTATIVE MONOID under [[mergePartials]] — each component merges by
  * `sum`/`min`/`max` — so merge order and sharding never matter and the
  * merged table equals the full recompute EXACTLY (the driver oracle for
  * the contract query is the single-pass aggregate over all raw rows).
  * `valueCol` must be integral-valued (ride cents / counts, not floats):
  * exact integer sums are what make "exactly" bit-true. `sumsq` bounds:
  * BIGINT holds Σx² up to ~9.2e18 — at trillion-row scale move the two
  * sums to DECIMAL(38,0); the merge law is unchanged.
  *
  * Derived readouts (mean, variance) are FUNCTIONS of the monoid state,
  * computed at read time — never stored, never merged. */
object Incremental {

  private val statCols = Seq("n", "sum_v", "sumsq_v", "min_v", "max_v")

  /** Aggregate raw rows to the mergeable per-group statistics form:
    * `groupCols…, n, sum_v, sumsq_v, min_v, max_v` (nulls excluded,
    * `valueCol` cast to BIGINT). One shuffle, map-side partials. */
  def partialAgg(df: DataFrame, groupCols: Seq[String],
                 valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "partialAgg needs at least one group column")
    val v = col(valueCol).cast("long")
    df.filter(v.isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(v).as("sum_v"),
        sum(v * v).as("sumsq_v"), min(v).as("min_v"), max(v).as("max_v"))
  }

  /** Merge any number of partial-aggregate tables (snapshots, shard
    * outputs, daily deltas) back to one row per group. Associative and
    * commutative: `mergePartials(partialAgg(A), partialAgg(B)) ==
    * partialAgg(A ∪ B)` bit-for-bit. The shuffle is over
    * group-cardinality rows, not raw rows. */
  def mergePartials(parts: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "mergePartials needs at least one input")
    parts.foreach(p => statCols.foreach(c => require(p.columns.contains(c),
      s"mergePartials input is missing stat column `$c`")))
    parts.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"),
        sum(col("sumsq_v")).as("sumsq_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
  }

  /** Read-time derived columns over the monoid state: `mean_e6` is the
    * exact integer `sum·10⁶ div n`; `var_e6` is the exact integer
    * `(n·sumsq − sum²)·10⁶ div n²` (population variance, floored) —
    * both pure integer arithmetic, so they hash-match a SQL replay.
    * Caller guarantees `n·sumsq·10⁶` fits in BIGINT (see class doc). */
  def withDerived(stats: DataFrame): DataFrame = stats
    .withColumn("mean_e6", expr("sum_v * 1000000L div n"))
    .withColumn("var_e6",
      expr("(n * sumsq_v - sum_v * sum_v) * 1000000L div (n * n)"))

  /** Incremental JOIN maintenance for insert-only tables — the
    * delta-join identity `Δ(A ⋈ B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB`: given the
    * stored pre-delta sides and the two insert batches, this returns
    * exactly the NEW join rows, so `J₀ ∪ joinDelta(...) = (A₀∪ΔA) ⋈
    * (B₀∪ΔB)` row-for-row (multiset semantics — duplicates multiply
    * through the identity like through the join itself; the spec
    * asserts the equality on duplicate-carrying inputs).
    *
    * The 100 TB point: the maintained join never recomputes `A₀⋈B₀`.
    * Daily deltas are small, so BOTH delta-sided terms broadcast the
    * delta and stream the stored side past it; the ΔA⋈ΔB corner is
    * delta×delta-sized. Cost is `|Δ|`-proportional where the recompute
    * is `|A|+|B|`-proportional. Insert-only is a CONTRACT (the CDC
    * operators handle updates/deletes by key-state folding —
    * [[Cdc.applyChanges]]; mixing the two disciplines silently
    * double-counts). */
  def joinDelta(oldLeft: DataFrame, deltaLeft: DataFrame,
                oldRight: DataFrame, deltaRight: DataFrame,
                keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinDelta needs at least one join key")
    // the DELTA side broadcasts in every term — the stored sides stream
    // past it; inner joins are symmetric and unionByName aligns columns
    oldRight.join(broadcast(deltaLeft), keys)
      .unionByName(oldLeft.join(broadcast(deltaRight), keys))
      .unionByName(deltaLeft.join(broadcast(deltaRight), keys))
  }
}
