package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The loud cells-per-key fence for the grid-kernel family.
  *
  * Every grid-kernel operator (binnedQuantiles / madOutliers /
  * huberLocation / medianCi / trimmedMean in [[Sketch]]; brownForsythe /
  * kruskalWallis / jonckheereTerpstra / moodMedianTest in [[Metrics]])
  * collects each key's distinct-value grid into ONE array row and runs
  * the rank/test arithmetic in-task. The documented contract is that the
  * CALLER quantizes the value axis (cents → hundred-dollar bins, e4
  * grids, …) so the grid stays small; an UNQUANTIZED value column
  * (nanosecond timestamps, raw doubles cast to long) would instead grow
  * the per-key array toward the executor heap or the 2 GB single-array
  * cap and die SILENTLY at scale.
  *
  * These bounded collects make that contract loud: the aggregation
  * buffer counts cells as it accumulates and throws past
  * [[maxGridCells]] DURING accumulation — before the oversized grid
  * ever materializes — in both the partial (map-side) and merge
  * (reduce-side) phases. Same fail-loud convention as the family's
  * arithmetic fences (`kruskalWallis rank cube exceeds DECIMAL(38,0)`,
  * `jonckheereTerpstra 2J exceeds BIGINT`).
  *
  * The collected order is NOT the input order (partial buffers are
  * prepend-lists, merged tree-wise) — safe for every family kernel,
  * because each one sorts the grid or folds it through a TreeMap before
  * reading; a new kernel built on these MUST keep that
  * order-independence.
  */
object GridFence {

  /** Per-key cell bound, configurable (captured at plan-construction
    * time on the driver). 2²² cells ≈ 64 MB of (value, count) pairs in
    * the agg buffer — far above any quantized registration (the house
    * grids run 10²–10⁵ cells) and far below the heap/2 GB cliff. */
  @volatile var maxGridCells: Int = 1 << 22

  private def fail(site: String, bound: Int): Nothing =
    throw new IllegalStateException(
      s"$site: per-key value grid exceeds $bound cells " +
        "(GridFence.maxGridCells) — quantize the value axis upstream")

  /** Bounded `collect_list(array(v, c))` — the (value, count) pair-grid
    * shape used by the Sketch rank kernels and the Metrics median
    * kernels. */
  private[graft] final class BoundedPairGrid(bound: Int, site: String)
      extends Aggregator[Seq[Long], (Long, List[Seq[Long]]), Seq[Seq[Long]]] {
    def zero: (Long, List[Seq[Long]]) = (0L, Nil)
    def reduce(b: (Long, List[Seq[Long]]), a: Seq[Long]): (Long, List[Seq[Long]]) = {
      if (b._1 >= bound) fail(site, bound)
      (b._1 + 1L, a :: b._2)
    }
    def merge(b1: (Long, List[Seq[Long]]), b2: (Long, List[Seq[Long]]))
        : (Long, List[Seq[Long]]) = {
      if (b1._1 + b2._1 > bound) fail(site, bound)
      (b1._1 + b2._1, b1._2 reverse_::: b2._2)
    }
    def finish(b: (Long, List[Seq[Long]])): Seq[Seq[Long]] = b._2
    def bufferEncoder = ExpressionEncoder[(Long, List[Seq[Long]])]()
    def outputEncoder = ExpressionEncoder[Seq[Seq[Long]]]()
  }

  /** Bounded `collect_list(struct(g, v, c))` — the (group, value, count)
    * cell-grid shape used by kruskalWallis / jtFromCells. Output struct
    * fields are `_1/_2/_3` (tuple encoding). */
  private[graft] final class BoundedCellGrid(bound: Int, site: String)
      extends Aggregator[(String, Long, Long),
                         (Long, List[(String, Long, Long)]),
                         Seq[(String, Long, Long)]] {
    def zero: (Long, List[(String, Long, Long)]) = (0L, Nil)
    def reduce(b: (Long, List[(String, Long, Long)]), a: (String, Long, Long))
        : (Long, List[(String, Long, Long)]) = {
      if (b._1 >= bound) fail(site, bound)
      (b._1 + 1L, a :: b._2)
    }
    def merge(b1: (Long, List[(String, Long, Long)]),
              b2: (Long, List[(String, Long, Long)]))
        : (Long, List[(String, Long, Long)]) = {
      if (b1._1 + b2._1 > bound) fail(site, bound)
      (b1._1 + b2._1, b1._2 reverse_::: b2._2)
    }
    def finish(b: (Long, List[(String, Long, Long)])): Seq[(String, Long, Long)] =
      b._2
    def bufferEncoder = ExpressionEncoder[(Long, List[(String, Long, Long)])]()
    def outputEncoder = ExpressionEncoder[Seq[(String, Long, Long)]]()
  }

  /** The fenced pair-grid collect: drop-in for
    * `collect_list(array(v, c))` at the nine grid-kernel sites.
    * `site` names the operator in the failure message. */
  def collectGrid(cell: Column, site: String): Column =
    udaf(new BoundedPairGrid(maxGridCells, site),
      ExpressionEncoder[Seq[Long]]()).apply(cell)

  /** The fenced cell-grid collect: drop-in for
    * `collect_list(struct(g, v, c))` (fields read back as `_1/_2/_3`). */
  def collectCells(g: Column, v: Column, c: Column, site: String): Column =
    udaf(new BoundedCellGrid(maxGridCells, site),
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong))
      .apply(g, v, c)
}
