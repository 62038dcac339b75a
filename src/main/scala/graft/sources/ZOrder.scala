package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping — the lakehouse layout trick (Delta/Iceberg `OPTIMIZE
  * ZORDER BY`): interleaving the bits of two sort keys gives ONE
  * linear order in which points close in (x, y) stay close on disk, so
  * per-file min/max statistics prune files for predicates on EITHER
  * dimension. A plain `ORDER BY x, y` layout prunes only on the
  * leading column; at 100 TB the difference is reading one file vs
  * every file for a `y = …` probe.
  *
  * The interleave is five mask-and-shift rounds per side (the classic
  * bit-spreading identity) — pure built-in bitwise `Column` ops, fully
  * whole-stage-codegen'd, and byte-for-byte replayable in any engine
  * with `&`/`|`/`<<` (the oracle runs the same five rounds in DuckDB).
  *
  * Write path: `repartitionByRange` on the z-value (range exchange =
  * contiguous z-runs per file) + `sortWithinPartitions` (contiguous
  * z-runs per row group) — the two levels parquet stats prune at. */
object ZOrder {

  /** Bit-spread: 0babcd -> 0b0a0b0c0d (each input bit moves to twice
    * its position). Five mask rounds cover 32-bit inputs. */
  private def spread(c: Column): Column = {
    var v = c.bitwiseAND(lit(0x00000000FFFFFFFFL))
    v = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x3333333333333333L))
    v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton code of two NON-NEGATIVE ints < 2^31 (x on even bits, y on
    * odd — the result stays in a signed 64-bit positive range). Out of
    * range fails loudly: a silently wrapped sign bit would quietly
    * destroy the locality the whole layout exists for. */
  def mortonCol(x: Column, y: Column): Column = {
    val lim = 1L << 31
    def guarded(c: Column, name: String) =
      when(c.isNull || c < 0 || c >= lim, raise_error(
        concat(lit(s"zorder $name out of [0, 2^31): "), c.cast("string"))))
        .otherwise(c.cast("long"))
    spread(guarded(x, "x")).bitwiseOR(shiftleft(spread(guarded(y, "y")), 1))
  }

  /** Write `df` parquet z-clustered on `(xCol, yCol)` into `nFiles`
    * range-partitioned files. The z column is layout-only — dropped
    * before the bytes land. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    nFiles: Int): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    df.withColumn("__z", mortonCol(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (min, max) of a column over a written dataset — the
    * pruning-relevant statistic, for asserting layout quality (how many
    * files a predicate range has to touch). */
  def fileRanges(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
}
