package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Sink layer (SURVEY §2.1 S6/S7, §2.3 F7).
  *
  * The reference writes single CSV files per career
  * (`df.to_csv(path, index=False)`); that shape is reproduced for parity
  * but flagged: at 100 TB the only sane sink is partitioned parquet —
  * `coalesce(1)` funnels the whole result through one task and exists here
  * strictly for small, human-facing exports.
  */
object Sinks {

  /** S6: single-file CSV with header, rows globally sorted (the reference
    * sorts before writing; a single ordered file only makes sense for
    * small exports — see class doc). */
  def csvSingleFile(df: DataFrame, path: String, sortCols: Seq[String]): Unit = {
    val sorted = if (sortCols.isEmpty) df else df.orderBy(sortCols.map(col): _*)
    sorted.coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)
  }

  /** S7 at scale: parquet partitioned by key columns — the fan-out shape
    * that replaces per-career files (each key's rows land in its own
    * directory, readable with partition pruning). */
  def parquetPartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** F7: empty-result guard (reference warns and skips the write —
    * load_CES_pandas.py:261-267). Returns true when written. */
  def writeUnlessEmpty(df: DataFrame, write: DataFrame => Unit,
                       onEmpty: String => Unit = msg => System.err.println(msg)): Boolean =
    if (df.isEmpty) { onEmpty("empty result — nothing written"); false }
    else { write(df); true }
}
