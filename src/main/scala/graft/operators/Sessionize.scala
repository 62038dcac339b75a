package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the offline twin of
  * [[graft.streaming.StreamingCollapse.sessionize]]: consecutive events of
  * one key belong to one session until the inter-event gap exceeds
  * `gapMinutes`.
  *
  * Classic two-window rewrite: a lag() marks session STARTS (first event,
  * or gap exceeded), a running sum over the same (partition, order) turns
  * the marks into 1-based session indexes. Both windows share one
  * partitioning and sort, so the whole operator costs a single shuffle +
  * sort per key (the q64 plan contract shape); gaps compare in exact
  * MICROSECONDS (`unix_micros`), no float time math. The ordering takes a
  * tiebreak column because equal timestamps would otherwise make lag()
  * nondeterministic across runs — determinism is the difference between a
  * reproducible corpus and a flaky one. */
object Sessionize {

  /** Adds `session_idx` (1-based per key). */
  def byGap(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
            gapMinutes: Int): DataFrame = {
    require(gapMinutes > 0, s"gapMinutes must be positive, got $gapMinutes")
    require(!df.columns.contains("session_idx"),
      "byGap writes session_idx — rename the existing column")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull || us - prev > gapMinutes * 60L * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session summary: event count, first/last event time (exact
    * micros), and duration. One groupBy after [[byGap]]'s window — the
    * aggregate re-uses the window's hash partitioning on the key. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, gapMinutes: Int): DataFrame = {
    val us = unix_micros(col(tsCol))
    byGap(df, keyCol, tsCol, tieCol, gapMinutes)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(us).as("start_us"),
        max(us).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Top navigation paths — the "how do users actually move" readout
    * stacked on [[byGap]]: each session's first `maxLen` states joined
    * `"a>b>c"`, counted corpus-wide, top `k` by frequency. The truncation
    * cap is load-bearing at scale: an unbounded path column is a
    * session-length string (a crawler session would build a megabyte
    * key); `maxLen` bounds both the rebuild buffer and the shuffle key.
    *
    * Plan shape: the path rebuild reuses byGap's (key) partitioning —
    * rank-within-session rides the SAME sort, the per-session
    * `collect_list` aggregate re-shuffles on (key, session) once, and
    * the path count is matrix-sized. Determinism: states sort by
    * (time, tiebreak) inside the struct list (array_sort on the full
    * struct — time first), and the final top-k orders by
    * (count desc, path). */
  def topPaths(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
               stateCol: String, gapMinutes: Int, maxLen: Int,
               k: Int): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(keyCol), col("session_idx"))
      .orderBy(col(tsCol), col(tieCol))
    byGap(df, keyCol, tsCol, tieCol, gapMinutes)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxLen)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(concat_ws(">",
        transform(
          array_sort(collect_list(struct(col("__rn"), col(stateCol).as("s")))),
          e => e.getField("s"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }
}
