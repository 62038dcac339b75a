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
                   tieCol: String, gapMinutes: Int): DataFrame =
    statsOf(byGap(df, keyCol, tsCol, tieCol, gapMinutes), keyCol, tsCol)

  private def statsOf(sessions: DataFrame, keyCol: String,
                      tsCol: String): DataFrame = {
    val us = unix_micros(col(tsCol))
    sessions
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(us).as("start_us"),
        max(us).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** [[byGap]] with the HOT-KEY DIAL engaged: identical output (the
    * SkewSpec equality law), but the per-key sort parallelizes across
    * time slices — the mitigation the round-8 hot-key probe showed a
    * plain per-key window cannot have (one user owning 10M rows
    * serializes a 10M-row sort into ONE task; AQE skew splitting applies
    * to joins, not windows).
    *
    * Three passes, all slice- or micro-session-bounded:
    * 1. events sessionize INSIDE each (key, `sliceMinutes`) time slice —
    *    the hot key becomes #slices parallel tasks;
    * 2. per-slice micro-sessions (min/max micros) collapse to a per-key
    *    list ORDERS OF MAGNITUDE smaller than the events (bounded by
    *    #sessions + #slices), where one tiny ordered window re-merges
    *    boundary pairs closer than the gap — micro-intervals are
    *    time-disjoint and ordered, so `lag(max_us)` IS the previous
    *    event, and the merge reproduces the event-level rule exactly;
    * 3. the global index joins back on (key, slice, local idx) — a
    *    composite key the hot key cannot congest.
    *
    * Equal timestamps always share a slice (`us div slice`), so the
    * (ts, tie) sort — and therefore every session assignment and index —
    * is bit-identical to [[byGap]]'s. Timestamps must be >= epoch (the
    * slice floor-div contract). `sliceMinutes` trades parallelism
    * against micro-session count; a day is right when gaps are hours. */
  def byGapTimeSliced(df: DataFrame, keyCol: String, tsCol: String,
                      tieCol: String, gapMinutes: Int,
                      sliceMinutes: Int = 1440): DataFrame = {
    require(gapMinutes > 0, s"gapMinutes must be positive, got $gapMinutes")
    require(sliceMinutes > 0, s"sliceMinutes must be positive, got $sliceMinutes")
    require(!df.columns.contains("session_idx"),
      "byGapTimeSliced writes session_idx — rename the existing column")
    val gapUs = gapMinutes * 60L * 1000000L
    val sliceUs = sliceMinutes * 60L * 1000000L
    val withSlice = df
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__slice", expr(s"__us div $sliceUs"))
    val wLoc = Window.partitionBy(col(keyCol), col("__slice"))
      .orderBy(col(tsCol), col(tieCol))
    val prevLoc = lag(col("__us"), 1).over(wLoc)
    val isNewLoc = when(prevLoc.isNull || col("__us") - prevLoc > gapUs, 1L)
      .otherwise(0L)
    val ev = withSlice.withColumn("__lidx",
      sum(isNewLoc).over(wLoc.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
    val micro = ev.groupBy(col(keyCol), col("__slice"), col("__lidx"))
      .agg(min(col("__us")).as("__mn"), max(col("__us")).as("__mx"))
    val wM = Window.partitionBy(col(keyCol))
      .orderBy(col("__slice"), col("__lidx"))
    val prevMx = lag(col("__mx"), 1).over(wM)
    val isNewG = when(prevMx.isNull || col("__mn") - prevMx > gapUs, 1L)
      .otherwise(0L)
    val gidx = micro
      .withColumn("session_idx",
        sum(isNewG).over(wM.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .select(col(keyCol), col("__slice"), col("__lidx"), col("session_idx"))
    ev.join(gidx, Seq(keyCol, "__slice", "__lidx"))
      .drop("__us", "__slice", "__lidx")
  }

  /** [[sessionStats]] over the time-sliced path — same rows, hot-key
    * parallel. */
  def sessionStatsTimeSliced(df: DataFrame, keyCol: String, tsCol: String,
                             tieCol: String, gapMinutes: Int,
                             sliceMinutes: Int = 1440): DataFrame =
    statsOf(byGapTimeSliced(df, keyCol, tsCol, tieCol, gapMinutes, sliceMinutes),
      keyCol, tsCol)

  /** AUTO-routed [[byGap]]: runs the cheap
    * [[graft.operators.Skew.hotKeyStats]] probe (one map-side-combined
    * aggregate) and engages [[byGapTimeSliced]] when the hottest key's
    * rows exceed the even per-slot share — the measured crossover where
    * the plain per-key window's one-task sort loses (SURVEY §8 hot100).
    * Both routes are row-identical (the SkewSpec equality law), so the
    * probe decides only cost, never semantics — zero-config deployment
    * of the q260 dial. */
  def byGapAuto(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
                gapMinutes: Int, sliceMinutes: Int = 1440): DataFrame =
    if (Skew.shouldEngageHotKeyDial(df, Seq(keyCol)))
      byGapTimeSliced(df, keyCol, tsCol, tieCol, gapMinutes, sliceMinutes)
    else byGap(df, keyCol, tsCol, tieCol, gapMinutes)

  /** [[sessionStats]] over the auto-routed path. */
  def sessionStatsAuto(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, gapMinutes: Int,
                       sliceMinutes: Int = 1440): DataFrame =
    statsOf(byGapAuto(df, keyCol, tsCol, tieCol, gapMinutes, sliceMinutes),
      keyCol, tsCol)

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
