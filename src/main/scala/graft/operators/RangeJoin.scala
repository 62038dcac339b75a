package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-interval range join: each left row (a point `leftT`) matches
  * every right row whose `[rightStart, rightEnd]` interval contains it,
  * optionally under equality keys — the validity-window join (prices in
  * effect, maintenance windows, session boundaries) Spark has no native
  * operator for.
  *
  * A naive `l.t >= r.start && l.t <= r.end` join has no equality
  * conjunct, so Spark plans BroadcastNestedLoopJoin (or a cartesian
  * product): O(|L|·|R|) comparisons per key group — the plan that dies
  * first at scale. This operator uses the standard BINNING rewrite: pick
  * a bin width `w` on the order of the typical interval length, explode
  * each interval to the bins it touches (`⌊s/w⌋ … ⌊e/w⌋`), map each
  * point to its bin, EQUI-join on (keys, bin), and post-filter the exact
  * containment predicate. Cost: one hash shuffle of each side keyed by
  * (keys, bin) + interval replication of `len/w + 1` rows — both linear,
  * both AQE-skew-handled, fully codegen'd.
  */
object RangeJoin {

  /** @param keys       equality key columns present on both sides (may be
    *                   empty: pure range join — the bin becomes the only
    *                   shuffle key)
    * @param leftT      left point column (numeric, date, or timestamp)
    * @param rightStart inclusive interval start (same comparable type)
    * @param rightEnd   inclusive interval end
    * @param payload    right columns carried onto matches; names must not
    *                   collide with left columns
    * @param binWidth   bin width in the column's native scale (numeric
    *                   units, or SECONDS for date/timestamp) — choose ≈
    *                   the median interval length; an interval costs
    *                   `len/binWidth + 1` replicated rows
    * @param maxBinsPerInterval guard against a degenerate interval
    *                   exploding the build side (fails the job with a
    *                   clear message instead of silently materializing
    *                   millions of rows)
    * Output: every left column, then `payload`. 1:N — a point inside k
    * overlapping intervals yields k rows. */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftT: String, rightStart: String, rightEnd: String,
                payload: Seq[String], binWidth: Double,
                maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(payload.nonEmpty, "rangeJoin needs >= 1 payload column")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} collide with left columns")
    require(!payload.exists(keys.contains),
      s"payload columns ${payload.filter(keys.contains)} duplicate join keys " +
        "(keys are already carried on the output)")
    // reserved internals: a left "__bin" would be silently OVERWRITTEN by
    // withColumn below (wrong data, no error); "__s"/"__e" in ANY role
    // (left, payload, or key) would make the interval aliases or the
    // post-join containment filter ambiguous
    val reserved = Seq("__bin", "__s", "__e")
    val reservedHits = (leftCols ++ payload ++ keys).filter(reserved.contains).distinct
    require(reservedHits.isEmpty,
      s"columns $reservedHits collide with rangeJoin's reserved internal " +
        s"names ${reserved.mkString("/")}")

    // date/timestamp bin via epoch seconds; plain numerics bin directly —
    // routing numerics through a timestamp cast would truncate to µs and
    // SATURATE at Long.MaxValue µs (~9.2e12), collapsing larger domains
    // (e.g. epoch-nanos) into one bin = the quadratic join this operator
    // exists to avoid
    def toNum(df: DataFrame, name: String): Column = df.schema(name).dataType match {
      case org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        col(name).cast("timestamp").cast("double")
      case _ => col(name).cast("double")
    }
    def binOf(df: DataFrame, name: String): Column =
      floor(toNum(df, name) / binWidth).cast("long")

    val nBins = binOf(right, rightEnd) - binOf(right, rightStart) + 1
    val binsGuarded = when(nBins > maxBinsPerInterval,
      raise_error(concat(lit(s"rangeJoin: interval spans more than " +
        s"$maxBinsPerInterval bins of width $binWidth at "), col(rightStart).cast("string"))))
      .otherwise(nBins)
    val r = right
      // inverted intervals (end < start) match nothing under BETWEEN
      // semantics — drop them BEFORE the explode: a negative span would
      // both bypass the bin guard and make sequence() count DOWN
      .filter(col(rightEnd) >= col(rightStart))
      .select(keys.map(col) ++ payload.map(col) :+
        col(rightStart).as("__s") :+ col(rightEnd).as("__e") :+
        explode(sequence(binOf(right, rightStart),
          binOf(right, rightStart) + binsGuarded.cast("long") - 1)).as("__bin"): _*)
    val l = left.withColumn("__bin", binOf(left, leftT))
    l.join(r, keys :+ "__bin")
      .filter(col(leftT) >= col("__s") && col(leftT) <= col("__e"))
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }

  /** Date/numeric convenience: binWidth given in DAYS for date columns. */
  def rangeJoinDays(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftT: String, rightStart: String, rightEnd: String,
                    payload: Seq[String], binDays: Int): DataFrame =
    rangeJoin(left, right, keys, leftT, rightStart, rightEnd, payload,
      binDays.toDouble * 86400.0)

  /** INTERVAL-overlap join: each left interval `[leftStart, leftEnd]`
    * matches every right interval `[rightStart, rightEnd]` it intersects
    * (inclusive ends), optionally under equality keys — the
    * session-overlap / validity-window-intersection generalization of
    * [[rangeJoin]]'s point probe (and, like it, a shape Spark would
    * otherwise plan as a nested-loop product).
    *
    * Both sides explode to the bins they touch and equi-join on
    * (keys, bin); a pair sharing k bins would surface k times, so the
    * join keeps each pair ONLY in the FIRST bin both touch
    * (`bin == max(⌊ls/w⌋, ⌊rs/w⌋)`) — the standard dedup-free trick: a
    * predicate per row instead of a corpus-wide DISTINCT shuffle. The
    * exact overlap test (`ls ≤ re ∧ rs ≤ le`) post-filters bin-level
    * false positives. Cost: linear replication `len/w + 1` on BOTH
    * sides (the point side of rangeJoin never replicates — prefer it
    * when one side is points).
    *
    * Output: every left column, then `payload` from the right. 1:N. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                          leftStart: String, leftEnd: String,
                          rightStart: String, rightEnd: String,
                          payload: Seq[String], binWidth: Double,
                          maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(payload.nonEmpty, "intervalOverlapJoin needs >= 1 payload column")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} collide with left columns")
    require(!payload.exists(keys.contains),
      s"payload columns ${payload.filter(keys.contains)} duplicate join keys")
    val reserved = Seq("__bin", "__s", "__e", "__lb", "__rb")
    val reservedHits = (leftCols ++ payload ++ keys).filter(reserved.contains).distinct
    require(reservedHits.isEmpty,
      s"columns $reservedHits collide with reserved internal names")

    def toNum(df: DataFrame, name: String): Column = df.schema(name).dataType match {
      case org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        col(name).cast("timestamp").cast("double")
      case _ => col(name).cast("double")
    }
    def binOf(df: DataFrame, name: String): Column =
      floor(toNum(df, name) / binWidth).cast("long")

    def explodeSide(df: DataFrame, start: String, end: String,
                    keep: Seq[Column], startBinAs: String): DataFrame = {
      val nBins = binOf(df, end) - binOf(df, start) + 1
      val guarded = when(nBins > maxBinsPerInterval,
        raise_error(concat(lit(s"intervalOverlapJoin: interval spans more than " +
          s"$maxBinsPerInterval bins of width $binWidth at "), col(start).cast("string"))))
        .otherwise(nBins)
      df.filter(col(end) >= col(start))
        .select(keep :+ binOf(df, start).as(startBinAs) :+
          explode(sequence(binOf(df, start),
            binOf(df, start) + guarded.cast("long") - 1)).as("__bin"): _*)
    }
    val l = explodeSide(left, leftStart, leftEnd, leftCols.map(col), "__lb")
    val r = explodeSide(right, rightStart, rightEnd,
      keys.map(col) ++ payload.map(col) :+
        col(rightStart).as("__s") :+ col(rightEnd).as("__e"), "__rb")
    l.join(r, keys :+ "__bin")
      .filter(col("__bin") === greatest(col("__lb"), col("__rb")) &&
        col(leftStart) <= col("__e") && col("__s") <= col(leftEnd))
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }

  /** Per-key interval-union coverage — total length and island count of
    * the UNION of (possibly overlapping) intervals: "how long was each
    * service actually up", "net user active time from overlapping
    * sessions". Summing raw lengths double-counts overlap; this merges
    * first, with the gaps-and-islands trick the dup-span excision stage
    * already uses: ordered by start, an interval opens a NEW island iff
    * its start exceeds the running max of prior ends; the island id is
    * the running count of such openings, and each island contributes
    * `max(end) − min(start)`.
    *
    * Plan shape: two window passes stacked on ONE (keys, start, end)
    * sort + the island aggregate reusing the same hash partitioning —
    * one shuffle end to end (the q110 sessionize shape). Touching
    * intervals (`next.start == prev.end`) merge; change the strictness
    * to `>=` if touching should split. Intervals must be integral
    * (epoch micros/days — cast upstream) and well-formed (`end ≥
    * start`); malformed rows are dropped, not repaired.
    *
    * Output per key: `n_intervals`, `n_islands`, `covered` (Σ island
    * lengths, exact long), `span` (max end − min start). */
  def intervalUnionLength(df: DataFrame, keyCols: Seq[String],
                          startCol: String, endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "intervalUnionLength needs at least one key column")
    val s = col(startCol).cast("long")
    val e = col(endCol).cast("long")
    val part = Window.partitionBy(keyCols.map(col): _*)
    val ord = part.orderBy(s, e)
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(s.isNotNull && e.isNotNull && e >= s)
      .withColumn("__new", when(max(e).over(prev).isNull || s > max(e).over(prev), 1L)
        .otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(run))
      .groupBy(keyCols.map(col) :+ col("__isl"): _*)
      .agg(count(lit(1)).as("__n"), min(s).as("__s"), max(e).as("__e"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__e") - col("__s")).as("covered"),
        (max(col("__e")) - min(col("__s"))).as("span"))
  }
}
