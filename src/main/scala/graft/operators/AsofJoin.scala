package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left row picks the latest right row with
  * `rightTime <= leftTime` within the same key group (the time-series
  * "most recent observation" join Spark has no native operator for —
  * pandas `merge_asof`, DuckDB `ASOF JOIN`).
  *
  * Implementation is the union + forward-fill rewrite, not a join:
  * both sides are tagged and unioned, then one window per key group
  * ordered by (time, side) forward-fills the latest right payload onto
  * every left row (`last(_, ignoreNulls)` over an unbounded-preceding
  * frame). Ties (`rightTime == leftTime`) match, like DuckDB's
  * `l.t >= r.t`.
  *
  * Scale shape: ONE shuffle on the key columns + one within-partition
  * sort — the same cost envelope as a sort-merge join, with no
  * per-key driver loop, no broadcast requirement on either side, and no
  * all-pairs range blowup (the naive `l.t >= r.t` non-equi join Spark
  * would otherwise plan explodes to |L|·|R| per key before aggregation).
  * Skewed keys fall under AQE's skew handling like any other exchange.
  */
object AsofJoin {

  /** @param keys      equality key columns (present on both sides)
    * @param leftTime  left ordering column (numeric, date, or timestamp)
    * @param rightTime right ordering column of the same comparable type
    * @param payload   right columns carried onto matches; names must not
    *                  collide with left columns
    * @param inner     true drops unmatched left rows (DuckDB ASOF JOIN);
    *                  false keeps them with null payload (pandas
    *                  merge_asof)
    * @param direction "backward" (latest right with rt <= lt, default) or
    *                  "forward" (earliest right with rt >= lt) — the same
    *                  contract as the native twin
    *                  [[org.apache.spark.sql.graft.AsofJoinNative]]
    * @param tolerance max accepted |rt − lt| in the time column's RAW
    *                  internal unit (days for DATE, microseconds for
    *                  TIMESTAMP, the value itself for integral columns);
    *                  a match beyond it demotes to null payload (then
    *                  drops in inner mode) — pandas merge_asof tolerance
    * Output: every left column, then `payload`, then `asof_<rightTime>`
    * (the matched right time — null on unmatched rows in outer mode). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, payload: Seq[String],
               inner: Boolean = true, direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equality key")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(tolerance.forall(_ >= 0), s"tolerance must be >= 0, got $tolerance")
    val forward = direction == "forward"
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} collide with left columns")
    // Reserved struct field for the match time: a payload column literally
    // named like it would produce duplicate struct fields, and getField
    // would silently return the match time instead of the payload.
    require(!payload.contains("__asof_t"),
      "payload column name __asof_t is reserved for the match-time field")
    require(!leftCols.contains(s"asof_$rightTime"),
      s"left column asof_$rightTime collides with the output match-time column")

    val rv = struct(col(rightTime).as("__asof_t") +: payload.map(col): _*)
    val r = right.select(
      keys.map(col) :+ col(rightTime).as("__t") :+ rv.as("__rv") :+
        lit(0).as("__side") :+ lit(null).cast(structType(left)).as("__lrow"): _*)
    val l = left.select(
      keys.map(col) :+ col(leftTime).as("__t") :+
        lit(null).cast(r.schema("__rv").dataType).as("__rv") :+
        lit(1).as("__side") :+ struct(leftCols.map(col): _*).as("__lrow"): _*)

    // side 0 < side 1 ⇒ an equal-time right row is visible to the left
    // row; __rv as the final key makes duplicate right timestamps
    // deterministic. Backward scans time ASCENDING with __rv ascending,
    // so the last-seen duplicate is the payload-LARGEST; forward scans
    // time DESCENDING with __rv descending, so the last-seen duplicate is
    // the payload-SMALLEST — both matching the native merge's documented
    // tie endpoints (AsofJoinNative requiredChildOrdering).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(
        (if (forward) Seq(col("__t").desc, col("__side").asc, col("__rv").desc)
         else Seq(col("__t").asc, col("__side").asc, col("__rv").asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = r.unionByName(l)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // tolerance is a per-row accept test on the already-unique candidate,
    // exactly as in the native merge: gap in the RAW internal unit
    val tolApplied = tolerance match {
      case None => filled
      case Some(t) =>
        val mt = col("__m").getField("__asof_t")
        val gap = if (forward) rawGap(mt, col("__t"), left, leftTime)
                  else rawGap(col("__t"), mt, left, leftTime)
        filled.withColumn("__m", when(gap <= t, col("__m")))
    }
    val matched = if (inner) tolApplied.filter(col("__m").isNotNull) else tolApplied
    matched.select(
      leftCols.map(c => col("__lrow").getField(c).as(c)) ++
        payload.map(c => col("__m").getField(c).as(c)) :+
        col("__m").getField("__asof_t").as(s"asof_$rightTime"): _*)
  }

  /** Non-negative time gap `a − b` in the RAW internal unit of the time
    * column — days for DATE, microseconds for TIMESTAMP, the value itself
    * for integral columns (the same units the native merge subtracts).
    * Loud guard on anything else, mirroring AsofJoinNative. */
  private def rawGap(a: Column, b: Column, left: DataFrame,
                     leftTime: String): Column = {
    import org.apache.spark.sql.types._
    left.schema(leftTime).dataType match {
      case DateType => datediff(a, b).cast("long")
      case TimestampType => unix_micros(a) - unix_micros(b)
      case TimestampNTZType =>
        // NTZ has no unix_micros; the cast through TimestampType is the
        // identity under the pinned UTC session timezone and the gap is
        // shift-invariant regardless
        unix_micros(a.cast(TimestampType)) - unix_micros(b.cast(TimestampType))
      case ByteType | ShortType | IntegerType | LongType =>
        a.cast("long") - b.cast("long")
      case t => throw new IllegalArgumentException(
        s"tolerance needs an integral-backed time type (date/timestamp/int), got $t")
    }
  }

  private def structType(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)
}
