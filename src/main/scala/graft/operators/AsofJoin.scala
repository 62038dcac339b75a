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
    * Output: every left column, then `payload`, then `asof_<rightTime>`
    * (the matched right time — null on unmatched rows in outer mode). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, payload: Seq[String],
               inner: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equality key")
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
    // deterministic (latest payload in struct order wins)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = r.unionByName(l)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matched = if (inner) filled.filter(col("__m").isNotNull) else filled
    matched.select(
      leftCols.map(c => col("__lrow").getField(c).as(c)) ++
        payload.map(c => col("__m").getField(c).as(c)) :+
        col("__m").getField("__asof_t").as(s"asof_$rightTime"): _*)
  }

  private def structType(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)
}
