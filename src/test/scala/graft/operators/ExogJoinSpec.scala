package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExogJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val careerMonthly = Seq(
    ("mech", "2020-01-15", 10.0), ("mech", "2020-02-15", 11.0),
    ("swe", "2020-01-15", 20.0))
    .toDF("career", "date", "emp").withColumn("date", to_date(col("date")))

  private lazy val exog = Seq(
    ("2020-01-31", Some(0.5), Some(0.4)), ("2020-03-31", Some(0.7), None))
    .toDF("month", "ai_share_monthly", "ai_share_smoothed")
    .withColumn("month", to_date(col("month")))

  test("alignMonthly: month-snapped left join with prefix rename + zero-fill") {
    val out = ExogJoin.alignMonthly(careerMonthly, exog, "date", "month",
      prefix = "gdelt_", fillZero = Seq("ai_share_smoothed"))
      .orderBy("career", "date").collect()
    assert(out.head.schema.fieldNames.contains("gdelt_ai_share_monthly"))
    // Jan rows matched (different day-of-month, same month)
    assert(out(0).getAs[Double]("gdelt_ai_share_monthly") === 0.5)
    // Feb has no exog: monthly stays null, smoothed zero-filled
    assert(out(1).get(out(1).fieldIndex("gdelt_ai_share_monthly")) == null)
    assert(out(1).getAs[Double]("gdelt_ai_share_smoothed") === 0.0)
  }

  test("exportLong: stacks measures into (key, date, measure, value)") {
    val wide = Seq(("mech", "2020-01-01", 10.0, 25.5))
      .toDF("career", "date", "employment", "earnings")
    val out = ExogJoin.exportLong(wide, Seq("career"), "date",
      Seq("employment", "earnings")).orderBy("measure").collect()
    assert(out.map(_.getAs[String]("measure")).toSeq === Seq("earnings", "employment"))
    assert(out.map(_.getAs[Double]("value")).toSeq === Seq(25.5, 10.0))
  }

  test("exportWide: pivots one measure to per-key columns") {
    val long = Seq(
      ("mech", "2020-01-01", "emp", 10.0), ("swe", "2020-01-01", "emp", 20.0),
      ("mech", "2020-01-01", "earn", 99.0))
      .toDF("career", "date", "measure", "value")
    val out = ExogJoin.exportWide(long, "career", "date", "measure", "value", "emp")
      .collect().head
    assert(out.getAs[Double]("mech") === 10.0)
    assert(out.getAs[Double]("swe") === 20.0)
  }
}
