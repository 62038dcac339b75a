package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CollapseSpec extends SparkSpec {
  import spark.implicits._

  test("weightedMean: basic Σvw/Σw") {
    val df = Seq((10.0, 1.0), (20.0, 3.0)).toDF("v", "w")
    val out = df.agg(Collapse.weightedMean(col("v"), col("w"))).as[Double].collect().head
    assert(approx(out, (10.0 * 1 + 20.0 * 3) / 4))
  }

  test("weightedMean: null value drops its weight from the denominator (pandas NaN·w skipna)") {
    val df = Seq((Some(10.0), Some(1.0)), (None, Some(100.0)), (Some(20.0), Some(1.0)))
      .toDF("v", "w")
    val out = df.agg(Collapse.weightedMean(col("v"), col("w"))).as[Double].collect().head
    assert(approx(out, 15.0)) // the 100-weight row contributes nothing
  }

  test("weightedMean: all-null or zero total weight -> null, not NaN") {
    val allNull = Seq((Option.empty[Double], Some(1.0))).toDF("v", "w")
    assert(allNull.agg(Collapse.weightedMean(col("v"), col("w"))).collect().head.get(0) == null)
    val zeroW = Seq((Some(10.0), Some(0.0))).toDF("v", "w")
    assert(zeroW.agg(Collapse.weightedMean(col("v"), col("w"))).collect().head.get(0) == null)
  }

  test("collapse: CES-shaped golden — per-month sum + employment-weighted mean") {
    // Two industries (A with emp 10, B with emp 30) in month 1; earnings 100/200.
    // employment = 40; wmean earnings = (100*10 + 200*30)/40 = 175.
    val long = Seq(
      ("2020-01-01", "emp", 10.0, "A"),
      ("2020-01-01", "emp", 30.0, "B"),
      ("2020-01-01", "earn", 100.0, "A"),
      ("2020-01-01", "earn", 200.0, "B"),
      ("2020-02-01", "emp", 5.0, "A"),
      ("2020-02-01", "earn", 50.0, "A")
    ).toDF("date", "measure", "value", "ind")
      .withColumn("date", to_date(col("date")))

    val out = Collapse.collapse(long, "date", "measure", "value",
      weightMeasure = "emp", valueMeasure = "earn", weightKey = "ind")
      .orderBy("date").collect().toSeq

    assert(out.size === 2)
    assert(approx(out(0).getAs[Double]("employment_thousands"), 40.0))
    assert(approx(out(0).getAs[Double]("avg_hourly_earnings"), 175.0))
    assert(approx(out(1).getAs[Double]("employment_thousands"), 5.0))
    assert(approx(out(1).getAs[Double]("avg_hourly_earnings"), 50.0))
  }

  test("collapse: earnings row with no matching weight contributes nothing (left-join null weight)") {
    val long = Seq(
      ("2020-01-01", "emp", 10.0, "A"),
      ("2020-01-01", "earn", 100.0, "A"),
      ("2020-01-01", "earn", 999.0, "C") // C has no employment weight
    ).toDF("date", "measure", "value", "ind")
      .withColumn("date", to_date(col("date")))
    val out = Collapse.collapse(long, "date", "measure", "value",
      "emp", "earn", "ind").collect().head
    assert(approx(out.getAs[Double]("avg_hourly_earnings"), 100.0))
  }

  test("groupSum matches manual sum per key") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 4.0)).toDF("k", "v")
    val out = Collapse.groupSum(df, Seq("k"), "v", "s").orderBy("k")
      .as[(String, Double)].collect().toSeq
    assert(out === Seq(("a", 3.0), ("b", 4.0)))
  }
}
