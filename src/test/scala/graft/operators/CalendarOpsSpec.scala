package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalendarOpsSpec extends SparkSpec {
  import spark.implicits._

  test("monthGrid: fills gaps per key with null-valued rows (W8)") {
    val df = Seq(("a", "2020-01-01", 1.0), ("a", "2020-04-01", 4.0),
      ("b", "2020-02-01", 2.0))
      .toDF("k", "month", "v").withColumn("month", to_date(col("month")))
    val out = CalendarOps.monthGrid(df, Seq("k"), "month")
      .orderBy("k", "month")
      .select(col("k"), col("month").cast("string"), col("v"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.get(2)))
    assert(out === Seq(
      ("a", "2020-01-01", 1.0), ("a", "2020-02-01", null), ("a", "2020-03-01", null),
      ("a", "2020-04-01", 4.0), ("b", "2020-02-01", 2.0)))
  }

  test("dedupeByMonth: mean / sum / last policies (A5)") {
    val df = Seq(("2020-01-01", 1.0, 1), ("2020-01-01", 3.0, 2), ("2020-02-01", 5.0, 3))
      .toDF("month", "v", "ord").withColumn("month", to_date(col("month")))
    def run(p: CalendarOps.DedupePolicy) =
      CalendarOps.dedupeByMonth(df, Nil, "month", Seq("v"), p)
        .orderBy("month").select("v").collect().toSeq.map(_.getDouble(0))
    assert(run(CalendarOps.MeanPolicy) === Seq(2.0, 5.0))
    assert(run(CalendarOps.SumPolicy) === Seq(4.0, 5.0))
    assert(run(CalendarOps.LastPolicy("ord")) === Seq(3.0, 5.0))
  }

  test("futureMonths: horizon month-starts after each key's last month (F-D4)") {
    val df = Seq(("a", "2020-11-01")).toDF("k", "month")
      .withColumn("month", to_date(col("month")))
    val out = CalendarOps.futureMonths(df, Seq("k"), "month", 3)
      .orderBy("month").select(col("month").cast("string"))
      .collect().toSeq.map(_.getString(0))
    assert(out === Seq("2020-12-01", "2021-01-01", "2021-02-01"))
  }
}
