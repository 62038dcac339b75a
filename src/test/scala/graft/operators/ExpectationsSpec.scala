package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def verdicts(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Boolean)] =
    df.collect().map(r => r.getAs[String]("constraint") ->
      ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"),
        r.getAs[Boolean]("passed")))).toMap

  test("row checks count FALSE and NULL as violations") {
    val df = Seq[(java.lang.Long, String)]((1L, "ok"), (2L, "bad"), (null, "ok"))
      .toDF("id", "status")
    val out = Expectations.validate(df, Seq(
      "id_not_null" -> col("id").isNotNull,
      "status_ok" -> (col("status") === "ok"),
      "id_positive" -> (col("id") > 0))) // null id -> null predicate -> violation
    val v = verdicts(out)
    assert(v("id_not_null") == ((3L, 1L, false)))
    assert(v("status_ok") == ((3L, 1L, false)))
    assert(v("id_positive") == ((3L, 1L, false)))
  }

  test("unique key rides the same pass and counts surplus rows") {
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a")).toDF("k1", "k2")
    val v = verdicts(Expectations.validate(df,
      rowChecks = Seq("k1_not_null" -> col("k1").isNotNull),
      uniqueKey = Some(("pk_unique", Seq("k1", "k2")))))
    assert(v("pk_unique") == ((4L, 1L, false))) // 4 rows, 3 distinct keys
    assert(v("k1_not_null")._3)
  }

  test("referential check reports child rows with missing parents") {
    val child = Seq((1, "x"), (2, "y"), (2, "z"), (9, "w")).toDF("fk", "payload")
    val parent = Seq(1, 2, 3).toDF("pk")
    val v = verdicts(Expectations.validate(child,
      rowChecks = Seq("payload_not_null" -> col("payload").isNotNull),
      refChecks = Seq(Expectations.RefCheck("fk_orders", Seq("fk"), parent, Seq("pk")))))
    assert(v("fk_orders") == ((4L, 1L, false)))
  }

  test("all row checks share ONE aggregate over one scan") {
    val df = Seq((1, 2), (3, 4)).toDF("a", "b")
    val plan = Expectations.validate(df, Seq(
      "a_pos" -> (col("a") > 0), "b_pos" -> (col("b") > 0),
      "a_lt_b" -> (col("a") < col("b")))).queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("LocalTableScan")) <= 2, plan)
  }
}
