package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf = Seq(
    ("a", 5L, "x"), ("a", 10L, "y"), ("a", 2L, "z"),
    ("b", 7L, "w")
  ).toDF("k", "t", "tag")

  private def rightDf = Seq(
    ("a", 3L, 30.0), ("a", 10L, 100.0),
    ("b", 9L, 9.0) // after every left "b" row
  ).toDF("k", "rt", "v")

  test("inner backward as-of picks the latest right row <= left time") {
    val out = AsofJoin.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("k", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
    // (a,2) has no prior right row -> dropped; (a,10) tie matches rt=10
    assert(out.toSeq == Seq(("a", 5L, 30.0, 3L), ("a", 10L, 100.0, 10L)))
  }

  test("outer mode keeps unmatched left rows with null payload") {
    val out = AsofJoin.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt", Seq("v"),
        inner = false)
      .orderBy("k", "t").collect()
    assert(out.length == 4)
    val unmatched = out.filter(_.isNullAt(3)).map(r => (r.getString(0), r.getLong(1)))
    assert(unmatched.toSeq == Seq(("a", 2L), ("b", 7L)))
  }

  test("left columns and order survive; matched time is exposed") {
    val out = AsofJoin.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt", Seq("v"))
    assert(out.columns.toSeq == Seq("k", "t", "tag", "v", "asof_rt"))
  }

  test("duplicate right timestamps resolve deterministically (max payload struct)") {
    val r2 = Seq(("a", 3L, 1.0), ("a", 3L, 2.0)).toDF("k", "rt", "v")
    val out = AsofJoin.asofJoin(Seq(("a", 5L)).toDF("k", "t"), r2,
        Seq("k"), "t", "rt", Seq("v"))
      .collect()
    assert(out.head.getDouble(2) == 2.0)
  }

  test("payload name collision is rejected") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(leftDf, rightDf.withColumnRenamed("v", "tag"),
        Seq("k"), "t", "rt", Seq("tag"))
    }
  }
}
