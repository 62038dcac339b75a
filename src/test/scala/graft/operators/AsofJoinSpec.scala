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

  test("forward as-of picks the earliest right row >= left time") {
    val out = AsofJoin.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt", Seq("v"),
        inner = false, direction = "forward")
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    // (a,2)->rt=3, (a,5)->rt=10, (a,10)->rt=10 (tie), (b,7)->rt=9
    assert(out.toSeq == Seq(("a", 2L, 30.0), ("a", 5L, 100.0),
      ("a", 10L, 100.0), ("b", 7L, 9.0)))
  }

  test("forward duplicate right timestamps resolve to the SMALLEST payload") {
    val r2 = Seq(("a", 7L, 2.0), ("a", 7L, 1.0)).toDF("k", "rt", "v")
    val out = AsofJoin.asofJoin(Seq(("a", 5L)).toDF("k", "t"), r2,
        Seq("k"), "t", "rt", Seq("v"), direction = "forward")
      .collect()
    assert(out.head.getDouble(2) == 1.0)
  }

  test("tolerance demotes too-distant matches in both directions") {
    val bw = AsofJoin.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt", Seq("v"),
        inner = false, tolerance = Some(1L))
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), !r.isNullAt(3)))
    // backward gaps: (a,2) none, (a,5)->3 gap 2 > 1 demoted, (a,10)->10 gap 0 ok
    assert(bw.toSeq == Seq(("a", 2L, false), ("a", 5L, false),
      ("a", 10L, true), ("b", 7L, false)))
    val fw = AsofJoin.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt", Seq("v"),
        inner = false, direction = "forward", tolerance = Some(2L))
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), !r.isNullAt(3)))
    // forward gaps: (a,2)->3 gap 1 ok, (a,5)->10 gap 5 demoted, (a,10) gap 0 ok,
    // (b,7)->9 gap 2 ok
    assert(fw.toSeq == Seq(("a", 2L, true), ("a", 5L, false),
      ("a", 10L, true), ("b", 7L, true)))
  }

  test("rewrite matches the native twin with tolerance on both directions") {
    import org.apache.spark.sql.graft.AsofJoinNative
    val l = leftDf
    val r = rightDf
    for (dir <- Seq("backward", "forward"); tol <- Seq(None, Some(1L), Some(3L))) {
      val rewrite = AsofJoin.asofJoin(l, r, Seq("k"), "t", "rt", Seq("v"),
          inner = false, direction = dir, tolerance = tol)
        .select("k", "t", "tag", "v")
        .orderBy("k", "t").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getString(2),
          if (x.isNullAt(3)) null else x.getDouble(3))).toSeq
      val native = AsofJoinNative.join(l, r, Seq("k"), "t", "rt", Seq("v"),
          direction = dir, tolerance = tol)
        .select("k", "t", "tag", "v")
        .orderBy("k", "t").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getString(2),
          if (x.isNullAt(3)) null else x.getDouble(3))).toSeq
      assert(rewrite == native, s"direction=$dir tolerance=$tol")
    }
  }
}
