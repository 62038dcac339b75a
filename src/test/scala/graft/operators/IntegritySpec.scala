package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "alpha", "a"), (2L, "beta", "a"), (3L, "gamma", "b"), (4L, "delta", "b"))

  test("tableChecksum is order- and partitioning-independent") {
    val df = base.toDF("id", "text", "src")
    val a = Integrity.tableChecksum(df, Seq("src"), Seq("id", "text"))
      .orderBy("src").collect().map(_.toSeq).toSeq
    val b = Integrity.tableChecksum(
        df.orderBy(desc("id")).repartition(7), Seq("src"), Seq("id", "text"))
      .orderBy("src").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("tableChecksum flips on any single-row mutation, insert, or delete") {
    val df = base.toDF("id", "text", "src")
    def dig(rows: Seq[(Long, String, String)]) =
      Integrity.tableChecksum(rows.toDF("id", "text", "src"), Nil, Seq("id", "text"))
        .collect().head.toSeq
    val orig = dig(base)
    assert(dig(base.updated(1, (2L, "BETA", "a"))) != orig) // mutate
    assert(dig(base :+ ((5L, "eps", "a"))) != orig)         // insert
    assert(dig(base.take(3)) != orig)                       // delete
    // a swap of content BETWEEN rows must also flip (fingerprints move)
    assert(dig(Seq((1L, "beta", "a"), (2L, "alpha", "a"),
      (3L, "gamma", "b"), (4L, "delta", "b"))) != orig)
  }

  test("rowFingerprint: field boundaries and nulls are not ambiguous") {
    val fps = Seq(("ab", "c"), ("a", "bc"), (null, "abc"), ("abc", null))
      .toDF("x", "y")
      .select(Integrity.rowFingerprint(Seq(col("x"), col("y"))).as("fp"))
      .collect().map(_.getLong(0)).toSeq
    assert(fps.distinct.size == 4, s"collision among $fps")
  }
}
