package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Option(1L), Option("b"), Option(2.5)),
    (Option(2L), Option("a"), None),
    (Option(2L), None, Option(10.0)),
    (None, Option("a"), Option(2.5))
  ).toDF("id", "s", "x")

  test("profile: one row per column with exact counts and string ranges") {
    val out = Profile.profile(df, Seq("id", "s", "x"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(out.toSeq == Seq(
      ("id", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b"),
      ("x", 4L, 1L, 2L, "10.0", "2.5"))) // STRING order: "10.0" < "2.5"
  }

  test("profile: single scan (no union of per-column jobs) and loud guards") {
    val p = Profile.profile(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Union"), s"profile must not union per-column scans:\n$p")
    val e = intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("id", "nope")) }
    assert(e.getMessage.contains("nope"))
    intercept[IllegalArgumentException] { Profile.profile(df, Nil) }
  }
}
