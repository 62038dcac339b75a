package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  // (key, version, op, payload)
  private def changelog = Seq(
    ("k1", 1L, "I", 10.0), ("k1", 3L, "U", 12.0), ("k1", 2L, "U", 11.0),
    ("k2", 1L, "I", 20.0), ("k2", 2L, "D", 0.0),
    ("k3", 5L, "I", 30.0),
    ("k4", 1L, "I", 40.0), ("k4", 2L, "D", 0.0), ("k4", 3L, "I", 41.0)
  ).toDF("k", "v", "op", "price")

  test("applyChanges keeps the latest surviving version and tombstones deletes") {
    val snap = Cdc.applyChanges(changelog, Seq("k"), "v", "op")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(snap.toSeq == Seq(
      ("k1", 3L, 12.0),   // latest of 3 versions, arrival order scrambled
      ("k3", 5L, 30.0),   // single insert passes through
      ("k4", 3L, 41.0)))  // delete then re-insert: alive again
    // k2's latest event is the delete -> absent entirely
  }

  test("agg form and window form agree, including on a multi-column key") {
    val df = changelog.withColumn("k2", col("k").substr(2, 1))
    val a = Cdc.applyChanges(df, Seq("k", "k2"), "v", "op")
      .orderBy("k").collect().toSeq
    val b = Cdc.applyChangesSorted(df, Seq("k", "k2"), "v", "op")
      .orderBy("k").collect().toSeq
    // same rows; column order may differ (agg form appends non-key cols)
    assert(a.map(_.getValuesMap[Any](Seq("k", "k2", "v", "price"))) ==
      b.map(_.getValuesMap[Any](Seq("k", "k2", "v", "price"))))
  }

  test("version ties resolve deterministically through the tiebreak column") {
    // two updates share version 2; lsn completes the order
    val dup = Seq(
      ("k1", 2L, 7L, "U", 1.0), ("k1", 2L, 9L, "U", 2.0), ("k1", 1L, 1L, "I", 0.0)
    ).toDF("k", "v", "lsn", "op", "price")
    val out = Cdc.applyChanges(dup, Seq("k"), "v", "op", tieBreak = Seq("lsn"))
      .collect().map(r => r.getAs[Double]("price"))
    assert(out.toSeq == Seq(2.0)) // lsn 9 wins the v=2 tie
    val outW = Cdc.applyChangesSorted(dup, Seq("k"), "v", "op", tieBreak = Seq("lsn"))
      .collect().map(r => r.getAs[Double]("price"))
    assert(outW.toSeq == Seq(2.0))
  }

  test("agg form plans partial+final aggregation with no window sort") {
    val p = Cdc.applyChanges(changelog, Seq("k"), "v", "op")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"agg form must not plan a window:\n$p")
    // map-side combine: a partial and a final aggregate bracket the
    // exchange — the reason this form wins at changelog scale
    assert(p.linesIterator.count(l =>
        l.contains("Aggregate") && !l.contains("Exchange")) >= 2,
      s"expected partial+final aggregate pair:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("delete op marker is configurable") {
    val dl = Seq(("k1", 1L, "upsert", 1.0), ("k1", 2L, "del", 0.0))
      .toDF("k", "v", "op", "price")
    assert(Cdc.applyChanges(dl, Seq("k"), "v", "op", deleteOp = "del").count() == 0L)
    assert(Cdc.applyChanges(dl, Seq("k"), "v", "op").count() == 1L) // "D" never fires
  }

  test("scd2 builds validity intervals closed by the next event") {
    val hist = Cdc.scd2(changelog, Seq("k"), "v", "op")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3),
        r.getDouble(4)))
    assert(hist.toSeq == Seq(
      // k1: three versions chain 1->2->3, last one open
      ("k1", 1L, Some(2L), false, 10.0),
      ("k1", 2L, Some(3L), false, 11.0),
      ("k1", 3L, None, true, 12.0),
      // k2: insert closed by the delete, no current row
      ("k2", 1L, Some(2L), false, 20.0),
      // k3: single insert, open
      ("k3", 5L, None, true, 30.0),
      // k4: insert closed by delete, re-insert open
      ("k4", 1L, Some(2L), false, 40.0),
      ("k4", 3L, None, true, 41.0)))
  }

  test("scd2 restricted to is_current equals the snapshot fold") {
    val cur = Cdc.scd2(changelog, Seq("k"), "v", "op")
      .filter(col("is_current"))
      .select(col("k"), col("valid_from").as("v"), col("price"))
      .orderBy("k").collect().toSeq
    val snap = Cdc.applyChanges(changelog, Seq("k"), "v", "op")
      .select("k", "v", "price").orderBy("k").collect().toSeq
    assert(cur == snap)
  }

  test("scd2 version ties resolve through the tiebreak column") {
    val dup = Seq(
      ("k1", 2L, 7L, "U", 1.0), ("k1", 2L, 9L, "U", 2.0), ("k1", 1L, 1L, "I", 0.0)
    ).toDF("k", "v", "lsn", "op", "price")
    val hist = Cdc.scd2(dup, Seq("k"), "v", "op", tieBreak = Seq("lsn"))
      .orderBy("valid_from", "lsn").collect()
      .map(r => (r.getAs[Long]("valid_from"), r.getAs[Double]("price"),
        r.getAs[Boolean]("is_current")))
    // v=2/lsn=7 is superseded by v=2/lsn=9 (valid_to = same version 2)
    assert(hist.toSeq == Seq((1L, 0.0, false), (2L, 1.0, false), (2L, 2.0, true)))
  }

  test("scd2 refuses colliding output column names") {
    val bad = changelog.withColumn("is_current", lit(true))
    val e = intercept[IllegalArgumentException] {
      Cdc.scd2(bad, Seq("k"), "v", "op") }
    assert(e.getMessage.contains("is_current"))
  }

  // ------------------------------------------------------------- merge

  private def snapshot = Seq(
    ("k1", 10.0), ("k2", 20.0), ("k3", 30.0)
  ).toDF("k", "price")

  test("merge updates matched keys, inserts unmatched, deletes, passes the rest") {
    val batch = Seq(
      ("k1", "U", 11.0),  // matched -> update (whole-row replace)
      ("k2", "D", 0.0),   // matched -> delete
      ("k9", "U", 90.0),  // unmatched -> insert
      ("k8", "D", 0.0)    // unmatched delete -> no-op
    ).toDF("k", "op", "price")
    val out = Cdc.merge(snapshot, batch, Seq("k"), "op")
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq == Seq(("k1", 11.0), ("k3", 30.0), ("k9", 90.0)))
  }

  test("merge output schema is exactly the target's") {
    val batch = Seq(("k1", "U", 11.0)).toDF("k", "op", "price")
    val out = Cdc.merge(snapshot, batch, Seq("k"), "op")
    assert(out.columns.toSeq == snapshot.columns.toSeq)
  }

  test("merge refuses a source missing target columns") {
    val batch = Seq(("k1", "U")).toDF("k", "op")
    val e = intercept[IllegalArgumentException] {
      Cdc.merge(snapshot, batch, Seq("k"), "op") }
    assert(e.getMessage.contains("price"))
  }

  test("merge plans a broadcast anti join — the snapshot side never shuffles") {
    val batch = Seq(("k1", "U", 11.0)).toDF("k", "op", "price")
    val p = Cdc.merge(snapshot, batch, Seq("k"), "op")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected broadcast left-anti join:\n$p")
  }

  test("tableDiff: added/removed/changed with per-column drift names") {
    val before = Seq(("k1", 1.0, "a"), ("k2", 2.0, "b"), ("k3", 3.0, "c"),
      ("k4", 4.0, null.asInstanceOf[String]))
      .toDF("k", "price", "tag")
    val after = Seq(("k2", 2.0, "b"),        // unchanged -> dropped
      ("k3", 3.5, "z"),                       // both payload cols drift
      ("k4", 4.0, null.asInstanceOf[String]), // null == null (null-safe)
      ("k5", 5.0, "new")                      // added
    ).toDF("k", "price", "tag")
    val out = Cdc.tableDiff(before, after, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[String]("op"),
        Option(r.getAs[Any]("n_diff_cols")),
        Option(r.getAs[scala.collection.Seq[String]]("diff_cols"))
          .map(_.toSeq)))
    assert(out.toSeq == Seq(
      ("k1", "removed", None, None),
      ("k3", "changed", Some(2), Some(Seq("price", "tag"))),
      ("k5", "added", None, None)))
  }

  test("tableDiff treats null-vs-value as drift and refuses schema mismatch") {
    val before = Seq(("k", Some(1.0))).toDF("k", "price")
    val after = Seq(("k", None: Option[Double])).toDF("k", "price")
    val out = Cdc.tableDiff(before, after, Seq("k")).collect().head
    assert(out.getAs[String]("op") == "changed" &&
      out.getAs[Int]("n_diff_cols") == 1)
    intercept[IllegalArgumentException] {
      Cdc.tableDiff(before, after.withColumnRenamed("price", "cost"), Seq("k"))
    }
  }

  test("lwwConsolidate: each field keeps its latest NON-NULL value independently") {
    val changes = Seq(
      ("k", 1L, Some("alice"), Some("a@x.com")),
      ("k", 2L, None: Option[String], Some("a@y.com")), // partial: name absent
      ("k", 3L, Some("alicia"), None: Option[String])   // partial: email absent
    ).toDF("k", "ver", "name", "email")
    val r = Cdc.lwwConsolidate(changes, Seq("k"), "ver").collect().head
    assert(r.getAs[String]("name") == "alicia")    // ver 3
    assert(r.getAs[String]("email") == "a@y.com")  // ver 2, not wiped by ver 3
    assert(r.getAs[Long]("last_version") == 3L)
    assert(r.getAs[Long]("n_updates") == 3L)
  }

  test("lwwConsolidate: an all-null field stays null; applyChanges would differ") {
    val changes = Seq(
      ("k", 1L, Some("v1"), None: Option[String]),
      ("k", 2L, Some("v2"), None: Option[String])).toDF("k", "ver", "a", "b")
    val r = Cdc.lwwConsolidate(changes, Seq("k"), "ver").collect().head
    assert(r.getAs[String]("a") == "v2")
    assert(r.get(r.fieldIndex("b")) == null)
  }

  test("lwwConsolidate is ONE map-side-combining aggregate (no window)") {
    val changes = Seq(("k", 1L, Some("x"))).toDF("k", "ver", "a")
    val p = Cdc.lwwConsolidate(changes, Seq("k"), "ver")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }
}
