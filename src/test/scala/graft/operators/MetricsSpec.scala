package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("groupedAuc: hand-computed midrank U with ties") {
    // group g: pos scores {3, 2}, neg scores {1, 2}
    // U = (3>1) + (3>2) + (2>1) + (2=2 tie 0.5) = 3.5 -> AUC = 0.875
    val df = Seq(
      ("g", 3L, true), ("g", 2L, true), ("g", 1L, false), ("g", 2L, false)
    ).toDF("grp", "score", "label")
    val r = Metrics.groupedAuc(df, Seq("grp"), "score", "label").collect().head
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("auc_e6") == 875000L)
  }

  test("groupedAuc: perfect and inverted rankings hit the endpoints") {
    val perfect = Seq(("g", 10L, true), ("g", 9L, true), ("g", 1L, false))
      .toDF("grp", "score", "label")
    assert(Metrics.groupedAuc(perfect, Seq("grp"), "score", "label")
      .collect().head.getAs[Long]("auc_e6") == 1000000L)
    val inverted = Seq(("g", 1L, true), ("g", 9L, false), ("g", 10L, false))
      .toDF("grp", "score", "label")
    assert(Metrics.groupedAuc(inverted, Seq("grp"), "score", "label")
      .collect().head.getAs[Long]("auc_e6") == 0L)
  }

  test("groupedAuc: single-class groups emit null, not a fake endpoint") {
    val df = Seq(("g", 1L, true), ("g", 2L, true), ("h", 1L, false))
      .toDF("grp", "score", "label")
    val out = Metrics.groupedAuc(df, Seq("grp"), "score", "label")
      .orderBy("grp").collect()
    assert(out.forall(_.isNullAt(out.head.fieldIndex("auc_e6"))))
  }

  test("groupedAuc: null scores and labels are excluded") {
    val df = Seq[(String, Option[Long], Option[Boolean])](
      ("g", Some(3L), Some(true)), ("g", None, Some(false)),
      ("g", Some(1L), None), ("g", Some(1L), Some(false))
    ).toDF("grp", "score", "label")
    val r = Metrics.groupedAuc(df, Seq("grp"), "score", "label").collect().head
    assert(r.getAs[Long]("n_pos") == 1L && r.getAs[Long]("n_neg") == 1L)
    assert(r.getAs[Long]("auc_e6") == 1000000L)
  }
}
