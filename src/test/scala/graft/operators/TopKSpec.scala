package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("perKeyAgg equals the window top-k on a skewed fixture") {
    val df = spark.range(0, 5000)
      .select(
        (col("id") % 7).cast("string").as("src"),
        col("id").as("doc_id"),
        // collisions on purpose: score has ties every 100 ids
        (col("id") % 100).cast("double").as("score"))
    val agg = TopK.perKeyAgg(df, Seq("src"), "score", "doc_id", k = 5)
      .orderBy("src", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val win = graft.text.Corpus.topKPerStratum(
        df, Seq("src"), Seq(col("score").desc, col("doc_id").asc), k = 5)
      .orderBy("src", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(agg.toSeq == win.toSeq)
  }

  test("partial buffers stay bounded at k under merge") {
    val a = (1 to 10).map(i => TopK.Entry(i.toDouble, i.toLong))
      .foldLeft(List.empty[TopK.Entry])((b, e) => TopK.insert(b, e, 3))
    assert(a.map(_.score) == List(10.0, 9.0, 8.0))
    val merged = TopK.merge(a, List(TopK.Entry(9.5, 99L)), 3)
    assert(merged.map(_.score) == List(10.0, 9.5, 9.0))
  }

  test("ties break by id ascending, matching the window form") {
    val df = Seq(("s", 1L, 5.0), ("s", 3L, 5.0), ("s", 2L, 5.0))
      .toDF("src", "doc_id", "score")
    val out = TopK.perKeyAgg(df, Seq("src"), "score", "doc_id", k = 2)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(out.toSeq == Seq(1L, 2L))
  }
}
