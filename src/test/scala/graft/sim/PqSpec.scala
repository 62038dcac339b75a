package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // three tight, well-separated clusters in 8-dim space (m=4 subspaces
  // of 2 dims): PQ must assign members of a cluster the same codes and
  // ADC must rank within-cluster neighbors first
  private def clustered() = {
    val centers = Seq(
      Array.fill(8)(0.0f),
      Array.fill(8)(1.0f),
      Array.tabulate(8)(i => if (i % 2 == 0) -1.0f else 2.0f))
    (0 until 30).map { i =>
      val c = centers(i % 3)
      val jitter = Array.tabulate(8)(j => ((i * 7 + j) % 5 - 2) * 0.01f)
      (i.toLong, c.zip(jitter).map { case (a, b) => a + b })
    }.toDF("vec_id", "embedding")
  }

  test("train/encode: codes are in range, duplicates share codes, wrong dims drop") {
    val base = clustered()
    val withDup = base.unionByName(
      Seq((100L, Array.fill(8)(0.0f)), (101L, Array.fill(8)(0.0f)),
        (102L, Array.fill(3)(9.9f))) // wrong dim -> filtered
        .toDF("vec_id", "embedding"))
    val model = Pq.train(withDup, "vec_id", "embedding", dim = 8, m = 4, k = 4, iters = 2)
    assert(model.codebooks.length == 4 && model.codebooks.forall(_.length == 4))
    val codes = Pq.encode(withDup, "vec_id", "embedding", model)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq)).toMap
    assert(!codes.contains(102L), "wrong-dim vector must be filtered")
    assert(codes.values.forall(cs => cs.length == 4 && cs.forall(c => c >= 0 && c < 4)))
    assert(codes(100L) == codes(101L), "identical vectors must share codes")
  }

  test("adcTopK ranks within-cluster neighbors first; deterministic ties") {
    val docs = clustered()
    val out = Pq.adcTopK(docs, docs.filter(col("vec_id") < 3),
        "vec_id", "embedding", dim = 8, m = 4, k = 6, iters = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // query i belongs to cluster i % 3; its top-5 neighbors must all be
    // members of the same cluster (cluster size 10 > 5)
    assert(out.nonEmpty)
    out.foreach { case (q, n, _) =>
      assert(n % 3 == q % 3, s"query $q got cross-cluster neighbor $n")
    }
    // never the query itself; ranks dense from 1
    assert(out.forall { case (q, n, _) => q != n })
    val byQ = out.groupBy(_._1)
    assert(byQ.values.forall(_.map(_._3).sorted.toSeq == (1 to 5)))
    // determinism: a second run returns the identical rows
    val out2 = Pq.adcTopK(docs, docs.filter(col("vec_id") < 3),
        "vec_id", "embedding", dim = 8, m = 4, k = 6, iters = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(out.toSeq == out2.toSeq)
  }
}
