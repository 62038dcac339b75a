package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class IvfSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated clusters in 8 dims. */
  private lazy val clustered = {
    val rng = new Random(23)
    val centers = Seq(
      Array.fill(8)(5.0f) , Array.fill(8)(-5.0f),
      Array.tabulate(8)(i => if (i % 2 == 0) 5.0f else -5.0f))
    (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + rng.nextFloat() * 0.5f - 0.25f))
    }.toDF("vec_id", "embedding")
  }

  test("train: deterministic centroids that converge near the true centers") {
    val m1 = Ivf.train(clustered, "vec_id", "embedding", k = 3, iters = 5)
    val m2 = Ivf.train(clustered.repartition(7), "vec_id", "embedding", k = 3, iters = 5)
    m1.centroids.zip(m2.centroids).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    // every true center should be ~cosine-1 to some centroid
    val centers = Seq(Array.fill(8)(5.0f), Array.fill(8)(-5.0f),
      Array.tabulate(8)(i => if (i % 2 == 0) 5.0f else -5.0f))
    centers.foreach { c =>
      val best = m1.centroids.map(ct => VectorOps.cosine(ct, c).toDouble).max
      assert(best > 0.99, s"no centroid matches a true center (best=$best)")
    }
  }

  test("clusterQuality: tight planted clusters score near cosine 1 per member") {
    val m = Ivf.train(clustered, "vec_id", "embedding", k = 3, iters = 5)
    val out = Ivf.clusterQuality(clustered, "vec_id", "embedding", m)
      .orderBy("cluster").collect()
      .map(r => (r.getAs[Int]("cluster"), r.getAs[Long]("n"),
        r.getAs[Long]("sum_cos_e6")))
    assert(out.map(_._2).sum == 90L, "every vector lands in exactly one cluster")
    out.foreach { case (c, n, s) =>
      // tight planted clusters: mean member-to-centroid cosine > 0.99
      assert(s > n * 990000L && s <= n * 1000000L,
        s"cluster $c sum $s outside (0.99, 1] * n=$n")
    }
  }

  test("topK: within-cluster neighbors rank first; high recall vs brute force") {
    val model = Ivf.train(clustered, "vec_id", "embedding", k = 3, iters = 5)
    val ivf = Ivf.topK(clustered, "vec_id", "embedding", model, k = 3, nProbe = 1)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = Similarity.bruteForceTopK(clustered, clustered, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall > 0.9, s"recall=$recall")
    // all returned neighbors share the query's cluster (mod 3)
    assert(ivf.forall { case (q, n) => q % 3 == n % 3 })
  }

  test("semanticDedupPairs: planted near-identical vectors pair up within clusters") {
    // clustered + two exact copies of vectors 0 and 1 under new ids
    val base = clustered.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val planted = (base :+ (900L, base.find(_._1 == 0L).get._2.clone())
                        :+ (901L, base.find(_._1 == 1L).get._2.clone()))
      .toSeq.toDF("vec_id", "embedding")
    val model = Ivf.train(clustered, "vec_id", "embedding", k = 3, iters = 5)
    val pairs = Ivf.semanticDedupPairs(planted, "vec_id", "embedding", model, threshold = 0.9999)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 900L)), s"missing planted pair in $pairs")
    assert(pairs.contains((1L, 901L)), s"missing planted pair in $pairs")
    // id_a < id_b contract, no self-pairs
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("semanticDedupClusters: components labelled by min member id") {
    val base = clustered.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val planted = (base :+ (900L, base.find(_._1 == 0L).get._2.clone())
                        :+ (901L, base.find(_._1 == 0L).get._2.clone()))
      .toSeq.toDF("vec_id", "embedding")
    val model = Ivf.train(clustered, "vec_id", "embedding", k = 3, iters = 5)
    val labels = Ivf.semanticDedupClusters(planted, "vec_id", "embedding", model,
        threshold = 0.9999)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"))).toMap
    // 0, 900, 901 are one component labelled 0
    assert(labels.get(900L).contains(0L))
    assert(labels.get(901L).contains(0L))
    assert(labels.get(0L).contains(0L))
  }
}
