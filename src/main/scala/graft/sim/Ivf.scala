package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to [[Similarity.lshTopK]]: coarse-quantize every vector to
  * its nearest centroid, then search only the `nProbe` nearest centroid
  * lists per query instead of the whole corpus.
  *
  * Training is mini Lloyd's over Spark aggregates: assignment is a
  * per-row argmin against broadcast centroids (JVM kernel), the update is
  * one `groupBy(cluster).avg` per iteration — no MLlib dependency, fully
  * deterministic (seed-free: initial centroids are the k lowest-id
  * vectors, ties impossible on a key column). Centroid count is O(√N) at
  * scale; the centroid table stays driver-small even at 100 TB corpus
  * size, which is what makes the probe-side broadcast legitimate.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Float]]) {
    def nearest(v: Array[Float], n: Int): Array[Int] =
      centroids.indices
        .map(i => (i, VectorOps.cosine(centroids(i), v)))
        .sortBy { case (i, c) => (-(if (c == null) -2.0 else c.toDouble), i) }
        .take(n).map(_._1).toArray
  }

  /** Train k centroids with `iters` Lloyd iterations. Vectors averaged in
    * double; empty clusters keep their previous centroid. */
  def train(vectors: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int = 5): Model = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val slim = vectors.select(col(idCol).cast("long"), col(vecCol))
      .filter(col(vecCol).isNotNull)
      .as[(Long, Array[Float])]
    var centroids = slim.orderBy(col(idCol).cast("long"))
      .limit(k).collect().map(_._2)
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(Model(centroids))
      val assigned = slim.map { case (_, v) => (bc.value.nearest(v, 1)(0), v) }
        .toDF("cluster", "v")
      val sums = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        .agg(sum(col("x").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      sums.groupBy(_.getAs[Int]("cluster")).foreach { case (c, rows) =>
        rows.foreach { r =>
          next(c)(r.getAs[Int]("dim")) =
            (r.getAs[Double]("s") / r.getAs[Long]("n")).toFloat
        }
      }
      centroids = next
      it += 1
    }
    Model(centroids)
  }

  /** ANN top-k: corpus rows live in their nearest centroid's list; each
    * query probes its `nProbe` nearest lists and exact-reranks within
    * them. Output: (query_id, neighbor_id, cos_sim, rank). */
  def topK(vectors: DataFrame, idCol: String, vecCol: String,
           model: Model, k: Int, nProbe: Int = 2): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val slim = vectors.select(col(idCol).cast("long"), col(vecCol))
      .filter(col(vecCol).isNotNull)
      .as[(Long, Array[Float])]
    val corpus = slim
      .map { case (id, v) => (bc.value.nearest(v, 1)(0), id, v) }
      .toDF("cluster", "neighbor_id", "__cv")
    val queries = slim
      .flatMap { case (id, v) => bc.value.nearest(v, nProbe).map(c => (c, id, v)) }
      .toDF("cluster", "query_id", "__qv")
    val scored = queries.join(corpus, Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(org.apache.spark.sql.graft.CosineSim(col("__qv"), col("__cv")), 4).as("cos_sim"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
