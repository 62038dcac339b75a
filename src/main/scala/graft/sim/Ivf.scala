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

  /** Per-cluster quality readout over a trained model: member count and
    * the EXACT sum of e6-quantized member-to-centroid cosines — the
    * "are these clusters tight" diagnostic run after [[train]] (a low
    * per-member cosine sum against O(√N) centroids means the coarse
    * quantizer is under-fit and probe recall will suffer). Quantizing
    * per row and summing exactly keeps the readout engine-portable; no
    * mean is emitted (a negative sum would hit the div-truncate vs
    * floor-divide sign trap — derive it downstream if needed).
    * Output: `(cluster, n, sum_cos_e6)`. */
  def clusterQuality(vectors: DataFrame, idCol: String, vecCol: String,
                     model: Model): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    vectors.select(col(idCol).cast("long"), col(vecCol))
      .filter(col(vecCol).isNotNull)
      .as[(Long, Array[Float])]
      .map { case (_, v) =>
        val c = bc.value.nearest(v, 1)(0)
        val cs = VectorOps.cosine(bc.value.centroids(c), v)
        (c, math.floor((if (cs == null) 0.0 else cs.toDouble) * 1e6 + 0.5).toLong)
      }
      .toDF("cluster", "cs_e6")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum(col("cs_e6")).as("sum_cos_e6"))
  }

  /** Pairwise centroid separation of a trained model — the BETWEEN-
    * cluster half of the coarse-quantizer diagnostic ([[clusterQuality]]
    * reads within-cluster cohesion): the e6-quantized cosine of every
    * centroid pair — a cluster's nearest-neighbor margin is read off the
    * pair list as its max cosine. Two
    * centroids with cosine → 1 mean the quantizer wasted a cell (and
    * SemDeDup will miss near-dups straddling them); the readout names
    * the merge candidates.
    *
    * Driver-sized by design: k = O(√N) centroids ⇒ k² pairs is small at
    * any corpus scale (the same argument that makes the probe-side
    * broadcast legitimate). Cosines use the same [[VectorOps.cosine]] +
    * `⌊x·10⁶ + 0.5⌋` quantization as [[clusterQuality]], so the SQL
    * oracle replays the pairs off the identical Lloyd chain. Output:
    * `(cluster_a, cluster_b, cos_e6)` for a < b, ordered. */
  def clusterSeparation(spark: org.apache.spark.sql.SparkSession,
                        model: Model): DataFrame = {
    import spark.implicits._
    val cs = model.centroids
    val rows = for {
      a <- cs.indices
      b <- a + 1 until cs.length
    } yield {
      val c = VectorOps.cosine(cs(a), cs(b))
      (a, b, math.floor((if (c == null) 0.0 else c.toDouble) * 1e6 + 0.5).toLong)
    }
    rows.toDF("cluster_a", "cluster_b", "cos_e6")
  }

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): coarse-cluster every embedding with the trained IVF
    * model, then score pairwise cosine ONLY within a cluster and emit
    * pairs at or above `threshold`. The cluster equi-join replaces the
    * corpus-wide all-pairs stage — cost is Σ|cluster|², bounded by
    * training k = O(√N) centroids, the same budget SemDeDup runs at
    * web scale. Single-probe assignment is unique per id, so no
    * dropDuplicates pass is needed. Scoring is the codegen'd
    * [[org.apache.spark.sql.graft.CosineSim]] expression.
    *
    * Caveat shared with SemDeDup itself: near-dups straddling a cluster
    * boundary are missed — recall, not correctness; raise k's probe-side
    * analog by unioning a second-probe assignment if the miss rate
    * matters. */
  def semanticDedupPairs(vectors: DataFrame, idCol: String, vecCol: String,
                         model: Model, threshold: Double): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val slim = vectors.select(col(idCol).cast("long"), col(vecCol))
      .filter(col(vecCol).isNotNull)
      .as[(Long, Array[Float])]
    // persist + eager count before the self-join: both join sides would
    // otherwise re-run the O(k·d) nearest-centroid assignment over every
    // vector (alias-divergent projections defeat ReuseExchange) — the
    // same discipline as Dedup.minhashCandidates
    val assigned = slim
      .map { case (id, v) => (bc.value.nearest(v, 1)(0), id, v) }
      .toDF("cluster", "id", "__v")
      .persist()
    assigned.count()
    val a = assigned.select(col("cluster"), col("id").as("id_a"), col("__v").as("__va"))
    val b = assigned.select(col("cluster"), col("id").as("id_b"), col("__v").as("__vb"))
    val pairs = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(org.apache.spark.sql.graft.CosineSim(col("__va"), col("__vb")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the (small, pairs-only) result so the vector-sized
    // assignment cache can be dropped NOW — the method-internal frame is
    // otherwise unreleasable by any caller; the pairs cache itself is
    // cleaner-released when the returned frame becomes unreachable
    // (semanticDedupClusters unpersists it explicitly).
    pairs.count()
    assigned.unpersist()
    pairs
  }

  /** Semantic duplicate groups: [[semanticDedupPairs]] resolved into
    * connected components (pairwise similarity is not transitive; the
    * component is the dedup unit, exactly as in
    * [[graft.text.Dedup.duplicateClusters]]). Output: (vec_id,
    * cluster_id = min member id); ids absent from the output are
    * semantically unique. */
  def semanticDedupClusters(vectors: DataFrame, idCol: String, vecCol: String,
                            model: Model, threshold: Double): DataFrame = {
    val pairs = semanticDedupPairs(vectors, idCol, vecCol, model, threshold)
    val labels = graft.text.Dedup.connectedComponents(pairs, "id_a", "id_b")
    // components are materialized (the in-loop labelSum action), so the
    // pair cache can be released now — same shape as duplicateClusters
    pairs.unpersist()
    labels.select(col("id").as("vec_id"), col("component").as("cluster_id"))
  }
}
