package graft.sim

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization ANN (Jégou/Douze/Schmid, TPAMI 2011) — the
  * memory-compression scale path beside [[Ivf]] (list pruning) and
  * [[Similarity.lshTopK]] (bucket pruning): split each `dim`-vector
  * into `m` subspaces, k-means each subspace independently, and store
  * every corpus vector as `m` byte-sized codes. A 64-float vector
  * becomes 8 codes — a 32× memory cut — and query scoring becomes `m`
  * table lookups per corpus row (asymmetric distance computation, ADC)
  * instead of `dim` multiplies: the corpus that fits in RAM at 100 TB
  * is the code table, not the vectors.
  *
  * Everything is DETERMINISTIC and cross-engine exact, the q58/IVF
  * conventions: sub-codebook init is the k lowest-id sub-vectors; Lloyd
  * assignment is argmin L2 with ties to the lowest centroid id; the
  * centroid update is a per-dim double sum over floats (EXACT — float
  * mantissas leave ~29 bits of double headroom at any realistic list
  * size) divided once and cast to float; ADC distances are sums of
  * exact float-difference squares in double. The DuckDB oracle replays
  * training, encoding, and scoring bit-for-bit (q396).
  *
  * Scale shape: training aggregates are map-side combined per
  * (subspace, cluster, dim); codebooks are `m·k·(dim/m)` floats —
  * driver-small at any corpus size — so encode and ADC are per-row
  * kernels against a broadcast model, shuffle-free; top-k is one
  * per-query window over the scored candidates. The QUERY side of
  * [[adcTopK]] is collected to the driver (it is the broadcast LUT
  * side by contract — bounded query batches, the q49/q52 convention);
  * the CORPUS side streams. */
object Pq {

  /** codebooks(s)(c) = centroid c of subspace s (length dim/m each). */
  final case class Model(dim: Int, m: Int, codebooks: Array[Array[Array[Float]]]) {
    val sub: Int = dim / m

    /** L2² of sub-vector s of `v` against centroid `c` of subspace `s` —
      * exact double (float diffs, ≤ 48-bit products, bounded sum). */
    def subDist(v: Array[Float], s: Int, c: Int): Double = {
      val cb = codebooks(s)(c)
      var acc = 0.0
      var j = 0
      while (j < sub) {
        val d = v(s * sub + j).toDouble - cb(j).toDouble
        acc += d * d
        j += 1
      }
      acc
    }

    /** Code of sub-vector s: argmin L2², ties to the lowest centroid. */
    def code(v: Array[Float], s: Int): Int = {
      var best = 0
      var bestD = subDist(v, s, 0)
      var c = 1
      while (c < codebooks(s).length) {
        val d = subDist(v, s, c)
        if (d < bestD) { best = c; bestD = d }
        c += 1
      }
      best
    }

    def codes(v: Array[Float]): Array[Int] =
      Array.tabulate(m)(s => code(v, s))
  }

  private def slim(vectors: DataFrame, idCol: String, vecCol: String,
                   dim: Int): Dataset[(Long, Array[Float])] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    vectors.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).cast("long").as("_1"), col(vecCol).as("_2"))
      .as[(Long, Array[Float])]
  }

  /** Train `m` independent sub-codebooks of `k` centroids each with
    * `iters` Lloyd iterations over ONE pass per iteration (all
    * subspaces assign and update together; empty clusters keep their
    * previous centroid). */
  def train(vectors: DataFrame, idCol: String, vecCol: String,
            dim: Int, m: Int, k: Int, iters: Int): Model = {
    require(dim % m == 0, s"m ($m) must divide dim ($dim)")
    val spark = vectors.sparkSession
    import spark.implicits._
    val sub = dim / m
    val vs = slim(vectors, idCol, vecCol, dim)
    val init = vs.orderBy(col("_1")).limit(k).collect().map(_._2)
    var books = Array.tabulate(m, init.length)((s, c) =>
      java.util.Arrays.copyOfRange(init(c), s * sub, (s + 1) * sub))
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(Model(dim, m, books))
      val assigned = vs.flatMap { case (_, v) =>
        (0 until bc.value.m).iterator.map(s => (s, bc.value.code(v, s), v))
      }.toDF("s", "cid", "v")
      val sums = assigned
        .select(col("s"), col("cid"),
          posexplode(expr(s"slice(v, s * $sub + 1, $sub)")).as(Seq("j", "x")))
        .groupBy("s", "cid", "j")
        .agg(sum(col("x").cast("double")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val next = books.map(_.map(_.clone()))
      sums.foreach { r =>
        next(r.getAs[Int]("s"))(r.getAs[Int]("cid"))(r.getAs[Int]("j")) =
          (r.getAs[Double]("sx") / r.getAs[Long]("n")).toFloat
      }
      books = next
      it += 1
    }
    Model(dim, m, books)
  }

  /** (id, codes array<int>) — the compressed corpus representation. */
  def encode(vectors: DataFrame, idCol: String, vecCol: String,
             model: Model): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    slim(vectors, idCol, vecCol, model.dim)
      .map { case (id, v) => (id, bc.value.codes(v)) }
      .toDF(idCol, "codes")
  }

  /** ADC top-k: train on the corpus, encode the corpus, score every
    * (query, corpus) pair as Σ_s lut[s][code_s] with the per-query LUT
    * built once (m·k exact sub-distances), rank per query by
    * (distance, neighbor_id). Queries must be a bounded batch (they
    * broadcast). Output: (query_id, neighbor_id, adc_dist, rank). */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, m: Int, k: Int, iters: Int,
              topK: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val model = train(corpus, idCol, vecCol, dim, m, k, iters)
    val qs = slim(queries, idCol, vecCol, dim).collect()
    val luts = qs.map { case (qid, qv) =>
      (qid, Array.tabulate(m, k)((s, c) => model.subDist(qv, s, c)))
    }
    val bc = spark.sparkContext.broadcast((model, luts))
    val scored = slim(corpus, idCol, vecCol, dim).flatMap { case (nid, v) =>
      val (mdl, ls) = bc.value
      val cs = mdl.codes(v)
      ls.iterator.filter(_._1 != nid).map { case (qid, lut) =>
        var acc = 0.0
        var s = 0
        while (s < mdl.m) { acc += lut(s)(cs(s)); s += 1 }
        (qid, nid, acc)
      }
    }.toDF("query_id", "neighbor_id", "adc_dist")
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("adc_dist").asc, col("neighbor_id").asc)))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"),
        round(col("adc_dist"), 6).as("adc_dist"), col("rank").cast("int"))
  }
}
