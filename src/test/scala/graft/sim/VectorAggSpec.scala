package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The QuantCentroid Aggregator: quantized integer sums must be exact,
  * order-invariant (repartition-proof), and agree with the naive
  * posexplode+sum plan. */
class VectorAggSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4

  private def vecs = Seq(
    (0, Array(1.0f, 2.0f, 3.0f, 4.0f)),
    (0, Array(0.5f, -0.5f, 0.25f, 0.0f)),
    (0, null.asInstanceOf[Array[Float]]),        // ignored (SQL avg convention)
    (1, Array(10.0f, 20.0f)),                    // short -> zero-padded
    (1, Array(-1.0f, 1.0f, -1.0f, 1.0f, 99.0f)) // long -> truncated
  ).toDF("grp", "v")

  test("centroid: exact quantized sums, null skipped, pad/truncate") {
    val out = vecs.groupBy("grp")
      .agg(VectorAgg.centroid(col("v"), dim, scale = 100.0).as("c"))
      .select(col("grp"), col("c.n").as("n"), col("c.sums").as("sums"),
        col("c.ns").as("ns"))
      .orderBy("grp").collect()
    val g0 = out(0)
    assert(g0.getAs[Long]("n") == 2L)
    assert(g0.getAs[scala.collection.Seq[Long]]("sums").toSeq == Seq(150L, 150L, 325L, 400L))
    assert(g0.getAs[scala.collection.Seq[Long]]("ns").toSeq == Seq(2L, 2L, 2L, 2L))
    val g1 = out(1)
    assert(g1.getAs[Long]("n") == 2L)
    assert(g1.getAs[scala.collection.Seq[Long]]("sums").toSeq == Seq(900L, 2100L, -100L, 100L))
    // per-dim presence: the short vector counts only where it has dims
    assert(g1.getAs[scala.collection.Seq[Long]]("ns").toSeq == Seq(2L, 2L, 1L, 1L))
  }

  test("centroid: repartition-proof (integer sums are order-exact)") {
    val big = (1 to 500).map { i =>
      (i % 3, Array(i * 0.01f, -i * 0.02f, (i % 7) * 1.5f))
    }.toDF("grp", "v")
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy("grp")
      .agg(VectorAgg.centroid(col("v"), 3).as("c"))
      .select(col("grp"), col("c.sums").as("sums"), col("c.ns").as("ns"), col("c.n").as("n"))
      .orderBy("grp").collect()
      .map(r => (r.getInt(0), r.getAs[scala.collection.Seq[Long]]("sums").toSeq,
        r.getAs[scala.collection.Seq[Long]]("ns").toSeq, r.getLong(3))).toSeq
    assert(run(big) == run(big.repartition(13)))
  }

  test("centroid agrees with the posexplode reference plan") {
    val df = (1 to 100).map(i => (i % 4, Array(i * 0.1f, i * -0.3f))).toDF("grp", "v")
    val agg = df.groupBy("grp").agg(VectorAgg.centroid(col("v"), 2).as("c"))
      .select(col("grp"), col("c.ns").as("ns"),
        posexplode(col("c.sums")).as(Seq("pos", "s")))
      .select(col("grp"), col("pos"), col("s"),
        element_at(col("ns"), col("pos") + 1).as("cnt"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3)))).toMap
    val ref = df.select(col("grp"), posexplode(col("v")).as(Seq("pos", "e")))
      .select(col("grp"), col("pos"),
        floor(col("e").cast("double") * 1e6 + 0.5).cast("long").as("q"))
      .groupBy("grp", "pos").agg(sum("q").as("s"), count(lit(1)).as("cnt"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(agg == ref)
  }

  test("centroid: all-null group yields zero sums and n = 0") {
    val df = Seq((9, null.asInstanceOf[Array[Float]])).toDF("grp", "v")
    val r = df.groupBy("grp").agg(VectorAgg.centroid(col("v"), 3).as("c"))
      .select(col("c.sums"), col("c.ns"), col("c.n")).head
    assert(r.getAs[scala.collection.Seq[Long]](0).toSeq == Seq(0L, 0L, 0L))
    assert(r.getAs[scala.collection.Seq[Long]](1).toSeq == Seq(0L, 0L, 0L))
    assert(r.getLong(2) == 0L)
  }

  test("embeddingHealth: hand-computed norms, bad-dim and zero counts, grid fences") {
    // norms e3: (5000, 0, 1000, 5000); the 3-elem vector is bad-dim
    val rows = Seq(
      ("k", Array(3.0f, 4.0f)), ("k", Array(0.0f, 0.0f)),
      ("k", Array(1.0f, 0.0f)), ("k", Array(3.0f, 4.0f, 0.0f)))
      .toDF("g", "vec")
    val r = VectorOps.embeddingHealth(rows, Seq("g"), "vec", dim = 2)
      .collect().head
    assert(r.getAs[Long]("n_vecs") == 4L)
    assert(r.getAs[Long]("n_bad_dim") == 1L)
    assert(r.getAs[Long]("n_zero") == 1L)
    assert(r.getAs[Long]("mean_norm_e3") == 2750L)
    assert(r.getAs[Long]("p05_e3") == 0L)
    assert(r.getAs[Long]("p50_e3") == 1000L)
    assert(r.getAs[Long]("p95_e3") == 5000L)
  }
}
