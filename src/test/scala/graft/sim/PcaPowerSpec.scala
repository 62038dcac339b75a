package graft.sim

import graft.SparkSpec

/** Integer power-iteration PCA slice: planted-axis recovery (exact and
  * approximate), readout identities, and the degenerate fences. */
class PcaPowerSpec extends SparkSpec {
  import spark.implicits._

  private def df(vs: Seq[Array[Float]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")

  test("single-axis corpus: exact eigenvalue, trace, anisotropy 1e6") {
    // all variance on dim 1: mean 0, Var = (1+1+4+4)/4 = 2.5 exactly;
    // A = diag(1e6,0,0) makes every iterate exact — lam1 = trace = 2.5e6
    val d = df(Seq(Array(1f, 0f, 0f), Array(-1f, 0f, 0f),
      Array(2f, 0f, 0f), Array(-2f, 0f, 0f)))
    val r = VectorOps.pcaPowerSlice(d, "embedding", dim = 3).head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("lam1_e6") == 2500000L)
    assert(r.getAs[Long]("trace_e6") == 2500000L)
    assert(r.getAs[Long]("anis_e6") == 1000000L)
    assert(r.getAs[Int]("top_dim") == 1)
    assert(r.getAs[Int]("top_sign") == 1) // all-ones start pins the sign
  }

  test("two-axis corpus: dominant axis found, readouts near the planted spectrum") {
    // exact diagonal covariance diag(1, 9), cross-moment zero: λ1 = 9,
    // trace = 10; three integer iterations land within the floor-div
    // truncation of the planted values
    val d = df(Seq(Array(1f, 3f, 0f), Array(-1f, -3f, 0f),
      Array(1f, -3f, 0f), Array(-1f, 3f, 0f)))
    val r = VectorOps.pcaPowerSlice(d, "embedding", dim = 3).head()
    assert(r.getAs[Int]("top_dim") == 2)
    val lam1 = r.getAs[Long]("lam1_e6")
    assert(math.abs(lam1 - 9000000L) < 20000L, s"lam1_e6=$lam1")
    assert(r.getAs[Long]("trace_e6") == 10000000L)
    val anis = r.getAs[Long]("anis_e6")
    assert(anis > 880000L && anis < 910000L, s"anis_e6=$anis")
  }

  test("degenerate corpora raise, not emit garbage") {
    // constant embeddings → zero scatter
    val c = df(Seq(Array(1f, 1f), Array(1f, 1f), Array(1f, 1f)))
    val e1 = intercept[IllegalArgumentException] {
      VectorOps.pcaPowerSlice(c, "embedding", dim = 2).head()
    }
    assert(e1.getMessage.contains("zero scatter"))
    // a single vector is not a spectrum
    val one = df(Seq(Array(1f, 2f)))
    val e2 = intercept[IllegalArgumentException] {
      VectorOps.pcaPowerSlice(one, "embedding", dim = 2).head()
    }
    assert(e2.getMessage.contains(">= 2 vectors"))
  }

  test("wrong-dimension and null vectors are filtered, not crashed on") {
    val mixed = Seq((0L, Array(1f, 0f)), (1L, Array(-1f, 0f)),
      (2L, Array(2f, 0f)), (3L, Array(-2f, 0f)),
      (4L, Array(1f, 2f, 3f)), // wrong dim — dropped
      (5L, null.asInstanceOf[Array[Float]])) // null — dropped
      .toDF("vec_id", "embedding")
    val r = VectorOps.pcaPowerSlice(mixed, "embedding", dim = 2).head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("lam1_e6") == 2500000L)
  }
}
