package graft.sim

import graft.SparkSpec
import graft.functions.Cols
import org.apache.spark.sql.functions._
import scala.util.Random

/** The JVM vector kernels must agree bit-for-bit with the expression forms
  * (same cast-to-double, same left-to-right accumulation). */
class VectorOpsParitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rng = new Random(17)
    Seq.tabulate(20)(i =>
      (i.toLong, Array.fill(16)(rng.nextFloat() * 2 - 1),
        Array.fill(16)(rng.nextFloat() * 2 - 1)))
      .toDF("id", "a", "b")
  }

  test("dot: UDF == expression, bitwise") {
    val fast = vecs.select(VectorOps.dotCol(col("a"), col("b"))).as[Double].collect().toSeq
    val spec = vecs.select(Cols.dot(col("a"), col("b"))).as[Double].collect().toSeq
    fast.zip(spec).foreach { case (f, s) => assert(f === s) }
  }

  test("cosine: UDF == expression, bitwise; zero-norm -> null in both") {
    val fast = vecs.select(VectorOps.cosineCol(col("a"), col("b"))).collect().map(_.get(0))
    val spec = vecs.select(Cols.cosine(col("a"), col("b"))).collect().map(_.get(0))
    fast.zip(spec).foreach { case (f, s) => assert(f === s) }
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(z.select(VectorOps.cosineCol(col("a"), col("b"))).collect().head.get(0) == null)
  }

  test("nearDupPairs: finds exactly the above-threshold pairs") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.999f, 0.01f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.nearDupPairs(df, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((0L, 1L)))
  }

  test("CosineSim expression: bitwise parity with the UDF, codegen and interpreted") {
    import org.apache.spark.sql.graft.CosineSim
    val fast = vecs.select(VectorOps.cosineCol(col("a"), col("b"))).collect().map(_.get(0))
    val expr = vecs.select(CosineSim(col("a"), col("b"))).collect().map(_.get(0))
    fast.zip(expr).foreach { case (f, e) => assert(f === e) }
    // zero-norm -> null; null input -> null; length mismatch matches UDF
    val edge = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)),
      (null.asInstanceOf[Array[Float]], Array(1.0f)),
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    val eExpr = edge.select(CosineSim(col("a"), col("b"))).collect().map(_.get(0))
    val eUdf = edge.select(VectorOps.cosineCol(col("a"), col("b"))).collect().map(_.get(0))
    eExpr.zip(eUdf).foreach { case (e, u) => assert(e === u) }
    // interpreted path (eval without codegen) agrees too
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val lit1 = Literal.create(Array(1.0f, 2.0f), ArrayType(FloatType))
    val lit2 = Literal.create(Array(2.0f, 4.0f), ArrayType(FloatType))
    val interp = org.apache.spark.sql.graft.CosineSim(lit1, lit2).eval(null)
    assert(approx(interp.asInstanceOf[Double], 1.0, 1e-12))
    // a null ELEMENT -> null result (documented divergence: the UDF path
    // fails the task on such rows; the expression drops the row instead)
    val dirty = Seq((Seq[java.lang.Float](1.0f, null, 3.0f), Seq[java.lang.Float](1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    assert(dirty.select(CosineSim(col("a"), col("b"))).collect().head.get(0) == null)
  }

  test("int8 quantization: error bounded by scale/2, high cosine fidelity, exact edges") {
    val rng = new Random(29)
    (0 until 50).foreach { _ =>
      val v = Array.fill(64)(rng.nextFloat() * 2 - 1)
      val m = VectorOps.int8Metrics(v)
      assert(m.scale > 0.0)
      // rounding half-interval: |x - code*scale| <= scale/2
      assert(m.max_abs_err <= m.scale / 2 + 1e-12)
      assert(m.cos_fidelity.exists(_ > 0.999))
    }
    // all-zero vector: zero scale, exact codes, undefined fidelity
    val z = VectorOps.int8Metrics(Array.fill(8)(0.0f))
    assert(z.scale === 0.0 && z.max_abs_err === 0.0 && z.cos_fidelity.isEmpty)
    // the max-magnitude element maps to ±127 exactly; 0.5 at scale 1/127
    // rounds up (floor(63.5 + 0.5) = 64)
    val v = Array(1.0f, -1.0f, 0.5f)
    val s = VectorOps.int8Scale(v)
    val codes = VectorOps.quantizeInt8(v, s)
    assert(codes.toSeq === Seq[Byte](127, -127, 64))
    val dq = VectorOps.dequantizeInt8(codes, s)
    assert(math.abs(dq(0) - 1.0f) < 1e-6f && math.abs(dq(1) + 1.0f) < 1e-6f)
  }

  test("int8MetricsCol: struct column matches the kernel; null vector -> null") {
    val df = vecs.select(col("id"), col("a"))
    val viaCol = df.select(col("id"), VectorOps.int8MetricsCol(col("a")).as("m"))
      .select(col("id"), col("m.scale"), col("m.max_abs_err"), col("m.cos_fidelity"))
      .orderBy("id").collect()
    val direct = df.orderBy("id").collect().map { r =>
      val m = VectorOps.int8Metrics(r.getAs[scala.collection.Seq[Float]]("a").toArray)
      (r.getLong(0), m.scale, m.max_abs_err, m.cos_fidelity)
    }
    viaCol.zip(direct).foreach { case (c, (id, sc, err, cf)) =>
      assert(c.getLong(0) === id)
      assert(c.getDouble(1) === sc)
      assert(c.getDouble(2) === err)
      assert(Option(c.get(3)).map(_.asInstanceOf[Double]) === cf)
    }
    val nulls = Seq((1L, null: Array[Float])).toDF("id", "a")
    assert(nulls.select(VectorOps.int8MetricsCol(col("a"))).collect().head.get(0) == null)
  }

  test("GraftExtensions: cosine_sim is callable from SQL and plans the native expression") {
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("__vecs")
    val viaSql = spark.sql("SELECT cosine_sim(a, b) AS c FROM __vecs")
    // the ANALYZED plan names the expression; the executed plan constant-
    // folds a local relation of literals into a LocalTableScan
    assert(viaSql.queryExecution.analyzed.toString.contains("cosine_sim"),
      "SQL call did not resolve to the native expression")
    val viaApi = vecs.select(org.apache.spark.sql.graft.CosineSim(col("a"), col("b")).as("c"))
    viaSql.collect().map(_.get(0)).zip(viaApi.collect().map(_.get(0)))
      .foreach { case (s0, a0) => assert(s0 === a0) }
    // registration is idempotent
    org.apache.spark.sql.graft.GraftExtensions.register(spark)
  }

  test("centroidDrift: identical cohorts read 1e6; orthogonal cohorts read 0") {
    import spark.implicits._
    // sides 0 and 1 each hold the same vector -> sum vectors parallel
    val same = Seq((0L, 0, Array(1f, 2f, 3f)), (1L, 1, Array(1f, 2f, 3f)),
      (2L, 0, Array(1f, 2f, 3f)), (3L, 1, Array(1f, 2f, 3f)))
      .toDF("id", "side", "vec").withColumn("g", org.apache.spark.sql.functions.lit("k"))
    val r = graft.sim.VectorOps.centroidDrift(same, Seq("g"), "side", "vec")
      .collect().head
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("drift_cos_e6") == 1000000L)
    // orthogonal sum vectors -> cosine exactly 0
    val orth = Seq((0L, 0, Array(1f, 0f)), (1L, 1, Array(0f, 1f)))
      .toDF("id", "side", "vec").withColumn("g", org.apache.spark.sql.functions.lit("k"))
    val o = graft.sim.VectorOps.centroidDrift(orth, Seq("g"), "side", "vec")
      .collect().head
    assert(o.getAs[Long]("drift_cos_e6") == 0L)
    // a group missing one side disappears (no null-row fabrication)
    val lone = Seq((0L, 0, Array(1f, 1f))).toDF("id", "side", "vec")
      .withColumn("g", org.apache.spark.sql.functions.lit("k"))
    assert(graft.sim.VectorOps.centroidDrift(lone, Seq("g"), "side", "vec")
      .count() == 0L)
  }
}
