package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Single-pass JVM vector kernels for `array<float>` embeddings.
  *
  * Bit-compatible with the expression forms in [[graft.functions.Cols]]
  * (cast-to-double then sequential left-to-right accumulation — asserted by
  * `VectorOpsParitySpec`), but fast: Spark's higher-order `zip_with` /
  * `aggregate` evaluate interpreted (~30µs per element), which makes an
  * all-pairs cosine stage ~100x slower than these loops. Same trade as
  * [[graft.text.TextHash]].
  */
object VectorOps {

  def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  def l2norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  /** Cosine with zero-norm guard (null, not NaN) — matches
    * [[graft.functions.Cols.cosine]]. */
  def cosine(a: Array[Float], b: Array[Float]): java.lang.Double = {
    val den = l2norm(a) * l2norm(b)
    if (den == 0.0) null else Double.box(dot(a, b) / den)
  }

  // ------------------------------------------------------------- Column API

  def cosineCol(a: Column, b: Column): Column =
    udf((x: Array[Float], y: Array[Float]) =>
      if (x == null || y == null) null else cosine(x, y)).apply(a, b)

  def dotCol(a: Column, b: Column): Column =
    udf((x: Array[Float], y: Array[Float]) =>
      if (x == null || y == null) null else Double.box(dot(x, y))).apply(a, b)
}
