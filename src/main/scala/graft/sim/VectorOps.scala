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

  // ----------------------------------------------------- int8 quantization

  /** Symmetric int8 scalar quantization scale: maxAbs/127 (0.0 for the
    * all-zero vector — codes are then all 0 and dequant is exact). */
  def int8Scale(a: Array[Float]): Double = {
    var m = 0.0
    var i = 0
    while (i < a.length) { val v = math.abs(a(i).toDouble); if (v > m) m = v; i += 1 }
    m / 127.0
  }

  /** Quantize to int8 codes. Rounding is floor(x/scale + 0.5) — explicit
    * and engine-portable (no banker's/HALF_UP ambiguity to mismatch an
    * oracle), clamped to [-127, 127]. */
  def quantizeInt8(a: Array[Float], scale: Double): Array[Byte] = {
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) {
      val q = if (scale == 0.0) 0.0 else math.floor(a(i).toDouble / scale + 0.5)
      out(i) = math.max(-127.0, math.min(127.0, q)).toByte
      i += 1
    }
    out
  }

  def dequantizeInt8(codes: Array[Byte], scale: Double): Array[Float] = {
    val out = new Array[Float](codes.length)
    var i = 0
    while (i < codes.length) { out(i) = (codes(i) * scale).toFloat; i += 1 }
    out
  }

  final case class Int8Metrics(scale: Double, max_abs_err: Double,
                               cos_fidelity: Option[Double])

  /** One-pass quantize→dequantize round-trip metrics. Dequantized values
    * stay in double (`code * scale`) — no float round-trip, so an oracle
    * computing the same formula in doubles matches bit-for-bit modulo
    * summation order. max_abs_err ≤ scale/2 by construction (the rounding
    * half-interval); cos_fidelity is cosine(original, dequantized), None
    * only for the all-zero vector. */
  def int8Metrics(a: Array[Float]): Int8Metrics = {
    val s = int8Scale(a)
    var maxErr = 0.0
    var dotAD = 0.0
    var na = 0.0
    var nd = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble
      val q = if (s == 0.0) 0.0 else math.max(-127.0, math.min(127.0, math.floor(x / s + 0.5)))
      val dq = q * s
      val e = math.abs(x - dq)
      if (e > maxErr) maxErr = e
      dotAD += x * dq
      na += x * x
      nd += dq * dq
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nd)
    Int8Metrics(s, maxErr, if (den == 0.0) None else Some(dotAD / den))
  }

  // ------------------------------------------------------------- Column API

  def cosineCol(a: Column, b: Column): Column =
    udf((x: Array[Float], y: Array[Float]) =>
      if (x == null || y == null) null else cosine(x, y)).apply(a, b)

  def dotCol(a: Column, b: Column): Column =
    udf((x: Array[Float], y: Array[Float]) =>
      if (x == null || y == null) null else Double.box(dot(x, y))).apply(a, b)

  /** struct(scale, max_abs_err, cos_fidelity) of the int8 round trip —
    * per-row, shuffle-free, embarrassingly parallel. */
  def int8MetricsCol(v: Column): Column =
    udf((x: Array[Float]) => if (x == null) null else int8Metrics(x)).apply(v)
}
