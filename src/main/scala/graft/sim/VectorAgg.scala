package graft.sim

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Group-wise embedding aggregation as a typed [[Aggregator]] — the
  * custom-aggregate tier of the extension surface.
  *
  * The naive centroid plan (`posexplode` → `groupBy(key, dim)` → `avg`)
  * shuffles n×dim rows; this Aggregator keeps one fixed-size buffer per
  * (task, group) and benefits from map-side PARTIAL aggregation: each
  * executor pre-collapses its rows to one (sums, counts) buffer per
  * group, so the shuffle carries one ~dim-long array per group per map
  * task — the only shape that survives 100 TB of embeddings.
  *
  * Cross-engine determinism (the oracle problem): float sums depend on
  * summation order, which Spark does not fix across partitions. Elements
  * are therefore QUANTIZED to an integer grid first — `floor(x·scale+0.5)`
  * (the engine-portable rounding form, [[VectorOps.quantizeInt8]]'s
  * rationale) — and summed as LONGS, which are exact in any order. The
  * mean is reported on the same grid (`sum_q/n_dim`, one double division
  * of two exact integers — bit-identical in any engine).
  *
  * Ragged input: counts are PER DIMENSION (`ns(i)` = vectors that have
  * dimension i), so a short vector contributes only to the dimensions it
  * carries — the same per-(group, dim) count an unnest/posexplode
  * reference plan produces. `n` is the non-null vector count. */
object VectorAgg {

  /** Aggregation buffer: per-dimension quantized sums + per-dimension
    * presence counts + vector count. Arrays are null until the first
    * non-null vector. */
  final case class CentroidBuf(var sums: Array[Long], var ns: Array[Long], var n: Long)

  final case class Centroid(sums: Array[Long], ns: Array[Long], n: Long)

  /** Quantizing centroid aggregator. Vectors longer than `dim` are
    * truncated; shorter ones count only toward the dimensions they have;
    * null vectors are ignored (SQL avg convention). */
  final class QuantCentroid(dim: Int, scale: Double)
      extends Aggregator[Array[Float], CentroidBuf, Centroid] {

    override def zero: CentroidBuf = CentroidBuf(null, null, 0L)

    override def reduce(b: CentroidBuf, a: Array[Float]): CentroidBuf = {
      if (a != null) {
        if (b.sums == null) { b.sums = new Array[Long](dim); b.ns = new Array[Long](dim) }
        val n = math.min(dim, a.length)
        var i = 0
        while (i < n) {
          b.sums(i) += math.floor(a(i).toDouble * scale + 0.5).toLong
          b.ns(i) += 1L
          i += 1
        }
        b.n += 1
      }
      b
    }

    override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
      if (x.sums == null) y
      else if (y.sums == null) x
      else {
        var i = 0
        while (i < dim) { x.sums(i) += y.sums(i); x.ns(i) += y.ns(i); i += 1 }
        x.n += y.n
        x
      }
    }

    override def finish(b: CentroidBuf): Centroid =
      if (b.sums == null) Centroid(new Array[Long](dim), new Array[Long](dim), 0L)
      else Centroid(b.sums, b.ns, b.n)

    override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Centroid] = Encoders.product[Centroid]
  }

  /** Column form: `centroid(embedding)` → struct(sums: array<long>,
    * ns: array<long>, n: long) on the `scale` grid. Pair with posexplode
    * to read per-dimension means as `sums[i] / ns[i] / scale`. */
  def centroid(v: Column, dim: Int, scale: Double = 1e6): Column =
    udaf(new QuantCentroid(dim, scale)).apply(v)
}
