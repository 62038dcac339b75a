package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructType}

/** Range-bucketing of a per-key ORDER axis — the shared first move of
  * the bucketed-crossing rewrites (the q170 weightedPercentiles shape,
  * round 17): per-key sequential kernels (cumulative sums, lags,
  * first-crossing scans) written as one `Window.partitionBy(keys)` run
  * ONE SORT TASK PER KEY, so a few-keys/many-rows input (6 event types
  * × 10M rows at the 100× sweep) serializes onto a handful of cores
  * forever. Splitting each key's rows into ≤ `nBuckets` ORDER-RANGE
  * segments turns the same kernel into (keys × buckets) window tasks
  * plus a buckets-sized prefix stitch — parallelism no longer capped by
  * key count, and every per-row value still EXACT because each bucket's
  * entering prefix is reconstructed from per-bucket aggregates.
  *
  * Bucket id is monotone in the order leader and rows with EQUAL leader
  * values land in the SAME bucket, so (bucket, intra-bucket order) is
  * consistent with the global per-key order for any tie-breaker columns
  * ordered BELOW the leader.
  *
  * Contracts: the leader must be integral (epoch nanos/micros/longs —
  * doubles are rejected: a 2⁵³-exceeding epoch-nanos leader would round
  * at bucket boundaries and silently break the order/bucket consistency
  * above); keys must be few relative to rows (the per-key stats frame
  * broadcasts — a row-scale key set doesn't need this rewrite: its
  * parallelism axis IS the key count). A constant leader degrades to
  * one bucket per key = exactly the old per-key-serial behavior.
  */
object SegmentedOrder {

  /** The order LEADER of `orderCol`: the column itself when integral,
    * its first field when a struct whose first field is integral (the
    * `struct(ts, id)` uniqueness convention). */
  def leadOf(df: DataFrame, orderCol: String): Column = {
    def integral(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    df.schema(orderCol).dataType match {
      case s: StructType if integral(s.fields.head.dataType) =>
        col(orderCol).getField(s.fields.head.name).cast("long")
      case dt if integral(dt) => col(orderCol).cast("long")
      case dt => throw new IllegalArgumentException(
        s"SegmentedOrder: order leader of '$orderCol' must be integral " +
          s"(or a struct with an integral first field), got $dt")
    }
  }

  /** Adds `__bkt` ∈ [0, nBuckets) per key, monotone in `lead` (q170's
    * integer bucket arithmetic: width `(mx − mn + nBuckets) div
    * nBuckets`, never 0). One per-key min/max aggregate broadcasts back
    * onto the rows; no row-scale shuffle. */
  def withBuckets(df: DataFrame, keyCols: Seq[String], lead: Column,
                  nBuckets: Int = 1024): DataFrame = {
    require(keyCols.nonEmpty, "withBuckets needs at least one key column")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(!df.columns.contains("__bkt"),
      "withBuckets: input already carries a __bkt column")
    val k = keyCols.map(col)
    val stats = df.groupBy(k: _*)
      .agg(min(lead).as("__so_mn"), max(lead).as("__so_mx"))
      .withColumn("__so_bw",
        greatest(lit(1L), expr(s"(__so_mx - __so_mn + $nBuckets) div $nBuckets")))
      .select(k :+ col("__so_mn") :+ col("__so_bw"): _*)
    df.withColumn("__so_lead", lead)
      .join(broadcast(stats), keyCols)
      // `div`, not `/`: Column./ is DOUBLE division, and an epoch-nanos
      // leader cast through double rounds at 2^53 — integer div only
      .withColumn("__bkt", expr("(__so_lead - __so_mn) div __so_bw"))
      .drop("__so_lead", "__so_mn", "__so_bw")
  }
}
