package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables — Spark's persisted co-location contract and the
  * canonical 100 TB answer to "this fact⋈fact join shuffles every run":
  * `bucketBy(n, keys)` pre-hash-partitions the DATA ON DISK, so any later
  * equi-join or aggregation on the bucket keys between tables with the
  * same bucket count reads co-located splits and plans NO Exchange. One
  * shuffle paid once at write time amortizes over every downstream run —
  * the batch analog of a co-partitioned streaming state store. (A
  * shuffle-free in-partition Sort remains on SMJ inputs: since Spark 3
  * the bucketed scan only reports its `sortBy` ordering under
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` with one
  * file per bucket — which [[writeBucketedTable]]'s repartition
  * guarantees, so flipping that conf removes the Sort too.)
  *
  * Spark-specific notes (no reference analog — the single-node reference
  * never shuffles): bucketing rides the session catalog (`saveAsTable`;
  * plain `save` silently drops bucket metadata), and the bucket hash is
  * Spark's Murmur3 of the key, so both sides must agree on key TYPE as
  * well as value (an int⋈bigint join re-shuffles). */
object Bucketing {

  /** Write `df` as an external bucketed parquet table at `path`.
    * Repartitions by the bucket keys first so each bucket lands in ONE
    * file — that is what lets a sorted bucketed scan satisfy the join's
    * ordering requirement without a Sort node. Overwrites both table
    * registration and files (idempotent per (table, path)). */
  def writeBucketedTable(df: DataFrame, table: String, path: String,
                         bucketCols: Seq[String], nBuckets: Int,
                         sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "writeBucketedTable needs >= 1 bucket column")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val repart = df.repartition(nBuckets, bucketCols.map(df.col): _*)
    val writer = repart.write.format("parquet").option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.isEmpty) writer
      else writer.sortBy(sortCols.head, sortCols.tail: _*)
    sorted.mode("overwrite").saveAsTable(table)
  }

  /** Read a bucketed table back with its bucket metadata (the catalog
    * carries it; `spark.read.parquet(path)` would lose it and re-shuffle). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
