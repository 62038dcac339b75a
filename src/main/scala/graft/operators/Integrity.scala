package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-integrity digests — the lakehouse maintenance companion to
  * [[Cdc.tableDiff]]: `tableDiff` tells you WHICH rows differ between two
  * snapshots you can co-scan; a checksum is the O(1)-per-group digest you
  * ship when the twin table lives in another region/system and co-scanning
  * 100 TB twice is off the table (replication drift checks, post-migration
  * audits, "did the compaction lose rows").
  *
  * The digest is ORDER-INDEPENDENT by construction — commutative sums of
  * per-row md5 fingerprints — so any partitioning/shuffle of the same rows
  * produces the same digest, which is exactly what makes it comparable
  * across engines and layouts. Two independent modular channels plus
  * min/max/count make an accidental collision (a drift that preserves all
  * five readouts) practically impossible.
  */
object Integrity {

  /** 60-bit md5 row fingerprint over the given columns, each cast to
    * string and null-canonicalized to U+0000 (a literal NUL string
    * collides with a null — acceptable and documented; pick a sentinel
    * outside the domain for NUL-bearing data). Field separator U+0001
    * keeps `("ab","c")` distinct from `("a","bc")`. */
  def rowFingerprint(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*)), 1, 15), 16, 10)
      .cast("long")

  /** Per-group integrity digest: row count, two modular fingerprint sums
    * (primes 1e9+7 / 998244353 — each term < 2^30, so the long sum is
    * exact to ~2^33 rows per group), and the fingerprint min/max. ONE
    * aggregate with map-side combine; no sort, no window.
    *
    * Equal digests imply the same multiset of rows (up to md5 collision);
    * any inserted/dropped/mutated row flips at least the sums. */
  def tableChecksum(df: DataFrame, groupCols: Seq[String],
                    cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableChecksum needs at least one content column")
    val fp = rowFingerprint(cols.map(col))
    val grouped =
      if (groupCols.isEmpty) df.withColumn("__fp", fp).groupBy(lit("all").as("scope"))
      else df.withColumn("__fp", fp).groupBy(groupCols.map(col): _*)
    grouped.agg(
      count(lit(1)).as("n_rows"),
      sum(pmod(col("__fp"), lit(1000000007L))).as("digest_a"),
      sum(pmod(col("__fp"), lit(998244353L))).as("digest_b"),
      min(col("__fp")).as("fp_min"),
      max(col("__fp")).as("fp_max"))
  }
}
