package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each loader is a plain parquet scan so Catalyst keeps full pushdown
  * freedom: filters and column pruning written by downstream operators reach
  * the scan (`PushedFilters` / `ReadSchema` in `.explain("formatted")`).
  * At the 100 TB design point these map to partitioned parquet/ORC
  * directories; nothing here assumes a single file.
  */
object Tables {
  /** Resolved-relation cache, per session — the metastore model: a
    * production catalog (Hive/Delta/Iceberg) resolves a table's file
    * listing + schema once and reuses the relation across queries;
    * re-running `spark.read.parquet` per query instead pays ~90 ms of
    * driver-side listing + footer resolution PER TABLE REFERENCE
    * (round-17 drain-floor profile — ~0.1-0.3 s of fixed plan-build
    * cost on every query in the suite). The cached DataFrame is just
    * the immutable analyzed relation; downstream transforms build on
    * it without interference. Sound because the source dirs are
    * immutable for a session's lifetime (testdata is read-only; a
    * production swap of table contents goes through a NEW path or a
    * real catalog's snapshot mechanism). WeakHashMap on the session so
    * a stopped session's relations are collectable. */
  private val relCache = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()
  private def p(s: SparkSession, dir: String, name: String): DataFrame = {
    val m = relCache.synchronized {
      var inner = relCache.get(s)
      if (inner == null) {
        inner = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        relCache.put(s, inner)
      }
      inner
    }
    m.computeIfAbsent(s"$dir/$name",
      _ => s.read.parquet(s"$dir/$name.parquet"))
  }

  def region(s: SparkSession, dir: String): DataFrame   = p(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame   = p(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = p(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = p(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame     = p(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame   = p(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = p(s, dir, "lineitem")
  def documents(s: SparkSession, dir: String): DataFrame = p(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = p(s, dir, "embeddings")

  /** `events.ts` has shipped in two physical shapes across testdata
    * generations: parquet `TIMESTAMP(NANOS)` (which Spark's parquet reader
    * rejects outright — [PARQUET_TYPE_ILLEGAL] — so it is read as a raw
    * long via the legacy conf) and plain `TIMESTAMP(MICROS)`. Branch on
    * the loaded type and surface the same two columns either way:
    *   - `ts`    TimestampType at µs precision (nanos truncate by division —
    *             exactly DuckDB's nanos→µs semantics, so oracles agree),
    *   - `ts_ns` epoch-nanos long, for exact ordering/tiebreaks and the
    *             integral window arithmetic the queries build on.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = p(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case _ => // µs-precision timestamp (NTZ or LTZ; session tz is UTC)
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    }
  }
}
