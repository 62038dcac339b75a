package graft

import org.apache.spark.sql.SparkSession

/** Session tuning applied at every engine entry point (idempotent, runtime
  * confs only — works on any externally-created session, e.g. the driver's
  * Verify/Bench runners).
  *
  *  - `ansi.enabled=false`: the engine's pandas-parity contract is
  *    coerce-to-null (casts, div-by-zero), matching both the reference's
  *    `errors="coerce"` semantics and DuckDB's null results.
  *  - `nanosAsLong`: lets the parquet reader accept TIMESTAMP(NANOS)
  *    columns (see [[graft.sources.Tables.events]]).
  *  - AQE on: runtime coalescing / skew-join handling is the 100 TB story;
  *    harmless at test scale.
  */
object GraftSession {
  def tune(spark: SparkSession): SparkSession = {
    // parity-critical: the DuckDB/pandas oracles are timezone-naive; a
    // session in local time would shift month/week boundaries of
    // timestamp-derived groupings on non-UTC hosts
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // AQE is the 100 TB story (runtime coalescing, skew joins) and stays the
    // default; GRAFT_AQE=false exists because at toy scale AQE's per-stage
    // re-planning and codegen is a measurable fixed cost per query.
    val aqe = sys.env.getOrElse("GRAFT_AQE", "true")
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", aqe)
    // Spark 4.1's async checkpoint-file checksum writer deadlocks stateful
    // streaming tasks in local mode (all task threads park in
    // ChecksumCancellableFSDataOutputStream.close awaiting a pool that
    // never runs). Integrity checksums on checkpoint files are an
    // operational nicety, not a correctness feature — off.
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    spark
  }
}
