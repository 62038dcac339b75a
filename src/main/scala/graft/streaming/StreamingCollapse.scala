package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming variant of the monthly/windowed collapse
  * (SURVEY §2.10 — an extension, the reference is batch-only).
  *
  * `readStream` over the events table → event-time tumbling windows with a
  * watermark → windowed aggregate. At scale this is the standing pipeline:
  * new parquet files landing in the directory are picked up incrementally,
  * state is bounded by the watermark, and the same aggregate expressions as
  * the batch collapse run per micro-batch.
  */
object StreamingCollapse {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as raw nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** FileStreamSource requires a *directory* basePath; the testdata ships a
    * single `events.parquet` file. Stage a symlink to it inside a temp
    * directory (per source dir, idempotent) — at scale the source is
    * already a directory of landing files and this staging disappears. */
  private def streamDir(dir: String): String = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(s"$dir/events.parquet")
    val d = Paths.get(sys.props("java.io.tmpdir"),
      "graft_stream_" + Integer.toHexString(dir.hashCode))
    Files.createDirectories(d)
    val link = d.resolve("events.parquet")
    if (!Files.exists(link)) Files.createSymbolicLink(link, src)
    d.toString
  }

  /** Tumbling weekly (7-day, epoch-aligned) per-event-type stats, run to
    * completion over the batch test file via the memory sink. Returns the
    * finished aggregate as a DataFrame — deterministic, oracle-checkable. */
  def weeklyEventStats(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftSession.tune(spark)
    val name = "graft_stream_weekly"
    spark.streams.active.filter(q => Option(q.name).contains(name)).foreach(_.stop())
    val agg = spark.readStream
      .schema(eventsSchema)
      .parquet(streamDir(dir))
      .withColumn("ets", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ets", "30 days")
      .groupBy(window(col("ets"), "7 days"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(to_date(col("window.start")).as("week"),
        col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name).orderBy("week", "event_type")
  }
}
