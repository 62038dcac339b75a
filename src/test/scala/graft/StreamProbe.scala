package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway decomposition probe for the streaming-twin drain floor
  * (round-17 verdict task 1): times each phase of one representative
  * twin (q266 stream_nmi) under the bench's session shape, with
  * variants, so the fixed per-twin harness cost separates from the
  * operator cost. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "24h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    val d = "/root/testdata/sf0.1"
    def time[A](label: String)(fn: => A): A = {
      val t0 = System.nanoTime()
      val r = fn
      println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    // the StreamingCollapse symlink staging, replicated (it's private)
    val stagedDocs: String = {
      import java.nio.file.{Files, Paths}
      val src = Paths.get(s"$d/documents.parquet")
      val key = graft.text.TextHash.hash32(s"$d/documents").toHexString
      val dd = Paths.get(sys.props("java.io.tmpdir"), s"graft_stream_$key")
      Files.createDirectories(dd)
      val link = dd.resolve("documents.parquet")
      Files.deleteIfExists(link)
      Files.createSymbolicLink(link, src)
      dd.toString
    }
    val docsSchema = spark.read.parquet(s"$d/documents.parquet").schema

    // batch yardstick, warm
    def batchOnce(): Unit = {
      val cells = spark.read.parquet(s"$d/documents.parquet")
        .filter(col("lang").isNotNull && col("source").isNotNull)
        .withColumn("half", pmod(col("doc_id"), lit(2L)))
        .groupBy(col("half"), col("lang").as("__a"), col("source").as("__b"))
        .agg(count(lit(1)).as("__c"))
      operators.Metrics.nmiFromCells(cells, Seq("half")).orderBy("half")
        .write.format("noop").mode("overwrite").save()
    }
    batchOnce()
    time("batch: same agg + readout (warm)")(batchOnce())

    // batch scan+agg alone (sizes the addBatch overhead)
    def cellsBatch() = spark.read.parquet(s"$d/documents.parquet")
      .filter(col("lang").isNotNull && col("source").isNotNull)
      .withColumn("half", pmod(col("doc_id"), lit(2L)))
      .groupBy(col("half"), col("lang").as("__a"), col("source").as("__b"))
      .agg(count(lit(1)).as("__c"))
    cellsBatch().write.format("noop").mode("overwrite").save()
    time("batch: scan+agg only (warm)") {
      cellsBatch().write.format("noop").mode("overwrite").save()
    }

    def runTwin(tag: String, streamParts: String,
                readoutParts: Option[String],
                ckptShm: Boolean = false): Unit = {
      val name = s"probe_nmi_${tag.replaceAll("[^a-zA-Z0-9]", "_")}"
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, streamParts)
      val cells = spark.readStream
        .schema(docsSchema)
        .parquet(stagedDocs)
        .filter(col("lang").isNotNull && col("source").isNotNull)
        .withColumn("half", pmod(col("doc_id"), lit(2L)))
        .groupBy(col("half"), col("lang").as("__a"), col("source").as("__b"))
        .agg(count(lit(1)).as("__c"))
      val t0 = System.nanoTime()
      val writer = cells.writeStream.outputMode("complete").format("memory")
        .queryName(name)
      if (ckptShm)
        writer.option("checkpointLocation", s"/dev/shm/graft_probe_ckpt_$name")
      val q = writer.start()
      q.processAllAvailable()
      def idle() = !q.status.isTriggerActive && !q.status.isDataAvailable
      val deadline = System.nanoTime() + 5000000000L
      var settled = false
      while (!settled && System.nanoTime() < deadline) {
        if (idle()) { Thread.sleep(10); settled = idle() }
        else Thread.sleep(10)
      }
      q.stop()
      val tDrain = (System.nanoTime() - t0) / 1e9
      spark.conf.set(key, prev)
      readoutParts.foreach(p => spark.conf.set(key, p))
      val t1 = System.nanoTime()
      val ckpt = spark.table(name).localCheckpoint(true)
      operators.Metrics.nmiFromCells(ckpt, Seq("half"))
        .orderBy("half")
        .write.format("noop").mode("overwrite").save()
      val tRead = (System.nanoTime() - t1) / 1e9
      spark.conf.set(key, prev)
      q.recentProgress.lastOption.foreach { p =>
        println(s"    last batch durationMs=${p.durationMs}")
      }
      println(f"PROBE $tag%-40s drain=$tDrain%6.3f readout=$tRead%6.3f")
    }

    // warmup twin
    runTwin("warmup", "4", None)
    runTwin("baseline sp=4 ro=32", "4", None)
    runTwin("shm ckpt sp=4", "4", None, ckptShm = true)
    runTwin("shm ckpt sp=1", "1", None, ckptShm = true)
    runTwin("baseline again", "4", None)
    runTwin("shm ckpt again", "4", None, ckptShm = true)

    // trivial readout floor: drained table straight to noop
    locally {
      val name = "probe_trivial"
      val keyc = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(keyc)
      spark.conf.set(keyc, "4")
      val q = spark.readStream.schema(docsSchema).parquet(stagedDocs)
        .groupBy(col("lang")).agg(count(lit(1)).as("c"))
        .writeStream.outputMode("complete").format("memory")
        .queryName(name).start()
      q.processAllAvailable(); q.stop()
      spark.conf.set(keyc, prev)
      time("trivial readout: table -> noop") {
        spark.table(name).write.format("noop").mode("overwrite").save()
      }
      time("trivial readout: ckpt -> noop") {
        spark.table(name).localCheckpoint(true)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
