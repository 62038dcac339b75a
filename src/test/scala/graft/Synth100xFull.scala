package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway 100x (sf1-equivalent, ~60M-row lineitem) FULL-corpus synth
  * for the round-17 whole-engine two-decade sweep — run manually:
  * `sbt "Test/runMain graft.Synth100xFull"`, writes /tmp/graft100xf.
  *
  * All ten tables, id-offset replication at 100 reps with EVERY key
  * column (primary and foreign) shifted by the same `rep * 10^7`, so
  * referential joins stay consistent and every join/group fan-out stays
  * LINEAR in the replication factor: replica r's orders join replica
  * r's customers, each group key gains 100x rows but the group count
  * per replica is unchanged. Dates, categories, and measures are
  * untouched — calendar grids and category vocabularies keep their
  * production shape while row mass scales two decades.
  *
  * documents/embeddings reuse [[Synth100x]]'s method verbatim (the
  * id-offset caveat for embeddings lives there): run Synth100x for the
  * banded dedup/ANN family; this synth's documents/embeddings exist so
  * text/similarity members can run from ONE dir. */
object Synth100xFull {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft100xf"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val reps = spark.range(100).select(col("id").as("__r"))
    val OFF = 10000000L

    // every *key* column (suffix-matched) shifts by rep * OFF; the rest
    // pass through untouched
    val keyCols = Set(
      "r_regionkey", "n_nationkey", "n_regionkey",
      "c_custkey", "c_nationkey", "s_suppkey", "s_nationkey",
      "p_partkey", "o_orderkey", "o_custkey",
      "l_orderkey", "l_partkey", "l_suppkey",
      "event_id", "user_id", "doc_id", "vec_id")

    def rep(table: String, parts: Int): Unit = {
      val t = spark.read.parquet(s"$src/$table.parquet")
      val outCols = t.columns.map { c =>
        if (keyCols(c)) (col(c) + col("__r") * OFF).as(c) else col(c)
      }
      t.crossJoin(reps).select(outCols.toIndexedSeq: _*)
        .repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"SYNTH $table rows=" +
        spark.read.parquet(s"$out/$table.parquet").count())
    }

    rep("region", 1)
    rep("nation", 1)
    rep("customer", 4)
    rep("supplier", 1)
    rep("part", 2)
    rep("orders", 16)
    rep("lineitem", 64)
    rep("events", 16)
    rep("documents", 32)

    // embeddings: the Synth100x planted-family method (id-offset copies
    // past 10x are degenerate for SRP bucketing — see Synth100x's doc)
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val fresh = expr(
      """transform(sequence(0, 63), j ->
        |  cast((pmod(hash(vec_id, j, __r), 1000003) / 1000003.0 - 0.5)
        |       * 0.5 as float))""".stripMargin)
    val perturbed = expr(
      """zip_with(embedding,
        |  transform(sequence(0, 63), j ->
        |    cast((pmod(hash(vec_id, j, __r, 7), 1000003) / 1000003.0 - 0.5)
        |         * 0.06 as float)),
        |  (x, e) -> cast(x + e as float))""".stripMargin)
    emb.crossJoin(reps).select(
        (col("vec_id") + col("__r") * OFF).as("vec_id"),
        when(col("__r") === 0, col("embedding"))
          .when(col("vec_id") % 33 === 0, perturbed)
          .otherwise(fresh).as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println("SYNTH embeddings rows=" +
      spark.read.parquet(s"$out/embeddings.parquet").count())
    spark.stop()
  }
}
