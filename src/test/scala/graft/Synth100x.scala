package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway 100x (sf1-equivalent) corpus synth for the SURVEY §8
  * dedup/ANN two-decade sweep — run manually:
  * `sbt "Test/runMain graft.Synth100x"`, writes /tmp/graft100x.
  *
  * Only the two tables the banded family reads (documents,
  * embeddings). documents is the Synth10x id-offset method at 100
  * reps. embeddings CANNOT ride id-offset copies past 10x: identical
  * vectors share every SRP signature, so copy families grow one
  * unsplittable bucket per vector and the pair output itself goes
  * quadratic in the replication factor — a property of the synthetic,
  * not the operator. Instead: replica 0 keeps the real 2k vectors
  * (and their planted near-dup structure); replicas 1-99 draw fresh
  * deterministic pseudo-random vectors (hash-uniform per dim, the
  * corpus-realistic "mostly unrelated" mass), except every 33rd base
  * id, whose replicas are small perturbations of the parent — planted
  * near-dup families of bounded size (~4), keeping the true-pair
  * output LINEAR in n, which is the regime the pair-budget claim is
  * about. */
object Synth100x {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft100x"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val reps = spark.range(100).select(col("id").as("__r"))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.crossJoin(reps)
      .select((col("doc_id") + col("__r") * 10000000L).as("doc_id") +:
        docs.columns.filter(_ != "doc_id").map(col): _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println("SYNTH documents rows=" +
      spark.read.parquet(s"$out/documents.parquet").count())

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val rep = emb.crossJoin(reps)
    // murmur3 (`hash`), NOT an affine LCG: an affine per-dim generator
    // makes replica r and r+1 of one base id differ by a tiny constant
    // in every dim — 99-member near-identical families that no bucket
    // width can split (the first cut of this synth died exactly there)
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
    rep.select(
        (col("vec_id") + col("__r") * 10000000L).as("vec_id"),
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
