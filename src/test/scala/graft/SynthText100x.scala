package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway PERTURBED-TEXT 100x synth for the text-pairwise family —
  * run manually: `sbt "Test/runMain graft.SynthText100x [out] [reps]"`
  * (defaults /tmp/graft100xt, 100). Writes documents.parquet and
  * part.parquet only (the family touches no other table).
  *
  * Why a third synth: [[Synth100xFull]]'s id-offset replication copies
  * every text value VERBATIM 100x, so similarity-blocked members see
  * 100-sized exact-duplicate families — quadratic TRUE-pair output that
  * is a property of the synthetic, not the operator (the r17 session-1
  * exclusion list: q48/q55/q106/q116/q139/q257; the session-2 class-2
  * adjudications: q46/q59/q78/q79/q189/q322/q329). This synth rewrites
  * text per replica with a VOCABULARY BIJECTION: every whitespace token
  * either passes through or gains a replica-specific letter tag,
  * decided by hash(token, replica) — the same token always maps the
  * same way within a replica, so every within-replica token-set
  * relation (Jaccard, containment, shingle equality, token counts) is
  * preserved EXACTLY while two replicas share only ~1/16 of pairwise
  * token identity (each side keeps a token unmutated with prob 1/4;
  * tags never collide across replicas). Cross-replica Jaccard of a
  * doc and its own copy ≈ 0.0625/(2-0.0625) ≈ 0.03 — far below every
  * member's threshold and below LSH band-collision relevance, so true
  * pairs stay LINEAR in the replication factor: the shape a real 100x
  * corpus has.
  *
  * part.p_name (q139 fuzzy join, q392 ed-join) gains a per-replica
  * 8-letter suffix whose pairwise cross-replica Hamming distance is
  * >= 4: after the query's 1-char corruption, cross-replica edit
  * distance stays > maxDist 2, so fuzzy matches stay within-replica —
  * linear true matches, while block/candidate structure scales the way
  * a real 100x catalog would. */
object SynthText100x {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/graft100xt"
    val nReps = if (args.length > 1) args(1).toInt else 100
    require(nReps <= 100, "two tag letters span 100 replicas")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val reps = spark.range(nReps).select(col("id").as("__r"))
    val OFF = 10000000L

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val mutated = expr(
      """array_join(
        |  transform(split(trim(text), '\\s+'), t ->
        |    if(pmod(hash(t, __r), 4) = 0, t,
        |       concat(t, 'x', char(97 + __r div 10),
        |              char(97 + __r % 10)))),
        |  ' ')""".stripMargin)
    docs.crossJoin(reps).select(
        (col("doc_id") + col("__r") * OFF).as("doc_id"),
        mutated.as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .repartition(16)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println("SYNTHTEXT documents rows=" +
      spark.read.parquet(s"$out/documents.parquet").count())

    val part = spark.read.parquet(s"$src/part.parquet")
    part.crossJoin(reps).select(
        (col("p_partkey") + col("__r") * OFF).as("p_partkey"),
        concat(col("p_name"), lit(" "),
          expr("repeat(char(97 + __r div 10), 4)"),
          expr("repeat(char(97 + __r % 10), 4)")).as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    println("SYNTHTEXT part rows=" +
      spark.read.parquet(s"$out/part.parquet").count())
    spark.stop()
  }
}
