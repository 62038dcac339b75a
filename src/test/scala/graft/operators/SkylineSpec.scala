package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("pareto2d keeps exactly the non-dominated rows (hand case with ties)") {
    // maximize v, minimize c
    val df = Seq(
      ("a", 10L, 5L),  // frontier
      ("b", 10L, 7L),  // dominated by a (tie on v, worse c)
      ("c", 8L, 3L),   // frontier (worse v, better c)
      ("d", 8L, 3L),   // duplicate of c -> both survive (set semantics)
      ("e", 7L, 4L),   // dominated by c
      ("f", 12L, 9L),  // frontier (best v)
      ("g", 11L, 9L)   // dominated by f
    ).toDF("id", "v", "cost")
    val out = Skyline.pareto2d(df, "v", "cost").select("id")
      .as[String].collect().sorted
    assert(out.toSeq == Seq("a", "c", "d", "f"))
  }

  test("pareto2d equals the brute-force NOT-EXISTS definition on random data") {
    val df = spark.range(300).select(
      col("id"),
      (graft.functions.Cols.hash32(concat(lit("v"), col("id").cast("string"))) % 50).as("v"),
      (graft.functions.Cols.hash32(concat(lit("c"), col("id").cast("string"))) % 50).as("c"))
      .cache()
    val fast = Skyline.pareto2d(df, "v", "c").select("id").as[Long].collect().toSet
    val a = df.select(col("id").as("bid"), col("v").as("bv"), col("c").as("bc"))
    val dominated = a.join(df,
        col("v") >= col("bv") && col("c") <= col("bc") &&
          (col("v") > col("bv") || col("c") < col("bc")))
      .select("bid").distinct().as[Long].collect().toSet
    val brute = df.select("id").as[Long].collect().toSet -- dominated
    assert(fast == brute)
  }

  test("pareto2d is partitioning-independent (local prune is lossless)") {
    val df = spark.range(200).select(
      col("id"),
      (col("id") * 37 % 41).as("v"),
      (col("id") * 17 % 43).as("c"))
    val r1 = Skyline.pareto2d(df.repartition(1), "v", "c")
      .select("id").as[Long].collect().toSet
    val r7 = Skyline.pareto2d(df.repartition(7), "v", "c")
      .select("id").as[Long].collect().toSet
    assert(r1 == r7)
  }

  test("null criteria rows are excluded, not propagated") {
    val df = Seq[(java.lang.Long, java.lang.Long)]((10L, 1L), (null, 0L), (5L, null))
      .toDF("v", "c")
    assert(Skyline.pareto2d(df, "v", "c").count() == 1)
  }
}
