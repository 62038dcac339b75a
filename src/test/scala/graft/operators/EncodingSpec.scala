package graft.operators

import graft.SparkSpec

class EncodingSpec extends SparkSpec {
  import spark.implicits._

  test("targetEncode: out-of-fold means exclude the row's own fold exactly") {
    // folds are hash-assigned; recompute them the same way to build the
    // expected grid by hand
    def fold(id: Long, k: Int): Long =
      (math.floorMod(math.floorMod(id, 1000003L) * 1103515245L + 12345L,
        2147483647L)) % k
    val rows = (1L to 40L).map(i => ("c" + (i % 2), i, i * 10L))
    val df = rows.toDF("cat", "id", "t")
    val out = Encoding.targetEncode(df, "cat", "id", "t", folds = 3)
      .collect().map(r => (r.getAs[String]("category"), r.getAs[Long]("fold")) -> r)
      .toMap
    rows.groupBy(_._1).foreach { case (cat, rs) =>
      val byFold = rs.groupBy(r => fold(r._2, 3))
      val (nc, sc) = (rs.size.toLong, rs.map(_._3).sum)
      byFold.foreach { case (f, inFold) =>
        val r = out((cat, f))
        assert(r.getAs[Long]("n_in_fold") == inFold.size.toLong)
        val exp = (BigInt(sc - inFold.map(_._3).sum) * 1000000 /
          (nc - inFold.size)).toLong
        assert(r.getAs[Long]("enc_e6") == exp, s"$cat fold $f")
      }
    }
  }

  test("targetEncode: a single-fold category emits null (no out-of-fold evidence)") {
    // one row -> its category exists in exactly one fold
    val df = Seq(("solo", 7L, 100L), ("big", 1L, 10L), ("big", 2L, 20L),
      ("big", 3L, 30L), ("big", 4L, 40L), ("big", 5L, 50L), ("big", 6L, 60L))
      .toDF("cat", "id", "t")
    val out = Encoding.targetEncode(df, "cat", "id", "t", folds = 5)
      .filter($"category" === "solo").collect()
    assert(out.length == 1)
    assert(out.head.get(out.head.fieldIndex("enc_e6")) == null)
  }
}
