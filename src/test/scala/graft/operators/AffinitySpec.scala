package graft.operators

import graft.SparkSpec

class AffinitySpec extends SparkSpec {
  import spark.implicits._

  // baskets: {a,b,c}, {a,b}, {a,c}, {b} -> n_b = 4
  private def baskets = Seq(
    (1, "a"), (1, "b"), (1, "c"),
    (2, "a"), (2, "b"),
    (3, "a"), (3, "c"),
    (4, "b")).toDF("basket", "item")

  test("coOccurrence counts pairs once per basket with exact lift/confidence") {
    val out = Affinity.coOccurrence(baskets, "basket", "item")
      .orderBy("item1", "item2").collect()
    val ab = out.find(r => r.getAs[String]("item1") == "a" &&
      r.getAs[String]("item2") == "b").get
    assert(ab.getAs[Long]("c12") == 2) // baskets 1, 2
    assert(ab.getAs[Long]("c1") == 3)  // a in 1,2,3
    assert(ab.getAs[Long]("c2") == 3)  // b in 1,2,4
    // lift = (2*4)/(3*3) = 0.888... -> 888888 scaled
    assert(ab.getAs[Long]("lift_e6") == 888888L)
    // conf = 2/3 -> 666666
    assert(ab.getAs[Long]("conf_e6") == 666666L)
    assert(out.length == 3) // ab, ac, bc
  }

  test("coOccurrence dedups repeated items within one basket") {
    val df = Seq((1, "a"), (1, "a"), (1, "b")).toDF("basket", "item")
    val r = Affinity.coOccurrence(df, "basket", "item").collect().head
    assert(r.getAs[Long]("c12") == 1)
    assert(r.getAs[Long]("c1") == 1)
  }

  test("coOccurrence minSupport filters rare pairs") {
    val out = Affinity.coOccurrence(baskets, "basket", "item", minSupport = 2)
      .orderBy("item1", "item2")
    assert(out.collect().map(r => (r.getAs[String]("item1"), r.getAs[String]("item2")))
      .toSeq == Seq(("a", "b"), ("a", "c"))) // bc occurs once and drops
  }

  test("coOccurrence fails loud on a mega-basket past maxBasketItems") {
    // the quadratic fan-out's skew-axis contract (GridFence convention):
    // one basket of 20 items under a bound of 8 raises the message
    // instead of building the pair array
    val mega = (1 to 20).map(i => (1, s"i$i")).toDF("basket", "item")
    val ex = intercept[Exception] {
      Affinity.coOccurrence(mega, "basket", "item", maxBasketItems = 8).collect()
    }
    var cur: Throwable = ex
    while (cur.getCause != null) cur = cur.getCause
    val msg = String.valueOf(cur.getMessage)
    assert(msg.contains("coOccurrence") && msg.contains("mega-baskets"), msg)
    // and within the bound the same data is untouched
    val ok = Affinity.coOccurrence(mega, "basket", "item", maxBasketItems = 32)
    assert(ok.count() == 20L * 19 / 2)
  }
}
