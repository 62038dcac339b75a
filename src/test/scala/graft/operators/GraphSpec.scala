package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory replay of the exact integer iteration — the parity
    * reference for the distributed operator. */
  private def model(edges: Seq[(String, String)], iters: Int,
                    scale: Long = 1000000000000L): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size.toLong
    val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(deg.contains).map(r).sum
      val base = 3L * scale / (20L * n) + 17L * dang / (20L * n)
      val in = e.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => 17L * r(u) / (20L * deg(u)) }.sum }
      r = nodes.map(v => v -> (base + in.getOrElse(v, 0L))).toMap
    }
    r
  }

  private val diamond = Seq(
    ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a"))

  test("pageRank matches the integer-exact in-memory model") {
    val out = Graph.pageRank(diamond.toDF("s", "t"), "s", "t", iterations = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == model(diamond, 4))
  }

  test("dangling mass is redistributed (sink graph keeps total mass ~ scale)") {
    // star into a sink: b,c,d all point at z, z has no out-edges
    val sink = Seq(("b", "z"), ("c", "z"), ("d", "z"))
    val out = Graph.pageRank(sink.toDF("s", "t"), "s", "t", iterations = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == model(sink, 6))
    // without redistribution the sink graph would bleed ~85% of its mass
    // per round; with it the total stays within the integer-floor leak
    val total = out.values.sum
    val scale = 1000000000000L
    assert(total > scale - 6L * 4L * 20L && total <= scale,
      s"mass leaked beyond the floor bound: $total of $scale")
    // the sink must outrank its feeders
    assert(out("z") > out("b"))
  }

  test("parallel edges collapse and the result is partitioning-independent") {
    val dup = diamond ++ diamond ++ diamond
    val a = Graph.pageRank(dup.toDF("s", "t").repartition(13), "s", "t", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Graph.pageRank(diamond.toDF("s", "t").repartition(1), "s", "t", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("pagerank column is the scaled value through one exact division") {
    val row = Graph.pageRank(diamond.toDF("s", "t"), "s", "t", 2)
      .filter($"node" === "a").collect()(0)
    assert(row.getDouble(2) == row.getLong(1).toDouble / 1.0e12)
  }

  test("driver fast path and forced-distributed loop are bit-identical") {
    // deterministic 30-node multigraph with dangling sinks
    val g = (1 to 400).map(i => (s"n${i * 7 % 31}", s"n${i * i % 37 % 31}"))
    def run(thr: Long) = Graph.pageRank(g.toDF("s", "t"), "s", "t",
        iterations = 3, driverMaxEdges = thr)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val driver = run(Long.MaxValue)
    val dist = run(0L) // forces the distributed loop
    assert(driver == dist,
      "driver kernel must replay the distributed integer recursion exactly")
    assert(driver.map(t => t._1 -> t._2).toMap == model(g, 3))
  }

  /** Brute-force triangle reference: all node triples, each checked
    * against the undirected edge set. */
  private def triModel(edges: Seq[(String, String)]): Map[String, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap).distinct.toSet
    val nodes = und.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val has = (a: String, b: String) => und(if (a < b) (a, b) else (b, a))
    val counts = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      if has(nodes(i), nodes(j)) && has(nodes(j), nodes(k)) && has(nodes(i), nodes(k))
    } { counts(nodes(i)) += 1; counts(nodes(j)) += 1; counts(nodes(k)) += 1 }
    counts.toMap
  }

  test("triangleCounts matches brute force on a known graph") {
    // two triangles sharing edge b-c, plus a pendant and a self-loop
    val g = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("c", "d"),
      ("d", "e"), ("e", "e"))
    val out = Graph.triangleCounts(g.toDF("s", "t"), "s", "t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 1L, "b" -> 2L, "c" -> 2L, "d" -> 1L))
    assert(out == triModel(g))
  }

  test("triangleCounts ignores direction, multiplicity, and order") {
    // same graph with edges reversed, duplicated, and shuffled
    val g = Seq(("b", "a"), ("c", "b"), ("a", "c"), ("a", "b"), ("d", "b"),
      ("d", "c"), ("c", "d"))
    val out = Graph.triangleCounts(g.toDF("s", "t").repartition(7), "s", "t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == triModel(g))
  }

  test("triangleCounts on a pseudo-random graph matches brute force") {
    // deterministic 20-node graph, dense enough for many triangles
    val g = (1 to 300).map { i =>
      (s"n${i * i % 401 % 20}", s"n${i * i * i % 401 % 20}") }
    val out = Graph.triangleCounts(g.toDF("s", "t"), "s", "t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = triModel(g)
    assert(exp.values.sum > 0, "degenerate fixture: no triangles")
    assert(out == exp)
  }

  test("adamicAdar: square graph — both diagonals scored, edges excluded, terms exact") {
    // square a-b-c-d-a: candidates are the two diagonals, each with two
    // common neighbors of degree 2 → aa = 2·⌊1e9/ln 2 + 0.5⌋
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    val out = Graph.adamicAdar(g.toDF("s", "t"), "s", "t").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val term = math.floor(1e9 / math.log(2.0) + 0.5).toLong // 1442695041
    assert(out.toSet == Set(("a", "c", 2L, 2 * term), ("b", "d", 2L, 2 * term)),
      s"got ${out.toSeq}")
  }

  test("adamicAdar: hub centers past maxDegree stop producing wedges") {
    // star: s connected to x1..x5 (deg 5). With maxDegree=4 the center
    // is excluded → no candidates at all; with the default it yields
    // all C(5,2) leaf pairs with the 1/ln 5 weight
    val star = (1 to 5).map(i => ("s", s"x$i"))
    val none = Graph.adamicAdar(star.toDF("s", "t"), "s", "t", maxDegree = 4L)
    assert(none.count() == 0L)
    val all = Graph.adamicAdar(star.toDF("s", "t"), "s", "t").collect()
    val term = math.floor(1e9 / math.log(5.0) + 0.5).toLong
    assert(all.length == 10 && all.forall(r => r.getLong(3) == term))
  }
}
