package graft.operators

import graft.SparkSpec
import graft.text.TextHash
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("below k distinct values the sketch reports the exact count") {
    val df = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("b", "z"))
      .toDF("g", "v")
    val out = Sketch.kmvDistinct(df, Seq("g"), "v", k = 8)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(3)))
    assert(out.toSeq == Seq(("a", 2.0, 2), ("b", 1.0, 1)))
  }

  test("estimate tracks the true cardinality within KMV error bounds") {
    val n = 20000
    val df = (1 to n).map(i => ("g", s"val_$i")).toDF("g", "v")
    val Array(row) = Sketch.kmvDistinct(df, Seq("g"), "v", k = 256).collect()
    val est = row.getAs[Double]("n_est")
    // SE = 1/sqrt(k-2) ~ 6.3%; allow 4 SE (~25%)
    assert(math.abs(est - n) / n < 0.25, s"estimate $est too far from $n")
    assert(row.getAs[Int]("n_kept") == 256)
  }

  test("the sketch is order- and partitioning-independent") {
    val vals = (1 to 5000).map(i => ("g", s"v$i"))
    val a = Sketch.kmvDistinct(vals.toDF("g", "v").repartition(1), Seq("g"), "v", k = 64)
      .collect()(0).toSeq
    val b = Sketch.kmvDistinct(
        scala.util.Random.shuffle(vals).toDF("g", "v").repartition(17), Seq("g"), "v", k = 64)
      .collect()(0).toSeq
    assert(a == b, "same multiset must sketch identically regardless of layout")
  }

  test("kth_hash is the k-th smallest distinct 60-bit md5 hash (oracle contract)") {
    val vals = (1 to 300).map(i => ("g", i.toString))
    val row = Sketch.kmvDistinct(vals.toDF("g", "v"), Seq("g"), "v", k = 16).collect()(0)
    val expected = vals.map(v => TextHash.hash60Md5(v._2)).distinct.sorted.apply(15)
    assert(row.getAs[Long]("kth_hash") == expected)
    val est = (16 - 1).toDouble * 1152921504606846976.0 / expected.toDouble
    assert(row.getAs[Double]("n_est") == math.floor(est * 100.0 + 0.5) / 100.0)
  }

  test("nulls are ignored, matching count(DISTINCT) semantics") {
    val df = Seq(("a", Option("x")), ("a", None), ("a", Option("y")))
      .toDF("g", "v")
    val out = Sketch.kmvDistinct(df, Seq("g"), "v", k = 8).collect()(0)
    assert(out.getAs[Double]("n_est") == 2.0)
  }

  test("aggregation plans with a partial merge (map-side combine), no distinct expand") {
    val df = Seq(("a", "x")).toDF("g", "v")
    val p = Sketch.kmvDistinct(df, Seq("g"), "v", k = 8)
      .queryExecution.executedPlan.toString
    // typed imperative aggregate -> ObjectHashAggregate partial+final pair
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) == 2,
      s"expected partial+final ObjectHashAggregate:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  // ------------------------------------------------------------- CMS

  test("CMS estimates equal true counts when the sketch is wide enough") {
    // 20 distinct values in a 4x1024 grid: collisions essentially
    // impossible for this fixed hash family (verified by equality)
    val df = (1 to 1000).map(i => s"v${i % 20}").toDF("val")
    val probes = (0 until 20).map(i => s"v$i").toDF("k")
    val out = Sketch.cmsEstimates(df, "val", probes, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == (0 until 20).map(i => s"v$i" -> 50L).toMap)
  }

  test("CMS never underestimates, and absent keys with an empty cell read zero") {
    // width 2: massive forced collisions
    val df = (1 to 90).map(i => s"x${i % 3}").toDF("val")
    val probes = Seq("x0", "x1", "x2").toDF("k")
    val out = Sketch.cmsEstimates(df, "val", probes, "k", width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.forall(_ >= 30L), s"CMS underestimated: $out")
    assert(out.values.forall(_ <= 90L), s"estimate above total mass: $out")
  }

  test("CMS is partitioning-independent (merge = elementwise add)") {
    val vals = (1 to 3000).map(i => s"k${i % 50}")
    val probes = Seq("k7", "k11", "k49").toDF("k")
    val a = Sketch.cmsEstimates(vals.toDF("val").repartition(1), "val", probes, "k")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Sketch.cmsEstimates(
        scala.util.Random.shuffle(vals).toDF("val").repartition(23), "val", probes, "k")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("CMS probe read matches a JVM replay of the affine hashes") {
    val df = (1 to 500).map(i => s"w${i % 10}").toDF("val")
    val probes = Seq("w3").toDF("k")
    val est = Sketch.cmsEstimates(df, "val", probes, "k")
      .collect()(0).getLong(1)
    // replay: every value's 4 cells, then w3's min cell
    val counters = collection.mutable.Map.empty[(Int, Int), Long].withDefaultValue(0L)
    for (i <- 1 to 500; row <- Sketch.CmsA.indices) {
      val hm = TextHash.hash60Md5(s"w${i % 10}") % Sketch.CmsP
      val b = (((Sketch.CmsA(row) * hm + Sketch.CmsB(row)) % Sketch.CmsP) % 1024).toInt
      counters((row, b)) += 1L
    }
    val hm3 = TextHash.hash60Md5("w3") % Sketch.CmsP
    val expect = Sketch.CmsA.indices.map { row =>
      counters((row, (((Sketch.CmsA(row) * hm3 + Sketch.CmsB(row)) % Sketch.CmsP) % 1024).toInt))
    }.min
    assert(est == expect)
  }

  // -------------------------------------------- binned quantiles

  test("binned quantile is the first bin edge reaching the rank") {
    // values 0..99 in one group, binWidth 10: p50 rank=50 -> cum hits 50
    // in bin 4 (values 40..49 make cum 50); p95 rank=95 -> bin 9
    val df = (0 until 100).map(v => ("g", v.toLong)).toDF("g", "v")
    val out = Sketch.binnedQuantiles(df, Seq("g"), "v", 10L, Seq(500, 950))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(out.toSeq == Seq((500, 40L, 100L), (950, 90L, 100L)))
  }

  test("binned quantile estimate is within one binWidth of the exact quantile") {
    val vals = (1 to 5000).map(i => (i * i * 7L) % 100000L)
    val df = vals.map(("g", _)).toDF("g", "v")
    val out = Sketch.binnedQuantiles(df, Seq("g"), "v", 1000L, Seq(500, 990))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    val sorted = vals.sorted
    for ((qp, est) <- out) {
      val exact = sorted((qp * vals.size + 999) / 1000 - 1)
      assert(est <= exact && exact < est + 1000L,
        s"p$qp: est bin [$est, ${est + 1000}) misses exact $exact")
    }
  }

  test("binned quantiles are partitioning-independent and per-group") {
    val rows = (1 to 2000).map(i => (s"g${i % 3}", (i * 13L) % 997L))
    val a = Sketch.binnedQuantiles(rows.toDF("g", "v").repartition(1),
        Seq("g"), "v", 50L, Seq(250, 750))
      .orderBy("g", "q_permille").collect().map(_.toSeq).toSeq
    val b = Sketch.binnedQuantiles(
        scala.util.Random.shuffle(rows).toDF("g", "v").repartition(19),
        Seq("g"), "v", 50L, Seq(250, 750))
      .orderBy("g", "q_permille").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.size == 6) // 3 groups x 2 quantiles
  }

  test("winsorize clips at exact order statistics and flags the tails") {
    // group g: values 1..100; p10 element = 10, p90 element = 90
    val df = (1 to 100).map(v => ("g", v.toLong)).toDF("g", "v")
    val out = Sketch.winsorize(df, Seq("g"), "v", 100, 900)
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[Long]("v_w"),
        r.getAs[Boolean]("is_low"), r.getAs[Boolean]("is_high")))
    assert(out.length == 100)
    assert(out.forall { case (v, w, lo, hi) =>
      w == math.min(math.max(v, 10L), 90L) && lo == (v < 10) && hi == (v > 90) })
    assert(out.count(_._3) == 9 && out.count(_._4) == 10)
  }

  test("winsorize bounds are exact rank elements even with duplicates") {
    val df = (Seq.fill(30)(5L) ++ Seq.fill(60)(7L) ++ Seq.fill(10)(1000L))
      .map(("g", _)).toDF("g", "v")
    // p50 rank=50 -> value 7 (cum: 5->30, 7->90); p95 rank=95 -> 1000
    val out = Sketch.winsorize(df, Seq("g"), "v", 500, 950)
      .agg(min("v_w"), max("v_w")).collect()(0)
    assert(out.getLong(0) == 7L && out.getLong(1) == 1000L)
  }

  test("madOutliers: hand-computed median/MAD and exact verdicts") {
    // g: values 1..9 plus an outlier 100 -> n=10, lower median = 5
    // devs: |1..9 - 5| ∪ |100-5| = {4,3,2,1,0,1,2,3,4,95}; sorted
    // 0,1,1,2,2,3,3,4,4,95 -> lower median (rank 5) = 2
    val df = ((1L to 9L) :+ 100L).map(("g", _)).toDF("g", "v")
    val out = Sketch.madOutliers(df, Seq("g"), "v", k = 2)
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[Long]("med"),
        r.getAs[Long]("mad"), r.getAs[Boolean]("is_outlier")))
    assert(out.forall(t => t._2 == 5L && t._3 == 2L))
    // |v-5| > 2*2=4 -> only 100 (dev 95); 1 and 9 sit exactly AT 4
    assert(out.filter(_._4).map(_._1).toSeq == Seq(100L))
  }

  test("madOutliers: non-integral values take the window path with identical verdicts") {
    // same data as the hand-computed case but DOUBLE-typed — exercises
    // the window branch (the integral grid kernel can't hold doubles)
    // and pins the two paths to the same med/mad/flags
    val df = ((1L to 9L) :+ 100L).map(v => ("g", v.toDouble)).toDF("g", "v")
    val out = Sketch.madOutliers(df, Seq("g"), "v", k = 2)
      .collect().map(r => (r.getAs[Double]("v"), r.getAs[Double]("med"),
        r.getAs[Double]("mad"), r.getAs[Boolean]("is_outlier")))
    assert(out.forall(t => t._2 == 5.0 && t._3 == 2.0))
    assert(out.filter(_._4).map(_._1).toSeq == Seq(100.0))
  }

  test("madOutliers is per-group and refuses colliding columns") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L), ("b", 30L), ("b", 50L))
      .toDF("g", "v")
    val meds = Sketch.madOutliers(df, Seq("g"), "v")
      .select("g", "med").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(meds == Map("a" -> 2L, "b" -> 30L))
    val e = intercept[IllegalArgumentException] {
      Sketch.madOutliers(df.withColumn("mad", col("v")), Seq("g"), "v") }
    assert(e.getMessage.contains("mad"))
  }

  test("merging per-shard KMV sketches equals the direct unsharded build") {
    val df = (1 to 3000).map(i => ("g" + i % 2, "v" + i % 997, i % 7)).toDF("g", "v", "shard")
    val direct = Sketch.kmvDistinct(df, Seq("g"), "v", k = 64)
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1),
        r.getLong(2), r.getInt(3)))
    val sharded = Sketch.kmvSketch(df, Seq("g", "shard"), "v", k = 64)
    val merged = Sketch.kmvMergeSketches(sharded, Seq("g"), "sketch", k = 64)
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1),
        r.getLong(2), r.getInt(3)))
    assert(merged.toSeq == direct.toSeq,
      "sketch(A ∪ B) must equal merge(sketch(A), sketch(B)) exactly")
  }

  test("kmvMergeSketches reads below-k groups as exact counts") {
    val df = Seq(("g", "a", 0), ("g", "b", 1), ("g", "a", 1)).toDF("g", "v", "shard")
    val merged = Sketch.kmvMergeSketches(
      Sketch.kmvSketch(df, Seq("g", "shard"), "v", k = 8), Seq("g"), "sketch", k = 8)
      .collect().head
    assert(merged.getAs[Double]("n_est") == 2.0) // {a, b}, deduped across shards
    assert(merged.getAs[Int]("n_kept") == 2)
  }

  test("the quantile shuffle carries bin counts, not rows") {
    val df = (0 until 100).map(v => ("g", v.toLong)).toDF("g", "v")
    val p = Sketch.binnedQuantiles(df, Seq("g"), "v", 10L, Seq(500))
      .queryExecution.executedPlan.toString
    // the (group, bin) aggregate must partially combine before its exchange
    val firstExchange = p.linesIterator.indexWhere(_.contains("Exchange hashpartitioning"))
    val aggsBelow = p.linesIterator.drop(firstExchange).count(_.contains("HashAggregate"))
    assert(aggsBelow >= 1, s"expected a partial aggregate below the exchange:\n$p")
  }

  test("kmvPairOverlaps: below-k pairs read exact set algebra") {
    // A = {1..10}, B = {6..15}: |A∪B| = 15, |A∩B| = 5, J = 1/3
    val df = ((1 to 10).map(("A", _)) ++ (6 to 15).map(("B", _)))
      .toDF("g", "v")
    val out = Sketch.kmvPairOverlaps(
      Sketch.kmvSketch(df, Seq("g"), "v", k = 64), "g", "sketch", k = 64)
      .collect().head
    assert(out.getAs[String]("g1") == "A" && out.getAs[String]("g2") == "B")
    assert(out.getAs[Int]("k_eff") == 15, "union below k is kept whole")
    assert(out.getAs[Double]("union_est") == 15.0, "below-k union is exact")
    assert(out.getAs[Int]("n_common") == 5, "membership in buffers is exact")
    assert(out.getAs[Long]("jaccard_e6") == 5L * 1000000 / 15)
    assert(out.getAs[Double]("inter_est") == 5.0, "J·|A∪B| = 5 exactly here")
  }

  test("kmvPairOverlaps estimates above-k overlaps within sketch error") {
    // two overlapping 5000-element sets, |A∩B| = 2000, k = 128
    val df = ((0 until 5000).map(i => ("A", s"x$i")) ++
      (3000 until 8000).map(i => ("B", s"x$i"))).toDF("g", "v")
    val out = Sketch.kmvPairOverlaps(
      Sketch.kmvSketch(df, Seq("g"), "v"), "g", "sketch")
      .collect().head
    assert(out.getAs[Int]("k_eff") == 128)
    assert(math.abs(out.getAs[Double]("union_est") - 8000) / 8000 < 0.3)
    assert(math.abs(out.getAs[Double]("inter_est") - 2000) / 2000 < 0.5,
      s"inter_est=${out.getAs[Double]("inter_est")}")
  }

  test("hllRegisters: rho is 1 + leading zeros of the top hash bits") {
    val df = (0 until 500).map(i => ("g", s"v$i")).toDF("g", "v")
    val regs = Sketch.hllRegisters(df, Seq("g"), "v", p = 6).collect()
    assert(regs.nonEmpty && regs.length <= 64, "at most 2^p register rows")
    regs.foreach { r =>
      val b = r.getAs[Long]("bucket"); val rho = r.getAs[Int]("rho")
      assert(b >= 0 && b < 64 && rho >= 1 && rho <= 55, s"bucket=$b rho=$rho")
    }
    // re-derive one register by hand from the hash definition
    val hk = graft.text.TextHash.hash60Md5("v0")
    val rest = hk / 64
    val expectRho = if (rest == 0) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
    val got = regs.find(_.getAs[Long]("bucket") == hk % 64).get.getAs[Int]("rho")
    assert(got >= expectRho, "the register is the max over its bucket's sub-stream")
  }

  test("merging per-shard HLL registers equals the direct unsharded build") {
    val df = (0 until 1000).map(i => ("g", s"v${i % 300}", i % 7)).toDF("g", "v", "shard")
    val direct = Sketch.hllRegisters(df, Seq("g"), "v", p = 6)
      .orderBy("bucket").collect().map(r => (r.getLong(1), r.getInt(2)))
    val merged = Sketch.hllMergeRegisters(
        Sketch.hllRegisters(df, Seq("g", "shard"), "v", p = 6), Seq("g"))
      .orderBy("bucket").collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(merged.toSeq == direct.toSeq,
      "max over rows is the HLL composition law — shard-merge must be exact")
  }

  test("hllEstimate lands within the standard error of the true cardinality") {
    // p=8 -> 256 registers, 1.04/sqrt(m) = 6.5% standard error
    val n = 20000
    val df = (0 until n).map(i => ("g", s"value-$i")).toDF("g", "v")
    val est = Sketch.hllEstimate(
      Sketch.hllRegisters(df, Seq("g"), "v", p = 8), Seq("g"), p = 8)
      .collect().head.getAs[Double]("n_est")
    assert(math.abs(est - n) / n < 0.2, s"estimate $est vs true $n")
  }

  test("hllEstimate uses linear counting in the sparse regime") {
    val df = (0 until 10).map(i => ("g", s"v$i")).toDF("g", "v")
    val est = Sketch.hllEstimate(
      Sketch.hllRegisters(df, Seq("g"), "v", p = 8), Seq("g"), p = 8)
      .collect().head.getAs[Double]("n_est")
    assert(est > 5 && est < 15, s"linear-counting estimate $est for 10 distinct")
  }

  test("weightedPercentiles: weighted median lands where cumulative weight crosses") {
    // values 1..4 with weights 1,1,1,7 -> total 10; p500 needs cumw>=5 -> value 4
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L), ("g", 4L, 7L))
      .toDF("g", "v", "w")
    val r = Sketch.weightedPercentiles(df, Seq("g"), "v", "w", Seq(100, 500, 1000))
      .collect().head
    assert(r.getAs[Long]("total_weight") == 10)
    assert(r.getAs[Long]("p100") == 1)  // cumw 1 >= 1
    assert(r.getAs[Long]("p500") == 4)  // unweighted median would be 2
    assert(r.getAs[Long]("p1000") == 4)
  }

  test("weightedPercentiles: uniform weights reduce to exact unweighted quantiles") {
    val df = (1L to 100L).map(v => ("g", v, 1L)).toDF("g", "v", "w")
    val r = Sketch.weightedPercentiles(df, Seq("g"), "v", "w", Seq(250, 500, 750))
      .collect().head
    assert(r.getAs[Long]("p250") == 25 && r.getAs[Long]("p500") == 50 &&
      r.getAs[Long]("p750") == 75)
  }

  test("weightedPercentiles fails loudly on non-positive weights; no row-scale window") {
    val bad = Seq(("g", 1L, 0L)).toDF("g", "v", "w")
    val e = intercept[Exception] {
      Sketch.weightedPercentiles(bad, Seq("g"), "v", "w", Seq(500)).collect() }
    assert(e.getMessage.contains("non-positive weight"))
    val ok = Seq(("g", 1L, 1L), ("g", 2L, 1L)).toDF("g", "v", "w")
    val plan = Sketch.weightedPercentiles(ok, Seq("g"), "v", "w", Seq(500))
      .queryExecution.executedPlan.toString
    // the round-17 scale contract: the only Window is the ≤1025-row
    // bucket-prefix sum — the row-scale per-key cumulative window (one
    // serial sort task per key) is gone; the in-bucket walk is fenced
    assert(plan.linesIterator.count(_.trim.startsWith("Window")) <= 1, plan)
    val analyzed = Sketch.weightedPercentiles(ok, Seq("g"), "v", "w", Seq(500))
      .queryExecution.analyzed.toString
    assert(analyzed.contains("raise_error") &&
      analyzed.contains("weightedPercentiles"), analyzed)
  }

  test("weightedPercentiles: crossing inside one value run and across buckets") {
    // wide value range (forces multiple buckets: range 1..2_000_000 over
    // 1024 buckets) with the crossing mass far from the bucket origin
    val df = Seq(("g", 1L, 10L), ("g", 1000000L, 10L), ("g", 2000000L, 80L))
      .toDF("g", "v", "w")
    val r = Sketch.weightedPercentiles(df, Seq("g"), "v", "w", Seq(100, 200, 900))
      .collect().head
    assert(r.getAs[Long]("total_weight") == 100)
    assert(r.getAs[Long]("p100") == 1L)        // cumw 10 >= 10
    assert(r.getAs[Long]("p200") == 1000000L)  // cumw 20 >= 20
    assert(r.getAs[Long]("p900") == 2000000L)
    // two keys, interleaved, one with a single value
    val df2 = Seq(("a", 5L, 1L), ("b", 7L, 3L), ("a", 9L, 1L)).toDF("g", "v", "w")
    val out = Sketch.weightedPercentiles(df2, Seq("g"), "v", "w", Seq(500, 1000))
      .orderBy("g").collect()
    assert(out(0).getAs[Long]("p500") == 5L && out(0).getAs[Long]("p1000") == 9L)
    assert(out(1).getAs[Long]("p500") == 7L && out(1).getAs[Long]("p1000") == 7L)
  }

  test("abcClassify: cumulative-share classes with integer boundaries") {
    // revenues 60, 25, 10, 5 (total 100): cum 60% -> A, 85% -> B(?), ...
    // with a=800, b=950: 600<=800 A, 850<=800? no -> <=950 B, 950<=950 B, 1000 C
    val df = Seq(("g", "i1", 60L), ("g", "i2", 25L), ("g", "i3", 10L), ("g", "i4", 5L))
      .toDF("g", "item", "rev")
    val out = Sketch.abcClassify(df, Seq("g"), "item", "rev")
      .orderBy("rank").collect()
    assert(out.map(_.getAs[String]("abc_class")).toSeq == Seq("A", "B", "B", "C"))
    assert(out.map(_.getAs[Long]("cum_permille")).toSeq == Seq(600L, 850L, 950L, 1000L))
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4))
  }

  test("gini: 0 for equality, (n-1)/n-scaled max for one-holder; negative fails") {
    val eq = Seq(("g", 5L), ("g", 5L), ("g", 5L), ("g", 5L)).toDF("g", "v")
    assert(Sketch.gini(eq, Seq("g"), "v").collect().head.getAs[Long]("gini_e6") == 0L)
    // one holder of everything among 4: G = (n-1)/n = 0.75
    val one = Seq(("g", 0L), ("g", 0L), ("g", 0L), ("g", 100L)).toDF("g", "v")
    assert(Sketch.gini(one, Seq("g"), "v").collect().head.getAs[Long]("gini_e6") == 750000L)
    val neg = Seq(("g", -1L)).toDF("g", "v")
    val e = intercept[Exception] { Sketch.gini(neg, Seq("g"), "v").collect() }
    assert(e.getMessage.contains("negative value"))
  }

  test("trimmedMean: tie-aware partial trim matches the hand calculation") {
    // values 1,2,2,2,100 with 20% trim each side: k = 1
    // bottom trims the single 1; top trims the single 100
    // mean of {2,2,2} = 2 exactly
    val df = Seq(("g", 1L), ("g", 2L), ("g", 2L), ("g", 2L), ("g", 100L))
      .toDF("g", "v")
    val r = Sketch.trimmedMean(df, Seq("g"), "v", trimPermille = 200)
      .collect().head
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("n_trimmed_each") == 1L)
    assert(r.getAs[Long]("trimmed_mean_e6") == 2000000L)
    // partial tie: values 5,5,5,9 with k = 1 -> trim ONE 5 and the 9:
    // mean of {5,5} = 5
    val tie = Seq(("t", 5L), ("t", 5L), ("t", 5L), ("t", 9L)).toDF("g", "v")
    val tr = Sketch.trimmedMean(tie, Seq("g"), "v", trimPermille = 250)
      .collect().head
    assert(tr.getAs[Long]("n_trimmed_each") == 1L)
    assert(tr.getAs[Long]("trimmed_mean_e6") == 5000000L)
    // zero trim reduces to the exact mean
    val z = Sketch.trimmedMean(df, Seq("g"), "v", trimPermille = 0)
      .collect().head
    assert(z.getAs[Long]("trimmed_mean_e6") == (107L * 1000000L) / 5L)
  }

  test("medianCi: hand-computed order-statistic bounds; bounds bracket the median") {
    // n=25, values 1..25: median = rank 13 -> 13
    // l = max(1, floor((25 - 1.96*5)/2)) = floor(7.6) = 7
    // u = min(25, ceil(1 + (25 + 9.8)/2)) = ceil(18.4) = 19
    val df = (1 to 25).map(i => ("k", i.toLong)).toDF("g", "v")
    val r = Sketch.medianCi(df, Seq("g"), "v").collect().head
    assert(r.getAs[Long]("n") == 25L)
    assert(r.getAs[Long]("median") == 13L)
    assert(r.getAs[Long]("lo") == 7L)
    assert(r.getAs[Long]("hi") == 19L)
    // heavily tied data: fences land on the tied value
    val tied = ((1 to 50).map(_ => ("t", 10L)) ++ Seq(("t", 99L))).toDF("g", "v")
    val rt = Sketch.medianCi(tied, Seq("g"), "v").collect().head
    assert(rt.getAs[Long]("median") == 10L)
    assert(rt.getAs[Long]("lo") == 10L && rt.getAs[Long]("hi") == 10L)
  }

  test("hillTailIndex: geometric tail alpha; light tail larger; ties and short keys null") {
    // p: x = (1000, 100, 10, 1), k=2: fence 10, ratios ln100 + ln10
    // -> alpha = 2/(3 ln 10) = 0.28953
    val p = Seq(("p", 1L, 1000L), ("p", 2L, 100L), ("p", 3L, 10L),
      ("p", 4L, 1L))
    val l = Seq(("l", 1L, 12L), ("l", 2L, 11L), ("l", 3L, 10L), ("l", 4L, 9L))
    val c = (1L to 4L).map(("c", _, 5L))
    val s = Seq(("s", 1L, 9L), ("s", 2L, 3L))
    val out = Sketch.hillTailIndex((p ++ l ++ c ++ s).toDF("g", "id", "v"),
        Seq("g"), "v", "id", k = 2)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    def e9(x: Double) = math.floor(math.log(x) * 1e9 + 0.5).toLong
    def alpha(rs: Seq[Double], k: Long) =
      math.floor(k.toDouble * 1.0e15 / rs.map(e9).sum.toDouble + 0.5).toLong
    assert(out("p").getAs[Long]("k_used") == 2L)
    assert(out("p").getAs[Long]("x_kplus1") == 10L)
    assert(out("p").getAs[Long]("tail_alpha_e6") ==
      alpha(Seq(100.0, 10.0), 2L))
    assert(math.abs(out("p").getAs[Long]("tail_alpha_e6") - 289530L) < 2)
    assert(out("l").getAs[Long]("tail_alpha_e6") ==
      alpha(Seq(1.2, 1.1), 2L))
    assert(out("l").getAs[Long]("tail_alpha_e6") >
      out("p").getAs[Long]("tail_alpha_e6"))
    val rc = out("c")
    assert(rc.get(rc.fieldIndex("tail_alpha_e6")) == null)
    val rs2 = out("s")
    assert(rs2.getAs[Long]("k_used") == 1L)
    assert(rs2.get(rs2.fieldIndex("tail_alpha_e6")) == null)
  }

  test("huberLocation: hand-computed 2-step IRLS — outlier downweighted, not trimmed") {
    // [1,2,3,100]: med 2, MAD 1, c = 1.345·1.4826 ≈ 1.994; the outlier
    // keeps weight c/98 ≈ 0.02 → m₂ ≈ 2.6647 (reference-traced e6 value);
    // [5,5,5]: MAD 0 degenerates safely (iterate stays at the median);
    // [0,10,20,30,1000,1000]: heavier contamination, still bounded
    val df = (Seq(1L, 2L, 3L, 100L).map(("a", _)) ++
      Seq(5L, 5L, 5L).map(("b", _)) ++
      Seq(0L, 10L, 20L, 30L, 1000L, 1000L).map(("c", _))).toDF("g", "v")
    val out = Sketch.huberLocation(df, Seq("g"), "v", iters = 2)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("med"), r.getAs[Long]("mad"),
          r.getAs[Long]("huber_e6")))).toMap
    assert(out("a") == ((4L, 2L, 1L, 2664669L)), s"a: ${out("a")}")
    assert(out("b") == ((3L, 5L, 0L, 5000000L)), s"b: ${out("b")}")
    assert(out("c") == ((6L, 20L, 10L, 26273114L)), s"c: ${out("c")}")
  }

  test("huberKernel: count near the Long-wrap boundary stays exact (BigInt widens first)") {
    // c = 1e10 at full weight w = 1e9: c·w = 1e19 > Long.MaxValue
    // (~9.22e18) — a Long product wraps NEGATIVE and corrupts the IRLS
    // sums; BigInt(c)·w is exact. Equal thirds at 94/100/106 keep
    // mad = 6 > 0 (no degenerate shortcut) and every cell crosses the
    // wrap boundary.
    val c1 = 10000000000L // 1e10
    val grid = Array((100L, c1), (106L, c1), (94L, c1))
    val (n, med, mad, h) = Sketch.huberKernel(grid, 2)
    assert(n == c1 * 3 && med == 100L && mad == 6L)
    // all three values sit inside the Huber width (hc ≈ 11.96 > 6), so
    // every weight is the full 1e9 and the M-location is the exact
    // weighted mean = (100 + 106 + 94) / 3 = 100
    assert(h == 100000000L, s"huber_e6=$h")
  }

  test("huberLocation: sits between the median and the mean under asymmetric contamination") {
    // spread base (MAD must be > 0 — a constant base degenerates to the
    // median by the c = 0 contract) + a 500-valued contaminating block
    val vals = (0 until 50).map(i => 95L + i % 10) ++ Seq.fill(10)(500L)
    val r = Sketch.huberLocation(vals.map(("k", _)).toDF("g", "v"), Seq("g"), "v").head()
    val h = r.getAs[Long]("huber_e6") / 1e6
    val mean = vals.sum.toDouble / vals.length
    assert(r.getAs[Long]("med") == 100L && r.getAs[Long]("mad") == 3L)
    assert(h > 100.0 && h < mean, s"huber=$h mean=$mean")
  }

  test("qnScale: hand-computed k-th pairwise difference, ties, and tiny keys") {
    // {1,3,6,10}: diffs sorted {2,3,4,5,7,9}, h=3 → k=3 → d₍₃₎ = 4
    val a = Seq(1L, 3L, 6L, 10L).map(("a", _))
    // {5,5,5,7}: three 0-diff ties then three 2s; k=3 → d₍₃₎ = 0
    val t = Seq(5L, 5L, 5L, 7L).map(("t", _))
    // n=2: the single pair IS the statistic (k=1)
    val two = Seq(4L, 9L).map(("two", _))
    // n=1: no pairs — key drops
    val one = Seq(42L).map(("one", _))
    val out = Sketch.qnScale((a ++ t ++ two ++ one).toDF("g", "v"),
        Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("one"))
    assert(out("a").getAs[Long]("n_pairs") == 6L)
    assert(out("a").getAs[Long]("k") == 3L)
    assert(out("a").getAs[Long]("dk") == 4L)
    assert(out("a").getAs[Long]("qn_e4") == 88876L) // ⌊2.2219·4·1e4+.5⌋
    assert(out("t").getAs[Long]("dk") == 0L && out("t").getAs[Long]("qn_e4") == 0L)
    assert(out("two").getAs[Long]("k") == 1L && out("two").getAs[Long]("dk") == 5L)
    assert(out("two").getAs[Long]("qn_e4") == 111095L)
  }
}
