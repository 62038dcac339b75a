package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.functions.Cols
import graft.operators.{Collapse, Features}
import graft.text.TextHash

/** Pandas-parity laws (SURVEY §5 item 3) checked over generated inputs
  * (raw ScalaCheck `Properties` — picked up by sbt's test interface). */
object PropertySpec extends Properties("graft.laws") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val vals = Gen.listOfN(12, Gen.choose(-1e6, 1e6))
  private val weights = Gen.listOfN(12, Gen.choose(0.1, 100.0))

  property("weighted mean lies within [min,max] of contributing values") =
    forAll(vals, weights) { (vs, ws) =>
      val wm = vs.zip(ws).toDF("v", "w")
        .agg(Collapse.weightedMean(col("v"), col("w"))).collect().head.getDouble(0)
      wm >= vs.min - 1e-6 && wm <= vs.max + 1e-6
    }

  property("pctChange(1) on a gap-free grid equals the positional formula") =
    forAll(vals) { vs0 =>
      val vs = vs0.map(v => if (math.abs(v) < 1e-3) 1.0 else v)
      val df = vs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("t", "v")
      val got = df.select(Features.pctChange(col("v"), 1, Features.keyWindow(Nil, "t")))
        .orderBy("t").collect().drop(1).map(_.getDouble(0))
      val want = vs.sliding(2).map { case Seq(a, b) => (b / a - 1) * 100 }.toSeq
      got.zip(want).forall { case (g, w) =>
        math.abs(g - w) <= 1e-6 * math.max(1.0, math.abs(w))
      }
    }

  property("monthStart is idempotent and lands on day 1") =
    forAll(Gen.choose(0, 20000)) { days =>
      val r = Seq(days).toDF("d")
        .select(date_add(lit("1970-01-01").cast("date"), col("d")).as("d"))
        .select(Cols.monthStart(col("d")).as("m"))
        .select(col("m"), Cols.monthStart(col("m")).as("mm"), dayofmonth(col("m")).as("dom"))
        .collect().head
      r.getAs[java.sql.Date]("m") == r.getAs[java.sql.Date]("mm") && r.getAs[Int]("dom") == 1
    }

  property("minhash signatures deterministic, bounded, dup-invariant") =
    forAll(Gen.listOfN(8, Gen.alphaLowerStr.suchThat(_.nonEmpty))) { words =>
      val text = words.mkString(" ")
      val s1 = TextHash.minhashSig(text, 8, 3)
      val s2 = TextHash.minhashSig(text, 8, 3)
      s1.toSeq == s2.toSeq && s1.forall(h => h >= 0 && h < 4294967311L)
    }

  property("yeoJohnson(x, lambda) is monotone in x") =
    forAll(Gen.choose(-50.0, 50.0), Gen.choose(-50.0, 50.0), Gen.choose(-2.0, 4.0)) {
      (a, b, lam) =>
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        val (ylo, yhi) = (graft.stats.TimeSeriesStats.yeoJohnson(lo, lam),
          graft.stats.TimeSeriesStats.yeoJohnson(hi, lam))
        (hi - lo < 1e-12) || ylo <= yhi + 1e-9
    }

  property("codeMatches never returns null and NA maps to false") = Prop {
    val out = Seq(Some("8111"), Some("81"), Some("x"), None).toDF("c")
      .select(Cols.codeMatches(col("c"), Seq("x"), Seq("81")).as("m")).collect()
    out.map(_.getBoolean(0)).toSeq == Seq(true, true, true, false) &&
      out.forall(!_.isNullAt(0))
  }

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val docGen = Gen.choose(1, 40)
    .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  property("chunkDocs covers every token: stride-aligned prefixes reassemble the doc") =
    forAll(docGen, Gen.choose(1, 8), Gen.choose(0, 7)) { (doc, stride, extra) =>
      val size = stride + extra
      val toks = doc.split("\\s+").toSeq
      val chunks = graft.text.Corpus
        .chunkDocs(Seq((1L, doc)).toDF("id", "text"), "id", "text", size, stride)
        .orderBy("chunk_id").collect()
        .map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
      val nChunks = (toks.length - 1) / stride + 1
      // taking the first `stride` tokens of each window (all of the last)
      // reconstructs the document exactly — no token lost or duplicated
      val rebuilt = chunks.flatMap { case (k, _, text) =>
        val ts = text.split(" ").toSeq
        if (k == nChunks - 1) ts else ts.take(stride)
      }.toSeq
      chunks.length == nChunks &&
        chunks.forall { case (_, n, text) => text.split(" ").length == n && n <= size } &&
        rebuilt == toks
    }

  // fixed fixtures, not forAll: each sample is a full Spark job (window +
  // joins) — same runtime trade as the BPE law below
  property("removeDupSpans equals the brute-force reference on fixed corpora") = Prop {
    val n = 2
    val corpora = Seq(
      Seq("a b a b a", "b a b"),            // overlapping repeats within + across
      Seq("x y z x y", "z x y w", "w w w w"), // chained overlap; self-repeat run
      Seq("p q", "p q", "p q r"),           // whole-doc dups
      Seq("lone words only here")           // nothing duplicated
    )
    corpora.forall { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.text.Dedup.removeDupSpans(df, "doc_id", "text", n = n)
        .orderBy("doc_id").collect()
      val toks = docs.map(_.split("\\s+").toSeq)
      val counts = toks
        .flatMap(ts => ts.sliding(n).filter(_.size == n).map(_.mkString(" ")))
        .groupBy(identity).map { case (g, o) => g -> o.size }
      docs.indices.forall { i =>
        val ts = toks(i)
        val covered = (0 to ts.length - n)
          .filter(s => counts(ts.slice(s, s + n).mkString(" ")) >= 2)
          .flatMap(s => s until s + n).toSet
        val kept = ts.indices.filterNot(covered).map(ts)
        out(i).getLong(1) == covered.size.toLong &&
          out(i).getString(2) == kept.mkString(" ")
      }
    }
  }

  // fixed fixtures, not forAll: each sample is two full funnel jobs.
  // The ordering law: re-scan reach DOMINATES chained-min reach at every
  // stage (every chained anchor is itself a qualifying in-window event),
  // and the two semantics coincide when the gap is unbounded.
  property("rescan funnel reach >= chained reach per stage; equal unbounded") = Prop {
    import graft.operators.Funnel
    val stages = Seq("s0", "s1", "s2")
    // deterministic LCG event streams: 3 seeds x 2 gaps
    def stream(seed: Long): Seq[(String, Long, String)] = {
      var x = seed
      def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
      (0 until 120).map { _ =>
        val u = "u" + math.floorMod(next(), 8)
        val t = math.floorMod(next(), 40L)
        val s = "s" + math.floorMod(next(), 3)
        (u, t, s)
      }
    }
    Seq(1L, 7L, 42L).forall { seed =>
      val df = stream(seed).toDF("u", "t", "s")
      def reach(counts: org.apache.spark.sql.DataFrame): Map[Int, Long] =
        counts.collect().map(r => r.getAs[Int]("stage") -> r.getAs[Long]("n_reached")).toMap
      Seq(Some(5L), Some(15L)).forall { gap =>
        val ch = reach(Funnel.conversionCounts(df, Seq("u"), "t", "s", stages, gap))
        val rs = reach(Funnel.rescanConversionCounts(df, Seq("u"), "t", "s", stages, gap))
        stages.indices.forall(i => rs.getOrElse(i, 0L) >= ch.getOrElse(i, 0L))
      } && {
        val chOpen = reach(Funnel.conversionCounts(df, Seq("u"), "t", "s", stages))
        val rsOpen = reach(Funnel.rescanConversionCounts(df, Seq("u"), "t", "s", stages))
        chOpen == rsOpen
      }
    }
  }

  // fixed fixtures, not forAll: each sample runs several Spark jobs —
  // 100 ScalaCheck samples would dominate the suite's runtime
  property("drift/eval metrics respect their analytic bounds") = Prop {
    import graft.operators.Metrics
    val dists = Seq(
      Seq(("a", 1L), ("a", 2L), ("b", 8L), ("b", 9L)),      // separated
      Seq(("a", 1L), ("a", 5L), ("b", 1L), ("b", 5L)),      // identical
      Seq(("a", 1L), ("b", 1L), ("b", 2L), ("b", 3L)))      // size-skewed
    dists.forall { rows =>
      val df = rows.toDF("g", "v")
      val ks = Metrics.ksDrift(df, "g", "v").collect()
        .map(_.getAs[Long]("ks_e6"))
      val psi = Metrics.psiDrift(df, "g", "v", binWidth = 2L, nBins = 5)
        .collect().map(_.getAs[Long]("psi_e9"))
      // KS ∈ [0, 1e6]; PSI ≥ 0 (terms are sign-aligned, so no cancellation)
      ks.forall(k => k >= 0L && k <= 1000000L) && psi.forall(_ >= 0L)
    }
  }

  property("tokenEntropy is bounded by [0, ln n] and maxed by all-distinct docs") = Prop {
    val docs = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "a a b b c"),
      (4L, "x")).toDF("doc_id", "text")
    graft.text.TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .collect().forall { r =>
        val n = r.getAs[Long]("n_tokens")
        val h = r.getAs[Long]("entropy_e9")
        val hMax = math.floor(math.log(n.toDouble) * 1e9 + 0.5).toLong
        // ±1 slack: the two e9 quantizations can differ by one ulp-step
        h >= -1L && h <= hMax + 1L &&
          (r.getAs[Long]("n_distinct") != n || (h - hMax).abs <= 1L)
      }
  }

  property("groupedAuc is invariant under strictly monotone score transforms") = Prop {
    import graft.operators.Metrics
    // ranks (and ties) are all AUC sees, so any strictly increasing map of
    // the scores must leave every group's auc_e6 bit-identical
    val df = Seq(
      ("g1", 0.1, false), ("g1", 0.4, true), ("g1", 0.4, false),
      ("g1", 0.9, true), ("g2", 0.2, true), ("g2", 0.3, false),
      ("g2", 0.7, true), ("g2", 0.8, false), ("g2", 0.8, true))
      .toDF("g", "score", "label")
    def auc(d: org.apache.spark.sql.DataFrame) =
      Metrics.groupedAuc(d, Seq("g"), "score", "label").orderBy("g").collect()
        .map(r => (r.getString(0), r.getAs[Long]("auc_e6"))).toSeq
    val base = auc(df)
    base.nonEmpty && Seq(
      col("score") * 3 + 1, exp(col("score")), pow(col("score"), 3))
      .forall(t => auc(df.withColumn("score", t)) == base)
  }

  property("ksDrift is exactly 0 when every group has the same distribution") = Prop {
    import graft.operators.Metrics
    val rows = for (g <- Seq("a", "b", "c"); v <- Seq(1L, 2L, 3L, 5L, 8L);
                    _ <- 1 to 2) yield (g, v)
    val ks = Metrics.ksDrift(rows.toDF("g", "v"), "g", "v").collect()
    ks.length == 3 && ks.forall(_.getAs[Long]("ks_e6") == 0L)
  }

  property("chiSquare is exactly 0 on an independence-planted table") = Prop {
    import graft.operators.Profile
    // n(x,y) = f(x)·g(y) ⇒ every cell's o²·n/(r·c) collapses to o, so
    // χ² = Σo − n = 0 EXACTLY (integer-valued term, no quantization slack)
    val rows = for {
      (x, fx) <- Seq(("x1", 1), ("x2", 2), ("x3", 3))
      (y, gy) <- Seq(("y1", 1), ("y2", 4))
      _ <- 1 to fx * gy
    } yield (x, y)
    val out = Profile.chiSquare(rows.toDF("x", "y"), "x", "y").collect().head
    out.getAs[Long]("chi2_e6") == 0L && out.getAs[Long]("cramers_v_e6") == 0L
  }

  property("chiSquare emits null V (not Infinity) when a column has one level") = Prop {
    import graft.operators.Profile
    val out = Profile.chiSquare(
      Seq(("only", "y1"), ("only", "y2"), ("only", "y1")).toDF("x", "y"),
      "x", "y").collect().head
    out.isNullAt(out.fieldIndex("cramers_v_e6"))
  }

  property("spearman is invariant under strictly monotone transforms of either axis") = Prop {
    import graft.operators.Profile
    // rho sees only midranks, so cubing / affine-scaling an axis is a no-op
    val df = Seq(("g", 1L, 9L), ("g", 2L, 4L), ("g", 2L, 7L), ("g", 5L, 1L),
      ("g", 8L, 3L), ("g", 9L, 3L)).toDF("g", "x", "y")
    def rho(d: org.apache.spark.sql.DataFrame) =
      Profile.spearman(d, Seq("g"), "x", "y").collect().head.getAs[Long]("rho_e6")
    val base = rho(df)
    rho(df.withColumn("x", col("x") * col("x") * col("x"))) == base &&
      rho(df.withColumn("y", col("y") * 7 + 100)) == base
  }

  property("cohenKappa is symmetric in its raters") = Prop {
    import graft.operators.Metrics
    val df = Seq(("k", "a", "b"), ("k", "a", "a"), ("k", "b", "b"),
      ("k", "c", "a"), ("k", "c", "c"), ("k", "b", "a")).toDF("key", "r1", "r2")
    val k12 = Metrics.cohenKappa(df, Seq("key"), "r1", "r2").collect().head
    val k21 = Metrics.cohenKappa(df, Seq("key"), "r2", "r1").collect().head
    k12.getAs[Long]("kappa_e6") == k21.getAs[Long]("kappa_e6") &&
      k12.getAs[Long]("pe_e6") == k21.getAs[Long]("pe_e6")
  }

  property("theilSen shifts exactly with an added integer linear trend") = Prop {
    import graft.stats.Diagnostics
    // every pairwise slope gains exactly a·1e6 when y += a·t (integer a),
    // so the lower-median slope shifts by a·1e6 bit-exactly
    val ys = Seq(5L, 9L, 2L, 14L, 7L, 11L, 3L)
    def slope(add: Long) = Diagnostics.theilSen(
      ys.zipWithIndex.map { case (y, t) => ("k", t, (y + add * t).toDouble) }
        .toDF("k", "t", "v"), Seq("k"), "t", "v")
      .collect().head.getAs[Long]("slope_e6")
    val base = slope(0)
    slope(3) == base + 3000000L && slope(-2) == base - 2000000L
  }

  property("kaplanMeier survival is invariant under monotone duration relabeling") = Prop {
    import graft.operators.Survival
    // S depends on the ORDER of event times and the risk sets, not the
    // labels: squaring the (positive) durations preserves the s_e9 walk
    val df = Seq(("k", 2L, true), ("k", 3L, false), ("k", 5L, true),
      ("k", 5L, true), ("k", 8L, false)).toDF("key", "dur", "ev")
    def walk(d: org.apache.spark.sql.DataFrame) =
      Survival.kaplanMeier(d, Seq("key"), "dur", "ev").orderBy("duration")
        .collect().map(r => (r.getAs[Long]("n_risk"), r.getAs[Long]("s_e9"))).toSeq
    walk(df) == walk(df.withColumn("dur", col("dur") * col("dur")))
  }

  property("welchTTest is antisymmetric and zero on identical sides") = Prop {
    import graft.operators.Metrics
    val df = Seq(("k", "A", 10L), ("k", "A", 14L), ("k", "A", 9L),
      ("k", "B", 21L), ("k", "B", 17L), ("k", "B", 30L)).toDF("key", "g", "v")
    val ab = Metrics.welchTTest(df, Seq("key"), "g", "v", "A", "B").collect().head
    val ba = Metrics.welchTTest(df, Seq("key"), "g", "v", "B", "A").collect().head
    // floor quantization makes the negation exact only off the .5 grid;
    // allow the documented 1-ulp slack
    val anti = math.abs(ab.getAs[Long]("t_e4") + ba.getAs[Long]("t_e4")) <= 1
    val same = Seq(("k", "A", 5L), ("k", "A", 9L), ("k", "B", 5L), ("k", "B", 9L))
      .toDF("key", "g", "v")
    val z = Metrics.welchTTest(same, Seq("key"), "g", "v", "A", "B").collect().head
    anti && z.getAs[Long]("t_e4") == 0L &&
      ab.getAs[Long]("df_e4") == ba.getAs[Long]("df_e4")
  }

  property("averagePrecision is bounded and hits 1e9 exactly when positives lead") = Prop {
    import graft.operators.Metrics
    val df = Seq(("g", 1L, 9L, true), ("g", 2L, 8L, true), ("g", 3L, 7L, false),
      ("g", 4L, 6L, false), ("g", 5L, 5L, true)).toDF("g", "id", "s", "y")
    val r = Metrics.averagePrecision(df, Seq("g"), "s", "y", "id").collect().head
    val ap = r.getAs[Long]("ap_e9")
    val ordered = Metrics.averagePrecision(
      df.withColumn("s", when(col("y"), 100L).otherwise(1L)),
      Seq("g"), "s", "y", "id").collect().head.getAs[Long]("ap_e9")
    ap >= 0L && ap <= 1000000000L && ordered == 1000000000L
  }

  property("singleChangepoint gain is 0 on constant series and total-cost-bounded") = Prop {
    import graft.operators.Features
    val rows = (1 to 10).map(i => ("k", i, (i % 4 + 2).toLong))
    val r = Features.singleChangepoint(rows.toDF("k", "t", "v"),
      Seq("k"), "t", "v").collect().head
    val g = r.getAs[Long]("gain_e4")
    g >= 0L && g <= r.getAs[Long]("total_cost_e4")
  }

  property("isotonicCalibration is monotone and bounded by the rate range") = Prop {
    import graft.operators.Metrics
    val df = Seq((50000L, true), (150000L, false), (250000L, true),
      (350000L, false), (450000L, false), (650000L, true), (750000L, true),
      (850000L, false), (950000L, true), (950001L, true))
      .toDF("score_e6", "label")
    val out = Metrics.isotonicCalibration(df, "score_e6", "label")
      .orderBy("bin").collect()
    val iso = out.map(_.getAs[Long]("iso_e9"))
    iso.zip(iso.tail).forall { case (a, b) => b >= a } &&
      iso.forall(v => v >= 0L && v <= 1000000000L)
  }

  property("trimmedMean lies within [min, max] and equals the mean at zero trim") = Prop {
    import graft.operators.Sketch
    val vals = Seq(3L, 9L, 1L, 14L, 7L, 7L, 2L, 40L)
    val df = vals.map(("g", _)).toDF("g", "v")
    val t = Sketch.trimmedMean(df, Seq("g"), "v", trimPermille = 125)
      .collect().head.getAs[Long]("trimmed_mean_e6")
    val z = Sketch.trimmedMean(df, Seq("g"), "v", trimPermille = 0)
      .collect().head.getAs[Long]("trimmed_mean_e6")
    t >= vals.min * 1000000L && t <= vals.max * 1000000L &&
      z == vals.sum * 1000000L / vals.length
  }

  property("seasonalMannKendall is exactly 0 with no trend inside any phase") = Prop {
    import graft.stats.Diagnostics
    // pure seasonal cycle, constant within phase: S = 0, no_trend
    val rows = for (yr <- 0 until 5; ph <- 0 until 4)
      yield ("k", yr * 4 + ph, (ph * 100).toDouble)
    val r = Diagnostics.seasonalMannKendall(rows.toDF("k", "t", "v"),
      Seq("k"), "t", "v", period = 4).collect().head
    r.getAs[Long]("s_stat") == 0L && r.getAs[String]("trend") == "no_trend"
  }

  property("neymanSample never over-allocates the budget or a stratum") = Prop {
    import graft.text.Corpus
    val rows = (1L to 60L).map(i =>
      (s"s${i % 4}", i, (i * 37 % 200 + (i % 4) * 50).toDouble))
    val out = Corpus.neymanSample(rows.toDF("src", "id", "v"),
      "src", "id", "v", nTotal = 17)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.values.sum <= 17L && bySrc.values.forall(_ <= 15L)
  }

  property("brierDecomposition respects the Murphy identity within quantization slack") = Prop {
    import graft.operators.Metrics
    val df = (1L to 200L).map(i =>
      ((i * 48271L) % 1000001L, (i * 2654435761L) % 1000000L < (i * 48271L) % 1000001L))
      .toDF("score_e6", "label")
    val r = Metrics.brierDecomposition(df, "score_e6", "label").collect().head
    val lhs = r.getAs[Long]("brier_e6")
    val rhs = r.getAs[Long]("reliability_e6") - r.getAs[Long]("resolution_e6") +
      r.getAs[Long]("uncertainty_e6")
    // per-bin/per-row floors each shave < 1e-6; 10 bins + 3 readout
    // divisions bound the drift far under 1% of the e6 scale
    math.abs(lhs - rhs) < 10000L
  }

  // seeded corpora, not forAll (the BPE rationale below): each sample is
  // a full Spark join pipeline; three corpora × three thresholds cover
  // the completeness law without dominating the suite
  property("jaccardJoinComplete equals brute force on random corpora") = Prop {
    val rng = new scala.util.Random(42)
    (1 to 3).forall { trial =>
      val vocab = (1 to 10 + trial * 5).map(i => s"t$i")
      val docs = (1 to 30).map(i => (i.toLong * 7,
        (1 to 3 + rng.nextInt(10)).map(_ => vocab(rng.nextInt(vocab.size)))
          .mkString(" ")))
      val tE6 = Seq(300000L, 500000L, 800000L)(trial - 1)
      val got = graft.text.Dedup.jaccardJoinComplete(
          docs.toDF("doc_id", "text"), "doc_id", "text", tE6)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Long]("n_inter"))).toSet
      val sets = docs.map { case (id, t) => (id, t.split("\\s+").distinct.toSet) }
      val expect = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        i = (sa & sb).size
        if i * (1000000L + tE6) >= tE6 * (sa.size + sb.size)
      } yield (ia, ib, i.toLong)).toSet
      got == expect
    }
  }

  private def levRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // tiny alphabet -> dense near-matches, short and repetitive keys ->
  // the deletion channel carries most pairs; one trial per maxDist
  property("byEditDistanceQGram equals brute force at maxDist 0/1/2") = Prop {
    val rng = new scala.util.Random(7)
    (0 to 2).forall { d =>
      def w() = (1 to 1 + rng.nextInt(12))
        .map(_ => "abcd" (rng.nextInt(4))).mkString
      val left = (1 to 25).map(i => (i.toLong, w()))
      val right = (1 to 25).map(i => (i.toLong + 1000, w()))
      val got = graft.operators.FuzzyJoin.byEditDistanceQGram(
          left.toDF("lid", "lk"), right.toDF("rid", "rk"), "lk", "rk",
          payload = Seq("rid"), maxDist = d, q = 3)
        .select("lid", "rid", "edit_dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val expect = (for {
        (li, lk) <- left; (ri, rk) <- right
        e = levRef(lk, rk) if e <= d
      } yield (li, ri, e)).toSet
      got == expect
    }
  }

  // fixed fixtures, not forAll: learnMerges is a multi-job Spark loop per
  // sample — 100 ScalaCheck samples would dominate the suite's runtime
  property("BPE encode preserves content: symbols rejoin to the original words") = Prop {
    Seq("low lower lowest newest", "aaa aa a aaaa", "xyz", "ab ab ab ba b")
      .forall { doc =>
        val merges = graft.text.Bpe.learnMerges(
          Seq(doc).toDF("text"), "text", numMerges = 5, minPairCount = 1L)
        val enc = Seq(doc).toDF("t")
          .select(graft.text.Bpe.encodeCol(col("t"), merges)).head.getSeq[String](0)
        enc.mkString("") == doc.split(" ").mkString("")
      }
  }
}
