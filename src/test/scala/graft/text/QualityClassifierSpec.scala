package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hashed-feature logistic quality classifier: feature kernel math,
  * separable-corpus recovery, and the filter contract. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("features: hashed L2-normalized counts, deterministic layout") {
    val f = QualityClassifier.features("a b a", dim = 64)
    assert(approx(f.map(_._2).map(v => v * v).sum, 1.0, 1e-12)) // unit norm
    assert(f.length <= 2 && f.length >= 1)                   // a,b may collide
    assert(f.toList == QualityClassifier.features("a b a", dim = 64).toList)
    assert(QualityClassifier.features("", 64).isEmpty)
    assert(QualityClassifier.features("   ", 64).isEmpty)
  }

  test("train separates a linearly separable corpus and filter keeps positives") {
    val pos = Seq.tabulate(20)(i => (s"clean informative prose article number $i", 1))
    val neg = Seq.tabulate(20)(i => (s"buy now spam click winner prize $i", 0))
    val df = (pos ++ neg).toDF("text", "label")
    val model = QualityClassifier.train(df, "text", "label", dim = 256, iters = 40)
    val scored = df.select(col("label"),
      QualityClassifier.scoreCol(col("text"), model).as("s")).collect()
    val posScores = scored.filter(_.getInt(0) == 1).map(_.getDouble(1))
    val negScores = scored.filter(_.getInt(0) == 0).map(_.getDouble(1))
    assert(posScores.min > negScores.max,
      s"separable corpus must separate: pos min ${posScores.min} vs neg max ${negScores.max}")
    val mid = (posScores.min + negScores.max) / 2
    val kept = QualityClassifier.filterByQuality(df, "text", model, mid)
    assert(kept.select(min(col("label"))).head.getInt(0) == 1) // only positives survive
    assert(kept.count() == 20)
  }

  test("null text scores null; empty text scores sigmoid(bias)") {
    val model = QualityClassifier.Model(new Array[Double](8), 0.0, 8)
    val out = Seq(Option("x y"), None).toDF("t")
      .select(QualityClassifier.scoreCol(col("t"), model)).collect()
    assert(approx(out(0).getDouble(0), 0.5, 1e-12)) // zero weights
    assert(out(1).isNullAt(0))
  }

  test("null-label rows are dropped from training, not decoder NPEs") {
    val df = Seq(("clean prose", Some(1)), ("spam spam", Some(0)),
      ("unlabeled text", None)).toDF("text", "label")
    val model = QualityClassifier.train(df, "text", "label", dim = 64, iters = 5)
    assert(model.weights.exists(_ != 0.0)) // trained on the labeled pair
  }

  test("naiveBayes separates a vocabulary-disjoint planted corpus") {
    // positive docs speak one vocabulary, negative another — every
    // training doc must score on its own side of 0
    val pos = (0 until 20).map(i => (i.toLong, s"good clean prose article $i", 1))
    val neg = (0 until 20).map(i => ((i + 100).toLong, s"spam junk noise garbage $i", 0))
    val df = (pos ++ neg).toDF("doc_id", "text", "label")
    val out = QualityClassifier.naiveBayes(df, "doc_id", "text", "label", dim = 128)
      .collect()
    assert(out.length == 40)
    out.foreach { r =>
      assert(r.getAs[Boolean]("pred") == (r.getAs[Int]("label") == 1),
        s"doc ${r.getLong(0)} label=${r.getAs[Int]("label")} " +
          s"score=${r.getAs[Long]("score_nn")}")
    }
  }

  test("perceptronSlice: hand-traced 3-iteration batch updates on a 4-doc corpus") {
    // words (cat, dog), target fish; w traced by hand through the three
    // batch updates: (0,0,0) → (0,0,−1) → (1,0,−1) → (−1,−1,−2); final
    // margins are all negative → tn=2 (the no-fish docs), fn=2, acc 50%
    val df = Seq("cat fish", "dog", "cat", "fish").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val r = QualityClassifier.perceptronSlice(df, "text",
      words = Seq("cat", "dog"), targetWord = "fish", iters = 3).head()
    assert(r.getAs[Long]("w0") == -1L)
    assert(r.getAs[Long]("w1") == -1L)
    assert(r.getAs[Long]("w2") == -2L)
    assert(r.getAs[Long]("tp") == 0L && r.getAs[Long]("fp") == 0L)
    assert(r.getAs[Long]("tn") == 2L && r.getAs[Long]("fn") == 2L)
    assert(r.getAs[Long]("acc_e6") == 500000L)
  }

  test("perceptronSlice: a linearly separable corpus converges to zero training error") {
    // target word co-occurs perfectly with 'good': after enough batch
    // rounds the margin splits cleanly (tp+tn = all, fp = fn = 0)
    val pos = (0 until 20).map(i => (i.toLong, s"good stuff fish item$i"))
    val neg = (20 until 40).map(i => (i.toLong, s"bad stuff item$i"))
    val df = (pos ++ neg).toDF("doc_id", "text")
    val r = QualityClassifier.perceptronSlice(df, "text",
      words = Seq("good", "bad", "stuff"), targetWord = "fish", iters = 6).head()
    assert(r.getAs[Long]("fp") == 0L && r.getAs[Long]("fn") == 0L,
      s"fp=${r.getAs[Long]("fp")} fn=${r.getAs[Long]("fn")}")
    assert(r.getAs[Long]("acc_e6") == 1000000L)
  }

  test("logisticSlice: hand-traced 3-iteration table-sigmoid GD on a 4-doc corpus") {
    // words (cat, dog), target fish; e6 weights traced by hand through
    // the three floor-div updates (σ from the shared table, z bucketed to
    // the nearest tenth): (0,0,0) → (0,0,−125000) → (6245,0,−243755) →
    // (18704,0,−356296); final z>0 decisions give tp=2 fp=1 tn=1 fn=0
    val df = Seq("cat fish", "dog", "cat", "fish").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val r = QualityClassifier.logisticSlice(df, "text",
      words = Seq("cat", "dog"), targetWord = "fish", iters = 3).head()
    assert(r.getAs[Long]("w0") == 18704L)
    assert(r.getAs[Long]("w1") == 0L)
    assert(r.getAs[Long]("w2") == -356296L)
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("fp") == 1L)
    assert(r.getAs[Long]("tn") == 1L && r.getAs[Long]("fn") == 0L)
    assert(r.getAs[Long]("acc_e6") == 750000L)
    // NLL is a pure table readout at the final buckets: d0/d2/d3 land in
    // bucket 0, d1 (z = −337592) in bucket −3
    val expectNll = QualityClassifier.nllPosTableE6(60) + // d0: y=1, b=0
      QualityClassifier.nllNegTableE6(57) +               // d1: y=0, b=−3
      QualityClassifier.nllNegTableE6(60) +               // d2: y=0, b=0
      QualityClassifier.nllPosTableE6(60)                 // d3: y=1, b=0
    assert(r.getAs[Long]("nll_e6") == expectNll)
  }

  test("logisticSlice: all-positive corpus drives weights up and nll below zero-init") {
    // every doc contains the target → err < 0 every round, weights grow,
    // final decision is positive for all docs; nll must beat the
    // zero-weight value n·(−ln σ(0))·1e6 = n·693147
    val df = Seq((0L, "fish a"), (1L, "fish b")).toDF("doc_id", "text")
    val r = QualityClassifier.logisticSlice(df, "text",
      words = Seq("a"), targetWord = "fish", iters = 3).head()
    assert(r.getAs[Long]("tp") == 2L && r.getAs[Long]("fn") == 0L)
    assert(r.getAs[Long]("acc_e6") == 1000000L)
    assert(r.getAs[Long]("nll_e6") < 2L * 693147L)
    assert(r.getAs[Long]("w0") > 0L)
  }

  test("logisticSlice: sigmoid/nll tables are consistent and symmetric") {
    val sig = QualityClassifier.sigmoidTableE6
    assert(sig.length == 121 && sig(60) == 500000L)
    // σ(−z) = 1 − σ(z) holds for the quantized table up to the half-ulp
    assert((0 until 121).forall(i => math.abs(sig(i) + sig(120 - i) - 1000000L) <= 1L))
    // monotone increasing, clamped range matches the documented bound
    assert(sig.sliding(2).forall(p => p(0) < p(1)))
    assert(sig.head == 2473L && sig.last == 997527L)
    assert(QualityClassifier.nllPosTableE6(60) == 693147L)
  }

  test("naiveBayes: a single-class corpus emits null scores, not overflow") {
    val df = (0 until 5).map(i => (i.toLong, s"only one class here $i", 1))
      .toDF("doc_id", "text", "label")
    val out = QualityClassifier.naiveBayes(df, "doc_id", "text", "label", dim = 64)
      .collect()
    assert(out.nonEmpty && out.forall(_.isNullAt(2)))
  }
}
