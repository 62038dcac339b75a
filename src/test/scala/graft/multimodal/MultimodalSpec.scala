package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {

  private def mediaDf = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("content", BinaryType),
      StructField("meta", Multimodal.mediaMetaSchema)))
    val rows = Seq(
      Row(1L, Multimodal.plantedImage(1L), Row("image", "png", 1920, 1080, null, null)),
      Row(2L, "fake-wav-bytes".getBytes, Row("audio", "wav", null, null, 44100, 88200)),
      Row(3L, null, Row("video", "mp4", 640, 480, null, 300)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("withPayloadStats: byte length + digest, null payload -> nulls") {
    val out = Multimodal.withPayloadStats(mediaDf, "content").orderBy("id").collect()
    assert(out(0).getAs[Long]("payload_bytes") === Multimodal.plantedImage(1L).length.toLong)
    assert(out(0).getAs[String]("payload_digest").length === 32)
    assert(out(2).get(out(2).fieldIndex("payload_bytes")) == null)
  }

  test("decodeImageStats: real image round-trip recovers planted pixel sums exactly") {
    // plantedImage(2): w = 10, h = 8; channel (x, y) formulas are modular —
    // recompute the expected sums independently of the codec.
    val seed = 2L
    val (w, h) = ((8 + seed % 9).toInt, (6 + seed % 7).toInt)
    var er = 0L; var eg = 0L; var eb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      er += (31 * seed + 7 * x + 13 * y) % 256
      eg += (17 * seed + 11 * x + 5 * y) % 256
      eb += (23 * seed + 3 * x + 19 * y) % 256
    }
    val st = Multimodal.decodeImageStats(Multimodal.plantedImage(seed))
    assert(st.toSeq === Seq(w.toLong, h.toLong, er, eg, eb))
    // both lossless fixture formats decode to the SAME pixels (the q54
    // oracle depends only on decoded values, never on the byte container)
    val png = Multimodal.decodeImageStats(Multimodal.plantedImage(seed, "png"))
    assert(png.toSeq === st.toSeq)
  }

  test("decodeImageStats: null and undecodable payloads -> null, no throw") {
    assert(Multimodal.decodeImageStats(null) == null)
    assert(Multimodal.decodeImageStats("not an image".getBytes) == null)
  }

  test("withImageStats: image rows decode, non-image rows -> null stats") {
    val out = Multimodal.withImageStats(mediaDf, "content").orderBy("id").collect()
    assert(out(0).getAs[Long]("width") === 9L)  // 8 + 1 % 9
    assert(out(0).getAs[Long]("height") === 7L) // 6 + 1 % 7
    assert(out(0).getAs[Long]("sum_r") > 0L)
    assert(out(1).get(out(1).fieldIndex("width")) == null) // wav bytes: no decode
    assert(out(2).get(out(2).fieldIndex("width")) == null) // null payload
  }

  test("extractFeatures: real grid-luminance features, deterministic across partitionings") {
    val out1 = Multimodal.extractFeatures(mediaDf, "id", "content", grid = 2)
      .orderBy("id").collect()
    val out2 = Multimodal.extractFeatures(mediaDf.repartition(3), "id", "content", grid = 2)
      .orderBy("id").collect()
    val fi = out1(0).fieldIndex("features")
    assert(out1(0).getSeq[Float](fi).size === 4)
    assert(out1(0).getSeq[Float](fi) === out2(0).getSeq[Float](fi))
    assert(out1(0).getSeq[Float](fi).forall(v => v >= 0f && v <= 255f))
    assert(out1(1).get(out1(1).fieldIndex("features")) == null) // undecodable passes null
    assert(out1(2).get(out1(2).fieldIndex("features")) == null) // null payload passes null
    // payload column dropped, meta kept
    assert(!out1(0).schema.fieldNames.contains("content"))
    assert(out1(0).schema.fieldNames.contains("meta"))
  }

  test("gridLuminance: single-cell grid equals whole-image mean luminance") {
    val seed = 5L
    val st = Multimodal.decodeImageStats(Multimodal.plantedImage(seed))
    val expected = (st(2) + st(3) + st(4)).toDouble / (3.0 * st(0) * st(1))
    val g1 = Multimodal.gridLuminance(Multimodal.plantedImage(seed), grid = 1)
    assert(math.abs(g1(0) - expected) < 1e-4)
  }

  test("resizePlan: aspect-preserving bound by max edge; small images unscaled") {
    val out = mediaDf.select(col("id"), Multimodal.resizePlan(col("meta"), 960).as("r"))
      .orderBy("id").collect()
    val img = out(0).getStruct(1)
    assert(img.getAs[Int]("out_width") === 960)
    assert(img.getAs[Int]("out_height") === 540)
    val vid = out(2).getStruct(1)
    assert(vid.getAs[Int]("out_width") === 640) // already under max edge
  }

  test("frameSampleIndices: k evenly spaced frames, short/absent clips handled") {
    val out = mediaDf.select(col("id"), Multimodal.frameSampleIndices(col("meta"), 4).as("f"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Int](1) === Seq.empty) // image: no frames
    assert(out(2).getSeq[Int](1) === Seq(0, 75, 150, 225)) // 300 frames, k=4
  }

  test("sampleIndices (JVM) is formula-identical to frameSampleIndices (Column)") {
    // the single-parse video kernel derives indices in the JVM; a drift
    // from the Column planning form would silently desync q210's oracle
    val ks = Seq(1, 3, 4, 8)
    val ns = 0 to 40
    val schema = StructType(Seq(StructField("meta", Multimodal.mediaMetaSchema)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        ns.map(n => Row(Row("video", "gif", null, null, null, n)))), schema)
    ks.foreach { k =>
      val expr = df.select(Multimodal.frameSampleIndices(col("meta"), k))
        .collect().map(_.getSeq[Int](0).toSeq).toSeq
      val jvm = ns.map(n => Multimodal.sampleIndices(n, k))
      assert(expr == jvm, s"k=$k")
    }
  }

  test("frameSampleIndices: n_frames <= k returns all frames") {
    val schema = StructType(Seq(StructField("meta", Multimodal.mediaMetaSchema)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Row("video", "mp4", null, null, null, 3)))), schema)
    assert(df.select(Multimodal.frameSampleIndices(col("meta"), 8)).collect()
      .head.getSeq[Int](0) === Seq(0, 1, 2))
  }

  test("corpusStats: aggregates over extracted features") {
    val feats = Multimodal.extractFeatures(
      Multimodal.withPayloadStats(mediaDf.filter(col("content").isNotNull), "content"),
      "id", "content", grid = 2)
      .withColumn("media_type", col("meta").getField("media_type"))
    val out = Multimodal.corpusStats(feats, "media_type").orderBy("media_type").collect()
    assert(out.map(_.getAs[String]("media_type")).toSeq === Seq("audio", "image"))
    assert(out.forall(_.getAs[Long]("n") === 1L))
  }

  test("plantedImageCol: distributed fixture generation matches local") {
    import spark.implicits._
    val out = Seq(0L, 4L).toDF("id")
      .withColumn("content", Multimodal.plantedImageCol(col("id")))
      .orderBy("id").collect()
    assert(out(0).getAs[Array[Byte]]("content").toSeq === Multimodal.plantedImage(0L).toSeq)
    assert(out(1).getAs[Array[Byte]]("content").toSeq === Multimodal.plantedImage(4L).toSeq)
  }

  /** Closed-form dHash replay straight from the textured-fixture pixel
    * formulas — no decode. Decode-path parity against this IS the test
    * that the BMP round-trip is lossless and the cell math agrees. */
  private def dhashModel(seed: Long, gw: Int = 9, gh: Int = 7): Long = {
    val base = seed / 5; val v = seed % 5
    val w = (8 + base % 9).toInt; val h = (6 + base % 7).toInt
    val t = base % 11 + 3
    val sums = Array.ofDim[Long](gh, gw); val cnts = Array.ofDim[Long](gh, gw)
    for (y <- 0 until h; x <- 0 until w) {
      val xy = x.toLong * y
      val lum = (31 * base + 7L * x + 13L * y + xy * t + 3 * v) % 256 +
        (17 * base + 11L * x + 5L * y + xy * (t + 2)) % 256 +
        (23 * base + 3L * x + 19L * y + xy * (t + 5)) % 256
      sums(y * gh / h)(x * gw / w) += lum
      cnts(y * gh / h)(x * gw / w) += 1
    }
    var sig = 0L
    for (cy <- 0 until gh; cx <- 0 until gw - 1)
      if (sums(cy)(cx) * cnts(cy)(cx + 1) > sums(cy)(cx + 1) * cnts(cy)(cx))
        sig |= 1L << (cy * (gw - 1) + cx)
    sig
  }

  test("dHash of the decoded textured fixture matches the closed-form model") {
    for (seed <- Seq(0L, 7L, 38L, 123L, 4999L))
      assert(Multimodal.dHash(Multimodal.texturedImage(seed)) == dhashModel(seed),
        s"decode-path dHash diverged from pixel-formula model at seed $seed")
  }

  test("dHash is brightness-tolerant where md5 is not") {
    // brightness variants (same base) must sit far closer in Hamming
    // space than distinct bases — per-pair distances vary with where
    // the mod-256 wraparound lands, so assert the separation over 20
    // clusters, not one cherry-picked pair
    val sigs = (0L until 100L).map(s => s -> Multimodal.dHash(Multimodal.texturedImage(s)))
    val (within, cross) = (for {
      (sa, ha) <- sigs; (sb, hb) <- sigs if sa < sb
    } yield (sa / 5 == sb / 5, java.lang.Long.bitCount(ha ^ hb)))
      .partition(_._1)
    val wAvg = within.map(_._2).sum.toDouble / within.size
    val cAvg = cross.map(_._2).sum.toDouble / cross.size
    assert(wAvg * 4 < cAvg, s"no separation: within avg $wAvg, cross avg $cAvg")
    assert(within.count(_._2 <= 3) * 2 > within.size,
      "fewer than half the brightness variants landed within hamming 3")
    // and the payloads themselves all differ (md5 would dedup nothing)
    val payloads = (40L to 44L).map(s => Multimodal.texturedImage(s).toSeq)
    assert(payloads.distinct.size == 5)
  }

  test("dHash null-safety and grid bounds") {
    assert(Multimodal.dHash(null) == null)
    assert(Multimodal.dHash(Array[Byte](1, 2, 3)) == null) // undecodable
    intercept[IllegalArgumentException] { Multimodal.dHash(Multimodal.texturedImage(1L), 9, 8) }
  }

  test("resizeBoxAverage: boxes partition the source, means are div-floor exact") {
    val seed = 3L // w = 8 + 3 = 11, h = 6 + 3 = 9
    val out = Multimodal.resizeBoxAverage(Multimodal.plantedImage(seed), 4, 3)
    assert(out.length == 12)
    val w = (8 + seed % 9).toInt; val h = (6 + seed % 7).toInt
    def ch(f: (Long, Long) => Long)(ox: Int, oy: Int): Int = {
      val (x0, x1) = (ox * w / 4, (ox + 1) * w / 4)
      val (y0, y1) = (oy * h / 3, (oy + 1) * h / 3)
      val px = for (x <- x0 until x1; y <- y0 until y1) yield f(x, y)
      (px.sum / px.size).toInt
    }
    out.foreach { case (ox, oy, r, g, b) =>
      assert(r == ch((x, y) => (31 * seed + 7 * x + 13 * y) % 256)(ox, oy))
      assert(g == ch((x, y) => (17 * seed + 11 * x + 5 * y) % 256)(ox, oy))
      assert(b == ch((x, y) => (23 * seed + 3 * x + 19 * y) % 256)(ox, oy))
    }
    // partition property: box pixel counts sum to the full image
    val total = (0 until 3).flatMap(oy => (0 until 4).map { ox =>
      ((ox + 1) * w / 4 - ox * w / 4) * ((oy + 1) * h / 3 - oy * h / 3)
    }).sum
    assert(total == w * h)
  }

  test("resizeBoxAverage rejects upscaling") {
    intercept[IllegalArgumentException] {
      Multimodal.resizeBoxAverage(Multimodal.plantedImage(0L), 100, 3)
    }
  }

  test("plantedWav round-trips through a REAL WAV decode bit-exactly") {
    val seed = 7L
    val bytes = Multimodal.plantedWav(seed)
    // RIFF/WAVE container magic: a real file, not raw PCM
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val decoded = Multimodal.decodeWavSamples(bytes)
    val n = (4000 + (seed % 5) * 800).toInt
    assert(decoded.length == n)
    val expected = (0 until n).map(i =>
      (((seed * 2654435761L + i.toLong * 40503L) % 65536L) - 32768L).toInt)
    assert(decoded.toSeq == expected)
  }

  test("audioWindowStats: exact integer energy and zero crossings per window") {
    import spark.implicits._
    val df = Seq(1L, 9L).toDF("doc_id")
      .withColumn("content", Multimodal.plantedWavCol(col("doc_id")))
    val out = Multimodal.audioWindowStats(df, "doc_id", "content", windowSize = 1000)
      .collect().map(r => ((r.getLong(0), r.getInt(1)),
        (r.getAs[Long]("n_samples"), r.getAs[Long]("sumsq"),
         r.getAs[Long]("zero_crossings")))).toMap
    for (seed <- Seq(1L, 9L)) {
      val s = Multimodal.decodeWavSamples(Multimodal.plantedWav(seed))
      val nw = (s.length + 999) / 1000
      assert((0 until nw).forall { w =>
        val lo = w * 1000; val hi = math.min(lo + 1000, s.length)
        val sumsq = (lo until hi).map(i => s(i).toLong * s(i)).sum
        val zc = (lo + 1 until hi).count(i => (s(i) >= 0) != (s(i - 1) >= 0)).toLong
        out((seed, w)) == ((hi - lo).toLong, sumsq, zc)
      }, s"window stats mismatch for seed $seed")
    }
  }

  test("plantedVideo round-trips every frame through the REAL GIF decode") {
    for (seed <- Seq(0L, 3L, 7L, 42L)) {
      val bytes = Multimodal.plantedVideo(seed)
      // a real animated-GIF container, not a stub
      assert(new String(bytes.take(3), "US-ASCII") == "GIF")
      val n = (4 + seed % 4).toInt
      val meta = Multimodal.videoMeta(bytes)
      assert(meta.format == "gif" && meta.width == 16 && meta.height == 12 &&
        meta.n_frames == n, s"meta mismatch for seed $seed: $meta")
      // decode EVERY frame and check the closed form pixel-exactly
      val all = Multimodal.decodeVideoFrameStats(bytes, 0 until n)
      assert(all.map(_._1) == (0 until n))
      all.foreach { case (f, w, h, sum) =>
        assert(w == 16 && h == 12)
        val expected = (for (y <- 0 until 12; x <- 0 until 16)
          yield (29 * seed + 31L * f + 7L * x + 13L * y) % 256).sum
        assert(sum == expected, s"seed $seed frame $f: $sum != $expected")
      }
    }
  }

  test("videoFrameFeatures: header-probe sampling decodes only k frames") {
    import spark.implicits._
    val df = Seq(1L, 6L).toDF("doc_id")
      .withColumn("content", Multimodal.plantedVideoCol(col("doc_id")))
    val out = Multimodal.videoFrameFeatures(df, "doc_id", "content", k = 3)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getAs[Int]("n_frames"),
        r.getAs[Int]("frame_idx"), r.getAs[Long]("sum_gray"))).toSeq.sorted)
      .toMap
    for (seed <- Seq(1L, 6L)) {
      val n = (4 + seed % 4).toInt
      val fidx = (0 until 3).map(i => i * n / 3)
      val expected = fidx.map { f =>
        (n, f, (for (y <- 0 until 12; x <- 0 until 16)
          yield (29 * seed + 31L * f + 7L * x + 13L * y) % 256).sum)
      }.sorted
      assert(out(seed) == expected, s"sampled frames mismatch for seed $seed")
    }
  }
}
