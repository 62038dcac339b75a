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
}
