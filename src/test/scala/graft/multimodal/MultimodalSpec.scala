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
      Row(1L, "fake-png-bytes-aaaa".getBytes, Row("image", "png", 1920, 1080, null, null)),
      Row(2L, "fake-wav-bytes".getBytes, Row("audio", "wav", null, null, 44100, 88200)),
      Row(3L, null, Row("video", "mp4", 640, 480, null, 300)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("withPayloadStats: byte length + digest, null payload -> nulls") {
    val out = Multimodal.withPayloadStats(mediaDf, "content").orderBy("id").collect()
    assert(out(0).getAs[Long]("payload_bytes") === 19L)
    assert(out(0).getAs[String]("payload_digest").length === 32)
    assert(out(2).get(out(2).fieldIndex("payload_bytes")) == null)
  }

  test("extractFeatures: mapPartitions batch produces fixed-dim deterministic features") {
    val out1 = Multimodal.extractFeatures(mediaDf, "id", "content", dim = 8)
      .orderBy("id").collect()
    val out2 = Multimodal.extractFeatures(mediaDf.repartition(3), "id", "content", dim = 8)
      .orderBy("id").collect()
    val fi = out1(0).fieldIndex("features")
    assert(out1(0).getSeq[Float](fi).size === 8)
    assert(out1(0).getSeq[Float](fi) === out2(0).getSeq[Float](fi))
    assert(out1(2).get(out1(2).fieldIndex("features")) == null) // null payload passes through
    // payload column dropped, meta kept
    assert(!out1(0).schema.fieldNames.contains("content"))
    assert(out1(0).schema.fieldNames.contains("meta"))
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
      "id", "content", dim = 4)
      .withColumn("media_type", col("meta").getField("media_type"))
    val out = Multimodal.corpusStats(feats, "media_type").orderBy("media_type").collect()
    assert(out.map(_.getAs[String]("media_type")).toSeq === Seq("audio", "image"))
    assert(out.forall(_.getAs[Long]("n") === 1L))
  }
}
