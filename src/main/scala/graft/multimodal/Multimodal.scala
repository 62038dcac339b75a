package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators (builder brief): treat image/audio/video
  * payloads as opaque `binary` columns carried next to typed metadata
  * structs, with decode / feature-extract / resize / frame-sample stages.
  *
  * The image/audio codecs are NOT available in this container, so the
  * byte-level decode is a clearly-marked deterministic STUB
  * ([[stubDecodeBytes]]) — but everything Spark-side is real and tested:
  * the schema contract, the per-partition batch shape (`mapPartitions`
  * over an iterator, the JVM analog of `mapInPandas` batches), the
  * partition sizing guidance, and the columnar metadata math.
  *
  * Scale shape: payload bytes never shuffle. Every operator here is a
  * narrow per-row/per-partition transform that runs at scan speed; anything
  * aggregate (e.g. [[corpusStats]]) first projects payloads down to tiny
  * fixed-width features so the shuffle moves KB, not the 100 TB of media.
  * For real corpora, pair with `spark.sql.files.maxPartitionBytes` tuned so
  * one task's batch of decoded frames fits executor memory.
  */
object Multimodal {

  /** Typed metadata carried with each media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),  // image | audio | video
    StructField("format", StringType),      // e.g. png, wav, mp4
    StructField("width", IntegerType),      // image/video
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType), // audio
    StructField("n_frames", IntegerType)))   // video/audio frames

  /** Attach a payload byte-length + a content digest without decoding —
    * the cheap always-available columns for filtering/dedup at scale. */
  def withPayloadStats(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("payload_bytes", length(col(binCol)).cast("long"))
      .withColumn("payload_digest", md5(col(binCol)))

  /** ??? in spirit — STUB decode. A real deployment swaps this body for an
    * actual codec (javax.imageio / ffmpeg bindings); the signature and the
    * deterministic output shape are the contract the pipeline is built on.
    * Produces `dim` pseudo-feature floats derived from the payload bytes,
    * so downstream stages (normalize, embed, ANN) are exercised end-to-end
    * with stable values. */
  def stubDecodeBytes(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return null
    val out = new Array[Float](dim)
    var i = 0
    var acc = 1469598103934665603L // FNV-1a rolling over the payload
    while (i < bytes.length) {
      acc = (acc ^ (bytes(i) & 0xffL)) * 1099511628211L
      out(i % dim) += ((acc >>> 16) % 1000L) / 1000.0f
      i += 1
    }
    out
  }

  /** Decode + feature-extract stage: per partition, iterate payload rows in
    * batches and emit fixed-width feature vectors (the `mapInPandas` batch
    * shape on the JVM). Output schema: input columns minus the payload,
    * plus `features array<float>`. */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
                      dim: Int = 16): DataFrame = {
    val outSchema = StructType(
      df.schema.fields.filterNot(_.name == binCol) :+
        StructField("features", ArrayType(FloatType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val keepIdx = df.schema.fields.indices.filterNot(_ == binIdx)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val feats = stubDecodeBytes(r.getAs[Array[Byte]](binIdx), dim)
        Row.fromSeq(keepIdx.map(r.get) :+ (if (feats == null) null else feats.toSeq))
      }
    }(enc)
  }

  /** Resize stage (images): pure metadata math — output dims preserving
    * aspect ratio under a max edge; the pixel resample itself lives behind
    * the decode stub. Null-safe. */
  def resizePlan(meta: Column, maxEdge: Int): Column = {
    val w = meta.getField("width").cast("double")
    val h = meta.getField("height").cast("double")
    val scale = least(lit(1.0), lit(maxEdge.toDouble) / greatest(w, h))
    struct(
      round(w * scale).cast("int").as("out_width"),
      round(h * scale).cast("int").as("out_height"),
      round(scale, 6).as("scale"))
  }

  /** Frame-sample stage (video/audio): pick `k` evenly-spaced frame indices
    * from `n_frames` — a pure expression, explodable into per-frame rows
    * that the decode stage consumes. */
  def frameSampleIndices(meta: Column, k: Int): Column = {
    val n = meta.getField("n_frames")
    when(n.isNull || n <= 0, array().cast("array<int>"))
      .when(n <= k, sequence(lit(0), n - 1))
      .otherwise(transform(sequence(lit(0), lit(k - 1)),
        i => (i * n / k).cast("int")))
  }

  /** Corpus-level stats over extracted features: projects media down to
    * per-row scalars FIRST (narrow), then one small aggregate. */
  def corpusStats(feats: DataFrame, byCol: String): DataFrame =
    feats
      .withColumn("__fmean",
        aggregate(col("features"), lit(0.0), (a, v) => a + v.cast("double"))
          / greatest(size(col("features")), lit(1)))
      .groupBy(byCol)
      .agg(count(lit(1)).as("n"),
        avg(col("payload_bytes")).as("avg_bytes"),
        avg(col("__fmean")).as("avg_feature_mean"))
}
