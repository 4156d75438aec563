package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with a typed metadata struct, processed in partition-sized
  * batches.
  *
  * The decode step is STUBBED (this container has no image/audio codecs
  * — builder-prompt instruction): [[fakeDecode]] is a deterministic
  * stand-in that derives "pixels" from the payload bytes. Everything
  * around it — the schema contract, the batch iterator shape
  * (`mapPartitions`, the Scala analog of `mapInPandas` batches), the
  * partitioning posture — is real and tested, so swapping in a real
  * codec is a one-function change.
  *
  * Scale posture: payloads stay opaque until the per-partition decode,
  * so Parquet scans of metadata-only queries never touch the bytes
  * (column pruning keeps `payload` out of the ReadSchema); decode
  * parallelism = partition count; no shuffle anywhere.
  */
object Multimodal {

  /** The multimodal column contract: binary payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = false), // image|audio|video
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Wrap any table into the media contract, deriving a deterministic
    * payload from a text column (the in-container stand-in for reading
    * real object bytes: same schema, same sizes, same plumbing). */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("image").as("kind"),
        (length(col(textCol)) % 640).cast("int").as("width"),
        (length(col(textCol)) % 480).cast("int").as("height"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** Output row of the per-batch feature extractor. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("head_hash", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = true)))

  /** STUB decode: a real implementation would decode image bytes here
    * (e.g. JPEG → HxWx3). This deterministic fake folds payload bytes
    * into a fixed-width "feature" so downstream code (ANN over features,
    * quality filters) is exercised end-to-end. */
  private[operators] def fakeDecode(payload: Array[Byte], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    out
  }

  /** Per-partition batch feature extraction — the `mapInPandas` analog:
    * one iterator in, one iterator out, batch = partition. Runs the
    * (stubbed) decode executor-side; the driver never sees payloads. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 8): DataFrame = {
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        Row(id,
          payload.length.toLong,
          graft.functions.CityHash.hash64(payload, 0, math.min(64, payload.length)),
          fakeDecode(payload, dim).toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Metadata-only stats — must NOT read payload bytes (column pruning;
    * assert via `.explain` that ReadSchema excludes `payload`). */
  def metaStats(media: DataFrame): DataFrame =
    media.groupBy(col("meta.kind").as("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        max(col("meta.width")).as("max_width"))

  /** STUB resize: a real implementation would decode, bilinear-resample
    * to (w, h), re-encode. The deterministic fake keeps the byte-volume
    * contract (output length = w*h) so downstream size accounting and
    * the batch shape are exercised for real. */
  private[operators] def fakeResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (payload.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = payload((i.toLong * payload.length / out.length).toInt)
        i += 1
      }
    }
    out
  }

  /** Batched resize over the media contract (same `mapPartitions` batch
    * shape as [[extractFeatures]]): payload replaced, metadata updated
    * to the new dimensions. Runs executor-side, one batch per
    * partition, no shuffle. */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int): DataFrame = {
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val resized = fakeResize(payload, w, h)
        Row(id, resized, Row("image", w, h, resized.length.toLong))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Frame sampling for "video" payloads: treat the payload as
    * fixed-size frame stripes and keep every `stride`-th frame — the
    * plumbing (per-row fan-out to multiple frame rows with typed frame
    * metadata) is the real part; the frame decode itself stays opaque
    * bytes. Output: (media_id, frame_idx, frame_bytes). */
  def sampleFrames(
      media: DataFrame,
      frameBytes: Int,
      stride: Int): DataFrame = {
    val nFrames = floor(length(col("payload")) / frameBytes).cast("int")
    media
      .filter(col("payload").isNotNull && nFrames > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), nFrames - 1, lit(stride))).as("frame_idx"),
        col("payload"))
      .select(col("media_id"), col("frame_idx"),
        call_function("substring",
          col("payload"), col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame_bytes"))
  }
}
