package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns + a typed metadata struct, with decode / feature
  * extraction staged as per-partition batch functions.
  *
  * The actual media decoding is STUBBED (no image/audio libraries in
  * this environment): `decodeStub` derives deterministic fake metadata
  * from the bytes. The Spark-side plumbing — schema, batch iteration,
  * partitioning — is real: swap `decodeStub` for a JNI/FFM decoder and
  * nothing else changes.
  *
  * Scale notes: payloads stay opaque binary end-to-end (never stringified,
  * never collected); decode runs inside mapPartitions so a real decoder
  * amortizes init per partition, and `spark.sql.files.maxPartitionBytes`
  * controls batch size against executor memory.
  */
object MultimodalOps {

  /** Canonical multimodal schema: id + payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** Wrap any table with a string column into the media schema (test
    * vehicle: utf-8 bytes stand in for an encoded image). */
  def asMedia(df: DataFrame, id: String, payloadText: String): DataFrame =
    df.select(
      col(id).cast(LongType).as("media_id"),
      encode(col(payloadText), "utf-8").as("payload"),
      struct(lit("application/octet-stream").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("n_frames")).as("meta"))

  /** STUB decoder: deterministic fake dimensions from payload bytes.
    * A real implementation would parse the container header here. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    if (payload == null || payload.isEmpty) (0, 0, 0)
    else {
      val b0 = payload(0) & 0xff
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      (64 + (b0 % 16) * 64, 64 + (b1 % 9) * 64, 1 + payload.length % 30)
    }
  }

  /** Per-partition decode pass: payload → (width, height, n_frames,
    * n_bytes). Batch-shaped like a real decoder (one iterator pass,
    * no per-row session setup). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaInt,
      org.apache.spark.sql.Encoders.scalaInt,
      org.apache.spark.sql.Encoders.scalaInt,
      org.apache.spark.sql.Encoders.scalaLong)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (w, h, f) = decodeStub(payload)
          (id, w, h, f, if (payload == null) 0L else payload.length.toLong)
        }
      }(enc)
      .toDF("media_id", "width", "height", "n_frames", "n_bytes")
  }

  /** Frame sampling plan for video-like payloads: every k-th frame index
    * up to n_frames — pure expressions over the decoded metadata. */
  def sampleFrameIndexes(decoded: DataFrame, everyK: Int): DataFrame =
    decoded.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(everyK))))

  /** Resize pass: (payload, target box) → resized payload + new dims,
    * aspect-preserving fit. The pixel work is STUBBED (the "resized"
    * payload is a deterministic truncation of the original bytes sized
    * like the real output would be); the Spark shape is real — a
    * per-partition batch map emitting binary, exactly where a real
    * scaler (JNI/FFM) would slot in, with output size proportional to
    * targetW·targetH so memory planning carries over. */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaInt,
      org.apache.spark.sql.Encoders.scalaInt,
      org.apache.spark.sql.Encoders.BINARY)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (w, h, _) = decodeStubPublic(payload)
          // aspect-preserving fit into the target box
          val scale =
            if (w <= 0 || h <= 0) 0.0
            else math.min(targetW.toDouble / w, targetH.toDouble / h)
          val (nw, nh) = (math.max(1, (w * scale).toInt),
            math.max(1, (h * scale).toInt))
          val outLen = math.min(
            if (payload == null) 0 else payload.length,
            math.max(1, nw * nh / 64))
          val out = if (payload == null) Array.empty[Byte]
                    else java.util.Arrays.copyOf(payload, outLen)
          (id, nw, nh, out)
        }
      }(enc)
      .toDF("media_id", "width", "height", "payload")
  }

  private[multimodal] def decodeStubPublic(payload: Array[Byte]): (Int, Int, Int) =
    decodeStub(payload)
}
