package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline (driver north star):
  * image/audio/video as opaque `binary` payloads + typed metadata, with
  * decode / feature-extract / frame-sample as per-partition batch ops.
  *
  * The decode step is a clearly-marked STUB (no codec libraries in this
  * container): `StubDecoder` produces deterministic fake dimensions and
  * features from the payload bytes. The Spark-side plumbing is real and is
  * what is under test — binary schema, typed Datasets, `mapPartitions`
  * batching with a lazily-initialized per-partition decoder (the
  * executor-singleton pattern used for real codecs/models), and
  * explode-based frame sampling.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class DecodedMedia(doc_id: Long, media_type: String, width: Int,
    height: Int, n_frames: Int, features: Array[Float])

  /** Synthesize a media table from a text DataFrame: payload = UTF-8 bytes,
    * media_type round-robins image/audio/video by doc_id. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** STUB decoder — stands in for a real image/audio codec. Deterministic:
    * every derived value is a pure function of payload length/bytes, so the
    * metadata path is oracle-checkable end-to-end through mapPartitions. */
  class StubDecoder {
    def decode(m: MediaRow): DecodedMedia = {
      val len = m.payload.length
      val frames = m.media_type match {
        case "image" => 1
        case "audio" => 0
        case _ => 1 + (len % 7)
      }
      DecodedMedia(m.doc_id, m.media_type,
        width = 64 + len % 577,
        height = 48 + len % 433,
        n_frames = frames,
        features = TextImpl.pseudoEmbedding(
          new String(m.payload, java.nio.charset.StandardCharsets.UTF_8), 16))
    }
  }

  /** Decode + feature-extract via mapPartitions: the decoder is constructed
    * once per partition (in production: load codec/model once per executor
    * task, process rows in batch). */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      lazy val decoder = new StubDecoder // per-partition singleton
      rows.map(decoder.decode)
    }
  }

  /** Frame sampling: one row per sampled frame index (every `stride`-th). */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.filter(col("n_frames") > 0)
      .select(col("doc_id"), col("media_type"),
        explode(sequence(lit(0),
          greatest(col("n_frames") - 1, lit(0)), lit(stride)))
          .as("frame_idx"))

  /** "Resize": pure metadata transform keeping aspect ratio to a target
    * width (the real op would transform payload bytes per partition). */
  def resizeMeta(decoded: DataFrame, targetWidth: Int): DataFrame =
    decoded.withColumn("out_width", lit(targetWidth))
      .withColumn("out_height",
        round(col("height") * targetWidth / col("width")).cast("int"))
}
