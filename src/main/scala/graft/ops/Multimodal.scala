package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline (driver north star):
  * image/audio/video as opaque `binary` payloads + typed metadata, with
  * decode / feature-extract / frame-sample as per-partition batch ops.
  *
  * The IMAGE path is REAL: payloads are spec-valid PNG files (signature,
  * IHDR, deflated IDAT, CRC-checked chunks — see [[pngEncode]], built
  * from JDK primitives only) and the decoder recovers width/height by
  * parsing the IHDR chunk ([[pngDims]]), CRC verified — the header-probe
  * decode a real ingest pipeline runs before shelling out to a full
  * codec. MultimodalSpec referees both directions against the JDK's
  * independent ImageIO PNG codec.
  *
  * The AUDIO/VIDEO paths remain clearly-marked STUBS (no codec libraries
  * in this container): deterministic fake dimensions derived from the
  * payload bytes. The Spark-side plumbing is identical for all three —
  * binary schema, typed Datasets, `mapPartitions` batching with a
  * lazily-initialized per-partition decoder (the executor-singleton
  * pattern used for real codecs/models), and explode-based frame
  * sampling.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class DecodedMedia(doc_id: Long, media_type: String, width: Int,
    height: Int, n_frames: Int, features: Array[Float])

  private val PngSignature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Build a spec-valid PNG (8-bit RGB, zero pixels): signature + IHDR +
    * one deflated IDAT + IEND, each chunk CRC32-stamped per the PNG spec
    * (RFC 2083). JDK-only byte arithmetic — the committed-fixture-grade
    * encoder whose output ImageIO decodes (spec-refereed). */
  def pngEncode(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val out = new java.io.ByteArrayOutputStream(256)
    def be32(v: Int): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      val tb = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      out.write(be32(body.length)); out.write(tb); out.write(body)
      out.write(be32(crc.getValue.toInt))
    }
    out.write(PngSignature)
    chunk("IHDR", be32(width) ++ be32(height) ++
      Array[Byte](8, 2, 0, 0, 0)) // bit depth 8, color type 2 (RGB)
    // raw image: per scanline one filter byte (0 = None) + RGB zeros
    val raw = new Array[Byte](height * (1 + width * 3))
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](8192)
    val idat = new java.io.ByteArrayOutputStream(64)
    while (!deflater.finished())
      idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** REAL PNG header decode: validate the 8-byte signature, require IHDR
    * as the first chunk (the spec mandates it), verify its CRC, and read
    * the big-endian dimensions. Header-probe only — no pixel decode —
    * which is exactly the O(1) metadata pass an ingest pipeline runs
    * over billions of payloads before any full decode. */
  def pngDims(payload: Array[Byte]): (Int, Int) = {
    require(payload.length >= 33, "not a PNG: truncated")
    require((0 until 8).forall(i => payload(i) == PngSignature(i)),
      "not a PNG: bad signature")
    require(payload(12) == 'I' && payload(13) == 'H' &&
      payload(14) == 'D' && payload(15) == 'R',
      "not a PNG: first chunk is not IHDR")
    def be32(o: Int): Int =
      ((payload(o) & 0xff) << 24) | ((payload(o + 1) & 0xff) << 16) |
        ((payload(o + 2) & 0xff) << 8) | (payload(o + 3) & 0xff)
    val ihdrLen = be32(8)
    require(ihdrLen == 13, s"not a PNG: IHDR length $ihdrLen")
    val crc = new java.util.zip.CRC32()
    crc.update(payload, 12, 4 + ihdrLen)
    require(crc.getValue.toInt == be32(16 + ihdrLen),
      "not a PNG: IHDR CRC mismatch")
    (be32(16), be32(20))
  }

  // Image dims derived from the text length (the oracle re-derives them
  // from length(text); the gate proves the PNG encode->decode round-trip
  // lands back on the formula). Kept small: payload cost is O(w*h).
  private[ops] def imageDims(nChars: Int): (Int, Int) =
    (16 + nChars % 113, 12 + nChars % 97)

  /** Static entry point for the [[org.apache.spark.sql.graft.PngPayload]]
    * expression: text-length-derived dims, real PNG bytes. */
  def pngPayloadOf(text: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
    val (w, h) = imageDims(text.numChars())
    pngEncode(w, h)
  }

  /** Synthesize a media table from a text DataFrame: media_type
    * round-robins image/audio/video by doc_id. IMAGE payloads are real
    * PNGs ([[pngEncode]], via the codegen'd PngPayload expression) with
    * text-length-derived dimensions; audio/video payloads remain the raw
    * UTF-8 bytes (stub decoders). */
  def mediaTable(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.{PngPayload, internal}
    val png = internal.column(PngPayload(internal.expression(col("text"))))
    docs.select(col("doc_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      when(col("doc_id") % 3 === 0, png)
        .otherwise(col("text").cast("binary")).as("payload"))
  }

  /** Per-partition decoder: the IMAGE branch is a real PNG header parse
    * ([[pngDims]]); AUDIO/VIDEO remain honest stubs (deterministic fake
    * dimensions from payload bytes — no codec libraries here). */
  class MediaDecoder {
    def decode(m: MediaRow): DecodedMedia = {
      val len = m.payload.length
      val (w, h, frames) = m.media_type match {
        case "image" =>
          val (pw, ph) = pngDims(m.payload) // REAL decode
          (pw, ph, 1)
        case "audio" => (64 + len % 577, 48 + len % 433, 0) // STUB
        case _ => (64 + len % 577, 48 + len % 433, 1 + len % 7) // STUB
      }
      DecodedMedia(m.doc_id, m.media_type, w, h, frames,
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
      lazy val decoder = new MediaDecoder // per-partition singleton
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
