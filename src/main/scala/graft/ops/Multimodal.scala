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
  * The AUDIO path is REAL too: payloads are spec-valid RIFF/WAVE PCM16
  * files ([[wavEncode]], JDK primitives only) and the decoder recovers
  * sample rate / channels / frame count / exact integer-microsecond
  * duration by walking the RIFF chunks ([[wavProbe]]). MultimodalSpec
  * referees both directions against the JDK's independent
  * `javax.sound.sampled.AudioSystem` WAV codec.
  *
  * The VIDEO path is REAL as well: payloads are spec-valid YUV4MPEG2
  * (Y4M) streams — the uncompressed interchange format every ffmpeg
  * build emits, hand-parseable with zero codec deps: an ASCII header
  * `YUV4MPEG2 W<w> H<h> F<num>:<den> ...` followed by `FRAME\n`-marked
  * raw 4:2:0 planes ([[y4mEncode]], JDK primitives only). The decoder
  * ([[y4mProbe]]) parses the header tags by byte arithmetic and then
  * WALKS the frame markers — the frame count is genuinely counted
  * against the plane geometry, never read from a header field (Y4M has
  * none), and the exact integer duration derives from the counted
  * frames x the header's rational frame rate. MultimodalSpec referees
  * both directions against an independently-written string-based
  * parser. The Spark-side plumbing is identical for all three —
  * binary schema, typed Datasets, `mapPartitions` batching with a
  * lazily-initialized per-partition decoder (the executor-singleton
  * pattern used for real codecs/models), and explode-based frame
  * sampling.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class DecodedMedia(doc_id: Long, media_type: String, width: Int,
    height: Int, n_frames: Int, sample_rate: Int, channels: Int,
    n_samples: Int, duration_us: Long, features: Array[Float])

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

  // Audio params derived the same way (oracle re-derives from
  // length(text); the gate proves WAV encode->probe round-trips them).
  // 16-bit PCM always; nSamples counts per-channel frames.
  private[ops] def audioParams(nChars: Int): (Int, Int, Int) =
    (8000 + (nChars % 5) * 2000,  // sample rate
      1 + nChars % 2,             // channels
      50 + nChars % 211)          // frames (samples per channel)

  /** Build a spec-valid WAV (RIFF/WAVE, PCM16): "RIFF" size "WAVE" +
    * "fmt " chunk (audio format 1, channels, rate, byte rate, block
    * align, 16 bits) + "data" chunk with a deterministic triangle-ish
    * ramp. JDK-only byte arithmetic; MultimodalSpec referees the output
    * against the JDK's independent `javax.sound.sampled.AudioSystem`
    * WAV codec. */
  def wavEncode(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nSamples >= 0,
      s"bad wav params $sampleRate/$channels/$nSamples")
    val blockAlign = channels * 2 // PCM16
    val dataLen = nSamples * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(16)                       // PCM fmt chunk size
    bb.putShort(1)                      // audio format: PCM
    bb.putShort(channels.toShort)
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * blockAlign)  // byte rate
    bb.putShort(blockAlign.toShort)
    bb.putShort(16)                     // bits per sample
    bb.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    bb.putInt(dataLen)
    var i = 0
    while (i < nSamples * channels) {   // deterministic non-zero samples
      bb.putShort(((i * 37) % 8192 - 4096).toShort)
      i += 1
    }
    bb.array()
  }

  /** REAL WAV header probe: validate RIFF/WAVE, walk chunks to "fmt "
    * (requiring PCM16) and "data", and return (sampleRate, channels,
    * nSamples, durationUs). Header-probe only — no sample decode — the
    * O(1) metadata pass an ingest pipeline runs before resampling.
    * durationUs = nSamples * 1e6 / rate in exact integer arithmetic. */
  def wavProbe(payload: Array[Byte]): (Int, Int, Int, Long) = {
    require(payload.length >= 44, "not a WAV: truncated")
    def ascii(o: Int, s: String): Boolean =
      (0 until s.length).forall(i => payload(o + i) == s.charAt(i).toByte)
    require(ascii(0, "RIFF") && ascii(8, "WAVE"), "not a WAV: bad RIFF header")
    def le32(o: Int): Int =
      (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
        ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    var off = 12
    var rate = -1; var channels = -1; var blockAlign = -1; var dataLen = -1
    while (off + 8 <= payload.length && (rate < 0 || dataLen < 0)) {
      val len = le32(off + 4)
      if (ascii(off, "fmt ")) {
        require(len >= 16, s"not a WAV: fmt chunk length $len")
        require(le16(off + 8) == 1, "not a WAV: not PCM")
        channels = le16(off + 10)
        rate = le32(off + 12)
        blockAlign = le16(off + 20)
        require(le16(off + 22) == 16, "not a WAV: not 16-bit")
        require(blockAlign == channels * 2,
          s"not a WAV: blockAlign $blockAlign for $channels ch PCM16")
      } else if (ascii(off, "data")) {
        require(rate > 0, "not a WAV: data chunk before fmt")
        dataLen = len
        require(off + 8 + dataLen <= payload.length, "not a WAV: data truncated")
        require(dataLen % blockAlign == 0,
          s"not a WAV: data length $dataLen not frame-aligned")
      }
      off += 8 + len + (len & 1) // chunks are word-aligned per RIFF
    }
    require(rate > 0 && dataLen >= 0, "not a WAV: missing fmt/data chunk")
    val nSamples = dataLen / blockAlign
    (rate, channels, nSamples, nSamples * 1000000L / rate)
  }

  /** REAL PCM16 SAMPLE DECODE + windowed energy: walk the RIFF chunks
    * to the data payload (the same validation as [[wavProbe]]), then
    * read every interleaved little-endian 16-bit sample and accumulate
    * the exact Σ|sample| per window of `windowFrames` frames (all
    * channels folded in — the mono-downmix-free loudness proxy an
    * audio-quality filter thresholds on before any resample). This is
    * the first mm operator that consumes PLANE DATA, not just headers:
    * a byte-order or offset regression anywhere in the decode path
    * moves an energy sum. Returns (win_idx, energy, n_frames) per
    * window, last window ragged. */
  def wavEnergyWindows(payload: Array[Byte],
      windowFrames: Int): Seq[(Int, Long, Int)] = {
    require(windowFrames > 0, s"bad window $windowFrames")
    def ascii(o: Int, s: String): Boolean =
      (0 until s.length).forall(i => payload(o + i) == s.charAt(i).toByte)
    require(payload.length >= 44 && ascii(0, "RIFF") && ascii(8, "WAVE"),
      "not a WAV")
    def le32(o: Int): Int =
      (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
        ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    var off = 12
    var channels = -1; var dataOff = -1; var dataLen = -1
    while (off + 8 <= payload.length && (channels < 0 || dataOff < 0)) {
      val len = le32(off + 4)
      if (ascii(off, "fmt ")) {
        require(le16(off + 8) == 1 && le16(off + 22) == 16,
          "not a WAV: not PCM16")
        channels = le16(off + 10)
      } else if (ascii(off, "data")) {
        require(channels > 0, "not a WAV: data before fmt")
        dataOff = off + 8
        dataLen = len
        require(dataOff + dataLen <= payload.length, "not a WAV: truncated")
      }
      off += 8 + len + (len & 1)
    }
    require(channels > 0 && dataOff >= 0, "not a WAV: missing chunks")
    val nSamples = dataLen / (channels * 2)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int)]
    var f = 0
    while (f < nSamples) {
      val win = f / windowFrames
      val end = math.min(f + windowFrames, nSamples)
      var energy = 0L
      var i = f * channels
      val iEnd = end * channels
      while (i < iEnd) {
        val s = (le16(dataOff + i * 2) << 16) >> 16 // sign-extend
        energy += math.abs(s.toLong)
        i += 1
      }
      out += ((win, energy, end - f))
      f = end
    }
    out.toSeq
  }

  // Video params derived the same way (oracle re-derives from
  // length(text); the gate proves Y4M encode->probe round-trips them).
  // Dims are EVEN (4:2:0 chroma subsampling halves both axes); frame
  // rate is fixed 25:1 so the per-frame duration is an exact 40000 us.
  private[ops] def videoParams(nChars: Int): (Int, Int, Int) =
    (16 + (nChars % 8) * 2,  // width
      8 + (nChars % 6) * 2,  // height
      1 + nChars % 7)        // frames

  /** Build a spec-valid YUV4MPEG2 stream: ASCII stream header
    * `YUV4MPEG2 W<w> H<h> F<num>:<den> Ip A1:1 C420jpeg\n`, then per
    * frame a `FRAME\n` marker followed by raw 8-bit 4:2:0 planes
    * (Y w x h, then U and V at w/2 x h/2) with deterministic non-zero
    * samples. JDK-only byte arithmetic; MultimodalSpec referees the
    * output against an independently-written parser. */
  def y4mEncode(width: Int, height: Int, nFrames: Int,
      fpsNum: Int = 25, fpsDen: Int = 1): Array[Byte] = {
    require(width > 0 && width % 2 == 0 && height > 0 && height % 2 == 0,
      s"4:2:0 needs even dims, got ${width}x$height")
    require(nFrames > 0 && fpsNum > 0 && fpsDen > 0,
      s"bad y4m params $nFrames@$fpsNum:$fpsDen")
    val frameBytes = width * height + 2 * (width / 2) * (height / 2)
    val header = s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = java.nio.ByteBuffer.allocate(
      header.length + nFrames * (marker.length + frameBytes))
    out.put(header)
    var f = 0
    while (f < nFrames) {
      out.put(marker)
      var i = 0
      while (i < frameBytes) { // deterministic non-zero plane samples
        out.put(((i * 31 + f * 17) % 251).toByte)
        i += 1
      }
      f += 1
    }
    out.array()
  }

  /** REAL LUMA PLANE DECODE: parse the Y4M stream header, then walk the
    * FRAME markers and SUM each frame's Y-plane bytes (the first w*h
    * of the 4:2:0 frame payload; chroma planes are skipped by offset) —
    * the exact per-frame brightness mass a black-frame/scene-cut filter
    * thresholds on. The video sibling of [[wavEnergyWindows]]: the
    * first operator consuming video PLANE bytes, so any header-size,
    * marker-walk, or plane-offset regression moves a sum. Returns
    * (frame_idx, luma_sum) per frame. */
  def y4mLumaSums(payload: Array[Byte]): Seq[(Int, Long)] = {
    val (w, h, _, _, nFrames) = y4mProbe(payload) // validates the layout
    val frameBytes = w * h + 2 * (w / 2) * (h / 2)
    var eol = 0
    while (payload(eol) != '\n') eol += 1
    val marker = "FRAME".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var off = eol + 1
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var f = 0
    while (f < nFrames) {
      require((0 until marker.length).forall(i =>
        payload(off + i) == marker(i)) && payload(off + marker.length) == '\n',
        s"bad FRAME marker at $off")
      val planeOff = off + marker.length + 1
      var s = 0L
      var i = 0
      while (i < w * h) { // Y plane only; U/V skipped by offset below
        s += (payload(planeOff + i) & 0xff).toLong
        i += 1
      }
      out += ((f, s))
      off = planeOff + frameBytes
      f += 1
    }
    out.toSeq
  }

  /** REAL Y4M probe: parse the stream-header tags (W/H/F required, C
    * must be a 4:2:0 family when present) by byte arithmetic, then WALK
    * the `FRAME` markers — each must be followed by exactly
    * w*h + 2*(w/2)*(h/2) plane bytes — counting frames until the
    * payload ends exactly on a frame boundary. Returns (width, height,
    * fpsNum, fpsDen, nFrames). Header-walk only — plane bytes are
    * skipped, not decoded — the O(frames) metadata pass an ingest
    * pipeline runs before any pixel work. */
  def y4mProbe(payload: Array[Byte]): (Int, Int, Int, Int, Int) = {
    val magic = "YUV4MPEG2"
    require(payload.length > magic.length + 1 &&
      (0 until magic.length).forall(i => payload(i) == magic.charAt(i).toByte),
      "not a Y4M: bad magic")
    var eol = magic.length
    while (eol < payload.length && payload(eol) != '\n') eol += 1
    require(eol < payload.length, "not a Y4M: unterminated stream header")
    var w = -1; var h = -1; var num = -1; var den = -1
    var p = magic.length
    while (p < eol) {
      require(payload(p) == ' ', "not a Y4M: malformed header tag")
      p += 1
      val tag = payload(p).toChar
      p += 1
      val start = p
      while (p < eol && payload(p) != ' ') p += 1
      val v = new String(payload, start, p - start,
        java.nio.charset.StandardCharsets.US_ASCII)
      tag match {
        case 'W' => w = v.toInt
        case 'H' => h = v.toInt
        case 'F' =>
          val colon = v.indexOf(':')
          require(colon > 0, s"not a Y4M: frame rate '$v'")
          num = v.substring(0, colon).toInt
          den = v.substring(colon + 1).toInt
        case 'C' => require(v.startsWith("420"),
          s"unsupported Y4M chroma '$v' (only 4:2:0 here)")
        case _ => // I/A/X tags: irrelevant to the probe
      }
    }
    require(w > 0 && w % 2 == 0 && h > 0 && h % 2 == 0,
      s"not a Y4M: bad dims ${w}x$h")
    require(num > 0 && den > 0, s"not a Y4M: bad frame rate $num:$den")
    val frameBytes = w * h + 2 * (w / 2) * (h / 2)
    var off = eol + 1
    var frames = 0
    val fm = "FRAME"
    while (off < payload.length) {
      require(off + fm.length <= payload.length &&
        (0 until fm.length).forall(i => payload(off + i) == fm.charAt(i).toByte),
        s"not a Y4M: missing FRAME marker at $off")
      off += fm.length
      while (off < payload.length && payload(off) != '\n') off += 1
      require(off < payload.length, "not a Y4M: unterminated frame header")
      off += 1
      require(off + frameBytes <= payload.length,
        s"not a Y4M: frame $frames truncated")
      off += frameBytes
      frames += 1
    }
    require(frames > 0, "not a Y4M: no frames")
    (w, h, num, den, frames)
  }

  /** Static entry point for the [[org.apache.spark.sql.graft.PngPayload]]
    * expression: text-length-derived dims, real PNG bytes. */
  def pngPayloadOf(text: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
    val (w, h) = imageDims(text.numChars())
    pngEncode(w, h)
  }

  /** Static entry point for the [[org.apache.spark.sql.graft.WavPayload]]
    * expression: text-length-derived params, real RIFF/WAVE PCM16 bytes. */
  def wavPayloadOf(text: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
    val (rate, ch, n) = audioParams(text.numChars())
    wavEncode(rate, ch, n)
  }

  /** Static entry point for the [[org.apache.spark.sql.graft.Y4mPayload]]
    * expression: text-length-derived params, real YUV4MPEG2 bytes. */
  def y4mPayloadOf(text: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
    val (w, h, frames) = videoParams(text.numChars())
    y4mEncode(w, h, frames)
  }

  /** Synthesize a media table from a text DataFrame: media_type
    * round-robins image/audio/video by doc_id. IMAGE payloads are real
    * PNGs ([[pngEncode]], via the codegen'd PngPayload expression),
    * AUDIO payloads real RIFF/WAVE PCM16 files ([[wavEncode]], via
    * WavPayload), and VIDEO payloads real YUV4MPEG2 streams
    * ([[y4mEncode]], via Y4mPayload), all with text-length-derived
    * parameters. */
  def mediaTable(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.{PngPayload, WavPayload, Y4mPayload, internal}
    val png = internal.column(PngPayload(internal.expression(col("text"))))
    val wav = internal.column(WavPayload(internal.expression(col("text"))))
    val y4m = internal.column(Y4mPayload(internal.expression(col("text"))))
    docs.select(col("doc_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      when(col("doc_id") % 3 === 0, png)
        .when(col("doc_id") % 3 === 1, wav)
        .otherwise(y4m).as("payload"))
  }

  /** Per-partition decoder: the IMAGE branch is a real PNG header parse
    * ([[pngDims]]), the AUDIO branch a real WAV header probe
    * ([[wavProbe]]), and the VIDEO branch a real Y4M header parse +
    * frame-marker walk ([[y4mProbe]] — the frame count is counted, not
    * trusted; duration_us = frames * 1e6 * den / num in exact integer
    * arithmetic, 40000 us/frame at the fixed 25:1 rate). */
  class MediaDecoder {
    def decode(m: MediaRow): DecodedMedia = {
      val (w, h, frames, rate, ch, nSamp, durUs) = m.media_type match {
        case "image" =>
          val (pw, ph) = pngDims(m.payload) // REAL decode
          (pw, ph, 1, 0, 0, 0, 0L)
        case "audio" =>
          val (r, c, n, d) = wavProbe(m.payload) // REAL decode
          (0, 0, 0, r, c, n, d)
        case _ =>
          val (vw, vh, num, den, vf) = y4mProbe(m.payload) // REAL decode
          (vw, vh, vf, 0, 0, 0, vf * 1000000L * den / num)
      }
      DecodedMedia(m.doc_id, m.media_type, w, h, frames, rate, ch, nSamp, durUs,
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
