package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "an image payload with enough bytes to be interesting"),
    (1L, "an audio payload"),
    (2L, "a video payload that is somewhat longer than the others here"),
    (3L, "img"), (4L, "aud"), (5L, "vid"))
    .toDF("doc_id", "text")

  test("media table has binary payloads and typed metadata") {
    val m = Multimodal.mediaTable(docs)
    assert(m.schema("payload").dataType.typeName == "binary")
    val types = m.orderBy($"doc_id").collect().map(_.getString(1)).toSeq
    assert(types == Seq("image", "audio", "video", "image", "audio", "video"))
  }

  test("decode through mapPartitions is deterministic and batch-shaped; " +
      "image dims come from the real PNG header") {
    val decoded = Multimodal.decodeAll(spark, Multimodal.mediaTable(docs))
    val rows = decoded.collect().sortBy(_.doc_id)
    assert(rows.length == 6)
    val img = rows(0)
    val txtLen = "an image payload with enough bytes to be interesting".length
    assert(img.width == 16 + txtLen % 113)
    assert(img.height == 12 + txtLen % 97)
    assert(rows(1).n_frames == 0) // audio
    assert(rows(2).n_frames >= 1) // video
    assert(rows.forall(_.features.length == 16))
    // determinism across runs
    val again = Multimodal.decodeAll(spark, Multimodal.mediaTable(docs))
      .collect().sortBy(_.doc_id)
    assert(rows.map(_.width).toSeq == again.map(_.width).toSeq)
  }

  test("pngEncode emits REAL PNGs: the JDK's independent ImageIO codec " +
      "decodes them with the same dims pngDims parses") {
    Seq((1, 1), (16, 12), (128, 108), (300, 2), (2, 300)).foreach {
      case (w, h) =>
        val bytes = Multimodal.pngEncode(w, h)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        assert(img != null, s"ImageIO rejected pngEncode($w, $h)")
        assert(img.getWidth == w && img.getHeight == h,
          s"ImageIO saw ${img.getWidth}x${img.getHeight}, wanted ${w}x$h")
        assert(Multimodal.pngDims(bytes) == (w, h))
    }
  }

  test("pngDims parses a PNG produced by the independent ImageIO encoder " +
      "(multi-byte big-endian dims included) and rejects corruption") {
    val img = new java.awt.image.BufferedImage(517, 311,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    assert(Multimodal.pngDims(out.toByteArray) == (517, 311))
    // corrupt signature
    val bad = Multimodal.pngEncode(4, 4); bad(1) = 'X'
    intercept[IllegalArgumentException](Multimodal.pngDims(bad))
    // corrupt a dim byte without fixing the CRC -> caught by CRC check
    val crcBad = Multimodal.pngEncode(4, 4); crcBad(19) = 9
    intercept[IllegalArgumentException](Multimodal.pngDims(crcBad))
    // truncated
    intercept[IllegalArgumentException](
      Multimodal.pngDims(Multimodal.pngEncode(4, 4).take(20)))
  }

  test("frame sampling explodes only media with frames") {
    val decoded = Multimodal.decodeAll(spark, Multimodal.mediaTable(docs)).toDF()
    val frames = Multimodal.sampleFrames(decoded, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(!frames.exists { case (id, _) => id % 3 == 1 }) // no audio frames
    assert(frames.count { case (id, _) => id == 0L } == 1) // image: frame 0
    frames.foreach { case (_, idx) => assert(idx % 2 == 0) }
  }

  test("mm_av_align: every frame matches its nearest-earlier audio " +
      "window; pre-window frames stay NULL") {
    val out = graft.SparkEntry.queries("mm_av_align")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val frameMs = r.getAs[Long]("frame_ms")
      if (!r.isNullAt(3)) {
        val winMs = r.getAs[Long]("audio_win_ms")
        assert(winMs <= frameMs, s"window $winMs after frame $frameMs")
        assert(frameMs - winMs < 137,
          s"gap ${frameMs - winMs} exceeds window cadence + jitter")
      } else {
        // only the opening frames of a doc (before its first jittered
        // window start) may be unmatched
        assert(frameMs < 37, s"unmatched frame at $frameMs")
      }
    }
    assert(out.exists(_.isNullAt(3)), "expected some pre-window frame")
    assert(out.exists(!_.isNullAt(3)), "expected matched frames")
  }

  test("resize keeps aspect ratio in metadata") {
    val decoded = Multimodal.decodeAll(spark, Multimodal.mediaTable(docs)).toDF()
    val resized = Multimodal.resizeMeta(decoded, targetWidth = 128)
      .select($"width", $"height", $"out_width", $"out_height").collect()
    resized.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(ow == 128)
      assert(math.abs(oh - h.toDouble * 128 / w) <= 1.0)
    }
  }
}
