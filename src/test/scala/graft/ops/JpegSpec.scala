package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Referees the hand-rolled baseline JPEG codec against the JDK's
  * independent ImageIO JPEG codec in both directions, pins the
  * block-constant exactness contract the mm_jpeg gates rely on, and
  * checks spec-violation rejection. */
class JpegSpec extends AnyFunSuite {

  private def imageIoRead(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not decode the stream")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w)
      out(y * w + x) = img.getRaster.getSample(x, y, 0)
    (w, h, out)
  }

  test("block-constant fixtures round-trip BIT-EXACTLY through our codec " +
      "and decode identically under the independent ImageIO codec") {
    for (docId <- Seq(0L, 5L, 12L, 23L, 40L, 87L)) {
      val (w, h) = Jpeg.dedupJpegDims(docId)
      val block = Jpeg.dedupJpegBlockVal(docId) _
      val bytes = Jpeg.dedupJpegPayloadOf(docId)
      val (dw, dh, ours) = Jpeg.pixelsGray(bytes)
      assert((dw, dh) == (w, h))
      for (y <- 0 until h; x <- 0 until w)
        assert(ours(y * w + x) == block(x / 8, y / 8),
          s"doc $docId pixel ($x,$y): DC-only blocks must be exact")
      // the independent codec agrees bit-for-bit on DC-only blocks
      val (iw, ih, theirs) = imageIoRead(bytes)
      assert((iw, ih) == (w, h))
      assert(theirs.sameElements(ours),
        s"doc $docId: ImageIO disagrees on a block-constant image")
    }
  }

  test("general (non-constant) content: ImageIO decodes our stream within " +
      "the legitimate IDCT rounding bar") {
    val (w, h) = (48, 32)
    val bytes = Jpeg.encodeGray(w, h,
      (x, y) => (x * x * 3 + y * 7 + x * y) % 256)
    val (_, _, ours) = Jpeg.pixelsGray(bytes)
    val (iw, ih, theirs) = imageIoRead(bytes)
    assert((iw, ih) == (w, h))
    val maxDiff = ours.zip(theirs).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 2,
      s"our IDCT and ImageIO's disagree by $maxDiff (> 2) on our stream")
  }

  test("reverse referee: our decoder reads an ImageIO-WRITTEN grayscale " +
      "JPEG (foreign tables, JFIF APP0) within the same bar") {
    val (w, h) = (40, 24)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 5 + y * 11 + x * y) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val (ow, oh, ours) = Jpeg.pixelsGray(bytes)
    val (iw, ih, theirs) = imageIoRead(bytes)
    assert((ow, oh) == (iw, ih) && (ow, oh) == (w, h))
    val maxDiff = ours.zip(theirs).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 2,
      s"foreign-stream decode disagrees with ImageIO by $maxDiff (> 2)")
    // header probe agrees without a pixel decode
    assert(Jpeg.dims(bytes) == (w, h))
  }

  test("PROGRESSIVE: block-constant fixtures decode bit-exactly through " +
      "our SOF2 decoder AND under ImageIO; wire format is genuinely " +
      "progressive and pixel-identical to the baseline fixture") {
    for (docId <- Seq(0L, 5L, 12L, 23L, 40L, 87L)) {
      val (w, h) = Jpeg.dedupJpegDims(docId)
      val block = Jpeg.dedupJpegBlockVal(docId) _
      val bytes = Jpeg.dedupJpegProgPayloadOf(docId)
      // the stream really is SOF2 with multiple scans
      assert(bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2), "no SOF2 marker")
      val nScans = bytes.sliding(2).count(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda)
      assert(nScans == 6, s"expected the 6-scan script, got $nScans")
      val (dw, dh, ours) = Jpeg.pixelsGray(bytes)
      assert((dw, dh) == (w, h))
      for (y <- 0 until h; x <- 0 until w)
        assert(ours(y * w + x) == block(x / 8, y / 8),
          s"doc $docId pixel ($x,$y): full-precision progressive " +
            "decode of DC-only blocks must be exact")
      // pixel-identical to the baseline fixture (same coefficients,
      // same IDCT — only the wire format differs)
      val (_, _, base) = Jpeg.pixelsGray(Jpeg.dedupJpegPayloadOf(docId))
      assert(base.sameElements(ours))
      // the independent codec agrees bit-for-bit
      val (iw, ih, theirs) = imageIoRead(bytes)
      assert((iw, ih) == (w, h))
      assert(theirs.sameElements(ours),
        s"doc $docId: ImageIO disagrees on our progressive stream")
    }
  }

  test("PROGRESSIVE general content: our progressive stream decodes " +
      "PIXEL-IDENTICALLY to our baseline stream (same coefficients, " +
      "same IDCT) and ImageIO reads it within the IDCT rounding bar — " +
      "EOB runs, ZRLs and correction bits all exercised") {
    val (w, h) = (48, 40)
    def px(x: Int, y: Int) = (x * x * 3 + y * 7 + x * y) % 256
    val prog = Jpeg.encodeProgressiveGray(w, h, px)
    val base = Jpeg.encodeGray(w, h, px)
    val (_, _, oursProg) = Jpeg.pixelsGray(prog)
    val (_, _, oursBase) = Jpeg.pixelsGray(base)
    assert(oursProg.sameElements(oursBase),
      "progressive and baseline decodes of the same content diverged")
    val (iw, ih, theirs) = imageIoRead(prog)
    assert((iw, ih) == (w, h))
    val maxDiff = oursProg.zip(theirs).map { case (a, b) =>
      math.abs(a - b) }.max
    assert(maxDiff <= 2,
      s"ImageIO disagrees with our progressive stream by $maxDiff (> 2)")
    // a sparse high-frequency image: long zero runs force ZRL + EOBn
    // paths in BOTH first and refinement scans
    def sparse(x: Int, y: Int) =
      if (x % 16 == 15 && y % 16 == 15) 255 else 40
    val prog2 = Jpeg.encodeProgressiveGray(64, 64, sparse)
    val (_, _, p2) = Jpeg.pixelsGray(prog2)
    val (_, _, b2) = Jpeg.pixelsGray(Jpeg.encodeGray(64, 64, sparse))
    assert(p2.sameElements(b2))
    val (_, _, t2) = imageIoRead(prog2)
    assert(p2.zip(t2).map { case (a, b) => math.abs(a - b) }.max <= 2)
  }

  test("PROGRESSIVE reverse referee: our decoder reads an ImageIO-WRITTEN " +
      "progressive JPEG (libjpeg default script: foreign tables, " +
      "successive approximation, spectral splits) within the bar — " +
      "grayscale AND 4:2:0 colour") {
    def writeProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose(); ios.close()
      bos.toByteArray
    }
    // grayscale
    val (w, h) = (40, 24)
    val gimg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gimg.getRaster.setSample(x, y, 0, (x * 5 + y * 11 + x * y) % 256)
    val gbytes = writeProgressive(gimg)
    assert(gbytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "ImageIO did not produce SOF2 — progressive mode not applied")
    val (ow, oh, ours) = Jpeg.pixelsGray(gbytes)
    val (iw, ih, theirs) = imageIoRead(gbytes)
    assert((ow, oh) == (iw, ih) && (ow, oh) == (w, h))
    val maxDiff = ours.zip(theirs).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 2,
      s"foreign progressive decode disagrees with ImageIO by $maxDiff")
    // colour (ImageIO writes 4:2:0 progressive for RGB input): smooth
    // content, the same bar as the baseline 4:2:0 foreign-read test
    val (cw, ch) = (48, 32)
    val cimg = new java.awt.image.BufferedImage(cw, ch,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until ch; x <- 0 until cw) {
      val r = 60 + 3 * x; val g = 80 + 2 * y; val b = 90 + x + y
      cimg.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val cbytes = writeProgressive(cimg)
    assert(cbytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2))
    val (pw2, ph2, oursRgb) = Jpeg.pixelsColor(cbytes)
    assert((pw2, ph2) == (cw, ch))
    val ciimg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(cbytes))
    var worst = 0
    for (y <- 0 until ch; x <- 0 until cw) {
      val rgb = ciimg.getRGB(x, y)
      val o = (y * cw + x) * 3
      worst = math.max(worst, math.abs(oursRgb(o) - ((rgb >> 16) & 0xff)))
      worst = math.max(worst, math.abs(oursRgb(o + 1) - ((rgb >> 8) & 0xff)))
      worst = math.max(worst, math.abs(oursRgb(o + 2) - (rgb & 0xff)))
    }
    assert(worst <= 10,
      s"foreign 4:2:0 progressive decode off by $worst (> 10) on smooth content")
  }

  test("near-dup geometry: same-class docs land within banding distance, " +
      "cross-class docs do not collide") {
    // docs 0 and 588 share (fam=0, scene=0): same base blocks,
    // different bump residues -> small nonzero Hamming distance
    def dh(id: Long) = Jpeg.jpegDHash(Jpeg.dedupJpegPayloadOf(id))
    val d0 = dh(0L); val dSame = dh(588L) // 588 = 7 * 84
    val near = java.lang.Long.bitCount(d0 ^ dSame)
    assert(near <= 6, s"same-class hashes too far apart: $near")
    val d1 = dh(1L) // different size class entirely
    assert(java.lang.Long.bitCount(d0 ^ d1) > 6,
      "cross-class hashes should differ widely")
  }

  private def imageIoReadRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not decode the colour stream")
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      val o = (y * w + x) * 3
      out(o) = (p >> 16) & 0xff; out(o + 1) = (p >> 8) & 0xff
      out(o + 2) = p & 0xff
    }
    (w, h, out)
  }

  test("COLOUR: block-constant YCbCr fixtures decode to the exact " +
      "fixed-point RGB image of the formula; ImageIO agrees within the " +
      "colour-convert rounding bar") {
    for (docId <- Seq(0L, 5L, 23L, 87L)) {
      val (w, h) = Jpeg.dedupJpegDims(docId)
      val block = Jpeg.dedupJpegColorYcc(docId) _
      val bytes = Jpeg.dedupJpegColorPayloadOf(docId)
      val (dw, dh, ours) = Jpeg.pixelsColor(bytes)
      assert((dw, dh) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val (yv, cb, cr) = block(x / 8, y / 8)
        val (r, g, b) = Jpeg.yccToRgb(yv, cb, cr) // DC-only planes: exact
        val o = (y * w + x) * 3
        assert((ours(o), ours(o + 1), ours(o + 2)) == (r, g, b),
          s"doc $docId pixel ($x,$y)")
      }
      // the independent codec's real-valued BT.601 differs from our
      // fixed-point one by at most rounding (plus its IDCT) — small bar
      val (iw, ih, theirs) = imageIoReadRgb(bytes)
      assert((iw, ih) == (w, h))
      val maxDiff = ours.zip(theirs).map { case (a, b) => math.abs(a - b) }.max
      assert(maxDiff <= 3,
        s"doc $docId: ImageIO colour decode off by $maxDiff (> 3)")
    }
  }

  test("COLOUR reverse referee: our decoder reads an ImageIO-WRITTEN " +
      "RGB JPEG at the highest quality setting") {
    val (w, h) = (40, 24)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 5 + y) % 256 << 16) | ((y * 7) % 256 << 8) |
        ((x * 3 + y * 2) % 256))
    val w2 = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w2.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f) // JDK writer emits 4:4:4 at q >= 0.75ish
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w2.setOutput(ios)
    w2.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w2.dispose()
    val bytes = bos.toByteArray
    val (ow, oh, ours) = Jpeg.pixelsColor(bytes)
    val (iw, ih, theirs) = imageIoReadRgb(bytes)
    assert((ow, oh) == (iw, ih) && (ow, oh) == (w, h))
    // our truncating fixed-point colour convert vs their rounded
    // real-valued one stacks with two IDCT roundings: a few counts
    val maxDiff = ours.zip(theirs).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 6,
      s"foreign colour decode off by $maxDiff (> 6)")
  }

  test("4:2:0 SUBSAMPLED fixtures decode to the exact tile formula " +
      "(chroma subsample + nearest upsample cancel on constant tiles); " +
      "ImageIO agrees away from tile edges") {
    for (docId <- Seq(0L, 5L, 23L)) {
      val (w8, h8) = Jpeg.dedupJpegDims(docId)
      val (w, h) = (2 * w8, 2 * h8)
      val block = Jpeg.dedupJpegColorYcc(docId) _
      val bytes = Jpeg.dedupJpeg420PayloadOf(docId)
      val (dw, dh, ours) = Jpeg.pixelsColor(bytes)
      assert((dw, dh) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val (yv, cb, cr) = block(x / 16, y / 16)
        val (r, g, b) = Jpeg.yccToRgb(yv, cb, cr)
        val o = (y * w + x) * 3
        assert((ours(o), ours(o + 1), ours(o + 2)) == (r, g, b),
          s"doc $docId pixel ($x,$y)")
      }
      // ImageIO's FANCY chroma upsampling interpolates across tile
      // boundaries where ours replicates; interior pixels (whose
      // nearest chroma samples have constant neighbours) must agree
      val (iw, ih, theirs) = imageIoReadRgb(bytes)
      assert((iw, ih) == (w, h))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w
           if x % 16 >= 3 && x % 16 <= 12 && y % 16 >= 3 && y % 16 <= 12;
           c <- 0 until 3)
        maxDiff = math.max(maxDiff,
          math.abs(ours((y * w + x) * 3 + c) - theirs((y * w + x) * 3 + c)))
      assert(maxDiff <= 3,
        s"doc $docId: interior pixels off by $maxDiff (> 3) vs ImageIO")
    }
  }

  test("foreign 4:2:0: our decoder reads ImageIO's DEFAULT-quality RGB " +
      "JPEG (the subsampled layout real encoders emit) within a smooth-" +
      "content bar") {
    val (w, h) = (48, 32)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) // smooth gradients: fancy vs
      img.setRGB(x, y, ((x * 4 + 40) << 16) | ((y * 5 + 60) << 8) |
        (x * 2 + y * 2 + 30)) // nearest upsampling stay close
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos)) // default quality
    val bytes = bos.toByteArray
    val (ow, oh, ours) = Jpeg.pixelsColor(bytes)
    val (iw, ih, theirs) = imageIoReadRgb(bytes)
    assert((ow, oh) == (iw, ih) && (ow, oh) == (w, h))
    val maxDiff = ours.zip(theirs).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 10,
      s"foreign 4:2:0 decode off by $maxDiff (> 10) on smooth content")
  }

  test("spec violations are rejected loudly") {
    val good = Jpeg.dedupJpegPayloadOf(3L)
    intercept[IllegalArgumentException](Jpeg.pixelsGray("nope".getBytes))
    // progressive SOF2 refused, not mis-decoded
    val prog = good.clone()
    val sofAt = {
      var i = 2
      while (!((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    prog(sofAt + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](Jpeg.pixelsGray(prog))
    assert(e.getMessage.contains("progressive"))
    // truncated entropy data
    intercept[Exception](
      Jpeg.pixelsGray(java.util.Arrays.copyOf(good, good.length - 8)))
    // T.81 A.2: a single-component scan is non-interleaved — a grayscale
    // frame carrying 2x2 sampling factors must be REFUSED, not decoded
    // with the interleaved MCU loop (scrambled block placement). SOF0
    // payload: len(2) P(1) Y(2) X(2) Nf(1) [Cid(1) HV(1) Tq(1)] — the
    // first component's HV byte sits at marker offset + 11.
    val gray2x2 = good.clone()
    gray2x2(sofAt + 11) = 0x22.toByte
    val e2 = intercept[IllegalArgumentException](Jpeg.pixelsGray(gray2x2))
    assert(e2.getMessage.contains("non-interleaved"), e2.getMessage)
  }
}
