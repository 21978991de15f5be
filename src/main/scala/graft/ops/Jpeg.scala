package graft.ops

/** Hand-rolled BASELINE JPEG (ITU-T T.81, sequential DCT, Huffman,
  * 8-bit grayscale): a spec-complete encoder and decoder built from JDK
  * primitives only — marker framing (SOI/DQT/SOF0/DHT/SOS/EOI), the
  * standard Annex K Huffman tables, zigzag scan, byte stuffing, DC
  * prediction with restart-interval support on the decode side, forward
  * and inverse DCT in deterministic StrictMath double arithmetic.
  *
  * Exactness contract for the gates: DCT quantization makes general
  * JPEG lossy, but BLOCK-CONSTANT images (every 8x8 block one flat
  * value) round-trip BIT-EXACTLY — a constant block has only a DC
  * coefficient, the quant table's DC entry (8) divides the level-shifted
  * DC (8*(v-128)) for every v, and the IDCT of a DC-only block is the
  * exact constant again. The mm_jpeg fixtures are block-constant, so
  * the DuckDB twin replays decoded pixels closed-form from the block
  * formula, pinning the whole encode -> marker walk -> Huffman decode ->
  * dequant -> IDCT lineage bit-for-bit (any drift anywhere moves a
  * pixel, which moves the dHash). JpegSpec referees both directions
  * against the JDK's independent ImageIO codec: ImageIO decodes OUR
  * streams (bit-exact on block-constant, ±2 on general content — IDCT
  * implementations legitimately differ in rounding), and our decoder
  * reads ImageIO-WRITTEN JPEGs (foreign quant/Huffman tables, JFIF APP0,
  * optional restart intervals) within the same bar.
  *
  * Reference scope: the reference pipeline crawls web documents whose
  * image payloads are overwhelmingly JPEG; this is the decode rung the
  * PNG/WAV/Y4M family stopped short of.
  */
object Jpeg {

  // zigzag scan order (T.81 Figure A.6): zigzag index -> block index
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K.1 luminance quantization table (zigzag order on the wire;
  // stored here in natural block order), DC entry lowered 16 -> 8 so
  // the level-shifted DC of any flat block quantizes exactly (8 divides
  // 8*(v-128) for every v) — the encoder's freedom, spec-legal.
  private val QuantTable: Array[Int] = Array(
    8, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  // Annex K.2 chrominance quantization table (natural order), DC entry
  // lowered 17 -> 8 for the same flat-block exactness as the luma table.
  private val ChromaQuantTable: Array[Int] = Array(
    8, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K.3: standard luminance DC Huffman table
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  // Annex K.4: standard chrominance DC Huffman table
  private val CDcBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val CDcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  // Annex K.6: standard chrominance AC Huffman table
  private val CAcBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private val CAcVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // Annex K.5: standard luminance AC Huffman table
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // AC Huffman table for PROGRESSIVE scans: the Annex K sequential AC
  // table has no EOBn symbols (0x10..0xE0 — end-of-band run lengths,
  // T.81 G.1.2.2), which progressive first/refinement scans require, so
  // real encoders ship custom tables. This one is deliberately flat:
  // every symbol a progressive scan can emit — EOB0..EOB14, ZRL, and
  // (run, size) for run 0..15 / size 1..10 — at code length 9 (176
  // codes in 512, the all-ones prefix never assigned). Spec-valid,
  // decodes under any conformant reader; optimality is irrelevant for
  // fixture payloads.
  private val ProgAcVals: Array[Int] =
    ((0 to 14).map(_ << 4) ++ Seq(0xf0) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).sorted.toArray
  private val ProgAcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 0, ProgAcVals.length, 0, 0, 0, 0, 0, 0, 0)

  // cosine basis, StrictMath for cross-platform determinism
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }
  private def cNorm(u: Int): Double = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0

  /** (code, length) per symbol from a (bits, huffval) DHT pair — the
    * canonical assignment of T.81 Annex C. */
  private def canonicalCodes(bits: Array[Int],
      vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var vi = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out(vals(vi)) = (code, len)
        code += 1; vi += 1; i += 1
      }
      code <<= 1
    }
    out.toMap
  }

  /** Encode an 8-bit grayscale image (dims multiples of 8) as a
    * baseline sequential JPEG with the Annex K Huffman tables. */
  def encodeGray(width: Int, height: Int,
      pixel: (Int, Int) => Int): Array[Byte] =
    encodeBaseline(width, height, IndexedSeq(pixel))

  /** Encode a COLOR image from per-pixel (Y, Cb, Cr) planes as a
    * 3-component 4:4:4 baseline sequential JPEG — Y under the luma
    * quant/Huffman tables, Cb/Cr under the Annex K chroma tables, one
    * block per component per MCU, per-component DC prediction. JPEG
    * stores YCbCr natively, so a fixture supplying the planes directly
    * skips the forward colour conversion; [[encodeColorRgb]] is the
    * RGB-consumer wrapper. */
  def encodeColorYcc(width: Int, height: Int,
      ycc: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    encodeBaseline(width, height, IndexedSeq(
      (x, y) => ycc(x, y)._1, (x, y) => ycc(x, y)._2, (x, y) => ycc(x, y)._3))

  /** 4:2:0 CHROMA-SUBSAMPLED colour encode (dims multiples of 16): Y at
    * 2x2 sampling, Cb/Cr at quarter resolution (the chroma accessor is
    * called in SUBSAMPLED coordinates — the fixture's tile-constant
    * planes make subsample-then-upsample exact). This is the default
    * layout real encoders emit for photographic content. */
  def encodeColorYcc420(width: Int, height: Int,
      ycc: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width % 16 == 0 && height % 16 == 0,
      s"4:2:0 fixture dims must be multiples of 16, got ${width}x$height")
    encodeBaseline(width, height, IndexedSeq(
      (x, y) => ycc(x, y)._1,
      (cx, cy) => ycc(2 * cx, 2 * cy)._2, // subsampled-coordinate access
      (cx, cy) => ycc(2 * cx, 2 * cy)._3),
      sampling = IndexedSeq((2, 2), (1, 1), (1, 1)))
  }

  /** RGB wrapper over [[encodeColorYcc]]: the JFIF/BT.601 forward
    * transform in the same 1/1000 fixed-point arithmetic the decoder
    * inverts ([[yccToRgb]]), so both directions are integer-exact and
    * oracle-replayable. */
  def encodeColorRgb(width: Int, height: Int,
      rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] =
    encodeColorYcc(width, height, (x, y) => {
      val (r, g, b) = rgb(x, y)
      ((299 * r + 587 * g + 114 * b) / 1000,
        (-169 * r - 331 * g + 500 * b + 1024000) / 1000 - 1024 + 128,
        (500 * r - 419 * g - 81 * b + 1024000) / 1000 - 1024 + 128)
    })

  private def encodeBaseline(width: Int, height: Int,
      planes: IndexedSeq[(Int, Int) => Int],
      sampling: IndexedSeq[(Int, Int)] = null): Array[Byte] = {
    val nc = planes.length
    val samp = Option(sampling).getOrElse(IndexedSeq.fill(nc)((1, 1)))
    val maxH = samp.map(_._1).max
    val maxV = samp.map(_._2).max
    require(width > 0 && height > 0 &&
      width % (8 * maxH) == 0 && height % (8 * maxV) == 0,
      s"fixture dims must be multiples of ${8 * maxH}x${8 * maxV}, " +
        s"got ${width}x$height")
    require(nc == 1 || nc == 3,
      s"grayscale or YCbCr only, got $nc planes")
    val out = new java.io.ByteArrayOutputStream(1024)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def be16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    marker(0xd8) // SOI
    def dqt(tq: Int, table: Array[Int]): Unit = {
      marker(0xdb); be16(2 + 1 + 64); out.write(tq) // 8-bit table tq
      Zigzag.foreach(i => out.write(table(i)))
    }
    dqt(0, QuantTable)
    if (nc == 3) dqt(1, ChromaQuantTable)
    marker(0xc0); be16(8 + 3 * nc) // SOF0
    out.write(8); be16(height); be16(width); out.write(nc)
    for (c <- 0 until nc) {
      out.write(c + 1)    // component id
      out.write((samp(c)._1 << 4) | samp(c)._2) // sampling factors
      out.write(if (c == 0) 0 else 1) // quant table
    }
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + vals.length); out.write((cls << 4) | id)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, 0, DcBits, DcVals)
    dht(1, 0, AcBits, AcVals)
    if (nc == 3) { dht(0, 1, CDcBits, CDcVals); dht(1, 1, CAcBits, CAcVals) }
    marker(0xda); be16(6 + 2 * nc) // SOS
    out.write(nc)
    for (c <- 0 until nc) {
      out.write(c + 1)
      out.write(if (c == 0) 0x00 else 0x11) // DC/AC table ids
    }
    out.write(0); out.write(63); out.write(0) // Ss, Se, AhAl
    // entropy-coded segment: MSB-first bit writer with 0xFF stuffing
    val lumaDc = canonicalCodes(DcBits, DcVals)
    val lumaAc = canonicalCodes(AcBits, AcVals)
    val dcCodesOf = IndexedSeq(lumaDc) ++
      (if (nc == 3) Seq.fill(2)(canonicalCodes(CDcBits, CDcVals)) else Nil)
    val acCodesOf = IndexedSeq(lumaAc) ++
      (if (nc == 3) Seq.fill(2)(canonicalCodes(CAcBits, CAcVals)) else Nil)
    val quantOf = IndexedSeq(QuantTable) ++
      (if (nc == 3) Seq.fill(2)(ChromaQuantTable) else Nil)
    var bitBuf = 0L
    var bitCnt = 0
    def putBits(code: Int, len: Int): Unit = {
      bitBuf = (bitBuf << len) | (code & ((1L << len) - 1))
      bitCnt += len
      while (bitCnt >= 8) {
        val b = ((bitBuf >> (bitCnt - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        bitCnt -= 8
      }
    }
    def category(v: Int): Int = { // bit length of |v|
      var a = math.abs(v); var s = 0
      while (a != 0) { a >>= 1; s += 1 }
      s
    }
    val prevDc = new Array[Int](nc)
    val coefs = new Array[Int](64)
    for (my <- 0 until height / (8 * maxV); mx <- 0 until width / (8 * maxH);
         c <- 0 until nc; bv <- 0 until samp(c)._2;
         bhh <- 0 until samp(c)._1) {
      val bx = mx * samp(c)._1 + bhh
      val by = my * samp(c)._2 + bv
      val pixel = planes(c)
      val qt = quantOf(c)
      // forward DCT of the level-shifted block, quantized
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var acc = 0.0
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              acc += ((pixel(bx * 8 + x, by * 8 + y) & 0xff) - 128) *
                Cos(x)(u) * Cos(y)(v)
              x += 1
            }
            y += 1
          }
          val f = 0.25 * cNorm(u) * cNorm(v) * acc
          coefs(v * 8 + u) = math.round(f / qt(v * 8 + u)).toInt
          v += 1
        }
        u += 1
      }
      val dcCodes = dcCodesOf(c)
      val acCodes = acCodesOf(c)
      // DC: category + extended diff bits (T.81 F.1.2.1)
      val diff = coefs(0) - prevDc(c)
      prevDc(c) = coefs(0)
      val s = category(diff)
      val (dcCode, dcLen) = dcCodes(s)
      putBits(dcCode, dcLen)
      if (s > 0) putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      // AC: (run, size) symbols in zigzag order, ZRL + EOB
      var run = 0
      var zi = 1
      var lastNz = 63
      while (lastNz >= 1 && coefs(Zigzag(lastNz)) == 0) lastNz -= 1
      while (zi <= lastNz) {
        val cf = coefs(Zigzag(zi))
        if (cf == 0) run += 1
        else {
          while (run >= 16) {
            val (z, zl) = acCodes(0xf0); putBits(z, zl); run -= 16
          }
          val sz = category(cf)
          val (code, len) = acCodes((run << 4) | sz)
          putBits(code, len)
          putBits(if (cf >= 0) cf else cf + (1 << sz) - 1, sz)
          run = 0
        }
        zi += 1
      }
      if (lastNz < 63) { val (e, el) = acCodes(0x00); putBits(e, el) }
    }
    if (bitCnt > 0) putBits(0xff, 8 - bitCnt) // pad with 1s
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode an 8-bit grayscale image (dims multiples of 8) as a
    * PROGRESSIVE (SOF2) JPEG — T.81 Annex G, spectral selection AND
    * successive approximation, using the 6-scan script shape real
    * encoders default to for luma:
    *   1. DC first        Ss=0  Se=0  Ah=0 Al=1   (diff-coded, Al bits withheld)
    *   2. AC first low    Ss=1  Se=5  Ah=0 Al=2
    *   3. AC first high   Ss=6  Se=63 Ah=0 Al=2
    *   4. AC refinement   Ss=1  Se=63 Ah=2 Al=1   (correction bits)
    *   5. DC refinement   Ss=0  Se=0  Ah=1 Al=0   (raw bit per block)
    *   6. AC refinement   Ss=1  Se=63 Ah=1 Al=0
    * After all scans every coefficient is at full precision, so the
    * block-constant fixtures keep the baseline family's bit-exactness
    * argument: DC-only blocks, exact quantization, exact IDCT. The AC
    * first/refinement scans carry EOB-run coding (G.1.2.2) and the
    * correction-bit protocol (G.1.2.3) — on general content both are
    * fully exercised and refereed by ImageIO reading our stream. */
  def encodeProgressiveGray(width: Int, height: Int,
      pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && width % 8 == 0 && height % 8 == 0,
      s"fixture dims must be multiples of 8, got ${width}x$height")
    val bw = width / 8
    val bh = height / 8
    // forward DCT + quantization of every block, natural order
    val blocks = Array.ofDim[Int](bw * bh, 64)
    for (by <- 0 until bh; bx <- 0 until bw) {
      val coefs = blocks(by * bw + bx)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var acc = 0.0
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              acc += ((pixel(bx * 8 + x, by * 8 + y) & 0xff) - 128) *
                Cos(x)(u) * Cos(y)(v)
              x += 1
            }
            y += 1
          }
          val f = 0.25 * cNorm(u) * cNorm(v) * acc
          coefs(v * 8 + u) = math.round(f / QuantTable(v * 8 + u)).toInt
          v += 1
        }
        u += 1
      }
    }
    val out = new java.io.ByteArrayOutputStream(1024)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def be16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xdb); be16(2 + 1 + 64); out.write(0) // DQT 0
    Zigzag.foreach(i => out.write(QuantTable(i)))
    marker(0xc2); be16(8 + 3) // SOF2
    out.write(8); be16(height); be16(width); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be16(2 + 1 + 16 + vals.length); out.write((cls << 4) | id)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, 0, DcBits, DcVals)
    dht(1, 0, ProgAcBits, ProgAcVals)
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(ProgAcBits, ProgAcVals)
    var bitBuf = 0L
    var bitCnt = 0
    def putBits(code: Int, len: Int): Unit = {
      bitBuf = (bitBuf << len) | (code & ((1L << len) - 1))
      bitCnt += len
      while (bitCnt >= 8) {
        val b = ((bitBuf >> (bitCnt - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00)
        bitCnt -= 8
      }
    }
    def flushBits(): Unit = if (bitCnt > 0) putBits(0xff, 8 - bitCnt)
    def category(v: Int): Int = {
      var a = math.abs(v); var s = 0
      while (a != 0) { a >>= 1; s += 1 }
      s
    }
    def sos(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      marker(0xda); be16(6 + 2)
      out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    // --- scan 1: DC first, Al = 1 (diff of the arithmetic-shifted DC,
    // mirrored by the decoder's << Al reconstruction) ---
    sos(0, 0, 0, 1)
    var prevDc = 0
    for (b <- blocks) {
      val v = b(0) >> 1
      val diff = v - prevDc
      prevDc = v
      val s = category(diff)
      val (c0, l0) = dcCodes(s)
      putBits(c0, l0)
      if (s > 0) putBits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    }
    flushBits()
    // --- AC scans: shared first-scan and refinement emitters ---
    // first scan (G.1.2.2): sign-magnitude point transform, run/size
    // symbols, cross-block EOB runs flushed as EOBn + extension bits
    def acFirstScan(ss: Int, se: Int, al: Int): Unit = {
      sos(ss, se, 0, al)
      var eobrun = 0
      def emitEobrun(): Unit = if (eobrun > 0) {
        var nbits = 0
        var t = eobrun
        while ({ t >>= 1; t != 0 }) nbits += 1
        val (c0, l0) = acCodes(nbits << 4)
        putBits(c0, l0)
        if (nbits > 0) putBits(eobrun - (1 << nbits), nbits)
        eobrun = 0
      }
      for (b <- blocks) {
        // point transform toward zero (T.81 G.1.2.2, not >>)
        var hasContent = false
        var k = ss
        while (k <= se && !hasContent) {
          if (math.abs(b(Zigzag(k))) >> al != 0) hasContent = true
          k += 1
        }
        if (!hasContent) {
          eobrun += 1
          if (eobrun == 0x7fff) emitEobrun()
        } else {
          emitEobrun()
          var r = 0
          var lastNz = se
          while (math.abs(b(Zigzag(lastNz))) >> al == 0) lastNz -= 1
          k = ss
          while (k <= lastNz) {
            val raw = b(Zigzag(k))
            val mag = math.abs(raw) >> al
            if (mag == 0) r += 1
            else {
              while (r > 15) {
                val (z, zl) = acCodes(0xf0); putBits(z, zl); r -= 16
              }
              val t = if (raw < 0) -mag else mag
              val s = category(t)
              val (c0, l0) = acCodes((r << 4) | s)
              putBits(c0, l0)
              putBits(if (t >= 0) t else t + (1 << s) - 1, s)
              r = 0
            }
            k += 1
          }
          if (lastNz < se) eobrun += 1 // trailing zeros: a fresh EOB run
        }
      }
      emitEobrun()
      flushBits()
    }
    // refinement scan (G.1.2.3): newly-significant run/1 symbols with
    // sign bits; one buffered correction bit per nonzero-history
    // coefficient passed, flushed after the symbol that spans it
    def acRefineScan(ss: Int, se: Int, al: Int): Unit = {
      sos(ss, se, al + 1, al)
      // two correction-bit buffers, matching where the DECODER reads
      // them: bits tied to the PENDING EOB RUN (previous blocks' tails,
      // read right after the EOBn extension bits, block order) vs bits
      // of the CURRENT block since the last symbol (read while the
      // decoder advances past that symbol's span)
      var eobrun = 0
      val pendingEob = new scala.collection.mutable.ArrayBuffer[Int]()
      val pendingCur = new scala.collection.mutable.ArrayBuffer[Int]()
      def emitCur(): Unit = { pendingCur.foreach(putBits(_, 1)); pendingCur.clear() }
      def emitEobrun(): Unit = {
        if (eobrun > 0) {
          var nbits = 0
          var t = eobrun
          while ({ t >>= 1; t != 0 }) nbits += 1
          val (c0, l0) = acCodes(nbits << 4)
          putBits(c0, l0)
          if (nbits > 0) putBits(eobrun - (1 << nbits), nbits)
          eobrun = 0
        }
        pendingEob.foreach(putBits(_, 1)); pendingEob.clear()
      }
      for (b <- blocks) {
        // last newly-significant index (|coef| at this precision == 1);
        // ZRLs are only emitted up to it — trailing zero runs fold into
        // the cross-block EOB run instead
        var lastNew = ss - 1
        var k = ss
        while (k <= se) {
          if (math.abs(b(Zigzag(k))) >> al == 1) lastNew = k
          k += 1
        }
        var r = 0
        k = ss
        while (k <= se) {
          val raw = b(Zigzag(k))
          val mag = math.abs(raw) >> al
          if (mag == 0) r += 1
          else {
            while (r > 15 && k <= lastNew) {
              emitEobrun()
              val (z, zl) = acCodes(0xf0); putBits(z, zl)
              r -= 16
              emitCur() // corrections inside the ZRL span
            }
            if (mag > 1) pendingCur += (mag & 1) // history-nonzero: r unchanged
            else { // newly significant (history |coef| was 0 at Al+1)
              emitEobrun()
              val (c0, l0) = acCodes((r << 4) | 1)
              putBits(c0, l0)
              putBits(if (raw < 0) 0 else 1, 1)
              emitCur() // corrections inside this symbol's span
              r = 0
            }
          }
          k += 1
        }
        if (r > 0 || pendingCur.nonEmpty) { // block tail folds into EOB run
          eobrun += 1
          pendingEob ++= pendingCur
          pendingCur.clear()
          if (eobrun == 0x7fff) emitEobrun()
        }
      }
      emitEobrun()
      flushBits()
    }
    acFirstScan(1, 5, 2)   // scan 2
    acFirstScan(6, 63, 2)  // scan 3
    acRefineScan(1, 63, 1) // scan 4
    // --- scan 5: DC refinement, one raw bit per block ---
    sos(0, 0, 1, 0)
    for (b <- blocks) putBits(b(0) & 1, 1)
    flushBits()
    acRefineScan(1, 63, 0) // scan 6
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** PROGRESSIVE fixture payload: the grayscale dedup block formula
    * through [[encodeProgressiveGray]] — decoded pixels equal the
    * baseline fixture's exactly (block-constant, full precision after
    * all scans), so the mm_jpeg_prog_dhash oracle is the SAME pixel
    * formula replay as mm_jpeg_dhash; only the wire format differs.
    * Static entry point for the
    * [[org.apache.spark.sql.graft.DedupJpegProgPayload]] expression. */
  def dedupJpegProgPayloadOf(docId: Long): Array[Byte] = {
    val (w, h) = dedupJpegDims(docId)
    val block = dedupJpegBlockVal(docId) _
    encodeProgressiveGray(w, h, (x, y) => block(x / 8, y / 8))
  }

  /** Header probe: (width, height) from the SOF0 frame header — the
    * O(1) metadata pass, JPEG sibling of [[Multimodal.pngDims]]. */
  def dims(payload: Array[Byte]): (Int, Int) = {
    val d = new Decoder(payload)
    d.parseHeaders(stopAtSos = true)
    (d.width, d.height)
  }

  /** Full pixel decode of a baseline grayscale JPEG: marker walk,
    * DQT/DHT parse (foreign tables accepted), Huffman + DC-prediction
    * entropy decode with restart-interval support, dequant, exact
    * StrictMath IDCT, level shift, clamp. Returns (w, h, gray) in
    * scanline order. */
  def pixelsGray(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val d = new Decoder(payload)
    d.parseHeaders(stopAtSos = false)
    // reject BEFORE paying the entropy decode + IDCT of a colour scan
    require(d.nComps == 1, s"pixelsGray on a ${d.nComps}-component JPEG")
    val planes = if (d.progressive) d.decodeProgressive() else d.decodeScan()
    (d.width, d.height, planes(0))
  }

  /** Fixed-point BT.601 inverse colour transform (1/1000 coefficients,
    * bias keeps every numerator nonnegative so floor == truncation ==
    * the oracle's `//` — exact integers end to end):
    *   r = (1000*y + 1402*(cr-128) + 1024000)/1000 - 1024
    *   g = (1000*y -  344*(cb-128) - 714*(cr-128) + 1024000)/1000 - 1024
    *   b = (1000*y + 1772*(cb-128) + 1024000)/1000 - 1024
    * each clamped to 0..255. */
  def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def clamp(v: Int) = math.max(0, math.min(255, v))
    (clamp((1000 * y + 1402 * (cr - 128) + 1024000) / 1000 - 1024),
      clamp((1000 * y - 344 * (cb - 128) - 714 * (cr - 128) + 1024000) / 1000 - 1024),
      clamp((1000 * y + 1772 * (cb - 128) + 1024000) / 1000 - 1024))
  }

  /** Full pixel decode of a 3-component 4:4:4 baseline COLOUR JPEG:
    * the [[pixelsGray]] machinery generalized to interleaved MCUs with
    * per-component tables and DC prediction, then the exact fixed-point
    * [[yccToRgb]] transform. Returns (w, h, rgb) with rgb in scanline
    * order, 3 ints per pixel — the same shape as
    * [[Multimodal.pngPixels]]. */
  def pixelsColor(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val d = new Decoder(payload)
    d.parseHeaders(stopAtSos = false)
    // reject BEFORE paying the entropy decode + IDCT of a gray scan
    require(d.nComps == 3, s"pixelsColor on a ${d.nComps}-component JPEG")
    val planes = if (d.progressive) d.decodeProgressive() else d.decodeScan()
    // 4:2:0/4:2:2 chroma upsamples by nearest-neighbour replication
    val yP = d.fullResPlane(0, planes)
    val cbP = d.fullResPlane(1, planes)
    val crP = d.fullResPlane(2, planes)
    val n = d.width * d.height
    val rgb = new Array[Int](3 * n)
    var i = 0
    while (i < n) {
      val (r, g, b) = yccToRgb(yP(i), cbP(i), crP(i))
      rgb(3 * i) = r; rgb(3 * i + 1) = g; rgb(3 * i + 2) = b
      i += 1
    }
    (d.width, d.height, rgb)
  }

  /** 64-bit dHash over the decoded COLOUR pixels — the pngDHash luma
    * formula ((299r + 587g + 114b)/1000 in exact integers) over the
    * same 9x8 block-mean geometry. */
  def jpegColorDHash(payload: Array[Byte]): Long = {
    val (w, h, rgb) = pixelsColor(payload)
    require(w >= 9 && h >= 8, s"dHash needs >= 9x8, got ${w}x$h")
    val sums = Array.ofDim[Long](9, 8)
    val cnts = Array.ofDim[Long](9, 8)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val gx = x * 9 / w
        val o = (y * w + x) * 3
        sums(gx)(gy) += (299 * rgb(o) + 587 * rgb(o + 1) + 114 * rgb(o + 2)) / 1000
        cnts(gx)(gy) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (sums(gx + 1)(gy) * cnts(gx)(gy) > sums(gx)(gy) * cnts(gx + 1)(gy))
          hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** 64-bit dHash over the decoded grayscale pixels — the same 9x8
    * block-mean geometry and exact cross-multiplied comparison as
    * [[Multimodal.pngDHash]], with luma = the gray value itself. */
  def jpegDHash(payload: Array[Byte]): Long = {
    val (w, h, g) = pixelsGray(payload)
    require(w >= 9 && h >= 8, s"dHash needs >= 9x8, got ${w}x$h")
    val sums = Array.ofDim[Long](9, 8)
    val cnts = Array.ofDim[Long](9, 8)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val gx = x * 9 / w
        sums(gx)(gy) += g(y * w + x)
        cnts(gx)(gy) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (sums(gx + 1)(gy) * cnts(gx)(gy) > sums(gx)(gy) * cnts(gx + 1)(gy))
          hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** JPEG-dedup fixture family: BLOCK-CONSTANT images (flat 8x8 blocks,
    * so the DCT round-trip is bit-exact — see the object scaladoc).
    * Docs sharing (doc_id % 7, (doc_id/7) % 12) render the same base
    * block pattern (84 classes — wide enough that same-hash buckets
    * stay small and the banding cost is pair-volume-honest, not a
    * quadratic artifact of too few variants); ~1/13 of blocks take a
    * per-doc +17 bump, turning exact duplicates into near duplicates.
    * The oracle re-derives every pixel from this formula. */
  def dedupJpegDims(docId: Long): (Int, Int) = {
    val fam = (docId % 7).toInt
    (8 * (4 + fam), 8 * (3 + fam))
  }

  def dedupJpegBlockVal(docId: Long)(bx: Int, by: Int): Int = {
    val s = ((docId / 7) % 12).toInt
    // ScaleGen replicas (ids >= 1e9, the key-offset convention) carry a
    // COORDINATE-VARYING replica term, so the class count grows with
    // the corpus and cross-replica docs never form near-dup clusters —
    // the media twin of the bijective text rotation (a constant shift
    // would be dHash-invariant; varying it by (bx, by) changes the
    // block-mean differences the hash compares). Zero for every
    // driver-generated id, so the closed-form oracles are untouched.
    val rep = (docId / 1000000000L).toInt
    val base = (bx * bx * 5 + by * by * 11 + bx * by * (s + 1) * 3 +
      (bx * 7 + by * 3 + bx * by) * rep * 5) % 224 + 8
    val bump = if ((bx * 7 + by * 5) % 13 == (docId % 13).toInt) 17 else 0
    base + bump
  }

  /** Static entry point for the
    * [[org.apache.spark.sql.graft.DedupJpegPayload]] expression. */
  def dedupJpegPayloadOf(docId: Long): Array[Byte] = {
    val (w, h) = dedupJpegDims(docId)
    val block = dedupJpegBlockVal(docId) _
    encodeGray(w, h, (x, y) => block(x / 8, y / 8))
  }

  /** COLOUR fixture family: block-constant YCbCr planes (DC-only, so
    * the round-trip is bit-exact per plane and the decoded RGB is the
    * exact [[yccToRgb]] image of the formula). Same (doc_id % 7,
    * (doc_id/7) % 12) class structure as the grayscale family; the
    * per-doc bump perturbs the LUMA plane only, the chroma planes are
    * class-constant (the shape a tinted near-dup actually has). */
  def dedupJpegColorYcc(docId: Long)(bx: Int, by: Int): (Int, Int, Int) = {
    val s = ((docId / 7) % 12).toInt
    val rep = (docId / 1000000000L).toInt // ScaleGen class growth, see above
    val yv = (bx * bx * 5 + by * by * 11 + bx * by * (s + 1) * 3 +
      (bx * 7 + by * 3 + bx * by) * rep * 5) % 224 + 8 +
      (if ((bx * 7 + by * 5) % 13 == (docId % 13).toInt) 17 else 0)
    val cb = (bx * 19 + s * 37) % 160 + 48
    val cr = (by * 23 + s * 41) % 160 + 48
    (yv, cb, cr)
  }

  /** Static entry point for the
    * [[org.apache.spark.sql.graft.DedupJpegColorPayload]] expression. */
  def dedupJpegColorPayloadOf(docId: Long): Array[Byte] = {
    val (w, h) = dedupJpegDims(docId)
    val block = dedupJpegColorYcc(docId) _
    encodeColorYcc(w, h, (x, y) => block(x / 8, y / 8))
  }

  /** 4:2:0 fixture: the SAME colour block formula at 16x16 TILE
    * granularity (dims double to stay MCU-aligned), so every luma block
    * and every subsampled chroma block is constant — DC-only planes,
    * nearest upsampling of a constant is the constant, and the decoded
    * RGB is the exact [[yccToRgb]] image of the tile formula even
    * through chroma subsampling. Static entry point for the
    * [[org.apache.spark.sql.graft.DedupJpeg420Payload]] expression. */
  def dedupJpeg420PayloadOf(docId: Long): Array[Byte] = {
    val (w, h) = dedupJpegDims(docId)
    val block = dedupJpegColorYcc(docId) _
    encodeColorYcc420(2 * w, 2 * h, (x, y) => block(x / 16, y / 16))
  }

  /** Marker-walking baseline-JPEG decoder (single instance per payload).
    * Grayscale and 3-component 4:4:4 colour (one block per component
    * per MCU, per-component quant/Huffman/DC-prediction). */
  private final class Decoder(data: Array[Byte]) {
    var width = 0
    var height = 0
    var nComps = 0
    var progressive = false
    private var pos = 0
    private val quant = Array.ofDim[Int](4, 64) // natural order
    // Huffman tables by (class, id): count per length + canonical symbols
    private val hCount = Array.ofDim[Int](2, 4, 17)
    private val hSyms = Array.ofDim[Array[Int]](2, 4)
    private val compQuant = new Array[Int](3)
    private val compId = new Array[Int](3)
    private val compH = new Array[Int](3) // sampling factors (<= 2)
    private val compV = new Array[Int](3)
    private val dcTable = new Array[Int](3)
    private val acTable = new Array[Int](3)
    private var restartInterval = 0
    private var scanStart = -1
    // current scan parameters (progressive: set per SOS; baseline: the
    // full 0..63 sequential scan)
    private var scanComps: Array[Int] = null // frame component indices
    private var ss = 0
    private var se = 63
    private var ah = 0
    private var al = 0

    private def u8(): Int = {
      require(pos < data.length, "not a JPEG: truncated")
      val v = data(pos) & 0xff; pos += 1; v
    }
    private def u16(): Int = { val hi = u8(); (hi << 8) | u8() }

    private def parseDht(): Unit = {
      val seglen = u16() // read BEFORE using pos: u16 advances it
      val end = pos + seglen - 2
      while (pos < end) {
        val tcTh = u8()
        val tc = tcTh >> 4; val th = tcTh & 0x0f
        require(tc <= 1 && th <= 3, "bad DHT class/id")
        var total = 0
        var l = 1
        while (l <= 16) { hCount(tc)(th)(l) = u8(); total += hCount(tc)(th)(l); l += 1 }
        hSyms(tc)(th) = Array.fill(total)(u8())
      }
    }

    private def parseDqt(): Unit = {
      val seglen = u16()
      val end = pos + seglen - 2
      while (pos < end) {
        val pqTq = u8()
        require((pqTq >> 4) == 0, "only 8-bit quant tables here")
        val tq = pqTq & 0x0f
        var i = 0
        while (i < 64) { quant(tq)(Zigzag(i)) = u8(); i += 1 }
      }
    }

    /** Parse an SOS header and set the current-scan state; leaves `pos`
      * at the first entropy byte. Baseline mode requires the single
      * full sequential scan; progressive accepts any spec-valid
      * (Ss, Se, Ah, Al) band. */
    private def parseSos(): Unit = {
      u16()
      val ns = u8()
      if (progressive)
        require(ns >= 1 && ns <= nComps, s"bad scan component count $ns")
      else require(ns == nComps,
        s"interleaved scan expected: $ns of $nComps components")
      scanComps = new Array[Int](ns)
      for (i <- 0 until ns) {
        val cid = u8()
        var idx = -1
        var c = 0
        while (c < nComps) { if (compId(c) == cid) idx = c; c += 1 }
        require(idx >= 0, s"unknown scan component id $cid")
        scanComps(i) = idx
        val t = u8()
        dcTable(idx) = t >> 4; acTable(idx) = t & 0x0f
      }
      ss = u8(); se = u8()
      val ahal = u8(); ah = ahal >> 4; al = ahal & 0x0f
      if (progressive) {
        require(ss <= se && se <= 63 && al <= 13 && ah <= 13 &&
          (ah == 0 || ah == al + 1),
          s"bad progressive scan header Ss=$ss Se=$se Ah=$ah Al=$al")
        require(ss > 0 || se == 0, "DC progressive scan must have Se=0")
        require(ss == 0 || ns == 1,
          "progressive AC scans are non-interleaved (T.81 G.1)")
      } else {
        require(ss == 0 && se == 63 && ah == 0 && al == 0,
          "not a baseline sequential scan")
        // the baseline MCU loop walks components in FRAME order
        require(scanComps.sameElements(0 until nComps),
          "baseline scan order must match frame order")
      }
      scanStart = pos
    }

    def parseHeaders(stopAtSos: Boolean): Unit = {
      require(data.length >= 4 && u8() == 0xff && u8() == 0xd8,
        "not a JPEG: missing SOI")
      var done = false
      while (!done) {
        var m = u8()
        require(m == 0xff, f"not a JPEG: expected marker, got $m%02x")
        while (m == 0xff) m = u8() // fill bytes are legal
        m match {
          case 0xdb => parseDqt()
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 baseline, SOF2 progressive
            progressive = m == 0xc2
            u16()
            require(u8() == 8, "not 8-bit")
            height = u16(); width = u16()
            nComps = u8()
            require(nComps == 1 || nComps == 3,
              s"grayscale/YCbCr decoder: got $nComps components")
            for (c <- 0 until nComps) {
              compId(c) = u8()
              val hv = u8()
              compH(c) = hv >> 4; compV(c) = hv & 0x0f
              require(compH(c) >= 1 && compH(c) <= 2 &&
                compV(c) >= 1 && compV(c) <= 2,
                f"sampling $hv%02x unsupported (factors up to 2x2 only)")
              compQuant(c) = u8()
            }
            require(nComps == 1 || compH(1) == 1 && compV(1) == 1 &&
              compH(2) == 1 && compV(2) == 1,
              "chroma sampling factors above 1x1 unsupported")
            // T.81 A.2: a single-component scan is NON-interleaved (one
            // data unit per MCU in raster order); the baseline MCU
            // loop is interleaved, so a grayscale frame carrying 2x2
            // factors must be refused loudly, not decoded scrambled
            // (the progressive path handles non-interleaved AC scans,
            // but keeps the same frame restriction for symmetry)
            require(nComps == 3 || compH(0) == 1 && compV(0) == 1,
              "single-component scan is non-interleaved (T.81 A.2): " +
                "sampling factors above 1x1 unsupported for grayscale")
          case 0xc4 => parseDht()
          case 0xdd => // DRI
            require(u16() == 4, "bad DRI length")
            restartInterval = u16()
          case 0xda =>
            parseSos()
            done = true
          case 0xd9 => throw new IllegalArgumentException(
            "not a JPEG: EOI before scan")
          case x if x >= 0xe0 && x <= 0xef => // APPn
            val l = u16(); pos += l - 2
          case 0xfe => // COM
            val l = u16(); pos += l - 2
          case x => throw new IllegalArgumentException(
            f"unsupported JPEG marker $x%02x")
        }
        if (stopAtSos && width > 0 && !done) done = true
      }
      require(width > 0 && height > 0, "not a JPEG: no frame header")
    }

    def decodeScan(): Array[Array[Int]] = {
      require(scanStart >= 0, "decodeScan before SOS")
      pos = scanStart
      var bitBuf = 0L
      var bitCnt = 0
      def nextBit(): Int = {
        if (bitCnt == 0) {
          val b = u8()
          val v = if (b == 0xff) {
            val n = u8()
            require(n == 0x00, f"marker ff$n%02x inside entropy data")
            0xff
          } else b
          bitBuf = v; bitCnt = 8
        }
        bitCnt -= 1
        ((bitBuf >> bitCnt) & 1).toInt
      }
      def decodeHuff(tc: Int, th: Int): Int = {
        require(hSyms(tc)(th) != null, s"missing Huffman table $tc/$th")
        var code = 0; var first = 0; var index = 0; var len = 1
        while (len <= 16) {
          code = (code << 1) | nextBit()
          val cnt = hCount(tc)(th)(len)
          if (code - first < cnt) return hSyms(tc)(th)(index + code - first)
          index += cnt
          first = (first + cnt) << 1
          len += 1
        }
        throw new IllegalArgumentException("bad JPEG: invalid Huffman code")
      }
      def receiveExtend(s: Int): Int = {
        if (s == 0) return 0
        var v = 0
        var i = 0
        while (i < s) { v = (v << 1) | nextBit(); i += 1 }
        if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
      }
      // per-component SUBSAMPLED plane dims (T.81 A.1.1 ceil division);
      // 1x1 components land full-resolution, exactly as before
      val maxH = (0 until nComps).map(compH).max
      val maxV = (0 until nComps).map(compV).max
      val pw = Array.tabulate(nComps)(c =>
        (width * compH(c) + maxH - 1) / maxH)
      val ph = Array.tabulate(nComps)(c =>
        (height * compV(c) + maxV - 1) / maxV)
      val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
      val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
      val planes = Array.tabulate(nComps)(c => new Array[Int](pw(c) * ph(c)))
      val coefs = new Array[Int](64)
      val prevDc = new Array[Int](nComps)
      var mcu = 0
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // byte-align, expect RSTn, reset every DC predictor
          bitCnt = 0
          require(u8() == 0xff, "bad JPEG: expected restart marker")
          val m = u8()
          require(m >= 0xd0 && m <= 0xd7, f"bad restart marker $m%02x")
          java.util.Arrays.fill(prevDc, 0)
        }
        for (c <- 0 until nComps; bv <- 0 until compV(c);
             bhh <- 0 until compH(c)) {
          val q = quant(compQuant(c))
          java.util.Arrays.fill(coefs, 0)
          val s = decodeHuff(0, dcTable(c))
          prevDc(c) += receiveExtend(s)
          coefs(0) = prevDc(c) * q(0)
          var zi = 1
          var eob = false
          while (zi < 64 && !eob) {
            val rs = decodeHuff(1, acTable(c))
            val run = rs >> 4; val size = rs & 0x0f
            if (size == 0) {
              if (run == 15) zi += 16 // ZRL
              else eob = true         // EOB
            } else {
              zi += run
              require(zi < 64, "bad JPEG: AC index overflow")
              coefs(Zigzag(zi)) = receiveExtend(size) * q(Zigzag(zi))
              zi += 1
            }
          }
          // IDCT + level shift + clamp, into this component's plane
          val out = planes(c)
          val bx = mx * compH(c) + bhh
          val by = my * compV(c) + bv
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              var acc = 0.0
              var u = 0
              while (u < 8) {
                var v = 0
                while (v < 8) {
                  val cf = coefs(v * 8 + u)
                  if (cf != 0)
                    acc += cNorm(u) * cNorm(v) * cf * Cos(x)(u) * Cos(y)(v)
                  v += 1
                }
                u += 1
              }
              val px = by * 8 + y
              val pxx = bx * 8 + x
              if (px < ph(c) && pxx < pw(c)) {
                val g = math.round(0.25 * acc).toInt + 128
                out(px * pw(c) + pxx) = math.max(0, math.min(255, g))
              }
              x += 1
            }
            y += 1
          }
        }
        mcu += 1
      }
      planes
    }

    /** PROGRESSIVE (SOF2) decode — T.81 Annex G: spectral selection +
      * successive approximation. Coefficients accumulate across scans
      * into a per-component MCU-padded block store; after EOI every
      * image block dequantizes + IDCTs exactly like the baseline path,
      * so block-constant fixtures stay bit-exact end to end.
      *
      * Scan grammar handled: interleaved or single-component DC first
      * scans (diff-coded at Al precision), raw-bit DC refinements,
      * non-interleaved AC first scans with EOB runs (G.1.2.2), AC
      * refinement scans with correction bits (G.1.2.3), DHT/DRI
      * between scans, restart intervals inside any scan. */
    def decodeProgressive(): Array[Array[Int]] = {
      require(progressive && scanStart >= 0, "decodeProgressive misuse")
      val maxH = (0 until nComps).map(compH).max
      val maxV = (0 until nComps).map(compV).max
      val pw = Array.tabulate(nComps)(c =>
        (width * compH(c) + maxH - 1) / maxH)
      val ph = Array.tabulate(nComps)(c =>
        (height * compV(c) + maxV - 1) / maxV)
      val mcusX = (width + 8 * maxH - 1) / (8 * maxH)
      val mcusY = (height + 8 * maxV - 1) / (8 * maxV)
      val bwPad = Array.tabulate(nComps)(c => mcusX * compH(c))
      val bhPad = Array.tabulate(nComps)(c => mcusY * compV(c))
      val store = Array.tabulate(nComps)(c =>
        new Array[Int](bwPad(c) * bhPad(c) * 64))
      var moreScans = true
      pos = scanStart
      while (moreScans) {
        decodeProgScan(store, bwPad, pw, ph, mcusX, mcusY)
        // entropy data consumed exactly; markers follow (fill bytes ok)
        var sawScan = false
        var atEnd = false
        while (!sawScan && !atEnd) {
          var m = u8()
          require(m == 0xff,
            f"not a JPEG: expected marker after scan, got $m%02x")
          while (m == 0xff) m = u8()
          m match {
            case 0xc4 => parseDht()
            case 0xdb => parseDqt()
            case 0xdd =>
              require(u16() == 4, "bad DRI length")
              restartInterval = u16()
            case 0xda => parseSos(); sawScan = true
            case 0xd9 => atEnd = true
            case x if x >= 0xe0 && x <= 0xef =>
              val l = u16(); pos += l - 2
            case 0xfe =>
              val l = u16(); pos += l - 2
            case x => throw new IllegalArgumentException(
              f"unsupported JPEG marker $x%02x between scans")
          }
        }
        moreScans = sawScan
      }
      // dequant + IDCT every IMAGE block (padding blocks are decode
      // scaffolding only) — identical arithmetic to the baseline path
      val planes = Array.tabulate(nComps)(c => new Array[Int](pw(c) * ph(c)))
      val coefs = new Array[Int](64)
      for (c <- 0 until nComps) {
        val q = quant(compQuant(c))
        val bw = (pw(c) + 7) / 8
        val bh = (ph(c) + 7) / 8
        val out = planes(c)
        for (by <- 0 until bh; bx <- 0 until bw) {
          val base = (by * bwPad(c) + bx) * 64
          var i = 0
          while (i < 64) { coefs(i) = store(c)(base + i) * q(i); i += 1 }
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              var acc = 0.0
              var u = 0
              while (u < 8) {
                var v = 0
                while (v < 8) {
                  val cf = coefs(v * 8 + u)
                  if (cf != 0)
                    acc += cNorm(u) * cNorm(v) * cf * Cos(x)(u) * Cos(y)(v)
                  v += 1
                }
                u += 1
              }
              val py = by * 8 + y
              val px = bx * 8 + x
              if (py < ph(c) && px < pw(c)) {
                val g = math.round(0.25 * acc).toInt + 128
                out(py * pw(c) + px) = math.max(0, math.min(255, g))
              }
              x += 1
            }
            y += 1
          }
        }
      }
      planes
    }

    /** One progressive scan's entropy data, accumulated into `store`.
      * Leaves `pos` at the first byte after the scan's entropy data
      * (byte-aligned — the next bytes are a marker). */
    private def decodeProgScan(store: Array[Array[Int]],
        bwPad: Array[Int], pw: Array[Int], ph: Array[Int],
        mcusX: Int, mcusY: Int): Unit = {
      var bitBuf = 0L
      var bitCnt = 0
      def nextBit(): Int = {
        if (bitCnt == 0) {
          val b = u8()
          val v = if (b == 0xff) {
            val n = u8()
            require(n == 0x00, f"marker ff$n%02x inside entropy data")
            0xff
          } else b
          bitBuf = v; bitCnt = 8
        }
        bitCnt -= 1
        ((bitBuf >> bitCnt) & 1).toInt
      }
      def decodeHuff(tc: Int, th: Int): Int = {
        require(hSyms(tc)(th) != null, s"missing Huffman table $tc/$th")
        var code = 0; var first = 0; var index = 0; var len = 1
        while (len <= 16) {
          code = (code << 1) | nextBit()
          val cnt = hCount(tc)(th)(len)
          if (code - first < cnt) return hSyms(tc)(th)(index + code - first)
          index += cnt
          first = (first + cnt) << 1
          len += 1
        }
        throw new IllegalArgumentException("bad JPEG: invalid Huffman code")
      }
      def receive(s: Int): Int = {
        var v = 0; var i = 0
        while (i < s) { v = (v << 1) | nextBit(); i += 1 }
        v
      }
      def receiveExtend(s: Int): Int = {
        if (s == 0) return 0
        val v = receive(s)
        if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
      }
      val prevDc = new Array[Int](nComps) // predictors reset per scan
      var eobrun = 0
      var unit = 0 // MCU (interleaved) / data-unit (non-interleaved) count
      def restartIfDue(): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          bitCnt = 0
          require(u8() == 0xff, "bad JPEG: expected restart marker")
          val m = u8()
          require(m >= 0xd0 && m <= 0xd7, f"bad restart marker $m%02x")
          java.util.Arrays.fill(prevDc, 0)
          eobrun = 0
        }
      val p1 = 1 << al
      val m1 = -1 << al
      if (ss == 0) {
        // DC scan: interleaved over scanComps (or single-component,
        // where the MCU is one data unit in the component's own grid)
        val interleaved = scanComps.length > 1
        def dcUnit(c: Int, blockBase: Int): Unit =
          if (ah == 0) {
            val s = decodeHuff(0, dcTable(c))
            prevDc(c) += receiveExtend(s)
            store(c)(blockBase) = prevDc(c) << al
          } else { // refinement: one raw bit at position Al
            if (nextBit() == 1) store(c)(blockBase) |= p1
          }
        if (interleaved) {
          for (my <- 0 until mcusY; mx <- 0 until mcusX) {
            restartIfDue()
            for (i <- scanComps.indices; c = scanComps(i);
                 bv <- 0 until compV(c); bhh <- 0 until compH(c)) {
              val bx = mx * compH(c) + bhh
              val by = my * compV(c) + bv
              dcUnit(c, (by * bwPad(c) + bx) * 64)
            }
            unit += 1
          }
        } else {
          val c = scanComps(0)
          val bw = (pw(c) + 7) / 8
          val bh = (ph(c) + 7) / 8
          for (by <- 0 until bh; bx <- 0 until bw) {
            restartIfDue()
            dcUnit(c, (by * bwPad(c) + bx) * 64)
            unit += 1
          }
        }
      } else {
        // AC scan: single component, raster over its own block grid
        val c = scanComps(0)
        val bw = (pw(c) + 7) / 8
        val bh = (ph(c) + 7) / 8
        for (by <- 0 until bh; bx <- 0 until bw) {
          restartIfDue()
          val base = (by * bwPad(c) + bx) * 64
          if (ah == 0) {
            // first scan of this band (G.1.2.2): run/size symbols with
            // EOB-run extensions across blocks
            if (eobrun > 0) eobrun -= 1
            else {
              var k = ss
              while (k <= se) {
                val rs = decodeHuff(1, acTable(c))
                val r = rs >> 4; val s = rs & 0x0f
                if (s == 0) {
                  if (r < 15) { // EOBn: run of (1<<r)+ext end-of-band blocks
                    eobrun = (1 << r) - 1 + (if (r > 0) receive(r) else 0)
                    k = se + 1
                  } else k += 16 // ZRL
                } else {
                  k += r
                  require(k <= se, "bad JPEG: AC index past band end")
                  store(c)(base + Zigzag(k)) = receiveExtend(s) << al
                  k += 1
                }
              }
            }
          } else {
            // refinement scan (G.1.2.3): newly-significant coefficients
            // arrive as run/1 symbols; every nonzero-history coefficient
            // passed over consumes one correction bit
            var k = ss
            if (eobrun == 0) {
              var atEob = false
              while (k <= se && !atEob) {
                val rs = decodeHuff(1, acTable(c))
                var r = rs >> 4; val s = rs & 0x0f
                var newval = 0
                if (s == 0) {
                  if (r < 15) {
                    eobrun = (1 << r) + (if (r > 0) receive(r) else 0)
                    atEob = true // current block's tail handled below
                  }
                  // r == 15 (ZRL): skip 16 zero-history coefficients
                } else {
                  require(s == 1, "bad JPEG: refinement size != 1")
                  newval = if (nextBit() == 1) p1 else m1
                }
                if (!atEob) {
                  var placed = false
                  while (k <= se && !placed) {
                    val zz = base + Zigzag(k)
                    if (store(c)(zz) != 0) {
                      if (nextBit() == 1 && (store(c)(zz) & p1) == 0)
                        store(c)(zz) +=
                          (if (store(c)(zz) >= 0) p1 else m1)
                    } else {
                      if (r == 0) {
                        if (s != 0) store(c)(zz) = newval
                        placed = true
                      } else r -= 1
                    }
                    k += 1
                  }
                }
              }
            }
            if (eobrun > 0) {
              // end-of-band: correction bits only for the remaining
              // nonzero-history coefficients of this block
              while (k <= se) {
                val zz = base + Zigzag(k)
                if (store(c)(zz) != 0) {
                  if (nextBit() == 1 && (store(c)(zz) & p1) == 0)
                    store(c)(zz) += (if (store(c)(zz) >= 0) p1 else m1)
                }
                k += 1
              }
              eobrun -= 1
            }
          }
          unit += 1
        }
      }
    }

    /** Upsample component c's decoded plane to full resolution by
      * nearest-neighbour replication (exact for MCU-tile-constant
      * fixtures; a rounding-bar concern only vs decoders that
      * interpolate). No-op for 1x1 components. */
    def fullResPlane(c: Int, planes: Array[Array[Int]]): Array[Int] = {
      val maxH = (0 until nComps).map(compH).max
      val maxV = (0 until nComps).map(compV).max
      if (compH(c) == maxH && compV(c) == maxV) return planes(c)
      val pw = (width * compH(c) + maxH - 1) / maxH
      val out = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        val sy = y * compV(c) / maxV
        var x = 0
        while (x < width) {
          out(y * width + x) = planes(c)(sy * pw + x * compH(c) / maxH)
          x += 1
        }
        y += 1
      }
      out
    }
  }
}
