package graft.ops

/** Hand-rolled DEFLATE/zlib decompression — RFC 1951 (all three block
  * types: stored, fixed-Huffman, dynamic-Huffman) under the RFC 1950
  * zlib wrapper with a hand-computed Adler-32 integrity check. No
  * `java.util.zip.Inflater` anywhere: this is the real decode rung for
  * compressed media payloads (PNG IDAT streams are zlib; production
  * encoders emit dynamic-Huffman blocks). [[Multimodal.pngPixels]] runs
  * every PNG gate through this decoder, so the 270-query oracle suite
  * pins it bit-for-bit, and InflateSpec referees it against the JDK's
  * independent zlib in both directions (our inflate over Deflater
  * output at every compression level; both decoders over hand-built
  * streams) plus corruption rejection.
  *
  * Reference semantics: mirrors the reference pipeline's reliance on
  * library decompression for fetched filing payloads (MergeExtractor
  * downloads gzip/deflate-encoded EDGAR bodies); here the codec itself
  * is part of the engine surface.
  */
object Inflate {

  // RFC 1951 §3.2.5: length codes 257-285 -> (base, extra bits)
  private val LenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19,
    23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
    2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  // distance codes 0-29 -> (base, extra bits)
  private val DistBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65,
    97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
    8193, 12289, 16385, 24577)
  private val DistExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
    6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)
  // §3.2.7: the order code-length-code lengths are stored in
  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12,
    3, 13, 2, 14, 1, 15)
  private val MaxBits = 15

  /** Canonical Huffman decoder built from a code-length array (RFC 1951
    * §3.2.2): per-length symbol counts + symbols sorted by (length,
    * symbol). Rejects over-subscribed length sets; incomplete sets are
    * accepted (legal for single-symbol distance codes) and decoding a
    * gap fails loudly. */
  private final class Huffman(lengths: Array[Int]) {
    val count = new Array[Int](MaxBits + 1)
    var i = 0
    while (i < lengths.length) {
      require(lengths(i) <= MaxBits, s"code length ${lengths(i)} > 15")
      count(lengths(i)) += 1
      i += 1
    }
    count(0) = 0
    // over-subscription check: the Kraft sum must not exceed 1
    var left = 1
    var l = 1
    while (l <= MaxBits) {
      left = (left << 1) - count(l)
      require(left >= 0, "bad deflate: oversubscribed Huffman code")
      l += 1
    }
    // symbol table: offsets per length, then symbols in canonical order
    private val offs = new Array[Int](MaxBits + 1)
    l = 1
    while (l < MaxBits) { offs(l + 1) = offs(l) + count(l); l += 1 }
    val symbols = new Array[Int](lengths.count(_ > 0))
    i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) { symbols(offs(lengths(i))) = i; offs(lengths(i)) += 1 }
      i += 1
    }
  }

  /** Raw DEFLATE stream (RFC 1951) -> decompressed bytes.
    * `sizeHint` pre-sizes the output buffer (e.g. the PNG raw size). */
  def raw(data: Array[Byte], off: Int = 0, sizeHint: Int = 1 << 12): Array[Byte] =
    rawWithEnd(data, off, sizeHint)._1

  /** [[raw]] plus the byte offset just past the deflate stream (whole
    * bytes only — trailing bits of the final byte are padding per the
    * spec), so a wrapper can locate its checksum/trailer exactly. */
  private def rawWithEnd(data: Array[Byte], off: Int,
      sizeHint: Int): (Array[Byte], Int) = {
    var pos = off
    var bitBuf = 0
    var bitCnt = 0
    def bits(n: Int): Int = {
      while (bitCnt < n) {
        require(pos < data.length, "bad deflate: truncated stream")
        bitBuf |= (data(pos) & 0xff) << bitCnt
        pos += 1; bitCnt += 8
      }
      val v = bitBuf & ((1 << n) - 1)
      bitBuf >>>= n; bitCnt -= n
      v
    }
    // Huffman codes pack MSB-first while the stream is LSB-first, so the
    // canonical walk appends one stream bit per level as the code's LSB
    def decode(h: Huffman): Int = {
      var code = 0; var first = 0; var index = 0; var len = 1
      while (len <= MaxBits) {
        code |= bits(1)
        val cnt = h.count(len)
        if (code - first < cnt) return h.symbols(index + code - first)
        index += cnt
        first = (first + cnt) << 1
        code <<= 1
        len += 1
      }
      throw new IllegalArgumentException("bad deflate: invalid Huffman code")
    }
    var out = new Array[Byte](math.max(sizeHint, 64))
    var outLen = 0
    def ensure(n: Int): Unit =
      if (outLen + n > out.length) {
        var cap = out.length * 2
        while (cap < outLen + n) cap *= 2
        out = java.util.Arrays.copyOf(out, cap)
      }
    def inflateBlock(lit: Huffman, dist: Huffman): Unit = {
      var sym = decode(lit)
      while (sym != 256) {
        if (sym < 256) {
          ensure(1); out(outLen) = sym.toByte; outLen += 1
        } else {
          require(sym <= 285, s"bad deflate: length symbol $sym")
          val li = sym - 257
          val len = LenBase(li) + bits(LenExtra(li))
          val ds = decode(dist)
          require(ds <= 29, s"bad deflate: distance symbol $ds")
          val d = DistBase(ds) + bits(DistExtra(ds))
          require(d <= outLen, "bad deflate: distance beyond output start")
          ensure(len)
          var j = 0
          while (j < len) { // byte-wise: overlapping copies are the spec
            out(outLen) = out(outLen - d); outLen += 1; j += 1
          }
        }
        sym = decode(lit)
      }
    }
    var done = false
    while (!done) {
      done = bits(1) == 1
      bits(2) match {
        case 0 => // stored: byte-align, LEN + one's-complement check
          bitBuf = 0; bitCnt = 0
          require(pos + 4 <= data.length, "bad deflate: truncated stored header")
          val len = (data(pos) & 0xff) | ((data(pos + 1) & 0xff) << 8)
          val nlen = (data(pos + 2) & 0xff) | ((data(pos + 3) & 0xff) << 8)
          require((len ^ 0xffff) == nlen, "bad deflate: stored LEN/NLEN mismatch")
          pos += 4
          require(pos + len <= data.length, "bad deflate: truncated stored block")
          ensure(len)
          System.arraycopy(data, pos, out, outLen, len)
          pos += len; outLen += len
        case 1 => // fixed Huffman (§3.2.6)
          val litLens = new Array[Int](288)
          var s = 0
          while (s < 288) {
            litLens(s) = if (s < 144) 8 else if (s < 256) 9
              else if (s < 280) 7 else 8
            s += 1
          }
          inflateBlock(new Huffman(litLens), new Huffman(Array.fill(30)(5)))
        case 2 => // dynamic Huffman (§3.2.7)
          val hlit = bits(5) + 257
          val hdist = bits(5) + 1
          val hclen = bits(4) + 4
          require(hlit <= 286 && hdist <= 30, "bad deflate: HLIT/HDIST range")
          val clLens = new Array[Int](19)
          var k = 0
          while (k < hclen) { clLens(ClOrder(k)) = bits(3); k += 1 }
          val clCode = new Huffman(clLens)
          val lens = new Array[Int](hlit + hdist)
          var n = 0
          while (n < lens.length) {
            val sym = decode(clCode)
            if (sym < 16) { lens(n) = sym; n += 1 }
            else if (sym == 16) {
              require(n > 0, "bad deflate: repeat with no previous length")
              val rep = 3 + bits(2)
              require(n + rep <= lens.length, "bad deflate: repeat overflow")
              var j = 0
              while (j < rep) { lens(n) = lens(n - 1); n += 1; j += 1 }
            } else {
              val rep = (if (sym == 17) 3 + bits(3) else 11 + bits(7))
              require(n + rep <= lens.length, "bad deflate: zero-run overflow")
              n += rep // lens already zero
            }
          }
          require(lens(256) > 0, "bad deflate: no end-of-block code")
          inflateBlock(new Huffman(lens.take(hlit)),
            new Huffman(lens.drop(hlit)))
        case 3 => throw new IllegalArgumentException("bad deflate: BTYPE 11")
      }
    }
    (java.util.Arrays.copyOf(out, outLen), pos - bitCnt / 8)
  }

  /** gzip stream (RFC 1952): parse each member's header (magic,
    * deflate method, FLG-gated optional fields — FEXTRA/FNAME/FCOMMENT/
    * FHCRC), inflate the body with the hand-rolled [[raw]] decoder,
    * verify the trailing CRC-32 and ISIZE (mod 2^32), and concatenate
    * members (RFC 1952 §2.2 — a compliant gunzip of a multi-member
    * stream is the concatenation). This is the transfer encoding a
    * crawler actually receives for text bodies. */
  def gunzip(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 3))
    var off = 0
    require(data.length >= 18, "bad gzip: truncated")
    while (off < data.length) {
      require(off + 10 <= data.length, "bad gzip: truncated member header")
      require((data(off) & 0xff) == 0x1f && (data(off + 1) & 0xff) == 0x8b,
        "bad gzip: magic")
      require((data(off + 2) & 0xff) == 8, "bad gzip: not deflate")
      val flg = data(off + 3) & 0xff
      require((flg & 0xe0) == 0, "bad gzip: reserved FLG bits set")
      var p = off + 10 // past MTIME(4) XFL OS
      // every optional-field walk is bounds-checked so a truncated or
      // malformed header raises the same loud error as every other
      // malformed-input path, never ArrayIndexOutOfBoundsException
      def checkLen(need: Int): Unit = require(need <= data.length,
        "bad gzip: truncated member header")
      if ((flg & 0x04) != 0) { // FEXTRA: 2-byte little-endian length
        checkLen(p + 2)
        val xlen = (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8)
        p += 2 + xlen
        checkLen(p)
      }
      if ((flg & 0x08) != 0) { // FNAME: zero-terminated
        while (p < data.length && data(p) != 0) p += 1
        checkLen(p + 1); p += 1
      }
      if ((flg & 0x10) != 0) { // FCOMMENT: zero-terminated
        while (p < data.length && data(p) != 0) p += 1
        checkLen(p + 1); p += 1
      }
      if ((flg & 0x02) != 0) { p += 2; checkLen(p) } // FHCRC (CRC16)
      val (body, end) = rawWithEnd(data, p, sizeHint = 1 << 12)
      require(end + 8 <= data.length, "bad gzip: truncated member trailer")
      def le32(o: Int): Long =
        (data(o) & 0xffL) | ((data(o + 1) & 0xffL) << 8) |
          ((data(o + 2) & 0xffL) << 16) | ((data(o + 3) & 0xffL) << 24)
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      require(crc.getValue == le32(end), "bad gzip: CRC-32 mismatch")
      require((body.length & 0xffffffffL) == le32(end + 4),
        "bad gzip: ISIZE mismatch")
      out.write(body)
      off = end + 8
    }
    out.toByteArray
  }

  /** Static entry point for the
    * [[org.apache.spark.sql.graft.GzipPayload]] expression: text
    * encoded by the JDK's independent GZIPOutputStream — the foreign
    * wire bytes our [[gunzip]] must read back. */
  def gzipOf(text: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(256)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(text.getBytes)
    gz.close()
    bos.toByteArray
  }

  /** Static entry point for the
    * [[org.apache.spark.sql.graft.GunzipText]] expression: hand-rolled
    * gzip member walk + inflate + CRC/ISIZE verify, back to a string. */
  def gunzipText(payload: Array[Byte]): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromBytes(gunzip(payload))

  /** zlib stream (RFC 1950): validate the CMF/FLG header (deflate
    * method, in-spec window, header checksum, no preset dictionary),
    * inflate the body, and verify the trailing Adler-32 — computed
    * by the spec formula here, refereed against the JDK's Adler32 in
    * InflateSpec. */
  def zlib(data: Array[Byte], sizeHint: Int = 1 << 12): Array[Byte] = {
    require(data.length >= 6, "bad zlib: truncated")
    val cmf = data(0) & 0xff
    val flg = data(1) & 0xff
    require((cmf & 0x0f) == 8, s"bad zlib: compression method ${cmf & 0x0f}")
    require((cmf >> 4) <= 7, s"bad zlib: window size ${cmf >> 4}")
    require((cmf * 256 + flg) % 31 == 0, "bad zlib: header checksum")
    require((flg & 0x20) == 0, "bad zlib: preset dictionary unsupported")
    val (out, end) = rawWithEnd(data, off = 2, sizeHint = sizeHint)
    require(end + 4 == data.length,
      s"bad zlib: ${data.length - end} trailing bytes, want exactly 4 (Adler-32)")
    // Adler-32 (RFC 1950 §8.2): s1/s2 mod 65521 over the OUTPUT bytes
    var s1 = 1L; var s2 = 0L
    var i = 0
    while (i < out.length) {
      s1 += out(i) & 0xff
      s2 += s1
      // defer the expensive mod: 5552 is the largest n with no overflow
      if (i % 5552 == 5551) { s1 %= 65521; s2 %= 65521 }
      i += 1
    }
    s1 %= 65521; s2 %= 65521
    val adler = (s2 << 16) | s1
    val stored = ((data(end) & 0xffL) << 24) | ((data(end + 1) & 0xffL) << 16) |
      ((data(end + 2) & 0xffL) << 8) | (data(end + 3) & 0xffL)
    require(adler == stored,
      f"bad zlib: Adler-32 mismatch (got $adler%08x, stored $stored%08x)")
    out
  }
}
