package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Referees the hand-rolled [[Inflate]] codec against the JDK's
  * independent zlib in both directions, across all three DEFLATE block
  * types, plus spec-violation rejection. */
class InflateSpec extends AnyFunSuite {

  private def deflate(data: Array[Byte], level: Int,
      nowrap: Boolean = false): Array[Byte] = {
    val d = new java.util.zip.Deflater(level, nowrap)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def jdkInflate(data: Array[Byte], nowrap: Boolean): Array[Byte] = {
    val inf = new java.util.zip.Inflater(nowrap)
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      assert(n > 0 || inf.finished() || !inf.needsInput, "jdk inflate stalled")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  // deterministic corpora spanning the encoder's block-type choices:
  // incompressible (stored blocks at high levels), tiny (fixed Huffman),
  // repetitive text and long runs (dynamic Huffman + LZ77 matches,
  // including overlapping distance-1 copies)
  private val rnd = new scala.util.Random(41)
  private val corpora: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one byte" -> Array(42.toByte),
    "tiny text" -> "deflate".getBytes,
    "run of zeros" -> new Array[Byte](65536 + 37), // distance-1 overlap copy
    "text-like" -> Iterator.continually(
      "the quick brown fox jumps over the lazy dog 0123456789 ")
      .take(800).mkString.getBytes,
    "random" -> Array.fill(70000)(rnd.nextInt().toByte), // > one stored block
    "patterned" -> Array.tabulate(50000)(i => ((i * i * 7 + i * 13) % 251).toByte))

  test("our inflate decodes JDK Deflater output at every level, " +
      "zlib-wrapped and raw") {
    for ((name, data) <- corpora; level <- Seq(0, 1, 6, 9)) {
      val z = Inflate.zlib(deflate(data, level))
      assert(java.util.Arrays.equals(z, data), s"zlib $name level $level")
      val r = Inflate.raw(deflate(data, level, nowrap = true))
      assert(java.util.Arrays.equals(r, data), s"raw $name level $level")
    }
  }

  test("the fixture corpus genuinely exercises dynamic-Huffman blocks " +
      "(BTYPE 10 in the first block header)") {
    // level 6 is what pngEncodePixels uses; patterned data must not
    // degrade to stored/fixed or the dynamic path would be dead code
    val z = deflate(corpora.find(_._1 == "patterned").get._2, 6)
    val btype = ((z(2) & 0xff) >> 1) & 3 // after the 2-byte zlib header
    assert(btype == 2, s"expected a dynamic-Huffman first block, got $btype")
    // and the PNG fixtures go through it too
    val png = Multimodal.dedupPngPayloadOf(12L)
    val (w, h, rgb) = Multimodal.pngPixels(png)
    assert(w == 44 && h == 26 && rgb.length == w * h * 3)
  }

  test("reverse referee: the JDK inflater and ours agree on hand-built " +
      "stored and fixed-Huffman streams") {
    // stored block, written by hand: BFINAL=1 BTYPE=00, padding, LEN/NLEN
    val payload = "abc".getBytes
    val stored = Array[Byte](0x01, 3, 0, (~3 & 0xff).toByte, 0xff.toByte) ++ payload
    assert(java.util.Arrays.equals(Inflate.raw(stored), payload))
    assert(java.util.Arrays.equals(jdkInflate(stored, true), payload))
    // fixed-Huffman block for "aaaaaa": literal 'a' (0x61 -> canonical
    // code 0x30+0x61=0x91, 8 bits MSB-first), then an overlapping
    // length=5/distance=1 copy (length symbol 259 -> 7-bit code 3,
    // distance symbol 0 -> 5-bit code 0), end-of-block (7-bit code 0).
    // Bit-exactness vs the JDK proves the fixed tables, not just ours.
    val fixedStream = {
      val sb = new StringBuilder("1" + "10") // BFINAL, BTYPE=01 LSB-first
      def m(v: Int, n: Int): Unit = // Huffman codes pack MSB-first
        (n - 1 to 0 by -1).foreach(b => sb.append((v >> b) & 1))
      m(0x91, 8)  // literal 'a'
      m(3, 7)     // length symbol 259 -> base length 5, no extra bits
      m(0, 5)     // distance symbol 0 -> distance 1
      m(0, 7)     // end of block (symbol 256)
      val s = sb.toString
      val padded = s + "0" * ((8 - s.length % 8) % 8)
      padded.grouped(8).map { byte => // LSB-first packing into each byte
        byte.zipWithIndex.foldLeft(0) { case (acc, (c, i)) =>
          acc | ((c - '0') << i)
        }.toByte
      }.toArray
    }
    val want = "aaaaaa".getBytes
    assert(java.util.Arrays.equals(Inflate.raw(fixedStream), want),
      "our decoder on the hand-built fixed-Huffman stream")
    assert(java.util.Arrays.equals(jdkInflate(fixedStream, true), want),
      "JDK decoder on the same bytes — both codecs read the same spec")
  }

  test("gunzip reads JDK GZIPOutputStream members, concatenates " +
      "multi-member streams, and rejects corruption") {
    def jdkGzip(data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(data); gz.close()
      bos.toByteArray
    }
    for ((name, data) <- corpora if data.nonEmpty) {
      assert(java.util.Arrays.equals(Inflate.gunzip(jdkGzip(data)), data),
        s"gunzip $name")
    }
    // FNAME-bearing header (a named member, like real wget output)
    val named = {
      val bos = new java.io.ByteArrayOutputStream()
      val payload = "named member payload".getBytes
      val body = jdkGzip(payload)
      // splice FNAME: set FLG bit 3 and insert a NUL-terminated name
      bos.write(body, 0, 3); bos.write(body(3) | 0x08)
      bos.write(body, 4, 6); bos.write("file.txt".getBytes); bos.write(0)
      bos.write(body, 10, body.length - 10)
      (bos.toByteArray, payload)
    }
    assert(java.util.Arrays.equals(Inflate.gunzip(named._1), named._2))
    // multi-member concatenation (RFC 1952 §2.2)
    val a = "first member ".getBytes
    val b = "second member".getBytes
    assert(java.util.Arrays.equals(
      Inflate.gunzip(jdkGzip(a) ++ jdkGzip(b)), a ++ b))
    // the JDK's own GZIPInputStream agrees on the concatenation
    val jin = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(jdkGzip(a) ++ jdkGzip(b)))
    assert(java.util.Arrays.equals(jin.readAllBytes(), a ++ b))
    // corruption: flipped CRC byte, bad magic
    val z = jdkGzip("corrupt me".getBytes)
    val badCrc = z.clone(); badCrc(z.length - 6) = (badCrc(z.length - 6) ^ 1).toByte
    val e = intercept[IllegalArgumentException](Inflate.gunzip(badCrc))
    assert(e.getMessage.contains("CRC"))
    val badMagic = z.clone(); badMagic(0) = 0x1e
    intercept[IllegalArgumentException](Inflate.gunzip(badMagic))
    // truncated/malformed optional header fields raise the same LOUD
    // IllegalArgumentException as every other bad-input path — never
    // ArrayIndexOutOfBoundsException
    def hdr(flg: Int): Array[Byte] =
      Array(0x1f, 0x8b, 8, flg, 0, 0, 0, 0, 0, 0).map(_.toByte)
    // FNAME set but the name never NUL-terminates before end-of-data
    val cutName = hdr(0x08) ++ "unterminated".getBytes
    val e1 = intercept[IllegalArgumentException](Inflate.gunzip(cutName))
    assert(e1.getMessage.contains("bad gzip"))
    // FEXTRA whose xlen points past the end of the stream
    val cutExtra = hdr(0x04) ++ Array[Byte](0xff.toByte, 0xff.toByte) ++
      new Array[Byte](6)
    val e2 = intercept[IllegalArgumentException](Inflate.gunzip(cutExtra))
    assert(e2.getMessage.contains("bad gzip"))
    // FCOMMENT cut mid-scan
    val cutComment = hdr(0x10) ++ "no terminator...".getBytes
    val e3 = intercept[IllegalArgumentException](Inflate.gunzip(cutComment))
    assert(e3.getMessage.contains("bad gzip"))
  }

  test("adler-32 matches the JDK's and corruption is rejected loudly") {
    val data = corpora.find(_._1 == "text-like").get._2
    val z = deflate(data, 9)
    // our wrapper accepted the JDK's Adler; now check our formula equals
    // the JDK's on the raw payload
    val jdk = new java.util.zip.Adler32()
    jdk.update(data)
    val stored = ((z(z.length - 4) & 0xffL) << 24) |
      ((z(z.length - 3) & 0xffL) << 16) |
      ((z(z.length - 2) & 0xffL) << 8) | (z(z.length - 1) & 0xffL)
    assert(stored == jdk.getValue)
    // flip one Adler byte -> loud integrity failure
    val badAdler = z.clone(); badAdler(z.length - 1) = (badAdler(z.length - 1) ^ 1).toByte
    val e1 = intercept[IllegalArgumentException](Inflate.zlib(badAdler))
    assert(e1.getMessage.contains("Adler-32"))
    // corrupt the zlib header checksum
    val badHdr = z.clone(); badHdr(1) = (badHdr(1) ^ 1).toByte
    intercept[IllegalArgumentException](Inflate.zlib(badHdr))
    // BTYPE 11 is a spec violation
    val b11 = Array[Byte](0x07) // BFINAL=1, BTYPE=11
    val e2 = intercept[IllegalArgumentException](Inflate.raw(b11))
    assert(e2.getMessage.contains("BTYPE"))
    // stored-block LEN/NLEN mismatch
    val badStored = Array[Byte](0x01, 3, 0, 0, 0, 'a', 'b', 'c')
    val e3 = intercept[IllegalArgumentException](Inflate.raw(badStored))
    assert(e3.getMessage.contains("LEN/NLEN"))
    // oversubscribed dynamic code: all 19 code-length codes at length 1
    intercept[IllegalArgumentException] {
      // BFINAL=1 BTYPE=10, HLIT=0 HDIST=0 HCLEN=15 (all 19), lengths 1,1,1,...
      val sb = new StringBuilder("1" + "01")
      sb.append("00000")   // HLIT  (LSB-first of 0)
      sb.append("00000")   // HDIST
      sb.append("1111")    // HCLEN = 15 -> 19 entries
      (0 until 19).foreach(_ => sb.append("100")) // 3-bit length 1, LSB-first
      val s = sb.toString
      val padded = s + "0" * ((8 - s.length % 8) % 8)
      Inflate.raw(padded.grouped(8).map { byte =>
        byte.zipWithIndex.foldLeft(0) { case (acc, (c, i)) =>
          acc | ((c - '0') << i)
        }.toByte
      }.toArray)
    }
    // truncated stream
    val e4 = intercept[IllegalArgumentException](Inflate.raw(Array.emptyByteArray))
    assert(e4.getMessage.contains("truncated"))
  }
}
