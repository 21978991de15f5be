package graft.expr

import org.apache.spark.unsafe.types.UTF8String

/** Scalar implementations for the fuzzy-match expressions.
  *
  * `ratio` is the normalized Indel similarity used by rapidfuzz's
  * `fuzz.ratio` (reference: src/crawler/CrawlerSupport.py:146,
  * src/dependencies/ChunkProcessor.py:62): the Indel (insert/delete-only
  * edit) distance is `|a| + |b| - 2*LCS(a,b)`, and
  * `ratio = 100 * (1 - dist / (|a| + |b|)) = 200 * LCS / (|a| + |b|)`.
  *
  * `partialRatio` follows rapidfuzz `fuzz.partial_ratio`: the best `ratio`
  * of the shorter string against any same-length window of the longer one
  * (exhaustive-window variant; rapidfuzz prunes windows but scores the same
  * maxima on the short entity strings this engine applies it to).
  */
object FuzzImpl {

  /** Bit-parallel LCS kernel (the classic bit-vector LCS of Crochemore,
    * Iliopoulos, Pinzon & Reid 2001): the pattern's positions live in an
    * m-bit vector, and each text character updates it with
    * `V' = (V + (V & M[c])) | (V & ~M[c])` (m-bit arithmetic, carry chained
    * across words); the LCS length is the count of zero bits. O(|t| *
    * ceil(m/64)) instead of the O(|t| * m) DP — ~50x fewer ops on the
    * 200-char rerank queries — and exact, so every ratio is unchanged.
    * Built once per pattern and reused across `partial_ratio` windows. */
  private[expr] final class BitLcs(pattern: String) {
    val m: Int = pattern.length
    private val nWords = (m + 63) >>> 6
    private val topMask =
      if ((m & 63) == 0) -1L else (1L << (m & 63)) - 1
    private val ascii = Array.ofDim[Long](128, nWords)
    private val other = new java.util.HashMap[Character, Array[Long]]()
    private val zeroMask = new Array[Long](nWords)
    locally {
      var i = 0
      while (i < m) {
        val c = pattern.charAt(i)
        val arr =
          if (c < 128) ascii(c)
          else other.computeIfAbsent(c, _ => new Array[Long](nWords))
        arr(i >>> 6) |= 1L << (i & 63)
        i += 1
      }
    }
    private def maskOf(c: Char): Array[Long] =
      if (c < 128) ascii(c)
      else { val a = other.get(c); if (a == null) zeroMask else a }

    /** LCS length of the pattern vs `t[from, until)`. */
    def lcs(t: String, from: Int, until: Int): Int = {
      val v = new Array[Long](nWords)
      java.util.Arrays.fill(v, -1L)
      v(nWords - 1) = topMask
      var j = from
      while (j < until) {
        val d = maskOf(t.charAt(j))
        var carry = 0L
        var k = 0
        while (k < nWords) {
          val vk = v(k)
          val u = vk & d(k)
          val sum0 = vk + u
          var c = java.lang.Long.compareUnsigned(sum0, vk) < 0
          val sum = sum0 + carry
          if (carry == 1L && sum0 == -1L) c = true
          v(k) = sum | (vk & ~d(k))
          carry = if (c) 1L else 0L
          k += 1
        }
        v(nWords - 1) &= topMask
        j += 1
      }
      var ones = 0
      var k = 0
      while (k < nWords) { ones += java.lang.Long.bitCount(v(k)); k += 1 }
      m - ones
    }
  }

  def lcsLen(a: String, b: String): Int = {
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) 0 else new BitLcs(s).lcs(t, 0, t.length)
  }

  def ratio(a: UTF8String, b: UTF8String): Double = ratioStr(a.toString, b.toString)

  def ratioStr(a: String, b: String): Double = {
    val total = a.length + b.length
    if (total == 0) 100.0
    else 200.0 * lcsLen(a, b) / total
  }

  def partialRatio(a: UTF8String, b: UTF8String): Double =
    partialRatioStr(a.toString, b.toString)

  def partialRatioStr(a: String, b: String): Double = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) return 100.0
    if (s.length == l.length) return ratioStr(s, l)
    val kernel = new BitLcs(s) // pattern masks shared across all windows
    val total = 2.0 * s.length
    var best = 0.0
    var i = 0
    val lastStart = l.length - s.length
    while (i <= lastStart && best < 100.0) {
      val r = 200.0 * kernel.lcs(l, i, i + s.length) / total
      if (r > best) best = r
      i += 1
    }
    best
  }
}
