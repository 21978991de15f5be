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
  def lcsLen(a: String, b: String): Int = {
    val m = a.length; val n = b.length
    if (m == 0 || n == 0) return 0
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      val ac = a.charAt(i - 1)
      var j = 1
      while (j <= n) {
        cur(j) =
          if (ac == b.charAt(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n)
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
    var best = 0.0
    var i = 0
    val lastStart = l.length - s.length
    while (i <= lastStart && best < 100.0) {
      val r = ratioStr(s, l.substring(i, i + s.length))
      if (r > best) best = r
      i += 1
    }
    best
  }
}
