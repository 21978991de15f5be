package graft.expr

import java.text.Normalizer

import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFKC normalization followed by an ASCII fold that drops all
  * non-ASCII code points — the reference's
  * `unicodedata.normalize("NFKC", s).encode("ascii", "ignore")`
  * (src/crawler/Processor.py:147-148). NFKC expands compatibility forms
  * (ligatures, full-width forms) first, so e.g. "ﬁ" survives as "fi" while
  * "é" is dropped.
  */
object NfkcImpl {
  def nfkcAscii(s: UTF8String): UTF8String = {
    val norm = Normalizer.normalize(s.toString, Normalizer.Form.NFKC)
    val sb = new java.lang.StringBuilder(norm.length)
    var i = 0
    while (i < norm.length) {
      val c = norm.charAt(i)
      if (c < 128) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
