package graft.ops

import scala.collection.mutable
import scala.util.matching.Regex

import org.apache.spark.unsafe.types.UTF8String

import graft.expr.FuzzImpl

/** Pure scalar implementations behind the pipeline's custom expressions.
  * Each mirrors a reference behavior (file:line cited per function); all are
  * deterministic, allocation-conscious, and callable from generated code.
  */
object TextImpl {

  // --- F5: company-name normalization (src/crawler/Processor.py:30-64) ---
  // Strip parentheticals, split on space/underscore, merge domain-like token
  // with its successor ("net/com/org/co" -> "net.xyz"), then drop the last
  // word (or last two if the penultimate is "&").
  private val domainTokens = Set("net", "com", "org", "co")

  def normalizeCompanyName(s: UTF8String): UTF8String =
    UTF8String.fromString(normalizeCompanyNameStr(s.toString))

  def normalizeCompanyNameStr(name: String): String = {
    val clean = name.replaceAll("\\(.*?\\)", "")
    val words = mutable.ArrayBuffer.from(clean.trim.split("[\\s_]+").filter(_.nonEmpty))
    var i = 0
    var merged = false
    while (i < words.length - 1 && !merged) {
      if (domainTokens.contains(words(i).toLowerCase)) {
        words(i) = words(i) + "." + words(i + 1)
        words.remove(i + 1)
        merged = true
      }
      i += 1
    }
    if (words.length > 1) {
      if (words(words.length - 2) == "&") { words.remove(words.length - 1); words.remove(words.length - 1) }
      else words.remove(words.length - 1)
    }
    words.mkString(" ")
  }

  // --- F7: HTML -> text (src/crawler/Processor.py:111-121) ---
  // The reference joins every text node with "\n" (lxml recover mode). This
  // hand-rolled scanner drops tags/comments/script/style bodies, decodes the
  // common entities, and emits one line per text node.
  def htmlToText(s: UTF8String): UTF8String =
    UTF8String.fromString(htmlToTextStr(s.toString))

  def htmlToTextStr(html: String): String = {
    val out = new StringBuilder
    val n = html.length
    var i = 0
    var skipTag: String = null // inside <script>/<style> body when non-null
    val text = new StringBuilder
    def flush(): Unit = {
      val t = text.toString.trim
      if (t.nonEmpty) {
        if (out.nonEmpty) out.append('\n')
        out.append(t)
      }
      text.clear()
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i)
          i = if (end < 0) n else end + 3
        } else {
          val end = html.indexOf('>', i)
          val tag = if (end < 0) html.substring(i + 1) else html.substring(i + 1, end)
          val tagName = tag.takeWhile(ch => ch.isLetterOrDigit || ch == '/').toLowerCase
          if (skipTag == null) {
            flush()
            if (tagName == "script" || tagName == "style") skipTag = tagName
          } else if (tagName == "/" + skipTag) {
            skipTag = null
          }
          i = if (end < 0) n else end + 1
        }
      } else {
        if (skipTag == null) {
          if (c == '&') {
            val semi = html.indexOf(';', i)
            if (semi > i && semi - i <= 8) {
              val ent = html.substring(i + 1, semi)
              val dec = ent match {
                case "amp" => "&"
                case "lt" => "<"
                case "gt" => ">"
                case "quot" => "\""
                case "apos" => "'"
                case "nbsp" => " "
                case e if e.startsWith("#x") || e.startsWith("#X") =>
                  try String.valueOf(Integer.parseInt(e.drop(2), 16).toChar)
                  catch { case _: Exception => "&" + ent + ";" }
                case e if e.startsWith("#") =>
                  try String.valueOf(Integer.parseInt(e.drop(1)).toChar)
                  catch { case _: Exception => "&" + ent + ";" }
                case _ => null
              }
              if (dec != null) { text.append(dec); i = semi + 1 }
              else { text.append(c); i += 1 }
            } else { text.append(c); i += 1 }
          } else { text.append(c); i += 1 }
        } else i += 1
      }
    }
    flush()
    out.toString
  }

  // --- U3: line-level dedup preserving order and blank lines
  // (src/dependencies/ChunkProcessor.py:240-255) ---
  def dedupLines(s: UTF8String): UTF8String =
    UTF8String.fromString(dedupLinesStr(s.toString))

  def dedupLinesStr(text: String): String = {
    val seen = mutable.HashSet.empty[String]
    val out = new StringBuilder
    var first = true
    text.split("\n", -1).foreach { line =>
      val t = line.trim
      val keep = if (t.nonEmpty) seen.add(t) else true
      if (keep) {
        if (!first) out.append('\n')
        out.append(if (t.nonEmpty) line else "")
        first = false
      }
    }
    out.toString
  }

  // --- X4 (test-grade NER): capitalized multi-word sequences + corporate
  // suffix gazetteer (SURVEY §2.8), replacing spaCy ORG entities. ---
  private val orgSuffixes = Set("Inc", "Corp", "Co", "LLC", "Ltd", "LP",
    "Company", "Corporation", "Incorporated", "Holdings", "Group",
    "Technologies", "Systems", "Partners")
  private val orgToken: Regex = "[A-Z][A-Za-z0-9&.-]*".r

  def extractOrgs(text: String): Seq[String] = {
    val words = text.split("[^A-Za-z0-9&.-]+").filter(_.nonEmpty)
    val out = mutable.ArrayBuffer.empty[String]
    var run = mutable.ArrayBuffer.empty[String]
    def close(): Unit = {
      if (run.nonEmpty) {
        val last = run.last.stripSuffix(".").stripSuffix(",")
        // a run counts as an ORG if it ends with a corporate suffix, or is a
        // multi-word capitalized sequence
        if (orgSuffixes.contains(last) && run.length >= 2)
          out += run.mkString(" ")
        run = mutable.ArrayBuffer.empty[String]
      }
    }
    words.foreach { w =>
      if (orgToken.pattern.matcher(w).matches()) run += w
      else close()
    }
    close()
    out.toSeq
  }

  // --- SimHash: 64-bit near-dup fingerprint over whitespace tokens
  // (classic Charikar construction; FNV-1a 64 as the token hash so the
  // value is stable across JVMs/clusters). ---
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  def simhash64(s: UTF8String): Long = {
    val acc = new Array[Int](64)
    s.toString.split("\\s+").foreach { tok =>
      if (tok.nonEmpty) {
        val h = fnv1a64(tok)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  // --- F17: mojibake + quote normalization (tools/patchabbrev.py:25-56,
  // 87-107). Two faithful steps: (1) cp1252 control chars remapped to the
  // intended Unicode smart punctuation + NBSP -> space; (2) every quote
  // variant -- the explicit extra-quote set, or category Pi/Pf with
  // QUOTE/QUOTATION/GUILLEMET in the character name -- folded to ASCII,
  // singles to ' and everything else to ". ---
  private val cp1252Map: Map[Char, Char] = Map(
    '\u0091' -> '\u2018', '\u0092' -> '\u2019',
    '\u0093' -> '\u201C', '\u0094' -> '\u201D',
    '\u0096' -> '\u2013', '\u0097' -> '\u2014',
    '\u0085' -> '\u2026')
  private val extraQuotes = Set('\u00AB', '\u00BB', '\u2039', '\u203A',
    '\u201A', '\u201B', '\u201C', '\u201D', '\u201E', '\u201F',
    '\u275B', '\u275C', '\u275D', '\u275E')
  private val singleFold = Set('\u2039', '\u203A', '\u201A', '\u201B')

  def fixMojibakeStr(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      sb.append(if (c == '\u00A0') ' ' else cp1252Map.getOrElse(c, c))
      i += 1
    }
    sb.toString
  }

  def normalizeQuotes(s: UTF8String): UTF8String =
    UTF8String.fromString(normalizeQuotesStr(fixMojibakeStr(s.toString)))

  def normalizeQuotesStr(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      val t = Character.getType(c)
      val name = Option(Character.getName(c.toInt)).getOrElse("")
      val isQuote = extraQuotes.contains(c) ||
        ((t == Character.INITIAL_QUOTE_PUNCTUATION ||
          t == Character.FINAL_QUOTE_PUNCTUATION) &&
          (name.contains("QUOTE") || name.contains("QUOTATION") ||
            name.contains("GUILLEMET")))
      if (!isQuote) sb.append(c)
      else if (name.contains("SINGLE") || singleFold.contains(c)) sb.append('\'')
      else sb.append('"')
      i += 1
    }
    sb.toString
  }

  // --- MinHash: per-row signature in one pass over the string — no
  // shingle explode/shuffle. Shingle hash = FNV-1a 64 over the k-char
  // window; permutation j = murmur-style finalizer of (h ^ seed_j). ---
  private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  def minhashSig(s: UTF8String, k: Int, numHashes: Int): Array[Long] = {
    val text = s.toString
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = text.length
    if (n < k) return sig
    var i = 0
    while (i <= n - k) {
      var h = 0xcbf29ce484222325L
      var j = i
      while (j < i + k) { h ^= text.charAt(j); h *= 0x100000001b3L; j += 1 }
      // one full mix of the base hash, then a multiply-shift permutation
      // family (odd multiplier + offset per permutation): 1 mul + 1 add
      // per permutation instead of a full mix — same minima quality
      val hm = mix64(h)
      var p = 0
      while (p < numHashes) {
        val v = hm * (((p.toLong << 1) + 1) * 0x9e3779b97f4a7c15L) +
          p * 0xbf58476d1ce4e5b9L
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** Distinct word n-gram shingle hashes in ONE pass over the normalized
    * (single-spaced) string: FNV-1a over each n-word window's exact char
    * range — no per-shingle string allocation, no array_distinct. Matches
    * the string-shingle identity of `Dedup.wordShingles` (the window char
    * range IS the concat_ws(" ") string) with hash-merge risk ~2^-64.
    * Fewer than n words -> the whole text as the single shingle (the
    * slice-beyond-length behavior of the column variant). */
  def wordShingleHashes(s: UTF8String, n: Int): Array[Long] = {
    val text = s.toString
    val len = text.length
    val starts = new mutable.ArrayBuffer[Int]()
    val ends = new mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < len) {
      // word = maximal non-space run, so the function stays total (no
      // crash) even on not-strictly-normalized input with space runs
      if (text.charAt(i) != ' ' && (i == 0 || text.charAt(i - 1) == ' '))
        starts += i
      if (text.charAt(i) != ' ' && (i == len - 1 || text.charAt(i + 1) == ' '))
        ends += i + 1
      i += 1
    }
    val wc = starts.length
    def fnvRange(from: Int, to: Int): Long = {
      var h = 0xcbf29ce484222325L
      var j = from
      while (j < to) { h ^= text.charAt(j); h *= 0x100000001b3L; j += 1 }
      h
    }
    val set = new java.util.HashSet[Long]()
    if (wc == 0) set.add(fnvRange(0, len)) // empty/space-only text
    else {
      val nWindows = math.max(wc - n + 1, 1)
      var w = 0
      while (w < nWindows) {
        set.add(fnvRange(starts(w), ends(math.min(w + n - 1, wc - 1))))
        w += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    out
  }

  /** Exact k-shingle Jaccard of two strings (hashed shingle sets). */
  def shingleJaccard(a: UTF8String, b: UTF8String, k: Int): Double = {
    def hashes(s: String): java.util.HashSet[Long] = {
      val set = new java.util.HashSet[Long]()
      var i = 0
      while (i <= s.length - k) {
        var h = 0xcbf29ce484222325L
        var j = i
        while (j < i + k) { h ^= s.charAt(j); h *= 0x100000001b3L; j += 1 }
        set.add(h)
        i += 1
      }
      set
    }
    val sa = hashes(a.toString)
    val sb = hashes(b.toString)
    if (sa.isEmpty && sb.isEmpty) return 1.0
    var common = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) common += 1
    common.toDouble / (sa.size + sb.size - common).toDouble
  }

  // --- T8 stub: deterministic pseudo-embedding (SURVEY §7.5: hermetic,
  // seeded hash -> unit vector) used when no external embedder is wired. ---
  def pseudoEmbedding(text: String, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    val n = text.length
    var i = 0
    while (i < n - 2) {
      // 3-gram rolling feature hash
      var h = 17
      h = h * 31 + text.charAt(i)
      h = h * 31 + text.charAt(i + 1)
      h = h * 31 + text.charAt(i + 2)
      val idx = ((h % dim) + dim) % dim
      v(idx) += (if (((h >> 16) & 1) == 0) 1.0f else -1.0f)
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += v(j).toDouble * v(j); j += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      j = 0
      while (j < dim) { v(j) *= inv; j += 1 }
    }
    v
  }
}
