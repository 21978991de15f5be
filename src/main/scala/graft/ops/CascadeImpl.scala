package graft.ops

import scala.collection.mutable

import graft.expr.FuzzImpl

/** The reference's header-detection filter cascade (SURVEY.md §2.7 T3-T6),
  * reimplemented as pure functions of the chunk string.
  *
  * Sentence segmentation: the reference iterates spaCy sentences
  * (ChunkProcessor.py:35-45) purely as containers for line scanning; a
  * regex sentence splitter is a documented approximation (SURVEY §2.7 T2) —
  * downstream logic is line-based and unaffected.
  */
object CascadeImpl {

  /** Section-title candidates, src/dependencies/config.py:32-62. The final
    * bare "Background" is reserved for the second phase (T7). */
  val StartPhrases: Vector[String] = Vector(
    "Background of the transaction",
    "Background of the merger",
    "Background of the offer",
    "Background of the acquisition",
    "Background of the consolidation",
    "Background of the Asset Sale",
    "Background of the Combination",
    "Background of the Proposal",
    "Background of the Offer and the Merger",
    "Background and negotiation of the merger",
    "Background to the merger",
    "Background to the acquisition",
    "Background to the offer",
    "Background to the transaction",
    "Background to the consolidation",
    "Background to the Asset Sale",
    "Background to the Combination",
    "Background to the Proposal",
    "Background of Offer",
    "Background of Acquisition",
    "Background of Transaction",
    "Background of Merger",
    "Background of Consolidation",
    "Background of Asset Sale",
    "Background of Combination",
    "Background of Proposal",
    "Background of the Proposed Transaction",
    "Background of the Open Market Merger",
    "Background")

  private val phrasesLower: Vector[String] = StartPhrases.init.map(_.toLowerCase)

  /** True when the text contains any full section-title phrase (bare
    * "Background" excluded). Used by the X1 stub classifier so its gate is
    * pinned to the phrase list rather than a single corpus-dependent word. */
  def containsStartPhrase(text: String): Boolean = {
    val lower = text.toLowerCase
    lower.contains(GateTerm) && phrasesLower.exists(lower.contains)
  }

  /** Every match path below requires this substring (lowercased); callers
    * may pre-filter on it as a sound cheap gate (see Pipeline.candidates).
    * If any cascade path ever stops requiring it, update both places. */
  val GateTerm = "background"

  // ChunkProcessor.py:40
  private val headerSkipTerms =
    Seq("schedule to", "amended", "restated", "included", "incorporated by reference")
  // ChunkProcessor.py:104-108
  private val titleParaSkipTerms = Seq("amended", "restated", "schedule to", "as follow")
  // ChunkProcessor.py:163-164
  private val falsePositiveTitleTerms =
    Seq("industry", "identity", "filing", "corporate", "opinion", "overview")

  private val sentenceSplit = "(?<=[.!?])\\s+".r

  /** T3 (ChunkProcessor.py:35-73): literal phrase-in-sentence match, then
    * per-line exact/fuzzy match. Returns the matched phrase (lowercased) or
    * matched line, or null. */
  def locateChunkHeader(chunk: String, backgroundOnly: Boolean): String = {
    val sentences = sentenceSplit.split(chunk)
    var si = 0
    while (si < sentences.length) {
      val sentence = sentences(si).trim
      val sentLower = sentence.toLowerCase
      if (!backgroundOnly && sentLower.contains("background") &&
          !headerSkipTerms.exists(sentLower.contains)) {
        var pi = 0
        while (pi < phrasesLower.length) {
          if (sentLower.contains(phrasesLower(pi))) return phrasesLower(pi)
          pi += 1
        }
      }
      val lines = sentence.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      while (lines.hasNext) {
        val line = lines.next()
        val lineLower = line.toLowerCase
        if (backgroundOnly) {
          if (lineLower == "background") return line
        } else if (lineLower.contains("background")) {
          var pi = 0
          while (pi < phrasesLower.length) {
            val p = phrasesLower(pi)
            if (lineLower.contains(p) || FuzzImpl.ratioStr(lineLower, p) > 85.0)
              return line
            pi += 1
          }
        }
      }
      si += 1
    }
    null
  }

  /** T4 (ChunkProcessor.py:76-114): the phrase must sit in a short
    * (<= 2 line) paragraph of >= 4-char lines — i.e. look like a title. */
  def hasSectionTitle(chunk: String, phrase: String): Boolean = {
    val phraseLower = phrase.toLowerCase
    val paragraphs = mutable.ArrayBuffer.empty[Vector[String]]
    var buffer = mutable.ArrayBuffer.empty[String]
    chunk.split("\n", -1).foreach { raw =>
      val line = raw.trim
      if (line.isEmpty) {
        if (buffer.nonEmpty) { paragraphs += buffer.toVector; buffer = mutable.ArrayBuffer.empty }
      } else if (line.length >= 4) buffer += line
    }
    if (buffer.nonEmpty) paragraphs += buffer.toVector
    paragraphs.exists { para =>
      val joinedLower = para.mkString("\n").toLowerCase
      !titleParaSkipTerms.exists(joinedLower.contains) &&
        joinedLower.contains(phraseLower) && para.length <= 2
    }
  }

  /** T5 (ChunkProcessor.py:117-140): from the phrase line onward, count
    * (text, blank) pairs (TOC-like) vs (text, text) pairs (paragraph-like);
    * TOC iff tocLike >= 3 && paraLike < 3. Returns true when NOT a TOC. */
  def isNotToc(chunk: String, phrase: String): Boolean = {
    val phraseLower = phrase.toLowerCase
    val lines = chunk.split("\n", -1).map(_.trim)
    var start = lines.indexWhere(_.toLowerCase.contains(phraseLower))
    if (start < 0) start = 0
    var tocLike = 0
    var paraLike = 0
    var i = start
    while (i < lines.length - 1) {
      if (lines(i).nonEmpty && lines(i + 1).isEmpty) { tocLike += 1; i += 2 }
      else if (lines(i).nonEmpty && lines(i + 1).nonEmpty) { paraLike += 1; i += 2 }
      else i += 1
    }
    !(tocLike >= 3 && paraLike < 3)
  }

  /** T6 (ChunkProcessor.py:143-169): promote the chunk to a passage starting
    * at the phrase line, rejecting false-positive title terms and passages
    * <= 200 chars. Returns null if no qualifying line. */
  def promotePassage(chunk: String, phrase: String): String = {
    val phraseLower = phrase.toLowerCase
    val lines = chunk.split("\n", -1)
    var i = 0
    while (i < lines.length) {
      val line = lines(i).trim
      val lineLower = line.toLowerCase
      if (line.nonEmpty && lineLower.contains(phraseLower) &&
          !falsePositiveTitleTerms.exists(lineLower.contains)) {
        val passage = lines.slice(i, lines.length).mkString("\n")
        if (passage.length > 200) return passage
      }
      i += 1
    }
    null
  }

  /** Full T3 -> T4 -> T5 -> T6 cascade; null when any stage rejects. */
  def backgroundPassage(chunk: String, backgroundOnly: Boolean): String = {
    val phrase = locateChunkHeader(chunk, backgroundOnly)
    if (phrase == null) return null
    if (!hasSectionTitle(chunk, phrase)) return null
    if (!isNotToc(chunk, phrase)) return null
    promotePassage(chunk, phrase)
  }
}
