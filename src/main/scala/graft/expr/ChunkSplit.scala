package graft.expr

import scala.collection.mutable.ArrayBuffer

/** Recursive character text splitting with the semantics of the splitter the
  * reference configures at src/dependencies/ChunkProcessor.py:196-231
  * (chunk_size=2048, chunk_overlap=400, separator hierarchy
  * ["\n\n", "\n", " ", ""], separators kept at the start of the following
  * split, chunks whitespace-stripped):
  *
  *  1. pick the first separator present in the text (last one, "", always
  *     matches);
  *  2. split, keeping each separator glued to the front of the fragment it
  *     precedes;
  *  3. fragments shorter than `chunkSize` are greedily merged up to
  *     `chunkSize`; when a merge closes, a suffix of at most `overlap`
  *     characters is retained as the start of the next chunk;
  *  4. fragments >= `chunkSize` recurse with the remaining separators.
  */
object RecursiveSplitter {
  val DefaultSeparators: List[String] = List("\n\n", "\n", " ", "")

  def split(text: String, chunkSize: Int, overlap: Int,
      separators: List[String] = DefaultSeparators): Vector[String] =
    splitRec(text, chunkSize, overlap, separators).toVector

  private def splitRec(text: String, chunkSize: Int, overlap: Int,
      separators: List[String]): ArrayBuffer[String] = {
    val out = ArrayBuffer.empty[String]
    // first separator occurring in text; "" is the always-matching fallback
    var sep = separators.lastOption.getOrElse("")
    var rest: List[String] = Nil
    var scan = separators
    var found = false
    while (scan.nonEmpty && !found) {
      val s = scan.head
      if (s.isEmpty || text.contains(s)) { sep = s; rest = scan.tail; found = true }
      scan = scan.tail
    }

    val splits = splitKeepSeparator(text, sep)
    val good = ArrayBuffer.empty[String]
    splits.foreach { piece =>
      if (piece.length < chunkSize) good += piece
      else {
        if (good.nonEmpty) { out ++= mergeSplits(good, chunkSize, overlap); good.clear() }
        if (rest.isEmpty) out += piece
        else out ++= splitRec(piece, chunkSize, overlap, rest)
      }
    }
    if (good.nonEmpty) out ++= mergeSplits(good, chunkSize, overlap)
    out
  }

  /** Split on `sep`, attaching each separator to the following fragment
    * ("keep separator at start"); empty fragments dropped. */
  private[expr] def splitKeepSeparator(text: String, sep: String): ArrayBuffer[String] = {
    val out = ArrayBuffer.empty[String]
    if (sep.isEmpty) {
      // character-level fallback
      text.foreach(c => out += c.toString)
      return out
    }
    var start = 0      // start of current fragment (includes leading sep)
    var from = 0       // search position
    var first = true
    while (from <= text.length) {
      val idx = text.indexOf(sep, from)
      if (idx < 0) {
        val frag = text.substring(start)
        if (frag.nonEmpty) out += frag
        from = text.length + 1
      } else {
        if (first) {
          val frag = text.substring(start, idx)
          if (frag.nonEmpty) out += frag
          first = false
        } else {
          out += text.substring(start, idx)
        }
        start = idx
        from = idx + sep.length
      }
    }
    if (first) {
      // no separator found at all — out currently holds nothing from loop
      out.clear()
      if (text.nonEmpty) out += text
    }
    out
  }

  /** Greedy merge with sliding overlap; separators are already embedded in
    * the fragments (keep-separator mode), so the join separator is "". */
  private def mergeSplits(splits: ArrayBuffer[String], chunkSize: Int,
      overlap: Int): ArrayBuffer[String] = {
    val docs = ArrayBuffer.empty[String]
    var current = scala.collection.mutable.Queue.empty[String]
    var total = 0
    splits.foreach { d =>
      val len = d.length
      if (total + len > chunkSize && current.nonEmpty) {
        val doc = current.mkString("").trim
        if (doc.nonEmpty) docs += doc
        // slide window: retain at most `overlap` chars of context
        while (total > overlap || (total + len > chunkSize && total > 0)) {
          total -= current.head.length
          current.dequeue()
        }
      }
      current.enqueue(d)
      total += len
    }
    val doc = current.mkString("").trim
    if (doc.nonEmpty) docs += doc
    docs
  }
}
