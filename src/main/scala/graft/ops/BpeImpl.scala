package graft.ops

import org.apache.spark.unsafe.types.UTF8String

/** Greedy merges-table BPE tokenization (the real thing, not the regex
  * proxy `TextAnalysis.tokenCountBpe` retains for the earlier gates): a
  * word starts as its characters and every rule of the committed fixture
  * (`/graft/bpe_merges.txt`, rank order) merges its adjacent (left,
  * right) occurrences in one left-to-right non-overlapping pass.
  *
  * Because the fixture is WELL-FORMED (every multi-character side is
  * produced by an earlier rule — BpeSpec proves it), a single pass per
  * rule in rank order is exactly classical lowest-rank-first BPE: when
  * rule r runs, its sides can only have been formed by rules < r, and the
  * token it forms only participates in rules > r. The same semantics are
  * replayed relationally by the DuckDB twin as a chain of `replace` calls
  * over a double-space token encoding (one delimiter space consumed from
  * each side per match, so consecutive occurrences merge in the same
  * left-to-right order — see HashOracleSql/DataPipelineQueries).
  *
  * Scale shape: a pure per-row kernel (no shuffle, codegen-called static
  * method); per-word results are memoized in a bounded cache because
  * natural-language word frequency is Zipfian — the hot vocabulary
  * amortizes to a hash lookup while the long tail still computes.
  */
object BpeImpl {

  /** (left, right) merge rules in rank order, from the committed fixture. */
  val merges: IndexedSeq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "graft/bpe_merges.txt missing from classpath")
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val parts = l.split(" ")
          require(parts.length == 2, s"malformed merge rule: '$l'")
          (parts(0), parts(1))
        }
        .toIndexedSeq
    } finally in.close()
  }

  /** Tokenize one word: chars, then each rule's single left-to-right
    * non-overlapping merge pass in rank order. */
  def tokens(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    var toks: Array[String] = Array.tabulate(word.length)(i =>
      String.valueOf(word.charAt(i)))
    merges.foreach { case (a, b) =>
      if (toks.length >= 2) {
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += a + b
            i += 2
          } else {
            out += toks(i)
            i += 1
          }
        }
        if (out.length < toks.length) toks = out.toArray
      }
    }
    toks
  }

  /** Tokenize one word under an ARBITRARY flattened merges table
    * [a0,b0,a1,b1,...] in rank order — the learned-tokenizer complement
    * of [[tokens]]. A table learned by classical BPE (BpeTrain) is
    * well-formed by construction (each merge's sides are tokens at its
    * own learning step), so the same single-pass-per-rule argument
    * applies verbatim. */
  def tokensWith(word: String, merges: Array[String]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var toks: Array[String] = Array.tabulate(word.length)(i =>
      String.valueOf(word.charAt(i)))
    var m = 0
    while (m + 1 < merges.length) {
      val a = merges(m)
      val b = merges(m + 1)
      if (toks.length >= 2) {
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += a + b
            i += 2
          } else {
            out += toks(i)
            i += 1
          }
        }
        if (out.length < toks.length) toks = out.toArray
      }
      m += 2
    }
    toks
  }

  // One bounded word->count memo per merges-table INSTANCE (identity
  // key: the table ships as a single codegen reference object per query,
  // so executors see one array instance per trained tokenizer). Same
  // Zipf argument as the fixture cache below.
  private val learnedCaches = new java.util.concurrent.ConcurrentHashMap[
    Array[String], java.util.concurrent.ConcurrentHashMap[String, Integer]]()
  private val MaxLearnedTables = 64

  /** Total token count of a text under a learned merges table: lower/
    * trim, split on whitespace runs, sum of per-word token counts —
    * the kernel path of the trained tokenizer (static entry point for
    * both interpreted eval and codegen). */
  def learnedTokenCount(text: UTF8String, merges: Array[String]): Long = {
    val cache =
      if (learnedCaches.size() < MaxLearnedTables ||
          learnedCaches.containsKey(merges))
        learnedCaches.computeIfAbsent(merges,
          _ => new java.util.concurrent.ConcurrentHashMap[String, Integer]())
      else null
    val words = text.toLowerCase.toString.trim.split("\\s+")
    var sum = 0L
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        val hit = if (cache == null) null else cache.get(w)
        if (hit != null) sum += hit.intValue()
        else {
          val n = tokensWith(w, merges).length
          if (cache != null && cache.size() < MaxCacheEntries)
            cache.put(w, Integer.valueOf(n))
          sum += n
        }
      }
      i += 1
    }
    sum
  }

  // Zipf makes the hot vocabulary tiny; bound the memo so an adversarial
  // unique-word corpus cannot grow executor memory without limit
  private val MaxCacheEntries = 1 << 16
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def tokenCountOf(word: String): Int = {
    val hit = cache.get(word)
    if (hit != null) return hit.intValue()
    val n = tokens(word).length
    if (cache.size() < MaxCacheEntries) cache.put(word, Integer.valueOf(n))
    n
  }

  /** Total BPE token count of a text: lower/trim, split on whitespace
    * runs, sum of per-word token counts (empty words contribute nothing).
    * Static entry point for both interpreted eval and codegen. */
  def tokenCount(text: UTF8String): Long = {
    val words = text.toLowerCase.toString.trim.split("\\s+")
    var sum = 0L
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) sum += tokenCountOf(words(i))
      i += 1
    }
    sum
  }
}
