package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit coverage for [[WordPiece]]: greedy longest-match semantics
  * against a hand-segmented vocabulary, the flavored-vocabulary floor
  * (every word stays segmentable), and agreement with an in-memory
  * greedy reference over the fixture corpus. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory greedy reference: longest piece of the position's flavor. */
  private def greedyRef(w: String, vocab: Set[(String, Int)]): Int = {
    var pos = 0; var np = 0
    while (pos < w.length) {
      val fl = if (pos == 0) 1 else 0
      val maxPl = math.min(WordPiece.MaxPiece, w.length - pos)
      val pl = (maxPl to 1 by -1)
        .find(l => vocab.contains((w.substring(pos, pos + l), fl)))
        .getOrElse(sys.error(s"unsegmentable $w at $pos"))
      pos += pl; np += 1
    }
    np
  }

  test("greedy longest-match picks the longest flavored piece each step") {
    // vocab: initial 'unha', continuation 'pp', 'y', singles for the rest
    val words = Seq(("unhappy", 3L), ("u", 1L)).toDF("w", "c")
    val vocab = Seq(("unha", 1, 9L), ("pp", 0, 5L), ("u", 1, 4L),
      ("n", 0, 1L), ("h", 0, 1L), ("a", 0, 1L), ("p", 0, 2L),
      ("y", 0, 2L)).toDF("p", "st", "cnt")
    val segs = WordPiece.segments(words, vocab).collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    // unhappy -> unha | pp | y = 3 pieces (greedy takes 4-char max first)
    assert(segs("unhappy") == 3)
    assert(segs("u") == 1)
  }

  test("vocabulary floor: every (char, flavor) occurrence is kept, so " +
      "segmentation never fails and piece counts match the reference") {
    val docs = Seq("the quick brown fox", "the the lazy dog dogs",
      "quickly boxing unboxing").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val w = UnigramTok.words(docs, "text")
    val vocab = WordPiece.vocab(w)
    val vset = vocab.collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val segs = WordPiece.segments(w, vocab).collect()
    val wc = w.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(segs.length == wc.size, "every word must segment")
    segs.foreach { r =>
      val word = r.getString(0)
      assert(r.getInt(2) == greedyRef(word, vset),
        s"piece count mismatch for '$word'")
    }
    // flavor floor: first chars as initials, interior chars as
    // continuations
    assert(vset.contains(("t", 1)) && vset.contains(("h", 0)))
  }

  test("flavors are distinct: a string can be a kept initial piece " +
      "while its continuation twin competes separately") {
    val docs = Seq((0L, "abab bab")).toDF("doc_id", "text")
    val vocab = WordPiece.vocab(UnigramTok.words(docs, "text"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
      .toMap
    // 'ab' word-initially: only in 'abab' (cnt 1); as continuation:
    // 'abab' at pos 3 and 'bab' at pos 2 (cnt 2) — counted per flavor
    assert(vocab(("ab", 1)) == 1L)
    assert(vocab(("ab", 0)) == 2L)
  }
}
