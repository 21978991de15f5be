package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram-LM tokenizer: negative log-prob piece scores, hand-computed
  * Viterbi optima, the MaxWordLen domain cap, and single-char coverage. */
class UnigramTokSpec extends SparkSpec {
  import spark.implicits._

  // "ababab" twice, "cd" once. Hand-derived vocabulary (MaxPiece = 4):
  // singles a:6 b:6 c:1 d:1; multis ab:6 ba:4 aba:4 bab:4 abab:4 baba:2
  // cd:1 -> Ntot = 39, blen(39) = 6. Scores: cnt 6 -> -3, 4 -> -3,
  // 2 -> -4, 1 -> -5.
  private def docs = Seq((0L, "ababab ababab cd")).toDF("doc_id", "text")

  test("piece scores are the negative floor-log2 log-prob surrogate") {
    val v = UnigramTok.pieceVocab(UnigramTok.words(docs, "text"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(v("a") == (6L, -3L) && v("ab") == (6L, -3L))
    assert(v("abab") == (4L, -3L) && v("baba") == (2L, -4L))
    assert(v("cd") == (1L, -5L) && v("d") == (1L, -5L))
    // every single char of the corpus is present (segmentability)
    assert(Set("a", "b", "c", "d").subsetOf(v.keySet))
  }

  test("viterbi picks the max-score, min-piece segmentation") {
    val w = UnigramTok.words(docs, "text")
    val segs = UnigramTok.segments(w, UnigramTok.pieceVocab(w))
      .select(col("w"), col("n_pieces"), col("total_score"))
      .as[(String, Int, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    // ababab: two 2-piece splits tie at -6 (abab+ab / ab+abab) — the DP
    // value pair is what we pin; 3x ab = -9 and singles = -18 lose
    assert(segs("ababab") == (2, -6L))
    // cd: the whole-word piece (-5) beats c+d (-10)
    assert(segs("cd") == (1, -5L))
  }

  test("words past MaxWordLen drop from segments and token counts") {
    val d2 = Seq((0L, ("a" * (UnigramTok.MaxWordLen + 4)) + " cd cd"))
      .toDF("doc_id", "text")
    val w = UnigramTok.words(d2, "text")
    val segs = UnigramTok.segments(w, UnigramTok.pieceVocab(w))
    assert(segs.filter(length(col("w")) > UnigramTok.MaxWordLen).count() == 0)
    val tc = UnigramTok.tokenCounts(d2, "doc_id", "text", segs)
      .as[(Long, Long, Long)].head()
    assert(tc == ((0L, 2L, 2L)))  // only the two "cd" words count
  }

  test("token counts = sum of per-word piece counts") {
    val w = UnigramTok.words(docs, "text")
    val segs = UnigramTok.segments(w, UnigramTok.pieceVocab(w))
    val tc = UnigramTok.tokenCounts(docs, "doc_id", "text", segs)
      .as[(Long, Long, Long)].head()
    assert(tc == ((0L, 3L, 5L)))  // 2 + 2 pieces for ababab x2, 1 for cd
  }
}
