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

  test("emPrune refuses a sparse vocabulary (quartile constant would " +
      "silently shift)") {
    val w = UnigramTok.words(docs, "text")
    val vocab = UnigramTok.pieceVocab(w)
    val usage = UnigramTok.pieceUsage(UnigramTok.segmentsWithPieces(w, vocab))
    intercept[IllegalArgumentException](
      UnigramTok.emPrune(vocab, usage).collect())
  }

  // ---- in-memory EM reference, shared by the one-round and loop tests.
  // Corpus: three high-frequency structured words plus a one-off tail
  // of every two-char combo over a..h — enough distinct multi-char
  // candidates to fill the 48-piece vocabulary, with a rare tail whose
  // whole-word pieces get pruned (forcing re-segmentation to singles).
  private def emCorpus = {
    val freq = Seq.fill(20)("abab cdcd efef").mkString(" ")
    val tailW = (for (c1 <- 'a' to 'h'; c2 <- 'a' to 'h')
      yield s"$c1$c2").mkString(" ")
    Seq((0L, freq), (1L, tailW)).toDF("doc_id", "text")
  }
  private val wordCounts: Map[String, Long] =
    (Seq.fill(20)(Seq("abab", "cdcd", "efef")).flatten ++
      (for (c1 <- 'a' to 'h'; c2 <- 'a' to 'h') yield s"$c1$c2"))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  private def blen(x: Long): Long =
    64L - java.lang.Long.numberOfLeadingZeros(x)
  private def candidates(wc: Map[String, Long]): Map[String, Long] = {
    val m = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    wc.foreach { case (w0, c) =>
      for (st <- 0 until w0.length;
           pl <- 1 to math.min(UnigramTok.MaxPiece, w0.length - st))
        m(w0.substring(st, st + pl)) += c
    }
    m.toMap
  }
  private def selectVocab(cand: Map[String, Long]): Map[String, Long] = {
    val singles = cand.filter(_._1.length == 1)
    val multi = cand.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(UnigramTok.MultiPieces)
    singles ++ multi
  }
  private def score(sel: Map[String, Long]): Map[String, Long] = {
    val ntot = sel.values.sum
    sel.map { case (p, c) => p -> (blen(c) - blen(ntot)) }
  }
  // Viterbi with the engine's total-order tiebreak:
  // (score desc, pieces asc, piece-list lexicographically LARGEST)
  private def viterbi(w0: String,
      sc: Map[String, Long]): (Long, Int, List[String]) = {
    val ord = new Ordering[(Long, Int, List[String])] {
      def compare(a: (Long, Int, List[String]),
          b: (Long, Int, List[String])): Int = {
        val c1 = java.lang.Long.compare(a._1, b._1)
        if (c1 != 0) return c1
        val c2 = Integer.compare(b._2, a._2) // fewer pieces wins
        if (c2 != 0) return c2
        a._3.zip(b._3).foreach { case (x, y) =>
          val c = x.compareTo(y); if (c != 0) return c }
        0
      }
    }
    val dp = Array.fill[Option[(Long, Int, List[String])]](w0.length + 1)(None)
    dp(0) = Some((0L, 0, Nil))
    for (i <- 1 to w0.length;
         j <- math.max(0, i - UnigramTok.MaxPiece) until i;
         prev <- dp(j); s <- sc.get(w0.substring(j, i))) {
      val cand = (prev._1 + s, prev._2 + 1, prev._3 :+ w0.substring(j, i))
      if (dp(i).forall(ord.compare(cand, _) > 0)) dp(i) = Some(cand)
    }
    dp(w0.length).get
  }
  /** One in-memory M-step: usage counts under `sc`, drop the `dropN`
    * least-used multi-char pieces by (usage, piece), re-score kept
    * pieces from usage. Returns (kept usage map, new scores). */
  private def refPrune(sc: Map[String, Long],
      dropN: Int): (Map[String, Long], Map[String, Long]) = {
    val usageRef = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    wordCounts.foreach { case (w0, c) =>
      viterbi(w0, sc)._3.foreach(p => usageRef(p) += c) }
    val dropSet = sc.keys.filter(_.length > 1).toSeq
      .sortBy(p => (usageRef(p), p)).take(dropN).toSet
    val keptUse: Map[String, Long] = sc.keys.toSeq
      .filter(p => p.length == 1 || !dropSet(p))
      .map(p => p -> usageRef(p)).toMap
    val ntot = keptUse.values.map(math.max(_, 1L)).sum
    (keptUse, keptUse.map { case (p, u) =>
      p -> (blen(math.max(u, 1L)) - blen(ntot)) })
  }

  test("one EM pruning round matches an in-memory reference and changes " +
      "at least one segmentation") {
    val d = emCorpus
    val cand = candidates(wordCounts)
    val sel0 = selectVocab(cand)
    val sc0 = score(sel0)
    val segs0 = wordCounts.map { case (w0, c) => w0 -> viterbi(w0, sc0) }
    val usageRef = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    segs0.foreach { case (w0, (_, _, ps)) =>
      ps.foreach(p => usageRef(p) += wordCounts(w0)) }
    val multiByUse = sel0.keys.filter(_.length > 1).toSeq
      .sortBy(p => (usageRef(p), p))
    val dropSet = multiByUse.take(UnigramTok.MultiPieces / 4).toSet
    val keptUse: Map[String, Long] = sel0.keys.toSeq
      .filter(p => p.length == 1 || !dropSet(p))
      .map(p => p -> usageRef(p)).toMap
    val ntot2 = keptUse.values.map(math.max(_, 1L)).sum
    val sc2 = keptUse.map { case (p, u) =>
      p -> (blen(math.max(u, 1L)) - blen(ntot2)) }
    val segs2 = wordCounts.map { case (w0, _) => w0 -> viterbi(w0, sc2) }

    // ---- distributed EM round ----
    val w = UnigramTok.words(d, "text")
    val vocab = UnigramTok.pieceVocab(w)
    val usage = UnigramTok.pieceUsage(UnigramTok.segmentsWithPieces(w, vocab))
    val pruned = UnigramTok.emPrune(vocab, usage)
    val got = pruned.select(col("p"), col("uc"), col("sc"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(got.keySet == keptUse.keySet,
      s"pruned piece set diverged: extra=${got.keySet -- keptUse.keySet} " +
        s"missing=${keptUse.keySet -- got.keySet}")
    got.foreach { case (p, (uc, s)) =>
      assert(uc == keptUse(p), s"usage of '$p': got $uc want ${keptUse(p)}")
      assert(s == sc2(p), s"score of '$p': got $s want ${sc2(p)}")
    }
    val resegs = UnigramTok.segments(w, pruned)
      .select(col("w"), col("n_pieces"), col("total_score"))
      .as[(String, Int, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    resegs.foreach { case (w0, (np, ts)) =>
      assert((ts, np) == ((segs2(w0)._1, segs2(w0)._2)),
        s"re-segmentation of '$w0': got ($np, $ts) want ${segs2(w0)}")
    }
    // the round must genuinely change the tokenizer: at least one word
    // re-segments differently after pruning
    val before = segs0.map { case (w0, (ts, np, _)) => w0 -> ((np, ts)) }
    val after = resegs.map { case (w0, (np, ts)) => w0 -> ((np, ts)) }
    assert(before != after,
      "pruning must change at least one segmentation on this corpus")
  }

  test("the EM LOOP matches the in-memory trainer round for round and " +
      ">= 2 distinct rounds change at least one segmentation") {
    val dropPerRound = 6
    val target = UnigramTok.MultiPieces - 3 * dropPerRound // 48 -> 30
    // ---- in-memory loop: score sequence sc0 -> sc1 -> sc2 -> sc3 ----
    var scs = List(score(selectVocab(candidates(wordCounts))))
    var useN: Map[String, Long] = Map.empty
    (1 to 3).foreach { _ =>
      val (use, sc) = refPrune(scs.head, dropPerRound)
      useN = use
      scs = sc :: scs
    }
    val refSegsByRound = scs.reverse.map { sc =>
      wordCounts.keys.map(w0 => w0 -> viterbi(w0, sc)).toMap }
    // the loop must not be a fixed point after round one: at least two
    // of the three rounds change some word's segmentation
    val changedRounds = refSegsByRound.sliding(2).count {
      case Seq(a, b) => a.exists { case (w0, v) => b(w0) != v } }
    assert(changedRounds >= 2,
      s"only $changedRounds round(s) changed a segmentation — the loop " +
        "corpus must exercise a genuine iteration")
    // ---- distributed loop ----
    val (vocabN, rounds) = UnigramTok.emLoop(
      UnigramTok.words(emCorpus, "text"), targetMulti = target,
      dropPerRound = dropPerRound)
    assert(rounds == 3)
    val got = vocabN.select(col("p"), col("uc"), col("sc"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(got.keySet == useN.keySet,
      s"final vocab diverged: extra=${got.keySet -- useN.keySet} " +
        s"missing=${useN.keySet -- got.keySet}")
    val scN = scs.head
    got.foreach { case (p, (uc, s)) =>
      assert(uc == useN(p), s"usage of '$p': got $uc want ${useN(p)}")
      assert(s == scN(p), s"score of '$p': got $s want ${scN(p)}")
    }
    // uneven schedules are refused up front (the twin unrolls fixed
    // rounds, so a silent remainder round would desynchronize engines)
    intercept[IllegalArgumentException](UnigramTok.emLoop(
      UnigramTok.words(emCorpus, "text"), targetMulti = 31,
      dropPerRound = 6))
  }
}
