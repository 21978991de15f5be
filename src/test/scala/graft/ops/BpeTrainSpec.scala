package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE training loop vs an in-memory reference trainer: the distributed
  * pair-delta / argmax / replace rounds must reproduce classical BPE
  * (Sennrich 2016) merge-for-merge — on corpora whose words contain SQL
  * metacharacters (quotes, backslashes, percent, brackets: the de-splice
  * guarantee), and at depth 64 with the checkpoint cadence engaged (the
  * production-vocab shape: plan depth stays O(checkpointEvery)). */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Reference trainer: straight-line classical BPE over a word-count
    * map. Same normalization as BpeTrain.vocab (lower/trim/\s+ split),
    * same tie-break (count desc, left asc, right asc), same
    * left-to-right non-overlapping merge pass as BpeImpl.tokens. */
  private def refTrain(texts: Seq[String], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    val words = texts
      .flatMap(_.toLowerCase.trim.split("\\s+"))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var vocab: Seq[(Array[String], Long)] = words.toSeq.map { case (w, c) =>
      w.toCharArray.map(String.valueOf) -> c
    }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length - 1) {
          counts((toks(i), toks(i + 1))) += c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), m) =>
          (-m, x, y)
        }
        out += ((r, a, b, n))
        vocab = vocab.map { case (toks, c) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
              merged += a + b; i += 2
            } else { merged += toks(i); i += 1 }
          }
          merged.toArray -> c
        }
        r += 1
      }
    }
    out.result()
  }

  private def sparkTrain(texts: Seq[String], rounds: Int,
      checkpointEvery: Int = 8): Seq[(Int, String, String, Long)] =
    BpeTrain.train(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      "text", rounds, checkpointEvery)
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("metacharacter corpora train identically to the reference: " +
      "quotes, backslashes, percent, regex chars never reach a parser") {
    val corpora = Seq(
      Seq("don't don't don't can't can't won't", "o'clock o'clock don't"),
      Seq("a\\b a\\b a\\b c\\d'e", "100% 100% 50%% a_b a_b [x] [x] [x]"),
      Seq("it''s ''quoted'' \"double\" \"double\" back\\\\slash",
        "semi;colon semi;colon da$h da$h da$h -- --"))
    corpora.zipWithIndex.foreach { case (texts, i) =>
      val want = refTrain(texts, rounds = 12)
      val got = sparkTrain(texts, rounds = 12)
      assert(got == want, s"corpus $i: $got != $want")
      assert(want.nonEmpty, s"corpus $i learned nothing")
    }
  }

  test("seeded random corpora over a hostile alphabet match the " +
      "reference merge-for-merge") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "ab'\\\"%_né"  // includes quote, backslash, é
    (1 to 3).foreach { trial =>
      val nWords = 12
      val words = Seq.fill(nWords)(
        (0 until (2 + rnd.nextInt(5)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      // Zipf-ish repetition so merges have real support
      val texts = Seq(words.zipWithIndex
        .flatMap { case (w, i) => Seq.fill(1 + (nWords - i) / 2)(w) }
        .mkString(" "))
      val want = refTrain(texts, rounds = 10)
      val got = sparkTrain(texts, rounds = 10)
      assert(got == want, s"trial $trial: $got != $want")
    }
  }

  test("depth 64 on the sf0.001 corpus: checkpoint cadence holds and " +
      "merges match the reference trainer exactly") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.util.Tables.t(spark, dir, "documents")
    val texts = docs.select($"text").as[String].collect().toSeq
    val want = refTrain(texts, rounds = 64)
    val got = BpeTrain.train(docs, "text", rounds = 64, checkpointEvery = 8)
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(want.size == 64, s"corpus dried up at ${want.size} merges")
    assert(got == want,
      s"first divergence at ${got.zip(want).indexWhere(p => p._1 != p._2)}")
  }

  test("kernel application of learned merges == join-based " +
      "tokenizedVocab, metacharacters included") {
    val texts = Seq("don't don't can't o'clock a\\b a\\b 100% 100% [x]",
      "don't can't \"quoted\" \"quoted\" it''s a\\b")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = BpeTrain.train(docs, "text", rounds = 10)
      .map(r => (r.getString(1), r.getString(2)))
    assert(merges.nonEmpty)
    val tok = BpeTrain.tokenizedVocab(docs, "text",
      BpeTrain.train(docs, "text", rounds = 10))
    val joinSide = docs.select($"doc_id", explode(split(
        regexp_replace(lower(trim($"text")), "\\s+", " "), " ")).as("w"))
      .filter($"w" =!= "").join(tok, Seq("w"))
      .groupBy($"doc_id").agg(sum($"nt").cast("long").as("nt"))
      .as[(Long, Long)].collect().toMap
    val kernelSide = docs.select($"doc_id",
        TextAnalysis.bpeTokenCountLearned($"text", merges))
      .as[(Long, Long)].collect().toMap
    assert(joinSide == kernelSide, s"$joinSide != $kernelSide")
  }

  test("resumed training == one uninterrupted run, metacharacters and " +
      "checkpoint cadence included") {
    val texts = Seq("don't don't can't o'clock a\\b a\\b 100% 100% [x]",
      "don't can't \"quoted\" \"quoted\" it''s a\\b low low lower lower")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val full = BpeTrain.train(docs, "text", rounds = 12,
      checkpointEvery = 4)
    val prefix = BpeTrain.train(docs, "text", rounds = 5,
      checkpointEvery = 4)
    val resumed = BpeTrain.train(docs, "text", rounds = 12,
      checkpointEvery = 4, initial = prefix)
    def tup(rs: Seq[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(tup(resumed) == tup(full))
    assert(tup(resumed).take(5) == tup(prefix))
  }

  test("early stop: a corpus that dries up returns fewer rounds and " +
      "tokenizedVocab folds only the learned merges") {
    val texts = Seq("ab ab ab")  // one word: merges (a,b) then done
    val got = sparkTrain(texts, rounds = 8)
    assert(got == Seq((1, "a", "b", 3L)), got)
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val merges = BpeTrain.train(docs, "text", rounds = 8)
    val tok = BpeTrain.tokenizedVocab(docs, "text", merges).collect()
    assert(tok.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("ab", 1)), tok.toSeq)
  }
}
