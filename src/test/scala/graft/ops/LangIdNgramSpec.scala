package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-8 curation operators: Cavnar-Trenkle language ID, rule-grade ORG
  * NER, semantic decontamination, cluster-balanced sampling. */
class LangIdNgramSpec extends SparkSpec {
  import spark.implicits._

  test("langid profiles: K entries each, ranks 1..K, distinct top trigrams") {
    val byLang = LangIdNgram.ProfileRows.groupBy(_._1)
    assert(byLang.keySet == Set("de", "en", "es", "fr", "it", "nl", "pt"))
    byLang.values.foreach { rows =>
      assert(rows.size == LangIdNgram.ProfileSize)
      assert(rows.map(_._3).sorted == (1 to LangIdNgram.ProfileSize))
    }
    // the languages must disagree on their most frequent trigram
    // profile overall (identical profiles could never discriminate)
    assert(byLang.values.map(_.sortBy(_._3).map(_._2)).toSet.size == 7)
  }

  test("each training text classifies as its own language " +
      "(self-consistency)") {
    val docs = LangIdNgram.TrainText.zipWithIndex.map {
      case ((lang, txt), i) => (i.toLong, lang, txt)
    }.toDF("id", "lang", "text")
    val got = LangIdNgram.classify(docs.select($"id", $"text"))
      .join(docs.select($"id", $"lang"), Seq("id"))
      .select($"lang", $"pred_lang").as[(String, String)].collect()
    got.foreach { case (want, pred) =>
      assert(pred == want, s"training text for $want classified as $pred")
    }
  }

  test("ta_langid_ngram classifies every injected held-out sentence " +
      "correctly") {
    val out = graft.SparkEntry.queries("ta_langid_ngram")(
      spark, sf("sf0.001"))
    val inj = out.filter($"expected_lang".isNotNull)
      .select($"doc_id", $"pred_lang", $"expected_lang", $"correct")
      .collect()
    assert(inj.length == LangIdNgram.TestSentences.size)
    inj.foreach { r =>
      assert(r.getAs[Boolean]("correct"),
        s"doc ${r.getLong(0)} predicted ${r.getString(1)} " +
          s"expected ${r.getString(2)}")
    }
    // corpus rows must all carry verdicts too (no silent drops)
    val total = out.count()
    assert(total >= 500, s"expected corpus + injected rows, got $total")
  }

  test("classifyKernel == relational classify row for row (both corpora)") {
    val docs = graft.util.Tables.t(spark, sf("sf0.001"), "documents")
      .select($"doc_id".as("id"), $"text")
    val rel = LangIdNgram.classify(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val ker = docs.withColumn("cls", LangIdNgram.classifyCol($"text"))
      .filter($"cls".isNotNull)
      .select($"id", $"cls.pred_lang", $"cls.best_dist").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(ker == rel)
    // whitespace / short-text edges the corpus can't exercise
    assert(LangIdNgram.classifyKernel("") == (null, -1L))
    assert(LangIdNgram.classifyKernel("ab")._1 != null) // " ab " has trigrams
  }

  test("kernel == relational on randomized texts incl. whitespace and " +
      "accented chars (fuzz)") {
    val rnd = new scala.util.Random(7)
    // includes supplementary-plane chars (emoji, a Deseret letter) so a
    // UTF-16-unit slide in the kernel would diverge from the relational
    // plan's code-point indexing; drawn as whole code points so
    // surrogate pairs never split
    val alphabet = ("abcdefghij klmnopqrs tuvwxyz \t\n  .!?ñéüß汉字😀🌍𐐷"
      : Seq[Char]).mkString.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    val texts = Seq.tabulate(80) { i =>
      (i.toLong, Seq.fill(rnd.nextInt(150))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }.toDF("id", "text")
    val rel = LangIdNgram.classify(texts).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val ker = texts.withColumn("cls", LangIdNgram.classifyCol($"text"))
      .filter($"cls".isNotNull)
      .select($"id", $"cls.pred_lang", $"cls.best_dist").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(ker == rel, {
      val diff = (ker.keySet ++ rel.keySet)
        .filter(k => ker.get(k) != rel.get(k)).take(3)
      s"diverged on ids $diff: kernel=${diff.map(ker.get)} " +
        s"relational=${diff.map(rel.get)}"
    })
  }

  test("orgMentions: capitalized runs with corporate suffix, in order") {
    val got = Seq(
      "deal with Acme Widget Corp and Orange Tree Inc today",
      "lowercase acme corp never fires nor does Inc alone",
      "nested run The Quick Fox Inc closes greedily")
      .toDF("text")
      .select(array_join(TextAnalysis.orgMentions($"text"), "|").as("o"))
      .as[String].collect()
    assert(got(0) == "Acme Widget Corp|Orange Tree Inc")
    assert(got(1) == "")
    assert(got(2) == "The Quick Fox Inc")
  }

  test("semanticContamination flags exactly the benchmark near-dups") {
    val dup = Array.fill(8)(0.5f)
    val ortho = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    val anti = Array.tabulate(8)(i => if (i == 1) -1.0f else 0.0f)
    val corpus = Seq((10L, dup), (11L, ortho), (12L, anti))
      .toDF("tid", "te")
    val bench = Seq((1L, Array.fill(8)(0.25f))).toDF("bid", "be")
    val got = Similarity.semanticContamination(corpus, bench, minCos = 0.9)
      .orderBy($"tid")
      .select($"tid", $"contaminated").as[(Long, Boolean)].collect()
    assert(got.toSeq == Seq((10L, true), (11L, false), (12L, false)))
  }

  test("sample_cluster_balanced: every cell capped, ranks contiguous, " +
      "deterministic") {
    val q = graft.SparkEntry.queries("sample_cluster_balanced")
    val a = q(spark, sf("sf0.001")).collect()
    val b = q(spark, sf("sf0.001")).collect()
    assert(a.toSeq == b.toSeq) // seeded: bit-identical across runs
    val byCell = a.groupBy(_.getAs[Int]("cell"))
    byCell.foreach { case (cell, rows) =>
      assert(rows.length <= 20, s"cell $cell over cap: ${rows.length}")
      assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq ==
        (1 to rows.length), s"cell $cell ranks not contiguous")
    }
  }
}
