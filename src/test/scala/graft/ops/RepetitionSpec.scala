package graft.ops

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def profile(content: String) =
    Seq(content).toDF("c")
      .select(TextAnalysis.repetitionProfile($"c"): _*).head()

  test("repetition profile counts duplicate lines and duplicate chars") {
    // lines: "aa bb"(5) x2, "cc dd ee"(8), "ff"(2) -> dup chars 5 of 20
    val r = profile("aa bb\ncc dd ee\naa bb\nff")
    assert(r.getLong(0) == 4L) // n_lines
    assert(r.getLong(1) == 3L) // n_distinct_lines
    assert(math.abs(r.getDouble(2) - 5.0 / 20.0) < 1e-15)
  }

  test("no repetition -> zero dup fraction, all lines distinct") {
    val r = profile("one two\nthree four")
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.0)
  }

  test("top bigram is the most frequent occurrence run") {
    // bigrams: "x y" x3, "y x" x2, "y z" x1
    val r = profile("x y x y x y z")
    assert(r.getString(3) == "x y")
    assert(r.getLong(4) == 3L)
  }

  test("top bigram ties resolve to the lexicographically smallest") {
    // "a b" and "b c" both occur once -> smallest wins
    val r = profile("a b c")
    assert(r.getString(3) == "a b")
    assert(r.getLong(4) == 1L)
  }

  test("single-word document degenerates like wordShingles (identity gram)") {
    val r = profile("hello")
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 0.0)
    assert(r.getString(3) == "hello" && r.getLong(4) == 1L)
  }

  test("unigram log-frequency proxy: closed-form counts") {
    // counts: a=4, b=2, c=1 -> floor(log2) = 2, 1, 0
    val docs = Seq((1L, "a a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogFreq(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((5L, 9L, 1.8)))  // 4*2 + 1
    assert(got(2L) == ((2L, 1L, 0.5)))  // 1 + 0
  }

  test("bigram log-prob proxy: closed-form conditional counts") {
    // bigrams: "a b"=2, "b a"=1, "a c"=1; prefixes: a.=3, b.=1
    // doc1 "a b a c": (a b): fl2(2)-fl2(3) = 1-1 = 0; (b a): 0-0 = 0;
    //                 (a c): 0-1 = -1 -> sum -1 over 3
    // doc2 "a b":     (a b): 0 -> sum 0 over 1
    // doc3 "x":       no bigrams -> zeros via the left join
    val docs = Seq((1L, "a b a c"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((3L, -1L, -1.0 / 3.0)))
    assert(got(2L) == ((1L, 0L, 0.0)))
    assert(got(3L) == ((0L, 0L, 0.0)))
  }

  test("pmi collocations: bound pair outranks frequent independent pair") {
    // "qq zz" always co-occurs (8x, only as a pair); "aa bb" occurs 8x
    // but aa and bb also pair with everything else. N = 10 bigrams/doc
    // x 8 docs = 80.
    val docs = Seq.tabulate(8)(i =>
      (i.toLong, "qq zz aa bb aa cc bb aa bb dd aa")).toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, "text",
      topK = 5, minCount = 5L)
      .orderBy($"rk").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(5)))
    assert(got.nonEmpty)
    // "qq zz": c12=8, left(qq.)=8, right(.zz)=8, N=80
    //   pmi = fl2(80*8) - fl2(8*8) = 10 - 7 = 3 (bits of lift)
    val qz = got.find(_._2 == "qq zz").get
    assert(qz._3 == 8L && qz._4 == 3L, qz.toString)
    // the bound pair ranks first; every other surviving pair has less lift
    assert(got.head._2 == "qq zz", got.map(_._2).toSeq.toString)
    assert(got.tail.forall(_._4 <= qz._4))
    // ranks are contiguous from 1
    assert(got.map(_._1).toSeq == (1 to got.length))
  }

  test("importance weights: closed-form target/raw log ratios") {
    // raw: a=3, b=1, c=1; target (t): a=1, c=1
    // s(a) = fl2(1+1)-fl2(3+1) = 1-2 = -1; s(b) = fl2(1)-fl2(2) = -1;
    // s(c) = fl2(2)-fl2(2) = 0
    val docs = Seq((1L, "a a b", false), (2L, "a c", true))
      .toDF("doc_id", "text", "t")
    val got = TextAnalysis.importanceWeights(docs, "doc_id", "text", $"t")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((3L, -3L, -1.0)))
    assert(got(2L) == ((2L, -1L, -0.5)))
  }

  test("importance weights: target-skewed words rank target-like docs higher") {
    // "zz" appears only in target docs; "qq" only outside -> a doc full
    // of zz must out-score a doc full of qq
    val docs = Seq((1L, "zz zz zz zz", true), (2L, "qq qq qq qq", false),
      (3L, "zz zz qq qq", false)).toDF("doc_id", "text", "t")
    val avg = TextAnalysis.importanceWeights(docs, "doc_id", "text", $"t")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(avg(1L) > avg(3L) && avg(3L) > avg(2L), avg.toString)
  }

  test("repetition profile matches a direct reference on randomized inputs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docs = Seq.tabulate(100) { i =>
      val lines = Seq.fill(1 + rnd.nextInt(6))(
        Seq.fill(1 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      (i.toLong, lines.mkString("\n"))
    }
    val got = docs.toDF("id", "c")
      .select(($"id" +: TextAnalysis.repetitionProfile($"c")): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4),
          r.getLong(5))).toMap
    docs.foreach { case (id, c) =>
      val lines = c.split("\n", -1).toSeq
      val total = lines.map(_.length).sum
      val dup = lines.groupBy(identity).values
        .map(g => (g.size - 1) * g.head.length).sum
      val words = c.replaceAll("\\s+", " ").split(" ").toSeq
      val bigrams =
        if (words.size < 2) Seq(words.mkString(" "))
        else words.sliding(2).map(_.mkString(" ")).toSeq
      val best = bigrams.groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (k, n) => (-n, k) }.head
      val (gnl, gnd, gfr, gtb, gtc) = got(id)
      assert(gnl == lines.size && gnd == lines.distinct.size)
      assert(math.abs(gfr - dup.toDouble / math.max(total, 1)) < 1e-12)
      assert(gtb == best._1 && gtc == best._2.toLong,
        s"id=$id got=($gtb,$gtc) want=$best")
    }
  }

  test("line repetition across newline boundaries still normalizes for bigrams") {
    // normalized content folds '\n' into spaces, so the bigram spanning the
    // boundary ("bb cc") exists
    val r = Seq("aa bb\ncc dd").toDF("c")
      .select(TextAnalysis.wordBigrams($"c").as("bg"))
      .selectExpr("array_contains(bg, 'bb cc') AS x").head()
    assert(r.getBoolean(0))
  }
}
