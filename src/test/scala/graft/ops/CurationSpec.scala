package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The corpus-stats / stratified-sample query kernels: discrete
  * percentile positioning and the seeded per-stratum cap. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("ta_corpus_stats: discrete median/p95 land on exact sorted positions") {
    val df = graft.SparkEntry.queries("ta_corpus_stats")(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val med = r.getAs[Int]("median_tokens")
      val p95 = r.getAs[Int]("p95_tokens")
      val mean = r.getAs[Double]("mean_tokens")
      assert(med <= p95, s"median $med > p95 $p95")
      assert(mean == r.getAs[Long]("sum_tokens").toDouble / n)
    }
  }

  test("filterFunnel: rule order decides first_fail; all-pass is 'none'") {
    val good = (("the and of is a to in " * 10) + "alpha beta gamma " * 8).trim
    val docs = Seq(
      1L -> "tiny",                                  // fails min_chars first
      2L -> ("x " * 110).trim,                       // long enough, fails stopword? no: fails top_word? x repeats
      3L -> good,                                    // passes everything
      4L -> (("the and of is a to in " * 6) + ("zz " * 70)).trim // stop ok, top_word fails on zz
    ).toDF("doc_id", "text")
    val got = docs
      .select(($"doc_id" +: TextAnalysis.filterFunnel($"text")): _*)
      .select("doc_id", "first_fail").as[(Long, String)].collect().toMap
    assert(got(1L) == "min_chars", got)
    // doc 2: 220 chars, 110 words, zero stopwords -> stopword fires
    // BEFORE top_word even though both fail (funnel order)
    assert(got(2L) == "stopword_ratio", got)
    assert(got(3L) == "none", got)
    assert(got(4L) == "top_word_frac", got)
  }

  test("keepAboveQuantile: exact discrete threshold; boundary ties kept") {
    // distinct scores 1..100, p=70: threshold lands exactly on 70 and the
    // kept set is precisely {70..100}
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val kept = Sampling.keepAboveQuantile(df, $"s", p = 70)
      .select("id").as[Long].collect().toSet
    assert(kept == (70 to 100).map(_.toLong).toSet, s"got ${kept.size} rows")
    // two-value distribution straddling the percentile: cum(1.0)=50 < 70,
    // so the threshold is 2.0 and ALL fifty 2.0-ties are kept
    val ties = (1 to 100).map(i => (i.toLong, if (i <= 50) 1.0 else 2.0))
      .toDF("id", "s")
    assert(Sampling.keepAboveQuantile(ties, $"s", p = 70).count() == 50)
    // degenerate single-value corpus: everything ties the threshold
    val flat = (1 to 10).map(i => (i.toLong, 0.5)).toDF("id", "s")
    assert(Sampling.keepAboveQuantile(flat, $"s", p = 70).count() == 10)
  }

  test("histogram percentile == rank-window percentile (exact parity)") {
    // many ties + odd/even group sizes exercise the cum >= pos boundary
    val df = Seq.tabulate(137)(i => (i.toLong, s"g${i % 2}", (i * 7) % 13))
      .toDF("doc_id", "lang", "n_tokens")
    val W = org.apache.spark.sql.expressions.Window
    val wr = W.partitionBy($"lang").orderBy($"n_tokens", $"doc_id")
    val wc = W.partitionBy($"lang")
    val viaRank = df
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wc))
      .groupBy($"lang").agg(
        max(when($"rn" === expr("(n + 1) div 2"), $"n_tokens")).as("med"),
        max(when($"rn" === expr("(95 * n + 99) div 100"), $"n_tokens")).as("p95"))
      .orderBy($"lang").collect().toSeq
    val wcum = W.partitionBy($"lang").orderBy($"n_tokens")
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val viaHist = df.groupBy($"lang", $"n_tokens").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum($"c").over(wcum))
      .withColumn("n", sum($"c").over(W.partitionBy($"lang")))
      .groupBy($"lang").agg(
        min(when($"cum" >= expr("(n + 1) div 2"), $"n_tokens")).as("med"),
        min(when($"cum" >= expr("(95 * n + 99) div 100"), $"n_tokens")).as("p95"))
      .orderBy($"lang").collect().toSeq
    assert(viaHist == viaRank)
  }

  test("discrete percentile = value at ceil(p*n), no interpolation") {
    // 4 values: median pos = (4+1) div 2 = 2 -> 20; p95 pos = (380+99) div 100 = 4 -> 40
    val df = Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40))
      .toDF("doc_id", "n_tokens").withColumn("lang", lit("en"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"n_tokens", $"doc_id")
    val wc = org.apache.spark.sql.expressions.Window.partitionBy($"lang")
    val got = df
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wc))
      .groupBy($"lang")
      .agg(
        max(when($"rn" === expr("(n + 1) div 2"), $"n_tokens")).as("med"),
        max(when($"rn" === expr("(95 * n + 99) div 100"), $"n_tokens")).as("p95"))
      .collect().head
    assert(got.getInt(1) == 20 && got.getInt(2) == 40)
  }

  test("TopKByKey sample == rank-window sample (exact parity)") {
    val df = Seq.tabulate(200)(i => (i.toLong, s"s${i % 3}"))
      .toDF("doc_id", "lang")
      .withColumn("h", xxhash64($"doc_id"))
    val agg = Sampling.stratifiedSample(df, $"lang", $"doc_id", $"h", cap = 7)
      .select($"id", $"stratum", $"hash", $"rk")
      .orderBy($"stratum", $"rk").collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"h", $"doc_id")
    val win = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 7)
      .select($"doc_id", $"lang", $"h", $"rk".cast("int"))
      .orderBy($"lang", $"rk").collect().toSeq
    assert(agg == win)
  }

  test("TopKByKey aggregates partially (map-side), no rank-window sort") {
    val plan = graft.SparkEntry.queries("sample_stratified")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_by_key"),
      s"expected a partial TopKByKey aggregate in:\n$plan")
    assert(!plan.contains("row_number()"), "sample must not use a rank window")
  }

  test("TopKByKey == sort.take(k) on seeded random inputs, k edge cases") {
    val rnd = new scala.util.Random(42)
    for (k <- Seq(1, 3, 50)) {
      val rows = Seq.fill(300)((rnd.nextLong() % 97, rnd.nextLong() % 1000,
        s"g${rnd.nextInt(4)}"))
      val df = rows.toDF("h", "doc_id", "g")
      val got = df.groupBy($"g")
        .agg(Sampling.topKByKey($"h", $"doc_id", k).as("top"))
        .collect().map(r => r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(s => (s.getLong(0), s.getLong(1))))
        .toMap
      // the aggregate keeps duplicate pairs like a sort would — the
      // reference is the multiset head
      val want = rows.groupBy(_._3).map { case (g, rs) =>
        g -> rs.map(r => (r._1, r._2)).sorted.take(k)
      }
      assert(got == want, s"k=$k mismatch")
    }
  }

  test("sample_stratified: per-stratum cap, deterministic, hash-ordered") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.SparkEntry.queries("sample_stratified")(spark, dir).collect()
    val b = graft.SparkEntry.queries("sample_stratified")(spark, dir).collect()
    assert(a.toSeq == b.toSeq) // seeded: identical across runs
    val perLang = a.groupBy(_.getAs[String]("lang"))
    perLang.foreach { case (_, rows) =>
      assert(rows.length <= 25)
      val ranked = rows.sortBy(_.getAs[Int]("rk"))
      val hs = ranked.map(_.getAs[Long]("h"))
      assert(hs.sameElements(hs.sorted), "rank must follow hash order")
    }
  }

  test("mixture sample: deterministic, weight-monotone keep rates") {
    val df = Seq.tabulate(3000)(i => (i.toLong, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val weights = Map("s0" -> 1.0, "s1" -> 0.3)
    val a = Sampling.mixtureSample(df, $"source", $"doc_id", weights, 0.05)
    val b = Sampling.mixtureSample(df, $"source", $"doc_id", weights, 0.05)
    assert(a.collect().toSeq == b.collect().toSeq) // pure function of input
    val per = a.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per("s0") == 1000) // weight 1.0 keeps everything
    // 0.3 and the 0.05 default land near their expected rates (hash is
    // uniform; 1000 draws — generous bounds, deterministic seed)
    assert(per("s1") > 200 && per("s1") < 400, s"s1=${per("s1")}")
    assert(per.getOrElse("s2", 0L) < 120, s"s2=${per.get("s2")}")
    // every kept row satisfies the threshold it reports
    assert(a.filter($"bucket" >= $"w_thresh").count() == 0)
  }

  test("temperature sample: sqrt-scaled rates, smallest stratum kept whole") {
    // strata of 1000 / 250 / 40 rows
    val df = (Seq.tabulate(1000)(i => (i.toLong, "big")) ++
      Seq.tabulate(250)(i => (1000L + i, "mid")) ++
      Seq.tabulate(40)(i => (2000L + i, "small")))
      .toDF("doc_id", "source")
    val out = Sampling.temperatureSample(df, $"source", $"doc_id")
    val thresh = out.select($"source", $"w_thresh").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent arithmetic: floor(1e6 * sqrt(min_n / n_s))
    assert(thresh("small") == 1000000L)
    assert(thresh("mid") == math.floor(1000000.0 * math.sqrt(40.0 / 250.0)).toLong)
    assert(thresh("big") == math.floor(1000000.0 * math.sqrt(40.0 / 1000.0)).toLong)
    val kept = out.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 40) // rate 1.0: nothing dropped
    // uniform hash: kept counts land near n_s * rate (generous bounds)
    assert(kept("big") > 130 && kept("big") < 270, s"big=${kept("big")}")
    assert(kept("mid") > 50 && kept("mid") < 150, s"mid=${kept("mid")}")
    // determinism
    val again = Sampling.temperatureSample(df, $"source", $"doc_id")
    assert(out.collect().toSeq == again.collect().toSeq)
  }

  test("shuffle shards: contiguous per-shard positions, scrambled order, " +
      "deterministic") {
    val df = Seq.tabulate(2000)(i => Tuple1(i.toLong)).toDF("doc_id")
    val out = Sampling.shuffleShards(df, $"doc_id", nShards = 4)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(rows.length == 2000)
    // per shard: positions are exactly 1..n
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq,
        s"shard $shard positions not contiguous")
      // hash order scrambles id order: the id sequence in position order
      // must not be monotonic (probability ~0 under a real shuffle)
      val idsByPos = rs.sortBy(_._3).map(_._1).toSeq
      assert(idsByPos.sliding(2).exists(p => p(0) > p(1)),
        s"shard $shard still in id order")
    }
    // shards near-uniform (hash balance; generous bounds at n=2000, k=4)
    val sizes = rows.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.values.forall(n => n > 350 && n < 650), sizes.toMap.toString)
    // reproducible
    assert(Sampling.shuffleShards(df, $"doc_id", nShards = 4)
      .collect().map(_.toSeq).toSeq == out.collect().map(_.toSeq).toSeq)
  }

  test("split assignment: total, banded, stable under corpus growth") {
    val bands = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val small = Seq.tabulate(500)(i => Tuple1(i.toLong)).toDF("doc_id")
    val big = Seq.tabulate(2000)(i => Tuple1(i.toLong)).toDF("doc_id")
    val out = Sampling.assignSplit(big, $"doc_id", bands).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size == 2000) // every row assigned exactly once
    // split matches the band of the bucket
    out.values.foreach { case (b, s) =>
      assert(b >= 0 && b < 100)
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s == want, s"bucket $b -> $s")
    }
    // proportions near 80/10/10 (hash balance; generous at n=2000)
    val n = out.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(n("train") > 1500 && n("train") < 1700, n.toString)
    assert(n("val") > 120 && n("val") < 280, n.toString)
    assert(n("test") > 120 && n("test") < 280, n.toString)
    // growth stability: the 500-doc prefix gets identical assignments
    val sub = Sampling.assignSplit(small, $"doc_id", bands).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    sub.foreach { case (id, v) => assert(out(id) == v) }
    // invalid bands rejected
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(small, $"doc_id", Seq("a" -> 50, "b" -> 40))
    }
  }

  test("rangedRunningSum / budgetPrefix == global running-sum window (exact parity)") {
    // the distributed budget-prefix shape (range partitions + per-range
    // subtotals + broadcast offsets + static range pruning) must return
    // exactly the rows and cumulative sums of the naive unpartitioned
    // window it replaces — on seeded random data with ties in the leading
    // order column and at several range counts (incl. more ranges than
    // rows)
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val df = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(12), 1 + rnd.nextInt(50)))
      .toDF("id", "q", "v")
    val w = Window.orderBy($"q".desc, $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df.withColumn("cum", sum($"v".cast("long")).over(w))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id"), r.getAs[Long]("cum"))
    val naiveAll = naive.collect().map(key).toSet
    for (ranges <- Seq(1, 3, 8, 1000)) {
      val ranged = Sampling.rangedRunningSum(df,
        Seq($"q".desc, $"id"), $"v", "cum", numRanges = ranges)
      assert(ranged.collect().map(key).toSet == naiveAll,
        s"rangedRunningSum diverged at numRanges=$ranges")
      val budget = 2000L
      val naivePrefix = naive.filter($"cum" <= budget).collect().map(key).toSet
      val pref = Sampling.budgetPrefix(df, Seq($"q".desc, $"id"), $"v",
        "cum", budget = budget, numRanges = ranges)
      assert(pref.collect().map(key).toSet == naivePrefix,
        s"budgetPrefix diverged at numRanges=$ranges")
    }
  }

  test("sequence packing matches the sequential per-shard reference") {
    val rows = Seq.tabulate(50)(i => (i.toLong, s"s${i % 2}", 300L + (i * 37) % 500))
    val got = Sampling.packSequences(rows.toDF("doc_id", "source", "nt"),
        $"source", $"doc_id", $"nt", budget = 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).sortBy(_._1)
    val want = rows.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_._1).map { case (id, s, nt) =>
        val start = cum; cum += nt
        (id, s, nt, start / 1000L, start % 1000L, start % 1000L + nt > 1000L)
      }
    }.sortBy(_._1)
    assert(got.toSeq == want)
    // a boundary-spanning doc exists in this construction (sizes don't
    // divide the budget) — the flag is load-bearing, not constant
    assert(got.exists(_._6) && got.exists(!_._6))
  }

  test("curriculum_order: positions contiguous per (bin, shard), " +
      "bins length-monotone, deterministic") {
    val q = graft.SparkEntry.queries("curriculum_order")
    val a = q(spark, "/root/testdata/sf0.001").collect()
    assert(a.toSeq == q(spark, "/root/testdata/sf0.001").collect().toSeq)
    a.groupBy(r => (r.getAs[Int]("bin"), r.getAs[Long]("shard")))
      .foreach { case (k, rows) =>
        assert(rows.map(_.getAs[Int]("pos")).sorted.toSeq ==
          (1 to rows.length), s"gap in positions of $k")
      }
    // bins really order by length: every bin-0 doc is shorter than any
    // bin-7 doc (the warm-up contract)
    val lens = graft.util.Tables.t(spark, "/root/testdata/sf0.001",
        "documents").select($"doc_id", length($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byBin = a.groupBy(_.getAs[Int]("bin"))
    val bins = byBin.keys.toSeq.sorted
    assert(bins.size > 1, "length binning must actually split the corpus")
    val maxOfFirst = byBin(bins.head).map(r => lens(r.getLong(0))).max
    val minOfLast = byBin(bins.last).map(r => lens(r.getLong(0))).min
    assert(maxOfFirst < minOfLast + 100,
      s"bin ${bins.head} max len $maxOfFirst vs bin ${bins.last} " +
        s"min len $minOfLast")
  }

  test("bpe_train learns the hand-computed merge sequence on the " +
      "classic corpus (ties resolve left-asc)") {
    // Sennrich-style fixture: low x5, lower x2, newest x6, widest x3
    val docs = Seq((1L, ("low " * 5) + ("lower " * 2) +
      ("newest " * 6) + ("widest " * 3))).toDF("doc_id", "text")
    val got = BpeTrain.train(docs, "text", rounds = 4)
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (e,s) and (s,t) tie at 9 -> left-asc picks (e,s);
    // round 2: (es,t)=9; round 3: (l,o)/(o,w) tie at 7 -> (l,o);
    // round 4: (lo,w)=7
    assert(got == Seq((1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)), got)
  }

  test("bpe_train_apply: learned merges compress — tokens per doc " +
      "strictly between word count and letter count") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("bpe_train_apply")(spark, dir)
    val chars = graft.util.Tables.t(spark, dir, "documents")
      .select($"doc_id",
        length(regexp_replace($"text", "\\s+", "")).as("nl"))
    val joined = out.join(chars, Seq("doc_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nt, nw, nl) = (r.getAs[Long]("n_tokens_learned"),
        r.getAs[Long]("n_words"), r.getAs[Int]("nl").toLong)
      assert(nt >= nw, s"fewer tokens than words: $nt < $nw")
      assert(nt < nl, s"merges learned nothing: $nt tokens for $nl chars")
    }
  }

  test("flesch readability: hand-computed fixture and monotone difficulty") {
    val got = Seq(
      (1L, "The cat sat. The dog ran."),          // short words, 2 sentences
      (2L, "Extraordinarily complicated terminology necessitates " +
        "comprehensive documentation."))           // long words, 1 sentence
      .toDF("doc_id", "text")
    val out = got.select($"doc_id",
        TextAnalysis.wordCount($"text").as("w"),
        TextAnalysis.sentenceCount($"text").as("s"),
        TextAnalysis.syllableCount($"text").as("sy"))
      .withColumn("f", TextAnalysis.fleschEase($"w", $"s", $"sy"))
      .orderBy($"doc_id").collect()
    // doc 1: 6 words, 2 sentences, 6 one-syllable words
    assert(out(0).getAs[Int]("w") == 6 && out(0).getAs[Int]("s") == 2 &&
      out(0).getAs[Int]("sy") == 6)
    val f1 = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    assert(out(0).getAs[Double]("f") == f1)
    // the polysyllabic doc must read as much harder (lower score)
    assert(out(1).getAs[Double]("f") < out(0).getAs[Double]("f") - 50)
  }

  test("span_corruption_plan: one in-window span per 20-token window, " +
      "non-overlapping, in bounds, deterministic") {
    val q = graft.SparkEntry.queries("span_corruption_plan")
    val a = q(spark, "/root/testdata/sf0.001").collect()
    assert(a.toSeq == q(spark, "/root/testdata/sf0.001").collect().toSeq)
    val nw = graft.util.Tables.t(spark, "/root/testdata/sf0.001",
        "documents")
      .select($"doc_id", TextAnalysis.wordCount($"text").as("nw"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    a.groupBy(_.getLong(0)).foreach { case (doc, rows) =>
      val spans = rows.sortBy(_.getAs[Int]("win"))
      assert(spans.map(_.getAs[Int]("win")).toSeq ==
        (0 until spans.length), s"doc $doc missing windows")
      spans.foreach { r =>
        val win = r.getAs[Int]("win")
        val start = r.getAs[Long]("span_start")
        val len = r.getAs[Long]("span_len")
        assert(start >= win * 20 && start < (win + 1) * 20,
          s"doc $doc span $start outside window $win")
        assert(len >= 1 && len <= 3)
        assert(start + len <= nw(doc), s"doc $doc span overruns tokens")
      }
      // windows are disjoint, so spans are non-overlapping by
      // construction — and coverage sits at ~15% of tokens
      val masked = spans.map(_.getAs[Long]("span_len")).sum
      assert(masked <= nw(doc).toLong)
    }
  }

  test("export_manifest: covers every doc exactly once; content_fp " +
      "reacts to any dropped doc") {
    val dir = "/root/testdata/sf0.001"
    val m = graft.SparkEntry.queries("export_manifest")(spark, dir).collect()
    val total = graft.util.Tables.t(spark, dir, "documents").count()
    assert(m.map(_.getAs[Long]("n_docs")).sum == total)
    assert(m.map(r => (r.getString(0), r.getLong(1))).distinct.length ==
      m.length)
    // xor fingerprint property: removing one doc from a shard flips its
    // content_fp (single-doc delta is detectable)
    val fps = m.map(r => (r.getString(0), r.getLong(1)) ->
      r.getAs[Long]("content_fp")).toMap
    assert(fps.values.toSet.size > 1)
  }

  test("knn_centroid_drift: every vector counted once; drift present " +
      "after the append") {
    val dir = "/root/testdata/sf0.001"
    val d = graft.SparkEntry.queries("knn_centroid_drift")(spark, dir)
      .collect()
    val nVecs = graft.util.Tables.t(spark, dir, "embeddings").count()
    assert(d.map(_.getAs[Long]("n_vecs")).sum == nVecs)
    assert(d.forall(_.getAs[Long]("drift_sq") >= 0L))
    // the appended fifth moved at least one cell mean off its frozen
    // centroid — the rebuild-trigger signal is live, not a zero column
    assert(d.exists(_.getAs[Long]("drift_sq") > 0L))
  }

  test("d7c_store_update: origins disjoint and the union equals " +
      "store + d7 survivors") {
    val dir = "/root/testdata/sf0.001"
    val upd = graft.SparkEntry.queries("d7c_store_update")(spark, dir)
    val byOrigin = upd.groupBy($"origin").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOrigin.keySet == Set("store", "new"))
    // no fp may carry both origins (survivors were anti-joined)
    assert(upd.groupBy($"fp").count().filter($"count" > 1).isEmpty)
    val survivors = graft.SparkEntry.queries("d7_incremental_dedup")(
      spark, dir).select($"fp").distinct().count()
    assert(byOrigin("new") == survivors,
      s"delta ${byOrigin("new")} != d7 survivors $survivors")
  }
}
