package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // base text + near-dup (one word changed) + exact dup + unrelated
  private val base = "the quick brown fox jumps over the lazy dog while the " +
    "rain falls gently on the quiet meadow and the river runs to the sea " +
    "under a pale morning sky with birds singing in the distant trees"
  private val nearDup = base.replace("morning", "evening")
  private val unrelated = "completely different content about database " +
    "engines columnar storage vectorized execution and query optimization " +
    "with hash joins exchange operators and adaptive partitioning schemes"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, base), (4L, unrelated))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
      .orderBy($"canonical_id").collect()
    assert(groups.length == 3)
    val g = groups.find(_.getLong(2) == 2).get
    assert(g.getLong(1) == 1) // canonical = min(doc 1, doc 3)
  }

  test("ngram jaccard finds the near-dup pair and not the unrelated") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
      minJaccard = 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // near-dup
    assert(pairs.contains((1L, 3L))) // exact dup (jaccard 1.0)
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("jaccard df-cap: a boilerplate shingle shared by every doc makes no pairs") {
    // 60 docs that share ONE hot 3-gram (legal boilerplate) but are
    // otherwise disjoint: without the df cap the self-join fans out to
    // 60*59/2 candidate rows on that shingle alone; with it, zero pairs.
    val boiler = "incorporated by reference"
    val skewed = (1L to 60L).map(i =>
      (i, s"$boiler unique$i filler$i content$i body$i tail$i"))
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(skewed, "doc_id", "text", n = 3,
      minJaccard = 0.0, maxDf = 50)
    assert(pairs.count() == 0)
    // and the capped universe still finds true near-dups among cold shingles
    val mixed = skewed.union(Seq(
      (101L, s"$boiler alpha beta gamma delta epsilon zeta"),
      (102L, s"$boiler alpha beta gamma delta epsilon eta"))
      .toDF("doc_id", "text"))
    val found = Dedup.jaccardPairs(mixed, "doc_id", "text", n = 3,
      minJaccard = 0.3, maxDf = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((101L, 102L)), s"got $found")
  }

  test("wordShingleHashes matches FNV of the string word-shingles") {
    import org.apache.spark.unsafe.types.UTF8String
    for (t <- Seq(base, nearDup, unrelated, "one two", "single", "a b c d e");
         n <- Seq(2, 3)) {
      val norm = t.toLowerCase.trim.replaceAll("\\s+", " ")
      val words = norm.split(" ")
      val strs =
        (1 to math.max(words.length - (n - 1), 1)).map { i =>
          words.slice(i - 1, i - 1 + n).mkString(" ")
        }.distinct
      val expect = strs.map(TextImpl.fnv1a64).sorted
      val got = TextImpl.wordShingleHashes(UTF8String.fromString(norm), n).toSeq
      assert(got == expect, s"text=$t n=$n")
    }
    // total on out-of-contract input (space runs / outer spaces): no crash
    for (bad <- Seq("a  b", " lead", "trail ", "   ", "")) {
      val out = TextImpl.wordShingleHashes(UTF8String.fromString(bad), 2)
      assert(out != null)
    }
  }

  test("BoundedLongList: saturation survives partial-aggregate merges") {
    import org.apache.spark.sql.graft.{BoundedLongList, internal}
    def agg(limit: Int) = internal.column(
      BoundedLongList(internal.expression($"id"), limit).toAggregateExpression())
    // 16 partitions force partial buffers + a merge at the final stage
    val df = spark.range(0, 200).select(lit(1L).as("k"), $"id").repartition(16)
    val saturated = df.groupBy($"k").agg(agg(100).as("ids")).collect().head
    assert(saturated.isNullAt(1), "201+ member group must saturate to NULL")
    val kept = df.groupBy($"k").agg(agg(300).as("ids")).collect().head
    assert(kept.getSeq[Long](1) == (0L until 200L), "sorted complete list")
  }

  test("minhash LSH candidates include high-jaccard pairs, verified pairs exact") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 3L)), "exact dup must share all buckets")
    assert(cands.contains((1L, 2L)), "near-dup should collide in some band")
    val verified = Dedup.minhashDedupPairs(docs, "doc_id", "text",
      minJaccard = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(verified((1L, 3L)) == 1.0)
    assert(!verified.contains((1L, 4L)))
  }

  test("minhash accuracy: exact dups agree fully, est tracks jaccard") {
    val rows = Dedup.minhashAccuracy(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows.nonEmpty)
    // every candidate pair collided in >= 1 band, and bucket equality
    // means the whole band's signature values agree
    rows.values.foreach { case (nAgree, est, jac) =>
      assert(nAgree >= Dedup.NumHashes / Dedup.NumBands && nAgree <= Dedup.NumHashes)
      assert(est == nAgree.toDouble / Dedup.NumHashes)
      assert(jac >= 0.0 && jac <= 1.0)
    }
    // the exact-dup pair: all positions agree, exact jaccard 1.0
    val (na13, est13, jac13) = rows((1L, 3L))
    assert(na13 == Dedup.NumHashes && est13 == 1.0 && jac13 == 1.0)
    // the unrelated doc, if it ever collides, must estimate low
    rows.collect { case ((a, b), (na, _, _)) if a == 4L || b == 4L =>
      assert(na < Dedup.NumHashes / 2, s"unrelated pair ($a,$b) agree=$na")
    }
  }

  test("minhash signature is stable and per-permutation minimal") {
    val sig1 = Dedup.minhashSignatures(docs, "doc_id", "text").orderBy($"doc_id")
      .collect().map(_.toSeq)
    val sig2 = Dedup.minhashSignatures(docs, "doc_id", "text").orderBy($"doc_id")
      .collect().map(_.toSeq)
    assert(sig1.toSeq == sig2.toSeq) // deterministic across runs
    // identical docs -> identical signatures
    assert(sig1(0).tail == sig1(2).tail)
  }

  test("simhash: near-dups within small hamming distance, unrelated far") {
    val ham = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 64)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(ham((1L, 3L)) == 0) // exact dup -> identical simhash
    assert(ham((1L, 2L)) <= 12, s"near-dup hamming ${ham((1L, 2L))}")
    ham.get((1L, 4L)).foreach(h => assert(h > 12, s"unrelated hamming $h"))
  }

  test("simhash bucket cap: a hot band bucket yields no pairs, cold pairs survive") {
    // 100 byte-identical docs collide in every band bucket: with the cap
    // below the bucket size, no candidate pair materializes (the old
    // self-join shape would emit 100*99/2 rows per band); a separate cold
    // near-dup pair is still found.
    val hot = (1L to 100L).map(i => (i, base)).toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(hot, "doc_id", "text",
      maxHamming = 64, maxBucketSize = 50)
    assert(capped.count() == 0, "hot buckets must be dropped under the cap")
    // cap above the bucket size: every pair of the 100 exact dups appears
    val uncapped = Dedup.simhashPairs(hot, "doc_id", "text",
      maxHamming = 0, maxBucketSize = 200)
    assert(uncapped.count() == 100L * 99 / 2)
    // cold pair alongside the hot bucket is unaffected by the drop
    val mixed = hot.union(Seq((201L, nearDup), (202L, nearDup))
      .toDF("doc_id", "text"))
    val found = Dedup.simhashPairs(mixed, "doc_id", "text",
      maxHamming = 0, maxBucketSize = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((201L, 202L)), s"got $found")
  }

  test("simhash64 value is stable across sessions (fixed token hash)") {
    val v1 = Seq(base).toDF("t")
      .select(graft.GraftFunctions.simhash64($"t")).collect().head.getLong(0)
    assert(v1 == TextImpl.simhash64(
      org.apache.spark.unsafe.types.UTF8String.fromString(base)))
  }

  test("decontamination flags corpus docs overlapping the benchmark") {
    val bench = Seq((100L, base)).toDF("doc_id", "text")
    val corpus = Seq((1L, base), (2L, nearDup), (4L, unrelated))
      .toDF("doc_id", "text")
    val rows = Dedup.contaminationHits(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getBoolean(3))).toMap
    // the benchmark copy: every distinct gram hits
    val (g1, h1, c1) = rows(1L)
    assert(c1 && h1 == g1.toLong)
    // one changed word still contaminates (most grams shared)
    val (_, h2, c2) = rows(2L)
    assert(c2 && h2 > 0)
    // disjoint vocabulary: zero hits
    assert(rows(4L) == ((rows(4L)._1, 0L, false)))
  }

  test("contamination counts match brute-force n-gram overlap on random docs") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    def doc() = Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
      .mkString(" ")
    val corpus = Seq.tabulate(40)(i => (i.toLong, doc()))
    val bench = Seq.tabulate(5)(i => (100L + i, doc()))
    def grams(s: String) =
      s.split(" ").toSeq.sliding(3).map(_.mkString(" ")).toSeq.distinct
    val bset = bench.flatMap(b => grams(b._2)).toSet
    val got = Dedup.contaminationHits(corpus.toDF("doc_id", "text"),
        bench.toDF("doc_id", "text"), "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    corpus.foreach { case (id, s) =>
      val g = grams(s)
      assert(got(id)._1 == g.size, s"id=$id gram count")
      assert(got(id)._2 == g.count(bset).toLong, s"id=$id hit count")
    }
  }

  test("decontamination minHits knob raises the flag threshold") {
    // share exactly one 3-gram ("alpha beta gamma") with the benchmark
    val bench = Seq((9L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq((1L, "alpha beta gamma zz yy xx ww vv uu tt"))
      .toDF("doc_id", "text")
    def run(minHits: Int) =
      Dedup.contaminationHits(corpus, bench, "doc_id", "text", n = 3,
        minHits = minHits).collect().head.getBoolean(3)
    assert(run(1))
    assert(!run(3))
  }

  test("d8b production regime: canary injection is exactly additive") {
    // at n=8/minHits=1 on the real corpus, the flagged set with the
    // canary injected must equal (naturally flagged docs) UNION (injected
    // docs): full sensitivity — every injected doc flags — and zero
    // injection-induced false positives. Natural flags are real
    // train/bench near-dup leakage and must survive unchanged (injection
    // only ever ADDS grams).
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val leak = graft.queries.DataPipelineQueries.D8bLeak
    val benchRaw = docs.filter($"doc_id" % 10 === 3)
    val trainRaw = docs.filter($"doc_id" % 10 =!= 3)
    def flagged(bench: org.apache.spark.sql.DataFrame,
        train: org.apache.spark.sql.DataFrame): Set[Long] =
      Dedup.contaminationHits(train, bench, "doc_id", "text",
          n = 8, minHits = 1)
        .filter($"contaminated").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
    val natural = flagged(benchRaw, trainRaw)
    val withInjection = flagged(
      benchRaw.select($"doc_id", concat($"text", lit(leak)).as("text")),
      trainRaw.select($"doc_id",
        when($"doc_id" % 17 === 0, concat($"text", lit(leak)))
          .otherwise($"text").as("text")))
    val injected = trainRaw.filter($"doc_id" % 17 === 0)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(injected.nonEmpty, "fixture must inject at least one doc")
    assert(withInjection == natural.union(injected),
      s"additivity broken: extra=${(withInjection -- natural -- injected)
        .toSeq.sorted.take(5)} missing=${(natural.union(injected) --
        withInjection).toSeq.sorted.take(5)}")
  }

  test("span dedup keep-first: cross-doc, within-doc, and full-drop cases") {
    val corpus = Seq(
      (1L, "a b c d e f g"),   // spans: "a b c" "d e f" "g"
      (2L, "a b c x y z"),     // "a b c" dup of doc 1 -> dropped
      (3L, "d e f d e f"),     // both spans dup of doc 1 -> empty
      (4L, "a b c d e f g"),   // exact dup of doc 1 -> empty
      (5L, "p q r p q r"),     // within-doc repeat: keep the first
      (6L, "u v")              // single short span, unique
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedupKeepFirst(corpus, "doc_id", "text",
      spanWords = 3).orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, "a b c d e f g", 3L, 3L))) // first doc unchanged
    assert(out(1) == ((2L, "x y z", 2L, 1L)))
    assert(out(2) == ((3L, "", 2L, 0L)))
    assert(out(3) == ((4L, "", 3L, 0L)))
    assert(out(4) == ((5L, "p q r", 2L, 1L)))
    assert(out(5) == ((6L, "u v", 1L, 1L)))
  }

  test("span dedup: all-unique corpus passes through unchanged") {
    val corpus = Seq.tabulate(40)(i =>
      (i.toLong, (0 until 25).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.spanDedupKeepFirst(corpus, "doc_id", "text",
      spanWords = 10).join(corpus, Seq("doc_id"))
    assert(out.filter($"clean_text" =!= $"text").count() == 0)
    assert(out.filter($"n_kept" =!= $"n_spans").count() == 0)
    // 25 words -> 3 spans of width 10
    assert(out.filter($"n_spans" =!= 3).count() == 0)
  }
}
