package graft.ops

import graft.SparkSpec
import graft.io.Clients
import org.apache.spark.sql.functions._

/** F17 quote folding, F7b leaf-block HTML, A4 contrastive centroid,
  * X1 fallback classifier. */
class ExtraOpsSpec extends SparkSpec {
  import spark.implicits._

  test("F17: cp1252 mojibake remaps then folds to ASCII quotes") {
    // / are cp1252-mangled smart double quotes
    val in = "word and ‘single’ and «guillemet»"
    val out = Seq(in).toDF("t").select(Normalize.normalizeQuotes($"t"))
      .collect().head.getString(0)
    assert(out == "\"word\" and 'single' and \"guillemet\"")
  }

  test("F17: NBSP normalized, dashes/ellipsis remapped not folded") {
    val in = "a b  c "
    val out = Seq(in).toDF("t").select(Normalize.normalizeQuotes($"t"))
      .collect().head.getString(0)
    assert(out == "a b – c …")
  }

  test("F7b: leaf blocks flattened, page-number blocks dropped") {
    val html = "<div><p>First   block\ttext</p><p> 42 </p>" +
      "<p>Second block</p></div>"
    val out = Seq(html).toDF("h").select(Normalize.htmlToBlocks($"h"))
      .collect().head.getString(0)
    assert(out == "First block text\n\nSecond block")
  }

  test("A4: contrastive query centroid is normalized instr + pos - 1.5*neg") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(0.0f, 0.0f)))
      .toDF("instr", "pos", "neg")
    val out = df.select(Similarity.contrastiveQuery($"instr", $"pos", $"neg"))
      .collect().head.getSeq[Double](0)
    val exp = math.sqrt(0.5)
    assert(math.abs(out(0) - exp) < 1e-9 && math.abs(out(1) - exp) < 1e-9)
  }

  test("BM25: hand-computed score, tf saturation, length normalization") {
    // 4 docs, query = ("cat", "dog"); doc 4 matches nothing -> excluded
    val docs = Seq(
      (1L, "cat dog bird"),           // both terms, short
      (2L, "cat cat cat cat bird fish"), // saturated tf, longer
      (3L, "dog fish bird frog owl pig hen cow fox elk"), // long, one term
      (4L, "fish bird frog")
    ).toDF("doc_id", "text")
    val out = Rank.bm25TopK(docs, "doc_id", "text",
      terms = Seq("cat", "dog"), k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getDouble(4))).toMap
    assert(!out.contains(4L))
    // independent reference computation (plain scala, same formula)
    val dls = Map(1L -> 3.0, 2L -> 6.0, 3L -> 10.0, 4L -> 3.0)
    val avgdl = dls.values.sum / 4.0
    def idf(df: Int) = math.log((4.0 - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Int, df: Int, dl: Double) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
    def score(tfCat: Int, tfDog: Int, dl: Double) =
      term(tfCat, 2, dl) + term(tfDog, 2, dl)
    Seq((1L, 1, 1), (2L, 4, 0), (3L, 0, 1)).foreach { case (id, tc, td) =>
      assert(math.abs(out(id)._3 - score(tc, td, dls(id))) < 1e-6,
        s"doc $id: got ${out(id)._3}, want ${score(tc, td, dls(id))}")
      assert(out(id)._1 == tc && out(id)._2 == td)
    }
    // saturation: 4x the tf is far less than 4x the one-occurrence term
    assert(out(2L)._3 < 4 * out(1L)._3)
    // length normalization: same single-term tf scores lower in the
    // 10-word doc than "dog" contributes to the 3-word doc
    assert(term(1, 2, 10.0) < term(1, 2, 3.0))
  }

  test("BM25 inverted index: bit-identical to the corpus scan, buckets pruned") {
    val docs = Seq(
      (1L, "cat dog bird"),
      (2L, "cat cat cat cat bird fish"),
      (3L, "dog fish bird frog owl pig hen cow fox elk"),
      (4L, "fish bird frog")
    ).toDF("doc_id", "text")
    val path = graft.util.TempDirs.create("bm25-spec") + "/idx"
    Rank.writeInvertedIndex(docs, "doc_id", "text", path, nBuckets = 8)
    val got = Rank.bm25IndexedTopK(spark, path,
      terms = Seq("cat", "dog"), k = 10, nBuckets = 8).collect().toSeq
    val want = Rank.bm25TopK(docs, "doc_id", "text",
      terms = Seq("cat", "dog"), k = 10).collect().toSeq
    assert(got == want, s"indexed $got vs scan $want")
    // the postings scan must carry a partition filter on bucket (static
    // pruning — a query reads only its terms' buckets, never the corpus)
    val planned = Rank.bm25IndexedTopK(spark, path,
      terms = Seq("cat", "dog"), k = 10, nBuckets = 8)
    val expl = planned.queryExecution.executedPlan.toString
    assert(expl.contains("PartitionFilters") &&
      expl.contains("bucket"), expl.take(2000))
    // a term with no postings contributes zero, never a null score
    val lone = Rank.bm25IndexedTopK(spark, path,
      terms = Seq("cat", "zzz_absent"), k = 10, nBuckets = 8).collect()
    assert(lone.nonEmpty && lone.forall(!_.isNullAt(4)))
  }

  test("BM25 append: build(old)+append(new) == build(old ∪ new), " +
      "bit for bit; sidecar totals roll forward") {
    val old = Seq(
      (1L, "cat dog bird"),
      (2L, "cat cat cat cat bird fish")).toDF("doc_id", "text")
    val batch = Seq(
      (3L, "dog fish bird frog owl pig hen cow fox elk"),
      (4L, "fish bird frog")).toDF("doc_id", "text")
    val incr = graft.util.TempDirs.create("bm25-incr-spec") + "/idx"
    Rank.writeInvertedIndex(old, "doc_id", "text", incr, nBuckets = 8)
    Rank.appendInvertedIndex(spark, batch, "doc_id", "text", incr,
      nBuckets = 8)
    val full = graft.util.TempDirs.create("bm25-full-spec") + "/idx"
    Rank.writeInvertedIndex(old.unionByName(batch), "doc_id", "text",
      full, nBuckets = 8)
    val got = Rank.bm25IndexedTopK(spark, incr,
      terms = Seq("cat", "fish"), k = 10, nBuckets = 8).collect().toSeq
    val want = Rank.bm25IndexedTopK(spark, full,
      terms = Seq("cat", "fish"), k = 10, nBuckets = 8).collect().toSeq
    assert(got == want, s"incr $got vs full $want")
    val stats = graft.util.Sidecars.read(spark, incr, "stats")
      .select("n_docs", "sum_dl", "n_buckets", "max_doc_id")
      .as[(Long, Long, Int, Long)].head()
    assert(stats == ((4L, 3L + 6L + 10L + 3L, 8, 4L)))
  }

  test("BM25 append guards: empty batch is a no-op, nBuckets mismatch " +
      "and overlapping doc_ids are refused") {
    val old = Seq((1L, "cat dog"), (2L, "cat fish")).toDF("doc_id", "text")
    val path = graft.util.TempDirs.create("bm25-guard-spec") + "/idx"
    Rank.writeInvertedIndex(old, "doc_id", "text", path, nBuckets = 8)
    // empty batch: no NPE, sidecar unchanged
    Rank.appendInvertedIndex(spark, old.filter($"doc_id" > 99),
      "doc_id", "text", path, nBuckets = 8)
    val st = graft.util.Sidecars.read(spark, path, "stats")
      .select("n_docs", "sum_dl").as[(Long, Long)].head()
    assert(st == ((2L, 4L)))
    // geometry mismatch: bucket numbering would diverge
    intercept[IllegalArgumentException](Rank.appendInvertedIndex(spark,
      Seq((3L, "owl")).toDF("doc_id", "text"), "doc_id", "text", path,
      nBuckets = 16))
    // re-appending an already-indexed id would double-count df
    intercept[IllegalArgumentException](Rank.appendInvertedIndex(spark,
      Seq((2L, "cat")).toDF("doc_id", "text"), "doc_id", "text", path,
      nBuckets = 8))
  }

  test("BM25 delete: tombstoned query == from-scratch build over the " +
      "survivors; sidecar mass subtracts; unknown ids refused") {
    val docs = Seq(
      (1L, "cat dog bird"),
      (2L, "cat cat cat cat bird fish"),
      (3L, "dog fish bird frog owl pig hen cow fox elk"),
      (4L, "fish bird frog")).toDF("doc_id", "text")
    val path = graft.util.TempDirs.create("bm25-del-spec") + "/idx"
    Rank.writeInvertedIndex(docs, "doc_id", "text", path, nBuckets = 8)
    Rank.deleteFromInvertedIndex(spark, path, Seq(2L))
    val got = Rank.bm25IndexedTopK(spark, path,
      terms = Seq("cat", "fish"), k = 10, nBuckets = 8).collect().toSeq
    val fresh = graft.util.TempDirs.create("bm25-del-fresh") + "/idx"
    Rank.writeInvertedIndex(docs.filter($"doc_id" =!= 2L), "doc_id", "text",
      fresh, nBuckets = 8)
    val want = Rank.bm25IndexedTopK(spark, fresh,
      terms = Seq("cat", "fish"), k = 10, nBuckets = 8).collect().toSeq
    assert(got == want, s"deleted $got vs fresh $want")
    val st = graft.util.Sidecars.read(spark, path, "stats")
      .select("n_docs", "sum_dl").as[(Long, Long)].head()
    assert(st == ((3L, 3L + 10L + 3L)))
    intercept[IllegalArgumentException](
      Rank.deleteFromInvertedIndex(spark, path, Seq(99L)))
  }

  test("BM25 compact: rewrites only tombstoned buckets, file count " +
      "drops, tombstones vanish, scores unchanged") {
    val docs = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) s"cat w$i" else s"dog w$i")).toDF("doc_id", "text")
    val path = graft.util.TempDirs.create("bm25-cmp-spec") + "/idx"
    // build + append so tombstoned buckets hold MULTIPLE files — the
    // compaction coalesces them, which is the file-count win under test
    Rank.writeInvertedIndex(docs.filter($"doc_id" <= 20L),
      "doc_id", "text", path, nBuckets = 8)
    Rank.appendInvertedIndex(spark, docs.filter($"doc_id" > 20L),
      "doc_id", "text", path, nBuckets = 8)
    Rank.deleteFromInvertedIndex(spark, path, (1L to 10L).toSeq)
    val before = Rank.bm25IndexedTopK(spark, path,
      terms = Seq("cat", "dog"), k = 40, nBuckets = 8).collect().toSeq
    def parquetFiles(p: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(p))
    }
    val filesBefore = parquetFiles(path + "/postings")
    // untouched-bucket preservation: record the files of buckets that
    // hold no tombstoned postings — compaction must not rewrite them
    val touched = spark.read.parquet(path + "/postings")
      .filter($"doc_id" <= 10L).select($"bucket").distinct()
      .as[Int].collect().toSet
    val untouchedFiles = filesBefore.filterNot(f =>
      touched.exists(b => f.getPath.contains(s"bucket=$b")))
      .map(f => (f.getPath, f.lastModified)).sorted
    Rank.compactInvertedIndex(spark, path)
    assert(!graft.util.Sidecars.exists(spark, path, "tombstones"))
    val filesAfter = parquetFiles(path + "/postings")
    assert(filesAfter.size < filesBefore.size,
      s"compaction must drop files: ${filesBefore.size} -> ${filesAfter.size}")
    val untouchedAfter = filesAfter.filterNot(f =>
      touched.exists(b => f.getPath.contains(s"bucket=$b")))
      .map(f => (f.getPath, f.lastModified)).sorted
    assert(untouchedAfter == untouchedFiles,
      "compaction must leave untombstoned buckets' files byte-untouched")
    assert(spark.read.parquet(path + "/postings")
      .filter($"doc_id" <= 10L).count() == 0)
    val after = Rank.bm25IndexedTopK(spark, path,
      terms = Seq("cat", "dog"), k = 40, nBuckets = 8).collect().toSeq
    assert(after == before, "compaction moved a score")
  }

  test("BM25 out-of-order append: ids below/between indexed ones are " +
      "accepted and build+append == from-scratch build") {
    val docs = Seq(
      (1L, "cat dog bird"),
      (2L, "cat cat cat cat bird fish"),
      (3L, "dog fish bird frog owl pig hen cow fox elk"),
      (4L, "fish bird frog")).toDF("doc_id", "text")
    val incr = graft.util.TempDirs.create("bm25-ooo-spec") + "/idx"
    // build on the HIGH ids, append the LOW/interleaved ones — the order
    // a max-id watermark would refuse; exact doc-map disjointness admits it
    Rank.writeInvertedIndex(docs.filter($"doc_id" % 2 === 0),
      "doc_id", "text", incr, nBuckets = 8)
    Rank.appendInvertedIndex(spark, docs.filter($"doc_id" % 2 === 1),
      "doc_id", "text", incr, nBuckets = 8)
    val full = graft.util.TempDirs.create("bm25-ooo-full") + "/idx"
    Rank.writeInvertedIndex(docs, "doc_id", "text", full, nBuckets = 8)
    val got = Rank.bm25IndexedTopK(spark, incr,
      terms = Seq("cat", "fish"), k = 10, nBuckets = 8).collect().toSeq
    val want = Rank.bm25IndexedTopK(spark, full,
      terms = Seq("cat", "fish"), k = 10, nBuckets = 8).collect().toSeq
    assert(got == want, s"ooo $got vs full $want")
  }

  test("BM25 delete guards: re-deleting a tombstoned id is refused " +
      "(stats mass must not subtract twice); re-appending a tombstoned " +
      "id purges its stale postings in place, no compaction needed") {
    val docs = Seq(
      (1L, "cat dog bird"),
      (2L, "cat cat cat cat bird fish"),
      (3L, "dog fish bird frog")).toDF("doc_id", "text")
    val path = graft.util.TempDirs.create("bm25-redel-spec") + "/idx"
    Rank.writeInvertedIndex(docs, "doc_id", "text", path, nBuckets = 8)
    Rank.deleteFromInvertedIndex(spark, path, Seq(2L))
    val st = graft.util.Sidecars.read(spark, path, "stats")
      .select("n_docs", "sum_dl").as[(Long, Long)].head()
    assert(st == ((2L, 3L + 4L)))
    // double delete: refused, sidecar untouched
    intercept[IllegalArgumentException](
      Rank.deleteFromInvertedIndex(spark, path, Seq(2L, 3L)))
    val st2 = graft.util.Sidecars.read(spark, path, "stats")
      .select("n_docs", "sum_dl").as[(Long, Long)].head()
    assert(st2 == st, "refused delete must not move the sidecar")
    // a LIVE id is still refused (would double-count df/tf)
    intercept[IllegalArgumentException](Rank.appendInvertedIndex(spark,
      Seq((1L, "cat again")).toDF("doc_id", "text"), "doc_id", "text",
      path, nBuckets = 8))
    // re-appending the TOMBSTONED id WITHOUT compacting: the append
    // purges its old postings, drops its tombstone + doc-map rows, and
    // lands the new doc — the tombstone table must vanish (id 2 was its
    // only entry) and the result must equal a fresh build
    val rep = Rank.appendInvertedIndex(spark,
      Seq((2L, "cat again")).toDF("doc_id", "text"), "doc_id", "text",
      path, nBuckets = 8)
    assert(rep.nReappended == 1L && rep.nSuspects == 1L, rep.toString)
    assert(!graft.util.Sidecars.exists(spark, path, "tombstones"),
      "re-append of the only tombstoned id must drop the tombstone table")
    val st3 = graft.util.Sidecars.read(spark, path, "stats")
      .select("n_docs", "sum_dl").as[(Long, Long)].head()
    assert(st3 == ((3L, 3L + 4L + 2L)))
    val fresh = graft.util.TempDirs.create("bm25-redel-fresh") + "/idx"
    Rank.writeInvertedIndex(
      docs.filter($"doc_id" =!= 2L)
        .unionByName(Seq((2L, "cat again")).toDF("doc_id", "text")),
      "doc_id", "text", fresh, nBuckets = 8)
    val got = Rank.bm25IndexedTopK(spark, path,
      terms = Seq("cat", "dog"), k = 10, nBuckets = 8).collect().toSeq
    val want = Rank.bm25IndexedTopK(spark, fresh,
      terms = Seq("cat", "dog"), k = 10, nBuckets = 8).collect().toSeq
    assert(got == want, s"delete+reappend $got vs fresh $want")
  }

  test("BM25 append Bloom pre-gate: a disjoint batch skips the exact " +
      "doc-map probe (nSuspects 0); a crashed batch's staged doc-map " +
      "rows make a verbatim retry refuse") {
    val old = (1L to 50L).map(i => (i, s"cat w$i")).toDF("doc_id", "text")
    val path = graft.util.TempDirs.create("bm25-bloom-spec") + "/idx"
    Rank.writeInvertedIndex(old, "doc_id", "text", path, nBuckets = 8)
    // ids far from the indexed range: Bloom-negative with overwhelming
    // probability at 50 inserts / 2^18 bits (this seed is deterministic,
    // so the assert is stable, not flaky)
    val fresh = Seq((1000L, "dog owl"), (1001L, "owl hen"))
      .toDF("doc_id", "text")
    val rep = Rank.appendInvertedIndex(spark, fresh, "doc_id", "text",
      path, nBuckets = 8)
    assert(rep == Rank.AppendReport(2L, 0L, 0L),
      s"disjoint batch must skip the exact probe: $rep")
    // simulate the docs-before-postings crash window: stage a batch's
    // Bloom bits + doc-map rows by hand (the state a real append leaves
    // if it dies before writing postings — Bloom swaps first, then doc
    // map), then run the same append verbatim — the overlap probe must
    // refuse (the retry-refusal contract of the ordering)
    val bloomRows = graft.util.Sidecars.read(spark, path, "bloom").collect()
      .map(r => (r.getAs[Int]("w"), r.getAs[Long]("bits"), r.getAs[Int]("k")))
    val addBits = Bloom.buildBits(Seq(2000L).toDF("doc_id"),
      col("doc_id"), bloomRows.length * 64, bloomRows.head._3)
    bloomRows.map { case (w, b, k) => (w, b | addBits(w), k) }.toSeq
      .toDF("w", "bits", "k").coalesce(1)
      .write.mode("overwrite")
      .parquet(graft.util.Sidecars.path(spark, path, "bloom"))
    Seq((2000L, 2)).toDF("doc_id", "dl")
      .write.mode("append")
      .parquet(graft.util.Sidecars.appendPath(spark, path, "docs"))
    intercept[IllegalArgumentException](Rank.appendInvertedIndex(spark,
      Seq((2000L, "cat dog")).toDF("doc_id", "text"), "doc_id", "text",
      path, nBuckets = 8))
  }

  test("RRF: fused score is sum of 1/(c+rank), missing list = 0, union kept") {
    val lex = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("doc_id", "rank")
    val vec = Seq((11L, 1), (13L, 2)).toDF("doc_id", "rank")
    val out = Rank.rrfFuse(Seq("lex" -> lex, "vec" -> vec), "doc_id",
      c = 60, k = 10).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L))
    // doc 11 in both lists: 1/62 + 1/61
    assert(out(11L) == ((Some(2), Some(1), 1.0 / 62 + 1.0 / 61)))
    // doc 10 lex-only: vec rank NULL, contributes 0
    assert(out(10L) == ((Some(1), None, 1.0 / 61)))
    assert(out(13L) == ((None, Some(2), 1.0 / 62)))
    // ranking: 11 (both lists) first; 13 (1/62) above 12 (1/63)
    val order = Rank.rrfFuse(Seq("lex" -> lex, "vec" -> vec), "doc_id",
      c = 60, k = 10).collect().map(_.getLong(0)).toSeq
    assert(order == Seq(11L, 10L, 13L, 12L))
  }

  test("X1: fallback classifier keeps docs the LLM says have the section") {
    val docs = Seq(
      (1L, "x " * 150 + "Background of the Merger narrative follows here."),
      (2L, "y " * 150 + "entirely unrelated filler content with no header"),
      (3L, "too short")) // below the prompt gate
      .toDF("main_index", "content")
    val kept = Clients.classifyHasSection(spark, docs)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L))
  }
}
