package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted MinHash band-bucket index: maintained-index mining must be
  * bit-identical to the at-once lineage over the equivalent corpus, and
  * the maintenance refusals must hold. */
class BandIndexSpec extends SparkSpec {
  import spark.implicits._

  // Clustered corpus: two near-dup families plus singletons; texts long
  // enough that 5-char shingling has signal.
  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
    (3L, "the quick brown fox leaps over the lazy dog near the river bank"),
    (4L, "entirely unrelated text about distributed query engine design"),
    (5L, "streaming watermarks bound state for late arriving event data"),
    (6L, "streaming watermarks bound state for late arriving event rows"),
    (7L, "a completely different document mentioning nothing shared at all")
  ).toDF("doc_id", "text")

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"id_1", $"id_2")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSeq

  test("build+mine equals the at-once minhashDedupPairs lineage") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bandidx").toString
    BandIndex.build(corpus, "doc_id", "text", dir + "/idx")
    val mined = pairsOf(BandIndex.pairs(spark, dir + "/idx", corpus,
      "doc_id", "text"))
    val atOnce = pairsOf(Dedup.minhashDedupPairs(corpus, "doc_id", "text",
      k = 5, minJaccard = 0.2))
    assert(mined == atOnce && mined.nonEmpty)
  }

  test("append is additive: build(A)+append(B) mines as build(A∪B)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bandidx").toString
    BandIndex.build(corpus.filter($"doc_id" <= 3), "doc_id", "text",
      dir + "/idx")
    BandIndex.append(corpus.filter($"doc_id" > 3), "doc_id", "text",
      dir + "/idx")
    val mined = pairsOf(BandIndex.pairs(spark, dir + "/idx", corpus,
      "doc_id", "text"))
    val atOnce = pairsOf(Dedup.minhashDedupPairs(corpus, "doc_id", "text",
      k = 5, minJaccard = 0.2))
    assert(mined == atOnce)
    // doc map rolled forward to all ids
    assert(graft.util.Sidecars.read(spark, dir + "/idx", "docs").count() == 7)
  }

  test("append refuses live-id overlap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bandidx").toString
    BandIndex.build(corpus, "doc_id", "text", dir + "/idx")
    intercept[IllegalArgumentException] {
      BandIndex.append(corpus.filter($"doc_id" === 2), "doc_id", "text",
        dir + "/idx")
    }
  }

  test("re-append after delete purges stale rows, no compaction needed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bandidx").toString
    val idx = dir + "/idx"
    BandIndex.build(corpus, "doc_id", "text", idx)
    BandIndex.delete(spark, idx, Seq(2L, 6L))
    // re-append id 2 with CHANGED text — the purge must drop the stale
    // bucket rows or the old content would still mine
    val changed = Seq((2L,
      "totally rewritten second document sharing nothing with family one"))
      .toDF("doc_id", "text")
    BandIndex.append(changed, "doc_id", "text", idx)
    // 6 stays tombstoned; 2 is live with the new content
    val finalCorpus = corpus.filter($"doc_id" =!= 2L).unionByName(changed)
    val mined = pairsOf(BandIndex.pairs(spark, idx,
      finalCorpus.filter($"doc_id" =!= 6L), "doc_id", "text"))
    val atOnce = pairsOf(Dedup.minhashDedupPairs(
      finalCorpus.filter($"doc_id" =!= 6L), "doc_id", "text",
      k = 5, minJaccard = 0.2))
    assert(mined == atOnce)
    assert(mined.forall(p => p._1 != 2L && p._2 != 2L)) // new text: no dups
    // old (1,2)/(2,3) pairs gone, (1,3) family pair remains
    assert(mined.exists(p => p._1 == 1L && p._2 == 3L))
    // tombstone sidecar still holds 6 only
    assert(graft.util.Sidecars.read(spark, idx, "tombstones").collect()
      .map(_.getLong(0)).toSeq == Seq(6L))
    // a live re-append is still refused
    intercept[IllegalArgumentException] {
      BandIndex.append(changed, "doc_id", "text", idx)
    }
  }

  test("delete excludes pairs and recomputes the cap on live membership") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bandidx").toString
    BandIndex.build(corpus, "doc_id", "text", dir + "/idx")
    BandIndex.delete(spark, dir + "/idx", Seq(2L, 6L))
    val mined = pairsOf(BandIndex.pairs(spark, dir + "/idx", corpus,
      "doc_id", "text"))
    val atOnce = pairsOf(Dedup.minhashDedupPairs(
      corpus.filter(!$"doc_id".isin(2L, 6L)), "doc_id", "text",
      k = 5, minJaccard = 0.2))
    assert(mined == atOnce)
    assert(mined.forall(p => p._1 != 2L && p._2 != 2L))
  }

  test("delete refuses unknown and already-tombstoned ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bandidx").toString
    BandIndex.build(corpus, "doc_id", "text", dir + "/idx")
    intercept[IllegalArgumentException] {
      BandIndex.delete(spark, dir + "/idx", Seq(99L))
    }
    BandIndex.delete(spark, dir + "/idx", Seq(3L))
    intercept[IllegalArgumentException] {
      BandIndex.delete(spark, dir + "/idx", Seq(3L))
    }
  }

  test("compact drops dead rows physically, clears tombstones, same pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bandidx").toString
    val idx = dir + "/idx"
    BandIndex.build(corpus, "doc_id", "text", idx)
    val before = graft.util.Sidecars.read(spark, idx, "buckets").count()
    BandIndex.delete(spark, idx, Seq(2L, 6L))
    val preCompact = pairsOf(BandIndex.pairs(spark, idx, corpus,
      "doc_id", "text"))
    BandIndex.compact(spark, idx)
    assert(graft.util.Sidecars.read(spark, idx, "buckets").count() < before)
    assert(graft.util.Sidecars.read(spark, idx, "buckets")
      .filter($"doc_id".isin(2L, 6L)).count() == 0)
    assert(!graft.util.Sidecars.exists(spark, idx, "tombstones"))
    assert(graft.util.Sidecars.read(spark, idx, "docs").count() == 5)
    val postCompact = pairsOf(BandIndex.pairs(spark, idx, corpus,
      "doc_id", "text"))
    assert(postCompact == preCompact)
    // tombstoned id is re-appendable after compaction
    BandIndex.append(corpus.filter($"doc_id" === 2), "doc_id", "text", idx)
    val reMined = pairsOf(BandIndex.pairs(spark, idx,
      corpus.filter($"doc_id" =!= 6), "doc_id", "text"))
    val atOnce = pairsOf(Dedup.minhashDedupPairs(
      corpus.filter($"doc_id" =!= 6), "doc_id", "text",
      k = 5, minJaccard = 0.2))
    assert(reMined == atOnce)
  }

  test("maintenance transactions are writer-fenced: a mutation computed " +
      "against a stale store fails at its first commit, store untorn") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bandidx").toString
    val idx = dir + "/idx"
    BandIndex.build(corpus.filter($"doc_id" <= 5), "doc_id", "text", idx)
    // W1 (a delete) reads its fence epoch, then W2 (an append) lands
    // first; W1's commit — the tombstones swap it would issue with its
    // stale epoch — must fail at the fence, before any mutation of W1
    // touches the store
    val staleEpoch = graft.util.Sidecars.fenceEpoch(spark, idx)
    BandIndex.append(corpus.filter($"doc_id" === 6), "doc_id", "text", idx)
    val loser = intercept[IllegalStateException] {
      graft.util.Sidecars.swap(spark, idx, "tombstones",
        Seq(5L).toDF("doc_id"), single = true,
        expectedEpoch = Some(staleEpoch))
    }
    assert(loser.getMessage.contains("writer fence"))
    // the failed delete left nothing behind: no tombstones sidecar
    assert(!graft.util.Sidecars.exists(spark, idx, "tombstones"))
    // a FRESH delete (re-reading the store) succeeds, and the store
    // mines exactly as an at-once build over the surviving corpus
    BandIndex.delete(spark, idx, Seq(5L))
    val mined = pairsOf(BandIndex.pairs(spark, idx,
      corpus.filter($"doc_id" <= 6), "doc_id", "text"))
    val want = pairsOf(Dedup.minhashDedupPairs(
      corpus.filter($"doc_id" <= 6 && $"doc_id" =!= 5), "doc_id", "text",
      k = 5, minJaccard = 0.2))
    assert(mined == want)
  }
}
