package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Sidecars

/** Persisted MinHash BAND-BUCKET index — the near-dup miner's state at
  * rest, completing the index-maintenance matrix (IVF/LSH/PQ/SQ8 for
  * vectors, the BM25 inverted index for terms) for the dedup family.
  *
  * A production dedup pipeline does not re-signature 100 TB per run: the
  * (doc_id, band, bucket) table IS the index — `numBands` 8-byte derived
  * keys per document (~64 B/doc at the default 4-band geometry, i.e. a
  * sub-TB index for a 10^10-doc corpus), purely additive under ingest.
  * Mining near-dup pairs from the persisted buckets replays exactly the
  * at-once lineage of [[Dedup.minhashDedupPairs]] — bounded-bucket
  * candidate generation, then exact shingle-Jaccard verification against
  * the source corpus for candidates only — so build(A) + append(B)
  * followed by [[pairs]] is bit-identical to mining A ∪ B from scratch,
  * and the same DuckDB twin (`HashOracleSql.d3Sql`) gates both paths.
  *
  * Layout under `path`:
  *   - `buckets/`    (doc_id, band, bucket) — main table, append-only
  *                   between compactions (new batches land as new files)
  *   - `meta/`       one-row geometry sidecar (k, num_hashes, num_bands)
  *                   — query-time signatures must never desynchronize
  *                   from the build's, the Bloom-`k` convention of
  *                   [[Rank]]'s inverted index
  *   - `docs/`       doc-map sidecar, one (doc_id) row per indexed doc —
  *                   the append-disjointness probe (re-appending a live
  *                   id would duplicate its bucket rows and every pair
  *                   it participates in)
  *   - `tombstones/` (doc_id) rows of deleted docs (absent until the
  *                   first delete); queries anti-join it BEFORE the
  *                   bucket-size cap so the cap reflects LIVE membership
  *
  * Mutation discipline (the [[Sidecars]] single-writer convention):
  * every sidecar commits via write-to-temp + rename swap; the append
  * path lands doc-map rows BEFORE bucket rows so a verbatim retry after
  * a crash in between is refused by the overlap probe instead of
  * silently double-inserting buckets.
  *
  * Scale shape: the only shuffles in [[pairs]] are the (band, bucket)
  * group-by over 16-byte rows and the final pair distinct; candidate
  * volume is capped per bucket (`maxBucketSize` ≤ 64 ⇒ ≤ 2016 pairs per
  * bucket); TEXT is joined only for surviving candidates. Compaction
  * rewrites the whole bucket table — acceptable because the index is
  * ~numBands longs per doc, orders of magnitude smaller than the corpus
  * it mines.
  */
object BandIndex {

  private def fs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, p: String): Boolean =
    fs(spark, p).exists(new org.apache.hadoop.fs.Path(p))

  /** Bucket rows (doc_id, band, bucket) for a doc batch at the given
    * geometry — the one lineage shared by build and append. */
  private def bucketRows(docs: DataFrame, id: String, text: String,
      k: Int, numHashes: Int, numBands: Int): DataFrame =
    Dedup.lshBuckets(
      Dedup.minhashSignatures(docs, id, text, k, numHashes), id,
      numHashes, numBands)
      .select(col(id).as("doc_id"), col("band"), col("bucket"))

  /** Build the index from scratch at `path` (overwrites any previous
    * index). Docs whose normalized text is shorter than the shingle
    * width are the caller's concern (the d3 gates exclude them — an
    * empty shingle set has no meaningful MinHash). */
  def build(docs: DataFrame, id: String, text: String, path: String,
      k: Int = 5, numHashes: Int = Dedup.NumHashes,
      numBands: Int = Dedup.NumBands): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val f = fs(spark, path)
    f.delete(new org.apache.hadoop.fs.Path(path), true)
    // fresh store: claim epoch 1 before the raw bucket write, then
    // thread the epoch through the sidecar swaps — a concurrent writer
    // on the same path fails at its first commit (writer fencing)
    var e = Sidecars.claim(spark, path, Some(0L))
    bucketRows(docs, id, text, k, numHashes, numBands)
      .write.mode("overwrite").parquet(path + "/buckets")
    e = Sidecars.swap(spark, path, "meta",
      Seq((k, numHashes, numBands)).toDF("k", "num_hashes", "num_bands"),
      single = true, expectedEpoch = Some(e))
    // docs sidecar last = build's commit point (absent docs/ = no index)
    Sidecars.swap(spark, path, "docs",
      docs.select(col(id).as("doc_id")).distinct(), single = true,
      expectedEpoch = Some(e))
  }

  private def meta(spark: SparkSession, path: String): (Int, Int, Int) = {
    val r = Sidecars.read(spark, path, "meta").head()
    (r.getAs[Int]("k"), r.getAs[Int]("num_hashes"), r.getAs[Int]("num_bands"))
  }

  /** APPEND a doc batch without a rebuild: bucket rows are purely
    * additive (new parquet files picked up by discovery), so
    * build(old) + append(new) mines identically to build(old ∪ new).
    *
    * Refuses batches overlapping LIVE ids in the doc map (re-inserting
    * a live id would double every pair it participates in). TOMBSTONED
    * batch ids are re-appendable without waiting for [[compact]] (the
    * [[Rank.appendInvertedIndex]] purge-on-append contract): their
    * stale bucket rows are purged first, their tombstone rows drop,
    * and the new rows land — delete → re-append → mine is
    * bit-identical to a fresh build over the final corpus. All probes
    * broadcast the BATCH side — an ingest batch is bounded, the doc
    * map is corpus-sized.
    *
    * Crash discipline: purge converges under rerun (purging already-
    * purged ids is a no-op); the tombstone swap then doc-map swap land
    * BEFORE bucket rows, so a crash in the final window leaves the ids
    * claimed-but-unbucketed and the verbatim retry is REFUSED by the
    * live-overlap probe (clean the staged sidecar rows or rebuild) —
    * never a silent double-insert. */
  def append(batch: DataFrame, id: String, text: String,
      path: String): Unit = {
    val spark = batch.sparkSession
    // transaction fence: the epoch is read BEFORE any store read and
    // threaded through every mutation, so of two overlapping appends
    // (or an append racing a delete/compact) exactly one wins — the
    // loser fails at its FIRST fenced commit, before touching the store
    var e = Sidecars.fenceEpoch(spark, path)
    val (k, numHashes, numBands) = meta(spark, path)
    val batchIds = batch.select(col(id).as("doc_id")).distinct()
    val docMap = Sidecars.read(spark, path, "docs")
    val tombs =
      if (Sidecars.exists(spark, path, "tombstones"))
        Some(Sidecars.read(spark, path, "tombstones"))
      else None
    val live = tombs.fold(docMap)(t =>
      docMap.join(t, Seq("doc_id"), "left_anti"))
    val dup = live.join(broadcast(batchIds), "doc_id").limit(1).count()
    require(dup == 0,
      s"append batch overlaps live ids in ${path} doc map — re-appending " +
        "a live id would duplicate its bucket rows")
    tombs.foreach { t =>
      val reapp = t.join(broadcast(batchIds), "doc_id")
        .select(col("doc_id")).localCheckpoint()
      if (reapp.limit(1).count() > 0) {
        // purge the dead rows NOW (their tombstones are about to drop,
        // so queries would otherwise resurrect the stale buckets)
        e = Sidecars.swapStaged(spark, path, "buckets", Some(e)) { next =>
          Sidecars.read(spark, path, "buckets")
            .join(broadcast(reapp), Seq("doc_id"), "left_anti")
            .write.parquet(next)
        }
        val remaining = t.join(broadcast(reapp), Seq("doc_id"), "left_anti")
          .localCheckpoint()
        if (remaining.limit(1).count() > 0)
          e = Sidecars.swap(spark, path, "tombstones", remaining,
            single = true, expectedEpoch = Some(e))
        else {
          e = Sidecars.claim(spark, path, Some(e)) // fence the raw delete
          Sidecars.drop(spark, path, "tombstones")
        }
        remaining.unpersist()
      }
      reapp.unpersist()
    }
    // doc map BEFORE buckets: see crash discipline above
    e = Sidecars.swap(spark, path, "docs",
      docMap.unionByName(batchIds).distinct(), single = true,
      expectedEpoch = Some(e))
    Sidecars.claim(spark, path, Some(e)) // fence the raw additive append
    bucketRows(batch, id, text, k, numHashes, numBands)
      .write.mode("append")
      .parquet(Sidecars.appendPath(spark, path, "buckets"))
  }

  /** DELETE doc ids via the tombstone sidecar — no bucket rewrite; the
    * mining query anti-joins tombstones before the bucket-size cap, so
    * a delete immediately changes which buckets are candidate-eligible
    * (a bucket that only exceeded `maxBucketSize` because of deleted
    * members becomes live again, exactly as a fresh build would see
    * it). Re-deleting a tombstoned id is refused (the [[Rank]]
    * convention — silent re-accept would mask double-fire bugs in the
    * caller's retention pipeline). */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    delete(spark, path, ids.toDF("doc_id"))
  }

  /** DataFrame form — the delete set can derive from a corpus predicate
    * without ever collecting ids to the driver. The single non-null
    * column is taken as the doc id. */
  def delete(spark: SparkSession, path: String, idsIn: DataFrame): Unit = {
    import spark.implicits._
    val e = Sidecars.fenceEpoch(spark, path) // before any store read
    val batch = idsIn
      .select(col(idsIn.columns.head).cast("long").as("doc_id")).distinct()
    val docMap = Sidecars.read(spark, path, "docs")
    val nBatch = batch.count()
    val known = docMap.join(broadcast(batch), "doc_id").count()
    require(known == nBatch,
      s"delete batch contains ids not in ${path} doc map")
    val prior =
      if (Sidecars.exists(spark, path, "tombstones"))
        Sidecars.read(spark, path, "tombstones")
      else spark.emptyDataset[Long].toDF("doc_id")
    require(prior.join(broadcast(batch), "doc_id").limit(1).count() == 0,
      s"delete batch contains already-tombstoned ids for ${path}")
    Sidecars.swap(spark, path, "tombstones",
      prior.unionByName(batch), single = true, expectedEpoch = Some(e))
  }

  /** COMPACT: physically drop tombstoned docs' bucket rows and doc-map
    * rows, then clear the tombstone set. Each step is an atomic swap
    * and the sequence converges under crash-then-rerun: buckets first
    * (a re-run finds no dead rows and rewrites a no-op), doc map next,
    * tombstones cleared LAST — until then every query keeps
    * anti-joining the (now redundant) tombstones, so no intermediate
    * state can resurrect a deleted doc. */
  def compact(spark: SparkSession, path: String): Unit = {
    if (!Sidecars.exists(spark, path, "tombstones")) return
    var e = Sidecars.fenceEpoch(spark, path) // before any store read
    val dead = Sidecars.read(spark, path, "tombstones")
    e = Sidecars.swapStaged(spark, path, "buckets", Some(e)) { next =>
      Sidecars.read(spark, path, "buckets")
        .join(broadcast(dead), Seq("doc_id"), "left_anti")
        .write.parquet(next)
    }
    e = Sidecars.swap(spark, path, "docs",
      Sidecars.read(spark, path, "docs")
        .join(broadcast(dead), Seq("doc_id"), "left_anti"),
      single = true, expectedEpoch = Some(e))
    Sidecars.claim(spark, path, Some(e)) // fence the raw delete
    Sidecars.drop(spark, path, "tombstones")
  }

  /** Mine the verified near-dup pair set (id_1, id_2, jaccard) from the
    * persisted index: live bucket rows (tombstones anti-joined FIRST,
    * so the `maxBucketSize` cap sees live membership — the cap an
    * at-once build over the surviving corpus would compute) →
    * bounded-bucket candidate pairs → exact shingle-Jaccard verify
    * against `corpus` text, candidates only. `corpus` supplies the text
    * of indexed docs (the index stores derived keys, not content — the
    * honest production split); rows of `corpus` not in the index are
    * simply never candidates. */
  def pairs(spark: SparkSession, path: String, corpus: DataFrame,
      id: String, text: String, minJaccard: Double = 0.2,
      maxBucketSize: Int = 64): DataFrame = {
    import org.apache.spark.sql.graft.{ShingleJaccard, internal}
    val (k, _, _) = meta(spark, path)
    val raw = Sidecars.read(spark, path, "buckets")
    val live =
      if (Sidecars.exists(spark, path, "tombstones"))
        raw.join(broadcast(Sidecars.read(spark, path, "tombstones")),
          Seq("doc_id"), "left_anti")
      else raw
    val cands = live.groupBy(col("band"), col("bucket"))
      .agg(Dedup.boundedIds("doc_id", maxBucketSize).as("__ids"))
      .filter(col("__ids").isNotNull && size(col("__ids")) >= 2)
      .select(explode(Dedup.sortedPairs(col("__ids"))).as("__p"))
      .select(col("__p.id_1").as("id_1"), col("__p.id_2").as("id_2"))
      .filter(col("id_1") < col("id_2"))
      // pinned width BELOW the distinct so the confirm kernel's stage
      // can't AQE-coalesce to one task — see Dedup.spreadPairs
      .transform(Dedup.spreadPairs)
      .distinct()
    val norm = corpus.select(col(id), Dedup.normalized(col(text)).as("__t"))
    cands
      .join(norm.select(col(id).as("id_1"), col("__t").as("__t1")), Seq("id_1"))
      .join(norm.select(col(id).as("id_2"), col("__t").as("__t2")), Seq("id_2"))
      .withColumn("jaccard", internal.column(ShingleJaccard(
        internal.expression(col("__t1")), internal.expression(col("__t2")), k)))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_1"), col("id_2"), col("jaccard"))
  }
}
