package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T8/T9/O3: embedding-cosine + rerank hybrid scoring (SURVEY.md §2.7).
  * Cosine is pure Catalyst (`zip_with` + `aggregate` higher-order functions
  * — no UDF), so it runs inside codegen and scales as a map-side column op.
  */
object Rank {
  /** Dot product of two float-array columns, accumulated in double in index
    * order (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm of a float-array column. */
  def l2norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity with zero-vector guard. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2norm(a) * l2norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** T9 hybrid score: 0.4*cosine + 0.6*rerank
    * (src/dependencies/ChunkProcessor.py:319-320). */
  def hybrid(cos: Column, rerank: Column): Column =
    cos * 0.4 + rerank * 0.6

  /** Deterministic stand-in for the cross-encoder score (already sigmoid'd
    * to [0,1] like the reference applies): fraction of distinct query terms
    * present in the chunk — a linear-time columnar op (`fuzz_partial_ratio`
    * is quadratic in the query and reserved for short entity strings). A
    * pluggable external scorer replaces this via graft.io.Reranker. */
  def pseudoRerank(query: Column, chunk: Column): Column = {
    val qTerms = array_distinct(split(lower(query), "\\s+"))
    val hits = size(filter(qTerms, t => contains(lower(chunk), t)))
    val sim = hits.cast("double") / greatest(size(qTerms), lit(1)).cast("double")
    lit(1.0) / (lit(1.0) + exp(-(sim * 8.0 - 4.0)))
  }

  /** Okapi BM25 scoring of a fixed query-term list over a corpus — the
    * lexical-retrieval complement of the cosine/hybrid path (T8/T9): the
    * standard tf-saturation x document-length normalization x idf formula
    * (k1 = 1.2, b = 0.75; idf = ln((N - df + 0.5)/(df + 0.5) + 1), the
    * Lucene-style always-positive variant). `text` must be single-space
    * tokenized (the corpus normal form); `terms` are matched as whole
    * words.
    *
    * Scale shape: ONE corpus scan computes per-doc tf vector + length as
    * map-side array folds (no explode — the term list is a few literals);
    * a second aggregate reduces (N, sum dl, per-term df) to a single
    * broadcast row; the score is then a pure map-stage formula. No
    * shuffle ever carries text; top-k is TakeOrderedAndProject, not a
    * global sort. The returned `score` is rounded to 6 dp: Spark's ln is
    * StrictMath.log and an independent engine's libm can differ in the
    * last ulp (~1e-16 relative — far inside the rounding margin), so the
    * rounded value is the cross-engine-stable contract.
    *
    * Returns the `k` best (id, dl, tf_<term>..., score) rows by
    * (score desc, id). */
  def bm25TopK(docs: DataFrame, id: String, text: String,
      terms: Seq[String], k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one term")
    val words = split(col(text), " ")
    val tfCols = terms.map(t =>
      size(filter(words, w => w === t)).as(s"tf_$t"))
    val profiled = docs.select(
      col(id) +: size(words).as("dl") +: tfCols: _*)
    val aggCols = count(lit(1)).as("__n") +:
      sum(col("dl").cast("long")).as("__sumdl") +:
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L))
        .as(s"__df_$t"))
    val stats = profiled.agg(aggCols.head, aggCols.tail: _*)
    val n = col("__n").cast("double")
    val avgdl = col("__sumdl").cast("double") / n
    def termScore(t: String): Column = {
      val tf = col(s"tf_$t").cast("double")
      val df = col(s"__df_$t").cast("double")
      val idf = log((n - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
      idf * (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
    }
    profiled.crossJoin(broadcast(stats))
      .filter(terms.map(t => col(s"tf_$t") > 0).reduceLeft(_ || _))
      .withColumn("score",
        round(terms.map(termScore).reduceLeft(_ + _), 6))
      .select(col(id) +: col("dl") +:
        terms.map(t => col(s"tf_$t")) :+ col("score"): _*)
      .orderBy(col("score").desc, col(id))
      .limit(k)
  }

  /** Doc-id Bloom sidecar geometry: 2^18 bits (4096 longs, 32 KiB at
    * rest and on the driver) x 5 hashes — ~1 % false positives at 40 k
    * indexed docs, and a design constant independent of corpus size
    * (the [[graft.ops.Bloom]] boundedness class). The k actually used
    * by an index travels IN its sidecar rows, so a future constant
    * change cannot desynchronize probe from build. */
  private val BloomBits = 1 << 18
  private val BloomK = 5

  /** What [[appendInvertedIndex]] did — lets specs assert the Bloom
    * pre-gate skipped the exact doc-map probe on a provably-disjoint
    * batch (`nSuspects` == 0) and that re-appends were purged. */
  final case class AppendReport(nBatch: Long, nSuspects: Long,
      nReappended: Long)

  /** Persist an INVERTED INDEX at rest — the lexical analogue of the
    * persisted ANN indexes (Similarity.writeIvfIndex/writeLshIndex):
    * postings `(term, doc_id, dl, tf)` written `partitionBy(bucket)`
    * where bucket = xxhash64(term) mod `nBuckets`, plus a one-row corpus
    * stats sidecar (N, sum dl), a DOC MAP sidecar `(doc_id, dl)` — one
    * row per indexed document — and a doc-id BLOOM sidecar. At scale a
    * query reads ONLY its terms' buckets — ~|queryTerms|/nBuckets of
    * the index — and never the corpus text; the doc map is what lets
    * appends check doc-id disjointness EXACTLY and deletes recover
    * length mass WITHOUT a postings scan (it is O(n_docs) rows vs the
    * postings' O(n_docs x distinct terms), and the exact membership
    * probes broadcast the batch side). The Bloom is the pre-gate that
    * lets a mostly-novel append SKIP even the doc-map probe: a batch
    * with zero Bloom-positive ids is provably disjoint (no false
    * negatives), so the exact join runs only over the Bloom-positive
    * suspects. INVARIANT: the Bloom is a SUPERSET of the doc-map ids
    * at every commit point (it is swapped BEFORE doc-map rows land on
    * append) — a Bloom that lagged the doc map could false-negative a
    * crashed batch's ids and let a verbatim retry double-append. The
    * build is the standard explode -> map-side-combined (term, doc,
    * tf) aggregation; `text` must be single-space tokenized (the
    * corpus normal form, same contract as [[bm25TopK]]). */
  def writeInvertedIndex(docs: DataFrame, id: String, text: String,
      path: String, nBuckets: Int = 64): Unit = {
    val words = split(col(text), " ")
    val profiled = docs.select(col(id).as("doc_id"), words.as("__ws"))
      .withColumn("dl", size(col("__ws")))
    // sidecar carries the bucket GEOMETRY (asserted on append — an
    // append with a different nBuckets would silently split terms across
    // inconsistent bucket numbering that query pruning then misses) and
    // the max doc_id (informational watermark; disjointness is checked
    // exactly against the doc map, so out-of-order corpora can append)
    profiled.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl").cast("long")), lit(0L)).as("sum_dl"),
        lit(nBuckets).as("n_buckets"),
        coalesce(max(col("doc_id").cast("long")), lit(-1L)).as("max_doc_id"))
      .coalesce(1).write.mode("overwrite").parquet(path + "/stats")
    profiled.select(col("doc_id").cast("long").as("doc_id"), col("dl"))
      .write.mode("overwrite").parquet(path + "/docs")
    val spark = docs.sparkSession
    writeBloomSidecar(spark, path, Bloom.buildBits(
      graft.util.Sidecars.read(spark, path, "docs"), col("doc_id"), BloomBits, BloomK),
      BloomK)
    profiled.select(col("doc_id"), col("dl"), explode(col("__ws")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket",
        pmod(xxhash64(col("term")), lit(nBuckets)).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path + "/postings")
  }

  /** Replace a sidecar directory via write-to-temp + rename swap, so a
    * crash mid-write can never tear it (the reader sees the complete
    * old version or the complete new one, never a half-written mix).
    * The STATS swap is additionally the COMMIT POINT of every index
    * mutation (append / delete) in the SINGLE-WRITER,
    * NO-CONCURRENT-READER sense: postings / doc-map / tombstone rows
    * are written first and the stats sidecar lands last, so a crash
    * mid-mutation leaves the OLD stats intact — the mutation visibly
    * did not commit (stats unchanged) rather than being silently
    * half-counted, and the staged rows must be cleaned (or the store
    * rebuilt) before retrying, because re-running the mutation
    * verbatim would stage its rows a second time (the append path
    * lands doc-map rows before postings precisely so a verbatim retry
    * is REFUSED by the overlap probe instead of silently
    * double-counting). It is NOT a snapshot-isolation guarantee: a
    * reader racing the mutation can see appended postings or
    * tombstones before the matching stats, and the swap itself has a
    * two-rename window where the sidecar is briefly absent. Serialize
    * readers against mutations (the maintenance discipline every gate
    * and spec follows). */
  private def swapSidecar(spark: org.apache.spark.sql.SparkSession,
      path: String, name: String, rows: DataFrame,
      single: Boolean = false,
      expectedEpoch: Option[Long] = None): Long =
    graft.util.Sidecars.swap(spark, path, name, rows, single, expectedEpoch)

  private def swapStats(spark: org.apache.spark.sql.SparkSession,
      path: String, row: DataFrame,
      expectedEpoch: Option[Long] = None): Long =
    swapSidecar(spark, path, "stats", row, single = true, expectedEpoch)

  /** Bloom sidecar at rest: one (w, bits) row per 64-bit word — dense,
    * so mBits re-derives from the row count — plus the hash count k in
    * every row (geometry must never desynchronize from the build). */
  private def writeBloomSidecar(spark: org.apache.spark.sql.SparkSession,
      path: String, bits: Array[Long], k: Int,
      expectedEpoch: Option[Long] = None): Long = {
    import spark.implicits._
    swapSidecar(spark, path, "bloom",
      bits.toSeq.zipWithIndex.map { case (b, w) => (w, b, k) }
        .toDF("w", "bits", "k"),
      single = true, expectedEpoch = expectedEpoch)
  }

  /** Read the Bloom sidecar back as (bitset, k); None for an index
    * persisted before the sidecar existed (probes then stay exact). */
  private def readBloomSidecar(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[(Array[Long], Int)] = {
    val p = graft.util.Sidecars.tryPath(spark, path, "bloom")
    if (p.isEmpty) None
    else {
      val rows = spark.read.parquet(p.get).collect()
      val bits = new Array[Long](rows.length)
      rows.foreach(r => bits(r.getAs[Int]("w")) = r.getAs[Long]("bits"))
      Some((bits, rows.head.getAs[Int]("k")))
    }
  }

  /** Physically remove every posting of the `dead` doc_ids by rewriting
    * ONLY the bucket partitions that contain them (dynamic partition
    * overwrite — untouched buckets keep their files). Shared by
    * [[compactInvertedIndex]] and the re-append path of
    * [[appendInvertedIndex]]. Term-hash partitioning cannot prune a
    * doc-id predicate, so locating the touched buckets is one postings
    * scan — the deferred cost a tombstone delete avoids and a rewrite
    * must pay. The touched-bucket collect is bounded by nBuckets. */
  private def purgePostings(spark: org.apache.spark.sql.SparkSession,
      path: String, dead: DataFrame): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val posts = spark.read.parquet(path + "/postings")
    val touched = posts.join(broadcast(dead), "doc_id")
      .select(col("bucket")).distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    // survivors are localCheckpointed before the overwrite — Spark
    // refuses to overwrite a path it is concurrently reading
    val survivors = posts
      .filter(col("bucket").isInCollection(touched))
      .join(dead, Seq("doc_id"), "left_anti")
      .repartition(col("bucket")) // one output file per rewritten bucket
      .localCheckpoint()
    survivors.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(path + "/postings")
    // a touched bucket whose every posting was dead gets no row in the
    // dynamic overwrite — its stale files must go explicitly
    val alive = survivors.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    touched.filterNot(alive).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(
        path + s"/postings/bucket=$b"), true)
    }
    survivors.unpersist()
  }

  /** APPEND a document batch to a persisted inverted index without a
    * rebuild — the freshness move of [[graft.ops.Similarity.appendIvfIndex]]
    * for the lexical side: postings rows are purely additive (a new
    * doc's (term, doc_id, dl, tf) rows land as new files inside their
    * term-hash bucket partitions via mode(append) + partitionBy, picked
    * up by partition discovery; bucket pruning applies to old and new
    * files alike), and the one-row stats sidecar rolls its totals
    * forward. Because df/N/avgdl re-derive from postings + sidecar at
    * query time, build(old) + append(new) is BIT-IDENTICAL to
    * build(old ∪ new) — the bm25_index_updated gate pins that with the
    * full-corpus oracle.
    *
    * Disjointness probe (re-appending a live id would double-count
    * df/tf silently): the doc-id BLOOM sidecar pre-gates the batch —
    * Bloom false negatives are impossible and the Bloom is maintained
    * as a superset of the doc map, so a batch with ZERO Bloom-positive
    * ids is provably disjoint and the exact probe is SKIPPED entirely
    * (`nSuspects` == 0 in the returned report, the common case for a
    * mostly-novel ingest). Only the Bloom-positive suspects pay the
    * exact doc-map join (suspects broadcast — bounded by the batch).
    *
    * Suspects resolve in two classes: a LIVE id is refused; a
    * TOMBSTONED id (deleted, not yet compacted) is RE-APPENDED — its
    * stale postings are purged from their buckets and its tombstone +
    * doc-map rows drop (atomic sidecar swaps) before the new rows
    * land, so delete -> re-append -> query is bit-identical to a fresh
    * build over the final corpus (its stats mass was already
    * subtracted at delete time; the purge scans postings once, the
    * same deferred cost compaction pays). Crash ordering: the Bloom
    * swaps BEFORE doc-map rows land (superset invariant — see
    * [[writeInvertedIndex]]), doc-map rows land BEFORE postings (a
    * verbatim retry after a crash in that window is REFUSED by the
    * overlap probe instead of silently double-counting postings), and
    * the stats swap is the commit point. */
  def appendInvertedIndex(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, id: String, text: String, path: String,
      nBuckets: Int = 64): AppendReport = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    // transaction fence: epoch read before ANY store read, threaded
    // through every commit — of two overlapping mutations exactly one
    // wins, the other fails at its first commit (Sidecars scaladoc)
    var fenceE = graft.util.Sidecars.fenceEpoch(spark, path)
    val words = split(col(text), " ")
    val profiled = docs.select(col(id).as("doc_id"), words.as("__ws"))
      .withColumn("dl", size(col("__ws")))
      .localCheckpoint()       // materialized before the sidecar rewrite
    // empty-batch-safe: sums aggregate to NULL on zero rows
    val batch = profiled.agg(count(lit(1)).cast("long").as("n"),
      coalesce(sum(col("dl").cast("long")), lit(0L)).as("s"),
      coalesce(max(col("doc_id").cast("long")), lit(-1L)).as("hi"))
      .collect()(0)
    val old = graft.util.Sidecars.read(spark, path, "stats").collect()(0)
    require(old.getAs[Int]("n_buckets") == nBuckets,
      s"append with nBuckets=$nBuckets against an index built with " +
        s"${old.getAs[Int]("n_buckets")} — bucket numbering would diverge")
    val batchIds = profiled.select(col("doc_id").cast("long").as("doc_id"))
    val bloom = readBloomSidecar(spark, path)
    // Bloom pre-gate: only Bloom-positive ids can possibly be in the
    // doc map (no false negatives); an index persisted before the
    // sidecar existed keeps the fully-exact probe
    val suspects = (bloom match {
      case Some((bits, k)) =>
        batchIds.filter(Bloom.mightContain(col("doc_id"), bits, k))
      case None => batchIds
    }).localCheckpoint()
    val nSuspects = suspects.count()
    var nReappend = 0L
    if (nSuspects > 0) {
      val reappend =
        if (graft.util.Sidecars.exists(spark, path, "tombstones"))
          graft.util.Sidecars.read(spark, path, "tombstones")
            .join(broadcast(suspects), Seq("doc_id")).localCheckpoint()
        else spark.emptyDataset[Long].toDF("doc_id")
      nReappend = reappend.count()
      val liveOverlap = graft.util.Sidecars.read(spark, path, "docs")
        .join(broadcast(suspects), Seq("doc_id"))
        .join(reappend, Seq("doc_id"), "left_anti")
        .count()
      require(liveOverlap == 0L,
        s"append batch re-uses $liveOverlap doc_id(s) live in the index")
      if (nReappend > 0) {
        fenceE = graft.util.Sidecars.claim(spark, path, Some(fenceE))
        purgePostings(spark, path, reappend) // fenced by the claim above
        fenceE = swapSidecar(spark, path, "docs",
          graft.util.Sidecars.read(spark, path, "docs")
            .join(reappend, Seq("doc_id"), "left_anti"),
          expectedEpoch = Some(fenceE))
        val liveTombs = graft.util.Sidecars.read(spark, path, "tombstones")
          .join(reappend, Seq("doc_id"), "left_anti").localCheckpoint()
        if (liveTombs.isEmpty) {
          fenceE = graft.util.Sidecars.claim(spark, path, Some(fenceE))
          graft.util.Sidecars.drop(spark, path, "tombstones")
        } else fenceE = swapSidecar(spark, path, "tombstones", liveTombs,
          single = true, expectedEpoch = Some(fenceE))
        liveTombs.unpersist()
        reappend.unpersist()
      }
    }
    // Bloom swap FIRST (superset invariant), then doc map, then postings
    bloom match {
      case Some((bits, k)) =>
        val add = Bloom.buildBits(batchIds, col("doc_id"), bits.length * 64, k)
        fenceE = writeBloomSidecar(spark, path,
          bits.zip(add).map { case (a, b) => a | b }, k, Some(fenceE))
      case None => // legacy index: stay exact-probe (sidecar appears on rebuild)
    }
    fenceE = graft.util.Sidecars.claim(spark, path, Some(fenceE)) // raw appends
    profiled.select(col("doc_id").cast("long").as("doc_id"), col("dl"))
      .write.mode("append")
      .parquet(graft.util.Sidecars.appendPath(spark, path, "docs"))
    profiled.select(col("doc_id"), col("dl"), explode(col("__ws")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket",
        pmod(xxhash64(col("term")), lit(nBuckets)).cast("int"))
      .write.mode("append").partitionBy("bucket").parquet(path + "/postings")
    // sidecar swap LAST = the mutation's commit point (see swapSidecar)
    swapStats(spark, path, Seq((old.getAs[Long]("n_docs") + batch.getLong(0),
        old.getAs[Long]("sum_dl") + batch.getLong(1), nBuckets,
        math.max(old.getAs[Long]("max_doc_id"), batch.getAs[Long]("hi"))))
      .toDF("n_docs", "sum_dl", "n_buckets", "max_doc_id"),
      expectedEpoch = Some(fenceE))
    suspects.unpersist()
    profiled.unpersist()
    AppendReport(batch.getLong(0), nSuspects, nReappend)
  }

  /** DELETE documents from a persisted inverted index WITHOUT rewriting
    * postings: the doc_ids land in a tombstone table that query-time
    * scoring anti-joins, and the stats sidecar subtracts the deleted
    * docs' count and length mass — so delete(ids) + query is
    * BIT-IDENTICAL to a from-scratch build over the surviving corpus
    * (df re-derives from the anti-joined postings; N/avgdl from the
    * adjusted sidecar). The deferred rewrite is
    * [[compactInvertedIndex]].
    *
    * Cost note: the deleted docs' length mass comes from the doc-map
    * sidecar (one row per doc), NEVER a postings scan — term-hash
    * partitioning cannot prune a doc-id predicate, so probing postings
    * would read the whole index; the doc map is O(n_docs) rows and the
    * delete batch broadcasts against it. Re-deleting an id that is
    * already tombstoned is REFUSED (it would subtract its stats mass a
    * second time, silently corrupting N/avgdl for every later query). */
  def deleteFromInvertedIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    if (ids.isEmpty) return
    var fenceE = graft.util.Sidecars.fenceEpoch(spark, path) // before reads
    val idsDf = ids.distinct.toDF("doc_id")
    if (graft.util.Sidecars.exists(spark, path, "tombstones")) {
      val dup = graft.util.Sidecars.read(spark, path, "tombstones")
        .join(broadcast(idsDf), Seq("doc_id")).count()
      require(dup == 0L,
        s"delete batch re-names $dup doc_id(s) already tombstoned — " +
          "re-deleting would subtract their stats mass twice")
    }
    // the deleted docs' (doc_id, dl) from the doc-map sidecar; bounded
    // by the delete batch (the doc map keeps tombstoned ids until
    // compaction, so presence here + the tombstone check above = alive)
    val gone = graft.util.Sidecars.read(spark, path, "docs")
      .join(broadcast(idsDf), Seq("doc_id"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl").cast("long")), lit(0L)).as("s")).collect()(0)
    require(gone.getLong(0) == ids.distinct.size,
      s"delete batch names ${ids.distinct.size} doc_ids but only " +
        s"${gone.getLong(0)} are in the index")
    val old = graft.util.Sidecars.read(spark, path, "stats").collect()(0)
    fenceE = graft.util.Sidecars.claim(spark, path, Some(fenceE)) // raw append
    idsDf.coalesce(1).write.mode("append")
      .parquet(graft.util.Sidecars.appendPath(spark, path, "tombstones"))
    // sidecar swap LAST = commit point
    swapStats(spark, path, Seq((old.getAs[Long]("n_docs") - gone.getLong(0),
        old.getAs[Long]("sum_dl") - gone.getLong(1),
        old.getAs[Int]("n_buckets"), old.getAs[Long]("max_doc_id")))
      .toDF("n_docs", "sum_dl", "n_buckets", "max_doc_id"),
      expectedEpoch = Some(fenceE))
  }

  /** COMPACT a tombstoned index: rewrite ONLY the bucket partitions that
    * contain deleted postings ([[purgePostings]] — untouched buckets
    * keep their files), drop the dead ids from the doc-map sidecar and
    * rebuild the Bloom over the survivors, drop the tombstone table,
    * done. Query results are unchanged (the gate pins hash equality
    * before/after); the win is the dropped tombstone anti-join, the
    * reclaimed files, and the restored Bloom selectivity. (Re-APPENDING
    * a tombstoned id does NOT require compaction — the append path
    * purges just that id in place; compaction is the bulk reclaim.)
    * Crash ordering: the tombstone table is deleted LAST, so a
    * compaction that dies mid-rewrite leaves the tombstones masking
    * whatever postings/doc-map state it reached, and re-running it
    * converges (the anti-joins of already-removed ids are no-ops). */
  def compactInvertedIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    if (!graft.util.Sidecars.exists(spark, path, "tombstones"))
      return // nothing to compact
    var fenceE = graft.util.Sidecars.fenceEpoch(spark, path) // before reads
    val dead = graft.util.Sidecars.read(spark, path, "tombstones")
      .localCheckpoint()
    fenceE = graft.util.Sidecars.claim(spark, path, Some(fenceE))
    purgePostings(spark, path, dead) // fenced by the claim above
    // doc map shrinks via the atomic swap — a crash mid-write leaves the
    // complete old map, never a torn one the append probe would misread
    fenceE = swapSidecar(spark, path, "docs",
      graft.util.Sidecars.read(spark, path, "docs")
        .join(dead, Seq("doc_id"), "left_anti"),
      expectedEpoch = Some(fenceE))
    // Bloom REBUILD from the survivors: dead ids' bits drop, so the
    // false-positive rate doesn't ratchet up across delete/compact
    // cycles (still a superset of the doc map at every point — the old
    // Bloom covers the survivors until the swap lands)
    readBloomSidecar(spark, path).foreach { case (bits, k) =>
      fenceE = writeBloomSidecar(spark, path, Bloom.buildBits(
        graft.util.Sidecars.read(spark, path, "docs"), col("doc_id"),
        bits.length * 64, k), k, Some(fenceE))
    }
    graft.util.Sidecars.claim(spark, path, Some(fenceE)) // raw delete
    graft.util.Sidecars.drop(spark, path, "tombstones")
    dead.unpersist()
  }

  /** BM25 top-k against a persisted inverted index. The query terms'
    * bucket ids (computed by the same engine xxhash64 the build used —
    * a |terms|-row local job, never a reimplemented driver hash) become
    * a LITERAL partition filter on the postings scan, so the source
    * statically prunes every other bucket; df/N/avgdl come from the
    * pruned postings plus the stats sidecar, never a corpus scan. The
    * score replays [[bm25TopK]]'s formula with the same term order and
    * operation order, so the two paths are bit-identical and one oracle
    * gates both. Returns the same (doc_id, dl, tf_<term>..., score)
    * shape. */
  def bm25IndexedTopK(spark: org.apache.spark.sql.SparkSession,
      path: String, terms: Seq[String], k: Int = 20,
      nBuckets: Int = 64): DataFrame = {
    require(terms.nonEmpty, "bm25IndexedTopK needs at least one term")
    val buckets = spark.createDataFrame(terms.map(Tuple1(_))).toDF("term")
      .select(pmod(xxhash64(col("term")), lit(nBuckets)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val rawPosts = spark.read.parquet(path + "/postings")
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
    // tombstone-aware: deleted docs (deleteFromInvertedIndex) drop out of
    // the pruned postings here, so df/tf re-derive over survivors only;
    // after compactInvertedIndex the table is gone and the join with it
    val posts =
      if (graft.util.Sidecars.exists(spark, path, "tombstones"))
        rawPosts.join(
          broadcast(graft.util.Sidecars.read(spark, path, "tombstones")),
          Seq("doc_id"), "left_anti")
      else rawPosts
    val tfAggs = terms.map(t =>
      sum(when(col("term") === t, col("tf")).otherwise(lit(0L)))
        .cast("int").as(s"tf_$t"))
    val wide = posts.groupBy(col("doc_id"), col("dl"))
      .agg(tfAggs.head, tfAggs.tail: _*)
    val dfAggs = terms.map(t =>
      coalesce(sum(when(col("term") === t, lit(1L))), lit(0L)).as(s"__df_$t"))
    val stats = posts.agg(dfAggs.head, dfAggs.tail: _*)
      .crossJoin(graft.util.Sidecars.read(spark, path, "stats"))
    val n = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / n
    def termScore(t: String): Column = {
      val tf = col(s"tf_$t").cast("double")
      val df = col(s"__df_$t").cast("double")
      val idf = log((n - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
      idf * (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
    }
    wide.crossJoin(broadcast(stats))
      .withColumn("score",
        round(terms.map(termScore).reduceLeft(_ + _), 6))
      .select(col("doc_id") +: col("dl") +:
        terms.map(t => col(s"tf_$t")) :+ col("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** 1-based rank column for an ALREADY-BOUNDED retrieval list by
    * (score desc, id). The global window is fine here BY CONSTRUCTION:
    * the input must be a top-k result (a `limit` upstream), so the
    * single-partition funnel is k rows at any corpus scale — never hand
    * this a corpus-sized frame (that shape lives in
    * Sampling.rangedRunningSum). */
  def asRanked(list: DataFrame, id: String, score: String): DataFrame =
    list.withColumn("rank",
      row_number().over(Window.orderBy(col(score).desc, col(id))))

  /** RECIPROCAL RANK FUSION of named top-k lists `(id, rank)` — the
    * standard hybrid-retrieval combiner (Cormack et al.: score =
    * sum_lists 1/(c + rank), c=60): rank-based, so BM25 and cosine need
    * no score calibration against each other, unlike the weighted-sum
    * fusion in [[hybrid]]. A doc missing from a list contributes 0
    * for it (ranks stay NULL in the output — the fused set is the UNION
    * of the lists). All inputs are k-bounded, so the full-outer joins
    * and final sort touch O(k * lists) rows at any corpus scale; the
    * expensive part is producing the lists, which is the retrieval
    * operators' own (already scale-shaped) job. Returns
    * (id, rank_<name>..., rrf) top-k by (rrf desc, id). */
  def rrfFuse(lists: Seq[(String, DataFrame)], id: String,
      c: Int = 60, k: Int = 20): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one list")
    val renamed = lists.map { case (nm, df) =>
      df.select(col(id), col("rank").as(s"rank_$nm")) }
    val joined = renamed.reduceLeft((a, b) => a.join(b, Seq(id), "full_outer"))
    val rrf = lists.map { case (nm, _) =>
      when(col(s"rank_$nm").isNotNull,
        lit(1.0) / (lit(c).cast("double") + col(s"rank_$nm").cast("double")))
        .otherwise(lit(0.0)) }.reduceLeft(_ + _)
    joined.withColumn("rrf", rrf)
      .orderBy(col("rrf").desc, col(id))
      .limit(k)
  }

  /** O3: deterministic top-1 per group — highest score, lowest tiebreak
    * (the reference keeps whichever future finished first; SURVEY §2.5 O4
    * mandates a deterministic rule instead). */
  def top1(df: DataFrame, groupCol: String, scoreCol: String,
      tiebreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(tiebreakCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
