package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-VERSION SNAPSHOT STORE with as-of reads — the time-travel layout a
  * release pipeline needs once "the corpus" stops being one directory.
  * The reference's maintenance tools mutate the previous run's output
  * IN PLACE (BryanL43/MergeExtractor tools/patchabbrev.py re-extracts
  * and overwrites rows of the prior corpus; tools/dumpdata.py dumps the
  * single current state), so history is destroyed on every run; this
  * store keeps each run as a committed, re-readable version instead.
  *
  * Layout: immutable version directories `<root>/data/v=<k>` (a Hive
  * partition column, so an as-of read is a PARTITION-PRUNED scan — the
  * files of every other version are statically skipped, which
  * SnapshotsSpec asserts via inputFiles) plus a one-row-per-version
  * MANIFEST sidecar at `<root>/manifest` (a SIBLING of the partitioned
  * path, never inside it — partition discovery must not see it).
  *
  * Commit protocol (single-writer, the [[graft.util.Sidecars]]
  * discipline): the version's data files land first, the manifest swap
  * lands LAST and is the commit point. Readers resolve versions through
  * the manifest ONLY — a crash mid-write leaves a dangling `v=<k>`
  * directory that no manifest row names, so it is invisible to
  * [[asOf]]/[[latest]] and the re-run of the crashed commit heals it
  * with mode(overwrite) before committing the manifest row.
  *
  * Scale shape: a version commit writes only the new version's rows; an
  * as-of read scans only that version's files; [[diff]] shuffles only
  * (id, fingerprint, byte-length) — document text never leaves the scan
  * stage (the snapshot_diff_store posture, across any two versions).
  */
object Snapshots {

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The manifest as (v, n_rows), empty-schema-stable when absent.
    * Resolved through [[graft.util.Sidecars.tryPath]], so a reader
    * racing a manifest swap always sees a complete committed version —
    * never the absent-directory window the r13 two-rename layout had. */
  def manifest(spark: SparkSession, root: String): DataFrame = {
    graft.util.Sidecars.tryPath(spark, root, "manifest") match {
      case Some(p) => spark.read.parquet(p)
      case None =>
        import spark.implicits._
        Seq.empty[(Int, Long)].toDF("v", "n_rows")
    }
  }

  /** Highest committed version, 0 for an empty store. */
  def latest(spark: SparkSession, root: String): Int =
    manifest(spark, root).agg(coalesce(max(col("v")), lit(0)))
      .collect()(0).getInt(0)

  /** Append `df` as the next version; returns its version number.
    *
    * Writer fencing: data lands in a WRITER-UNIQUE hidden staging dir
    * (concurrent writers never share a write path); placement of
    * `v=<k>` is arbitrated by an EXCLUSIVE CREATE of a per-version
    * claim marker (atomic — of two concurrent committers of the same k
    * exactly one proceeds; exists()+rename() alone had a window where
    * both passed and posix mv semantics nested the loser's stage
    * inside the winner's data). Healing of a crashed predecessor's
    * leftovers is age-gated at one hour (a fresh marker belongs to a
    * live committer). The manifest swap — the commit point — carries
    * the epoch read at transaction start, so a writer that raced ANY
    * other mutation of the store fails there and SELF-HEALS its placed
    * dir (the claim proves ownership, so the delete cannot touch a
    * winner's data). */
  def commitVersion(spark: SparkSession, root: String, df: DataFrame): Int = {
    val e = graft.util.Sidecars.fenceEpoch(spark, root) // transaction start
    val k = latest(spark, root) + 1
    val vdir = new org.apache.hadoop.fs.Path(root + s"/data/v=$k")
    val stage = new org.apache.hadoop.fs.Path(
      root + s"/data/.stage-v$k-${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = fsOf(spark, vdir)
    df.write.mode("overwrite").parquet(stage.toString)
    // count what was WRITTEN (what readers will see), not the input plan
    val n = spark.read.parquet(stage.toString).count()
    // PLACEMENT ARBITER: an exclusive create of a per-version claim
    // marker (the Sidecars claimEpoch pattern) — atomic, so of two
    // concurrent committers of the same k exactly one proceeds to the
    // rename; exists()+rename() alone left a window where both passed
    // the exists check and Hadoop's rename-onto-existing-dir (posix mv
    // semantics on LocalFileSystem) NESTED the loser's stage inside
    // the winner's placed data and returned true.
    val marker = new org.apache.hadoop.fs.Path(root + s"/data/.place-v$k")
    // heal a crashed writer's aged leftovers — AGE-GATED (same 1h
    // bound as the .stage sweep): no manifest row names v=<k>
    // (latest() said so), so nothing a reader can see disappears, and
    // a FRESH marker/dir belongs to a live concurrent committer whose
    // claim must stand. The heal renames the stale marker aside first
    // (itself atomic — of two healers exactly one wins; the loser
    // falls through to the claim and fails there), then removes the
    // crashed writer's dangling dir.
    val cutoff = System.currentTimeMillis() - 3600000L
    if (fs.exists(marker) &&
        fs.getFileStatus(marker).getModificationTime < cutoff) {
      val aside = new org.apache.hadoop.fs.Path(
        root + s"/data/.dead-v$k-${java.util.UUID.randomUUID().toString.take(8)}")
      if (fs.rename(marker, aside)) {
        if (fs.exists(vdir)) fs.delete(vdir, true)
        fs.delete(aside, false)
      }
    } else if (fs.exists(vdir) && !fs.exists(marker) &&
        fs.getFileStatus(vdir).getModificationTime < cutoff)
      fs.delete(vdir, true) // pre-marker-era leftover, aged
    val claimed =
      try { fs.create(marker, false).close(); true }
      catch { case _: java.io.IOException => false }
    if (!claimed) {
      fs.delete(stage, true)
      throw new IllegalStateException(
        s"writer fence: version $k of $root is being committed by a " +
          "concurrent writer; retry from a fresh manifest read")
    }
    // the exists guard stays as the physical backstop (a crashed
    // pre-marker writer's fresh dangling dir, or a >1h-stalled live
    // predecessor placing after losing its marker to the heal above);
    // the claim closes the concurrent-committer race. On this failure
    // nothing was placed, so the claim is RELEASED — the dangling dir
    // itself remains the block until it ages out
    if (fs.exists(vdir) || !fs.rename(stage, vdir)) {
      fs.delete(stage, true)
      fs.delete(marker, false)
      throw new IllegalStateException(
        s"writer fence: $vdir already placed — a concurrent or crashed " +
          "writer holds this version; retry from a fresh manifest read")
    }
    // nesting detector: if a pathological interleave still moved our
    // stage INSIDE a concurrently-placed v=<k> (rename returned true
    // but the destination already existed), our stage dir's name now
    // appears under vdir — remove the foreign nest and fail instead
    // of committing a manifest row over mixed data
    val nested = new org.apache.hadoop.fs.Path(vdir, stage.getName)
    if (fs.exists(nested)) {
      fs.delete(nested, true)
      throw new IllegalStateException(
        s"writer fence: $vdir was placed concurrently (stage was " +
          "nested and has been removed); retry from a fresh manifest read")
    }
    import spark.implicits._
    // on an epoch-fence loss at the manifest swap, SELF-HEAL: the
    // claim marker proves v=<k> is ours alone, so deleting it cannot
    // touch a winner's data (r14's leave-it-dangling caution existed
    // because exists()+rename() couldn't prove ownership) — the next
    // committer of k proceeds immediately instead of waiting out the
    // 1h age gate
    try
      graft.util.Sidecars.swap(spark, root, "manifest",
        manifest(spark, root).unionByName(Seq((k, n)).toDF("v", "n_rows")),
        single = true, expectedEpoch = Some(e))
    catch {
      case t: Throwable =>
        fs.delete(vdir, true)
        fs.delete(marker, false)
        throw t
    }
    // committed: the marker has done its job (latest() now resolves k,
    // so no future writer computes this version number again)
    fs.delete(marker, false)
    k
  }

  /** Read one committed version: a partition-pruned scan of the
    * versioned store (the `v === k` filter reaches partition discovery,
    * so only `v=<k>`'s files are listed and read). Uncommitted versions
    * — a crashed writer's dangling directory — are refused by the
    * manifest check, never silently half-read. */
  def asOf(spark: SparkSession, root: String, k: Int): DataFrame = {
    val committed = manifest(spark, root).filter(col("v") === k).count()
    require(committed == 1L,
      s"version $k is not committed in $root/manifest")
    spark.read.parquet(root + "/data").filter(col("v") === k).drop("v")
  }

  /** EXPIRE history: retain the newest `keep` committed versions and
    * physically delete everything older — the retention sweep that
    * keeps a snapshot store from growing without bound (time travel is
    * a window, not an archive). The manifest swap lands FIRST, so
    * readers stop resolving expired versions before any file
    * disappears; a crash between swap and deletes leaves unreferenced
    * `v=<k>` directories that the next expire (or crashed-commit
    * healing) removes — [[asOf]] on an expired version refuses via the
    * manifest, never half-reads. The directory sweep also GCs any
    * DANGLING version dir no manifest row names (a crashed writer's
    * leftovers), which is safe under the store's single-writer
    * discipline. Returns the expired version numbers. */
  def expire(spark: SparkSession, root: String, keep: Int): Seq[Int] = {
    require(keep >= 1, s"must retain at least one version, got keep=$keep")
    val e = graft.util.Sidecars.fenceEpoch(spark, root) // transaction start
    val man = manifest(spark, root)
    // bounded collect: one element per committed version
    val vs = man.select(col("v")).collect().map(_.getInt(0)).sorted.toSeq
    val expired = vs.dropRight(keep)
    if (expired.nonEmpty)
      graft.util.Sidecars.swap(spark, root, "manifest",
        man.filter(!col("v").isin(expired: _*)), single = true,
        expectedEpoch = Some(e))
    val retained = vs.takeRight(keep).toSet
    val dataDir = new org.apache.hadoop.fs.Path(root + "/data")
    val fs = fsOf(spark, dataDir)
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).foreach { st =>
        val name = st.getPath.getName
        // crashed commits also leave aged .stage-* dirs — sweep those
        if (name.startsWith(".stage-") &&
            st.getModificationTime < System.currentTimeMillis() - 3600000L)
          fs.delete(st.getPath, true)
        // expired versions were removed from the manifest by THIS call's
        // fenced swap, so deleting them can't race a committer (its swap
        // conflicts at the fence); a DANGLING dir no manifest ever named
        // is age-gated like commitVersion's heal — a fresh one may be a
        // concurrent committer's just-placed data
        if (name.startsWith("v=") &&
            !retained.contains(name.drop(2).toInt) &&
            (expired.contains(name.drop(2).toInt) ||
              st.getModificationTime < System.currentTimeMillis() - 3600000L))
          fs.delete(st.getPath, true)
      }
    expired
  }

  /** Diff two committed versions by content fingerprint: one row per
    * status (added/removed/changed/unchanged) with doc counts and byte
    * totals of the surviving/new side — the release-manifest numbers,
    * computed from two pruned scans that shuffle only (id, fp, bytes). */
  def diff(spark: SparkSession, root: String, from: Int, to: Int,
      id: String, text: String): DataFrame = {
    val a = asOf(spark, root, from)
      .select(col(id), md5(col(text)).as("fp1"),
        octet_length(col(text)).cast("long").as("b1"))
    val b = asOf(spark, root, to)
      .select(col(id), md5(col(text)).as("fp2"),
        octet_length(col(text)).cast("long").as("b2"))
    a.join(b, Seq(id), "full_outer")
      .select(when(col("fp1").isNull, "added")
        .when(col("fp2").isNull, "removed")
        .when(col("fp1") =!= col("fp2"), "changed")
        .otherwise("unchanged").as("status"),
        coalesce(col("b2"), col("b1")).as("bytes"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"), sum(col("bytes")).as("total_bytes"))
      .orderBy(col("status"))
  }
}
