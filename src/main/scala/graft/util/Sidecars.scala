package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic, READER-SAFE replacement of a sidecar directory under a store
  * root, shared by every persisted-store maintenance path (the BM25
  * inverted index's stats/docs/bloom/tombstone sidecars in
  * [[graft.ops.Rank]], the snapshot manifest in [[graft.io.Snapshots]],
  * the band/triangle stores): each committed state of a sidecar is an
  * immutable VERSION-NAMED directory `<name>.v<epoch>` that appears in
  * ONE filesystem rename, and readers resolve the highest committed
  * version ([[path]]/[[read]]) — so no reader can ever observe a
  * half-written directory OR an absent-sidecar window (the r13 layout
  * retired `<name>` to `<name>.old` before renaming the new state in,
  * which left `<name>` briefly absent; writers were fenced, readers
  * were not).
  *
  * Version retention: the newest [[KeepVersions]] versions stay on disk
  * and older ones are deleted at the NEXT swap, so a reader that
  * resolved version k keeps a readable directory until k has been
  * superseded [[KeepVersions]] times — the documented staleness bound
  * for lazy plans that execute long after resolution. Plain `<name>`
  * directories (legacy stores, raw initial builds) resolve as version
  * 0 and are removed by the first versioned swap of that name.
  *
  * WRITER FENCING (unchanged from r13): each commit claims the next
  * epoch mark under `<parent>/_fence/` with an exclusive create. The
  * epoch is read when the swap begins and `epoch+1` is claimed before
  * the commit rename, so of two writers whose swap windows overlap
  * exactly one wins — the other fails loudly BEFORE any rename touches
  * the store, and its staging directory is cleaned up. Callers whose
  * store reads happen earlier than the swap call can pass the epoch
  * they read ([[fenceEpoch]]) as `expectedEpoch` to widen the
  * optimistic window to the whole read-compute-commit span. The
  * claimed epoch also NAMES the committed version — two versions of
  * one sidecar can never collide. Underscore prefix keeps the fence
  * invisible to parquet directory listings.
  */
object Sidecars {
  /** Committed versions of a sidecar retained on disk (newest first
    * at each swap): the reader staleness bound — a resolved path stays
    * readable until its version has been superseded this many times. */
  val KeepVersions = 3

  def swap(spark: SparkSession, parent: String, name: String,
      rows: DataFrame, single: Boolean = false,
      expectedEpoch: Option[Long] = None): Long =
    swapStaged(spark, parent, name, expectedEpoch) { nextPath =>
      (if (single) rows.coalesce(1) else rows)
        .write.mode("overwrite").parquet(nextPath)
    }

  /** Claim the next epoch WITHOUT swapping a sidecar — fences raw
    * (non-swap) store mutations such as additive parquet appends or
    * version-directory writes: claim first, mutate after, and a stale
    * concurrent writer fails at the claim before touching any file.
    * Returns the claimed epoch (thread it into the next swap/claim of
    * the same transaction). */
  def claim(spark: SparkSession, parent: String,
      expected: Option[Long] = None): Long = {
    val dir = new org.apache.hadoop.fs.Path(parent)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entry = expected.getOrElse(fenceEpoch(spark, parent))
    claimEpoch(fs, parent, entry, "(raw mutation)")
    entry + 1
  }

  /** Current fence epoch of a store root (0 for a fresh/unfenced store):
    * the highest committed mark under `<parent>/_fence/`. Read it before
    * computing a mutation and pass it to [[swapStaged]] as
    * `expectedEpoch` to make the whole read-compute-commit span
    * optimistic-concurrency checked. */
  def fenceEpoch(spark: SparkSession, parent: String): Long = {
    val dir = new org.apache.hadoop.fs.Path(parent + "/_fence")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) 0L
    else fs.listStatus(dir).iterator.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("epoch-")) n.drop(6).toLongOption else None
    }.foldLeft(0L)(math.max)
  }

  /** Resolve the current committed path of a sidecar, or None if it has
    * never been written: the highest `<name>.v<k>` version directory
    * (each appeared atomically via rename), falling back to the plain
    * legacy `<name>` directory. */
  def tryPath(spark: SparkSession, parent: String,
      name: String): Option[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val plain = new org.apache.hadoop.fs.Path(parent + "/" + name)
    val fs = plain.getFileSystem(conf)
    val versions = fs.globStatus(
      new org.apache.hadoop.fs.Path(parent + s"/$name.v*"))
    val best = if (versions == null) None
      else versions.iterator.flatMap { st =>
        val n = st.getPath.getName
        n.drop(name.length + 2).toLongOption.map(_ -> st.getPath)
      }.toSeq.sortBy(_._1).lastOption
    best.map(_._2.toString)
      .orElse(if (fs.exists(plain)) Some(plain.toString) else None)
  }

  /** Current committed path of a sidecar; throws if absent. */
  def path(spark: SparkSession, parent: String, name: String): String =
    tryPath(spark, parent, name).getOrElse(
      throw new IllegalStateException(s"sidecar $name absent under $parent"))

  /** Read the current committed version of a sidecar as parquet. */
  def read(spark: SparkSession, parent: String, name: String): DataFrame =
    spark.read.parquet(path(spark, parent, name))

  /** Does any committed version (or legacy plain dir) of the sidecar
    * exist? */
  def exists(spark: SparkSession, parent: String, name: String): Boolean =
    tryPath(spark, parent, name).isDefined

  /** Write path for a RAW ADDITIVE append into the sidecar's current
    * committed state (fence with [[claim]] first): the latest version
    * dir when one exists, the plain legacy path otherwise (creating it
    * on first write). Appends only add complete files, so concurrent
    * readers of the same version see an append-only log — the
    * store-specific crash/replay discipline (doc-map-first ordering,
    * refusal probes) is the caller's, exactly as before. */
  def appendPath(spark: SparkSession, parent: String, name: String): String =
    tryPath(spark, parent, name).getOrElse(parent + "/" + name)

  /** Remove a sidecar entirely — every version and the legacy plain
    * dir (fence with [[claim]] first; the "no tombstones" transition).
    * Racing readers of a dropped sidecar see its absence, which is the
    * semantic the caller is committing. */
  def drop(spark: SparkSession, parent: String, name: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val plain = new org.apache.hadoop.fs.Path(parent + "/" + name)
    val fs = plain.getFileSystem(conf)
    val versions = fs.globStatus(
      new org.apache.hadoop.fs.Path(parent + s"/$name.v*"))
    if (versions != null) versions.foreach { st =>
      if (st.getPath.getName.drop(name.length + 2).toLongOption.isDefined)
        fs.delete(st.getPath, true)
    }
    if (fs.exists(plain)) fs.delete(plain, true)
  }

  /** The general form: `stage` writes EVERYTHING the new sidecar version
    * holds into the staging directory (possibly several writes — e.g. a
    * partitioned table plus an underscore-hidden marker subdirectory),
    * and the single rename to `<name>.v<claimedEpoch>` then commits all
    * of it at once. Exactly-once sinks lean on this: data + applied-batch
    * watermark travel in ONE atomic rename, so no crash point can
    * separate them — and because the commit CREATES a new directory
    * instead of replacing `<name>`, concurrent readers of the previous
    * version are never disturbed.
    *
    * Returns the claimed epoch: a multi-swap maintenance TRANSACTION
    * threads it into its next swap/[[claim]] as `expectedEpoch`, so two
    * concurrent transactions on one store conflict at their FIRST
    * commit instead of interleaving sidecar-by-sidecar. */
  def swapStaged(spark: SparkSession, parent: String, name: String,
      expectedEpoch: Option[Long] = None)(stage: String => Unit): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    // writer-unique staging: two overlapping writers never share (and
    // never delete) each other's half-written stage
    val next = new org.apache.hadoop.fs.Path(
      parent + s"/$name.next-${java.util.UUID.randomUUID().toString.take(8)}")
    val fs = next.getFileSystem(conf)
    val entryEpoch = expectedEpoch.getOrElse(fenceEpoch(spark, parent))
    try {
      stage(next.toString)
      claimEpoch(fs, parent, entryEpoch, name)
    } catch {
      case e: Throwable =>
        fs.delete(next, true) // loser/crashed stage leaves no garbage
        throw e
    }
    val committed = new org.apache.hadoop.fs.Path(
      parent + s"/$name.v${entryEpoch + 1}")
    // the claimed epoch is unique, so the destination cannot exist; the
    // single rename IS the commit, and readers of older versions are
    // untouched
    require(fs.rename(next, committed),
      s"could not commit $name sidecar at $committed")
    // retention: drop versions beyond the newest KeepVersions, plus the
    // legacy layout's plain dir / .old leftovers (superseded just now)
    val versions = fs.globStatus(
      new org.apache.hadoop.fs.Path(parent + s"/$name.v*"))
    if (versions != null) {
      val sorted = versions.flatMap { st =>
        st.getPath.getName.drop(name.length + 2).toLongOption
          .map(_ -> st.getPath)
      }.sortBy(-_._1)
      sorted.drop(KeepVersions).foreach(v => fs.delete(v._2, true))
    }
    val plain = new org.apache.hadoop.fs.Path(parent + "/" + name)
    if (fs.exists(plain)) fs.delete(plain, true)
    val old = new org.apache.hadoop.fs.Path(parent + s"/$name.old")
    if (fs.exists(old)) fs.delete(old, true)
    // sweep kill-9'd writers' staging leftovers — ONLY inside the claim
    // winner's window: a writer's entry epoch is always read before its
    // stage() begins, so any <name>.next* older than an hour belongs to
    // a writer whose epoch read predates the claim we just won; its own
    // claim must now fail, so deleting its stage (even mid-write) can
    // never corrupt a commit-capable transaction. Sweeping BEFORE the
    // claim could kill a live slow stager whose claim might still win.
    val stale = fs.globStatus(
      new org.apache.hadoop.fs.Path(parent + s"/$name.next*"))
    if (stale != null) stale.foreach { st =>
      if (st.getPath != next &&
          st.getModificationTime < System.currentTimeMillis() - 3600000L)
        fs.delete(st.getPath, true)
    }
    entryEpoch + 1
  }

  /** Claim epoch `entry+1` with an exclusive create — the single-winner
    * gate at the commit point. Throws if another writer committed since
    * `entry` was read (either the mark exists, or newer marks appeared
    * and the exclusive create of a stale number would rewrite history). */
  private def claimEpoch(fs: org.apache.hadoop.fs.FileSystem,
      parent: String, entry: Long, name: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(parent + "/_fence")
    fs.mkdirs(dir)
    // GC never deletes the newest mark, so the listed max is the true
    // committed epoch — a stale writer can't slip into a GC'd number
    val committed = fs.listStatus(dir).iterator.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("epoch-")) n.drop(6).toLongOption else None
    }.foldLeft(0L)(math.max)
    val mark = new org.apache.hadoop.fs.Path(dir, s"epoch-${entry + 1}")
    val claimed = committed == entry && {
      try { fs.create(mark, false).close(); true }
      catch { case _: java.io.IOException => false }
    }
    if (!claimed)
      throw new IllegalStateException(
        s"writer fence: epoch ${entry + 1} of $parent already claimed — " +
          s"a concurrent writer committed $name (or a sibling sidecar) " +
          "since this mutation read the store; retry from a fresh read")
    // GC old marks, keeping a short history for diagnosability
    fs.listStatus(dir).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("epoch-") &&
          n.drop(6).toLongOption.exists(_ < entry - 2))
        fs.delete(st.getPath, false)
    }
  }
}
