package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic replacement of a sidecar directory under a store root, shared
  * by every persisted-store maintenance path (the BM25 inverted index's
  * stats/docs/bloom/tombstone sidecars in [[graft.ops.Rank]], the
  * snapshot manifest in [[graft.io.Snapshots]]): write the new contents
  * to a writer-unique staging directory, retire the old directory to
  * `<name>.old`, rename the new one into place, drop the old. A crash at
  * any point leaves either the complete old version or the complete new
  * one — never a half-written mix (the reader-visible rename is a single
  * filesystem metadata operation). Readers must still be serialized
  * against mutations (the two-rename window briefly leaves `<name>`
  * absent — the convention every gate and spec in this repo follows).
  *
  * WRITER FENCING: each commit claims the next epoch mark under
  * `<parent>/_fence/` with an exclusive create. The epoch is read when
  * the swap begins and `epoch+1` is claimed immediately before the
  * commit renames, so of two writers whose swap windows overlap exactly
  * one wins — the other fails loudly BEFORE any rename touches the
  * store, and its staging directory is cleaned up. Callers whose store
  * reads happen earlier than the swap call can pass the epoch they read
  * ([[fenceEpoch]]) as `expectedEpoch` to widen the optimistic window to
  * the whole read-compute-commit span. Underscore prefix keeps the fence
  * invisible to parquet directory listings.
  */
object Sidecars {
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

  /** The general form: `stage` writes EVERYTHING the new sidecar version
    * holds into the staging directory (possibly several writes — e.g. a
    * partitioned table plus an underscore-hidden marker subdirectory),
    * and the single rename then commits all of it at once. Exactly-once
    * sinks lean on this: data + applied-batch watermark travel in ONE
    * atomic rename, so no crash point can separate them.
    *
    * Returns the claimed epoch: a multi-swap maintenance TRANSACTION
    * threads it into its next swap/[[claim]] as `expectedEpoch`, so two
    * concurrent transactions on one store conflict at their FIRST
    * commit instead of interleaving sidecar-by-sidecar. */
  def swapStaged(spark: SparkSession, parent: String, name: String,
      expectedEpoch: Option[Long] = None)(stage: String => Unit): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val cur = new org.apache.hadoop.fs.Path(parent + "/" + name)
    // writer-unique staging: two overlapping writers never share (and
    // never delete) each other's half-written stage
    val next = new org.apache.hadoop.fs.Path(
      parent + s"/$name.next-${java.util.UUID.randomUUID().toString.take(8)}")
    val old = new org.apache.hadoop.fs.Path(parent + s"/$name.old")
    val fs = cur.getFileSystem(conf)
    val entryEpoch = expectedEpoch.getOrElse(fenceEpoch(spark, parent))
    try {
      stage(next.toString)
      claimEpoch(fs, parent, entryEpoch, name)
    } catch {
      case e: Throwable =>
        fs.delete(next, true) // loser/crashed stage leaves no garbage
        throw e
    }
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
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(cur)) require(fs.rename(cur, old),
      s"could not retire old $name sidecar at $cur")
    require(fs.rename(next, cur),
      s"could not commit $name sidecar at $cur")
    fs.delete(old, true)
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
