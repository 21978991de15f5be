package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic replacement of a sidecar directory under a store root, shared
  * by every persisted-store maintenance path (the BM25 inverted index's
  * stats/docs/bloom/tombstone sidecars in [[graft.ops.Rank]], the
  * snapshot manifest in [[graft.io.Snapshots]]): write the new contents
  * to `<name>.next`, retire the old directory to `<name>.old`, rename
  * the new one into place, drop the old. A crash at any point leaves
  * either the complete old version or the complete new one — never a
  * half-written mix (the reader-visible rename is a single filesystem
  * metadata operation). Single-writer discipline: the two-rename window
  * briefly leaves `<name>` absent, so readers must be serialized against
  * mutations (the convention every gate and spec in this repo follows).
  */
object Sidecars {
  def swap(spark: SparkSession, parent: String, name: String,
      rows: DataFrame, single: Boolean = false): Unit =
    swapStaged(spark, parent, name) { nextPath =>
      (if (single) rows.coalesce(1) else rows)
        .write.mode("overwrite").parquet(nextPath)
    }

  /** The general form: `stage` writes EVERYTHING the new sidecar version
    * holds into the staging directory (possibly several writes — e.g. a
    * partitioned table plus an underscore-hidden marker subdirectory),
    * and the single rename then commits all of it at once. Exactly-once
    * sinks lean on this: data + applied-batch watermark travel in ONE
    * atomic rename, so no crash point can separate them. */
  def swapStaged(spark: SparkSession, parent: String, name: String)(
      stage: String => Unit): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val cur = new org.apache.hadoop.fs.Path(parent + "/" + name)
    val next = new org.apache.hadoop.fs.Path(parent + s"/$name.next")
    val old = new org.apache.hadoop.fs.Path(parent + s"/$name.old")
    val fs = cur.getFileSystem(conf)
    if (fs.exists(next)) fs.delete(next, true) // a crashed stage's leftovers
    stage(next.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(cur)) require(fs.rename(cur, old),
      s"could not retire old $name sidecar at $cur")
    require(fs.rename(next, cur),
      s"could not commit $name sidecar at $cur")
    fs.delete(old, true)
  }
}
