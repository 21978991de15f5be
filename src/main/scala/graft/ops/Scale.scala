package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques for the 100 TB posture that don't show up in the
  * operator inventory itself: co-located bucketed joins (no exchange at
  * read time) and deterministic salting for skewed keys.
  */
object Scale {

  /** Write a table bucketed+sorted on the join key: repeated joins on that
    * key then need no shuffle (both sides read pre-partitioned).
    * `path` makes it an external table at that location (keeps temp
    * runs out of the default warehouse dir). */
  def writeBucketedTable(df: DataFrame, table: String, key: String,
      buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Salted join for skewed keys: the skewed (large) side gets a
    * deterministic salt in [0, n); the small side is replicated n ways.
    * No runtime randomness — the salt is a hash of the whole row, so plans
    * are reproducible and AQE-friendly. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(saltBuckets.toLong)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Repartition by key range for an ordered sink at scale (S9 without a
    * single-task coalesce: one sorted file per range partition). */
  def rangeSortedWrite(df: DataFrame, path: String, key: String,
      partitions: Int): Unit =
    df.repartitionByRange(partitions, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").option("header", "true").csv(path)
}
