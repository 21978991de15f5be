package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic seeded sampling operators for corpus curation. */
object Sampling {

  /** The k lexicographically smallest (key, id) pairs per group, as an
    * ascending array of structs — see
    * [[org.apache.spark.sql.graft.TopKByKey]]. */
  def topKByKey(key: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.{TopKByKey, internal}
    internal.column(TopKByKey(internal.expression(key),
      internal.expression(id), k).toAggregateExpression())
  }

  /** Seeded per-stratum sample: the `cap` docs with the smallest
    * (hash, id) inside each stratum, ranked. Exactly the rows a rank
    * window over (stratum ORDER BY hash, id) would keep, but computed as
    * a bounded aggregate: map-side partials hold <= cap pairs per stratum
    * per task, the shuffle carries only those partials, and no stratum is
    * ever sorted in a single window partition — the skew-proof shape at
    * corpus scale. Returns (id, stratum, hash, rk) with rk 1-based in
    * (hash, id) order. */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
      hash: Column, cap: Int): DataFrame =
    df.groupBy(stratum.as("stratum"))
      .agg(topKByKey(hash, id, cap).as("__top"))
      .select(col("stratum"), posexplode(col("__top")).as(Seq("__pos", "__s")))
      .select(col("__s.id").as("id"), col("stratum"),
        col("__s.key").as("hash"),
        (col("__pos") + 1).cast("int").as("rk"))
}
