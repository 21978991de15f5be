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

  /** Sequence PACKING (training-batch assembly): within each shard, docs
    * in id order are laid head-to-tail and each is assigned to the fixed
    * token-budget bin its first token lands in — the deterministic
    * contiguous-fill approximation of first-fit packing (a doc whose span
    * crosses a bin boundary is flagged; the trainer either splits it
    * there or shifts it — both decisions need exactly these columns).
    * Returns (id, shard, n_tokens, bin, bin_offset, spans_boundary).
    *
    * Scale shape: the running sum is windowed PER SHARD, so no global
    * single-partition sort exists; a shard is a source/domain slice, and
    * skew within one is bounded by how the corpus was sharded upstream
    * (at 100 TB, shard = the ingest partition — millions of rows, not
    * billions). All arithmetic is integer, so the assignment is exactly
    * reproducible across engines and partitionings. */
  def packSequences(df: DataFrame, shard: Column, id: Column,
      tokens: Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(id.as("id"), shard.as("shard"),
        tokens.cast("long").as("n_tokens"))
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // `div`, not floor(/): long division stays exact past 2^53 tokens
      .withColumn("bin", expr(s"__start div ${budget}L"))
      .withColumn("bin_offset", (col("__start") % budget).cast("long"))
      .withColumn("spans_boundary",
        col("bin_offset") + col("n_tokens") > budget)
      .drop("__start")
  }

  /** Deterministic weighted MIXTURE sampling: keep a row iff
    * pmod(xxhash64(id), 10^6) < round(weight(source) * 10^6) — the
    * reproducible down-sampling step that reshapes a corpus toward a
    * target domain mixture (keep all of source A, 20% of source B, ...).
    * The keep decision is a pure function of (id, source), so reruns,
    * retries, and other engines reproduce the exact row set. A map-stage
    * filter: no shuffle, no state — at 100 TB the mixture costs one scan.
    * Sources absent from `weights` fall back to `default`. Returns the
    * kept rows with the sampling `bucket` and `w_thresh` exposed. */
  def mixtureSample(df: DataFrame, source: Column, id: Column,
      weights: Map[String, Double], default: Double): DataFrame = {
    def thresh(w: Double): Column = lit(math.round(w * 1000000L))
    val wcol = weights.foldRight(thresh(default)) { case ((src, w), rest) =>
      when(source === src, thresh(w)).otherwise(rest)
    }
    df.withColumn("bucket", pmod(xxhash64(id), lit(1000000L)))
      .withColumn("w_thresh", wcol)
      .filter(col("bucket") < col("w_thresh"))
  }
}
