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
    require(budget > 0, s"packSequences budget must be positive, got $budget")
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

  /** CURRICULUM ordering for training: docs grouped into difficulty bins
    * (the caller's `bin` — e.g. a length bucket for the classic
    * short-to-long warm-up), sharded inside each bin by the seeded id
    * hash, and positioned deterministically within each (bin, shard) by
    * (hash, id). The trainer consumes bins in ascending order and a
    * bin's shards in parallel — so no GLOBAL sequence is ever
    * materialized and every window here is partitioned by (bin, shard),
    * the same skew-proof stance as packSequences. Returns
    * (id, bin, shard, pos). */
  def curriculumOrder(df: DataFrame, id: Column, bin: Column,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"curriculumOrder nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bin"), col("shard"))
      .orderBy(col("__h"), col("id"))
    df.select(id.as("id"), bin.as("bin"))
      .withColumn("__h", xxhash64(col("id")))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w))
      .select(col("id"), col("bin"), col("shard"), col("pos"))
  }

  /** Running sum over a GLOBAL total order without a single-partition
    * window: range-partition the rows on the order, window PARTITIONED by
    * the range id for the within-range running sum, and add each range's
    * broadcast prefix offset. The only driver-side data is one subtotal
    * per range partition (bounded by `numRanges`, not by the input), so
    * the shape survives a corpus-sized input where an unpartitioned
    * `Window.orderBy` funnels everything through one task.
    *
    * The ranged frame is localCheckpointed before use: it is evaluated
    * twice (subtotal collect + final result) and the checkpoint pins one
    * materialized partition assignment for both — at cluster scale the
    * same pin is a persist/reliable checkpoint of the ranged frame.
    * Returns the input columns plus `out` = the running `value` sum in
    * `order` (each row inclusive of itself). */
  def rangedRunningSum(df: DataFrame, order: Seq[Column], value: Column,
      out: String, numRanges: Int): DataFrame = {
    val (ranged, offsets) = rangedOffsets(df, order, value, numRanges)
    withRunningSum(ranged, order, value, out, offsets)
  }

  /** The token-budget PREFIX of a totally-ordered corpus (best-first
    * sampling: keep rows while the running `value` sum stays within
    * `budget`) as a distributed plan. Beyond [[rangedRunningSum]] it
    * statically prunes — via the driver-known offsets, BEFORE the window
    * runs — every range whose starting offset already meets the budget:
    * with nonnegative `value` no row of such a range can land inside the
    * prefix, so only the ranges up to and including the boundary range
    * are ever scanned by the window. */
  def budgetPrefix(df: DataFrame, order: Seq[Column], value: Column,
      out: String, budget: Long, numRanges: Int): DataFrame = {
    require(budget > 0, s"budgetPrefix budget must be positive, got $budget")
    val (ranged, offsets) = rangedOffsets(df, order, value, numRanges)
    val live = offsets.collect { case (pid, off) if off < budget => pid }.toSeq
    val pruned = ranged.filter(col("__pid").isInCollection(live))
    withRunningSum(pruned, order, value, out, offsets)
      .filter(col(out) <= budget)
  }

  /** Shared core of the ranged-running-sum shape: the checkpointed
    * range-partitioned frame (with its `__pid` range id) and each range's
    * exclusive prefix offset, collected as one subtotal row per range —
    * bounded by `numRanges` by construction, never by the input.
    *
    * Fixed cost at tiny scale: the shape runs a bounded number of extra
    * jobs versus the single-partition window it replaces (range sampling,
    * the checkpoint, the subtotal collect) — a constant orchestration
    * overhead independent of corpus size, which is exactly the trade: at
    * sf0.1 it is ~1.5 s absolute; at 100 TB it is noise while the global
    * window it replaces is the job. (Pinning the input with its own
    * checkpoint before the range shuffle was measured SLOWER here — the
    * upstream profile kernels are cheap and the extra materialization
    * job dominates; revisit only if an upstream ever becomes the cost.) */
  private def rangedOffsets(df: DataFrame, order: Seq[Column], value: Column,
      numRanges: Int): (DataFrame, Map[Int, Long]) = {
    require(numRanges > 0, s"numRanges must be positive, got $numRanges")
    val ranged = df
      .repartitionByRange(numRanges, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val subtotals = ranged.groupBy(col("__pid"))
      .agg(sum(value.cast("long")).as("__sub"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    // range ids increase with the range order, so the exclusive prefix
    // sum of subtotals in pid order is each range's starting offset
    var acc = 0L
    val offsets = subtotals.map { case (pid, sub) =>
      val o = pid -> acc; acc += sub; o
    }.toMap
    (ranged, offsets)
  }

  private def withRunningSum(ranged: DataFrame, order: Seq[Column],
      value: Column, out: String, offsets: Map[Int, Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn(out, sum(value.cast("long")).over(w) +
        coalesce(element_at(typedLit(offsets), col("__pid")), lit(0L)))
      .drop("__pid")
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

  /** Deterministic training-order SHUFFLE + sharding: every row gets a
    * pseudorandom but exactly reproducible position — shard =
    * pmod(xxhash64(id), nShards), pos = 1-based rank of (hash, id)
    * within the shard. The hash order is statistically independent of
    * any meaningful column, which is all a training shuffle needs, and
    * being a pure function of the id it survives reruns, retries, and
    * engine changes (the property tf.data/torch seeds only approximate).
    *
    * Scale shape: one corpus-sized shuffle on the 8-byte shard key; the
    * rank window is PARTITIONED by shard (pack_sequences posture — shard
    * count is the knob bounding partition size; at 100 TB use 10k+
    * shards), never a global sort. Returns (id, h, shard, pos). */
  def shuffleShards(df: DataFrame, id: Column, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("id"))
    df.select(id.as("id"))
      .withColumn("h", xxhash64(col("id")))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** FineWeb-style QUANTILE gate: keep rows whose `score` clears the
    * exact discrete p-th percentile of the corpus score distribution —
    * curation by "keep the top (100-p)%" rather than a hand-picked
    * absolute threshold, so the gate tracks the corpus as it drifts.
    *
    * Percentile convention matches ta_corpus_stats: the threshold is the
    * smallest score value whose ascending cumulative count reaches
    * (p*n + 99) div 100 — an exact order statistic, no interpolation, so
    * both engines agree bit-for-bit. Ties AT the threshold are kept
    * (score >= t), so the kept fraction is >= (100-p)%.
    *
    * Scale shape: the histogram is a groupBy on the score VALUE — rows
    * bounded by the score formula's value lattice, not the corpus — and
    * its cumulative count runs through [[rangedRunningSum]] (range-
    * partitioned subtotals + broadcast offsets), so there is no
    * partition-less window ANYWHERE even before the histogram bound
    * kicks in. The one-row threshold then broadcasts back into a
    * map-side filter; corpus rows are never sorted. */
  def keepAboveQuantile(df: DataFrame, score: Column, p: Int): DataFrame = {
    require(p >= 1 && p <= 99, s"percentile must be in [1,99], got $p")
    val scored = df.withColumn("__s", score)
    val hist = scored.groupBy(col("__s")).agg(count(lit(1)).as("__c"))
    val cum = rangedRunningSum(hist, Seq(col("__s")), col("__c"),
      "__cum", numRanges = 8)
    // n = the last cumulative count; the percentile position is the
    // ta_corpus_stats convention (p*n + 99) div 100, and the threshold is
    // the smallest score value whose cumulative count reaches it
    val thr = cum
      .crossJoin(broadcast(cum.agg(max(col("__cum")).as("__n"))))
      .agg(min(when(col("__cum") >= expr(s"($p * __n + 99) div 100"),
        col("__s"))).as("__thr"))
    scored.join(broadcast(thr))
      .filter(col("__s") >= col("__thr"))
      .drop("__s", "__thr")
  }

  /** Deterministic TRAIN/VAL/TEST split assignment: bucket =
    * pmod(xxhash64(id), 100), split = the first band whose cumulative
    * percentage exceeds the bucket. A pure function of the id, so the
    * assignment survives reruns, re-partitioning, corpus growth (a doc's
    * split never changes when others are added — the property a
    * row_number-based split lacks), and other engines reproduce it
    * exactly. Map-stage only: no shuffle, no state, one scan at 100 TB.
    * Returns (id, bucket, split). */
  def assignSplit(df: DataFrame, id: Column,
      bands: Seq[(String, Int)]): DataFrame = {
    require(bands.nonEmpty && bands.forall(_._2 > 0),
      s"split bands must be positive, got $bands")
    require(bands.map(_._2).sum == 100,
      s"split bands must sum to 100, got ${bands.map(_._2).sum}")
    val cum = bands.map(_._2).scanLeft(0)(_ + _).tail
    val bucket = col("bucket")
    // last band is the unconditional fallback: bucket < 100 always holds
    val split = bands.init.zip(cum).foldRight(lit(bands.last._1)) {
      case (((name, _), ub), rest) => when(bucket < ub, name).otherwise(rest)
    }
    df.select(id.as("id"))
      .withColumn("bucket", pmod(xxhash64(col("id")), lit(100L)))
      .withColumn("split", split)
  }

  /** TEMPERATURE-scaled mixture sampling at alpha = 0.5: re-balance
    * source sizes toward p_s^alpha — the multilingual-LM reweighting
    * (mT5/XLM-R style) that keeps big sources from drowning small ones —
    * realized as downsampling only (no upsampling): the kept count per
    * source is proportional to sqrt(n_s), scaled so the smallest source
    * keeps everything, i.e. rate_s = sqrt(min_n / n_s). Unlike
    * [[mixtureSample]]'s operator-supplied weights, the rates here are
    * DERIVED FROM THE DATA in a first pass. alpha is fixed at 0.5
    * because sqrt is an exactly-rounded IEEE-754 op — the thresholds are
    * bit-reproducible across engines, where a general pow() is
    * libm-dependent. Keep decision: pmod(xxhash64(id), 10^6) <
    * floor(10^6 * rate_s), the same seeded integer-threshold trick.
    *
    * Scale shape: pass 1 is one count aggregation bounded by the source
    * alphabet (KBs); its rates broadcast-join back and pass 2 is a pure
    * map-stage filter — at 100 TB the whole mixture costs two scans and
    * no corpus-sized shuffle. Returns kept rows with (n_source, bucket,
    * w_thresh) exposed. */
  def temperatureSample(df: DataFrame, source: Column, id: Column): DataFrame = {
    val counts = df.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_source"))
    val minN = counts.agg(min(col("n_source")).as("__minn"))
    val rates = counts.crossJoin(broadcast(minN))
      .withColumn("w_thresh",
        floor(lit(1000000.0) * sqrt(col("__minn").cast("double") /
          col("n_source").cast("double"))))
      .select(col("source"), col("n_source"), col("w_thresh"))
    df.withColumn("source", source)
      .join(broadcast(rates), Seq("source"))
      .withColumn("bucket", pmod(xxhash64(id), lit(1000000L)))
      .filter(col("bucket") < col("w_thresh"))
  }
}
