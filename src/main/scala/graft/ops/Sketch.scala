package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-memory cardinality sketching (HyperLogLog), made
  * BIT-DETERMINISTIC so an independent engine can replay it: ranks are
  * exact integers (57 - bitlength of the hash remainder), the register
  * sum is kept in exact 2^-57 units as DECIMAL — no float accumulation,
  * so aggregation order cannot change the result — and the raw estimate
  * is ONE final double expression both engines evaluate identically.
  *
  * Why this matters at 100 TB: COUNT(DISTINCT) shuffles every distinct
  * key; the sketch shuffles AT MOST m=256 (register, max-rank) pairs per
  * group regardless of corpus size, with map-side combine doing almost
  * all the work. The estimate carries standard HLL error (~1.04/sqrt(m)
  * ~ 6.5%) and NO small-range linear-counting correction — that branch
  * needs ln(), the one libm op outside the cross-engine exactly-rounded
  * set — so the gated query emits the exact NDV next to the sketch and
  * the bias stays visible rather than papered over.
  */
object Sketch {

  /** Number of registers (2^8; the register index is the hash's low
    * byte, the rank comes from the remaining 56 bits). */
  val HllM = 256
  private val TwoPow57 = 144115188075855872L

  /** Per-`group` exact NDV and raw HLL estimate of `key` (a 64-bit-ish
    * long; hashing uses Spark's xxhash64 so an oracle can replay the
    * chain). Returns (g, n_exact, m_used, hll_ndv). */
  /** The HLL REGISTER TABLE — (g, r, mk): the sketch's whole state, at
    * most [[HllM]] rows per group no matter the key count. Works on a
    * STREAMING input too (a bounded max-aggregation — complete-mode
    * legitimate the way the CMS matrix is), and is what a shard would
    * persist; register tables merge by per-register MAX. */
  def hllRegisters(df: DataFrame, key: Column, group: Column): DataFrame = {
    val h = xxhash64(key)
    val rem = shiftrightunsigned(h, 8)
    df.select(group.as("g"),
        h.bitwiseAND(lit((HllM - 1).toLong)).as("r"),
        when(rem === 0L, lit(57))
          .otherwise(lit(57) - length(bin(rem))).as("k0"))
      .groupBy(col("g"), col("r")).agg(max(col("k0")).as("mk"))
  }

  /** Close a register table into the estimate: exact 2^-57-unit DECIMAL
    * register sum (aggregation order cannot matter) and the one closing
    * double expression both engines evaluate identically. */
  def hllEstimate(regs: DataFrame): DataFrame =
    regs
      // 2^(57-mk) is an exact long (mk >= 1); summed as DECIMAL below so
      // even the all-registers-at-rank-1 extreme cannot overflow
      .withColumn("w",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(57 - mk AS INT))"))
      .groupBy(col("g")).agg(
        count(lit(1)).as("m_used"),
        sum(col("w").cast("decimal(38,0)")).as("zs"))
      // untouched registers contribute rank 0 -> weight 2^57 each
      .withColumn("z", col("zs") +
        (lit(HllM.toLong) - col("m_used")).cast("decimal(38,0)") *
          lit(TwoPow57))
      .withColumn("hll_ndv",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0) *
          lit(1.44115188075855872e17) / col("z").cast("double"))
      .select(col("g"), col("m_used"), col("hll_ndv"))

  def hllNdv(df: DataFrame, key: Column, group: Column): DataFrame = {
    val sketch = hllEstimate(hllRegisters(df, key, group))
    // the exact baseline rides along for the gate; a production run at
    // scale drops this branch — it is the cost the sketch avoids
    val exact = df.select(group.as("g"), key.as("kk"))
      .groupBy(col("g"))
      .agg(countDistinct(col("kk")).as("n_exact"))
    exact.join(sketch, "g")
      .select(col("g"), col("n_exact"), col("m_used"), col("hll_ndv"))
  }

  /** The MERGE path of the HLL sketch — the property that makes it a
    * distributed sketch at all: each `shard` builds its own (register,
    * max-rank) sketch independently (what a 1000-executor fleet would
    * ship to the coordinator: m pairs per shard, never keys), and the
    * shards combine by register-wise MAX. Because max is associative and
    * commutative, merge(shard sketches) == sketch(whole corpus) exactly
    * — so the direct one-group twin gates this two-stage path
    * bit-for-bit, and SketchSpec asserts the equality against [[hllNdv]]
    * in-engine too. Returns one row ('all', n_exact, m_used, hll_ndv). */
  def hllNdvMerged(df: DataFrame, key: Column, shard: Column): DataFrame = {
    val h = xxhash64(key)
    val rem = shiftrightunsigned(h, 8)
    val rows = df.select(shard.as("sh"), key.as("kk"),
      h.bitwiseAND(lit((HllM - 1).toLong)).as("r"),
      when(rem === 0L, lit(57))
        .otherwise(lit(57) - length(bin(rem))).as("k0"))
    val perShard = rows.groupBy(col("sh"), col("r"))
      .agg(max(col("k0")).as("mk"))
    val merged = perShard.groupBy(col("r")).agg(max(col("mk")).as("mk"))
      .withColumn("w",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(57 - mk AS INT))"))
    val sketch = merged.agg(
        count(lit(1)).as("m_used"),
        sum(col("w").cast("decimal(38,0)")).as("zs"))
      .withColumn("z", col("zs") +
        (lit(HllM.toLong) - col("m_used")).cast("decimal(38,0)") *
          lit(TwoPow57))
      .withColumn("hll_ndv",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0) *
          lit(1.44115188075855872e17) / col("z").cast("double"))
    val exact = rows.agg(countDistinct(col("kk")).as("n_exact"))
    exact.crossJoin(sketch)
      .select(lit("all").as("source"), col("n_exact"), col("m_used"),
        col("hll_ndv"))
  }

  /** MERGEABLE QUANTILE SKETCH on a base-2 exponential lattice — the
    * percentile complement of [[hllNdvMerged]]: bounded memory, exact
    * integer arithmetic, and merge(shard sketches) == direct sketch
    * BIT-FOR-BIT (bucket counts merge by SUM, which is associative and
    * commutative — stronger than GK/KLL, whose merge is only
    * error-bounded, and deterministic cross-engine unlike t-digest).
    *
    * The lattice (the log-free core of a DDSketch-style relative-error
    * histogram): nonnegative integer values below 2^[[QLatticeBase]] map
    * to themselves (exact); larger values map to octave
    * e = bitlength(v) (`length(bin(v))` — the repo's transcendental-free
    * floor-log2) plus the next [[QLatticeBits]] mantissa bits. Bucket
    * width / lower bound <= 2^-QLatticeBits, so every reported quantile
    * is a true value lower bound within 6.25% relative error, and the
    * whole domain of 63-bit values needs <= 960 buckets — the sketch a
    * 1000-executor fleet ships per group instead of the full value set.
    */
  val QLatticeBits = 4
  private val QLatticeBase = 1L << QLatticeBits // values below stay exact

  /** Lattice bucket id of a nonnegative long `v` (monotone in v). */
  def latticeBucket(v: Column): Column = {
    val e = length(bin(v)).cast("int") // bitlength: floor(log2 v) + 1
    val s = e - (QLatticeBits + 1)     // mantissa shift for this octave
    when(v < QLatticeBase, v).otherwise(
      s.cast("long") * QLatticeBase +
        call_function("shiftright", v, s))
  }

  /** Lower bound of lattice bucket `b` — the deterministic quantile
    * representative (exact inverse of [[latticeBucket]]'s truncation). */
  def latticeLow(b: Column): Column = {
    val s = call_function("div", b, lit(QLatticeBase)) - 1L
    when(b < QLatticeBase, b).otherwise(
      call_function("shiftleft", b - s * QLatticeBase, s.cast("int")))
  }

  /** The MERGE path of the quantile sketch: each `shard` builds its own
    * bounded (bucket, count) histogram (map-side combined — at most ~960
    * rows per shard per group leave an executor), shards merge by bucket
    * SUM, and each requested percentile is the lattice lower bound of
    * the smallest bucket whose merged cumulative count reaches
    * `(p*n + 99) div 100` — the repo's histogram order-statistic
    * convention, applied to the bucket lattice instead of the raw value
    * lattice. The per-group window runs over the BOUNDED merged
    * histogram (<= 960 rows per group by construction), never the
    * rows. Returns (g, n, q_<p> ...) with quantiles in the input's
    * integer units. */
  def latticeQuantilesMerged(df: DataFrame, value: Column, group: Column,
      shard: Column, ps: Seq[Int]): DataFrame = {
    val perShard = df
      .select(group.as("g"), shard.as("sh"), latticeBucket(value).as("bk"))
      .groupBy(col("g"), col("sh"), col("bk")).agg(count(lit(1)).as("c"))
    latticeQuantiles(
      perShard.groupBy(col("g"), col("bk")).agg(sum(col("c")).as("c")), ps)
  }

  /** The sketch itself as a table: per-group (g, bk, c) bucket counts —
    * what a shard PERSISTS (a few hundred rows per group at any corpus
    * size); stores merge by unioning and re-summing per bucket, exactly
    * the [[latticeQuantilesMerged]] in-flight path at rest. */
  def latticeHistogram(df: DataFrame, value: Column,
      group: Column): DataFrame =
    df.select(group.as("g"), latticeBucket(value).as("bk"))
      .groupBy(col("g"), col("bk")).agg(count(lit(1)).as("c"))

  /** Quantiles off a (g, bk, c) bucket histogram (merged or single):
    * smallest bucket whose cumulative count reaches (p*n + 99) div 100,
    * reported as the bucket's lattice lower bound. The window runs over
    * the BOUNDED histogram (<= ~960 rows per group by construction). */
  def latticeQuantiles(hist: DataFrame, ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 100))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("bk"))
      .rowsBetween(Long.MinValue, 0)
    val cum = hist.withColumn("cum", sum(col("c")).over(wc))
      .withColumn("low", latticeLow(col("bk")))
    val n = hist.groupBy(col("g")).agg(sum(col("c")).as("n"))
    def pct(p: Int) =
      min(when(col("cum") >= expr(s"($p * n + 99) div 100"), col("low")))
        .as(s"p$p")
    cum.join(n, "g")
      .groupBy(col("g"), col("n"))
      .agg(pct(ps.head), ps.tail.map(pct): _*)
  }

  /** COUNT-MIN SKETCH heavy hitters: word frequencies estimated from a
    * d x w counter matrix (bounded memory — d*w longs regardless of
    * vocabulary size), estimate = min over the d seeded rows. Collisions
    * only ever OVER-count, so n_cms >= n_exact is a structural
    * invariant the gate can check row by row.
    *
    * The top-k itself uses the bounded [[Sampling.topKByKey]] aggregate
    * (key = -count), NOT a vocabulary-wide rank window — at corpus scale
    * the vocabulary is millions of rows and must never funnel through
    * one sort partition. The exact counts ride along as the baseline the
    * sketch replaces. Words key through their md5 hex prefix (a 60-bit
    * long both engines can derive), then the per-seed bucket is Spark's
    * xxhash64(key, seed) — the two-step chain an oracle replays.
    * Returns (rk, word, n_exact, n_cms) for the top `topK` words by
    * exact count (ties by key). */
  /** The CMS counter MATRIX itself — (sd, bucket, n), the d x w bounded
    * state a sketch build maintains. Works on a STREAMING input too:
    * the aggregation's group count is bounded by the geometry (d*w rows
    * regardless of stream length), which is what makes a complete-mode
    * streaming CMS legitimate at any scale. */
  def cmsMatrix(docs: DataFrame, text: Column,
      d: Int = 4, w: Int = 16): DataFrame = {
    require(d > 0 && w > 0)
    val seeds = array((0 until d).map(i => lit(i.toLong)): _*)
    docs.select(explode(split(Dedup.normalized(text), " ")).as("word"))
      .withColumn("k",
        conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long"))
      .select(col("k"), explode(seeds).as("sd"))
      .withColumn("bucket", pmod(xxhash64(col("k"), col("sd")),
        lit(w.toLong)))
      .groupBy(col("sd"), col("bucket")).agg(count(lit(1)).as("n"))
  }

  def cmsTopWords(docs: DataFrame, text: Column, topK: Int,
      d: Int = 4, w: Int = 16): DataFrame = {
    require(topK > 0 && d > 0 && w > 0)
    val words = docs
      .select(explode(split(Dedup.normalized(text), " ")).as("word"))
      .withColumn("k",
        conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long"))
    val seeds = array((0 until d).map(i => lit(i.toLong)): _*)
    def bucket(k: Column, sd: Column): Column =
      pmod(xxhash64(k, sd), lit(w.toLong))
    val sketch = cmsMatrix(docs, text, d, w).withColumnRenamed("n", "c")
    val exact = words.groupBy(col("word"), col("k"))
      .agg(count(lit(1)).as("n_exact"))
    val top = exact
      .agg(Sampling.topKByKey(-col("n_exact"), col("k"), topK).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "s")))
      .select((col("pos") + 1).cast("int").as("rk"),
        col("s.id").as("k"), (-col("s.key")).as("n_exact"))
    val est = top
      .withColumn("sd", explode(seeds))
      .withColumn("bucket", bucket(col("k"), col("sd")))
      .join(broadcast(sketch), Seq("sd", "bucket"))
      .groupBy(col("rk"), col("k"), col("n_exact"))
      .agg(min(col("c")).as("n_cms"))
    est.join(exact.select(col("k"), col("word")), "k")
      .select(col("rk"), col("word"), col("n_exact"), col("n_cms"))
  }
}
