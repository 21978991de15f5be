package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-gate for anti-join dedup (reference incremental-resume
  * shape, BryanL43/MergeExtractor mergeExtractor.py:64-82, re-expressed as
  * a set-membership sketch): a k-hash bitset over the at-rest fingerprint
  * store, built by ONE aggregation whose output is bounded by the bitset
  * size (a design constant, not the data), broadcast into the batch scan
  * as a literal.
  *
  * Why it matters at 100 TB: a plain `batch ANTI JOIN store` shuffles the
  * ENTIRE batch against the ENTIRE store every ingest. With the bloom
  * pre-gate, bloom-negative rows (the overwhelming majority of a mostly-
  * novel batch) are admitted map-side — zero shuffle — and only
  * bloom-POSITIVE rows (true duplicates + the ~1% false-positive tail)
  * pay the exact confirm join. The bloom can never produce a false
  * NEGATIVE, so the composed result is bit-identical to the plain
  * anti-join — which is exactly what the DuckDB gate checks.
  *
  * Everything stays in whole-stage codegen: the membership test is
  * element_at + shiftright + bitwiseAND over a literal long array — no
  * UDF, no broadcast variable plumbing.
  */
object Bloom {

  /** Bit positions of the key columns under k hashes derived from TWO
    * XXH64 evaluations (the double-hashing idea of Kirsch &
    * Mitzenmacher 2006, "Less Hashing, Same Performance"): position_i
    * = (h1 XOR rotate(h2, r_i)) mod m, with a distinct nonzero
    * rotation per i. XOR-rotate rather than the classic h1 + i*h2
    * because ANSI mode rejects the intended mod-2^64 wraparound of
    * the multiply; bitwise ops cannot overflow, and each position
    * still mixes the full width of both hashes. The probe cost is 2
    * hashes regardless of k — which matters when the probe sits on a
    * 10^7-row wedge or batch scan. Multi-column keys hash the columns
    * DIRECTLY (xxhash64 is variadic) — no per-row struct allocation.
    * Shared by build and probe so they can never disagree; false
    * positives from the weaker-than-independent family are confirmed
    * exactly downstream like any other.
    *
    * k-SENSITIVITY (measured r13, 20M-row probe, local[32], warm,
    * all-positive bitset so every conjunct evaluates): k=1..3 ~90-130
    * Mrows/s (flat — codegen CSE collapses the two hash evals), k=4 ~55,
    * k=6 ~40, k=8 ~27 (the bitwise/element_at chain grows linearly),
    * k=12 ~1.2 Mrows/s — a 20x CLIFF where the generated filter method
    * outgrows the JVM's JIT inlining/compilation budget and runs
    * interpreted (the plan still shows WholeStageCodegen; the
    * regression is bytecode-size-induced). Hence the hard cap at 8:
    * every in-repo use is k<=6, and past k=8 a bigger m is always the
    * better FPR lever than more hashes. */
  private def positions(keys: Seq[Column], mBits: Int, k: Int): Seq[Column] = {
    require(k <= 8, s"bloom hash count capped at 8 (measured JIT cliff " +
      s"above it — see the k-sensitivity note), got $k")
    val h1 = xxhash64(keys: _*)
    val h2 = xxhash64((keys :+ lit(0x9E3779B97F4A7C15L)): _*)
    (0 until k).map { i =>
      val r = (i * 23 + 7) % 64 // distinct and nonzero for i < 16
      val rot = shiftrightunsigned(h2, r).bitwiseOR(shiftleft(h2, 64 - r))
      pmod(h1.bitwiseXOR(rot), lit(mBits.toLong))
    }
  }

  /** Build the bitset: explode the k positions per key, OR them into
    * 64-bit words, collect. The collect is bounded by mBits/64 words — a
    * design constant (8 KiB at mBits = 2^16) independent of store size,
    * the same boundedness class as the IVF centroid collects. */
  def buildBits(store: DataFrame, key: Column, mBits: Int, k: Int): Array[Long] =
    buildBits(store, Seq(key), mBits, k)

  /** Multi-column-key build: columns are hashed directly, no struct. */
  def buildBits(store: DataFrame, keys: Seq[Column], mBits: Int, k: Int): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0,
      s"mBits must be a positive multiple of 64, got $mBits")
    require(k > 0, s"bloom hash count must be positive, got $k")
    val words = store
      .select(explode(array(positions(keys, mBits, k): _*)).as("__p"))
      .groupBy(shiftright(col("__p"), 6).as("__w"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(__p & 63 AS INT))"))
        .as("__bits"))
      .collect()
    val out = new Array[Long](mBits / 64)
    words.foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
    out
  }

  /** Membership test against a built bitset: all k bits set. Pure
    * Catalyst over a literal array — codegen'd, map-stage. False
    * positives possible (confirm exactly downstream); false negatives
    * impossible (each insert set exactly these bits). */
  def mightContain(key: Column, bits: Array[Long], k: Int): Column =
    mightContain(Seq(key), bits, k)

  /** Multi-column-key probe: columns are hashed directly, no struct.
    * The bitset literal is an [[UnsafeArrayData]] over the primitive
    * long array — element access in generated code is a flat offset
    * read, no boxing, regardless of bitset size. */
  def mightContain(keys: Seq[Column], bits: Array[Long], k: Int): Column = {
    val words = org.apache.spark.sql.graft.GraftInternal.primitiveLongArrayLit(bits)
    positions(keys, bits.length * 64, k).map { p =>
      val word = element_at(words, (shiftright(p, 6) + lit(1)).cast("int"))
      call_function("shiftright", word, p.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
