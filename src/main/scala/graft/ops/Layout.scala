package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * move that makes a 100 TB table prunable on BOTH of two predicate
  * columns at once: interleaving the bits of two dimensions gives a
  * 1-D sort key whose contiguous ranges are small axis-aligned tiles in
  * (x, y) space, so range-partitioned files carry tight per-file min/max
  * on each ORIGINAL column and a scan with predicates on either (or
  * both) skips most files on parquet footer stats alone. A plain sort on
  * x gives perfect x-pruning and zero y-pruning; the Morton key buys
  * near-sqrt pruning on both.
  *
  * Everything here is exact integer bit arithmetic, identical in Spark
  * and DuckDB (`&`, `>>`, `<<`), so tile layouts hash-gate end to end.
  */
object Layout {

  /** Bits per dimension (32-bit Morton codes). Production picks this per
    * dimension from the column's value range; 16 covers both gated dims
    * here (wrap-around beyond 2^16 is the caller's normalization job). */
  val Bits = 16

  /** Morton-interleave two pre-masked long columns (x in even bit
    * positions, y in odd): disjoint bit contributions summed — a pure
    * codegen'd integer expression, no UDF. */
  def interleaveBits(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The same interleave as a DuckDB SQL expression over two pre-masked
    * BIGINT expressions — generated from the same Bits constant. */
  def interleaveBitsSql(x: String, y: String): String =
    (0 until Bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Morton-code right-shift that yields the tile id at `level` — THE
    * shared constant both the Spark tileId and the DuckDB twins derive
    * their shift from (hardcoding it on one side desynchronizes the
    * oracle the moment Bits or the gate's level moves). */
  def tileShift(level: Int): Int = 2 * (Bits - level)

  /** Quadtree tile id at `level` subdivisions per axis: the top `level`
    * interleaved bit pairs of the Morton code. Every tile is an
    * axis-aligned square of side 2^(Bits - level) — the invariant
    * LayoutSpec asserts and zorder_stats exposes as per-tile spans. */
  def tileId(z: Column, level: Int): Column =
    shiftright(z, tileShift(level))

  /** Physically lay a DataFrame out in Morton order: range-partition on
    * the z key (Spark samples split points — an even-sized distributed
    * sort, never a single-task funnel), sort within each partition, and
    * write one file per range. Downstream scans prune on parquet footer
    * min/max of the ORIGINAL columns, which the Morton order keeps tight
    * per file. */
  def zorderWrite(df: DataFrame, zCol: Column, outDir: String,
      nFiles: Int): Unit =
    df.withColumn("__z", zCol)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
}
