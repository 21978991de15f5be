package graft.ops

import org.apache.spark.sql.catalyst.util.ArrayData

/** Vector kernels callable from generated code. */
object VecImpl {
  /** Ties-away-from-zero rounding on the binary double — agrees with both
    * Spark `round` and DuckDB `round` for every double. */
  private def roundAway(v: Double): Long =
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong

  /** sum_i round(a_i * b_i * 1e6) over float arrays, accumulated in long —
    * exact, order-independent, cross-engine reproducible. */
  def scaledDot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += roundAway(a.getFloat(i).toDouble * b.getFloat(i).toDouble * 1e6)
      i += 1
    }
    sum
  }
}
