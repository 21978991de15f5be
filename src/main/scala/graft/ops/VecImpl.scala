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

  /** Fused PQ encoder: per subspace, the argmax fixed-point-dot codebook
    * cell (ties -> lowest cell) in one pass over the vector — replaces
    * the subspaces x cells expression tree (256 ScaledDot nodes with a
    * slice() allocation each at the default geometry) with a single
    * static call, which keeps the target-encode projection inside a
    * compact whole-stage-codegen method. Semantics identical term for
    * term: same roundAway fixed-point dot, same min-length clip as
    * `scaledDot` over a `slice`, same tie rule as `nearestCell`
    * (strict >, so the first/lowest cell wins). */
  def pqEncode(v: ArrayData, cbs: Array[Array[Array[Float]]]): ArrayData = {
    val m = cbs.length
    val out = new Array[Int](m)
    val n = v.numElements()
    var s = 0
    var base = 0
    while (s < m) {
      val cb = cbs(s)
      val subDim = cb(0).length
      val lim = math.max(math.min(subDim, n - base), 0)
      var best = Long.MinValue
      var bestCell = 0
      var cell = 0
      while (cell < cb.length) {
        val c = cb(cell)
        var sum = 0L
        var i = 0
        while (i < lim) {
          sum += roundAway(v.getFloat(base + i).toDouble * c(i).toDouble * 1e6)
          i += 1
        }
        if (sum > best) { best = sum; bestCell = cell }
        cell += 1
      }
      out(s) = bestCell
      base += subDim
      s += 1
    }
    ArrayData.toArrayData(out)
  }
}
