package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal, UnsafeArrayData}
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Narrow internal-API shims that need the `org.apache.spark.sql`
  * package for access, kept separate from the Expression definitions.
  */
object GraftInternal {

  /** A literal `array<bigint>` backed by [[UnsafeArrayData]] over the
    * primitive array — `element_at` against it compiles to a flat
    * word-offset read. The public `typedlit(Seq[Long])` round-trips
    * through a boxed [[org.apache.spark.sql.catalyst.util
    * .GenericArrayData]], which costs an allocation-free probe loop
    * (e.g. [[graft.ops.Bloom.mightContain]] over 10^7 rows) a boxed
    * `java.lang.Long` per element access. */
  def primitiveLongArrayLit(values: Array[Long]): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(Literal(
      UnsafeArrayData.fromPrimitiveArray(values),
      ArrayType(LongType, containsNull = false)))
}
