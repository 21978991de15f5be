package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.{ChunkSplit, FuzzPartialRatio, FuzzRatio, MonthShiftReset, NfkcAscii, internal}

/** Column-API + SQL surface for the engine's custom Catalyst expressions.
  *
  * All of these are native `Expression`s (codegen-friendly; no Scala UDF
  * boxing): nodes in org.apache.spark.sql.graft, algorithms in graft.expr.
  * SQL names are registered per-session via [[GraftFunctions.register]]
  * (idempotent).
  */
object GraftFunctions {
  private def col(e: Expression): Column = internal.column(e)
  private def ex(c: Column): Expression = internal.expression(c)

  /** rapidfuzz-style normalized Indel similarity, 0..100. */
  def fuzz_ratio(a: Column, b: Column): Column = col(FuzzRatio(ex(a), ex(b)))

  /** rapidfuzz-style best-window similarity, 0..100. */
  def fuzz_partial_ratio(a: Column, b: Column): Column =
    col(FuzzPartialRatio(ex(a), ex(b)))

  /** NFKC normalize + drop non-ASCII (reference F10). */
  def nfkc_ascii(c: Column): Column = col(NfkcAscii(ex(c)))

  /** Month shift with day-reset-to-1 fallback semantics (reference F2). */
  def month_shift_reset(d: Column, months: Int, rollForward: Boolean): Column =
    col(MonthShiftReset(ex(d), Literal(months), Literal(rollForward)))

  /** Generator: split text into ordered (chunk_idx, chunk) rows (T1). */
  def chunk_split(c: Column, chunkSize: Int = 2048, overlap: Int = 400): Column =
    col(ChunkSplit(ex(c), chunkSize, overlap))

  /** Register SQL names for `spark.sql` use; safe to call repeatedly. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def lit(e: Expression): Any = e match {
      case Literal(v, _) => v
      case other => throw new IllegalArgumentException(
        s"expected literal argument, got $other")
    }
    reg.createOrReplaceTempFunction("fuzz_ratio",
      es => FuzzRatio(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("fuzz_partial_ratio",
      es => FuzzPartialRatio(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("nfkc_ascii",
      es => NfkcAscii(es.head), "built-in")
    reg.createOrReplaceTempFunction("month_shift_reset",
      es => MonthShiftReset(es.head, es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("chunk_split",
      es => ChunkSplit(es.head,
        lit(es(1)).asInstanceOf[Int], lit(es(2)).asInstanceOf[Int]), "built-in")
  }
}
