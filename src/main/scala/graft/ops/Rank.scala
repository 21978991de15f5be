package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T8/T9/O3: embedding-cosine + rerank hybrid scoring (SURVEY.md §2.7).
  * Cosine is pure Catalyst (`zip_with` + `aggregate` higher-order functions
  * — no UDF), so it runs inside codegen and scales as a map-side column op.
  */
object Rank {
  /** Dot product of two float-array columns, accumulated in double in index
    * order (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm of a float-array column. */
  def l2norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity with zero-vector guard. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2norm(a) * l2norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** T9 hybrid score: 0.4*cosine + 0.6*rerank
    * (src/dependencies/ChunkProcessor.py:319-320). */
  def hybrid(cos: Column, rerank: Column): Column =
    cos * 0.4 + rerank * 0.6

  /** Deterministic stand-in for the cross-encoder score (already sigmoid'd
    * to [0,1] like the reference applies): fraction of distinct query terms
    * present in the chunk — a linear-time columnar op (`fuzz_partial_ratio`
    * is quadratic in the query and reserved for short entity strings). A
    * pluggable external scorer replaces this via graft.io.Reranker. */
  def pseudoRerank(query: Column, chunk: Column): Column = {
    val qTerms = array_distinct(split(lower(query), "\\s+"))
    val hits = size(filter(qTerms, t => contains(lower(chunk), t)))
    val sim = hits.cast("double") / greatest(size(qTerms), lit(1)).cast("double")
    lit(1.0) / (lit(1.0) + exp(-(sim * 8.0 - 4.0)))
  }

  /** O3: deterministic top-1 per group — highest score, lowest tiebreak
    * (the reference keeps whichever future finished first; SURVEY §2.5 O4
    * mandates a deterministic rule instead). */
  def top1(df: DataFrame, groupCol: String, scoreCol: String,
      tiebreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(tiebreakCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
