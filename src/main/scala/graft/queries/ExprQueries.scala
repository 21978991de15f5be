package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftFunctions._
import graft.util.Tables._

/** Queries exercising the custom Catalyst expressions (SURVEY.md §2.8 UDF
  * mapping): month-shift date windows (F2), NFKC+ASCII fold (F10), and the
  * recursive chunker Generator (T1).
  */
object ExprQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // F2: the reference's crawl date window [date-4mo, date+4mo] with
    // day-reset-on-invalid semantics (custom MonthShiftReset expression).
    "f2_month_shift" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_orderkey" < 1000)
        .select($"o_orderkey",
          month_shift_reset($"o_orderdate".cast(DateType), -4, rollForward = false)
            .as("win_lo"),
          month_shift_reset($"o_orderdate".cast(DateType), 4, rollForward = true)
            .as("win_hi"))
        .orderBy($"o_orderkey")
    }),

    // F10: NFKC + ASCII fold. The appended non-ASCII marker must be dropped,
    // so the oracle is the untouched column — a real semantic check on the
    // fold; compatibility expansion is covered by NfkcAsciiSpec.
    "f10_nfkc_fold" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          nfkc_ascii(concat($"text", lit(" café”"))).as("cleaned"))
        .orderBy($"doc_id")
    }),

    // T1: recursive character chunking as a Generator (posexplode-style).
    // Full recursive semantics aren't SQL, but the chunker's INVARIANTS
    // are provable from its construction (chunks = trimmed contiguous
    // merge windows) and SQL-checkable as constant-TRUE booleans: size
    // bound, non-emptiness, substring containment, trimmed prefix/suffix
    // alignment, and non-whitespace coverage. The exact chunk values are
    // covered by ChunkSplitSpec golden + property tests.
    "t1_chunk_split" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", $"text", chunk_split($"text", 120, 20))
        .groupBy($"doc_id")
        .agg(
          max(length($"chunk")).as("__maxl"),
          min(length($"chunk")).as("__minl"),
          every(instr($"text", $"chunk") > 0).as("all_substrings"),
          min_by($"chunk", $"chunk_idx").as("__first"),
          max_by($"chunk", $"chunk_idx").as("__last"),
          sum(length($"chunk")).as("__suml"),
          any_value($"text").as("__text"))
        .select($"doc_id",
          ($"__maxl" <= 120).as("within_size"),
          ($"__minl" >= 1).as("nonempty"),
          $"all_substrings",
          startswith(trim($"__text"), $"__first").as("starts_ok"),
          endswith(trim($"__text"), $"__last").as("ends_ok"),
          ($"__suml" >=
            length(regexp_replace($"__text", "\\s", ""))).as("covered_ok"))
        .orderBy($"doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "f2_month_shift" ->
      """SELECT o_orderkey,
        | CAST(CASE WHEN d <= day(last_day(lo0)) THEN lo0 + (d-1)*INTERVAL 1 DAY
        |           ELSE lo0 END AS DATE) AS win_lo,
        | CAST(CASE WHEN d <= day(last_day(hi0)) THEN hi0 + (d-1)*INTERVAL 1 DAY
        |           ELSE hi0 + INTERVAL 1 MONTH END AS DATE) AS win_hi
        |FROM (
        |  SELECT o_orderkey, day(CAST(o_orderdate AS DATE)) AS d,
        |    CAST(date_trunc('month', CAST(o_orderdate AS DATE)) - INTERVAL 4 MONTH AS DATE) AS lo0,
        |    CAST(date_trunc('month', CAST(o_orderdate AS DATE)) + INTERVAL 4 MONTH AS DATE) AS hi0
        |  FROM orders WHERE o_orderkey < 1000)
        |ORDER BY o_orderkey""".stripMargin,
    "f10_nfkc_fold" ->
      """SELECT doc_id, text || ' caf' AS cleaned
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // Constant-TRUE invariant twin: any chunker defect that breaks the
    // size bound, containment, alignment, or coverage flips a boolean and
    // fails the hash compare.
    "t1_chunk_split" ->
      """SELECT doc_id, TRUE AS within_size, TRUE AS nonempty,
        | TRUE AS all_substrings, TRUE AS starts_ok, TRUE AS ends_ok,
        | TRUE AS covered_ok
        |FROM documents
        |ORDER BY doc_id""".stripMargin
  )
}
