package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (driver north
  * star): language-ID, quality scoring, token counting, fingerprinting.
  * Every formula is a pure Catalyst column expression built from exact
  * integer counts, so results hash-match the DuckDB oracle bit-for-bit.
  */
object TextAnalysis {

  /** Count word-boundary regex matches. */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  // Small per-language stopword marker sets (n-gram heuristic grade).
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "nicht"),
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "los", "que", "es"),
    "fr" -> Seq("le", "les", "des", "est"),
    "zh" -> Seq("de", "shi", "bu", "le"))

  /** Per-language stopword-hit score. */
  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => countMatches(text, s"\\b$m\\b")).reduce(_ + _)

  /** Predicted language: highest marker score; ties resolve in fixed
    * alphabetical priority (deterministic, oracle-replicable CASE chain). */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> langScore(text, ms) }
    scores.foldRight(lit("und")) { case ((lang, score), rest) =>
      val geAll = scores.map(_._2).map(score >= _).reduce(_ && _)
      when(score > 0 && geAll, lit(lang)).otherwise(rest)
    }
  }

  def wordCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword token count: letter runs, digit runs, and individual
    * punctuation marks each count as one token. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  def punctRatio(text: Column): Column =
    countMatches(text, "[.!?,;:]").cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def stopwordRatio(text: Column): Column =
    langScore(text, Seq("the", "and", "of", "is", "a", "to", "in")).cast("double") /
      greatest(wordCount(text), lit(1)).cast("double")

  def meanWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(wordCount(text), lit(1)).cast("double")

  /** Composite quality score in ~[0,1]: long enough, low punctuation
    * noise, natural stopword density, plausible word length. The exact
    * formula is arbitrary but fixed — both engines compute it identically
    * from exact integer counts. */
  def qualityScore(text: Column): Column = {
    val lenOk = least(length(text).cast("double") / 400.0, lit(1.0))
    val punctOk = when(punctRatio(text) <= 0.05, 1.0).otherwise(0.5)
    val stopOk = least(stopwordRatio(text) * 5.0, lit(1.0))
    val wordOk = when(meanWordLen(text).between(3.0, 9.0), 1.0).otherwise(0.5)
    lenOk * 0.4 + punctOk * 0.2 + stopOk * 0.2 + wordOk * 0.2
  }

  /** Content-defined document fingerprint (md5 over normalized text). */
  def fingerprint(text: Column): Column = Dedup.fingerprint(text)
}
