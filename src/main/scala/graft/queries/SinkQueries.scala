package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sinks
import graft.util.Tables._
import graft.util.TempDirs

/** Driver-gated roundtrips for the sink family (SURVEY.md §2.1 S5-S10):
  * each query WRITES through the real sink into a fresh temp directory and
  * returns the read-back as its result, so the DuckDB twin checks the full
  * write -> (prune/overwrite) -> read lineage, not just the plan.
  */
object SinkQueries {
  type Q = (SparkSession, String) => DataFrame

  private def tmpDir(prefix: String): String = TempDirs.create(prefix)

  val queries: Map[String, Q] = Map(
    // S5/S6 + S8: bucketed parquet append, then a dynamic-partition-
    // overwrite merge-update of every 10th doc, read back in full.
    "s8_bucketed_update_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val path = tmpDir("graft-s8")
      val docs = t(s, dir, "documents")
        .select($"doc_id", $"source", length($"text").as("tlen"))
      Sinks.writeBucketed(docs, path, "doc_id")
      val updates = t(s, dir, "documents")
        .filter($"doc_id" % 10 === 0)
        .select($"doc_id", lit("updated").as("source"))
      Sinks.mergeUpdate(s, path, "doc_id", updates, "source")
      s.read.parquet(path)
        .select($"doc_id", $"source", $"tlen")
        .orderBy($"doc_id")
    }),

    // S7: point lookups against the bucketed layout — the explicit bucket
    // predicate statically prunes to one partition directory per key.
    "s7_point_lookup" -> ((s, dir) => {
      import s.implicits._
      val path = tmpDir("graft-s7")
      val docs = t(s, dir, "documents")
        .select($"doc_id", $"source", length($"text").as("tlen"))
      Sinks.writeBucketed(docs, path, "doc_id")
      Seq(7L, 42L, 137L)
        .map(i => Sinks.pointLookup(s, path, "doc_id", i))
        .reduce(_ unionByName _)
        .select($"doc_id", $"source", $"tlen")
        .orderBy($"doc_id")
    }),

    // S9: ordered single-file CSV with header, read back through the CSV
    // parser (exercises ordering, header naming, and value quoting).
    "s9_csv_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val path = tmpDir("graft-s9")
      val docs = t(s, dir, "documents")
        .select($"doc_id", $"source", length($"text").as("tlen"))
      Sinks.orderedCsv(docs, path, "doc_id")
      s.read.option("header", "true")
        .schema("doc_id LONG, source STRING, tlen INT")
        .csv(path)
        .orderBy($"doc_id")
    }),

    // S10: one text file per record via foreachPartition, read back with
    // wholetext + input_file_name — checks the name scheme and the exact
    // URL-header + body framing.
    "s10_dump_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val path = tmpDir("graft-s10")
      val docs = t(s, dir, "documents").select(
        $"doc_id".as("main_index"),
        concat(lit("Acme"), $"doc_id".cast("string")).as("company_a"),
        concat(lit("Beta"), $"doc_id".cast("string")).as("company_b"),
        concat(lit("https://example.test/doc/"), $"doc_id".cast("string"))
          .as("url"),
        $"text".as("content"))
      Sinks.dumpFiles(docs, path)
      s.read.option("wholetext", "true").text(path)
        .select(element_at(split(input_file_name(), "/"), -1).as("fname"),
          length($"value").as("body_len"))
        .orderBy($"fname")
    })
  )

  val oracles: Map[String, String] = Map(
    "s8_bucketed_update_roundtrip" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0 THEN 'updated' ELSE source END AS source,
        |  CAST(length(text) AS INT) AS tlen
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "s7_point_lookup" ->
      """SELECT doc_id, source, CAST(length(text) AS INT) AS tlen
        |FROM documents
        |WHERE doc_id IN (7, 42, 137)
        |ORDER BY doc_id""".stripMargin,
    "s9_csv_roundtrip" ->
      """SELECT doc_id, source, CAST(length(text) AS INT) AS tlen
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "s10_dump_roundtrip" ->
      """SELECT CAST(doc_id AS VARCHAR) || '_Acme' || CAST(doc_id AS VARCHAR)
        |  || '_&_Beta' || CAST(doc_id AS VARCHAR) || '.txt' AS fname,
        |  CAST(length('URL: https://example.test/doc/')
        |    + length(CAST(doc_id AS VARCHAR)) + 2 + length(text) AS INT)
        |    AS body_len
        |FROM documents
        |ORDER BY fname""".stripMargin
  )
}
