package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sinks
import graft.ops.Assemble
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

  /** The T12 enrichment preamble — the canonical copy lives in
    * [[graft.ops.Assemble.EnrichPreamble]] (the patch skip-check keys on
    * its prefix, patchabbrev.py:186). */
  private val PatchPreamble: String = Assemble.EnrichPreamble

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
    // predicate statically prunes to one partition directory per key. The
    // store is built once per testdata dir (TempDirs.cached): the lookup,
    // not the staging write, is the operator under test.
    "s7_point_lookup" -> ((s, dir) => {
      import s.implicits._
      val path = TempDirs.cached("s7-store", dir) { p =>
        val docs = t(s, dir, "documents")
          .select($"doc_id", $"source", length($"text").as("tlen"))
        Sinks.writeBucketed(docs, p, "doc_id")
      }
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

    // S9 at scale: the SAME ordered-CSV contract through the documented
    // scale path — range-partitioned sorted files instead of a single-task
    // coalesce(1). The read-back is the identical row set (same oracle
    // shape as s9), proving the two sinks are interchangeable: per-file
    // order + range-ordered file boundaries reassemble to the global
    // order, with write parallelism = partitions instead of 1.
    "s9_range_sorted" -> ((s, dir) => {
      import s.implicits._
      val path = tmpDir("graft-s9b")
      val docs = t(s, dir, "documents")
        .select($"doc_id", $"source", length($"text").as("tlen"))
      graft.ops.Scale.rangeSortedWrite(docs, path, "doc_id", partitions = 8)
      s.read.option("header", "true")
        .schema("doc_id LONG, source STRING, tlen INT")
        .csv(path)
        .orderBy($"doc_id")
    }),

    // S8+F7b+F17+T11/T12 composed: the reference's abbreviation re-patch
    // tool (tools/patchabbrev.py:165-229) as one lineage over the bucketed
    // store — read the extracted sections, skip already-enriched rows
    // (preamble prefix) and token-clean rows (T13 incl. hyphen fallback),
    // re-fetch + clean the raw filing for the rest (html -> leaf blocks,
    // curly-quote fold — WITHOUT which the T11 definition regex cannot
    // match), chunk, regenerate the abbreviation block, merge-update only
    // the touched buckets, and read the store back in full.
    "s8_patch_roundtrip" -> ((s, dir) => {
      import s.implicits._
      import graft.ops.{Assemble, Normalize}
      val path = tmpDir("graft-patch")
      val ids = $"doc_id".cast("string")
      val m = $"doc_id" % 3
      val companyA = concat(lit("Acme"), ids, lit(" Systems Inc"))
      val companyB = concat(lit("Beta"), ids, lit(" Holdings Corp"))
      val hdr = Assemble.headerLine(companyA, companyB)
      // initial store: m0 already-enriched, m1 clean, m2 needs the patch
      val content0 =
        when(m === 0, concat(lit(PatchPreamble), lit("already enriched body")))
        .when(m === 1, concat(hdr, lit("acme"), ids, lit(" and beta"), ids,
          lit(" met to discuss. "), substring($"text", 1, 120)))
        .otherwise(concat(hdr,
          lit("The parties Meridian Partners retained advisors. "),
          substring($"text", 1, 120)))
      val docs0 = t(s, dir, "documents").select($"doc_id",
        companyA.as("company_a"), companyB.as("company_b"),
        content0.as("content"))
      Sinks.writeBucketed(docs0.select($"doc_id", $"content"), path, "doc_id")

      // read -> classify (patchabbrev.py:186-203): lines[0] vs lines[1:]
      val store = s.read.parquet(path)
        .join(docs0.select($"doc_id", $"company_a", $"company_b"), Seq("doc_id"))
        .withColumn("__body", element_at(split($"content", "\n", 2), 2))
      val need = store
        .filter(!startswith($"content", lit(Assemble.EnrichSkipPrefix)))
        .filter(!(Assemble.tokensPresent(Assemble.squash($"__body"),
          $"company_a", $"company_b") ||
          Assemble.tokensPresent(Assemble.squash($"__body"),
            Normalize.hyphenToSpace($"company_a"),
            Normalize.hyphenToSpace($"company_b"))))

      // re-fetch (hermetic stub body = pure function of the doc) -> F7b
      // html->leaf-blocks -> F17 quote fold -> T1 chunking
      val rawHtml = concat(
        lit("<html><body><p>Meridian Partners (“Meridian Partners”) " +
          "entered into the agreement.</p><p>"),
        substring($"text", 1, 400), lit("</p></body></html>"))
      val refetched = need.select($"doc_id")
        .join(t(s, dir, "documents").select($"doc_id", $"text"), Seq("doc_id"))
        .select($"doc_id",
          Normalize.normalizeQuotes(Normalize.htmlToBlocks(rawHtml))
            .as("content"))
      val chunks = graft.Pipeline.chunk(refetched)

      // T11/T12 regenerate + S8 merge-update of the touched buckets only
      val patched = Assemble.enrich(
        need.select($"doc_id", trim($"__body").as("passage_text"),
          $"company_a", $"company_b"), chunks)
      Sinks.mergeUpdate(s, path, "doc_id", patched, "content")
      s.read.parquet(path)
        .select($"doc_id", $"content")
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
    }),

    // JSONL export/ingest roundtrip — the LLM-interchange format. Write
    // the corpus as 4 JSONL shards, read back with a DECLARED schema (no
    // inference pass), and prove per-lang fidelity with exact counts,
    // total text length, and an order-independent content checksum (sum
    // of md5-prefix fingerprints — any mangled char in any doc moves it).
    "jsonl_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val path = tmpDir("graft-jsonl")
      Sinks.writeJsonlShards(
        t(s, dir, "documents").select($"doc_id", $"lang", $"text"),
        path, numShards = 4)
      Sinks.readJsonl(s, path, "doc_id LONG, lang STRING, text STRING")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length($"text")).as("sum_len"),
          sum(conv(substring(md5($"text"), 1, 11), 16, 10).cast("long"))
            .as("fp_sum"))
        .orderBy($"lang")
    }),

    // ORC roundtrip with partition pruning — the other columnar warehouse
    // format Spark ships natively. Write lang-partitioned ORC, read back
    // with a partition predicate (only en/de directories are scanned),
    // prove values + schema survive the format change.
    "orc_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val path = tmpDir("graft-orc")
      t(s, dir, "documents")
        .select($"doc_id", $"lang", length($"text").as("tlen"))
        .write.mode("overwrite").partitionBy("lang").orc(path)
      s.read.orc(path)
        .filter($"lang".isin("en", "de"))
        .select($"doc_id", $"lang", $"tlen")
        .orderBy($"doc_id")
    }),

    // SCHEMA EVOLUTION at the store: a long-lived ingest widens its
    // schema mid-stream (an early ingest wrote (doc_id, source, tlen);
    // a later one added lang) and the store must stay readable as ONE
    // table without rewriting old files. Stage both generations as
    // plain parquet appends, read back with mergeSchema (schema union
    // by name — pre-evolution rows surface NULL lang), and aggregate
    // across the generation boundary. At 100 TB this is the only
    // affordable widening: old files are immutable, the merged schema
    // is metadata-only, and readers that don't select lang never pay
    // for it (column pruning is per-file).
    "schema_evolution" -> ((s, dir) => {
      import s.implicits._
      val path = tmpDir("graft-schevo")
      val docs = t(s, dir, "documents")
      docs.filter($"doc_id" % 2 === 0)
        .select($"doc_id", $"source", length($"text").as("tlen"))
        .write.mode("overwrite").parquet(path)
      docs.filter($"doc_id" % 2 =!= 0)
        .select($"doc_id", $"source", length($"text").as("tlen"), $"lang")
        .write.mode("append").parquet(path)
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy($"lang") // NULL group = the pre-evolution generation
        .agg(count(lit(1)).as("n_docs"),
          sum($"tlen".cast("long")).as("sum_len"),
          min($"doc_id").as("min_id"))
        .orderBy($"lang".asc_nulls_first)
    }),

    // Small-file compaction: stage the corpus as a 64-way partitioned
    // store (one file per bucket — the fragmentation an incremental
    // ingest leaves behind), compact to 8 balanced files, and emit the
    // before/after (file count, row count) — rows must be preserved
    // exactly while the file count drops 8x.
    "compact_small_files" -> ((s, dir) => {
      import s.implicits._
      val small = tmpDir("graft-compact-in")
      val out = tmpDir("graft-compact-out")
      val docs = t(s, dir, "documents")
        .select($"doc_id", $"lang", length($"text").as("tlen"))
      docs.withColumn("b", pmod($"doc_id", lit(64)))
        .repartition(64, $"b")
        .write.mode("overwrite").partitionBy("b").parquet(small)
      val nBefore = s.read.parquet(small).count()
      val rowsAfter = Sinks.compact(s, small, out, numFiles = 8)
      Seq(("after", Sinks.dataFileCount(out), rowsAfter),
        ("before", Sinks.dataFileCount(small), nBefore))
        .toDF("phase", "n_files", "n_rows")
        .orderBy($"phase")
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
    "s9_range_sorted" ->
      """SELECT doc_id, source, CAST(length(text) AS INT) AS tlen
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // Each family's final content is closed-form: enriched/clean rows pass
    // through untouched, patched rows get the exact T11/T12 block (the
    // definition paragraph survives the html->blocks->quote-fold cleaning
    // byte-for-byte).
    "s8_patch_roundtrip" ->
      s"""WITH base AS (
        |  SELECT doc_id,
        |    'The following provides details about the events leading up to '
        |      || 'the merger deal between Acme' || CAST(doc_id AS VARCHAR)
        |      || ' Systems Inc & Beta' || CAST(doc_id AS VARCHAR)
        |      || ' Holdings Corp:' || chr(10) AS hdr,
        |    ${OracleSql.sqlStr(Assemble.EnrichPreamble)} AS pre,
        |    text
        |  FROM documents)
        |SELECT doc_id,
        |  CASE
        |    WHEN doc_id % 3 = 0 THEN pre || 'already enriched body'
        |    WHEN doc_id % 3 = 1 THEN
        |      hdr || 'acme' || CAST(doc_id AS VARCHAR) || ' and beta'
        |        || CAST(doc_id AS VARCHAR) || ' met to discuss. '
        |        || substr(text, 1, 120)
        |    ELSE
        |      pre || chr(10)
        |        || 'Passage that defines the abbreviation ''Meridian Partners'':'
        |        || chr(10)
        |        || 'Meridian Partners ("Meridian Partners") entered into the agreement.'
        |        || chr(10) || chr(10) || hdr || chr(10)
        |        || trim('The parties Meridian Partners retained advisors. '
        |             || substr(text, 1, 120))
        |  END AS content
        |FROM base
        |ORDER BY doc_id""".stripMargin,
    "s10_dump_roundtrip" ->
      """SELECT CAST(doc_id AS VARCHAR) || '_Acme' || CAST(doc_id AS VARCHAR)
        |  || '_&_Beta' || CAST(doc_id AS VARCHAR) || '.txt' AS fname,
        |  CAST(length('URL: https://example.test/doc/')
        |    + length(CAST(doc_id AS VARCHAR)) + 2 + length(text) AS INT)
        |    AS body_len
        |FROM documents
        |ORDER BY fname""".stripMargin,
    // Roundtrip identity: the read-back aggregate must equal the same
    // aggregate over the source parquet (md5 prefixes are engine-neutral
    // string hashes of the exact text bytes).
    "jsonl_roundtrip" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_len,
        |  CAST(SUM(CAST(concat('0x', substr(md5(text), 1, 11)) AS BIGINT))
        |    AS BIGINT) AS fp_sum
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    // Pruned read-back equals the same filter over the parquet source —
    // the lang column comes back from the partition directory values.
    "orc_roundtrip" ->
      """SELECT doc_id, lang, CAST(length(text) AS INT) AS tlen
        |FROM documents
        |WHERE lang IN ('en', 'de')
        |ORDER BY doc_id""".stripMargin,
    // The merged read re-derives from the source table: even ids are the
    // pre-evolution generation (lang never written -> NULL group).
    "schema_evolution" ->
      """SELECT CASE WHEN doc_id % 2 = 0 THEN NULL ELSE lang END AS lang,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS sum_len,
        |  MIN(doc_id) AS min_id
        |FROM documents
        |GROUP BY 1
        |ORDER BY lang ASC NULLS FIRST""".stripMargin,
    // The layout derives from the data, not from constants: before = one
    // file per NON-EMPTY pmod-64 class (a sparse corpus yields fewer
    // than 64), after = least(n_rows, 8) round-robin files (Spark writes
    // no file for an empty partition). Rows preserved exactly.
    "compact_small_files" ->
      """SELECT 'after' AS phase,
        |  CAST(least(COUNT(*), 8) AS INT) AS n_files,
        |  COUNT(*) AS n_rows
        |FROM documents
        |UNION ALL
        |SELECT 'before', CAST(COUNT(DISTINCT doc_id % 64) AS INT),
        |  COUNT(*)
        |FROM documents
        |ORDER BY phase""".stripMargin
  )
}
