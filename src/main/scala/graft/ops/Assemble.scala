package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ExtractOrgs, internal}

/** T10-T13 + A1-A3 + T11: passage assembly, validation, and abbreviation
  * enrichment (SURVEY.md §2.7, reference
  * src/dependencies/ChunkProcessor.py:331-426).
  */
object Assemble {

  /** The reference's enrichment skip key (patchabbrev.py:186): enriched
    * content is recognized by its first line starting with this prefix —
    * the ONE canonical copy; every consumer (the enrich emitter below, the
    * patch-roundtrip skip check, the flagship invariant oracle) derives
    * from it so the skip semantics can never drift. */
  val EnrichSkipPrefix: String =
    "Here are some potentially useful abbreviation definitions"

  /** The full T11/T12 enrichment preamble (ChunkProcessor.py:417-425). */
  val EnrichPreamble: String = EnrichSkipPrefix +
    " that could help with analyzing the 'Background' section:\n"

  /** T12 prompt header (ChunkProcessor.py:349,417-425). */
  def headerLine(companyA: Column, companyB: Column): Column =
    concat(
      lit("The following provides details about the events leading up to " +
        "the merger deal between "),
      companyA, lit(" & "), companyB, lit(":\n"))

  /** T10 + U3: winning passage + the next 11 chunks joined by newline
    * (`rowsBetween(1, 11)` — the direct window-frame mapping of
    * `chunks[i+1 : i+12]`), then order-preserving line dedup.
    *
    * `chunks`: (doc_id, chunk_idx, chunk); `winners`: (doc_id, chunk_idx,
    * passage, ...). Returns winners + `passage_text`.
    */
  def assemblePassage(chunks: DataFrame, winners: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_idx"))
      .rowsBetween(1, 11)
    val following = chunks
      .withColumn("following", collect_list(col("chunk")).over(w))
      .select(col("doc_id"), col("chunk_idx"), col("following"))
    winners
      .join(following, Seq("doc_id", "chunk_idx"))
      .withColumn("passage_text",
        Normalize.dedupLines(
          concat(col("passage"), lit("\n"), array_join(col("following"), "\n"))))
  }

  /** T13: first company token (first word, before any dot, lowercased). */
  def firstToken(name: Column): Column =
    element_at(split(element_at(split(lower(trim(name)), "\\s+"), 1), "\\."), 1)

  /** T13: whitespace-squashed lowercase passage for containment tests. */
  def squash(passage: Column): Column =
    regexp_replace(lower(trim(passage)), "\\s+", " ")

  /** T13 + F14: both tokens present directly, or after hyphen->space. */
  def tokensPresent(passageClean: Column, nameA: Column, nameB: Column): Column = {
    def present(tok: Column): Column = instr(passageClean, tok) > 0
    val (ta, tb) = (firstToken(nameA), firstToken(nameB))
    (present(ta) && present(tb)) ||
      (present(translate(ta, "-", " ")) && present(translate(tb, "-", " ")))
  }

  private def extractOrgsCol(c: Column): Column =
    internal.column(ExtractOrgs(internal.expression(c)))

  /** A1-A3 + T11 + T12: abbreviation enrichment for passages that failed
    * token validation (ChunkProcessor.py:331-370).
    *
    * `need`: (doc_id, passage_text, company_a, company_b);
    * `chunks`: (doc_id, chunk_idx, chunk). Returns (doc_id, content).
    *
    * Dataflow: ORG frequency count (A1) -> top-5 with deterministic
    * first-occurrence tiebreak (A2; the reference's Counter preserves
    * insertion order) -> first defining paragraph per ORG via a
    * containment-regex join over chunk paragraphs (T11) -> group ORGs by
    * definition (A3) -> formatted preamble + header + passage (T12).
    */
  def enrich(need: DataFrame, chunks: DataFrame): DataFrame = {
    val orgs = need.select(col("doc_id"),
      posexplode(extractOrgsCol(col("passage_text"))).as(Seq("pos", "org")))
    val counts = orgs.groupBy(col("doc_id"), col("org"))
      .agg(count(lit(1)).as("n"), min(col("pos")).as("first_pos"))
    val wTop = Window.partitionBy(col("doc_id"))
      .orderBy(col("n").desc, col("first_pos").asc)
    val top5 = counts.withColumn("org_rank", row_number().over(wTop))
      .filter(col("org_rank") <= 5)
      .select(col("doc_id"), col("org"), col("org_rank"))

    // T11: first paragraph matching \([^)]*?"ORG"[^)]*?\) across all chunks
    val paras = chunks.select(col("doc_id"), col("chunk_idx"),
      posexplode(split(col("chunk"), "\n\\s*\n")).as(Seq("para_idx", "para")))
    val pattern = concat(lit("(?i)\\([^)]*?\""),
      Normalize.regexQuote(col("org")), lit("\"[^)]*?\\)"))
    val wFirst = Window.partitionBy(col("doc_id"), col("org"))
      .orderBy(col("chunk_idx").asc, col("para_idx").asc)
    val defs = top5.join(paras, Seq("doc_id"))
      .filter(regexp_like(col("para"), pattern))
      .withColumn("__rn", row_number().over(wFirst))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("org"), col("org_rank"),
        trim(col("para")).as("definition"))

    // A3: invert to definition -> [orgs] (rank order preserved)
    val defGroups = defs.groupBy(col("doc_id"), col("definition"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("org_rank"), col("org")))),
          s => s.getField("org")).as("orgs"),
        min(col("org_rank")).as("def_rank"))
      .withColumn("orgs_str",
        when(size(col("orgs")) === 1,
          concat(lit("'"), element_at(col("orgs"), 1), lit("'")))
        .when(size(col("orgs")) === 2,
          concat(lit("'"), element_at(col("orgs"), 1), lit("' and '"),
            element_at(col("orgs"), 2), lit("'")))
        .otherwise(concat(lit("'"),
          array_join(slice(col("orgs"), lit(1), size(col("orgs")) - 1), "', '"),
          lit("', and '"), element_at(col("orgs"), -1), lit("'"))))

    val perDoc = defGroups.groupBy(col("doc_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(
            struct(col("def_rank"), col("orgs_str"), col("definition")))),
          d => concat(lit("\nPassage that defines the abbreviation "),
            d.getField("orgs_str"), lit(":\n"), d.getField("definition"),
            lit("\n"))),
        "").as("defs_block"))

    val header = headerLine(col("company_a"), col("company_b"))
    need.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("defs_block").isNull, concat(header, col("passage_text")))
          .otherwise(concat(
            lit(EnrichPreamble),
            col("defs_block"), lit("\n"), header, lit("\n"),
            col("passage_text")))
          .as("content"))
  }
}
