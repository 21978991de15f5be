package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftFunctions._
import graft.Pipeline
import graft.ops.Normalize
import graft.util.Tables._

/** Pipeline-operator queries over the driver testdata (SURVEY.md §2.7).
  * Custom-expression semantics that ARE SQL-expressible get DuckDB oracles
  * (window assembly T10, line dedup U3, simple-path name normalization F5,
  * HTML extraction F7); the heuristic cascade + full pipeline are rows-only
  * here and covered by CascadeSpec/PipelineSpec fixtures.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  /** The flagship's synthesized filing corpus: title + Background header +
    * narrative body (the word salad folded into ~6-word prose lines so T5
    * doesn't flag it as a TOC) + trailer. With `uniqueLines` each narrative
    * line gets a per-doc-unique letter-coded suffix, making the line-dedup
    * pass (U3) an identity on the winning passage — which upgrades the
    * invariant set: the reference's >200-char promotion gate
    * (ChunkProcessor.py:166-169) then provably survives assembly. */
  /** Constant lowercase prose tail folded into every narrative: guarantees
    * the promoted passage clears the reference's >200-char gate
    * (ChunkProcessor.py:166-169) even for the shortest `text` rows (47
    * chars at sf0.001), so extraction coverage (`got_ok`) is constant-TRUE
    * by construction at every SF. Lowercase on purpose — the capitalized
    * T12 header instr trick requires the narrative stay capital-free. */
  private val NarrativePad: String =
    "the advisors continued detailed diligence across commercial legal and " +
      "financial workstreams while counsel refined covenant language and " +
      "exchange mechanics through successive negotiation drafts"
  // shortest text is 47 chars -> narrative >= 2*47+1 + 1+NarrativePad.length
  // = 246 chars; with the 26-char section header the winning chunk clears
  // the >200 gate with margin even before the trailer — checked by the
  // got_ok column at every SF

  private[graft] def flagshipDocs(s: SparkSession, dir: String,
      uniqueLines: Boolean): DataFrame = {
    import s.implicits._
    val folded = regexp_replace(
      concat($"text", lit(" "), $"text", lit(" " + NarrativePad)),
      "((?:\\S+ ){6})", "$1\n")
    // letter-coded line index (digits would read as TOC page numbers to T5)
    val narrative =
      if (!uniqueLines) folded
      else array_join(transform(split(folded, "\n"), (l, i) =>
        concat(l, lit(" x"),
          translate(i.cast("string"), "0123456789", "abcdefghij"))), "\n")
    t(s, dir, "documents").select(
      $"doc_id",
      concat(initcap($"source"), lit(" Systems Inc")).as("company_a"),
      concat(initcap($"source"), lit(" Holdings Corp")).as("company_b"),
      concat(
        lit("Proxy Statement Overview\n\nIntroductory boilerplate about " +
          "record dates and solicitation matters.\n\n"),
        lit("Background of the Merger\n\n"),
        narrative,
        lit("\n\nOther Matters\n\nClosing boilerplate paragraph.")).as("content"))
  }

  private val AbbrevPreamble: String = graft.ops.Assemble.EnrichPreamble

  /** Constant-TRUE invariant projection over extractSections output (the
    * t1_chunk_split pattern): full-outer-join the extracted sections back
    * to the input docs; an alien output doc_id flips `id_ok` (and the row
    * count), and a DROPPED doc flips `got_ok` (output content IS NULL
    * under the full-outer join) — so under-extraction is gated, not just
    * malformed extraction. The content checks still coalesce to TRUE when
    * output is missing, but got_ok makes that path fail. `withLenGate` adds
    * the >200 promotion-gate check — only sound when the corpus makes
    * line-dedup an identity on the winning passage (uniqueLines above). */
  private[graft] def extractInvariants(out: DataFrame, docs: DataFrame,
      withLenGate: Boolean): DataFrame = {
    val orig = docs.select(col("doc_id"), col("company_a"), col("company_b"),
      col("content").as("__orig"), lit(1).as("__in"))
    val j = out.join(orig, Seq("doc_id"), "full_outer")
      .withColumn("__hdr",
        graft.ops.Assemble.headerLine(col("company_a"), col("company_b")))
      // T12 header position (capitalized literal — cannot occur in the
      // lowercase word-salad narrative, so the first hit IS the header)
      .withColumn("__hpos", call_function("instr", col("content"), col("__hdr")))
      // everything after the header: the assembled passage (enrichment
      // rows put the definitions block BEFORE the header, so this works
      // for the direct and both enrichment shapes)
      .withColumn("__region", col("content").substr(
        col("__hpos") + length(col("__hdr")), length(col("content"))))
      .withColumn("__first_line",
        element_at(split(ltrim(col("__region")), "\n"), 1))
    val base = j.select(col("doc_id"),
      col("__in").isNotNull.as("id_ok"),
      // extraction coverage: every doc in this corpus MUST extract (the
      // narrative is always promoted), so a dropped doc — which would
      // otherwise render every coalesced check below vacuously TRUE —
      // flips this column and fails the hash compare
      col("content").isNotNull.as("got_ok"),
      coalesce(startswith(col("content"), col("__hdr")) ||
        startswith(col("content"), lit(AbbrevPreamble)), lit(true))
        .as("starts_ok"),
      coalesce(col("__hpos") > 0, lit(true)).as("hdr_ok"),
      // winner-chunk membership: the passage's first line is the cascade's
      // matched header line, a trimmed contiguous slice of some chunk —
      // so it must be a substring of the original document content
      coalesce(call_function("instr", col("__orig"), col("__first_line")) > 0,
        lit(true)).as("winner_in_doc"),
      coalesce(length(col("__region")) > 200, lit(true)).as("len_ok"))
    val cols = Seq("doc_id", "id_ok", "got_ok", "starts_ok", "hdr_ok",
      "winner_in_doc") ++
      (if (withLenGate) Seq("len_ok") else Nil)
    base.select(cols.map(col): _*).orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    // Flagship lineage at scale: synthesize a filing per document row,
    // then run the full chunk -> cascade -> rank -> assemble ->
    // validate/enrich pipeline. Exact output text is chunker-boundary-
    // dependent (not SQL), but the lineage's invariants are provable from
    // construction and driver-gated as constant-TRUE booleans.
    "pipeline_extract" -> ((s, dir) => {
      val docs = flagshipDocs(s, dir, uniqueLines = false)
      extractInvariants(Pipeline.extractSections(docs), docs,
        withLenGate = false)
    }),

    // Flagship invariants incl. the length gate: on the unique-line corpus
    // the dedup pass keeps every winning-passage line, so the reference's
    // >200-char promotion gate (ChunkProcessor.py:166-169) must survive
    // into the assembled output — checked per row.
    "pipeline_extract_inv" -> ((s, dir) => {
      val docs = flagshipDocs(s, dir, uniqueLines = true)
      extractInvariants(Pipeline.extractSections(docs), docs,
        withLenGate = true)
    }),

    // Full-pipeline oracle variant: the real extractSections lineage
    // (chunk -> cascade -> rank -> assemble -> validate -> direct/enrich
    // union) on a corpus built so every stage's decision is SQL-derivable:
    // content < 2048 chars -> exactly one chunk; one candidate per doc, so
    // the ranked winner is forced (the reference's no-embedding
    // single-candidate path, ChunkProcessor.py:383-389); even doc_ids
    // embed both company tokens -> validation passes -> direct path; odd
    // doc_ids embed a quoted abbreviation definition instead -> validation
    // fails -> enrichment path incl. ORG extraction + definition lookup.
    // Docs whose content fails the 200-char promotion gate drop out (the
    // data-dependent part). The recursive-chunker flagship stays as
    // pipeline_extract.
    "pipeline_extract_fixed" -> ((s, dir) => {
      import s.implicits._
      val ids = $"doc_id".cast("string")
      val m2 = $"doc_id" % 2
      val docs = t(s, dir, "documents").select(
        $"doc_id",
        when(m2 === 0, concat(lit("Acme"), ids, lit(" Systems Inc")))
          .otherwise(concat(lit("Gamma"), ids, lit(" Partners Inc")))
          .as("company_a"),
        when(m2 === 0, concat(lit("Beta"), ids, lit(" Holdings Corp")))
          .otherwise(concat(lit("Delta"), ids, lit(" Ventures Corp")))
          .as("company_b"),
        concat(lit("Background of the Merger\n\n"),
          when(m2 === 0, concat(lit("acme"), ids, lit(" and beta"), ids,
            lit(" agreed to combine operations. ")))
          .otherwise(concat(lit("Acme"), ids, lit(" Systems Inc called (\"Acme"),
            ids, lit(" Systems Inc\") and announced the plan. "))),
          $"text").as("content"))
      graft.Pipeline.extractSections(docs)
        .orderBy($"doc_id")
    }),

    // T3-T6: the header-detection cascade, driver-oracle-gated on a
    // fuzzy-inert corpus (the corpus contains no occurrence of
    // "background", so every match decision is exact phrase/line logic and
    // the DuckDB twin can derive the expected passage per branch family).
    // Branch map (doc_id % 7):
    //   0 clean title -> passage iff len>174 (T6 length gate, data-dep)
    //   1 sentence skip-term -> line-branch match -> title-para skip -> null
    //   2 TOC-shaped section -> T5 rejects -> null
    //   3 truncated body -> T6 length gate rejects -> null
    //   4 false-positive title term on first header line -> promotion from
    //     the SECOND header line iff len>169
    //   5 phrase buried in a 3-line paragraph -> T4 rejects -> null
    //   6 phase-2 bare-"Background" exact-line mode -> passage iff len>188
    "t3_cascade" -> ((s, dir) => {
      import s.implicits._
      val m = $"doc_id" % 7
      val body = $"text"
      val content =
        when(m === 0, concat(lit("Intro paragraph line one here.\n\n" +
          "Background of the Merger\n\n"), body))
        .when(m === 1, concat(lit("the deal was amended as background of " +
          "the merger terms say.\n\n"), body))
        .when(m === 2, concat(lit("Background of the Offer\n\nitem one page" +
          "\n\nitem two page\n\nitem three page\n\n"), body))
        .when(m === 3, concat(lit("Background of Transaction\n\n"),
          substring(body, 1, 150)))
        .when(m === 4, concat(lit("Background of the Acquisition Overview\n\n" +
          "alpha beta gamma delta.\nepsilon zeta eta theta lines here\n" +
          "iota kappa lambda mu paragraph text\nnu xi omicron pi more text\n\n" +
          "Background of the Acquisition\n\n"), body))
        .when(m === 5, concat(lit("Some intro sentence here.\n\n" +
          "the background of the merger was discussed at length\n" +
          "second line of the paragraph\nthird line of the paragraph\n\n"), body))
        .otherwise(concat(lit("Background\n\n"), body))
      val passage = when(m === 6, background_passage(content, backgroundOnly = true))
        .otherwise(background_passage(content, backgroundOnly = false))
      t(s, dir, "documents")
        .select($"doc_id", coalesce(passage, lit("(rejected)")).as("passage"))
        .orderBy($"doc_id")
    }),

    // F4 + F8 + F9 + F11 + F12: the document-cleaning normalizers over a
    // raw doc with injected page-number lines, blank runs, and TOC markers
    // (each regex pure -> exact DuckDB twin).
    "f8_clean_chain" -> ((s, dir) => {
      import s.implicits._
      val raw = concat($"text",
        lit("\nMixed Case Line\n  123  \nanother line\n\n\n   \n\n" +
          "Table of Contents\nafter toc TABLE  OF CONTENT tail\n42\n"))
      t(s, dir, "documents").select(
        $"doc_id",
        Normalize.stripParens(
          concat(lit("lead ("), $"source", lit(") mid (x) tail")))
          .as("parens_stripped"),
        Normalize.removeTocMarkers(Normalize.collapseBlankRuns(
          Normalize.removePageNumbers(raw))).as("cleaned"),
        Normalize.headerProbe(raw).as("probe"),
        // F7b: leaf blocks — per-block whitespace flattening, digit-only
        // (page-number) blocks dropped, blank-line joined
        Normalize.htmlToBlocks(concat(
          lit("<html><body><p>lead "), $"source",
          lit("</p><p> 123 </p><p>tail   block</p></body></html>")))
          .as("blocks"))
        .orderBy($"doc_id")
    }),

    // T2: sentence segmentation — the cascade's splitter regex
    // ((?<=[.!?])\s+) over punctuated content; count and first sentence
    // are both SQL-derivable without lookbehind.
    "t2_sentences" -> ((s, dir) => {
      import s.implicits._
      val content = concat(
        lit("Alpha met beta. The boards agreed! Was it final? Part two.  "),
        $"text")
      val sentences = split(content, "(?<=[.!?])\\s+")
      t(s, dir, "documents").select(
        $"doc_id",
        size(sentences).as("n_sentences"),
        element_at(sentences, 1).as("first_sentence"))
        .orderBy($"doc_id")
    }),

    // T7: the two-phase phrase strategy's per-doc arbitration — docs with
    // a phase-1 full-phrase chunk AND a phase-2 bare-"Background" chunk
    // must keep only the phase-1 winner; docs with no phase-1 hit anywhere
    // fall through to phase 2. Built over hand-laid 2-chunk docs so every
    // decision is SQL-derivable (the cheap-gate filter, both cascade
    // phases, and the doc-level window).
    "t7_two_phase" -> ((s, dir) => {
      import s.implicits._
      val m = $"doc_id" % 2
      val chunk0 = when(m === 0,
        concat(lit("Background of the Merger\n\n"), $"text"))
        .otherwise(concat(lit("no header present in this chunk\n\n"), $"text"))
      val chunk1 = concat(lit("Background\n\n"), $"text")
      val chunks = t(s, dir, "documents").select($"doc_id",
        explode(array(
          struct(lit(0).as("chunk_idx"), chunk0.as("chunk")),
          struct(lit(1).as("chunk_idx"), chunk1.as("chunk")))).as("c"))
        .select($"doc_id", $"c.chunk_idx", $"c.chunk")
      graft.Pipeline.candidates(chunks)
        .orderBy($"doc_id", $"chunk_idx")
    }),

    // T8 + T9 + O3: the hybrid ranker with an analytically-forced winner —
    // one candidate per doc is the rerank query verbatim (cosine 1.0 vs
    // the query embedding, all query terms present -> rerank ~0.98), the
    // other is word-salad filler; which chunk_idx holds the good passage
    // alternates by doc parity, so the winner index is SQL-derivable while
    // the scoring math runs for real.
    "t9_hybrid_rank" -> ((s, dir) => {
      import s.implicits._
      val m = $"doc_id" % 2
      val good = lit(graft.Pipeline.RerankQuery)
      val junk = concat(lit("zeta omicron filler passage "), $"text")
      val cands = t(s, dir, "documents").select($"doc_id",
        explode(array(
          struct(lit(0).as("chunk_idx"),
            when(m === 0, good).otherwise(junk).as("passage")),
          struct(lit(1).as("chunk_idx"),
            when(m === 0, junk).otherwise(good).as("passage")))).as("c"))
        .select($"doc_id", $"c.chunk_idx", $"c.passage")
      graft.Pipeline.rank(cands)
        .select($"doc_id", $"chunk_idx".as("winner_idx"))
        .orderBy($"doc_id")
    }),

    // T10: passage-assembly window frame (rowsBetween 1..3 over fixed-stride
    // chunks) — the direct mapping of `chunks[i+1:i+12]`.
    "t10_passage_window" -> ((s, dir) => {
      import s.implicits._
      val chunks = t(s, dir, "documents")
        .select($"doc_id", explode(sequence(lit(0L),
          ceil(length($"text") / 256.0).cast("long") - 1)).as("chunk_idx"),
          $"text")
        .select($"doc_id", $"chunk_idx",
          substring($"text", ($"chunk_idx" * 256 + 1).cast("int"), lit(256))
            .as("chunk"))
      val w = Window.partitionBy($"doc_id").orderBy($"chunk_idx")
        .rowsBetween(1, 3)
      chunks
        .withColumn("following", collect_list($"chunk").over(w))
        .withColumn("assembled",
          when(size($"following") === 0, $"chunk")
            .otherwise(concat($"chunk", lit("\n"),
              array_join($"following", "\n"))))
        .filter($"chunk_idx" === 0)
        .select($"doc_id", $"assembled")
        .orderBy($"doc_id")
    }),

    // U3: order-preserving line dedup (one word per line; duplicates in the
    // word-salad text make this non-trivial).
    "u3_dedup_lines" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          Normalize.dedupLines(translate($"text", " ", "\n")).as("deduped"))
        .orderBy($"doc_id")
    }),

    // F5: company-name normalization, simple path (multi-word -> drop last
    // word). Parens/domain/& branches are unit-tested in NormalizeSpec.
    "f5_company_norm" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select($"p_partkey", company_name_norm(lower($"p_name")).as("norm_name"))
        .orderBy($"p_partkey")
    }),

    // F7: HTML -> newline-joined text nodes over synthesized markup.
    "f7_html_to_text" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          html_to_text(concat(lit("<html><body><p>"),
            regexp_replace($"text", " the ", "</p><p>"),
            lit("</p><script>ignored()</script></body></html>")))
            .as("extracted"))
        .orderBy($"doc_id")
    })
  )

  private def substrChunks =
    """SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
      |       substr(text, CAST(i*256+1 AS INT), 256) AS chunk
      |FROM (SELECT doc_id, text,
      |        unnest(range(0, CAST(ceil(length(text)/256.0) AS BIGINT))) AS i
      |      FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    // Constant-TRUE invariant twins (the t1_chunk_split pattern): any
    // lineage defect — an alien doc_id, a DROPPED doc (got_ok), a
    // missing/misplaced T12 header or abbreviation preamble, a passage
    // first line that isn't a slice of the source document, or (inv) a
    // sub-200-char promoted passage — flips a boolean and fails the hash
    // compare. Every doc in flagshipDocs extracts by construction, so
    // got_ok is provably constant-TRUE (and a deliberate limit(0) on the
    // extractSections output flips it — verified in PipelineSpec).
    "pipeline_extract" ->
      """SELECT doc_id, TRUE AS id_ok, TRUE AS got_ok, TRUE AS starts_ok,
        | TRUE AS hdr_ok, TRUE AS winner_in_doc
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "pipeline_extract_inv" ->
      """SELECT doc_id, TRUE AS id_ok, TRUE AS got_ok, TRUE AS starts_ok,
        | TRUE AS hdr_ok, TRUE AS winner_in_doc, TRUE AS len_ok
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // Same regex chain replayed in DuckDB (RE2 and java.util.regex agree
    // on these patterns; both use leftmost, preference-greedy matching).
    "f8_clean_chain" ->
      """WITH raw AS (
        |  SELECT doc_id, source,
        |    text || chr(10) || 'Mixed Case Line' || chr(10) || '  123  '
        |      || chr(10) || 'another line' || chr(10) || chr(10) || chr(10)
        |      || '   ' || chr(10) || chr(10) || 'Table of Contents' || chr(10)
        |      || 'after toc TABLE  OF CONTENT tail' || chr(10) || '42'
        |      || chr(10) AS r
        |  FROM documents)
        |SELECT doc_id,
        |  trim(regexp_replace('lead (' || source || ') mid (x) tail',
        |       '\(.*?\)', '', 'g')) AS parens_stripped,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(r, '(?m)^\s*\d+\s*$', '', 'g'),
        |      '\n\s*\n+', chr(10) || chr(10), 'g'),
        |    '(?i)table\s*of\s*contents?', '', 'g') AS cleaned,
        |  lower(substr(r, 1, 11000)) AS probe,
        |  'lead ' || source || chr(10) || chr(10) || 'tail block' AS blocks
        |FROM raw
        |ORDER BY doc_id""".stripMargin,
    // Sentence count = punct-then-space matches + 1; first sentence =
    // everything before the first such boundary (no lookbehind needed).
    "t2_sentences" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    'Alpha met beta. The boards agreed! Was it final? Part two.  '
        |      || text AS content
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(content, '[.!?]\s+')) + 1 AS INT)
        |    AS n_sentences,
        |  regexp_replace(content, '(?s)([.!?])\s.*$', '\1') AS first_sentence
        |FROM c
        |ORDER BY doc_id""".stripMargin,
    "t9_hybrid_rank" ->
      """SELECT doc_id, CAST(doc_id % 2 AS INT) AS winner_idx
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // Phase-1 winners (even ids, promotion gate len>174) suppress the
    // phase-2 chunk; odd ids only ever produce the phase-2 bare-header
    // passage (gate len>188).
    "t7_two_phase" ->
      """SELECT doc_id, chunk_idx, passage FROM (
        |  SELECT doc_id, CAST(0 AS INT) AS chunk_idx,
        |    'Background of the Merger' || chr(10) || chr(10) || text AS passage
        |  FROM documents WHERE doc_id % 2 = 0 AND length(text) > 174
        |  UNION ALL
        |  SELECT doc_id, CAST(1 AS INT) AS chunk_idx,
        |    'Background' || chr(10) || chr(10) || text AS passage
        |  FROM documents WHERE doc_id % 2 = 1 AND length(text) > 188)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    // Reconstructs the exact direct-path and enrichment-path outputs: the
    // single-chunk passage is the whole content (+ trailing newline from
    // assembly), the promotion gate is length(content) > 200, and the odd
    // docs' enrichment block is preamble + definition paragraph + header.
    "pipeline_extract_fixed" ->
      s"""WITH built AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0
        |         THEN 'Acme' || CAST(doc_id AS VARCHAR) || ' Systems Inc'
        |         ELSE 'Gamma' || CAST(doc_id AS VARCHAR) || ' Partners Inc'
        |    END AS company_a,
        |    CASE WHEN doc_id % 2 = 0
        |         THEN 'Beta' || CAST(doc_id AS VARCHAR) || ' Holdings Corp'
        |         ELSE 'Delta' || CAST(doc_id AS VARCHAR) || ' Ventures Corp'
        |    END AS company_b,
        |    CASE WHEN doc_id % 2 = 0
        |         THEN 'acme' || CAST(doc_id AS VARCHAR) || ' and beta'
        |              || CAST(doc_id AS VARCHAR)
        |              || ' agreed to combine operations. ' || text
        |         ELSE 'Acme' || CAST(doc_id AS VARCHAR)
        |              || ' Systems Inc called ("Acme' || CAST(doc_id AS VARCHAR)
        |              || ' Systems Inc") and announced the plan. ' || text
        |    END AS bodyline
        |  FROM documents),
        |kept AS (
        |  SELECT *,
        |    'Background of the Merger' || chr(10) || chr(10) || bodyline
        |      AS full_content
        |  FROM built WHERE length(bodyline) + 26 > 200),
        |hdr AS (
        |  SELECT *,
        |    'The following provides details about the events leading up to '
        |      || 'the merger deal between ' || company_a || ' & ' || company_b
        |      || ':' || chr(10) AS header,
        |    full_content || chr(10) AS passage_text
        |  FROM kept)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN header || passage_text
        |       ELSE ${OracleSql.sqlStr(graft.ops.Assemble.EnrichPreamble)}
        |         || chr(10) || 'Passage that defines the abbreviation ''Acme'
        |         || CAST(doc_id AS VARCHAR) || ' Systems Inc'':' || chr(10)
        |         || trim(bodyline) || chr(10)
        |         || chr(10) || header || chr(10) || passage_text
        |  END AS content
        |FROM hdr
        |ORDER BY doc_id""".stripMargin,
    // Expected passage per branch family: header literal + blank line +
    // body, gated by the promoted-passage length (> 200 incl. the header
    // prefix: 24+2, 29+2, 10+2 chars respectively); all reject branches
    // collapse to the sentinel.
    "t3_cascade" ->
      """SELECT doc_id,
        |  CASE
        |    WHEN doc_id % 7 = 0 AND length(text) > 174
        |      THEN 'Background of the Merger' || chr(10) || chr(10) || text
        |    WHEN doc_id % 7 = 4 AND length(text) > 169
        |      THEN 'Background of the Acquisition' || chr(10) || chr(10) || text
        |    WHEN doc_id % 7 = 6 AND length(text) > 188
        |      THEN 'Background' || chr(10) || chr(10) || text
        |    ELSE '(rejected)'
        |  END AS passage
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "t10_passage_window" ->
      s"""WITH chunks AS ($substrChunks)
        |SELECT doc_id,
        |  CASE WHEN follows IS NULL THEN chunk
        |       ELSE chunk || chr(10) || follows END AS assembled
        |FROM (
        |  SELECT doc_id, chunk_idx, chunk,
        |    string_agg(chunk, chr(10)) OVER (PARTITION BY doc_id
        |      ORDER BY chunk_idx ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)
        |      AS follows
        |  FROM chunks)
        |WHERE chunk_idx = 0
        |ORDER BY doc_id""".stripMargin,
    "u3_dedup_lines" ->
      """SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS deduped
        |FROM (
        |  SELECT doc_id, pos, line,
        |    row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn
        |  FROM (
        |    SELECT doc_id,
        |      unnest(string_split(text, ' ')) AS line,
        |      unnest(range(1, len(string_split(text, ' '))+1)) AS pos
        |    FROM documents))
        |WHERE rn = 1
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "f5_company_norm" ->
      """SELECT p_partkey,
        |  CASE WHEN len(string_split(p_name, ' ')) > 1
        |       THEN array_to_string(list_slice(string_split(p_name, ' '), 1,
        |              len(string_split(p_name, ' ')) - 1), ' ')
        |       ELSE p_name END AS norm_name
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "f7_html_to_text" ->
      """SELECT doc_id, replace(text, ' the ', chr(10)) AS extracted
        |FROM documents
        |ORDER BY doc_id""".stripMargin
  )
}
