package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** End-to-end lineage test (SURVEY.md §3): miniature filing fixtures through
  * chunk -> cascade -> rank -> assemble -> validate/enrich.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): String =
    Files.readString(Paths.get(s"src/test/resources/corpus/$name"))

  private val filler =
    (1 to 8).map(i => s"Boilerplate paragraph $i about filing mechanics, " +
      "proxies, record dates and solicitation matters generally.").mkString("\n\n")

  test("flagship: extracts the Background section from a filing document") {
    val filing = filler + "\n\n" + fixture("pos_01.txt") + "\n\n" + filler
    val docs = Seq((1L, "Chordiant Software Inc", "Prime Response Inc", filing))
      .toDF("doc_id", "company_a", "company_b", "content")
    val out = Pipeline.extractSections(docs).collect()
    assert(out.length == 1)
    val content = out.head.getString(1)
    assert(content.startsWith(
      "The following provides details about the events leading up to the " +
        "merger deal between Chordiant Software Inc & Prime Response Inc:\n"))
    assert(content.contains("Background of the Merger"))
    assert(content.contains("arm's length negotiations"))
  }

  test("negative chunk in the same doc loses to the positive section") {
    val filing = fixture("neg_02.txt") + "\n\n" + filler + "\n\n" +
      fixture("pos_01.txt") + "\n\n" + filler
    val docs = Seq((7L, "Chordiant Software Inc", "Prime Response Inc", filing))
      .toDF("doc_id", "company_a", "company_b", "content")
    val winners = Pipeline.rank(Pipeline.candidates(Pipeline.chunk(docs)))
      .collect()
    assert(winners.length == 1)
    assert(winners.head.getAs[String]("passage")
      .contains("arm's length negotiations"))
  }

  test("passage assembly appends following chunks and dedups overlap") {
    val section = fixture("pos_02.txt")
    val tail = (1 to 30).map(i =>
      s"Continuation paragraph $i of the background narrative with enough " +
        "words to span chunk boundaries and force multiple chunks in a row.")
      .mkString("\n\n")
    val filing = filler + "\n\n" + section + "\n\n" + tail
    val docs = Seq((2L, "Diedrich Coffee Inc", "Green Mountain Coffee Roasters Inc", filing))
      .toDF("doc_id", "company_a", "company_b", "content")
    val chunks = Pipeline.chunk(docs, chunkSize = 512, overlap = 100)
    val winners = Pipeline.rank(Pipeline.candidates(chunks))
    val assembled = ops.Assemble.assemblePassage(chunks, winners).collect()
    assert(assembled.length == 1)
    val text = assembled.head.getAs[String]("passage_text")
    // following chunks are included...
    assert(text.contains("Continuation paragraph"))
    // ...and the chunk overlap does not duplicate lines
    val lines = text.split("\n").map(_.trim).filter(_.nonEmpty)
    assert(lines.distinct.length == lines.length)
  }

  test("token-validation failure routes through abbreviation enrichment") {
    val body =
      """Background of the Merger
        |
        |Representatives of Parent and Smith Acquisition Corp (the "Smith Acquisition Corp") met
        |to discuss the proposed transaction and the related financing terms.
        |On March 3, the board of Smith Acquisition Corp approved the agreement.
        |Thereafter Smith Acquisition Corp engaged its outside advisors to finalize
        |the definitive documentation over the following weeks of negotiation.
        |Additional narrative about Smith Acquisition Corp continues here in detail.
        |""".stripMargin
    val docs = Seq((3L, "Zenith Widgets Inc", "Quasar Metals Inc", body))
      .toDF("doc_id", "company_a", "company_b", "content")
    val out = Pipeline.extractSections(docs).collect()
    assert(out.length == 1)
    val content = out.head.getString(1)
    // neither "zenith" nor "quasar" appears in the passage -> enrichment
    assert(content.startsWith(
      "Here are some potentially useful abbreviation definitions"))
    assert(content.contains(
      "Passage that defines the abbreviation 'Smith Acquisition Corp':"))
    assert(content.contains(
      "merger deal between Zenith Widgets Inc & Quasar Metals Inc:"))
  }

  test("enrichment with no definition paragraphs falls back to plain header") {
    val body =
      """Background of the Merger
        |
        |The parties met repeatedly through the spring to negotiate terms of
        |the combination and the exchange ratio, assisted by their respective
        |financial and legal advisors, with several in-person board sessions
        |held at outside counsel offices during April and May of that year.
        |""".stripMargin
    val docs = Seq((4L, "Zenith Widgets Inc", "Quasar Metals Inc", body))
      .toDF("doc_id", "company_a", "company_b", "content")
    val out = Pipeline.extractSections(docs).collect()
    assert(out.length == 1)
    assert(out.head.getString(1).startsWith(
      "The following provides details about the events leading up to the " +
        "merger deal between Zenith Widgets Inc & Quasar Metals Inc:\n"))
  }

  test("docs with no Background section produce no output row") {
    val docs = Seq((5L, "A Inc", "B Inc", filler))
      .toDF("doc_id", "company_a", "company_b", "content")
    assert(Pipeline.extractSections(docs).count() == 0)
  }

  test("flagship invariant gate: got_ok flips on an under-extraction " +
      "regression (deliberate limit(0))") {
    val docs = queries.PipelineQueries
      .flagshipDocs(spark, sf("sf0.001"), uniqueLines = false)
    val out = Pipeline.extractSections(docs)
    // healthy pipeline: every invariant column constant-TRUE
    val good = queries.PipelineQueries
      .extractInvariants(out, docs, withLenGate = false).collect()
    assert(good.nonEmpty)
    assert(good.forall(r => (1 until r.length).forall(r.getBoolean)))
    // simulated all-drop regression: got_ok must flip on EVERY row while
    // the coalesced content checks stay vacuously TRUE — proving the gate
    // is no longer one-sided
    val dropped = queries.PipelineQueries
      .extractInvariants(out.limit(0), docs, withLenGate = false).collect()
    assert(dropped.length == good.length)
    assert(dropped.forall(r => !r.getBoolean(r.fieldIndex("got_ok"))))
    assert(dropped.forall(r => r.getBoolean(r.fieldIndex("starts_ok"))))
  }
}
