package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.io.{Clients, Sinks}

/** The complete reference pipeline (SURVEY.md §3) end-to-end and hermetic:
  * deals -> crawler (search, validate) -> separator (extract section) ->
  * identifier (structured initiator record) -> ordered CSV sink.
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): String =
    Files.readString(Paths.get(s"src/test/resources/corpus/$name"))

  private val deals = Seq(
    (0L, "Prime Response Inc", "Chordiant Software Inc", "2001-03-31"),
    (1L, "Zenith Widgets Inc", "Quasar Metals Inc", "2001-05-15"))
    .toDF("main_index", "target_name", "acquirer_name", "d")
    .withColumn("announce_dt", $"d".cast("date")).drop("d")

  /** Filing body for a deal: both company names in the header region plus
    * the real Background-section fixture. */
  private def filing(a: String, b: String): String =
    s"<html><body><p>PROXY STATEMENT</p><p>Proposed merger of $a with $b" +
      s" pursuant to the agreement.</p><p> 2 </p>" +
      // one text node so the section's blank-line paragraph structure
      // survives HTML extraction (the cascade's title test depends on it)
      s"<p>\n${fixture("pos_01.txt")}\n</p>" +
      "<p>OTHER MATTERS</p><p>Closing boilerplate.</p></body></html>"

  test("deals -> crawl -> extract -> identify -> ordered csv") {
    // stage 1a: job generation + hermetic search -> candidate archive URLs
    val jobs = Crawler.searchJobs(deals)
    val cands = Crawler.candidateFilings(spark, jobs)
    val dealById = deals.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val urlMap = cands.collect().map { r =>
      val (a, b) = dealById(r.getLong(0))
      r.getString(1) -> filing(a, b)
    }.toMap

    // stage 1b: fetch + clean + both-names validation (J3/F13)
    val names = jobs.select($"main_index", $"norm_target", $"norm_acquirer")
    val docs = Crawler.validatedDocs(spark, cands, names,
      new EndToEndSpec.MapFetcher(urlMap))
    val docRows = docs.collect()
    assert(docRows.nonEmpty, "validated docs must survive the name filter")
    assert(docRows.forall(!_.getString(2).contains("<p>")), "HTML stripped")

    // stage 2: background-section extraction (one doc per deal: first url)
    val perDeal = ops.Rank.top1(
      docs.withColumn("__p", lit(1.0)), "main_index", "__p", "url")
    val input = perDeal
      .join(deals.select($"main_index", $"target_name", $"acquirer_name"),
        Seq("main_index"))
      .select($"main_index".as("doc_id"), $"target_name".as("company_a"),
        $"acquirer_name".as("company_b"), $"content")
    val sections = Pipeline.extractSections(input)
    val secRows = sections.collect().sortBy(_.getLong(0))
    // deal 0: names in passage -> direct header; deal 1: enrichment path
    assert(secRows.map(_.getLong(0)).toSet == Set(0L, 1L))
    assert(secRows(0).getString(1).startsWith(
      "The following provides details about the events leading up to the " +
        "merger deal between Prime Response Inc & Chordiant Software Inc:"))
    assert(secRows(0).getString(1).contains("Background of the Merger"))
    assert(secRows(1).getString(1).contains(
      "merger deal between Zenith Widgets Inc & Quasar Metals Inc:"))

    // stage 3: identifier -> 4-field record -> ordered CSV (S9)
    val out = Clients.identifyInitiators(spark, sections)
    val outRows = out.collect()
    assert(outRows.length == 2)
    assert(outRows.forall(r => Clients.initiationTypes.contains(r.getString(3))))
    val dir = Files.createTempDirectory("graft-e2e").toString
    Sinks.orderedCsv(out, dir, "INDEX")
    val csv = Files.list(Paths.get(dir)).iterator()
    val file = scala.jdk.CollectionConverters.IteratorHasAsScala(csv).asScala
      .find(_.toString.endsWith(".csv")).get
    val lines = Files.readAllLines(file)
    assert(lines.get(0) ==
      "INDEX,INITIATOR,DATE_OF_INITIATION,TYPE_OF_INITIATION,REASON")
    assert(lines.get(1).startsWith("0,"))
  }

  test("deal 1 (no matching filing content) is dropped at validation") {
    val jobs = Crawler.searchJobs(deals.filter($"main_index" === 1L))
    val cands = Crawler.candidateFilings(spark, jobs)
    // fetcher returns unrelated pages -> both-names filter drops everything
    val names = jobs.select($"main_index", $"norm_target", $"norm_acquirer")
    val docs = Crawler.validatedDocs(spark, cands, names,
      new Clients.StubFetcher)
    assert(docs.count() == 0)
  }
}

object EndToEndSpec {
  class MapFetcher(m: Map[String, String]) extends Clients.Fetcher {
    override def fetch(url: String): String =
      m.getOrElse(url, new Clients.StubFetcher().fetch(url))
  }
}
