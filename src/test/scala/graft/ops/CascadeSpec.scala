package graft.ops

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** T3-T6 cascade against the reference's own labeled corpus — the 10
  * positive / 8 negative Background-section examples embedded in
  * tools/createqueryembed.py (ported verbatim to test resources).
  */
class CascadeSpec extends SparkSpec {
  private def corpus(prefix: String): Seq[(String, String)] =
    Files.list(Paths.get("src/test/resources/corpus")).iterator().asScala
      .filter(_.getFileName.toString.startsWith(prefix))
      .toSeq.sortBy(_.toString)
      .map(p => p.getFileName.toString -> Files.readString(p))

  test("all 10 positives are accepted (8 full-phrase, 2 via bare-Background phase)") {
    val results = corpus("pos").map { case (name, text) =>
      val full = CascadeImpl.backgroundPassage(text, backgroundOnly = false)
      val bare = CascadeImpl.backgroundPassage(text, backgroundOnly = true)
      (name, full != null, bare != null)
    }
    results.foreach { case (name, full, bare) =>
      assert(full || bare, s"$name rejected by both phases")
    }
    // pos_06/pos_07 carry a bare "Background" title -> phase-2 (T7) catches
    assert(results.count(_._2) == 8)
    assert(results.filter(!_._2).map(_._1).toSet ==
      Set("pos_06.txt", "pos_07.txt"))
  }

  test("cascade rejects structural negatives; ranking handles the rest") {
    val results = corpus("neg").map { case (name, text) =>
      name -> (CascadeImpl.backgroundPassage(text, backgroundOnly = false) != null)
    }
    // TOC fragments / section lists / too-short references are rejected
    // outright; 4 prose-like negatives survive to be down-ranked by the
    // hybrid scorer (the reference design: they exist to train the
    // contrastive embedding, not the heuristics).
    val rejected = results.filter(!_._2).map(_._1).toSet
    assert(rejected == Set("neg_01.txt", "neg_03.txt", "neg_06.txt", "neg_08.txt"))
  }

  test("T4: phrase must sit in a short title paragraph") {
    val notTitle =
      "Some intro line here\nBackground of the Merger happened long ago\n" +
        "and more prose on the next line\nand another line of prose\n\n" +
        ("filler content line that is long enough to matter\n" * 10)
    assert(!CascadeImpl.hasSectionTitle(notTitle, "background of the merger"))
    val title = "Background of the Merger\n\n" +
      ("narrative line with plenty of words in it\n" * 3)
    assert(CascadeImpl.hasSectionTitle(title, "background of the merger"))
  }

  test("T5: TOC-like line/blank alternation is detected") {
    val toc = "Background of the Merger\n\nThe Merger Agreement\n\n" +
      "Opinion of the Financial Advisor\n\nCertain Effects\n\n"
    assert(!CascadeImpl.isNotToc(toc, "background of the merger"))
    val para = "Background of the Merger\nOn June 1, the boards met.\n" +
      "On June 2, advisors were retained.\nOn June 3, terms were set.\n" +
      "On June 4, the agreement was signed.\nMore narrative follows here.\n"
    assert(CascadeImpl.isNotToc(para, "background of the merger"))
  }

  test("T6: short passages are rejected (min 200 chars)") {
    val short = "Background of the Merger\nA tiny passage."
    assert(CascadeImpl.promotePassage(short, "background of the merger") == null)
  }

  test("T6: false-positive title terms skip the line") {
    val chunk = "Background of the Merger; Opinion of Advisors\n" +
      ("x" * 300)
    // line contains "opinion" -> skipped; no other phrase line -> null
    assert(CascadeImpl.promotePassage(chunk, "background of the merger") == null)
  }
}
