package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(name: String): String =
    Seq(name).toDF("n").select(Normalize.companyName($"n"))
      .collect().head.getString(0)

  test("F5 company-name normalization branch coverage") {
    // parenthetical strip + drop last word
    assert(norm("CyBear Inc(Andryx Corp)") == "cybear")
    // ampersand drops last two words
    assert(norm("Johnson & Johnson") == "johnson")
    // hyphen preserved
    assert(norm("Dallas-Semiconductor Corp") == "dallas-semiconductor")
    // domain-like token already joined stays
    assert(norm("Mediconsult.com Inc") == "mediconsult.com")
    // domain token merges with successor, then last word dropped
    assert(norm("Shop com Holdings Inc") == "shop com.holdings")
    // single word is kept as-is
    assert(norm("IBM") == "ibm")
  }

  test("F7 html_to_text: tags stripped, script dropped, entities decoded") {
    val html = "<html><head><script>var x = 1;</script></head>" +
      "<body><p>First &amp; second</p><div>Third&nbsp;part</div></body></html>"
    val out = Seq(html).toDF("h").select(Normalize.htmlToText($"h"))
      .collect().head.getString(0)
    assert(out == "First & second\nThird part")
  }

  test("F8/F9/F11 cleanup regexes") {
    val raw = "Line one\n 42 \nLine two\n\n\n\nLine three\nTable of Contents\nEnd"
    val out = Seq(raw).toDF("t")
      .select(Normalize.collapseBlankRuns(
        Normalize.removePageNumbers($"t")).as("t"))
      .select(Normalize.removeTocMarkers($"t"))
      .collect().head.getString(0)
    assert(!out.matches("(?s).*\\n\\s*42\\s*\\n.*"))
    assert(!out.contains("\n\n\n"))
    assert(!out.toLowerCase.contains("table of contents"))
  }

  test("U3 dedup_lines keeps first occurrence and blank lines") {
    val text = "alpha\nbeta\n\nalpha\ngamma\nbeta\n\ndelta"
    val out = Seq(text).toDF("t").select(Normalize.dedupLines($"t"))
      .collect().head.getString(0)
    assert(out == "alpha\nbeta\n\ngamma\n\ndelta")
  }

  test("property: dedup_lines is idempotent") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val lineGen = Gen.oneOf("alpha", "beta", "alpha", "", "  ", "gamma delta")
    val textGen = Gen.listOf(lineGen).map(_.mkString("\n"))
    val prop = Prop.forAll(textGen) { text =>
      val once = TextImpl.dedupLinesStr(text)
      TextImpl.dedupLinesStr(once) == once
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: cleanup regex chain is idempotent") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = Gen.listOf(Gen.oneOf("word text", " 17 ", "", "Table of Contents",
      "more prose here")).map(_.mkString("\n"))
    val prop = Prop.forAll(gen) { text =>
      val df = Seq(text).toDF("t")
      def clean(c: org.apache.spark.sql.Column) =
        Normalize.collapseBlankRuns(Normalize.removePageNumbers(
          Normalize.removeTocMarkers(c)))
      val once = df.select(clean($"t")).collect().head.getString(0)
      val twice = df.select(clean(clean($"t"))).collect().head.getString(0)
      once == twice
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("F13 word-boundary presence for both names") {
    val df = Seq(("the acme corporation and globex holdings announce", "acme", "globex"),
      ("only acme appears here", "acme", "globex"))
      .toDF("header", "a", "b")
    val got = df.select(Normalize.bothNamesPresent($"header", $"a", $"b"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false))
  }

  test("F13 regex metacharacters in names are quoted") {
    // dot and ampersand must be treated literally, not as regex syntax
    val df = Seq(
      ("we saw at&t corp and amazon.com inc today", "amazon.com", "at&t corp"),
      ("amazonXcom must not match the dotted name", "amazon.com", "at&t corp"))
      .toDF("header", "a", "b")
    val got = df.select(Normalize.bothNamesPresent($"header", $"a", $"b"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false))
  }

  test("PII redaction scrubs each shape and leaves clean text alone") {
    def scrub(s: String): String =
      Seq(s).toDF("t").select(Normalize.redactPii($"t"))
        .collect().head.getString(0)
    assert(scrub("write to jane.doe+x@corp.example.org today") ==
      "write to <EMAIL> today")
    assert(scrub("ssn 123-45-6789 phone 555-867-5309 ip 10.0.3.7") ==
      "ssn <ID> phone <PHONE> ip <IP>")
    // dotted phone variant; embedded digits without the shapes untouched
    assert(scrub("call 555.867.5309 ref 1234567") ==
      "call <PHONE> ref 1234567")
    // parenthesized area code (with and without the space) and space
    // separators — the common US layouts beyond strict 3-3-4
    assert(scrub("ring (555) 867-5309 or (555)8675309 is not a phone") ==
      "ring <PHONE> or (555)8675309 is not a phone")
    assert(scrub("cell 555 867 5309 ends") == "cell <PHONE> ends")
    assert(scrub("no pii here at all") == "no pii here at all")
  }
}
