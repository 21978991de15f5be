package graft.expr

import graft.SparkSpec
import graft.GraftFunctions._
import org.apache.spark.unsafe.types.UTF8String

class NfkcAsciiSpec extends SparkSpec {
  private def f(s: String): String =
    NfkcImpl.nfkcAscii(UTF8String.fromString(s)).toString

  test("compatibility forms expand before the ASCII fold") {
    assert(f("ﬁling") == "filing")       // ligature fi
    assert(f("Ｆｕｌｌｗｉｄｔｈ") == "Fullwidth") // full-width forms
    assert(f("№5") == "No5")             // numero sign -> "No"
  }

  test("non-decomposable non-ASCII is dropped (ascii-ignore semantics)") {
    assert(f("café") == "caf")
    assert(f("“quoted”") == "quoted") // smart quotes dropped
    assert(f("plain ascii!") == "plain ascii!")
  }

  test("idempotence: nfkc_ascii(nfkc_ascii(x)) == nfkc_ascii(x)") {
    val samples = Seq("ﬁling café №5", "ascii", "", "Ｔｅｓｔ x")
    samples.foreach(s => assert(f(f(s)) == f(s)))
  }

  test("column API") {
    import spark.implicits._
    val out = Seq("ﬁnancial café").toDF("s")
      .select(nfkc_ascii($"s")).collect().head.getString(0)
    assert(out == "financial caf")
  }
}
