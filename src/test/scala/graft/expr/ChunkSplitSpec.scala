package graft.expr

import graft.SparkSpec
import graft.GraftFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class ChunkSplitSpec extends SparkSpec {
  import RecursiveSplitter.split

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("short text is a single stripped chunk") {
    assert(split("hello world", 100, 20) == Vector("hello world"))
    assert(split("  hello  ", 100, 20) == Vector("hello"))
    assert(split("", 100, 20) == Vector())
  }

  test("paragraph separator preferred and kept at start of next fragment") {
    val text = "para one is here.\n\npara two is here.\n\npara three."
    val chunks = split(text, 25, 5)
    // each paragraph fragment < 25 chars; merge limits to one per chunk
    assert(chunks == Vector("para one is here.", "para two is here.", "para three."))
  }

  test("greedy merge packs fragments up to chunk_size") {
    val text = "aa bb cc dd ee"
    // fragments: "aa", " bb", " cc", " dd", " ee" (sep kept at start)
    assert(split(text, 100, 0) == Vector("aa bb cc dd ee"))
    assert(split(text, 8, 0) == Vector("aa bb cc", "dd ee"))
  }

  test("sliding overlap retains suffix context") {
    val text = "aaaa bbbb cccc"
    // fragments: "aaaa"(4), " bbbb"(5), " cccc"(5); size 10
    // first chunk: "aaaa bbbb"; overlap window keeps <=4 chars -> none survive
    assert(split(text, 10, 4) == Vector("aaaa bbbb", "cccc"))
    // overlap 6 keeps " bbbb" (5 <= 6) as context for the next chunk
    assert(split(text, 10, 6) == Vector("aaaa bbbb", "bbbb cccc"))
  }

  test("oversized unsplittable run falls through separator hierarchy") {
    val long = "x" * 50
    val chunks = split(s"aa\n\n$long\n\nbb", 20, 4)
    assert(chunks.head == "aa")
    // the 50-char run is split at character level into <=20-char chunks
    assert(chunks.tail.init.forall(c => c.length <= 20 && c.forall(_ == 'x')))
    assert(chunks.last == "bb")
  }

  test("newline-level split happens before space-level") {
    val text = "line one here\nline two here\nline three here"
    val chunks = split(text, 16, 0)
    assert(chunks == Vector("line one here", "line two here", "line three here"))
  }

  property_tests()

  def property_tests(): Unit = {
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "dd", "e")
    val sepGen = Gen.oneOf(" ", "\n", "\n\n")
    val textGen = for {
      n <- Gen.choose(0, 60)
      parts <- Gen.listOfN(n, Gen.zip(wordGen, sepGen))
    } yield parts.map { case (w, s) => w + s }.mkString

    test("property: chunks never exceed chunk_size when atoms fit") {
      check(Prop.forAll(textGen) { text =>
        split(text, 16, 4).forall(_.length <= 16)
      })
    }

    test("property: stripped content is preserved in order") {
      check(Prop.forAll(textGen) { text =>
        val joined = split(text, 16, 4).mkString(" ")
        val wordsIn = text.split("[\\s]+").filter(_.nonEmpty).toSeq
        val wordsOut = joined.split("[\\s]+").filter(_.nonEmpty).toSeq
        // overlap may duplicate words, but the deduplicated subsequence of
        // input words must all appear (coverage, no loss)
        wordsIn.forall(wordsOut.contains)
      })
    }

    test("property: zero overlap reconstructs exactly") {
      check(Prop.forAll(textGen) { text =>
        val out = split(text, 16, 0).mkString("")
        // with overlap 0 every char of (trimmed) content appears exactly once
        out.filterNot(_.isWhitespace) == text.filterNot(_.isWhitespace)
      })
    }
  }

  test("generator emits ordered (chunk_idx, chunk) rows") {
    import spark.implicits._
    val df = Seq((1, "para one is here.\n\npara two is here."))
      .toDF("doc_id", "text")
      .select($"doc_id", chunk_split($"text", 25, 5))
    val rows = df.collect().map(r => (r.getInt(1), r.getString(2)))
    assert(rows.toSeq == Seq((0, "para one is here."), (1, "para two is here.")))
    // SQL surface
    graft.GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT chunk_split('a b c d e f', 4, 0)").count()
    assert(n > 1)
  }

  test("reference parameters: 2048/400 on a long synthetic document") {
    val para = ("The merger discussions began in early March. " * 10).trim
    val doc = (1 to 40).map(i => s"Paragraph $i. $para").mkString("\n\n")
    val chunks = split(doc, 2048, 400)
    assert(chunks.forall(_.length <= 2048))
    assert(chunks.length > 5)
    // consecutive chunks share bounded context (overlap <= 400 + fragment slack)
    chunks.sliding(2).foreach { case Vector(a, b) =>
      val ov = (0 to math.min(a.length, b.length)).reverse
        .find(k => a.endsWith(b.substring(0, k))).getOrElse(0)
      assert(ov <= 400 + 48, s"overlap $ov too large") // one fragment of slack
    }
  }
}
