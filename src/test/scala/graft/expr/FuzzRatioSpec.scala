package graft.expr

import graft.SparkSpec
import graft.GraftFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class FuzzRatioSpec extends SparkSpec {
  private def approx(a: Double, b: Double) = assert(math.abs(a - b) < 1e-9, s"$a vs $b")

  /** Reference O(m*n) DP — the bit-parallel kernel must agree exactly. */
  private def lcsNaive(a: String, b: String): Int = {
    val m = a.length; val n = b.length
    if (m == 0 || n == 0) return 0
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      val ac = a.charAt(i - 1)
      var j = 1
      while (j <= n) {
        cur(j) =
          if (ac == b.charAt(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n)
  }

  test("property: bit-parallel LCS equals the DP on random strings (incl. >64 chars)") {
    val charGen = Gen.oneOf(('a' to 'f') ++ Seq(' ', 'é')) // small alphabet + non-ASCII
    val strGen = for {
      n <- Gen.choose(0, 150) // crosses the 64-bit word boundary
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300),
      Prop.forAll(strGen, strGen) { (a, b) =>
        FuzzImpl.lcsLen(a, b) == lcsNaive(a, b)
      })
    assert(res.passed, res.status.toString)
  }

  test("ratio matches rapidfuzz reference values") {
    // rapidfuzz.fuzz.ratio("this is a test", "this is a test!") == 96.551724...
    approx(FuzzImpl.ratioStr("this is a test", "this is a test!"), 200.0 * 14 / 29)
    // LCS(kitten, sitting) = ittn (4) -> 200*4/13
    approx(FuzzImpl.ratioStr("kitten", "sitting"), 200.0 * 4 / 13)
    approx(FuzzImpl.ratioStr("", ""), 100.0)
    approx(FuzzImpl.ratioStr("abc", ""), 0.0)
    approx(FuzzImpl.ratioStr("abc", "abc"), 100.0)
  }

  test("partial_ratio finds embedded match") {
    approx(FuzzImpl.partialRatioStr("this is a test", "xxxx this is a test! yyyy"), 100.0)
    approx(FuzzImpl.partialRatioStr("abc", "zabcz"), 100.0)
    // symmetric in argument order
    approx(FuzzImpl.partialRatioStr("zabcz", "abc"), 100.0)
    assert(FuzzImpl.partialRatioStr("abcd", "xyzw") < 50.0)
  }

  test("expressions evaluate via Column API and SQL, inside codegen") {
    import spark.implicits._
    val df = Seq(("prime response inc", "prime response incorporated"))
      .toDF("a", "b")
      .select(
        fuzz_ratio($"a", $"b").as("r"),
        fuzz_partial_ratio($"a", $"b").as("pr"))
    val row = df.collect().head
    assert(row.getDouble(0) > 75.0 && row.getDouble(0) < 100.0)
    approx(row.getDouble(1), 100.0) // shorter fully embedded in longer
    val sqlRow = spark.sql(
      "SELECT fuzz_ratio('kitten', 'sitting') AS r").collect().head
    approx(sqlRow.getDouble(0), 200.0 * 4 / 13)
  }

  test("null propagation") {
    import spark.implicits._
    val df = Seq((Some("a"), None: Option[String])).toDF("a", "b")
    assert(df.select(fuzz_ratio($"a", $"b")).collect().head.isNullAt(0))
  }
}
