package graft.ops

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def profile(content: String) =
    Seq(content).toDF("c")
      .select(TextAnalysis.repetitionProfile($"c"): _*).head()

  test("repetition profile counts duplicate lines and duplicate chars") {
    // lines: "aa bb"(5) x2, "cc dd ee"(8), "ff"(2) -> dup chars 5 of 20
    val r = profile("aa bb\ncc dd ee\naa bb\nff")
    assert(r.getLong(0) == 4L) // n_lines
    assert(r.getLong(1) == 3L) // n_distinct_lines
    assert(math.abs(r.getDouble(2) - 5.0 / 20.0) < 1e-15)
  }

  test("no repetition -> zero dup fraction, all lines distinct") {
    val r = profile("one two\nthree four")
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.0)
  }

  test("top bigram is the most frequent occurrence run") {
    // bigrams: "x y" x3, "y x" x2, "y z" x1
    val r = profile("x y x y x y z")
    assert(r.getString(3) == "x y")
    assert(r.getLong(4) == 3L)
  }

  test("top bigram ties resolve to the lexicographically smallest") {
    // "a b" and "b c" both occur once -> smallest wins
    val r = profile("a b c")
    assert(r.getString(3) == "a b")
    assert(r.getLong(4) == 1L)
  }

  test("single-word document degenerates like wordShingles (identity gram)") {
    val r = profile("hello")
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 0.0)
    assert(r.getString(3) == "hello" && r.getLong(4) == 1L)
  }

  test("line repetition across newline boundaries still normalizes for bigrams") {
    // normalized content folds '\n' into spaces, so the bigram spanning the
    // boundary ("bb cc") exists
    val r = Seq("aa bb\ncc dd").toDF("c")
      .select(TextAnalysis.wordBigrams($"c").as("bg"))
      .selectExpr("array_contains(bg, 'bb cc') AS x").head()
    assert(r.getBoolean(0))
  }
}
