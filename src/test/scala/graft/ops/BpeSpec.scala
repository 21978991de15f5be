package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("fixture is well-formed: every compound side formed by an earlier rule") {
    // the property that makes a single rank-order pass == classical
    // lowest-rank-first BPE (see BpeImpl scaladoc)
    val produced = scala.collection.mutable.Set.empty[String]
    BpeImpl.merges.foreach { case (a, b) =>
      for (side <- Seq(a, b) if side.length > 1)
        assert(produced.contains(side),
          s"rule ($a, $b): side '$side' not produced by any earlier rule")
      produced += a + b
    }
    assert(BpeImpl.merges.nonEmpty)
  }

  test("golden tokenizations over the corpus vocabulary") {
    def toks(w: String) = BpeImpl.tokens(w).toSeq
    assert(toks("the") == Seq("the"))
    assert(toks("scan") == Seq("scan"))
    assert(toks("value") == Seq("value"))
    assert(toks("filter") == Seq("filter"))
    assert(toks("a") == Seq("a"))
    // deliberately multi-token (mid-size vocabulary)
    assert(toks("window") == Seq("wind", "ow"))
    assert(toks("query") == Seq("quer", "y"))
    assert(toks("column") == Seq("colu", "mn"))
    assert(toks("stream") == Seq("stre", "am"))
    assert(toks("spark") == Seq("spar", "k"))
    assert(toks("data") == Seq("dat", "a"))
    assert(toks("customer") == Seq("cu", "st", "o", "mer"))
    // unknown word falls back to chars + whatever pairs apply
    assert(toks("xyz") == Seq("x", "y", "z"))
    assert(toks("") == Seq())
  }

  test("kernel == the oracle's replace-chain semantics on random words") {
    // the DuckDB twin replays merges as replace() over a double-space
    // token encoding; this replays the SAME encoding in Scala
    // (String.replace is left-to-right non-overlapping, like DuckDB's)
    // and must agree with the array kernel on every input
    def replayTokens(word: String): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      var seq = word.map(c => s"  $c").mkString + "  "
      BpeImpl.merges.foreach { case (a, b) =>
        seq = seq.replace(s" $a  $b ", s" $a$b ")
      }
      seq.trim.split("  ").toSeq
    }
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyz"
    val words = (1 to 300).map(_ =>
      (0 until (1 + rnd.nextInt(12)))
        .map(_ => alphabet(rnd.nextInt(26))).mkString) ++
      Seq("window", "aaaa", "ababab", "thethe", "scanscan")
    words.foreach { w =>
      assert(BpeImpl.tokens(w).toSeq == replayTokens(w),
        s"divergence on '$w': kernel=${BpeImpl.tokens(w).toSeq} " +
          s"replay=${replayTokens(w)}")
    }
  }

  test("tokenCount sums per-word counts over normalized text") {
    assert(BpeImpl.tokenCount(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "  The   window QUERY a  ")) == 1L + 2L + 2L + 1L)
    assert(BpeImpl.tokenCount(
      org.apache.spark.unsafe.types.UTF8String.fromString("")) == 0L)
  }

  test("bpeTokenCount expression: codegen path, null, corpus smoke") {
    val df = Seq((1L, "the window"), (2L, "customer data"), (3L, null))
      .toDF("id", "t")
    val got = df.select($"id", TextAnalysis.bpeTokenCount($"t").as("n"))
      .orderBy($"id").collect()
    assert(got(0).getLong(1) == 3L) // the(1) + wind,ow(2)
    assert(got(1).getLong(1) == 6L) // customer(4) + dat,a(2)
    assert(got(2).isNullAt(1))
    // whole-stage codegen still applies with the custom expression
    val plan = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(TextAnalysis.bpeTokenCount($"text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }
}
