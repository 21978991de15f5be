package graft.ops

import graft.SparkSpec
import graft.io.Clients
import org.apache.spark.sql.functions._

/** F17 quote folding, F7b leaf-block HTML, A4 contrastive centroid,
  * X1 fallback classifier. */
class ExtraOpsSpec extends SparkSpec {
  import spark.implicits._

  test("F17: cp1252 mojibake remaps then folds to ASCII quotes") {
    // / are cp1252-mangled smart double quotes
    val in = "word and ‘single’ and «guillemet»"
    val out = Seq(in).toDF("t").select(Normalize.normalizeQuotes($"t"))
      .collect().head.getString(0)
    assert(out == "\"word\" and 'single' and \"guillemet\"")
  }

  test("F17: NBSP normalized, dashes/ellipsis remapped not folded") {
    val in = "a b  c "
    val out = Seq(in).toDF("t").select(Normalize.normalizeQuotes($"t"))
      .collect().head.getString(0)
    assert(out == "a b – c …")
  }

  test("F7b: leaf blocks flattened, page-number blocks dropped") {
    val html = "<div><p>First   block\ttext</p><p> 42 </p>" +
      "<p>Second block</p></div>"
    val out = Seq(html).toDF("h").select(Normalize.htmlToBlocks($"h"))
      .collect().head.getString(0)
    assert(out == "First block text\n\nSecond block")
  }

  test("A4: contrastive query centroid is normalized instr + pos - 1.5*neg") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(0.0f, 0.0f)))
      .toDF("instr", "pos", "neg")
    val out = df.select(Similarity.contrastiveQuery($"instr", $"pos", $"neg"))
      .collect().head.getSeq[Double](0)
    val exp = math.sqrt(0.5)
    assert(math.abs(out(0) - exp) < 1e-9 && math.abs(out(1) - exp) < 1e-9)
  }

  test("X1: fallback classifier keeps docs the LLM says have the section") {
    val docs = Seq(
      (1L, "x " * 150 + "Background of the Merger narrative follows here."),
      (2L, "y " * 150 + "entirely unrelated filler content with no header"),
      (3L, "too short")) // below the prompt gate
      .toDF("main_index", "content")
    val kept = Clients.classifyHasSection(spark, docs)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L))
  }
}
