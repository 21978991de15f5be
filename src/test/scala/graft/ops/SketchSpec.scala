package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HLL sketch kernel: estimate accuracy in its design band, register
  * bounds, and partitioning-invariance (the decimal register sum must
  * make aggregation order irrelevant). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("hll estimate lands within the ~6.5% design band at 5k keys") {
    val df = (0L until 5000L).map(i => (i, s"g${i % 2}")).toDF("k", "g")
    val out = Sketch.hllNdv(df, $"k", $"g")
      .select($"g", $"n_exact", $"hll_ndv")
      .as[(String, Long, Double)].collect()
    assert(out.length == 2)
    out.foreach { case (g, exact, est) =>
      assert(exact == 2500, s"$g exact $exact")
      val err = math.abs(est - exact) / exact
      assert(err < 0.15, s"$g: estimate $est vs $exact (err $err)")
    }
  }

  test("registers bounded by m; duplicates do not move the estimate") {
    val base = (0L until 1000L).map(i => (i % 100, "g")).toDF("k", "g")
    val out = Sketch.hllNdv(base, $"k", $"g")
      .select($"n_exact", $"m_used", $"hll_ndv")
      .as[(Long, Long, Double)].head()
    assert(out._1 == 100 && out._2 <= 256)
    // same distinct set without duplication -> identical sketch state
    val once = (0L until 100L).map(i => (i, "g")).toDF("k", "g")
    val out2 = Sketch.hllNdv(once, $"k", $"g")
      .select($"n_exact", $"m_used", $"hll_ndv")
      .as[(Long, Long, Double)].head()
    assert(out == out2, s"duplicates changed the sketch: $out vs $out2")
  }

  test("partitioning cannot change the result (exact register sum)") {
    val df = (0L until 3000L).map(i => (i * 7919, "g")).toDF("k", "g")
    val a = Sketch.hllNdv(df.repartition(1), $"k", $"g")
      .select($"hll_ndv").as[Double].head()
    val b = Sketch.hllNdv(df.repartition(17), $"k", $"g")
      .select($"hll_ndv").as[Double].head()
    assert(a == b, s"partitioning changed the estimate: $a vs $b")
  }
}
