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

  test("cms: never undercounts; exact when wide; min beats single row") {
    val docs = Seq.tabulate(200)(i =>
      s"alpha beta beta gamma${i % 7} delta${i % 3}").toDF("text")
    // narrow sketch: collisions guaranteed, but never an undercount
    val narrow = Sketch.cmsTopWords(docs, col("text"), topK = 10, w = 4)
      .select($"word", $"n_exact", $"n_cms")
      .as[(String, Long, Long)].collect()
    assert(narrow.nonEmpty)
    narrow.foreach { case (wd, ex, est) =>
      assert(est >= ex, s"$wd undercounted: $est < $ex")
    }
    assert(narrow.exists { case (_, ex, est) => est > ex },
      "w=4 over 12 words produced zero collisions — bucket walk suspect")
    // wide sketch: no collisions -> estimates exactly equal
    val wide = Sketch.cmsTopWords(docs, col("text"), topK = 10, w = 4096)
      .select($"n_exact", $"n_cms").as[(Long, Long)].collect()
    assert(wide.forall { case (ex, est) => est == ex },
      s"collision at w=4096 on 12 words is ~impossible: $wide")
    // the exact top-2 are beta (400) then alpha (200)
    val byRank = Sketch.cmsTopWords(docs, col("text"), topK = 2, w = 4096)
      .orderBy($"rk").select($"word").as[String].collect().toSeq
    assert(byRank == Seq("beta", "alpha"), byRank)
  }

  test("partitioning cannot change the result (exact register sum)") {
    val df = (0L until 3000L).map(i => (i * 7919, "g")).toDF("k", "g")
    val a = Sketch.hllNdv(df.repartition(1), $"k", $"g")
      .select($"hll_ndv").as[Double].head()
    val b = Sketch.hllNdv(df.repartition(17), $"k", $"g")
      .select($"hll_ndv").as[Double].head()
    assert(a == b, s"partitioning changed the estimate: $a vs $b")
  }

  test("merge(per-shard sketches) == direct sketch, bit for bit") {
    // 3000 keys scattered over 10 shards; the two-stage shard-merge path
    // must reproduce the one-group direct estimate exactly (register max
    // is associative) — the property that makes HLL distributable
    val df = (0L until 3000L).map(i => (i * 7919, s"shard${i % 10}", "g"))
      .toDF("k", "shard", "g")
    val direct = Sketch.hllNdv(df, $"k", $"g")
      .select($"n_exact", $"m_used", $"hll_ndv")
      .as[(Long, Long, Double)].head()
    val merged = Sketch.hllNdvMerged(df, $"k", $"shard")
      .select($"n_exact", $"m_used", $"hll_ndv")
      .as[(Long, Long, Double)].head()
    assert(merged == direct, s"merged $merged vs direct $direct")
  }

  test("quantile lattice: buckets are monotone, contiguous, and within " +
      "2^-4 relative error; decode is the exact lower bound") {
    // exhaustive over the exact range and dense probes across octaves
    val vals = (0L until 2048L) ++
      Seq(4095L, 4096L, 65535L, 65536L, 1L << 40, (1L << 40) + 12345L,
        (1L << 62) - 1, Long.MaxValue / 2)
    val df = vals.map(Tuple1(_)).toDF("v")
      .select($"v", Sketch.latticeBucket($"v").as("b"))
      .select($"v", $"b", Sketch.latticeLow($"b").as("low"),
        Sketch.latticeLow($"b" + 1L).as("nextLow"))
    df.collect().foreach { r =>
      val (v, b, low, next) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      assert(low <= v, s"low $low above v=$v (bucket $b)")
      assert(v < next, s"v=$v not below next bucket's low $next (bucket $b)")
      if (v >= 16)
        assert((v - low).toDouble / v <= 1.0 / 16 + 1e-12,
          s"relative error above 6.25% at v=$v: low=$low")
      else assert(low == v, s"small values must be exact: v=$v low=$low")
    }
    // monotone: bucket of a larger value never decreases
    val bs = vals.sorted.map(v => Seq(Tuple1(v)).toDF("v")
      .select(Sketch.latticeBucket($"v")).as[Long].head())
    assert(bs == bs.sorted, "bucket ids must be monotone in v")
  }

  test("quantile sketch: merge(per-shard histograms) == direct, and " +
      "quantiles are true lower bounds of the exact order statistic") {
    val n = 5000
    val rows = (0 until n).map { i =>
      val v = (i.toLong * 7919) % 100000 // deterministic spread
      (v, s"sh${i % 8}", if (i % 2 == 0) "a" else "b")
    }
    val df = rows.toDF("v", "sh", "g")
    val out = Sketch.latticeQuantilesMerged(df, $"v", $"g", $"sh",
      Seq(50, 95, 99)).orderBy($"g").collect()
    assert(out.length == 2)
    // direct path: single shard — must be IDENTICAL (sum-associativity)
    val direct = Sketch.latticeQuantilesMerged(df, $"v", $"g", lit("one"),
      Seq(50, 95, 99)).orderBy($"g").collect()
    assert(out.map(_.toSeq).toSeq == direct.map(_.toSeq).toSeq,
      s"merge path diverged from direct: ${out.toSeq} vs ${direct.toSeq}")
    // lower-bound property vs the exact percentile, within 6.25%
    out.foreach { r =>
      val g = r.getString(0)
      val exactVals = rows.filter(_._3 == g).map(_._1).sorted
      val cnt = exactVals.length
      Seq(("p50", 50), ("p95", 95), ("p99", 99)).foreach { case (cn, p) =>
        val q = r.getAs[Long](cn)
        val rank = (p * cnt + 99) / 100 // ceil-ish convention
        val exact = exactVals(rank - 1)
        assert(q <= exact, s"$g $cn: sketch $q above exact $exact")
        if (exact >= 16)
          assert((exact - q).toDouble / exact <= 1.0 / 16 + 1e-12,
            s"$g $cn: error beyond design band: sketch $q exact $exact")
      }
    }
  }
}
