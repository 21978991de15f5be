package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-curve evidence probe: row counts of the near-dup pair gates at
  * a given sf dir (pair-volume growth is the quantity the r13 verdict
  * flagged — fixture classes must grow with the corpus so pair counts
  * stay linear). Run: `runMain graft.tools.CurveProbe <sfDir>`.
  *
  * `runMain graft.tools.CurveProbe <sfDir> hnsw [nCells]` instead times
  * the HNSW family's two phases separately — CONSTRUCTION
  * (writeHnswIndex: depth cap, per-level cell-restricted lists,
  * sidecar commits) and SEARCH (knnHnswIndexed over the 50-query
  * batch) — the r14 verdict's missing scale point. nCells is the IVF
  * sizing knob the construction posture scales with (per-node
  * candidate volume = nProbe*n/nCells at every level): the curve runs
  * 16 at 1x and ~16*sqrt(k) at kx, the standard sqrt(n) cell rule, so
  * the measured growth reflects the deployed sizing, not a frozen
  * 16-cell layout. */
object CurveProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftFunctions.register(spark)
    if (args.lift(1).contains("hnsw")) hnswProbe(spark, dir, args)
    else {
      for (q <- Seq("mm_jpeg_neardup", "mm_image_neardup")) {
        val n = graft.SparkEntry.queries(q)(spark, dir).count()
        println(s"""{"query":"$q","sf":"$dir","pairs":$n}""")
      }
    }
    spark.stop()
  }

  private def hnswProbe(spark: SparkSession, dir: String,
      args: Array[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val nCells = args.lift(2).map(_.toInt).getOrElse(16)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val t = e.select(col("vec_id").as("tid"), col("embedding").as("te"))
      .localCheckpoint()
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .localCheckpoint()
    val n = t.count()
    val path = graft.util.TempDirs.create("hnsw-curve") + "/g"
    val t0 = System.nanoTime()
    graft.ops.Similarity.writeHnswIndex(t, path, dim = 64,
      nCells = nCells)
    val build = (System.nanoTime() - t0) / 1e9
    // search = min-of-3 (the bench convention): the first pass pays the
    // construction's lingering checkpoint blocks / GC state, which is
    // JVM pollution, not search cost — the gate's fresh-JVM min-of-3
    // confirms the steady-state number
    var search = Double.MaxValue
    var got: org.apache.spark.sql.DataFrame = null
    var rows = 0L
    for (_ <- 1 to 3) {
      val t1 = System.nanoTime()
      got = graft.ops.Similarity.knnHnswIndexed(spark, path, q, k = 5)
        .select(col("qid"), col("tid")).localCheckpoint()
      rows = got.count()
      search = math.min(search, (System.nanoTime() - t1) / 1e9)
    }
    // recall@5 against the exact scan — the quality axis of the scale
    // point: deeper geometry must not trade recall for the growth win
    val bf = graft.ops.Similarity.knnBruteForce(q, t, k = 5)
      .select(col("qid"), col("tid"))
    val hits = got.join(bf, Seq("qid", "tid")).count()
    val possible = bf.count()
    // LAST (it builds a second store, polluting JVM/page-cache state
    // for anything timed after it): append a fixed-size batch (~100 vectors, scale-independent) into
    // a second store built without it: if the append's wall grows with
    // the corpus, its candidate scan is corpus-bounded — the quantity
    // the (lvl, home) partition pruning exists to pin down
    val pathA = graft.util.TempDirs.create("hnsw-curve-app") + "/g"
    val batch = t.orderBy(col("tid")).limit(100).localCheckpoint()
    val base = t.join(batch.select(col("tid")), Seq("tid"), "left_anti")
      .localCheckpoint()
    graft.ops.Similarity.writeHnswIndex(base, pathA, dim = 64,
      nCells = nCells)
    val tA = System.nanoTime()
    graft.ops.Similarity.appendHnswIndex(spark, pathA, batch)
    val append = (System.nanoTime() - tA) / 1e9
    val cap = graft.ops.Similarity.hnswCap(n)
    println(s"""{"query":"knn_hnsw","sf":"$dir","n":$n,""" +
      s""""n_cells":$nCells,"cap":$cap,"build_sec":$build,""" +
      s""""search_sec":$search,"append100_sec":$append,""" +
      s""""result_rows":$rows,""" +
      s""""recall_hits":$hits,"recall_possible":$possible}""")
  }
}
