package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Crawler
import graft.io.Sources
import graft.util.Tables._

/** Crawl-flow composition + event-flow operators with oracles:
  * job generation (F2+F5+F6 composed), EDGAR JSON source parsing
  * (S2+F16+U2), and batch sessionization (the streaming stance's
  * gap-session semantics as window functions).
  */
object FlowQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Id-ordered triangle enumeration over the full co-purchase graph —
    * gates both the degree-ordered batch kernel (graph_triangles) and
    * the incremental fold (graph_triangles_incremental), which must be
    * bit-equal to it. */
  private val TrianglesSql =
    """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |und AS (
      |  SELECT DISTINCT a.pk AS a, b.pk AS b
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      |tri AS (
      |  SELECT e1.a AS u, e1.b AS v, e2.b AS w
      |  FROM und e1
      |  JOIN und e2 ON e2.a = e1.b
      |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
      |m AS (SELECT u AS node FROM tri
      |      UNION ALL SELECT v FROM tri
      |      UNION ALL SELECT w FROM tri)
      |SELECT node, COUNT(*) AS n_tri
      |FROM m GROUP BY node ORDER BY node""".stripMargin

  val queries: Map[String, Q] = Map(
    // Crawler job generation: date windows with clamp, normalized names,
    // search URL — the composed searchJobs operator.
    "crawl_jobs" -> ((s, dir) => {
      import s.implicits._
      val deals = t(s, dir, "orders").filter($"o_orderkey" < 500)
        .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey".as("main_index"),
          $"c_name".as("target_name"),
          concat(lit("Acme "), $"o_orderpriority").as("acquirer_name"),
          $"o_orderdate".cast("date").as("announce_dt"))
      Crawler.searchJobs(deals)
        .select($"main_index", $"norm_target", $"norm_acquirer",
          $"win_lo", $"win_hi", $"search_url")
        .orderBy($"main_index")
    }),

    // S3 + S4 + F7-F14 + J3: the document-fetch stage end-to-end — rate-
    // limited mapPartitions fetch (hermetic stub body is a pure function
    // of the URL), full cleaning chain, and both-names header validation
    // incl. the hyphen fallback. doc_id % 4: 0/1 direct name match, 2
    // hyphen-fallback match, 3 validation fails and drops.
    "s3_validated_docs" -> ((s, dir) => {
      import s.implicits._
      val ids = $"doc_id".cast("string")
      val m = $"doc_id" % 4
      val docs = t(s, dir, "documents")
      val candidates = docs.select(
        $"doc_id".as("main_index"),
        concat(lit("https://archive.test/"),
          when(m === 2, concat(lit("tgt "), ids, lit("/acq "), ids))
            .when(m === 3, lit("mismatched/path"))
            .otherwise(concat(lit("tgt"), ids, lit("/acq"), ids)),
          lit("/doc.htm")).as("url"))
      val names = docs.select(
        $"doc_id".as("main_index"),
        when(m === 2, concat(lit("tgt-"), ids)).otherwise(concat(lit("tgt"), ids))
          .as("norm_target"),
        when(m === 2, concat(lit("acq-"), ids)).otherwise(concat(lit("acq"), ids))
          .as("norm_acquirer"))
      Crawler.validatedDocs(s, candidates, names,
        new graft.io.Clients.StubFetcher, globalRate = 1e6)
        .orderBy($"main_index")
    }),

    // S2 as a DataSourceV2 connector: url-sliced input partitions with
    // per-partition token buckets, hermetic stub fetch, JSON parse. The
    // stub body is a pure function of the URL, so the connector's full
    // output replays in SQL (fnv-derived cik/adsh).
    "s2_dsv2_source" -> ((s, dir) => {
      import s.implicits._
      val n = t(s, dir, "documents").count()
      val urls = (0L until n)
        .map(i => s"https://efts.test/search-index?q=doc$i").mkString(";")
      val raw = s.read.format("graft.io.dsv2.EdgarSearchSource")
        .option("urls", urls)
        .option("numPartitions", "4")
        .option("ratePerSec", "1000000")
        .load()
      Sources.parseEdgarHits(raw, "body")
        .select($"url", $"total_hits",
          element_at($"ciks", -1).as("cik"), $"adsh")
        .orderBy($"url", $"adsh")
    }),

    // S2: EDGAR JSON body parse (from_json nested schema + explode) +
    // F16 archive-URL construction; oracle reconstructs from base columns.
    "s2_edgar_source" -> ((s, dir) => {
      import s.implicits._
      val base = t(s, dir, "orders").filter($"o_orderkey" < 300)
      val adsh = concat(lit("0000"), $"o_custkey", lit("-26-"),
        lpad($"o_orderkey".cast("string"), 6, "0"))
      val body = to_json(struct(
        struct(
          struct($"o_orderkey".cast("long").as("value")).as("total"),
          array(struct(struct(
            array(lpad($"o_custkey".cast("string"), 10, "0")).as("ciks"),
            adsh.as("adsh")).as("_source"))).as("hits")).as("hits")))
      Sources.parseEdgarHits(
        base.select($"o_orderkey", body.as("body")), "body")
        .select($"o_orderkey", $"total_hits",
          Sources.filingUrl($"ciks", $"adsh").as("url"))
        .orderBy($"o_orderkey")
    }),

    // COHORT RETENTION — the product-analytics matrix: users grouped by
    // first-seen week, each cell = distinct users of that cohort active
    // k weeks later. Two grouped aggregations (first-seen, then the
    // cell counts); distinct-per-cell combines map-side; week math is
    // pure date arithmetic both engines truncate identically (ISO
    // Monday weeks).
    "cohort_retention" -> ((s, dir) => {
      import s.implicits._
      val ev = events(s, dir)
        .select($"user_id", date_trunc("week", $"ts").cast("date").as("w"))
      val firstw = ev.groupBy($"user_id").agg(min($"w").as("cw"))
      ev.distinct().join(firstw, "user_id")
        .groupBy(date_format($"cw", "yyyy-MM-dd").as("cohort_week"),
          expr("datediff(w, cw) div 7").cast("int").as("week_offset"))
        .agg(countDistinct($"user_id").as("n_users"))
        .orderBy($"cohort_week", $"week_offset")
    }),

    // EVENT-RATE ANOMALY REPORT — robust per-type outlier detection on
    // the hourly count series: median and MAD (median absolute
    // deviation) of the counts in exact integers, anomaly = |cnt - med|
    // > 4 * max(MAD, 1). Both medians run as histogram order statistics
    // through the ranged-running-sum shape (the skew_report /
    // event_value_percentiles convention): cumulative sums partition by
    // the range id, never by the 5-value event_type alone, and the
    // per-type exclusive offsets are a bounded one-row-per-type collect.
    "event_anomalies" -> ((s, dir) => {
      import s.implicits._
      def typedMedian(hist: DataFrame, out: String): DataFrame = {
        val cumG = graft.ops.Sampling.rangedRunningSum(hist,
          Seq(col("event_type"), col("v")), col("c"), "cumg", numRanges = 8)
        val n = hist.groupBy($"event_type").agg(sum($"c").as("n"))
        val offs = {
          var acc = 0L
          n.orderBy($"event_type").collect().map { r =>
            val o = (r.getString(0), acc); acc += r.getLong(1); o
          }
        }
        val offCol = offs.foldLeft(lit(0L)) { case (c0, (ty, o)) =>
          when($"event_type" === ty, lit(o)).otherwise(c0)
        }
        cumG.withColumn("cum", $"cumg" - offCol)
          .join(n, "event_type")
          .groupBy($"event_type")
          .agg(min(when($"cum" >= expr("(50 * n + 99) div 100"), $"v"))
            .as(out))
      }
      val hc = events(s, dir)
        .groupBy($"event_type",
          date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm")
            .as("hour"))
        .agg(count(lit(1)).as("cnt"))
      val med = typedMedian(
        hc.groupBy($"event_type", $"cnt".as("v"))
          .agg(count(lit(1)).as("c")), "med")
      val hcm = hc.join(broadcast(med), "event_type")
      val mad = typedMedian(
        hcm.groupBy($"event_type", abs($"cnt" - $"med").as("v"))
          .agg(count(lit(1)).as("c")), "mad")
      hcm.join(broadcast(mad), "event_type")
        .groupBy($"event_type", $"med", $"mad")
        .agg(count(lit(1)).as("n_hours"),
          sum(when(abs($"cnt" - $"med") > lit(4) * greatest($"mad", lit(1L)),
            1).otherwise(0)).cast("long").as("n_anomalies"))
        .select($"event_type", $"n_hours", $"med".as("med_cnt"),
          $"mad".as("mad_cnt"), $"n_anomalies")
        .orderBy($"event_type")
    }),

    // NATIVE session windows — the same gap semantics as o5_sessionize
    // through Spark's session_window operator (the engine merges
    // overlapping [t, t+gap) intervals per key; end = last event + gap;
    // an event at exactly gap distance starts a NEW session — the twin
    // replays that strict boundary with >=). One shuffle on the user
    // key; no window function at all.
    "event_session_window" -> ((s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", unix_micros($"sw.start").as("start_us"),
          unix_micros($"sw.end").as("end_us"), $"n_events")
        .orderBy($"user_id", $"start_us")
    }),

    // PAGERANK over the part co-purchase graph — the link-structure
    // ranking shape a training-data pipeline uses to weight documents
    // by citation/link graphs. Edges: parts co-occurring in the same
    // order (one equi-shuffle self-join on the order key; pair volume
    // is bounded by per-order line count squared — ≤ 7² in TPC-H-shaped
    // data — so it grows linearly with orders). The graph is symmetric
    // by construction (each pair lands in both directions), so every
    // node has out-edges and no dangling-mass term is needed. Three
    // exact-integer iterations (fixed-point 1e12 mass, floor division
    // at the two points the oracle mirrors with //); per-round
    // localCheckpoint keeps the plan constant-size — the distributed
    // PageRank shape that survives any node count.
    "graph_pagerank" -> ((s, dir) => {
      import s.implicits._
      // spread the under-split lineitem scan before the pair build: the
      // self-join's pair generation + distinct map side otherwise runs
      // in the source's 3 scan tasks (r18 profile, guide §2.5)
      val li = graft.ops.Scale.spreadNarrowScan(t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")))
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      val edges0 = pairs.groupBy($"src", $"dst")
        .agg(count(lit(1)).as("w"))
      val outw = edges0.groupBy($"src").agg(sum($"w").as("outw"))
      graft.ops.Graph.pagerank(edges0.join(outw, "src"), iters = 3)
        .orderBy($"node")
    }),

    // INCREMENTAL PageRank — the d6f ingestion shape applied to the
    // rank table: ranks over the pre-delta graph (orders ok % 7 != 0)
    // persist once per dir; the delta orders arrive, the edge weights
    // re-aggregate, and the refresh WARM-STARTS the exact-integer
    // iteration from the stored values (new nodes at the merged init)
    // for 2 rounds instead of recomputing from uniform. The oracle
    // replays this exact lineage — a continuous fixpoint's truncated
    // warm trajectory is not bit-equal to a truncated cold one (unlike
    // d6f's discrete labels), so the gate pins the fold itself;
    // GraphSpec separately measures that warm-starting converges to
    // the cold fixpoint in fewer rounds (the incremental win).
    "graph_pagerank_incremental" -> ((s, dir) => {
      import s.implicits._
      // spread the under-split lineitem scan before the pair build: the
      // self-join's pair generation + distinct map side otherwise runs
      // in the source's 3 scan tasks (r18 profile, guide §2.5)
      val li = graft.ops.Scale.spreadNarrowScan(t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")))
      def edgesOf(src: DataFrame) = {
        val pairs = src.as("a").join(src.as("b"),
            col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
          .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        val e0 = pairs.groupBy($"src", $"dst").agg(count(lit(1)).as("w"))
        e0.join(e0.groupBy($"src").agg(sum($"w").as("outw")), "src")
      }
      val store = s.read.parquet(
        graft.util.TempDirs.cached("pagerank-store", dir) { p =>
          graft.ops.Graph.pagerank(edgesOf(li.filter($"ok" % 7 =!= 0)),
            iters = 3).write.parquet(p)
        })
      graft.ops.Graph.pagerankWarm(edgesOf(li), store, iters = 2)
        .orderBy($"node")
    }),

    // Per-node TRIANGLE counts over the undirected co-purchase graph —
    // local clustering beside PageRank's global centrality. The Spark
    // kernel orients edges by (degree, id) so hub wedge explosion is
    // bounded at O(sqrt(E)) out-degree (Graph.triangleCounts); the
    // DuckDB twin enumerates triangles by id-order instead — a
    // different orientation of the SAME orientation-invariant triangle
    // set, so count equality cross-proves both formulations.
    "graph_triangles" -> ((s, dir) => {
      import s.implicits._
      // spread the under-split lineitem scan before the pair build: the
      // self-join's pair generation + distinct map side otherwise runs
      // in the source's 3 scan tasks (r18 profile, guide §2.5)
      val li = graft.ops.Scale.spreadNarrowScan(t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")))
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("id_1"), col("b.pk").as("id_2"))
      graft.ops.Graph.triangleCounts(pairs).orderBy($"node")
    }),

    // The DISK-BOUNDED closing-join path, hash-gated: the same graph
    // through THREE forced src-sliced closing passes (the shape the
    // kernel auto-selects past 1.75B wedges, where a single exchange
    // would outgrow a host's local disk — scale_curve_r17.json records
    // the 100x point it unlocked). Per-pass node-sized partials sum to
    // exactly the single-pass counts (wedge centers partition by src),
    // so the twin is graph_triangles' twin verbatim.
    "graph_triangles_sliced" -> ((s, dir) => {
      import s.implicits._
      // spread the under-split lineitem scan before the pair build: the
      // self-join's pair generation + distinct map side otherwise runs
      // in the source's 3 scan tasks (r18 profile, guide §2.5)
      val li = graft.ops.Scale.spreadNarrowScan(t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")))
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("id_1"), col("b.pk").as("id_2"))
      graft.ops.Graph.triangleCounts(pairs, minClosingPasses = 3)
        .orderBy($"node")
    }),

    // INCREMENTAL triangle counts — the graph family's exactly-foldable
    // delta op: per-node counts over the pre-delta co-purchase graph
    // persist once per dir, the delta orders' pairs fold in through the
    // inclusion-exclusion kernel (Graph.incrementalTriangles: every
    // enumeration delta-proportional, old pairs probed but never
    // re-wedged), and — because triangle counts are DISCRETE, unlike
    // the PageRank fixpoint — the result is hash-equal to a from-
    // scratch count over the merged graph: the oracle is the
    // graph_triangles twin verbatim.
    "graph_triangles_incremental" -> ((s, dir) => {
      import s.implicits._
      // spread the under-split lineitem scan before the pair build: the
      // self-join's pair generation + distinct map side otherwise runs
      // in the source's 3 scan tasks (r18 profile, guide §2.5)
      val li = graft.ops.Scale.spreadNarrowScan(t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")))
      def pairsOf(src: DataFrame) = src.as("a").join(src.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("id_1"), col("b.pk").as("id_2"))
      // delta = 1/31 of orders — the small-edit regime an incremental
      // fold exists for (a 14% delta made the fold cost rival the full
      // recompute; at ~3% it is decisively cheaper). The store persists
      // edges/ (append-only canonical ground truth), adj/ (symmetric
      // neighbour-list increment rows), meta/ (edge_count), counts/ —
      // see the Graph.scala store banner. With the neighbour lists at
      // rest, the refresh's wall time tracks the delta: the old graph
      // is only probe-SCANNED (adj/ pruned to the delta's endpoints by
      // a broadcast semi-join; the fold's A term is one array_intersect
      // per delta edge, B an array_contains probe — no degree table, no
      // Bloom, no candidate materialization).
      val store = graft.util.TempDirs.cached("triangles-store-31", dir) { p =>
        graft.ops.Graph.writeTriangleStore(s, p,
          pairsOf(li.filter($"ok" % 31 =!= 0)))
      }
      graft.ops.Graph.incrementalTrianglesStored(s, store,
        pairsOf(li.filter($"ok" % 31 === 0)))
        .orderBy($"node")
    }),

    // APPENDED triangle store — the maintenance twin of the read-only
    // refresh above: the same delta is FOLDED AND COMMITTED
    // (edge files appended, per-endpoint adjacency increment rows
    // appended, edge_count bumped, counts swapped — the BandIndex
    // transaction discipline with epoch fencing), and the gate reads
    // the counts back from the store at rest. Hash-equal to from-scratch over the merged graph:
    // the oracle is the full-graph twin verbatim, so any error in the
    // roll-forward of ANY sidecar that leaks into the fold shows up as
    // a count mismatch.
    "graph_triangles_store_appended" -> ((s, dir) => {
      import s.implicits._
      // spread the under-split lineitem scan before the pair build: the
      // self-join's pair generation + distinct map side otherwise runs
      // in the source's 3 scan tasks (r18 profile, guide §2.5)
      val li = graft.ops.Scale.spreadNarrowScan(t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")))
      def pairsOf(src: DataFrame) = src.as("a").join(src.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("id_1"), col("b.pk").as("id_2"))
      val store = graft.util.TempDirs.cached("triangles-appended-31", dir) {
        p =>
          graft.ops.Graph.writeTriangleStore(s, p,
            pairsOf(li.filter($"ok" % 31 =!= 0)))
          graft.ops.Graph.appendTriangleStore(s, p,
            pairsOf(li.filter($"ok" % 31 === 0)))
      }
      s.read.parquet(graft.util.Sidecars.path(s, store, "counts"))
        .orderBy($"node")
    }),

    // APPROXIMATE triangle counts — the beyond-the-Bloom-threshold
    // scale path (DOULION, Tsourakakis et al. KDD'09): keep each
    // canonical edge iff xxhash64(id_1, id_2) mod 5 == 0 (deterministic
    // pseudo-sampling, so both engines sample the SAME subgraph), run
    // the exact kernel on the 20% subgraph, scale by 5^3. Wedge volume
    // drops ~25x (quadratic in degree), the estimator is unbiased per
    // node, and the hash-sampling makes the approximation exactly
    // gateable — the twin replays the two-link XXH64 chain.
    "graph_triangles_approx" -> ((s, dir) => {
      import s.implicits._
      // spread the under-split lineitem scan before the pair build: the
      // self-join's pair generation + distinct map side otherwise runs
      // in the source's 3 scan tasks (r18 profile, guide §2.5)
      val li = graft.ops.Scale.spreadNarrowScan(t(s, dir, "lineitem")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")))
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("id_1"), col("b.pk").as("id_2"))
        .distinct()
        .filter(pmod(xxhash64($"id_1", $"id_2"), lit(5L)) === 0)
      graft.ops.Graph.triangleCounts(pairs)
        .select($"node", $"n_tri".as("n_tri_sampled"),
          ($"n_tri" * lit(125L)).as("n_tri_est"))
        .orderBy($"node")
    }),

    // Gap-based sessionization (30-min inactivity closes a session) as
    // batch window functions; the streaming variant is
    // graft.streaming.StreamOps.sessionize.
    "o5_sessionize" -> ((s, dir) => {
      import s.implicits._
      val e = events(s, dir)
        .select($"user_id", $"event_id", unix_micros($"ts").as("tus"))
      val wOrd = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      val flagged = e
        .withColumn("prev", lag($"tus", 1).over(wOrd))
        .withColumn("ns",
          when($"prev".isNull || $"tus" - $"prev" > 1800000000L, 1)
            .otherwise(0))
        .withColumn("session_no",
          sum($"ns").over(wOrd.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"))
      flagged.groupBy($"user_id", $"session_no")
        .agg(count(lit(1)).as("n_events"),
          min($"tus").as("start_us"), max($"tus").as("end_us"))
        .orderBy($"user_id", $"session_no")
    })
  )

  val oracles: Map[String, String] = Map(
    "s2_dsv2_source" -> HashOracleSql.dsv2SourceSql,
    // Exact-integer PageRank replay: same edge build, same floor
    // divisions (// mirrors Spark's div on these nonnegative
    // quantities), three unrolled iterations.
    "graph_pagerank" ->
      """WITH e0 AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |    CAST(COUNT(*) AS BIGINT) AS w
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |  GROUP BY a.l_partkey, b.l_partkey),
        |ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw
        |       FROM e0 GROUP BY src),
        |e AS (SELECT e0.src, e0.dst, e0.w, ow.outw
        |      FROM e0 JOIN ow ON e0.src = ow.src),
        |nodes AS (SELECT DISTINCT src AS node FROM e),
        |k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |        1000000000000 // CAST(COUNT(*) AS BIGINT) AS init,
        |        (15 * (1000000000000 // CAST(COUNT(*) AS BIGINT))) // 100
        |          AS base
        |      FROM nodes),
        |pr0 AS (SELECT node, init AS pr FROM nodes CROSS JOIN k),
        |c1 AS (SELECT e.dst AS node,
        |         CAST(SUM((p.pr * e.w) // e.outw) AS BIGINT) AS contrib
        |       FROM e JOIN pr0 p ON e.src = p.node GROUP BY e.dst),
        |pr1 AS (SELECT nd.node,
        |          base + (85 * COALESCE(c1.contrib, 0)) // 100 AS pr
        |        FROM nodes nd CROSS JOIN k
        |        LEFT JOIN c1 ON nd.node = c1.node),
        |c2 AS (SELECT e.dst AS node,
        |         CAST(SUM((p.pr * e.w) // e.outw) AS BIGINT) AS contrib
        |       FROM e JOIN pr1 p ON e.src = p.node GROUP BY e.dst),
        |pr2 AS (SELECT nd.node,
        |          base + (85 * COALESCE(c2.contrib, 0)) // 100 AS pr
        |        FROM nodes nd CROSS JOIN k
        |        LEFT JOIN c2 ON nd.node = c2.node),
        |c3 AS (SELECT e.dst AS node,
        |         CAST(SUM((p.pr * e.w) // e.outw) AS BIGINT) AS contrib
        |       FROM e JOIN pr2 p ON e.src = p.node GROUP BY e.dst),
        |pr3 AS (SELECT nd.node,
        |          base + (85 * COALESCE(c3.contrib, 0)) // 100 AS pr
        |        FROM nodes nd CROSS JOIN k
        |        LEFT JOIN c3 ON nd.node = c3.node)
        |SELECT node, pr FROM pr3 ORDER BY node""".stripMargin,
    "graph_triangles_approx" -> HashOracleSql.triApproxSql(invP = 5),
    // Warm-start replay: 3 unrolled iterations over the pre-delta graph
    // (ok % 7 <> 0), then 2 iterations over the merged graph seeded
    // with COALESCE(old rank, merged init) — the exact fold the Spark
    // kernel performs.
    "graph_pagerank_incremental" ->
      """WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |eo0 AS (
        |  SELECT a.pk AS src, b.pk AS dst, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
        |  WHERE a.ok % 7 <> 0
        |  GROUP BY a.pk, b.pk),
        |owo AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw
        |        FROM eo0 GROUP BY src),
        |eold AS (SELECT eo0.src, eo0.dst, eo0.w, owo.outw
        |         FROM eo0 JOIN owo ON eo0.src = owo.src),
        |nold AS (SELECT DISTINCT src AS node FROM eold),
        |ko AS (SELECT 1000000000000 // CAST(COUNT(*) AS BIGINT) AS init,
        |         (15 * (1000000000000 // CAST(COUNT(*) AS BIGINT))) // 100
        |           AS base
        |       FROM nold),
        |op0 AS (SELECT node, init AS pr FROM nold CROSS JOIN ko),
        |oc1 AS (SELECT e.dst AS node,
        |          CAST(SUM((p.pr * e.w) // e.outw) AS BIGINT) AS contrib
        |        FROM eold e JOIN op0 p ON e.src = p.node GROUP BY e.dst),
        |op1 AS (SELECT nd.node,
        |          base + (85 * COALESCE(oc1.contrib, 0)) // 100 AS pr
        |        FROM nold nd CROSS JOIN ko
        |        LEFT JOIN oc1 ON nd.node = oc1.node),
        |oc2 AS (SELECT e.dst AS node,
        |          CAST(SUM((p.pr * e.w) // e.outw) AS BIGINT) AS contrib
        |        FROM eold e JOIN op1 p ON e.src = p.node GROUP BY e.dst),
        |op2 AS (SELECT nd.node,
        |          base + (85 * COALESCE(oc2.contrib, 0)) // 100 AS pr
        |        FROM nold nd CROSS JOIN ko
        |        LEFT JOIN oc2 ON nd.node = oc2.node),
        |oc3 AS (SELECT e.dst AS node,
        |          CAST(SUM((p.pr * e.w) // e.outw) AS BIGINT) AS contrib
        |        FROM eold e JOIN op2 p ON e.src = p.node GROUP BY e.dst),
        |op3 AS (SELECT nd.node,
        |          base + (85 * COALESCE(oc3.contrib, 0)) // 100 AS pr
        |        FROM nold nd CROSS JOIN ko
        |        LEFT JOIN oc3 ON nd.node = oc3.node),
        |em0 AS (
        |  SELECT a.pk AS src, b.pk AS dst, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
        |  GROUP BY a.pk, b.pk),
        |owm AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw
        |        FROM em0 GROUP BY src),
        |em AS (SELECT em0.src, em0.dst, em0.w, owm.outw
        |       FROM em0 JOIN owm ON em0.src = owm.src),
        |nm AS (SELECT DISTINCT src AS node FROM em),
        |km AS (SELECT 1000000000000 // CAST(COUNT(*) AS BIGINT) AS init,
        |         (15 * (1000000000000 // CAST(COUNT(*) AS BIGINT))) // 100
        |           AS base
        |       FROM nm),
        |w0 AS (SELECT nd.node, COALESCE(op3.pr, km.init) AS pr
        |       FROM nm nd CROSS JOIN km
        |       LEFT JOIN op3 ON nd.node = op3.node),
        |wc1 AS (SELECT e.dst AS node,
        |          CAST(SUM((p.pr * e.w) // e.outw) AS BIGINT) AS contrib
        |        FROM em e JOIN w0 p ON e.src = p.node GROUP BY e.dst),
        |w1 AS (SELECT nd.node,
        |         base + (85 * COALESCE(wc1.contrib, 0)) // 100 AS pr
        |       FROM nm nd CROSS JOIN km
        |       LEFT JOIN wc1 ON nd.node = wc1.node),
        |wc2 AS (SELECT e.dst AS node,
        |          CAST(SUM((p.pr * e.w) // e.outw) AS BIGINT) AS contrib
        |        FROM em e JOIN w1 p ON e.src = p.node GROUP BY e.dst),
        |w2 AS (SELECT nd.node,
        |         base + (85 * COALESCE(wc2.contrib, 0)) // 100 AS pr
        |       FROM nm nd CROSS JOIN km
        |       LEFT JOIN wc2 ON nd.node = wc2.node)
        |SELECT node, pr FROM w2 ORDER BY node""".stripMargin,
    // Triangles by id-order (u < v < w, edges canonical a < b): the
    // orientation-free enumeration the degree-ordered kernel must match.
    "graph_triangles" -> TrianglesSql,
    // the forced-3-pass sliced closing join sums per-pass partials to
    // exactly the single-pass counts — same twin, verbatim
    "graph_triangles_sliced" -> TrianglesSql,
    // The incremental fold must be HASH-EQUAL to from-scratch on the
    // merged graph (discrete counts, unlike the PageRank fixpoint) —
    // same twin, verbatim.
    "graph_triangles_incremental" -> TrianglesSql,
    // The appended store's committed counts — same discrete-exactness
    // argument, so the same twin pins every rolled-forward sidecar
    // that feeds the fold.
    "graph_triangles_store_appended" -> TrianglesSql,
    // The stub fetch body is 'Document for <url>' wrapped in one <p>, the
    // cleaning chain reduces it back to that line, and validation keeps
    // exactly the branches whose names occur in the lowercased URL
    // (directly, or via the hyphen fallback for doc_id % 4 = 2).
    "s3_validated_docs" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    'https://archive.test/' ||
        |    CASE WHEN doc_id % 4 = 2
        |           THEN 'tgt ' || CAST(doc_id AS VARCHAR) || '/acq '
        |                || CAST(doc_id AS VARCHAR)
        |         WHEN doc_id % 4 = 3 THEN 'mismatched/path'
        |         ELSE 'tgt' || CAST(doc_id AS VARCHAR) || '/acq'
        |              || CAST(doc_id AS VARCHAR)
        |    END || '/doc.htm' AS url
        |  FROM documents)
        |SELECT doc_id AS main_index, url, 'Document for ' || url AS content
        |FROM c WHERE doc_id % 4 <> 3
        |ORDER BY main_index""".stripMargin,
    "crawl_jobs" ->
      """WITH deals AS (
        |  SELECT o_orderkey AS main_index, c_name AS target_name,
        |    'Acme ' || o_orderpriority AS acquirer_name,
        |    CAST(o_orderdate AS DATE) AS d
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderkey < 500),
        |norm AS (
        |  SELECT *,
        |    lower(target_name) AS norm_target,
        |    array_to_string(list_slice(string_split(lower(acquirer_name), ' '),
        |      1, len(string_split(lower(acquirer_name), ' ')) - 1), ' ')
        |      AS norm_acquirer,
        |    day(d) AS dd,
        |    CAST(date_trunc('month', d) - INTERVAL 4 MONTH AS DATE) AS lo0,
        |    CAST(date_trunc('month', d) + INTERVAL 4 MONTH AS DATE) AS hi0
        |  FROM deals),
        |win AS (
        |  SELECT *,
        |    greatest(CAST(CASE WHEN dd <= day(last_day(lo0))
        |        THEN lo0 + (dd-1)*INTERVAL 1 DAY ELSE lo0 END AS DATE),
        |      DATE '2001-01-01') AS win_lo,
        |    CAST(CASE WHEN dd <= day(last_day(hi0))
        |        THEN hi0 + (dd-1)*INTERVAL 1 DAY
        |        ELSE hi0 + INTERVAL 1 MONTH END AS DATE) AS win_hi
        |  FROM norm)
        |SELECT main_index, norm_target, norm_acquirer, win_lo, win_hi,
        |  'https://efts.sec.gov/LATEST/search-index?q=%22' ||
        |  replace(target_name, ' ', '%20') || '%22%20%22' ||
        |  replace(acquirer_name, ' ', '%20') || '%22' ||
        |  '&dateRange=custom&startdt=' || strftime(win_lo, '%Y-%m-%d') ||
        |  '&enddt=' || strftime(win_hi, '%Y-%m-%d') ||
        |  '&forms=PREM14A%2CS-4%2CSC 14D9%2CSC TO-T' AS search_url
        |FROM win
        |ORDER BY main_index""".stripMargin,
    "s2_edgar_source" ->
      """SELECT o_orderkey, CAST(o_orderkey AS BIGINT) AS total_hits,
        |  'https://www.sec.gov/Archives/edgar/data/' ||
        |  CAST(o_custkey AS VARCHAR) || '/' ||
        |  replace(adsh, '-', '') || '/' || adsh || '.txt' AS url
        |FROM (
        |  SELECT o_orderkey, o_custkey,
        |    '0000' || CAST(o_custkey AS VARCHAR) || '-26-' ||
        |    lpad(CAST(o_orderkey AS VARCHAR), 6, '0') AS adsh
        |  FROM orders WHERE o_orderkey < 300)
        |ORDER BY o_orderkey""".stripMargin,
    "cohort_retention" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE)
        |    AS w
        |  FROM events),
        |fw AS (SELECT user_id, MIN(w) AS cw FROM ev GROUP BY 1)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
        |  CAST(date_diff('day', cw, w) // 7 AS INT) AS week_offset,
        |  CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_users
        |FROM ev JOIN fw USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "event_anomalies" ->
      """WITH hc AS (
        |  SELECT event_type,
        |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |    COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |h1 AS (SELECT event_type, cnt AS v, COUNT(*) AS c
        |       FROM hc GROUP BY 1, 2),
        |c1 AS (SELECT *, SUM(c) OVER (PARTITION BY event_type ORDER BY v
        |         ROWS UNBOUNDED PRECEDING) AS cum,
        |       SUM(c) OVER (PARTITION BY event_type) AS n FROM h1),
        |med AS (SELECT event_type,
        |          MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN v END)
        |            AS med
        |        FROM c1 GROUP BY 1),
        |d1 AS (SELECT hc.event_type, abs(cnt - med) AS v, COUNT(*) AS c
        |       FROM hc JOIN med USING (event_type) GROUP BY 1, 2),
        |c2 AS (SELECT *, SUM(c) OVER (PARTITION BY event_type ORDER BY v
        |         ROWS UNBOUNDED PRECEDING) AS cum,
        |       SUM(c) OVER (PARTITION BY event_type) AS n FROM d1),
        |mad AS (SELECT event_type,
        |          MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN v END)
        |            AS mad
        |        FROM c2 GROUP BY 1)
        |SELECT hc.event_type, COUNT(*) AS n_hours,
        |  CAST(med AS BIGINT) AS med_cnt, CAST(mad AS BIGINT) AS mad_cnt,
        |  CAST(SUM(CASE WHEN abs(cnt - med) > 4 * greatest(mad, 1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        |FROM hc JOIN med USING (event_type) JOIN mad USING (event_type)
        |GROUP BY hc.event_type, med, mad
        |ORDER BY hc.event_type""".stripMargin,
    "event_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |lagd AS (
        |  SELECT *, lag(tus) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id) AS prev FROM e),
        |flag AS (
        |  SELECT *, CASE WHEN prev IS NULL OR tus - prev >= 1800000000
        |    THEN 1 ELSE 0 END AS ns FROM lagd),
        |sess AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS sno
        |  FROM flag)
        |SELECT user_id, MIN(tus) AS start_us,
        |  MAX(tus) + 1800000000 AS end_us, COUNT(*) AS n_events
        |FROM sess
        |GROUP BY user_id, sno
        |ORDER BY user_id, start_us""".stripMargin,
    "o5_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |lagd AS (
        |  SELECT *, lag(tus) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id) AS prev FROM e),
        |flag AS (
        |  SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000
        |    THEN 1 ELSE 0 END AS ns FROM lagd),
        |sess AS (
        |  SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS session_no FROM flag)
        |SELECT user_id, session_no, COUNT(*) AS n_events,
        |  MIN(tus) AS start_us, MAX(tus) AS end_us
        |FROM sess
        |GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin
  )
}
