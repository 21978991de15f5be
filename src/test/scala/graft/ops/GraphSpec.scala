package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, explode}

/** [[Graph.pagerank]] against an in-memory reference loop that replays
  * the exact integer recurrence (same floors, same damping split) on a
  * hand-built symmetric graph. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def referencePr(edges: Seq[(Long, Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.size.toLong
    val init = Graph.Scale / n
    val base = (15L * init) / 100L
    var pr = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => (pr(s) * w) / outw(s) }.sum
      }
      pr = nodes.map(v => v -> (base + (85L * contrib.getOrElse(v, 0L)) / 100L))
        .toMap
    }
    pr
  }

  test("pagerank: exact-integer recurrence matches the reference loop; " +
      "total mass stays within floor decay of Scale") {
    // symmetric triangle 1-2-3 plus a 3-4 pendant, weighted
    val raw = Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 3L), (3L, 4L, 1L))
    val edges = (raw ++ raw.map { case (a, b, w) => (b, a, w) })
    val ef = edges.toDF("src", "dst", "w")
    val outw = edges.groupBy(_._1).map { case (s, es) => (s, es.map(_._3).sum) }
    val edf = ef.join(outw.toSeq.toDF("src", "outw"), "src")
    val got = Graph.pagerank(edf, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = referencePr(edges, iters = 4)
    assert(got == want, s"got $got want $want")
    // hub node 3 (highest weighted in-mass) outranks the pendant 4
    assert(got(3L) > got(4L))
    val mass = got.values.sum
    assert(mass <= Graph.Scale && mass > Graph.Scale - 1000L,
      s"mass $mass drifted more than floor decay")
    intercept[IllegalArgumentException](
      Graph.pagerank(edf.limit(0), iters = 1))
  }

  private def edgeDf(edges: Seq[(Long, Long, Long)]) = {
    val outw = edges.groupBy(_._1).map { case (s, es) => (s, es.map(_._3).sum) }
    edges.toDF("src", "dst", "w").join(outw.toSeq.toDF("src", "outw"), "src")
  }

  test("pagerankWarm: warm start matches the reference warm trajectory " +
      "and re-converges to the merged fixpoint faster than a cold start") {
    // old graph: a strongly skewed hub (node 0) over a ring of 20 nodes,
    // with the stored ranks near-converged (the production store state);
    // delta: one light chord — the small-edit regime incremental
    // refresh exists for
    val ring = (0L until 20L).map(i => (i, (i + 1) % 20, 1L))
    val hub = (1L until 20L).map(i => (i, 0L, 10L))
    val chord = Seq((5L, 12L, 2L))
    def sym(es: Seq[(Long, Long, Long)]) =
      es ++ es.map { case (a, b, w) => (b, a, w) }
    val oldE = sym(ring ++ hub)
    val mergedE = sym(ring ++ hub ++ chord)
    val oldIters = 12
    val oldRanks = Graph.pagerank(edgeDf(oldE), iters = oldIters)
    // exactness: the Spark warm fold equals an in-memory replay of the
    // same lineage (old iterations, then k merged warm iterations)
    val oldPr = referencePr(oldE, iters = oldIters)
    def refWarm(k: Int): Map[Long, Long] = {
      val nodes = mergedE.map(_._1).distinct.sorted
      val n = nodes.size.toLong
      val init = Graph.Scale / n
      val base = (15L * init) / 100L
      val outw = mergedE.groupBy(_._1)
        .map { case (s, es) => s -> es.map(_._3).sum }
      var pr = nodes.map(v => v -> oldPr.getOrElse(v, init)).toMap
      for (_ <- 1 to k) {
        val contrib = mergedE.groupBy(_._2).map { case (d, es) =>
          d -> es.map { case (s, _, w) => (pr(s) * w) / outw(s) }.sum
        }
        pr = nodes.map(v =>
          v -> (base + (85L * contrib.getOrElse(v, 0L)) / 100L)).toMap
      }
      pr
    }
    val gotWarm = Graph.pagerankWarm(edgeDf(mergedE), oldRanks, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotWarm == refWarm(2), s"warm fold diverged from the replay")
    // the incremental win, quantified: distance to the (near-)fixpoint
    // after k rounds — warm start from the old graph's ranks must beat
    // the uniform cold start, round for round
    val fix = referencePr(mergedE, iters = 40)
    def l1(m: Map[Long, Long]) =
      fix.map { case (k2, v) => math.abs(m(k2) - v) }.sum
    val coldPr2 = referencePr(mergedE, iters = 2)
    assert(l1(refWarm(2)) < l1(coldPr2),
      s"warm-2 ${l1(refWarm(2))} should beat cold-2 ${l1(coldPr2)}")
    assert(l1(refWarm(4)) < l1(referencePr(mergedE, iters = 4)))
  }

  /** O(n^3) reference: every id triple with all three edges present. */
  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = und.map(_._1).toSeq.sorted
    val tris = for {
      i <- nodes; j <- nodes if i < j && und((i, j))
      k <- nodes if j < k && und((j, k)) && und((i, k))
    } yield (i, j, k)
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("triangleCounts: degree-ordered kernel matches brute force, " +
      "tolerates duplicates / self-loops / reversed edges") {
    // two overlapping triangles (1,2,3) and (2,3,4), a pendant, noise
    val pairs = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 2L), (4L, 5L), (6L, 6L))
    val got = Graph.triangleCounts(pairs.toDF("id_1", "id_2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == bruteTriangles(pairs))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  /** In-memory peel-to-fixpoint reference. */
  private def bruteKcore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var es = edges.map { case (a, b) => (a min b, a max b) }
      .filter { case (a, b) => a != b }.distinct
    var changed = true
    while (changed) {
      val deg = es.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val next = es.filter(e => deg(e._1) >= k && deg(e._2) >= k)
      changed = next.size != es.size
      es = next
    }
    es.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("kcore: chain peels away, clique survives, early exit = fixpoint") {
    // triangle (1,2,3) + pendant chain 3-4-5-6 + isolated edge (9,10)
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (9L, 10L))
    val got = Graph.kcore(pairs.toDF("id_1", "id_2"), k = 2, rounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(got == bruteKcore(pairs, 2))
    // truncated unroll: 1 round only removes the chain's current
    // endpoints — node 4 and 5 still present, matching a 1-deep oracle
    val oneRound = Graph
      .kcore(pairs.toDF("id_1", "id_2"), k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(oneRound == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("kcore: random graphs agree with the peel-to-fixpoint reference") {
    val rnd = new scala.util.Random(11)
    for (k <- Seq(2, 3)) {
      val pairs = Seq.fill(70)((rnd.nextInt(16).toLong,
        rnd.nextInt(16).toLong))
      val got = Graph.kcore(pairs.toDF("id_1", "id_2"), k, rounds = 20)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bruteKcore(pairs, k), s"k=$k")
    }
  }

  test("triangleCounts: random graphs agree with brute force") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val pairs = Seq.fill(60)((rnd.nextInt(14).toLong,
        rnd.nextInt(14).toLong))
      val got = Graph.triangleCounts(pairs.toDF("id_1", "id_2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bruteTriangles(pairs))
    }
  }

  test("incrementalTriangles: random old/delta splits fold to exactly " +
      "the full-graph counts; re-inserted edges are no-ops") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 4) {
      val pairs = Seq.fill(80)((rnd.nextInt(16).toLong,
        rnd.nextInt(16).toLong)).filter(p => p._1 != p._2)
      val (oldP, deltaP) = pairs.partition(_ => rnd.nextBoolean())
      val prev = Graph.triangleCounts(oldP.toDF("id_1", "id_2"))
      // delta deliberately re-includes some old edges: must be no-ops
      val dirty = deltaP ++ oldP.take(5)
      val got = Graph.incrementalTriangles(prev,
          oldP.toDF("id_1", "id_2"), dirty.toDF("id_1", "id_2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bruteTriangles(pairs),
        s"incremental fold diverged from the full count")
      // empty delta: the fold is the identity on the stored counts
      val noop = Graph.incrementalTriangles(prev,
          oldP.toDF("id_1", "id_2"),
          Seq.empty[(Long, Long)].toDF("id_1", "id_2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(noop == bruteTriangles(oldP))
    }
  }

  test("triangle store: stored fold == full-graph counts on random " +
      "splits; append rolls every sidecar forward to the fresh-build " +
      "state; replay/empty appends are refused") {
    val rnd = new scala.util.Random(17)
    for (round <- 1 to 3) {
      val pairs = Seq.fill(90)((rnd.nextInt(18).toLong,
        rnd.nextInt(18).toLong)).filter(p => p._1 != p._2)
      val (oldP, deltaP0) = pairs.partition(_ => rnd.nextBoolean())
      if (deltaP0.nonEmpty && oldP.nonEmpty) {
        val deltaP = deltaP0 ++ oldP.take(4) // dirty: re-inserts are no-ops
        val store = graft.util.TempDirs.create(s"tri-store-$round") + "/s"
        Graph.writeTriangleStore(spark, store, oldP.toDF("id_1", "id_2"))
        // read-only refresh == full recompute
        val got = Graph.incrementalTrianglesStored(spark, store,
            deltaP.toDF("id_1", "id_2"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == bruteTriangles(pairs),
          "stored fold diverged from the full count")
        // append commits the same counts AND the rolled-forward sidecars
        Graph.appendTriangleStore(spark, store, deltaP.toDF("id_1", "id_2"))
        val committed = graft.util.Sidecars.read(spark, store, "counts")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(committed == bruteTriangles(pairs))
        // sidecars must equal a FRESH build over the merged graph:
        val fresh = graft.util.TempDirs.create(s"tri-fresh-$round") + "/s"
        Graph.writeTriangleStore(spark, fresh, pairs.toDF("id_1", "id_2"))
        def edgeSet(p: String) = spark.read.parquet(p + "/edges")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(edgeSet(store) == edgeSet(fresh), "edge roll-forward")
        // adjacency increments must FLATTEN to the fresh build's lists
        // (per-node neighbour SETS equal; increments may split a node's
        // list across rows — that's the append design)
        def adjMap(p: String) = spark.read.parquet(p + "/adj")
          .select(col("n"),
            explode(col("adj")).as("y"))
          .collect().groupBy(_.getLong(0))
          .map { case (n, rs) => n -> rs.map(_.getLong(1)).toSet }
        assert(adjMap(store) == adjMap(fresh), "adjacency roll-forward")
        // and hold no duplicates (each neighbour exactly once — the
        // array_intersect exactness contract)
        val dupes = spark.read.parquet(store + "/adj")
          .select(col("n"),
            explode(col("adj")).as("y"))
          .groupBy("n", "y").count().filter(col("count") > 1).count()
        assert(dupes == 0, "duplicate neighbour in rolled adjacency")
        val (mStore, mFresh) = (
          graft.util.Sidecars.read(spark, store, "meta").collect()(0),
          graft.util.Sidecars.read(spark, fresh, "meta").collect()(0))
        assert(mStore.getLong(0) == mFresh.getLong(0), "edge_count roll")
        // a verbatim replay (all edges already live) is refused loudly
        val refusal = intercept[IllegalArgumentException](
          Graph.appendTriangleStore(spark, store,
            deltaP.toDF("id_1", "id_2")))
        assert(refusal.getMessage.contains("empty delta"))
      }
    }
  }

  test("triangle store: two overlapping appends — one winner, one loud " +
      "fence failure, committed state equals the winner's alone") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (1L, 5L), (2L, 5L))
    val store = graft.util.TempDirs.create("tri-race") + "/s"
    Graph.writeTriangleStore(spark, store, pairs.toDF("id_1", "id_2"))
    val d1 = Seq((2L, 4L)).toDF("id_1", "id_2")
    val d2 = Seq((3L, 5L)).toDF("id_1", "id_2")
    // W1 reads the store (fence epoch captured at transaction start),
    // then W2's whole append lands inside W1's window: exactly one
    // commits; the loser fails loudly BEFORE mutating anything
    val e0 = graft.util.Sidecars.fenceEpoch(spark, store)
    Graph.appendTriangleStore(spark, store, d2) // W2 wins
    // W1 replays with its stale window by appending after W2 committed —
    // simulate by racing the claim with the captured epoch
    val loser = intercept[IllegalStateException](
      graft.util.Sidecars.claim(spark, store, Some(e0)))
    assert(loser.getMessage.contains("writer fence"))
    // committed state is exactly base + W2's delta
    val want = Graph.triangleCounts((pairs :+ (3L, 5L)).toDF("id_1", "id_2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = graft.util.Sidecars.read(spark, store, "counts")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "store must hold the winner's state alone")
    // and the store still accepts W1's delta from a FRESH read
    Graph.appendTriangleStore(spark, store, d1)
    val want2 = Graph.triangleCounts(
      (pairs ++ Seq((3L, 5L), (2L, 4L))).toDF("id_1", "id_2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got2 = graft.util.Sidecars.read(spark, store, "counts")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == want2)
  }

  test("triangleCounts: Bloom-gated and plain closing joins are " +
      "bit-identical (false negatives impossible, positives confirmed)") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(200)((rnd.nextInt(25).toLong,
      rnd.nextInt(25).toLong))
    val df = pairs.toDF("id_1", "id_2")
    val plain = Graph.triangleCounts(df, maxBloomEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gated = Graph.triangleCounts(df, maxBloomEdges = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plain == gated)
    assert(plain == bruteTriangles(pairs))
  }

  test("triangleCounts: src-sliced multi-pass closing join is " +
      "bit-identical to single-pass (counts additive over src slices)") {
    val rnd = new scala.util.Random(23)
    val pairs = Seq.fill(300)((rnd.nextInt(30).toLong,
      rnd.nextInt(30).toLong))
    val df = pairs.toDF("id_1", "id_2")
    val single = Graph.triangleCounts(df, Graph.MaxBloomEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // force a handful of passes (the ~2.7k-wedge graph against a
    // 1000-wedge budget -> 3 passes); also cross with the ungated path
    // so both bloom branches are exercised under slicing
    for (bloom <- Seq(0L, Graph.MaxBloomEdges)) {
      val sliced = Graph.triangleCounts(df, bloom,
          maxWedgeRowsPerPass = 1000L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sliced == single, s"bloom=$bloom")
    }
    assert(single == bruteTriangles(pairs))
  }
}
