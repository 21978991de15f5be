package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  // a 5-chain (diameter 4), a triangle, and an isolated pair
  private def pairs = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (20L, 21L), (21L, 22L), (20L, 22L),
    (30L, 31L))
    .toDF("id_1", "id_2")

  test("min-label components converge to per-component minima") {
    val got = Components.minLabelComponents(pairs, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("dedupVerdicts keeps exactly the component minimum") {
    val v = Components.dedupVerdicts(pairs, iters = 4)
      .as[(Long, Long, Boolean)].collect()
    assert(v.filter(_._3).map(_._1).sorted.toSeq == Seq(1L, 20L, 30L))
    assert(v.count(!_._3) == 7)
  }

  test("componentStats: converged at depth >= diameter, detects truncation") {
    val ok = Components.componentStats(pairs, iters = 4).collect().head
    assert((ok.getLong(0), ok.getLong(1), ok.getLong(2)) == ((10L, 3L, 0L)))
    // depth 1 cannot close the 5-chain: the fixpoint test must say so
    val short = Components.componentStats(pairs, iters = 1).collect().head
    assert(short.getLong(2) > 0L)
  }

  test("labels after k rounds = min id within k hops (truncation semantics)") {
    // chain 1-2-3-4-5 at iters=1: each node sees only direct neighbors
    val l1 = Components.minLabelComponents(pairs, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(l1(5L) == 4L && l1(3L) == 2L && l1(2L) == 1L)
  }

  test("deep chain far past the production unroll: early exit at the true fixpoint") {
    // a generated 41-node path graph (diameter 40, 5x the CcIters=8 the
    // gated queries run) plus a shuffled 25-chain: proves the propagation
    // LOOP converges on graphs much deeper than the corpus's — the gate's
    // n_unconverged=0 shows 8 sufficed THERE; this shows the kernel is
    // not silently capped at any fixed depth. iters is a generous ceiling
    // (64): the early-exit test must stop the loop at the fixpoint, and
    // one extra propagation round must then change nothing.
    val chain = (0 until 40).map(i => (100L + i, 101L + i))
    // interleaved ids so min-label floods AGAINST the edge direction too
    val shuffled = (0 until 24).map(i =>
      (1000L + ((i * 7) % 25), 1000L + ((i * 7 + 7) % 25)))
    val deep = (chain ++ shuffled).toDF("id_1", "id_2")
    val labels = Components.minLabelComponents(deep, iters = 64)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 41 + 25)
    assert((0 to 40).forall(i => labels(100L + i) == 100L),
      s"chain labels wrong: ${labels.filter(_._1 < 1000L).toSeq.sorted.take(8)}")
    assert((0 until 25).forall(i => labels(1000L + i) == 1000L))
    val stats = Components.componentStats(deep, iters = 64).collect().head
    assert((stats.getLong(0), stats.getLong(1), stats.getLong(2)) ==
      ((66L, 2L, 0L)))
  }

  test("star contraction == min-label fixpoint on fixture and random graphs") {
    // same per-component minima as the diameter-bound kernel, on the
    // hand-built fixture and on seeded random graphs (including isolated
    // pairs and larger joined clusters)
    val fixture = Components.starContraction(pairs)
      .as[(Long, Long)].collect().toMap
    assert(fixture == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L, 31L -> 30L))
    val rnd = new scala.util.Random(11)
    val edges = (1 to 150).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val df = edges.toDF("id_1", "id_2")
    val star = Components.starContraction(df).as[(Long, Long)]
      .collect().toMap
    // union-find reference on the driver
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    // find() roots are not necessarily minima; normalize per component
    val minOf = want.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
    assert(star == want.map { case (k, r) => k -> minOf(r) },
      s"star labels diverge from union-find reference")
  }

  test("bestMemberVerdicts: argmax quality keeps, ties break to min id") {
    // component {1,2,3}: 2 has the best quality -> sole keeper
    // component {10,11}: tied quality -> min id 10 keeps
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_1", "id_2")
    val quality = Seq(1L -> 0.1, 2L -> 0.9, 3L -> 0.5,
      10L -> 0.7, 11L -> 0.7, 99L -> 0.0).toDF("id", "quality")
    val v = Components.bestMemberVerdicts(pairs, quality, iters = 8)
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(v == Map(1L -> false, 2L -> true, 3L -> false,
      10L -> true, 11L -> false), s"got $v")
    // 99 is in no pair: implicitly a keeper, not emitted
    assert(!v.contains(99L))
  }

  test("star contraction: deep chain converges in O(log n) rounds") {
    // the 41-node path that needs ~40 min-label rounds must converge well
    // inside star contraction's default 24-round guard (actually ~log2)
    val chain = (0 until 40).map(i => (100L + i, 101L + i)).toDF("id_1", "id_2")
    val labels = Components.starContraction(chain, maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 41 && (0 to 40).forall(i => labels(100L + i) == 100L))
  }

  test("incremental fold equals fresh recompute: merges, bridges, new nodes") {
    // old graph: {1-2-3}, {10-11}, {20-21} (untouched)
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("id_1", "id_2")
    // delta: new node 50 bridges the two old components 1* and 10*
    // (via existing members 3 and 11), plus a brand-new pair {60, 61}
    val delta = Seq((3L, 50L), (50L, 11L), (60L, 61L)).toDF("id_1", "id_2")
    val prev = Components.minLabelComponents(oldPairs, iters = 4)
    val got = Components.incrementalComponents(prev, delta, iters = 4)
      .as[(Long, Long)].collect().toMap
    val fresh = Components
      .minLabelComponents(oldPairs.unionByName(delta), iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == fresh)
    // untouched component kept verbatim; merged one took the global min
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(Seq(1L, 2L, 3L, 50L, 10L, 11L).forall(got(_) == 1L))
    assert(got(60L) == 60L && got(61L) == 60L)
  }

  test("incremental fold with empty old graph and with no-op delta") {
    val oldPairs = Seq((1L, 2L)).toDF("id_1", "id_2")
    val prev = Components.minLabelComponents(oldPairs, iters = 2)
    // delta edge entirely inside an existing component: labels unchanged
    val noop = Components.incrementalComponents(prev,
      Seq((2L, 1L)).toDF("id_1", "id_2"), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(noop == Map(1L -> 1L, 2L -> 1L))
    // empty previous label set: everything is new
    val empty = prev.filter(col("id") < 0)
    val allNew = Components.incrementalComponents(empty,
      Seq((5L, 6L)).toDF("id_1", "id_2"), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(allNew == Map(5L -> 5L, 6L -> 5L))
  }
}
