package graft.ops

import graft.SparkSpec

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
}
