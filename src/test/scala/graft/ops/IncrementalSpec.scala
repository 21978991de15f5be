package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Tables.money

/** Unit coverage for [[Incremental]]: view merge == recompute (incl.
  * retraction-to-zero), latest-wins changelog semantics on every op
  * combination, SCD2 run-length collapse with tie timestamps, and the
  * hand-computed retrieval metrics. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("mergeAggView: delta merge equals recompute; retraction to zero " +
      "drops the group") {
    val store = Seq(("a", 2L, 30.00), ("b", 1L, 5.00)).toDF("k", "n", "v")
      .select($"k", $"n", money($"v").as("v"))
    val delta = Seq(("a", 1L, 7.00), ("c", 2L, 9.00)).toDF("k", "n", "v")
      .select($"k", $"n", money($"v").as("v"))
    val merged = Incremental.mergeAggView(store, delta, Seq("k"), "n",
        Seq("v"))
      .select($"k", $"n", $"v".cast("double")).orderBy($"k").collect()
    assert(merged.toSeq == Seq(Row("a", 3L, 37.00), Row("b", 1L, 5.00),
      Row("c", 2L, 9.00)))

    val retract = Seq(("b", -1L, -5.00)).toDF("k", "n", "v")
      .select($"k", $"n", money($"v").as("v"))
    val after = Incremental.mergeAggView(store, retract, Seq("k"), "n",
        Seq("v"), dropEmptied = true)
      .select($"k", $"n", $"v".cast("double")).orderBy($"k").collect()
    assert(after.toSeq == Seq(Row("a", 2L, 30.00)),
      "fully-retracted group must leave the view")
  }

  test("applyChangelog: latest-wins across update, update-then-delete, " +
      "insert, insert-then-delete") {
    val base = Seq((1L, "p1"), (2L, "p2"), (3L, "p3"), (4L, "p4"),
      (5L, "p5")).toDF("id", "pl")
    val log = Seq(
      (2L, 1L, "U", "p2b"),
      (3L, 1L, "U", "p3b"), (3L, 2L, "D", null),
      (6L, 1L, "I", "p6"),
      (7L, 1L, "I", "p7"), (7L, 2L, "D", null),
      (4L, 1L, "D", null)).toDF("id", "seq", "op", "pl")
    val out = Incremental.applyChangelog(base, log, "id", "pl")
      .orderBy($"id").collect()
    assert(out.toSeq == Seq(
      Row(1L, "kept", "p1"), Row(2L, "updated", "p2b"),
      Row(5L, "kept", "p5"), Row(6L, "inserted", "p6")))
  }

  test("applyChangelog: a winning update with NULL payload NULLS the " +
      "column — it is a real update, not a no-op") {
    val base = Seq((1L, "p1"), (2L, "p2")).toDF("id", "pl")
    val log = Seq((2L, 1L, "U", null.asInstanceOf[String]))
      .toDF("id", "seq", "op", "pl")
    val out = Incremental.applyChangelog(base, log, "id", "pl")
      .orderBy($"id").collect()
    assert(out.toSeq == Seq(
      Row(1L, "kept", "p1"), Row(2L, "updated", null)),
      "NULL update must not resurrect the stale base payload")
  }

  test("scd2: run-length collapse, tie timestamps total-ordered by " +
      "tiebreak, open current version") {
    val ev = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"), (1L, 30L, 3L, "B"),
      (1L, 30L, 4L, "B"), (1L, 40L, 5L, "A"),
      (2L, 5L, 1L, "X"), (2L, 5L, 2L, "Y"))
      .toDF("u", "t", "eid", "v")
    val out = Incremental.scd2(ev, $"u", $"t", $"eid", $"v")
      .orderBy($"k", $"valid_from_us", $"tb").collect()
    assert(out.toSeq == Seq(
      Row(1L, 10L, 1L, "A", 30L, 0),
      Row(1L, 30L, 3L, "B", 40L, 0),
      Row(1L, 40L, 5L, "A", -1L, 1),
      Row(2L, 5L, 1L, "X", 5L, 0),
      Row(2L, 5L, 2L, "Y", -1L, 1)))
  }

  test("retrievalEval: hand-computed MRR / AP@k / counts") {
    // ranking by (score desc, id asc): 2, 3, 4, 1, 6, 5; odd ids relevant
    val m = Seq((1L, 5L), (2L, 9L), (3L, 7L), (4L, 7L), (5L, 1L),
      (6L, 3L)).toDF("id", "s").withColumn("q", lit("t"))
    val out = Incremental.retrievalEval(m, $"q", $"s", $"id",
      $"id" % 2 === 1, k = 3, relOf = id => id % 2 === 1).collect()
    assert(out.length == 1)
    val r = out.head
    // top-3 = [2, 3, 4]; only id 3 (rank 2) relevant
    assert(r.getAs[Long]("n_ret") == 3L)
    assert(r.getAs[Long]("n_rel_total") == 3L)
    assert(r.getAs[Long]("n_rel_at_k") == 1L)
    assert(r.getAs[Long]("first_rel_rank") == 2L)
    assert(r.getAs[Long]("rr_e6") == 500000L)
    // AP@3 = (1/2) / min(3,3) -> 500000 div 3 = 166666
    assert(r.getAs[Long]("ap_e6") == 166666L)
  }

  test("retrievalEval: query with no relevant docs reports zeros, no " +
      "division error") {
    val m = Seq((2L, 9L), (4L, 7L)).toDF("id", "s")
      .withColumn("q", lit("t"))
    val r = Incremental.retrievalEval(m, $"q", $"s", $"id",
      $"id" % 2 === 1, k = 3, relOf = id => id % 2 === 1).collect().head
    assert(r.getAs[Long]("n_rel_total") == 0L)
    assert(r.getAs[Long]("first_rel_rank") == 0L)
    assert(r.getAs[Long]("rr_e6") == 0L)
    assert(r.getAs[Long]("ap_e6") == 0L)
  }
}
