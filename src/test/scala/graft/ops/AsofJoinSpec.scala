package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of picks the greatest build time at-or-before each probe row") {
    val probe = Seq((1L, 100L, "p1"), (1L, 50L, "p2"), (2L, 10L, "p3"),
      (3L, 99L, "p4"))
      .toDF("k", "t_us", "tag")
    val build = Seq((1L, 40L), (1L, 100L), (1L, 120L), (2L, 15L))
      .toDF("k", "t_us")
    val out = AsofJoin.asofTime(probe, build, "k", "t_us")
      .select($"tag", $"asof_t_us").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out("p1") == 100L) // exact-time build row matches (<=)
    assert(out("p2") == 40L)
    assert(out("p3") == -1L)  // only later build rows -> null
    assert(out("p4") == -1L)  // key with no build rows -> null
  }

  test("dense build side stays linear: one window, no range join") {
    val probe = (0L until 100L).map(i => (i % 5, i * 10 + 5, i)).toDF("k", "t_us", "id")
    val build = (0L until 1000L).map(i => (i % 5, i)).toDF("k", "t_us")
    val out = AsofJoin.asofTime(probe, build, "k", "t_us")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      plan.take(1000))
    // every probe row matches the last same-key build value <= its time
    val rows = out.select($"id", $"k", $"asof_t_us").collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val (k, t) = (r.getLong(1), r.getLong(0) * 10 + 5)
      val expected = (0L until 1000L).filter(b => b % 5 == k && b <= t)
        .maxOption.getOrElse(-1L)
      val got = if (r.isNullAt(2)) -1L else r.getLong(2)
      assert(got == expected, s"k=$k t=$t got $got want $expected")
    }
  }

  test("pitJoin is leakage-safe: strictly-earlier only, equal-time build " +
      "rows never match, ties at the argmax time take the max value, and " +
      "the staleness horizon nulls matches") {
    val probe = Seq(
      (1L, 100L, "a"), // build exists at exactly 100 -> must NOT match it
      (1L, 150L, "b"), // latest strictly earlier: t=100
      (2L, 500L, "c"), // latest earlier t=10, staler than tolerance -> null
      (3L, 50L, "d"),  // no earlier build at all -> null
      (4L, 90L, "e")   // two builds at t=80 -> the max value (42) wins
    ).toDF("k", "t_us", "tag")
    val build = Seq(
      (1L, 40L, 7L), (1L, 100L, 9L),
      (2L, 10L, 5L),
      (4L, 80L, 17L), (4L, 80L, 42L)
    ).toDF("k", "t_us", "v")
    val out = AsofJoin.pitJoin(probe, build, "k", "t_us", "v",
      toleranceUs = 200L)
      .select($"tag", $"asof_t_us", $"asof_v").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    assert(out("a") == Some((40L, 7L)),
      s"equal-time build leaked into 'a': ${out("a")}")
    assert(out("b") == Some((100L, 9L)))
    assert(out("c").isEmpty, s"stale match must null: ${out("c")}")
    assert(out("d").isEmpty)
    assert(out("e") == Some((80L, 42L)),
      s"equal-time build duplicates must resolve to max value: ${out("e")}")
    // plan shape: still the single-window union, no range join
    val plan = AsofJoin.pitJoin(probe, build, "k", "t_us", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      plan.take(1000))
  }
}
