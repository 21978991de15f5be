package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private val eventsDir = "/root/testdata/sf0.001"

  // FileStreamSource requires a directory; stage the single parquet file
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream")
    d.toFile.deleteOnExit()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$eventsDir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(240000)
    if (q.isActive) q.stop()
    spark.table(name)
  }

  test("exactly-once sink: redelivered batch ids are no-ops, a killed " +
      "and restarted stream does not double-apply, crashed staging " +
      "leftovers are healed") {
    val root = graft.util.TempDirs.create("eo-sink")
    val base = Seq(("a", 1L, 10L), ("b", 1L, 20L)).toDF("k", "n", "v")
    def batchDf(rows: (String, Long, Long)*) = rows.toDF("k", "n", "v")
    def merge(b: org.apache.spark.sql.DataFrame, id: Long): Boolean =
      StreamOps.mergeBatchExactlyOnce(spark, root, base, b, id,
        keys = Seq("k"), countCol = "n", measures = Seq("v"))
    def view(): Map[String, (Long, Long)] =
      spark.read.parquet(graft.util.Sidecars.path(spark, root, "view")).select($"k", $"n", $"v")
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
        .toMap
    // batch 0 applies on top of the base store
    assert(merge(batchDf(("a", 1L, 5L)), 0L))
    assert(view() == Map("a" -> (2L, 15L), "b" -> (1L, 20L)))
    // the at-least-once redelivery of batch 0 (same id, crash contract)
    // must be a provable no-op — view bit-unchanged
    assert(!merge(batchDf(("a", 1L, 5L)), 0L))
    assert(view() == Map("a" -> (2L, 15L), "b" -> (1L, 20L)))
    // a crashed writer's staging leftovers must not block the next commit
    Seq(("junk", 9L, 9L)).toDF("k", "n", "v")
      .write.parquet(root + "/view.next")
    assert(merge(batchDf(("b", 2L, 2L), ("c", 1L, 1L)), 1L))
    assert(view() ==
      Map("a" -> (2L, 15L), "b" -> (3L, 22L), "c" -> (1L, 1L)))
    // kill-and-restart through the REAL engine: a fresh checkpoint
    // re-delivers the same source files as batch ids 0..1 — every one
    // is <= the committed mark, so the whole rerun must change nothing
    val srcDir = graft.util.TempDirs.create("eo-src")
    batchDf(("a", 1L, 5L)).repartition(2).write.parquet(srcDir + "/d")
    val before = view()
    val q = spark.readStream
      .schema(batchDf(("x", 0L, 0L)).schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir + "/d")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        merge(b, id); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(240000)
    assert(view() == before,
      "restart with a reset checkpoint must not double-apply any batch")
  }

  test("streaming windowed agg matches the batch equivalent") {
    val stream = StreamOps.eventsStream(spark, streamDir)
    val out = runToMemory(StreamOps.windowedAgg(stream), "win_agg", "append")
    val batch = graft.util.Tables.events(spark, eventsDir)
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
    // append mode emits only watermark-closed windows; every emitted row
    // must match its batch counterpart
    val bm = batch.select($"window.start", $"event_type", $"n").collect()
      .map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val emitted = out.select($"window.start", $"event_type", $"n").collect()
    assert(emitted.nonEmpty)
    emitted.foreach { r =>
      assert(bm((r.get(0).toString, r.getString(1))) == r.getLong(2))
    }
  }

  test("streaming dedup emits one row per key (J4 streaming stance)") {
    val stream = StreamOps.eventsStream(spark, streamDir)
      .withColumn("utype", concat($"user_id", lit("-"), $"event_type"))
    val out = runToMemory(StreamOps.dedupByKey(stream, "utype"), "dedup", "append")
    val batchDistinct = graft.util.Tables.events(spark, eventsDir)
      .select(concat($"user_id", lit("-"), $"event_type")).distinct().count()
    assert(out.count() == batchDistinct)
  }

  test("streaming near-dup dedup keeps one doc per simhash key") {
    val d = java.nio.file.Files.createTempDirectory("graft-neardup")
    d.toFile.deleteOnExit()
    val docs = Seq(
      (1L, "2026-01-01 00:00:00", "the quick brown fox jumps"),
      (2L, "2026-01-01 00:01:00", "The quick  BROWN   fox jumps"), // case/ws variant
      (3L, "2026-01-01 00:02:00", "a completely different document body"),
      (4L, "2026-01-01 00:03:00", "the quick brown fox jumps")) // exact dup
      .toDF("doc_id", "ts_s", "text")
      .withColumn("ts", $"ts_s".cast("timestamp")).drop("ts_s")
    docs.write.parquet(d.toString + "/p")
    val stream = spark.readStream.schema(docs.schema).parquet(d.toString + "/p")
    val out = runToMemory(StreamOps.nearDupDedup(stream, "text"),
      "neardup", "append")
    // 1/2/4 normalize to the same text -> same simhash -> one survivor
    assert(out.count() == 2)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet
      .intersect(Set(1L, 2L, 4L)).size == 1)
  }

  test("executed streaming window agg emits exactly the closed-form set " +
      "(windows with end <= max(ts) - watermark)") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("stream_window_exec")(spark, dir)
    val ev = graft.util.Tables.events(spark, dir)
    val wmUs = ev.agg(max(unix_micros($"ts"))).head.getLong(0) - 600000000L
    // the single-file staging means no row is late: every emitted window
    // must carry the FULL batch aggregate, and the emitted set must be
    // exactly the watermark-closed windows
    val expected = ev
      .groupBy(expr("(unix_micros(ts) div 300000000) * 300000000").as("ws"),
        $"event_type")
      .agg(count(lit(1)).as("n"))
      .filter($"ws" + 300000000L <= wmUs)
      .select(date_format(timestamp_micros($"ws"), "yyyy-MM-dd HH:mm")
        .as("w_start"), $"event_type", $"n")
    assert(out.count() == expected.count())
    assert(expected.except(out.select($"w_start", $"event_type", $"n")).isEmpty)
  }

  test("executed streaming near-dup emits exactly the batch key set") {
    val dir = "/root/testdata/sf0.001"
    val batchKeys = graft.util.Tables.t(spark, dir, "documents")
      .filter(length(graft.ops.Dedup.normalized($"text")) > 0)
      .select(graft.GraftFunctions
        .simhash64(graft.ops.Dedup.normalized($"text")).as("sh"))
      .distinct()
    val execKeys = graft.SparkEntry.queries("stream_neardup_exec")(spark, dir)
    assert(execKeys.count() == batchKeys.count())
    assert(batchKeys.except(execKeys).isEmpty)
  }

  test("executed streaming incremental dedup emits exactly the d7 fp set") {
    val dir = "/root/testdata/sf0.001"
    // batch truth: the d7 anti-join's surviving fingerprints (stream
    // member choice is arrival-dependent; the fp SET is not)
    val batchFps = graft.SparkEntry.queries("d7_incremental_dedup")(spark, dir)
      .select($"fp").distinct()
    val execFps = graft.SparkEntry.queries("stream_incrdedup_exec")(spark, dir)
    assert(execFps.count() == batchFps.count())
    assert(batchFps.except(execFps).isEmpty)
    // re-submissions (store hits) must have been dropped by the
    // stream-static anti-join: no store fp may appear
    val store = graft.util.Tables.t(spark, dir, "documents")
      .filter($"doc_id" < 400)
      .select(graft.ops.TextAnalysis.fingerprint($"text").as("fp"))
    assert(execFps.join(store, Seq("fp")).isEmpty)
  }

  test("flatMapGroupsWithState sessionization matches batch gap sessions") {
    val stream = StreamOps.eventsStream(spark, streamDir)
    val sessions = runToMemory(
      StreamOps.sessionize(spark, stream).toDF(), "sessions", "append")
    // closed sessions only (tail sessions wait for timeout); each closed
    // session must match a batch-computed gap session exactly
    val batch = graft.util.Tables.events(spark, eventsDir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("tus"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"tus", $"event_id")
    val expected = batch
      .withColumn("prev", lag($"tus", 1).over(w))
      .withColumn("ns", when($"prev".isNull || $"tus" - $"prev" > 1800000000L, 1)
        .otherwise(0))
      .withColumn("sno", sum($"ns").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sno")
      .agg(count(lit(1)).as("n_events"), min($"tus").as("start_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(2)).toMap
    val got = sessions.collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getTimestamp(1)
      val micros = t.getTime * 1000 + (t.getNanos / 1000) % 1000
      val key = (r.getLong(0), micros)
      assert(expected.contains(key), s"unexpected session $key")
      assert(expected(key) == r.getInt(3).toLong,
        s"session $key events ${r.getInt(3)} != ${expected(key)}")
    }
  }

  test("streaming SCD2 emits exactly the batch history's closed versions") {
    val stream = StreamOps.eventsStream(spark, streamDir)
    val got = runToMemory(
      StreamOps.scd2Stream(spark, stream).toDF(), "scd2_stream", "append")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSet
    val expected = graft.ops.Incremental.scd2(
        graft.util.Tables.events(spark, eventsDir),
        $"user_id", unix_micros($"ts"), $"event_id", $"event_type")
      .filter($"is_current" === 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSet
    assert(got.nonEmpty)
    assert(got == expected,
      s"closed-version sets differ: stream-only=${(got -- expected).take(3)}" +
        s" batch-only=${(expected -- got).take(3)}")
  }
}
