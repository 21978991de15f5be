package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Incremental, Sketch}
import graft.util.Tables._

/** Incremental-maintenance gates: materialized-view delta merge (insert
  * and retraction), CDC changelog application, SCD2 history, and ranked-
  * retrieval evaluation. Every at-rest input is staged once per testdata
  * dir as a deterministic function of the base tables, so the DuckDB twin
  * recomputes the same lineage from the base tables and must hash-match —
  * for the view-maintenance gates the twin is a FULL RECOMPUTE, which is
  * exactly the merge==direct property under test.
  */
object IncrementalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def staged(kind: String, dir: String)(write: String => Unit) =
    graft.util.TempDirs.cached(kind, dir)(write)

  /** The hourly-view group key (same rendering as event_hourly_agg). */
  private def hourCol(c: org.apache.spark.sql.Column) =
    date_format(date_trunc("hour", c), "yyyy-MM-dd HH:mm")

  /** Hourly aggregate view rows of the given events slice, measures in
    * exact summable types (long count, DECIMAL(18,2)-lattice sum). */
  private def hourlyAgg(ev: DataFrame): DataFrame =
    ev.groupBy(hourCol(col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(money(col("value"))).as("total_value"))

  val queries: Map[String, Q] = Map(
    // INCREMENTAL MATERIALIZED-VIEW MAINTENANCE — the 100-TB dashboard
    // shape: the at-rest view (staged parquet, one row per (hour, type)
    // group, built from the pre-existing 3/4 of events) absorbs the new
    // ingest batch as map-side-combined PARTIAL aggregates; only the
    // delta is scanned, and the merge shuffles view-rows + touched
    // groups, never events. The oracle recomputes the view from ALL
    // events from scratch — hash equality IS merge == recompute.
    "agg_view_maintain" -> ((s, dir) => {
      import s.implicits._
      val storePath = staged("aggview-base", dir)(p =>
        hourlyAgg(events(s, dir).filter($"event_id" % 4 =!= 3))
          .coalesce(1).write.parquet(p))
      val delta = hourlyAgg(events(s, dir).filter($"event_id" % 4 === 3))
      Incremental.mergeAggView(s.read.parquet(storePath), delta,
          Seq("hour", "event_type"), "n", Seq("total_value"))
        .select($"hour", $"event_type", $"n",
          $"total_value".cast("double").as("total_value"))
        .orderBy($"hour", $"event_type")
    }),

    // The RETRACTION face of view maintenance (late corrections / GDPR
    // deletes arriving as a changelog): the full view absorbs negated
    // partials for the retracted events; groups whose count reaches
    // zero leave the view, exactly as a recompute would never emit
    // them. Oracle = recompute over the surviving events.
    "agg_view_retract" -> ((s, dir) => {
      import s.implicits._
      val storePath = staged("aggview-full", dir)(p =>
        hourlyAgg(events(s, dir)).coalesce(1).write.parquet(p))
      val retract = events(s, dir).filter($"event_id" % 10 === 0)
        .groupBy(hourCol($"ts").as("hour"), $"event_type")
        .agg((-count(lit(1))).as("n"),
          (-sum(money($"value"))).as("total_value"))
      Incremental.mergeAggView(s.read.parquet(storePath), retract,
          Seq("hour", "event_type"), "n", Seq("total_value"),
          dropEmptied = true)
        .select($"hour", $"event_type", $"n",
          $"total_value".cast("double").as("total_value"))
        .orderBy($"hour", $"event_type")
    }),

    // The streaming face of view maintenance — the production shape:
    // train of ingest batches arrives as a stream, each micro-batch is
    // reduced to partial aggregates and foreachBatch-merged into the
    // at-rest view store (the Structured-Streaming upsert idiom for
    // sinks without native merge). The REAL streaming engine executes
    // the delta reduction; the merged store on disk is what the gate
    // reads, and the oracle recomputes the view from all events from
    // scratch — streaming merge == batch recompute.
    "stream_view_maintain_exec" -> ((s, dir) => {
      import s.implicits._
      val storePath = staged("aggview-base", dir)(p =>
        hourlyAgg(events(s, dir).filter($"event_id" % 4 =!= 3))
          .coalesce(1).write.parquet(p))
      val deltaStaged = events(s, dir).filter($"event_id" % 4 === 3)
        .select($"event_id", $"ts", $"event_type", $"value")
      // staged as TWO files + maxFilesPerTrigger=1 so the delta really
      // arrives as two micro-batches — the merge below must be
      // CUMULATIVE (each batch folds into the PREVIOUS merged view, not
      // the immutable base store) or all but the last batch would drop
      val deltaSrc = staged("aggview-delta-src2", dir)(
        deltaStaged.repartition(2).write.parquet(_))
      // fresh output store per invocation: the merge must not compound
      // across bench repetitions
      val outPath = graft.util.TempDirs.create("aggview-out") + "/data"
      val outHPath = new org.apache.hadoop.fs.Path(outPath)
      val fs = outHPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      val stream = s.readStream.schema(deltaStaged.schema)
        .option("maxFilesPerTrigger", 1).parquet(deltaSrc)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val partials = hourlyAgg(batch)
          // cumulative: fold into the previously merged view (first
          // batch starts from the base store); the previous view is
          // localCheckpoint-materialized before the overwrite so the
          // read never races its own sink. Merge order cannot move a
          // bit — the measures are exact monoids (long / DECIMAL).
          val fromStore = !fs.exists(outHPath)
          val prev =
            if (fromStore) s.read.parquet(storePath)
            else s.read.parquet(outPath).localCheckpoint()
          Incremental.mergeAggView(prev, partials,
              Seq("hour", "event_type"), "n", Seq("total_value"))
            .coalesce(1).write.mode("overwrite").parquet(outPath)
          // drop the checkpoint blocks once the overwrite has landed —
          // they'd otherwise accumulate across batches and bench reps
          if (!fromStore) { prev.unpersist(); () }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(outPath)
        .select($"hour", $"event_type", $"n",
          $"total_value".cast("double").as("total_value"))
        .orderBy($"hour", $"event_type")
    }),

    // EXACTLY-ONCE streaming sink — stream_view_maintain_exec hardened
    // to the production recovery contract: each micro-batch commits
    // (merged view + applied-batch high-water mark) as ONE atomic
    // rename (StreamOps.mergeBatchExactlyOnce), the view at rest
    // partitioned by event_type (the bucketed-store posture). After
    // the stream drains, the gate REPLAYS batch 0 with the full delta
    // through the same sink — Structured Streaming re-delivers the
    // last uncommitted batch with the same id after a crash, and the
    // mark must make that a no-op (a double-apply would shift every
    // count and fail the hash). StreamOpsSpec drives the actual
    // kill-and-restart; this gate pins end-state correctness
    // cross-engine with the full-recompute twin.
    "stream_sink_exec" -> ((s, dir) => {
      import s.implicits._
      val storePath = staged("aggview-base", dir)(p =>
        hourlyAgg(events(s, dir).filter($"event_id" % 4 =!= 3))
          .coalesce(1).write.parquet(p))
      val deltaStaged = events(s, dir).filter($"event_id" % 4 === 3)
        .select($"event_id", $"ts", $"event_type", $"value")
      val deltaSrc = staged("aggview-delta-src2", dir)(
        deltaStaged.repartition(2).write.parquet(_))
      // fresh output root per invocation (no compounding across reps)
      val outRoot = graft.util.TempDirs.create("aggview-eo")
      def sinkBatch(batch: DataFrame, id: Long): Boolean =
        graft.streaming.StreamOps.mergeBatchExactlyOnce(s, outRoot,
          base = s.read.parquet(storePath), partials = hourlyAgg(batch),
          batchId = id, keys = Seq("hour", "event_type"), countCol = "n",
          measures = Seq("total_value"), partitionCols = Seq("event_type"))
      val stream = s.readStream.schema(deltaStaged.schema)
        .option("maxFilesPerTrigger", 1).parquet(deltaSrc)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          sinkBatch(batch, id); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // the crash-replay probe: re-deliver batch 0's id with the WHOLE
      // delta — the mark must refuse it (false = skipped)
      val replayed = sinkBatch(s.read.parquet(deltaSrc), 0L)
      require(!replayed, "replayed batch 0 must be a no-op")
      s.read.parquet(graft.util.Sidecars.path(s, outRoot, "view"))
        .select($"hour", $"event_type", $"n",
          $"total_value".cast("double").as("total_value"))
        .orderBy($"hour", $"event_type")
    }),

    // SKETCH-VALUED MATERIALIZED VIEW — per-type distinct-user NDV kept
    // current without ever storing users: the view's measure is the HLL
    // register table (<= 256 rows per group at rest), a delta batch's
    // registers merge by per-register MAX (associative + commutative,
    // so merge == direct BIT-FOR-BIT), and the estimate closes over the
    // merged registers. The exact NDV rides along for the gate (the
    // convention of approx_ndv) — a production run at scale drops that
    // branch; maintaining it is precisely the cost the sketch avoids.
    "agg_view_ndv_maintain" -> ((s, dir) => {
      import s.implicits._
      val regPath = staged("ndvview-base", dir)(p =>
        Sketch.hllRegisters(events(s, dir).filter($"event_id" % 4 =!= 3),
            $"user_id", $"event_type")
          .coalesce(1).write.parquet(p))
      val deltaRegs = Sketch.hllRegisters(
        events(s, dir).filter($"event_id" % 4 === 3),
        $"user_id", $"event_type")
      val merged = s.read.parquet(regPath).unionByName(deltaRegs)
        .groupBy($"g", $"r").agg(max($"mk").as("mk"))
      val exact = events(s, dir)
        .select($"event_type".as("g"), $"user_id".as("kk"))
        .groupBy($"g").agg(countDistinct($"kk").as("n_exact"))
      exact.join(Sketch.hllEstimate(merged), "g")
        .select($"g".as("source"), $"n_exact", $"m_used", $"hll_ndv")
        .orderBy($"source")
    }),

    // CDC CHANGELOG APPLY — the Delta-MERGE / Hudi-upsert shape: a base
    // snapshot and a changelog (both at rest) merge latest-wins per key
    // in one full-outer join; multiple ops per key (update-then-update,
    // update-then-delete, insert-then-delete) resolve by commit seq via
    // a bounded struct-max aggregation, never a window. Payloads travel
    // as md5 fingerprints so the shuffle never carries document text.
    "cdc_apply" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val v1Path = staged("cdc-v1", dir)(p =>
        docs.filter($"doc_id" % 5 =!= 4).select($"doc_id", $"text")
          .coalesce(4).write.parquet(p))
      val logPath = staged("cdc-log", dir)(p => {
        val inV1 = $"doc_id" % 5 =!= 4
        val u1 = docs.filter(inV1 && $"doc_id" % 7 === 0)
          .select($"doc_id", lit(1L).as("seq"), lit("U").as("op"),
            concat($"text", lit(" rev2")).as("text"))
        val u2 = docs.filter(inV1 && $"doc_id" % 14 === 0)
          .select($"doc_id", lit(2L).as("seq"), lit("U").as("op"),
            concat($"text", lit(" rev3")).as("text"))
        val del = docs.filter(inV1 && $"doc_id" % 11 === 0)
          .select($"doc_id", lit(3L).as("seq"), lit("D").as("op"),
            lit(null).cast("string").as("text"))
        val ins = docs.filter($"doc_id" % 5 === 4)
          .select($"doc_id", lit(1L).as("seq"), lit("I").as("op"),
            concat(lit("ins "), $"text").as("text"))
        val del2 = docs.filter($"doc_id" % 10 === 9)
          .select($"doc_id", lit(2L).as("seq"), lit("D").as("op"),
            lit(null).cast("string").as("text"))
        u1.unionByName(u2).unionByName(del).unionByName(ins)
          .unionByName(del2).coalesce(4).write.parquet(p)
      })
      val base = s.read.parquet(v1Path)
        .select($"doc_id", md5($"text").as("fp"))
      val log = s.read.parquet(logPath)
        .select($"doc_id", $"seq", $"op", md5($"text").as("fp"))
      Incremental.applyChangelog(base, log, "doc_id", "fp")
        .orderBy($"doc_id")
    }),

    // SCD2 HISTORY — the warehouse dimension-versioning operator: the
    // event stream's per-user event_type observations collapse into
    // change intervals [valid_from, valid_to) with an open current
    // version. Both windows partition by user — key count is the
    // parallelism, no global sort anywhere.
    "cdc_scd2" -> ((s, dir) => {
      import s.implicits._
      Incremental.scd2(events(s, dir), $"user_id", unix_micros($"ts"),
          $"event_id", $"event_type")
        .select($"k".as("user_id"), $"valid_from_us",
          $"tb".as("event_id"), $"v".as("status"), $"valid_to_us",
          $"is_current")
        .orderBy($"user_id", $"valid_from_us", $"event_id")
    }),

    // SCD2 TEMPORAL JOIN — the consumption face of the history table: a
    // fact stream (the events NOT carrying profile updates) joins the
    // SCD2 dimension built from the update stream (event_id % 5 == 0)
    // picking the version valid at fact time: valid_from <= t < valid_to
    // (open tail unbounded). Version intervals are disjoint, so each
    // fact matches at most one version; facts before the user's first
    // update keep 'none'. One equi-shuffle on the user key with the
    // interval predicate as join residual — never a cross product.
    "scd2_temporal_join" -> ((s, dir) => {
      import s.implicits._
      val ev = events(s, dir)
      val hist = Incremental.scd2(ev.filter($"event_id" % 5 === 0),
        $"user_id", unix_micros($"ts"), $"event_id", $"event_type")
      val facts = ev.filter($"event_id" % 5 =!= 0)
        .select($"event_id", $"user_id", unix_micros($"ts").as("t_us"))
      facts.join(hist,
          facts("user_id") === hist("k") &&
            hist("valid_from_us") <= facts("t_us") &&
            (facts("t_us") < hist("valid_to_us") ||
              hist("valid_to_us") === -1L),
          "left")
        .select($"event_id", $"user_id",
          coalesce($"v", lit("none")).as("status"),
          coalesce($"valid_from_us", lit(-1L)).as("status_since_us"))
        .orderBy($"event_id")
    }),

    // RANKED-RETRIEVAL EVALUATION — the IR/RAG eval report (per query:
    // recall base, hits@k, MRR, AP@k) in exact fixed-point millionths.
    // The run under evaluation is a term-frequency ranker over the
    // corpus (substring-count tf, deterministic on both engines); the
    // qrel marks a doc relevant iff it matches AND doc_id % 3 != 0 —
    // a fixed partial ground truth, so precision at k is genuinely
    // below 1. Top-k via the bounded TopKByKey aggregate: no rank
    // window ever sees the full match set.
    "retrieval_eval" -> ((s, dir) => {
      import s.implicits._
      val terms = Seq("merge", "window", "batch", "spark").toDF("term")
      val m = t(s, dir, "documents").crossJoin(broadcast(terms))
        .select($"term", $"doc_id",
          expr("(length(text) - length(replace(text, term, ''))) " +
            "div length(term)").as("tf"))
        .filter($"tf" >= 1)
      Incremental.retrievalEval(m, $"term", $"tf", $"doc_id",
          $"doc_id" % 3 =!= 0, k = 10, relOf = id => id % 3 =!= 0)
        .withColumnRenamed("q", "term")
        .orderBy($"term")
    })
  )

  private val hourSql = "strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M')"

  val oracles: Map[String, String] = Map(
    // merge(store, delta) must equal the from-scratch recompute
    "agg_view_maintain" ->
      s"""SELECT $hourSql AS hour, event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY hour, event_type""".stripMargin,
    // streaming foreachBatch merge must equal the batch recompute
    "stream_view_maintain_exec" ->
      s"""SELECT $hourSql AS hour, event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY hour, event_type""".stripMargin,
    // exactly-once sink: streaming merge + replayed batch == one batch
    // recompute over all events — a double-apply would shift every row
    "stream_sink_exec" ->
      s"""SELECT $hourSql AS hour, event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM events
         |GROUP BY 1, 2
         |ORDER BY hour, event_type""".stripMargin,
    // register max-merge == direct sketch, so the one-pass register walk
    // over ALL events IS the maintained-view twin
    "agg_view_ndv_maintain" -> HashOracleSql.hllNdvSql(
      "SELECT event_type AS source, user_id AS k FROM events"),
    // retraction merge must equal the recompute over surviving events
    "agg_view_retract" ->
      s"""SELECT $hourSql AS hour, event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM events
         |WHERE event_id % 10 <> 0
         |GROUP BY 1, 2
         |ORDER BY hour, event_type""".stripMargin,
    "cdc_apply" ->
      """WITH v1 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 4),
        |chlog AS (
        |  SELECT doc_id, 1 AS seq, 'U' AS op, text || ' rev2' AS text
        |  FROM documents WHERE doc_id % 5 <> 4 AND doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, 2, 'U', text || ' rev3'
        |  FROM documents WHERE doc_id % 5 <> 4 AND doc_id % 14 = 0
        |  UNION ALL
        |  SELECT doc_id, 3, 'D', NULL
        |  FROM documents WHERE doc_id % 5 <> 4 AND doc_id % 11 = 0
        |  UNION ALL
        |  SELECT doc_id, 1, 'I', 'ins ' || text
        |  FROM documents WHERE doc_id % 5 = 4
        |  UNION ALL
        |  SELECT doc_id, 2, 'D', NULL
        |  FROM documents WHERE doc_id % 10 = 9),
        |latest AS (
        |  SELECT doc_id, op, text FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY seq DESC) AS rn FROM chlog) WHERE rn = 1)
        |SELECT COALESCE(v1.doc_id, latest.doc_id) AS doc_id,
        |  CASE WHEN latest.op IS NULL THEN 'kept'
        |       WHEN latest.op = 'I' THEN 'inserted'
        |       ELSE 'updated' END AS origin,
        |  md5(CASE WHEN latest.op IS NULL THEN v1.text
        |           ELSE latest.text END) AS fp
        |FROM v1 FULL OUTER JOIN latest ON v1.doc_id = latest.doc_id
        |WHERE latest.op IS NULL OR latest.op <> 'D'
        |ORDER BY doc_id""".stripMargin,
    "cdc_scd2" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type
        |  FROM events),
        |lagd AS (
        |  SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY t_us, event_id) AS pv FROM e),
        |chg AS (SELECT * FROM lagd WHERE pv IS NULL OR pv <> event_type),
        |led AS (
        |  SELECT user_id, t_us AS valid_from_us, event_id,
        |    event_type AS status,
        |    lead(t_us) OVER (PARTITION BY user_id
        |      ORDER BY t_us, event_id) AS nt
        |  FROM chg)
        |SELECT user_id, valid_from_us, event_id, status,
        |  COALESCE(nt, -1) AS valid_to_us,
        |  CASE WHEN nt IS NULL THEN 1 ELSE 0 END AS is_current
        |FROM led
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin,
    "scd2_temporal_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type
        |  FROM events),
        |upd AS (SELECT * FROM e WHERE event_id % 5 = 0),
        |lagd AS (
        |  SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY t_us, event_id) AS pv FROM upd),
        |chg AS (SELECT * FROM lagd WHERE pv IS NULL OR pv <> event_type),
        |hist AS (
        |  SELECT user_id AS k, t_us AS valid_from_us,
        |    event_type AS status,
        |    COALESCE(lead(t_us) OVER (PARTITION BY user_id
        |      ORDER BY t_us, event_id), -1) AS valid_to_us
        |  FROM chg),
        |facts AS (SELECT event_id, user_id, t_us FROM e
        |          WHERE event_id % 5 <> 0)
        |SELECT f.event_id, f.user_id,
        |  COALESCE(h.status, 'none') AS status,
        |  COALESCE(h.valid_from_us, -1) AS status_since_us
        |FROM facts f LEFT JOIN hist h
        |  ON h.k = f.user_id AND h.valid_from_us <= f.t_us
        | AND (f.t_us < h.valid_to_us OR h.valid_to_us = -1)
        |ORDER BY f.event_id""".stripMargin,
    "retrieval_eval" ->
      """WITH m AS (
        |  SELECT term, doc_id,
        |    (length(text) - length(replace(text, term, '')))
        |      // length(term) AS tf
        |  FROM documents
        |  CROSS JOIN (VALUES ('merge'), ('window'), ('batch'),
        |    ('spark')) AS qt(term)),
        |mm AS (
        |  SELECT *, CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END AS r
        |  FROM m WHERE tf >= 1),
        |tot AS (
        |  SELECT term, CAST(SUM(r) AS BIGINT) AS n_rel_total
        |  FROM mm GROUP BY term),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY term
        |    ORDER BY tf DESC, doc_id) AS rnk FROM mm),
        |cum AS (
        |  SELECT *, CAST(SUM(r) OVER (PARTITION BY term ORDER BY rnk
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumr
        |  FROM rk WHERE rnk <= 10),
        |per AS (
        |  SELECT term, COUNT(*) AS n_ret, CAST(SUM(r) AS BIGINT)
        |      AS n_rel_at_k,
        |    CAST(COALESCE(MIN(CASE WHEN r = 1 THEN rnk END), 0)
        |      AS BIGINT) AS first_rel_rank,
        |    CAST(SUM(CASE WHEN r = 1 THEN (1000000 * cumr) // rnk
        |      ELSE 0 END) AS BIGINT) AS ap_num
        |  FROM cum GROUP BY term)
        |SELECT per.term, n_ret, n_rel_total, n_rel_at_k, first_rel_rank,
        |  CAST(CASE WHEN first_rel_rank > 0
        |    THEN 1000000 // first_rel_rank ELSE 0 END AS BIGINT) AS rr_e6,
        |  CAST(CASE WHEN least(n_rel_total, 10) > 0
        |    THEN ap_num // least(n_rel_total, 10) ELSE 0 END AS BIGINT)
        |    AS ap_e6
        |FROM per JOIN tot ON per.term = tot.term
        |ORDER BY per.term""".stripMargin
  )
}
