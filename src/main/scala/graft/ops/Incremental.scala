package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-maintenance operators: materialized aggregate views kept
  * current by delta merge (inserts AND retractions), CDC changelog
  * application (latest-wins upsert/delete merge into a snapshot), and
  * SCD2 history construction from an event-sourced attribute stream.
  *
  * Why these exist at 100 TB: recomputing an hourly dashboard aggregate
  * over the full corpus on every ingest batch re-scans everything; the
  * incremental shape scans ONLY the delta, reduces it map-side to
  * partial aggregates (one row per touched group), and merges those into
  * the at-rest view — the view table itself is bounded by the number of
  * groups, not the number of events. Correctness hinges on the measures
  * being commutative monoids (COUNT and exact DECIMAL SUM here; see
  * [[Sketch]] for the sketch-valued variants), which also makes
  * merge(store, delta) == recompute(full) testable bit-for-bit: the
  * DuckDB twin recomputes from scratch and must hash-match the merge.
  */
object Incremental {

  /** Merge delta PARTIAL aggregates into an at-rest aggregate view.
    * `store` and `delta` carry the same schema: `keys` ++ measure
    * columns, every measure an exact summable (long count / DECIMAL sum
    * — never a float, so merge order cannot change a bit). Retractions
    * are delta rows with negated measures; `dropEmptied` removes groups
    * whose row count reaches zero (a group fully retracted leaves the
    * view, exactly as a recompute would never produce it).
    *
    * Scale shape: one shuffle on the group keys over store-rows +
    * delta-partials (both bounded by group cardinality, not event
    * cardinality); the delta reduction itself combines map-side.
    */
  def mergeAggView(store: DataFrame, delta: DataFrame, keys: Seq[String],
      countCol: String, measures: Seq[String],
      dropEmptied: Boolean = false): DataFrame = {
    val merged = store.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(countCol)).as(countCol),
        measures.map(m => sum(col(m)).as(m)): _*)
    if (dropEmptied) merged.filter(col(countCol) > 0) else merged
  }

  /** Apply a CDC changelog to a base snapshot, latest-wins per key.
    *
    * `base`: (`key`, `payload`). `log`: (`key`, `seq`, `op`, `payload`)
    * with op in {'I','U','D'} and `seq` a total order per key (commit
    * LSN / ingest sequence). The winning op per key is the struct-max
    * over (seq, op, payload) — a bounded aggregation, never a window —
    * and the merge is one full-outer join on the key: unchanged base
    * rows pass through, U/I rows take the changelog payload, D rows
    * (and insert-then-delete keys never present in base) drop.
    *
    * Returns (key, origin in {kept, updated, inserted}, payload).
    * Scale shape: shuffle carries (key, payload) once for each side;
    * the changelog reduction combines map-side to one row per touched
    * key. The payload column should already be the compact form the
    * caller wants moved (a fingerprint or pointer at 100 TB — never
    * re-derive it post-shuffle).
    */
  def applyChangelog(base: DataFrame, log: DataFrame, key: String,
      payload: String): DataFrame = {
    val latest = log
      .groupBy(col(key))
      .agg(max(struct(col("seq"), col("op"), col(payload))).as("__l"))
      .select(col(key), col("__l.op").as("__op"),
        col("__l." + payload).as("__lp"))
    base.withColumnRenamed(payload, "__bp")
      .join(latest, Seq(key), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(key),
        when(col("__op").isNull, "kept")
          .when(col("__op") === "I", "inserted")
          .otherwise("updated").as("origin"),
        // payload selected BY OP, never coalesced: a winning U/I row
        // whose payload is legitimately NULL must null the column, not
        // silently keep the stale base value (NULL updates are real
        // updates, not no-ops)
        when(col("__op").isNull, col("__bp"))
          .otherwise(col("__lp")).as(payload))
  }

  /** SCD2 (type-2 slowly-changing-dimension) history from an
    * event-sourced attribute stream: per `key`, order observations by
    * (`t`, `tiebreak`), keep only rows where the attribute CHANGES
    * (run-length collapse), and close each version with the next
    * change's timestamp — `valid_to_us` = -1 and `is_current` = 1 on
    * the open tail version.
    *
    * Both windows partition by the key — no partition-less window, so
    * no single-task funnel: a key's history sorts within its own
    * partition, and key count is the parallelism.
    */
  def scd2(ev: DataFrame, key: Column, t: Column, tiebreak: Column,
      value: Column): DataFrame = {
    val base = ev.select(key.as("k"), t.as("t_us"), tiebreak.as("tb"),
      value.as("v"))
    val w = Window.partitionBy(col("k")).orderBy(col("t_us"), col("tb"))
    val changes = base
      .withColumn("__pv", lag(col("v"), 1).over(w))
      .filter(col("__pv").isNull || col("__pv") =!= col("v"))
      .drop("__pv")
    changes
      .withColumn("__nt", lead(col("t_us"), 1).over(w))
      .select(col("k"), col("t_us").as("valid_from_us"), col("tb"),
        col("v"), coalesce(col("__nt"), lit(-1L)).as("valid_to_us"),
        when(col("__nt").isNull, 1).otherwise(0).as("is_current"))
  }

  /** Ranked-retrieval evaluation (the metrics an IR / RAG pipeline
    * reports): for each query, given a scored match set (`score` long,
    * higher = better, ties broken by ascending `id`) and a relevance
    * bit, compute over the top-`k`:
    * n_ret, n_rel_total (whole match set), n_rel_at_k, first_rel_rank
    * (0 = none), rr_e6 = 1e6/first_rel_rank and ap_e6 = average
    * precision at k, both in exact fixed-point millionths (integer
    * `div` — both engines floor positive quotients identically, no
    * float division anywhere).
    *
    * Scale shape: the top-k per query comes from the bounded
    * [[Sampling.topKByKey]] aggregate (map-side partials of <= k pairs;
    * no global rank window over the match set); the only windows run
    * inside exploded top-k frames of <= k rows per query. Relevance is
    * re-derived on the exploded rows via `relOf` to keep the packed
    * aggregate long-typed.
    */
  def retrievalEval(matches: DataFrame, query: Column, score: Column,
      id: Column, rel: Column, k: Int, relOf: Column => Column)
      : DataFrame = {
    val m = matches.select(query.as("q"), score.as("s"), id.as("i"),
      rel.cast("int").as("r"))
    val totals = m.groupBy(col("q")).agg(sum(col("r")).as("n_rel_total"))
    // top-k by (score desc, id asc): TopKByKey keeps lexicographic
    // minima, so negate the score into the packed key
    val top = m.groupBy(col("q"))
      .agg(Sampling.topKByKey(-col("s"), col("i"), k).as("__top"))
      .select(col("q"), posexplode(col("__top")).as(Seq("__pos", "__s")))
      .select(col("q"), (col("__pos") + 1).cast("long").as("rank"),
        col("__s.id").as("i"), relOf(col("__s.id")).cast("int").as("r"))
    val wk = Window.partitionBy(col("q")).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = top // <= k rows per query by construction
      .withColumn("__cum", sum(col("r")).over(wk))
      .withColumn("__p_e6",
        when(col("r") === 1, expr("(1000000 * __cum) div rank"))
          .otherwise(lit(0L)))
    scored.groupBy(col("q"))
      .agg(count(lit(1)).as("n_ret"),
        sum(col("r")).cast("long").as("n_rel_at_k"),
        coalesce(min(when(col("r") === 1, col("rank"))), lit(0L))
          .as("first_rel_rank"),
        sum(col("__p_e6")).as("__ap_num"))
      .join(totals, Seq("q"))
      .select(col("q"), col("n_ret"), col("n_rel_total"),
        col("n_rel_at_k"), col("first_rel_rank"),
        when(col("first_rel_rank") > 0,
          expr("1000000 div first_rel_rank")).otherwise(lit(0L))
          .as("rr_e6"),
        when(least(col("n_rel_total"), lit(k.toLong)) > 0,
          expr(s"__ap_num div least(n_rel_total, ${k}L)"))
          .otherwise(lit(0L)).as("ap_e6"))
  }
}
