package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (nearest-earlier match) — one of the operators Spark lacks
  * natively, composed the scale-correct way: instead of a per-probe-row
  * range join (quadratic in hot keys), probe and build rows are UNIONED,
  * sorted once per key by event time, and each probe row picks up the
  * last non-null build value at-or-before its timestamp with a running
  * `last(_, ignoreNulls)` window. One shuffle + one sort, linear in
  * |probe| + |build|, no matter how dense the build side is.
  */
object AsofJoin {

  /** For each probe row (keyCol, probe time `tCol` in micros), attach the
    * greatest build time <= probe time for the same key, as `asof_t_us`
    * (null when the key has no earlier build row).
    *
    * `probe`: (keyCol, tCol, ...probe cols); `build`: (keyCol, tCol).
    * Ties (build time == probe time) match, mirroring `ON b.t <= p.t`.
    */
  def asofTime(probe: DataFrame, build: DataFrame, keyCol: String,
      tCol: String): DataFrame = {
    val probeCols = probe.columns.filter(c => c != keyCol && c != tCol)
    val tagged = probe
      .withColumn("__is_probe", lit(1))
      .withColumn("__build_t", lit(null).cast("long"))
      .select((Seq(col(keyCol), col(tCol), col("__is_probe"), col("__build_t")) ++
        probeCols.map(col)): _*)
      .unionByName(
        build.select(col(keyCol), col(tCol))
          .withColumn("__is_probe", lit(0))
          .withColumn("__build_t", col(tCol)),
        allowMissingColumns = true)
    // build rows sort before probe rows at equal times, so an exact-time
    // build row is visible to its probe row
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tCol), col("__is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_t_us", last(col("__build_t"), ignoreNulls = true).over(w))
      .filter(col("__is_probe") === 1)
      .drop("__is_probe", "__build_t")
  }

  /** POINT-IN-TIME-CORRECT feature join — the leakage-safe variant a
    * feature store runs when assembling training rows: each probe row
    * picks up the value of the latest build row STRICTLY BEFORE its
    * timestamp (never at-or-after — an equal-time feature already
    * contains the label event at training-serving skew boundaries), and
    * a staleness `toleranceUs` nulls matches older than the horizon
    * (serving would refuse them too). Same one-shuffle union shape as
    * [[asofTime]]; at equal times probe rows sort BEFORE build rows so
    * the window cannot leak them, and equal-time build DUPLICATES
    * resolve deterministically to the greatest value (the window's
    * final sort key — without it, `last` would pick by physical row
    * order).
    *
    * `probe`: (keyCol, tCol, ...); `build`: (keyCol, tCol, valCol).
    * Returns the probe columns plus `asof_t_us` and `asof_v` (both null
    * when no in-horizon strictly-earlier build row exists). */
  def pitJoin(probe: DataFrame, build: DataFrame, keyCol: String,
      tCol: String, valCol: String,
      toleranceUs: Long = Long.MaxValue): DataFrame = {
    require(toleranceUs > 0, s"non-positive tolerance $toleranceUs")
    val probeCols = probe.columns.filter(c => c != keyCol && c != tCol)
    val tagged = probe
      .withColumn("__is_probe", lit(1))
      .withColumn("__build_t", lit(null).cast("long"))
      .withColumn("__build_v", lit(null).cast("long"))
      .select((Seq(col(keyCol), col(tCol), col("__is_probe"),
        col("__build_t"), col("__build_v")) ++ probeCols.map(col)): _*)
      .unionByName(
        build.select(col(keyCol), col(tCol), col(valCol))
          .withColumn("__is_probe", lit(0))
          .withColumn("__build_t", col(tCol))
          .withColumn("__build_v", col(valCol).cast("long"))
          .drop(valCol),
        allowMissingColumns = true)
    // STRICT order: probe rows sort before build rows at equal times
    // (is_probe desc), so an equal-time build row is NOT visible to its
    // probe row; among equal-time build rows the value is the final key
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tCol).asc, col("__is_probe").desc, col("__build_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val horizon =
      col(tCol) - last(col("__build_t"), ignoreNulls = true).over(w) <=
        toleranceUs
    tagged
      .withColumn("asof_t_us",
        when(horizon, last(col("__build_t"), ignoreNulls = true).over(w)))
      .withColumn("asof_v",
        when(horizon, last(col("__build_v"), ignoreNulls = true).over(w)))
      .filter(col("__is_probe") === 1)
      .drop("__is_probe", "__build_t", "__build_v")
  }
}
