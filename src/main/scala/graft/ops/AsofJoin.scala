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
}
