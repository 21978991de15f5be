package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver's sf0.1 testdata for the
  * EMPIRICAL scale curve (bench-only — correctness gates stay on the
  * driver's own parquet): `runMain graft.ScaleGen <srcDir> <outDir> <k>`
  * writes each table as k key-offset replicas, so row counts,
  * distinct-key counts, and join fan-outs all scale by k while
  * per-entity shapes (lines per order, words per doc) stay fixed —
  * the way a corpus actually grows.
  *
  *  - Foreign keys offset consistently (orders/lineitem share the
  *    orderkey offset, etc.), so every join keeps its selectivity.
  *  - region/nation stay single-copy (bounded dimensions at any scale).
  *  - documents TEXT is made genuinely distinct per replica by a
  *    bijective letter rotation (translate) plus a replica suffix —
  *    verbatim-replicated text would let every doc collide into one
  *    k-sized near-dup cluster and the MinHash/LSH/component gates
  *    would then measure a k²-pair artifact of the replication instead
  *    of the operator (real corpora grow with proportionally more
  *    DISTINCT content). Within a replica, duplicate/near-dup structure
  *    is preserved exactly (the rotation is a bijection).
  *  - embeddings replicate with offset ids and unperturbed vectors:
  *    ANN scan/train cost is row-count-driven, not distinctness-driven.
  *  - events keep their time range (density grows k-fold — streaming
  *    state and window fan-in scale, the dimension under test).
  */
object ScaleGen {
  private val Off = 1000000000L // exceeds every sf0.1 key domain

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, kStr) = args.take(3)
    val k = kStr.toInt
    require(k >= 1 && k <= 20, s"replication factor $k out of range")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def src(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    /** k replicas of `df` with the named long/int key columns offset by
      * i*Off (replica 0 verbatim), optionally text-mutated per replica. */
    def replicate(df: DataFrame, keyCols: Seq[String],
        mutate: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until k).map { i =>
        val shifted = keyCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(i * Off)))
        mutate(shifted, i)
      }.reduce(_ unionByName _)

    write(src("region"), "region")
    write(src("nation"), "nation")
    write(replicate(src("customer"), Seq("c_custkey")), "customer")
    write(replicate(src("supplier"), Seq("s_suppkey")), "supplier")
    write(replicate(src("part"), Seq("p_partkey")), "part")
    write(replicate(src("orders"), Seq("o_orderkey", "o_custkey")), "orders")
    write(replicate(src("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    write(replicate(src("events"), Seq("event_id", "user_id")), "events")
    // bijective per-replica letter rotation: every shingle differs
    // across replicas, within-replica structure is untouched
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    write(replicate(src("documents"), Seq("doc_id"),
      mutate = (d, i) =>
        if (i == 0) d
        else d.withColumn("text",
          concat(translate(col("text"), alpha,
            alpha.drop(i) + alpha.take(i)), lit(s" r$i")))),
      "documents")
    write(replicate(src("embeddings"), Seq("vec_id")), "embeddings")

    println(s"""{"scaled":"$outDir","k":$k,"src":"$srcDir"}""")
    spark.stop()
  }
}
