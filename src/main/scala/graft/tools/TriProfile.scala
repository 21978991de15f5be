package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the incremental-triangle refresh (not part of
  * the library surface; run via `runMain graft.tools.TriProfile`). */
object TriProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftFunctions.register(spark)
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import spark.implicits._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
    def pairsOf(src: org.apache.spark.sql.DataFrame) =
      src.as("a").join(src.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("id_1"), col("b.pk").as("id_2"))
    // warm the JIT once
    timed("warmup full (sf0.001)") {
      graft.ops.Graph.triangleCounts(
        pairsOf(spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
          .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")))).count()
    }
    val store = timed("store build") {
      graft.util.TempDirs.cached("triprofile-store", dir) { p =>
        graft.ops.Graph.writeTriangleStore(spark, p,
          pairsOf(li.filter($"ok" % 31 =!= 0)))
      }
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val deltaPairs = timed("delta pairs derive+mat") {
        pairsOf(li.filter($"ok" % 31 === 0)).localCheckpoint()
      }
      val old = spark.read.parquet(store + "/edges")
        .select(col("id_1").as("a"), col("id_2").as("b"))
      val delta = timed("canon+anti-join+ckpt") {
        deltaPairs.select(least($"id_1", $"id_2").as("a"),
            greatest($"id_1", $"id_2").as("b"))
          .filter($"a" =!= $"b").distinct()
          .join(old, Seq("a", "b"), "left_anti")
          .localCheckpoint()
      }
      println(s"  delta edges: ${delta.count()}")
      val full = timed("TOTAL stored fold") {
        graft.ops.Graph.incrementalTrianglesStored(spark, store, deltaPairs)
          .count()
      }
      val cold = timed("TOTAL full recompute") {
        graft.ops.Graph.triangleCounts(pairsOf(li)).count()
      }
      println(s"  rows inc=$full cold=$cold")
    }
    spark.stop()
  }
}
