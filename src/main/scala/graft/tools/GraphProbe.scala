package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the triangle kernel at gate scale (r18
  * optimization round): reproduces graft.ops.Graph.triangleCounts phase
  * by phase with an action after each, so the wall attributes to
  * edge-gen / distinct / degree+orient / bloom / wedge-count / closing.
  * Numbers feed OPTIMIZATION_r18.md; the kernel itself is untouched.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftFunctions.register(spark)
    import spark.implicits._
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val diskOnly = org.apache.spark.storage.StorageLevel.DISK_ONLY
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("id_1"), col("b.pk").as("id_2"))
      val rawPairs = timed("pair-gen count (no distinct)") { pairs.count() }
      println(s"    raw pairs: $rawPairs")
      val undDisk = timed("und: distinct+ckpt(DISK)") {
        pairs.select(least($"id_1", $"id_2").as("a"),
            greatest($"id_1", $"id_2").as("b"))
          .filter($"a" =!= $"b").distinct()
          .localCheckpoint(true, diskOnly)
      }
      val eCount = timed("und count") { undDisk.count() }
      println(s"    |E| = $eCount")
      val und = undDisk.persist(mad)
      val deg = und.select($"a".as("n")).union(und.select($"b".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("d"))
      val oriented = timed("orient joins + ckpt(MAD)") {
        und.join(deg.select($"n".as("a"), $"d".as("da")), "a")
          .join(deg.select($"n".as("b"), $"d".as("db")), "b")
          .select(
            when($"da" < $"db" || ($"da" === $"db" && $"a" < $"b"),
              struct($"a".as("src"), $"b".as("dst"), $"db".as("ddst")))
              .otherwise(struct($"b".as("src"), $"a".as("dst"),
                $"da".as("ddst"))).as("e"))
          .select($"e.src".as("src"), $"e.dst".as("dst"),
            $"e.ddst".as("ddst"))
          .localCheckpoint(true, mad)
      }
      val bloomBits = timed("bloom build") {
        val mBits = { var m = 1L << 20; while (m < 12L * eCount) m <<= 1;
          m.toInt }
        graft.ops.Bloom.buildBits(oriented,
          Seq($"src", $"dst"), mBits, k = 6)
      }
      val wedgeRows = timed("wedge-count agg") {
        oriented.groupBy($"src").agg(count(lit(1)).as("k"))
          .agg(coalesce(sum(($"k" * ($"k" - 1) / 2).cast("long")),
            lit(0L)).as("w")).head.getLong(0)
      }
      println(s"    wedges = $wedgeRows")
      val x = oriented.select($"src", $"dst".as("v"), $"ddst".as("dv"))
      val y = oriented.select($"src", $"dst".as("w"), $"ddst".as("dw"))
      val wedges = x.join(y, Seq("src"))
        .filter($"dv" < $"dw" || ($"dv" === $"dw" && $"v" < $"w"))
        .select($"src".as("u"), $"v", $"w")
      val gated = wedges.filter(
        graft.ops.Bloom.mightContain(Seq($"v", $"w"), bloomBits, k = 6))
      val gatedCount = timed("wedge gen + bloom probe count") { gated.count() }
      println(s"    gated wedges = $gatedCount")
      val closeR = oriented.select($"src".as("v"), $"dst".as("w"))
      val nTri = timed("closing join + agg") {
        gated.join(closeR, Seq("v", "w"))
          .select(explode(array($"u", $"v", $"w")).as("node"))
          .groupBy($"node").agg(count(lit(1)).as("n_tri")).count()
      }
      println(s"    tri nodes = $nTri")
      und.unpersist(); undDisk.unpersist()
    }
    spark.stop()
  }
}
