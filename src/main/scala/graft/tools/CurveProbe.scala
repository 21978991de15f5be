package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-curve evidence probe: row counts of the near-dup pair gates at
  * a given sf dir (pair-volume growth is the quantity the r13 verdict
  * flagged — fixture classes must grow with the corpus so pair counts
  * stay linear). Run: `runMain graft.tools.CurveProbe <sfDir>`. */
object CurveProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftFunctions.register(spark)
    for (q <- Seq("mm_jpeg_neardup", "mm_image_neardup")) {
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(s"""{"query":"$q","sf":"$dir","pairs":$n}""")
    }
    spark.stop()
  }
}
