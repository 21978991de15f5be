package graft.plans

import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper: Test/runMain graft.plans.PlanProbe <query>. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftFunctions.register(spark)
    val df = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    println("=== initial ===")
    println(df.queryExecution.executedPlan.toString)
    df.collect()
    println("=== final (post-AQE) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
