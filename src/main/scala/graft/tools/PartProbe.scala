package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r18): verifies the exchange-reuse facts the HNSW/
  * components rewrites depend on — (1) HashPartitioning(a) satisfies
  * ClusteredDistribution(a,b) so repartition(a)+distinct(a,b)+window(a)
  * plans ONE exchange; (2) localCheckpoint preserves outputPartitioning
  * and ordering so a pre-partitioned frame joins without re-exchange. */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (1 to 10000).map(i => (i % 50L, i % 977L, i.toDouble))
      .toDF("qid", "tid", "x")

    println("=== A: repartition(qid) + distinct(qid,tid) + window(qid) ===")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"x")
    val a = df.select($"qid", $"tid", $"x").repartition($"qid")
      .groupBy($"qid", $"tid").agg(max($"x").as("x"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
    val planA = a.queryExecution.executedPlan.toString
    println("exchanges: " + "Exchange hashpartitioning".r
      .findAllIn(planA).size)

    println("=== B: localCheckpoint preserves partitioning for join ===")
    val t = df.select($"tid", $"x".as("tx")).repartition($"tid")
      .sortWithinPartitions("tid").localCheckpoint()
    println("t partitioning preserved -> join should exchange LEFT only:")
    val cand = df.select($"qid", $"tid")
    val j = cand.join(t, Seq("tid"))
    val planB = j.queryExecution.executedPlan.toString
    println("exchanges: " + "Exchange hashpartitioning".r
      .findAllIn(planB).size)
    println(planB.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Join") || l.contains("Sort") ||
        l.contains("Scan")).mkString("\n"))

    println("=== C: same as A but executed (AQE final) ===")
    a.write.format("noop").mode("overwrite").save()
    println("rows=" + a.count())

    println("=== D: repartition(tid)+distinct+join(pre-part t) fused ===")
    val expanded = df.select($"qid", $"tid").repartition($"tid")
      .distinct()
    val j2 = expanded.join(t, Seq("tid"))
    val planD = j2.queryExecution.executedPlan.toString
    println("exchanges: " + "Exchange hashpartitioning".r
      .findAllIn(planD).size)
    println(planD.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Join") || l.contains("Sort("))
      .mkString("\n"))
    spark.stop()
  }
}
