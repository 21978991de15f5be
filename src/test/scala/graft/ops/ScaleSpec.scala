package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without an exchange") {
    val a = (0L until 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (0L until 1000L).map(i => (i, s"b$i")).toDF("k", "vb")
    Scale.writeBucketedTable(a, "bk_a", "k", 8)
    Scale.writeBucketedTable(b, "bk_b", "k", 8)
    val joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n${plan.take(1500)}")
    assert(joined.count() == 1000)
    spark.sql("DROP TABLE bk_a"); spark.sql("DROP TABLE bk_b")
  }

  test("salted join produces the same result as a plain join") {
    // heavy skew: 90% of rows share one key
    val large = (0L until 2000L)
      .map(i => (if (i % 10 == 0) i % 7 else 42L, s"row$i"))
      .toDF("k", "payload")
    val small = Seq((42L, "hot"), (1L, "one"), (3L, "three"))
      .toDF("k", "dim")
    val plain = large.join(small, "k")
    val salted = Scale.saltedJoin(large, small, "k", saltBuckets = 8)
    assert(salted.count() == plain.count())
    val pc = plain.groupBy($"k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sc = salted.groupBy($"k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pc == sc)
  }

  test("range-sorted write emits globally ordered files without coalesce(1)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-range").toString
    val df = (0L until 500L).reverse.map(i => (i, s"v$i")).toDF("k", "v")
    Scale.rangeSortedWrite(df, dir, "k", partitions = 4)
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.filter(_.toString.endsWith(".csv")).toSeq.sorted
    assert(files.size > 1 && files.size <= 4)
    // each file internally sorted; file boundaries are range-ordered
    val perFile = files.map { f =>
      java.nio.file.Files.readAllLines(f).asScala.drop(1)
        .map(_.split(",")(0).toLong).toSeq
    }.filter(_.nonEmpty)
    perFile.foreach(ks => assert(ks == ks.sorted))
  }
}
