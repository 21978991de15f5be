package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** N-version snapshot store: manifest-gated commits, partition-pruned
  * as-of reads, dangling-version invisibility, cross-version diff. */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  test("commit/asOf: three versions, manifest rows, and the as-of scan " +
      "reads ONLY its version's files (partition pruning)") {
    val root = graft.util.TempDirs.create("snap-spec") + "/store"
    assert(Snapshots.latest(spark, root) == 0)
    val v1 = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
    val v2 = Seq((1L, "one"), (2L, "two EDIT"), (4L, "four")).toDF("doc_id", "text")
    val v3 = Seq((2L, "two EDIT"), (4L, "four"), (5L, "five")).toDF("doc_id", "text")
    assert(Snapshots.commitVersion(spark, root, v1) == 1)
    assert(Snapshots.commitVersion(spark, root, v2) == 2)
    assert(Snapshots.commitVersion(spark, root, v3) == 3)
    val man = Snapshots.manifest(spark, root).orderBy($"v")
      .as[(Int, Long)].collect().toSeq
    assert(man == Seq((1, 3L), (2, 3L), (3, 3L)))
    val at2 = Snapshots.asOf(spark, root, 2)
    assert(at2.orderBy($"doc_id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "one"), (2L, "two EDIT"), (4L, "four")))
    // the pruning proof, knn_ivf_updated-style: the v filter reaches the
    // scan as a PartitionFilter, and the executed scan's numFiles metric
    // equals the file count of the v=2 directory alone — the other
    // versions' files were never read
    at2.collect() // execute THIS plan so its scan metrics populate
    val p = at2.queryExecution.executedPlan
    assert("PartitionFilters: \\[[^\\]]*v".r.findFirstIn(p.toString).isDefined,
      "expected a partition filter on v in the as-of scan: " +
        p.toString.take(1500))
    val scan = p.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }.head
    val v2Files = new java.io.File(
      root.stripPrefix("file:") + "/data/v=2").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(v2Files > 0 && scan.metrics("numFiles").value == v2Files,
      s"as-of(2) read ${scan.metrics("numFiles").value} files, " +
        s"v=2 holds $v2Files")
  }

  test("uncommitted versions are invisible: a dangling v=<k> directory " +
      "(crashed writer) is refused by asOf and healed by the re-run") {
    val root = graft.util.TempDirs.create("snap-crash") + "/store"
    Snapshots.commitVersion(spark, root,
      Seq((1L, "a")).toDF("doc_id", "text"))
    // simulate a writer that died after staging data but before the
    // manifest swap: v=2 exists on disk with (wrong, partial) content
    Seq((9L, "partial")).toDF("doc_id", "text")
      .write.parquet(root + "/data/v=2")
    intercept[IllegalArgumentException](Snapshots.asOf(spark, root, 2))
    assert(Snapshots.latest(spark, root) == 1,
      "dangling dir must not advance the version counter")
    // a FRESH dangling v=2 may be a CONCURRENT committer's just-placed
    // directory, so the heal is age-gated: the re-run must fail loudly
    // at the placement backstop, leave the directory intact — never
    // delete-and-replace it — and RELEASE its claim marker (nothing
    // was placed), so the next attempt fails the same way rather than
    // being blocked by the loser's own leftover
    val vdir = new org.apache.hadoop.fs.Path(root + "/data/v=2")
    val fs = vdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val racing = intercept[IllegalStateException](Snapshots.commitVersion(
      spark, root, Seq((2L, "b"), (3L, "c")).toDF("doc_id", "text")))
    assert(racing.getMessage.contains("writer fence"))
    assert(fs.exists(vdir), "fresh dangling dir must survive the loser")
    // age the leftover past the heal bound (a genuinely crashed writer's
    // directory): now the re-run heals — overwrite replaces the partial
    // files, the manifest row commits, and the read sees the intent
    fs.setTimes(vdir, System.currentTimeMillis() - 7200000L, -1)
    assert(Snapshots.commitVersion(spark, root,
      Seq((2L, "b"), (3L, "c")).toDF("doc_id", "text")) == 2)
    assert(Snapshots.asOf(spark, root, 2).orderBy($"doc_id")
      .as[(Long, String)].collect().toSeq == Seq((2L, "b"), (3L, "c")))
  }

  test("placement arbiter: a fresh claim marker (a concurrent committer " +
      "mid-placement) makes a second committer of the same version fail " +
      "at the claim, before touching any file") {
    val root = graft.util.TempDirs.create("snap-claim") + "/store"
    Snapshots.commitVersion(spark, root,
      Seq((1L, "a")).toDF("doc_id", "text"))
    // simulate a concurrent committer that won the v=2 claim and is
    // still staging: the marker exists, the version dir does not yet
    val marker = new org.apache.hadoop.fs.Path(root + "/data/.place-v2")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(marker, false).close()
    val racing = intercept[IllegalStateException](Snapshots.commitVersion(
      spark, root, Seq((2L, "b")).toDF("doc_id", "text")))
    assert(racing.getMessage.contains("writer fence"))
    assert(fs.exists(marker), "the live committer's claim must survive")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root + "/data/v=2")),
      "the loser must not have placed anything")
    // the claim holder completes: nothing the loser did can block it
    fs.delete(marker, false) // release, as the holder's failure path would
    assert(Snapshots.commitVersion(spark, root,
      Seq((2L, "b")).toDF("doc_id", "text")) == 2)
    // a successful commit leaves no marker behind
    assert(!fs.exists(marker))
  }

  test("diff classifies added/removed/changed/unchanged with byte totals " +
      "of the surviving side") {
    val root = graft.util.TempDirs.create("snap-diff") + "/store"
    Snapshots.commitVersion(spark, root,
      Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("doc_id", "text"))
    Snapshots.commitVersion(spark, root,
      Seq((1L, "same"), (2L, "newer"), (4L, "fresh")).toDF("doc_id", "text"))
    val d = Snapshots.diff(spark, root, 1, 2, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSeq
    assert(d == Seq(
      ("added", 1L, 5L),      // 'fresh'
      ("changed", 1L, 5L),    // 'newer' (surviving side)
      ("removed", 1L, 4L),    // 'gone'
      ("unchanged", 1L, 4L))) // 'same'
  }
}
