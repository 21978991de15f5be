package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: Morton-key invariants and the physical write's
  * pruning power (per-file bounding boxes on the ORIGINAL columns). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits round-trips both dimensions and preserves " +
      "tile squares") {
    val xs = Seq(0L, 1L, 63L, 64L, 1023L, 65535L)
    val df = xs.flatMap(x => xs.map(y => (x, y))).toDF("x", "y")
      .withColumn("z", Layout.interleaveBits($"x", $"y"))
    // de-interleave in the same bit algebra: even bits back to x, odd to y
    val decoded = df.select($"x", $"y",
      (0 until Layout.Bits).map(i =>
        shiftleft(shiftright($"z", 2 * i).bitwiseAND(lit(1L)), i))
        .reduce(_ + _).as("x2"),
      (0 until Layout.Bits).map(i =>
        shiftleft(shiftright($"z", 2 * i + 1).bitwiseAND(lit(1L)), i))
        .reduce(_ + _).as("y2"))
    assert(decoded.filter($"x" =!= $"x2" || $"y" =!= $"y2").isEmpty)
  }

  test("every level-10 tile spans at most 64 per axis (zorder_stats)") {
    val stats = graft.SparkEntry.queries("zorder_stats")(
      spark, sf("sf0.001"))
    assert(stats.count() > 1) // the layout actually partitions the data
    assert(stats.filter($"span_x" > 64 || $"span_y" > 64).isEmpty)
  }

  test("zorderWrite: files carry disjoint z ranges and tight per-file " +
      "bounding boxes on both original columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder")
    dir.toFile.deleteOnExit()
    val ev = graft.util.Tables.events(spark, sf("sf0.01")).select(
      $"event_id",
      $"user_id".bitwiseAND(lit(65535L)).as("x"),
      expr("unix_micros(ts) div 3600000000").bitwiseAND(lit(65535L))
        .as("y"))
    Layout.zorderWrite(ev, Layout.interleaveBits($"x", $"y"),
      dir.toString, nFiles = 8)
    val back = spark.read.parquet(dir.toString)
      .withColumn("z", Layout.interleaveBits($"x", $"y"))
      .withColumn("f", input_file_name())
    val files = back.groupBy($"f")
      .agg(min($"z").as("z_min"), max($"z").as("z_max"),
        min($"x").as("x_min"), max($"x").as("x_max"),
        min($"y").as("y_min"), max($"y").as("y_max"))
      .collect()
    assert(files.length >= 4, s"expected multiple files, got ${files.length}")
    // disjoint z ranges across files (range partitioning did its job)
    val zr = files.map(r => (r.getAs[Long]("z_min"), r.getAs[Long]("z_max")))
      .sortBy(_._1)
    zr.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlap: $hi > $lo2")
      case _ =>
    }
    // pruning power: the mean per-file bbox area must be well under the
    // global bbox area (a random layout would put ~the global range in
    // EVERY file; Morton order shrinks both axes together)
    val gx = files.map(_.getAs[Long]("x_max")).max -
      files.map(_.getAs[Long]("x_min")).min + 1
    val gy = files.map(_.getAs[Long]("y_max")).max -
      files.map(_.getAs[Long]("y_min")).min + 1
    val areas = files.map(r =>
      (r.getAs[Long]("x_max") - r.getAs[Long]("x_min") + 1).toDouble *
        (r.getAs[Long]("y_max") - r.getAs[Long]("y_min") + 1))
    val meanArea = areas.sum / areas.length
    assert(meanArea < 0.5 * gx * gy,
      s"no locality: mean bbox $meanArea vs global ${gx * gy}")
  }

  test("pruning proof: z-order skips files on BOTH axes where the " +
      "x-sorted layout of the same data prunes only x") {
    val zDir = java.nio.file.Files.createTempDirectory("graft-zprune")
    val xDir = java.nio.file.Files.createTempDirectory("graft-xprune")
    Seq(zDir, xDir).foreach(_.toFile.deleteOnExit())
    // NORMALIZE each dimension onto the full 2^Bits domain first — the
    // production prerequisite for Morton layout: with raw values (x
    // spans 150 ids, y a ~720-hour band) the interleave's top bits are
    // all y, and 16 files split on y alone (measured: zero x pruning)
    val raw = graft.util.Tables.events(spark, sf("sf0.01")).select(
      $"event_id",
      $"user_id".as("x0"),
      expr("unix_micros(ts) div 3600000000").as("y0"))
    val b = raw.agg(min($"x0"), max($"x0"), min($"y0"), max($"y0"))
      .collect()(0)
    def norm(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      ((c - lo) * 65535L / math.max(hi - lo, 1L)).cast("long")
    val ev = raw.select($"event_id",
      norm($"x0", b.getLong(0), b.getLong(1)).as("x"),
      norm($"y0", b.getLong(2), b.getLong(3)).as("y"))
    val nFiles = 16
    Layout.zorderWrite(ev, Layout.interleaveBits($"x", $"y"),
      zDir.toString, nFiles)
    // the one-dimensional baseline: same data, same file count, sorted
    // on x only
    ev.repartitionByRange(nFiles, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(xDir.toString)

    // per-file [min,max] of each original column == the parquet footer
    // stats a reader prunes on; a file must be read iff its interval
    // intersects the predicate range
    def bboxes(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min($"x").as("x_min"), max($"x").as("x_max"),
        min($"y").as("y_min"), max($"y").as("y_max"))
      .collect()
    def mustRead(boxes: Array[org.apache.spark.sql.Row], axis: String,
        lo: Long, hi: Long): Int =
      boxes.count(r => r.getAs[Long](s"${axis}_max") >= lo &&
        r.getAs[Long](s"${axis}_min") <= hi)
    val zb = bboxes(zDir.toString)
    val xb = bboxes(xDir.toString)
    assert(zb.length == nFiles && xb.length == nFiles)

    // central ~6% range per axis (data-derived, layout-independent)
    def centralRange(axis: String): (Long, Long) = {
      val lo = zb.map(_.getAs[Long](s"${axis}_min")).min
      val hi = zb.map(_.getAs[Long](s"${axis}_max")).max
      val mid = (lo + hi) / 2
      val w = math.max((hi - lo) / 32, 1L)
      (mid - w / 2, mid + w / 2)
    }
    val (xlo, xhi) = centralRange("x")
    val (ylo, yhi) = centralRange("y")

    val zOnX = mustRead(zb, "x", xlo, xhi)
    val zOnY = mustRead(zb, "y", ylo, yhi)
    val xsOnX = mustRead(xb, "x", xlo, xhi)
    val xsOnY = mustRead(xb, "y", ylo, yhi)
    // the x-sorted layout has no y clustering: a y predicate reads it all
    assert(xsOnY == nFiles, s"x-sorted pruned y?! $xsOnY/$nFiles")
    // z-order prunes strictly on BOTH axes...
    assert(zOnX < nFiles, s"z-order read all files on x: $zOnX")
    assert(zOnY < nFiles, s"z-order read all files on y: $zOnY")
    // ...and strictly beats the x-sorted layout on the y predicate
    assert(zOnY < xsOnY, s"z $zOnY !< x-sorted $xsOnY on y")
    // sanity: the baseline's x pruning works (it sorted on x, after all)
    assert(xsOnX < nFiles)
  }
}
