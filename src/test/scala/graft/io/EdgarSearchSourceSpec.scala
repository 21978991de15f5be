package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EdgarSearchSourceSpec extends SparkSpec {
  import spark.implicits._

  private val urls = (0 until 6).map(i =>
    s"https://efts.sec.gov/LATEST/search-index?q=%22corp$i%22").mkString(";")

  test("DSv2 source reads url slices into (url, body) rows") {
    val df = spark.read.format("graft.io.dsv2.EdgarSearchSource")
      .option("urls", urls)
      .option("numPartitions", "3")
      .option("ratePerSec", "1000") // hermetic: don't actually throttle
      .load()
    assert(df.schema.fieldNames.toSeq == Seq("url", "body"))
    assert(df.rdd.getNumPartitions == 3)
    val rows = df.collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getString(1).contains("\"hits\"")))
    // deterministic: same urls -> same bodies (stub fetcher)
    assert(df.collect().map(_.toSeq).toSet == rows.map(_.toSeq).toSet)
  }

  test("DSv2 bodies flow into the S2 parse (from_json + explode + F16)") {
    val df = spark.read.format("graft.io.dsv2.EdgarSearchSource")
      .option("urls", urls).load()
    val parsed = Sources.parseEdgarHits(df, "body")
      .select($"url", $"total_hits", Sources.filingUrl($"ciks", $"adsh").as("filing"))
    val out = parsed.collect()
    assert(out.length == 12) // stub emits 2 hits per search
    assert(out.forall(_.getString(2).startsWith("https://www.sec.gov/Archives/")))
  }
}
