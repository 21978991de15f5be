package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1/S2: input sources (SURVEY.md §2.1). */
object Sources {

  /** S1: the 154-column headerless SDC-style deal CSV
    * (src/dependencies/config.py:22-27). Only four columns are semantically
    * named; the rest ride along as `_c4.._c153` strings. `main_index` is
    * the 0-based row key the whole reference pipeline joins on — derived
    * here by a deterministic sort on the leading deal-id column (a raw "file
    * row number" is not stable under distributed reads), computed as a
    * ranged running count (Sampling.rangedRunningSum) rather than an
    * unpartitioned row_number window, so the deal table never funnels
    * through a single window task however large the deal universe grows.
    */
  val dealSchema: StructType = StructType(
    StructField("deal_id", StringType) ::
      StructField("announce_date", StringType) ::
      StructField("target_name", StringType) ::
      StructField("acquirer_name", StringType) ::
      (4 until 154).map(i => StructField(s"_c$i", StringType)).toList)

  def deals(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.schema(dealSchema).csv(path)
    graft.ops.Sampling
      .rangedRunningSum(raw, Seq(col("deal_id")), lit(1L), "__rn",
        numRanges = 8)
      .withColumn("main_index", col("__rn") - 1).drop("__rn")
      .withColumn("announce_dt", to_date(col("announce_date"), "M/d/yyyy"))
  }

  /** S2: EDGAR full-text-search JSON body schema
    * (consumed at src/crawler/CrawlerSupport.py:132-141,227,242-243). */
  val edgarHitsSchema: StructType = {
    val source = new StructType()
      .add("ciks", ArrayType(StringType))
      .add("adsh", StringType)
    val hitsInner = new StructType()
      .add("total", new StructType().add("value", LongType))
      .add("hits", ArrayType(new StructType().add("_source", source)))
    val aggregations = new StructType()
      .add("entity_filter", new StructType()
        .add("buckets", ArrayType(new StructType().add("key", StringType))))
    new StructType().add("hits", hitsInner).add("aggregations", aggregations)
  }

  /** Parse EDGAR search-response JSON bodies and explode to one row per
    * hit: (total_hits, ciks, adsh). Pairs with `filingUrl` for F16. */
  def parseEdgarHits(bodies: DataFrame, jsonCol: String): DataFrame =
    bodies
      .withColumn("parsed", from_json(col(jsonCol), edgarHitsSchema))
      .withColumn("total_hits", col("parsed.hits.total.value"))
      .select(col("*"), explode(col("parsed.hits.hits")).as("hit"))
      .withColumn("ciks", col("hit._source.ciks"))
      .withColumn("adsh", col("hit._source.adsh"))
      .drop("parsed", "hit")

  /** F16: archive URL from the last CIK (leading zeros stripped; an
    * all-zeros CIK keeps a single "0" rather than vanishing) and the
    * accession number (src/crawler/CrawlerSupport.py:338-349). */
  def filingUrl(ciks: org.apache.spark.sql.Column,
      adsh: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val stripped = regexp_replace(element_at(ciks, -1), "^0+", "")
    val cik = when(stripped === "", lit("0")).otherwise(stripped)
    concat(lit("https://www.sec.gov/Archives/edgar/data/"),
      cik, lit("/"), translate(adsh, "-", ""), lit("/"), adsh, lit(".txt"))
  }

  /** F15: CIK extraction from an entity-filter bucket label
    * ('Company Name  (CIK 0001234567)'). */
  def cikFromEntity(entity: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(entity, "\\(CIK (\\d+)\\)", 1)
}
