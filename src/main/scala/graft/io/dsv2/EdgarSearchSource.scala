package graft.io.dsv2

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.io.{Clients, TokenBucket}

/** DataSourceV2 TableProvider for the EDGAR full-text-search source
  * (SURVEY.md §2.1 S2 — the "custom DataSourceV2" design option; reference
  * fetch loop src/crawler/CrawlerSupport.py:116-133).
  *
  * `spark.read.format("graft.io.dsv2.EdgarSearchSource")
  *   .option("urls", "<u1>;<u2>;...")
  *   .option("numPartitions", "4")
  *   .option("ratePerSec", "5.0")     // global cap, split per partition (S4)
  *   .load()` -> rows (url STRING, body STRING).
  *
  * The fetcher defaults to the hermetic deterministic stub; a deployment
  * swaps it with `option("fetcherClass", <fqcn of a Clients.Fetcher>)`.
  * Each input partition owns a url slice and a per-partition token bucket
  * at rate/numPartitions — the reference's Manager-shared global bucket
  * becomes shared-nothing state, which is the only form that scales past
  * one machine.
  */
class EdgarSearchSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EdgarSearchSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new EdgarSearchTable(properties)
}

object EdgarSearchSource {
  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("body", StringType, nullable = false)))
}

private[dsv2] class EdgarSearchTable(props: JMap[String, String])
    extends Table with SupportsRead {
  override def name(): String = "edgar_search"
  override def schema(): StructType = EdgarSearchSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Collections.singleton(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      private val urls = Option(options.get("urls")).getOrElse(
        Option(props.get("urls")).getOrElse("")).split(";").filter(_.nonEmpty)
      private val numParts = math.max(1, Option(options.get("numPartitions"))
        .map(_.toInt).getOrElse(math.min(4, math.max(1, urls.length))))
      private val rate = Option(options.get("ratePerSec"))
        .map(_.toDouble).getOrElse(5.0)
      private val fetcherClass = Option(options.get("fetcherClass"))
        .getOrElse(classOf[Clients.StubFetcher].getName)

      override def build(): Scan = this
      override def readSchema(): StructType = EdgarSearchSource.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val slices = urls.zipWithIndex.groupBy(_._2 % numParts)
        (0 until numParts).map { p =>
          EdgarUrlSlice(slices.getOrElse(p, Array.empty).map(_._1),
            TokenBucket.perPartitionRate(rate, numParts), fetcherClass)
            : InputPartition
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => {
          val slice = partition.asInstanceOf[EdgarUrlSlice]
          new PartitionReader[InternalRow] {
            private val fetcher = Class.forName(slice.fetcherClass)
              .getDeclaredConstructor().newInstance()
              .asInstanceOf[Clients.Fetcher]
            private val bucket = new graft.io.TokenBucket(slice.ratePerSec)
            private var i = -1
            override def next(): Boolean = { i += 1; i < slice.urls.length }
            override def get(): InternalRow = {
              bucket.acquire()
              val u = slice.urls(i)
              InternalRow(UTF8String.fromString(u),
                UTF8String.fromString(fetcher.fetch(u)))
            }
            override def close(): Unit = ()
          }
        }
    }
}

private[dsv2] case class EdgarUrlSlice(urls: Array[String],
  ratePerSec: Double, fetcherClass: String) extends InputPartition
