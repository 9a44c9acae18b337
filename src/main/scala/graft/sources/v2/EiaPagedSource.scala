package graft.sources.v2

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 batch source modeling the EIA paginated ingest at scale
  * (SURVEY §2.1 S3: probe reports `total`, then pages of `pageSize`
  * sorted ascending by period).
  *
  * This is the 100 TB shape of the reference's driver-side pagination
  * loop (src/data_fetcher.py:66-115): `planInputPartitions` returns one
  * [[InputPartition]] per page, so every page is fetched and decoded BY
  * AN EXECUTOR in parallel — the driver only plans. Here the "fetch"
  * synthesizes the page deterministically (zero-egress environment); a
  * production impl would issue the HTTP GET inside the partition reader
  * via [[graft.sources.Connectors]] and keep everything else identical.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.v2.EiaPagedSource")
  *     .option("total", 4320).option("pageSize", 500)
  *     .option("region", "NYIS").option("start", "2024-01-01")
  *     .load()   // period STRING, respondent STRING, value STRING
  * }}}
  */
class EiaPagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EiaPagedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EiaPagedTable(new CaseInsensitiveStringMap(properties))
}

object EiaPagedSource {
  /** The raw EIA record shape — stringly-typed `value`, exactly what the
    * API returns (cast null-on-error happens downstream, P10). */
  val schema: StructType = StructType(Seq(
    StructField("period", StringType, nullable = false),
    StructField("respondent", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Deterministic synthetic hourly demand for (region, hourIndex). */
  def valueAt(region: String, hourIdx: Long): String = {
    val base = 10000.0 + (math.abs(region.hashCode) % 5000)
    val daily = 2000.0 * math.sin(2 * math.Pi * (hourIdx % 24).toDouble / 24.0)
    f"${base + daily + (hourIdx % 7) * 13.0}%.2f"
  }
}

private class EiaPagedTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"eia_paged(${options.get("region")})"
  override def schema(): StructType = EiaPagedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new EiaScanBuilder(opts)
}

private class EiaScanBuilder(options: CaseInsensitiveStringMap) extends ScanBuilder with Scan with Batch {
  private val total = options.getLong("total", 4320L)
  private val pageSize = options.getInt("pageSize", 5000)
  private val region = Option(options.get("region")).getOrElse("TEST")
  private val start = Option(options.get("start")).getOrElse("2024-01-01")

  override def build(): Scan = this
  override def readSchema(): StructType = EiaPagedSource.schema
  override def toBatch: Batch = this

  /** One partition per page — the partition plan IS the pagination. */
  override def planInputPartitions(): Array[InputPartition] =
    graft.sources.Connectors.pagePlan(total, pageSize)
      .map(off => EiaPagePartition(region, start, off,
        math.min(off + pageSize, total)): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory = new EiaPageReaderFactory
}

private case class EiaPagePartition(region: String, start: String,
    from: Long, until: Long) extends InputPartition

private class EiaPageReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EiaPagePartition]
    new PartitionReader[InternalRow] {
      private var i = p.from - 1
      private val startDate = java.time.LocalDateTime.parse(s"${p.start}T00:00:00")
      override def next(): Boolean = { i += 1; i < p.until }
      override def get(): InternalRow = {
        val period = startDate.plusHours(i)
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH"))
        InternalRow(
          UTF8String.fromString(period),
          UTF8String.fromString(p.region),
          UTF8String.fromString(EiaPagedSource.valueAt(p.region, i)))
      }
      override def close(): Unit = ()
    }
  }
}
