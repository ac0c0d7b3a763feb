package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 batch source for VCF: `spark.read.format("vcf")
  * .load(paths...)` — one InternalRow per record with the mandatory
  * fields pre-parsed (first-alt / first-FILTER semantics matching
  * `ingest/VcfReader`, `/root/reference/clinpy/utils/snp_functions.py:100-101`)
  * plus the raw INFO / FORMAT / first-sample payloads for downstream
  * column-level decoding (CSQ explode etc.).
  *
  * Partitioning: one partition per file (VCF headers make byte-range
  * splitting unattractive; genomic VCFs are usually per-sample or
  * per-chromosome sharded, which is the parallelism unit that matters).
  * `samplename` is derived from the file stem, mirroring the manifest
  * convention.
  */
class VcfDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "vcf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VcfDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new VcfTable(VcfDataSource.paths(properties))
}

object VcfDataSource {
  val schema: StructType = StructType(Seq(
    StructField("chrom", StringType), StructField("pos", LongType),
    StructField("id", StringType), StructField("ref", StringType),
    StructField("alt", StringType), StructField("qual", DoubleType),
    StructField("filter", StringType), StructField("info", StringType),
    StructField("format", StringType), StructField("sample0", StringType),
    StructField("samplename", StringType)))

  private[sources] def paths(properties: util.Map[String, String]): Seq[String] = {
    val props = properties.asScala
    props.get("paths")
      .map { js => // JSON array of paths for multi-path load(...)
        js.stripPrefix("[").stripSuffix("]").split(",")
          .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
          .filter(_.nonEmpty)
      }
      .orElse(props.get("path").map(Seq(_)))
      .getOrElse(Seq.empty)
  }
}

private class VcfTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"vcf(${paths.mkString(",")})"
  override def schema(): StructType = VcfDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VcfScanBuilder(paths)
}

private class VcfScanBuilder(paths: Seq[String]) extends ScanBuilder {
  override def build(): Scan = new VcfScan(paths)
}

private class VcfScan(paths: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = VcfDataSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => VcfInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new VcfReaderFactory
}

private case class VcfInputPartition(path: String) extends InputPartition

private class VcfReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new VcfPartitionReader(p.asInstanceOf[VcfInputPartition].path)
}

private class VcfPartitionReader(path: String)
    extends PartitionReader[InternalRow] {

  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(
      new java.io.FileInputStream(path), "UTF-8"))
  private val sample = {
    val base = new java.io.File(path).getName
    base.substring(0, base.indexOf('.') match {
      case -1 => base.length; case i => i })
  }
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null && (line.startsWith("#") || line.isEmpty))
      line = reader.readLine()
    if (line == null) { row = null; false }
    else { row = parse(line); true }
  }

  private def s(v: String): UTF8String = UTF8String.fromString(v)

  private def parse(line: String): InternalRow = {
    val f = line.split("\t", -1)
    def at(i: Int): String = if (i < f.length) f(i) else ""
    val id = at(2)
    val qual = at(5)
    InternalRow(
      s(at(0)),
      java.lang.Long.parseLong(at(1)),
      if (id == "." || id.isEmpty) null else s(id),
      s(at(3)),
      s(at(4).split(",", 2)(0)),              // first alt
      if (qual == "." || qual.isEmpty) null
      else java.lang.Double.parseDouble(qual),
      s(at(6).split(";", 2)(0)),              // first FILTER
      s(at(7)), s(at(8)), s(at(9)), s(sample))
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
