package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.XlsxIngest
import graft.model.SheetMatrix

/** DataSourceV2 wrapper over [[XlsxIngest]]:
  *
  * {{{
  *   spark.read.format("graft.sources.XlsxDataSource")
  *     .option("sheet", "Data")          // default: first sheet
  *     .option("leapBugCompat", "true")  // Excel 1900 leap-bug fidelity
  *     .load("/path/book.xlsx")
  * }}}
  *
  * Schema inference reads only the header row region of the sheet
  * driver-side. One InputPartition per workbook file: an xlsx (zip of
  * XML) is not splittable, so the file — not the row range — is the
  * parallelism unit; a directory of workbooks fans out across
  * executors, which is the only scale-out an xlsx corpus admits.
  * Cells stay all-string (the reference's data model).
  */
class XlsxDataSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  private def firstPath(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).orElse(Option(options.get("paths")))
      .getOrElse(throw new IllegalArgumentException("xlsx source needs a path"))
    // "paths" arrives as a JSON array; take the first for inference
    if (p.startsWith("[")) p.stripPrefix("[").stripSuffix("]")
      .split(",").head.trim.stripPrefix("\"").stripSuffix("\"")
    else p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val sheet = Option(options.get("sheet"))
    val opts = xlsxOptions(options)
    val matrices = XlsxIngest.parseMatrices(firstPath(options), opts)
    val matrix = sheet match {
      case Some(name) => matrices.find(_._1 == name).map(_._2)
        .getOrElse(throw new IllegalArgumentException(s"no sheet '$name'"))
      case None => matrices.headOption.map(_._2)
        .getOrElse(throw new IllegalArgumentException("workbook has no sheets"))
    }
    val header = matrix.headOption.getOrElse(Vector.empty)
    StructType(SheetMatrix.headerNames(header)
      .map(n => StructField(n, StringType)))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new XlsxTable(schema, properties.asScala.toMap)

  private def xlsxOptions(options: CaseInsensitiveStringMap): XlsxIngest.Options =
    XlsxIngest.Options(leapBugCompat =
      Option(options.get("leapBugCompat")).forall(_.toBoolean))
}

final class XlsxTable(schema: StructType, properties: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String =
    properties.getOrElse("path", "xlsx")
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      private val paths: Seq[String] = {
        val p = Option(options.get("paths"))
        p match {
          case Some(json) => json.stripPrefix("[").stripSuffix("]")
            .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
          case None => Seq(options.get("path"))
        }
      }
      private val sheet = Option(options.get("sheet"))
      private val leapBug =
        Option(options.get("leapBugCompat")).forall(_.toBoolean)

      override def build(): Scan = this
      override def readSchema(): StructType = schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        paths.map(p => XlsxPartition(p, sheet, leapBug): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new XlsxReaderFactory(schema)
    }
}

final case class XlsxPartition(
    path: String,
    sheet: Option[String],
    leapBugCompat: Boolean) extends InputPartition

final class XlsxReaderFactory(schema: StructType)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[XlsxPartition]
    new PartitionReader[InternalRow] {
      private val matrices = XlsxIngest.parseMatrices(
        part.path, XlsxIngest.Options(part.leapBugCompat))
      private val matrix = part.sheet match {
        case Some(name) => matrices.find(_._1 == name).map(_._2)
          .getOrElse(Vector.empty)
        case None => matrices.headOption.map(_._2).getOrElse(Vector.empty)
      }
      private val width = schema.length
      private val rows = matrix.drop(1).iterator // row 0 = header
      private var current: Vector[String] = _

      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false

      override def get(): InternalRow =
        InternalRow.fromSeq((0 until width).map { i =>
          UTF8String.fromString(if (i < current.length) current(i) else "")
        })

      override def close(): Unit = ()
    }
  }
}
