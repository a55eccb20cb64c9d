package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{Kernels, SparkImage}

/** DataSource V2 rebuild of the reference's SQL data source
  * (AbstractImageSource.scala:20-84 + debug DefaultSource.scala:11-20):
  * a synthetic image catalog for
  *
  * {{{
  * CREATE TEMPORARY VIEW DebugImages
  * USING imagedebug OPTIONS (path "/imgs", count "7", width "100", height "50")
  * }}}
  *
  * Schema = the reference's `FullSQLImage` row shape (images.scala:27-35):
  * path, name, parent, fullpath, width, height, slices, image.
  *
  * Unlike the reference's `TableScan` (which materializes every column
  * on every scan — SURVEY §4.2), this implements
  * [[SupportsPushDownRequiredColumns]], so `SELECT name, width FROM
  * DebugImages` never generates a pixel; at 100 TB the equivalent
  * catalog scan reads metadata only. Fill values follow
  * `createEmptyImages` (scOps.scala:63-73): fact·(i mod 5)·1000 + 1000.
  */
class ImageDebugSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "imagedebug"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ImageDebugSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ImageDebugTable(properties.asScala.toMap.map { case (k, v) => k.toLowerCase -> v })
}

object ImageDebugSource {
  val imageSchema: StructType = Encoders.product[SparkImage].schema

  val fullSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("parent", StringType, nullable = false),
    StructField("fullpath", ArrayType(StringType), nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("slices", IntegerType, nullable = false),
    StructField("image", imageSchema, nullable = false)))
}

class ImageDebugTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"imagedebug(${options.getOrElse("path", "/imgs")})"
  override def schema(): StructType = ImageDebugSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ImageDebugScanBuilder(options)
}

class ImageDebugScanBuilder(options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ImageDebugSource.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new ImageDebugScan(options, required)
}

class ImageDebugScan(options: Map[String, String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val count = options.getOrElse("count", "5").toInt
    val parts = math.max(1, math.min(options.getOrElse("partitions", "4").toInt, count))
    (0 until parts).map { p =>
      val lo = count.toLong * p / parts
      val hi = count.toLong * (p + 1) / parts
      ImageDebugPartition(lo, hi, options.getOrElse("path", "/imgs"),
        options.getOrElse("width", "100").toInt,
        options.getOrElse("height", "50").toInt,
        options.getOrElse("fact", "1.0").toDouble): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ImageDebugReaderFactory(required)
}

case class ImageDebugPartition(lo: Long, hi: Long, path: String,
                               width: Int, height: Int, fact: Double)
    extends InputPartition

class ImageDebugReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ImageDebugPartition]
    new PartitionReader[InternalRow] {
      private var i = p.lo - 1
      private val fieldNames = required.fieldNames
      private val needsImage = fieldNames.contains("image")
      private val converter =
        CatalystTypeConverters.createToCatalystConverter(required)

      override def next(): Boolean = { i += 1; i < p.hi }

      override def get(): InternalRow = {
        val path = s"${p.path}/$i"
        lazy val img: SparkImage =
          Kernels.constantImage(p.width, p.height, 1, p.fact * (i % 5) * 1000.0 + 1000.0)
        val values: Seq[Any] = fieldNames.toSeq.map {
          case "path" => path
          case "name" => i.toString
          case "parent" => p.path
          case "fullpath" => path.split("/").toSeq
          case "width" => p.width
          case "height" => p.height
          case "slices" => 1
          case "image" if needsImage => img
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }
        converter(org.apache.spark.sql.Row.fromSeq(values)).asInstanceOf[InternalRow]
      }

      override def close(): Unit = ()
    }
  }
}
