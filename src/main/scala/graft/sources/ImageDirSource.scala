package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 file-directory image source — the DDL face of `loadImages`
  * (reference `loadImages`/`ijFile`, scOps.scala:75-97, 309-316):
  *
  * {{{
  * CREATE TEMPORARY VIEW MyImages
  * USING imagedir OPTIONS (path "/data/imgs", pattern ".*\\.png")
  * }}}
  *
  * Schema: path, name, size, image. Column pruning means a catalog
  * query (`SELECT path, size`) reads directory entries only — no file
  * bytes, no decode; the reference's source decoded everything always.
  * Files are split across `partitions` input partitions by stable path
  * order, so task placement is deterministic.
  */
class ImageDirSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "imagedir"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ImageDirSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ImageDirTable(properties.asScala.toMap.map { case (k, v) => k.toLowerCase -> v })
}

object ImageDirSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("image", ImageDebugSource.imageSchema, nullable = true)))

  private[sources] def listFiles(dir: String, pattern: String): Seq[String] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) return Seq.empty
    val rx = pattern.r
    val s = java.nio.file.Files.list(p)
    try s.iterator().asScala
      .filter(f => java.nio.file.Files.isRegularFile(f))
      .map(_.toString)
      .filter(f => rx.matches(f.substring(f.lastIndexOf('/') + 1)))
      .toSeq.sorted
    finally s.close()
  }
}

class ImageDirTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"imagedir(${options.getOrElse("path", ".")})"
  override def schema(): StructType = ImageDirSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ImageDirScanBuilder(options)
}

class ImageDirScanBuilder(options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = ImageDirSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new ImageDirScan(options, required)
}

class ImageDirScan(options: Map[String, String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val files = ImageDirSource.listFiles(
      options.getOrElse("path", "."),
      options.getOrElse("pattern", ".*\\.(png|gif|bmp)"))
    val parts = math.max(1, math.min(options.getOrElse("partitions", "8").toInt,
      math.max(1, files.length)))
    (0 until parts).map { p =>
      val lo = files.length * p / parts
      val hi = files.length * (p + 1) / parts
      ImageDirPartition(files.slice(lo, hi).toArray): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ImageDirReaderFactory(required)
}

case class ImageDirPartition(files: Array[String]) extends InputPartition

class ImageDirReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val files = partition.asInstanceOf[ImageDirPartition].files
    new PartitionReader[InternalRow] {
      private var i = -1
      private val fieldNames = required.fieldNames
      private val converter = CatalystTypeConverters.createToCatalystConverter(required)

      override def next(): Boolean = { i += 1; i < files.length }

      override def get(): InternalRow = {
        val path = files(i)
        val nio = java.nio.file.Paths.get(path)
        val values: Seq[Any] = fieldNames.toSeq.map {
          case "path" => path
          case "name" => nio.getFileName.toString
          case "size" => java.nio.file.Files.size(nio)
          case "image" => // only decoded when the column is required
            ImageCodecIO.decode(path, java.nio.file.Files.readAllBytes(nio))
          case other => throw new IllegalArgumentException(s"unknown column $other")
        }
        converter(org.apache.spark.sql.Row.fromSeq(values)).asInstanceOf[InternalRow]
      }

      override def close(): Unit = ()
    }
  }
}
