package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.mm.PpmCodec

/** DataSource V2 batch connector for a directory of media files — the
  * custom-source path for data Spark's built-in readers can't serve
  * well. `binaryFile` reads EVERY file's full body even for
  * metadata-only queries; this connector understands the media formats,
  * so the two optimizations that matter at 100 TB of media happen
  * inside the source itself:
  *
  *  - **Filter pushdown to the LISTING** ([[MediaScanBuilder]]
  *    `pushFilters`): `kind = 'image'` prunes non-matching files before
  *    any partition is planned — pruned files are never opened, never
  *    even become tasks. (Kind is derived from the extension, so the
  *    predicate is decidable at planning time.)
  *  - **Column pruning to the BYTE level** (`pruneColumns`): when the
  *    projection doesn't include `bytes`, the reader parses only the
  *    fixed-size header for width/height/sample-rate and never
  *    materializes file bodies — a metadata profile of a petabyte of
  *    video reads kilobytes.
  *
  * Usage: `spark.read.format(classOf[MediaSourceProvider].getName)
  * .load(dir)`. Schema:
  * (path, name, kind, size, width, height, sample_rate, bytes).
  */
object MediaSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | binary
    StructField("size", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("bytes", BinaryType, nullable = true)))

  def kindOf(name: String): String = {
    val n = name.toLowerCase
    if (n.endsWith(".ppm")) "image"
    else if (n.endsWith(".wav")) "audio"
    else "binary"
  }

  /** Test hook: counts full-body file reads, so specs can PROVE that
    * metadata-only projections never touch file bodies. Driver-side
    * only (local mode runs tasks in-JVM; on a cluster use a metric). */
  val bodyReads = new java.util.concurrent.atomic.AtomicLong(0)
}

class MediaSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = MediaSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MediaTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

class MediaTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "media source requires a path: .load(dir)")
  override def name(): String = s"media($path)"
  override def schema(): StructType = MediaSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MediaScanBuilder(path)
}

class MediaScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = MediaSource.schema
  private var kindFilter: Option[String] = scala.None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept kind-equality (decidable from the file name at listing
    * time); everything else stays a residual Spark evaluates on top. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("kind", _: String) => true
      case _ => false
    }
    pushed = accepted
    kindFilter = accepted.collectFirst { case EqualTo("kind", v: String) => v }
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new MediaScan(path, required, kindFilter)
}

class MediaScan(path: String, required: StructType, kindFilter: Option[String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"MediaScan(path=$path, columns=${required.fieldNames.mkString(",")}, " +
      s"pushedKind=${kindFilter.getOrElse("-")})"

  /** One partition per file group: files are listed AND kind-pruned
    * here, at planning time — pruned files never become read tasks. */
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile).sortBy(_.getName)
      .filter(f => kindFilter.forall(_ == MediaSource.kindOf(f.getName)))
    // group small media files so tasks aren't one-file-sized; 16 files
    // per partition locally — a cluster build would pack by byte size
    files.grouped(16).map(g =>
      MediaInputPartition(g.map(_.getAbsolutePath)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MediaReaderFactory(required)
}

case class MediaInputPartition(paths: Array[String]) extends InputPartition

class MediaReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MediaPartitionReader(
      partition.asInstanceOf[MediaInputPartition].paths, required)
}

/** Reads one file per `next()`. Bodies are materialized ONLY when the
  * projection needs them: `bytes` requires the body; width/height/
  * sample_rate parse from a bounded header prefix (PPM: ASCII header;
  * WAV: 44-byte fmt header region — 256 bytes covers both). */
class MediaPartitionReader(paths: Array[String], required: StructType)
    extends PartitionReader[InternalRow] {

  private val needBytes = required.fieldNames.contains("bytes")
  private val needMeta = Seq("width", "height", "sample_rate")
    .exists(required.fieldNames.contains)
  private var i = -1
  private var row: InternalRow = _

  override def next(): Boolean = {
    i += 1
    if (i >= paths.length) return false
    val f = new java.io.File(paths(i))
    val body: Option[Array[Byte]] =
      if (needBytes) {
        MediaSource.bodyReads.incrementAndGet()
        Some(java.nio.file.Files.readAllBytes(f.toPath))
      } else scala.None
    // header-only read for metadata: bounded prefix, never the body
    val header: Option[Array[Byte]] =
      if (needMeta && body.isEmpty) {
        val in = new java.io.FileInputStream(f)
        try Some(in.readNBytes(256)) finally in.close()
      } else body
    val kind = MediaSource.kindOf(f.getName)
    var w: Integer = null; var h: Integer = null; var sr: Integer = null
    header.foreach { bs =>
      if (kind == "image") {
        // full-body decode when bytes were read anyway; header-only
        // ASCII parse otherwise (dimensions live in the PPM prefix)
        PpmCodec.decode(bs).map(img => (img.width, img.height))
          .orElse(parsePpmDims(bs))
          .foreach { case (pw, ph) => w = pw; h = ph }
      } else if (kind == "audio") parseWavRate(bs).foreach(r => sr = r)
    }
    val values: Map[String, Any] = Map(
      "path" -> UTF8String.fromString(f.getAbsolutePath),
      "name" -> UTF8String.fromString(f.getName),
      "kind" -> UTF8String.fromString(kind),
      "size" -> f.length(),
      "width" -> w, "height" -> h, "sample_rate" -> sr,
      "bytes" -> body.orNull)
    row = new GenericInternalRow(required.fieldNames.map(n => values(n): Any))
    true
  }

  /** PPM dims from the ASCII header alone (body may be truncated). */
  private def parsePpmDims(bs: Array[Byte]): Option[(Int, Int)] = {
    val s = new String(bs, "ISO-8859-1")
    if (!s.startsWith("P6")) return scala.None
    val toks = s.drop(2).split("\\s+").filter(_.nonEmpty).take(2)
    try if (toks.length == 2) Some((toks(0).toInt, toks(1).toInt)) else scala.None
    catch { case _: NumberFormatException => scala.None }
  }

  /** WAV sample rate from the 44-byte canonical header. */
  private def parseWavRate(bs: Array[Byte]): Option[Int] =
    if (bs.length >= 28 && new String(bs.take(4), "ISO-8859-1") == "RIFF")
      Some(java.nio.ByteBuffer.wrap(bs, 24, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt)
    else scala.None

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
