package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch connector for a directory of media files — the
  * custom-source path for data Spark's built-in readers can't serve
  * well. `binaryFile` reads EVERY file's full body even for
  * metadata-only queries; this connector understands the media formats,
  * so the two optimizations that matter at 100 TB of media happen
  * inside the source itself:
  *
  *  - **Filter pushdown to the LISTING** ([[MediaScanBuilder]]
  *    `pushFilters`): `kind = 'image'`, `kind IN (...)` and any
  *    size comparison prune non-matching files before any partition is
  *    planned — pruned files are never opened, never even become tasks
  *    (kind derives from the extension, size from directory metadata,
  *    so both are decidable at planning time). width / height /
  *    sample_rate predicates push to the READER: they're decided from
  *    the 256-byte header BEFORE any body read, so a `width > k AND
  *    bytes`-projecting query materializes only matching bodies.
  *    Every accepted filter is ENFORCED (conjunction of all of them,
  *    SQL null semantics: a null attribute fails any comparison), so
  *    contradictory pushed predicates — e.g. `kind = 'image' AND kind
  *    = 'audio'`, which Catalyst does not fold — correctly yield zero
  *    rows.
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
    if (n.endsWith(".ppm") || n.endsWith(".png") || n.endsWith(".gif") ||
      n.endsWith(".jpg") || n.endsWith(".jpeg")) "image"
    else if (n.endsWith(".wav")) "audio"
    else "binary"
  }

  /** Test hook: counts full-body file reads, so specs can PROVE that
    * metadata-only projections never touch file bodies. Driver-side
    * only (local mode runs tasks in-JVM; on a cluster use a metric). */
  val bodyReads = new java.util.concurrent.atomic.AtomicLong(0)

  /** Test hook: counts header (256-byte prefix) file opens, so specs
    * can PROVE listing-time pruning never opened a pruned file at all. */
  val headerReads = new java.util.concurrent.atomic.AtomicLong(0)
}

/** Pushable-predicate vocabulary shared by the scan builder (accept),
  * the listing (kind/size enforcement) and the reader (width/height/
  * sample_rate enforcement). */
object MediaFilters {
  /** Columns decidable at LISTING time (file name + dir metadata). */
  val listingCols: Set[String] = Set("kind", "size")
  /** Columns decidable from the bounded header prefix. */
  val headerCols: Set[String] = Set("width", "height", "sample_rate")

  private def attrOf(f: Filter): Option[String] = f match {
    case EqualTo(a, _) => Some(a)
    case GreaterThan(a, _) => Some(a)
    case GreaterThanOrEqual(a, _) => Some(a)
    case LessThan(a, _) => Some(a)
    case LessThanOrEqual(a, _) => Some(a)
    case In(a, _) => Some(a)
    case _ => scala.None
  }

  /** Columns whose values are integral — the only ones [[eval]]'s
    * comparison branch can decide. */
  private val numericCols: Set[String] = Set("size") ++ headerCols

  /** Accept equality / IN over any decidable column, but ORDER
    * comparisons only over the numeric ones: a pushed filter is removed
    * from Spark's residual, so accepting e.g. kind >= 'audio' (which
    * eval's integral cmp cannot decide — it would reject every file)
    * silently returns 0 rows instead of leaving the predicate to
    * Spark. */
  def pushable(f: Filter): Boolean = f match {
    case EqualTo(a, _) => listingCols.contains(a) || headerCols.contains(a)
    case In(a, _) => listingCols.contains(a) || headerCols.contains(a)
    case GreaterThan(a, _) => numericCols.contains(a)
    case GreaterThanOrEqual(a, _) => numericCols.contains(a)
    case LessThan(a, _) => numericCols.contains(a)
    case LessThanOrEqual(a, _) => numericCols.contains(a)
    case _ => false
  }

  def isListing(f: Filter): Boolean = attrOf(f).exists(listingCols.contains)

  /** The single attribute a pushable filter references. */
  def attr(f: Filter): String = attrOf(f).get

  private def toL(x: Any): Option[Long] = x match {
    case i: java.lang.Integer => Some(i.longValue)
    case l: java.lang.Long => Some(l.longValue)
    case s: java.lang.Short => Some(s.longValue)
    case b: java.lang.Byte => Some(b.longValue)
    case _ => scala.None
  }

  private def eq(value: Any, v: Any): Boolean =
    value == v || (for { a <- toL(value); b <- toL(v) } yield a == b).getOrElse(false)

  private def cmp(value: Any, v: Any): Option[Long] =
    for { a <- toL(value); b <- toL(v) } yield java.lang.Long.compare(a, b)

  /** SQL semantics for one accepted filter against an attribute value;
    * null never matches (three-valued logic reduced to keep/drop). */
  def eval(f: Filter, value: Any): Boolean =
    if (value == null) false
    else f match {
      case EqualTo(_, v) => eq(value, v)
      case In(_, vs) => vs.exists(v => eq(value, v))
      case GreaterThan(_, v) => cmp(value, v).exists(_ > 0)
      case GreaterThanOrEqual(_, v) => cmp(value, v).exists(_ >= 0)
      case LessThan(_, v) => cmp(value, v).exists(_ < 0)
      case LessThanOrEqual(_, v) => cmp(value, v).exists(_ <= 0)
      case _ => false
    }
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
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept equality / range / IN over the listing-decidable (kind,
    * size) and header-decidable (width, height, sample_rate) columns;
    * everything else stays a residual Spark evaluates on top. ALL
    * accepted filters are enforced (see [[MediaFilters.eval]]). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition(MediaFilters.pushable)
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new MediaScan(path, required, pushed)
}

class MediaScan(path: String, required: StructType, filters: Array[Filter])
    extends Scan with Batch {
  private val (listingFilters, headerFilters) =
    filters.partition(MediaFilters.isListing)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"MediaScan(path=$path, columns=${required.fieldNames.mkString(",")}, " +
      s"listingFilters=[${listingFilters.mkString(";")}], " +
      s"headerFilters=[${headerFilters.mkString(";")}])"

  /** One partition per file group: files are listed AND kind/size-
    * pruned here, at planning time — pruned files never become read
    * tasks (never even a header open, asserted in MediaSourceSpec). */
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile).sortBy(_.getName)
      .filter { f =>
        listingFilters.forall { fl =>
          val v: Any = MediaFilters.attr(fl) match {
            case "kind" => MediaSource.kindOf(f.getName)
            case "size" => f.length()
          }
          MediaFilters.eval(fl, v)
        }
      }
    // group small media files so tasks aren't one-file-sized; 16 files
    // per partition locally — a cluster build would pack by byte size
    files.grouped(16).map(g =>
      MediaInputPartition(g.map(_.getAbsolutePath)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MediaReaderFactory(required, headerFilters)
}

case class MediaInputPartition(paths: Array[String]) extends InputPartition

class MediaReaderFactory(required: StructType, headerFilters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MediaPartitionReader(
      partition.asInstanceOf[MediaInputPartition].paths, required, headerFilters)
}

/** Reads one file per `next()`. Bodies are materialized ONLY when the
  * projection needs them AND the file passed every header filter:
  * `bytes` requires the body; width/height/sample_rate parse from a
  * bounded header prefix (PPM: ASCII header; WAV: 44-byte fmt header
  * region — 256 bytes covers both), and header-pushed predicates are
  * decided on that prefix BEFORE the body is opened. */
class MediaPartitionReader(paths: Array[String], required: StructType,
                           headerFilters: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val needBytes = required.fieldNames.contains("bytes")
  private val needMeta = Seq("width", "height", "sample_rate")
    .exists(required.fieldNames.contains) || headerFilters.nonEmpty
  private var i = -1
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (true) {
      i += 1
      if (i >= paths.length) return false
      val f = new java.io.File(paths(i))
      val kind = MediaSource.kindOf(f.getName)
      // no header predicates + body needed anyway → ONE open: read the
      // body and serve the metadata parse from its prefix (the separate
      // header open would double every file's syscalls)
      var body: Option[Array[Byte]] =
        if (needBytes && headerFilters.isEmpty) {
          MediaSource.bodyReads.incrementAndGet()
          Some(java.nio.file.Files.readAllBytes(f.toPath))
        } else scala.None
      // header-only read for metadata + pushed predicates: bounded
      // 256-byte prefix, never the body
      val header: Option[Array[Byte]] =
        if (body.isDefined) { if (needMeta) body.map(_.take(256)) else scala.None }
        else if (needMeta) {
          MediaSource.headerReads.incrementAndGet()
          val in = new java.io.FileInputStream(f)
          try Some(in.readNBytes(256)) finally in.close()
        } else scala.None
      var w: Integer = null; var h: Integer = null; var sr: Integer = null
      header.foreach { bs =>
        if (kind == "image")
          parsePpmDims(bs).orElse(parsePngDims(bs)).orElse(parseGifDims(bs))
            .orElse(parseJpegDims(bs))
            .foreach { case (pw, ph) => w = pw; h = ph }
        else if (kind == "audio") parseWavRate(bs).foreach(r => sr = r)
      }
      val metaVals = Map[String, Any]("width" -> w, "height" -> h, "sample_rate" -> sr)
      if (headerFilters.forall(fl =>
          MediaFilters.eval(fl, metaVals(MediaFilters.attr(fl))))) {
        // header filters passed (or none): body is worth materializing
        if (needBytes && body.isEmpty) {
          MediaSource.bodyReads.incrementAndGet()
          body = Some(java.nio.file.Files.readAllBytes(f.toPath))
        }
        val values: Map[String, Any] = Map(
          "path" -> UTF8String.fromString(f.getAbsolutePath),
          "name" -> UTF8String.fromString(f.getName),
          "kind" -> UTF8String.fromString(kind),
          "size" -> f.length(),
          "width" -> w, "height" -> h, "sample_rate" -> sr,
          "bytes" -> body.orNull)
        row = new GenericInternalRow(required.fieldNames.map(n => values(n): Any))
        return true
      }
      // header filter rejected the file: skip without opening the body
    }
    false
  }

  /** PPM dims from the ASCII header alone (body may be truncated). */
  private def parsePpmDims(bs: Array[Byte]): Option[(Int, Int)] = {
    val s = new String(bs, "ISO-8859-1")
    if (!s.startsWith("P6")) return scala.None
    val toks = s.drop(2).split("\\s+").filter(_.nonEmpty).take(2)
    try if (toks.length == 2) Some((toks(0).toInt, toks(1).toInt)) else scala.None
    catch { case _: NumberFormatException => scala.None }
  }

  /** PNG dims from the signature + IHDR (always the first chunk per
    * spec): width/height are the two big-endian ints at offsets 16/20 —
    * well inside the 256-byte prefix, so PNG metadata never opens a
    * body either. */
  private def parsePngDims(bs: Array[Byte]): Option[(Int, Int)] =
    if (bs.length >= 24 &&
        (bs(0) & 0xff) == 0x89 && bs(1) == 'P' && bs(2) == 'N' && bs(3) == 'G' &&
        new String(bs.slice(12, 16), "US-ASCII") == "IHDR") {
      val w = java.nio.ByteBuffer.wrap(bs, 16, 4).getInt
      val h = java.nio.ByteBuffer.wrap(bs, 20, 4).getInt
      if (w > 0 && h > 0) Some((w, h)) else scala.None
    } else scala.None

  /** GIF dims from the logical screen descriptor: two little-endian
    * u16s right after the 6-byte GIF87a/GIF89a signature — well inside
    * the 256-byte prefix, so GIF metadata never opens a body either. */
  private def parseGifDims(bs: Array[Byte]): Option[(Int, Int)] =
    if (bs.length >= 10 && {
        val s = new String(bs, 0, 6, "ISO-8859-1")
        s == "GIF87a" || s == "GIF89a"
      }) {
      val w = (bs(6) & 0xff) | ((bs(7) & 0xff) << 8)
      val h = (bs(8) & 0xff) | ((bs(9) & 0xff) << 8)
      if (w > 0 && h > 0) Some((w, h)) else scala.None
    } else scala.None

  /** JPEG dims from the SOF0/SOF1 frame header: walk markers inside the
    * prefix (our encoder emits SOF0 before DHT precisely so dims land
    * within 256 bytes; real-world JPEGs with big APPn/EXIF segments may
    * push SOF0 past the prefix — those report null dims rather than a
    * body read, the same degradation every parser here uses). */
  private def parseJpegDims(bs: Array[Byte]): Option[(Int, Int)] = {
    if (bs.length < 4 || (bs(0) & 0xff) != 0xff || (bs(1) & 0xff) != 0xd8)
      return scala.None
    var i = 2
    while (i + 9 <= bs.length) {
      if ((bs(i) & 0xff) != 0xff) return scala.None
      val m = bs(i + 1) & 0xff
      if (m == 0xff) i += 1
      else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2
      else if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
        val h = ((bs(i + 5) & 0xff) << 8) | (bs(i + 6) & 0xff)
        val w = ((bs(i + 7) & 0xff) << 8) | (bs(i + 8) & 0xff)
        return if (w > 0 && h > 0) Some((w, h)) else scala.None
      } else {
        val len = ((bs(i + 2) & 0xff) << 8) | (bs(i + 3) & 0xff)
        if (len < 2) return scala.None
        i += 2 + len
      }
    }
    scala.None
  }

  /** WAV sample rate from the 44-byte canonical header. Requires the
    * full RIFF/WAVE/fmt magic chain — a non-WAV RIFF container (AVI,
    * WebP) must NOT report a garbage rate read from offset 24. */
  private def parseWavRate(bs: Array[Byte]): Option[Int] =
    if (bs.length >= 28 &&
        new String(bs.take(4), "ISO-8859-1") == "RIFF" &&
        new String(bs.slice(8, 16), "ISO-8859-1") == "WAVEfmt ")
      Some(java.nio.ByteBuffer.wrap(bs, 24, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt)
    else scala.None

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
