package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.B "sinks" + the reference's ETL
  * conventions: CSV/Parquet scans in `examples/mnist.py ~L40-60 [H]`).
  *
  * Explicit schemas everywhere: schema inference re-reads the data once
  * (2× scan at 100 TB) and can silently change types between runs.
  * Partitioned parquet writes are the scale-out layout — downstream
  * readers get partition pruning for free on the partition columns.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC — the other columnar format with predicate pushdown + pruning
    * (same Catalyst integration as parquet). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Line-oriented raw text (one `value` column) — the raw-corpus entry
    * point for text pipelines before any parsing. */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Hive-style partitioned parquet sink. At scale: choose partition
    * columns with bounded cardinality (date buckets, categories) —
    * high-cardinality partitioning creates a small-files storm. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Random row reshuffle — `utils.shuffle(df)` (`distkeras/utils.py
    * ~L60-75 [H]`), used by the reference before training so partitions
    * see i.i.d. data. Deterministic given the seed; implemented as a
    * repartition on a seeded random key (one shuffle, no global sort). */
  def shuffle(df: DataFrame, numPartitions: Int, seed: Long = 42L): DataFrame =
    df.repartition(numPartitions, rand(seed))

  /** Media-file ingest for the multimodal pipeline: a directory of raw
    * image/audio files as (path, modificationTime, length, content)
    * rows via Spark's binaryFile source — the standard way opaque bytes
    * enter a DataFrame at scale. Two scale facts make this the right
    * entry point: the source COLUMN-PRUNES `content` (metadata-only
    * queries never read file bodies), and `pathGlobFilter` prunes at
    * listing time. Feed the result to `mm.Multimodal.extractFeatures` /
    * `resizeImages` (batched decode over the `content` column). */
  def readMediaDir(spark: SparkSession, dir: String,
                   glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(dir)
  }
}
