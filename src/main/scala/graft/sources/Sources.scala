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

  /** Per-JVM scratch dir for the ingest round-trip key, recursively
    * deleted on JVM exit (the BucketedTables lesson: per-JVM paths,
    * never a shared fixed tmp path two processes can race on). */
  private lazy val ingestScratch: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_jsonl_").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(d)
    }))
    d.getAbsolutePath
  }

  /** Multi-format ingest round-trip — the reference's ETL entry point
    * was CSV/JSON scans, so the engine must prove text formats survive
    * a write→read cycle losslessly: documents are written as JSONL and
    * read back with an EXPLICIT schema (schema inference is a second
    * full scan at 100 TB and can silently flip types between runs),
    * then checksum-aggregated per source. The oracle computes the SAME
    * aggregate straight from parquet — any row the round-trip dropped,
    * duplicated or mangled (ids, lengths, content bytes) breaks the
    * hash match.
    *
    * Scale shape: one write + one scan, then a source-keyed hash agg of
    * narrow derived columns; the checksum is an order-insensitive SUM
    * of per-row md5-derived 60-bit hashes mod a prime. */
  def qIngestJsonl(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val path = s"$ingestScratch/docs_jsonl"
    docs.write.mode("overwrite").json(path)
    readJsonl(spark, path, docs.schema)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        sum(pmod(graft.text.TextOps.baseHash60(col("text")), lit(1000000007L)))
          .as("content_sum"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy("source")
  }

  /** CSV twin of [[qIngestJsonl]] — same checksum contract, same
    * parquet-direct oracle, RFC-4180 quoting (escape = the quote char,
    * so embedded quotes double rather than backslash-escape — the
    * dialect every external CSV consumer expects). Explicit schema on
    * the read-back: CSV carries no types at all, so inference is both a
    * second scan AND a semantics risk (a numeric-looking text column
    * silently becomes BIGINT). */
  def qIngestCsv(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val path = s"$ingestScratch/docs_csv"
    docs.write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(path)
    spark.read.schema(docs.schema)
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(path)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        sum(pmod(graft.text.TextOps.baseHash60(col("text")), lit(1000000007L)))
          .as("content_sum"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy("source")
  }

  /** ORC twin of [[qIngestJsonl]] — the other COLUMNAR format under
    * the same checksum contract and parquet-direct oracle. Unlike the
    * text twins, ORC carries schema + types + min/max stripe stats of
    * its own, so this round-trip proves the engine's second
    * predicate-pushdown-capable storage path (a lakehouse migrating
    * ORC↔parquet needs exactly this guarantee); the explicit schema on
    * read-back is still applied for the same drift-proofing as the
    * text formats. */
  def qIngestOrc(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val path = s"$ingestScratch/docs_orc"
    writeOrc(docs, path)
    spark.read.schema(docs.schema).orc(path)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        sum(pmod(graft.text.TextOps.baseHash60(col("text")), lit(1000000007L)))
          .as("content_sum"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy("source")
  }

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
