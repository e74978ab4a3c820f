package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Small-file compaction planner — the bin-packing step behind
  * lakehouse `OPTIMIZE` (and Spark AQE's own shuffle-partition
  * coalescing): given a table's FILE MANIFEST (file id, partition,
  * size), assign each file to an output bin so every bin lands near the
  * target size, then each bin becomes one rewrite task producing one
  * right-sized file.
  *
  * The assignment is sorted cumulative packing: within a table
  * partition, files in deterministic manifest order accumulate bytes
  * and `bin = floor((cumsum - bytes) / target)` — contiguous first-fit,
  * the exact device `ShufflePartitionsUtil.coalescePartitions` uses.
  * Each bin closes in [target, target + max_file) bytes except the
  * partition's last; no bin splits a file.
  *
  * Scale shape: the planner NEVER touches data — its input is the
  * manifest (one row per file: a 100 TB table with 128 MB files is a
  * ~800 k-row frame), its cost one partition-keyed window over that
  * frame. The rewrite the plan drives is embarrassingly parallel (one
  * task per bin, each a local merge-read + single-file write). This is
  * why compaction of a 100 TB table is cheap to PLAN on the driver-side
  * metadata path while the data path stays distributed.
  */
object Compaction {

  /** Assign output bins over a manifest of (part, file_id, bytes).
    * `targetBytes` may be any positive integral column (per-row, so a
    * per-partition target joins in transparently). Emits the manifest
    * + `bin` (0-based within part). Pure integer cumsum + one IEEE
    * division of exactly-representable integers — engine-exact. */
  def plan(manifest: DataFrame, targetBytes: Column): DataFrame = {
    val w = Window.partitionBy(col("part")).orderBy(col("file_id"))
    manifest.withColumn("bin",
      floor((sum(col("bytes")).over(w) - col("bytes")).cast("double") /
        targetBytes.cast("double")).cast("long"))
  }

  /** Buckets per source simulating the small-file manifest in the gate
    * key (each md5 bucket of doc_id = one "file"). */
  val gateFilesPerPart = 8
  /** Output files per partition the gate key's per-source target aims
    * for (target = ceil(partition_bytes / this) — scale-free, so the
    * packing stays non-degenerate at every SF). */
  val gateBinsPerPart = 4

  /** Gate key: manifest derived from `documents` — one "file" per
    * (source, md5-bucket-of-doc_id % 8) with bytes = sum(n_chars) —
    * packed toward a per-source target of ceil(total/4): ~2 small
    * files merge into each output bin at every SF. Output is the plan
    * itself (one row per input file with its assigned bin) — all
    * BIGINT/VARCHAR, exact on both engines. */
  def qCompactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(graft.text.TextOps.baseHash60(
      concat(lit("cf:"), col("doc_id").cast("string"))), lit(gateFilesPerPart.toLong))
    val manifest = Tables.documents(spark, dir)
      .groupBy(col("source").as("part"), bucket.as("file_id"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("bytes"))
    val target = floor((sum(col("bytes")).over(Window.partitionBy(col("part")))
      .cast("double") + (gateBinsPerPart - 1)) / gateBinsPerPart).cast("long")
    plan(manifest.withColumn("target_bytes", target), col("target_bytes"))
      .select(col("part").as("source"), col("file_id"), col("n_rows"),
        col("bytes"), col("bin"))
      .orderBy("source", "file_id")
  }
}
