package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Min/max file-skipping audit — the scan-planning primitive behind
  * parquet footer stats, ORC stripe stats, and Iceberg/Delta manifest
  * pruning: a predicate consults each file's (min, max) and classifies
  * it SKIPPED (no overlap — never opened), FULL (file range inside the
  * predicate — metadata-only count, no row filtering) or PARTIAL
  * (opened and row-filtered).
  *
  * The operator makes the LAYOUT argument measurable: the same rows are
  * laid out twice — `arrival` (insertion order, values scattered, every
  * file overlaps the predicate) vs `clustered` (value order, the
  * repartitionByRange layout [[ZOrder.clusterBy]] writes) — and the
  * classification shows clustered scans skipping almost every file
  * while arrival scans open all of them. This delta IS the ROI
  * calculation a 100 TB table's OPTIMIZE/CLUSTER BY decision rests on,
  * computed from manifest-sized metadata, never the data.
  *
  * Scale shape: two balanced-ntile passes simulate the layouts via the
  * range-bucketed [[graft.rel.ScalableRank.rangeNtile]] device (r14 —
  * bit-identical to a naive global ntile but never a single-reducer
  * sort over ALL orders; a real table reads (file, min, max, rows)
  * straight from its manifest — row-count-free), then one
  * (layout, file) agg and a per-row CASE. Money min/max are exact
  * 2-dp doubles, so both engines classify identically.
  */
object Pruning {

  /** Files per simulated layout (balanced via ntile — no one-row count
    * broadcast needed). */
  val pruneFiles = 16
  /** Predicate band [lo, hi] on o_totalprice for the gate key — chosen
    * to cover a narrow value slice so clustering has something to
    * prove. */
  val pruneLo = 100000.0
  val pruneHi = 150000.0

  /** Classify each simulated file of both layouts against the
    * predicate band. Output: (layout, file_id, n_rows, mn, mx, status),
    * 2·[[pruneFiles]] rows. */
  def qManifestPrune(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
    val arrival = graft.rel.ScalableRank.rangeNtile(o, col("o_orderkey"),
        Seq(col("o_orderkey")), pruneFiles, "file_id")
      .withColumn("layout", lit("arrival"))
    val clustered = graft.rel.ScalableRank.rangeNtile(o, col("o_totalprice"),
        Seq(col("o_totalprice"), col("o_orderkey")), pruneFiles, "file_id")
      .withColumn("layout", lit("clustered"))
    val manifest = arrival.unionByName(clustered)
      .groupBy(col("layout"), col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"))
    manifest
      .withColumn("status",
        when(col("mx") < pruneLo || col("mn") > pruneHi, "skipped")
          .when(col("mn") >= pruneLo && col("mx") <= pruneHi, "full")
          .otherwise("partial"))
      .select(col("layout"), col("file_id"), col("n_rows"),
        col("mn"), col("mx"), col("status"))
      .orderBy("layout", "file_id")
  }

  /** q_partition_audit — partition-key candidate screening: for each
    * candidate partitioning column, the numbers that decide whether
    * `PARTITIONED BY (candidate)` survives at 100 TB — distinct
    * partition count (too low → partitions bigger than an executor;
    * too high → the small-file problem and a metastore-sized listing),
    * rows in the largest partition, and the max/avg skew ratio (a hot
    * partition serializes every downstream scan and straggles every
    * shuffle that aligns with the key). The measurement behind the
    * layout choices the rest of this repo ASSERTS (q_join_bucketed's
    * bucket count, q_zorder_layout's cluster key, q_manifest_prune's
    * ROI): partitioning decisions should be read off a profile, not
    * guessed.
    *
    * Scale shape: one map-side-combined (candidate-key) count per
    * candidate — the shuffle carries one narrow row per distinct key —
    * then a one-row summary agg per candidate; the union is
    * |candidates| rows. Nothing touches payloads. */
  def qPartitionAudit(spark: SparkSession, dir: String): DataFrame = {
    def audit(table: String, candidate: String, keyed: DataFrame): DataFrame =
      keyed.groupBy(col("k")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_partitions"), sum(col("c")).as("n_rows"),
          max(col("c")).as("max_rows"))
        .select(lit(table).as("table_name"), lit(candidate).as("candidate"),
          col("n_partitions"), col("n_rows"), col("max_rows"),
          round(col("max_rows").cast("double") /
            (col("n_rows").cast("double") / col("n_partitions").cast("double")), 6)
            .as("skew"))
    audit("orders", "o_orderdate_day",
        Tables.orders(spark, dir).select(col("o_orderdate").cast("date").as("k")))
      .unionAll(audit("events", "event_day",
        Tables.events(spark, dir).select(col("ts").cast("date").as("k"))))
      .unionAll(audit("events", "event_type",
        Tables.events(spark, dir).select(col("event_type").as("k"))))
      .unionAll(audit("lineitem", "l_shipdate_day",
        Tables.lineitem(spark, dir).select(col("l_shipdate").cast("date").as("k"))))
      .orderBy("table_name", "candidate")
  }
}
