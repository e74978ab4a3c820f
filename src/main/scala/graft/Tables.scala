package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet loaders for the star schema described in TESTDATA.md /
  * FIXTURES.md §A (region, nation, customer, supplier, part, orders,
  * lineitem, events, documents, embeddings).
  *
  * Scale note: at test scale each table is one parquet file; at 100 TB
  * each would be a partitioned directory (orders/lineitem partitioned by
  * date, events by day). `spark.read.parquet` handles both layouts, and
  * every query in this library relies on Catalyst pushdown/pruning so the
  * same code partition-prunes when the layout is partitioned.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** events.ts is nanosecond-precision parquet (FIXTURES.md hazard 1),
    * which Spark's reader only accepts as a raw long
    * (spark.sql.legacy.parquet.nanosAsLong). Normalize to a µs
    * TIMESTAMP_NTZ column — the same truncation DuckDB applies with
    * `CAST(ts AS TIMESTAMP)`, so oracle comparisons line up exactly. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Require the config at session-build time (GraftSession/Verify/Bench
    // set it) instead of mutating the live session here: a conf.set inside
    // a loader is a hidden global side effect, races with concurrent
    // queries, and lands too late for already-resolved readers.
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet stores ns-precision timestamps: build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (graft.GraftSession does)")
    apply(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
