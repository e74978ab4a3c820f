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
  /** events.ts has shipped as both ns-precision parquet (read as a raw
    * long under spark.sql.legacy.parquet.nanosAsLong) and plain µs
    * timestamp[us]. Branch on the dtype the reader actually produced and
    * normalize either shape to a µs TIMESTAMP_NTZ column — the same
    * truncation DuckDB applies with `CAST(ts AS TIMESTAMP)`, so oracle
    * comparisons line up exactly. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
