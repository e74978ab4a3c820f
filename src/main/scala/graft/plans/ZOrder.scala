package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order (Morton) multi-dimensional clustering key — the data-layout
  * operator behind Delta/Iceberg `OPTIMIZE ZORDER BY` and the reason
  * multi-column range scans can prune files on BOTH columns at once.
  *
  * Sorting 100 TB by one column gives perfect min/max pruning on that
  * column and none on any other. Interleaving the bits of d columns
  * into one sort key bounds EVERY column's spread within a contiguous
  * key range to ~N^(1/d) of its domain, so parquet footer min/max
  * statistics prune scans on any of the participating columns.
  *
  * The z-value is plain codegen'd column arithmetic (shift/and/or — no
  * UDF, no expression walls); the layout write is
  * `repartitionByRange(zval)` + `sortWithinPartitions(zval)`, which is
  * exactly the shape a distributed OPTIMIZE job wants: one range
  * exchange, in-partition sort, no global sort barrier.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column (non-negative
    * integral values; caller buckets/clamps first). Column j's bit i
    * lands at output bit `i*n + j`, so total bits = n*bits ≤ 63. */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1 && n * bits <= 63, s"$n cols x $bits bits exceeds a long")
    val terms =
      for { (c, j) <- cols.zipWithIndex; i <- 0 until bits }
        yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster a frame by z-value for layout-aware writes: one range
    * exchange (sampled bounds, balanced output files) + in-partition
    * sort. Downstream parquet files then carry tight min/max footer
    * stats on every interleaved column. */
  def clusterBy(df: DataFrame, z: Column, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)

  /** Demo dimensions for the gate key: p_size (1..50, fits 8 bits) and
    * a 256-bucket hash of the part key — two independent columns a
    * range query might filter on. */
  val zBits = 8

  def partZValue: Column =
    zvalue(Seq(col("p_size"), pmod(col("p_partkey"), lit(256))), zBits)

  /** Gate key: the z-value each part row would be clustered by, plus
    * the constituent dimensions. Oracled — the bit-interleave is pure
    * integer arithmetic DuckDB evaluates identically. */
  def qZorderLayout(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        col("p_size"),
        pmod(col("p_partkey"), lit(256)).as("kb"),
        partZValue.as("zval"))
      .orderBy("zval", "p_partkey")

  /** DuckDB mirror of [[zvalue]] over SQL expressions, generated from
    * the same (n, bits) so the two sides cannot drift. */
  def zvalueSql(exprs: Seq[String], bits: Int): String = {
    val n = exprs.size
    val terms =
      for { (e, j) <- exprs.zipWithIndex; i <- 0 until bits }
        yield s"(((CAST($e AS BIGINT) >> $i) & 1) << ${i * n + j})"
    terms.mkString("(", " | ", ")")
  }
}
