package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Degree-ordered triangle counting (Suri & Vassilvitskii, "Counting
  * Triangles and the Curse of the Last Reducer", WWW'11) — the third
  * distributed-graph primitive next to the CC family and PageRank, and
  * the classic demonstration of WHY orientation matters at scale: a
  * naive wedge enumeration fans out quadratically on hub nodes (the
  * "last reducer" holds the celebrity's neighbor list); orienting every
  * edge from its (degree, id)-smaller endpoint caps every node's
  * out-degree at O(√E), so wedge generation — the expensive middle —
  * is balanced regardless of skew.
  *
  * Pipeline (all equi-joins, no nested loop anywhere):
  *   1. co-order graph: parts appearing in the same order, id-canonical
  *      distinct edges (u < v);
  *   2. orientation by (degree, id) — a join against the degree table;
  *   3. wedges: self-join of oriented edges on the source;
  *   4. closure: LEFT SEMI join of wedges against the id-canonical edge
  *      set on BOTH endpoints — an OR-condition join against the
  *      oriented set would degrade to a nested loop, so the closure
  *      probes the canonical form instead (wedge targets are already
  *      id-ordered by construction);
  *   5. per-node counts: each triangle credits all three corners.
  *
  * The gate key samples parts deterministically (partkey % 7) to keep
  * the demo graph bounded (~25 k edges at sf0.1); the recipe itself is
  * sample-free.
  */
object Triangles {

  /** Deterministic part sample for the gate key. */
  val triPartMod = 7L
  /** Result size (top triangle-dense parts). */
  val triTopK = 20

  /** Per-node triangle counts over an id-canonical edge set (u < v,
    * distinct). Each triangle credits all three corners. */
  def countPerNode(e: DataFrame): DataFrame = {
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
    val uFirst = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("s"),
      when(uFirst, col("v")).otherwise(col("u")).as("t"))
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.s") === col("y.s") && col("x.t") < col("y.t"))
      .select(col("x.s").as("tu"), col("x.t").as("tv"), col("y.t").as("tw"))
    val triangles = wedges.join(e,
        wedges("tv") === e("u") && wedges("tw") === e("v"), "left_semi")
    triangles
      .select(explode(array(col("tu"), col("tv"), col("tw"))).as("part_id"))
      .groupBy(col("part_id")).agg(count(lit(1)).as("n_triangles"))
  }

  def qTriangleCount(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(pmod(col("l_partkey"), lit(triPartMod)) === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
    countPerNode(e)
      .orderBy(col("n_triangles").desc, col("part_id"))
      .limit(triTopK)
  }
}
