package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.Sampling

/** One synchronous round of semi-supervised label propagation (Zhu &
  * Ghahramani's LP, the degenerate single-iteration form community
  * detection and weak-labeling pipelines actually run at scale): a
  * hash-chosen seed subset keeps its true label; every unlabeled node
  * adopts the majority label among its SEED neighbors, ties broken by
  * label order. The fourth distributed-graph primitive next to the CC
  * family, PageRank, and triangle counting.
  *
  * Scale shape: label lookup is one equi-join of the bidirectional edge
  * list against the (small) seed table, majority vote is a keyed
  * aggregate + per-node row_number over vote counts — all shuffles
  * keyed on node id, no driver state, no iteration-dependent growth.
  * Further rounds would repeat the same two-exchange plan with the
  * grown label set (the PageRank composed-lazy-plan device applies);
  * the gate key pins the first round, which already exercises the full
  * join/vote/tiebreak machinery.
  *
  * Determinism: seeds via the md5-bucket device ([[Sampling.inSample]]
  * ≡ the oracle's substring(md5(...)) cut); vote ranking orders by
  * (count DESC, label ASC) — a total order, so both engines elect the
  * same winner.
  */
object LabelProp {

  /** Same bounded demo graph as [[Triangles]] (partkey % 7 sample). */
  val lpPartMod = 7L
  /** Fraction of graph nodes that keep their true label. */
  val lpSeedFraction = 0.25

  /** Per-node elected labels over an id-canonical edge set `(u, v)` and
    * a `(id, label)` truth table. Returns seed rows (origin='seed',
    * n_support=0) plus propagated rows (origin='prop', n_support =
    * winning vote count). */
  def propagateOnce(edges: DataFrame, labels: DataFrame): DataFrame = {
    val bi = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
    val nodes = bi.select(col("src").as("id")).distinct()
    val inGraph = labels.join(nodes, "id")
    val seeded = inGraph.withColumn("is_seed",
      Sampling.inSample(concat(lit("lp:"), col("id")), lpSeedFraction))
    val seeds = seeded.filter(col("is_seed"))
    val unlabeled = seeded.filter(!col("is_seed")).select(col("id"))
    val votes = bi
      .join(seeds.select(col("id").as("dst"), col("label").as("voted")), "dst")
      .join(unlabeled.select(col("id").as("src")), Seq("src"), "left_semi")
      .groupBy(col("src"), col("voted"))
      .agg(count(lit(1)).as("n_votes"))
    val elected = votes
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("n_votes").desc, col("voted"))))
      .filter(col("rn") === 1)
      .select(col("src").as("part_id"), col("voted").as("label"),
        lit("prop").as("origin"), col("n_votes").as("n_support"))
    seeds
      .select(col("id").as("part_id"), col("label"),
        lit("seed").as("origin"), lit(0L).as("n_support"))
      .unionAll(elected)
      .orderBy("part_id")
  }

  def qLabelPropagation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(pmod(col("l_partkey"), lit(lpPartMod)) === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
    val labels = Tables.part(spark, dir)
      .filter(pmod(col("p_partkey"), lit(lpPartMod)) === 0)
      .select(col("p_partkey").as("id"), col("p_brand").as("label"))
    propagateOnce(e, labels)
  }
}
