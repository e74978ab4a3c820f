package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Degree-distribution health readout for the co-order graph: the
  * degree histogram plus the Clauset-Shalizi-Newman continuous-MLE
  * power-law exponent α̂ = 1 + n·(Σᵢ ln(dᵢ/(d_min − ½)))⁻¹ — the graph
  * sibling of [[graft.text.TextOps]]' Zipf fit (both ask "is this the
  * heavy-tailed shape the sampling/partitioning strategy assumes?").
  * A hub-heavy α < 2 warns that degree-keyed joins need the skew
  * treatment; α > 3 says hubs are mild and plain hash partitioning
  * holds.
  *
  * Scale shape: one degree aggregate (keyed on node id), then
  * everything runs on the ≤|distinct degrees| histogram and the
  * per-node ln terms (ROUND(,9)→DECIMAL, the order-proof device)
  * collapsed in the same pass; d_min and the term sum are 1-row
  * broadcasts crossed into the tiny histogram frame.
  */
object GraphStats {

  def qDegreePowerlaw(spark: SparkSession, dir: String): DataFrame = {
    val e = KCore.coOrderEdges(spark, dir)
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val dmin = deg.agg(min(col("d")).as("d_min"))
    val terms = deg.crossJoin(broadcast(dmin))
      .select(col("d_min"),
        round(log(col("d").cast("double") /
          (col("d_min").cast("double") - lit(0.5))), 9)
          .cast(DecimalType(18, 9)).as("term"))
      .groupBy(col("d_min"))
      .agg(count(lit(1)).as("n_nodes_total"), sum(col("term")).as("t_sum"))
    val alpha = terms.select(col("d_min"), col("n_nodes_total"),
      round(lit(1.0) + col("n_nodes_total").cast("double") /
        col("t_sum").cast("double"), 6).as("alpha"))
    deg.groupBy(col("d")).agg(count(lit(1)).as("n_nodes"))
      .crossJoin(broadcast(alpha))
      .select(col("d").as("degree"), col("n_nodes"),
        col("n_nodes_total"), col("d_min"), col("alpha"))
      .orderBy("degree")
  }
}
