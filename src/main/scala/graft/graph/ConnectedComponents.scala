package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.Checkpointer

/** Connected components over an undirected edge list by iterative
  * min-label propagation — the cluster-assignment step every near-dup
  * pipeline needs: candidate *pairs* (MinHash/SimHash/ngram output) →
  * one `cluster_id` per document, so a training run can keep exactly one
  * survivor per duplicate cluster.
  *
  * Algorithm: every node starts labeled with its own id; each round a
  * node takes the min of its label and its neighbors' labels; fixpoint
  * after `diameter` rounds. Near-dup clusters are tiny (pairs/triangles,
  * diameter ≤ a few), so rounds stay in single digits.
  *
  * Scale: each round is one hash-shuffle join (edges ⋈ labels on src) +
  * one aggregate + one left join — all keyed on node ids, no broadcast
  * of anything unbounded, no driver-side data beyond the one-row
  * convergence probe. Per-round state is lineage-truncated through a
  * [[Checkpointer]] so plans don't grow with iterations (the standard
  * Spark iterative-algorithm shape; GraphX/GraphFrames do the same) —
  * pass [[Checkpointer.Reliable]] on clusters where executor loss is
  * routine. For adversarial graphs with large diameters, switch to
  * large-star/small-star (O(log n) rounds); for dedup graphs
  * min-propagation converges faster in practice.
  */
object ConnectedComponents {

  /** @param edgesIn undirected edges as columns (src, dst), one row per
    *                edge in either orientation
    * @param nodes   node universe as column (id); isolated nodes become
    *                singleton clusters
    * @return (id, lbl) where lbl = min node id of the component
    */
  def run(edgesIn: DataFrame, nodes: DataFrame, maxIter: Int = 30,
          cp: Checkpointer = Checkpointer.Local): DataFrame = {
    val edges = cp(edgesIn.select(col("src"), col("dst"))
      .union(edgesIn.select(col("dst").as("src"), col("src").as("dst"))))
    // Only nodes that touch an edge need propagation; everything else is
    // a singleton cluster and bypasses the loop entirely. In a dedup
    // graph duplicates are a small fraction of the corpus, so the
    // iterated set is orders of magnitude smaller than `nodes`.
    val active = cp(edges.select(col("src").as("id")).distinct())
    var labels = cp(active.select(col("id"), col("id").as("lbl")))

    // Labels only ever decrease, so Σlbl strictly decreases until the
    // fixpoint: a one-row aggregate probe per round (decimal — an id sum
    // over billions of 64-bit ids overflows a long), no diff join.
    def lblSum(df: DataFrame): java.math.BigDecimal = df
      .agg(coalesce(sum(col("lbl").cast("decimal(38,0)")), lit(java.math.BigDecimal.ZERO)))
      .head().getDecimal(0)

    var prevSum = lblSum(labels)
    var iter = 0
    // Skip the loop only for an edgeless graph (empty active set). A Σ=0
    // test would be wrong for signed ids: labels like {-5, 5} also sum to
    // zero before any propagation. Inside the loop Σ stays a valid probe
    // with negative ids — labels only ever decrease, so Σ strictly
    // decreases until the fixpoint regardless of sign.
    var done = active.isEmpty
    while (!done && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("src"), col("lbl")), Seq("src"))
        .groupBy(col("dst"))
        .agg(min(col("lbl")).as("nbr_lbl"))
        .withColumnRenamed("dst", "id")
      val next = cp(labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl")))
      val newSum = lblSum(next)
      labels = next
      done = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    val singletons = nodes
      .join(active, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("lbl"))
    labels.union(singletons)
  }
}
