package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * convergence probe. `localCheckpoint()` truncates lineage so plans
  * don't grow with iterations (the standard Spark iterative-algorithm
  * shape; GraphX/GraphFrames do the same). For adversarial graphs with
  * large diameters, switch to large-star/small-star (O(log n) rounds);
  * for dedup graphs min-propagation converges faster in practice.
  */
object ConnectedComponents {

  /** @param edgesIn undirected edges as columns (src, dst), one row per
    *                edge in either orientation
    * @param nodes   node universe as column (id); isolated nodes become
    *                singleton clusters
    * @return (id, lbl) where lbl = min node id of the component
    */
  def run(edgesIn: DataFrame, nodes: DataFrame, maxIter: Int = 30): DataFrame = {
    val edges = edgesIn.select(col("src"), col("dst"))
      .union(edgesIn.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("lbl")).localCheckpoint()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("src"), col("lbl")), Seq("src"))
        .groupBy(col("dst"))
        .agg(min(col("lbl")).as("nbr_lbl"))
        .withColumnRenamed("dst", "id")
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      // labels only ever decrease, so "any row changed?" is the fixpoint
      // probe; limit(1) keeps the action O(1) rows on the driver
      val changed = next
        .join(labels.select(col("id"), col("lbl").as("prev")), Seq("id"))
        .filter(col("lbl") < col("prev"))
        .limit(1).count()
      labels = next
      done = changed == 0L
      iter += 1
    }
    labels
  }
}
