package graft

import graft.graph.PageRank

/** PageRank invariants on synthetic graphs plus a driver-side power
  * method oracle — the same checks a GraphX/GraphFrames user would pin
  * before trusting scores as a quality prior. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: identical fixed-iteration power method over
    * an adjacency map (exact doubles — no rounding device needed at
    * this scale, the distributed side's DECIMAL shares agree to well
    * within the comparison tolerance). */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = out.keySet
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (s, _) => r(s) / out(s) }.sum
      }.toMap
      r = nodes.map(v => v -> (PageRank.teleport / n +
        PageRank.damping * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("matches the driver-side power method on a seeded random digraph") {
    val rnd = new scala.util.Random(7)
    val n = 40
    // both orientations of each sampled pair, so every node that appears
    // has out-edges (the engine ranks source nodes; same contract as the
    // driver key's doubled bipartite incidence)
    val base = (1 to 120).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2).distinct
    val edges = base ++ base.map(_.swap)
    val expected = reference(edges, PageRank.iterations)
    val got = PageRank.run(edges.toDF("src", "dst"))
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, r) =>
      assert(math.abs(r - expected(id)) < 1e-9, s"node $id: $r vs ${expected(id)}")
    }
  }

  test("hub of an undirected star outranks every spoke; spokes tie") {
    val spokes = (1L to 8L)
    val edges = spokes.map(s => (0L, s)) ++ spokes.map(s => (s, 0L))
    val got = PageRank.run(edges.toDF("src", "dst"))
      .as[(Long, Double)].collect().toMap
    val hub = got(0L)
    val spokeRanks = spokes.map(got)
    assert(spokeRanks.toSet.size == 1, "symmetric spokes must tie exactly")
    assert(hub > spokeRanks.head * 2, s"hub $hub vs spoke ${spokeRanks.head}")
    assert(math.abs(got.values.sum - 1.0) < 1e-6, "rank mass conserved")
  }

  test("driver key: mass conserved, parts outrank orders, deterministic") {
    val a = PageRank.qPageRank(spark, sfDir).collect()
    val b = PageRank.qPageRank(spark, sfDir).collect()
    assert(a.sameElements(b), "identical inputs must produce identical ranks")
    val mass = a.map(_.getDouble(2)).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"rank mass $mass")
    // parts are the high-degree side of the bipartite incidence (many
    // line items per part, few per order) so their mean rank dominates
    val byKind = a.groupBy(_.getString(1)).view.mapValues(rs =>
      rs.map(_.getDouble(2)).sum / rs.length).toMap
    assert(byKind("part") > byKind("order") * 4,
      s"part mean ${byKind("part")} vs order mean ${byKind("order")}")
  }
}
