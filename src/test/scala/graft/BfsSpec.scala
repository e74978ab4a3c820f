package graft

import org.apache.spark.sql.functions._

import graft.graph.Bfs

class BfsSpec extends SparkSpec {
  import spark.implicits._

  test("bfs: hand-computed layers on a path-with-branch graph") {
    // 1→2→3→4→5 plus 2→6; undirected via both orientations.
    // From source 1: depth(1)=0, 2=1, {3,6}=2, 4=3, 5=4
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L))
      .toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val out = Bfs.run(edges).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 6L -> 2, 4L -> 3, 5L -> 4), s"$out")
  }

  test("bfs: depth cap truncates the frontier, never mislabels it") {
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val out = Bfs.run(edges, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // only nodes within 2 hops appear; none beyond
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2), s"$out")
  }

  test("bfs gate key: source at depth 0, layers contiguous, bipartite parity") {
    val out = Bfs.qBfsLayers(spark, sfDir).collect()
    val byDepth = out.groupBy(_.getAs[Int]("depth")).view.mapValues(_.length).toMap
    assert(byDepth(0) == 1, "exactly one source")
    // no empty intermediate layer (the graph is connected enough)
    (0 to byDepth.keys.max).foreach(d =>
      assert(byDepth.contains(d), s"empty layer $d"))
    // bipartite incidence: even depths are orders, odd are parts
    out.foreach { r =>
      val expected = if (r.getAs[Int]("depth") % 2 == 0) "order" else "part"
      assert(r.getAs[String]("kind") == expected,
        s"node ${r.getAs[Long]("node_id")} depth/kind parity broken")
    }
  }
}
