package graft

import graft.graph.Triangles

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.countPerNode(edges.toDF("u", "v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: every node sits in 3 triangles; minus one edge: 2/2/1/1") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(counts(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(counts(k4.filterNot(_ == (3L, 4L))) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("a star has no triangles (hub orientation must not fabricate closures)") {
    assert(counts(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))).isEmpty)
  }

  test("pseudo-random graph matches a brute-force count") {
    val n = 14
    val edges = for {
      u <- 1L until n; v <- (u + 1) to n.toLong
      if (u * 31 + v * 17) % 3 == 0
    } yield (u, v)
    val es = edges.toSet
    val brute = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      (u, v) <- edges; w <- (v + 1) to n.toLong
      if es.contains((u, w)) && es.contains((v, w))
    } { brute(u) += 1; brute(v) += 1; brute(w) += 1 }
    assert(counts(edges) == brute.toMap, s"expected ${brute.toMap}")
  }

  test("q_triangle_count gate key: bounded, ordered, sample respected") {
    val out = Triangles.qTriangleCount(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty && out.length <= Triangles.triTopK)
    assert(out.forall(_._1 % Triangles.triPartMod == 0))
    assert(out.map(_._2).sameElements(out.map(_._2).sortBy(-_: Long)))
  }

  test("k-core peel: survivor counts shrink monotonically and match a driver-side peel") {
    import graft.graph.KCore
    val rows = KCore.qKCore(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1 to KCore.kcRounds))
    val nodes = rows.map(_._2); val edgesN = rows.map(_._3)
    assert(nodes.zip(nodes.tail).forall { case (a, b) => b <= a })
    assert(edgesN.zip(edgesN.tail).forall { case (a, b) => b <= a })
    // brute-force the same peel on the collected edge set
    var es = KCore.coOrderEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (r <- 1 to KCore.kcRounds) {
      val deg = (es.map(_._1) ++ es.map(_._2)).groupBy(identity).map { case (n, x) => n -> x.size }
      val keep = deg.filter(_._2 >= KCore.kcK).keySet
      es = es.filter(e => keep(e._1) && keep(e._2))
      assert(rows(r - 1)._2 == keep.size.toLong, s"round $r nodes")
      assert(rows(r - 1)._3 == es.size.toLong, s"round $r edges")
    }
    // the peel genuinely cascades on this graph (not a one-shot filter)
    assert(nodes.head > nodes.last, "later rounds must remove more nodes")
  }

  test("2-hop recs: never adjacent, common counts match brute force, k-capped") {
    import graft.graph.{KCore, LinkPred}
    val edges = KCore.coOrderEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = LinkPred.qTwoHopRecs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("part_id"), r.getAs[Long]("rec"),
        r.getAs[Long]("common"), r.getAs[Int]("rn")))
    assert(out.nonEmpty)
    // no recommended pair is an existing edge (either canonical direction)
    assert(out.forall { case (a, b, _, _) =>
      !edges((math.min(a, b), math.max(a, b))) })
    // per-node cap + rank ordering
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= LinkPred.lpTopK)
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rs.length))
      assert(sorted.zip(sorted.tail).forall { case (x, y) =>
        x._3 > y._3 || (x._3 == y._3 && x._2 < y._2) })
    }
    // brute-force common-neighbor counts on the collected graph; the
    // stop-hub cap must NOT bite at fixture scale, so plain
    // intersection is the exact expectation
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    edges.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    assert(adj.values.map(_.size).max < LinkPred.lpHubCap,
      "fixture degrees must stay below the stop-hub cap")
    out.foreach { case (a, b, c, _) =>
      assert((adj(a) & adj(b)).size.toLong == c, s"pair ($a,$b)") }
  }

  test("degree power law: histogram covers every node, alpha recomputes") {
    import graft.graph.GraphStats
    val rows = GraphStats.qDegreePowerlaw(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.head.getAs[Long]("n_nodes_total")
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == total)
    val dmin = rows.head.getAs[Long]("d_min")
    assert(rows.map(_.getAs[Long]("degree")).min == dmin)
    // recompute the CSN alpha from the histogram itself
    val tSum = rows.map(r => r.getAs[Long]("n_nodes") *
      BigDecimal(math.log(r.getAs[Long]("degree").toDouble / (dmin - 0.5)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).sum
    val alpha = 1.0 + total.toDouble / tSum
    assert(math.abs(rows.head.getAs[Double]("alpha") - alpha) < 1e-4,
      s"${rows.head.getAs[Double]("alpha")} vs $alpha")
  }
}
