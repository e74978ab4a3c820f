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
}
