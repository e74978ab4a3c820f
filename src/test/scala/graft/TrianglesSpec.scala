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
}
