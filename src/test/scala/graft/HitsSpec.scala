package graft

import org.apache.spark.sql.functions._

import graft.graph.Hits

class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("hits: hand-computed scores on a 3-edge bipartite graph") {
    // 1→10, 1→11, 2→10
    // h1 = out-degree: h(1)=2, h(2)=1
    // a1(10) = h(1)+h(2) = 3, a1(11) = h(1) = 2
    // h2(1) = a1(10)+a1(11) = 5, h2(2) = a1(10) = 3
    // a2(10) = h2(1)+h2(2) = 8, a2(11) = h2(1) = 5
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val (hub, auth) = Hits.run(edges)
    val h = hub.collect().map(r => r.getLong(0) -> r.getDecimal(1).longValue()).toMap
    val a = auth.collect().map(r => r.getLong(0) -> r.getDecimal(1).longValue()).toMap
    assert(h == Map(1L -> 5L, 2L -> 3L), s"hubs $h")
    assert(a == Map(10L -> 8L, 11L -> 5L), s"auths $a")
  }

  test("hits: multi-edges weigh — a doubled edge doubles its evidence") {
    val single = Seq((1L, 10L), (2L, 10L)).toDF("src", "dst")
    val doubled = Seq((1L, 10L), (1L, 10L), (2L, 10L)).toDF("src", "dst")
    def hubOf(df: org.apache.spark.sql.DataFrame, id: Long): Long =
      Hits.run(df)._1.filter(col("id") === id).head().getDecimal(1).longValue()
    assert(hubOf(doubled, 1L) > hubOf(single, 1L),
      "an order buying a part twice must out-hub buying it once")
  }

  test("hits gate key: both roles present, all scores positive") {
    val out = Hits.qHits(spark, sfDir).cache()
    try {
      // score is an exact-integer STRING (overflow-proof emission);
      // compare numerically via a wide decimal cast
      assert(out.filter(col("score").cast("decimal(28,0)") <= 0).count() == 0)
      val kinds = out.select("kind").distinct().as[String].collect().toSet
      assert(kinds == Set("order", "part"))
      // every order with a lineitem is a hub; every part bought is an authority
      val nOrders = Tables.lineitem(spark, sfDir)
        .select("l_orderkey").distinct().count()
      val nParts = Tables.lineitem(spark, sfDir)
        .select("l_partkey").distinct().count()
      assert(out.filter(col("kind") === "order").count() == nOrders)
      assert(out.filter(col("kind") === "part").count() == nParts)
    } finally out.unpersist()
  }
}
