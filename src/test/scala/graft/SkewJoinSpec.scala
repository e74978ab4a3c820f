package graft

import org.apache.spark.sql.functions._

import graft.plans.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private lazy val skewed = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i)))
    .toDF("k", "v").repartition(8)
  private lazy val dim = (1L to 101L).map(k => (k, s"name$k")).toDF("dk", "name")

  test("salted join equals plain join") {
    val plain = skewed.join(dim, $"k" === $"dk").select("k", "v", "name")
    val salted = SkewJoin.saltedJoin(skewed, dim, "k", "dk", buckets = 4)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salted count equals plain count and spreads the hot key") {
    val plain = skewed.groupBy("k").count().as[(Long, Long)].collect().toMap
    val salted = SkewJoin.saltedCount(skewed, "k", buckets = 4)
      .as[(Long, Long)].collect().toMap
    assert(salted == plain)
    assert(salted(1L) == 900L)
  }
}
