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

  test("disambiguator spreads byte-identical hot-key rows, deterministically") {
    // 900 rows fully identical in content — the content salt collapses
    // them onto ONE bucket; a caller-supplied row-id disambiguator
    // spreads them while staying stable across recomputation
    val identical = (1 to 900).map(i => (1L, 0, i.toLong)).toDF("k", "v", "rid")
      .repartition(8)
    val collapsed = identical.drop("rid")
      .select(SkewJoin.salt(identical.drop("rid"), 4).as("s"))
      .distinct().count()
    assert(collapsed == 1L, "identical rows should collapse without a disambiguator")

    val spread = identical
      .select(SkewJoin.salt(identical, 4, Some($"rid")).as("s"))
      .distinct().count()
    assert(spread == 4L, "disambiguator should use all buckets")

    // join result identical to plain, and stable across two runs
    val dim1 = Seq((1L, "hot")).toDF("dk", "name")
    val run1 = SkewJoin.saltedJoin(identical, dim1, "k", "dk", 4, Some($"rid"))
      .select("k", "v", "rid", "name")
    val run2 = SkewJoin.saltedJoin(identical, dim1, "k", "dk", 4, Some($"rid"))
      .select("k", "v", "rid", "name")
    assert(run1.count() == 900L)
    assert(run1.except(run2).isEmpty && run2.except(run1).isEmpty)
  }

  test("NULL disambiguator rows fall back to the content hash, not one bucket") {
    // 800 distinct-content rows whose disambiguator is entirely NULL:
    // hashing the null itself would put all 800 in a single bucket,
    // recreating the hot spot; the content-hash fallback spreads them
    val nullDis = (1 to 800).map(i => (1L, i)).toDF("k", "v")
      .withColumn("rid", lit(null).cast("long")).repartition(8)
    val buckets = nullDis
      .select(SkewJoin.salt(nullDis, 4, Some($"rid")).as("s"))
      .distinct().count()
    assert(buckets == 4L, "null disambiguators should spread via content hash")

    // mixed case: null-rid rows spread by content, non-null by rid
    val mixed = ((1 to 400).map(i => (1L, i, Some(i.toLong))) ++
      (401 to 800).map(i => (1L, i, Option.empty[Long])))
      .toDF("k", "v", "rid").repartition(8)
    val mixedBuckets = mixed
      .select(SkewJoin.salt(mixed, 4, Some($"rid")).as("s"))
      .distinct().count()
    assert(mixedBuckets == 4L)
  }

  test("q_join_skew_salted gate key equals the plain lineitem-supplier join") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
    val sup = Tables.supplier(spark, sfDir).select("s_suppkey", "s_name")
    val plain = li.join(sup, $"l_suppkey" === $"s_suppkey")
      .select("l_orderkey", "l_linenumber", "l_suppkey", "s_name", "l_quantity")
    val salted = SkewJoin.qJoinSkewSalted(spark, sfDir)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
