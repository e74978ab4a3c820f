package graft

import org.apache.spark.sql.functions._

import graft.plans.BloomFilter

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val bits = 1L << 14
  private val hashes = 2

  test("no false negatives: every inserted key passes mightContain") {
    val keys = (1L to 1000L).toDF("k")
    val bloom = BloomFilter.build(keys, $"k", bits, hashes)
    val missed = keys.crossJoin(broadcast(bloom))
      .where(!BloomFilter.mightContain($"bloom", $"k", bits, hashes))
      .count()
    assert(missed == 0L, s"$missed inserted keys rejected — Bloom filters must never false-negative")
  }

  test("false-positive rate is near the analytic bound") {
    val keys = (1L to 1000L).toDF("k")
    val bloom = BloomFilter.build(keys, $"k", bits, hashes)
    val probes = (100001L to 110000L).toDF("k") // disjoint from inserted
    val fp = probes.crossJoin(broadcast(bloom))
      .where(BloomFilter.mightContain($"bloom", $"k", bits, hashes))
      .count()
    // p = (1 - e^(-kn/m))^k ≈ (1 - e^(-2000/16384))^2 ≈ 0.0132
    val fpr = fp.toDouble / 10000
    assert(fpr < 0.05, s"measured FPR $fpr far above the ~1.3% analytic rate")
  }

  test("empty build side: null bloom map rejects every probe, semi-join is empty") {
    // a global agg over zero rows still emits ONE row, with a NULL map —
    // element_at(null, w) -> null -> coalesce 0 -> bit test false
    val none = spark.range(0).select($"id".as("k"))
    val bloom = BloomFilter.build(none, $"k", bits, hashes)
    assert(bloom.count() == 1L)
    val probes = (1L to 100L).toDF("k")
    val passed = probes.crossJoin(broadcast(bloom))
      .where(BloomFilter.mightContain($"bloom", $"k", bits, hashes)).count()
    assert(passed == 0L, "empty filter must reject everything")
    val joined = BloomFilter.bloomSemiJoin(probes, "k", none, "k")
    assert(joined.isEmpty)
  }

  test("bloomSemiJoin equals the plain semi join and the filter map stays sparse") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val hot = Tables.orders(spark, sfDir)
      .where($"o_totalprice" > 450000.0).select("o_orderkey")
    val viaBloom = BloomFilter.bloomSemiJoin(li, "l_orderkey", hot, "o_orderkey")
    val plain = li.join(hot, $"l_orderkey" === $"o_orderkey", "left_semi")
    assert(viaBloom.count() == plain.count())
    assert(viaBloom.except(plain).isEmpty && plain.except(viaBloom).isEmpty)
    // sparsity: words used ≤ hashes × keys (each key touches ≤2 words),
    // not the 2^18/64 = 4096-word capacity
    val nKeys = hot.count()
    val nWords = BloomFilter.build(hot, $"o_orderkey", 1L << 18, 2)
      .select(size(map_keys($"bloom"))).as[Int].head()
    assert(nWords <= 2 * nKeys, s"$nWords words for $nKeys keys — map not sparse")
  }

  test("the prefilter actually prunes: most non-matching rows drop before the join") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val hot = Tables.orders(spark, sfDir)
      .where($"o_totalprice" > 450000.0).select("o_orderkey")
    val bloom = BloomFilter.build(hot, $"o_orderkey", 1L << 18, 2)
    val pre = li.crossJoin(broadcast(bloom))
      .where(BloomFilter.mightContain($"bloom", $"l_orderkey", 1L << 18, 2))
      .count()
    val truePos = li.join(hot, $"l_orderkey" === $"o_orderkey", "left_semi").count()
    val total = li.count()
    assert(pre >= truePos, "prefilter dropped true matches")
    // selective predicate → the bloom pass should remove the bulk of the scan
    assert(pre < total * 0.5, s"prefilter kept $pre of $total rows — not pruning")
  }
}
