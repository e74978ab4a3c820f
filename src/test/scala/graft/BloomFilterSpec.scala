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

  test("auto-sizing keeps FPR bounded on a 10x larger build side") {
    // 10,000 keys would saturate a fixed 2^14-bit filter (FPR → ~48%);
    // autoNumBits scales with the build side, pinning FPR to the
    // ~16-bits/key design point regardless of build cardinality
    val keys = (1L to 10000L).toDF("k")
    val bits = BloomFilter.autoNumBits(keys, "k")
    assert(bits >= 10000L * 8 && bits % 64 == 0,
      s"auto-sized $bits bits for 10k keys — under 8 bits/key")
    val bloom = BloomFilter.build(keys, $"k", bits, hashes)
    val probes = (1000001L to 1020000L).toDF("k") // disjoint from inserted
    val fp = probes.crossJoin(broadcast(bloom))
      .where(BloomFilter.mightContain($"bloom", $"k", bits, hashes))
      .count()
    val fpr = fp.toDouble / 20000
    assert(fpr < 0.02, s"measured FPR $fpr above the ~1.4% auto-size design point")
  }

  test("a caller's own 'bloom' column survives bloomSemiJoin untouched") {
    val probes = (1L to 100L).toDF("k").withColumn("bloom", $"k" * 2)
    val buildSide = (1L to 50L).toDF("k")
    val out = BloomFilter.bloomSemiJoin(probes, "k", buildSide, "k")
    assert(out.columns.toSeq == Seq("k", "bloom"))
    assert(out.count() == 50L)
    assert(out.where($"bloom" =!= $"k" * 2).count() == 0L,
      "caller's bloom column was clobbered by the prefilter")
    // reserved names fail fast instead of resolving ambiguously
    val clash = probes.withColumnRenamed("bloom", "__bloom_filter")
    val e = intercept[IllegalArgumentException] {
      BloomFilter.bloomSemiJoin(clash, "k", buildSide, "k")
    }
    assert(e.getMessage.contains("__bloom_filter"))
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
