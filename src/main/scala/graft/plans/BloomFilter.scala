package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational Bloom filter: build and probe entirely inside the Catalyst
  * plan — the 100 TB "runtime filter" pattern (what Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` injection and Trino's
  * dynamic filtering do) expressed as explicit operators.
  *
  * Why it matters at scale: a selective dimension/build side should
  * prune the fact scan BEFORE the join shuffle. Shipping 100 TB of
  * lineitem through an exchange to discard 99% of it in the join is the
  * single most expensive mistake a big join can make. A Bloom filter of
  * the build keys is tiny (auto-sized at ~16 bits per distinct key — a
  * million-key build is 2 MB), broadcasts for free, and filters
  * map-side with two hash probes per row — no shuffle, no collect,
  * false positives cleaned up by the exact join that follows.
  *
  * Implementation is pure DataFrame ops (no driver-side state):
  *  - build: explode each key into `numHashes` bit positions →
  *    per-word `bit_or` partial aggregation (map-side combine absorbs
  *    the explosion) → one row holding a `map<long,long>` of non-zero
  *    64-bit words. The map is sparse: words never touched by a key are
  *    absent, so filter size tracks key count, not capacity.
  *  - probe: cross-join the one-row filter (broadcast) and test all
  *    `numHashes` bits with `element_at` + mask — codegen-friendly
  *    column arithmetic, stays inside WholeStageCodegen.
  *
  * Double hashing (xxhash64 seeded 0..k-1) gives k independent probe
  * streams; xxhash64 is the same 64-bit hash Spark's shuffle hash uses,
  * uniform on integral keys.
  */
object BloomFilter {

  /** Bit positions of `key` under `numHashes` seeded hash functions. */
  private def positions(key: Column, numBits: Long, numHashes: Int): Seq[Column] =
    (0 until numHashes).map(i => pmod(xxhash64(key, lit(i)), lit(numBits)))

  /** One-row DataFrame with column `bloom` = map<long,long> of set words.
    * `numBits` must be a multiple of 64. Size the filter at ~10-20 bits
    * per expected key for a ~1% false-positive rate with 2 hashes. */
  def build(keys: DataFrame, key: Column, numBits: Long, numHashes: Int): DataFrame = {
    require(numBits % 64 == 0, s"numBits must be a multiple of 64, got $numBits")
    require(numHashes >= 1, "need at least one hash function")
    val pos = positions(key, numBits, numHashes)
    keys
      .select(explode(array(pos: _*)).as("p"))
      .select(
        (col("p") / 64).cast("long").as("w"),
        call_function("shiftleft", lit(1L), (col("p") % 64).cast("int")).as("m"))
      .groupBy(col("w"))
      .agg(bit_or(col("m")).as("mask"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("mask")))).as("bloom"))
  }

  /** Membership test against a `bloom` map column (as produced by
    * [[build]] with the SAME numBits/numHashes). False positives
    * possible; false negatives are not. */
  def mightContain(bloom: Column, key: Column, numBits: Long, numHashes: Int): Column =
    positions(key, numBits, numHashes).map { p =>
      val mask = call_function("shiftleft", lit(1L), (p % 64).cast("int"))
      coalesce(element_at(bloom, (p / 64).cast("long")), lit(0L))
        .bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)

  /** Bits per expected distinct build key when auto-sizing: 16 bits/key
    * with 2 hashes gives FPR ≈ (1−e^(−2/16))² ≈ 1.4%. */
  val autoBitsPerKey = 16L

  /** Derive `numBits` from an approx distinct count of the build side —
    * the same pattern as the capped LSH's autoPlanes: one metadata-cheap
    * aggregate action at plan time sizes the structure so a build side
    * 10× bigger than expected degrades FPR gracefully instead of
    * silently saturating to all-pass. Rounded up to whole 64-bit words;
    * floored at 1 Kib (tiny builds), capped at 16 Mib = 2 MB (past
    * that, broadcast cost outweighs the prefilter's savings — callers
    * with genuinely huge build sides should skip the Bloom pass). */
  def autoNumBits(buildSide: DataFrame, buildKey: String,
                  bitsPerKey: Long = autoBitsPerKey): Long = {
    val n = buildSide.agg(approx_count_distinct(col(buildKey))).head.getLong(0)
    val words = ((math.max(n, 1L) * bitsPerKey + 63) / 64)
      .max(16L).min((1L << 24) / 64)
    words * 64
  }

  /** Reserved internal column names — the probe filter column and the
    * aliased build key. `big` must not use either. */
  private val reservedCols = Seq("__bloom_filter", "__bloom_build_key")

  /** Semi-join of `big` against `buildSide` keys with a Bloom prefilter:
    * probe map-side first (cheap, no shuffle), exact semi-join after
    * (clears false positives). Result is EXACTLY the plain semi-join —
    * the filter only moves work off the shuffle. `numBits = 0` (the
    * default) auto-sizes from the build side via [[autoNumBits]]. */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
                    buildSide: DataFrame, buildKey: String,
                    numBits: Long = 0L, numHashes: Int = 2): DataFrame = {
    reservedCols.foreach(c => require(!big.columns.contains(c),
      s"bloomSemiJoin: probe side must not contain reserved column '$c'"))
    val bits = if (numBits > 0) numBits else autoNumBits(buildSide, buildKey)
    // project + alias the build key so the exact join resolves even when
    // both sides share the key name (semi-join output is left-side-only,
    // so the alias never leaks); the filter column gets a reserved name
    // so a caller's own "bloom" column survives untouched
    val buildKeys = buildSide.select(col(buildKey).as("__bloom_build_key"))
    val bloom = build(buildKeys, col("__bloom_build_key"), bits, numHashes)
      .select(col("bloom").as("__bloom_filter"))
    big
      .crossJoin(broadcast(bloom))
      .where(mightContain(col("__bloom_filter"), col(bigKey), bits, numHashes))
      .drop("__bloom_filter")
      .join(buildKeys, col(bigKey) === col("__bloom_build_key"), "left_semi")
  }

  /** Gate key: lineitem rows whose order is high-value (o_totalprice >
    * 450k), prefiltered by a Bloom filter of the hot order keys before
    * the exact semi-join. Oracle = the plain semi-join (the Bloom pass
    * must be result-invisible). */
  def qBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val hot = Tables.orders(spark, dir)
      .where(col("o_totalprice") > 450000.0)
      .select("o_orderkey")
    bloomSemiJoin(li, "l_orderkey", hot, "o_orderkey")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
  }
}
