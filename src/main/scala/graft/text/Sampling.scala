package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic, content-addressed sampling and split assignment — the
  * way a training-data pipeline actually samples at 100 TB. `rand(seed)`
  * is reproducible only for a fixed partitioning (the stream is per
  * partition, so a repartition or AQE change reshuffles the sample);
  * hashing a stable key is reproducible across runs, engines, and
  * cluster sizes, and lets two independent jobs agree on the same
  * sample/split without coordination. md5 is used as the hash because
  * both the engine and the oracle compute identical hex for identical
  * strings (q_dedup_exact relies on the same fact), making these the
  * rare SAMPLING ops that are DuckDB-oracle-able.
  *
  * Granularity: decisions read the first two hex chars (256 buckets) —
  * fraction resolution 1/256, plenty for split assignment; use more hex
  * chars for finer fractions.
  */
object Sampling {

  /** First two hex chars of md5(key) — the 256-bucket decision value. */
  private def hexPrefix(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 2)

  private def hexOf(bucket: Int): String = f"$bucket%02x"

  /** Hex cut for a cumulative fraction — exposed so oracle SQL can
    * interpolate the SAME literal the Spark side computes (no drift). */
  def cutHex(cumFraction: Double): String =
    hexOf(math.round(cumFraction * 256).toInt.max(0).min(256))

  /** Membership predicate for the fraction-sized hash sample — exposed
    * as a Column so other operators (e.g. decontamination's eval split)
    * can reuse the EXACT same membership decision as [[hashSample]]. */
  def inSample(key: Column, fraction: Double): Column = {
    val cut = math.round(fraction * 256).toInt.max(0).min(256)
    if (cut >= 256) lit(true)
    else if (cut <= 0) lit(false)
    else hexPrefix(key) < lit(hexOf(cut))
  }

  /** Keep rows whose hash bucket < round(fraction·256). */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(inSample(key, fraction))

  /** Deterministic split label from cumulative hash ranges, e.g.
    * `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`. Fractions must
    * sum to 1 (±rounding); every row gets exactly one label. */
  def splitAssign(key: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $fractions")
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.round(c * 256).toInt.min(256))
    val prefix = hexPrefix(key)
    fractions.init.zip(cuts.init).foldRight(lit(fractions.last._1)) {
      case (((name, _), cut), elseCol) =>
        // cut == 256 means "everything up to here" — hexOf(256) would be
        // the 3-char "100", which compares ABOVE only "0f".."00" prefixes
        // lexicographically, silently misassigning ~94% of rows (e.g. a
        // 0.999/0.001 split). Same always-true guard as hashSample above.
        val cond = if (cut >= 256) lit(true) else prefix < lit(hexOf(cut))
        when(cond, name).otherwise(elseCol)
    }
  }

  /** Stratified hash sample: an independent fraction per stratum value
    * (the `sampleBy` shape, deterministic). Strata absent from the map
    * are dropped. Decisions hash (stratum, key) so a stratum change
    * re-rolls membership independently per stratum. */
  def stratifiedHashSample(df: DataFrame, stratum: Column, key: Column,
                           fractions: Map[String, Double]): DataFrame = {
    val cutFor = fractions.map { case (s, f) =>
      s -> math.round(f * 256).toInt.max(0).min(256)
    }
    val prefix = substring(
      md5(concat(stratum.cast("string"), lit("|"), key.cast("string")).cast("binary")),
      1, 2)
    val cond = cutFor.map { case (s, cut) =>
      stratum === lit(s) && (if (cut >= 256) lit(true) else prefix < lit(hexOf(cut)))
    }.reduce(_ || _)
    df.filter(cond)
  }

  /** Gate key: 10% deterministic sample of documents. */
  def qSampleHash(spark: SparkSession, dir: String): DataFrame =
    hashSample(Tables.documents(spark, dir), col("doc_id"), 0.10)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** Per-stratum fractions for the q_stratified_sample gate key —
    * shared with the oracle SQL (cuts interpolated via [[cutHex]]). The
    * LLM-pipeline use: domain reweighting, e.g. keep all of a scarce
    * language, half of the dominant one. */
  val stratifiedDemoFractions: Seq[(String, Double)] =
    Seq("de" -> 1.0, "en" -> 0.5, "fr" -> 0.25)

  /** Gate key: per-language stratified sample of documents. */
  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedHashSample(Tables.documents(spark, dir), col("lang"),
        col("doc_id"), stratifiedDemoFractions.toMap)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  // ------------------------------------------- deterministic global shuffle

  /** Deterministic global shuffle position for every row — the corpus
    * serialization step before training (`utils.shuffle` upgraded from a
    * random repartition to a reproducible total order). The position is
    * the row's rank under ORDER BY (md5(key), key) — a pseudo-random but
    * engine/run/partitioning-independent permutation, so two jobs (or a
    * resumed job) agree on example order with zero coordination.
    *
    * Scale shape: NOT a global sort. The first two hex chars of the hash
    * split the corpus into 256 uniform buckets; per-bucket counts (256
    * rows) turn into exclusive cumulative offsets via a bounded window,
    * broadcast back, and each row's position is bucket offset + its rank
    * WITHIN the bucket (a keyed window, ~N/256 rows per partition).
    * Because the bucket is a prefix of the sort key, bucket-major order
    * ≡ global hash order — same device as external sort-merge, and at
    * 100 TB each contiguous `pos` range is one output shard.
    *
    * `hexChars` sets the bucket count (16^hexChars): 2 → 256 buckets
    * (fine to ~TB), 3 → 4096, 4 → 65536 (≈1.5 GB/bucket at 100 TB).
    * Positions are IDENTICAL for every granularity (the order is
    * (md5, key) regardless — spec-pinned), so re-tuning for scale can
    * never change the shuffle. The offsets window is over 16^hexChars
    * rows — bounded, but keep hexChars ≤ 4. */
  def shufflePositions(df: DataFrame, key: Column, hexChars: Int = 2): DataFrame = {
    require(hexChars >= 1 && hexChars <= 4, s"hexChars must be in [1,4]: $hexChars")
    // withColumn would silently REPLACE a caller column of the same name
    // and the final drop would then destroy caller data (the
    // bloomSemiJoin reserved-name hazard) — refuse instead
    Seq("__h", "__b", "__off", "pos").foreach { c =>
      require(!df.columns.contains(c), s"shufflePositions reserves column name '$c'")
    }
    val keyed = df.withColumn("__h", md5(key.cast("string").cast("binary")))
      .withColumn("__b", substring(col("__h"), 1, hexChars))
    // 256-row aggregate; the partition-less window is intentional and
    // bounded (same documented pattern as the histogram/AUC bins)
    val offsets = keyed.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .select(col("__b"), coalesce(
        sum(col("__c")).over(Window.partitionBy(lit(0)).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__off"))
    val rn = row_number().over(Window.partitionBy(col("__b")).orderBy(col("__h"), key))
    keyed.join(broadcast(offsets), Seq("__b"))
      .withColumn("pos", col("__off") + rn)
      .drop("__b", "__h", "__off")
  }

  /** Gate key: shuffle positions over documents; oracle is the plain
    * global-window form (`ROW_NUMBER() OVER (ORDER BY md5(id), id)`) —
    * the bucketed plan must reproduce it exactly. */
  def qShuffleOrder(spark: SparkSession, dir: String): DataFrame =
    shufflePositions(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), col("pos"))
      .orderBy("doc_id")

  /** Per-group deterministic cap (r12): keep at most `cap` rows per
    * group, chosen by md5-hash order — the balancing step a mixture
    * pipeline runs BEFORE [[qDomainMix]]'s weighting: an over-represented
    * crawl domain gets hard-capped at N documents while small domains
    * keep everything, and the kept set is a uniform, reproducible sample
    * (hash order ≡ random order, stable across runs/engines/partition-
    * ings — the [[hashSample]] argument, here as a top-k instead of a
    * fraction, which is what you want when the budget is an absolute
    * row count rather than a rate).
    *
    * Scale: one hash exchange on the group key + in-partition rank —
    * the q_topk_per_group shape; no global sort, skew handled by AQE
    * like any keyed window. Tie-break on the key itself (md5 collisions
    * on distinct inputs are not a practical concern, but the ORDER must
    * be total for determinism). */
  def groupCap(df: DataFrame, group: Column, key: Column, cap: Int): DataFrame = {
    val w = Window.partitionBy(group)
      .orderBy(md5(key.cast("string").cast("binary")), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Gate key: cap every source at 15 documents — the corpus has 20
    * uniform sources (25 docs each at sf0.001/sf0.01, 250 at sf0.1), so
    * the cap genuinely bites at every test SF. */
  def qDomainCap(spark: SparkSession, dir: String): DataFrame =
    groupCap(Tables.documents(spark, dir), col("source"), col("doc_id"), 15)
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")

  /** Per-stratum sample size for [[qSampleWeighted]]. */
  val weightedK = 5

  /** Weighted sampling without replacement by PRIORITY SAMPLING
    * (Duffield, Lund & Thorup, "Priority sampling for estimation of
    * arbitrary subset sums", JACM 2007): each row gets priority
    * q = w / u with u uniform in (0,1], and the top-k priorities per
    * stratum are the sample — inclusion probability rises with weight,
    * repeated runs agree exactly. This is the selection step that
    * CONSUMES a quality/importance weight (q_quality_score,
    * q_dsir_weights): sample training docs ∝ weight instead of
    * hard-thresholding. Weight here = doc length (chars) as the
    * stand-in quality mass.
    *
    * Determinism device: u is md5-hash-derived (the q_sample_hash
    * family), so priorities are pure IEEE division chains of
    * exactly-representable integers — bit-identical on both engines
    * with NO transcendental (the classic u^(1/w) exponential-key scheme
    * would put ln/pow in the sort key, whose last-ulp behavior is
    * libm-dependent) — and the OUTPUT carries no float at all: the
    * priority only orders the per-stratum window, the emitted columns
    * are (source, doc_id, n_chars, rn).
    *
    * Scale shape: one per-row codegen pass + one source-keyed window —
    * the q_domain_cap plan; at 100 TB the top-k-per-group window swaps
    * for the bounded-heap TopKPerGroup physical operator. */
  def qSampleWeighted(spark: SparkSession, dir: String): DataFrame = {
    val u = (pmod(graft.text.TextOps.baseHash60(
      concat(lit("ws:"), col("doc_id").cast("string"))), lit(999983L)) + 1L)
      .cast("double") / lit(999984.0)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("priority",
        greatest(col("n_chars"), lit(1L)).cast("double") / u)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= weightedK)
      .select(col("source"), col("doc_id"), col("n_chars"), col("rn"))
      .orderBy("source", "rn")
  }

  /** Materialize the shuffled order as SHARDED parquet — the write path
    * that closes [[shufflePositions]]' 100 TB claim: each shard
    * directory holds exactly one contiguous `pos` range (shard =
    * hash-prefix bucket = a prefix of the sort key, so bucket-major
    * order ≡ global order), rows inside each shard file are pos-sorted,
    * and NO global sort ever runs — the plan is one hash exchange on the
    * shard id plus a per-partition sort, both shapes that scale
    * linearly with executors. A trainer then streams shards in shard-id
    * order (or any subset, resumably) and reads the exact global
    * permutation.
    *
    * `sortWithinPartitions(shard, pos)` rather than `(pos)` alone:
    * multiple shards can hash into one task, and the writer splits
    * files by the partitionBy value — grouping by shard first keeps
    * each file's rows contiguous AND ordered. */
  def writeShuffledShards(df: DataFrame, key: Column, path: String,
                          hexChars: Int = 2): Unit =
    shuffledShardsFrame(df, key, hexChars)
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** The exact frame [[writeShuffledShards]] writes — exposed so specs
    * can assert the plan (no global sort) without doing I/O. */
  def shuffledShardsFrame(df: DataFrame, key: Column,
                          hexChars: Int = 2): DataFrame = {
    require(!df.columns.contains("shard"),
      "shuffledShardsFrame reserves column name 'shard'")
    // the shard id re-derives the SAME hash-prefix bucket
    // shufflePositions used internally, so pos ranges per shard are
    // contiguous by construction (offset_b .. offset_b + count_b)
    shufflePositions(df, key, hexChars)
      .withColumn("shard",
        substring(md5(key.cast("string").cast("binary")), 1, hexChars))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
  }

  // ------------------------------------------------ domain-mixture planning

  /** Target mixture for the q_domain_mix gate key ('es' deliberately
    * absent — unlisted domains get rate 0). Shared with the oracle SQL
    * (literals interpolated, the MLP-weights device). */
  val domainMixTargets: Seq[(String, Double)] =
    Seq("de" -> 0.15, "en" -> 0.5, "fr" -> 0.15, "zh" -> 0.2)

  /** Domain-mixture sampling plan (the DoReMi/Pile-style static-mix
    * step): given target proportions per domain, find the LARGEST total
    * corpus T the availability supports — T = min over target domains of
    * n_domain / target_domain (the binding domain samples at rate 1.0) —
    * and emit each domain's sampling rate `target·T / n` plus the floor'd
    * keep count. Feed the rates into [[stratifiedHashSample]] to apply.
    *
    * Every number is one IEEE division/multiplication chain evaluated in
    * the same order on both engines (no float SUMS — order-proof by
    * construction); rate rounded to 6 dp, floor() pinned explicitly.
    * Scale shape: a domain-keyed hash agg (domains ≪ rows) + one-row
    * broadcast of the binding capacity. */
  def domainMixPlan(docs: DataFrame, stratum: Column,
                    targets: Seq[(String, Double)]): DataFrame = {
    // a target domain ABSENT from the data is silently ignored (its
    // availability is unknowable from this corpus — callers wanting a
    // hard failure should anti-join targets against the plan's output)
    require(targets.nonEmpty && targets.forall(_._2 > 0), s"targets must be positive: $targets")
    require(targets.map(_._1).distinct.size == targets.size, s"duplicate target domain: $targets")
    val tmap = map(targets.flatMap { case (s, f) => Seq(lit(s), lit(f)) }: _*)
    val avail = docs.groupBy(stratum.as("domain")).agg(count(lit(1)).as("n_docs"))
      .withColumn("target", coalesce(element_at(tmap, col("domain")), lit(0.0)))
    val cap = avail.where(col("target") > 0)
      .agg(min(col("n_docs").cast("double") / col("target")).as("t_cap"))
    avail.crossJoin(broadcast(cap))
      .withColumn("rate", when(col("target") === 0, lit(0.0)).otherwise(
        round(least(lit(1.0), col("target") * col("t_cap") / col("n_docs").cast("double")), 6)))
      .withColumn("n_keep", floor(col("rate") * col("n_docs").cast("double")).cast("long"))
      .select(col("domain"), col("n_docs"), col("target"), col("rate"), col("n_keep"))
  }

  /** Gate key: mixture plan over documents by language. */
  def qDomainMix(spark: SparkSession, dir: String): DataFrame =
    domainMixPlan(Tables.documents(spark, dir), col("lang"), domainMixTargets)
      .orderBy("domain")

  /** Temperature-scaled mixture (the XLM-R / mT5 multilingual-sampling
    * rule): sampling share q_d ∝ p_d^α where p_d is the natural share
    * and α ∈ (0,1] — α=1 keeps the natural mix, α→0 approaches uniform,
    * lifting low-resource domains without drowning the head.
    *
    * Engine-parity design: p^α in general is pow(), which is NOT
    * correctly-rounded in IEEE and can differ across engines in the
    * last ulp — so the oracled gate key pins α = 0.5, where p^α = sqrt
    * (correctly rounded everywhere). The normalizer Σ p_d^α is summed
    * as DECIMAL(18,6) over the 6-dp-rounded terms — exact and
    * addition-order-free — then ONE double division per domain. Scale
    * shape: domain-keyed hash agg (domains ≪ rows) + two one-row
    * broadcasts; the per-row application step is
    * [[stratifiedHashSample]] with the emitted rates. */
  def temperatureMixPlan(docs: DataFrame, stratum: Column): DataFrame = {
    val avail = docs.groupBy(stratum.as("domain")).agg(count(lit(1)).as("n_docs"))
    val tot = avail.agg(sum(col("n_docs")).as("n_total"))
    val withP = avail.crossJoin(broadcast(tot))
      .withColumn("p_nat",
        round(col("n_docs").cast("double") / col("n_total").cast("double"), 6))
      .withColumn("pa", round(sqrt(col("p_nat")), 6).cast("decimal(18,6)"))
    val z = withP.agg(sum(col("pa")).as("z"))
    withP.crossJoin(broadcast(z))
      .withColumn("q_mix",
        round(col("pa").cast("double") / col("z").cast("double"), 6))
      .withColumn("boost", round(col("q_mix") / col("p_nat"), 6))
      .select(col("domain"), col("n_docs"), col("p_nat"), col("q_mix"), col("boost"))
  }

  /** Gate key: α=0.5 temperature mix over documents by language. */
  def qDomainMixTemperature(spark: SparkSession, dir: String): DataFrame =
    temperatureMixPlan(Tables.documents(spark, dir), col("lang"))
      .orderBy("domain")

  /** Gate key: 80/10/10 split assignment, aggregated per (split, lang) —
    * proves disjoint-and-exhaustive assignment in one oracled shape. */
  def qSplitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        splitAssign(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy("split", "lang")

  /** k for [[qKfold]]. */
  val kFolds = 5

  /** q_kfold — cross-validation fold assignment audit: every document
    * hashed into one of [[kFolds]] folds, reported per (fold, lang)
    * with the fold's share of that language — the check that
    * content-addressed folds are BALANCED (each fold ≈ 1/k of every
    * stratum) before anyone trusts a CV estimate from them. The CV
    * sibling of q_split_assign's one-shot split; same md5 device, so
    * folds are reproducible across runs, engines and partitionings.
    *
    * Scale shape: per-row codegen hash + ONE map-side-combined
    * (fold, lang) aggregate; language totals derive from the tiny grid. */
  def qKfold(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fold = pmod(TextOps.baseHash60(
      concat(lit("fold:"), col("doc_id").cast("string"))), lit(kFolds.toLong))
      .cast("int")
    val grid = Tables.documents(spark, dir)
      .select(fold.as("fold"), col("lang"))
      .groupBy(col("fold"), col("lang")).agg(count(lit(1)).as("n"))
    val perLang = Window.partitionBy(col("lang"))
    grid
      .select(col("fold"), col("lang"), col("n"),
        round(col("n").cast("double") /
          sum(col("n")).over(perLang).cast("double"), 6).as("lang_share"))
      .orderBy("fold", "lang")
  }

  /** Bootstrap replicate count. */
  val bootReps = 8
  /** Poisson(1) CDF cut points scaled to the 10⁶-resolution hash
    * uniform — ⌊CDF(k)·10⁶⌋ for k = 0..5 (k = 6 is the ELSE arm).
    * Integer thresholds on an integer uniform: the replicate weights
    * involve NO floating point at all. */
  val poissonCuts: Seq[Int] = Seq(367879, 735758, 919698, 981011, 996340, 999405)

  /** q_bootstrap_se — Poisson-bootstrap standard errors: the per-source
    * mean document length with an 8-replicate bootstrap SE, computed in
    * ONE pass. Classical bootstrap resampling (draw n rows with
    * replacement, B times) is unrunnable at 100 TB; the Poisson
    * approximation gives every row an independent Poisson(1) weight
    * per replicate — here hash-derived, so the "randomness" is
    * content-addressed and reproducible across runs, engines, and
    * partitionings (the whole point of this module). The uncertainty
    * readout every point estimate in this repo (means, rates, drift
    * scores) should be published with.
    *
    * Scale shape: the corpus-linear work is one explode(×[[bootReps]])
    * of a narrow (source, n_chars, weight) stream into a map-side-
    * combined (source, rep) aggregate of exact BIGINT sums; replicate
    * means are ROUND(,9)→DECIMAL so the 8-row fold per source is
    * addition-order-proof; everything after runs on ≤ |sources|·8
    * rows. */
  def qBootstrapSe(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val u = pmod(TextOps.baseHash60(
      concat(lit("boot"), col("rep").cast("string"), lit(":"),
        col("doc_id").cast("string"))), lit(1000000L))
    val wCase = poissonCuts.zipWithIndex.foldRight(lit(poissonCuts.size)) {
      case ((cut, k), elseCol) => when(u < cut, lit(k)).otherwise(elseCol)
    }
    val reps = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        explode(sequence(lit(0), lit(bootReps - 1))).as("rep"))
      .select(col("source"), col("rep"), col("n_chars"), wCase.as("w"))
      .groupBy(col("source"), col("rep"))
      .agg(sum(col("w").cast("long")).as("sw"),
        sum((col("w") * col("n_chars")).cast("long")).as("swx"))
      .select(col("source"),
        round(col("swx").cast("double") / col("sw").cast("double"), 9)
          .cast(DecimalType(18, 9)).as("m"))
    val exact = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars").cast("long")).as("sx"))
    val nb = lit(bootReps.toDouble)
    reps.groupBy(col("source"))
      .agg(sum(col("m")).cast("double").as("sm"),
        sum((col("m") * col("m")).cast(DecimalType(38, 18))).cast("double").as("smm"))
      .join(exact, "source")
      .select(col("source"), col("n_docs"),
        round(col("sx").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_chars"),
        round(sqrt((col("smm") - col("sm") * col("sm") / nb) / (nb - lit(1.0))), 6)
          .as("boot_se"))
      .orderBy("source")
  }
}
