package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
}
