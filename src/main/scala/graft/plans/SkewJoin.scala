package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Salted equi-join for skewed keys (SURVEY.md §7.2 scale notes).
  *
  * When one join key dominates (a hot user, a null-ish default), hash
  * partitioning sends its entire volume to one task. Salting splits the
  * skewed side's rows across `buckets` sub-keys and replicates the
  * other side once per bucket, so the hot key fans out over `buckets`
  * tasks. AQE's skew-join handles sort-merge skew automatically at
  * runtime; explicit salting remains the tool for aggregations and for
  * joins where the build side must stay hash-partitioned.
  *
  * Cost model: replicates `small` ×buckets — use only when
  * |small| × buckets ≪ |big|, which is exactly the skew scenario.
  */
object SkewJoin {

  /** Deterministic salt: task retries recompute the same salt for the
    * same row (spark_partition_id/monotonically_increasing_id change
    * across retries — a correctness hazard under shuffle fetch-failure
    * recovery). The default hashes the full row content, so fully
    * IDENTICAL rows share a salt — which defeats the salting when a hot
    * key's rows are also byte-identical (common in log/event corpora).
    * For that case pass a `disambiguator` expression that is stable
    * across retries and distinct across the duplicates — a pre-assigned
    * row id, a file/offset lineage column — and it is hashed INSTEAD of
    * the content; or pre-aggregate the duplicates to (row, count) before
    * joining, which shrinks the hot key instead of spreading it.
    * Rows whose disambiguator is NULL fall back to the content hash:
    * hashing the null itself would send every null-disambiguator row to
    * one bucket, silently recreating the hot spot the salt exists to fix.
    * Exposed so callers can inspect the bucket distribution before
    * committing to a bucket count. */
  def salt(df: DataFrame, buckets: Int,
           disambiguator: Option[Column] = None): Column = {
    val contentHash = xxhash64(df.columns.toSeq.map(col): _*)
    val h = disambiguator
      .map(d => when(d.isNull, contentHash).otherwise(xxhash64(d)))
      .getOrElse(contentHash)
    pmod(h, lit(buckets.toLong))
  }

  /** Inner equi-join of a skewed `big` side with a `small` side on
    * bigKey == smallKey, salted over `buckets`. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String, buckets: Int,
                 disambiguator: Option[Column] = None): DataFrame = {
    val salted = big.withColumn("__salt", salt(big, buckets, disambiguator))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Skew-safe aggregation: count/sum over a hot key in two phases —
    * partial aggregate on (key, salt), then final aggregate on key.
    * The first shuffle spreads the hot key across `buckets` reducers. */
  def saltedCount(df: DataFrame, key: String, buckets: Int,
                  disambiguator: Option[Column] = None): DataFrame =
    df.withColumn("__salt", salt(df, buckets, disambiguator))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))

  /** Gate key: lineitem⋈supplier salted over 8 buckets. The salt is
    * result-invisible — the oracle is the PLAIN join — it only changes
    * how the hot key's rows distribute over reducers. supplier is tiny
    * here so a broadcast would also work; the salted form is the shape
    * that survives when the build side outgrows the broadcast threshold
    * and one key dominates the probe side. */
  def qJoinSkewSalted(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    saltedJoin(li, sup, "l_suppkey", "s_suppkey", buckets = 8)
      .select("l_orderkey", "l_linenumber", "l_suppkey", "s_name", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "s_name", "l_quantity")
  }
}
