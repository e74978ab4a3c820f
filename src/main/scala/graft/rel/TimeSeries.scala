package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Event-stream time-series operators (SURVEY.md §2.B extension): the
  * densify / funnel / cohort shapes every product-analytics and
  * training-data-freshness pipeline needs on top of a raw event log.
  *
  * The reference (cerndb/dist-keras) has no analytics surface of its
  * own — its `examples/` notebooks lean on Spark for exactly this kind
  * of pre-training aggregation (`examples/workflow.ipynb [H]`) — so
  * these are written as the Catalyst-first plans we want at 100 TB:
  * keyed shuffles only, tiny aggregates broadcast, no driver loops.
  *
  * Determinism: timestamp mins/maxes are order-insensitive; money-ish
  * `value` sums go through DECIMAL(18,2) (testdata is exactly 2 dp);
  * day spines are data-derived via a 1-row bounds aggregate.
  */
object TimeSeries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** q_gap_fill — resample/densify: a complete per-user daily spine
    * (every user × every day in the observed range), daily event count
    * and value sum zero-filled, plus a running cumulative count. The
    * spine is generated, never materialized as input: a 1-row global
    * min/max aggregate cross-joined (broadcast) into the distinct-user
    * set, then `sequence()`-exploded — at 100 TB the spine is |users| ×
    * |days| rows built executor-side, and the only wide exchange is the
    * keyed left join back to the daily aggregates. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"), col("value"))
    val daily = e.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
    val bounds = e.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
    val spine = e.select(col("user_id")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("dmin"), col("dmax"), expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(
        col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .withColumn("cum_n",
        sum(col("n")).over(Window.partitionBy(col("user_id")).orderBy(col("day"))))
      .orderBy("user_id", "day")
  }

  /** Stage-to-stage conversion window (hours). 24 h discriminates at
    * every test scale (sf0.01: 150 → 60 → 25 users); an unbounded
    * window is degenerate on dense event data — every user eventually
    * converts. Interpolated into the oracle SQL from here. */
  val funnelWindowHours = 24

  /** q_funnel — ordered-sequence conversion: users reaching view →
    * click-within-24h-of-first-view → purchase-within-24h-of-that-
    * click, as stage counts. Each stage is a keyed min-aggregate joined
    * to the previous stage's thresholds (MIN is order-insensitive, so
    * no decimal device is needed); the per-stage threshold tables
    * shrink monotonically and auto-broadcast. This is the decorrelated
    * form of the classic "sequence match" — no window over the full
    * event log, no per-user collect. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val win = expr(s"interval $funnelWindowHours hours")
    val e = Tables.events(spark, dir).select(col("user_id"), col("event_type"), col("ts"))
    val t1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, "user_id").where(col("ts") > col("t1") && col("ts") <= col("t1") + win)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, "user_id").where(col("ts") > col("t2") && col("ts") <= col("t2") + win)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val all = e.agg(count_distinct(col("user_id")).as("n_users"))
      .select(lit("0_all").as("stage"), col("n_users"))
    def stageCount(df: DataFrame, label: String) =
      df.agg(count(lit(1)).as("n_users")).select(lit(label).as("stage"), col("n_users"))
    all.unionAll(stageCount(t1, "1_view"))
      .unionAll(stageCount(t2, "2_click"))
      .unionAll(stageCount(t3, "3_purchase"))
      .orderBy("stage")
  }

  /** q_cohort — retention matrix over orders (1995–2001, ~80 monthly
    * cohorts; the events table is 30 days of uniformly dense activity,
    * which cohorts degenerately — measured, not guessed): customers
    * grouped by first-order month, distinct-customer counts per
    * (cohort month, month offset). First-seen is a keyed min; the
    * (customer, cohort, month) activity set is de-duplicated BEFORE the
    * count-distinct aggregate so the wide exchange carries one row per
    * customer-month, not one per order. Month-truncated timestamps
    * subtract to exact month multiples in both engines, so the integer
    * cast is safe. */
  def cohort(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(
        col("o_custkey"),
        date_trunc("month", col("o_orderdate").cast("date")).cast("timestamp_ntz").as("month"))
    val first = o.groupBy(col("o_custkey")).agg(min(col("month")).as("cohort_month"))
    o.join(first, "o_custkey")
      .select(col("o_custkey"), col("cohort_month"), col("month")).distinct()
      .select(col("o_custkey"), col("cohort_month"),
        expr("CAST(months_between(month, cohort_month) AS INT)").as("month_offset"))
      .groupBy(col("cohort_month"), col("month_offset"))
      .agg(count_distinct(col("o_custkey")).as("n_customers"))
      .orderBy("cohort_month", "month_offset")
  }
}
