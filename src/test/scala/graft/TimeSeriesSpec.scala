package graft

import org.apache.spark.sql.functions._

import graft.rel.TimeSeries

class TimeSeriesSpec extends SparkSpec {

  test("gapFill emits a complete per-user day spine with zero-fill") {
    val out = TimeSeries.gapFill(spark, sfDir).cache()
    try {
      val e = Tables.events(spark, sfDir)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      val nDays = e.agg(
        (datediff(max(col("day")), min(col("day"))) + 1).as("nd"))
        .head().getAs[Int]("nd")
      // every user carries exactly the full spine
      val perUser = out.groupBy("user_id").count().select("count").distinct().collect()
      assert(perUser.length == 1 && perUser.head.getLong(0) == nDays.toLong,
        s"expected uniform $nDays-day spines, got ${perUser.mkString(",")}")
      // zero-filled rows exist (the spine is denser than the raw events)
      assert(out.filter(col("n") === 0).count() > 0)
      // per-user event totals survive the densify
      val sums = out.groupBy("user_id").agg(sum("n").as("total"))
      val raw = e.groupBy("user_id").agg(count(lit(1)).as("raw"))
      assert(sums.join(raw, "user_id").filter(col("total") =!= col("raw")).count() == 0)
      // cum_n is the running prefix sum: last value per user == total
      val last = out.groupBy("user_id").agg(max(struct(col("day"), col("cum_n"))).as("m"))
        .select(col("user_id"), col("m.cum_n").as("last_cum"))
      assert(last.join(sums, "user_id").filter(col("last_cum") =!= col("total")).count() == 0)
    } finally out.unpersist()
  }

  test("funnel stages are monotone non-increasing and anchored at distinct users") {
    val rows = TimeSeries.funnel(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("0_all", "1_view", "2_click", "3_purchase"))
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel not monotone: ${counts.mkString(",")}")
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(counts.head == nUsers)
    assert(counts(1) > 0, "test data has view events; stage 1 must be non-empty")
  }

  test("cohort offset-0 cell equals the cohort size and offsets are non-negative") {
    val out = TimeSeries.cohort(spark, sfDir).cache()
    try {
      assert(out.filter(col("month_offset") < 0).count() == 0)
      // at offset 0 every cohort member is active by definition
      val first = Tables.orders(spark, sfDir)
        .select(col("o_custkey"),
          date_trunc("month", col("o_orderdate").cast("date")).as("m"))
        .groupBy("o_custkey").agg(min(col("m")).as("cohort_month"))
        .groupBy("cohort_month").agg(count(lit(1)).as("size"))
      val zero = out.filter(col("month_offset") === 0)
        .select(col("cohort_month"), col("n_customers"))
      assert(zero.join(first, "cohort_month")
        .filter(col("n_customers") =!= col("size")).count() == 0)
      // retention never exceeds the cohort size at any offset
      assert(out.join(first, "cohort_month")
        .filter(col("n_customers") > col("size")).count() == 0)
    } finally out.unpersist()
  }
}
