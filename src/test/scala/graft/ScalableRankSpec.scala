package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.rel.ScalableRank

/** The range-bucketed rank device must be BIT-IDENTICAL to the naive
  * unpartitioned window it replaces (q_gini/q_rfm/q_quantile_normalize/
  * q_nn_match/q_propensity_strata/q_gains_curve all keep their oracle
  * SQL unchanged) — so every property here is exact equality against
  * `row_number()/ntile()` over `Window.orderBy(...)`, across tie-heavy
  * data, descending orders, bucket granularities, and the N < n edge. */
class ScalableRankSpec extends SparkSpec {
  import spark.implicits._

  // tie-heavy frame: 997 rows over only 40 distinct values, so bucket
  // boundaries are guaranteed to land ON tie groups
  private lazy val tied = spark.range(997)
    .select($"id", (pmod(hash($"id"), lit(40)) * 3).cast("long").as("v"))
    .localCheckpoint(true)

  test("rangeRowNumber ≡ naive global row_number (ascending, heavy ties)") {
    for (buckets <- Seq(2, 7, 64, 256)) {
      val got = ScalableRank.rangeRowNumber(tied, $"v", Seq($"v", $"id"), "rn",
          buckets = buckets)
        .select($"id", $"rn").as[(Long, Long)].collect().toMap
      val want = tied.withColumn("rn",
          row_number().over(Window.orderBy($"v", $"id")).cast("long"))
        .select($"id", $"rn").as[(Long, Long)].collect().toMap
      assert(got == want, s"buckets=$buckets")
    }
  }

  test("rangeRowNumber ≡ naive row_number under a DESC primary order") {
    val got = ScalableRank.rangeRowNumber(tied, -$"v", Seq($"v".desc, $"id"), "rn")
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    val want = tied.withColumn("rn",
        row_number().over(Window.orderBy($"v".desc, $"id")).cast("long"))
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("rangeNtile ≡ naive ntile for several tile counts (incl. uneven splits)") {
    for (n <- Seq(2, 5, 10, 13)) {
      val got = ScalableRank.rangeNtile(tied, $"v", Seq($"v", $"id"), n, "t",
          buckets = 16)
        .select($"id", $"t").as[(Long, Int)].collect().toMap
      val want = tied.withColumn("t",
          ntile(n).over(Window.orderBy($"v", $"id")))
        .select($"id", $"t").as[(Long, Int)].collect().toMap
      assert(got == want, s"ntile($n)")
    }
  }

  test("rangeNtile N < n edge: each row its own tile, no div-by-zero") {
    val tiny = spark.range(3).select($"id", ($"id" * 10).as("v"))
    val got = ScalableRank.rangeNtile(tiny, $"v", Seq($"v", $"id"), 7, "t")
      .select($"id", $"t").as[(Long, Int)].collect().toMap
    val want = tiny.withColumn("t", ntile(7).over(Window.orderBy($"v", $"id")))
      .select($"id", $"t").as[(Long, Int)].collect().toMap
    assert(got == want)
  }

  test("output is partitioning-invariant (the shufflePositions contract)") {
    val a = ScalableRank.rangeRowNumber(tied, $"v", Seq($"v", $"id"), "rn")
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    val b = ScalableRank.rangeRowNumber(tied.repartition(13), $"v",
        Seq($"v", $"id"), "rn")
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("all-equal keys degenerate to one bucket but stay exact") {
    val const = spark.range(100).select($"id", lit(5L).as("v"))
    val got = ScalableRank.rangeRowNumber(const, $"v", Seq($"v", $"id"), "rn")
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    assert(got == (0L until 100L).map(i => i -> (i + 1)).toMap)
  }

  test("reserved column names are refused, not clobbered") {
    val bad = spark.range(5).select($"id", lit(1L).as("__rb"))
    intercept[IllegalArgumentException] {
      ScalableRank.rangeRowNumber(bad, $"id", Seq($"id"), "rn")
    }
    intercept[IllegalArgumentException] {
      ScalableRank.rangeRowNumber(spark.range(5).toDF(), $"id", Seq($"id"), "id")
    }
  }
}
