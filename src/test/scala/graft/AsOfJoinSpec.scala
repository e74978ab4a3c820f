package graft

import java.sql.Timestamp

import graft.plans.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of picks the latest build row at or before probe time") {
    val probe = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")),
      (4L, 30L, ts("2024-01-01 09:00:00"))  // key with no build rows
    ).toDF("event_id", "k", "t")
    val build = Seq(
      (10L, ts("2024-01-01 09:30:00"), 100L),
      (10L, ts("2024-01-01 11:00:00"), 101L),
      (20L, ts("2024-01-01 09:00:00"), 200L)  // exactly equal ts -> match
    ).toDF("k", "bt", "payload")

    val out = AsOfJoin.backward(probe, build, "k", "k", "t", "bt")
      .select("event_id", "payload").as[(Long, Long)].collect().toMap

    assert(out == Map(1L -> 100L, 2L -> 101L, 3L -> 200L))
    // event 4: no build rows for key 30 -> dropped (inner as-of)
  }

  test("tolerance drops matches older than the window") {
    val probe = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 18:00:00"))   // 7h after the last build row
    ).toDF("event_id", "k", "t")
    val build = Seq((10L, ts("2024-01-01 09:30:00"), 100L)).toDF("k", "bt", "payload")
    val out = AsOfJoin.backward(probe, build, "k", "k", "t", "bt",
      tolerance = Some("1 HOUR"))
      .select("event_id").as[Long].collect().toSet
    assert(out == Set(1L)) // event 2's only match is 7h stale -> dropped
  }

  test("all payload fields come from the same build row, even with nulls") {
    // Latest build row has a NULL in one payload column; per-column
    // last(ignoreNulls) fills would mix it with the older row's value.
    val probe = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("event_id", "k", "t")
    val build = Seq(
      (10L, ts("2024-01-01 09:00:00"), Option(100L), Option("old")),
      (10L, ts("2024-01-01 11:00:00"), Option.empty[Long], Option("new"))
    ).toDF("k", "bt", "v1", "v2")
    val out = AsOfJoin.backward(probe, build, "k", "k", "t", "bt")
      .select("v1", "v2").as[(Option[Long], String)].head()
    assert(out == (None, "new"), s"payload mixed across build rows: $out")
  }

  test("build rows with NULL time never match") {
    // nulls sort first in the window order, so an unfiltered null-time
    // build row acts as a -infinity match (pandas merge_asof drops it)
    val probe = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "k", "t")
    val build = Seq(
      (10L, Option.empty[Timestamp], 666L),
      (10L, Option(ts("2024-01-01 09:00:00")), 100L)
    ).toDF("k", "bt", "payload")
    val out = AsOfJoin.backward(probe, build, "k", "k", "t", "bt")
      .select("payload").as[Long].collect().toSeq
    assert(out == Seq(100L), s"null-time build row leaked: $out")

    // with ONLY a null-time build row, the probe has no match at all
    val buildNullOnly = Seq((10L, Option.empty[Timestamp], 666L)).toDF("k", "bt", "payload")
    assert(AsOfJoin.backward(probe, buildNullOnly, "k", "k", "t", "bt").isEmpty)
  }

  test("as-of is deterministic when build is unique per (key, time)") {
    val probe = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "k", "t")
    val build = Seq(
      (1L, ts("2024-01-01 08:00:00"), 7L),
      (1L, ts("2024-01-01 09:00:00"), 8L)).toDF("k", "bt", "payload")
    val got = (1 to 3).map(_ =>
      AsOfJoin.backward(probe, build, "k", "k", "t", "bt")
        .select("payload").as[Long].head())
    assert(got.forall(_ == 8L))
  }
}
