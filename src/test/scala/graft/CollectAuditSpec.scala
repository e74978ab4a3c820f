package graft

import org.apache.spark.sql.functions._

/** Pins the bounded-collect audit's measurement semantics: a full
  * collect records its true row count, a head() reads as its limit (not
  * the frame size below it), and attribution follows the current-key
  * marker across the listener-bus drain. */
class CollectAuditSpec extends SparkSpec {

  test("collect audit records delivered rows per key, limits capped") {
    val audit = new CollectAudit(spark)

    audit.advanceTo("k_big_collect")
    val n = spark.range(5000).select(col("id"), (col("id") * 2).as("v"))
      .collect().length
    assert(n == 5000)

    audit.advanceTo("k_head")
    // head(1) over the same 5000-row frame must read as <= 1 row:
    // CollectLimit caps whatever numOutputRows sits below it
    spark.range(5000).select(col("id")).head(1)

    audit.advanceTo("k_agg_head")
    // the engine's canonical control-plane shape: one-row aggregate
    spark.range(5000).agg(sum(col("id"))).head()

    val snap = audit.snapshot()
    assert(snap.getOrElse("k_big_collect", 0L) == 5000L,
      s"full collect misread: $snap")
    assert(snap.getOrElse("k_head", Long.MaxValue) <= 1L,
      s"head(1) not capped by its limit: $snap")
    assert(snap.getOrElse("k_agg_head", Long.MaxValue) <= 1L,
      s"one-row aggregate head misread: $snap")
  }
}
