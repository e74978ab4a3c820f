package graft

import org.apache.spark.sql.functions._

import graft.plans.TopK
import graft.rel.RelQueries

/** The custom bounded-heap operator must agree exactly with the
  * window-rank formulation it replaces, and plan with a single hash
  * exchange (its declared ClusteredDistribution). */
class TopKPerGroupSpec extends SparkSpec {

  test("custom TopKPerGroup == window-rank top-3 per customer") {
    val orders = Tables.orders(spark, sfDir)
    val custom = TopK.perGroup(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val viaWindow = RelQueries.topkPerGroupWindow(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    assert(custom.count() == viaWindow.count())
    assert(custom.except(viaWindow).isEmpty && viaWindow.except(custom).isEmpty)
  }

  test("TopKPerGroup plans one exchange, no Window, no Sort buffer") {
    val orders = Tables.orders(spark, sfDir)
    val df = TopK.perGroup(orders, Seq("o_custkey"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    df.collect()
    // audit only the AQE final plan, not the appended initial plan
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("TopKPerGroup"), plan.take(500))
    assert(!plan.contains("Window"), "should not fall back to a window")
    assert("Exchange".r.findAllIn(plan).length == 1, plan.take(800))
  }

  test("k larger than any group returns all rows") {
    val orders = Tables.orders(spark, sfDir)
    val df = TopK.perGroup(orders, Seq("o_custkey"),
      Seq(("o_orderkey", true)), 1000000)
    assert(df.count() == orders.count())
  }

  test("spill path: many groups over a tight maxGroups matches the in-memory result") {
    import spark.implicits._
    // 20k groups x 4 rows against maxGroups=64: every partition is forced
    // through dozens of sorted-segment spills + the k-way merge
    val wide = (0 until 80000).map(i => (i % 20000, i / 20000, s"payload_$i"))
      .toDF("g", "v", "payload")
    val spilled = TopK.perGroup(wide, Seq("g"), Seq(("v", false)), 2, maxGroups = 64)
    val inMem = TopK.perGroup(wide, Seq("g"), Seq(("v", false)), 2)
    assert(spilled.count() == 40000L)
    assert(spilled.except(inMem).isEmpty && inMem.except(spilled).isEmpty)

    // the spill path must actually have run: read the exec's SQL metric
    // (PlanAudit.nodes descends into AQE query stages)
    val execs = PlanAudit.nodes(PlanAudit.executedPlan(spilled))
      .collect { case t: graft.plans.TopKPerGroupExec => t }
    assert(execs.nonEmpty, "TopKPerGroupExec not found in executed plan")
    assert(execs.head.metrics("numSpills").value > 0, "spill path never triggered")
  }

  test("spill path: ties and duplicate rows survive the merge identically") {
    import spark.implicits._
    // duplicate (g, v) rows: the heap keeps SOME k of the tied rows; with
    // full-row payload equality the surviving multiset must still match
    val dup = (0 until 30000).map(i => (i % 5000, i % 3)).toDF("g", "v")
    val spilled = TopK.perGroup(dup, Seq("g"), Seq(("v", true)), 2, maxGroups = 32)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val inMem = TopK.perGroup(dup, Seq("g"), Seq(("v", true)), 2)
      .groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(spilled.except(inMem).isEmpty && inMem.except(spilled).isEmpty)
  }
}
