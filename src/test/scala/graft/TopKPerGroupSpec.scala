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
}
