package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

import graft.plans.BucketedTables
import graft.rel.RelQueries

/** Storage bucketing (q_join_bucketed): the point of the key is WHERE
  * the shuffle happens, so the spec checks the plan, not just the rows —
  * the SortMergeJoin over the two bucketed tables must have ZERO shuffle
  * exchanges anywhere below it (both sides stream straight from the
  * bucketed parquet scans), while the same join over plain parquet
  * shuffles both sides. Row-level correctness is the DuckDB oracle's
  * job (bucketing must not change results). */
class BucketedJoinSpec extends SparkSpec {

  private def smjSubtrees(p: SparkPlan): Seq[SparkPlan] =
    PlanAudit.nodes(p).collect { case j: SortMergeJoinExec => j }

  test("bucketed fact-fact join has no exchange below the SortMergeJoin") {
    val plan = PlanAudit.executedPlan(RelQueries.joinBucketed(spark, sfDir))
    val joins = smjSubtrees(plan)
    assert(joins.nonEmpty, s"expected a SortMergeJoin, got:\n$plan")
    for (j <- joins) {
      val below = j.children.flatMap(PlanAudit.nodes)
      assert(!below.exists(_.isInstanceOf[ShuffleExchangeLike]),
        s"shuffle below the bucketed join:\n$j")
    }
  }

  test("the same merge join over plain parquet DOES shuffle both sides") {
    import org.apache.spark.sql.functions._
    val plain = Tables.lineitem(spark, sfDir).hint("merge")
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val plan = PlanAudit.executedPlan(plain)
    val joins = smjSubtrees(plan)
    assert(joins.nonEmpty, s"expected a SortMergeJoin, got:\n$plan")
    val below = joins.head.children.flatMap(PlanAudit.nodes)
    assert(below.count(_.isInstanceOf[ShuffleExchangeLike]) == 2,
      s"expected both sides shuffled in the unbucketed control:\n${joins.head}")
  }

  test("bucketed tables are built once and reused across calls") {
    val (li, ord) = BucketedTables.ensure(spark, sfDir)
    val t0 = spark.table(li).inputFiles.toSeq.sorted
    BucketedTables.ensure(spark, sfDir) // second call must be a no-op
    assert(spark.table(li).inputFiles.toSeq.sorted == t0)
    assert(spark.catalog.tableExists(ord))
  }
}
