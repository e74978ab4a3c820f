package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator extension demo (SURVEY.md §4.2 tier (c)): top-k rows
  * per group as a first-class operator — logical node + planner
  * strategy + physical exec.
  *
  * Spark's idiomatic form (`row_number().over(partitionBy(g).orderBy(o))
  * .filter(rn <= k)`, used by RelQueries.topkPerGroup) fully sorts every
  * group before discarding all but k rows. This operator keeps a bounded
  * heap of k rows per group instead: O(n log k) time and O(groups × k)
  * memory per partition, no sort buffer, no rank column materialized.
  * At 100 TB with small k this is the difference between spilling a full
  * sort and never spilling at all.
  *
  * The physical exec declares ClusteredDistribution on the group keys,
  * so Catalyst inserts exactly one hash shuffle — the same exchange the
  * window form needs — and AQE still coalesces/splits it.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  // Row-set is filtered, never re-keyed: the child's hash partitioning on
  // the group keys still holds, so declare it and let a downstream
  // window/agg over the same keys reuse the exchange instead of adding a
  // second one (the default is UnknownPartitioning). No outputOrdering:
  // the heap drain orders rows within a group, not across groups.
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val gExprs = groupExprs
    val sOrder = order
    val kk = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(gExprs, schema)
      val rowProj = UnsafeProjection.create(schema, schema)
      val ordering = RowOrdering.create(sOrder, schema)
      // heap head = worst kept row (reverse ordering), evicted past k
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk + 1, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(rowProj(row).copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(rowProj(row).copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
      heaps.values.forEach { h =>
        val rows = new Array[UnsafeRow](h.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = h.poll(); i -= 1 } // drain -> rank order
        out ++= rows
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  private def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy

  /** Top-k rows per group; `orderSpec` is (column, ascending) pairs and
    * should form a total order for deterministic output (same contract
    * as the window form). Expressions are built directly against the
    * analyzed child's attributes, so the custom node enters the planner
    * fully resolved. */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val plan = TopKPerGroup(
      groupCols.map(attr),
      orderSpec.map { case (n, asc) =>
        SortOrder(attr(n), if (asc) Ascending else Descending) },
      k,
      analyzed)
    ColumnBridge.ofRows(spark, plan)
  }
}
