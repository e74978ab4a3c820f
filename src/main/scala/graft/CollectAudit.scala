package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{CollectLimitExec, QueryExecution, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Bounded-collect audit (r14 verdict ask #6): the engine's driver
  * collects are all CONTROL-PLANE by design — percentile cuts,
  * hot-bucket ids ≤ N/cap, ≤16-row guards, model weights, ≤256 cut
  * literals — and this turns that claim into a measured gate. Every
  * collect-class Dataset action that completes while a key is current
  * records the rows it delivered to the driver; the bench fails on any
  * key whose largest collect exceeds the cap (default 10⁴ rows), the
  * same whitelist pattern as PlanAudit's cross/gwin gates.
  *
  * Attribution: events arrive on the shared listener-bus thread, so
  * [[advanceTo]] DRAINS the bus (via the graftbridge) before moving the
  * current-key marker.
  */
final class CollectAudit(spark: SparkSession) {

  private val collectFuncs = Set("collect", "collectAsList", "collectToPython",
    "collectAsArrowToPython", "head", "take", "first", "isEmpty",
    "toLocalIterator", "count")

  private val currentKey = new AtomicReference[String]("__init__")
  private val maxRows = new ConcurrentHashMap[String, Long]()

  /** Rows a completed plan delivered to the driver: the topmost
    * numOutputRows metric (summed across union branches), capped by a
    * root CollectLimit/TakeOrdered limit (a head(1) must read as ≤1 row
    * however large the frame below it), descending through AQE wrappers. */
  private[graft] def deliveredRows(p: SparkPlan): Long = p match {
    case a: AdaptiveSparkPlanExec => deliveredRows(a.executedPlan)
    case c: CollectLimitExec => math.min(c.limit.toLong, deliveredRows(c.child))
    case t: TakeOrderedAndProjectExec => math.min(t.limit.toLong, deliveredRows(t.child))
    case _ => p.metrics.get("numOutputRows").map(_.value)
      .getOrElse(p.children.map(deliveredRows).sum)
  }

  spark.listenerManager.register(new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      if (collectFuncs.contains(funcName)) {
        val rows = try deliveredRows(qe.executedPlan) catch { case _: Throwable => 0L }
        maxRows.merge(currentKey.get(), rows, (a, b) => math.max(a, b))
      }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()
  })

  private val drainTimeoutKeys = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Drains in-flight listener events (they belong to the PREVIOUS
    * key), then makes `key` the attribution target. A drain that times
    * out (5 s) is RECORDED against the outgoing key (r15 advice): its
    * straggler events will attribute to `key` instead, so a violation
    * raised on a key adjacent to a timed-out drain is suspect — the
    * artifact's drain_timeouts list makes that auditable rather than
    * silent. */
  def advanceTo(key: String): Unit = {
    val drained = org.apache.spark.sql.graftbridge.ListenerBridge
      .flushListenerBus(spark.sparkContext, 5000)
    if (!drained) drainTimeoutKeys.add(currentKey.get())
    currentKey.set(key)
  }

  /** Keys whose OUTGOING drain timed out — events recorded under the
    * key that FOLLOWED each of these may really belong to it. */
  def drainTimeouts(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    drainTimeoutKeys.iterator().asScala.toSeq.distinct
  }

  /** Final drain + snapshot: key → max rows any single collect of that
    * key delivered to the driver (marker keys excluded). */
  def snapshot(): Map[String, Long] = {
    advanceTo("__done__")
    import scala.jdk.CollectionConverters._
    maxRows.asScala.toMap - "__init__" - "__done__"
  }
}
