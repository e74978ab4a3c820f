package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: physical-plan audit over every registered query — the
  * "would this survive 100×" review (SURVEY.md §4.2) as a runnable
  * check instead of a one-off. Prints per query: number of exchanges
  * (shuffles), broadcast joins, whole-stage-codegen spans, and flags
  * cartesian/broadcast-nested-loop joins (expected only where a query
  * is intentionally a bounded cross product). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // bounded-by-design cross products (small broadcast side)
    val expectedCross = Set("q_cosine_topk", "q_dedup_embedding", "q_minmax_scale")

    println(f"${"query"}%-22s ${"exch"}%5s ${"bcast"}%5s ${"wscg"}%5s  flags")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // collect() runs THIS queryExecution so AQE finalizes it
        // (count()/foreach wrap a different plan and leave it initial)
        df.collect()
        val full = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // AQE formatted explain appends the pre-adaptive Initial Plan;
        // audit only the final executed tree
        val plan = full.split("== Initial Plan ==").head
        val exch = """\(\d+\) Exchange""".r.findAllIn(plan).length
        val bcast = """\(\d+\) BroadcastHashJoin""".r.findAllIn(plan).length
        val wscg = """codegen id : (\d+)""".r.findAllMatchIn(plan)
          .map(_.group(1)).toSeq.distinct.length
        val cross = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        val flag =
          if (cross && !expectedCross.contains(name)) "UNEXPECTED-CROSS"
          else if (cross) "cross(by-design)"
          else ""
        println(f"$name%-22s $exch%5d $bcast%5d $wscg%5d  $flag")
      } catch {
        case e: Throwable => println(f"$name%-22s ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
