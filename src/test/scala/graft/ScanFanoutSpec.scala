package graft

import org.apache.spark.sql.functions._

/** Pins the r16 starved-scan fanout (Tables.scaled): the test corpora
  * are single-file single-row-group parquet, so every fact scan planned
  * ONE task and the whole scan-stage pipeline ran on one core (guide
  * §2.5's unsplittable-input case). The device fans fact tables out by
  * a deterministic hash of their natural key when — and only when —
  * the planned scan parallelism is under half the session's cores.
  *
  * The suite session runs with spark.graft.scan.fanout=false so the
  * plan pins track query shapes, not the input artifact; this spec
  * toggles the conf per assertion. */
class ScanFanoutSpec extends SparkSpec {

  private def withFanout[A](on: Boolean)(f: => A): A = {
    val prev = spark.conf.getOption("spark.graft.scan.fanout")
    spark.conf.set("spark.graft.scan.fanout", on.toString)
    try f finally prev match {
      case Some(v) => spark.conf.set("spark.graft.scan.fanout", v)
      case None => spark.conf.unset("spark.graft.scan.fanout")
    }
  }

  test("fanout widens a starved fact scan to the session's parallelism") {
    val starved = withFanout(false)(
      Tables.lineitem(spark, sfDir).rdd.getNumPartitions)
    val fanned = withFanout(true)(
      Tables.lineitem(spark, sfDir).rdd.getNumPartitions)
    assert(starved < spark.sparkContext.defaultParallelism / 2 + 1,
      s"fixture no longer starved (starved scan plans $starved tasks) — " +
        "re-check whether the fanout device still has a case")
    assert(fanned == spark.sparkContext.defaultParallelism,
      s"fanout produced $fanned partitions")
  }

  test("fanout is a no-op when the scan is already parallel enough") {
    // a frame whose scan plans >= cores/2 tasks: write the fixture out
    // as many small files and read it back
    val dir = java.nio.file.Files.createTempDirectory("graft_fanout").toString
    try {
      Tables.orders(spark, sfDir).repartition(16).write.parquet(s"$dir/o")
      val read = spark.read.parquet(s"$dir/o")
      val have = read.rdd.getNumPartitions
      assert(have * 2 > spark.sparkContext.defaultParallelism)
      // the device itself (via a fact loader over a healthy layout) —
      // exercised structurally: with enough planned tasks no
      // repartition is inserted, so partitions stay as planned
      val plan = read.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), "bare scan must not exchange")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("fanned-out results are identical to the starved layout's") {
    // order-insensitive equality on a representative aggregate +
    // row-identity on a keyed projection
    val aggOff = withFanout(false)(
      Tables.lineitem(spark, sfDir).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("q"))
        .orderBy("l_returnflag").collect().toSeq)
    val aggOn = withFanout(true)(
      Tables.lineitem(spark, sfDir).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("q"))
        .orderBy("l_returnflag").collect().toSeq)
    assert(aggOff == aggOn)
    val offRows = withFanout(false)(
      Tables.documents(spark, sfDir).select("doc_id", "source")
        .orderBy("doc_id").collect().toSeq)
    val onRows = withFanout(true)(
      Tables.documents(spark, sfDir).select("doc_id", "source")
        .orderBy("doc_id").collect().toSeq)
    assert(offRows == onRows)
  }

  test("predicate pushdown survives the fanout repartition") {
    val plan = withFanout(true) {
      val df = Tables.lineitem(spark, sfDir)
        .filter(col("l_quantity") < 10)
        .select("l_orderkey", "l_quantity")
      df.queryExecution.executedPlan.toString
    }
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(l_quantity"),
      s"filter did not reach the scan:\n$plan")
  }
}
