package graft.stream

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Driver-oracled Structured Streaming (r11): the streaming window
  * operators executed by the REAL streaming engine — file source over
  * the events parquet, `Trigger.AvailableNow`, memory sink — surfaced as
  * ordinary `SparkEntry.queries` entries whose oracle SQL is the SAME
  * statement as the batch twins (`q_window_tumbling` / `q_window_sliding`
  * / `q_window_session`). Until now streaming was covered only by
  * ScalaTest (StreamOpsSpec fixtures + StreamBatchEquivSpec on real
  * data); these keys put the streaming EXECUTION PATH itself under the
  * DuckDB gate: stateful aggregation, window assignment and session
  * merge must reproduce the batch answer bit-for-bit or CORRECTNESS
  * goes red.
  *
  * Complete output mode, deliberately: with a bounded AvailableNow run
  * there is no follow-on data to push a watermark past the final
  * windows, so append mode would permanently hold back every window
  * intersecting the corpus tail; complete mode emits the full final
  * state instead. State is windows × types (thousands of rows at any
  * test SF) — the memory sink holds the RESULT, never the input. At
  * 100 TB the same plans run in append mode with a watermark because a
  * real stream keeps moving (the shape proven in StreamOpsSpec); the
  * aggregation state layout — keyed by (window, type) / (user, session)
  * across the state store — is identical either way.
  *
  * Each run gets a fresh memory-sink name (reps must not read a stale
  * table), and the previous rep's sink table is dropped to keep a bench
  * sweep from accumulating result copies in the driver. */
object StreamQueries {

  private val runId = new AtomicLong(0)

  /** Streaming twin of [[graft.Tables.events]]: same source file, same
    * ns/µs normalization (file-source schema comes from a batch peek at
    * the same path — the dtype branch stays in sync by construction). */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // the file stream source wants a directory or a glob, not a bare
    // file — a one-character class turns the path into a glob matching
    // exactly that file (works for single-file testdata AND would list a
    // directory of parts if the layout ever changes to one)
    val raw = spark.readStream.schema(schema).parquet(s"$dir/events.parque[t]")
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }

  /** Runs a streaming DataFrame to a fresh memory sink with
    * AvailableNow and returns the materialized result table. */
  private def runToTable(spark: SparkSession, streamed: DataFrame): DataFrame = {
    val id = runId.incrementAndGet()
    val name = s"graft_stream_q_$id"
    val query = streamed.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    val prev = s"graft_stream_q_${id - 1}"
    if (spark.catalog.tableExists(prev)) spark.catalog.dropTempView(prev)
    spark.table(name)
  }

  /** Tumbling 1-hour counts/sums through the streaming engine; oracle =
    * q_window_tumbling's SQL. */
  def qStreamTumbling(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, StreamOps.tumbling(eventsStream(spark, dir)))
      .orderBy("hour", "event_type")

  /** Sliding 1h/30min counts through the streaming engine; oracle =
    * q_window_sliding's SQL. */
  def qStreamSliding(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, StreamOps.sliding(eventsStream(spark, dir)))
      .orderBy("wstart")

  /** 30-minute-gap session windows per user through the streaming
    * engine's session-merge state; oracle = q_window_session's SQL. */
  def qStreamSession(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, StreamOps.sessions(eventsStream(spark, dir)))
      .orderBy("user_id", "session_start")
}
