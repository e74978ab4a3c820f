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

  /** Per-JVM memo of saved corpus band tables, keyed by source dir: the
    * first gate run against a corpus builds + saves the table (the
    * out-of-band refresh, done here because the bench has no separate
    * refresh step); subsequent runs serve straight from the parquet. */
  private val bandTableDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[stream] def corpusBandDir(spark: SparkSession, dir: String,
                                    corpus: DataFrame): String =
    bandTableDirs.computeIfAbsent(dir, _ => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_ndg_bands").toString
      graft.text.TextOps.saveCorpusBandTable(corpus, out)
      out
    })

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

  /** State-store partition count for the bounded driver-gate runs. A
    * stateful query pins its state partitioning to
    * spark.sql.shuffle.partitions at FIRST run; every state store
    * instance then commits a delta file (+ CRC) per micro-batch, so the
    * fixed cost of a bounded 2-3-batch run is
    * partitions × storesPerPartition × batches small-file fsyncs — a
    * stream-stream join keeps FOUR stores per partition, which at the
    * session's 32 shuffle partitions is ~400 file commits per run,
    * pure fsync-bound overhead that a loaded/slow-disk box inflates 3×
    * (the r14 driver sweep's only `regressed` flags, 8.0/8.5 s vs 2.8 s
    * solo, reproduced locally under load). 8 partitions still exercises
    * genuinely partitioned state; at 100 TB the same plans run with
    * partitions sized to the cluster — a per-deployment config, not a
    * plan property (AQE is disabled in stateful streaming, so this knob
    * is always explicit there). */
  private val streamStatePartitions = "8"

  /** Runs a streaming DataFrame to a fresh memory sink with
    * AvailableNow and returns the materialized result table. */
  private def runToTable(spark: SparkSession, streamed: DataFrame,
                         mode: OutputMode = OutputMode.Complete): DataFrame = {
    val id = runId.incrementAndGet()
    val name = s"graft_stream_q_$id"
    // scoped override: the streaming query captures the value at start;
    // restore so batch plans in the same session keep the session width
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val query =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", streamStatePartitions)
        streamed.writeStream.format("memory").queryName(name)
          .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    query.awaitTermination()
    // drop EVERY stale graft_stream_q_* view, not just id-1 (r11 advice:
    // a run that throws between the id increment and sink registration
    // would otherwise leak its predecessor forever, and a caller that
    // builds two stream results before consuming the first would read a
    // dropped view under the old id-1 scheme)
    spark.catalog.listTables().collect()
      .map(_.name)
      .filter(t => t.startsWith("graft_stream_q_") && t != name)
      .foreach(spark.catalog.dropTempView)
    spark.table(name)
  }

  /** Tumbling 1-hour counts/sums through the streaming engine; oracle =
    * q_window_tumbling's SQL. */
  def qStreamTumbling(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, StreamOps.tumbling(eventsStream(spark, dir)))
      .orderBy("hour", "event_type")

  /** MODEL INFERENCE through the streaming engine: per-event compiled
    * expression scoring feeding the tumbling probability monitor
    * ([[StreamOps.scoredTumbling]]); oracle = the identical batch
    * statement over the events table. */
  def qStreamScored(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark, StreamOps.scoredTumbling(eventsStream(spark, dir)))
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

  // ------------------------------------------ append/watermark path (r12)

  /** Stages `df` as one sorted single-part parquet file under `dir`/`sub`
    * and pins the part file's mtime so the file stream source's
    * oldest-first listing order is deterministic across filesystems. */
  private def stageFile(df: DataFrame, dir: String, sub: String,
                        sortCol: String, mtimeMs: Long): Unit = {
    val path = s"$dir/$sub"
    df.coalesce(1).sortWithinPartitions(sortCol).write.parquet(path)
    java.nio.file.Files.list(java.nio.file.Paths.get(path)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.startsWith("part-"))
      .foreach(p => java.nio.file.Files.setLastModifiedTime(
        p, java.nio.file.attribute.FileTime.fromMillis(mtimeMs)))
  }

  /** The APPEND-mode + watermark path — what 100 TB streaming actually
    * runs, now under the DuckDB gate (r12, verdict ask #4). The r11
    * `q_stream_*` keys run Complete mode because a bounded run's
    * watermark can't pass the corpus tail; this key embraces that
    * instead: the events table is staged as two chronological files, the
    * file source replays them as two microbatches (maxFilesPerTrigger=1,
    * mtime-pinned listing order), and AvailableNow's final no-data batch
    * advances the watermark to max(ts) − 1h — verified empirically:
    * 3 batches run, final watermark = ms-floor(max ts) − 1h, and the
    * emitted window set equals the batch answer restricted to closed
    * windows exactly (row-level set equality at sf0.01).
    *
    * Oracle = the batch tumbling SQL restricted to windows the watermark
    * closed: hour + 1h ≤ ms-floor(max ts) − 1h (the ms floor mirrors
    * Spark's millisecond watermark arithmetic). Late windows are HELD
    * BACK, which is the semantic difference from q_stream_tumbling that
    * this key exists to pin.
    *
    * Event time is TIMESTAMP (watermarks reject TIMESTAMP_NTZ); the
    * session runs UTC so wall-clock values match the batch twin, and the
    * output hour is cast back to ntz for driver-compare parity. State is
    * windows × types with eviction below the watermark — bounded, the
    * production contract. The staged copy + checkpoint are per-invocation
    * temp dirs, deleted after the memory sink holds the result. */
  /** Shared staging for the append/watermark keys: the events table cut
    * into two chronological single-part files, replayed as two
    * microbatches (maxFilesPerTrigger=1, mtime-pinned listing order),
    * handed to `f` as a streaming source; the staged copy is deleted
    * after `f` returns a fully-materialized result. */
  private def withStagedEventStream(spark: SparkSession, dir: String)
                                   (f: DataFrame => DataFrame): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val mm = ev.agg(min("ts"), max("ts")).head()
    val (tMin, tMax) = (mm.getAs[java.sql.Timestamp](0).toLocalDateTime,
      mm.getAs[java.sql.Timestamp](1).toLocalDateTime)
    val cut = tMin.plusSeconds(java.time.Duration.between(tMin, tMax).getSeconds / 2)
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_append").toString
    try {
      stageFile(ev.filter(col("ts") < lit(cut.toString).cast("timestamp")),
        stage, "f0", "ts", 1000000L)
      stageFile(ev.filter(col("ts") >= lit(cut.toString).cast("timestamp")),
        stage, "f1", "ts", 2000000L)
      f(spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$stage/f*/part-*.parquet"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  def qStreamAppend(spark: SparkSession, dir: String): DataFrame =
    withStagedEventStream(spark, dir) { src =>
      runToTable(spark, StreamOps.tumbling(src, watermark = Some("1 hour")),
        OutputMode.Append)
        .select(col("hour").cast("timestamp_ntz").as("hour"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("hour", "event_type")
    }

  /** The SECOND append+watermark shape (r15, verdict ask #4): SLIDING
    * 1h/30min windows in APPEND mode over the same two-microbatch
    * staged replay — a window emits exactly once, when the watermark
    * passes its END (wstart + 1h), so overlapping windows close in
    * stride order and the tail windows the watermark cannot prove
    * complete are withheld. Oracle = the batch sliding SQL restricted
    * to closed windows: wstart + 1h ≤ ms-floor(max ts) − 1h (the
    * q_stream_append restriction device). */
  def qStreamAppendSliding(spark: SparkSession, dir: String): DataFrame =
    withStagedEventStream(spark, dir) { src =>
      runToTable(spark, StreamOps.sliding(src, watermark = Some("1 hour")),
        OutputMode.Append)
        .select(col("wstart").cast("timestamp_ntz").as("wstart"), col("n"))
        .orderBy("wstart")
    }

  /** Stream-STREAM banded join on the driver gate (r12): the
    * [[StreamOps.streamStreamJoin]] operator — clicks and purchases as
    * two independent file streams, inner-joined on user_id within a
    * [click, click + 30 min] event-time band, watermarks bounding both
    * sides' state — run end-to-end by the streaming engine and oracled
    * by the equivalent batch range join in DuckDB. Both staged sides are
    * fully available to the single AvailableNow microbatch, so the
    * watermark (which only advances BETWEEN batches) can't late-drop any
    * row and the emitted set is exactly the batch join — the completeness
    * argument, pinned by the oracle. Event ids are carried so output
    * rows are unique. At 100 TB the same plan runs continuously with
    * state eviction below the watermark — the bounded-state contract is
    * the watermark lines, already proven in StreamOpsSpec with genuinely
    * late rows. */
  def qStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_join").toString
    try {
      stageFile(ev.filter(col("event_type") === "click"), stage, "clicks", "ts", 1000000L)
      stageFile(ev.filter(col("event_type") === "purchase"), stage, "purchases", "ts", 1000000L)
      def src(sub: String) = spark.readStream.schema(ev.schema)
        .parquet(s"$stage/$sub/part-*.parquet")
      runToTable(spark,
        StreamOps.streamStreamJoin(src("clicks"), src("purchases"),
          carry = Seq("event_id")),
        OutputMode.Append)
        .select(col("user_id"),
          col("click_event_id").as("click_id"),
          col("purchase_event_id").as("purchase_id"),
          col("click_ts").cast("timestamp_ntz").as("click_ts"),
          col("purchase_ts").cast("timestamp_ntz").as("purchase_ts"),
          col("click_value"), col("purchase_value"))
        .orderBy("user_id", "click_id", "purchase_id")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  /** LEFT OUTER stream-stream join on the driver gate: the null-side
    * emission path — unmatched clicks surface ONLY when the watermark
    * proves no purchase can still arrive (state eviction below
    * click_ts + 30 min), the semantics that separate a streaming outer
    * join from its batch twin. Both staged sides land in one
    * AvailableNow microbatch (matches emit there); the final no-data
    * batch advances the global watermark to
    * ms-floor(min(max click ts, max purchase ts)) − 10 min and flushes
    * the evictable unmatched clicks as null rows. Clicks inside the
    * final watermark horizon stay withheld — exactly what a live
    * stream would do — so the oracle is the batch LEFT join RESTRICTED
    * to matched rows plus unmatched clicks with
    * click_ts + 30 min < final watermark (the q_stream_append
    * restriction device, interval arithmetic included). */
  def qStreamJoinOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_joino").toString
    try {
      stageFile(ev.filter(col("event_type") === "click"), stage, "clicks", "ts", 1000000L)
      stageFile(ev.filter(col("event_type") === "purchase"), stage, "purchases", "ts", 1000000L)
      def src(sub: String) = spark.readStream.schema(ev.schema)
        .parquet(s"$stage/$sub/part-*.parquet")
      runToTable(spark,
        StreamOps.streamStreamJoin(src("clicks"), src("purchases"),
          carry = Seq("event_id"), joinType = "leftOuter"),
        OutputMode.Append)
        .select(col("user_id"),
          col("click_event_id").as("click_id"),
          col("purchase_event_id").as("purchase_id"),
          col("click_ts").cast("timestamp_ntz").as("click_ts"),
          col("purchase_ts").cast("timestamp_ntz").as("purchase_ts"),
          col("click_value"), col("purchase_value"))
        .orderBy("user_id", "click_id", "purchase_id")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  /** Stream-static incremental dedup on the driver gate (r12): the
    * [[StreamOps.incrementalDedupStream]] operator — new documents
    * stream in, in-stream duplicate digests collapse within the
    * watermark, and a STATIC corpus digest table anti-joins the rest —
    * run end-to-end by the streaming engine and oracled by the batch
    * twin's SQL verbatim (q_dedup_incremental: same eval-fraction
    * new/corpus split, same md5 digests, keep = min doc_id per digest).
    *
    * Determinism device for "first seen = min doc_id": the new docs are
    * staged sorted by doc_id in ONE parquet part file, so the single map
    * partition feeds each state-store partition its rows in doc_id order
    * and the dedup state keeps exactly the min-id row per digest —
    * arrival order is the stream's tie-break, made reproducible by
    * construction (a real ingest's arrival order is its own truth).
    * Event time is a doc_id-derived timestamp: the dedup needs a
    * watermark column for state GC; its value only bounds state life. */
  def qStreamDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val isNew = graft.text.Sampling.inSample(col("doc_id"),
      graft.text.TextOps.decontamEvalFraction)
    val corpusDigests = docs.filter(!isNew)
      .select(md5(col("text")).as("h")).distinct()
    val newDocs = docs.filter(isNew)
      .select(col("doc_id"), col("text"),
        timestamp_seconds(col("doc_id")).as("ts"))
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_dedup").toString
    try {
      stageFile(newDocs, stage, "f0", "doc_id", 1000000L)
      val src = spark.readStream.schema(newDocs.schema)
        .parquet(s"$stage/f0/part-*.parquet")
      runToTable(spark,
        StreamOps.incrementalDedupStream(src, corpusDigests)
          .select(col("doc_id"), md5(col("text")).as("h")),
        OutputMode.Append)
        .orderBy("doc_id")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  /** Stream-static NEAR-dup ingest gate on the driver oracle (r15):
    * [[StreamOps.nearDupGateStream]] — new documents (the eval-fraction
    * split, the q_stream_dedup_incremental convention) stream in,
    * compute row-local MinHash band keys, equi-join the STATIC corpus
    * band table, and emit exact-Jaccard-verified near-dup pairs — the
    * online dedup decision a production ingest makes BEFORE a document
    * enters the corpus. Oracle = the equivalent batch band join over
    * uncapped shingles restricted to (new × corpus) pairs; the staged
    * single-part doc_id-sorted input makes the bounded run reproducible
    * (all rows in one microbatch — the watermark can't late-drop). */
  def qStreamDedupNearDup(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
    val isNew = graft.text.Sampling.inSample(col("doc_id"),
      graft.text.TextOps.decontamEvalFraction)
    val corpus = docs.filter(!isNew)
    // The CAPPED corpus band table (TextOps.corpusBandTable) is built +
    // SAVED once per (corpus, JVM) and every run serves from the loaded
    // parquet (r16, verdict ask #3): production refreshes the table
    // out-of-band on corpus updates, so the signature pass over the
    // corpus is paid per refresh, not per ingest query — and the bench
    // key now measures the SERVING shape (load + stream join), the same
    // split as the persisted IVF/PQ index keys. Loaded ≡ inline is
    // pinned in StreamOpsSpec.
    val corpusBands = graft.text.TextOps.loadCorpusBandTable(
      spark, StreamQueries.corpusBandDir(spark, dir, corpus))
    val corpusText = corpus
      .select(col("doc_id").as("corpus_id"), col("text").as("corpus_text"))
    val newDocs = docs.filter(isNew)
      .select(col("doc_id"), col("text"),
        timestamp_seconds(col("doc_id")).as("ts"))
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_ndg").toString
    try {
      stageFile(newDocs, stage, "f0", "doc_id", 1000000L)
      val src = spark.readStream.schema(newDocs.schema)
        .parquet(s"$stage/f0/part-*.parquet")
      runToTable(spark,
        StreamOps.nearDupGateStream(src, corpusBands, corpusText),
        OutputMode.Append)
        .orderBy("doc_id", "corpus_id")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  /** Events as the exact-arithmetic stateful-op input: epoch-µs longs
    * and cents BIGINT (the [[StreamOps.SessEvent]] shape), so a group's
    * fold order cannot wiggle any output. */
  private def sessEvents(spark: SparkSession, dir: String) = {
    import spark.implicits._
    eventsStream(spark, dir).select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts").cast("timestamp")).as("ts_us"),
      round(col("value") * 100).cast("long").as("cents"))
      .as[StreamOps.SessEvent]
  }

  /** Exact cents → value reconstruction. Callers cast the OUTPUT cell to
    * double — the internal DECIMAL keeps the division exact; a physical
    * Decimal in the dumped parquet hash-mismatches the oracle's float64
    * bridge even when values are identical (r12 driver red). */
  private def centsAsValue(cents: org.apache.spark.sql.Column) =
    (cents.cast("decimal(18,0)") / 100)
      .cast(org.apache.spark.sql.types.DecimalType(18, 2))

  /** q_stream_sessionize — the custom flatMapGroupsWithState session
    * STATE MACHINE run by the streaming engine (keyed state store,
    * encoder round-trip, Append emission of closed sessions), under the
    * batch q_sessionize oracle verbatim. The built-in session_window
    * key (q_stream_session) proves the engine's session MERGE; this key
    * proves the CUSTOM-STATE path a production pipeline reaches for
    * when session logic outgrows a gap parameter (carts, funnels,
    * fraud windows). Bounded-gate mode flushes the open tail at end of
    * input; the cross-batch stitch itself is pinned in StreamOpsSpec on
    * a two-batch MemoryStream. */
  def qStreamSessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = graft.rel.TimeSeries.sessionGapHours * 3600L * 1000000L
    runToTable(spark,
      StreamOps.sessionizeStateful(sessEvents(spark, dir), gapUs).toDF(),
      OutputMode.Append)
      .select(col("user_id"), col("session_idx"),
        timestamp_micros(col("start_us")).cast("timestamp_ntz").as("session_start"),
        timestamp_micros(col("end_us")).cast("timestamp_ntz").as("session_end"),
        (col("end_us") - col("start_us")).as("duration_us"),
        col("n_events"),
        centsAsValue(col("sum_cents")).cast("double").as("sum_value"))
      .orderBy("user_id", "session_idx")
  }

  /** q_stream_counters — running per-user totals through the
    * flatMapGroupsWithState UPDATE path (each micro-batch emits the
    * refreshed snapshot; the memory sink holds one row per user for a
    * bounded run): the exact-cents twin of StreamOps.runningCounters,
    * oracled by the plain batch GROUP BY. */
  def qStreamCounters(spark: SparkSession, dir: String): DataFrame =
    runToTable(spark,
      StreamOps.countersStateful(sessEvents(spark, dir)).toDF(),
      OutputMode.Update)
      .select(col("user_id"), col("n_events"),
        centsAsValue(col("sum_cents")).cast("double").as("sum_value"))
      .orderBy("user_id")
}
