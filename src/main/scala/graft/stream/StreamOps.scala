package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming operators over the events shape
  * (ts, user_id, event_type, value) — SURVEY.md §2.B streaming rows.
  *
  * The reference is batch-only [H]; these are the streaming duals of the
  * batch window queries in graft.rel.RelQueries (windowTumbling /
  * windowSliding / windowSession). Each function takes ANY events-shaped
  * DataFrame — batch or streaming — and applies the identical logical
  * plan, which is what makes the batch queries usable as oracles for the
  * streaming ones (asserted in StreamOpsSpec with MemoryStream).
  *
  * Scale: all state is keyed (window × type, or user_id), so the state
  * store partitions by key across executors; watermarks bound state
  * growth — without them a 100 TB stream accumulates windows forever.
  */
object StreamOps {

  /** Tumbling 1-hour counts/sums; on a stream add a watermark first so
    * append mode can finalize windows. */
  def tumbling(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
  }

  /** Literal 4-feature logistic scorer over event rows — MODEL
    * INFERENCE INSIDE THE STREAM: the compiled-expression scoring path
    * ([[graft.ml.ModelExpressions]]'s device at fixed literals, so the
    * oracle can mirror it) applied per event before any stateful
    * aggregation. Features: value/100, (user_id mod 10)/10, props.k/100,
    * hour-of-day/24; prob rounds to the 1e-6 grid so both engines agree
    * on every term BEFORE the order-proof DECIMAL sum. */
  val scoreW: Seq[Double] = Seq(0.8, -0.5, 0.3, 0.6)
  val scoreB: Double = -0.2

  def eventProb: org.apache.spark.sql.Column = {
    val fs = Seq(
      col("value").cast("double") / lit(100.0),
      (col("user_id") % 10).cast("double") / lit(10.0),
      get_json_object(col("props"), "$.k").cast("double") / lit(100.0),
      hour(col("ts")).cast("double") / lit(24.0))
    val margin = fs.zip(scoreW).map { case (f, w) => f * lit(w) }
      .reduce(_ + _) + lit(scoreB)
    round(lit(1.0) / (lit(1.0) + exp(-margin)), 6)
  }

  /** Tumbling per-hour × event-type PREDICTED-PROBABILITY MONITOR —
    * the streaming model-monitoring aggregate (score drift per window
    * is the first thing a production scorer dashboards): per-event
    * probs (6 dp) sum as DECIMAL(28,6) inside the stateful agg —
    * exact, commutative, so the streaming state merge order can't
    * change the result. The EXACT sum (a 6 dp-scaled integer, exact as
    * a double far past any window size) ships beside n rather than a
    * rounded mean: round(psum/n, 6) with small n lands EXACTLY on
    * decimal .5 ties (a 6 dp sum over 4 rows has .25-granularity
    * digits), where the engines' rounding implementations split —
    * measured 8/3385 one-ulp reds before this. Consumers divide
    * downstream at whatever precision they need. */
  def scoredTumbling(events: DataFrame,
                     watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(eventProb.cast(DecimalType(28, 6))).as("psum"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("psum").cast("double").as("sum_prob"))
  }

  /** Sliding 1-hour window every 30 minutes. */
  def sliding(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("n"))
  }

  /** Session windows with a 30-minute gap per user. */
  def sessions(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
      .select(col("user_id"), col("session_start"), col("n_events"))
  }

  /** Stream-stream inner join on user_id within a ±30-minute event-time
    * band. Both sides carry watermarks so the join state is bounded —
    * without the time bound and watermarks a stream-stream join buffers
    * both streams forever. `carry` names extra input columns to pass
    * through prefixed per side (e.g. event_id → click_event_id /
    * purchase_event_id — the driver-gate key carries ids so output rows
    * are unique and the DuckDB compare is unambiguous). */
  def streamStreamJoin(clicks: DataFrame, purchases: DataFrame,
                       carry: Seq[String] = Nil,
                       joinType: String = "inner"): DataFrame = {
    val l = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id") +: col("ts").as("click_ts") +:
        col("value").as("click_value") +:
        carry.map(c => col(c).as(s"click_$c")): _*)
    val r = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user") +: col("ts").as("purchase_ts") +:
        col("value").as("purchase_value") +:
        carry.map(c => col(c).as(s"purchase_$c")): _*)
    // leftOuter: an unmatched click's null row emits only once the
    // watermark proves no purchase can still arrive for it (state
    // eviction below click_ts + 30 min) — the streaming semantics a
    // batch LEFT JOIN gets for free, bounded-state here
    l.join(r,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"),
      joinType)
      .select(col("user_id") +: col("click_ts") +: col("purchase_ts") +:
        col("click_value") +: col("purchase_value") +:
        carry.flatMap(c => Seq(col(s"click_$c"), col(s"purchase_$c"))): _*)
  }

  /** Streaming exact dedup: drop rows whose key was already seen within
    * the watermark horizon (state is GC'd past the watermark — the only
    * way streaming dedup stays bounded). Keyed on a content digest, the
    * streaming dual of TextOps.qDedupExact. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming CONTENT dedup: the key is the SimHash fingerprint of the
    * text, so trivially-perturbed near-identical documents (fingerprint
    * collisions by construction) collapse within the watermark horizon —
    * the streaming dual of the batch near-dup family, with the same
    * bounded-state story: fingerprints are GC'd past the watermark.
    * Expects a `ts` event-time column alongside the text. */
  def dedupByFingerprint(docs: DataFrame, textCol: String,
                         watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__fp",
        graft.text.TextOps.simhash(split(lower(col(textCol)), " ")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("__fp"))
      .drop("__fp")

  /** Streaming twin of [[graft.text.TextOps.incrementalDedup]] and the
    * missing join shape in this file: a STREAM-STATIC anti-join. New
    * documents stream in; the corpus's kept digests are a static (batch)
    * table — exactly how a production ingest keeps its dedup state, as
    * a compacted digest table refreshed out-of-band. In-stream dups are
    * collapsed by digest within the watermark (bounded state, GC'd like
    * [[dedupByFingerprint]]); docs whose digest exists in the corpus
    * never leave the stream. The static side is planned like any batch
    * join (broadcast when small) — no streaming state for it at all.
    * Expects a `ts` event-time column; `corpusDigests` has column `h`
    * (md5 hex, the same digest [[graft.text.TextOps.qDedupExact]] keys
    * on). */
  def incrementalDedupStream(newDocs: DataFrame, corpusDigests: DataFrame,
                             textCol: String = "text",
                             watermark: String = "10 minutes"): DataFrame =
    newDocs
      .withColumn("__h", md5(col(textCol)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("__h"))
      .join(corpusDigests, col("__h") === col("h"), "left_anti")
      .drop("__h")

  /** STREAM-STATIC NEAR-dup ingest gate (r15) — the online form of the
    * MinHash band join: each incoming document computes its signature
    * ROW-LOCALLY ([[graft.text.TextOps.minhashSignature]], the HOF form
    * — stateless, no corpus aggregate on the stream side), explodes its
    * band keys, and equi-joins a STATIC corpus band table (built in
    * batch, refreshed out-of-band — the incrementalDedupStream corpus
    * convention). Candidates verify by exact Jaccard against the corpus
    * text before emission; a pair can share up to nBands keys, so
    * candidate duplicates collapse within the watermark (bounded state,
    * GC'd below it).
    *
    * Both sides key on UNCAPPED distinct shingles: a row-local signature
    * cannot see document frequencies, so the corpus table must be built
    * with `maxDf = 0` for the keys to be comparable.
    *
    * Scale: the stream side ships (band, bh, doc) rows — constant
    * width; the corpus band table and text are document-linear static
    * relations planned like any batch join side. `corpusBands` columns:
    * (band, bh, corpus_id); `corpusText`: (corpus_id, corpus_text). */
  def nearDupGateStream(newDocs: DataFrame, corpusBands: DataFrame,
                        corpusText: DataFrame, w: Int = 3,
                        minJaccard: Double = 0.6,
                        watermark: String = "10 minutes"): DataFrame = {
    import graft.text.TextOps
    def shingleSet(c: org.apache.spark.sql.Column) =
      array_distinct(TextOps.shingles(TextOps.tokens(c), w))
    val cand = newDocs
      .withWatermark("ts", watermark)
      // hash array and signature each materialize in their OWN
      // projection: the 32 min-aggregates are not CSE'd, so inlining
      // would recompute every shingle md5 32x per row (25 s -> 5.6 s
      // at sf0.1) — the minhashHashes note
      .withColumn("__mh", TextOps.minhashHashes(shingleSet(col("text"))))
      .withColumn("__sig", TextOps.minhashSignatureFromHashes(col("__mh")))
      .select(col("doc_id"), col("text"), col("ts"),
        explode(TextOps.bandKeys(col("__sig"))).as("k"))
      .select(col("doc_id"), col("text"), col("ts"),
        col("k.band").as("band"), col("k.bh").as("bh"))
      .join(corpusBands, Seq("band", "bh"))
      .select(col("doc_id"), col("text"), col("ts"), col("corpus_id"))
      .dropDuplicatesWithinWatermark(Seq("doc_id", "corpus_id"))
    cand.join(corpusText, Seq("corpus_id"))
      .withColumn("sh_a", shingleSet(col("text")))
      .withColumn("sh_b", shingleSet(col("corpus_text")))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_id"), col("corpus_id"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserCounter(user_id: Long, n_events: Long, total_value: Double)

  /** Micro-second/cents event row for the exact stateful ops ([[
    * sessionizeStateful]] / [[countersStateful]]) — money is carried as
    * cents BIGINT so per-group fold order cannot wiggle a sum. */
  final case class SessEvent(user_id: Long, event_id: Long, ts_us: Long,
                             cents: Long)
  /** One closed (or, at end of input, final) session. */
  final case class SessionRow(user_id: Long, session_idx: Long,
                              start_us: Long, end_us: Long, n_events: Long,
                              sum_cents: Long)
  /** The open tail session a group carries ACROSS micro-batches. */
  final case class OpenSession(session_idx: Long, start_us: Long,
                               end_us: Long, n_events: Long, sum_cents: Long)

  /** Pure session fold — the state-machine core of
    * [[sessionizeStateful]], factored out so the cross-batch stitching
    * logic is unit-testable without an engine: merge the carried open
    * session with this batch's (sorted) events, close a session whenever
    * the gap exceeds `gapUs`, return (closed sessions, new open tail).
    * An event landing within the gap of the carried tail EXTENDS it —
    * that is the stitch a naive per-batch sessionizer gets wrong. */
  def foldSessions(open: Option[OpenSession], sorted: Seq[SessEvent],
                   gapUs: Long): (Vector[SessionRow], Option[OpenSession]) = {
    var closed = Vector.empty[SessionRow]
    var cur = open
    sorted.foreach { e =>
      cur match {
        case Some(o) if e.ts_us <= o.end_us + gapUs =>
          cur = Some(o.copy(end_us = math.max(o.end_us, e.ts_us),
            n_events = o.n_events + 1, sum_cents = o.sum_cents + e.cents))
        case Some(o) =>
          closed :+= SessionRow(e.user_id, o.session_idx, o.start_us, o.end_us,
            o.n_events, o.sum_cents)
          cur = Some(OpenSession(o.session_idx + 1, e.ts_us, e.ts_us, 1L, e.cents))
        case None =>
          cur = Some(OpenSession(1L, e.ts_us, e.ts_us, 1L, e.cents))
      }
    }
    (closed, cur)
  }

  /** Custom stateful sessionization — the flatMapGroupsWithState STATE
    * MACHINE (vs [[sessions]]' built-in session_window): per user, the
    * open tail session lives in keyed state between micro-batches, new
    * events either extend it or close it, and closed sessions stream
    * out in Append mode. `finalFlush` (the bounded-gate mode) also
    * emits the still-open tail EVERY micro-batch — exact only for a
    * single-batch AvailableNow run (the driver-key shape), so
    * multi-batch callers pass false; a production continuous run would
    * use an event-time timeout instead (state evicts one gap past the
    * watermark), same state layout. Rows inside one micro-batch arrive
    * unordered, so each group call sorts ITS OWN batch slice by
    * (ts, event_id) — per-user-per-batch memory, never global. */
  def sessionizeStateful(events: Dataset[SessEvent], gapUs: Long,
                         finalFlush: Boolean = true): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[SessEvent], state: GroupState[OpenSession]) =>
          val sorted = rows.toVector.sortBy(e => (e.ts_us, e.event_id))
          val (closed, open) = foldSessions(state.getOption, sorted, gapUs)
          open.fold(state.remove())(state.update)
          val tail = if (finalFlush) open.map(o =>
            SessionRow(uid, o.session_idx, o.start_us, o.end_us, o.n_events,
              o.sum_cents)).toVector
          else Vector.empty
          (closed ++ tail).iterator
      }
  }

  /** Exact running counters in Update mode — [[runningCounters]] with
    * the cents device so the per-group fold is order-proof (a Double
    * accumulation varies with iterator order; BIGINT cents cannot). */
  final case class UserTotals(user_id: Long, n_events: Long, sum_cents: Long)
  def countersStateful(events: Dataset[SessEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[SessEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0L))
          val next = rows.foldLeft(prev) { (acc, e) =>
            UserTotals(uid, acc.n_events + 1, acc.sum_cents + e.cents)
          }
          state.update(next)
          Iterator.single(next)
      }
  }

  /** Custom keyed state — the `flatMapGroupsWithState` path
    * (SURVEY.md §2.B "streaming: stateful ops"): a running per-user
    * counter that emits an updated snapshot per micro-batch. State is
    * one counter per user — O(users), partitioned by key. */
  def runningCounters(events: Dataset[UserEvent]): Dataset[UserCounter] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserCounter, UserCounter](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserCounter]) =>
          val prev = state.getOption.getOrElse(UserCounter(uid, 0L, 0.0))
          val (n, v) = rows.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          val next = UserCounter(uid, n, v)
          state.update(next)
          Iterator.single(next)
      }
  }
}
