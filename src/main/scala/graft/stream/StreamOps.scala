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
                       carry: Seq[String] = Nil): DataFrame = {
    val l = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id") +: col("ts").as("click_ts") +:
        col("value").as("click_value") +:
        carry.map(c => col(c).as(s"click_$c")): _*)
    val r = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user") +: col("ts").as("purchase_ts") +:
        col("value").as("purchase_value") +:
        carry.map(c => col(c).as(s"purchase_$c")): _*)
    l.join(r,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
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

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserCounter(user_id: Long, n_events: Long, total_value: Double)

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
