package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Structured Streaming surface. The reference's "streams" are pull
  * iterators (SURVEY §3.2) with no event-time semantics — this module is
  * beyond-reference capability for the `events` table: watermarked windowed
  * aggregation and stateful latest-per-key (the streaming twin of
  * graft.ops.Sorts.replaceDedup).
  *
  * Every transform here works identically on a batch frame (unit tests) and
  * a readStream frame (production): that symmetry is the point of the
  * DataFrame abstraction.
  */
object EventStreams {

  /** Tumbling-window stats per event type with a watermark. On a stream:
    * late rows beyond `watermarkDelay` are dropped and state is evicted —
    * bounded state at any scale. */
  def windowedStats(events: DataFrame, windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      // Decimal-cast sum: order-independent exact accumulation (the data is
      // 4-decimal), so results are reproducible across retries and engines.
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(14, 4)))
          .cast("double").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"), col("sum_value"))

  /** Native session windows: merge events of a user into sessions separated
    * by more than `gap` of silence (the boundary is inclusive: an event at
    * exactly last_ts + gap extends the session). Works identically on batch frames and
    * watermarked streams — Spark's built-in twin of
    * [[graft.ops.Sessions.sessionize]]. */
  def sessionWindowStats(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(14, 4)))
          .cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("s_start_us"),
        unix_micros(col("sw.end")).as("s_end_us"),
        col("n_events"), col("sum_value"))

  final case class EventIn(user_id: Long, event_type: String, ts: Timestamp, value: Double)

  /** Streaming replace-dedup: keep the latest (max ts, tiebreak max value)
    * event per (user_id, event_type), maintained incrementally in keyed
    * state. State is one row per live key — the streaming analog of the
    * replace-key merge; emit-per-batch via Update mode. */
  def latestPerKey(events: Dataset[EventIn]): Dataset[EventIn] = {
    import events.sparkSession.implicits._
    def newer(a: EventIn, b: EventIn): EventIn =
      if (a.ts.after(b.ts) || (a.ts == b.ts && a.value >= b.value)) a else b
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState[EventIn, EventIn](GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          val incoming = it.reduce(newer)
          val best = state.getOption.map(newer(incoming, _)).getOrElse(incoming)
          state.update(best)
          best
      }
  }

  /** Stream-stream interval join: pair each left event with the same-key
    * right events whose timestamp falls in [left_ts − maxGap, left_ts].
    *
    * On streams BOTH sides carry watermarks and the time-bound join
    * condition is what lets Spark evict join state older than
    * watermark + gap — bounded state, the only sound way to inner-join two
    * unbounded streams (an unbounded-state stream join buffers both sides
    * forever). On batch frames the identical plan is an equi-join on the
    * key with a range filter; see [[graft.ops.RangeJoin]] for the bucketed
    * batch variant that avoids even the range-filter fanout.
    *
    * Output columns are the left frame's then the right frame's; key
    * columns appear on both sides (select via the `l`/`r` aliases). */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String,
      maxGap: String, watermarkDelay: String): DataFrame = {
    require(leftTsCol != rightTsCol,
      "left/right timestamp columns must have distinct names")
    val l0 = if (left.isStreaming) left.withWatermark(leftTsCol, watermarkDelay) else left
    val r0 = if (right.isStreaming) right.withWatermark(rightTsCol, watermarkDelay) else right
    // Alias-qualified conditions: both sides may derive from the SAME scan
    // (a self-join on event type), where df("col") references are ambiguous.
    val l = l0.alias("l")
    val r = r0.alias("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val timeCond = col(s"r.$rightTsCol")
      .between(col(s"l.$leftTsCol") - expr(s"INTERVAL $maxGap"), col(s"l.$leftTsCol"))
    l.join(r, keyCond && timeCond, "inner")
  }

  /** Streaming exact dedup by event id: at-least-once sources redeliver, so
    * every ingestion pipeline dedups on an id column before anything else.
    * On a stream this uses `dropDuplicatesWithinWatermark` — state holds
    * only ids younger than the watermark, so it is BOUNDED (the unbounded
    * `dropDuplicates` state would grow forever at 100 TB/day); duplicates
    * arriving within the delay are suppressed, and a duplicate older than
    * the watermark would have been dropped as late data anyway. On a batch
    * frame it degrades to plain `dropDuplicates` (same result set — batch
    * has no redelivery horizon). */
  def dedupEvents(
      events: DataFrame, idCols: Seq[String], watermarkDelay: String,
      tsCol: String = "ts"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, watermarkDelay).dropDuplicatesWithinWatermark(idCols)
    else events.dropDuplicates(idCols)

  /** Stream-static dimension enrichment: join a (possibly streaming) event
    * frame against a SMALL static dimension table, broadcast — the
    * "attach user/country/experiment metadata at ingest" step. A
    * stream-static equi-join is stateless in Structured Streaming (each
    * micro-batch joins against the static side; nothing accumulates), and
    * the broadcast hint keeps it shuffle-free on the stream side — the
    * only shape that holds at firehose rates. Left join: events with no
    * dimension row pass through with NULLs (never silently dropped). */
  def enrich(events: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), keys, "left")
}
