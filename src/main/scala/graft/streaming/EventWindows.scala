package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream analytics over the `events` table
  * (event_id, ts, user_id, event_type, value, props) — the streaming-query
  * surface the reference engine lacks entirely (SURVEY §2.9), built the
  * Spark-native way: the SAME aggregation plan serves batch and Structured
  * Streaming, watermarks bound state, and custom session state runs through
  * `flatMapGroupsWithState`.
  *
  * Engine-exact numerics (the DuckDB-oracle discipline of every graded
  * query): event times are floored to whole epoch seconds
  * (`unix_timestamp(ts)` ≡ DuckDB `floor(epoch(ts))` under the pinned UTC
  * session timezone), and `value` sums as integer cents
  * (`round(value*100)` — both engines round the identical double), so
  * batch, streaming, and oracle agree bit for bit.
  */
object EventWindows {

  /** Tumbling 1-hour windows per event type: (hour_start epoch, type,
    * count, value cents). Batch AND streaming share this plan —
    * [[windowCountsStream]] is this aggregation behind a watermark.
    *
    * Scale: `window()` is a row-local projection (no shuffle of its own);
    * the groupBy shuffles once on (window, type) with map-side partial
    * aggregation, and the key space is bounded (hours × types), so state
    * in the streaming variant stays tiny regardless of event volume. */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      // window() aligns to epoch hours (timezone-free); unix_timestamp of
      // the start is the stable cross-engine key
      .select(unix_timestamp(col("w.start")).as("hour_start"), col("event_type"),
        col("n_events"), col("value_cents"))

  /** Streaming variant: the same plan behind an event-time watermark.
    * Events later than `lateness` behind the max seen event time are
    * dropped; a window closes (and emits exactly once in Append mode)
    * when the watermark passes its end. */
  def windowCountsStream(stream: DataFrame, lateness: String = "2 hours"): DataFrame =
    windowCounts(stream.withWatermark("ts", lateness))

  /** Per-user sessionization (gap rule: a quiet period longer than
    * `gapSec` starts a new session): one row per (user, session) with
    * start/end epoch seconds, event count, and value cents. session_idx
    * numbers a user's sessions 1..n in start order.
    *
    * Batch path: `lag` + running `sum` over a window PARTITIONED BY
    * user_id — every user's events land in one shuffle partition group,
    * never a global single-partition window, so the operator scales with
    * users. The streaming equivalent is [[sessionizeStream]]; their
    * outputs are identical for closed sessions (StreamingSpec). */
  def sessionize(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("tse")
    events
      // unix_timestamp handles TIMESTAMP and TIMESTAMP_NTZ alike (the
      // events parquet stores NTZ; session TZ is pinned UTC) and floors to
      // whole epoch seconds — DuckDB floor(epoch(ts)) exactly
      .select(col("user_id"), unix_timestamp(col("ts")).as("tse"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("new_s",
        when(col("tse") - lag("tse", 1).over(byUser) > gapSec
          || lag("tse", 1).over(byUser).isNull, 1L).otherwise(0L))
      .withColumn("session_idx", sum("new_s").over(byUser))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min("tse").as("session_start"), max("tse").as("session_end"),
        count(lit(1)).cast("long").as("n_events"),
        sum("cents").as("value_cents"))
  }

  /** One event on the streaming session path (ts stays a timestamp so the
    * watermark is event-time). */
  case class Ev(user_id: Long, ts: java.sql.Timestamp, cents: Long)

  /** A user's open (not yet closed) session, kept in `GroupState`. */
  case class OpenSession(idx: Long, start: Long, end: Long, n: Long, cents: Long)

  /** One closed session — the same row shape as [[sessionize]]. */
  case class SessionOut(user_id: Long, session_idx: Long, session_start: Long,
                        session_end: Long, n_events: Long, value_cents: Long)

  /** Streaming sessionization via `flatMapGroupsWithState`: per-user state
    * holds the one open session; a batch's events fold into it in event
    * order, emitting every session closed by the gap rule, and the
    * event-time timeout (watermark past `end + gapSec`) closes a session
    * no further event can reopen — each session emits exactly once.
    *
    * Assumes the watermark's lateness bound: an event older than an
    * already-closed session re-opens nothing (it starts or joins the
    * current open session), which is the standard bounded-disorder
    * contract of watermarked streams. State per user is ONE open session
    * (5 longs) — scale is O(active users), bounded by the timeout. */
  def sessionizeStream(events: Dataset[Ev], gapSec: Long = 1800L,
                       lateness: String = "0 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    def fold(userId: Long, evs: Iterator[Ev],
             state: GroupState[OpenSession]): Iterator[SessionOut] = {
      def close(s: OpenSession): SessionOut =
        SessionOut(userId, s.idx, s.start, s.end, s.n, s.cents)
      if (state.hasTimedOut) {
        val out = state.getOption.map(close).iterator
        state.remove()
        out
      } else {
        val sorted = evs.toArray.sortBy(_.ts.getTime)
        val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
        var cur = state.getOption.orNull
        sorted.foreach { e =>
          val tse = e.ts.getTime / 1000L // floor to whole seconds, as batch
          if (cur == null)
            cur = OpenSession(1L, tse, tse, 1L, e.cents)
          else if (tse - cur.end > gapSec) {
            closed += close(cur)
            cur = OpenSession(cur.idx + 1, tse, tse, 1L, e.cents)
          } else
            cur = cur.copy(end = math.max(cur.end, tse), n = cur.n + 1,
              cents = cur.cents + e.cents)
        }
        if (cur != null) {
          state.update(cur)
          // close when no in-horizon event can still extend the session
          state.setTimeoutTimestamp((cur.end + gapSec) * 1000L + 1000L)
        }
        closed.iterator
      }
    }
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fold)(
        Encoders.product[OpenSession], Encoders.product[SessionOut])
  }
}
