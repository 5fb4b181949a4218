package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` stream (the fixture's
  * north-star streaming table): watermarked windowed aggregation and
  * stateful sessionization.
  *
  * Reference semantics: the windowed aggregation mirrors what the
  * reference runs as repeated batch queries over an append-only events
  * table; sessionization is the gaps-and-islands operator (see the batch
  * twin in `graft.queries.Events` — both produce the same sessions, one
  * incrementally with state + timeouts, one with window functions).
  *
  * Scale: both operators key state by (window, type) / user — state size
  * is bounded by active keys × gap, and the watermark lets Spark drop
  * state for closed windows/sessions. At 100 TB/day the same code runs
  * with more shuffle partitions; nothing here is local-mode-specific.
  */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long,
                     total_value: Double)

  /** Public top-level shape: the state encoder's generated code (Janino)
    * must resolve the accessors. */
  case class SessionState(startMs: Long, lastMs: Long, nEvents: Long,
                          valueSum: Double)

  /** Watermarked tumbling-window counts per event type. Late data beyond
    * the watermark is dropped; closed windows emit exactly once under
    * Append mode. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Stream-static enrichment join — the canonical dimension-lookup
    * shape (events joined to a user/segment table by key). The static
    * side is re-planned per micro-batch, so Catalyst broadcasts a
    * dim-sized table and a 100 TB stream pays no shuffle and keeps no
    * state; left join preserves events with no dimension row. */
  def enrich(events: DataFrame, dim: DataFrame,
             key: String = "user_id"): DataFrame =
    events.join(dim, Seq(key), "left")

  /** Stateful sessionization: events grouped by user, sessions closed
    * after `gapMinutes` of event-time silence (event-time timeout driven
    * by the watermark). One state object per active user.
    *
    * Approximation note: state holds a single pending session, and a
    * within-batch gap closes the earlier session eagerly — a late event
    * (still inside the watermark) arriving in a LATER micro-batch that
    * would have bridged two already-split bursts cannot re-merge them.
    * The exact variant buffers events until the watermark passes (what
    * Spark's built-in `session_window` aggregation does); this shape is
    * the custom-state template for session payloads `session_window`
    * can't express. The batch twin (`queries/Events.scala` qa7) is exact
    * and is the correctness reference. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 360,
                 watermark: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, batch: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var cur = state.getOption.orNull
      if (state.hasTimedOut) {
        if (cur != null) {
          out += Session(userId, new Timestamp(cur.startMs),
            new Timestamp(cur.lastMs), cur.nEvents, cur.valueSum)
        }
        state.remove()
        cur = null
      }
      // Sort within the micro-batch: arrival order is not event-time order.
      batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        if (cur == null) {
          cur = SessionState(t, t, 1L, e.value)
        } else if (t - cur.lastMs > gapMs) {
          out += Session(userId, new Timestamp(cur.startMs),
            new Timestamp(cur.lastMs), cur.nEvents, cur.valueSum)
          cur = SessionState(t, t, 1L, e.value)
        } else {
          // min() on the start: a late (in-watermark) event from an
          // earlier micro-batch may precede the session's current start.
          cur = SessionState(math.min(cur.startMs, t),
            math.max(cur.lastMs, t), cur.nEvents + 1, cur.valueSum + e.value)
        }
      }
      if (cur != null) {
        state.update(cur)
        state.setTimeoutTimestamp(cur.lastMs + gapMs)
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }
}
