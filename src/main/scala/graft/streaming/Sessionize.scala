package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization.
  *
  * [[gapSessions]] is the Spark-native path: built-in `session_window`
  * (merging event-time windows, watermark-evicted state) — prefer it;
  * Catalyst owns the state store and the plan stays declarative.
  *
  * [[cappedSessions]] demonstrates the custom-state escape hatch
  * (`flatMapGroupsWithState`) for semantics the built-in cannot
  * express: here, sessions additionally close at a hard duration cap
  * regardless of activity (billing/abuse shapes). State per key is one
  * small case class; event-time timeout closes idle sessions at the
  * watermark, so state is bounded exactly like the native operator.
  */
object Sessionize {

  /** Gap-based sessions via the native merging session window.
    * Works identically over batch or (watermarked) streaming input.
    * Output: `<keyCol>, session_start, session_end, n_events`.
    */
  def gapSessions(events: DataFrame, keyCol: String, tsCol: String, gap: String): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events")
      )

  final case class SessionAcc(key: String, startMs: Long, lastMs: Long, n: Long)
  final case class Session(
      key: String,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      capped: Boolean
  )

  /** Custom-state sessions: close after `gapMs` idle OR when the
    * session reaches `capMs` total duration (the part `session_window`
    * cannot express). Streaming input must be watermarked on `tsCol`.
    *
    * BATCH CALLERS: batch execution never fires state timeouts, so with
    * the default `emitOpenAtEnd = false` each key's TRAILING session
    * (the one still open at end-of-input) is NOT emitted — a key with a
    * single burst yields zero sessions. Pass `emitOpenAtEnd = true` on
    * batch input to flush remaining state as uncapped sessions (do not
    * set it on streaming input: each micro-batch would emit a partial
    * session for every open key).
    * Output: Dataset[Session].
    */
  def cappedSessions(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gapMs: Long,
      capMs: Long,
      emitOpenAtEnd: Boolean = false
  ): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._

    def close(acc: SessionAcc, capped: Boolean): Session =
      Session(acc.key, new Timestamp(acc.startMs), new Timestamp(acc.lastMs), acc.n, capped)

    events
      // no cast on the event-time column: casting strips the watermark
      // and event-time timeout stops resolving
      .select(col(keyCol).cast("string").as("_1"), col(tsCol).as("_2"))
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, Session](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, Timestamp)], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(_, capped = false))
            state.remove()
            out.iterator
          } else {
            val emitted = Seq.newBuilder[Session]
            var acc = state.getOption.orNull
            rows.map(_._2.getTime).toSeq.sorted.foreach { t =>
              acc match {
                case null => acc = SessionAcc(key, t, t, 1)
                case a if t - a.lastMs > gapMs =>
                  emitted += close(a, capped = false)
                  acc = SessionAcc(key, t, t, 1)
                case a if t - a.startMs >= capMs =>
                  emitted += close(a, capped = true)
                  acc = SessionAcc(key, t, t, 1)
                case a =>
                  // late-but-allowed events (within the watermark) may
                  // arrive out of order across batches: never let them
                  // shrink the session bounds or the timeout
                  acc = a.copy(
                    startMs = math.min(a.startMs, t),
                    lastMs = math.max(a.lastMs, t),
                    n = a.n + 1
                  )
              }
            }
            if (acc != null) {
              if (emitOpenAtEnd) {
                // batch finalization: flush the trailing session now —
                // no further input is coming and timeouts never fire
                emitted += close(acc, capped = false)
                state.remove()
              } else {
                state.update(acc)
                // Close when the watermark passes last-event + gap —
                // CLAMPED to just above the current watermark: Spark
                // does NOT filter late input for flatMapGroupsWithState,
                // so a straggler event older than the watermark would
                // otherwise request a timeout in the past, and
                // setTimeoutTimestamp THROWS on that — one late event
                // killing the whole stream (caught by the Soak harness,
                // round 10). The clamp closes such a session at the next
                // trigger instead; the emitted row is identical (close()
                // reads the accumulator, not the timeout). In batch
                // execution there is no watermark to read (the getter
                // throws) and timeouts never fire — skip the clamp.
                val wmMs =
                  try state.getCurrentWatermarkMs()
                  catch { case _: UnsupportedOperationException => Long.MinValue }
                state.setTimeoutTimestamp(
                  math.max(acc.lastMs + gapMs, wmMs + 1))
              }
            }
            emitted.result().iterator
          }
      }
  }
}
