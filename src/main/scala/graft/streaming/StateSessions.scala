package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row for the custom-state sessionizer: `ts` keeps the watermark
  * column's name so the event-time watermark defined upstream reaches
  * the stateful operator. Top-level case classes (not nested private) so
  * the generated encoders stay on codegen — see StreamBgRow's history. */
case class SessEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
  is_purchase: Boolean)

/** Per-user state: ONLY the open session's aggregate — O(1) per key.
  * Closed sessions are emitted the moment a later event proves the gap
  * (event time is monotone past the watermark, so a closed session can
  * never reopen); the final open session is emitted when the event-time
  * timeout fires (watermark > session end + gap). */
case class OpenSession(seq: Long, startUs: Long, endUs: Long, n: Long,
  nPurch: Long)

case class SessionOut(user_id: Long, session_seq: Long,
  session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
  n_events: Long, n_purchases: Long, duration_sec: Long)

/** Gap-based sessionization as a `flatMapGroupsWithState` operator with
  * `EventTimeTimeout` — the custom-state streaming shape for semantics
  * `session_window` can't express (per-session ordinals, arbitrary
  * in-session accumulators, mid-session emission policies). Semantics
  * match the batch `Sessions.sessionize` / p32 oracle exactly: events
  * EXACTLY `gapSec` apart stay in one session (`> gap` splits), all
  * boundary math in integer microseconds.
  *
  * Scale shape: state is one `OpenSession` per ACTIVE user (not per
  * event, not per session) and is dropped at timeout — bounded by the
  * concurrently-active key count regardless of stream length. Reference
  * behavior mirrored: powa's continuous per-entity accumulation between
  * snapshot ticks (SURVEY.md §2.10); the timeout flush is the
  * watermark-driven analogue of the coalesce tick.
  */
object StateSessions {

  def sessions(events: Dataset[SessEvent], gapSec: Long)
      : Dataset[SessionOut] = {
    val gapUs = gapSec * 1000000L
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[SessEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed open-session end + gap: nothing can join
            // this session anymore — emit and drop the key's state
            val out = toOut(user, state.get)
            state.remove()
            Iterator.single(out)
          } else {
            // flatMapGroupsWithState does NOT drop late rows for you
            // (unlike aggregations) — drop them here, or an event older
            // than the watermark could resurrect a session the timeout
            // already emitted (seq restart + double emission). Within an
            // invocation events arrive unordered — sort by (ts, event_id).
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val sorted = evs.filter(e => micros(e.ts) >= wmUs)
              .toVector.sortBy(e => (micros(e.ts), e.event_id))
            var open = state.getOption.orNull
            val closed = Vector.newBuilder[SessionOut]
            sorted.foreach { e =>
              val us = micros(e.ts)
              val p = if (e.is_purchase) 1L else 0L
              open =
                if (open == null)
                  OpenSession(1L, us, us, 1L, p)
                else if (us - open.endUs <= gapUs)
                  open.copy(endUs = math.max(open.endUs, us),
                    n = open.n + 1, nPurch = open.nPurch + p)
                else {
                  closed += toOut(user, open)
                  OpenSession(open.seq + 1, us, us, 1L, p)
                }
            }
            if (open != null) {
              state.update(open)
              // fires once the watermark proves the session unextendable
              state.setTimeoutTimestamp(open.endUs / 1000L + gapSec * 1000L + 1L)
            }
            closed.result().iterator
          }
      }
  }

  private def micros(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  private def tsFromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def toOut(user: Long, s: OpenSession): SessionOut =
    SessionOut(user, s.seq, tsFromMicros(s.startUs), tsFromMicros(s.endUs),
      s.n, s.nPurch, (s.endUs - s.startUs) / 1000000L)
}
