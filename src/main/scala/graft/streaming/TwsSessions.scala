package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Gap-based sessionization on the `transformWithState` operator — the
  * arbitrary-state API that supersedes `flatMapGroupsWithState`
  * (typed state handles, explicit timer registry, per-state TTL, and a
  * RocksDB-only state store). Semantics are IDENTICAL to
  * [[StateSessions]] / the batch `Sessions.sessionize` (p32 oracle):
  * events exactly `gapSec` apart share a session, boundary math in
  * integer microseconds — p81 runs this against p79's oracle verbatim.
  *
  * Differences from the flatMapGroupsWithState form worth the second
  * implementation:
  *   - state is a NAMED handle (`getValueState`) rather than the one
  *     implicit per-key value — a processor can hold several, each with
  *     its own TTL;
  *   - timers are an explicit registry (register/delete/list) instead
  *     of one mutable timeout: this processor maintains the
  *     one-live-timer-per-key invariant itself (delete-then-register on
  *     every extension), where GroupState.setTimeoutTimestamp did the
  *     replacement implicitly;
  *   - requires `RocksDBStateStoreProvider` (the query harness sets the
  *     session conf and restores it after).
  *
  * Scale shape: same as StateSessions — O(1) `OpenSession` per ACTIVE
  * key, dropped at timer expiry; RocksDB keeps the working set off-heap,
  * which is exactly the 100-TB posture for billions of concurrent keys.
  */
object TwsSessions {

  val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  class SessionProcessor(gapSec: Long)
      extends StatefulProcessor[Long, SessEvent, SessionOut] {
    private val gapUs = gapSec * 1000000L
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[SessEvent],
        timers: TimerValues): Iterator[SessionOut] = {
      // late rows (older than the watermark) are NOT dropped by the
      // operator — same rule as flatMapGroupsWithState: drop them here
      // or an expired-and-emitted session could resurrect
      val wmUs = timers.getCurrentWatermarkInMs() * 1000L
      val sorted = rows.filter(e => micros(e.ts) >= wmUs)
        .toVector.sortBy(e => (micros(e.ts), e.event_id))
      if (sorted.isEmpty) return Iterator.empty
      var cur = if (open.exists()) open.get() else null
      val closed = Vector.newBuilder[SessionOut]
      sorted.foreach { e =>
        val us = micros(e.ts)
        val p = if (e.is_purchase) 1L else 0L
        cur =
          if (cur == null)
            OpenSession(1L, us, us, 1L, p)
          else if (us - cur.endUs <= gapUs)
            cur.copy(endUs = math.max(cur.endUs, us),
              n = cur.n + 1, nPurch = cur.nPurch + p)
          else {
            closed += toOut(user, cur)
            OpenSession(cur.seq + 1, us, us, 1L, p)
          }
      }
      open.update(cur)
      // one live timer per key: delete the stale expiry, register the
      // new one (fires once the watermark proves the session closed)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(cur.endUs / 1000L + gapSec * 1000L + 1L)
      closed.result().iterator
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!open.exists()) return Iterator.empty // defensive: no session
      val s = open.get()
      open.clear()
      Iterator.single(toOut(user, s))
    }

    private def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

    private def tsFromMicros(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    private def toOut(user: Long, s: OpenSession): SessionOut =
      SessionOut(user, s.seq, tsFromMicros(s.startUs),
        tsFromMicros(s.endUs), s.n, s.nPurch,
        (s.endUs - s.startUs) / 1000000L)
  }

  def sessions(events: Dataset[SessEvent], gapSec: Long)
      : Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSec),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
