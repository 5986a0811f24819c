package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input observation for the streaming SCD-2 fold: `ts` keeps the
  * watermark column's name; `event_id` is the within-instant
  * tie-break (first observation per (key, ts) wins, matching the
  * batch form's min-event_id pre-dedup). */
case class ScdEvent(user_id: Long, ts: java.sql.Timestamp,
  event_id: Long, value: String)

/** Per-key state: the pending buffer (observations the watermark has
  * not passed — only these can still be reordered by in-flight data)
  * plus the current run: value, its first-observation micros (−1
  * unset), its observation count, and the last folded instant (so a
  * cross-batch duplicate (key, ts) observation is skipped exactly
  * like the batch pre-dedup). State is O(watermark-lag buffer) +
  * O(1) current-run — the per-entity "current value" registry an SCD
  * consumer keeps anyway. */
case class ScdState(ev: Seq[(Long, Long, String)], curValue: String,
  curFromUs: Long, curN: Long, lastTsUs: Long,
  openFromUs: Long, openN: Long)

/** One validity row: `valid_to` null while the run is still current
  * (the open interval emitted at quiescence; a later change emits the
  * closed row for the same (key, valid_from) and downstream reads
  * closed-wins). */
case class ScdOut(user_id: Long, value: String,
  valid_from: java.sql.Timestamp, valid_to: java.sql.Timestamp,
  n_obs: Long)

/** Streaming SCD-2 — `Sessions.validityIntervals`'s gaps-and-islands
  * history as a watermark-buffered `flatMapGroupsWithState` fold: a
  * CLOSED validity row is emitted the moment a finalized observation
  * changes the key's value (its `valid_to` is that observation's
  * instant), and the OPEN current row is emitted when the key goes
  * quiet (event-time timeout) — so an append-mode consumer holds the
  * full mutation history plus a current-as-of-quiescence row, and
  * reads closed-wins per (key, valid_from).
  *
  * Buffering mirrors [[StateFunnel]]: observations fold strictly in
  * (ts, event_id) order once the watermark proves no earlier
  * observation can arrive; duplicate instants per key are skipped
  * (first in (ts, event_id) order wins — the batch form's
  * min-event_id rule AMONG ROWS THAT REACH THE OPERATOR: an
  * equal-instant straggler split into a batch where the watermark has
  * already reached its instant is dropped by the ENGINE's inclusive
  * late filter like any late row, so a 0-second watermark trades that
  * boundary sliver for state; size the delay to the source's
  * disorder, exactly as with every watermarked operator); state is never
  * stored without either a live timer or a current run to resume.
  * Timers are registered only from the data branch, so a quiet key
  * emits its open row exactly once per quiet period instead of on
  * every later watermark advance. Semantics pinned two ways:
  * StreamIngestSpec equates the finalized rows to the batch operator
  * under random cuts, and p153 runs the sentinel-flush harness
  * against p151's DuckDB oracle verbatim.
  *
  * COST CONTRACT (the rrfFusion-style O-bound): work and shuffle are
  * linear in EMITTED intervals — one closed row per value change —
  * so a change-every-event corpus pays O(events) no matter what
  * (SCALE round-10: 6.5→32.2 s as emitted intervals grow 0.7M→7.3M;
  * that is output volume, not operator overhead). State is
  * O(watermark-lag buffer) + O(1) current run per key; with the
  * default `horizonSec = ∞` a key that EVER appeared retains its
  * current run forever so a much-later observation can close it —
  * exact parity with the batch operator. A long-running stream over
  * churning key spaces should set `horizonSec`: a run whose last
  * observation is older than the horizon at quiescence is dropped
  * after its open row has been emitted, bounding state to active
  * keys. Open-row emission is content-keyed (state tracks the last
  * emitted (valid_from, n_obs)), so the retirement fire never
  * duplicates an unchanged open row for raw append consumers; an
  * unrepresentably large finite horizon saturates to ∞ instead of
  * overflowing. The trade, identical to [[StateFunnel]]'s horizon: a
  * key returning after the horizon starts a NEW run (fresh
  * valid_from) even if its value never changed, instead of extending
  * the dropped one. */
object StateScd {

  def intervals(events: Dataset[ScdEvent],
      horizonSec: Long = Long.MaxValue): Dataset[ScdOut] = {
    implicit val stateEnc = Encoders.product[ScdState]
    implicit val outEnc = Encoders.product[ScdOut]
    implicit val keyEnc = Encoders.scalaLong

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ScdState, ScdOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[ScdEvent],
            state: GroupState[ScdState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            val (closed, nxt) = fold(user, st)
            // quiescence: everything buffered is final — emit the
            // closed history plus the open current row, keep the O(1)
            // run (a much-later observation continues or closes it).
            // The open row is emitted only when its CONTENT changed
            // since the last emission ((valid_from, n_obs) tracked in
            // state) — a later horizon-retirement fire on an unchanged
            // run must not duplicate it for raw append consumers.
            val openChanged = nxt.curFromUs != -1L &&
              !(nxt.curFromUs == st.openFromUs && nxt.curN == st.openN)
            val open =
              if (openChanged)
                Seq(ScdOut(user, nxt.curValue,
                  tsFromMicros(nxt.curFromUs), null, nxt.curN))
              else Seq.empty
            // horizon: a run whose last observation is older than the
            // horizon at quiescence has had its open row emitted — drop
            // the state (retired key). Otherwise keep the O(1) run; with
            // a finite horizon re-arm the timer so retirement fires even
            // if the key never returns. Deadline math saturates: a
            // finite horizon too large to represent behaves as ∞
            // (never expires, no retirement timer) instead of
            // overflowing into retire-immediately.
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val deadline =
              if (horizonSec == Long.MaxValue || nxt.curFromUs == -1L)
                Long.MaxValue
              else horizonDeadlineUs(nxt.lastTsUs, horizonSec)
            val expired = deadline != Long.MaxValue && wmUs > deadline
            if (nxt.curFromUs == -1L || expired) state.remove()
            else {
              state.update(nxt.copy(ev = Vector.empty,
                openFromUs = nxt.curFromUs, openN = nxt.curN))
              if (deadline != Long.MaxValue)
                state.setTimeoutTimestamp(deadline / 1000L + 1L)
            }
            (closed ++ open).iterator
          } else {
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val st = state.getOption
              .getOrElse(ScdState(Vector.empty, null, -1L, 0L, -1L,
                -1L, -1L))
            val incoming = evs
              .map(e => (micros(e.ts), e.event_id, e.value))
              .filter(_._1 >= wmUs)
            val all = st.ev ++ incoming
            val (fin, pend) = all.partition(_._1 <= wmUs)
            val (closed, nxt) = fold(user, st.copy(ev = fin))
            if (pend.isEmpty && nxt.curFromUs == -1L) {
              if (state.exists) state.remove()
            } else {
              state.update(nxt.copy(ev = pend.toVector))
              // a state entry always carries a live timer (StateFunnel
              // rule): with an empty buffer the next watermark advance
              // still triggers the quiescence emission
              val fireAtUs =
                if (pend.nonEmpty) pend.map(_._1).max else wmUs
              state.setTimeoutTimestamp(fireAtUs / 1000L + 1L)
            }
            closed.iterator
          }
      }
  }

  /** Fold the state's buffered observations (already final) in
    * (ts, event_id) order into the current run; returns the closed
    * rows emitted by value changes and the advanced run. */
  private def fold(user: Long, st: ScdState): (Seq[ScdOut], ScdState) = {
    var cur = st
    val out = Vector.newBuilder[ScdOut]
    st.ev.sortBy(e => (e._1, e._2)).foreach { case (us, _, v) =>
      if (us == cur.lastTsUs) () // duplicate instant: first wins
      else if (cur.curFromUs == -1L)
        cur = cur.copy(curValue = v, curFromUs = us, curN = 1L,
          lastTsUs = us)
      else if (v == cur.curValue)
        cur = cur.copy(curN = cur.curN + 1L, lastTsUs = us)
      else {
        out += ScdOut(user, cur.curValue, tsFromMicros(cur.curFromUs),
          tsFromMicros(us), cur.curN)
        cur = cur.copy(curValue = v, curFromUs = us, curN = 1L,
          lastTsUs = us)
      }
    }
    (out.result(), cur)
  }

  /** lastUs + horizonSec·10⁶ with saturation: a finite horizon whose
    * deadline would overflow Long behaves as ∞ rather than wrapping
    * negative (which would retire every run at first quiescence). */
  private def horizonDeadlineUs(lastUs: Long, horizonSec: Long): Long =
    if (horizonSec >= (Long.MaxValue - math.max(lastUs, 0L)) / 1000000L)
      Long.MaxValue
    else lastUs + horizonSec * 1000000L

  private def micros(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  private def tsFromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}
