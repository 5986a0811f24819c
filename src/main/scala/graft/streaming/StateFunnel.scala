package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input row for the streaming funnel: `ts` keeps the watermark
  * column's name (see SessEvent); `step` is the 0-based funnel stage
  * index, resolved upstream from the event type. */
case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
  event_id: Long, step: Int)

/** Per-user state: the PENDING buffer (events newer than the watermark
  * — only these can still be reordered by in-flight data) plus the
  * greedy chain over the FINALIZED prefix (`chain(k)` = stage-k
  * timestamp in epoch micros, −1 unset). Buffer size is bounded by the
  * watermark lag × the user's event rate; the chain is O(steps). */
case class FunnelState(ev: Seq[(Long, Long, Int)], chain: Seq[Long])

case class FunnelOut(user_id: Long, stages: Int,
  ts_first: java.sql.Timestamp, span_sec: Long)

/** Streaming conversion funnel — `Sessions.funnel`'s greedy first-touch
  * chain as a watermark-buffered `flatMapGroupsWithState` operator.
  *
  * WHY BUFFERED (the correctness constraint NOTES flagged): the greedy
  * chain is order-sensitive — a step-k event may only claim stage k if
  * it is the EARLIEST step-k event after stage k−1, so an event can
  * only be folded into the chain once no earlier event can still
  * arrive. Events are therefore buffered until the watermark passes
  * them, then folded in (ts, event_id) order. Folding is
  * DISCARD-SAFE: a finalized step-k event at ts T that cannot claim
  * its stage now (chain(k−1) unset or ≥ T) never can — chain(k−1) is
  * only ever set by later folds to a value > T, and the batch
  * semantics require s_k > s_{k−1} > T — so nothing needs re-visiting
  * and the buffer never grows beyond the watermark lag.
  *
  * EMISSION at quiescence: when the event-time timeout fires (the
  * watermark passed every buffered event — the user went quiet), the
  * buffer folds and one FunnelOut row is emitted; a user active across
  * several quiet periods emits a row per quiescence and downstream
  * reads latest-wins (append mode). A COMPLETE chain is immutable
  * (later events can never improve any greedy stage), so its state is
  * dropped at emission; an incomplete chain is retained O(steps) so a
  * much-later event can still advance it — unless `horizonSec` is set,
  * in which case a chain whose first touch is older than the horizon
  * at timeout is emitted and dropped (the conversion-window state
  * bound a production deployment runs with; the default ∞ keeps exact
  * parity with the batch operator / p86 oracle). Late rows are
  * dropped by the ENGINE before the operator runs, and its bound is
  * INCLUSIVE — a row at exactly the current watermark is late
  * (measured, pinned by StreamIngestSpec's boundary test); the
  * operator's own `>= wm` filter and the never-store-state-without-a-
  * live-timer rule below are defense in depth, not the primary gate.
  *
  * Semantics pinned two ways: StreamIngestSpec equates it to
  * `Sessions.funnel` on the same events, and p143 runs it under the
  * DuckDB oracle (p86's SQL verbatim) via the sentinel-flush harness.
  */
object StateFunnel {

  def funnel(events: Dataset[FunnelEvent], nSteps: Int,
      horizonSec: Long = Long.MaxValue): Dataset[FunnelOut] = {
    require(nSteps >= 2, "a funnel needs at least two steps")
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelOut]
    implicit val keyEnc = Encoders.scalaLong

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[FunnelEvent],
            state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // watermark passed every buffered event: fold and emit the
            // quiescent answer
            val st = state.get
            val chain = fold(st.chain, st.ev)
            val entered = chain(0) != -1L
            val complete = chain(nSteps - 1) != -1L
            val expired = entered && horizonSec != Long.MaxValue &&
              state.getCurrentWatermarkMs() * 1000L >
                chain(0) + horizonSec * 1000000L
            if (!entered || complete || expired) state.remove()
            else state.update(FunnelState(Vector.empty, chain.toVector))
            if (entered) Iterator.single(toOut(user, chain))
            else Iterator.empty
          } else {
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val st = state.getOption
              .getOrElse(FunnelState(Vector.empty,
                Vector.fill(nSteps)(-1L)))
            val incoming = evs
              .map(e => (micros(e.ts), e.event_id, e.step))
              .filter(_._1 >= wmUs) // drop late rows, see scaladoc
            val all = st.ev ++ incoming
            // events at or below the watermark are final: fold them now
            // so the buffer only ever holds the watermark-lag window
            val (fin, pend) = all.partition(_._1 <= wmUs)
            val chain = fold(st.chain, fin)
            if (pend.isEmpty && chain(0) == -1L) {
              // nothing buffered and nothing claimed (all rows late, or
              // boundary rows that finalized without entering): an
              // un-entered chain is all −1s — keeping it would leak a
              // timer-less state entry forever
              if (state.exists) state.remove()
            } else {
              state.update(FunnelState(pend.toVector, chain.toVector))
              // fires once the watermark proves the buffer final; with
              // an EMPTY buffer (everything finalized on arrival — e.g.
              // a row at exactly the watermark) the next watermark
              // advance must still trigger the quiescence emission, so
              // a state entry is NEVER stored without a live timer
              val fireAtUs =
                if (pend.nonEmpty) pend.map(_._1).max else wmUs
              state.setTimeoutTimestamp(fireAtUs / 1000L + 1L)
            }
            Iterator.empty
          }
      }
  }

  /** Greedy first-touch fold of FINALIZED events (sorted by ts,
    * event_id) into the stage chain — the exact batch semantics
    * restricted to the finalized prefix. */
  private def fold(chain0: Seq[Long],
      evs: Seq[(Long, Long, Int)]): Array[Long] = {
    val chain = chain0.toArray
    evs.sortBy(e => (e._1, e._2)).foreach { case (us, _, k) =>
      // k outside [0, nSteps) = a non-step event passed through so the
      // upstream watermark sees every row (a pre-filter would be
      // pushed below the watermark node and starve it) — ignore here
      if (k == 0) { if (chain(0) == -1L) chain(0) = us }
      else if (k > 0 && k < chain.length && chain(k - 1) != -1L &&
        us > chain(k - 1) && chain(k) == -1L) chain(k) = us
    }
    chain
  }

  private def toOut(user: Long, chain: Array[Long]): FunnelOut = {
    val n = chain.length
    val stages = chain.count(_ != -1L)
    val span = if (chain(n - 1) == -1L) -1L
      else (chain(n - 1) - chain(0)) / 1000000L
    FunnelOut(user, stages, tsFromMicros(chain(0)), span)
  }

  private def micros(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  private def tsFromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
}
