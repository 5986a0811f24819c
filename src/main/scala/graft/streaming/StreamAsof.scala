package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward AS-OF enrichment — the continuous form of
  * graft.operators.AsofJoin.backward: a probe stream (events asking
  * "the latest quote value at or before my timestamp") joined against a
  * quote stream (a slowly-changing per-key timeline), both arriving on
  * ONE tagged stream. The flink-style event-time enrichment join that
  * stream-stream interval joins cannot express (they bound BOTH sides
  * by an interval; as-of needs "latest ≤ ts, however old").
  *
  * Correctness contract (watermark-driven finalization): a probe at
  * event time t is emitted only once the watermark passes t — at that
  * point every quote with ts ≤ t has either arrived or is late beyond
  * the allowance (the same loss contract every watermarked stream op
  * has), so the emitted match equals the batch as-of join's. Emission
  * is APPEND mode, exactly once per probe; unmatched probes emit a null
  * value (left semantics). Duplicate (key, ts) quotes resolve to the
  * MAX value, deterministically (the batch oracle's tie rule).
  *
  * State per key is BOUNDED by the watermark, not the stream: pending
  * probes ≥ watermark, quotes inside the watermark window, plus ONE
  * floor quote below it (the key's last-known value — which is the
  * as-of semantic itself; an idle-key TTL like StreamDedup's slots in
  * where business rules allow forgetting). Event-time timeouts finalize
  * probes whose key receives no further data. Keys hash-partition
  * across executors exactly like the batch join's shuffle — the shape
  * that holds on an unbounded firehose.
  *
  * Timestamps are compared at MICROsecond precision (the events
  * table's resolution); watermark/timeout bookkeeping is Spark's
  * millisecond clock, and the finalize rule (probe ms strictly below
  * watermark ms) is chosen so no on-time micro-precision quote can be
  * missed.
  */
object StreamAsof {

  /** Input row: key, event-time micros, side ("p" probe / "q" quote),
    * probe id, quote value. */
  case class In(k: Long, us: Long, side: String,
    id: Option[Long], v: Option[Long])
  case class AsofState(quotes: Seq[(Long, Long)],
    probes: Seq[(Long, Long)])

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  /** Enrich the probe side of a tagged stream. `df` must carry:
    * `keyCol` (long), `tsCol` (timestamp, the watermark column),
    * `sideCol` (string: "p" = probe, "q" = quote), `idCol` (long probe
    * id; ignored on quotes), `valCol` (long quote value; ignored on
    * probes). Returns an append-mode stream
    * (key, ts, id, asof_value) with one row per probe. */
  def backwardEnrich(df: DataFrame, keyCol: String, tsCol: String,
      sideCol: String, idCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    implicit val keyEnc = Encoders.scalaLong
    implicit val stEnc = Encoders.product[AsofState]
    implicit val outEnc = Encoders.product[(Long, java.sql.Timestamp,
      Long, Option[Long])]
    // the watermark column must survive to the stateful operator, so
    // rows stay untyped (a typed .map would sever the event-time
    // attribute — same pattern as StreamDedup)
    val tagged = df
      .select(col(keyCol).cast("long").as("k"), col(tsCol).as("ts"),
        col(sideCol).cast("string").as("side"),
        col(idCol).cast("long").as("id"), col(valCol).cast("long").as("v"))
      .withWatermark("ts", "0 milliseconds")
    tagged.groupByKey((r: Row) => r.getLong(0))
      .flatMapGroupsWithState[AsofState, (Long, java.sql.Timestamp, Long, Option[Long])](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: Long, it: Iterator[Row], state: GroupState[AsofState]) =>
          val st = state.getOption.getOrElse(AsofState(Nil, Nil))
          val arrivals = it.toList.map { r =>
            In(r.getLong(0), micros(r.getTimestamp(1)), r.getString(2),
              if (r.isNullAt(3)) None else Some(r.getLong(3)),
              if (r.isNullAt(4)) None else Some(r.getLong(4)))
          }
          // merge arrivals; keep both buffers sorted ((ts, v)/(ts, id)).
          // Null payloads fail LOUDLY with a diagnosable message — a
          // bare .get would NPE deep inside the state store
          var quotes = (st.quotes ++ arrivals.collect {
            case a if a.side == "q" => (a.us, a.v.getOrElse(
              throw new IllegalArgumentException(
                s"StreamAsof: quote with null value (key $k)"))) })
            .distinct.sorted
          val probes = (st.probes ++ arrivals.collect {
            case a if a.side == "p" => (a.us, a.id.getOrElse(
              throw new IllegalArgumentException(
                s"StreamAsof: probe with null id (key $k)"))) }).sorted
          val wMs = state.getCurrentWatermarkMs()
          // FINALIZE probes strictly below the watermark millisecond: no
          // on-time quote at or before them can still arrive
          val (ready, pending) = probes.partition(_._1 / 1000 < wMs)
          val out = ready.map { case (pus, pid) =>
            // latest quote ≤ probe ts; sorted (ts, v) → ties pick max v
            val m = quotes.view.takeWhile(_._1 <= pus).lastOption
            (k, fromMicros(pus), pid, m.map(_._2))
          }
          // retention: everything from the newest finalized-window floor
          // quote onward (the last-known value for future probes)
          val floor = quotes.view.takeWhile(_._1 / 1000 < wMs).lastOption
          floor.foreach(f => quotes = quotes.dropWhile(_._1 < f._1))
          if (pending.isEmpty && quotes.isEmpty) state.remove()
          else {
            state.update(AsofState(quotes, pending))
            if (pending.nonEmpty)
              // fires once the watermark passes the oldest pending probe
              // (must sit strictly above the current watermark)
              state.setTimeoutTimestamp(
                math.max(pending.head._1 / 1000, wMs + 1))
          }
          out.iterator
      }
      .toDF(keyCol, tsCol, idCol, "asof_value")
  }
}
