package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.core.Engine

/** Streaming front-end for the ingest path — the Spark-native equivalent
  * of the reference's wall-clock bgworker loop (powa.c:426-505) fused
  * with the remote collector's staging writes (SURVEY.md §2.10, §3.2).
  *
  * The reference is micro-batch by construction: every `powa.frequency`
  * seconds it drains `*_src_tmp` staging and appends to current, every
  * Nth batch it aggregates, the batch after it purges. Structured
  * Streaming's `Trigger.ProcessingTime` + `foreachBatch` reproduces
  * exactly that state machine, with the engine's cadence arithmetic
  * (coalesce_seq, srvid % 20 de-phasing) unchanged: each micro-batch is
  * one `powa_take_snapshot` tick per server that received rows.
  *
  * No watermarks/event-time windows — the reference ingests staged rows
  * verbatim with their own `ts` and has no late-data semantics
  * (SURVEY.md §2.10); watermarking would be an extension, not parity.
  */
object StreamIngest {

  /** Wire a streaming staging source (readStream of `*_src_tmp`-shaped
    * rows for one datasource) into the engine: each micro-batch lands in
    * staging, then ticks the snapshot state machine for every server
    * present in the batch.
    *
    * @param stream  streaming DataFrame with the datasource's staging
    *                schema (srvid, ts, keys..., counters...)
    * @param tickNow wall-clock supplier for metas stamping (injectable
    *                for deterministic tests)
    */
  def attach(
      engine: Engine,
      dsName: String,
      stream: DataFrame,
      trigger: Trigger = Trigger.ProcessingTime("300 seconds"),
      tickNow: () => java.sql.Timestamp =
        () => new java.sql.Timestamp(System.currentTimeMillis()))
      : DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val servers = batch.select("srvid").distinct()
          .collect().map(_.getInt(0)).sorted
        if (servers.nonEmpty) {
          engine.ingest(dsName, batch)
          servers.foreach { srvid =>
            if (engine.registry.serverIds.contains(srvid))
              engine.takeSnapshot(srvid, tickNow())
          }
        }
      }

  /** Convenience: start and return the query. */
  def start(
      engine: Engine,
      dsName: String,
      stream: DataFrame,
      trigger: Trigger = Trigger.ProcessingTime("300 seconds")): StreamingQuery =
    attach(engine, dsName, stream, trigger).start()
}
