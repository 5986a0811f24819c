package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication with BOUNDED state — the continuous
  * form of the batch content-hash dedup (graft.pipeline.Dedup.exact),
  * for deduplicating a document firehose at ingest time.
  *
  * `KeyValueGroupedDataset.flatMapGroupsWithState` keeps one tiny state
  * entry per content key: the first row of a key is emitted, every
  * later arrival is dropped, and an EVENT-TIME timeout expires idle
  * keys once the watermark passes their TTL, so state is bounded by
  * (distinct keys within the TTL window), not by stream length — the
  * bound a keyless `dropDuplicates` can't give. Event-time expiry (not
  * processing time) keeps the operator deterministic under replay and
  * backfill — rerunning the same stream gives the same survivors, the
  * property every other operator in this repo holds — and ties state
  * growth to data progress instead of wall clock. State is
  * hash-partitioned by key across executors: at 100 TB/day the state
  * store shards exactly like the batch dedup's groupBy shuffle.
  *
  * Re-emission semantics match web-crawl practice: content unseen for a
  * full TTL of event time is treated as new again (dedup windows, not
  * forever-dedup — forever requires the batch pipeline's store).
  */
object StreamDedup {

  /** First-seen filter over a streaming frame keyed by `keyCol`
    * (typically a content hash), with `tsCol` as the event-time column.
    * Emits each key's first row, drops arrivals within `ttlMs` of EVENT
    * time since the key's last sighting (sliding window). The TTL
    * decision lives in the state value itself (last-seen event time),
    * because Spark invokes a group that received data with
    * `hasTimedOut = false` even if its timeout already passed — the
    * event-time timeout here is purely state GC, firing once the
    * watermark moves a full TTL past a key's last sighting. The
    * caller's stream must tolerate `withWatermark(tsCol, 0 ms)` (carry
    * monotone-enough event time). Output mode: Append. */
  def firstSeen(df: DataFrame, keyCol: String, tsCol: String,
      ttlMs: Long): DataFrame = {
    val schema = df.schema
    val tsIdx = schema.fieldIndex(tsCol)
    implicit val rowEnc = Encoders.row(schema)
    implicit val keyEnc = Encoders.STRING
    implicit val stateEnc = Encoders.scalaLong
    df.withWatermark(tsCol, "0 milliseconds")
      .groupByKey((r: Row) => r.getAs[Any](keyCol).toString)
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove() // idle key: free the slot, key becomes new again
            Iterator.empty
          } else {
            // one key's arrivals within one batch — bounded by the batch,
            // and tiny for a content-hash key
            val rs = rows.toList
            val maxTs = rs.iterator
              .map(_.getAs[java.sql.Timestamp](tsIdx).getTime).max
            val fresh = !state.exists || maxTs - state.get > ttlMs
            // survivor = the EARLIEST row (tie-broken on full row text):
            // intra-group iterator order after a shuffle is not
            // guaranteed, so take(1) would make the surviving payload
            // depend on partitioning — minBy keeps replay deterministic
            val out =
              if (fresh)
                List(rs.minBy(r =>
                  (r.getAs[java.sql.Timestamp](tsIdx).getTime, r.toString)))
              else Nil
            state.update(maxTs) // last sighting; slides the window
            state.setTimeoutTimestamp(maxTs + ttlMs) // GC once watermark passes
            out.iterator
          }
      }.toDF(schema.fieldNames: _*)
  }
}
