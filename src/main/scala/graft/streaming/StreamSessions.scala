package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Native Structured Streaming sessionization — the continuous analogue
  * of the batch gap-sessionizer (graft.pipeline.Sessions). Spark's
  * `session_window` merges events whose `[ts, ts+gap]` ranges touch —
  * an event EXACTLY `gap` after the previous one still merges
  * (boundary-inclusive, identical to the batch operator's `>` split;
  * StreamIngestSpec pins this), keeping per-key session state that is
  * evicted once the watermark passes the session's end.
  *
  * At 100 TB this is the standing session store for a clickstream: state
  * is bounded by (#active keys in the watermark horizon), the shuffle is
  * on the session key, and closed sessions stream out append-only. The
  * deterministic oracle gate runs it in `complete` mode (no watermark
  * eviction → batch-identical output); production uses `append` +
  * watermark, covered by StreamIngestSpec.
  */
object StreamSessions {

  /** Per-session rollup: `key`, `session_window{start,end}`, `n_events`,
    * plus caller aggregates (e.g. `max(ts)` for the last-event stamp —
    * `session_window.end` is last-event + gap, not last-event).
    *
    * @param gap       e.g. "30 minutes"
    * @param watermark allowed lateness, e.g. "10 minutes"
    */
  def sessionStats(
      events: DataFrame,
      key: Column,
      tsCol: String,
      gap: String,
      watermark: String,
      extraAggs: Seq[Column] = Seq.empty): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(key, session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"), extraAggs: _*)
}
