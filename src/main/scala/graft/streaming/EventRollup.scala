package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked event-time windowed rollup over a metrics stream — the
  * streaming analogue of the per-db rollup tier. This goes beyond
  * reference parity (the reference has no event-time/late-data handling,
  * SURVEY.md §2.10) but is the natural continuous view of the same
  * aggregation: per (window, key) counts and value sums with bounded
  * state, emitted as windows close.
  *
  * At scale this is the standing pre-aggregation in front of the
  * snapshot store: state is bounded by (#keys × windows-in-watermark),
  * and the output stream appends straight into a `current_db`-shaped
  * tier.
  */
object EventRollup {

  /** @param events    streaming frame with `ts: timestamp`, key columns
    *                  and a `value: double` metric
    * @param keys      grouping keys (e.g. event_type)
    * @param windowLen e.g. "1 hour"
    * @param watermark allowed lateness, e.g. "10 minutes"
    */
  def rollup(
      events: DataFrame,
      keys: Seq[Column],
      windowLen: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen) +: keys: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .select(Seq(
        col("window.start").as("range_start"),
        col("window.end").as("range_end")) ++ keys ++ Seq(
        col("n"), col("sum_value"), col("min_value"), col("max_value")): _*)
}
