package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — split each key's event stream into
  * sessions wherever consecutive events are more than `gapSec` of event
  * time apart (the classic clickstream/user-activity operator; also the
  * batch analogue of Structured Streaming's session windows).
  *
  * Shape: one window shuffle on the key. The session boundary flag
  * (`lag`) and the running boundary count (`sum`) share the same
  * (key, order) window spec, so Catalyst evaluates both in a single
  * Window exec over a single sort — adding the session id costs exactly
  * one exchange at any scale, and skew is bounded by the busiest single
  * key's event count (150 users here; at 100 TB keys are users/devices,
  * naturally high-cardinality).
  */
object Sessions {

  /** Adds `session_seq` (1-based per key, in (ts, tieBreak) order): the
    * running count of gap boundaries. All integer/timestamp arithmetic —
    * microsecond-exact, engine-portable. `tieBreak` columns pin a total
    * order when timestamps can collide (pass the event id). */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, gapSec: Long,
      tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc +: tieBreak.map(_.asc): _*)
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapSec * 1000000L,
      1L).otherwise(0L)
    df.withColumn("session_seq", sum(isNew).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: event count, start/end, duration (floor
    * seconds). The groupBy keys extend the window's partition key, so
    * the aggregation reuses the sessionize exchange — still one shuffle
    * end-to-end. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
      gapSec: Long, tieBreak: Seq[Column] = Seq.empty): DataFrame =
    sessionize(df, keyCol, tsCol, gapSec, tieBreak)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .withColumn("duration_sec",
        expr("(unix_micros(session_end) - unix_micros(session_start)) DIV 1000000"))
}
