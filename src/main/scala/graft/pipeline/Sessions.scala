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

  /** Ordered funnel progression per key — the conversion analytic:
    * given an ordered step list (e.g. view → click → purchase), each
    * key's stage-k timestamp is the EARLIEST step-k event strictly
    * after its stage-(k−1) timestamp (greedy first-touch; strict `>`
    * so a same-instant later step never counts). Output one row per
    * key that entered the funnel: `stages` reached, `ts_first`
    * (stage-1 instant) and `span_sec` (full-completion span, −1 while
    * incomplete — no NULLs to trip hash compares).
    *
    * Shape: the stage chain is N chained per-key window minimums over
    * the SAME partitioning — one exchange total, no self-joins (the
    * SQL formulation is N−1 joins; here stage k's conditional min just
    * references stage k−1's window column). The final per-key rollup
    * reuses the window exchange's hash distribution. Works for any
    * number of steps ≥ 2. */
  def funnel(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val w = Window.partitionBy(col(keyCol))
    val s0 = df.withColumn("__s0",
      min(when(col(typeCol) === steps.head, col(tsCol))).over(w))
    val staged = steps.indices.tail.foldLeft(s0) { (d, i) =>
      d.withColumn(s"__s$i",
        min(when(col(typeCol) === steps(i) &&
          col(tsCol) > col(s"__s${i - 1}"), col(tsCol))).over(w))
    }
    val last = col(s"__s${steps.size - 1}")
    val stages = steps.indices.tail.foldLeft(lit(1)) { (acc, i) =>
      acc + when(col(s"__s$i").isNotNull, 1).otherwise(0) }
    staged.filter(col("__s0").isNotNull)
      .groupBy(col(keyCol))
      .agg(first(stages.cast("int")).as("stages"),
        first(col("__s0")).as("ts_first"),
        first(coalesce(
          call_function("div",
            unix_micros(last) - unix_micros(col("__s0")), lit(1000000L)),
          lit(-1L))).as("span_sec"))
  }

  /** Merge overlapping/touching intervals per key into disjoint spans —
    * the temporal-coverage primitive ([[sessionize]] merges POINTS by
    * gap; this merges INTERVALS by overlap: activity windows, lease
    * spans, validity ranges). Island detection: an interval starts a
    * new merged span iff its start exceeds the running max end of all
    * PRECEDING intervals (the rows-between(-∞, −1) frame — the current
    * row must not see itself). One window + one aggregate, both keyed
    * on `keyCol` — a single exchange; all integer microsecond math.
    * `startCol`/`endCol` are epoch-micros longs; half-open or closed
    * semantics are the caller's via `touchGapMicros` (0 = merge only
    * true overlaps/touching). */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, tieBreak: Seq[Column] = Seq.empty,
      touchGapMicros: Long = 0L): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol).asc +: col(endCol).asc +:
        tieBreak.map(_.asc): _*)
    val prevMaxEnd = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val isNew = when(prevMaxEnd.isNull ||
      col(startCol) > prevMaxEnd + touchGapMicros, 1L).otherwise(0L)
    df.withColumn("span_seq", sum(isNew).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("span_seq"))
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** SCD-2 validity intervals from a snapshot/observation stream —
    * the recrawl-pipeline question "when did this entity hold this
    * value": consecutive equal-value observations per key collapse
    * into one row with `valid_from` = first observation and
    * `valid_to` = the NEXT run's start (null while current — the
    * half-open superseded-by convention). Gaps-and-islands: a lag
    * change flag, a running island id, one group-by, and a lead for
    * the handover — every window and the aggregate keyed on
    * `keyCol`, so the whole operator is ONE key exchange. Ties on
    * `tsCol` are resolved by `tieBreak` (supply one when observation
    * timestamps can repeat per key — an unordered tie would make the
    * island ids nondeterministic). */
  def validityIntervals(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc +: tieBreak.map(_.asc): _*)
    // NULL-SAFE change detection (<=>): a null observation must close
    // the running island and open its own, exactly like the oracle's
    // IS DISTINCT FROM — a bare =!= evaluates to null against NULL and
    // would silently fold null observations into the preceding run.
    // The first row's lag is null-vs-value -> distinct -> 1, so the
    // separate isNull arm is subsumed (a leading NULL value still
    // opens an island: null <=> null on later rows is true -> 0).
    val prev = lag(col(valueCol), 1).over(w)
    val isFirst = lag(lit(1), 1).over(w).isNull
    val changed = when(isFirst || !(prev <=> col(valueCol)), 1L)
      .otherwise(0L)
    val islands = df
      .withColumn("__isl", sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__isl"))
      .agg(first(col(valueCol)).as("value"),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_obs"))
    val wi = Window.partitionBy(col(keyCol)).orderBy(col("__isl").asc)
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wi))
      .select(col(keyCol), col("value"), col("valid_from"),
        col("valid_to"), col("n_obs"))
  }
}
