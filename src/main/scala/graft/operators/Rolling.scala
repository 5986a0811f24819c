package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing event-time window aggregates — "each event's stats over the
  * preceding N seconds of the same key" (rate limiting, burst
  * detection, time-decayed features for training data). A RANGE-framed
  * window over integer epoch microseconds: engine-portable (DuckDB's
  * RANGE over a numeric ORDER BY has identical tie semantics — every
  * row at the same instant is in every same-instant row's frame,
  * regardless of tie order, which a ROWS frame cannot guarantee).
  *
  * Scale shape: ONE shuffle (the key partition); the range frame is
  * evaluated with a sliding two-pointer pass over each key's sorted
  * series, linear work, memory bounded by the widest in-range span —
  * never a self-join (the naive `e1 ⋈ e2 ON ts BETWEEN` form is a
  * per-key quadratic BroadcastNestedLoopJoin, same trap as the as-of
  * range join).
  */
object Rolling {

  /** Append each named aggregate expression (e.g. `count(lit(1))`,
    * `sum(col("cents"))`) evaluated over the trailing `rangeSec`
    * seconds (inclusive of the current instant) per `keyCols`. `tsCol`
    * must be a timestamp column; ordering happens on its integer
    * microseconds. */
  def trailing(df: DataFrame, keyCols: Seq[String], tsCol: String,
      rangeSec: Long, aggs: Seq[(String, Column)]): DataFrame = {
    // an agg OUTPUT name colliding with an input column would silently
    // replace it — and a later agg in the fold reading that column
    // would then aggregate the rolling result, not the data. Loud > wrong.
    val clash = aggs.map(_._1).filter(df.columns.contains)
    require(clash.isEmpty,
      s"trailing agg name(s) ${clash.mkString(", ")} collide with input columns")
    // collision-free working column (same rule as SkewJoin): taken
    // names include the AGG OUTPUTS too — an agg named __epoch_us
    // would otherwise clobber the ordering column mid-fold and the
    // final drop would delete the user's result
    val taken = df.columns.toSet ++ aggs.map(_._1)
    val epochCol = Iterator.iterate("__epoch_us")(_ + "_")
      .dropWhile(taken.contains).next()
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(epochCol))
      .rangeBetween(-rangeSec * 1000000L, 0L)
    val withEpoch = df.withColumn(epochCol, unix_micros(col(tsCol)))
    aggs.foldLeft(withEpoch) { case (acc, (name, aggExpr)) =>
      acc.withColumn(name, aggExpr.over(w))
    }.drop(epochCol)
  }
}
