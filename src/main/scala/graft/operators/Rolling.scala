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

  /** Engine-exact exponential recency decay: per key, the sum of each
    * row's NON-NEGATIVE integer `value` arithmetically right-shifted by
    * its age in half-lives relative to the key's LATEST event —
    * `Σ value >> min((t_max − ts) / halfLifeSec, 63)`. Each elapsed
    * half-life halves a contribution (truncating), so this is the
    * EWMA-style popularity/recency feature in pure integer math:
    * bit-identical in any engine (DuckDB `>>`), no float pow/exp
    * (cross-engine float decay is exactly the class of nondeterminism
    * the FP rules here ban). The shift is capped at 63 because both
    * Java and DuckDB mod the shift amount otherwise — an event 64
    * half-lives old would wrap around to full weight.
    *
    * Shape: the per-key max-ts window and the final sum share one hash
    * exchange on the key — a two-pass aggregate, no join, no self-join.
    * Emits one row per key: `decayed_<n>` per value plus `t_ref`. */
  def decayedSum(df: DataFrame, keyCols: Seq[String], tsCol: String,
      halfLifeSec: Long, values: Seq[(String, Column)]): DataFrame = {
    require(halfLifeSec >= 1)
    val clash = (values.map(_._1) :+ "t_ref").filter(df.columns.contains)
    require(clash.isEmpty,
      s"decayedSum output name(s) ${clash.mkString(", ")} collide with input columns")
    val taken = df.columns.toSet ++ values.map(_._1) + "t_ref"
    val ageCol = Iterator.iterate("__age_hl")(_ + "_")
      .dropWhile(taken.contains).next()
    // a null ts would null the age and silently drop the row from every
    // sum — same loud-guard rule as the value guard below
    val sec = when(col(tsCol).isNull, raise_error(
        lit("decayedSum: null timestamp")))
      .otherwise(unix_seconds(col(tsCol)))
    val tMax = max(sec).over(Window.partitionBy(keyCols.map(col): _*))
    val age = least(
      call_function("div", tMax - sec, lit(halfLifeSec)),
      lit(63L))
    val decayed = values.map { case (name, v) =>
      // a negative value's arithmetic shift rounds toward -inf, which
      // silently diverges from DuckDB's — and from any sane reading of
      // "halve it"; nulls would vanish from the sum. Loud > wrong.
      val guarded = when(v.isNull || v < 0, raise_error(
          lit(s"decayedSum: $name must be non-negative and non-null")))
        .otherwise(v.cast("long"))
      sum(call_function("shiftright", guarded, col(ageCol))).as(name)
    }
    val aggs = max(col(tsCol)).as("t_ref") +: decayed
    df.withColumn(ageCol, age) // window pass; the agg below reuses its exchange
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
