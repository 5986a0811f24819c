package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join WITHOUT an equi key — "every event to the
  * maintenance windows / promo periods / sessions that contain it".
  * Spark plans a bare range predicate (no equality conjunct) as a
  * BroadcastNestedLoopJoin: per-pair work, |points|·|intervals|, the
  * same trap as the naive as-of join. Binning manufactures the equi
  * key: each interval explodes into the fixed-width time bins it
  * overlaps (fan-out ≤ span/binWidth + 1, bounded by `maxSpanSec`),
  * each point computes its single bin, the join runs as an ordinary
  * equi-shuffle on the bin, and the exact predicate filters inside the
  * bin's candidates. A (point, interval) match is found exactly once —
  * the point's bin is one of the interval's bins — so no dedup step
  * exists. Bounds are inclusive start, EXCLUSIVE end (the standard
  * window convention; makes adjacent intervals partition time).
  *
  * At 100 TB: one hash exchange per side keyed on the bin; bin width
  * trades fan-out (storage of the exploded interval side) against
  * candidate-set selectivity, and skew in a hot bin is ordinary
  * equi-join skew (AQE/salting apply). When a real equi key exists
  * (per-user intervals), add it to the join — Spark already
  * hash-joins that shape; this operator exists for the keyless case.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSec: Long, maxSpanSec: Long): DataFrame = {
    require(binSec >= 1 && maxSpanSec >= binSec)
    val s = unix_seconds(col(startCol))
    val e = unix_seconds(col(endCol))
    // a null/inverted/over-long interval would silently vanish (empty
    // sequence) or explode unboundedly — fail loudly; the guard rides
    // the bin expression so pruning cannot drop it
    val firstBin = when(
      s.isNull || e.isNull || e <= s || e - s > maxSpanSec,
      raise_error(lit(s"pointInInterval: interval must satisfy " +
        s"0 < end - start <= ${maxSpanSec}s and be non-null")))
      .otherwise(call_function("div", s, lit(binSec)))
    // exclusive end: the last covered bin holds instant end - 1
    val lastBin = call_function("div", e - 1, lit(binSec))
    val binned = intervals.withColumn("__bin",
      explode(sequence(firstBin, lastBin)))
    val probe = points.withColumn("__bin",
      call_function("div", unix_seconds(col(tsCol)), lit(binSec)))
    probe.join(binned, Seq("__bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }
}
