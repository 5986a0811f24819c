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
  * ALL bin arithmetic runs on integer epoch MICROSECONDS — the
  * timestamps' native precision — so the bin math and the exact
  * predicate can never disagree. (Binning on truncated seconds has a
  * silent-miss class: an instant inside the interval but sharing its
  * truncated second with an exclusive end that sits on a bin boundary
  * lands one bin past the interval's last covered bin.)
  *
  * At 100 TB: one hash exchange per side keyed on the bin; bin width
  * trades fan-out (storage of the exploded interval side) against
  * candidate-set selectivity, and skew in a hot bin is ordinary
  * equi-join skew (AQE/salting apply). When a real equi key exists
  * (per-user intervals), add it to the join — Spark already
  * hash-joins that shape; this operator exists for the keyless case.
  */
object RangeJoin {

  private def binOf(us: Column, binUs: Long): Column =
    call_function("div", us, lit(binUs))

  private def guardedFirstBin(s: Column, e: Column, binUs: Long,
      maxSpanUs: Long, op: String): Column =
    when(s.isNull || e.isNull || e <= s || e - s > maxSpanUs,
      raise_error(lit(s"$op: interval must satisfy " +
        s"0 < end - start <= ${maxSpanUs / 1000000L}s and be non-null")))
      .otherwise(binOf(s, binUs))

  def pointInInterval(points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSec: Long, maxSpanSec: Long): DataFrame = {
    require(binSec >= 1 && maxSpanSec >= binSec)
    val binUs = binSec * 1000000L
    val s = unix_micros(col(startCol))
    val e = unix_micros(col(endCol))
    // a null/inverted/over-long interval would silently vanish (empty
    // sequence) or explode unboundedly — fail loudly; the guard rides
    // the bin expression so pruning cannot drop it
    val firstBin = guardedFirstBin(s, e, binUs,
      maxSpanSec * 1000000L, "pointInInterval")
    // exclusive end: the last covered bin holds instant end - 1µs
    val binned = intervals.withColumn("__bin",
      explode(sequence(firstBin, binOf(e - 1, binUs))))
    val probe = points.withColumn("__bin",
      binOf(unix_micros(col(tsCol)), binUs))
    probe.join(binned, Seq("__bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval-OVERLAP join, binned and DEDUP-FREE: two intervals that
    * overlap share every bin of their intersection, so a naive binned
    * join would emit the pair once per shared bin. The OWNER-BIN rule
    * removes the duplicate emission instead of a dedup stage: a pair
    * is emitted only in the FIRST bin of the overlap —
    * `max(firstBin(a), firstBin(b))` — which both sides provably cover
    * (in µs arithmetic: overlap means each start precedes the other's
    * exclusive end, so `s_b ≤ e_a − 1` and the max of first bins is ≤
    * each side's last covered bin). Every overlapping pair therefore
    * matches in exactly one bin and a `distinct()` — a full extra
    * shuffle at fact scale — never exists. Overlap is the
    * half-open-interval standard: `a.start < b.end AND b.start <
    * a.end`. Both inputs get the same loud span guard; left and right
    * columns survive with their own names (callers alias collisions
    * first). */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      binSec: Long, maxSpanSec: Long): DataFrame = {
    require(binSec >= 1 && maxSpanSec >= binSec)
    val binUs = binSec * 1000000L
    def bins(df: DataFrame, sCol: String, eCol: String,
        firstName: String): DataFrame = {
      val s = unix_micros(col(sCol))
      val e = unix_micros(col(eCol))
      df.withColumn(firstName, guardedFirstBin(s, e, binUs,
          maxSpanSec * 1000000L, "intervalOverlap"))
        .withColumn("__bin",
          explode(sequence(col(firstName), binOf(e - 1, binUs))))
    }
    val l = bins(left, lStart, lEnd, "__lfirst")
    val r = bins(right, rStart, rEnd, "__rfirst")
    l.join(r, Seq("__bin"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("__bin") === greatest(col("__lfirst"), col("__rfirst")))
      .drop("__bin", "__lfirst", "__rfirst")
  }
}
