package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed KMV-minima aggregator: the mergeable-AGGREGATE form of
  * [[graft.pipeline.Sketches.kmvMinima]] — per group, the k smallest
  * DISTINCT h60 hash values, kept in a sorted O(k) buffer.
  *
  * Why it exists when the window form already does: this shape is a
  * real hash AGGREGATE, so Spark runs it with map-side partial
  * aggregation — every executor folds its shard into a ≤k-element
  * buffer and only those buffers shuffle, O(groups·k) bytes, no
  * distinct materialization and no rank window behind it. That is the
  * correct 100 TB plan for "distinct users per key, forever": state
  * bounded by construction, merge lossless (set-union then re-take the
  * k smallest — associative and commutative, same algebra the window
  * form's [[graft.pipeline.Sketches.merge]] property-tests). It is
  * also the form STRUCTURED STREAMING can maintain incrementally: a
  * streaming groupBy with this aggregator carries O(k) state per group
  * in the state store, where exact COUNT(DISTINCT) is unbounded.
  *
  * Determinism: input is the h60 hash (not the raw value), so the
  * buffer contents — and therefore the estimate — are bit-identical to
  * the window form's on any engine, any partitioning, any order.
  */
final class KmvAgg(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2 && k <= 10000)

  def zero: Array[Long] = Array.emptyLongArray

  def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h)

  def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(insert)

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  // sorted-insert with distinct semantics: a duplicate hash is a no-op,
  // a hash above the current k-th minimum (full buffer) is a no-op,
  // otherwise shift-insert and truncate to k
  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) buf
    else {
      val at = -i - 1
      if (buf.length >= k && at >= k) buf
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, at)
        out(at) = h
        System.arraycopy(buf, at, out, at + 1, n - at - 1)
        out
      }
    }
  }
}

object KmvAgg {
  import org.apache.spark.sql.functions.{lit, raise_error, when}

  /** Column form over a LONG hash column: `kmvMinimaAgg(16)(h)`.
    * Nulls fail loudly: the primitive-Long encoder would otherwise
    * coerce a null hash to 0 — the SMALLEST possible value — silently
    * entering it as a minimum and skewing the k-th-minimum estimate
    * (measured, not hypothetical). */
  def kmvMinimaAgg(k: Int): Column => Column =
    h => udaf(new KmvAgg(k), Encoders.scalaLong).apply(
      when(h.isNull, raise_error(
          lit("kmvMinimaAgg: null hash input"))).otherwise(h))
}
