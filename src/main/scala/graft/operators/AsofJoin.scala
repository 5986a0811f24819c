package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — "attach the most recent right-side record at
  * or before each left row's timestamp, per key" (the canonical
  * metric-vs-event alignment query; DuckDB/Pandas expose it as
  * `ASOF JOIN` / `merge_asof`, Spark has no built-in), plus the forward
  * direction ("the earliest right record at or after" — label
  * lookahead / next-event attribution).
  *
  * Spark-first shape: NOT a range join (`l.ts >= r.ts` theta-joins
  * explode quadratically per key and Spark plans them as
  * BroadcastNestedLoopJoin), but union + one running pick over one
  * (key, ts)-sorted window:
  *
  *   - tag right rows and left rows with a side marker, union them;
  *   - one window partitioned by key, ordered by (ts, side):
  *     BACKWARD uses frame (-inf, current) and running
  *     `last(right, ignoreNulls)` with the right side ordered FIRST at
  *     equal timestamps; FORWARD uses frame (current, +inf) and running
  *     `first(right, ignoreNulls)` with the right side ordered LAST —
  *     both make an equal-timestamp right row visible (inclusive
  *     semantics, matching DuckDB's `<=` / `>=`);
  *   - keep the left rows.
  *
  * Cost: exactly ONE shuffle (the window partition), linear work, and
  * skew bounded by the largest single key's series — the shape that
  * survives 100 TB where a per-key nested loop cannot. With multiple
  * right rows on the same (key, ts) the surviving payload is
  * tie-ambiguous (same as the reference engines); pre-aggregate the
  * right side to unique (key, ts) when determinism matters.
  */
object AsofJoin {

  /** Backward inclusive as-of join. Output: every `left` column, plus
    * `right`'s `payloadCols` from the matched row and `asof_ts` (the
    * matched right timestamp) — all null when no right row is at or
    * before the left row (left-join semantics). `toleranceMs` nulls out
    * matches older than `leftTs − tolerance` (merge_asof's tolerance).
    * Key + payload column names must not collide with left's columns. */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame =
    asof(left, right, keyCols, tsCol, payloadCols, toleranceMs,
      forwardDir = false)

  /** Forward inclusive as-of join: the EARLIEST right row at or after
    * each left timestamp — next-quote attribution, label lookahead.
    * `toleranceMs` nulls out matches further ahead than
    * `leftTs + tolerance`. Same single-shuffle shape as [[backward]]. */
  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      toleranceMs: Option[Long] = None): DataFrame =
    asof(left, right, keyCols, tsCol, payloadCols, toleranceMs,
      forwardDir = true)

  private def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, payloadCols: Seq[String], toleranceMs: Option[Long],
      forwardDir: Boolean): DataFrame = {
    val keys = keyCols.map(col)
    val leftPayload = left.columns.filterNot(keyCols.contains).toSeq
    val lStruct = struct(leftPayload.map(col): _*)
    val rStruct = struct((col(tsCol).as("__asof_ts") +:
      payloadCols.map(col)): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    // side ordering puts the right row on the window-frame side of an
    // equal-timestamp left row: backward scans (-inf, cur] so right
    // sorts first (0); forward scans [cur, +inf) so right sorts last
    val (lSide, rSide) = if (forwardDir) (0, 1) else (1, 0)
    val l2 = left.select(keys :+ col(tsCol).as("__ts") :+
      lit(lSide).as("__side") :+ lStruct.as("__l") :+
      lit(null).cast(rType).as("__r"): _*)
    val r2 = right.select(keys :+ col(tsCol).as("__ts") :+
      lit(rSide).as("__side") :+ lit(null).cast(lType).as("__l") :+
      rStruct.as("__r"): _*)

    val base = Window.partitionBy(keys: _*)
      .orderBy(col("__ts").asc, col("__side").asc)
    val pick: Column =
      if (forwardDir)
        first(col("__r"), ignoreNulls = true).over(
          base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("__r"), ignoreNulls = true).over(
          base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val matched = l2.unionByName(r2)
      .withColumn("__m", pick)
      .filter(col("__side") === lSide)

    val bounded = toleranceMs match {
      case Some(tol) if forwardDir => matched.withColumn("__m",
        when(col("__m.__asof_ts") <=
          col("__ts") + expr(s"INTERVAL $tol MILLISECOND"), col("__m")))
      case Some(tol) => matched.withColumn("__m",
        when(col("__m.__asof_ts") >=
          col("__ts") - expr(s"INTERVAL $tol MILLISECOND"), col("__m")))
      case None => matched
    }
    bounded.select(keys ++ Seq(col("__ts").as(tsCol)) ++
      leftPayload.filterNot(_ == tsCol).map(n => col(s"__l.$n").as(n)) ++
      payloadCols.map(n => col(s"__m.$n").as(n)) :+
      col("__m.__asof_ts").as("asof_ts"): _*)
  }
}
