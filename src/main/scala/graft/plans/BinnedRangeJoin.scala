package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a keyless point-in-interval join — which
  * Spark can only plan as a BroadcastNestedLoopJoin, O(|points| ×
  * |intervals|) — into the binned equi-join `operators.RangeJoin`
  * implements at the DataFrame level, so users who write the natural
  *
  *   points.join(intervals, p("ts") >= i("lo") && p("ts") < i("hi"))
  *
  * get the O(n) plan without knowing the trick. The reference's
  * range-overlap readback (`powa--5.2.0.sql:1329-1332`, the tstzrange
  * `&&` predicates) is the same class of predicate; this rule is the
  * engine-wide version of that operator's fix.
  *
  * Mechanics (identical µs-integer bin math as RangeJoin — Scaladoc
  * there explains why seconds-truncated binning silently misses):
  * the interval side `Generate`s the bin sequence
  * `trunc(lo µs / bin) .. trunc(hi µs / bin)`, the point side projects
  * its single bin, the join becomes `pointBin = intervalBin AND
  * <original condition>`. The bin range is a SUPERSET of the covered
  * bins for every bounds-strictness variant (truncation is monotone,
  * so lo ≤ ts ≤ hi pins trunc(ts) inside it), and the untouched
  * original condition runs as the in-bin residual — the rewrite can
  * never change the result set, only the plan.
  *
  * Safety gates (the rule is CONSERVATIVE — it must never regress a
  * plan Spark already handles):
  *   - inert unless `spark.graft.rangeJoin.binSeconds` > 0;
  *   - INNER joins only, deterministic condition;
  *   - never fires when any equi-conjunct pairs the two sides (Spark
  *     hash-joins that shape already);
  *   - exactly one lower and one upper bound on the SAME timestamp
  *     expression, point refs wholly from one side, bounds wholly from
  *     the other;
  *   - an interval longer than `spark.graft.rangeJoin.maxSpanSeconds`
  *     (default 31 days) raises a descriptive error at execution
  *     rather than exploding unboundedly — same loud-guard rule as
  *     RangeJoin;
  *   - fires at most once per join: the rewritten join carries an
  *     equi-conjunct, which disqualifies it from matching again.
  *
  * Registered by [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) for `spark.sql.extensions` users, or at
  * runtime via [[BinnedRangeJoinRule.install]]
  * (`spark.experimental.extraOptimizations`).
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinConf = "spark.graft.rangeJoin.binSeconds"
  val SpanConf = "spark.graft.rangeJoin.maxSpanSeconds"

  /** Runtime installation (idempotent) — extraOptimizations runs in the
    * optimizer's user-provided batch, after the analyzer, which is why
    * every expression built here is constructed fully resolved. */
  def install(spark: SparkSession, binSeconds: Long): Unit = {
    spark.conf.set(BinConf, binSeconds.toString)
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val binSec =
      try conf.getConfString(BinConf, "0").toLong catch {
        case _: NumberFormatException => 0L }
    if (binSec <= 0) plan
    else {
      val maxSpanSec =
        try conf.getConfString(SpanConf, (31L * 86400).toString).toLong
        catch { case _: NumberFormatException => 31L * 86400 }
      plan.transformUp {
        case j @ Join(_, _, Inner, Some(cond), _) if cond.deterministic =>
          rewrite(j, cond, binSec * 1000000L, maxSpanSec * 1000000L)
            .getOrElse(j)
      }
    }
  }

  /** A conjunct `lo <= p` / `lo < p` (any orientation) classified as a
    * bound: (point expr, bound expr, isLower). */
  private def asBound(e: Expression): Option[(Expression, Expression, Boolean)] =
    e match {
      case GreaterThanOrEqual(p, b) => Some((p, b, true))
      case GreaterThan(p, b) => Some((p, b, true))
      case LessThanOrEqual(p, b) => Some((p, b, false))
      case LessThan(p, b) => Some((p, b, false))
      case _ => None
    }

  private def rewrite(j: Join, cond: Expression, binUs: Long,
      maxSpanUs: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    def fromOnly(e: Expression, side: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
        e.deterministic

    def binOf(usExpr: Expression): Expression =
      IntegralDivide(usExpr, Literal(binUs))

    /** Last bin to explode for interval [lo, hi]: trunc(hi / bin), with
      * the RangeJoin loud guard. Over-long intervals always raise
      * (unbounded explode). Inverted intervals raise only where the
      * rewrite's coverage proof needs interval validity (the overlap
      * owner-bin rule); the point-in-interval path tolerates them — an
      * inverted interval's descending bin sequence covers the same bin
      * SET and the residual filters every phantom pair. */
    def guardedStop(loUs: Expression, hiUs: Expression,
        raiseOnInverted: Boolean, what: String): Expression = {
      val bad =
        if (raiseOnInverted)
          Or(LessThanOrEqual(hiUs, loUs),
            GreaterThan(Subtract(hiUs, loUs), Literal(maxSpanUs)))
        else GreaterThan(Subtract(hiUs, loUs), Literal(maxSpanUs))
      If(bad,
        Cast(RaiseError(Literal(
          s"BinnedRangeJoinRule ($what): interval must satisfy " +
            s"0 < end - start <= $SpanConf (${maxSpanUs / 1000000L}s) — " +
            "raise the conf or pre-split the interval")), LongType),
        binOf(hiUs))
    }

    // an equi-conjunct between the sides → Spark hash-joins already
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (fromOnly(a, j.left) && fromOnly(b, j.right)) ||
          (fromOnly(a, j.right) && fromOnly(b, j.left))
      case EqualNullSafe(a, b) =>
        (fromOnly(a, j.left) && fromOnly(b, j.right)) ||
          (fromOnly(a, j.right) && fromOnly(b, j.left))
      case _ => false
    }
    if (hasEqui) return None

    // normalize bounds so the point expr is the `p` slot; keep only
    // timestamp-typed, strictly side-separated ones
    val bounds = conjuncts.flatMap { c =>
      asBound(c) match {
        // p OP bound  with p from left, bound from right (or flipped)
        case Some((p, b, isLower)) =>
          val ok = p.dataType == TimestampType && b.dataType == TimestampType
          if (!ok) None
          else if (fromOnly(p, j.left) && fromOnly(b, j.right))
            Some((p, b, isLower, true)) // point on left
          else if (fromOnly(p, j.right) && fromOnly(b, j.left))
            Some((p, b, isLower, false)) // point on right
          else None
        case None => None
      }
    }
    // exactly one lower + one upper over the SAME point expression,
    // point on a consistent side
    val grouped = bounds.groupBy { case (p, _, _, leftPoint) =>
      (p.canonicalized, leftPoint) }
    val candidate = grouped.collectFirst {
      case (_, bs) if bs.exists(_._3) && bs.exists(!_._3) &&
          bs.count(_._3) == 1 && bs.count(!_._3) == 1 =>
        val lower = bs.find(_._3).get
        val upper = bs.find(!_._3).get
        (lower._1, lower._2, upper._2, lower._4)
    }
    // Sequence is TimeZoneAwareExpression: resolved only once the
    // timezone is pinned (integral sequences never consult it)
    def binSeq(first: Expression, stop: Expression): Expression =
      new Sequence(first, stop, None, Some(conf.sessionLocalTimeZone))

    def explodeBins(side: LogicalPlan, seqExpr: Expression,
        attrName: String): (Generate, AttributeReference) = {
      val attr = AttributeReference(attrName, LongType, nullable = false)()
      (Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(attr), child = side), attr)
    }

    val pointRewrite = candidate.map { case (point, lo, hi, pointOnLeft) =>
      val (pointSide, intervalSide) =
        if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      // point side: project the single bin
      val pBinAlias = Alias(binOf(UnixMicros(point)), "__graft_bin_p")()
      val pointProj = Project(pointSide.output :+ pBinAlias, pointSide)

      // interval side: explode trunc(lo/bin)..trunc(hi/bin)
      val loUs = UnixMicros(lo)
      val hiUs = UnixMicros(hi)
      val (gen, iBinAttr) = explodeBins(intervalSide,
        binSeq(binOf(loUs), guardedStop(loUs, hiUs,
          raiseOnInverted = false, "point-in-interval")),
        "__graft_bin_i")

      val newCond = And(EqualTo(pBinAlias.toAttribute, iBinAttr), cond)
      val (newLeft, newRight) =
        if (pointOnLeft) (pointProj, gen) else (gen, pointProj)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond),
        j.hint))
    }

    pointRewrite.orElse(overlapRewrite(j, cond, conjuncts,
      binOf, guardedStop, binSeq, explodeBins))
  }

  /** Interval-OVERLAP rewrite: conjuncts `aLo < bHi AND bLo < aHi`
    * (strict or non-strict, any orientation) — the keyless
    * interval-overlap join `operators.RangeJoin.intervalOverlap`
    * covers. Both sides explode their bin ranges and the OWNER-BIN
    * rule — pair emitted only where the shared bin equals
    * `greatest(firstBinA, firstBinB)` — keeps emission to exactly once
    * without a distinct() (proof in RangeJoin's Scaladoc; the
    * inclusive-end explode here is a superset of the half-open one, and
    * owner ≤ each side's last bin follows from `bLo ≤ aHi` via
    * truncation monotonicity). Interval validity (0 < hi − lo ≤ span)
    * is REQUIRED by the coverage proof, so invalid intervals raise —
    * same contract as the operator. */
  private def overlapRewrite(j: Join, cond: Expression,
      conjuncts: Seq[Expression],
      binOf: Expression => Expression,
      guardedStop: (Expression, Expression, Boolean, String) => Expression,
      binSeq: (Expression, Expression) => Expression,
      explodeBins: (LogicalPlan, Expression, String) =>
        (Generate, AttributeReference)): Option[LogicalPlan] = {

    def fromOnly(e: Expression, side: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
        e.deterministic

    // cross-side strict/non-strict less-thans, normalized to
    // (smaller, larger, smallerIsLeftSide)
    val lts = conjuncts.flatMap {
      case LessThan(a, b) => Some((a, b))
      case LessThanOrEqual(a, b) => Some((a, b))
      case GreaterThan(a, b) => Some((b, a))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case _ => None
    }.flatMap { case (small, large) =>
      val ok = small.dataType == TimestampType &&
        large.dataType == TimestampType
      if (!ok) None
      else if (fromOnly(small, j.left) && fromOnly(large, j.right))
        Some((small, large, true))
      else if (fromOnly(small, j.right) && fromOnly(large, j.left))
        Some((small, large, false))
      else None
    }
    // exactly one in each direction: left's lo vs right's hi, and
    // right's lo vs left's hi
    val lr = lts.filter(_._3)
    val rl = lts.filterNot(_._3)
    if (lr.size != 1 || rl.size != 1) return None
    val (leftLo, rightHi, _) = lr.head
    val (rightLo, leftHi, _) = rl.head

    val (lLoUs, lHiUs) = (UnixMicros(leftLo), UnixMicros(leftHi))
    val (rLoUs, rHiUs) = (UnixMicros(rightLo), UnixMicros(rightHi))

    // each side: project its first bin (needed by the owner rule), then
    // explode its bin range; validity guard rides the stop expression
    val lFirst = Alias(binOf(lLoUs), "__graft_first_l")()
    val lProj = Project(j.left.output :+ lFirst, j.left)
    val (lGen, lBin) = explodeBins(lProj,
      binSeq(lFirst.toAttribute,
        guardedStop(lLoUs, lHiUs, true, "interval-overlap")),
      "__graft_bin_l")

    val rFirst = Alias(binOf(rLoUs), "__graft_first_r")()
    val rProj = Project(j.right.output :+ rFirst, j.right)
    val (rGen, rBin) = explodeBins(rProj,
      binSeq(rFirst.toAttribute,
        guardedStop(rLoUs, rHiUs, true, "interval-overlap")),
      "__graft_bin_r")

    val owner = Greatest(Seq(lFirst.toAttribute, rFirst.toAttribute))
    val newCond = And(EqualTo(lBin, rBin),
      And(EqualTo(lBin, owner), cond))
    Some(Project(j.output,
      Join(lGen, rGen, Inner, Some(newCond), j.hint)))
  }
}
