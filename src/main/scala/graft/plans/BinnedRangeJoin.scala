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
  /** LongType variant (genomic coordinates, µs-long columns, any
    * integer domain): bin width and max span in the column's OWN raw
    * units. Independent of the timestamp confs — a session can enable
    * either or both. */
  val BinWidthConf = "spark.graft.rangeJoin.binWidth"
  val SpanWidthConf = "spark.graft.rangeJoin.maxSpanWidth"

  /** One type family's binning parameters: divisor, explode cap, and
    * how to project an expression onto the integer axis. */
  private case class BinSpec(width: Long, maxSpan: Long,
      toUnits: Expression => Expression, what: String)

  /** Runtime installation (idempotent) — extraOptimizations runs in the
    * optimizer's user-provided batch, after the analyzer, which is why
    * every expression built here is constructed fully resolved. */
  def install(spark: SparkSession, binSeconds: Long = 0L,
      binWidth: Long = 0L): Unit = {
    if (binSeconds > 0) spark.conf.set(BinConf, binSeconds.toString)
    if (binWidth > 0) spark.conf.set(BinWidthConf, binWidth.toString)
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  private def confLong(key: String, default: Long): Long =
    try conf.getConfString(key, default.toString).toLong
    catch { case _: NumberFormatException => default }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val binSec = confLong(BinConf, 0L)
    val binWidth = confLong(BinWidthConf, 0L)
    val tsSpec =
      if (binSec <= 0) None
      else Some(BinSpec(binSec * 1000000L,
        confLong(SpanConf, 31L * 86400) * 1000000L,
        e => UnixMicros(e), SpanConf))
    val longSpec =
      if (binWidth <= 0) None
      else Some(BinSpec(binWidth,
        confLong(SpanWidthConf, binWidth * 1000L),
        identity, SpanWidthConf))
    if (tsSpec.isEmpty && longSpec.isEmpty) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) if cond.deterministic =>
        rewrite(j, cond, tsSpec, longSpec).getOrElse(j)
    }
  }

  /** The enabled BinSpec for an expression's type, if any. */
  private def specFor(dt: org.apache.spark.sql.types.DataType,
      tsSpec: Option[BinSpec], longSpec: Option[BinSpec]): Option[BinSpec] =
    dt match {
      case TimestampType => tsSpec
      case LongType => longSpec
      case _ => None
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

  private def rewrite(j: Join, cond: Expression, tsSpec: Option[BinSpec],
      longSpec: Option[BinSpec]): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    def fromOnly(e: Expression, side: LogicalPlan): Boolean =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
        e.deterministic

    def binOf(spec: BinSpec, unitExpr: Expression): Expression =
      IntegralDivide(unitExpr, Literal(spec.width))

    /** Last bin to explode for interval [lo, hi]: trunc(hi / bin), with
      * the RangeJoin loud guard. Over-long intervals always raise
      * (unbounded explode). Inverted intervals raise only where the
      * rewrite's coverage proof needs interval validity (the overlap
      * owner-bin rule); the point-in-interval path tolerates them — an
      * inverted interval's descending bin sequence covers the same bin
      * SET and the residual filters every phantom pair. */
    def guardedStop(spec: BinSpec, loU: Expression, hiU: Expression,
        raiseOnInverted: Boolean): Expression = {
      val bad =
        if (raiseOnInverted)
          Or(LessThanOrEqual(hiU, loU),
            GreaterThan(Subtract(hiU, loU), Literal(spec.maxSpan)))
        else GreaterThan(Subtract(hiU, loU), Literal(spec.maxSpan))
      If(bad,
        Cast(RaiseError(Literal(
          s"BinnedRangeJoinRule: interval must satisfy " +
            s"0 < end - start <= ${spec.what} (${spec.maxSpan} units) — " +
            "raise the conf or pre-split the interval")), LongType),
        binOf(spec, hiU))
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
    // side-separated bounds of a type family with binning enabled
    val bounds = conjuncts.flatMap { c =>
      asBound(c) match {
        // p OP bound  with p from left, bound from right (or flipped)
        case Some((p, b, isLower)) =>
          val ok = p.dataType == b.dataType &&
            specFor(p.dataType, tsSpec, longSpec).isDefined
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
      val spec = specFor(point.dataType, tsSpec, longSpec).get
      val (pointSide, intervalSide) =
        if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      // point side: project the single bin
      val pBinAlias = Alias(binOf(spec, spec.toUnits(point)),
        "__graft_bin_p")()
      val pointProj = Project(pointSide.output :+ pBinAlias, pointSide)

      // interval side: explode trunc(lo/bin)..trunc(hi/bin)
      val loU = spec.toUnits(lo)
      val hiU = spec.toUnits(hi)
      val (gen, iBinAttr) = explodeBins(intervalSide,
        binSeq(binOf(spec, loU), guardedStop(spec, loU, hiU,
          raiseOnInverted = false)),
        "__graft_bin_i")

      val newCond = And(EqualTo(pBinAlias.toAttribute, iBinAttr), cond)
      val (newLeft, newRight) =
        if (pointOnLeft) (pointProj, gen) else (gen, pointProj)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond),
        j.hint))
    }

    pointRewrite.orElse(overlapRewrite(j, cond, conjuncts,
      tsSpec, longSpec, binOf, guardedStop, binSeq, explodeBins))
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
      tsSpec: Option[BinSpec], longSpec: Option[BinSpec],
      binOf: (BinSpec, Expression) => Expression,
      guardedStop: (BinSpec, Expression, Expression, Boolean) => Expression,
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
      val ok = small.dataType == large.dataType &&
        specFor(small.dataType, tsSpec, longSpec).isDefined
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
    // all four bounds must share one enabled type family
    if (Set(leftLo, leftHi, rightLo, rightHi)
        .map(_.dataType).size != 1) return None
    val spec = specFor(leftLo.dataType, tsSpec, longSpec).get

    val (lLoU, lHiU) = (spec.toUnits(leftLo), spec.toUnits(leftHi))
    val (rLoU, rHiU) = (spec.toUnits(rightLo), spec.toUnits(rightHi))

    // each side: project its first bin (needed by the owner rule), then
    // explode its bin range; validity guard rides the stop expression
    val lFirst = Alias(binOf(spec, lLoU), "__graft_first_l")()
    val lProj = Project(j.left.output :+ lFirst, j.left)
    val (lGen, lBin) = explodeBins(lProj,
      binSeq(lFirst.toAttribute, guardedStop(spec, lLoU, lHiU, true)),
      "__graft_bin_l")

    val rFirst = Alias(binOf(spec, rLoU), "__graft_first_r")()
    val rProj = Project(j.right.output :+ rFirst, j.right)
    val (rGen, rBin) = explodeBins(rProj,
      binSeq(rFirst.toAttribute, guardedStop(spec, rLoU, rHiU, true)),
      "__graft_bin_r")

    val owner = Greatest(Seq(lFirst.toAttribute, rFirst.toAttribute))
    val newCond = And(EqualTo(lBin, rBin),
      And(EqualTo(lBin, owner), cond))
    Some(Project(j.output,
      Join(lGen, rGen, Inner, Some(newCond), j.hint)))
  }
}
