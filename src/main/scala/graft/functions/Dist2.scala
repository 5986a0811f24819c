package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer squared-L2 distance over two long arrays, with
  * whole-stage codegen — the hot loop of integer-quantized k-means
  * cell assignment (Similarity.assignCellsInt / kmeansInt, the e4
  * fixed-point codebook path).
  *
  * The built-in formulation
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0L, _+_)` runs on
  * Spark's interpreted higher-order-function path — per-element lambda
  * dispatch and boxing, k times per row at assignment. Integer sums
  * are associative and exact, so unlike the double-space [[DotProduct]]
  * there is no accumulation-order caveat at all: this expression is
  * value-identical to the HOF form wherever both are defined.
  *
  * Length mismatch THROWS (the HOF form nulls via zip_with padding):
  * a dimension mismatch between a vector and a codebook centroid is
  * always a bug, and a silent null would poison argmin comparisons.
  *
  * Null fencing (same rationale as [[ArgminDist2]] — getLong on a
  * null slot reads 0 under codegen and silently corrupts the
  * distance): a null ELEMENT on either side throws a named runtime
  * error, checked in one O(dim) pass before the arithmetic loop.
  * Unlike ArgminDist2's codebook (structurally a literal, fenced at
  * analysis time), BOTH of Dist2's sides are legitimately
  * `transform()` outputs over parquet arrays — nullable element
  * types by inheritance — so the fence must be runtime here. */
case class Dist2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dist2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_dist2: dimension mismatch ($n vs ${y.numElements()})")
    var j = 0
    while (j < n) {
      if (x.isNullAt(j) || y.isNullAt(j))
        throw new IllegalArgumentException(
          s"graft_dist2: null element at position $j")
      j += 1
    }
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_dist2: dimension mismatch (" + $n + " vs " +
         |    $b.numElements() + ")");
         |}
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.isNullAt($j) || $b.isNullAt($j)) {
         |    throw new IllegalArgumentException(
         |      "graft_dist2: null element at position " + $j);
         |  }
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dist2 =
    copy(left = newLeft, right = newRight)
}
