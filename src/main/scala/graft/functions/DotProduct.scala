package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two double arrays, with whole-stage codegen.
  *
  * The built-in formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * evaluates through Spark's interpreted higher-order-function path —
  * per-element lambda dispatch and boxing. For the ANN operators the dot
  * product IS the inner loop (64 multiplies per row-pair at 100 TB), so
  * this is the one place the engine drops to a custom Catalyst
  * `Expression` (SURVEY.md §7.3 judged "none required for parity" — this
  * is a performance addition, not a semantics one).
  *
  * Accumulation order is the same left-to-right fold as the HOF
  * formulation and the DuckDB oracle's `list_aggregate('sum')`, so
  * results stay bit-identical.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object NativeFunctions {
  val DotName = "graft_dot"
  val H60Name = "graft_h60"
  val Dist2Name = "graft_dist2"
  val ArgminDist2Name = "graft_argmin_dist2"

  /** Register the expressions in the session's function registry (the
    * supported route to a `Column` over a custom Expression). Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName, exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      H60Name, exprs => Md5Prefix60Expr(exprs(0)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Dist2Name, exprs => Dist2(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ArgminDist2Name, exprs => ArgminDist2(exprs(0), exprs(1)),
      "scala_udf")
  }

  /** Column-level dot product; caller must have registered the session. */
  def dot(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** Column-level native 60-bit hash; caller must have registered. */
  def h60(c: Column): Column = call_function(H60Name, c)

  /** Column-level integer squared-L2; caller must have registered. */
  def dist2(a: Column, b: Column): Column = call_function(Dist2Name, a, b)

  /** Column-level integer-L2 argmin position over a literal codebook;
    * caller must have registered. */
  def argminDist2(v: Column, cents: Column): Column =
    call_function(ArgminDist2Name, v, cents)
}

/** SparkSessionExtensions hook: makes the engine's native functions
  * available to plain-SQL users of any session built with
  * `.withExtensions(new GraftExtensions)` (or via
  * `spark.sql.extensions=graft.functions.GraftExtensions`) —
  * `SELECT graft_dot(a.v, b.v) FROM …` works without touching the
  * Scala API.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(NativeFunctions.DotName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, NativeFunctions.DotName),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(NativeFunctions.H60Name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Md5Prefix60Expr].getName, NativeFunctions.H60Name),
      (exprs: Seq[Expression]) => Md5Prefix60Expr(exprs(0))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(NativeFunctions.Dist2Name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Dist2].getName, NativeFunctions.Dist2Name),
      (exprs: Seq[Expression]) => Dist2(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(
        NativeFunctions.ArgminDist2Name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ArgminDist2].getName, NativeFunctions.ArgminDist2Name),
      (exprs: Seq[Expression]) => ArgminDist2(exprs(0), exprs(1))))
    // keyless range-predicate joins → binned equi-joins (inert until
    // spark.graft.rangeJoin.binSeconds is set; see the rule's scaladoc)
    e.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
  }
}
