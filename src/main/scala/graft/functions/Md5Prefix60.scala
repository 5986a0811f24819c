package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for the engine's portable 60-bit hash.
  *
  * Semantics are EXACTLY `conv(substring(md5(s), 1, 15), 16, 10)` cast
  * to long (graft.pipeline.Hashing.h60): the first 15 hex characters of
  * the md5 digest are the first 7.5 bytes, i.e. the big-endian unsigned
  * value of bytes 0..7 shifted right by 4. The builtin formulation
  * materializes a 32-char hex string, substrings it, and re-parses 15
  * hex digits per row; this kernel goes digest → long directly. The
  * MessageDigest instance is thread-local — one per executor thread,
  * reset per row, no allocation beyond the digest's own output buffer.
  */
object Md5Prefix60 {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def hash(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** Codegen'd Catalyst expression over [[Md5Prefix60.hash]]. Like
  * [[DotProduct]], this is a performance addition, not a semantics one —
  * the hash underpins every corpus-scale dedup/sampling operator
  * (shingle hashing runs once per (doc × shingle) at 100 TB), and
  * bit-equality with the builtin formulation (and therefore with the
  * DuckDB oracle's `('0x'||substr(md5(x),1,15))::BIGINT`) is proven by
  * Md5Prefix60Spec.
  *
  * MEASURED VERDICT (Md5Prefix60Spec "throughput"): ~1.1× over the
  * builtin `conv(substring(md5(s),1,15),16,10)` — the MD5 digest itself
  * dominates; the hex materialize/substring/re-parse it removes is
  * noise. The pipeline operators therefore KEEP the builtin formulation
  * (zero registration coupling); this expression stays registered for
  * SQL users and as the drop-in slot if a future non-cryptographic
  * portable hash replaces md5 on both engines.
  */
case class Md5Prefix60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h60"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Prefix60Expr = copy(child = newChild)
}
