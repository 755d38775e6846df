package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine-portable 32-bit hash
  * (first 4 bytes of md5(utf8) as an unsigned int in a long).
  *
  * Semantically identical to the composition
  * `conv(substring(md5(x),1,8),16,10) cast long` but one codegen'd call:
  * no 32-char hex string materialization, no base-16 string parse, and it
  * stays inside WholeStageCodegen via `defineCodeGen`. This is the (b)
  * preference tier from SURVEY §2 — a custom `Expression` where the
  * built-in composition is wasteful in a hot path (every shingle of every
  * document hashes through here, numPerm+2 times).
  */
case class H32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h32 requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h32"

  override protected def nullSafeEval(input: Any): Any =
    H32.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H32.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): H32 =
    copy(child = newChild)
}

object H32 {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Called from generated code — must stay public + static-shaped. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
