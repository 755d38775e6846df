package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine-portable 32-bit hash:
  * bytes [4*lane, 4*lane+4) of md5(utf8) as an unsigned int in a long
  * (lane 0 = the classic "first 8 hex chars" prefix).
  *
  * Semantically identical to the composition
  * `conv(substring(md5(x),1+8*lane,8),16,10) cast long` but one codegen'd
  * call: no 32-char hex string materialization, no base-16 string parse,
  * and it stays inside WholeStageCodegen via `defineCodeGen`. This is the
  * (b) preference tier from SURVEY §2 — a custom `Expression` where the
  * built-in composition is wasteful in a hot path (every shingle of every
  * document hashes through here, numPerm+2 times).
  *
  * The four lanes of one digest are independent 32-bit hashes, which cuts
  * the md5 work of k-perm MinHash by 4×: lanes of md5("g:"+x) for g =
  * 0..k/4 replace k independent digests. A thread-local memo of the last
  * (input, digest) pair makes same-input lane calls — adjacent in the
  * generated projection loop — cost one digest regardless of plan shape
  * (no reliance on Catalyst subexpression elimination).
  */
case class H32(child: Expression, lane: Int = 0) extends UnaryExpression {
  require(lane >= 0 && lane < 4, "md5 has four 32-bit lanes (0..3)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_h32 requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_h32"

  override protected def nullSafeEval(input: Any): Any =
    H32.hash(input.asInstanceOf[UTF8String], lane)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H32.hash($c, $lane)")

  override protected def withNewChildInternal(newChild: Expression): H32 =
    copy(child = newChild)
}

object H32 {
  private final class Memo {
    val md: MessageDigest = MessageDigest.getInstance("MD5")
    var bytes: Array[Byte] = _
    var digest: Array[Byte] = _
  }
  private val memos: ThreadLocal[Memo] = ThreadLocal.withInitial(() => new Memo)

  /** Called from generated code — must stay public + static-shaped. */
  def hash(s: UTF8String, lane: Int): Long = {
    val m = memos.get()
    val b = s.getBytes
    if (m.digest == null || !java.util.Arrays.equals(b, m.bytes)) {
      m.md.reset()
      // own a copy: getBytes may return the string's live backing array,
      // and a reused buffer would alias-mutate the memo key
      m.bytes = b.clone()
      m.digest = m.md.digest(b)
    }
    val d = m.digest
    val o = 4 * lane
    ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
      ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
  }

  def hash(s: UTF8String): Long = hash(s, 0)
}
