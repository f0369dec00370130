package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-counting kernels.
  *
  * `Text.tokenCount` in builtin form is
  * `size(regexp_extract_all(lower(text), '[a-z0-9]+'))` — it lowercases a
  * copy, runs the regex engine, and MATERIALIZES the token array just to
  * take its length. Token counting sits on the hot path of the document
  * family (quality scores, packing budgets, chunk sizing), where at
  * corpus scale the array allocation is pure garbage-collector load.
  *
  * [[TokenCount]] counts `[a-z0-9]+` runs in ONE byte scan with no
  * allocation. Value-identical to the builtin chain for any input: it
  * scans `UTF8String.toLowerCase` (the same lowering `lower()` performs),
  * and since `[a-z0-9]` are ASCII bytes — which never occur inside a
  * multi-byte UTF-8 sequence — byte-level run counting equals the regex's
  * character-level count (pinned on unicode/edge inputs in
  * `TextKernelsSpec`).
  */
object TextKernels {

  /** Number of maximal `[a-z0-9]+` runs in lower(s), one byte pass. */
  def tokenCount(s: UTF8String): Int = {
    val lower = s.toLowerCase
    val n = lower.numBytes()
    val base = lower.getBaseObject
    val off = lower.getBaseOffset
    var count = 0
    var inRun = false
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      val isTok = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (isTok && !inRun) count += 1
      inRun = isTok
      i += 1
    }
    count
  }

  def tokenCountCol(text: Column): Column =
    ColumnBridge.column(TokenCount(ColumnBridge.expression(text)))
}

/** One-pass allocation-free token count (≡ size(regexp_extract_all(
  * lower(text), '[a-z0-9]+'))). */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"

  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.tokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}
