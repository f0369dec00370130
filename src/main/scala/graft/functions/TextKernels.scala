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

  /** NFC-normalize (java.text.Normalizer, Unicode standard composition).
    * ASCII fast path: one byte scan, returns the INPUT UTF8String object
    * untouched — on a mostly-ASCII corpus the normalizer allocates
    * nothing, where the naive String round-trip would copy every row
    * twice. Spark ships no normalization builtin; this is the
    * ingest-time canonicalization step that makes hash-based dedup and
    * fingerprinting see 'é' and 'e'+U+0301 as the same document. */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) < 0) {
        val str = s.toString
        return if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
        else UTF8String.fromString(
          java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }

  def nfcCol(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
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

/** Unicode NFC normalization with an allocation-free ASCII fast path
  * (≡ DuckDB `nfc_normalize`; Spark has no builtin equivalent). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    TextKernels.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
