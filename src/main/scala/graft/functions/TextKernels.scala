package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  /** Shannon entropy (nats) of the `[a-z0-9]` character distribution of
    * lower(s): 36 count buckets in one byte pass, each term −p·ln p
    * rounded onto the 1e-9 long grid (BigDecimal HALF_UP — Spark round()
    * semantics, the GridVectorMean idiom) before the order-free integer
    * sum. Value-identical to the column/HOF formulation
    * `aggregate(transform(array_distinct(chars), ...))` — which
    * re-evaluates the char extraction once per DISTINCT char because the
    * array reference sits inside the lambda (the Text.shingles trap) —
    * and to the DuckDB list mirror; this kernel is one pass. */
  def charEntropy(s: UTF8String): Double = {
    val lower = s.toLowerCase
    val n = lower.numBytes()
    val base = lower.getBaseObject
    val off = lower.getBaseOffset
    val counts = new Array[Long](36)
    var total = 0L
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b >= 'a' && b <= 'z') { counts(b - 'a') += 1; total += 1 }
      else if (b >= '0' && b <= '9') { counts(26 + (b - '0')) += 1; total += 1 }
      i += 1
    }
    if (total == 0L) return 0.0
    var acc = 0L
    var j = 0
    while (j < 36) {
      val c = counts(j)
      if (c > 0L) {
        val p = c.toDouble / total.toDouble
        acc += java.math.BigDecimal.valueOf(-p * math.log(p) * 1e9)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      }
      j += 1
    }
    acc.toDouble / 1e9
  }

  def charEntropyCol(text: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(text)))

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

  /** `levenshtein(a, b) <= k` WITHOUT the full O(n·m) DP: Ukkonen's
    * banded algorithm — cells farther than k off the diagonal can never
    * be ≤ k, so only a 2k+1-wide band is computed, with an early exit
    * the moment a whole row exceeds k. O(k·n) per pair versus O(n·m):
    * for fuzzy-join verification (millions of candidate pairs, small k)
    * the band IS the scale path, and the common reject case exits after
    * a handful of rows. Code-point semantics, matching the builtin
    * `levenshtein` (pinned by fuzz in `TextKernelsSpec`).
    *
    * Per-pair allocation matters as much as the DP bound: a verify join
    * evaluates this kernel Σ|block|² times (hundreds of millions at
    * scale), so the length gate runs BEFORE any conversion (`numChars`
    * scans, allocates nothing) and the all-ASCII common case fills its
    * code-point array straight from the UTF-8 bytes — no String, no
    * stream — the sf1 rehearsal measured the String round-trip as the
    * top of the profile, not the band itself. */
  def editWithin(a: UTF8String, b: UTF8String, k: Int): Boolean = {
    if (math.abs(a.numChars - b.numChars) > k) return false
    val s = codePointArray(a)
    val t = codePointArray(b)
    val n = s.length
    val m = t.length
    if (k == 0) return java.util.Arrays.equals(s, t)
    val inf = k + 1
    val width = 2 * k + 1
    var prev = new Array[Int](width)
    var curr = new Array[Int](width)
    var c = 0
    while (c < width) {
      val j = c - k
      prev(c) = if (j >= 0 && j <= m) j else inf
      c += 1
    }
    var i = 1
    while (i <= n) {
      var rowMin = inf
      c = 0
      while (c < width) {
        val j = i - k + c
        val v =
          if (j < 0 || j > m) inf
          else if (j == 0) i
          else {
            val del = if (c + 1 < width) prev(c + 1) + 1 else inf
            val ins = if (c > 0) curr(c - 1) + 1 else inf
            val sub = prev(c) + (if (s(i - 1) == t(j - 1)) 0 else 1)
            math.min(del, math.min(ins, sub))
          }
        curr(c) = if (v > inf) inf else v
        if (curr(c) < rowMin) rowMin = curr(c)
        c += 1
      }
      if (rowMin > k) return false
      val tmp = prev; prev = curr; curr = tmp
      i += 1
    }
    val cEnd = m - n + k
    cEnd >= 0 && cEnd < width && prev(cEnd) <= k
  }

  /** Code points of a UTF8String without the String/stream round-trip:
    * the all-ASCII case (every byte ≥ 0) copies bytes directly. */
  private def codePointArray(u: UTF8String): Array[Int] = {
    val nb = u.numBytes()
    val base = u.getBaseObject
    val off = u.getBaseOffset
    var i = 0
    while (i < nb) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) < 0)
        return u.toString.codePoints().toArray
      i += 1
    }
    val out = new Array[Int](nb)
    i = 0
    while (i < nb) {
      out(i) = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      i += 1
    }
    out
  }

  def editWithinCol(a: Column, b: Column, k: Int): Column =
    ColumnBridge.column(EditWithin(ColumnBridge.expression(a),
      ColumnBridge.expression(b), k))
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

/** One-pass alnum-char Shannon entropy on the 1e-9 long grid — see
  * `TextKernels.charEntropy`. */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(input: Any): Any =
    TextKernels.charEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.charEntropy($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
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

/** Banded threshold edit distance (≡ `levenshtein(a, b) <= k`), O(k·n)
  * with early exit — the fuzzy-join verification kernel. */
case class EditWithin(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {
  require(k >= 0 && k <= 64, "edit threshold k must be in [0, 64]")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_edit_within"

  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.editWithin(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextKernels.editWithin($a, $b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EditWithin =
    copy(left = newLeft, right = newRight)
}
