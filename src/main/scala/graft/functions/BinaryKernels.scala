package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native binary-payload kernels: header-level media inspection that
  * stays in whole-stage codegen.
  *
  * PNG and GIF store their dimensions at FIXED offsets, so
  * `Multimodal.parseImageDims` reads them with plain
  * `substring`/`hex`/`conv` column arithmetic. JPEG does not: the frame
  * header (SOFn segment) sits behind a variable-length segment chain
  * (APPn/COM/DQT/... markers, each `FF mm len_hi len_lo payload`), so
  * finding it is an imperative byte walk — exactly the "custom Catalyst
  * Expression beats a UDF" case. [[JpegDims]] walks the chain in one
  * pass over the header bytes (it stops at SOS, before entropy-coded
  * data, so cost is header-sized — tens of bytes — regardless of payload
  * size) and participates in codegen via a static-call `doGenCode`.
  */
object BinaryKernels {

  /** Width/height from a JPEG's SOFn frame header, packed as
    * `(width << 16) | height`; −1 when the payload is not a JPEG, no
    * SOF precedes SOS/EOI, or the SOF defers its height to a DNL marker
    * (Y = 0) — all the caller's cue for null dims.
    *
    * Walk: after the FFD8 SOI, each segment is `FF marker len_hi len_lo
    * payload[len−2]` (length includes its own two bytes). Fill bytes
    * (repeated FFs before a marker) are legal padding and skipped.
    * Standalone markers (TEM, RSTn) carry no length. All SOFn variants
    * carry dimensions at the same payload offsets — baseline FFC0 and
    * progressive FFC2 included; C4/C8/CC are DHT/JPG/DAC, not frames.
    * SOF payload: `precision(1) height(2 BE) width(2 BE) ...`. */
  def jpegDimsPacked(b: Array[Byte]): Long = {
    val n = b.length
    if (n < 4 || (b(0) & 0xff) != 0xFF || (b(1) & 0xff) != 0xD8) return -1L
    var pos = 2
    var guard = 0
    while (pos + 1 < n && guard < 65536) {
      guard += 1
      if ((b(pos) & 0xff) != 0xFF) return -1L // desynced: not a marker
      // skip fill bytes: FF FF ... FF marker
      while (pos + 1 < n && (b(pos + 1) & 0xff) == 0xFF) pos += 1
      if (pos + 1 >= n) return -1L
      val m = b(pos + 1) & 0xff
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        pos += 2 // TEM / RSTn: standalone, no length field
      } else if (m == 0xD9 || m == 0xDA) {
        return -1L // EOI / SOS before any SOF: no frame header
      } else {
        if (pos + 3 >= n) return -1L
        val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
        if (len < 2) return -1L
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          if (len < 7 || pos + 8 >= n) return -1L
          val h = ((b(pos + 5) & 0xff) << 8) | (b(pos + 6) & 0xff)
          val w = ((b(pos + 7) & 0xff) << 8) | (b(pos + 8) & 0xff)
          // height 0 is legal (ISO 10918-1 B.2.2: Y deferred to a DNL
          // marker after the first scan) — dims are NOT in this header,
          // so report absent rather than a zero-height "measurement"
          if (h == 0 || w == 0) return -1L
          return (w.toLong << 16) | h.toLong
        }
        pos += 2 + len
      }
    }
    -1L
  }

  def jpegDimsPackedCol(payload: Column): Column =
    ColumnBridge.column(JpegDimsPacked(ColumnBridge.expression(payload)))
}

/** JPEG SOFn dimensions as `(width << 16) | height`, null when absent —
  * see [[BinaryKernels.jpegDimsPacked]]. */
case class JpegDimsPacked(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_dims"

  override def nullSafeEval(input: Any): Any = {
    val packed = BinaryKernels.jpegDimsPacked(input.asInstanceOf[Array[Byte]])
    if (packed < 0) null else packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val packed = ctx.freshName("jpegPacked")
      s"""
        long $packed = graft.functions.BinaryKernels.jpegDimsPacked($c);
        if ($packed < 0) { ${ev.isNull} = true; }
        else { ${ev.value} = $packed; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): JpegDimsPacked =
    copy(child = newChild)
}
