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

  /** Width/height from a WebP payload, packed as `(width << 32) | height`
    * (32-bit fields — VP8X canvases are 24-bit, too wide for the JPEG
    * kernel's 16-bit packing); −1 when the payload is not a WebP or the
    * header is truncated/corrupt.
    *
    * Container (RIFF): `RIFF size WEBP`, then one chunk header
    * `fourcc(4) size(4 LE)` at offset 12 with payload at 20. The three
    * first-chunk variants each carry dimensions at fixed offsets:
    *  - `VP8 ` (lossy): 3-byte frame tag, start code 9D 01 2A, then two
    *    LE16s whose low 14 bits are width and height;
    *  - `VP8L` (lossless): signature byte 2F, then a LE32 holding
    *    width−1 in bits 0–13 and height−1 in bits 14–27;
    *  - `VP8X` (extended): 4 flag/reserved bytes, then two LE24s holding
    *    canvas width−1 and height−1. */
  def webpDimsPacked(b: Array[Byte]): Long = {
    val n = b.length
    def c(p: Int): Int = b(p) & 0xff
    if (n < 25 ||
        c(0) != 'R' || c(1) != 'I' || c(2) != 'F' || c(3) != 'F' ||
        c(8) != 'W' || c(9) != 'E' || c(10) != 'B' || c(11) != 'P') return -1L
    val (f0, f1, f2, f3) = (c(12), c(13), c(14), c(15))
    if (f0 == 'V' && f1 == 'P' && f2 == '8' && f3 == ' ') {
      if (n < 30 || c(23) != 0x9D || c(24) != 0x01 || c(25) != 0x2A) return -1L
      val w = (c(26) | (c(27) << 8)) & 0x3FFF
      val h = (c(28) | (c(29) << 8)) & 0x3FFF
      if (w == 0 || h == 0) -1L else (w.toLong << 32) | h.toLong
    } else if (f0 == 'V' && f1 == 'P' && f2 == '8' && f3 == 'L') {
      if (c(20) != 0x2F) return -1L
      val v = c(21).toLong | (c(22).toLong << 8) | (c(23).toLong << 16) | (c(24).toLong << 24)
      val w = (v & 0x3FFF) + 1
      val h = ((v >> 14) & 0x3FFF) + 1
      (w << 32) | h
    } else if (f0 == 'V' && f1 == 'P' && f2 == '8' && f3 == 'X') {
      if (n < 30) return -1L
      val w = 1L + (c(24) | (c(25) << 8) | (c(26) << 16)).toLong
      val h = 1L + (c(27) | (c(28) << 8) | (c(29) << 16)).toLong
      (w << 32) | h
    } else -1L
  }

  def webpDimsPackedCol(payload: Column): Column =
    ColumnBridge.column(WebpDimsPacked(ColumnBridge.expression(payload)))

  /** Width/height of the first visual track of an ISO-BMFF (MP4/MOV)
    * payload, packed as `(width << 32) | height`; −1 when no `moov/trak/
    * tkhd` with nonzero dimensions is reachable — including the common
    * truncated-header case where `moov` sits AFTER `mdat` (no-faststart
    * files) and the stored prefix ends first: null dims are the cue to
    * route the payload to the decode seam, not a parse error.
    *
    * Box walk: every box is `size(4 BE) type(4)`; size 1 → a 64-bit
    * largesize follows, size 0 → the box runs to the end of the
    * enclosing scope. Top level is scanned for `moov`; each `trak` child
    * is scanned for `tkhd`, whose payload is `version(1) flags(3)`, the
    * version-dependent time/id/duration block (20 bytes at v0, 32 at
    * v1), 8 reserved, layer/alternate_group/volume/reserved (8), a 36-
    * byte matrix, then width and height as 16.16 fixed point — audio
    * traks carry 0×0 and are skipped, so the first nonzero trak wins.
    * Cost is bounded by the moov subtree (kilobytes), never `mdat`:
    * sibling boxes are skipped by size, not scanned. */
  def mp4DimsPacked(b: Array[Byte]): Long = {
    val n = b.length
    if (n < 16) return -1L
    def u32(p: Int): Long =
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    def isType(p: Int, t: String): Boolean =
      (b(p + 4) & 0xff) == t.charAt(0) && (b(p + 5) & 0xff) == t.charAt(1) &&
        (b(p + 6) & 0xff) == t.charAt(2) && (b(p + 7) & 0xff) == t.charAt(3)
    // payload start and box end of the box at p, or (-1,-1) on corrupt/truncated
    def bounds(p: Int, end: Int): (Int, Int) = {
      if (p + 8 > end) return (-1, -1)
      val sz = u32(p)
      if (sz == 0) (p + 8, end)
      else if (sz == 1) {
        if (p + 16 > end) return (-1, -1)
        val large = (u32(p + 8) << 32) | u32(p + 12)
        if (large < 16 || large > (end - p).toLong) (-1, -1)
        else (p + 16, p + large.toInt)
      } else {
        if (sz < 8 || sz > (end - p).toLong) (-1, -1)
        else (p + 8, p + sz.toInt)
      }
    }
    var guard = 0
    var p = 0
    var moovS = -1
    var moovE = -1
    while (p + 8 <= n && moovS < 0 && guard < 4096) {
      guard += 1
      val (ps, pe) = bounds(p, n)
      if (ps < 0) return -1L
      if (isType(p, "moov")) { moovS = ps; moovE = pe } else p = pe
    }
    if (moovS < 0) return -1L
    var q = moovS
    while (q + 8 <= moovE && guard < 8192) {
      guard += 1
      val (ps, pe) = bounds(q, moovE)
      if (ps < 0) return -1L
      if (isType(q, "trak")) {
        var r = ps
        while (r + 8 <= pe && guard < 16384) {
          guard += 1
          val (ps2, pe2) = bounds(r, pe)
          if (ps2 < 0) return -1L
          if (isType(r, "tkhd") && ps2 < pe2) {
            val ofs = ps2 + (if ((b(ps2) & 0xff) == 1) 88 else 76)
            if (ofs + 8 <= pe2) {
              val w = u32(ofs) >>> 16 // 16.16 fixed point → integer part
              val h = u32(ofs + 4) >>> 16
              if (w > 0 && h > 0) return (w << 32) | h
            }
          }
          r = pe2
        }
      }
      q = pe
    }
    -1L
  }

  def mp4DimsPackedCol(payload: Column): Column =
    ColumnBridge.column(Mp4DimsPacked(ColumnBridge.expression(payload)))
}

/** Shared shape of the header-walk dimension kernels: binary in,
  * nullable packed long out (negative kernel sentinel → SQL null),
  * codegen as one static call so the walk runs exactly once per row
  * inside whole-stage codegen. `kernel` is the static method name in
  * [[BinaryKernels]]. */
abstract class PackedDimsExpression extends UnaryExpression {
  protected def kernel: String
  protected def eval0(bytes: Array[Byte]): Long

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val packed = eval0(input.asInstanceOf[Array[Byte]])
    if (packed < 0) null else packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val packed = ctx.freshName("packed")
      s"""
        long $packed = graft.functions.BinaryKernels.$kernel($c);
        if ($packed < 0) { ${ev.isNull} = true; }
        else { ${ev.value} = $packed; }
      """
    })
}

/** JPEG SOFn dimensions as `(width << 16) | height`, null when absent —
  * see [[BinaryKernels.jpegDimsPacked]]. */
case class JpegDimsPacked(child: Expression) extends PackedDimsExpression {
  override protected def kernel: String = "jpegDimsPacked"
  override protected def eval0(bytes: Array[Byte]): Long =
    BinaryKernels.jpegDimsPacked(bytes)
  override def prettyName: String = "graft_jpeg_dims"
  override protected def withNewChildInternal(newChild: Expression): JpegDimsPacked =
    copy(child = newChild)
}

/** WebP dimensions as `(width << 32) | height`, null when absent — see
  * [[BinaryKernels.webpDimsPacked]]. */
case class WebpDimsPacked(child: Expression) extends PackedDimsExpression {
  override protected def kernel: String = "webpDimsPacked"
  override protected def eval0(bytes: Array[Byte]): Long =
    BinaryKernels.webpDimsPacked(bytes)
  override def prettyName: String = "graft_webp_dims"
  override protected def withNewChildInternal(newChild: Expression): WebpDimsPacked =
    copy(child = newChild)
}

/** ISO-BMFF (MP4/MOV) first-visual-track dimensions as
  * `(width << 32) | height`, null when absent — see
  * [[BinaryKernels.mp4DimsPacked]]. */
case class Mp4DimsPacked(child: Expression) extends PackedDimsExpression {
  override protected def kernel: String = "mp4DimsPacked"
  override protected def eval0(bytes: Array[Byte]): Long =
    BinaryKernels.mp4DimsPacked(bytes)
  override def prettyName: String = "graft_mp4_dims"
  override protected def withNewChildInternal(newChild: Expression): Mp4DimsPacked =
    copy(child = newChild)
}
