package graft.operators

import java.util.zip.Inflater

/** Pure-JVM PNG pixel decode — the public-knowledge, JNI-free fill for
  * the most common lossless format behind the [[Multimodal.decodeBatch]]
  * seam (reference treats media as opaque columns end-to-end;
  * columnflow/columnar_util.py routes payloads without decoding). The
  * PNG spec (RFC 2083 / ISO 15948) is: 8-byte signature, length-typed
  * chunks, IDAT zlib stream, per-scanline byte filters. `java.util.zip
  * .Inflater` is the JDK's zlib — no native libs, safe inside an
  * executor.
  *
  * Coverage: bit depth 8, interlace 0 (the overwhelming majority of real
  * PNGs), color types 0 (gray), 2 (RGB), 3 (palette→RGB), 4 (gray+alpha),
  * 6 (RGBA), all five scanline filters (None/Sub/Up/Average/Paeth).
  * Anything else (16-bit, Adam7, malformed, truncated) returns None —
  * the caller keeps those payloads on the remaining codec seam, same
  * null-cue contract as a truncated JPEG header.
  *
  * Scale: decode is strictly per-row map-side work inside
  * `mapPartitions`; payload bytes never shuffle. Memory per row is
  * bounded by the decoded image (w·h·channels); a 100 TB media scan
  * bounds that with a metadata pre-filter on [[Multimodal.parseImageDims]]
  * (codegen'd header read — reject oversized canvases BEFORE inflating,
  * the decompression-bomb guard, `maxPixels` here as the in-kernel
  * backstop).
  */
object PngDecode {

  /** Decoded image: 8-bit samples, `channels`-interleaved rows. */
  final case class Png(width: Int, height: Int, channels: Int,
                       colorType: Int, pixels: Array[Byte])

  private val SIG = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Decode a PNG byte payload; None on any unsupported/corrupt input
    * (never throws — a poison row must not fail a 100 TB task). */
  def decode(bytes: Array[Byte], maxPixels: Long = 64L * 1024 * 1024): Option[Png] =
    try decodeOrThrow(bytes, maxPixels) catch { case _: Throwable => None }

  private def decodeOrThrow(b: Array[Byte], maxPixels: Long): Option[Png] = {
    if (b.length < 8 + 25 || !b.take(8).sameElements(SIG)) return None
    var off = 8
    var w, h, depth, color, interlace = -1
    var plte: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && off + 8 <= b.length) {
      val len = be32(b, off)
      if (len > Int.MaxValue - 12 || off + 12 + len > b.length) return None
      val typ = new String(b, off + 4, 4, "US-ASCII")
      val dataOff = off + 8
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(b, dataOff).toInt; h = be32(b, dataOff + 4).toInt
          depth = b(dataOff + 8) & 0xff; color = b(dataOff + 9) & 0xff
          interlace = b(dataOff + 12) & 0xff
        case "PLTE" => plte = java.util.Arrays.copyOfRange(b, dataOff, dataOff + len.toInt)
        case "IDAT" => idat.write(b, dataOff, len.toInt)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len.toInt // len + type + data + crc
    }
    if (w <= 0 || h <= 0 || depth != 8 || interlace != 0) return None
    if (w.toLong * h > maxPixels) return None
    val chans = color match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (color == 3 && plte == null) return None

    // inflate the concatenated IDAT zlib stream
    val stride = w * chans
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      // n == 0 with output space available (the loop guard guarantees it)
      // is never progress: needsInput() = truncated stream, and a crafted
      // zlib header with FDICT set yields needsDictionary() with NEITHER
      // flag ever turning true — looping on it would hang the executor
      // task forever, which decode()'s catch(Throwable) cannot save.
      // Treat every stalled inflate as corrupt.
      if (n == 0) { inf.end(); return None }
      got += n
    }
    inf.end()
    if (got < raw.length) return None

    // unfilter scanlines in place into the pixel buffer; a/b/c are the
    // RECONSTRUCTED left / above / above-left bytes (bpp = chans at depth 8)
    val out = new Array[Byte](stride * h)
    val bpp = chans
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val a = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0
        val bb = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp) out(rowOut - stride + x - bpp) & 0xff else 0
        val v = raw(rowIn + x) & 0xff
        val rec = ft match {
          case 0 => v
          case 1 => v + a
          case 2 => v + bb
          case 3 => v + ((a + bb) >> 1)
          case 4 => // Paeth predictor
            val p = a + bb - c
            val pa = math.abs(p - a); val pb = math.abs(p - bb); val pc = math.abs(p - c)
            v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c)
          case _ => return None
        }
        out(rowOut + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }

    if (color == 3) {
      // palette indices → interleaved RGB through PLTE
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val idx = (out(i) & 0xff) * 3
        if (idx + 2 >= plte.length) return None
        rgb(i * 3) = plte(idx); rgb(i * 3 + 1) = plte(idx + 1); rgb(i * 3 + 2) = plte(idx + 2)
        i += 1
      }
      Some(Png(w, h, 3, color, rgb))
    } else Some(Png(w, h, chans, color, out))
  }
}
