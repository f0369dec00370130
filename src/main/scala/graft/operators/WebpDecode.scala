package graft.operators

/** Pure-JVM WebP LOSSLESS (VP8L) pixel decoder — the WebP arm of the
  * multimodal codec seam. Implements the public WebP Lossless Bitstream
  * Specification (RFC 9649 §3): RIFF chunk walk (VP8X-wrapped files
  * included), LSB-first bitstream, simple and code-length-coded canonical
  * prefix codes, the optional meta prefix-code image, color-cache hits,
  * LZ77 backward references with the 120-entry 2D distance map, and all
  * four transforms (predictor ×14, cross-color, subtract-green,
  * color-indexing with sub-byte pixel packing) inverted in reverse
  * bitstream order. Lossy VP8 frames remain on the declared codec seam
  * (no JDK codec exists); this makes every LOSSLESS WebP — the archival/
  * screenshot/UI-asset class a training-data crawl is full of — decode
  * for real.
  *
  * Never-throw contract (shared with [[PngDecode]]): corrupt, truncated,
  * over-subscribed-tree, or oversized payloads return None — a poison
  * row must not fail a 100 TB task. The `maxPixels` bomb guard fires on
  * HEADER dimensions before any pixel allocation. Decode is strictly
  * sequential per payload (the format is), so parallelism comes from the
  * partition contract in [[Multimodal.decodeImageBatch]], never from
  * inside a row.
  *
  * Reference scope note: columnflow has no image path (nearest analogue:
  * chunked array I/O, /root/reference/columnflow/columnar_util.py:3647);
  * this operator belongs to the beyond-reference multimodal surface.
  */
object WebpDecode {

  /** Decoded image: ARGB pixels, row-major. `channels` reports 4 when any
    * alpha < 255 was produced, else 3 — the cheap downstream cue. */
  final case class Img(width: Int, height: Int, pixels: Array[Int]) {
    def channels: Int = if (pixels.exists(p => (p >>> 24) != 0xff)) 4 else 3
  }

  private final class Corrupt extends RuntimeException(null, null, false, false)
  private def corrupt(): Nothing = throw new Corrupt

  /** LSB-first bit reader over the VP8L payload. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var bit = 0
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= b.length) corrupt()
        v |= ((b(pos) >> bit) & 1) << i
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
  }

  /** Canonical prefix-code decoder (tree walk; DEFLATE-style canonical
    * assignment, first-read bit = root branch). `lengths(s)` = code
    * length of symbol s, 0 = unused. Over- or under-subscribed trees are
    * corrupt; trees read via the simple-code path are built directly. */
  private final class Huffman private (tree: Array[Int], single: Int) {
    def readSym(br: BitReader): Int = {
      if (single >= 0) return single // 0-bit simple code
      var node = 0
      while (true) {
        val nxt = tree(2 * node + br.read(1))
        if (nxt < 0) return -nxt - 1
        if (nxt == 0) corrupt() // unassigned branch: incomplete tree
        node = nxt
      }
      -1
    }
  }

  private object Huffman {
    def single(symbol: Int): Huffman = new Huffman(null, symbol)

    /** Two-symbol code (one bit each): CANONICAL assignment — the spec
      * maps simple-code symbols into the code_lengths array and builds
      * canonically, so the smaller symbol VALUE takes code 0 regardless
      * of bitstream read order. */
    def pair(s0: Int, s1: Int): Huffman = {
      if (s0 == s1) corrupt()
      val (a, b) = if (s0 < s1) (s0, s1) else (s1, s0)
      val tree = new Array[Int](4)
      tree(0) = -a - 1; tree(1) = -b - 1
      new Huffman(tree, -1)
    }

    def fromLengths(lengths: Array[Int]): Huffman = {
      var used = 0
      var lone = -1
      var maxLen = 0
      var i = 0
      while (i < lengths.length) {
        if (lengths(i) > 0) { used += 1; lone = i; if (lengths(i) > maxLen) maxLen = lengths(i) }
        i += 1
      }
      if (used == 0) corrupt()
      if (used == 1) return single(lone) // degenerate: 0-bit code
      if (maxLen > 15) corrupt()
      // canonical next-code per length (Kraft check included)
      val count = new Array[Int](maxLen + 1)
      i = 0
      while (i < lengths.length) { if (lengths(i) > 0) count(lengths(i)) += 1; i += 1 }
      val next = new Array[Int](maxLen + 2)
      var code = 0
      var len = 1
      while (len <= maxLen) {
        code = (code + count(len - 1)) << 1
        next(len) = code
        len += 1
      }
      // completeness: sum 2^(maxLen - len) over symbols must equal 2^maxLen
      var kraft = 0L
      len = 1
      while (len <= maxLen) { kraft += count(len).toLong << (maxLen - len); len += 1 }
      if (kraft != (1L << maxLen)) corrupt()
      val tree = new Array[Int](4 * used) // internal nodes < #leaves for complete trees
      var nNodes = 1
      i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l > 0) {
          val c = next(l); next(l) += 1
          var node = 0
          var d = l - 1
          while (d >= 0) {
            val branch = (c >> d) & 1
            if (d == 0) tree(2 * node + branch) = -i - 1
            else {
              if (tree(2 * node + branch) == 0) {
                tree(2 * node + branch) = nNodes
                nNodes += 1
                if (2 * nNodes + 1 >= tree.length) corrupt()
              }
              node = tree(2 * node + branch)
            }
            d -= 1
          }
        }
        i += 1
      }
      new Huffman(tree, -1)
    }
  }

  private val CodeLengthOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** The 120-entry LZ77 2D distance map (spec §4.2.2): all (dx, dy) with
    * dy ∈ 1..7, dx ∈ −7..8 plus (1..8, 0), sorted by dx²+dy² ascending,
    * ties by dy descending then dx descending — generated rather than
    * transcribed; spot values are pinned in the spec suite. Entry i
    * (1-based dist code) packs (dy << 8) | (dx + 8). */
  private[operators] val DistanceMap: Array[Int] = {
    val pairs = (for { y <- 1 to 7; x <- -7 to 8 } yield (x, y)) ++
      (for { x <- 1 to 8 } yield (x, 0))
    pairs.sortBy { case (x, y) => (x * x + y * y, -y, -x) }
      .map { case (x, y) => (y << 8) | (x + 8) }.toArray
  }

  private def divRoundUp(a: Int, shiftBits: Int): Int =
    (a + (1 << shiftBits) - 1) >> shiftBits

  // ---- transforms, recorded in read order ----
  private sealed trait Transform
  private final case class Predictor(bits: Int, w: Int, h: Int,
                                     img: Array[Int]) extends Transform
  private final case class CrossColor(bits: Int, w: Int, h: Int,
                                      img: Array[Int]) extends Transform
  private case object SubtractGreen extends Transform
  private final case class ColorIndex(nColors: Int, origW: Int,
                                      palette: Array[Int]) extends Transform

  def decode(bytes: Array[Byte],
             maxPixels: Long = 64L * 1024 * 1024): Option[Img] = {
    try {
      if (bytes == null || bytes.length < 21) return None
      if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
            bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'E' &&
            bytes(10) == 'B' && bytes(11) == 'P')) return None
      // chunk walk: find VP8L (possibly behind VP8X metadata chunks)
      var p = 12
      var guard = 0
      while (p + 8 <= bytes.length && guard < 64) {
        guard += 1
        val size = (bytes(p + 4) & 0xff) | ((bytes(p + 5) & 0xff) << 8) |
          ((bytes(p + 6) & 0xff) << 16) | ((bytes(p + 7) & 0xff) << 24)
        if (size < 0 || p + 8 + size > bytes.length) return None
        if (bytes(p) == 'V' && bytes(p + 1) == 'P' && bytes(p + 2) == '8' &&
            bytes(p + 3) == 'L')
          return decodeVp8l(bytes, p + 8, p + 8 + size, maxPixels)
        p += 8 + size + (size & 1) // chunks are even-padded
      }
      None
    } catch { case _: Throwable => None }
  }

  /** Decode a raw VP8L stream at [off, end). */
  def decodeVp8l(bytes: Array[Byte], off: Int, end: Int,
                 maxPixels: Long): Option[Img] = {
    try {
      if (off >= end || end > bytes.length) return None
      if ((bytes(off) & 0xff) != 0x2f) return None
      val br = new BitReader(java.util.Arrays.copyOfRange(bytes, off, end), 1)
      val width = br.read(14) + 1
      val height = br.read(14) + 1
      br.read(1) // alpha hint
      if (br.read(3) != 0) return None // version must be 0
      if (width.toLong * height > maxPixels) return None
      val pixels = decodeImageStream(br, width, height, isLevel0 = true, maxPixels)
      Some(Img(width, height, pixels))
    } catch { case _: Throwable => None }
  }

  /** One image stream: transforms (level 0 only) + entropy-coded pixels,
    * inverse transforms applied. Returns ARGB row-major at (w, h). */
  private def decodeImageStream(br: BitReader, w0: Int, h0: Int,
                                isLevel0: Boolean, maxPixels: Long): Array[Int] = {
    var w = w0
    val h = h0
    var transforms = List.empty[Transform]
    var seen = 0
    if (isLevel0) {
      while (br.read(1) == 1) {
        val typ = br.read(2)
        if ((seen & (1 << typ)) != 0) corrupt() // each transform at most once
        seen |= 1 << typ
        typ match {
          case 0 => // predictor
            val bits = br.read(3) + 2
            val (tw, th) = (divRoundUp(w, bits), divRoundUp(h, bits))
            transforms ::= Predictor(bits, w, h,
              decodeImageStream(br, tw, th, isLevel0 = false, maxPixels))
          case 1 => // cross-color
            val bits = br.read(3) + 2
            val (tw, th) = (divRoundUp(w, bits), divRoundUp(h, bits))
            transforms ::= CrossColor(bits, w, h,
              decodeImageStream(br, tw, th, isLevel0 = false, maxPixels))
          case 2 =>
            transforms ::= SubtractGreen
          case 3 => // color indexing: subsequent reads use the PACKED width
            val nColors = br.read(8) + 1
            val raw = decodeImageStream(br, nColors, 1, isLevel0 = false, maxPixels)
            // palette entries are component-wise deltas off the previous
            val palette = new Array[Int](nColors)
            var prev = 0
            var i = 0
            while (i < nColors) {
              val d = raw(i)
              val a = (((prev >>> 24) + (d >>> 24)) & 0xff) << 24
              val r = (((prev >>> 16) + (d >>> 16)) & 0xff) << 16
              val g = (((prev >>> 8) + (d >>> 8)) & 0xff) << 8
              val b = ((prev + d) & 0xff)
              prev = a | r | g | b
              palette(i) = prev
              i += 1
            }
            val xbits = if (nColors > 16) 0 else if (nColors > 4) 1
                        else if (nColors > 2) 2 else 3
            transforms ::= ColorIndex(nColors, w, palette)
            w = divRoundUp(w, xbits)
          case _ => corrupt()
        }
      }
    }

    // ---- color cache ----
    val cacheBits = if (br.read(1) == 1) {
      val cb = br.read(4)
      if (cb < 1 || cb > 11) corrupt()
      cb
    } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null

    // ---- meta prefix-code image (level 0 only) ----
    var metaBits = 0
    var metaImg: Array[Int] = null
    var metaW = 0
    var nGroups = 1
    if (isLevel0 && br.read(1) == 1) {
      metaBits = br.read(3) + 2
      metaW = divRoundUp(w, metaBits)
      val metaH = divRoundUp(h, metaBits)
      metaImg = decodeImageStream(br, metaW, metaH, isLevel0 = false, maxPixels)
      var mx = 0
      var i = 0
      while (i < metaImg.length) {
        val v = (metaImg(i) >>> 8) & 0xffff // meta index = red<<8 | green
        if (v > mx) mx = v
        i += 1
      }
      nGroups = mx + 1
      if (nGroups > 65536) corrupt()
    }

    // ---- prefix-code groups: 5 codes each ----
    val alphabets = Array(256 + 24 + cacheSize, 256, 256, 256, 40)
    val groups = Array.ofDim[Huffman](nGroups, 5)
    var g = 0
    while (g < nGroups) {
      var t = 0
      while (t < 5) {
        groups(g)(t) = readPrefixCode(br, alphabets(t))
        t += 1
      }
      g += 1
    }

    // ---- pixel loop (at the possibly-packed width) ----
    if (w.toLong * h > maxPixels || w <= 0 || h <= 0) corrupt()
    val n = w * h
    val px = new Array[Int](n)
    var pos = 0
    var group = groups(0)
    var lastMetaKey = -1
    def insert(argb: Int): Unit =
      if (cache != null) cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
    while (pos < n) {
      if (metaImg != null) {
        val x = pos % w
        val y = pos / w
        val key = (y >> metaBits) * metaW + (x >> metaBits)
        if (key != lastMetaKey) {
          group = groups((metaImg(key) >>> 8) & 0xffff)
          lastMetaKey = key
        }
      }
      val s = group(0).readSym(br)
      if (s < 256) { // literal
        val red = group(1).readSym(br)
        val blue = group(2).readSym(br)
        val alpha = group(3).readSym(br)
        val argb = (alpha << 24) | (red << 16) | (s << 8) | blue
        px(pos) = argb
        insert(argb)
        pos += 1
      } else if (s < 256 + 24) { // LZ77 backward reference
        val length = prefixValue(br, s - 256)
        val distCode = prefixValue(br, group(4).readSym(br))
        val dist0 =
          if (distCode > 120) distCode - 120
          else {
            val e = DistanceMap(distCode - 1)
            val d = (e >> 8) * w + ((e & 0xff) - 8)
            if (d < 1) 1 else d
          }
        if (dist0 > pos || pos + length > n) corrupt()
        var k = 0
        while (k < length) {
          val v = px(pos - dist0)
          px(pos) = v
          insert(v)
          pos += 1
          k += 1
        }
      } else { // color-cache hit
        if (cache == null) corrupt()
        val idx = s - 256 - 24
        if (idx >= cacheSize) corrupt()
        px(pos) = cache(idx)
        pos += 1
      }
    }

    // ---- inverse transforms, reverse bitstream order ----
    var out = px
    var outW = w
    transforms.foreach { // list head = last-read transform
      case Predictor(bits, tw, th, img) =>
        applyInversePredictor(out, tw, th, bits, img)
        outW = tw
      case CrossColor(bits, tw, th, img) =>
        applyInverseCrossColor(out, tw, th, bits, img)
        outW = tw
      case SubtractGreen =>
        var i = 0
        while (i < out.length) {
          val p0 = out(i)
          val green = (p0 >>> 8) & 0xff
          val r = (((p0 >>> 16) & 0xff) + green) & 0xff
          val b = ((p0 & 0xff) + green) & 0xff
          out(i) = (p0 & 0xff00ff00) | (r << 16) | b
          i += 1
        }
      case ColorIndex(nColors, origW, palette) =>
        val xbits = if (nColors > 16) 0 else if (nColors > 4) 1
                    else if (nColors > 2) 2 else 3
        val bpi = 8 >> xbits // bits per index: 8, 4, 2, or 1
        val perByte = 1 << xbits
        val mask = (1 << bpi) - 1
        val expanded = new Array[Int](origW * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < origW) {
            val packed = out(y * outW + (x >> xbits))
            val idx = ((packed >>> 8) >> ((x & (perByte - 1)) * bpi)) & mask
            expanded(y * origW + x) =
              if (idx < nColors) palette(idx) else 0 // OOB → transparent black
            x += 1
          }
          y += 1
        }
        out = expanded
        outW = origW
    }
    if (out.length != w0 * h0) corrupt() // packed width never restored ⇒ bug/corrupt
    out
  }

  /** One prefix code: simple (1–2 symbols) or code-length-coded. */
  private def readPrefixCode(br: BitReader, alphabetSize: Int): Huffman = {
    if (br.read(1) == 1) { // simple
      val nSym = br.read(1) + 1
      val first8 = br.read(1)
      val s0 = br.read(if (first8 == 1) 8 else 1)
      if (nSym == 1) Huffman.single(s0)
      else Huffman.pair(s0, br.read(8))
    } else {
      val nLen = br.read(4) + 4
      if (nLen > CodeLengthOrder.length) corrupt()
      val clcLengths = new Array[Int](19)
      var i = 0
      while (i < nLen) { clcLengths(CodeLengthOrder(i)) = br.read(3); i += 1 }
      val clcTree = Huffman.fromLengths(clcLengths)
      val lengths = new Array[Int](alphabetSize)
      var maxSymbol =
        if (br.read(1) == 1) {
          val nbits = 2 + 2 * br.read(3)
          2 + br.read(nbits)
        } else alphabetSize
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val codeLen = clcTree.readSym(br)
        if (codeLen < 16) {
          lengths(symbol) = codeLen
          symbol += 1
          if (codeLen != 0) prevLen = codeLen
        } else {
          val slot = codeLen - 16
          val repeat = (slot match {
            case 0 => 3 + br.read(2)
            case 1 => 3 + br.read(3)
            case _ => 11 + br.read(7)
          })
          if (symbol + repeat > alphabetSize) corrupt()
          val fillLen = if (slot == 0) prevLen else 0
          var k = 0
          while (k < repeat) { lengths(symbol) = fillLen; symbol += 1; k += 1 }
        }
      }
      Huffman.fromLengths(lengths)
    }
  }

  /** LZ77 length/distance prefix decode (spec §4.2.2): length codes span
    * 0..23, distance codes 0..39 — both share this expansion. */
  private def prefixValue(br: BitReader, code: Int): Int = {
    if (code < 0 || code >= 40) corrupt()
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.read(extra) + 1
    }
  }

  // ------------------------------------------------------------------
  // Minimal lossless ENCODER — the fixture/oracle twin of the decoder
  // (the WavDecode.encodePcm16Mono / Mp4SampleTable.encodeAvcSkeleton
  // convention). Emits a spec-valid VP8L stream with no transforms, no
  // color cache, and flat 8-bit literal prefix codes for all four
  // channels (every symbol code length 8 ⇒ a complete canonical tree
  // whose code for symbol s IS s), written through the full
  // code-length-code machinery so a decode exercises the real
  // ReadHuffmanCodeLengths path, not just simple codes. Any ARGB image
  // round-trips bit-exactly; compression is not the point — the
  // independent second path is.
  // ------------------------------------------------------------------

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def bits(v: Int, n: Int): Unit = { // LSB-first, mirroring BitReader
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
        i += 1
      }
    }
    /** Canonical prefix code bits: MSB of the code goes first. */
    def code(v: Int, len: Int): Unit = {
      var d = len - 1
      while (d >= 0) { bits((v >> d) & 1, 1); d -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (nBits > 0) { buf.write(cur); cur = 0; nBits = 0 }
      buf.toByteArray
    }
  }

  /** Write one flat-8 literal tree through the code-length code: clc
    * gives symbols {0, 8} one bit each, then 256 length-8 entries (the
    * `stop` arg caps via max_symbol when the alphabet is wider, i.e. the
    * green tree's 280 symbols of which only 0..255 are used). */
  private def writeFlat8Tree(bw: BitWriter, alphabetSize: Int): Unit = {
    bw.bits(0, 1) // not simple
    bw.bits(8, 4) // num_code_lengths = 12: through order index 11 (symbol 8)
    // order prefix: 17,18,0,1,2,3,4,5,16,6,7,8 — length 1 for symbols 0 and 8
    val clc = Array(0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1)
    clc.foreach(l => bw.bits(l, 3))
    if (alphabetSize > 256) {
      bw.bits(1, 1) // use max_symbol
      bw.bits(3, 3) // length_nbits = 2 + 2*3 = 8
      bw.bits(254, 8) // max_symbol = 2 + 254 = 256
    } else {
      bw.bits(0, 1)
    }
    // 256 × length-8: clc code for symbol 8 is the 1-bit code '1'
    var i = 0
    while (i < 256) { bw.bits(1, 1); i += 1 }
  }

  /** Encode ARGB pixels (row-major) as a lossless WebP file. */
  def encodeLossless(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && width <= 16384 && height > 0 && height <= 16384,
      "VP8L dims are 14-bit")
    require(pixels.length == width * height, "pixel count mismatch")
    val bw = new BitWriter
    bw.bits(width - 1, 14)
    bw.bits(height - 1, 14)
    bw.bits(if (pixels.exists(p => (p >>> 24) != 0xff)) 1 else 0, 1)
    bw.bits(0, 3) // version
    bw.bits(0, 1) // no transforms
    bw.bits(0, 1) // no color cache
    bw.bits(0, 1) // no meta prefix image
    writeFlat8Tree(bw, 256 + 24) // green
    writeFlat8Tree(bw, 256) // red
    writeFlat8Tree(bw, 256) // blue
    writeFlat8Tree(bw, 256) // alpha
    // distance tree: simple, 1 symbol (never read — no LZ77 emitted)
    bw.bits(1, 1); bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)
    var i = 0
    while (i < pixels.length) {
      val p = pixels(i)
      bw.code((p >>> 8) & 0xff, 8) // green
      bw.code((p >>> 16) & 0xff, 8) // red
      bw.code(p & 0xff, 8) // blue
      bw.code(p >>> 24, 8) // alpha
      i += 1
    }
    val payload = Array[Byte](0x2f) ++ bw.toBytes
    riffWrap(payload)
  }

  /** Wrap a VP8L payload in the RIFF container. */
  def riffWrap(vp8l: Array[Byte]): Array[Byte] = {
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val padded = if (vp8l.length % 2 == 1) vp8l :+ 0.toByte else vp8l
    val riffSize = 4 + 8 + padded.length // "WEBP" + chunk header + payload
    "RIFF".getBytes ++ le32(riffSize) ++ "WEBP".getBytes ++
      "VP8L".getBytes ++ le32(vp8l.length) ++ padded
  }

  // ---- inverse predictor (14 modes, spec §4.4.1) ----
  private def applyInversePredictor(px: Array[Int], w: Int, h: Int,
                                    bits: Int, modes: Array[Int]): Unit = {
    val modeW = divRoundUp(w, bits)
    def avg2(a: Int, b: Int): Int = {
      // per-channel (a + b) / 2 without cross-channel carries
      (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
    }
    def addPixels(a: Int, b: Int): Int = {
      // per-channel modular add
      val lo = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
      val hi = (((a >>> 8) & 0x00ff00ff) + ((b >>> 8) & 0x00ff00ff)) & 0x00ff00ff
      (hi << 8) | lo
    }
    def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    def cafFull(l: Int, t: Int, tl: Int): Int = {
      var out = 0
      var sh = 0
      while (sh < 32) {
        val c = clip255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
        out |= c << sh
        sh += 8
      }
      out
    }
    def cafHalf(ave: Int, tl: Int): Int = {
      var out = 0
      var sh = 0
      while (sh < 32) {
        val a = (ave >>> sh) & 0xff
        val b = (tl >>> sh) & 0xff
        val c = clip255(a + (a - b) / 2) // C-style truncation toward zero
        out |= c << sh
        sh += 8
      }
      out
    }
    def select(t: Int, l: Int, tl: Int): Int = {
      var pa = 0
      var pb = 0
      var sh = 0
      while (sh < 32) {
        val tc = (t >>> sh) & 0xff
        val lc = (l >>> sh) & 0xff
        val tlc = (tl >>> sh) & 0xff
        val p = tc + lc - tlc
        pa += math.abs(p - tc)
        pb += math.abs(p - lc)
        sh += 8
      }
      if (pa <= pb) t else l
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(i - 1) // top row: L
          else if (x == 0) px(i - w) // left column: T
          else {
            val mode = (modes((y >> bits) * modeW + (x >> bits)) >>> 8) & 0xff
            val l = px(i - 1)
            val t = px(i - w)
            val tl = px(i - w - 1)
            // TR: at x = w-1 the index i-w+1 lands on THIS row's first
            // pixel (already final) — exactly the spec's memory-layout
            // wrap for the rightmost column, so no branch is needed
            val tr = px(i - w + 1)
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => select(t, l, tl)
              case 12 => cafFull(l, t, tl)
              case 13 => cafHalf(avg2(l, t), tl)
              case _ => corrupt()
            }
          }
        px(i) = addPixels(px(i), pred)
        x += 1
      }
      y += 1
    }
  }

  // ---- inverse cross-color transform (spec §4.4.2) ----
  private def applyInverseCrossColor(px: Array[Int], w: Int, h: Int,
                                     bits: Int, elems: Array[Int]): Unit = {
    val tW = divRoundUp(w, bits)
    def delta(t: Int, c: Int): Int = ((t.toByte.toInt * c.toByte.toInt) >> 5)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val e = elems((y >> bits) * tW + (x >> bits))
        val g2r = e & 0xff          // blue channel of the element pixel
        val g2b = (e >>> 8) & 0xff  // green channel
        val r2b = (e >>> 16) & 0xff // red channel
        val i = y * w + x
        val p0 = px(i)
        val green = (p0 >>> 8) & 0xff
        var red = (p0 >>> 16) & 0xff
        var blue = p0 & 0xff
        red = (red + delta(g2r, green)) & 0xff
        blue = (blue + delta(g2b, green)) & 0xff
        blue = (blue + delta(r2b, red)) & 0xff
        px(i) = (p0 & 0xff00ff00) | (red << 16) | blue
        x += 1
      }
      y += 1
    }
  }
}
