package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** VP8L decoder: flat-8 encoder round-trip fuzz, plus HAND-CRAFTED
  * bitstreams (written by this spec's own independent bit writer, not
  * the production encoder) exercising LZ77 backward references, the 2D
  * distance map, the color cache, simple and code-length-coded trees,
  * and all four inverse transforms — each against pixels computed from
  * the spec's arithmetic by hand. */
class WebpDecodeSpec extends AnyFunSuite {

  /** Independent LSB-first bit writer (NOT the production BitWriter). */
  private final class BW {
    private val bytes = scala.collection.mutable.ArrayBuffer[Int]()
    private var acc = 0
    private var n = 0
    def b(v: Int, bits: Int): BW = {
      var i = 0
      while (i < bits) {
        acc |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { bytes += acc; acc = 0; n = 0 }
        i += 1
      }
      this
    }
    /** Prefix-code bits: MSB first. */
    def code(v: Int, len: Int): BW = {
      var d = len - 1
      while (d >= 0) { b((v >> d) & 1, 1); d -= 1 }
      this
    }
    def payload: Array[Byte] = {
      val tail = if (n > 0) bytes.toSeq :+ acc else bytes.toSeq
      (Seq(0x2f) ++ tail).map(_.toByte).toArray
    }
  }

  private def header(bw: BW, w: Int, h: Int): BW =
    bw.b(w - 1, 14).b(h - 1, 14).b(0, 1).b(0, 3)

  /** Simple prefix code, one symbol (0 bits consumed at read time). */
  private def single(bw: BW, sym: Int): BW =
    if (sym < 2) bw.b(1, 1).b(0, 1).b(0, 1).b(sym, 1)
    else bw.b(1, 1).b(0, 1).b(1, 1).b(sym, 8)

  /** Simple prefix code, two symbols (canonical: smaller value → '0'). */
  private def pair(bw: BW, s0: Int, s1: Int): BW = {
    (if (s0 < 2) bw.b(1, 1).b(1, 1).b(0, 1).b(s0, 1)
     else bw.b(1, 1).b(1, 1).b(1, 1).b(s0, 8)).b(s1, 8)
  }

  /** Code-length-coded tree containing exactly two length-1 symbols
    * (values may exceed 255 — LZ77/cache symbols need this path). CLC:
    * 0→'0' (len 1), 1→'10' (len 2), 17→'110', 18→'111' (len 3). */
  private def pairTreeWide(bw: BW, alphabet: Int, symA: Int, symB: Int): BW = {
    require(symA < symB)
    bw.b(0, 1) // not simple
    bw.b(0, 4) // num_code_lengths = 4: order prefix 17,18,0,1
    Seq(3, 3, 1, 2).foreach(l => bw.b(l, 3))
    bw.b(0, 1) // no max_symbol: the sequence must cover the alphabet
    def zeros(k0: Int): Unit = {
      var k = k0
      while (k > 0) {
        if (k >= 11) { val t = math.min(k, 138); bw.code(7, 3).b(t - 11, 7); k -= t }
        else if (k >= 3) { bw.code(6, 3).b(k - 3, 3); k -= k }
        else { bw.code(0, 1); k -= 1 }
      }
    }
    zeros(symA); bw.code(2, 2) // length 1
    zeros(symB - symA - 1); bw.code(2, 2)
    zeros(alphabet - symB - 1)
    bw
  }

  test("flat-8 encoder round-trips arbitrary ARGB images bit-exactly") {
    val rnd = new Random(7)
    for ((w, h) <- Seq((1, 1), (7, 3), (16, 16), (33, 2))) {
      val px = Array.fill(w * h)(rnd.nextInt())
      val Some(img) = WebpDecode.decode(WebpDecode.encodeLossless(w, h, px))
      assert(img.width == w && img.height == h)
      assert(img.pixels.toSeq == px.toSeq, s"round-trip $w x $h")
    }
    // channel cue: opaque image → 3, any alpha → 4
    val opaque = Array.fill(4)(0xff123456)
    assert(WebpDecode.decode(WebpDecode.encodeLossless(2, 2, opaque)).get.channels == 3)
    val translucent = opaque.updated(2, 0x80123456)
    assert(WebpDecode.decode(WebpDecode.encodeLossless(2, 2, translucent)).get.channels == 4)
  }

  test("distance map: generated table matches the spec's pinned entries") {
    val m = WebpDecode.DistanceMap
    assert(m.length == 120 && m.distinct.length == 120)
    def at(code: Int) = ((m(code - 1) & 0xff) - 8, m(code - 1) >> 8) // (dx, dy)
    assert(at(1) == (0, 1) && at(2) == (1, 0) && at(3) == (1, 1))
    assert(at(4) == (-1, 1) && at(5) == (0, 2) && at(6) == (2, 0))
    assert(at(7) == (1, 2) && at(9) == (2, 1) && at(13) == (0, 3))
    assert(at(120) == (8, 7))
    // every (dx, dy) is in range and the set is the documented one
    assert(m.forall { e => val dy = e >> 8; val dx = (e & 0xff) - 8
      (dy == 0 && dx >= 1 && dx <= 8) || (dy >= 1 && dy <= 7 && dx >= -7 && dx <= 8) })
  }

  test("LZ77 backward reference through the 2D distance map") {
    // 3×1: one literal then a length-2 copy at distance (1,0) → 1
    val bw = header(new BW, 3, 1)
    bw.b(0, 1).b(0, 1).b(0, 1) // no transforms, no cache, no meta
    pairTreeWide(bw, 256 + 24, 5, 257) // green: literal 5, length-code 1
    single(bw, 7) // red
    single(bw, 9) // blue
    single(bw, 255) // alpha
    single(bw, 1) // distance: prefix code 1 → value 2 → map (1,0) → dist 1
    bw.code(0, 1) // literal green 5
    bw.code(1, 1) // symbol 257: length code 1 → length 2, no extra bits
    val Some(img) = WebpDecode.decode(WebpDecode.riffWrap(bw.payload))
    assert(img.pixels.toSeq == Seq.fill(3)(0xff070509))
  }

  test("color cache: a hit replays the inserted pixel") {
    val v = 0xff070509 // literal pixel below
    val idx = ((0x1e35a7bd * v) >>> (32 - 1)).toInt // cacheBits = 1
    val bw = header(new BW, 2, 1)
    bw.b(0, 1) // no transforms
    bw.b(1, 1).b(1, 4) // color cache, 1 bit → size 2
    bw.b(0, 1) // no meta
    pairTreeWide(bw, 256 + 24 + 2, 5, 280 + idx) // green: literal 5 + cache hit
    single(bw, 7); single(bw, 9); single(bw, 255); single(bw, 0)
    bw.code(0, 1) // literal → inserts v at idx
    bw.code(1, 1) // cache hit
    val Some(img) = WebpDecode.decode(WebpDecode.riffWrap(bw.payload))
    assert(img.pixels.toSeq == Seq(v, v))
  }

  test("subtract-green inverse adds green to red and blue") {
    val bw = header(new BW, 1, 1)
    bw.b(1, 1).b(2, 2) // transform: subtract-green
    bw.b(0, 1) // end of transforms
    bw.b(0, 1).b(0, 1) // no cache, no meta
    single(bw, 100); single(bw, 30); single(bw, 200); single(bw, 255); single(bw, 0)
    val Some(img) = WebpDecode.decode(WebpDecode.riffWrap(bw.payload))
    // r = (30+100) & 0xff = 130, b = (200+100) & 0xff = 44
    assert(img.pixels.toSeq == Seq(0xff82642c | 0xff000000))
    assert(img.pixels(0) == ((0xff << 24) | (130 << 16) | (100 << 8) | 44))
  }

  /** 2×2 stream with one predictor block of the given mode; residuals
    * are (0,10,20,30) for the first pixel and (0,1,1,1) after. */
  private def predictorStream(mode: Int): Array[Byte] = {
    val bw = header(new BW, 2, 2)
    bw.b(1, 1).b(0, 2) // transform: predictor
    bw.b(0, 3) // size_bits = 2 → one 4×4 block → 1×1 mode image
    // mode subimage stream (not level0): no cache; 5 trees; mode in green
    bw.b(0, 1)
    single(bw, mode); single(bw, 0); single(bw, 0); single(bw, 0); single(bw, 0)
    bw.b(0, 1) // end of transforms
    bw.b(0, 1).b(0, 1) // no cache, no meta
    pairTreeWide(bw, 256 + 24, 1, 20) // green residuals {20, 1}
    pair(bw, 10, 1) // red residuals {10, 1}
    pair(bw, 30, 1) // blue residuals {30, 1}
    single(bw, 0) // alpha residual 0
    single(bw, 0) // distance (unused)
    bw.code(1, 1).code(1, 1).code(1, 1) // (0,0): g=20, r=10, b=30
    for (_ <- 0 until 3) bw.code(0, 1).code(0, 1).code(0, 1) // rest: (1,1,1)
    WebpDecode.riffWrap(bw.payload)
  }

  test("predictor transform: border rules + per-mode prediction at (1,1)") {
    def px(a: Int, r: Int, g: Int, b: Int) = (a << 24) | (r << 16) | (g << 8) | b
    // borders are mode-independent: (0,0) += black, top row += L, left col += T
    val base = Seq(px(0xff, 10, 20, 30), px(0xff, 11, 21, 31), px(0xff, 11, 21, 31))
    // (1,1) by mode: T/L/TL all resolved from the finals above
    val expect11 = Map(
      1 -> px(0xff, 12, 22, 32), // L
      2 -> px(0xff, 12, 22, 32), // T
      4 -> px(0xff, 11, 21, 31), // TL
      7 -> px(0xff, 12, 22, 32), // avg2(L, T) — L == T here
      11 -> px(0xff, 12, 22, 32), // Select: ties → T
      12 -> px(0xff, 13, 23, 33), // clamp(L + T − TL) = (12,22,32) + 1
      // avg2(L,T)=(11,21,31); a + (a−TL)/2 = a + 1/2 = a (trunc toward 0)
      13 -> px(0xff, 12, 22, 32))
    for ((mode, want) <- expect11) {
      val Some(img) = WebpDecode.decode(predictorStream(mode))
      assert(img.pixels.take(3).toSeq == base, s"mode $mode borders")
      assert(img.pixels(3) == want,
        s"mode $mode: got ${img.pixels(3).toHexString}, want ${want.toHexString}")
    }
  }

  test("color indexing: palette deltas, sub-byte packing, OOB index → transparent") {
    // 8×1, 2 colors → 1-bit indices, 8 per green byte (packed width 1)
    val bw = header(new BW, 8, 1)
    bw.b(1, 1).b(3, 2) // transform: color indexing
    bw.b(1, 8) // nColors − 1 = 1
    // palette image stream (2×1): raw0 = c0, raw1 = c1 − c0 (per channel)
    bw.b(0, 1) // no cache
    pair(bw, 20, 40) // green raws
    pair(bw, 10, 40) // red raws
    pair(bw, 30, 40) // blue raws
    pair(bw, 255, 0) // alpha raws (c0 opaque, delta 0)
    single(bw, 0) // distance
    bw.code(0, 1).code(0, 1).code(0, 1).code(1, 1) // raw0: g20 r10 b30 a255
    bw.code(1, 1).code(1, 1).code(1, 1).code(0, 1) // raw1: +40 +40 +40 +0
    bw.b(0, 1) // end of transforms
    // main (packed 1×1): indices 0,1,0,1,1,0,1,1 low-bit-first → 0xDA
    bw.b(0, 1).b(0, 1)
    single(bw, 0xDA); single(bw, 0); single(bw, 0); single(bw, 0); single(bw, 0)
    val Some(img) = WebpDecode.decode(WebpDecode.riffWrap(bw.payload))
    val c0 = (255 << 24) | (10 << 16) | (20 << 8) | 30
    val c1 = (255 << 24) | (50 << 16) | (60 << 8) | 70
    assert(img.width == 8 && img.height == 1)
    assert(img.pixels.toSeq ==
      Seq(0, 1, 0, 1, 1, 0, 1, 1).map(i => if (i == 0) c0 else c1))
  }

  test("poison rows: junk, truncation, bomb guard, lossy VP8 → None (never throw)") {
    assert(WebpDecode.decode(null).isEmpty)
    assert(WebpDecode.decode(Array.emptyByteArray).isEmpty)
    assert(WebpDecode.decode("RIFFxxxxWEBPVP8 lossy-frame-no-decoder".getBytes).isEmpty)
    val good = WebpDecode.encodeLossless(4, 4, Array.fill(16)(0xff336699))
    assert(WebpDecode.decode(good).nonEmpty)
    // (not good.length − 1: the final byte can be pure RIFF pad/bit
    // padding, whose removal still decodes — and must decode correctly)
    for (cut <- Seq(13, 20, good.length / 2, good.length - 2))
      assert(WebpDecode.decode(good.take(cut)).isEmpty, s"truncated at $cut")
    // bomb guard fires on header dims before pixel allocation
    assert(WebpDecode.decode(good, maxPixels = 15).isEmpty)
    // bit flips must never throw (sweep a prefix of the stream)
    for (i <- 12 until math.min(good.length, 80); bit <- Seq(1, 0x40)) {
      val b = good.clone(); b(i) = (b(i) ^ bit).toByte
      WebpDecode.decode(b) // any result is fine; throwing is the failure
    }
  }

  test("decodeImageBatch routes lossless WebP to the VP8L arm with exact channel means") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val px = Array.tabulate(8)(i => (0xff << 24) | ((10 * i) << 16) | (5 << 8) | (200 - i))
    val webp = WebpDecode.encodeLossless(4, 2, px)
    val df = Seq((1L, webp), (2L, "RIFF1234WEBPVP8 junk".getBytes))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeImageBatch(df).collect().map(r => r.getLong(0) -> r).toMap
    val ok = out(1L)
    assert(ok.getBoolean(1) && ok.getString(2) == "webp" &&
      ok.getInt(3) == 4 && ok.getInt(4) == 2 && ok.getInt(5) == 3)
    val means = ok.getSeq[Double](6)
    assert(means(0) == px.map(p => (p >>> 16) & 0xff).sum / 8.0)
    assert(means(1) == 5.0 && means(2) == px.map(_ & 0xff).sum / 8.0)
    val bad = out(2L)
    assert(!bad.getBoolean(1) && bad.getString(2) == "webp" && bad.isNullAt(5))
  }
}
