package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}
import javax.imageio.ImageIO

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PNG pixel decode: validated two independent ways — round-trip through
  * the JDK's OWN encoder (ImageIO, a separate spec implementation whose
  * filter choices we don't control), and hand-built streams that pin each
  * of the five scanline filters explicitly. */
class PngDecodeSpec extends SparkSpec {

  /** Encode via ImageIO (independent reference encoder). */
  private def imageioPng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", bos), "JDK PNG writer unavailable")
    bos.toByteArray
  }

  /** Minimal hand-rolled PNG encoder with a CHOSEN filter type per row —
    * applies the filter forward (filtered = raw − predictor mod 256) so
    * the decoder's reconstruction is what's under test. */
  private def handPng(w: Int, h: Int, colorType: Int, pixels: Array[Byte],
                      filterType: Int, plte: Array[Byte] = null): Array[Byte] = {
    val chans = colorType match { case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4 }
    val stride = w * chans
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      raw(y * (stride + 1)) = filterType.toByte
      for (x <- 0 until stride) {
        val v = pixels(y * stride + x) & 0xff
        val a = if (x >= chans) pixels(y * stride + x - chans) & 0xff else 0
        val b = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val c = if (y > 0 && x >= chans) pixels((y - 1) * stride + x - chans) & 0xff else 0
        val pred = filterType match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(y * (stride + 1) + 1 + x) = ((v - pred) & 0xff).toByte
      }
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    d.end()

    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      def be32(v: Long): Unit =
        out.write(Array(((v >> 24) & 0xff).toInt, ((v >> 16) & 0xff).toInt,
          ((v >> 8) & 0xff).toInt, (v & 0xff).toInt).map(_.toByte))
      be32(data.length)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      be32(crc.getValue)
      out.toByteArray
    }
    val ihdr = Array(
      (w >> 24) & 0xff, (w >> 16) & 0xff, (w >> 8) & 0xff, w & 0xff,
      (h >> 24) & 0xff, (h >> 16) & 0xff, (h >> 8) & 0xff, h & 0xff,
      8, colorType, 0, 0, 0).map(_.toByte)
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.write(chunk("IHDR", ihdr))
    if (plte != null) out.write(chunk("PLTE", plte))
    out.write(chunk("IDAT", comp.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  test("round-trips the JDK encoder's PNGs pixel-exact (RGB and RGBA)") {
    val rnd = new scala.util.Random(7)
    for (imgType <- Seq(BufferedImage.TYPE_INT_RGB, BufferedImage.TYPE_INT_ARGB)) {
      val w = 23; val h = 17
      val img = new BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, rnd.nextInt())
      val decoded = PngDecode.decode(imageioPng(img))
        .getOrElse(fail(s"decode failed for type $imgType"))
      assert(decoded.width === w && decoded.height === h)
      val hasAlpha = imgType == BufferedImage.TYPE_INT_ARGB
      assert(decoded.channels === (if (hasAlpha) 4 else 3))
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val base = (y * w + x) * decoded.channels
        assert((decoded.pixels(base) & 0xff) === ((argb >> 16) & 0xff), s"R at ($x,$y)")
        assert((decoded.pixels(base + 1) & 0xff) === ((argb >> 8) & 0xff), s"G at ($x,$y)")
        assert((decoded.pixels(base + 2) & 0xff) === (argb & 0xff), s"B at ($x,$y)")
        if (hasAlpha)
          assert((decoded.pixels(base + 3) & 0xff) === ((argb >>> 24) & 0xff), s"A at ($x,$y)")
      }
    }
  }

  test("reconstructs every filter type (None/Sub/Up/Average/Paeth) exactly") {
    val rnd = new scala.util.Random(11)
    val w = 9; val h = 7
    for (ft <- 0 to 4; colorType <- Seq(0, 2, 4, 6)) {
      val chans = colorType match { case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4 }
      val pixels = Array.fill[Byte](w * h * chans)(rnd.nextInt().toByte)
      val png = handPng(w, h, colorType, pixels, ft)
      val dec = PngDecode.decode(png).getOrElse(fail(s"filter $ft color $colorType failed"))
      assert(dec.width === w && dec.height === h && dec.channels === chans)
      assert(dec.pixels.toSeq === pixels.toSeq, s"filter $ft color $colorType")
    }
  }

  test("palette images expand through PLTE to RGB") {
    val plte = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90) // 3 entries
    val idx = Array[Byte](0, 1, 2, 2, 1, 0) // 3x2
    val dec = PngDecode.decode(handPng(3, 2, 3, idx, 1, plte)).getOrElse(fail("palette"))
    assert(dec.channels === 3)
    assert(dec.pixels.toSeq === Seq[Byte](
      10, 20, 30, 40, 50, 60, 70, 80, 90, 70, 80, 90, 40, 50, 60, 10, 20, 30))
  }

  test("unsupported/corrupt inputs yield None, never throw") {
    val good = handPng(4, 4, 2, Array.fill[Byte](48)(5), 0)
    assert(PngDecode.decode(good).isDefined)
    assert(PngDecode.decode(Array.emptyByteArray).isEmpty)
    assert(PngDecode.decode("not a png at all".getBytes).isEmpty)
    assert(PngDecode.decode(good.take(good.length - 20)).isEmpty, "truncated IDAT")
    assert(PngDecode.decode(good.take(30)).isEmpty, "truncated header")
    // decompression-bomb guard: same bytes, tiny pixel budget
    assert(PngDecode.decode(good, maxPixels = 8).isEmpty)
    // 16-bit depth is out of coverage → None (flip the depth byte and
    // expect a clean refusal even though the CRC no longer matches)
    val deep = good.clone(); deep(24) = 16
    assert(PngDecode.decode(deep).isEmpty)
  }

  test("decodePngBatch: per-channel means for real payloads, null-cue rows for the rest") {
    val s = spark
    import s.implicits._
    // solid-color RGB: means are exactly the channel constants
    val solid = {
      val img = new BufferedImage(10, 6, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 10) img.setRGB(x, y, 0x102030)
      imageioPng(img)
    }
    val df = Seq(
      (1L, solid),
      (2L, "junk payload".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.decodePngBatch(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val ok = out(1L)
    assert(ok.getBoolean(1) && ok.getInt(2) === 10 && ok.getInt(3) === 6 && ok.getInt(4) === 3)
    assert(ok.getSeq[Double](5) === Seq(0x10.toDouble, 0x20.toDouble, 0x30.toDouble))
    val bad = out(2L)
    assert(!bad.getBoolean(1) && bad.isNullAt(2) && bad.isNullAt(5))
  }
}
