package graft.operators

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

/** JDK-ImageIO pixel decode — the JPEG/GIF/BMP arm of the multimodal
  * codec seam. `javax.imageio` ships in `java.desktop` (headless-safe for
  * raster work): baseline+progressive JPEG, GIF and BMP readers with no
  * native libraries or added dependencies, which closes the lossy-format
  * gap the pure-JVM [[PngDecode]] arm leaves open. Never throws — poison
  * rows return None, the shared null-cue contract.
  *
  * Semantics: pixels are read through the sRGB view (`BufferedImage
  * .getRGB`), so output is format-uniform — `channels` is 3 (opaque) or
  * 4 (alpha), and a grayscale JPEG reports three equal channel means.
  * [[PngDecode]] keeps native channels (1 for gray); callers who need
  * PNG's native view route PNG payloads there (as
  * [[Multimodal.decodeImageBatch]] does).
  *
  * Scale: per-row map-side work. The decompression-bomb guard reads the
  * header dimensions through the ImageReader BEFORE decoding pixels, so
  * an adversarial 64k×64k JPEG costs a header parse, not 16 GiB. */
object ImageIoDecode {

  final case class Img(format: String, width: Int, height: Int,
                       channels: Int, meanChannel: Array[Double])

  def decode(bytes: Array[Byte], maxPixels: Long = 64L * 1024 * 1024): Option[Img] =
    try decodeOrNone(bytes, maxPixels) catch { case _: Throwable => None }

  /** Full-pixel read through the same guard: (width, height, packed ARGB
    * rows) — the input contract for resize/thumbnail kernels. Same
    * never-throw and header-first bomb-guard semantics as [[decode]]. */
  def readArgb(bytes: Array[Byte],
               maxPixels: Long = 64L * 1024 * 1024): Option[(Int, Int, Array[Int])] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      if (iis == null) return None
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val (w, h) = (reader.getWidth(0), reader.getHeight(0))
          if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
          val img = reader.read(0)
          val px = new Array[Int](w * h)
          img.getRGB(0, 0, w, h, px, 0, w)
          Some((w, h, px))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Throwable => None }

  final case class Frame(index: Int, width: Int, height: Int,
                         meanChannel: Array[Double])

  /** Per-frame decode of a MULTI-FRAME container — real video-style
    * frame sampling for the one container the JDK decodes natively:
    * animated GIF (`getNumImages(true)` + indexed `read(i)`). Returns
    * (total frame count, up to `maxFrames` evenly-spaced decoded frames)
    * with per-frame dimensions and mean RGB. Frames are decoded as
    * STORED (GIF inter-frame patches are not composited onto the
    * canvas — disposal-method composition is a player concern; for
    * feature extraction the stored rasters are the signal). Same
    * never-throw + header-first bomb-guard contract as [[decode]]:
    * every frame's dimensions are checked BEFORE its pixels are read. */
  def frames(bytes: Array[Byte], maxFrames: Int,
             maxPixels: Long = 64L * 1024 * 1024): Option[(Int, Seq[Frame])] =
    try {
      require(maxFrames >= 1)
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      if (iis == null) return None
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          // seekForwardOnly = false: getNumImages(true) must scan ahead
          reader.setInput(iis, false, true)
          val n = reader.getNumImages(true)
          if (n <= 0) return None
          val take = math.min(maxFrames, n)
          val idxs = (0 until take).map(k => (k.toLong * n / take).toInt)
          val out = Vector.newBuilder[Frame]
          for (i <- idxs) {
            val (w, h) = (reader.getWidth(i), reader.getHeight(i))
            if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
            val img = reader.read(i)
            val sums = new Array[Long](3)
            val row = new Array[Int](w)
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) {
                val p = row(x)
                sums(0) += (p >>> 16) & 0xff
                sums(1) += (p >>> 8) & 0xff
                sums(2) += p & 0xff
                x += 1
              }
              y += 1
            }
            val nPix = (w.toLong * h).toDouble
            out += Frame(i, w, h, sums.map(_ / nPix))
          }
          Some((n, out.result()))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Throwable => None }

  private def decodeOrNone(bytes: Array[Byte], maxPixels: Long): Option[Img] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    if (iis == null) return None
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val (w, h) = (reader.getWidth(0), reader.getHeight(0))
        if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
        val img = reader.read(0)
        val fmt = reader.getFormatName.toLowerCase
        val hasAlpha = img.getColorModel.hasAlpha
        val chans = if (hasAlpha) 4 else 3
        val sums = new Array[Long](chans)
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            sums(0) += (p >>> 16) & 0xff
            sums(1) += (p >>> 8) & 0xff
            sums(2) += p & 0xff
            if (hasAlpha) sums(3) += (p >>> 24) & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some(Img(fmt, w, h, chans, sums.map(_.toDouble / n)))
      } finally reader.dispose()
    } finally iis.close()
  }
}
