package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ImageIO decode arm (JPEG/GIF/BMP) + the combined decodeImageBatch
  * dispatch: encoders are the JDK's own writers, so expected channel
  * means are computed from the source raster, not hard-coded. */
class ImageIoDecodeSpec extends SparkSpec {

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK $fmt writer unavailable")
    bos.toByteArray
  }

  private def meansOf(img: BufferedImage): Array[Double] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Long](3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      sums(0) += (p >>> 16) & 0xff; sums(1) += (p >>> 8) & 0xff; sums(2) += p & 0xff
    }
    sums.map(_.toDouble / (w.toLong * h))
  }

  test("BMP decodes bit-exact; GIF black/white palette exact; JPEG solid within codec noise") {
    val grad = new BufferedImage(8, 6, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 6; x <- 0 until 8)
      grad.setRGB(x, y, (x * 30 << 16) | (y * 40 << 8) | (x + y))
    val Some(bmp) = ImageIoDecode.decode(encode(grad, "bmp"))
    assert(bmp.format == "bmp" && bmp.width == 8 && bmp.height == 6 && bmp.channels == 3)
    assert(bmp.meanChannel.toSeq == meansOf(grad).toSeq)

    // the JDK GIF writer quantizes to its own palette, so the expected
    // means come from re-reading the encoded bytes with ImageIO.read (the
    // reference decoder) rather than from the pre-encode raster
    val bw = new BufferedImage(4, 4, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 4; x <- 0 until 4)
      bw.setRGB(x, y, if (x < 2) 0x000000 else 0xffffff)
    val gifBytes = encode(bw, "gif")
    val Some(gif) = ImageIoDecode.decode(gifBytes)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(gifBytes))
    assert(gif.format == "gif" && gif.meanChannel.take(3).toSeq == meansOf(ref).toSeq)

    val solid = new BufferedImage(16, 16, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 16; x <- 0 until 16) solid.setRGB(x, y, (100 << 16) | (150 << 8) | 200)
    val Some(jpg) = ImageIoDecode.decode(encode(solid, "jpg"))
    assert(jpg.format.startsWith("jp") && jpg.width == 16 && jpg.height == 16)
    jpg.meanChannel.zip(Seq(100.0, 150.0, 200.0)).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 2.0, s"jpeg mean $got vs $want")
    }
  }

  /** Animated GIF: one constant-gray frame per value, written through the
    * JDK writer's sequence API over an EXPLICIT 256-gray IndexColorModel
    * (indexed input round-trips GIF's palette exactly — no quantizer in
    * the loop, so decoded means are the exact frame values). */
  private def animatedGif(values: Seq[Int], w: Int = 8, h: Int = 8): Array[Byte] = {
    val ramp = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    values.foreach { v =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
      for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, v)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  test("frames: animated GIF decodes per-frame stats; even sampling; single frame; junk cue") {
    val vals = Seq(10, 60, 110, 160, 210, 255)
    val bytes = animatedGif(vals)
    // all frames when maxFrames >= n
    val Some((n, fs)) = ImageIoDecode.frames(bytes, maxFrames = 8)
    assert(n == 6 && fs.map(_.index) == (0 until 6))
    fs.zip(vals).foreach { case (f, v) =>
      assert(f.width == 8 && f.height == 8)
      assert(f.meanChannel.toSeq == Seq(v.toDouble, v.toDouble, v.toDouble))
    }
    // even sampling when maxFrames < n: floor(k*6/3) = frames 0, 2, 4
    val Some((n2, fs2)) = ImageIoDecode.frames(bytes, maxFrames = 3)
    assert(n2 == 6 && fs2.map(_.index) == Seq(0, 2, 4))
    assert(fs2.map(_.meanChannel(0)) == Seq(10.0, 110.0, 210.0))
    // a plain single-frame GIF is a 1-frame animation
    val Some((n3, fs3)) = ImageIoDecode.frames(animatedGif(Seq(42)), maxFrames = 4)
    assert(n3 == 1 && fs3.map(_.meanChannel(2)) == Seq(42.0))
    // junk → None; per-frame bomb guard fires on header dims
    assert(ImageIoDecode.frames(Array[Byte](1, 2, 3), 4).isEmpty)
    assert(ImageIoDecode.frames(animatedGif(Seq(5), w = 64, h = 64), 4,
      maxPixels = 100).isEmpty)
  }

  test("sampleGifFramesBatch: frame rows through the partition seam, poison-row cue") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, animatedGif(Seq(20, 40, 60))),
      (2L, animatedGif(Seq(99))),
      (3L, "not a gif".getBytes("UTF-8")))
    val df = rows.toDF("doc_id", "payload").repartition(3)
    val out = Multimodal.sampleGifFramesBatch(df, maxFrames = 8)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).groupBy(_._1)
    assert(out(1L).length == 3 && out(1L).forall(_._2))
    assert(out(2L).length == 1 && out(2L).head._2)
    assert(out(3L).length == 1 && !out(3L).head._2)
    val f1 = Multimodal.sampleGifFramesBatch(df, maxFrames = 8)
      .filter(col("doc_id") === 1L).orderBy("frame_idx")
      .select("n_frames", "frame_idx", "width", "mean_g")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(f1.toSeq == Seq((3, 0, 8, 20.0), (3, 1, 8, 40.0), (3, 2, 8, 60.0)))
  }

  test("bomb guard rejects before pixel decode; junk returns None") {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_3BYTE_BGR)
    val bytes = encode(img, "jpg")
    assert(ImageIoDecode.decode(bytes, maxPixels = 63L * 64).isEmpty)
    assert(ImageIoDecode.decode(bytes, maxPixels = 64L * 64).nonEmpty)
    assert(ImageIoDecode.decode("not an image".getBytes).isEmpty)
    assert(ImageIoDecode.decode(Array.emptyByteArray).isEmpty)
  }

  test("decodeImageBatch dispatches PNG→PngDecode (native channels), others→ImageIO, junk→null cue") {
    val s = spark
    import s.implicits._
    val rgba = new BufferedImage(5, 4, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 4; x <- 0 until 5)
      rgba.setRGB(x, y, ((40 + x) << 24) | ((x * 9) << 16) | ((y * 7) << 8) | (x + y))
    val gray = new BufferedImage(6, 3, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 3; x <- 0 until 6)
      gray.getRaster.setSample(x, y, 0, 10 * x + y)
    val bmpImg = new BufferedImage(3, 3, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 3; x <- 0 until 3) bmpImg.setRGB(x, y, (x * 50 << 16) | (y * 60 << 8))

    val df = Seq(
      (1L, encode(rgba, "png")),
      (2L, encode(gray, "png")),
      (3L, encode(bmpImg, "bmp")),
      (4L, "RIFFxxxxWEBPVP8 garbage".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.decodeImageBatch(df).collect().map(r => r.getLong(0) -> r).toMap

    // PNG arm keeps native channels: RGBA → 4, gray → 1
    val p1 = out(1L)
    assert(p1.getBoolean(1) && p1.getString(2) == "png" && p1.getInt(5) == 4)
    // cross-validate the two independent decoders on the same bytes
    val viaImageIo = ImageIoDecode.decode(encode(rgba, "png")).get
    assert(p1.getSeq[Double](6).take(3) == viaImageIo.meanChannel.take(3).toSeq)
    assert(p1.getSeq[Double](6)(3) == viaImageIo.meanChannel(3))

    val p2 = out(2L)
    assert(p2.getBoolean(1) && p2.getInt(5) == 1)
    assert(p2.getSeq[Double](6) == Seq((0 to 2).flatMap(y => (0 to 5).map(x => 10 * x + y)).sum / 18.0))

    val p3 = out(3L)
    assert(p3.getBoolean(1) && p3.getString(2) == "bmp" && p3.getInt(5) == 3)
    assert(p3.getSeq[Double](6) == meansOf(bmpImg).toSeq)

    val p4 = out(4L)
    assert(!p4.getBoolean(1) && p4.isNullAt(3) && p4.isNullAt(6))
  }

  test("resizeImageBatch: exact box means on integer ratios, nearest otherwise, PNG round-trip") {
    val s = spark
    import s.implicits._
    // 4×4 with known 2×2 block means: block (0,0) holds 10,20,30,40 → mean 25
    val src = new BufferedImage(4, 4, BufferedImage.TYPE_INT_ARGB)
    val vals = Array(
      Array(10, 20, 100, 100),
      Array(30, 40, 100, 100),
      Array(200, 200, 7, 7),
      Array(200, 200, 7, 7))
    for (y <- 0 until 4; x <- 0 until 4) {
      val v = vals(y)(x)
      src.setRGB(x, y, (0xff << 24) | (v << 16) | (v << 8) | v)
    }
    val df = Seq((1L, encode(src, "png")), (2L, "junk".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.resizeImageBatch(df, 2, 2).collect().map(r => r.getLong(0) -> r).toMap

    val ok = out(1L)
    assert(ok.getBoolean(1) && ok.getInt(2) == 2 && ok.getInt(3) == 2)
    // re-decode the emitted PNG: box means are exact integers here
    val thumb = ImageIO.read(new java.io.ByteArrayInputStream(ok.getAs[Array[Byte]](4)))
    def gray(x: Int, y: Int) = thumb.getRGB(x, y) & 0xff
    assert(gray(0, 0) == 25 && gray(1, 0) == 100 && gray(0, 1) == 200 && gray(1, 1) == 7)
    assert(!out(2L).getBoolean(1) && out(2L).isNullAt(4))

    // non-integer ratio (4→3) falls back to nearest: source index floor(t*4/3)
    val near = Multimodal.resizeImageBatch(df.filter(col("doc_id") === 1L), 3, 1)
      .collect().head
    val t2 = ImageIO.read(new java.io.ByteArrayInputStream(near.getAs[Array[Byte]](4)))
    assert((0 until 3).map(x => t2.getRGB(x, 0) & 0xff) ==
      Seq(vals(0)(0), vals(0)(1), vals(0)(2)))
  }
}
