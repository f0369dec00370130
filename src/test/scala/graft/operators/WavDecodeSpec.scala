package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WAV/PCM decode: hand-built RIFF streams with known sample content so
  * every feature (peak/RMS/zero-crossings) has an exact expected value. */
class WavDecodeSpec extends SparkSpec {

  /** Minimal RIFF/WAVE writer: fmt + optional ancillary chunk + data. */
  private def wav(rate: Int, channels: Int, bits: Int,
                  samples: Array[Int], audioFormat: Int = 1,
                  ancillary: Option[(String, Array[Byte])] = None): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def chunk(id: String, body: Array[Byte]): Unit = {
      bos.write(id.getBytes("US-ASCII"))
      val len = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(body.length).array()
      bos.write(len); bos.write(body)
      if ((body.length & 1) == 1) bos.write(0) // word-align
    }
    val bps = bits / 8
    val fmt = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(audioFormat.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * bps)
      .putShort((channels * bps).toShort).putShort(bits.toShort).array()
    val data = ByteBuffer.allocate(samples.length * bps).order(ByteOrder.LITTLE_ENDIAN)
    samples.foreach { v =>
      if (bits == 16) data.putShort(v.toShort) else data.put(((v + 128) & 0xff).toByte)
    }
    chunk("fmt ", fmt)
    ancillary.foreach { case (id, body) => chunk(id, body) }
    chunk("data", data.array())
    val payload = bos.toByteArray
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4 + payload.length).array())
    out.write("WAVE".getBytes("US-ASCII"))
    out.write(payload)
    out.toByteArray
  }

  test("16-bit stereo square wave: exact peak, RMS, zero-crossings per channel") {
    // ch0 alternates ±1000 every frame (square wave: RMS = 1000 exactly,
    // a sign flip at every step); ch1 is constant 5 (RMS = 5, no flips)
    val n = 100
    val samples = Array.tabulate(n * 2) { i =>
      if (i % 2 == 0) { if ((i / 2) % 2 == 0) 1000 else -1000 } else 5
    }
    val Some(w) = WavDecode.decode(wav(8000, 2, 16, samples))
    assert(w.sampleRate == 8000 && w.channels == 2 && w.bitsPerSample == 16)
    assert(w.nFrames == n)
    assert(w.samples.take(4).toSeq == Seq(1000, 5, -1000, 5))
  }

  test("8-bit mono recenters to signed and decodes through ancillary chunks") {
    // 8-bit stores unsigned: value 128+x decodes to x; an odd-length LIST
    // chunk before data exercises the word-aligned chunk walk
    val samples = Array(0, 100, -100, 127, -128)
    val bytes = wav(44100, 1, 8, samples,
      ancillary = Some(("LIST", Array[Byte](1, 2, 3)))) // odd length → pad
    val Some(w) = WavDecode.decode(bytes)
    assert(w.samples.toSeq == samples.toSeq)
    assert(w.sampleRate == 44100 && w.bitsPerSample == 8 && w.nFrames == 5)
  }

  test("unsupported forms return None: float PCM, truncation, non-WAV, frame cap") {
    val good = wav(8000, 1, 16, Array(1, 2, 3, 4))
    assert(WavDecode.decode(wav(8000, 1, 16, Array(1, 2), audioFormat = 3)).isEmpty)
    assert(WavDecode.decode(good.take(30)).isEmpty)
    assert(WavDecode.decode("not audio at all".getBytes).isEmpty)
    assert(WavDecode.decode(good, maxFrames = 2).isEmpty)
    assert(WavDecode.decode(good).nonEmpty)
  }

  test("decodeWavBatch: exact per-channel features, null-cue for non-WAV payloads") {
    val s = spark
    import s.implicits._
    val n = 64
    val square = Array.tabulate(n * 2) { i =>
      if (i % 2 == 0) { if ((i / 2) % 2 == 0) 1000 else -1000 } else 5
    }
    val df = Seq(
      (1L, wav(16000, 2, 16, square)),
      (2L, "plain text payload".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.decodeWavBatch(df).collect()
      .map(r => r.getLong(0) -> r).toMap

    val ok = out(1L)
    assert(ok.getBoolean(1))
    assert(ok.getInt(2) == 16000 && ok.getInt(3) == 2 && ok.getInt(4) == 16)
    assert(ok.getInt(5) == n && ok.getDouble(6) == n.toDouble / 16000)
    assert(ok.getSeq[Int](7) == Seq(1000, 5))          // peak
    assert(ok.getSeq[Double](8) == Seq(1000.0, 5.0))   // square-wave RMS exact
    // ch0 flips sign between every adjacent frame; ch1 never does
    assert(ok.getSeq[Long](9) == Seq((n - 1).toLong, 0L))

    val bad = out(2L)
    assert(!bad.getBoolean(1) && bad.isNullAt(2) && bad.isNullAt(8))
  }
}
