package graft.operators

/** Pure-JVM WAV (RIFF/WAVE) PCM decode — the audio arm of the multimodal
  * codec seam, same contract as [[PngDecode]]: public container format
  * (RIFF chunks per the Microsoft/IBM WAVE spec), no native libraries,
  * never throws (a poison row must not fail a 100 TB task). The reference
  * treats media as opaque columns end-to-end
  * (columnflow/columnar_util.py routes payloads without decoding); this
  * fills the decode step for the one audio container that needs no codec.
  *
  * Coverage: RIFF little-endian, `fmt ` audio format 1 (integer PCM) at
  * 8 or 16 bits per sample, any channel count / sample rate, chunk walk
  * with word-aligned (odd-length-padded) skip of ancillary chunks (LIST,
  * fact, cue…). Anything else — float PCM, extensible, ADPCM, truncated
  * data, malformed sizes — returns None: the caller keeps those payloads
  * on the remaining codec seam, the PNG/JPEG null-cue contract.
  *
  * Scale: strictly per-row map-side work; `maxFrames` bounds per-row
  * memory BEFORE the sample copy (the audio analog of PNG's `maxPixels`
  * decompression-bomb guard — WAV is uncompressed, so the bound is a
  * memory bound, not a bomb guard).
  */
object WavDecode {

  /** Decoded clip: samples are channel-interleaved, sign-centered
    * (16-bit: as stored; 8-bit: stored-unsigned minus 128) so silence is
    * 0 in both depths and downstream features are depth-uniform. */
  final case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                       nFrames: Int, samples: Array[Int])

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Minimal PCM-16 mono encoder — the synthesis twin of [[decode]], used
    * to build real WAV payloads from fixture data (q171) and in specs.
    * Canonical 44-byte header + little-endian samples. */
  def encodePcm16Mono(rate: Int, samples: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
    samples.foreach(v => bb.putShort(v.toShort))
    bb.array()
  }

  /** Decode a WAV byte payload; None on any unsupported/corrupt input. */
  def decode(bytes: Array[Byte], maxFrames: Long = 16L * 1024 * 1024): Option[Wav] =
    try decodeOrThrow(bytes, maxFrames) catch { case _: Throwable => None }

  private def decodeOrThrow(b: Array[Byte], maxFrames: Long): Option[Wav] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return None
    if (!(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None

    var off = 12
    var fmtOk = false
    var channels, bits, rate = -1
    var dataOff, dataLen = -1L
    while (off + 8 <= b.length && dataOff < 0) {
      val id = new String(b, off, 4, "US-ASCII")
      val len = le32(b, off + 4)
      if (len < 0 || off + 8 + len > b.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = le16(b, off + 8)
          channels = le16(b, off + 10)
          rate = le32(b, off + 12).toInt
          bits = le16(b, off + 22)
          fmtOk = audioFormat == 1 && channels > 0 && rate > 0 &&
            (bits == 8 || bits == 16)
        case "data" => dataOff = off + 8; dataLen = len
        case _ => () // ancillary chunks (LIST, fact, cue…) skipped
      }
      off += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0) return None

    val bytesPerSample = bits / 8
    val frameBytes = channels * bytesPerSample
    val nFrames = (dataLen / frameBytes).toInt
    if (nFrames <= 0 || nFrames > maxFrames) return None

    val n = nFrames * channels
    val out = new Array[Int](n)
    var i = 0
    if (bits == 16) {
      while (i < n) {
        out(i) = le16(b, dataOff.toInt + i * 2).toShort.toInt
        i += 1
      }
    } else {
      while (i < n) {
        out(i) = (b(dataOff.toInt + i) & 0xff) - 128
        i += 1
      }
    }
    Some(Wav(rate, channels, bits, nFrames, out))
  }
}
