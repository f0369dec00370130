package graft.operators

/** ISO-BMFF (MP4/MOV) sample-table parser: the real video frame-sampling
  * substrate. A codec cannot run in this environment (no JNI/FFI H.264),
  * but the part of video handling a 100 TB pipeline actually distributes
  * — WHICH bytes are which frame — is pure container structure:
  * `moov/trak/mdia/minf/stbl` holds, per sample (frame), its byte size
  * (`stsz`), its chunk and the chunk's absolute file offset
  * (`stsc` + `stco`/`co64`), its decode timestamp (`stts` runs against
  * the `mdhd` timescale), and whether it is a sync sample / keyframe
  * (`stss`; absent ⇒ every sample syncs). Resolving those tables turns
  * "sample every k-th keyframe of 100 TB of video" into a set of
  * (offset, size) RANGE READS — no demux, no full `mdat` scan — which is
  * exactly the plumbing [[Multimodal.sampleMp4FramesBatch]] distributes.
  * The remaining pixel step (NAL → pixels) stays on the declared codec
  * seam.
  *
  * Reference scope note: columnflow has no video path (its multimodal
  * analogue is the chunked array I/O in
  * /root/reference/columnflow/columnar_util.py:3647); this operator is
  * part of the beyond-reference training-data surface.
  *
  * Never-throw contract (shared with [[PngDecode]]): corrupt, truncated,
  * or adversarial payloads (64-bit largesize loops, table counts that
  * overrun the box, zero-size boxes) return None / clamp — a poison row
  * must not fail the task. All table reads are bounds-checked against
  * the ENCLOSING box end, never the buffer end, so a size lying about
  * its box cannot read a sibling's bytes as table entries.
  */
object Mp4SampleTable {

  /** One resolved sample (frame): 1-based index, absolute byte offset in
    * the file, byte size, decode time in track-timescale ticks, and the
    * sync flag. */
  final case class Sample(index: Int, offset: Long, size: Long,
                          timeTs: Long, sync: Boolean)

  /** The first video track's resolved sample table. `nalLengthSize` is
    * the AVC length-prefix width from `avcC` (0 when the codec is not
    * AVC or `avcC` is absent). */
  final case class Track(codec: String, timescale: Long, durationTs: Long,
                         nSamples: Int, nSync: Int, nalLengthSize: Int,
                         samples: Vector[Sample])

  /** Hard cap on resolved samples: a table claiming more is either a
    * feature film (fine to clamp a SAMPLING operator at 1M frames) or an
    * adversarial count. */
  val MaxSamples = 1 << 20

  def parse(bytes: Array[Byte]): Option[Track] = {
    if (bytes == null || bytes.length < 16) return None
    val n = bytes.length
    def u8(p: Int): Int = bytes(p) & 0xff
    def u32(p: Int): Long =
      (u8(p).toLong << 24) | (u8(p + 1) << 16) | (u8(p + 2) << 8) | u8(p + 3)
    def u64(p: Int): Long = (u32(p) << 32) | u32(p + 4)
    def fourcc(p: Int): String =
      new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** (payloadStart, boxEnd) of the box at p within [p, end), or null. */
    def bounds(p: Int, end: Int): (Int, Int) = {
      if (p + 8 > end) return null
      val sz = u32(p)
      if (sz == 0) (p + 8, end) // runs to end of enclosing scope
      else if (sz == 1) {
        if (p + 16 > end) return null
        val large = u64(p + 8)
        if (large < 16 || large > (end - p).toLong) null
        else (p + 16, p + large.toInt)
      } else if (sz < 8 || sz > (end - p).toLong) null
      else (p + 8, p + sz.toInt)
    }

    /** First child box of the given type strictly inside [s, e), as
      * (payloadStart, boxEnd); null if absent/corrupt. */
    def child(s: Int, e: Int, typ: String): (Int, Int) = {
      var p = s
      var guard = 0
      while (p + 8 <= e && guard < 4096) {
        guard += 1
        val b = bounds(p, e) // type sits at p+4 for 32-bit AND largesize boxes
        if (b == null) return null
        if (fourcc(p + 4) == typ) return b
        p = b._2 // bounds guarantees forward progress (payload > p+8)
      }
      null
    }

    // Top level → moov
    val moov = child(0, n, "moov")
    if (moov == null) return None

    // Scan traks; first one whose mdia/hdlr handler is 'vide' wins.
    var p = moov._1
    var guard = 0
    while (p + 8 <= moov._2 && guard < 1024) {
      guard += 1
      val b = bounds(p, moov._2)
      if (b == null) return None
      if (fourcc(p + 4) == "trak") {
        val mdia = child(b._1, b._2, "mdia")
        if (mdia != null) {
          val hdlr = child(mdia._1, mdia._2, "hdlr")
          val isVideo = hdlr != null && hdlr._1 + 12 <= hdlr._2 &&
            fourcc(hdlr._1 + 8) == "vide"
          if (isVideo) {
            val mdhd = child(mdia._1, mdia._2, "mdhd")
            val minf = child(mdia._1, mdia._2, "minf")
            if (mdhd == null || minf == null) return None
            // mdhd: version(1) flags(3) then v0: ctime(4) mtime(4)
            // timescale(4) duration(4); v1: 8/8/4/8
            val (ts, dur) = {
              val s0 = mdhd._1
              if (s0 + 4 > mdhd._2) return None
              if (u8(s0) == 1) {
                if (s0 + 32 > mdhd._2) return None
                (u32(s0 + 20), u64(s0 + 24))
              } else {
                if (s0 + 24 > mdhd._2) return None
                (u32(s0 + 12), u32(s0 + 16))
              }
            }
            val stbl0 = child(minf._1, minf._2, "stbl")
            if (stbl0 == null) return None
            return resolveStbl(bytes, stbl0._1, stbl0._2, ts, dur,
              u8 _, u32 _, u64 _, fourcc _, child _)
          }
        }
      }
      p = b._2
    }
    None
  }

  /** Resolve the five sample tables under one `stbl` into flat samples. */
  private def resolveStbl(bytes: Array[Byte], s: Int, e: Int,
                          timescale: Long, durationTs: Long,
                          u8: Int => Int,
                          u32: Int => Long, u64: Int => Long,
                          fourcc: Int => String,
                          child: (Int, Int, String) => (Int, Int)): Option[Track] = {
    // ---- stsd: codec fourcc of entry 0 (+ avcC NAL length size) ----
    val stsd = child(s, e, "stsd")
    var codec = "unknown"
    var nalLen = 0
    if (stsd != null && stsd._1 + 16 <= stsd._2) {
      val entry = stsd._1 + 8 // version/flags(4) entry_count(4)
      codec = fourcc(entry + 4)
      if (codec == "avc1" || codec == "avc3") {
        // entry: size(4) type(4), SampleEntry header (8: 6 reserved +
        // data_reference_index), VisualSampleEntry fixed fields (70),
        // then child boxes (avcC, …)
        var q = entry + 8 + 8 + 70
        var g = 0
        while (q + 8 <= stsd._2 && g < 64) {
          g += 1
          val sz = u32(q)
          if (sz < 8 || sz > (stsd._2 - q).toLong) { q = stsd._2 }
          else {
            if (fourcc(q + 4) == "avcC" && q + 13 <= stsd._2)
              nalLen = (u8(q + 12) & 3) + 1
            q += sz.toInt
          }
        }
      }
    }

    // ---- stsz: per-sample sizes ----
    val stsz = child(s, e, "stsz")
    if (stsz == null || stsz._1 + 12 > stsz._2) return None
    val uniform = u32(stsz._1 + 4)
    val count0 = u32(stsz._1 + 8)
    if (count0 <= 0 || count0 > MaxSamples) return None
    val nSamples = count0.toInt
    val sizes = new Array[Long](nSamples)
    if (uniform != 0) java.util.Arrays.fill(sizes, uniform)
    else {
      if (stsz._1 + 12 + 4L * nSamples > stsz._2) return None
      var i = 0
      while (i < nSamples) { sizes(i) = u32(stsz._1 + 12 + 4 * i); i += 1 }
    }

    // ---- stts: decode timestamps (run-length deltas) ----
    val stts = child(s, e, "stts")
    if (stts == null || stts._1 + 8 > stts._2) return None
    val nRuns = u32(stts._1 + 4)
    if (nRuns < 0 || stts._1 + 8 + 8L * nRuns > stts._2) return None
    val times = new Array[Long](nSamples)
    var t = 0L
    var si = 0
    var run = 0
    while (run < nRuns && si < nSamples) {
      val rc = u32(stts._1 + 8 + 8 * run)
      val delta = u32(stts._1 + 12 + 8 * run)
      var k = 0L
      while (k < rc && si < nSamples) {
        times(si) = t; t += delta; si += 1; k += 1
      }
      run += 1
    }
    if (si < nSamples) return None // stts under-covers the sample count

    // ---- stco / co64: chunk offsets ----
    val stco = child(s, e, "stco")
    val co64 = child(s, e, "co64")
    val (chunkOff: Array[Long], nChunks: Int) =
      if (stco != null) {
        val c = u32(stco._1 + 4)
        if (c <= 0 || c > MaxSamples || stco._1 + 8 + 4L * c > stco._2) return None
        (Array.tabulate(c.toInt)(i => u32(stco._1 + 8 + 4 * i)), c.toInt)
      } else if (co64 != null) {
        val c = u32(co64._1 + 4)
        if (c <= 0 || c > MaxSamples || co64._1 + 8 + 8L * c > co64._2) return None
        (Array.tabulate(c.toInt)(i => u64(co64._1 + 8 + 8 * i)), c.toInt)
      } else return None

    // ---- stsc: samples-per-chunk runs → per-chunk counts ----
    val stsc = child(s, e, "stsc")
    if (stsc == null || stsc._1 + 8 > stsc._2) return None
    val nEnt = u32(stsc._1 + 4)
    if (nEnt <= 0 || stsc._1 + 8 + 12L * nEnt > stsc._2) return None
    val firstChunk = Array.tabulate(nEnt.toInt)(i => u32(stsc._1 + 8 + 12 * i))
    val perChunk = Array.tabulate(nEnt.toInt)(i => u32(stsc._1 + 12 + 12 * i))

    // ---- stss: sync table (absent ⇒ all sync) ----
    val stss = child(s, e, "stss")
    val sync: Int => Boolean =
      if (stss == null) _ => true
      else {
        val c = u32(stss._1 + 4)
        if (c < 0 || stss._1 + 8 + 4L * c > stss._2) return None
        val set = new java.util.HashSet[Long]()
        var i = 0
        while (i < c) { set.add(u32(stss._1 + 8 + 4 * i)); i += 1 }
        idx => set.contains(idx.toLong)
      }

    // ---- flatten: walk chunks, lay samples consecutively ----
    val out = Vector.newBuilder[Sample]
    var sample = 0 // 0-based
    var ent = 0
    var chunk = 1L // chunks are 1-based
    var nSync = 0
    while (chunk <= nChunks && sample < nSamples) {
      while (ent + 1 < firstChunk.length && firstChunk(ent + 1) <= chunk) ent += 1
      val spc = perChunk(ent)
      var off = chunkOff(chunk.toInt - 1)
      var k = 0L
      while (k < spc && sample < nSamples) {
        val isSync = sync(sample + 1)
        if (isSync) nSync += 1
        out += Sample(sample + 1, off, sizes(sample), times(sample), isSync)
        off += sizes(sample)
        sample += 1
        k += 1
      }
      chunk += 1
    }
    if (sample < nSamples) return None // chunk map under-covers the samples
    Some(Track(codec, timescale, durationTs, nSamples, nSync, nalLen,
      out.result()))
  }

  // ------------------------------------------------------------------
  // Minimal writer — the fixture/oracle twin of the parser (the
  // WavDecode.encodePcm16Mono convention): emits a structurally real
  // ftyp + mdat + moov/trak/mdia/minf/stbl file whose samples are
  // length-prefixed AVC NALs (IDR 0x65 on sync samples, non-IDR 0x41
  // otherwise, filler from `fill`). Independent of the parser's walk —
  // it builds boxes forward; the parser resolves tables backward from
  // fourccs — so a round-trip exercises both directions.
  // ------------------------------------------------------------------

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val n = 8L + payload.map(_.length.toLong).sum
    val bos = new java.io.ByteArrayOutputStream(n.toInt)
    bos.write(be32(n), 0, 4)
    bos.write(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII), 0, 4)
    payload.foreach(p => bos.write(p, 0, p.length))
    bos.toByteArray
  }

  /** Encode a minimal AVC MP4 skeleton. `sampleSizes(i)` is the TOTAL
    * byte size of sample i+1 (≥ 6: 4-byte NAL length prefix + NAL header
    * + ≥1 filler); `deltas(i)` its stts decode delta; `syncSamples` the
    * 1-based stss entries; chunks group `samplesPerChunk` consecutive
    * samples (last chunk ragged). `fill(i)` is the filler byte for
    * sample i+1. */
  def encodeAvcSkeleton(timescale: Long, sampleSizes: Array[Long],
                        deltas: Array[Long], syncSamples: Array[Int],
                        samplesPerChunk: Int,
                        fill: Int => Int = i => (i * 31 + 7) & 0xff): Array[Byte] = {
    val n = sampleSizes.length
    require(n > 0 && deltas.length == n && samplesPerChunk > 0)
    require(sampleSizes.forall(_ >= 6), "sample = 4B NAL length + header + filler")
    val syncSet = syncSamples.toSet

    // mdat payload: length-prefixed NALs
    val mdatBody = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < n) {
      val sz = sampleSizes(i)
      mdatBody.write(be32(sz - 4), 0, 4) // NAL length (nalLengthSize = 4)
      mdatBody.write(if (syncSet.contains(i + 1)) 0x65 else 0x41) // IDR / non-IDR
      var k = 5L
      while (k < sz) { mdatBody.write(fill(i)); k += 1 }
      i += 1
    }
    val ftyp = box("ftyp", "isom".getBytes, be32(0))
    val mdat = box("mdat", mdatBody.toByteArray)
    val mdatPayloadOff = ftyp.length + 8L // mdat header is 8 bytes

    // stts: run-length encode the deltas
    val runs = Vector.newBuilder[(Long, Long)]
    var r0 = 0
    while (r0 < n) {
      var r1 = r0
      while (r1 + 1 < n && deltas(r1 + 1) == deltas(r0)) r1 += 1
      runs += (((r1 - r0 + 1).toLong, deltas(r0)))
      r0 = r1 + 1
    }
    val runList = runs.result()
    val stts = box("stts", be32(0), be32(runList.length),
      runList.flatMap { case (c, d) => be32(c) ++ be32(d) }.toArray)

    // stsc + stco
    val nChunks = (n + samplesPerChunk - 1) / samplesPerChunk
    val rem = n % samplesPerChunk
    val stscEntries =
      if (rem == 0 || nChunks == 1)
        Vector((1L, math.min(samplesPerChunk, n).toLong))
      else Vector((1L, samplesPerChunk.toLong), (nChunks.toLong, rem.toLong))
    val stsc = box("stsc", be32(0), be32(stscEntries.length),
      stscEntries.flatMap { case (fc, spc) => be32(fc) ++ be32(spc) ++ be32(1) }.toArray)
    val chunkOffs = new Array[Long](nChunks)
    var acc = mdatPayloadOff
    var c = 0
    while (c < nChunks) {
      chunkOffs(c) = acc
      var k = 0
      while (k < samplesPerChunk && c * samplesPerChunk + k < n) {
        acc += sampleSizes(c * samplesPerChunk + k); k += 1
      }
      c += 1
    }
    val stco = box("stco", be32(0), be32(nChunks),
      chunkOffs.flatMap(be32))

    val stsz = box("stsz", be32(0), be32(0), be32(n), sampleSizes.flatMap(be32))
    val stss = box("stss", be32(0), be32(syncSamples.length),
      syncSamples.flatMap(s => be32(s.toLong)))

    // stsd/avc1/avcC: 8B SampleEntry header + 70B visual fields + avcC
    val avcC = box("avcC",
      Array[Byte](1, 66, 0, 30), // version, baseline profile, compat, level
      Array((0xFC | 3).toByte), // lengthSizeMinusOne = 3 → 4-byte prefixes
      Array((0xE0 | 0).toByte, 0.toByte)) // 0 SPS, 0 PPS (skeleton)
    val avc1 = box("avc1", new Array[Byte](8), new Array[Byte](70), avcC)
    val stsd = box("stsd", be32(0), be32(1), avc1)

    val stbl = box("stbl", stsd, stts, stsc, stsz, stco, stss)
    val minf = box("minf", stbl)
    val durationTs = deltas.sum
    val mdhd = box("mdhd", be32(0), be32(0), be32(0),
      be32(timescale), be32(durationTs), be32(0x55C40000L))
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes,
      new Array[Byte](12), Array(0.toByte))
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", mdia)
    val moov = box("moov", trak)

    ftyp ++ mdat ++ moov
  }

  /** NAL unit type of the FIRST length-prefixed NAL in an AVC sample
    * whose bytes sit at [offset, offset+size) of `file` — 5 = IDR
    * keyframe, 1 = non-IDR slice, … (H.264 table 7-1). −1 when the range
    * is out of the stored payload (no-faststart prefix), the prefix is
    * malformed, or the codec is not length-prefixed AVC. */
  def firstNalType(file: Array[Byte], offset: Long, size: Long,
                   nalLengthSize: Int): Int = {
    if (nalLengthSize < 1 || nalLengthSize > 4) return -1
    if (offset < 0 || size < nalLengthSize + 1 ||
        offset + size > file.length) return -1
    val p = offset.toInt
    var len = 0L
    var i = 0
    while (i < nalLengthSize) { len = (len << 8) | (file(p + i) & 0xff); i += 1 }
    if (len < 1 || nalLengthSize + len > size) return -1
    file(p + nalLengthSize) & 0x1f
  }
}
