package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MP4 sample-table resolution: encoder (forward box building) vs parser
  * (fourcc-walk table resolution) round-trip, plus the Spark-side frame
  * sampling contract. Expected offsets/times are computed here from
  * first principles (prefix sums over the declared sizes/deltas), not
  * read back from the encoder. */
class Mp4SampleTableSpec extends SparkSpec {

  private val sizes = Array[Long](10, 7, 12, 6, 9, 8, 11)
  private val deltas = Array[Long](100, 100, 100, 100, 200, 200, 200)
  private val syncs = Array(1, 4, 7)
  private def skeleton = Mp4SampleTable.encodeAvcSkeleton(
    timescale = 512, sampleSizes = sizes, deltas = deltas,
    syncSamples = syncs, samplesPerChunk = 2)

  test("round-trip: stsz/stts/stsc/stco/stss resolve to exact offsets, times, sync flags") {
    val Some(t) = Mp4SampleTable.parse(skeleton)
    assert(t.codec == "avc1" && t.timescale == 512 && t.nalLengthSize == 4)
    assert(t.nSamples == 7 && t.nSync == 3 && t.durationTs == deltas.sum)
    // offsets: mdat payload starts at 16 (ftyp) + 8 (mdat header) = 24;
    // samples are consecutive within AND across chunks here because the
    // encoder packs chunks back-to-back — the prefix sum is the truth
    val expOff = sizes.scanLeft(24L)(_ + _).init
    val expTime = deltas.scanLeft(0L)(_ + _).init
    t.samples.zipWithIndex.foreach { case (s, i) =>
      assert(s.index == i + 1 && s.offset == expOff(i) && s.size == sizes(i))
      assert(s.timeTs == expTime(i) && s.sync == syncs.contains(i + 1))
    }
    // NAL types parsed from the ACTUAL mdat bytes at the resolved ranges
    val nals = t.samples.map(s =>
      Mp4SampleTable.firstNalType(skeleton, s.offset, s.size, t.nalLengthSize))
    assert(nals == Vector(5, 1, 1, 5, 1, 1, 5))
  }

  test("absent stss means every sample is sync; unknown boxes are skipped by size") {
    // rename the stss fourcc to a free box: parser must skip it and
    // default to the all-sync rule
    val b = skeleton.clone()
    val idx = b.indices.find(i => i + 4 <= b.length &&
      new String(b, i, 4) == "stss").get
    "free".getBytes.copyToArray(b, idx)
    val Some(t) = Mp4SampleTable.parse(b)
    assert(t.nSync == 7 && t.samples.forall(_.sync))
  }

  test("poison rows: junk, truncation, lying table counts, empty → None (never throw)") {
    assert(Mp4SampleTable.parse(null).isEmpty)
    assert(Mp4SampleTable.parse(Array.emptyByteArray).isEmpty)
    assert(Mp4SampleTable.parse("not an mp4 at all....".getBytes).isEmpty)
    // cut inside moov: the ftyp/mdat prefix survives but no sample table
    assert(Mp4SampleTable.parse(skeleton.take(skeleton.length - 40)).isEmpty)
    // corrupt the stsz sample count to an absurd value: the table read
    // must fail the bounds check against the ENCLOSING box, not segfault
    val b = skeleton.clone()
    val idx = b.indices.find(i => i + 4 <= b.length &&
      new String(b, i, 4) == "stsz").get
    b(idx + 8 + 4) = 0x7f // count high byte → ~2^30 samples claimed
    assert(Mp4SampleTable.parse(b).isEmpty)
    // firstNalType range discipline
    assert(Mp4SampleTable.firstNalType(skeleton, skeleton.length - 2, 10, 4) == -1)
    assert(Mp4SampleTable.firstNalType(skeleton, -1, 10, 4) == -1)
    assert(Mp4SampleTable.firstNalType(skeleton, 24, 3, 4) == -1)
  }

  test("sampleMp4FramesBatch: keyframe rows through the partition seam, even sampling, poison cue") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, skeleton), (2L, "junk".getBytes))
      .toDF("doc_id", "payload").repartition(2)
    val rows = Multimodal.sampleMp4FramesBatch(df, maxFrames = 8)
      .collect().groupBy(_.getLong(0))
    val good = rows(1L).sortBy(_.getInt(6))
    assert(good.length == 3 && good.forall(_.getBoolean(1)))
    assert(good.map(_.getInt(6)).toSeq == Seq(1, 4, 7)) // the sync samples
    assert(good.forall(r => r.getBoolean(8) && r.getInt(11) == 5)) // IDR
    assert(good.head.getDouble(5) == deltas.sum.toDouble / 512) // duration
    assert(good.map(_.getDouble(7)).toSeq == Seq(0.0, 300.0 / 512, 800.0 / 512))
    val bad = rows(2L)
    assert(bad.length == 1 && !bad.head.getBoolean(1) && bad.head.isNullAt(6))
    // even sampling: maxFrames=2 over 3 sync frames → pool indices 0, 1
    // (floor(k*3/2) = 0, 1) → samples 1 and 4
    val two = Multimodal.sampleMp4FramesBatch(df.filter($"doc_id" === 1L),
      maxFrames = 2).collect().map(_.getInt(6)).sorted
    assert(two.toSeq == Seq(1, 4))
    // syncOnly=false walks every frame
    val all = Multimodal.sampleMp4FramesBatch(df.filter($"doc_id" === 1L),
      maxFrames = 16, syncOnly = false).collect()
    assert(all.length == 7 && all.map(_.getInt(11)).sorted.toSeq ==
      Seq(1, 1, 1, 1, 5, 5, 5))
  }
}
