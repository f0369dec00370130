package graft.operators

import graft.SparkSpec

/** WARC reader: raw and per-record-gzip round-trips, Content-Length
  * framing, HTTP response splitting, truncation/bomb cues, and the
  * Spark-side explode contract. */
class WarcSpec extends SparkSpec {

  private val date = "2026-01-02T03:04:05Z"
  private def file(gz: Boolean): Array[Byte] = Warc.encodeFile(Seq(
    Warc.encodeWarcinfo(date, "software: graft-test\r\n"),
    Warc.encodeResponse("http://example.org/a", date,
      "hello warc".getBytes("UTF-8")),
    Warc.encodeResponse("http://example.org/b", date,
      "second\nbody".getBytes("UTF-8"), status = 404,
      httpContentType = "text/html")), gzipPerRecord = gz)

  test("raw and multi-member-gzip files parse identically") {
    for (gz <- Seq(false, true)) {
      val Warc.Parsed(recs, truncated) = Warc.parse(file(gz))
      assert(!truncated && recs.length == 3, s"gz=$gz")
      val info = recs(0)
      assert(info.warcType == "warcinfo" && info.httpStatus == -1)
      assert(new String(info.body, "UTF-8") == "software: graft-test\r\n")
      val a = recs(1)
      assert(a.warcType == "response" && a.targetUri == "http://example.org/a")
      assert(a.date == date && a.httpStatus == 200 &&
        a.httpContentType == "text/plain")
      assert(new String(a.body, "UTF-8") == "hello warc")
      // framing: the declared Content-Length is the full HTTP message
      val expectHttp = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
        "Content-Length: 10\r\n\r\n").length + 10
      assert(a.contentLength == expectHttp)
      val b = recs(2)
      assert(b.httpStatus == 404 && b.httpContentType == "text/html" &&
        new String(b.body, "UTF-8") == "second\nbody")
    }
  }

  test("poison payloads: prefix + truncated cue, never throw") {
    assert(Warc.parse(null) == Warc.Parsed(Vector.empty, truncated = true))
    assert(Warc.parse("not a warc file".getBytes).records.isEmpty)
    assert(Warc.parse("not a warc file".getBytes).truncated)
    // cut inside record 3's body: records 1-2 survive, cue set
    val raw = file(gz = false)
    val cut = Warc.parse(raw.take(raw.length - 10))
    assert(cut.truncated && cut.records.length == 2)
    // a lying Content-Length mis-frames the NEXT record: the walk emits
    // the inflated record, fails the following version line, sets the cue
    val lying = raw.clone()
    val idx = new String(raw, "ISO-8859-1").indexOf("Content-Length: 2")
    lying(idx + 16) = '9' // warcinfo's declared 22 → 92
    val ly = Warc.parse(lying)
    assert(ly.truncated && ly.records.length == 1 && ly.records(0).contentLength == 92)
    // per-record body budget
    assert(Warc.parse(raw, maxBodyBytes = 10).truncated)
    // gzip expansion budget (the WARC bomb guard)
    val gz = file(gz = true)
    assert(Warc.parse(gz, maxTotalBytes = 50).records.isEmpty)
    assert(Warc.parse(gz, maxTotalBytes = 50).truncated)
    // maxRecords clamps with the cue set
    val capped = Warc.parse(raw, maxRecords = 1)
    assert(capped.records.length == 1 && capped.truncated)
  }

  test("explodeWarcBatch: record rows through the partition seam, poison cue") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, file(gz = true)), (2L, "junk".getBytes))
      .toDF("doc_id", "payload").repartition(2)
    val rows = Warc.explodeWarcBatch(df).collect().groupBy(_.getLong(0))
    val good = rows(1L).sortBy(_.getInt(2))
    assert(good.length == 3 && good.forall(!_.getBoolean(1)))
    assert(good.map(_.getString(3)).toSeq == Seq("warcinfo", "response", "response"))
    assert(good(1).getString(4) == "http://example.org/a" &&
      good(1).getInt(7) == 200 && good(1).getString(9) == "hello warc")
    assert(good(0).isNullAt(7) && good(0).isNullAt(8))
    val bad = rows(2L)
    assert(bad.length == 1 && bad.head.getBoolean(1) && bad.head.isNullAt(2))
  }
}
