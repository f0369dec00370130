package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** WARC (ISO 28500 / Common Crawl) record reader — the container format
  * a web-scale training-data pipeline actually ingests. A WARC file is a
  * sequence of records, each a `WARC/1.x` header block (CRLF-delimited
  * `Name: value` lines, `Content-Length` framing the payload block) and,
  * for `WARC-Type: response`, an HTTP message whose own header/body split
  * yields the crawled document. Files ship either raw or as concatenated
  * gzip members (one per record, the Common Crawl layout) — the JDK's
  * `GZIPInputStream` reads multi-member streams natively, so both ship
  * without native libs.
  *
  * Scale design: `.warc.gz` members are NOT block-splittable without an
  * external index, so the unit of parallelism is the FILE (Common Crawl
  * ships ~1 GB segment files in the tens of thousands — more files than
  * a 1000-executor cluster has cores). [[explodeWarcBatch]] therefore
  * runs the record walk map-side per payload through the same partition
  * contract as the codec arms: payloads never shuffle, one pass,
  * per-record byte budgets, and a poison payload yields its parsed
  * prefix plus a `truncated` cue rather than a task failure.
  *
  * Reference scope note: columnflow's ingest is chunked columnar files
  * (/root/reference/columnflow/columnar_util.py:3647); WARC belongs to
  * the beyond-reference LLM-data surface.
  */
object Warc {

  /** One parsed record. `httpStatus`/`body` are populated only for
    * records whose block is an HTTP response message. */
  final case class Record(index: Int, warcType: String, targetUri: String,
                          date: String, contentLength: Long,
                          httpStatus: Int, httpContentType: String,
                          body: Array[Byte])

  /** Records parsed from one WARC payload (gzipped or raw) plus a
    * truncation cue: true when the walk stopped early — corrupt header,
    * frame overrunning the buffer, or a budget hit. Never throws. */
  final case class Parsed(records: Vector[Record], truncated: Boolean)

  val MaxHeaderBytes = 64 * 1024

  def parse(bytes: Array[Byte], maxRecords: Int = 10000,
            maxBodyBytes: Long = 16L * 1024 * 1024,
            maxTotalBytes: Long = 1L << 31): Parsed = {
    try {
      if (bytes == null || bytes.length < 4) return Parsed(Vector.empty, truncated = true)
      val raw =
        if ((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
          gunzipAll(bytes, maxTotalBytes) match {
            case Some(b) => b
            case None => return Parsed(Vector.empty, truncated = true)
          }
        else bytes
      parseRaw(raw, maxRecords, maxBodyBytes)
    } catch { case _: Throwable => Parsed(Vector.empty, truncated = true) }
  }

  /** Concatenated-member gunzip with a total-output budget (the WARC
    * bomb guard: a 1 MB .gz must not inflate past `maxTotalBytes`). */
  private def gunzipAll(bytes: Array[Byte], maxTotalBytes: Long): Option[Array[Byte]] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 64 * 1024)
    try {
      val out = new java.io.ByteArrayOutputStream(math.min(bytes.length * 4L, 1L << 20).toInt)
      val buf = new Array[Byte](64 * 1024)
      var total = 0L
      var n = in.read(buf)
      while (n >= 0) {
        total += n
        if (total > maxTotalBytes) return None
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case _: Throwable => None } finally in.close()
  }

  private def parseRaw(b: Array[Byte], maxRecords: Int,
                       maxBodyBytes: Long): Parsed = {
    val out = Vector.newBuilder[Record]
    var p = 0
    var idx = 0
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    def lineEnd(from: Int, limit: Int): Int = { // index of '\r' of "\r\n", or -1
      var i = from
      while (i + 1 < limit) {
        if (b(i) == '\r' && b(i + 1) == '\n') return i
        i += 1
      }
      -1
    }
    while (p < b.length && idx < maxRecords) {
      // skip inter-record CRLFs
      while (p + 1 < b.length && b(p) == '\r' && b(p + 1) == '\n') p += 2
      if (p >= b.length) return Parsed(out.result(), truncated = false)
      val hLimit = math.min(b.length, p + MaxHeaderBytes)
      // version line
      val ve = lineEnd(p, hLimit)
      if (ve < 0 || !new String(b, p, ve - p, ascii).startsWith("WARC/"))
        return Parsed(out.result(), truncated = true)
      var q = ve + 2
      var warcType = ""
      var uri = ""
      var date = ""
      var clen = -1L
      // header lines until the blank line
      var done = false
      while (!done) {
        val le = lineEnd(q, hLimit)
        if (le < 0) return Parsed(out.result(), truncated = true)
        if (le == q) { q += 2; done = true } // blank line: header end
        else {
          val line = new String(b, q, le - q, ascii)
          val ci = line.indexOf(':')
          if (ci > 0) {
            val name = line.substring(0, ci).trim.toLowerCase
            val value = line.substring(ci + 1).trim
            name match {
              case "warc-type" => warcType = value
              case "warc-target-uri" => uri = value
              case "warc-date" => date = value
              case "content-length" =>
                clen = try value.toLong catch { case _: Throwable => -1L }
              case _ =>
            }
          }
          q = le + 2
        }
      }
      if (clen < 0 || clen > maxBodyBytes || q + clen > b.length)
        return Parsed(out.result(), truncated = true)
      val block = java.util.Arrays.copyOfRange(b, q, q + clen.toInt)
      // HTTP response split (status line + headers + CRLFCRLF + body)
      var status = -1
      var httpCt = ""
      var body = block
      if (block.length >= 5 &&
          new String(block, 0, 5, ascii) == "HTTP/") {
        val he = indexOfCrlfCrlf(block)
        if (he >= 0) {
          val head = new String(block, 0, he, ascii)
          val lines = head.split("\r\n")
          val sl = lines(0).split(" ")
          if (sl.length >= 2) status = try sl(1).toInt catch { case _: Throwable => -1 }
          lines.iterator.drop(1).foreach { l =>
            val ci = l.indexOf(':')
            if (ci > 0 && l.substring(0, ci).trim.equalsIgnoreCase("content-type"))
              httpCt = l.substring(ci + 1).trim
          }
          body = java.util.Arrays.copyOfRange(block, he + 4, block.length)
        }
      }
      out += Record(idx, warcType, uri, date, clen, status, httpCt, body)
      idx += 1
      p = q + clen.toInt
    }
    Parsed(out.result(), truncated = p < b.length) // maxRecords hit with bytes left
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Explode WARC payloads into one row per record through the shared
    * partition contract (map-side only; a corrupt payload emits its
    * parsed prefix with `truncated = true`, plus a single all-null row
    * when nothing parsed — the poison cue). `body_text` is the UTF-8
    * view of the HTTP body (or the raw block for non-HTTP records). */
  def explodeWarcBatch(df: DataFrame, id: String = "doc_id",
                       payload: String = "payload",
                       maxRecords: Int = 10000,
                       maxBodyBytes: Long = 16L * 1024 * 1024): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(id, LongType),
      StructField("truncated", BooleanType),
      StructField("rec_idx", IntegerType),
      StructField("warc_type", StringType),
      StructField("target_uri", StringType),
      StructField("warc_date", StringType),
      StructField("content_length", LongType),
      StructField("http_status", IntegerType),
      StructField("http_content_type", StringType),
      StructField("body_text", StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = df.schema.fieldIndex(id)
    val pIdx = df.schema.fieldIndex(payload)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val docId = r.getLong(idIdx)
        val parsed = parse(r.getAs[Array[Byte]](pIdx), maxRecords, maxBodyBytes)
        val recRows = parsed.records.map { rec =>
          Row(docId, parsed.truncated, rec.index, rec.warcType,
            rec.targetUri, rec.date, rec.contentLength,
            if (rec.httpStatus < 0) null else rec.httpStatus,
            if (rec.httpContentType.isEmpty) null else rec.httpContentType,
            new String(rec.body, java.nio.charset.StandardCharsets.UTF_8))
        }
        if (recRows.isEmpty)
          Seq(Row(docId, true, null, null, null, null, null, null, null, null))
        else recRows
      }
    }(enc)
  }

  // ------------------------------------------------------------------
  // Writer twin (fixture/oracle convention): emit records with exact
  // Content-Length framing; `gzipPerRecord` writes one gzip member per
  // record — the Common Crawl layout — exercising the multi-member path.
  // ------------------------------------------------------------------

  /** Build one response record's bytes: WARC header + HTTP message. */
  def encodeResponse(uri: String, date: String, bodyUtf8: Array[Byte],
                     status: Int = 200,
                     httpContentType: String = "text/plain"): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val http = (s"HTTP/1.1 $status OK\r\n" +
      s"Content-Type: $httpContentType\r\n" +
      s"Content-Length: ${bodyUtf8.length}\r\n\r\n").getBytes(ascii) ++ bodyUtf8
    val hdr = (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $date\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(ascii)
    hdr ++ http ++ "\r\n\r\n".getBytes(ascii)
  }

  /** Build a warcinfo record (the file-level metadata record every real
    * WARC leads with). */
  def encodeWarcinfo(date: String, payload: String): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
    val body = payload.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    (s"WARC/1.0\r\n" +
      s"WARC-Type: warcinfo\r\n" +
      s"WARC-Date: $date\r\n" +
      s"Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(ascii) ++
      body ++ "\r\n\r\n".getBytes(ascii)
  }

  /** Concatenate records into a file, optionally one gzip member each. */
  def encodeFile(records: Seq[Array[Byte]], gzipPerRecord: Boolean): Array[Byte] = {
    if (!gzipPerRecord) records.foldLeft(Array.emptyByteArray)(_ ++ _)
    else {
      val out = new java.io.ByteArrayOutputStream()
      records.foreach { r =>
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(r)
        gz.finish()
      }
      out.toByteArray
    }
  }
}
