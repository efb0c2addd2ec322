package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** WARC (Web ARChive, ISO 28500) reading for crawl pipelines — the
  * container format Common-Crawl-style corpora arrive in. Pure byte
  * parsing, no external library.
  *
  * Scale shape: a crawl lands as millions of ~1 GB `.warc` files;
  * the natural Spark plan is `spark.read.format("binaryFile")` (or a
  * binary column from any source) → [[warcRecords]] → `explode`, so
  * each file parses inside one task and the explode output is the
  * narrow (uri, date, status, mime, text) relation everything
  * downstream (dedup, langId, quality, …) runs on. Per-file
  * parallelism is exactly how warcio-based pipelines shard.
  *
  * Supported: WARC/1.0 and 1.1 records with Content-Length framing;
  * `response` records get their HTTP status/headers parsed and an
  * HTML-tag-stripped text extraction (script/style dropped whole).
  * Gzip is handled: [[warcRecords]] auto-detects the 0x1f8b magic
  * and inflates ALL members before parsing — Common-Crawl-style
  * `.warc.gz` files are one gzip member PER RECORD, which the JDK's
  * GZIPInputStream reads as a concatenated sequence. Decompressed
  * size is capped (`graft.maxWarcBytes`, default 1 GiB) so a zip
  * bomb fails fast instead of OOMing the task. Documented non-goal:
  * charset sniffing (UTF-8/Latin-1 assumed).
  */
object WarcOps {

  /** One parsed WARC record; `text` is the tag-stripped body for
    * response records with an HTML/text content type, else null. */
  case class WarcRecord(warc_type: String, target_uri: String,
                        warc_date: String, http_status: Int,
                        content_type: String, n_body_bytes: Long,
                        text: String)

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private def headerMap(s: String): Map[String, String] =
    s.split("\r\n").iterator.flatMap { line =>
      val c = line.indexOf(':')
      if (c <= 0) None
      else Some(line.substring(0, c).trim.toLowerCase ->
        line.substring(c + 1).trim)
    }.toMap

  /** Strip HTML to text: drop script/style blocks whole, drop tags,
    * decode the five standard entities (`&amp;` last — see
    * [[graft.text.HtmlText]]), collapse whitespace. Regex
    * tag-stripping is the documented extraction standard for crawl
    * text pipelines (not a DOM parse — stated, not guessed). */
  private[graft] def htmlToText(html: String): String =
    graft.text.HtmlText.stripTags(
      graft.text.HtmlText.dropScriptStyle(html))

  /** Parse one WARC file's bytes into records. Malformed framing ends
    * the parse at the last good record (partial results, no throw —
    * one truncated file must not fail a 100k-file job). */
  private[graft] def parseWarc(b: Array[Byte]): Seq[WarcRecord] = {
    val out = new ArrayBuffer[WarcRecord]()
    if (b == null) return out.toSeq
    var i = 0
    var ok = true
    while (ok && i + 8 < b.length) {
      // record header block: "WARC/1.x\r\n" headers "\r\n\r\n"
      if (!(b(i) == 'W' && b(i + 1) == 'A' && b(i + 2) == 'R' &&
          b(i + 3) == 'C' && b(i + 4) == '/')) { ok = false }
      else {
        val hEnd = indexOfCrlfCrlf(b, i)
        if (hEnd < 0) ok = false
        else {
          val hdrs = headerMap(
            new String(b, i, hEnd - i, java.nio.charset.StandardCharsets.UTF_8))
          val len = hdrs.get("content-length").flatMap(_.toLongOption)
            .getOrElse(-1L)
          val bodyStart = hEnd + 4
          if (len < 0 || bodyStart + len > b.length) ok = false
          else {
            val wtype = hdrs.getOrElse("warc-type", "")
            val uri = hdrs.getOrElse("warc-target-uri", null)
            val date = hdrs.getOrElse("warc-date", null)
            var status = -1
            var mime: String = null
            var text: String = null
            if (wtype == "response" && len > 0) {
              // body = HTTP response: status line, headers, payload
              val bEnd = (bodyStart + len).toInt
              val httpHEnd = indexOfCrlfCrlf(b, bodyStart)
              // the terminator must lie fully INSIDE the body: a
              // match straddling the record boundary would make the
              // payload length negative
              if (httpHEnd >= 0 && httpHEnd + 4 <= bEnd) {
                val httpHdr = new String(b, bodyStart, httpHEnd - bodyStart,
                  java.nio.charset.StandardCharsets.UTF_8)
                val lines = httpHdr.split("\r\n")
                val st = lines.headOption.getOrElse("")
                if (st.startsWith("HTTP/")) {
                  val parts = st.split(" ")
                  if (parts.length >= 2) status =
                    parts(1).toIntOption.getOrElse(-1)
                }
                val hm = headerMap(lines.drop(1).mkString("\r\n"))
                mime = hm.get("content-type")
                  .map(_.split(";")(0).trim.toLowerCase).orNull
                val payload = new String(b, httpHEnd + 4,
                  bEnd - httpHEnd - 4,
                  java.nio.charset.StandardCharsets.UTF_8)
                text =
                  if (mime == null) null
                  else if (mime == "text/html") htmlToText(payload)
                  else if (mime.startsWith("text/")) payload.trim
                  else null
              }
            }
            out += WarcRecord(wtype, uri, date, status, mime, len, text)
            // records are framed by content-length + blank line(s)
            var next = bodyStart + len
            while (next + 1 < b.length && b(next.toInt) == '\r' &&
              b((next + 1).toInt) == '\n') next += 2
            i = next.toInt
          }
        }
      }
    }
    out.toSeq
  }

  /** Decompressed-size budget for one WARC file (see object doc). */
  private def maxWarcBytes: Long =
    sys.props.get("graft.maxWarcBytes").map(_.toLong)
      .getOrElse(1L << 30)

  /** Inflate every gzip member in `b` (Common-Crawl layout: one
    * member per record; the JDK stream reads them as a sequence).
    * Fails loud past the `graft.maxWarcBytes` budget. */
  private[graft] def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream(
      math.min(b.length.toLong * 4, 1L << 26).toInt) // clamp: no Int overflow
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    var total = 0L
    while (n > 0) {
      total += n
      require(total <= maxWarcBytes,
        s"warc: decompressed size exceeds graft.maxWarcBytes=" +
          s"$maxWarcBytes — raise the property for legitimate files")
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** Column form: one WARC file's bytes → array of record structs;
    * `explode` it into the per-page relation. `.warc.gz` payloads
    * (gzip magic 0x1f8b) are inflated first; corrupt gzip yields an
    * empty record list like any other malformed file. */
  def warcRecords(payload: Column): Column = {
    val f = udf { (b: Array[Byte]) =>
      if (b != null && b.length > 2 && (b(0) & 0xff) == 0x1f &&
          (b(1) & 0xff) == 0x8b) {
        try parseWarc(gunzipAll(b))
        catch {
          case e: IllegalArgumentException => throw e // budget: loud
          case _: Exception => Seq.empty[WarcRecord]  // corrupt: empty
        }
      } else parseWarc(b)
    }
    f(payload)
  }

  /** Read a directory of .warc files into (path, records[]) — the
    * file-per-task shape described in the object doc. */
  def readWarcFiles(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path"), warcRecords(col("content")).as("records"))

  /** Deterministic synthetic WARC file: nrec = 2 + id%3 response
    * records plus one request record (filtered out by type). Record
    * r: uri = `http://w<id%50>.com/p<r>`, status = 200 (r even) /
    * 404 (r odd), html body whose stripped text is exactly
    * `doc <id> rec <r>` repeated (1 + (id+r)%4) times, space-joined —
    * every field id-arithmetic for the oracle. */
  private def recordString(wtype: String, uri: String,
                           body: String): String =
    "WARC/1.0\r\n" +
      s"WARC-Type: $wtype\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      s"Content-Length: ${body.getBytes("UTF-8").length}\r\n" +
      "\r\n" + body + "\r\n\r\n"

  private def syntheticRecords(i: Long): Seq[String] = {
    val nrec = (2 + i % 3).toInt
    val resp = (0 until nrec).map { r =>
      val uri = s"http://w${i % 50}.com/p$r"
      val status = if (r % 2 == 0) 200 else 404
      val words = (1 + (i + r) % 4).toInt
      val textUnit = s"doc $i rec $r"
      val html = "<html><head><script>var x=1;</script>" +
        "<style>.a{}</style></head><body>" +
        (0 until words).map(_ => s"<p>$textUnit</p>").mkString +
        "</body></html>"
      val http = s"HTTP/1.1 $status OK\r\n" +
        "Content-Type: text/html; charset=utf-8\r\n" +
        s"Content-Length: ${html.length}\r\n\r\n" + html
      recordString("response", uri, http)
    }
    resp :+ recordString("request", s"http://w${i % 50}.com/p0",
      "GET /p0 HTTP/1.1\r\nHost: example\r\n\r\n")
  }

  def syntheticWarc(id: Column): Column = {
    val f = udf { (idL: java.lang.Long) =>
      if (idL == null) null
      else syntheticRecords(idL.longValue).mkString.getBytes("UTF-8")
    }
    f(id.cast("long"))
  }

  /** Common-Crawl layout twin of [[syntheticWarc]]: each record is
    * its own gzip member, members concatenated — decompresses to the
    * byte-identical plain file, so the same oracle covers both. */
  def syntheticWarcGz(id: Column): Column = {
    val f = udf { (idL: java.lang.Long) =>
      if (idL == null) null
      else {
        val out = new java.io.ByteArrayOutputStream()
        syntheticRecords(idL.longValue).foreach { rec =>
          val gz = new java.util.zip.GZIPOutputStream(out)
          gz.write(rec.getBytes("UTF-8"))
          gz.close() // finish + release the native deflater now, not at GC
        }
        out.toByteArray
      }
    }
    f(id.cast("long"))
  }
}
