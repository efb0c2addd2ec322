package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** PDF text extraction for document pipelines — pure JVM (JDK
  * Inflater for FlateDecode), no external library.
  *
  * Honest subset, the one a crawl-scale text pipeline actually uses:
  * scan the object graph for content streams, inflate
  * `/FlateDecode` ones, then read the text-showing operators
  * (`(…) Tj`, `[(…) kern (…)] TJ`, `(…) '`) inside BT…ET blocks with
  * full PDF string-escape handling (\\( \\) \\\\ \\n \\r \\t \\ddd
  * octal). That covers standard-encoded (WinAnsi/ASCII) text — the
  * overwhelming majority of machine-generated PDFs. Object streams
  * (`/ObjStm`, PDF 1.5 — where most real-world writers pack the page
  * tree) are inflated for metadata: the page count includes
  * `/Type /Page` dicts inside them (content streams can never live in
  * an ObjStm, so text extraction is structurally unaffected).
  * Documented non-goals (stated, not guessed): CID/Type0
  * composite-font decoding, encryption, and layout reconstruction
  * (reading order = operator order).
  *
  * Scale shape: one PDF per row (binary column), parse inside the
  * task — the same file-per-task shape as [[WarcOps]]. */
object PdfOps {

  /** Decompressed-stream budget per file (zip-bomb guard, same
    * contract as `graft.maxWarcBytes`). */
  private def maxStreamBytes: Long =
    sys.props.get("graft.maxPdfBytes").map(_.toLong)
      .getOrElse(256L << 20)

  private def inflate(b: Array[Byte], from: Int, len: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(b, from, len)
      val out = new java.io.ByteArrayOutputStream(
        math.min(len.toLong * 4, 1L << 26).toInt) // clamp: no Int overflow
      val buf = new Array[Byte](64 * 1024)
      var total = 0L
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return out.toByteArray // stuck: stop
        total += n
        require(total <= maxStreamBytes,
          s"pdf: decompressed stream exceeds graft.maxPdfBytes=" +
            s"$maxStreamBytes — raise the property for legitimate files")
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end() // release native memory on every exit path
  }

  private def indexOf(b: Array[Byte], pat: String, from: Int): Int = {
    val p = pat.getBytes
    var i = from
    while (i + p.length <= b.length) {
      var k = 0
      while (k < p.length && b(i + k) == p(k)) k += 1
      if (k == p.length) return i
      i += 1
    }
    -1
  }

  /** Every (dict, inflated-data) stream pair in the file, in file
    * order (data inflated when the dict says /FlateDecode; malformed
    * framing skips the stream). Object streams (/ObjStm — packed
    * non-stream objects) and xref streams carry no text operators and
    * are excluded by [[textOf]]; [[metaOf]] reads ObjStm payloads for
    * the compressed page count. */
  private def allStreams(b: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = new ArrayBuffer[(String, Array[Byte])]()
    var i = 0
    var guard = 0
    while (i >= 0 && i < b.length && guard < 100000) {
      guard += 1
      val s = indexOf(b, "stream", i)
      if (s < 0) i = -1
      else {
        // dict is the bytes between the previous "<<" and "stream"
        val dictStart = {
          var d = s
          var found = -1
          while (d > 1 && found < 0) {
            if (b(d - 1) == '<' && b(d) == '<') found = d - 1
            d -= 1
          }
          found
        }
        val dict =
          if (dictStart >= 0)
            new String(b, dictStart, s - dictStart,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          else ""
        // stream data starts after "stream" + EOL
        var ds = s + "stream".length
        if (ds < b.length && b(ds) == '\r') ds += 1
        if (ds < b.length && b(ds) == '\n') ds += 1
        val e = indexOf(b, "endstream", ds)
        if (e < 0) i = -1
        else {
          var de = e
          // strip the EOL before "endstream"
          if (de > ds && b(de - 1) == '\n') de -= 1
          if (de > ds && b(de - 1) == '\r') de -= 1
          val data =
            if (dict.contains("/FlateDecode"))
              try inflate(b, ds, de - ds)
              catch {
                case e: IllegalArgumentException => throw e // budget
                case _: Exception => Array.emptyByteArray
              }
            else java.util.Arrays.copyOfRange(b, ds, de)
          if (data.nonEmpty) out += ((dict, data))
          i = e + "endstream".length
        }
      }
    }
    out.toSeq
  }

  /** Decode one PDF literal string body (escapes + octal). */
  private[graft] def decodePdfString(s: String): String = {
    val sb = new StringBuilder()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case d if d >= '0' && d <= '7' =>
            var j = i + 1
            var v = 0
            while (j < s.length && j < i + 4 && s.charAt(j) >= '0' &&
              s.charAt(j) <= '7') { v = v * 8 + (s.charAt(j) - '0'); j += 1 }
            sb.append(v.toChar)
            i = j
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Text-showing strings from one content stream, in operator order:
    * `(…) Tj`, `(…) '`, and every string inside a `[…] TJ` array.
    * Strings are joined with spaces; each BT…ET block ends a line. */
  private[graft] def textFromContent(content: String): String = {
    val lines = new ArrayBuffer[String]()
    var i = 0
    while (i >= 0 && i < content.length) {
      val bt = content.indexOf("BT", i)
      if (bt < 0) i = -1
      else {
        val et = content.indexOf("ET", bt + 2)
        val end = if (et < 0) content.length else et
        val block = content.substring(bt + 2, end)
        val parts = new ArrayBuffer[String]()
        var j = 0
        while (j < block.length) {
          if (block.charAt(j) == '(') {
            // find the matching unescaped ')'
            var k = j + 1
            val sb = new StringBuilder()
            var done = false
            var depth = 1
            while (k < block.length && !done) {
              val c = block.charAt(k)
              if (c == '\\' && k + 1 < block.length) {
                sb.append(c).append(block.charAt(k + 1)); k += 2
              } else if (c == '(') { depth += 1; sb.append(c); k += 1 }
              else if (c == ')') {
                depth -= 1
                if (depth == 0) done = true else sb.append(c)
                k += 1
              } else { sb.append(c); k += 1 }
            }
            // keep it only when followed by a show operator (Tj/'/TJ
            // array) — positioning strings don't exist, so any string
            // inside BT..ET is text in this subset
            parts += decodePdfString(sb.toString)
            j = k
          } else j += 1
        }
        if (parts.nonEmpty) lines += parts.mkString(" ")
        i = end + 2
      }
    }
    lines.mkString("\n")
  }

  private def isPdf(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && b(0) == '%' && b(1) == 'P' &&
      b(2) == 'D' && b(3) == 'F'

  private val PageRe = "/Type\\s*/Page(?![s])".r

  private def metaOf(b: Array[Byte]): PdfMeta =
    metaOf(b, allStreams(b))

  /** Page count = uncompressed /Type /Page dicts in the raw bytes
    * PLUS those packed inside object streams (PDF 1.5 /ObjStm — where
    * most real-world writers put the page tree; content streams can
    * never live there, so TEXT needs no ObjStm handling, but an
    * uninflated page count would systematically read 0 on such
    * files). */
  private def metaOf(b: Array[Byte],
                     streams: Seq[(String, Array[Byte])]): PdfMeta = {
    val head = new String(b, 0, math.min(16, b.length),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val version = head.drop(5).takeWhile(c => c.isDigit || c == '.')
    val all = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    val packed = streams.collect {
      case (d, data) if d.contains("/ObjStm") =>
        PageRe.findAllIn(new String(data,
          java.nio.charset.StandardCharsets.ISO_8859_1)).length
    }.sum
    PdfMeta(version, PageRe.findAllIn(all).length + packed,
      b.length.toLong)
  }

  private def textOf(b: Array[Byte]): String =
    textOf(allStreams(b))

  private def textOf(streams: Seq[(String, Array[Byte])]): String =
    streams.collect {
      case (d, data) if !d.contains("/ObjStm") && !d.contains("/XRef") =>
        textFromContent(new String(data,
          java.nio.charset.StandardCharsets.ISO_8859_1))
    }
      .filter(_.nonEmpty)
      .mkString("\n")

  /** Extracted text of the whole file (content streams in file
    * order); null for payloads without a %PDF header. */
  def pdfText(payload: Column): Column = {
    val f = udf { (b: Array[Byte]) =>
      if (!isPdf(b)) null else textOf(b)
    }
    f(payload)
  }

  /** Header version + page-object count (`/Type /Page`, not /Pages). */
  case class PdfMeta(version: String, n_pages: Int, n_bytes: Long)

  def pdfMeta(payload: Column): Column = {
    val f = udf { (b: Array[Byte]) =>
      if (!isPdf(b)) null else metaOf(b)
    }
    f(payload)
  }

  /** Meta + extracted text in ONE file walk — use when a query needs
    * both (the single-facet functions each rescan the payload). */
  case class PdfSummary(meta: PdfMeta, text: String)

  def pdfSummary(payload: Column): Column = {
    val f = udf { (b: Array[Byte]) =>
      if (!isPdf(b)) null
      else {
        val ss = allStreams(b)
        PdfSummary(metaOf(b, ss), textOf(ss))
      }
    }
    f(payload)
  }

  /** Deterministic, fully-valid one-page PDF (header, catalog, page
    * tree, font, content stream, xref, trailer): nl = 1 + id%4 text
    * lines, line k = `doc <id> line <k>` shown via Tj, plus one TJ
    * array line with an escaped \\( paren. Flate-compressed when
    * id%2 == 1 — so both filter paths hit the same oracle. */
  def syntheticPdf(id: Column): Column = {
    val f = udf { (idL: java.lang.Long) =>
      if (idL == null) null
      else {
        val i = idL.longValue
        val nl = (1 + i % 4).toInt
        val body = new StringBuilder()
        var k = 0
        while (k < nl) {
          body.append(s"BT /F1 12 Tf 72 ${712 - 14 * k} Td " +
            s"(doc $i line $k) Tj ET\n")
          k += 1
        }
        body.append(s"BT /F1 12 Tf 72 ${712 - 14 * nl} Td " +
          s"[(id) -250 (\\($i\\))] TJ ET\n")
        val contentPlain = body.toString.getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val flate = i % 2 == 1
        val content =
          if (!flate) contentPlain
          else {
            val d = new java.util.zip.Deflater()
            d.setInput(contentPlain); d.finish()
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            while (!d.finished()) out.write(buf, 0, d.deflate(buf))
            d.end()
            out.toByteArray
          }

        val out = new java.io.ByteArrayOutputStream()
        def w(s: String): Unit = out.write(s.getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1))
        val offsets = new Array[Int](6)
        w("%PDF-1.4\n")
        offsets(1) = out.size()
        w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
        offsets(2) = out.size()
        w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
        offsets(3) = out.size()
        w("3 0 obj\n<< /Type /Page /Parent 2 0 R " +
          "/MediaBox [0 0 612 792] /Contents 4 0 R " +
          "/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n")
        offsets(4) = out.size()
        w(s"4 0 obj\n<< /Length ${content.length}" +
          (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
        out.write(content)
        w("\nendstream\nendobj\n")
        offsets(5) = out.size()
        w("5 0 obj\n<< /Type /Font /Subtype /Type1 " +
          "/BaseFont /Helvetica >>\nendobj\n")
        val xref = out.size()
        w("xref\n0 6\n0000000000 65535 f \n")
        (1 to 5).foreach(o => w(f"${offsets(o)}%010d 00000 n \n"))
        w(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
        out.toByteArray
      }
    }
    f(id.cast("long"))
  }

  private def deflateBytes(plain: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(plain); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Deterministic PDF 1.5 file in the MODERN layout: the catalog,
    * page tree, and `np = 1 + id%3` page dicts are packed inside a
    * FlateDecode'd object stream (`/ObjStm`), cross-referenced by a
    * real xref STREAM (`/Type /XRef`, `/W [1 2 2]`, type-2 entries
    * pointing into the ObjStm) — no classic `xref` table anywhere, the
    * layout most real-world PDF writers emit. The content stream (the
    * same planted `doc <id> line <k>` lines as [[syntheticPdf]], Flate
    * when id is odd) stays top-level, as the spec requires. A page
    * count that ignores ObjStm reads 0 on these files — the
    * q_pdf_objstm oracle pins `np` against id arithmetic. */
  def syntheticPdfObjStm(id: Column): Column = {
    val f = udf { (idL: java.lang.Long) =>
      if (idL == null) null
      else {
        val i = idL.longValue
        val np = (1 + i % 3).toInt
        val nl = (1 + i % 4).toInt
        val body = new StringBuilder()
        var k = 0
        while (k < nl) {
          body.append(s"BT /F1 12 Tf 72 ${712 - 14 * k} Td " +
            s"(doc $i line $k) Tj ET\n")
          k += 1
        }
        body.append(s"BT /F1 12 Tf 72 ${712 - 14 * nl} Td " +
          s"[(id) -250 (\\($i\\))] TJ ET\n")
        val contentPlain = body.toString.getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val flate = i % 2 == 1
        val content =
          if (flate) deflateBytes(contentPlain) else contentPlain

        // ObjStm payload: catalog (obj 2), pages (obj 3), np page
        // dicts (objs 6 .. 5+np)
        val inner = new ArrayBuffer[(Int, String)]()
        inner += 2 -> "<< /Type /Catalog /Pages 3 0 R >>"
        inner += 3 -> ("<< /Type /Pages /Kids [" +
          (0 until np).map(p => s"${6 + p} 0 R").mkString(" ") +
          s"] /Count $np >>")
        (0 until np).foreach { p =>
          inner += (6 + p) -> ("<< /Type /Page /Parent 3 0 R " +
            "/MediaBox [0 0 612 792] /Contents 4 0 R >>")
        }
        val objBytes = inner.map(_._2 + "\n")
        val offs = objBytes.scanLeft(0)(_ + _.length).init
        val header = inner.zip(offs)
          .map { case ((num, _), o) => s"$num $o" }.mkString(" ") + "\n"
        val payloadPlain = (header + objBytes.mkString).getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val payload = deflateBytes(payloadPlain)

        val out = new java.io.ByteArrayOutputStream()
        def w(s: String): Unit = out.write(s.getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1))
        w("%PDF-1.5\n")
        val off1 = out.size()
        w(s"1 0 obj\n<< /Type /ObjStm /N ${inner.length} " +
          s"/First ${header.length} /Length ${payload.length} " +
          "/Filter /FlateDecode >>\nstream\n")
        out.write(payload)
        w("\nendstream\nendobj\n")
        val off4 = out.size()
        w(s"4 0 obj\n<< /Length ${content.length}" +
          (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
        out.write(content)
        w("\nendstream\nendobj\n")
        val off5 = out.size()
        // xref stream: W [1 2 2]; entries for objects 0 .. 5+np
        val size = 6 + np
        val xr = new java.io.ByteArrayOutputStream()
        def entry(t: Int, f2: Int, f3: Int): Unit = {
          xr.write(t)
          xr.write((f2 >> 8) & 0xff); xr.write(f2 & 0xff)
          xr.write((f3 >> 8) & 0xff); xr.write(f3 & 0xff)
        }
        entry(0, 0, 0xffff)            // obj 0: free
        entry(1, off1, 0)              // obj 1: the ObjStm itself
        entry(2, 1, 0)                 // obj 2: in ObjStm 1, index 0
        entry(2, 1, 1)                 // obj 3: index 1
        entry(1, off4, 0)              // obj 4: content stream
        entry(1, off5, 0)              // obj 5: this xref stream
        (0 until np).foreach(p => entry(2, 1, 2 + p)) // page dicts
        val xref = deflateBytes(xr.toByteArray)
        w(s"5 0 obj\n<< /Type /XRef /Size $size /W [1 2 2] " +
          s"/Root 2 0 R /Length ${xref.length} " +
          "/Filter /FlateDecode >>\nstream\n")
        out.write(xref)
        w("\nendstream\nendobj\n")
        w(s"startxref\n$off5\n%%EOF\n")
        out.toByteArray
      }
    }
    f(id.cast("long"))
  }
}
