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
  * overwhelming majority of machine-generated PDFs. Documented
  * non-goals (stated, not guessed): CID/Type0 composite-font
  * decoding, encryption, object streams (`/ObjStm`), and layout
  * reconstruction (reading order = operator order).
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

  /** All content-stream bytes of the file, inflated when the stream
    * dict says /FlateDecode. Malformed framing skips the stream. */
  private def contentStreams(b: Array[Byte]): Seq[Array[Byte]] = {
    val out = new ArrayBuffer[Array[Byte]]()
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
          if (data.nonEmpty) out += data
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

  private def metaOf(b: Array[Byte]): PdfMeta = {
    val head = new String(b, 0, math.min(16, b.length),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val version = head.drop(5).takeWhile(c => c.isDigit || c == '.')
    val all = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    PdfMeta(version, PageRe.findAllIn(all).length, b.length.toLong)
  }

  private def textOf(b: Array[Byte]): String =
    contentStreams(b)
      .map(d => textFromContent(new String(d,
        java.nio.charset.StandardCharsets.ISO_8859_1)))
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
      if (!isPdf(b)) null else PdfSummary(metaOf(b), textOf(b))
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
}
