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
  * Composite-font (CID/Type0) text decodes through real /ToUnicode
  * CMap parsing; encrypted files (standard security handler: RC4,
  * AES-128 per ISO 32000-1 §7.6.3, AES-256 V5/R5/R6 per ISO 32000-2
  * §7.6.4 including /EncryptMetadata false — see [[PdfCrypt]])
  * decrypt under the empty user password and fail CLOSED (null text)
  * when a real password would be required. Documented non-goals
  * (stated, not guessed): non-zero generation numbers, crypt filters
  * other than /StdCF, and layout reconstruction (reading order =
  * operator order).
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

  /** (object number, generation) of the `N G obj` header preceding
    * `dictStart`, or (-1, 0) — scans back over whitespace/digits only,
    * so an unframed dict (no obj header) stays anonymous. The
    * generation feeds the RC4/AES-128 per-object key (ISO 32000-1
    * Algorithm 1 salts MD5 with gen's low 2 bytes), so a non-zero-gen
    * object in an incrementally-updated file decrypts correctly
    * instead of producing garbage. */
  private def objNumBefore(b: Array[Byte], dictStart: Int): (Int, Int) = {
    var i = dictStart - 1
    while (i > 3 && (b(i) == ' ' || b(i) == '\r' || b(i) == '\n')) i -= 1
    // expect ...digits SP digits SP 'o''b''j'
    if (i < 2 || b(i - 2) != 'o' || b(i - 1) != 'b' || b(i) != 'j')
      return (-1, 0)
    i -= 3
    while (i > 0 && b(i) == ' ') i -= 1
    var genEnd = i
    while (i > 0 && b(i) >= '0' && b(i) <= '9') i -= 1 // generation
    val gen =
      if (i == genEnd) 0
      else new String(b, i + 1, genEnd - i,
        java.nio.charset.StandardCharsets.ISO_8859_1).trim.toInt
    while (i > 0 && b(i) == ' ') i -= 1
    var end = i
    while (i >= 0 && b(i) >= '0' && b(i) <= '9') i -= 1
    if (i == end) (-1, 0)
    else (new String(b, i + 1, end - i,
      java.nio.charset.StandardCharsets.ISO_8859_1).trim.toInt, gen)
  }

  /** Parsed `/Encrypt` state: cipher + the file key derived from the
    * EMPTY user password (the only password a crawl ever holds).
    * `ok` = the derived key verified against `/U`, i.e. the file is
    * readable without a real password. */
  private[graft] final case class EncryptInfo(
      v: Int, r: Int, aes: Boolean, key: Array[Byte], ok: Boolean)

  /** Bytes of the balanced `<< … >>` dict starting at `from` (which
    * must point at the opening `<<`), handling nested dicts. */
  private def balancedDict(b: Array[Byte], from: Int): String = {
    var depth = 0
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '<' && b(i + 1) == '<') { depth += 1; i += 2 }
      else if (b(i) == '>' && b(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0)
          return new String(b, from, i - from,
            java.nio.charset.StandardCharsets.ISO_8859_1)
      } else i += 1
    }
    ""
  }

  private val EncRefRe = "/Encrypt\\s+(\\d+)\\s+\\d+\\s+R".r
  private val IdRe = "/ID\\s*\\[\\s*<([0-9a-fA-F]*)>".r
  private def dictInt(d: String, key: String): Option[Int] =
    // via Long with truncation: wild PDFs store /P as an unsigned
    // 32-bit value (e.g. 4294963392) that must read as its two's-
    // complement Int
    ("/" + key + "\\s+(-?\\d+)").r.findFirstMatchIn(d)
      .map(_.group(1).toLong.toInt)
  /** A `/O`/`/U` value in either string syntax → raw bytes. */
  private def dictStrBytes(d: String, key: String): Option[Array[Byte]] = {
    val hex = ("/" + key + "\\s*<([0-9a-fA-F\\s]*)>").r
    val lit = ("(?s)/" + key + "\\s*\\(((?:[^\\\\)]|\\\\.)*)\\)").r
    hex.findFirstMatchIn(d).map(m => hexToBytes(m.group(1)))
      .orElse(lit.findFirstMatchIn(d).map(m =>
        decodePdfString(m.group(1)).map(_.toByte).toArray))
  }

  /** Locate and solve the standard security handler: find the
    * `/Encrypt N G R` trailer entry, parse object N's dict, derive
    * the file key from the empty user password, verify `/U`. Returns
    * None for unencrypted files; `ok = false` when a non-empty
    * password (or an unsupported V5+/crypt-filter layout) would be
    * required — callers fail closed on that. Stream objects may carry
    * non-zero generation numbers; [[objNumBefore]] parses the
    * generation and the per-object key derivation uses it. */
  private val TrailerObjRe = "(?m)^\\s*(\\d+)\\s+(\\d+)\\s+obj\\b".r
  private val XRefTypeRe = "/Type\\s*/XRef\\b".r

  /** The /Encrypt reference's object number, accepted ONLY inside a
    * PARSED trailer dictionary — either the balanced `<< … >>` dict
    * following a `trailer` keyword, or an object dict whose
    * `/Type /XRef` marks it as a PDF 1.5+ cross-reference-stream dict
    * (which doubles as the trailer). The LAST such dict carrying
    * /Encrypt wins: under incremental update the live trailer is the
    * final one. A token with NO enclosing trailer dict (e.g. a content
    * stream that merely contains the byte sequence, or /Root happening
    * to sit nearby — the old 1 KiB proximity heuristic's false
    * positive) is ignored: treating it as encryption would
    * misclassify a perfectly readable file as locked, and a spec-legal
    * trailer whose /Encrypt sat outside a proximity window would have
    * been missed (fail-open). Balanced-dict parsing has neither
    * failure mode. */
  private def encryptRef(all: String, b: Array[Byte]): Option[Int] = {
    val cands = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    // classic trailers: `trailer` keyword, then the balanced dict
    var t = all.indexOf("trailer")
    while (t >= 0) {
      val ds = all.indexOf("<<", t + 7)
      // only whitespace/comments legally separate the keyword from its
      // dict — bound the gap so an unrelated later dict can't attach
      if (ds >= 0 && ds - t < 256) cands += ((t, balancedDict(b, ds)))
      t = all.indexOf("trailer", t + 7)
    }
    // xref-stream trailers: object dicts typed /Type /XRef
    TrailerObjRe.findAllMatchIn(all).foreach { m =>
      val ds = all.indexOf("<<", m.end)
      if (ds >= 0 && ds - m.end < 64) {
        val d = balancedDict(b, ds)
        if (XRefTypeRe.findFirstIn(d).isDefined) cands += ((m.start, d))
      }
    }
    cands.sortBy(-_._1).iterator
      .map { case (_, d) => EncRefRe.findFirstMatchIn(d) }
      .collectFirst { case Some(m) =>
        // unparseable object number → sentinel −1: the file claims
        // encryption, so findEncrypt fails closed (locked), never open
        try m.group(1).toInt
        catch { case _: NumberFormatException => -1 }
      }
  }

  private[graft] def findEncrypt(b: Array[Byte]): Option[EncryptInfo] = {
    // cheap pre-check before the full ISO_8859_1 decode
    if (indexOf(b, "/Encrypt", 0) < 0) return None
    val all = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    encryptRef(all, b).map { objNum =>
      // Fail CLOSED on any malformed field (unparseable /P, truncated
      // /U, absurd /Length…): the file claims encryption, so a parse
      // failure means "locked" (null text), never a thrown task — one
      // bad crawl document must not fail the whole Spark task.
      try {
        // any generation: the /Encrypt dict object itself may carry a
        // non-zero gen in an incrementally-updated file
        val head = ("(?m)^\\s*" + objNum + "\\s+\\d+\\s+obj\\b").r
          .findFirstMatchIn(all).map(_.start).getOrElse(-1)
        val dict =
          if (head < 0) ""
          else {
            val ds = indexOf(b, "<<", head)
            if (ds < 0) "" else balancedDict(b, ds)
          }
        val v = dictInt(dict, "V").getOrElse(0)
        val r = dictInt(dict, "R").getOrElse(if (v == 5) 6 else 2)
        val lenBits = dictInt(dict, "Length").getOrElse(40)
        val p = dictInt(dict, "P").getOrElse(-1)
        val encMeta =
          !"/EncryptMetadata\\s+false".r.findFirstIn(dict).isDefined
        val aes = dict.contains("/AESV2") || dict.contains("/AESV3")
        val std = dict.contains("/Standard")
        val oOpt = dictStrBytes(dict, "O")
        val uOpt = dictStrBytes(dict, "U")
        val id0 = IdRe.findFirstMatchIn(all)
          .map(i => hexToBytes(i.group(1)))
          .getOrElse(Array.emptyByteArray)
        if (v == 5 && std && (r == 5 || r == 6) &&
            dict.contains("/AESV3")) {
          // AES-256 (ISO 32000-2): verify the empty user password
          // against /U, recover the file key from /UE
          (uOpt, dictStrBytes(dict, "UE")) match {
            case (Some(u), Some(ue))
                if u.length >= 48 && ue.length >= 32 =>
              val (key, ok) = PdfCrypt.fileKeyV5(
                Array.emptyByteArray, u, ue, r)
              EncryptInfo(v, r, aes = true, key, ok)
            case _ =>
              EncryptInfo(v, r, aes = true, Array.emptyByteArray,
                ok = false)
          }
        } else {
          val supported = std && (v == 1 || v == 2 ||
            (v == 4 && (aes || dict.contains("/V2"))))
          (oOpt, uOpt) match {
            case (Some(o), Some(u)) if supported && o.length == 32 =>
              val key = PdfCrypt.fileKey(
                Array.emptyByteArray, o, p, id0, r, lenBits / 8,
                encMeta)
              val expU = PdfCrypt.userValue(key, id0, r)
              val ok =
                if (r == 2) java.util.Arrays.equals(expU, u)
                else u.length >= 16 && java.util.Arrays.equals(
                  java.util.Arrays.copyOf(expU, 16),
                  java.util.Arrays.copyOf(u, 16))
              EncryptInfo(v, r, aes, key, ok)
            case _ =>
              EncryptInfo(v, r, aes, Array.emptyByteArray, ok = false)
          }
        }
      } catch {
        case _: Exception =>
          EncryptInfo(0, 0, aes = false, Array.emptyByteArray,
            ok = false)
      }
    }
  }

  /** Every (objNum, dict, inflated-data) stream triple in the file, in
    * file order (data inflated when the dict says /FlateDecode;
    * malformed framing skips the stream; objNum -1 when the `N G obj`
    * header is absent). Object streams (/ObjStm — packed non-stream
    * objects) and xref streams carry no text operators and are
    * excluded by [[textOf]]; [[metaOf]] reads ObjStm payloads for the
    * compressed page count and [[fontCmaps]] reads ToUnicode CMap
    * streams by object number. */
  private def allStreams(b: Array[Byte])
      : Seq[(Int, String, Array[Byte])] =
    allStreams(b, findEncrypt(b))

  private def allStreams(b: Array[Byte], enc: Option[EncryptInfo])
      : Seq[(Int, String, Array[Byte])] = {
    val out = new ArrayBuffer[(Int, String, Array[Byte])]()
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
        // Prefer the dict's direct /Length: the EOL-stripping scan
        // below mis-trims ENCRYPTED (binary) payloads whose last
        // ciphertext byte happens to be \r or \n. Indirect lengths
        // ("/Length N 0 R") fall back to the scan.
        // (?!\d|…): also forbid a following digit, or the regex
        // backtracks on indirect lengths ("/Length 123 0 R" would
        // match the truncated prefix "12")
        val dictLen = "/Length\\s+(\\d+)(?!\\d|\\s+\\d+\\s+R)".r
          .findFirstMatchIn(dict).map(_.group(1).toInt)
        val byLen = dictLen.collect {
          case l if l >= 0 && ds + l <= b.length &&
              indexOf(b, "endstream", ds + l) >= 0 &&
              indexOf(b, "endstream", ds + l) <= ds + l + 4 => ds + l
        }
        val e = byLen.map(de =>
            indexOf(b, "endstream", de))
          .getOrElse(indexOf(b, "endstream", ds))
        if (e < 0) i = -1
        else {
          var de = byLen.getOrElse(e)
          if (byLen.isEmpty) {
            // strip the EOL before "endstream"
            if (de > ds && b(de - 1) == '\n') de -= 1
            if (de > ds && b(de - 1) == '\r') de -= 1
          }
          val (objN, objGen) =
            if (dictStart >= 0) objNumBefore(b, dictStart) else (-1, 0)
          // Encryption applies to the STORED stream bytes (i.e. after
          // compression): decrypt, THEN inflate. Cross-reference
          // streams are never encrypted (ISO 32000-1 §7.5.8.2).
          val raw = enc match {
            case Some(ei) if ei.ok && objN >= 0 &&
                !dict.contains("/XRef") =>
              try PdfCrypt.decrypt(ei.key, objN, objGen, ei.aes,
                java.util.Arrays.copyOfRange(b, ds, de))
              catch { case _: Exception => Array.emptyByteArray }
            case _ => java.util.Arrays.copyOfRange(b, ds, de)
          }
          val data =
            if (dict.contains("/FlateDecode"))
              try inflate(raw, 0, raw.length)
              catch {
                case e: IllegalArgumentException => throw e // budget
                case _: Exception => Array.emptyByteArray
              }
            else raw
          if (data.nonEmpty)
            out += ((objN, dict, data))
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

  /** A parsed /ToUnicode CMap: code → unicode for the composite
    * (Type0/CID) fonts modern writers emit. Codes are assumed 2-byte
    * (Identity-H, the near-universal real-world encoding; codespace
    * ranges are not parsed — documented subset). */
  private[graft] final case class ToUnicode(
      single: Map[Int, String], ranges: Seq[(Int, Int, String)]) {
    /** Unicode text for one 2-byte code; unmapped codes become U+FFFD
      * (a visible failure, never silently-wrong text). */
    def decode(code: Int): String =
      single.getOrElse(code, {
        ranges.collectFirst { case (lo, hi, dst) if code >= lo &&
            code <= hi =>
          // PDF 32000 §9.10.3: increment the LAST UTF-16 code unit
          if (dst.isEmpty) "�"
          else dst.init + (dst.last + (code - lo)).toChar
        }.getOrElse("�")
      })
  }

  private val HexTokRe = "<([0-9a-fA-F\\s]*)>".r
  private def hexToBytes(h: String): Array[Byte] = {
    val clean = h.filterNot(_.isWhitespace)
    val padded = if (clean.length % 2 == 1) clean + "0" else clean
    padded.grouped(2).map(s => Integer.parseInt(s, 16).toByte).toArray
  }
  private def hexToUtf16(h: String): String = {
    val bs = hexToBytes(h)
    new String(bs, java.nio.charset.StandardCharsets.UTF_16BE)
  }
  private def hexToInt(h: String): Int = {
    val clean = h.filterNot(_.isWhitespace)
    if (clean.isEmpty) 0 else Integer.parseInt(clean, 16)
  }

  /** Parse the bfchar/bfrange sections of a ToUnicode CMap stream.
    * Handles both bfrange destination forms (start-hex increment and
    * explicit array). */
  private[graft] def parseToUnicode(cmap: String): ToUnicode = {
    val single = Map.newBuilder[Int, String]
    val ranges = Seq.newBuilder[(Int, Int, String)]
    val charSec = "(?s)beginbfchar(.*?)endbfchar".r
    val rangeSec = "(?s)beginbfrange(.*?)endbfrange".r
    charSec.findAllMatchIn(cmap).foreach { m =>
      val toks = HexTokRe.findAllMatchIn(m.group(1))
        .map(_.group(1)).toSeq
      toks.grouped(2).foreach {
        case Seq(src, dst) => single += hexToInt(src) -> hexToUtf16(dst)
        case _ =>
      }
    }
    rangeSec.findAllMatchIn(cmap).foreach { m =>
      val body = m.group(1)
      // tokens are <hex>, [ and ] in order
      val tokRe = "<([0-9a-fA-F\\s]*)>|(\\[)|(\\])".r
      val toks = tokRe.findAllMatchIn(body).toSeq
      var i = 0
      while (i + 2 < toks.length + 1 && i + 1 < toks.length) {
        val lo = toks(i); val hi = toks(i + 1)
        if (lo.group(1) == null || hi.group(1) == null) { i += 1 }
        else if (i + 2 < toks.length && toks(i + 2).group(2) != null) {
          // array form: [ <dst> <dst> ... ] — one dst per code
          val loV = hexToInt(lo.group(1)); val hiV = hexToInt(hi.group(1))
          var j = i + 3
          var c = loV
          while (j < toks.length && toks(j).group(3) == null) {
            if (toks(j).group(1) != null && c <= hiV) {
              single += c -> hexToUtf16(toks(j).group(1)); c += 1
            }
            j += 1
          }
          i = j + 1
        } else if (i + 2 < toks.length && toks(i + 2).group(1) != null) {
          ranges += ((hexToInt(lo.group(1)), hexToInt(hi.group(1)),
            hexToUtf16(toks(i + 2).group(1))))
          i += 3
        } else i += 3
      }
    }
    ToUnicode(single.result(), ranges.result())
  }

  private val FontDictRe =
    "/Font\\s*<<((?:[^<>]|<<[^<>]*>>)*)>>".r
  private val FontRefRe = "/(\\w+)\\s+(\\d+)\\s+\\d+\\s+R".r
  private val ToUniRe = "/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R".r
  private val ObjHeadRe = "(?s)(\\d+)\\s+\\d+\\s+obj(.{0,600}?)endobj".r

  /** Resource-name → ToUnicode map for the file's composite fonts.
    * Heuristic object-graph walk in the house style (regex over the
    * raw bytes PLUS every inflated ObjStm payload, where modern
    * writers put font and resource dicts): /Font resource dicts give
    * name → font object, font objects give /ToUnicode → CMap stream
    * object, and the CMap streams are matched by object number from
    * the stream walk. Names colliding across pages keep the FIRST
    * binding (documented subset — per-page resource scoping needs the
    * full xref graph). */
  private def fontCmaps(b: Array[Byte],
                        streams: Seq[(Int, String, Array[Byte])])
      : Map[String, ToUnicode] = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val texts = new String(b, iso) +: streams.collect {
      case (_, d, data) if d.contains("/ObjStm") => new String(data, iso)
    }
    // font object -> cmap object (from "N 0 obj ... /ToUnicode M 0 R"
    // framing in raw bytes, or "num offset" framed dicts in ObjStm —
    // for the latter the /ToUnicode ref inside any dict is attributed
    // by scanning ObjStm headers)
    val fontToCmap = Map.newBuilder[Int, Int]
    texts.foreach { t =>
      ObjHeadRe.findAllMatchIn(t).foreach { m =>
        ToUniRe.findFirstMatchIn(m.group(2)).foreach(u =>
          fontToCmap += m.group(1).toInt -> u.group(1).toInt)
      }
    }
    // ObjStm payloads: header "num off num off ..." then the dicts —
    // attribute /ToUnicode refs to the Nth header objnum
    streams.collect { case (_, d, data) if d.contains("/ObjStm") =>
      val t = new String(data, iso)
      val firstIdx = "/First\\s+(\\d+)".r.findFirstMatchIn(d)
        .map(_.group(1).toInt)
      val n = "/N\\s+(\\d+)".r.findFirstMatchIn(d).map(_.group(1).toInt)
      (t, firstIdx, n)
    }.foreach { case (t, firstOpt, nOpt) =>
      (firstOpt, nOpt) match {
        case (Some(first), Some(n)) if first <= t.length =>
          val header = t.substring(0, first).trim
            .split("\\s+").filter(_.nonEmpty)
          val pairs = header.grouped(2).toSeq.take(n)
          pairs.zipWithIndex.foreach { case (p, idx) =>
            if (p.length == 2) {
              val objNum = p(0).toInt
              val off = first + p(1).toInt
              val end =
                if (idx + 1 < pairs.length && pairs(idx + 1).length == 2)
                  first + pairs(idx + 1)(1).toInt
                else t.length
              if (off <= t.length && end <= t.length && off < end) {
                val body = t.substring(off, end)
                ToUniRe.findFirstMatchIn(body).foreach(u =>
                  fontToCmap += objNum -> u.group(1).toInt)
              }
            }
          }
        case _ =>
      }
    }
    val f2c = fontToCmap.result()
    if (f2c.isEmpty) return Map.empty
    val cmapByObj = streams.collect {
      case (num, _, data) if num >= 0 && f2c.values.exists(_ == num) =>
        num -> parseToUnicode(new String(data, iso))
    }.toMap
    val out = scala.collection.mutable.LinkedHashMap[String, ToUnicode]()
    texts.foreach { t =>
      FontDictRe.findAllMatchIn(t).foreach { fd =>
        FontRefRe.findAllMatchIn(fd.group(1)).foreach { r =>
          for {
            cm <- f2c.get(r.group(2).toInt)
            cmap <- cmapByObj.get(cm)
          } if (!out.contains(r.group(1))) out += r.group(1) -> cmap
        }
      }
    }
    out.toMap
  }

  /** Text-showing strings from one content stream, in operator order:
    * `(…) Tj`, `(…) '`, `<hex> Tj`, and every string inside a `[…] TJ`
    * array. Strings are joined with spaces; each BT…ET block ends a
    * line. `fonts` carries the composite (Type0/CID) fonts' ToUnicode
    * CMaps: the `/Fx size Tf` operator switches the active font, and
    * while a CMap-backed font is active every string — literal or hex
    * — is read as 2-byte CIDs mapped through the CMap (Identity-H
    * semantics); otherwise bytes are Latin-1 as before. */
  private[graft] def textFromContent(content: String): String =
    textFromContent(content, Map.empty)

  private[graft] def textFromContent(
      content: String, fonts: Map[String, ToUnicode]): String = {
    val lines = new ArrayBuffer[String]()
    val TfRe = "/(\\w+)\\s+[\\d.]+\\s+Tf".r
    def viaCmap(raw: String, cmap: ToUnicode): String = {
      // raw holds one char per BYTE (Latin-1 decode); consume 2-byte
      // codes
      val sb = new StringBuilder()
      var i = 0
      while (i + 1 < raw.length) {
        sb.append(cmap.decode(((raw.charAt(i) & 0xff) << 8) |
          (raw.charAt(i + 1) & 0xff)))
        i += 2
      }
      sb.toString
    }
    var i = 0
    var active: Option[ToUnicode] = None // Tg state persists across BT
    while (i >= 0 && i < content.length) {
      val bt = content.indexOf("BT", i)
      if (bt < 0) i = -1
      else {
        val et = content.indexOf("ET", bt + 2)
        val end = if (et < 0) content.length else et
        val block = content.substring(bt + 2, end)
        val parts = new ArrayBuffer[String]()
        // process Tf switches and strings in order
        var j = 0
        var lastTf = 0
        def advanceFonts(upto: Int): Unit = {
          if (fonts.nonEmpty) {
            TfRe.findAllMatchIn(block.substring(lastTf, upto))
              .foreach(m => active = fonts.get(m.group(1)))
            lastTf = upto
          }
        }
        while (j < block.length) {
          val c0 = block.charAt(j)
          if (c0 == '(') {
            advanceFonts(j)
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
            val lit = decodePdfString(sb.toString)
            parts += active.map(viaCmap(lit, _)).getOrElse(lit)
            j = k
            lastTf = j
          } else if (c0 == '<' && j + 1 < block.length &&
              block.charAt(j + 1) != '<') {
            advanceFonts(j)
            val close = block.indexOf('>', j + 1)
            if (close < 0) j = block.length
            else {
              val hex = block.substring(j + 1, close)
              if (hex.forall(c => c.isWhitespace ||
                  Character.digit(c, 16) >= 0)) {
                val raw = new String(hexToBytes(hex),
                  java.nio.charset.StandardCharsets.ISO_8859_1)
                parts += active.map(viaCmap(raw, _)).getOrElse(raw)
              }
              j = close + 1
              lastTf = j
            }
          } else if (c0 == '<') j += 2 // '<<' dict — skip both
          else j += 1
        }
        advanceFonts(block.length)
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
                     streams: Seq[(Int, String, Array[Byte])]): PdfMeta = {
    val head = new String(b, 0, math.min(16, b.length),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val version = head.drop(5).takeWhile(c => c.isDigit || c == '.')
    val all = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    val packed = streams.collect {
      case (_, d, data) if d.contains("/ObjStm") =>
        PageRe.findAllIn(new String(data,
          java.nio.charset.StandardCharsets.ISO_8859_1)).length
    }.sum
    PdfMeta(version, PageRe.findAllIn(all).length + packed,
      b.length.toLong)
  }

  private def textOf(b: Array[Byte]): String =
    textOf(b, allStreams(b))

  private def textOf(b: Array[Byte],
                     streams: Seq[(Int, String, Array[Byte])]): String = {
    val fonts = fontCmaps(b, streams)
    streams.collect {
      case (_, d, data) if !d.contains("/ObjStm") && !d.contains("/XRef") =>
        textFromContent(new String(data,
          java.nio.charset.StandardCharsets.ISO_8859_1), fonts)
    }
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  /** Extracted text of the whole file (content streams in file
    * order); null for payloads without a %PDF header, and null
    * (fail closed, never garbage) for encrypted files whose empty
    * user password does not verify against `/U`. */
  def pdfText(payload: Column): Column = {
    val f = udf { (b: Array[Byte]) =>
      if (!isPdf(b)) null
      else {
        val enc = findEncrypt(b)
        if (enc.exists(!_.ok)) null
        else textOf(b, allStreams(b, enc))
      }
    }
    f(payload)
  }

  /** Encryption facet + text in ONE walk: cipher ∈ {none, rc4,
    * aes128, aes256, unknown}, decryptable = no password needed
    * (always true for unencrypted files), text = extraction through
    * the decrypted streams (null when locked). `unknown` = the file
    * claims encryption but its /Encrypt dict failed to parse
    * (findEncrypt's fail-closed sentinel v=0) — labeling it `rc4`
    * would assert a cipher nobody actually determined. */
  case class PdfCrypto(cipher: String, decryptable: Boolean, text: String)

  def pdfCryptoText(payload: Column): Column = {
    val f = udf { (b: Array[Byte]) =>
      if (!isPdf(b)) null
      else {
        val enc = findEncrypt(b)
        val cipher = enc.map(e =>
            if (e.v >= 5) "aes256"
            else if (e.aes) "aes128"
            else if (e.v == 0) "unknown"
            else "rc4")
          .getOrElse("none")
        val ok = enc.forall(_.ok)
        PdfCrypto(cipher, ok,
          if (ok) textOf(b, allStreams(b, enc)) else null)
      }
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
        val enc = findEncrypt(b)
        val ss = allStreams(b, enc)
        PdfSummary(metaOf(b, ss),
          if (enc.exists(!_.ok)) null else textOf(b, ss))
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

  /** Deterministic one-page PDF with a COMPOSITE (Type0/CID) font:
    * /F1 is a plain Helvetica (Latin-1 literals), /F2 is an
    * Identity-H Type0 font whose /ToUnicode CMap maps CID = char +
    * 0x0100 via one bfrange (<0120> <017E> -> <0020>) plus a bfchar
    * single (<0001> -> '#'). The content shows one plain literal line
    * through /F1, one hex-string CID line + the bfchar code through
    * /F2, and a CID TJ array — so extraction must track Tf font
    * switches and map every 2-byte code through the CMap. Content
    * stream Flate-compressed when id is odd. Expected text, closed
    * form: "doc <i> plain line\ndoc <i> cid line #\nid (<i>)". */
  def syntheticPdfCid(id: Column): Column = {
    val f = udf { (idL: java.lang.Long) =>
      if (idL == null) null
      else {
        val i = idL.longValue
        def cidHex(t: String): String =
          t.map(c => f"${c + 0x100}%04x").mkString
        val body =
          s"BT /F1 12 Tf 72 712 Td (doc $i plain line) Tj ET\n" +
          s"BT /F2 12 Tf 72 698 Td <${cidHex(s"doc $i cid line")}> Tj " +
          "<0001> Tj ET\n" +
          s"BT /F2 12 Tf 72 684 Td [<${cidHex("id")}> -250 " +
          s"<${cidHex(s"($i)")}>] TJ ET\n"
        val contentPlain = body.getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val flate = i % 2 == 1
        val content =
          if (flate) deflateBytes(contentPlain) else contentPlain
        val cmap = ("/CIDInit /ProcSet findresource begin\n" +
          "12 dict begin\nbegincmap\n" +
          "1 begincodespacerange <0000> <FFFF> endcodespacerange\n" +
          "1 beginbfchar\n<0001> <0023>\nendbfchar\n" +
          "1 beginbfrange\n<0120> <017E> <0020>\nendbfrange\n" +
          "endcmap\nend\nend").getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val out = new java.io.ByteArrayOutputStream()
        def w(str: String): Unit = out.write(str.getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1))
        val offsets = new Array[Int](8)
        w("%PDF-1.4\n")
        offsets(1) = out.size()
        w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
        offsets(2) = out.size()
        w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
        offsets(3) = out.size()
        w("3 0 obj\n<< /Type /Page /Parent 2 0 R " +
          "/MediaBox [0 0 612 792] /Contents 7 0 R " +
          "/Resources << /Font << /F1 4 0 R /F2 5 0 R >> >> >>\nendobj\n")
        offsets(4) = out.size()
        w("4 0 obj\n<< /Type /Font /Subtype /Type1 " +
          "/BaseFont /Helvetica >>\nendobj\n")
        offsets(5) = out.size()
        w("5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Synth " +
          "/Encoding /Identity-H /ToUnicode 6 0 R >>\nendobj\n")
        offsets(6) = out.size()
        w(s"6 0 obj\n<< /Length ${cmap.length} >>\nstream\n")
        out.write(cmap)
        w("\nendstream\nendobj\n")
        offsets(7) = out.size()
        w(s"7 0 obj\n<< /Length ${content.length}" +
          (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
        out.write(content)
        w("\nendstream\nendobj\n")
        val xref = out.size()
        w("xref\n0 8\n0000000000 65535 f \n")
        (1 to 7).foreach(o => w(f"${offsets(o)}%010d 00000 n \n"))
        w(s"trailer\n<< /Size 8 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
        out.toByteArray
      }
    }
    f(id.cast("long"))
  }

  /** Deterministic ENCRYPTED one-page PDF under the standard security
    * handler with an EMPTY user password (owner password "owner") —
    * the dominant wild encrypted-PDF configuration. Even ids use RC4
    * 128-bit (`/V 2 /R 3`), odd ids AES-128-CBC (`/V 4 /R 4` with an
    * `/AESV2` crypt filter); content is additionally Flate-compressed
    * when id%3 == 1 (compress-then-encrypt, as the spec stores it).
    * The planted text matches [[syntheticPdf]] exactly (nl = 1+id%4
    * `doc <id> line <k>` lines + the TJ `id (<id>)` line), so the
    * same id-arithmetic oracle pins the DECRYPTED extraction. /O and
    * /U are real Algorithm-3/5 values; a reader that skips key
    * verification or mis-derives the per-object key produces garbage
    * bytes, not off-by-small text. */
  def syntheticPdfEncrypted(id: Column): Column = {
    val f = udf { (idL: java.lang.Long) =>
      if (idL == null) null
      else {
        val i = idL.longValue
        val aes = i % 2 == 1
        val (v, r) = if (aes) (4, 4) else (2, 3)
        val perm = -44
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
        val flate = i % 3 == 1
        val stored = if (flate) deflateBytes(contentPlain) else contentPlain

        val id0 = PdfCrypt.md5(s"fid $i".getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1))
        val oVal = PdfCrypt.ownerValue(
          "owner".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
          Array.emptyByteArray, r, 16)
        val key = PdfCrypt.fileKey(
          Array.emptyByteArray, oVal, perm, id0, r, 16)
        val uVal = PdfCrypt.userValue(key, id0, r)
        val iv = PdfCrypt.md5(s"iv $i".getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1))
        val content = PdfCrypt.encrypt(key, 4, 0, aes, iv, stored)

        def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
        val encDict =
          if (aes)
            "<< /Filter /Standard /V 4 /R 4 /Length 128 " +
              "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
              "/StmF /StdCF /StrF /StdCF " +
              s"/P $perm /O <${hex(oVal)}> /U <${hex(uVal)}> >>"
          else
            "<< /Filter /Standard /V 2 /R 3 /Length 128 " +
              s"/P $perm /O <${hex(oVal)}> /U <${hex(uVal)}> >>"

        val out = new java.io.ByteArrayOutputStream()
        def w(s: String): Unit = out.write(s.getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1))
        val offsets = new Array[Int](7)
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
        offsets(6) = out.size()
        w(s"6 0 obj\n$encDict\nendobj\n")
        val xref = out.size()
        w("xref\n0 7\n0000000000 65535 f \n")
        (1 to 6).foreach(o => w(f"${offsets(o)}%010d 00000 n \n"))
        w("trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R " +
          s"/ID [<${hex(id0)}> <${hex(id0)}>] >>\n" +
          s"startxref\n$xref\n%%EOF\n")
        out.toByteArray
      }
    }
    f(id.cast("long"))
  }

  /** Encrypted fixture for the PDF-2.0-era handlers the classic
    * fixture doesn't reach: id%3==0 → AES-256 `/V 5 /R 6`
    * (Algorithm 2.B hash), id%3==1 → AES-256 `/V 5 /R 5` (legacy
    * single-SHA-256), id%3==2 → AES-128 `/V 4 /R 4` with
    * `/EncryptMetadata false` (the 0xFFFFFFFF key-salt case). Same
    * planted text lines as [[syntheticPdfEncrypted]]; Flate'd when
    * id%2==1. All open under the empty user password. */
  def syntheticPdfAes256(id: Column): Column = {
    val f = udf { (idL: java.lang.Long) =>
      if (idL == null) null
      else {
        val i = idL.longValue
        val variant = (i % 3).toInt
        val perm = -44
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
        val stored = if (flate) deflateBytes(contentPlain)
          else contentPlain
        val id0 = PdfCrypt.md5(s"fid $i".getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1))
        val iv = PdfCrypt.md5(s"iv $i".getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1))
        def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
        val (encDict, content) =
          if (variant < 2) {
            val r = if (variant == 0) 6 else 5
            val key = PdfCrypt.sha256(s"key $i".getBytes(
              java.nio.charset.StandardCharsets.ISO_8859_1))
            val vSalt = java.util.Arrays.copyOf(PdfCrypt.md5(
              s"vs $i".getBytes(
                java.nio.charset.StandardCharsets.ISO_8859_1)), 8)
            val kSalt = java.util.Arrays.copyOf(PdfCrypt.md5(
              s"ks $i".getBytes(
                java.nio.charset.StandardCharsets.ISO_8859_1)), 8)
            val (u, ue) = PdfCrypt.makeUV5(key, vSalt, kSalt, r)
            // /O and /OE are present-but-dummy: the empty-user-password
            // path never reads them (owner-password recovery is out of
            // scope for a crawl)
            val oDummy = new Array[Byte](48)
            val oeDummy = new Array[Byte](32)
            val d = s"<< /Filter /Standard /V 5 /R $r /Length 256 " +
              "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
              "/StmF /StdCF /StrF /StdCF " +
              s"/P $perm /O <${hex(oDummy)}> /U <${hex(u)}> " +
              s"/OE <${hex(oeDummy)}> /UE <${hex(ue)}> " +
              s"/Perms <${hex(new Array[Byte](16))}> >>"
            (d, PdfCrypt.encrypt(key, 4, 0, aes = true, iv, stored))
          } else {
            val r = 4
            val oVal = PdfCrypt.ownerValue(
              "owner".getBytes(
                java.nio.charset.StandardCharsets.ISO_8859_1),
              Array.emptyByteArray, r, 16)
            val key = PdfCrypt.fileKey(
              Array.emptyByteArray, oVal, perm, id0, r, 16,
              encryptMetadata = false)
            val uVal = PdfCrypt.userValue(key, id0, r)
            val d = "<< /Filter /Standard /V 4 /R 4 /Length 128 " +
              "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
              "/StmF /StdCF /StrF /StdCF /EncryptMetadata false " +
              s"/P $perm /O <${hex(oVal)}> /U <${hex(uVal)}> >>"
            (d, PdfCrypt.encrypt(key, 4, 0, aes = true, iv, stored))
          }
        val out = new java.io.ByteArrayOutputStream()
        def w(s: String): Unit = out.write(s.getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1))
        val offsets = new Array[Int](7)
        w(if (variant < 2) "%PDF-2.0\n" else "%PDF-1.6\n")
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
        offsets(6) = out.size()
        w(s"6 0 obj\n$encDict\nendobj\n")
        val xref = out.size()
        w("xref\n0 7\n0000000000 65535 f \n")
        (1 to 6).foreach(o => w(f"${offsets(o)}%010d 00000 n \n"))
        w("trailer\n<< /Size 7 /Root 1 0 R /Encrypt 6 0 R " +
          s"/ID [<${hex(id0)}> <${hex(id0)}>] >>\n" +
          s"startxref\n$xref\n%%EOF\n")
        out.toByteArray
      }
    }
    f(id.cast("long"))
  }
}
