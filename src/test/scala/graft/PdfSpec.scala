package graft

import graft.sources.{PdfCrypt, PdfOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PDF text extraction: synthetic files (plain + FlateDecode) must
  * extract byte-exact expected text; escapes and malformed inputs. */
class PdfSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("syntheticPdf extracts the exact planted text (both filters)") {
    import spark.implicits._
    val rows = spark.range(0, 20)
      .select(col("id"),
        PdfOps.pdfText(PdfOps.syntheticPdf(col("id"))).as("t"),
        PdfOps.pdfMeta(PdfOps.syntheticPdf(col("id"))).as("m"))
      .collect()
    rows.foreach { r =>
      val i = r.getLong(0)
      val nl = (1 + i % 4).toInt
      val expect = ((0 until nl).map(k => s"doc $i line $k") :+
        s"id ($i)").mkString("\n")
      assert(r.getString(1) == expect, s"id=$i text")
      val m = r.getStruct(2)
      assert(m.getString(0) == "1.4" && m.getInt(1) == 1, s"id=$i meta")
    }
  }

  test("encrypted PDFs (RC4 + AES-128) decrypt to the exact planted " +
      "text under the empty user password") {
    import spark.implicits._
    val rows = spark.range(0, 24)
      .select(col("id"), PdfOps.pdfCryptoText(
        PdfOps.syntheticPdfEncrypted(col("id"))).as("c"))
      .select(col("id"), col("c.cipher"), col("c.decryptable"),
        col("c.text"))
      .collect()
    rows.foreach { r =>
      val i = r.getLong(0)
      val nl = (1 + i % 4).toInt
      val expect = ((0 until nl).map(k => s"doc $i line $k") :+
        s"id ($i)").mkString("\n")
      assert(r.getString(1) == (if (i % 2 == 1) "aes128" else "rc4"),
        s"id=$i cipher")
      assert(r.getBoolean(2), s"id=$i must be readable (empty user pwd)")
      assert(r.getString(3) == expect, s"id=$i decrypted text")
    }
  }

  test("a REAL user password fails closed: null text, decryptable " +
      "false, meta still real") {

    // Re-key a fixture file so the user password is "secret": recompute
    // O/U from that password and splice them into the Encrypt dict.
    import spark.implicits._
    val b = spark.range(2, 3)
      .select(PdfOps.syntheticPdfEncrypted(col("id")))
      .as[Array[Byte]].head()
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val all = new String(b, iso)
    val r = 3
    val id0 = PdfCrypt.md5("fid 2".getBytes(iso))
    val o2 = PdfCrypt.ownerValue("owner".getBytes(iso),
      "secret".getBytes(iso), r, 16)
    val k2 = PdfCrypt.fileKey("secret".getBytes(iso), o2, -44, id0, r, 16)
    val u2 = PdfCrypt.userValue(k2, id0, r)
    def hex(x: Array[Byte]) = x.map(v => f"$v%02x").mkString
    val oldO = "/O <([0-9a-f]+)>".r.findFirstMatchIn(all).get.group(1)
    val oldU = "/U <([0-9a-f]+)>".r.findFirstMatchIn(all).get.group(1)
    val locked = all.replace(oldO, hex(o2)).replace(oldU, hex(u2))
      .getBytes(iso)
    val got = spark.createDataset(Seq(locked))
      .select(PdfOps.pdfCryptoText(col("value")).as("c"),
        PdfOps.pdfMeta(col("value")).as("m"))
      .select(col("c.cipher"), col("c.decryptable"), col("c.text"),
        col("m.n_pages"))
      .head()
    assert(got.getString(0) == "rc4")
    assert(!got.getBoolean(1), "locked file must not claim decryptable")
    assert(got.isNullAt(2), "locked file must yield NULL text, not garbage")
    assert(got.getInt(3) == 1, "page dicts are plaintext: meta stays real")
  }

  test("PdfCrypt primitives: RC4 round-trips, AES round-trips, " +
      "object keys differ per object") {

    val key = PdfCrypt.md5("k".getBytes)
    val msg = "attack at dawn".getBytes
    assert(PdfCrypt.rc4(key, PdfCrypt.rc4(key, msg)).sameElements(msg))
    val iv = PdfCrypt.md5("iv".getBytes)
    val ct = PdfCrypt.aesEncrypt(key, iv, msg)
    assert(PdfCrypt.aesDecrypt(key, ct).sameElements(msg))
    assert(!ct.drop(16).sameElements(msg))
    val k4 = PdfCrypt.objectKey(key, 4, 0, aes = false)
    val k5 = PdfCrypt.objectKey(key, 5, 0, aes = false)
    val k4a = PdfCrypt.objectKey(key, 4, 0, aes = true)
    assert(!k4.sameElements(k5) && !k4.sameElements(k4a))
    assert(k4.length == 16) // min(16+5, 16)
  }

  test("string escapes: parens, backslash, octal") {
    assert(PdfOps.decodePdfString("a\\(b\\)c") == "a(b)c")
    assert(PdfOps.decodePdfString("x\\\\y") == "x\\y")
    assert(PdfOps.decodePdfString("\\101\\102") == "AB")
    assert(PdfOps.decodePdfString("n\\nl") == "n\nl")
  }

  test("textFromContent handles nested parens and TJ arrays") {
    val c = "BT (outer (inner) rest) Tj ET BT [(a) -5 (b)] TJ ET"
    assert(PdfOps.textFromContent(c) == "outer (inner) rest\na b")
  }

  test("PDF 1.5 ObjStm layout: text extracts identically, page count " +
      "reads the compressed page dicts") {
    import spark.implicits._
    val rows = spark.range(0, 24)
      .select(col("id"),
        PdfOps.pdfText(PdfOps.syntheticPdfObjStm(col("id"))).as("t"),
        PdfOps.pdfMeta(PdfOps.syntheticPdfObjStm(col("id"))).as("m"))
      .collect()
    rows.foreach { r =>
      val i = r.getLong(0)
      val nl = (1 + i % 4).toInt
      val expect = ((0 until nl).map(k => s"doc $i line $k") :+
        s"id ($i)").mkString("\n")
      assert(r.getString(1) == expect, s"id=$i text")
      val m = r.getStruct(2)
      assert(m.getString(0) == "1.5", s"id=$i version")
      assert(m.getInt(1) == (1 + i % 3).toInt,
        s"id=$i pages: got ${m.getInt(1)} — ObjStm page dicts must count")
    }
  }

  test("CID/Type0 font text: hex strings and literals map through the " +
      "ToUnicode CMap, font switches tracked per Tf") {
    import spark.implicits._
    val rows = spark.range(0, 20)
      .select(col("id"),
        PdfOps.pdfText(PdfOps.syntheticPdfCid(col("id"))).as("t"))
      .collect()
    rows.foreach { r =>
      val i = r.getLong(0)
      val expect = s"doc $i plain line\ndoc $i cid line #\nid ($i)"
      assert(r.getString(1) == expect,
        s"id=$i: got ${r.getString(1)}")
    }
  }

  test("ToUnicode CMap parsing: bfchar, bfrange increment, bfrange " +
      "array form, unmapped -> U+FFFD") {
    val cm = PdfOps.parseToUnicode(
      """1 beginbfchar
        |<0001> <0041>
        |endbfchar
        |2 beginbfrange
        |<0100> <0102> <0061>
        |<0200> <0201> [<00480069> <0042>]
        |endbfrange""".stripMargin)
    assert(cm.decode(1) == "A")
    assert(cm.decode(0x100) == "a" && cm.decode(0x101) == "b" &&
      cm.decode(0x102) == "c")
    assert(cm.decode(0x200) == "Hi" && cm.decode(0x201) == "B")
    assert(cm.decode(0x999) == "�")
  }

  test("non-PDF payloads yield null") {
    import spark.implicits._
    val r = Seq("plain".getBytes, Array[Byte](1, 2))
      .toDF("p").select(PdfOps.pdfText(col("p"))).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("AES-256 V5 (R5 + R6) and R4/EncryptMetadata-false decrypt to " +
      "the exact planted text under the empty user password") {
    import spark.implicits._
    val rows = spark.range(0, 24)
      .select(col("id"), PdfOps.pdfCryptoText(
        PdfOps.syntheticPdfAes256(col("id"))).as("c"))
      .select(col("id"), col("c.cipher"), col("c.decryptable"),
        col("c.text"))
      .collect()
    rows.foreach { r =>
      val i = r.getLong(0)
      val nl = (1 + i % 4).toInt
      val expect = ((0 until nl).map(k => s"doc $i line $k") :+
        s"id ($i)").mkString("\n")
      assert(r.getString(1) ==
        (if (i % 3 < 2) "aes256" else "aes128"), s"id=$i cipher")
      assert(r.getBoolean(2), s"id=$i must be readable")
      assert(r.getString(3) == expect, s"id=$i decrypted text")
    }
  }

  test("hash2B (Algorithm 2.B) is deterministic, 32 bytes, and " +
      "differs from the R5 single-SHA-256 hash") {
    val pwd = Array.emptyByteArray
    val salt = Array.tabulate[Byte](8)(_.toByte)
    val a = PdfCrypt.hash2B(pwd, salt, Array.emptyByteArray)
    val b = PdfCrypt.hash2B(pwd, salt, Array.emptyByteArray)
    assert(a.length == 32 && java.util.Arrays.equals(a, b))
    assert(!java.util.Arrays.equals(a, PdfCrypt.sha256(pwd, salt)))
    // password-sensitivity: a different password must change the hash
    val c = PdfCrypt.hash2B("x".getBytes, salt, Array.emptyByteArray)
    assert(!java.util.Arrays.equals(a, c))
  }

  test("an unencrypted PDF whose content stream contains the bytes " +
      "'/Encrypt 6 0 R' is NOT misclassified as locked") {
    import spark.implicits._
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    // hand-built: the token lives inside the (uncompressed) content
    // stream, padded >1 KiB away from the trailer so there is no
    // trailer context around it
    val pad = (1 to 40).map(k =>
      s"BT /F1 12 Tf 72 ${700 - k} Td (pad line $k) Tj ET").mkString("\n")
    val body = "BT /F1 12 Tf 72 712 Td (/Encrypt 6 0 R) Tj ET\n" +
      pad + "\n"
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(iso))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n" +
      "endobj\n")
    w(s"4 0 obj\n<< /Length ${body.length} >>\nstream\n")
    w(body)
    w("endstream\nendobj\n")
    val xref = out.size()
    w("xref\n0 5\n")
    w(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    val r = Seq(out.toByteArray).toDF("p")
      .select(PdfOps.pdfCryptoText(col("p")).as("c"))
      .select(col("c.cipher"), col("c.decryptable"), col("c.text"))
      .head()
    assert(r.getString(0) == "none")
    assert(r.getBoolean(1))
    assert(r.getString(2).contains("/Encrypt 6 0 R") &&
      r.getString(2).contains("pad line 40"))
  }

  test("malformed /Encrypt fields fail closed (locked), never throw: " +
      "unsigned 32-bit /P parses to its two's complement") {
    import spark.implicits._
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    // unsigned /P: re-write the fixture's "/P -44" as its unsigned
    // 32-bit spelling 4294967252 — the derived key must be IDENTICAL,
    // so the file still decrypts
    val b = spark.range(2, 3)
      .select(PdfOps.syntheticPdfEncrypted(col("id")))
      .as[Array[Byte]].head()
    val unsignedP = new String(b, iso)
      .replace("/P -44", "/P " + ((-44L) & 0xffffffffL))
      .getBytes(iso)
    val ok = Seq(unsignedP).toDF("p")
      .select(PdfOps.pdfCryptoText(col("p")).as("c"))
      .select(col("c.decryptable"), col("c.text")).head()
    assert(ok.getBoolean(0) && ok.getString(1).contains("doc 2 line 0"))
    // garbage /V: must yield locked (null text), not a thrown task
    val garbage = new String(b, iso)
      .replace("/V 2", "/V 99999999999999999999")
      .getBytes(iso)
    val locked = Seq(garbage).toDF("p")
      .select(PdfOps.pdfCryptoText(col("p")).as("c"))
      .select(col("c.decryptable"), col("c.text")).head()
    assert(!locked.getBoolean(0) && locked.isNullAt(1))
  }

  /** Hand-built RC4 (V2/R3) encrypted one-page PDF: content stream
    * object carries generation `gen`; the trailer is either classic
    * (`trailer << … >>`) or a PDF 1.5 cross-reference-stream dict
    * (`/Type /XRef`, no `trailer` keyword at all). */
  private def buildEncrypted(gen: Int, xrefStream: Boolean,
                             text: String): Array[Byte] = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val body = s"BT /F1 12 Tf 72 712 Td ($text) Tj ET\n".getBytes(iso)
    val perm = -44
    val id0 = PdfCrypt.md5("genfix".getBytes(iso))
    val oVal = PdfCrypt.ownerValue("owner".getBytes(iso),
      Array.emptyByteArray, 3, 16)
    val key = PdfCrypt.fileKey(Array.emptyByteArray, oVal, perm, id0,
      3, 16)
    val uVal = PdfCrypt.userValue(key, id0, 3)
    val content = PdfCrypt.encrypt(key, 4, gen, aes = false,
      Array.emptyByteArray, body)
    def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
    val encDict = "<< /Filter /Standard /V 2 /R 3 /Length 128 " +
      s"/P $perm /O <${hex(oVal)}> /U <${hex(uVal)}> >>"
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(iso))
    w("%PDF-1.5\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w(s"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 $gen R >>\n" +
      "endobj\n")
    w(s"4 $gen obj\n<< /Length ${content.length} >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    w(s"6 0 obj\n$encDict\nendobj\n")
    val xref = out.size()
    if (xrefStream) {
      // the xref-stream dict doubles as the trailer — /Encrypt and
      // /ID live here, and there is NO `trailer` keyword anywhere
      w("7 0 obj\n<< /Type /XRef /Size 8 /Root 1 0 R " +
        s"/Encrypt 6 0 R /ID [<${hex(id0)}> <${hex(id0)}>] " +
        "/W [1 2 1] /Length 0 >>\nstream\n\nendstream\nendobj\n")
      w(s"startxref\n$xref\n%%EOF\n")
    } else {
      w("xref\n0 8\n")
      w(s"trailer\n<< /Size 8 /Root 1 0 R /Encrypt 6 0 R " +
        s"/ID [<${hex(id0)}> <${hex(id0)}>] >>\nstartxref\n$xref\n" +
        "%%EOF\n")
    }
    out.toByteArray
  }

  test("non-zero generation numbers: a `4 1 obj` content stream " +
      "decrypts through the gen-salted per-object key") {
    import spark.implicits._
    val r = Seq(buildEncrypted(1, xrefStream = false, "gen one text"))
      .toDF("p")
      .select(PdfOps.pdfCryptoText(col("p")).as("c"))
      .select(col("c.cipher"), col("c.decryptable"), col("c.text"))
      .head()
    assert(r.getString(0) == "rc4")
    assert(r.getBoolean(1))
    assert(r.getString(2) == "gen one text")
  }

  test("xref-stream trailer (/Type /XRef, no `trailer` keyword) " +
      "carrying /Encrypt is detected and the file decrypts") {
    import spark.implicits._
    val r = Seq(buildEncrypted(0, xrefStream = true, "xref stream enc"))
      .toDF("p")
      .select(PdfOps.pdfCryptoText(col("p")).as("c"))
      .select(col("c.cipher"), col("c.decryptable"), col("c.text"))
      .head()
    assert(r.getString(0) == "rc4")
    assert(r.getBoolean(1))
    assert(r.getString(2) == "xref stream enc")
  }

  test("a content stream containing '/Root' near a fake '/Encrypt' " +
      "token is NOT misclassified (old proximity heuristic's trap)") {
    import spark.implicits._
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    // both tokens inside the content stream, well within 1 KiB of each
    // other — a proximity window would call this file locked; the
    // balanced-dict parser only accepts /Encrypt inside a real trailer
    val body = "BT /F1 12 Tf 72 712 Td " +
      "(/Root 1 0 R and /Encrypt 6 0 R live here) Tj ET\n"
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(iso))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n" +
      "endobj\n")
    w(s"4 0 obj\n<< /Length ${body.length} >>\nstream\n")
    w(body)
    w("endstream\nendobj\n")
    val xref = out.size()
    w("xref\n0 5\n")
    w(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    val r = Seq(out.toByteArray).toDF("p")
      .select(PdfOps.pdfCryptoText(col("p")).as("c"))
      .select(col("c.cipher"), col("c.decryptable"), col("c.text"))
      .head()
    assert(r.getString(0) == "none")
    assert(r.getBoolean(1))
    assert(r.getString(2).contains("/Encrypt 6 0 R"))
  }

  test("unparseable /Encrypt dict reports cipher 'unknown', not " +
      "'rc4', and stays locked") {
    import spark.implicits._
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val b = spark.range(2, 3)
      .select(PdfOps.syntheticPdfEncrypted(col("id")))
      .as[Array[Byte]].head()
    val garbage = new String(b, iso)
      .replace("/V 2", "/V 99999999999999999999")
      .getBytes(iso)
    val r = Seq(garbage).toDF("p")
      .select(PdfOps.pdfCryptoText(col("p")).as("c"))
      .select(col("c.cipher"), col("c.decryptable"), col("c.text"))
      .head()
    assert(r.getString(0) == "unknown")
    assert(!r.getBoolean(1) && r.isNullAt(2))
  }

  test("hostile /Length 256 on V2 cannot mis-route to AES-256: " +
      "fileKey clamps to 16 bytes") {
    val id0 = PdfCrypt.md5("clamp".getBytes)
    val o = PdfCrypt.ownerValue("o".getBytes, Array.emptyByteArray,
      3, 16)
    val k = PdfCrypt.fileKey(Array.emptyByteArray, o, -44, id0, 3, 32)
    assert(k.length == 16)
    // and the clamped key equals the honest 128-bit derivation
    val honest = PdfCrypt.fileKey(Array.emptyByteArray, o, -44, id0,
      3, 16)
    assert(java.util.Arrays.equals(k, honest))
  }

  test("indirect /Length ('123 0 R') is not mis-read as a direct " +
      "length by the backtracking regex") {
    // dictLen regex must reject "/Length 123 0 R" entirely (no
    // truncated-prefix match): craft a stream whose dict uses an
    // indirect length and whose data would be mis-trimmed by a
    // prefix match of 12
    import spark.implicits._
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val body = "BT /F1 12 Tf 72 712 Td (twelve chars plus more text) " +
      "Tj ET\n"
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(iso))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n" +
      "endobj\n")
    w(s"4 0 obj\n<< /Length 123 0 R >>\nstream\n")
    w(body)
    w("endstream\nendobj\n")
    w(s"123 0 obj\n${body.length}\nendobj\n")
    val xref = out.size()
    w("xref\n0 5\n")
    w(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    val r = Seq(out.toByteArray).toDF("p")
      .select(PdfOps.pdfText(col("p"))).head()
    assert(r.getString(0) == "twelve chars plus more text")
  }
}
