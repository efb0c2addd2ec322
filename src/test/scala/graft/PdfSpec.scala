package graft

import graft.sources.PdfOps
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
}
