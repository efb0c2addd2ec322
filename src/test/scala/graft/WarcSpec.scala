package graft

import graft.sources.WarcOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC parsing: synthetic files round-trip field-exactly; malformed
  * framing yields partial results, never a throw. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("syntheticWarc round-trips every field") {
    import spark.implicits._
    val rows = spark.range(0, 30)
      .select(col("id"),
        explode(WarcOps.warcRecords(
          WarcOps.syntheticWarc(col("id")))).as("r"))
      .select(col("id"), col("r.*"))
      .collect()
    val byId = rows.groupBy(_.getLong(0))
    byId.foreach { case (i, rs) =>
      val nrec = (2 + i % 3).toInt
      assert(rs.length == nrec + 1, s"id=$i record count")
      val resp = rs.filter(_.getString(1) == "response")
        .sortBy(_.getString(2))
      assert(resp.length == nrec)
      resp.zipWithIndex.foreach { case (r, idx) =>
        assert(r.getString(2) == s"http://w${i % 50}.com/p$idx")
        assert(r.getInt(4) == (if (idx % 2 == 0) 200 else 404))
        assert(r.getString(5) == "text/html")
        val words = (1 + (i + idx) % 4).toInt
        val expect = (0 until words).map(_ => s"doc $i rec $idx")
          .mkString(" ")
        assert(r.getString(7) == expect, s"id=$i rec=$idx text")
      }
      val req = rs.filter(_.getString(1) == "request")
      assert(req.length == 1 && req(0).isNullAt(7)) // no text for requests
    }
  }

  test("htmlToText drops script/style whole and decodes entities") {
    assert(WarcOps.htmlToText(
      "<html><script>if(a<b){}</script><p>A &amp; B &lt;ok&gt;</p></html>")
      == "A & B <ok>")
    assert(WarcOps.htmlToText("<style>.x{color:red}</style>hi") == "hi")
  }

  test("warc.gz (one gzip member per record) parses identically") {
    import spark.implicits._
    val rows = spark.range(0, 20)
      .select(col("id"),
        WarcOps.warcRecords(WarcOps.syntheticWarc(col("id"))).as("plain"),
        WarcOps.warcRecords(WarcOps.syntheticWarcGz(col("id"))).as("gz"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Row](1) == r.getSeq[Row](2),
        s"id=${r.getLong(0)}: gz parse differs from plain")
    }
    // corrupt gzip -> empty records, not a crash
    val bad = Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3, 4, 5)
    val got = Seq(bad).toDF("w")
      .select(WarcOps.warcRecords(col("w")).as("r"))
      .collect()(0).getSeq[Row](0)
    assert(got.isEmpty)
  }

  test("truncated file yields the records before the break") {
    import spark.implicits._
    val full = spark.range(7, 8)
      .select(WarcOps.syntheticWarc(col("id")).as("w"))
      .collect()(0).getAs[Array[Byte]](0)
    // cut mid-way through the second record's body
    val cut = full.take(full.length / 2)
    val got = Seq(cut).toDF("w")
      .select(WarcOps.warcRecords(col("w")).as("r"))
      .collect()(0).getSeq[Row](0)
    assert(got.nonEmpty && got.length < 4) // partial, no throw
    // garbage input: empty result
    val none = Seq("not warc at all".getBytes).toDF("w")
      .select(WarcOps.warcRecords(col("w")).as("r"))
      .collect()(0).getSeq[Row](0)
    assert(none.isEmpty)
  }
}
