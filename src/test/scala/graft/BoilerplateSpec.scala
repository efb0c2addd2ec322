package graft

import graft.text.BoilerplateOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boilerplate removal: nav/footer/link-farm blocks drop, article
  * text survives, scores are exact. */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("synthetic page keeps exactly the content paragraphs") {
    import spark.implicits._
    val rows = spark.range(0, 12)
      .select(col("id"), BoilerplateOps.extractContent(
        BoilerplateOps.syntheticHtml(col("id"))).as("c"))
      .collect()
    rows.foreach { r =>
      val i = r.getLong(0)
      val k = (i % 4 + 1).toInt
      val expect = (0 until k).map(kk =>
        s"para $i item $kk alpha beta gamma delta epsilon zeta")
        .mkString("\n")
      assert(r.getString(1) == expect, s"id=$i")
    }
  }

  test("block scores: link density and length rules") {
    val html = "<div><a href=x>Only Links Here Now</a></div>" +
      "<p>This paragraph has plenty of genuine article text in it.</p>" +
      "<p>tiny</p>"
    val bs = BoilerplateOps.blocks(html, 30, 0.33)
    assert(bs.length == 3)
    assert(!bs(0).is_content && bs(0).link_density > 0.9)
    assert(bs(1).is_content && bs(1).link_chars == 0)
    assert(!bs(2).is_content && bs(2).n_chars == 4)
  }

  test("script/style/comments never leak into blocks") {
    val html = "<script>var boilerplate = 'not text';</script>" +
      "<!-- hidden --><style>.x{}</style>" +
      "<p>The only real sentence on this entire page right here.</p>"
    val bs = BoilerplateOps.blocks(html, 30, 0.33)
    assert(bs.map(_.text).mkString(" ").contains("only real sentence"))
    assert(!bs.exists(_.text.contains("boilerplate")))
    assert(!bs.exists(_.text.contains("hidden")))
  }

  test("htmlBlocks column returns scored structs; null passes through") {
    import spark.implicits._
    val r = Seq("<p>Some long enough genuine content sentence here.</p>",
        null.asInstanceOf[String])
      .toDF("h")
      .select(BoilerplateOps.htmlBlocks(col("h")).as("b")).collect()
    assert(r(0).getSeq[Row](0).nonEmpty)
    assert(r(1).isNullAt(0))
  }
}
