package graft

import graft.sources.SitemapOps
import graft.text.ScriptOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Script detection + sitemap parsing hand cases and fixture
  * round-trips. */
class ScriptSitemapSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("scriptProfile identifies dominant scripts; neutral chars excluded") {
    import spark.implicits._
    val rows = Seq(
      ("hello world 123", "LATIN"),
      ("привет мир", "CYRILLIC"),
      ("中文处理系统", "HAN"),
      ("مرحبا بالعالم", "ARABIC"),
      ("αβγ abc αβ", "GREEK"),     // 5 greek vs 3 latin
      ("42 17 99", "NONE"),
      ("こんにちは", "HIRAGANA")
    ).toDF("text", "expect")
      .select(col("expect"), ScriptOps.scriptProfile(col("text")).as("p"))
      .collect()
    rows.foreach { r =>
      assert(r.getStruct(1).getString(0) == r.getString(0),
        s"want ${r.getString(0)}")
    }
  }

  test("syntheticScriptText dominant script matches id arithmetic") {
    import spark.implicits._
    val rows = spark.range(0, 60)
      .select(col("id"), ScriptOps.scriptProfile(
        ScriptOps.syntheticScriptText(col("id"))).as("p"))
      .collect()
    rows.foreach { r =>
      val i = r.getLong(0)
      val a = (i % 5) + 3 // latin
      val b = (i % 3) + 1 // cyrillic
      val c = i % 4       // han
      val counts = Seq(("LATIN", a), ("CYRILLIC", b), ("HAN", c))
        .filter(_._2 > 0)
      val best = counts.minBy { case (n, cnt) => (-cnt, n) }._1
      val p = r.getStruct(1)
      assert(p.getString(0) == best, s"id=$i")
      assert(p.getInt(2) == (a + b + c).toInt, s"letters id=$i")
    }
  }

  test("sitemap urlset parse: locs, entities, optional fields") {
    val xml = """<?xml version="1.0"?><urlset>
      |<url><loc> https://e.com/a?x=1&amp;y=2 </loc>
      |<lastmod>2026-02-03</lastmod><priority>0.8</priority></url>
      |<url><loc>https://e.com/b</loc></url>
      |<url><lastmod>2026-01-01</lastmod></url>
      |</urlset>""".stripMargin
    val got = SitemapOps.parseUrlSet(xml)
    assert(got.length == 2) // third entry has no <loc> -> dropped
    assert(got(0).loc == "https://e.com/a?x=1&y=2")
    assert(got(0).lastmod == "2026-02-03" && got(0).priority == 0.8)
    assert(got(1).lastmod == null && got(1).priority == -1.0)
  }

  test("sitemapindex lists child sitemaps") {
    import spark.implicits._
    val xml = "<sitemapindex><sitemap><loc>https://e.com/s1.xml</loc>" +
      "</sitemap><sitemap><loc>https://e.com/s2.xml</loc></sitemap>" +
      "</sitemapindex>"
    val got = Seq(xml).toDF("x")
      .select(SitemapOps.sitemapIndex(col("x")).as("s"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("https://e.com/s1.xml", "https://e.com/s2.xml"))
  }

  test("syntheticSitemap round-trips its id arithmetic") {
    import spark.implicits._
    val rows = spark.range(0, 30)
      .select(col("id"), explode(SitemapOps.sitemapUrls(
        SitemapOps.syntheticSitemap(col("id")))).as("u"))
      .select(col("id"), col("u.*"))
      .collect()
    rows.groupBy(_.getLong(0)).foreach { case (i, us) =>
      val n = (i % 4 + 2).toInt
      assert(us.length == n, s"id=$i count")
      us.sortBy(_.getString(1)).zipWithIndex // just check fields per k
      us.foreach { u =>
        val loc = u.getString(1)
        assert(loc.startsWith(s"https://ex${i % 9}.com/p"), s"id=$i $loc")
      }
      assert(us.count(u => u.getString(1).contains("?a=1&b=2")) == 1)
    }
  }
}
