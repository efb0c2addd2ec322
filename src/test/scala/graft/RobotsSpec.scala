package graft

import graft.sources.RobotsOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 robots semantics: group selection, longest-match
  * precedence, wildcards/anchors, and the synthetic fixture's
  * closed-form allowed() truth table. */
class RobotsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private val txt =
    """User-agent: *
      |Disallow: /private/
      |Allow: /private/pub
      |Crawl-delay: 2
      |Sitemap: https://e.com/a.xml
      |
      |User-agent: megabot
      |User-agent: gigabot
      |Disallow: /only-mega
      |
      |User-agent: wild
      |Disallow: /*.pdf$
      |Disallow: /tmp*x
      |""".stripMargin

  private def ok(agent: String, path: String): Boolean = {
    val r = RobotsOps.parseRobots(txt)
    RobotsOps.allowed(r, agent, path)
  }

  test("longest-match precedence, allow wins") {
    assert(ok("anybot", "/open"))
    assert(!ok("anybot", "/private/doc"))
    assert(ok("anybot", "/private/pub/x")) // Allow is longer
  }

  test("specific group replaces the * group entirely") {
    assert(!ok("MegaBot/1.0", "/only-mega"))
    // megabot group has no /private rule, so /private is ALLOWED
    assert(ok("MegaBot/1.0", "/private/doc"))
    // shared group: second agent token hits the same rules
    assert(!ok("gigabot", "/only-mega"))
  }

  test("wildcards and end anchors") {
    assert(!ok("wildbot", "/docs/file.pdf"))
    assert(ok("wildbot", "/docs/file.pdf?x=1")) // $ anchor: not an end
    assert(!ok("wildbot", "/tmp123x"))
    assert(ok("wildbot", "/tmp123y"))
  }

  test("crawl-delay and sitemaps via columns") {
    import spark.implicits._
    val r = Seq(txt).toDF("t")
      .select(RobotsOps.robotsMeta(col("t"), "anybot").as("m"))
      .collect()(0).getStruct(0)
    assert(r.getInt(0) == 3 && r.getInt(1) == 1 &&
      r.getDouble(2) == 2.0)
  }

  test("syntheticRobots truth table matches its closed form") {
    import spark.implicits._
    val rows = spark.range(0, 60)
      .select(col("id"),
        RobotsOps.syntheticRobots(col("id")).as("r"))
      .select(col("id"),
        RobotsOps.robotsAllowed(col("r"),
          concat(lit("/page"), (col("id") % 9).cast("string")),
          "graftbot").as("page_ok"),
        RobotsOps.robotsAllowed(col("r"),
          concat(lit("/private"), (col("id") % 5).cast("string"),
            lit("/doc")), "graftbot").as("priv_ok"),
        RobotsOps.robotsAllowed(col("r"),
          concat(lit("/private"), (col("id") % 5).cast("string"),
            lit("/pub/x")), "graftbot").as("pub_ok"))
      .collect()
    rows.foreach { r =>
      val i = r.getLong(0)
      val hasBotGroup = i % 3 == 0
      // bot group present: only ITS rules apply (blocks /page…)
      assert(r.getBoolean(1) == !hasBotGroup, s"page id=$i")
      assert(r.getBoolean(2) == hasBotGroup, s"priv id=$i")
      assert(r.getBoolean(3), s"pub id=$i") // allowed either way
    }
  }
}
