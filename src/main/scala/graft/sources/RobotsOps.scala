package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** robots.txt parsing + URL matching per the Robots Exclusion
  * Protocol (RFC 9309, public spec) — the crawl-politeness filter
  * that sits next to URL canonicalization in a crawl pipeline.
  *
  * Semantics implemented: user-agent groups (case-insensitive
  * substring product token match; `*` fallback; when a specific-agent
  * group exists, ONLY it applies), Allow/Disallow with `*` wildcards
  * and `$` end anchors, longest-pattern-wins precedence with Allow
  * winning ties, Crawl-delay, and Sitemap lines (which are
  * group-independent). Unmatched paths are allowed (the protocol is
  * opt-out). Per-row string work — scales with the scan. */
object RobotsOps {

  private[graft] case class Rule(allow: Boolean, pattern: String)
  private[graft] case class Group(agents: Seq[String], rules: Seq[Rule],
                                  crawlDelay: Option[Double])
  private[graft] case class Robots(groups: Seq[Group],
                                   sitemaps: Seq[String])

  private[graft] def parseRobots(txt: String): Robots = {
    val groups = new ArrayBuffer[Group]()
    val sitemaps = new ArrayBuffer[String]()
    var agents = new ArrayBuffer[String]()
    var rules = new ArrayBuffer[Rule]()
    var delay: Option[Double] = None
    var inGroupHeader = false // consecutive User-agent lines share a group
    def flush(): Unit = {
      if (agents.nonEmpty)
        groups += Group(agents.toSeq, rules.toSeq, delay)
      agents = new ArrayBuffer[String]()
      rules = new ArrayBuffer[Rule]()
      delay = None
    }
    txt.split("\n").foreach { raw =>
      val line = raw.split("#")(0).trim // strip comments
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            if (!inGroupHeader) flush()
            agents += value.toLowerCase
            inGroupHeader = true
          case "allow" =>
            rules += Rule(allow = true, value); inGroupHeader = false
          case "disallow" =>
            rules += Rule(allow = false, value); inGroupHeader = false
          case "crawl-delay" =>
            delay = value.toDoubleOption; inGroupHeader = false
          case "sitemap" =>
            sitemaps += value; inGroupHeader = false
          case _ => inGroupHeader = false
        }
      }
    }
    flush()
    Robots(groups.toSeq, sitemaps.toSeq)
  }

  /** RFC 9309 rule match: prefix semantics with `*` wildcards and an
    * optional `$` end anchor. Empty pattern (bare `Disallow:`)
    * matches nothing — it means "allow everything". */
  private[graft] def ruleMatches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val rx = new StringBuilder("^")
    p.foreach {
      case '*' => rx.append(".*")
      case ch if "\\.[]{}()+-?^$|".indexOf(ch) >= 0 =>
        rx.append('\\').append(ch)
      case ch => rx.append(ch)
    }
    if (anchored) rx.append("$")
    // ^-anchored find() = prefix match; trailing $ upgrades it to a
    // full match
    java.util.regex.Pattern.compile(rx.toString).matcher(path).find()
  }

  /** Group selection per RFC 9309: the group whose agent token is the
    * LONGEST substring of `agent` wins; `*` only applies when no
    * specific group matches. */
  private[graft] def selectGroup(r: Robots,
                                 agent: String): Option[Group] = {
    val a = agent.toLowerCase
    val specific = r.groups
      .flatMap(g => g.agents.filter(t => t != "*" && a.contains(t))
        .map(t => (t.length, g)))
    if (specific.nonEmpty) Some(specific.maxBy(_._1)._2)
    else r.groups.find(_.agents.contains("*"))
  }

  /** Longest-pattern-wins; Allow wins ties; no match → allowed. */
  private[graft] def allowed(r: Robots, agent: String,
                             path: String): Boolean =
    selectGroup(r, agent) match {
      case None => true
      case Some(g) =>
        val hits = g.rules.filter(ru => ruleMatches(ru.pattern, path))
        if (hits.isEmpty) true
        else {
          val best = hits.map(ru => (ru.pattern.length, ru.allow))
            .sortBy { case (len, allow) => (-len, !allow) }
          best.head._2
        }
    }

  /** Column: is `path` fetchable for `agent` under `robotsTxt`? */
  def robotsAllowed(robotsTxt: Column, path: Column,
                    agent: String): Column = {
    val f = udf { (txt: String, p: String) =>
      if (txt == null || p == null) null
      else java.lang.Boolean.valueOf(allowed(parseRobots(txt), agent, p))
    }
    f(robotsTxt, path)
  }

  /** Column: (n_groups, n_sitemaps, crawl_delay for `agent`). */
  case class RobotsMeta(n_groups: Int, n_sitemaps: Int,
                        crawl_delay: Double)

  def robotsMeta(robotsTxt: Column, agent: String): Column = {
    val f = udf { (txt: String) =>
      if (txt == null) null
      else {
        val r = parseRobots(txt)
        RobotsMeta(r.groups.length, r.sitemaps.length,
          selectGroup(r, agent).flatMap(_.crawlDelay).getOrElse(-1.0))
      }
    }
    f(robotsTxt)
  }

  /** Deterministic robots.txt fixture: a `*` group disallowing
    * `/private<id%5>/` but allowing `/private<id%5>/pub` (longest
    * match), crawl-delay 1 + id%4, 1 + id%2 sitemap lines, and — for
    * id ≡ 0 (mod 3) — a graftbot-specific group disallowing `/page`
    * (which then REPLACES the `*` group for agent graftbot). */
  def syntheticRobots(id: Column): Column = {
    val i = id.cast("long")
    val m = (i % 5).cast("string")
    val base = concat(
      lit("# synthetic robots\nUser-agent: *\nDisallow: /private"), m,
      lit("/\nAllow: /private"), m,
      lit("/pub\nCrawl-delay: "), (lit(1) + i % 4).cast("string"),
      lit("\nSitemap: https://ex.com/s1.xml\n"),
      when(i % 2 === 1, "Sitemap: https://ex.com/s2.xml\n").otherwise(""))
    concat(base,
      when(i % 3 === 0,
        lit("User-agent: graftbot\nDisallow: /page\n")).otherwise(""))
  }
}
