package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Sitemap parsing (sitemaps.org protocol, public spec) — the crawl
  * discovery complement to [[RobotsOps]] (robots.txt advertises
  * sitemap URLs; sitemaps list the pages). Regex block extraction,
  * the standard approach for this rigidly-shaped format (documented
  * non-goals: XML namespaces, entity edge cases beyond the five
  * standard ones, gzip — pair with `WarcOps.gunzipAll`-style
  * handling upstream if needed). Per-row work; explode the result. */
object SitemapOps {

  /** One `<url>` entry; absent optional fields are null / NaN-free
    * sentinels (priority −1, the protocol default display). */
  case class SitemapUrl(loc: String, lastmod: String, priority: Double)

  private val UrlBlock =
    java.util.regex.Pattern.compile("(?is)<url>(.*?)</url>")
  private val SitemapBlock =
    java.util.regex.Pattern.compile("(?is)<sitemap>(.*?)</sitemap>")
  private val LocRe =
    java.util.regex.Pattern.compile("(?is)<loc>(.*?)</loc>")
  private val LastmodRe =
    java.util.regex.Pattern.compile("(?is)<lastmod>(.*?)</lastmod>")
  private val PriorityRe =
    java.util.regex.Pattern.compile("(?is)<priority>(.*?)</priority>")

  private def decode(s: String): String =
    graft.text.HtmlText.decodeEntities(s.trim)

  private def group1(p: java.util.regex.Pattern,
                     s: String): Option[String] = {
    val m = p.matcher(s)
    if (m.find()) Some(decode(m.group(1))) else None
  }

  private[graft] def parseUrlSet(xml: String): Seq[SitemapUrl] = {
    val out = new ArrayBuffer[SitemapUrl]()
    val m = UrlBlock.matcher(xml)
    while (m.find()) {
      val block = m.group(1)
      group1(LocRe, block).foreach { loc =>
        out += SitemapUrl(loc,
          group1(LastmodRe, block).orNull,
          group1(PriorityRe, block).flatMap(_.toDoubleOption)
            .getOrElse(-1.0))
      }
    }
    out.toSeq
  }

  /** `<urlset>` entries of one sitemap document. */
  def sitemapUrls(xml: Column): Column = {
    val f = udf { (s: String) => if (s == null) null else parseUrlSet(s) }
    f(xml)
  }

  /** Child sitemap locations of a `<sitemapindex>` document — crawl
    * these recursively (driver- or job-level loop, one fetch each). */
  def sitemapIndex(xml: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else {
        val out = new ArrayBuffer[String]()
        val m = SitemapBlock.matcher(s)
        while (m.find()) group1(LocRe, m.group(1)).foreach(out += _)
        out.toSeq
      }
    }
    f(xml)
  }

  /** Deterministic sitemap fixture: n = 2 + id%4 urls;
    * loc = `https://ex<id%9>.com/p<k>` (with an entity-escaped query
    * `?a=1&amp;b=2` on k=0), lastmod `2026-01-0<1+(id+k)%9>` on even
    * k, priority `(5 + (id+k)%5)/10` on odd k — all id arithmetic. */
  def syntheticSitemap(id: Column): Column = {
    val i = id.cast("long")
    val n = (i % 4) + 2
    val entry = (k: Column) => concat(
      lit("<url><loc>https://ex"), (i % 9).cast("string"),
      lit(".com/p"), k.cast("string"),
      when(k === 0, "?a=1&amp;b=2").otherwise(""),
      lit("</loc>"),
      when(k % 2 === 0,
        concat(lit("<lastmod>2026-01-0"),
          ((i + k) % 9 + 1).cast("string"), lit("</lastmod>")))
        .otherwise(""),
      when(k % 2 === 1,
        concat(lit("<priority>0."),
          ((i + k) % 5 + 5).cast("string"), lit("</priority>")))
        .otherwise(""),
      lit("</url>"))
    concat(lit("<?xml version=\"1.0\"?><urlset>"),
      concat_ws("", transform(sequence(lit(0), n - 1), k => entry(k))),
      lit("</urlset>"))
  }
}
