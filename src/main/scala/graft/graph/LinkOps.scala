package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hyperlink extraction + host-graph projection for crawl corpora.
  *
  * A training-data pipeline that starts from a web crawl needs the
  * link structure long before it needs the page text: the host graph
  * drives frontier prioritization (PageRank seeds), spam-neighborhood
  * filtering, and per-host crawl budgets. The reference has no crawl
  * surface at all — this extends its text-cleanup theme (e.g.
  * python/polars_ds/exprs/str2.py) to the source-selection stage.
  *
  * Everything is native Column algebra (regexp_extract_all + lambda
  * transforms + parse_url) — codegen'd, no UDF, so extraction runs
  * inside the scan's WholeStageCodegen at 100 TB.
  *
  * Resolution rules (RFC 3986 subset): absolute `http(s)://` kept
  * verbatim; protocol-relative `//h/p` takes the base scheme;
  * root-relative `/p` takes the base authority; other-scheme links
  * (`mailto:`, `javascript:`, `tel:`, `data:`, `ftp:`, …) and
  * fragment-only `#x` links are dropped; anything else is resolved
  * against the base URL's directory. Documented non-goal: `.`/`..`
  * segment normalization (crawl dedup runs [[graft.text.UrlOps]]
  * canonicalization downstream anyway).
  */
object LinkOps {

  /** Raw `href` attribute values of all `<a>` tags, quotes stripped,
    * in document order. */
  def extractHrefs(html: Column): Column = {
    val raw = regexp_extract_all(html,
      lit("(?i)<a[\\s][^>]*?href\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)"), lit(1))
    transform(raw, h => regexp_replace(h, "^[\"']|[\"']$", ""))
  }

  /** Resolve one link against an absolute base URL (null = dropped). */
  def resolveLink(base: Column, link: Column): Column = {
    val scheme = lower(parseUrl(base, "PROTOCOL"))
    val auth = parseUrl(base, "AUTHORITY")
    val basePath = coalesce(parseUrl(base, "PATH"), lit("/"))
    // directory of the base path, always ending in "/"
    val baseDir = concat(regexp_replace(basePath, "[^/]*$", ""))
    val isAbs = link.rlike("(?i)^https?://")
    val isProtoRel = link.startsWith("//")
    val isRootRel = link.startsWith("/") && !isProtoRel
    // any other scheme (mailto:, javascript:, tel:, data:, ftp:, …)
    val isOtherScheme = link.rlike("^[A-Za-z][A-Za-z0-9+.-]*:")
    val isFragment = link.startsWith("#") || (link === "")
    when(isFragment || (isOtherScheme && !isAbs), lit(null).cast("string"))
      .when(isAbs, link)
      .when(isProtoRel, concat(scheme, lit(":"), link))
      .when(isRootRel, concat(scheme, lit("://"), auth, link))
      .otherwise(concat(scheme, lit("://"), auth, baseDir, link))
  }

  /** All outgoing links of a page, resolved to absolute URLs (dropped
    * links removed, document order preserved). */
  def extractLinks(base: Column, html: Column): Column =
    filter(transform(extractHrefs(html), l => resolveLink(base, l)),
      _.isNotNull)

  /** Host-level link graph: one row per (src_host, dst_host) with the
    * raw link count. One explode + one hash aggregation — partial
    * (map-side) aggregation collapses the per-page fan-out before the
    * shuffle, so the shuffled volume is bounded by the number of
    * DISTINCT host pairs per task, not by the link count.
    *
    * `dropSelf` (default true) removes intra-host edges — the usual
    * convention for crawl-frontier ranking, where self-links carry no
    * endorsement signal. */
  def hostGraph(df: DataFrame, pageUrl: Column, html: Column,
                dropSelf: Boolean = true): DataFrame = {
    // Link extraction is the per-row cost: spread single-split inputs
    // at the DEFAULT calibration so multi-chunk stored-html sources
    // parallelize (no-op when the scan already parallelizes). r17: the
    // r16 64 KB chunk override was rolled back to the default — the
    // sf10 fires-branch A/B on the pagerank path measured the
    // aggressive chunk a consistent loss (the regex parse is cheaper
    // per byte than the r16 calibration assumed).
    val links = graft.util.Spread.byKey(df, pageUrl)
      .select(pageUrl.as("page_url"), html.as("html"))
      .select(lower(parseUrl(col("page_url"), "HOST")).as("src_host"),
        explode(extractLinks(col("page_url"), col("html"))).as("link"))
      .select(col("src_host"),
        lower(parseUrl(col("link"), "HOST")).as("dst_host"))
      .filter(col("src_host").isNotNull && col("dst_host").isNotNull)
    val filtered =
      if (dropSelf) links.filter(col("src_host") =!= col("dst_host"))
      else links
    filtered.groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"))
  }

  // parse_url is SQL-registered; call_function keeps this portable
  // across the 3.x/4.x Scala functions surface
  private def parseUrl(url: Column, part: String): Column =
    call_function("parse_url", url, lit(part))

  /** Deterministic synthetic page URL for the driver fixtures:
    * host `h<id%50>.example.com`, path `/p/<id>`. */
  def syntheticPageUrl(id: Column): Column = {
    val i = id.cast("long")
    concat(lit("http://h"), (i % 50).cast("string"),
      lit(".example.com/p/"), i.cast("string"))
  }

  /** Deterministic synthetic page body exercising every resolution
    * rule. With h = id%50 and nk = id%3+2 the page plants:
    *  - a fragment link and a mailto link (both dropped),
    *  - nk absolute links to hosts (h*7+k)%50, k = 1..nk,
    *  - one root-relative and one single-quoted relative link (both
    *    land on the page's own host),
    *  - one protocol-relative link to host (h*11+1)%50.
    * So raw hrefs = nk+5 and resolved links = nk+3, closed-form in id
    * arithmetic for the oracle. */
  def syntheticLinkHtml(id: Column): Column = {
    val i = id.cast("long")
    val h = i % 50
    val nk = i % 3 + 2
    val absLink = (k: Column) => concat(
      lit("<a href=\"http://h"), ((h * 7 + k) % 50).cast("string"),
      lit(".example.com/q/"), k.cast("string"), lit("\">out</a>"))
    concat(
      lit("<html><body><a href=\"#top\">top</a>" +
        "<a href=\"mailto:x@example.com\">mail</a>"),
      concat_ws("", transform(sequence(lit(1), nk), k => absLink(k))),
      lit("<a href=\"/local/"), (i % 4).cast("string"),
      lit("\">local</a><a href='rel"), (i % 2).cast("string"),
      lit("'>rel</a><a href=\"//h"), ((h * 11 + 1) % 50).cast("string"),
      lit(".example.com/pp\">pr</a></body></html>"))
  }
}
