package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Common Crawl CDXJ index parsing — the lookup layer next to WARC:
  * one line per capture, `urlkey timestamp {json}` (CDXJ as served by
  * the CC index servers), where urlkey is the SURT form of the URL and
  * the JSON block carries url/mime/status/digest/length/offset/
  * filename pointing into the WARC files. Parsing the index instead of
  * scanning WARCs is how 100 TB crawls are subset: filter on
  * status/mime/url here (a few % of the data), then range-read only
  * the matching WARC offsets.
  *
  * Pure Column algebra (substring_index + from_json + parse_url) — no
  * UDF; the q_cdx oracle checks every parsed field and the
  * SURT-key contract against closed-form construction.
  */
object CdxOps {

  /** JSON block schema of a CDXJ line (all values are strings in the
    * CC index format; cast downstream as needed). */
  val cdxJsonSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("mime", StringType),
    StructField("status", StringType),
    StructField("digest", StringType),
    StructField("length", StringType),
    StructField("offset", StringType),
    StructField("filename", StringType)))

  /** Parse one CDXJ line into a struct (urlkey, timestamp, url, mime,
    * status, digest, length, offset, filename). Malformed JSON yields
    * null fields (from_json semantics) — filter on
    * `parsed.url IS NULL` to quarantine. */
  def parseCdxj(line: Column): Column = {
    val urlkey = substring_index(line, " ", 1)
    val ts = substring_index(substring_index(line, " ", 2), " ", -1)
    val js = line.substr(
      length(substring_index(line, " ", 2)) + 2, length(line))
    val j = from_json(js, cdxJsonSchema)
    struct(
      urlkey.as("urlkey"), ts.as("timestamp"),
      j.getField("url").as("url"), j.getField("mime").as("mime"),
      j.getField("status").cast("int").as("status"),
      j.getField("digest").as("digest"),
      j.getField("length").cast("long").as("length"),
      j.getField("offset").cast("long").as("offset"),
      j.getField("filename").as("filename"))
  }

  /** SURT url key (the subset Common Crawl uses for `urlkey`): host
    * lowercased, leading `www.` dropped, dot-segments reversed and
    * comma-joined, then `)` + path. Query strings and fragments are
    * not included in this subset (CC sorts query params into the key;
    * supply pre-canonicalized URLs — see `UrlOps.normalizeUrl` — if
    * you need query-bearing keys). */
  def surtKey(url: Column): Column = {
    val host0 = lower(parse_url(url, lit("HOST")))
    val host = regexp_replace(host0, "^www\\.", "")
    val rev = array_join(reverse(split(host, "\\.")), ",")
    val path = coalesce(parse_url(url, lit("PATH")), lit(""))
    concat(rev, lit(")"), path)
  }
}
