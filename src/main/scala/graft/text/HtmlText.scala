package graft.text

/** Shared HTML→text primitives for the crawl extractors
  * ([[graft.sources.WarcOps]], [[BoilerplateOps]]) — one copy so the
  * entity-decode order stays right everywhere.
  *
  * `&amp;` MUST decode LAST: it is the escape for the escape
  * character, and decoding it first turns displayed text like
  * `&amp;lt;b&amp;gt;` (an escaped `&lt;b&gt;` the page wanted to
  * SHOW) into a phantom `<b>` tag's content. */
private[graft] object HtmlText {

  def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&amp;", "&")

  /** Drop tags, decode entities, collapse whitespace. The caller is
    * responsible for removing script/style blocks first. */
  def stripTags(s: String): String =
    decodeEntities(s.replaceAll("(?s)<[^>]*>", " "))
      .replaceAll("\\s+", " ").trim

  def dropScriptStyle(s: String): String =
    s.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
      .replaceAll("(?is)<!--.*?-->", " ")
}
