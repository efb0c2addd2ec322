package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** HTML boilerplate removal — the corpus-cleaning step between raw
  * crawl extraction and quality filtering: navigation bars, footers,
  * and link farms out; article text in. Simplified jusText/
  * trafilatura heuristic (public algorithm family): segment the page
  * into block-level elements, score each block by text length and
  * link density, keep the content blocks.
  *
  * Per-row string work only — no shuffle; scales with the scan like
  * the rest of the text-cleaning family. */
object BoilerplateOps {

  /** One scored page block. `link_density` = chars inside `<a>` /
    * total chars; `is_content` applies the (minChars, maxLinkDensity)
    * rule. */
  case class HtmlBlock(idx: Int, text: String, n_chars: Int,
                       link_chars: Int, link_density: Double,
                       is_content: Boolean)

  private val BlockTag =
    "(?i)</?(p|div|li|h[1-6]|td|tr|table|ul|ol|article|section|" +
      "header|footer|nav|aside|blockquote|br)[^>]*>"
  // compiled once: these run per document row at corpus scale
  private val BlockRe = java.util.regex.Pattern.compile(BlockTag)
  private val AnchorRe =
    java.util.regex.Pattern.compile("(?is)<a[^>]*>(.*?)</a>")

  private def stripTags(s: String): String = HtmlText.stripTags(s)

  private[graft] def blocks(html: String, minChars: Int,
                            maxLinkDensity: Double): Seq[HtmlBlock] = {
    val clean = HtmlText.dropScriptStyle(html)
    val segmented = BlockRe.matcher(clean).replaceAll("\u0001$0")
    val out = new ArrayBuffer[HtmlBlock]()
    var idx = 0
    segmented.split('\u0001').foreach { seg =>
      val text = stripTags(seg)
      if (text.nonEmpty) {
        // link chars: text inside <a ...>...</a> within this segment
        var link = 0
        val m = AnchorRe.matcher(seg)
        while (m.find()) link += stripTags(m.group(1)).length
        val ld = if (text.isEmpty) 0.0 else link.toDouble / text.length
        out += HtmlBlock(idx, text, text.length, link,
          ld, text.length >= minChars && ld <= maxLinkDensity)
        idx += 1
      }
    }
    out.toSeq
  }

  /** All blocks with scores — for tuning/inspection. */
  def htmlBlocks(html: Column, minChars: Int = 30,
                 maxLinkDensity: Double = 0.33): Column = {
    val f = udf { (s: String) =>
      if (s == null) null else blocks(s, minChars, maxLinkDensity)
    }
    f(html)
  }

  /** The cleaned page: content blocks only, newline-joined. */
  def extractContent(html: Column, minChars: Int = 30,
                     maxLinkDensity: Double = 0.33): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else blocks(s, minChars, maxLinkDensity)
        .filter(_.is_content).map(_.text).mkString("\n")
    }
    f(html)
  }

  /** Deterministic page fixture: a nav bar of links, k = 1 + id%4
    * content paragraphs (`para <id> word w0 … w9` — always ≥ 30
    * chars, zero links), one short teaser (< 30 chars, dropped by
    * length), and a footer of links (dropped by link density). The
    * kept text is exactly the k paragraphs — closed form for the
    * oracle. */
  def syntheticHtml(id: Column): Column = {
    val i = id.cast("long")
    val k = (i % 4) + 1
    val para = (kk: Column) => concat(lit("<p>para "), i.cast("string"),
      lit(" item "), kk.cast("string"),
      lit(" alpha beta gamma delta epsilon zeta</p>"))
    concat(
      lit("<html><head><script>nav()</script></head><body>" +
        "<nav><a href=x>Home</a> <a href=y>About</a> " +
        "<a href=z>Contact</a></nav>"),
      concat_ws("", transform(sequence(lit(0), k - 1), kk => para(kk))),
      lit("<p>short.</p>" +
        "<footer><a href=p>Privacy</a> <a href=t>Terms</a></footer>" +
        "</body></html>"))
  }
}
