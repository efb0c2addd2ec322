package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Writing-script detection — the routing step before language-ID in
  * a multilingual corpus pipeline (stopword language-ID only makes
  * sense within a script; CJK/Arabic/Cyrillic text should route to
  * their own tokenizers first). Counts codepoints by
  * `Character.UnicodeScript` (JDK Unicode tables, no library) and
  * reports the dominant script with its ratio. Per-row work only. */
object ScriptOps {

  /** Dominant script over the LETTER codepoints (digits, punctuation
    * and whitespace are script-neutral and excluded from the ratio);
    * `script` is the JDK UnicodeScript name (LATIN, CYRILLIC, HAN,
    * ARABIC, …), or "NONE" for letterless text. */
  case class ScriptProfile(script: String, ratio: Double,
                           n_letters: Int, n_scripts: Int)

  def scriptProfile(text: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else {
        val counts = new scala.collection.mutable.HashMap[String, Int]()
        var i = 0
        var letters = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          if (Character.isLetter(cp)) {
            val name = Character.UnicodeScript.of(cp).name
            counts.update(name, counts.getOrElse(name, 0) + 1)
            letters += 1
          }
          i += Character.charCount(cp)
        }
        if (letters == 0) ScriptProfile("NONE", 0.0, 0, 0)
        else {
          // deterministic tie-break: count desc, then name asc
          val (best, cnt) = counts.toSeq
            .minBy { case (name, c) => (-c, name) }
          ScriptProfile(best, cnt.toDouble / letters, letters,
            counts.size)
        }
      }
    }
    f(text)
  }

  /** Deterministic mixed-script fixture: a = 3 + id%5 Latin letters,
    * b = 1 + id%3 Cyrillic (а..), c = id%4 Han (一..), plus digits
    * and spaces (excluded from the ratio). Dominant script and ratio
    * are pure id arithmetic: Latin iff a > max(b, c) etc., with the
    * name-ascending tie-break (CYRILLIC < HAN < LATIN). */
  def syntheticScriptText(id: Column): Column = {
    val i = id.cast("long")
    val a = (i % 5) + 3
    val b = (i % 3) + 1
    val c = i % 4
    concat(
      lit("7 "),
      repeat(lit("x"), a.cast("int")), lit(" "),
      repeat(lit("а"), b.cast("int")), lit(" "),
      repeat(lit("一"), c.cast("int")),
      lit(" 42"))
  }
}
