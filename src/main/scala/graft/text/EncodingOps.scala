package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mojibake detection and repair — the ftfy-style "fix text for you"
  * step of web-corpus cleaning. The dominant corruption in crawled
  * text is UTF-8 bytes decoded as Windows-1252/Latin-1 ("Ã©"
  * for "é", "â€™" for "’"); the repair is the
  * exact inverse: re-encode the corrupted string's code points as the
  * single bytes they came from, then decode those bytes as UTF-8.
  *
  * Implementation is pure Column algebra over Spark's builtin
  * encode/decode (Latin-1 is in Spark's always-allowed charset set) —
  * the only subtlety is the CP1252 0x80–0x9F block: those bytes render
  * as printable glyphs (euro sign, curly quotes, dashes, ellipsis…),
  * not the C1 controls Latin-1 maps there, so a `translate` bridges
  * the 27 printable specials to their C1 code points before the
  * Latin-1 encode and the repair stays byte-exact for real-world
  * (CP1252-displayed) mojibake too.
  *
  * Repair is guarded twice: it only fires when the mojibake signature
  * is present AND every char is Latin-1/CP1252-encodable (so the
  * encode is lossless), and it falls back to the input when the
  * decode produces U+FFFD (the bytes were not valid UTF-8 after all).
  * Clean text — including clean text that legitimately contains
  * "Ã" — passes through unchanged unless it matches the
  * signature.
  *
  * Scale shape: row-local projection, no shuffle, no UDF.
  */
object EncodingOps {

  /** The 27 printable CP1252 specials of the 0x80–0x9F block, in byte
    * order (the five undefined slots 0x81/0x8D/0x8F/0x90/0x9D are
    * skipped). */
  private val cp1252Specials: String =
    Seq(0x20ac, 0x201a, 0x0192, 0x201e, 0x2026, 0x2020, 0x2021,
      0x02c6, 0x2030, 0x0160, 0x2039, 0x0152, 0x017d, 0x2018,
      0x2019, 0x201c, 0x201d, 0x2022, 0x2013, 0x2014, 0x02dc,
      0x2122, 0x0161, 0x203a, 0x0153, 0x017e, 0x0178)
      .map(_.toChar).mkString

  /** …and the C1 control chars Latin-1 puts at the same byte values. */
  private val c1Controls: String =
    (Seq(0x80) ++ (0x82 to 0x8c) ++ Seq(0x8e) ++ (0x91 to 0x9c) ++
      Seq(0x9e, 0x9f)).map(_.toChar).mkString

  /** Count of mojibake signature matches: a UTF-8 lead-byte glyph
    * followed by a continuation-byte glyph. Zero on clean text. */
  def mojibakeScore(text: Column): Column =
    regexp_count(text, lit(
      // any UTF-8 lead-byte glyph (2-byte C2-DF, 3-byte E0-EF,
      // 4-byte F0-F4 all render in U+00C2..U+00F4) followed by a
      // continuation-byte glyph (C1 control, U+00A0-BF, or a CP1252
      // special) -- covers e/accents, curly quotes, CJK and emoji
      // mojibake alike
      "[" + 0xc2.toChar + "-" + 0xf4.toChar + "][" +
        0x80.toChar + "-" + 0xbf.toChar + cp1252Specials + "]"))

  /** True when every char can round-trip through Latin-1 + the CP1252
    * specials — the precondition for a lossless repair encode. */
  def latin1Encodable(text: Column): Column =
    text.rlike("^[\\x00-\\xff" + cp1252Specials + "]*$")

  /** Reinterpret `text`'s chars as the bytes of a UTF-8 string and
    * decode them (unconditionally — callers want [[fixMojibake]]). */
  def reinterpretAsUtf8(text: Column): Column =
    decode(encode(translate(text, cp1252Specials, c1Controls),
      "ISO-8859-1"), "UTF-8")

  /** The inverse corruption, for tests/fixtures: render `text`'s
    * UTF-8 bytes as the CP1252 glyph string a mis-decoding viewer
    * would show. */
  def corruptAsCp1252(text: Column): Column =
    translate(decode(encode(text, "UTF-8"), "ISO-8859-1"),
      c1Controls, cp1252Specials)

  /** Repair UTF-8-as-CP1252 mojibake; clean or unrepairable text
    * passes through unchanged. */
  def fixMojibake(text: Column): Column = {
    val candidate = reinterpretAsUtf8(text)
    when(mojibakeScore(text) > 0 && latin1Encodable(text) &&
        !candidate.contains("�"), candidate)
      .otherwise(text)
  }
}
