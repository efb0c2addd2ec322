package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Named document-quality rule sets from the published pretraining-data
  * pipelines: the Gopher/MassiveWeb filters (Rae et al. 2021, Appendix
  * A1.1) and the C4 cleaning rules (Raffel et al. 2020, §2.2). The
  * reference engine ships the generic signals (`qualityFeatures`,
  * `repetitionSignals`); these are the *decision* layers used verbatim
  * by Gopher/MassiveText, C4, and their descendants (RefinedWeb,
  * Dolma), exposed as pure Column algebra so they run inside
  * whole-stage codegen, push into the scan, and are replayable
  * verbatim by any SQL engine (every regex is RE2-portable).
  *
  * Scale shape: both rule sets are row-local projections — no shuffle,
  * no UDF, no state. At 100 TB they cost one codegen'd pass over the
  * scan and compose with any downstream filter pushdown.
  */
object FilterRules {

  /** Gopher's 8 required stopwords (Rae et al. 2021 A1.1: "the, be,
    * to, of, and, that, have, with"). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def words(text: Column): Column =
    filter(split(trim(text), "\\s+"), w => w =!= "")

  private def lines(text: Column): Column =
    filter(split(text, "\n"), l => trim(l) =!= "")

  /** The Gopher quality filter: 7 rules, each reported as its
    * underlying measurement plus a boolean, and the conjunction
    * `pass`. Thresholds default to the paper's (word count 50..100k,
    * mean word length 3..10, symbol ratio ≤ 0.1, bullet lines ≤ 90%,
    * ellipsis lines ≤ 30%, alphabetic words ≥ 80%, ≥ 2 of the 8
    * required stopwords).
    *
    * Measurement contract (pinned by the q_gopher_rules oracle):
    * words are `\s+` tokens of the trimmed text with empties dropped;
    * mean word length = non-whitespace chars / words; symbols are `#`,
    * `...`, `…` counted as non-overlapping regex matches; lines are
    * `\n` splits with blank lines dropped; a bullet line starts with
    * `-`, `*`, `•`, `‣` or `▪` after trim; an ellipsis line ends with
    * `...` or `…` after trim; an alphabetic word contains ≥ 1 ASCII
    * letter; stopword presence is tested against single-space
    * normalized padded text (multi-byte-safe, word-boundary exact). */
  def gopherRules(text: Column,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanWordLen: Double = 3.0,
                  maxMeanWordLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1,
                  maxBulletFrac: Double = 0.9,
                  maxEllipsisFrac: Double = 0.3,
                  minAlphaFrac: Double = 0.8,
                  minStopwords: Int = 2): Column = {
    val toks = words(text)
    val nW = size(toks).cast("double")
    val nonWs = length(regexp_replace(text, "\\s", "")).cast("double")
    val mwl = when(nW > 0, nonWs / nW).otherwise(lit(0.0))
    val nSym = regexp_count(text, lit("#|\\.\\.\\.|…")).cast("double")
    val symRatio = when(nW > 0, nSym / nW).otherwise(lit(0.0))
    val ls = lines(text)
    val nL = size(ls).cast("double")
    val nBullet = size(filter(ls,
      l => trim(l).rlike("^[-*•‣▪]"))).cast("double")
    val nEllip = size(filter(ls,
      l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double")
    val bulletFrac = when(nL > 0, nBullet / nL).otherwise(lit(0.0))
    val ellipFrac = when(nL > 0, nEllip / nL).otherwise(lit(0.0))
    val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]")))
      .cast("double")
    val alphaFrac = when(nW > 0, nAlpha / nW).otherwise(lit(0.0))
    val padded = concat(lit(" "),
      regexp_replace(lower(text), "\\s+", " "), lit(" "))
    val nStop = gopherStopwords.map(w =>
      when(padded.contains(s" $w "), 1).otherwise(0))
      .reduce(_ + _)
    val rWordCount = nW >= minWords && nW <= maxWords
    val rMwl = mwl >= minMeanWordLen && mwl <= maxMeanWordLen
    val rSym = symRatio <= maxSymbolRatio
    val rBullet = bulletFrac <= maxBulletFrac
    val rEllip = ellipFrac <= maxEllipsisFrac
    val rAlpha = alphaFrac >= minAlphaFrac
    val rStop = nStop >= minStopwords
    struct(
      nW.cast("long").as("n_words"),
      mwl.as("mean_word_len"),
      symRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_frac"),
      ellipFrac.as("ellipsis_frac"),
      alphaFrac.as("alpha_frac"),
      nStop.as("n_stopwords"),
      rWordCount.as("r_word_count"),
      rMwl.as("r_mean_word_len"),
      rSym.as("r_symbol_ratio"),
      rBullet.as("r_bullet_lines"),
      rEllip.as("r_ellipsis_lines"),
      rAlpha.as("r_alpha_words"),
      rStop.as("r_stopwords"),
      (rWordCount && rMwl && rSym && rBullet && rEllip && rAlpha &&
        rStop).as("pass"))
  }

  /** The C4 cleaning rules: line-level retention (line ends in a
    * terminal punctuation mark `.!?"`, has ≥ `minLineWords` words, and
    * does not mention "javascript"), then page-level rejection (fewer
    * than `minSentences` sentences in the cleaned text, "lorem ipsum",
    * a `{` curly brace, or any caller-supplied blocked word). Returns
    * the cleaned text (kept lines re-joined with `\n`, null when no
    * line survives) plus counters/flags and the page-level `keep`.
    *
    * Sentences are counted as non-overlapping `[.!?]` matches in the
    * cleaned text — C4's sentence threshold at regex resolution.
    * Blocked-word matching is word-boundary exact on single-space
    * normalized lowercase text, same contract as the Gopher stopword
    * test. `badWords` defaults to empty (the paper uses an external
    * blocklist; supply your own). */
  def c4Rules(text: Column, minLineWords: Int = 3,
              minSentences: Int = 5,
              badWords: Seq[String] = Nil): Column = {
    val keptArr = filter(split(text, "\n"), l =>
      trim(l).rlike("[.!?\"]$") &&
        size(filter(split(trim(l), "\\s+"), w => w =!= "")) >=
          minLineWords &&
        !lower(l).contains("javascript"))
    val nKept = size(keptArr)
    val cleaned = when(nKept > 0, array_join(keptArr, "\n"))
    val nSent = when(nKept > 0,
      regexp_count(cleaned, lit("[.!?]"))).otherwise(lit(0))
    val padded = concat(lit(" "),
      regexp_replace(lower(text), "\\s+", " "), lit(" "))
    val hasLorem = lower(text).contains("lorem ipsum")
    val hasBrace = text.contains("{")
    // word-boundary-exact blocklist test on the padded text. Small
    // lists compile to a contains-chain (codegen'd, branch-predicted);
    // past 8 terms switch to ONE Aho-Corasick pass — identical
    // semantics (each pattern is the padded " word "), O(n) instead
    // of O(n·P) for real blocklists (thousands of terms).
    val hasBad =
      if (badWords.isEmpty) lit(false)
      else if (badWords.length <= 8)
        badWords.map(w => padded.contains(s" ${w.toLowerCase} "))
          .reduce(_ || _)
      else
        size(org.apache.spark.sql.graft.NativeFunctions
          .blocklistMatchesNative(padded,
            badWords.map(w => s" ${w.toLowerCase} "))) > 0
    struct(
      size(split(text, "\n")).as("n_lines"),
      nKept.as("n_kept_lines"),
      nSent.as("n_sentences"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      hasBad.as("has_bad_word"),
      cleaned.as("cleaned"),
      (nSent >= minSentences && !hasLorem && !hasBrace && !hasBad)
        .as("keep"))
  }
}
