package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.FilterRules

class FilterRulesSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("gopherRules: each rule fires on its designed failure case") {
    import spark.implicits._
    val good = ("the data and results have merit to be good with " +
      "that of everything ") * 5 // 60 words, stopword-rich, clean
    val docs = Seq(
      ("good", good),
      ("short", "only four words here"),
      ("symbols", good + " " + Seq.fill(10)("###").mkString(" ")),
      ("bullets", good + "\n" + (1 to 20).map(i => s"- b$i").mkString("\n")),
      ("ellipsis", good + "\n" + (1 to 9).map(i => s"line $i...").mkString("\n")),
      ("numeric", "the of " + (1 to 60).map(_.toString).mkString(" ")),
      ("nostop", Seq.fill(60)("zzz").mkString(" ")),
      ("blank", "   "))
      .toDF("name", "t")
    val g = docs.select(col("name"),
      FilterRules.gopherRules(col("t")).as("g")).collect()
      .map(r => r.getString(0) -> r.getStruct(1)).toMap
    assert(g("good").getAs[Boolean]("pass"))
    assert(!g("short").getAs[Boolean]("r_word_count"))
    assert(!g("symbols").getAs[Boolean]("r_symbol_ratio"))
    // 20 bullet lines vs 1 text line = 0.95 > 0.9
    assert(!g("bullets").getAs[Boolean]("r_bullet_lines"))
    assert(g("good").getAs[Boolean]("r_bullet_lines"))
    // 9 of 10 lines end with ... → 0.9 > 0.3
    assert(!g("ellipsis").getAs[Boolean]("r_ellipsis_lines"))
    assert(!g("numeric").getAs[Boolean]("r_alpha_words"))
    assert(!g("nostop").getAs[Boolean]("r_stopwords"))
    assert(g("good").getAs[Int]("n_stopwords") >= 2)
    val blank = g("blank")
    assert(blank.getAs[Long]("n_words") == 0L)
    assert(blank.getAs[Double]("mean_word_len") == 0.0)
    assert(!blank.getAs[Boolean]("pass"))
  }

  test("c4Rules: line retention, javascript drop, page-level flags") {
    import spark.implicits._
    val page = Seq(
      "This line ends with a period.",
      "no terminal punctuation on this line",
      "Too few.", // 2 words — dropped by the 3-word rule
      "A javascript mention kills this line.",
      "Question lines are also sentences?",
      "Bang lines too!",
      "Quoted lines count as terminal.\"",
      "Fourth full sentence right here.").mkString("\n")
    val r = Seq(page).toDF("t")
      .select(FilterRules.c4Rules(col("t")).as("c")).head.getStruct(0)
    assert(r.getAs[Int]("n_lines") == 8)
    assert(r.getAs[Int]("n_kept_lines") == 5)
    val cleaned = r.getAs[String]("cleaned")
    assert(!cleaned.contains("javascript"))
    assert(!cleaned.contains("no terminal"))
    assert(!cleaned.contains("Too few"))
    assert(r.getAs[Int]("n_sentences") == 5)
    assert(r.getAs[Boolean]("keep"))
    // page-level rejections
    val flags = Seq(
      ("lorem", page + "\nSome Lorem Ipsum filler text here."),
      ("brace", page + "\nif (x) { return; }"),
      ("bad", page + "\nThis page contains forbiddenword content."),
      ("thin", "Only one sentence here."))
      .toDF("name", "t")
      .select(col("name"), FilterRules.c4Rules(col("t"),
        badWords = Seq("forbiddenword")).as("c")).collect()
      .map(r => r.getString(0) -> r.getStruct(1)).toMap
    assert(flags("lorem").getAs[Boolean]("has_lorem"))
    assert(!flags("lorem").getAs[Boolean]("keep"))
    assert(flags("brace").getAs[Boolean]("has_brace"))
    assert(!flags("brace").getAs[Boolean]("keep"))
    assert(flags("bad").getAs[Boolean]("has_bad_word"))
    assert(!flags("bad").getAs[Boolean]("keep"))
    assert(!flags("thin").getAs[Boolean]("keep"))
    // empty-survivor page: cleaned is null, zero sentences
    val none = Seq("no punct at all\nstill none").toDF("t")
      .select(FilterRules.c4Rules(col("t")).as("c")).head.getStruct(0)
    assert(none.isNullAt(none.fieldIndex("cleaned")))
    assert(none.getAs[Int]("n_sentences") == 0)
    assert(!none.getAs[Boolean]("keep"))
  }

  test("c4Rules blocklist: contains-chain and Aho-Corasick paths " +
    "agree word-for-word") {
    import spark.implicits._
    val small = Seq("alpha", "beta") // <= 8 terms → contains-chain
    // same effective list padded with never-matching terms to force
    // the Aho-Corasick path: results must be IDENTICAL
    val big = small ++ (1 to 9).map(i => s"zzneverzz$i")
    val docs = Seq(
      "Contains alpha here today fine.",
      "Has beta present on this line.",
      "alphabet is NOT a hit (word boundary).",
      "Clean page with five words here.",
      "ALPHA is a hit (case folded).").toDF("t")
    def hits(words: Seq[String]) = docs.select(
      FilterRules.c4Rules(col("t"), badWords = words)
        .getField("has_bad_word")).collect().map(_.getBoolean(0)).toSeq
    val chain = hits(small)
    val ac = hits(big)
    assert(chain == Seq(true, true, false, false, true))
    assert(ac == chain, s"AC path diverged: $ac vs $chain")
  }
}
