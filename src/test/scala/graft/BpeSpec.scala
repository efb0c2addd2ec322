package graft

import graft.text.BpeOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer against the hand-computed classic example, and encoder
  * semantics (single non-overlapping pass per merge). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("trainer learns the textbook merges on the low/lower/lowest corpus") {
    import spark.implicits._
    // freq: low x3, lower x1, lowest x1
    val df = Seq("low low low", "lower lowest").toDF("text")
    val merges = BpeOps.trainBpe(df, col("text"), 3)
    // pairs round 1: (l,o)=5 (o,w)=5 (w,e)=2 (e,r)=1 (e,s)=1 (s,t)=1
    // tie (l,o) vs (o,w) -> lexicographic smallest (l,o)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("low", "e")))
  }

  test("encoder applies merges in order, one non-overlapping pass each") {
    val m = Seq(("l", "o"), ("lo", "w"), ("low", "e"))
    assert(BpeOps.encodeWord("lowest", m).toSeq ==
      Seq("lowe", "s", "t"))
    assert(BpeOps.encodeWord("low", m).toSeq == Seq("low"))
    assert(BpeOps.encodeWord("wool", m).toSeq == Seq("w", "o", "o", "l"))
    // adjacent identical pairs both merge in one pass
    assert(BpeOps.applyMerge(Array("a", "b", "a", "b"), "a", "b").toSeq ==
      Seq("ab", "ab"))
    // overlapping triple merges greedily left-to-right
    assert(BpeOps.applyMerge(Array("a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "a"))
  }

  test("bpeEncode column normalizes and flattens words") {
    import spark.implicits._
    val m = Seq(("t", "h"), ("th", "e"))
    val got = Seq("The THE!! the").toDF("text")
      .select(BpeOps.bpeEncode(col("text"), m).as("t"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("the", "the", "the"))
    val n = Seq("the cat").toDF("text")
      .select(BpeOps.bpeTokenCount(col("text"), m).as("n"))
      .collect()(0).getInt(0)
    assert(n == 1 + 3) // "the" + c,a,t
  }

  test("vocab cap fails loud") {
    import spark.implicits._
    val df = ('a' to 'z').flatMap(a => ('a' to 'z').map(b => s"$a$b"))
      .take(100).toDF("text")
    val e = intercept[IllegalArgumentException] {
      BpeOps.trainBpe(df, col("text"), 2, vocabCap = 10)
    }
    assert(e.getMessage.contains("maxBpeVocab"))
  }
}
