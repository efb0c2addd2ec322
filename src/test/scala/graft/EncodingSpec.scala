package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.EncodingOps

class EncodingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("fixMojibake: exact inverse of UTF-8-as-CP1252 corruption") {
    import spark.implicits._
    val originals = Seq(
      "Grüße café déjà vu über",
      "curly ‘quotes’ and “double” — dash",
      "euro € price … ellipsis ™",
      "emoji 😀 four-byte", // U+1F600, 4-byte UTF-8
      "plain ascii stays put",
      "Škoda Žilina Œuvre")
    val df = originals.toDF("orig")
      .withColumn("bad", EncodingOps.corruptAsCp1252(col("orig")))
      .withColumn("fixed", EncodingOps.fixMojibake(col("bad")))
      .withColumn("score_bad", EncodingOps.mojibakeScore(col("bad")))
      .withColumn("score_orig", EncodingOps.mojibakeScore(col("orig")))
    val rows = df.collect()
    rows.foreach { r =>
      val (orig, bad, fixed) =
        (r.getString(0), r.getString(1), r.getString(2))
      if (orig == "plain ascii stays put") {
        assert(bad == orig) // ASCII is a fixed point of the corruption
        assert(r.getInt(3) == 0)
      } else {
        assert(bad != orig, s"corruption must change: $orig")
        assert(r.getInt(3) > 0, s"detection must fire on: $bad")
      }
      assert(fixed == orig, s"repair must invert: $orig -> $bad -> $fixed")
    }
    // clean non-ASCII text is NOT touched (no signature)
    rows.foreach(r => assert(r.getInt(4) == 0,
      s"clean text must not trigger detection: ${r.getString(0)}"))
    val untouched = originals.toDF("t")
      .select(EncodingOps.fixMojibake(col("t")).as("f"), col("t"))
      .filter(col("f") =!= col("t")).count()
    assert(untouched == 0L)
  }

  test("fixMojibake: double-encoded and invalid sequences fall back") {
    import spark.implicits._
    // doubly-corrupted text: one repair pass recovers one layer and
    // the result still carries a signature — a second pass finishes
    val orig = Seq("café €").toDF("o")
      .withColumn("bad2", EncodingOps.corruptAsCp1252(
        EncodingOps.corruptAsCp1252(col("o"))))
      .withColumn("fix1", EncodingOps.fixMojibake(col("bad2")))
      .withColumn("fix2", EncodingOps.fixMojibake(col("fix1")))
      .head
    assert(orig.getString(3) == "café €")
    // a lone Ã followed by a non-continuation char is NOT valid UTF-8
    // when reinterpreted — repair must leave it alone
    val lone = Seq("ÃZ title").toDF("t")
      .select(EncodingOps.fixMojibake(col("t"))).head.getString(0)
    assert(lone == "ÃZ title")
    // chars outside Latin-1+CP1252 (e.g. CJK) block the repair even
    // if a signature appears elsewhere in the string
    val mixed = Seq("Ã© 中文").toDF("t")
      .select(EncodingOps.fixMojibake(col("t"))).head.getString(0)
    assert(mixed == "Ã© 中文")
  }
}
