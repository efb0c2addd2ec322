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

  test("property: corrupt-then-fix is the identity on random BMP " +
    "strings; fix never touches clean random strings") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // generator of printable BMP strings mixing ASCII, Latin-1,
    // CP1252 specials, Greek/Cyrillic and CJK (surrogates excluded —
    // lone surrogates are not valid text)
    val charGen = Gen.frequency(
      6 -> Gen.choose(0x20, 0x7e),
      2 -> Gen.choose(0xa0, 0xff),
      1 -> Gen.oneOf(0x20ac, 0x2019, 0x201c, 0x2014, 0x2026, 0x0160),
      1 -> Gen.choose(0x0370, 0x04ff),
      1 -> Gen.choose(0x4e00, 0x4fff))
    val strGen = Gen.listOfN(40, charGen)
      .map(_.map(_.toChar).mkString)
    val seed0 = Seed(42L)
    val samples = Iterator.iterate((seed0, List.empty[String])) {
      case (sd, acc) =>
        val r = strGen.pureApply(Gen.Parameters.default, sd)
        (sd.next, r :: acc)
    }.drop(300).next()._2
    val df = samples.toDF("orig")
    // roundtrip identity
    val broken = df
      .withColumn("fixed", EncodingOps.fixMojibake(
        EncodingOps.corruptAsCp1252(col("orig"))))
      .filter(col("fixed") =!= col("orig"))
      .collect()
    assert(broken.isEmpty,
      s"roundtrip failed for ${broken.length} strings, e.g. " +
        broken.headOption.map(_.getString(0)).getOrElse(""))
    // clean-text invariance: on strings with no signature, fix is id.
    // (Random strings CAN contain accidental lead+continuation pairs —
    // that's precisely what mojibakeScore detects — so restrict to
    // signature-free ones rather than asserting on all.)
    val touched = df
      .withColumn("score", EncodingOps.mojibakeScore(col("orig")))
      .filter(col("score") === 0)
      .withColumn("fixed", EncodingOps.fixMojibake(col("orig")))
      .filter(col("fixed") =!= col("orig")).count()
    assert(touched == 0L)
  }
}
