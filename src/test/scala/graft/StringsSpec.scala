package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Strings

class StringsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("2").getOrCreate()

  private def one(c: org.apache.spark.sql.Column, a: String, b: String)
      : Any = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b").select(c).collect()(0).get(0)
  }
  private def approx(x: Any, e: Double, tol: Double = 1e-6) =
    math.abs(x.asInstanceOf[Double] - e) <= tol

  test("jaro / jaro-winkler match published examples") {
    import spark.implicits._
    val jw = (a: String, b: String) =>
      one(Strings.strJaroWinkler(col("a"), col("b")), a, b)
    val j = (a: String, b: String) =>
      one(Strings.strJaro(col("a"), col("b")), a, b)
    assert(approx(j("MARTHA", "MARHTA"), 0.944444))
    assert(approx(jw("MARTHA", "MARHTA"), 0.961111))
    assert(approx(j("DWAYNE", "DUANE"), 0.822222))
    assert(approx(jw("DWAYNE", "DUANE"), 0.84))
    assert(approx(j("DIXON", "DICKSONX"), 0.766667))
    assert(approx(jw("DIXON", "DICKSONX"), 0.813333))
    assert(approx(j("CRATE", "TRACE"), 0.733333))
  }

  test("OSA vs full Damerau on the classic 'ca'/'abc' pair") {
    assert(one(Strings.strOsa(col("a"), col("b")), "ca", "abc") == 3)
    assert(one(Strings.strDamerau(col("a"), col("b")), "ca", "abc") == 2)
    assert(one(Strings.strOsa(col("a"), col("b")), "ab", "ba") == 1)
    assert(one(Strings.strDamerau(col("a"), col("b")), "ab", "ba") == 1)
  }

  test("LCS substring/subsequence, fuzz ratio") {
    assert(one(Strings.strLcsSubstr(col("a"), col("b")),
      "ababc", "abcba") == 3)
    assert(one(Strings.strLcsSubseq(col("a"), col("b")),
      "abcde", "ace") == 3)
    // rapidfuzz doc example: ratio("this is a test","this is a test!")
    assert(approx(one(Strings.strFuzz(col("a"), col("b")),
      "this is a test", "this is a test!"), 28.0 / 29.0, 1e-9))
  }

  test("set similarities on night/nacht (1-gram)") {
    assert(approx(one(Strings.strJaccard(col("a"), col("b"), 1),
      "night", "nacht"), 3.0 / 7.0, 1e-9))
    assert(approx(one(Strings.strSorensenDice(col("a"), col("b"), 1),
      "night", "nacht"), 0.6, 1e-9))
    assert(approx(one(Strings.strOverlapCoeff(col("a"), col("b"), 1),
      "night", "nacht"), 0.6, 1e-9))
    // tversky α=β=0.5 == dice
    assert(approx(one(Strings.strTversky(col("a"), col("b"), 0.5, 0.5, 1),
      "night", "nacht"), 0.6, 1e-9))
    // the reference's ValueError contract: negative / non-finite
    // weights are rejected at construction (string.py str_tversky_sim)
    for ((al, be) <- Seq((-0.1, 0.5), (0.5, -1.0), (Double.NaN, 0.5),
        (0.5, Double.PositiveInfinity))) {
      intercept[IllegalArgumentException] {
        Strings.strTversky(col("a"), col("b"), al, be, 1)
      }
    }
  }

  test("hamming, case conversions, cleaning") {
    assert(one(Strings.strHamming(col("a"), col("b")),
      "karolin", "kathrin") == 3)
    assert(one(Strings.toSnakeCase(col("a")), "Hello World", "") ==
      "hello_world")
    assert(one(Strings.toCamelCase(col("a")), "hello world", "") ==
      "helloWorld")
    assert(one(Strings.toPascalCase(col("a")), "hello world", "") ==
      "HelloWorld")
    assert(one(Strings.toConstantCase(col("a")), "fooBarBaz", "") ==
      "FOO_BAR_BAZ")
    assert(one(Strings.removeDiacritics(col("a")), "café naïve", "") ==
      "cafe naive")
    assert(one(Strings.normalizeWhitespace(col("a")),
      "  a \t b\n c ", "") == "a b c")
    assert(one(Strings.replaceNonAscii(col("a")), "aé→b", "") == "ab")
  }

  test("extractNumbers pulls signed decimals") {
    import spark.implicits._
    // raw matched strings ("42" stays "42"); cast at the call site
    val r = Seq("x -1.5 and 42 then 0.25").toDF("a")
      .select(Strings.extractNumbers(col("a")).as("n"))
      .collect()(0).getSeq[String](0)
    assert(r == Seq("-1.5", "42", "0.25"))
  }

  test("similarToVocab strategies: avg/any/all with lv sims") {
    import spark.implicits._
    // lev(karolin, kathrin) = 3, lev(karolin, karl) = 3 → sims 4/7 each
    val df = Seq("karolin").toDF("a")
    def run(t: Double, strat: String): Boolean =
      df.select(Strings.similarToVocab(col("a"),
        Seq("kathrin", "karl"), t, "lv", strat).as("r"))
        .head.getBoolean(0)
    assert(run(0.55, "avg"))
    assert(!run(0.6, "avg"))
    assert(run(0.57, "any"))
    assert(!run(0.58, "all"))
    assert(run(0.5, "all"))
  }

  test("strNearest snaps to closest vocab word") {
    assert(one(Strings.strNearest(col("a"),
      Seq("apple", "banana", "cherry")), "banan", "") == "banana")
  }

  test("SqlFunctions exposes the kernels to spark.sql with null safety") {
    graft.functions.SqlFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_str_jaro('martha', 'marhta') AS jaro,
        |  graft_str_osa('ca', 'abc') AS osa,
        |  graft_str_d_leven('ca', 'abc') AS dl,
        |  graft_str_lcs_substr('abcdef', 'zabcy') AS lcs,
        |  graft_str_lcs_subseq('abcdef', 'aXcYeZ') AS lcss,
        |  graft_str_jaro(NULL, 'x') AS n1""".stripMargin).head
    assert(math.abs(r.getDouble(0) - 0.9444444444444445) < 1e-12)
    assert(r.getInt(1) == 3 && r.getInt(2) == 2)
    assert(r.getInt(3) == 3 && r.getInt(4) == 3)
    assert(r.isNullAt(5))
  }
}
