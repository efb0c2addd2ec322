package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Strings

/** The reference's OWN test vectors, replayed verbatim against this
  * library — the literal fixtures from
  * /root/reference/tests/test_string.py, with the source line cited per
  * case. Where StringsSpec checks published textbook examples, this
  * spec checks that a user porting off the reference sees identical
  * outputs on the inputs the reference itself ships. */
class ReferenceGoldenSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("2").getOrCreate()
  import org.apache.spark.sql.Column

  private def run[T](pairs: Seq[(String, String)], c: Column): Seq[Any] = {
    import spark.implicits._
    pairs.toDF("a", "b").select(c.as("r")).collect().map(_.get(0)).toSeq
  }

  test("str_hamming vector (test_string.py:69-84)") {
    val got = run(Seq("karolin" -> "kathrin", "karolin" -> "kerstin",
      "kathrin" -> "kerstin", "0000" -> "1111", "2173896" -> "2233796"),
      Strings.strHamming(col("a"), col("b")))
    assert(got == Seq(3, 3, 4, 4, 3))
  }

  test("str_leven vectors incl. unicode surnames (test_string.py:183-251)") {
    val got1 = run(Seq("kitten" -> "sitting", "mary" -> "merry",
      "may" -> "mayer"), levenshtein(col("a"), col("b")))
    assert(got1 == Seq(3, 2, 2))
    val a = Seq("Ostroróg", "Hätönen", "Kõivsaar", "Pöitel", "Vystrčil",
      "Särki", "Chreptavičienė", "Väänänen", "Führus", "Könönen",
      "Väänänen", "Łaszczyński", "Pärnselg", "Könönen", "Piątkowski",
      "D’Amore", "Körber", "Särki", "Kärson", "Węgrzyn")
    val b = Seq("Könönen", "Hätönen", "Wyżewski", "Jäger", "Hätönen",
      "Mäns", "Chreptavičienė", "Väänänen", "Ahısha", "Jürist",
      "Vainjärv", "Łaszczyński", "Pärnselg", "Führus", "Kübarsepp",
      "Németi", "Räheso", "Käri", "Jäger", "Setälä")
    val exp = Seq(8, 0, 8, 5, 7, 4, 0, 0, 6, 7, 6, 0, 0, 7, 10, 6, 6,
      2, 5, 7)
    assert(run(a.zip(b), levenshtein(col("a"), col("b"))) == exp)
  }

  test("filter_by_levenshtein bound=2 (test_string.py:270-283)") {
    import spark.implicits._
    val got = Seq(Some("kitten") -> "sitting", Some("mary") -> "merry",
      Some("may") -> "mayer", (None: Option[String]) -> "")
      .toDF("a", "b")
      .select(Strings.filterByLevenshtein(col("a"), col("b"), 2).as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(got.toSeq == Seq(false, true, true, null))
  }

  test("filter_by_hamming bound=2 (test_string.py:306-322)") {
    import spark.implicits._
    val got = Seq("AAAAA" -> "AAAAT", "AAATT" -> "AAAAA",
      "AATTT" -> "ATATA", "AAAAA" -> "AAAAA", "AAAAA" -> "TTTTT")
      .toDF("a", "b")
      .select(Strings.filterByHamming(col("a"), col("b"), 2).as("r"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, true, false, true, false))
  }

  test("str_osa vector with null (test_string.py:355-369)") {
    import spark.implicits._
    val got = Seq(Some("CA") -> "ABC", Some("AB") -> "BA",
      (None: Option[String]) -> "a").toDF("a", "b")
      .select(Strings.strOsa(col("a"), col("b")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(got.toSeq == Seq(3, 1, null))
  }

  test("str_sorensen_dice kitten/sitting = 4/11 (test_string.py:378-390)") {
    val got = run(Seq("kitten" -> "sitting"),
      Strings.strSorensenDice(col("a"), col("b"), 2))
    assert(math.abs(got.head.asInstanceOf[Double] - 4.0 / 11.0) < 1e-12)
  }

  test("str_jaccard at substr_size 2 and 3 (test_string.py:393-411)") {
    val pairs = Seq("apple" -> "let", "test" -> "tests", "moon" -> "sun")
    val got2 = run(pairs, Strings.strJaccard(col("a"), col("b"), 2))
      .map(_.asInstanceOf[Double])
    assert(got2.zip(Seq(0.2, 0.75, 0.0)).forall {
      case (g, e) => math.abs(g - e) < 1e-12 })
    val got3 = run(pairs, Strings.strJaccard(col("a"), col("b"), 3))
      .map(_.asInstanceOf[Double])
    assert(got3.zip(Seq(0.0, 2.0 / 3.0, 0.0)).forall {
      case (g, e) => math.abs(g - e) < 1e-12 })
  }

  test("str_nearest abc|bbb|ccc ~ abd -> abc (test_string.py:340-352)") {
    val got = run(Seq("abd" -> ""),
      Strings.strNearest(col("a"), Seq("abc", "bbb", "ccc")))
    assert(got == Seq("abc"))
  }

  test("replace_non_ascii with replacement (test_string.py:9-25)") {
    val inputs = Seq("mercy" -> "", "xbĤ" -> "", "ĤŇƏ" -> "")
    assert(run(inputs, Strings.replaceNonAscii(col("a"))) ==
      Seq("mercy", "xb", ""))
    assert(run(inputs, Strings.replaceNonAscii(col("a"), "?")) ==
      Seq("mercy", "xb?", "???"))
    assert(run(inputs, Strings.replaceNonAscii(col("a"), "??")) ==
      Seq("mercy", "xb??", "??????"))
  }

  test("remove_diacritics (test_string.py:27-34)") {
    val inputs = Seq("mercy" -> "", "mèrcy" -> "", "françoise" -> "",
      "über" -> "")
    assert(run(inputs, Strings.removeDiacritics(col("a"))) ==
      Seq("mercy", "mercy", "francoise", "uber"))
  }

  test("map_words (test_string.py:37-53)") {
    val inputs = Seq("one two three" -> "", "onetwo three" -> "")
    assert(run(inputs, Strings.mapWords(col("a"), Map("two" -> "2"))) ==
      Seq("one 2 three", "onetwo three"))
    assert(run(inputs, Strings.mapWords(col("a"),
      Map("two" -> "2", "three" -> "3"))) ==
      Seq("one 2 3", "onetwo 3"))
    assert(run(inputs, Strings.mapWords(col("a"), Map("four" -> "4"))) ==
      Seq("one two three", "onetwo three"))
  }

  test("normalize_whitespace (test_string.py:56-61)") {
    val inputs = Seq("a   b" -> "", "ab" -> "", "a b" -> "",
      "a\t\nb" -> "", "a \rb" -> "")
    assert(run(inputs, Strings.normalizeWhitespace(col("a"))) ==
      Seq("a b", "ab", "a b", "a b", "a b"))
  }

  test("ordinal_encode default keeps nulls null (test_transforms.py:8-31)") {
    import spark.implicits._
    import graft.pipeline.Blueprint
    val dfFit = Seq(Some("M") -> 1, Some("F") -> 2, Some("F") -> 3,
      (None: Option[String]) -> 4).toDF("gender", "data")
    val pipe = Blueprint(dfFit).ordinalEncode(Seq("gender")).materialize()
    val got = pipe.transform(dfFit).select("gender").collect()
      .map(r => if (r.isNullAt(0)) null else r.get(0))
    // M = 1, F = 0 (sorted value order), null stays null (the
    // reference emits the same codes as floats; ours are ints)
    assert(got.toSeq == Seq(1, 0, 0, null))
  }

  test("conditional_impute learns on rule-false rows (test_transforms.py:52-68)") {
    import spark.implicits._
    import graft.pipeline.Blueprint
    val df = Seq(Some(Double.NaN), None, Some(Double.PositiveInfinity),
      Some(9999.0), Some(100.0), Some(100.0), Some(100.0), Some(800.0))
      .toDF("a")
    val cond =
      "a IS NULL OR isnan(a) OR abs(a) = double('Infinity') OR a > 899"
    val pipe = Blueprint(df).conditionalImpute(Seq("a"), cond, "mean")
      .materialize()
    val got = pipe.transform(df).select("a").collect()
      .map(_.getDouble(0)).toSeq
    // mean of the valid rows (100,100,100,800) = 275 replaces the bad 4
    assert(got == Seq(275.0, 275.0, 275.0, 275.0, 100.0, 100.0, 100.0,
      800.0))
  }

  test("singular_x_tol gates collinear designs to degenerate " +
      "(test_linear_exprs.py:1205-1232)") {
    import spark.implicits._
    // x2 = 2*x1 exactly → X'X rank deficient; float pivots are tiny
    // but nonzero, so only the relative gate catches it
    val df = (1 to 64).map { i =>
      val x1 = math.sin(i * 1.7) * 3.0
      (Seq(x1, 2.0 * x1), math.cos(i * 0.9))
    }.toDF("x", "y")
    val gated = df.agg(graft.agg.LinRegAgg.linReg(col("x"), col("y"), 2)
      .as("r")).select("r.coeffs").head.getSeq[Double](0)
    assert(gated.isEmpty, s"collinear design not gated: $gated")
    // well-conditioned: not gated, recovers the generating coeffs
    val good = (1 to 64).map { i =>
      val x1 = math.sin(i * 1.7); val x2 = math.cos(i * 2.3)
      (Seq(x1, x2), 2.0 * x1 - 0.5 * x2)
    }.toDF("x", "y")
    val c = good.agg(graft.agg.LinRegAgg.linReg(col("x"), col("y"), 2)
      .as("r")).select("r.coeffs").head.getSeq[Double](0)
    assert(math.abs(c(0) - 2.0) < 1e-9 && math.abs(c(1) + 0.5) < 1e-9)
  }

  test("convolve all five modes (test_many.py:254-270)") {
    import spark.implicits._
    val df = Seq(5, 6, 7, 8, 9).zipWithIndex
      .map { case (v, i) => ("g", i, v.toDouble) }.toDF("g", "o", "a")
    def modes(m: String): Seq[Double] =
      graft.ops.SeqOps.convolveSeries(df, col("a"), col("o"), Seq("g"),
        Seq(1.0, 0.0, -1.0), m)
        .head.getSeq[Double](1)
    assert(modes("full") == Seq(5.0, 6.0, 2.0, 2.0, 2.0, -8.0, -9.0))
    assert(modes("valid") == Seq(2.0, 2.0, 2.0))
    assert(modes("same") == Seq(6.0, 2.0, 2.0, 2.0, -8.0))
    assert(modes("left") == Seq(5.0, 6.0, 2.0, 2.0, 2.0))
    assert(modes("right") == Seq(2.0, 2.0, 2.0, -8.0, -9.0))
    // the per-row windowed form carries the same valid outputs
    val winValid = graft.ops.SeqOps.convolveWin(df, col("a"), col("o"),
        Seq("g"), Seq(1.0, 0.0, -1.0), "valid")
      .orderBy("o").collect().flatMap(r =>
        if (r.isNullAt(r.fieldIndex("conv"))) None
        else Some(r.getDouble(r.fieldIndex("conv"))))
    assert(winValid.toSeq == Seq(2.0, 2.0, 2.0))
  }

  test("query_longest_streak with nulls (test_many.py:225-250)") {
    import spark.implicits._
    val df = Seq(Some(1), Some(2), Some(3), Some(4), Some(5), None)
      .zipWithIndex.map { case (v, i) => ("g", i, v) }.toDF("g", "o", "a")
    def longest(cond: org.apache.spark.sql.Column): Long =
      graft.ops.TSOps.streaks(df, cond, col("o"), Seq("g"))
        .select("longest_streak").head.getLong(0)
    assert(longest(col("a") >= 2) == 4L)
    assert(longest(col("a") >= 6) == 0L)
    assert(longest(col("a") <= 2) == 2L)
    assert(longest(col("a") <= 6) == 5L) // null doesn't count
  }

  test("cond_entropy and cat_cross_entropy literals (test_many.py:506-553)") {
    import spark.implicits._
    val df = Seq((1, "a"), (0, "b"), (1, "c"), (1, "a"), (1, "b"),
      (0, "c"), (0, "a"), (1, "a")).map { case (y, a) => ("g", y, a) }
      .toDF("g", "y", "a")
    val h = graft.ops.TSOps.condEntropy(df, col("y"), col("a"), Seq("g"))
      .select("cond_entropy").head.getDouble(0)
    assert(math.abs(h - 0.6277411625893767) < 1e-12)
    val ce = Seq((0, Seq(0.1, 0.5, 0.4)), (1, Seq(0.2, 0.6, 0.2)),
      (2, Seq(0.4, 0.1, 0.5)), (0, Seq(0.9, 0.05, 0.05)),
      (1, Seq(0.2, 0.5, 0.3))).toDF("y", "pred")
      .agg(graft.functions.Metrics.catCrossEntropy(col("y"), col("pred"))
        .as("ce")).head.getDouble(0)
    assert(math.abs(ce - 0.8610131187075506) < 1e-12)
  }

  test("jaccard_row / jaccard_col literals (test_many.py:556-590)") {
    import spark.implicits._
    import graft.functions.NumFuncs
    val got = Seq((Seq(1, 2, 3), Seq(1, 3)), (Seq(2, 3), Seq(1)))
      .toDF("a", "b")
      .select(NumFuncs.jaccardRow(col("a"), col("b")).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    assert(math.abs(got(0) - 2.0 / 3.0) < 1e-12 && got(1) == 0.0)
    val gotS = Seq((Seq("a", "b", "c"), Seq("a", "b")),
      (Seq("b", "c"), Seq("c"))).toDF("a", "b")
      .select(NumFuncs.jaccardRow(col("a"), col("b")).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    assert(math.abs(gotS(0) - 2.0 / 3.0) < 1e-12 && gotS(1) == 0.5)
    // jaccard_col: distinct-set jaccard of two columns
    val jc = Seq((1, 2), (2, 3), (3, 4), (4, 5), (5, 6)).toDF("a", "b")
    val inter = jc.select(col("a")).intersect(jc.select(col("b"))).count()
    val union = jc.select(col("a")).union(jc.select(col("b")))
      .distinct().count()
    assert(math.abs(inter.toDouble / union - 2.0 / 3.0) < 1e-12)
  }

  test("psi continuous + discrete literal 3.4041141744549024 " +
      "(test_many.py:1304-1349)") {
    import spark.implicits._
    val ref = (0 until 1000).map(_.toDouble).toDF("v")
    val act = ((0 until 500).map(_.toDouble) ++ Seq.fill(500)(600.0))
      .toDF("v")
    val psi = graft.ops.EncodeOps.psiReport(ref, col("v"), act, col("v"), 10)
      .agg(sum("psi_bin")).head.getDouble(0)
    assert(math.abs(psi - 3.4041141744549024) < 1e-9, s"psi=$psi")
    val refD = (0 until 10).flatMap(d => Seq.fill(100)(d)).toDF("v")
    val actD = ((0 until 5).flatMap(d => Seq.fill(100)(d)) ++
      Seq.fill(500)(6)).toDF("v")
    val psiD = graft.ops.EncodeOps.psiDiscrete(refD, col("v"), actD, col("v"))
      .agg(sum("psi_bin")).head.getDouble(0)
    assert(math.abs(psiD - 3.4041141744549024) < 1e-9, s"psiD=$psiD")
  }

  test("sample_entropy literals (test_many.py:1253-1266)") {
    import graft.ops.TSOps2
    val s1 = (0 until 100).map(_.toDouble)
    // the reference scales SampEn's r by POPULATION std
    // (ts_features.py:551 std(ddof=0))
    def sdPop(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.length
      math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.length)
    }
    val e1 = TSOps2.sampleEntropySeries(s1, 2, 0.2 * sdPop(s1))
    assert(math.abs(e1 - 0.010471299867295437) < 1e-12, s"e1=$e1")
    val s2 = (0 until 3000).map(j => math.sin(2 * math.Pi * j / 100))
    val e2 = TSOps2.sampleEntropySeries(s2, 2, 0.2 * sdPop(s2))
    assert(math.abs(e2 - 0.16367903754688098) < 1e-12, s"e2=$e2")
  }

  test("approximate_entropy literals incl. edge case " +
      "(test_many.py:1269-1313)") {
    import graft.ops.TSOps2
    def sd(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.length
      math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val cases: Seq[(Seq[Double], Double, Boolean, Double)] = Seq(
      (Seq.fill(10)(Seq(12.0, 13, 15, 16, 17)).flatten, 0.9, true,
        0.282456191276673),
      (Seq(1.4, -1.3, 1.7, -1.2), 0.5, false, 0.0566330122651324),
      (Seq.fill(8)(Seq(0.0, 1.0)).flatten, 0.5, false,
        0.002223871246127107),
      (Seq(0, 1, 0, 0, 1, 0, 1, 0, 0, 1, 1, 1, 1, 0, 0, 1)
        .map(_.toDouble), 0.5, false, 0.47133806162842484),
      (Seq.fill(17)(Seq(85.0, 80, 89)).flatten, 3.0, false,
        1.099654110658932e-05),
      (Seq.fill(17)(Seq(85.0, 80, 89)).flatten, 3.0, true, 0.0))
    cases.zipWithIndex.foreach { case ((s, r, scale, want), i) =>
      val rAbs = if (scale) r * sd(s) else r
      val got = TSOps2.approxEntropySeries(s, 2, rAbs)
      assert(math.abs(got - want) < 1e-12, s"case $i: got $got want $want")
    }
    // m + 1 > length → NaN, not a crash
    assert(TSOps2.approxEntropySeries(Seq(1.0), 2, 0.1).isNaN)
  }

  test("haversine literal London-NYC (test_many.py:1230-1251)") {
    import spark.implicits._
    val d = Seq((51.5007, 0.1246, 40.6892, 74.0445))
      .toDF("x1", "x2", "y1", "y2")
      .select(graft.functions.NumFuncs.haversine(col("x1"), col("x2"),
        col("y1"), col("y2")).as("dist")).head.getDouble(0)
    assert(math.abs(d - 5574.840456848555) < 1e-9, s"d=$d")
  }

  test("xlogy null/NaN contract (test_many.py:1452-1463)") {
    import spark.implicits._
    val got = Seq((0.0, 1.0), (0.0, Double.NaN), (Double.NaN, 1.0),
      (3.0, 4.0)).toDF("a", "b")
      .select(graft.functions.NumFuncs.xlogy(col("a"), col("b")).as("r"))
      .collect().map(_.getDouble(0))
    assert(got(0) == 0.0)
    assert(got(1).isNaN && got(2).isNaN)
    assert(math.abs(got(3) - 3.0 * math.log(4.0)) < 1e-12)
  }

  test("knn_ptwise base vector with self-inclusion " +
      "(test_many.py:909-933)") {
    import spark.implicits._
    val df = (0 until 5).map(i =>
      (i.toLong, i.toDouble, i.toDouble, i.toDouble))
      .toDF("id", "val1", "val2", "val3")
    val got = graft.knn.KnnOps.knnPtwise(df, col("id"),
        Seq(col("val1"), col("val2"), col("val3")), k = 2, metric = "l2",
        includeSelf = true)
      .orderBy("id").select("knn_ids").collect()
      .map(_.getSeq[Long](0).sorted.toSeq).toSeq
    assert(got == Seq(Seq(0L, 1, 2), Seq(0L, 1, 2), Seq(1L, 2, 3),
      Seq(2L, 3, 4), Seq(2L, 3, 4)))
  }

  test("nb_cnt counts the point itself (test_many.py:1186-1228)") {
    import spark.implicits._
    val d1 = (0 until 5).map(i =>
      (i.toLong, i.toDouble, i.toDouble, i.toDouble))
      .toDF("id", "x", "y", "z")
    val g1 = graft.knn.KnnOps.nbCnt(d1, col("id"),
        Seq(col("x"), col("y"), col("z")), r = 4.0, metric = "sql2",
        includeSelf = true)
      .orderBy("id").select("nb_cnt").collect().map(_.getInt(0)).toSeq
    assert(g1 == Seq(2, 3, 3, 3, 2))
    val d2 = Seq((0L, 0.1, 0.1, 0.1), (1L, 0.2, 0.3, 0.4),
      (2L, 0.5, 0.6, 0.8), (3L, 0.9, 1.1, 1.2), (4L, 2.1, 3.3, 4.1))
      .toDF("id", "x", "y", "z")
    val g2 = graft.knn.KnnOps.nbCnt(d2, col("id"),
        Seq(col("x"), col("y"), col("z")), r = 1.0, metric = "l1",
        includeSelf = true)
      .orderBy("id").select("nb_cnt").collect().map(_.getInt(0)).toSeq
    assert(g2 == Seq(2, 3, 2, 1, 1))
  }

  test("knn runs under every dist string; unknown dist raises " +
      "(test_many.py:1591-1620)") {
    import spark.implicits._
    val df = (0 until 10).map { i =>
      var h = i.toLong * 0x9E3779B97F4A7C15L
      h ^= (h >>> 31); h *= 0x94D049BB133111EBL; h ^= (h >>> 29)
      def u(s: Int) = (((h >>> (s * 11)) & 0x7FF).toDouble) / 2048.0
      (i.toLong, u(0), u(1), u(2))
    }.toDF("id", "f0", "f1", "f2")
    Seq("l1", "l2", "sql2", "inf").foreach { dist =>
      val got = graft.knn.KnnOps.knnPtwise(df, col("id"),
          Seq(col("f0"), col("f1"), col("f2")), k = 3, metric = dist,
          includeSelf = true)
        .select("knn_ids").collect()
      assert(got.length == 10, dist)
      got.foreach { r =>
        val ids = r.getSeq[Long](0)
        assert(ids.nonEmpty && ids.length <= 4 &&
          ids.forall(i => i >= 0 && i < 10), s"$dist: $ids")
      }
    }
    intercept[IllegalArgumentException] {
      graft.knn.KnnOps.knnPtwise(df, col("id"),
        Seq(col("f0"), col("f1"), col("f2")), k = 3, metric = "nope")
    }
  }

  test("radius_ptwise_null_safe skips null rows, keeps self " +
      "(test_many.py:1153-1176, bug-029 regression)") {
    import spark.implicits._
    val df = Seq((1L, Some(0.1), Some(0.1), Some(0.1)),
      (2L, None, Some(0.3), Some(0.4)),
      (3L, Some(5.0), Some(10.0), Some(11.0)),
      (4L, Some(0.2), None, Some(0.3)))
      .toDF("id", "val1", "val2", "val3")
    val out = graft.knn.KnnOps.radiusPtwiseNullSafe(df, col("id"),
        Seq(col("val1"), col("val2"), col("val3")), r = 0.3,
        metric = "sql2", includeSelf = true)
      .orderBy("id").select("radius_ids").collect()
    assert(out(1).isNullAt(0) && out(3).isNullAt(0),
      "null-feature rows must get null lists")
    assert(out(0).getSeq[Long](0).toSeq == Seq(1L))
    assert(out(2).getSeq[Long](0).toSeq == Seq(3L))
  }

  test("is_knn_from picks different neighbors under l2 vs cosine " +
      "(test_many.py:1070-1110)") {
    import spark.implicits._
    val df = Seq((1L, 0.1, 0.1, 0.1), (2L, 0.2, 0.3, 0.4),
      (3L, 5.0, 10.0, 11.0)).toDF("id", "val1", "val2", "val3")
    def ids(metric: String): Seq[Long] =
      graft.knn.KnnOps.isKnnFrom(df,
          Seq(col("val1"), col("val2"), col("val3")), Seq(0.5, 0.5, 0.5),
          k = 1, tieBreak = col("id"), metric = metric)
        .filter(col("is_knn")).select("id").collect()
        .map(_.getLong(0)).toSeq
    assert(ids("l2") == Seq(2L))
    assert(ids("cosine") == Seq(1L))
  }

  test("knn_ptwise eval_mask + self-inclusion (test_many.py:1005-1030)") {
    import spark.implicits._
    val df = Seq((0L, 0.1, 0.1, 0.1, 1), (1L, 0.2, 0.2, 0.2, 0),
      (2L, 0.3, 0.3, 0.3, 1), (3L, 0.4, 0.4, 0.4, 1))
      .toDF("id", "a1", "a2", "a3", "can_eval")
    val r = graft.knn.KnnOps.knnPtwise(df, col("id"),
        Seq(col("a1"), col("a2"), col("a3")), k = 1, metric = "sql2",
        includeSelf = true, evalMask = Some(col("can_eval") === 1))
      .orderBy("id").select("knn_ids").collect()
    // row 1 is skipped by eval_mask → null; row 0 still sees id 1 as a
    // neighbor, plus itself (the reference's k+1 self-inclusion)
    assert(r(1).isNullAt(0), "eval-masked row must be null")
    assert(r(0).getSeq[Long](0).sorted == Seq(0L, 1L))
    assert(r(2).getSeq[Long](0).sorted == Seq(1L, 2L))
  }

  test("knn_ptwise max_bound truncates lists (test_many.py:971-1002)") {
    import spark.implicits._
    val df = Seq((0L, 0.1, 0.15, 0.12), (1L, 1.0, 1.5, 1.2),
      (2L, 10.0, 15.0, 12.0), (3L, 100.0, 150.0, 120.0))
      .toDF("id", "a", "b", "c")
    val r = graft.knn.KnnOps.knnPtwise(df, col("id"),
        Seq(col("a"), col("b"), col("c")), k = 2, metric = "sql2",
        maxBound = 4.0, includeSelf = true)
      .orderBy("id").select("knn_ids").collect()
      .map(_.getSeq[Long](0).toSeq).toSeq
    assert(r == Seq(Seq(0L, 1L), Seq(1L, 0L), Seq(2L), Seq(3L)))
  }

  test("knn_avg: null/NaN rows are no one's neighbor and get null " +
      "(test_many.py:935-967)") {
    import spark.implicits._
    val df = Seq(
      (0L, 0.0, Some(0.1), Some(0.15), Some(0.12)),
      (1L, 1.0, Some(1.0), Some(1.5), Some(1.2)),
      (2L, 2.0, Some(10.0), Some(15.0), Some(12.0)),
      (3L, 3.0, Some(100.0), Some(150.0), Some(120.0)),
      (4L, 4.0, Some(Double.NaN), Some(1.0), Some(2.0)),
      (5L, 5.0, Some(1.0), None, Some(2.0)))
      .toDF("id", "values", "a", "b", "c")
    val r = graft.knn.KnnOps.knnAvg(df, col("id"),
        Seq(col("a"), col("b"), col("c")), col("values"), k = 2,
        metric = "sql2")
      .orderBy("id").select("knn_avg").collect()
    val want = Seq(Some(1.5), Some(1.0), Some(0.5), Some(1.5), None, None)
    r.zip(want).zipWithIndex.foreach { case ((row, w), i) =>
      w match {
        case Some(v) => assert(!row.isNullAt(0) && row.getDouble(0) == v,
          s"row $i: got $row want $v")
        case None => assert(row.isNullAt(0), s"row $i: want null got $row")
      }
    }
  }

  test("benford first-digit vectors incl. sub-1 floats, powers of 10, " +
      "non-finite (test_many.py:143-165)") {
    import spark.implicits._
    val cases: Seq[(Seq[Option[Double]], Seq[Int])] = Seq(
      (Seq(1.0, -12, 2, -22, 3, 0).map(Some(_)),
        Seq(2, 2, 1, 0, 0, 0, 0, 0, 0)),
      (Seq(0.001, 0.00025, 0.0312, 400.0, -0.5).map(Some(_)),
        Seq(1, 1, 1, 1, 1, 0, 0, 0, 0)),
      (Seq(1e10, 2e15, 999.0).map(Some(_)),
        Seq(1, 1, 0, 0, 0, 0, 0, 0, 1)),
      ((0 until 24).map(i => Some(i.toDouble)),
        Seq(11, 5, 1, 1, 1, 1, 1, 1, 1)),
      (Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0),
        Some(Double.NaN), Some(Double.PositiveInfinity), None),
        Seq(1, 1, 1, 1, 0, 0, 0, 0, 0)))
    cases.zipWithIndex.foreach { case ((data, want), ci) =>
      val df = data.map(v => ("g", v)).toDF("g", "a")
      val got = graft.ops.TSOps.benford(df, col("a"), Seq("g"))
        .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
      val counts = (1 to 9).map(d => got.getOrElse(d, 0L).toInt)
      assert(counts == want, s"case $ci: got $counts want $want")
    }
  }

  test("lcs substring/subsequence strings incl. emoji " +
      "(test_string.py:129-182)") {
    import spark.implicits._
    val substrCases = Seq(
      ("ABCDEF", "ZBCDG", "BCD"), ("abc", "xyz", ""),
      ("common", "common", "common"), ("", "test", ""),
      ("abcdefg", "xabcdey", "abcde"),
      ("你好世界", "世界和平",
        "世界"),
      ("🚀🛰️🌌",
        "🛰️✨🌟", "🛰️"))
    val gotSub = substrCases.map(c => (c._1, c._2)).toDF("a", "b")
      .select(Strings.strLcsSubstrStr(col("a"), col("b")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(gotSub == substrCases.map(_._3))
    val subseqCases = Seq(
      ("AGGTAB", "GXTXAYB", "GTAB"), ("abc", "xyz", ""),
      ("你好世界和平",
        "世界a和平", "世界和平"),
      ("🚀🛰️🌌",
        "🛰️✨🌟", "🛰️"))
    val gotSeq = subseqCases.map(c => (c._1, c._2)).toDF("a", "b")
      .select(Strings.strLcsSubseqStr(col("a"), col("b")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(gotSeq == subseqCases.map(_._3))
    // FAREMVIEL vs FARMVILLE: lcs_seq 7 -> dist max(9,9)-7 = 2
    val d = Seq(("FAREMVIEL", "FARMVILLE")).toDF("a", "b")
      .select(Strings.strLcsSubseqDist(col("a"), col("b")).as("r"))
      .head.getInt(0)
    assert(d == 2)
  }

  test("jaro wikipedia vector FAREMVIEL/FARMVILLE " +
      "(test_string.py:88-106)") {
    import spark.implicits._
    val got = Seq(("FAREMVIEL", "FARMVILLE")).toDF("a", "b")
      .select(Strings.strJaro(col("a"), col("b")).as("r"))
      .head.getDouble(0)
    assert(math.abs(got - (1.0 / 3.0) * (16.0 / 9.0 + 7.0 / 8.0)) < 1e-12,
      s"got $got")
  }

  test("jaro floors the half-transposition count and JW boosts only " +
      "above 0.7 (rapidfuzz conventions, src/str_ext/jaro.rs:14-26)") {
    import spark.implicits._
    val rows = Seq(
      // odd half-transposition count (3): textbook t/2.0 would give
      // 0.402778 / 0.477778 — rapidfuzz (and DuckDB) floor to 1
      ("red anvil", "standard", 0.458333, 0.458333),
      ("red anvil", "large", 0.533333, 0.533333),
      // jaro 0.583 with a 3-char common prefix: boost must NOT apply
      ("abcxxxxx", "abczzzzz", 0.583333, 0.583333),
      // jaro 0.767 > 0.7 with 2-char prefix: boost applies
      ("DIXON", "DICKSONX", 0.766667, 0.813333))
    val got = rows.map { case (a, b, _, _) => (a, b) }
      .toDF("a", "b")
      .select(round(Strings.strJaro(col("a"), col("b")), 6),
        round(Strings.strJaroWinkler(col("a"), col("b")), 6))
      .collect()
    rows.zip(got).foreach { case ((a, b, j, jw), r) =>
      assert(r.getDouble(0) == j, s"jaro $a/$b")
      assert(r.getDouble(1) == jw, s"jw $a/$b")
    }
  }

  test("tversky alpha/beta vectors (test_string.py:431-451)") {
    import spark.implicits._
    val df = Seq(("apple", "let"), ("test", "tests"), ("moon", "sun"))
      .toDF("a", "b")
    val g1 = df.select(Strings.strTversky(col("a"), col("b"), 0.5, 0.5, 2)
      .as("r")).collect().map(_.getDouble(0))
    assert(math.abs(g1(0) - 0.3333333333333333) < 1e-12)
    assert(math.abs(g1(1) - 0.8571428571428571) < 1e-12)
    assert(g1(2) == 0.0)
    val g2 = df.select(Strings.strTversky(col("a"), col("b"), 0.1, 0.9, 3)
      .as("r")).collect().map(_.getDouble(0))
    assert(g2(0) == 0.0)
    assert(math.abs(g2(1) - 0.6896551724137931) < 1e-12)
    assert(g2(2) == 0.0)
  }

  test("trunc/fract preserve null and NaN (test_many.py:421-447)") {
    import spark.implicits._
    import graft.functions.NumFuncs
    val df = Seq(Some(2.123), None, Some(-2.111), Some(Double.NaN))
      .toDF("a")
    val got = df.select(NumFuncs.truncCol(col("a")).as("t"),
      NumFuncs.fract(col("a")).as("f")).collect()
    assert(got(0).getDouble(0) == 2.0 &&
      math.abs(got(0).getDouble(1) - 0.123) < 1e-12)
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
    assert(got(2).getDouble(0) == -2.0 &&
      math.abs(got(2).getDouble(1) + 0.111) < 1e-12)
    assert(got(3).getDouble(0).isNaN && got(3).getDouble(1).isNaN)
  }

  test("gcd/lcm scalar and column vectors (test_many.py:449-500)") {
    import spark.implicits._
    import graft.functions.NumFuncs
    val df = Seq((1, 1), (2, 2), (3, 2), (4, 2), (5, 10)).toDF("a", "b")
    def run(c: org.apache.spark.sql.Column) =
      df.select(c.cast("long").as("r")).collect().map(_.getLong(0)).toSeq
    assert(run(NumFuncs.gcdCol(col("a"), lit(3))) == Seq(1, 1, 3, 1, 1))
    assert(run(NumFuncs.gcdCol(col("a"), col("b"))) == Seq(1, 2, 1, 2, 5))
    assert(run(NumFuncs.lcmCol(col("a"), lit(3))) == Seq(3, 6, 3, 12, 15))
    assert(run(NumFuncs.lcmCol(col("a"), col("b"))) == Seq(1, 2, 6, 4, 10))
  }

  test("integrate_trapz with scalar dx (test_many.py:503-512)") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0).zipWithIndex
      .map { case (v, i) => ("g", i * 0.1, v) }.toDF("g", "x", "y")
    val got = graft.ops.TSOps.trapz(df, col("y"), col("x"), Seq("g"))
      .head.getDouble(1)
    assert(math.abs(got - 0.4) < 1e-12, s"got $got")
  }

  test("extract_numbers as ints and joined strings " +
      "(test_many.py:591-632)") {
    import spark.implicits._
    import graft.functions.Strings
    val texts = Seq("0% of my time", "1% to 25% of my time",
      "75% to 99% of my time", "50% to 74% of my time",
      "75% to 99% of my time", "50% to 74% of my time")
    val df = texts.toDF("a")
    val ints = df.select(transform(Strings.extractNumbers(col("a")),
        s => s.cast("long")).as("r"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    assert(ints == Seq(Seq(0L), Seq(1L, 25L), Seq(75L, 99L),
      Seq(50L, 74L), Seq(75L, 99L), Seq(50L, 74L)))
    val joined = df.select(array_join(Strings.extractNumbers(col("a")),
        "-").as("r")).collect().map(_.getString(0)).toSeq
    assert(joined == Seq("0", "1-25", "75-99", "50-74", "75-99", "50-74"))
  }

  test("lempel_ziv literals 8/9/10 (test_many.py:637-717)") {
    import spark.implicits._
    val cases = Seq(
      (Seq(1, 0, 0, 1, 1, 1, 1, 0, 1, 1, 0, 0, 0, 0, 1, 0), 8),
      (Seq(1, 0, 0, 1, 1, 1, 1, 0, 1, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0,
        1, 0), 9),
      (Seq(1, 0, 0, 1, 1, 1, 1, 0, 1, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0,
        1, 0, 1, 0), 10))
    cases.zipWithIndex.foreach { case ((bits, want), ci) =>
      val df = bits.zipWithIndex.map { case (b, i) => ("g", i, b > 0) }
        .toDF("g", "o", "b")
      // the reference test passes as_ratio=False (test_many.py:715)
      val got = df.groupBy("g")
        .agg(graft.agg.LempelZivAgg.lempelZiv(col("o"), col("b"),
          asRatio = false).as("lz")).head.getDouble(1)
      assert(got == want.toDouble, s"case $ci: got $got want $want")
    }
  }

  test("radius_ptwise with self-inclusion (test_many.py:1112-1133)") {
    import spark.implicits._
    val df = Seq((1L, 0.1, 0.1, 0.1), (2L, 0.2, 0.3, 0.4),
      (3L, 5.0, 10.0, 11.0)).toDF("id", "val1", "val2", "val3")
    val got = graft.knn.KnnOps.radiusPtwise(df, col("id"),
        Seq(col("val1"), col("val2"), col("val3")), r = 0.3,
        metric = "sql2", includeSelf = true)
      .orderBy("id").select("radius_ids").collect()
      .map(_.getSeq[Long](0).toSeq).toSeq
    assert(got == Seq(Seq(1L, 2L), Seq(2L, 1L), Seq(3L)))
  }

  test("combinations per group and null-dropping product " +
      "(test_many.py:1512-1546)") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5))
      .toDF("category", "values")
      .withColumn("o", monotonically_increasing_id())
    val combos = graft.ops.SeqOps.combinations2(df, col("values"),
        col("o"), Seq("category"))
      .orderBy("category", "c1", "c2")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(combos.toSeq == Seq(("a", 1, 2), ("a", 1, 3), ("a", 2, 3),
      ("b", 4, 5)))
    // unique=True on the category column: distinct first
    val uniq = graft.ops.SeqOps.combinations2(
        df.select(col("category")).distinct()
          .withColumn("o", col("category")),
        col("category"), col("o"), Seq.empty[String])
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(uniq.toSeq == Seq(("a", "b")))
    val prod = graft.ops.SeqOps.product(
        Seq(Some(1), None, None).toDF("a"), col("a"),
        Seq(1, 2, 3).toDF("b"), col("b"))
      .orderBy("p1", "p2").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(prod.toSeq == Seq((1, 1), (1, 2), (1, 3)))
  }

  test("lin_reg return_pred with null_policy=skip " +
      "(test_linear_exprs.py:410-432)") {
    import spark.implicits._
    val df = Seq((None: Option[Double], 1.0, 1.0),
      (Some(9.5), 9.0, 0.5), (Some(10.5), 10.0, 0.5),
      (Some(11.5), 11.0, 0.5), (Some(12.5), 12.0, 0.5))
      .toDF("y", "a", "b").withColumn("o", monotonically_increasing_id())
    val got = graft.ops.LinRegOps.linRegPred(df,
        Seq(col("a"), col("b")), col("y"))
      .orderBy("o").select("pred", "resid").collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1),
      "skipped row must carry null pred/resid")
    val want = Seq(9.5, 10.5, 11.5, 12.5)
    (1 to 4).foreach { i =>
      assert(math.abs(got(i).getDouble(0) - want(i - 1)) < 1e-9,
        s"pred $i")
      assert(math.abs(got(i).getDouble(1)) < 1e-9, s"resid $i")
    }
  }

  test("impute mean/median matches sklearn SimpleImputer vector " +
      "(test_transforms.py:268-296)") {
    import spark.implicits._
    import graft.pipeline.Blueprint
    val df = Seq((Some(1.0), Some(3.0)), (None, None), (Some(2.0), None),
      (Some(3.0), Some(3.0)), (Some(3.0), Some(2.0)), (Some(3.0), Some(2.0)),
      (Some(3.0), Some(1.0)), (Some(4.0), Some(4.0))).toDF("a", "b")
    val mean = Blueprint(df).impute(Seq("a", "b"), "mean")
      .fitTransform(df).collect()
    assert(math.abs(mean(1).getDouble(0) - 19.0 / 7.0) < 1e-12)
    assert(math.abs(mean(1).getDouble(1) - 2.5) < 1e-12)
    assert(math.abs(mean(2).getDouble(1) - 2.5) < 1e-12)
    val med = Blueprint(df).impute(Seq("a", "b"), "median")
      .fitTransform(df).collect()
    assert(med(1).getDouble(0) == 3.0)  // median of 7 values
    assert(med(1).getDouble(1) == 2.5)  // even count: midpoint, sklearn
  }

  test("GLM with max_iter=1 stays finite (test_linear_models.py:256)") {
    import spark.implicits._
    val df = (0 until 200).map { i =>
      val x = math.sin(i * 2.39996) // low-discrepancy-ish in [-1,1]
      val y = math.exp(math.min(math.max(x * 0.2, -2.0), 2.0)) +
        (i % 7) * 0.1
      (x, y)
    }.toDF("x", "y")
    val glm = new graft.linear.GLM("poisson", maxIter = 1, tol = 1e-12)
      .fit(df, Seq(col("x")), col("y"))
    assert(glm.coeffs != null && glm.coeffs.forall(c =>
      !c.isNaN && !c.isInfinite))
  }

  test("rank_hot_encode with a user ranking, unknowns null " +
      "(test_transforms.py:296-343)") {
    import spark.implicits._
    import graft.pipeline.Blueprint
    val df = Seq(Some("bad"), Some("bad"), Some("good"), Some("neutral"),
      Some("neutral"), Some("neutral"), Some("bad"), Some("good"), None,
      Some("unknown")).toDF("col")
    val out = Blueprint(df)
      .rankHotEncode("col", Seq("bad", "neutral", "good"), "_ge_")
      .fitTransform(df)
    assert(out.columns.toSeq ==
      Seq("col", "col_ge_neutral", "col_ge_good"))
    def ind(r: org.apache.spark.sql.Row, i: Int): Any =
      if (r.isNullAt(i)) null else r.getInt(i)
    val got = out.collect().map(r => (ind(r, 1), ind(r, 2))).toSeq
    val want = Seq((0, 0), (0, 0), (1, 1), (1, 0), (1, 0), (1, 0),
      (0, 0), (1, 1), (null, null), (null, null))
    assert(got == want, s"got $got")
  }

  test("one_hot_encode naming/null/drop_first options " +
      "(test_transforms.py:150-172)") {
    import spark.implicits._
    import graft.pipeline.Blueprint
    val df = Seq(None, Some("a"), Some("a"), Some("c"), Some("d"),
      Some("a"), Some("a"), None, Some("b"), Some("c"))
      .zipWithIndex.map { case (b, i) => (i + 1, b) }.toDF("a", "b")
    val t1 = Blueprint(df).oneHotEncode(Seq("b")).fitTransform(df)
    assert(t1.columns.toSeq == Seq("a", "b", "b_a", "b_b", "b_c", "b_d"))
    val t2 = Blueprint(df).oneHotEncode(Seq("b"), sep = "|")
      .fitTransform(df)
    assert(t2.columns.toSeq == Seq("a", "b", "b|a", "b|b", "b|c", "b|d"))
    val t3 = Blueprint(df).oneHotEncode(Seq("b"), dropFirst = true,
      sep = "|").fitTransform(df)
    assert(t3.columns.toSeq == Seq("a", "b", "b|b", "b|c", "b|d"))
    // nulls are never encoded: null rows have 0 in every indicator
    val nullRows = t1.filter(col("b").isNull)
      .select(col("b_a") + col("b_b") + col("b_c") + col("b_d"))
      .collect().map(_.getInt(0)).toSeq
    assert(nullRows == Seq(0, 0))
  }

  test("polynomial_features degree-2 column set " +
      "(test_transforms.py:100-123)") {
    import spark.implicits._
    import graft.pipeline.Blueprint
    val df = Seq((2.0, 3.0), (5.0, 7.0)).toDF("x1", "x2")
    val full = Blueprint(df).polynomialFeatures(Seq("x1", "x2"))
      .fitTransform(df)
    assert(full.columns.toSeq ==
      Seq("x1", "x2", "x1_x_x1", "x1_x_x2", "x2_x_x2"))
    val r = full.orderBy("x1").collect()(0)
    assert(r.getDouble(2) == 4.0 && r.getDouble(3) == 6.0 &&
      r.getDouble(4) == 9.0)
    val inter = Blueprint(df).polynomialFeatures(Seq("x1", "x2"),
      interactionOnly = true).fitTransform(df)
    assert(inter.columns.toSeq == Seq("x1", "x2", "x1_x_x2"))
  }

  test("linear_impute fits no-bias OLS on skip-null rows (test_transforms.py:34-49)") {
    import spark.implicits._
    import graft.pipeline.Blueprint
    val a = Seq(3, 2, 3, 4, 5, 6, 7, 8, 9, 11).map(_.toDouble)
    val b = (1 to 10).map(_.toDouble)
    val c = a.zip(b).map { case (x, y) => Some(x + y) }
      .updated(2, None: Option[Double])
    val df = a.indices.map(i => (a(i), b(i), c(i))).toDF("a", "b", "c")
    val pipe = Blueprint(df).linearImputeMulti("c", Seq("a", "b"))
      .materialize()
    val got = pipe.transform(df).select("c").collect()
      .map(_.getDouble(0)).toSeq
    val exp = a.zip(b).map { case (x, y) => x + y }
    got.zip(exp).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"$got") }
  }

  test("winsorize 'nearest' and robust_scale 'midpoint' quantile " +
      "conventions (test_transforms.py:79-100,125-150; transforms.py:" +
      "238,279)") {
    import spark.implicits._
    import graft.pipeline.Blueprint
    val df = (1 to 10).map(_.toDouble).toDF("x")
    // n=10, q=0.25 → idx=2.25 → nearest rank 2 → 3.0; q=0.75 →
    // idx=6.75 → rank 7 → 8.0. Linear interpolation would clip at
    // 3.25/7.75 instead — this pins the polars 'nearest' default.
    val w = Blueprint(df).winsorize(Seq("x"), 0.25, 0.75)
      .fitTransform(df).agg(min("x"), max("x")).head
    assert(w.getDouble(0) == 3.0 && w.getDouble(1) == 8.0)
    // robust_scale subtracts the LOW quantile (not the median) and
    // defaults to 'midpoint': q1=(3+4)/2=3.5, q3=(7+8)/2=7.5 →
    // (x−3.5)/4
    val r = Blueprint(df).robustScale(Seq("x"))
      .fitTransform(df).agg(min("x"), max("x")).head
    assert(math.abs(r.getDouble(0) - (1.0 - 3.5) / 4.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - (10.0 - 3.5) / 4.0) < 1e-12)
    // explicit 'linear' matches the old interpolating convention
    val rl = Blueprint(df).robustScale(Seq("x"), 0.25, 0.75, "linear")
      .fitTransform(df).agg(min("x")).head
    assert(math.abs(rl.getDouble(0) - (1.0 - 3.25) / 4.5) < 1e-12)
  }

  test("scale 'standard' divides by the population std and leaves " +
      "degenerate columns alone (test_transforms.py:241-265; " +
      "transforms.py:198,204)") {
    import spark.implicits._
    import graft.pipeline.Blueprint
    val df = Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0), (4.0, 7.0))
      .toDF("x", "k")
    val out = Blueprint(df).scale(Seq("x", "k"), "standard")
      .fitTransform(df).orderBy("x").collect()
    // sklearn StandardScaler: mean 2.5, std(ddof=0)=sqrt(1.25)
    val sd = math.sqrt(1.25)
    assert(math.abs(out(0).getDouble(0) - (1.0 - 2.5) / sd) < 1e-12)
    assert(math.abs(out(3).getDouble(0) - (4.0 - 2.5) / sd) < 1e-12)
    // zero-std column untransformed (NOT divided by zero)
    assert(out.forall(_.getDouble(1) == 7.0))
    // min==max likewise for min_max scaling
    val mm = Blueprint(df).scale(Seq("k"), "min_max")
      .fitTransform(df).agg(min("k")).head
    assert(mm.getDouble(0) == 7.0)
  }

  test("kaplan_meier hand-computed curve incl. censored ties and " +
      "censored-only times (test_survival.py:7-25; kaplan_meier.rs:12)") {
    import spark.implicits._
    // sksurv convention the reference mirrors: EVERY distinct time
    // gets a row; censored rows leave the risk set without an event,
    // so a censored-only time repeats the previous probability.
    //   t=1 event | t=2 censor+event (tie) | t=3 censor only
    //   t=5 two events | t=6 censor only
    val rows = Seq((1.0, 1), (2.0, 0), (2.0, 1), (3.0, 0),
      (5.0, 1), (5.0, 1), (6.0, 0))
    val df = rows.toDF("t", "status").withColumn("g", lit("a"))
    val got = graft.ops.TSOps.kaplanMeier(df, col("t"), col("status"),
        Seq("g")).orderBy("time")
      .select("time", "survival").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    // S: 6/7, ×5/6=5/7, ×1, ×(1-2/3)=5/21, ×1
    val exp = Seq(1.0 -> 6.0 / 7, 2.0 -> 5.0 / 7, 3.0 -> 5.0 / 7,
      5.0 -> 5.0 / 21, 6.0 -> 5.0 / 21)
    assert(got.map(_._1) == exp.map(_._1))
    got.zip(exp).foreach { case ((_, g), (_, e)) =>
      assert(math.abs(g - e) < 1e-12, s"$got") }
  }
}
