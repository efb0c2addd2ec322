package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.eda.EdaOps
import graft.sample.SampleOps

class EdaSampleSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("volumeNeutral equalizes to the smallest group") {
    import spark.implicits._
    val df = (Seq.fill(30)("a") ++ Seq.fill(10)("b") ++ Seq.fill(20)("c"))
      .zipWithIndex.toDF("g", "i")
    val out = SampleOps.volumeNeutral(df, Seq("g"))
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 10L, "b" -> 10L, "c" -> 10L))
  }

  test("volumeNeutral: target caps at the smallest group; control " +
      "groups get independent caps") {
    import spark.implicits._
    val df = (Seq.fill(30)("a") ++ Seq.fill(10)("b") ++ Seq.fill(20)("c"))
      .zipWithIndex.toDF("g", "i")
    // reference: target = min_horizontal(min group count, target_volume)
    // — a target larger than the smallest group still equalizes to it
    val big = SampleOps.volumeNeutral(df, Seq("g"), target = Some(1000))
      .groupBy("g").count().collect().map(_.getLong(1))
    assert(big.toSeq == Seq(10L, 10L, 10L))
    val small = SampleOps.volumeNeutral(df, Seq("g"), target = Some(5))
      .groupBy("g").count().collect().map(_.getLong(1))
    assert(small.toSeq == Seq(5L, 5L, 5L))
    // control: per-control min (ctrl x: min(6,2)=2 each; ctrl y: 8 each)
    val df2 = ((Seq.fill(6)(("x", "a")) ++ Seq.fill(2)(("x", "b")) ++
      Seq.fill(8)(("y", "a")) ++ Seq.fill(9)(("y", "b"))))
      .zipWithIndex.map { case ((ctl, g), i) => (ctl, g, i) }
      .toDF("ctl", "g", "i")
    val out = SampleOps.volumeNeutral(df2, Seq("g"), control = Seq("ctl"))
      .groupBy("ctl", "g").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("x", "a") -> 2L, ("x", "b") -> 2L,
      ("y", "a") -> 8L, ("y", "b") -> 8L))
  }

  test("downsampleWhere: exact-n and fraction conditions; " +
      "unmatched rows pass through") {
    import spark.implicits._
    val df = (1 to 300).map(i =>
      (i, if (i <= 100) "A" else if (i <= 200) "B" else "C"))
      .toDF("i", "cat")
    val out = SampleOps.downsampleWhere(df, Seq(
      (col("cat") === "A", Left(10)),
      (col("cat") === "B", Right(0.5))))
    val counts = out.groupBy("cat").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("A") == 10L)            // exact n
    assert(counts("B") > 20L && counts("B") < 80L) // Bernoulli ~50
    assert(counts("C") == 100L)           // untouched
  }

  test("splitByRatio labels partition the frame with stable counts") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i, if (i % 2 == 0) "x" else "y"))
      .toDF("i", "s")
    val out = SampleOps.splitByRatio(df,
      Seq(("train", 0.8), ("test", 0.2)), stratifyBy = Seq("s"))
    assert(out.count() == 100)
    val counts = out.groupBy("s", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // per stratum n=50: count(pr <= 0.8) = #{r: (r-1)/49 <= 0.8} = 40
    assert(counts(("x", "train")) == 40L)
    assert(counts(("x", "test")) == 10L)
    assert(counts(("y", "train")) == 40L)
  }

  test("sampleN returns exactly n distinct rows") {
    import spark.implicits._
    val df = (1 to 1000).toDF("i")
    val s = SampleOps.sampleN(df, 37)
    assert(s.count() == 37)
    assert(s.distinct().count() == 37)
  }

  test("inferProb flags [0,1]-bounded columns only") {
    import spark.implicits._
    val df = Seq((0.2, 1.5, 0.0), (0.9, 0.4, 1.0), (0.5, -0.1, 0.7))
      .toDF("p", "notp", "edge")
    assert(graft.eda.EdaOps.inferProb(df,
      Seq("p", "notp", "edge")) == Seq("p", "edge"))
  }

  test("specialValuesReport counts nan/null/zero") {
    import spark.implicits._
    val df = Seq(Some(0.0), Some(1.0), None, Some(Double.NaN),
      Some(Double.PositiveInfinity)).toDF("x")
    val r = EdaOps.specialValuesReport(df, Seq("x")).head
    assert(r.getLong(1) == 1L)  // null
    assert(r.getLong(2) == 1L)  // inf
    assert(r.getLong(3) == 1L)  // nan
    assert(r.getLong(4) == 1L)  // zero
  }

  test("inferReport flags const/binary/discrete with polars n_unique " +
      "convention (diagnosis.py:521-675)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (1, i % 2, i % 5, i,
        if (i <= 99) Some(1) else None)).toDF(
      "c", "b", "d", "u", "cn")
    val m = EdaOps.inferReport(df, Seq("c", "b", "d", "u", "cn"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4)))).toMap
    assert(m("c") == ((1L, true, false, true)))
    assert(m("b") == ((2L, false, true, true)))
    assert(m("d") == ((5L, false, false, true)))
    // u: 100 distinct — NOT < max_val_cnt=100 (strict), NOT < 0.1·100
    assert(m("u") == ((100L, false, false, false)))
    // cn: one value + nulls → n_unique 2 (null counts), binary under
    // the default include_null=false; const only when includeNull
    assert(m("cn") == ((2L, false, true, true)))
    val mi = EdaOps.inferReport(df, Seq("cn"), includeNull = true)
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(mi("cn") == ((true, true)))
  }

  test("nullCorr: pairwise null-indicator corr, invalid columns " +
      "skipped (diagnosis.py:342)") {
    import spark.implicits._
    // x null iff i%2=0; y null iff i%2=1 (perfect anti-correlation);
    // z never null and w all null -> both excluded from every pair
    val df = (1 to 20).map { i =>
      (if (i % 2 == 0) None else Some(i.toDouble),
        if (i % 2 == 1) None else Some(i.toDouble),
        i.toDouble, None: Option[Double])
    }.toDF("x", "y", "z", "w")
    val out = EdaOps.nullCorr(df, Seq("x", "y", "z", "w")).collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "x" && out(0).getString(1) == "y")
    assert(math.abs(out(0).getDouble(2) - (-1.0)) < 1e-12)
  }

  test("numericProfile reference fields: IQR fence outliers and " +
      "histogram bins (diagnosis.py:122)") {
    import spark.implicits._
    // 1..100 plus one far outlier; q1=25.75, q3=75.25 over 1..100+1000
    val df = ((1 to 100).map(_.toDouble) :+ 1000.0).toDF("x")
    val r = EdaOps.numericProfile(df, Seq("x"), nBins = 10,
      histogram = true).head
    assert(r.getLong(1) == 101L)            // non_null_cnt
    assert(r.getDouble(2) == 0.0)           // null_pct
    assert(r.getLong(11) == 1L)             // outlier_cnt: just 1000
    val hist = r.getSeq[Long](12)
    assert(hist.length == 10)
    assert(hist.sum == 101L)
    assert(hist.last == 1L)                 // 1000 alone in the top bin
    assert(hist.head == 100L)               // 1..100 all in bin 0 of 0..999
  }

  test("corrTable: spearman/kendall wide table matches the pair " +
      "kernels (diagnosis.py:437)") {
    import spark.implicits._
    val df = (1 to 50).map { i =>
      (i.toDouble, (i * i).toDouble, (51 - i).toDouble)
    }.toDF("a", "b", "c")
    val sp = EdaOps.corrTable(df, Seq("a"), Seq("a", "b", "c"),
      "spearman").head
    // monotone transforms: spearman = 1 / 1 / -1 exactly
    assert(math.abs(sp.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(sp.getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(sp.getDouble(3) + 1.0) < 1e-12)
    val kd = EdaOps.corrTable(df, Seq("a"), Seq("b", "c"), "kendall").head
    assert(math.abs(kd.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(kd.getDouble(2) + 1.0) < 1e-12)
  }

  test("sampleNWithReplacement draws exactly n rows incl. repeats") {
    import spark.implicits._
    val df = (1 to 10).toDF("v")
    val out = graft.sample.SampleOps.sampleNWithReplacement(df, 100, 7)
      .collect().map(_.getInt(0))
    assert(out.length == 100)
    assert(out.forall(v => v >= 1 && v <= 10))
    // with 100 draws from 10 values, some value repeats w.p. ~1
    assert(out.distinct.length < out.length)
    // deterministic under the seed
    val again = graft.sample.SampleOps.sampleNWithReplacement(df, 100, 7)
      .collect().map(_.getInt(0))
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("colValidation keeps only failed rules, one action " +
      "(diagnosis.py:236)") {
    import spark.implicits._
    val df = Seq((1.0, 5.0), (2.0, 6.0), (3.0, 100.0)).toDF("a", "b")
    val got = EdaOps.colValidation(df, Seq(
        ("a", max(col("a")) <= 3.0, "a exceeds 3"),
        ("b", max(col("b")) <= 10.0, "b exceeds 10"),
        ("a", min(col("a")) > 0.0, "a not positive")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("b", "b exceeds 10")))
  }

  test("rowValidation reports violating rows with reasons " +
      "(diagnosis.py:268)") {
    import spark.implicits._
    val df = Seq((1L, 5.0, Some(1.0)), (2L, -1.0, Some(2.0)),
      (3L, 2.0, None)).toDF("id", "x", "z")
    val first = EdaOps.rowValidation(df, Seq(
        (col("x") > 0.0, "x not positive"),
        (col("z").isNotNull, "z missing")),
      idCol = Some(col("id")))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(first == Seq((2L, "x not positive"), (3L, "z missing")))
    val all = EdaOps.rowValidation(df, Seq(
        (col("x") > 0.0, "x not positive"),
        (col("z") > 1.5, "z too small or missing")),
      idCol = Some(col("id")), allReasons = true)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toSeq
    assert(all == Seq((1L, Seq("z too small or missing")),
      (2L, Seq("x not positive")), (3L, Seq("z too small or missing"))))
  }

  test("dependencyScore is 0 when y determines x") {
    import spark.implicits._
    val df = (1 to 60).map(i => (i % 6, i % 3)).toDF("y", "x")
    // x = y mod 3 → y determines x
    val d = EdaOps.dependencyScore(df, col("x"), col("y"))
    assert(math.abs(d) < 1e-12)
  }

  test("epochShuffle: same epoch reproduces, different epochs differ") {
    import graft.sample.SampleOps
    val df = spark.range(0, 500).toDF("id")
    def order(epoch: Int): Seq[Long] =
      SampleOps.epochShuffle(df, col("id"), epoch)
        .collect().map(_.getLong(0)).toSeq
    val e1a = order(1)
    assert(e1a == order(1), "same epoch must be byte-identical")
    assert(e1a != order(2), "different epochs must permute differently")
    assert(e1a.sorted == (0L until 500L), "it is a permutation")
    // positions are the exact 1-based ranks of the shuffle order
    val pos = SampleOps.epochShufflePositions(df, col("id"), 1)
      .orderBy("position").collect().map(_.getLong(0)).toSeq
    assert(pos == e1a, "positions must match the shuffle order")
  }

  test("temperatureSample: integer-weight targets and hash-min prefix") {
    import spark.implicits._
    val rows = (0 until 100).map(i => (i.toLong, "a")) ++
      (100 until 500).map(i => (i.toLong, "b")) ++
      (500 until 525).map(i => (i.toLong, "c"))
    val df = rows.toDF("id", "dom")
    // w = floor(sqrt(n)) = (10, 20, 5); W = 35; t = 60*w/35 (floor)
    val out = SampleOps.temperatureSample(df, col("id"), col("dom"),
      alpha = 0.5, targetTotal = 60, seed = 7)
    val got = out.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 17L, "b" -> 34L, "c" -> 8L))
    // selection = the t_d smallest md5(id ":7") per domain
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String = md.digest(s"$id:7".getBytes)
      .map("%02x".format(_)).mkString
    val want = rows.groupBy(_._2).flatMap { case (dom, g) =>
      val t = Map("a" -> 17, "b" -> 34, "c" -> 8)(dom)
      g.map(_._1).sortBy(h).take(t)
    }.toSet
    val gotIds = out.select("id").collect().map(_.getLong(0)).toSet
    assert(gotIds == want)
    // partition-layout independence
    val out2 = SampleOps.temperatureSample(df.repartition(7), col("id"),
      col("dom"), alpha = 0.5, targetTotal = 60, seed = 7)
    assert(out2.select("id").collect().map(_.getLong(0)).toSet == want)
  }

  test("temperatureSample: alpha endpoints") {
    import spark.implicits._
    val rows = (0 until 90).map(i => (i.toLong, "big")) ++
      (90 until 100).map(i => (i.toLong, "small"))
    val df = rows.toDF("id", "dom")
    // alpha = 1: natural proportions (w = n)
    val nat = SampleOps.temperatureSample(df, col("id"), col("dom"),
        alpha = 1.0, targetTotal = 50)
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nat == Map("big" -> 45L, "small" -> 5L))
    // alpha = 0: uniform (w = 1 each)
    val uni = SampleOps.temperatureSample(df, col("id"), col("dom"),
        alpha = 0.0, targetTotal = 20)
      .groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("big" -> 10L, "small" -> 10L))
  }

  test("hashSplit: row-stable, leakage-free by group, near-ratio, " +
    "map-only plan") {
    import spark.implicits._
    val ratios = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val df = spark.range(20000).select(col("id"),
      (col("id") % 500).as("grp"))
    val sp = SampleOps.hashSplit(df, col("grp"), ratios, seed = 7)
    // proportions in expectation (500 groups, binomial noise)
    val counts = sp.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.08)
    assert(counts.values.sum == 20000L)
    // group-aware: every group entirely in one split
    val leaky = sp.groupBy("grp")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1)
      .count()
    assert(leaky == 0L)
    // row-stability: assignments on a half-subset are identical
    val half = SampleOps.hashSplit(df.filter(col("id") < 10000),
      col("grp"), ratios, seed = 7)
    val joined = sp.filter(col("id") < 10000).as("a")
      .join(half.as("b"), "id")
      .filter(col("a.split") =!= col("b.split")).count()
    assert(joined == 0L)
    // different seed reshuffles some groups
    val reseeded = SampleOps.hashSplit(df, col("grp"), ratios, seed = 8)
    assert(sp.as("a").join(reseeded.as("b"), "id")
      .filter(col("a.split") =!= col("b.split")).count() > 0L)
    // no shuffle: split assignment is a pure projection
    val plan = sp.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // bound literals: 12 lowercase hex chars, monotone
    assert(SampleOps.hashSplitBound(0.8).length == 12)
    assert(SampleOps.hashSplitBound(0.8) <
      SampleOps.hashSplitBound(0.9))
    assert(SampleOps.hashSplitBound(1.0 - 1e-15) == "ffffffffffff")
  }
}
