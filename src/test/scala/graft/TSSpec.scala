package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.LempelZivAgg
import graft.ops.TSOps

class TSSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def approx(a: Double, b: Double, tol: Double = 1e-9) =
    math.abs(a - b) <= tol

  test("streaks: gaps-and-islands on a known sequence") {
    import spark.implicits._
    // cond: T T F T T T F -> streaks of 2 and 3
    val df = Seq(true, true, false, true, true, true, false).zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toDF("o", "c")
      .withColumn("g", lit("a"))
    val r = TSOps.streaks(df, col("c"), col("o"), Seq("g")).collect()(0)
    assert(r.getAs[Long]("longest_streak") == 3L)
    assert(approx(r.getAs[Double]("avg_streak"), 2.5))
    assert(r.getAs[Long]("n_streaks") == 2L)
  }

  test("trapz integrates y=x over [0,3] to 4.5") {
    import spark.implicits._
    val df = Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (3.0, 3.0))
      .toDF("x", "y").withColumn("g", lit("a"))
    val r = TSOps.trapz(df, col("y"), col("x"), Seq("g")).collect()(0)
    assert(approx(r.getAs[Double]("trapz"), 4.5))
  }

  test("entropy of uniform 4-way distribution = ln 4") {
    import spark.implicits._
    val df = Seq(1, 2, 3, 4).toDF("x").withColumn("g", lit("a"))
    val r = TSOps.entropy(df, col("x"), Seq("g")).collect()(0)
    assert(approx(r.getAs[Double]("entropy"), math.log(4.0)))
  }

  test("LZ76 complexity matches independent-implementation goldens") {
    import spark.implicits._
    def run(bits: String): Double = {
      val df = bits.zipWithIndex
        .map { case (ch, i) => (i.toLong, ch == '1') }
        .toSeq.toDF("o", "b").withColumn("g", lit("a"))
      df.groupBy("g").agg(
        LempelZivAgg.lempelZiv(col("o"), col("b"), asRatio = false)
          .as("c")).collect()(0).getAs[Double]("c")
    }
    // dictionary-parse variant (the reference's lempel_ziv.rs, the
    // tsfresh convention — NOT the Kaspar-Schuster LZ76 scan):
    // hand-parsed phrase sets
    // 0|00|1|10|100|1000|101
    assert(run("0001101001000101") == 7.0)
    // 0|00
    assert(run("0000") == 2.0)
    // 0|1|01|010|10|101
    assert(run("010101010101") == 6.0)
    // 1|0|11|01|010|00|10
    assert(run("1011010100010") == 7.0)
  }

  test("kaplanMeier: all-event cohort steps 2/3, 1/3, 0") {
    import spark.implicits._
    val df = Seq((1.0, 1), (2.0, 1), (3.0, 1)).toDF("t", "s")
      .withColumn("g", lit("a"))
    val r = TSOps.kaplanMeier(df, col("t"), col("s"), Seq("g"))
      .orderBy("time").collect()
    assert(approx(r(0).getAs[Double]("survival"), 2.0 / 3))
    assert(approx(r(1).getAs[Double]("survival"), 1.0 / 3))
    assert(approx(r(2).getAs[Double]("survival"), 0.0, 1e-12))
  }

  test("lagFeatures is_increasing on monotone data") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("o", "x")
      .withColumn("g", lit("a"))
    val r = TSOps.lagFeatures(df, col("x"), col("o"), Seq("g")).collect()(0)
    assert(r.getAs[Boolean]("is_increasing"))
    assert(!r.getAs[Boolean]("is_decreasing"))
    assert(approx(r.getAs[Double]("mean_abs_change"), 1.0))
    // strict: 1,2,3,4 is strictly increasing
    assert(r.getAs[Boolean]("is_increasing_strict"))
    // flat run breaks strict but not weak monotonicity
    val flat = Seq(1.0, 2.0, 2.0, 3.0).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("o", "x")
      .withColumn("g", lit("a"))
    val rf = TSOps.lagFeatures(flat, col("x"), col("o"), Seq("g"))
      .collect()(0)
    assert(rf.getAs[Boolean]("is_increasing"))
    assert(!rf.getAs[Boolean]("is_increasing_strict"))
  }

  test("autoCorr options agree with lagFeatures and the raw mean form " +
      "(ts_features.py:393)") {
    import spark.implicits._
    val xs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x, "g") }
      .toDF("o", "x", "g")
    // ddof=0 normalized at lag 1 must equal lagFeatures' auto_corr
    val a1 = TSOps.autoCorr(df, col("x"), col("o"), Seq("g"), 1)
      .collect()(0).getAs[Double]("auto_corr")
    val a2 = TSOps.lagFeatures(df, col("x"), col("o"), Seq("g"))
      .collect()(0).getAs[Double]("auto_corr")
    assert(approx(a1, a2, 1e-12))
    // normalize=false = mean of x_i·x_{i+lag}
    val raw = TSOps.autoCorr(df, col("x"), col("o"), Seq("g"), 2,
      normalize = false).collect()(0).getAs[Double]("auto_corr")
    val exp = xs.dropRight(2).zip(xs.drop(2)).map(p => p._1 * p._2)
    assert(approx(raw, exp.sum / exp.length, 1e-12))
    // ddof=1 scales the denominator by (n−1) var instead of n var
    val d1 = TSOps.autoCorr(df, col("x"), col("o"), Seq("g"), 1,
      ddof = 1).collect()(0).getAs[Double]("auto_corr")
    assert(approx(d1, a1 * (xs.length - 1.0) / xs.length, 1e-9))
  }

  test("streakLengths emits one row per run with polars rle semantics " +
      "(ts_features.py:184)") {
    import spark.implicits._
    val vals = Seq(true, true, false, true, false, false, false, true)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
      .toDF("o", "c", "g")
    val runs = TSOps.streakLengths(df, col("c"), col("o"), Seq("g"))
      .orderBy("run").collect()
    assert(runs.map(_.getAs[Long]("streak_len")).toSeq ==
      Seq(2L, 1L, 1L, 3L, 1L))
    assert(runs.map(_.getAs[Boolean]("value")).toSeq ==
      Seq(true, false, true, false, true))
  }

  test("nelsonAalen: hand-computed hazard steps with censoring") {
    import spark.implicits._
    // t=1 event (3 at risk), t=2 one event + one censored (2 at risk):
    // H(1) = 1/3, H(2) = 1/3 + 1/2 = 5/6
    val df = Seq((1.0, 1), (2.0, 1), (2.0, 0)).toDF("t", "s")
      .withColumn("g", lit("a"))
    val r = graft.ops.TSOps.nelsonAalen(df, col("t"), col("s"),
      Seq("g")).orderBy("time").collect()
    assert(math.abs(r(0).getAs[Double]("cum_hazard") - 1.0 / 3) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("cum_hazard") - 5.0 / 6) < 1e-12)
  }

  test("logRank: hand-computed O/E/chi2 and 1-df p identity") {
    import spark.implicits._
    // arm1: events at 1, 2; arm2: event at 1, censored at 3.
    // t=1: e1 = 2·2/4 = 1, v = 1/3; t=2: e1 = 0.5, v = 0.25
    // O1 = 2, E1 = 1.5, V = 7/12 → chi2 = 0.25/(7/12) = 3/7
    val df = Seq((1.0, 1, 1), (2.0, 1, 1), (1.0, 1, 0), (3.0, 0, 0))
      .toDF("t", "s", "arm")
    val r = graft.ops.TSOps.logRank(df, col("t"), col("s"),
      col("arm") === 1).collect()(0)
    assert(math.abs(r.getAs[Double]("o1") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("e1") - 1.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("chi2") - 3.0 / 7) < 1e-12)
    // 1-df identity: p = 2·Φ̄(√chi2) ≈ 0.5127 for chi2 = 3/7
    assert(math.abs(r.getAs[Double]("pvalue") - 0.5127) < 1e-3)
    // identical arms → chi2 ~ 0
    val same = Seq((1.0, 1, 1), (2.0, 1, 1), (1.0, 1, 0), (2.0, 1, 0))
      .toDF("t", "s", "arm")
    val rs = graft.ops.TSOps.logRank(same, col("t"), col("s"),
      col("arm") === 1).collect()(0)
    assert(math.abs(rs.getAs[Double]("chi2")) < 1e-12)
  }
}
