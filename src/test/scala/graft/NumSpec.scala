package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NumFuncs
import graft.ops.EncodeOps

class NumSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean = {
    val ok = math.abs(a - b) <= tol
    if (!ok) info(s"got $a expected $b")
    ok
  }

  test("horizontal norms on a hand row") {
    import spark.implicits._
    val df = Seq((3.0, -4.0, 1.0)).toDF("a", "b", "c")
    val r = df.select(
      NumFuncs.l1Horizontal(col("a"), col("b"), col("c")),
      NumFuncs.l2SqHorizontal(col("a"), col("b"), col("c")),
      NumFuncs.lInfHorizontal(col("a"), col("b"), col("c"))).head
    assert(r.getDouble(0) == 8.0)
    assert(r.getDouble(1) == 26.0)
    assert(r.getDouble(2) == 4.0)
  }

  test("array math: dot, l1, sql2, linf, cosine, jaccard, softmax") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(3.0, 1.0, 0.0))).toDF("a", "b")
    val r = df.select(
      NumFuncs.arrDot(col("a"), col("b")),
      NumFuncs.arrL1Dist(col("a"), col("b")),
      NumFuncs.arrSql2Dist(col("a"), col("b")),
      NumFuncs.arrLInfDist(col("a"), col("b")),
      NumFuncs.arrCosineSim(col("a"), col("b"))).head
    assert(r.getDouble(0) == 5.0)
    assert(r.getDouble(1) == 6.0)       // 2 + 1 + 3
    assert(r.getDouble(2) == 14.0)      // 4 + 1 + 9
    assert(r.getDouble(3) == 3.0)
    assert(approx(r.getDouble(4), 5.0 / math.sqrt(14.0 * 10.0)))

    val j = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y")
      .select(NumFuncs.jaccardRow(col("x"), col("y"))).head.getDouble(0)
    assert(approx(j, 2.0 / 4.0))

    val sm = df.select(NumFuncs.softmaxArr(col("a"))).head.getSeq[Double](0)
    val ex = Seq(1.0, 2.0, 3.0).map(v => math.exp(v - 3.0))
    val s = ex.sum
    ex.zip(sm).foreach { case (e, g) => assert(approx(g, e / s)) }
  }

  test("special functions match JVM/commons-math goldens") {
    import spark.implicits._
    val df = Seq(0.3).toDF("x")
    val r = df.select(
      NumFuncs.expit(col("x")), NumFuncs.logit(col("x")),
      NumFuncs.sinc(col("x")), NumFuncs.xlogy(lit(0.0), lit(0.0)),
      NumFuncs.exp2(col("x")), NumFuncs.fract(lit(-2.7)),
      NumFuncs.gammaFn(lit(5.5)), NumFuncs.digammaFn(lit(5.5))).head
    assert(approx(r.getDouble(0), 1.0 / (1.0 + math.exp(-0.3))))
    assert(approx(r.getDouble(1), math.log(0.3 / 0.7)))
    assert(approx(r.getDouble(2), math.sin(math.Pi * 0.3) / (math.Pi * 0.3)))
    assert(r.getDouble(3) == 0.0)
    assert(approx(r.getDouble(4), math.pow(2.0, 0.3)))
    assert(approx(r.getDouble(5), -0.7, 1e-12))
    assert(approx(r.getDouble(6), 52.34277778455352, 1e-9))
    // commons-math digamma carries ~1e-8 absolute error vs scipy
    assert(approx(r.getDouble(7), 1.6110931485817511, 1e-7))
  }

  test("gcd/lcm including zero edge") {
    import spark.implicits._
    val df = Seq((12L, 18L), (0L, 5L), (4L, 6L)).toDF("a", "b")
    val g = df.select(NumFuncs.gcdCol(col("a"), col("b")),
      NumFuncs.lcmCol(col("a"), col("b"))).collect()
    assert(g(0).getLong(0) == 6L && g(0).getLong(1) == 36L)
    assert(g(1).getLong(0) == 5L && g(1).getLong(1) == 0L)
    assert(g(2).getLong(0) == 2L && g(2).getLong(1) == 12L)
  }

  test("haversine Paris->London ~343.5 km") {
    import spark.implicits._
    val df = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF(
      "lat1", "lon1", "lat2", "lon2")
    val d = df.select(NumFuncs.haversine(col("lat1"), col("lon1"),
      col("lat2"), col("lon2"))).head.getDouble(0)
    assert(math.abs(d - 343.5) < 1.0)
  }

  test("psiReport buckets sum to 1 on each side and detect no drift") {
    import spark.implicits._
    val base = (1 to 1000).map(_.toDouble).toDF("x")
    val rep = EncodeOps.psiReport(base, col("x"), base, col("x"), 10)
      .collect()
    assert(rep.length == 10)
    val bsum = rep.map(_.getAs[Double]("baseline_pct")).sum
    val psi = rep.map(_.getAs[Double]("psi_bin")).sum
    assert(approx(bsum, 1.0))
    assert(approx(psi, 0.0, 1e-12)) // identical distributions
  }

  test("targetEncode blends toward prior for small categories") {
    import spark.implicits._
    // category a: 100 rows mean 1.0; b: 1 row mean 0.0; prior ~0.9901
    val df = ((1 to 100).map(_ => ("a", 1.0)) :+ (("b", 0.0))).toDF("c", "t")
    val m = EncodeOps.targetEncode(df, col("c"), col("t"), 20, 10.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("a") > 0.99)               // confident: stays near 1.0
    val prior = 100.0 / 101.0
    assert(math.abs(m("b") - prior) < 0.15) // shrunk hard toward prior
  }

  test("woe/iv on a hand case") {
    import spark.implicits._
    // bin x: 3 events, 1 non-event; bin y: 1 event, 3 non-events
    val df = Seq(("x", 1), ("x", 1), ("x", 1), ("x", 0),
      ("y", 1), ("y", 0), ("y", 0), ("y", 0)).toDF("b", "t")
    val woe = EncodeOps.woeDiscrete(df, col("b"), col("t"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // woe_x = ln((4/6)/(2/6)) = ln 2
    assert(approx(woe("x"), math.log(2.0)))
    assert(approx(woe("y"), math.log((2.0 / 6) / (4.0 / 6))))
  }

  test("detrend removes an exact linear trend") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, 3.0 * i + 7.0, "g"))
      .toDF("i", "x", "g")
    val res = EncodeOps.detrend(df, col("x"), col("i"), Seq("g"))
      .agg(sum(abs(col("detrended")))).head.getDouble(0)
    assert(approx(res, 0.0, 1e-8))
  }

  test("horizontal norms with normalize divide by the dimension " +
      "(num.py:74-127)") {
    import spark.implicits._
    val df = Seq((3.0, -4.0)).toDF("a", "b")
    val cols = Seq(col("a"), col("b"))
    val r = df.select(
      NumFuncs.l1Horizontal(cols, normalize = true).as("l1"),
      NumFuncs.l2SqHorizontal(cols, normalize = true).as("l2"),
      NumFuncs.lInfHorizontal(cols, normalize = true).as("li"))
      .head
    assert(approx(r.getDouble(0), 3.5))   // (3+4)/2
    assert(approx(r.getDouble(1), 12.5))  // (9+16)/2
    assert(approx(r.getDouble(2), 2.0))   // 4/2
  }

  test("jaccardCol count_null counts null as a distinct element " +
      "(num.py:487)") {
    import spark.implicits._
    val df = Seq((Some(1), Some(1)), (Some(2), Some(3)),
      (None: Option[Int], Some(3)), (Some(1), None: Option[Int]))
      .toDF("a", "b")
    // sets without nulls: A={1,2}, B={1,3} → 1/3
    val r0 = NumFuncs.jaccardCol(df, col("a"), col("b")).head
    assert(approx(r0.getAs[Double]("jaccard_col"), 1.0 / 3))
    // with nulls: A={1,2,null}, B={1,3,null} → 2/4
    val r1 = NumFuncs.jaccardCol(df, col("a"), col("b"),
      countNull = true).head
    assert(approx(r1.getAs[Double]("jaccard_col"), 0.5))
    assert(r1.getAs[Long]("n_a") == 3L && r1.getAs[Long]("n_b") == 3L)
  }
}
