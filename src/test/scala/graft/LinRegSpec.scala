package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.LinRegAgg
import graft.ops.LinRegOps

/** Goldens generated with an independent numpy implementation (lstsq /
  * explicit normal equations / IRLS) on the deterministic dataset
  * x1 = i%10, x2 = (7i)%13, noise = ((37i)%11 − 5)/10,
  * y = 2 + 0.5·x1 − 0.3·x2 + noise, i = 0..99. */
class LinRegSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def data = {
    import spark.implicits._
    (0 until 100).map { i =>
      val x1 = (i % 10).toDouble
      val x2 = ((i * 7) % 13).toDouble
      val noise = (((i * 37) % 11) - 5) / 10.0
      (x1, x2, 2 + 0.5 * x1 - 0.3 * x2 + noise,
        if (x1 - x2 + noise * 3 > 0) 1.0 else 0.0)
    }.toDF("x1", "x2", "y", "yl")
  }

  private def approx(a: Double, b: Double, tol: Double = 1e-9) = {
    val ok = math.abs(a - b) <= tol
    if (!ok) info(s"got $a want $b")
    ok
  }

  test("Gram-aggregate OLS matches numpy lstsq incl. report stats") {
    val res = data.agg(LinRegAgg.linReg(
      array(col("x1"), col("x2"), lit(1.0)), col("y"), 3).as("r"))
      .select("r.*").collect()(0)
    val beta = res.getSeq[Double](0)
    val se = res.getSeq[Double](1)
    val t = res.getSeq[Double](2)
    val p = res.getSeq[Double](3)
    assert(approx(beta(0), 0.4980939221463737, 1e-9))
    assert(approx(beta(1), -0.30184489930376707, 1e-9))
    assert(approx(beta(2), 2.014462256233547, 1e-9))
    assert(approx(se(0), 0.01126492398950086, 1e-9))
    assert(approx(se(1), 0.00866921316258305, 1e-9))
    assert(approx(t(0), 44.21635890402878, 1e-6))
    assert(approx(p(0), 4.3119417171779384e-66, 1e-70))
    assert(approx(res.getDouble(4), 0.9691910212061817, 1e-12))
    assert(approx(res.getDouble(5), 0.9685557845300206, 1e-12))
  }

  test("ridge (λ=1, no bias) matches numpy normal equations") {
    val res = data.agg(LinRegAgg.linReg(
      array(col("x1"), col("x2")), col("y"), 2, lambda = 1.0).as("r"))
      .select("r.coeffs").collect()(0).getSeq[Double](0)
    assert(approx(res(0), 0.6808177162958184, 1e-10))
    assert(approx(res(1), -0.15906982171278403, 1e-10))
  }

  test("logistic IRLS matches numpy IRLS") {
    val beta = LinRegOps.logisticFit(data,
      Seq(col("x1"), col("x2")), col("yl"))
    assert(approx(beta(0), 1.9565964973036758, 1e-6))
    assert(approx(beta(1), -1.911686039222589, 1e-6))
    assert(approx(beta(2), -0.8846088843652475, 1e-6))
  }

  test("simple slope/intercept equal the d=1 closed form") {
    val r = data.agg(
      LinRegOps.simpleSlope(col("x1"), col("y")).as("s"),
      LinRegOps.simpleIntercept(col("x1"), col("y")).as("i")).collect()(0)
    // cross-check vs Gram aggregate with [x1, 1]
    val res = data.agg(LinRegAgg.linReg(
      array(col("x1"), lit(1.0)), col("y"), 2).as("r"))
      .select("r.coeffs").collect()(0).getSeq[Double](0)
    assert(approx(r.getDouble(0), res(0), 1e-10))
    assert(approx(r.getDouble(1), res(1), 1e-10))
  }

  test("recursive lin-reg last row equals full-sample fit") {
    import spark.implicits._
    val df = data.withColumn("o", monotonically_increasing_id())
      .withColumn("g", lit("a"))
    val last = LinRegOps.recursiveSimpleLinReg(df, col("x1"), col("y"),
      col("o"), Seq("g")).orderBy(col("o").desc).limit(1).collect()(0)
    val full = data.agg(LinRegOps.simpleSlope(col("x1"), col("y")))
      .collect()(0).getDouble(0)
    assert(approx(last.getAs[Double]("recursive_slope"), full, 1e-9))
  }
}
