package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.linear.{ElasticNet, GLM, LR, OnlineLR, Solvers}

class LinearSpec2 extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean = {
    val ok = math.abs(a - b) <= tol
    if (!ok) info(s"got $a expected $b")
    ok
  }

  // shared tiny Gram fixture: X = [[1,0],[0,1],[1,1]], y = [1,2,4]
  private val xtx = Array(Array(2.0, 1.0), Array(1.0, 2.0))
  private val xty = Array(5.0, 6.0)

  test("elasticNet with zero penalties equals OLS") {
    val ols = Solvers.ridge(xtx, xty)
    val en = Solvers.elasticNet(xtx, xty, 0.0, 0.0)
    assert(approx(en(0), ols(0), 1e-10) && approx(en(1), ols(1), 1e-10))
  }

  test("lasso satisfies the KKT conditions") {
    val l1 = 1.5
    val b = Solvers.elasticNet(xtx, xty, l1, 0.0, maxIter = 100000,
      tol = 1e-14)
    // subgradient: g_j = xty_j − (XtX β)_j must satisfy
    // |g_j| ≤ l1 if β_j = 0, g_j = l1·sign(β_j) otherwise
    for (j <- 0 until 2) {
      val g = xty(j) - (0 until 2).map(k => xtx(j)(k) * b(k)).sum
      if (b(j) == 0.0) assert(math.abs(g) <= l1 + 1e-9)
      else assert(approx(g, l1 * math.signum(b(j)), 1e-8),
        s"j=$j g=$g b=${b(j)}")
    }
  }

  test("nnls clamps negative coordinates and matches reduced OLS") {
    // y strongly negative on coord 1: xty = (5, -6)
    val b = Solvers.nnls(xtx, Array(5.0, -6.0))
    assert(b(1) == 0.0)
    assert(approx(b(0), 5.0 / 2.0, 1e-12)) // reduced: 2 b0 = 5
    // unconstrained-feasible case returns plain OLS
    val b2 = Solvers.nnls(xtx, xty)
    val ols = Solvers.ridge(xtx, xty)
    assert(approx(b2(0), ols(0), 1e-12) && approx(b2(1), ols(1), 1e-12))
  }

  test("svdRcond returns the minimum-norm solution for collinear X") {
    // duplicated feature: X cols (x, 2x) → XtX = [[s,2s],[2s,4s]]
    val s = 7.0
    val g = Array(Array(s, 2 * s), Array(2 * s, 4 * s))
    val b = Solvers.svdRcond(g, Array(3.0 * s, 6.0 * s), 1e-10)._1
    // combined coefficient c=3 split min-norm: (3/5, 6/5)
    assert(approx(b(0), 0.6, 1e-9) && approx(b(1), 1.2, 1e-9))
  }

  test("GLM poisson recovers exact exponential coefficients") {
    import spark.implicits._
    val df = (1 to 200).map { i =>
      val x = i / 20.0
      (x, math.exp(0.7 * x - 0.2))
    }.toDF("x", "y")
    val m = new GLM("poisson").fit(df, Seq(col("x")), col("y"))
    assert(approx(m.coeffs(0), 0.7, 1e-8))
    assert(approx(m.coeffs(1), -0.2, 1e-8))
  }

  test("GLM gamma fits the CANONICAL inverse link " +
      "(glm_solvers.rs:33): exact recovery of 1/mu = a*x + b") {
    import spark.implicits._
    val df = (1 to 200).map { i =>
      val x = i / 20.0
      (x, 1.0 / (0.05 * x + 0.4))
    }.toDF("x", "y")
    val m = new GLM("gamma").fit(df, Seq(col("x")), col("y"))
    assert(approx(m.coeffs(0), 0.05, 1e-8))
    assert(approx(m.coeffs(1), 0.4, 1e-8))
    // response-scale vs linear-predictor prediction
    // (linear_models.py:904 GLM.predict(linear=...))
    val p = df.select(m.predict(Seq(col("x"))).as("mu"),
      m.predict(Seq(col("x")), linear = true).as("eta")).head
    assert(approx(p.getDouble(0) * p.getDouble(1), 1.0, 1e-8))
  }

  test("LR/ElasticNet from_values and OnlineLR add/remove round-trip " +
      "(linear_models.py:158,386,651)") {
    import spark.implicits._
    val lr = LR.fromValues(Array(2.0, 3.0), bias = 1.0)
    assert(lr.isFit && lr.bias == 1.0)
    val df = Seq((1.0, 1.0), (2.0, 0.5)).toDF("a", "b")
    val got = df.select(lr.predict(Seq(col("a"), col("b"))).as("p"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(2.0 + 3.0 + 1.0, 4.0 + 1.5 + 1.0))
    val en = ElasticNet.fromValues(Array(1.0), bias = 0.0)
    val got2 = df.select(en.predict(Seq(col("a"))).as("p"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got2 == Seq(1.0, 2.0)) // bias 0 -> no bias column
    // OnlineLR: adding a row then removing it (c = -1) restores beta
    val m = new OnlineLR(2, lambda = 1e-9)
    val rows = Seq((Array(1.0, 0.0), 1.0), (Array(0.0, 1.0), 2.0),
      (Array(1.0, 1.0), 4.0))
    rows.foreach { case (x, y) => m.update(x, y) }
    val b0 = m.beta.clone()
    m.update(Array(3.0, -1.0), 7.0)           // add an extra row
    m.update(Array(3.0, -1.0), 7.0, c = -1.0) // remove it again
    assert(approx(m.beta(0), b0(0), 1e-6) && approx(m.beta(1), b0(1), 1e-6))
  }

  test("LR persistent model predicts exactly on a deterministic line") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toDouble, 3.0 * i + 2.0)).toDF("x", "y")
    val m = new LR().fit(df, Seq(col("x")), col("y"))
    val preds = m.predictDf(df, Seq(col("x")))
      .select(abs(col("prediction") - col("y"))).agg(max("*")).head
    assert(preds.getDouble(0) < 1e-8)
  }

  test("ElasticNet model with small l2 stays near OLS") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toDouble, (i % 7).toDouble,
      2.0 * i + 0.5 * (i % 7) + 1.0)).toDF("a", "b", "y")
    val m = new ElasticNet(0.0, 1e-8).fit(df,
      Seq(col("a"), col("b")), col("y"))
    assert(approx(m.coeffs(0), 2.0, 1e-5))
    assert(approx(m.coeffs(1), 0.5, 1e-4))
    assert(approx(m.coeffs(2), 1.0, 1e-3))
  }

  test("OnlineLR converges to the batch solution") {
    val rngData = (1 to 500).map { i =>
      val x = (i % 23).toDouble
      (Array(x, 1.0), 4.0 * x - 7.0)
    }
    val m = new OnlineLR(2, 1e-9)
    rngData.foreach { case (x, y) => m.update(x, y) }
    assert(approx(m.beta(0), 4.0, 1e-6))
    assert(approx(m.beta(1), -7.0, 1e-4))
  }
}
