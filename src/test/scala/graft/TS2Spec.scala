package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TSOps2

class TS2Spec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean = {
    val ok = math.abs(a - b) <= tol
    if (!ok) info(s"got $a expected $b")
    ok
  }

  test("arCoeffs recovers a pure AR(2) process") {
    import spark.implicits._
    // x_t = 0.5 x_{t-1} - 0.3 x_{t-2} + 2.0, deterministic (no noise):
    // regression must recover the coefficients exactly
    val xs = scala.collection.mutable.ArrayBuffer(1.0, 2.0)
    for (i <- 2 until 300)
      xs += 0.5 * xs(i - 1) - 0.3 * xs(i - 2) + 2.0
    val df = xs.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
      .toDF("i", "x", "g")
    val r = TSOps2.arCoeffs(df, col("x"), col("i"), Seq("g"), 2)
      .select(element_at(col("ar_coeffs"), 1),
        element_at(col("ar_coeffs"), 2),
        element_at(col("ar_coeffs"), 3)).head
    // degenerate: series converges to fixed point 2.5, making the system
    // ill-conditioned — use loose tolerance on recovered dynamics
    assert(math.abs(r.getDouble(0) * xs(100) + r.getDouble(1) * xs(99)
      + r.getDouble(2) - xs(101)) < 1e-6)
  }

  test("sampleEntropySeries on a constant series is degenerate-NaN-free") {
    // constant series, n=50, m=2: B counts all pairs of the n−m+1=49
    // m-templates (reference template convention, ts_features.py:552),
    // A all pairs of the first 48 → SampEn = ln(C(49,2)/C(48,2))
    // = ln(49/47)
    val s = TSOps2.sampleEntropySeries(Seq.fill(50)(1.0), 2, 0.1)
    assert(math.abs(s - math.log(49.0 / 47.0)) < 1e-12, s"s=$s")
  }

  test("sampleEntropySeries matches a hand-checked alternating series") {
    // x = 0,1,0,1,... n=40, r=0.5: templates match iff same parity.
    // B over 39 m-templates (20 even + 19 odd starts):
    // C(20,2)+C(19,2) = 361; A over 38 (19+19): 2·C(19,2) = 342
    val xs = (0 until 40).map(i => (i % 2).toDouble)
    val s = TSOps2.sampleEntropySeries(xs, 2, 0.5)
    assert(math.abs(s - math.log(361.0 / 342.0)) < 1e-12, s"s=$s")
  }

  test("approxEntropySeries: regular series has lower ApEn than irregular") {
    val regular = (0 until 120).map(i => (i % 2).toDouble)
    var seed = 123456789L
    val noisy = (0 until 120).map { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 11).toDouble / (1L << 53).toDouble)
    }
    val sd = { // population-ish scale for r
      val m = noisy.sum / noisy.length
      math.sqrt(noisy.map(v => (v - m) * (v - m)).sum / (noisy.length - 1))
    }
    val aReg = TSOps2.approxEntropySeries(regular, 2, 0.2 * 0.5)
    val aNoise = TSOps2.approxEntropySeries(noisy, 2, 0.2 * sd)
    assert(aReg < aNoise)
  }

  test("knnEntropy1d approaches ln(2a) - psi-corrected uniform entropy") {
    import spark.implicits._
    // uniform on [0,100): differential entropy = ln(100) ≈ 4.605
    var seed = 42L
    val xs = (0 until 4000).map { i =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (i.toLong, ((seed >>> 11).toDouble / (1L << 53).toDouble) * 100.0, "g")
    }
    val df = xs.toDF("i", "x", "g")
    val h = TSOps2.knnEntropy1d(df, col("x"), Seq("g"), 3)
      .head.getAs[Double]("knn_entropy")
    assert(math.abs(h - math.log(100.0)) < 0.1, s"got $h")
  }

  test("subseqSimCount finds an exactly embedded pattern") {
    import spark.implicits._
    val base = Seq(5.0, 9.0, 1.0, 2.0, 3.0, 8.0, 1.0, 2.0, 3.0, 7.0)
    val df = base.zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
      .toDF("i", "x", "g")
    val n = TSOps2.subseqSimCount(df, col("x"), col("i"), Seq("g"),
        Seq(1.0, 2.0, 3.0), 1e-12)
      .head.getAs[Long]("similar_count")
    assert(n == 2L)
  }

  test("seasonalDecompose recovers a planted period-3 pattern exactly " +
      "on a linear trend") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // x_t = 10 + t + s_{t%3}, s = [3, -1, -2] (sums to 0): the
    // centered MA(3) is exactly the linear part, so detrended == s,
    // the phase means are s, centering is a no-op, resid == 0.
    val s = Vector(3.0, -1.0, -2.0)
    val df = (0 until 30).map(i => (i, 10.0 + i + s(i % 3), "g"))
      .toDF("o", "x", "g")
    val out = graft.ops.TSOps2.seasonalDecompose(df, col("x"),
      col("o"), Seq("g"), 3).orderBy("order_key").collect()
    assert(out.length == 30)
    // edges: first and last row lack a full window
    assert(out.head.isNullAt(out.head.fieldIndex("trend")))
    assert(out.last.isNullAt(out.last.fieldIndex("trend")))
    out.drop(1).dropRight(1).foreach { r =>
      val i = r.getAs[Int]("order_key")
      assert(math.abs(r.getAs[Double]("trend") - (10.0 + i)) < 1e-9,
        s"trend@$i")
      assert(math.abs(r.getAs[Double]("seasonal") - s(i % 3)) < 1e-9,
        s"seasonal@$i")
      assert(math.abs(r.getAs[Double]("resid")) < 1e-9, s"resid@$i")
    }
    intercept[IllegalArgumentException] {
      graft.ops.TSOps2.seasonalDecompose(df, col("x"), col("o"),
        Seq("g"), 4) // even period
    }
  }

  test("cusum reflection identity matches the sequential recursion on " +
      "random series") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val (target, slack, h) = (10.0, 1.0, 8.0)
    for (trial <- 1 to 20) {
      val xs = Vector.fill(60)((rnd.nextInt(41) - 10).toDouble)
      // ground truth: Page's recursion, run sequentially
      var su = 0.0; var sd = 0.0
      var nUp = 0L; var nDn = 0L
      var first: Option[Int] = None
      var mUp = 0.0; var mDn = 0.0
      xs.zipWithIndex.foreach { case (x, i) =>
        su = math.max(0.0, su + (x - target - slack))
        sd = math.max(0.0, sd - (x - target + slack))
        if (su > h) nUp += 1
        if (sd > h) nDn += 1
        if ((su > h || sd > h) && first.isEmpty) first = Some(i)
        mUp = math.max(mUp, su); mDn = math.max(mDn, sd)
      }
      val df = xs.zipWithIndex.map { case (x, i) => (x, i, "g") }
        .toDF("x", "o", "g")
      val r = graft.ops.TSOps2.cusum(df, col("x"), col("o"), Seq("g"),
        target, slack, h).collect()(0)
      assert(r.getAs[Long]("n_alarms_up") == nUp, s"trial $trial up")
      assert(r.getAs[Long]("n_alarms_down") == nDn, s"trial $trial dn")
      assert((first.isEmpty && r.isNullAt(r.fieldIndex(
        "first_alarm_order"))) ||
        r.getAs[Int]("first_alarm_order") == first.get,
        s"trial $trial first")
      assert(math.abs(r.getAs[Double]("max_s_up") - mUp) < 1e-9)
      assert(math.abs(r.getAs[Double]("max_s_down") - mDn) < 1e-9)
    }
  }
}
