package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PcaOps, SeqOps}

class SeqSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean = {
    val ok = math.abs(a - b) <= tol
    if (!ok) info(s"got $a expected $b")
    ok
  }

  test("PAVA matches the classic hand example") {
    // sklearn doc-style case: y = [4,2,3,1,5]
    // pooling: [4,2]→3,3 ; then 3,3,3 stays; [3,3,3,1]→2.5×4? check:
    // sequential: 4|2 violate → [3,3]; 3 ok → [3,3,3]; 1 violates →
    // pool(3,3,3,1) = 2.5 → [2.5]*4; 5 ok.
    val fit = SeqOps.pavaFit(Seq(4, 2, 3, 1, 5).map(_.toDouble))
    assert(fit.toSeq == Seq(2.5, 2.5, 2.5, 2.5, 5.0))
    // weighted: w=[1,2] on y=[3,0] → mean = 3*1/3 = 1 → [1,1]
    val wfit = SeqOps.pavaFit(Seq(3.0, 0.0), Some(Seq(1.0, 2.0)))
    assert(wfit.toSeq == Seq(1.0, 1.0))
  }

  test("isotonic fit preserves the total sum and is monotone") {
    import spark.implicits._
    val ys = Seq(5.0, 3.0, 4.0, 1.0, 6.0, 2.0, 8.0)
    val df = ys.zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
      .toDF("i", "y", "g")
    val fit = SeqOps.isotonic(df, col("y"), col("i"), Seq("g"))
      .select("isotonic").head.getSeq[Double](0)
    assert(approx(fit.sum, ys.sum, 1e-9))
    assert(fit.sliding(2).forall(p => p.head <= p.last))
  }

  test("isotonic weights and increasing=false follow scipy " +
      "(num.py:1106)") {
    import spark.implicits._
    // scipy.optimize.isotonic_regression([5,3,4], weights=[1,1,2]):
    // pool(5,3)→4,4; 4<=4 ok → [4,4,4]. With weights [2,1,1]:
    // pool(5,3) weighted → (2·5+1·3)/3 = 13/3; 13/3 > 4 → pool all:
    // (2·5+1·3+1·4)/4 = 17/4 → [4.25, 4.25, 4.25]
    val df = Seq((0L, 5.0, 2.0, "g"), (1L, 3.0, 1.0, "g"),
      (2L, 4.0, 1.0, "g")).toDF("i", "y", "w", "g")
    val fit = SeqOps.isotonic(df, col("y"), col("i"), Seq("g"),
        weights = Some(col("w")))
      .select("isotonic").head.getSeq[Double](0)
    assert(fit.forall(v => approx(v, 4.25, 1e-12)), fit.toString)
    // decreasing = −PAVA(−y): [1,2,3] decreasing → all pooled to 2
    val dfd = Seq((0L, 1.0, "g"), (1L, 2.0, "g"), (2L, 3.0, "g"))
      .toDF("i", "y", "g")
    val fd = SeqOps.isotonic(dfd, col("y"), col("i"), Seq("g"),
        increasing = false)
      .select("isotonic").head.getSeq[Double](0)
    assert(fd.forall(v => approx(v, 2.0, 1e-12)), fd.toString)
    // an already-decreasing series is returned unchanged
    val dfd2 = Seq((0L, 3.0, "g"), (1L, 2.0, "g"), (2L, 1.0, "g"))
      .toDF("i", "y", "g")
    val fd2 = SeqOps.isotonic(dfd2, col("y"), col("i"), Seq("g"),
        increasing = false)
      .select("isotonic").head.getSeq[Double](0)
    assert(fd2 == Seq(3.0, 2.0, 1.0), fd2.toString)
  }

  test("rfftFull crop/pad and full-spectrum conjugate symmetry " +
      "(num.py:1043)") {
    import spark.implicits._
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
      .toDF("i", "x", "g")
    // full spectrum of the zero-padded length-6 series
    val full = SeqOps.rfftFull(df, col("x"), col("i"), Seq("g"),
        n = Some(6), returnFull = true)
      .select("fft").head.getSeq[org.apache.spark.sql.Row](0)
    assert(full.length == 6)
    // conjugate symmetry: coeff 5 = conj(coeff 1), 4 = conj(2)
    assert(approx(full(5).getDouble(0), full(1).getDouble(0), 1e-9))
    assert(approx(full(5).getDouble(1), -full(1).getDouble(1), 1e-9))
    assert(approx(full(4).getDouble(0), full(2).getDouble(0), 1e-9))
    // DC term = padded sum
    assert(approx(full(0).getDouble(0), xs.sum, 1e-9))
    // crop to n=4: DC = 1+2+3+4
    val crop = SeqOps.rfftFull(df, col("x"), col("i"), Seq("g"),
        n = Some(4))
      .select("fft").head.getSeq[org.apache.spark.sql.Row](0)
    assert(crop.length == 3)
    assert(approx(crop(0).getDouble(0), 10.0, 1e-9))
  }

  test("convolveWin valid mode equals hand convolution") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v, "g") }.toDF("i", "x", "g")
    val out = SeqOps.convolveWin(df, col("x"), col("i"), Seq("g"),
        Seq(1.0, 0.5), "valid")
      .orderBy("__g_o").select("conv").collect().map(r =>
        Option(r.get(0)).map(_.asInstanceOf[Double]))
    // TRUE convolution (kernel flipped, np.convolve parity):
    // out[i] = 0.5 x[i] + 1.0 x[i+1] → [2.5, 4.0, 5.5, null]
    assert(out(0).contains(2.5) && out(1).contains(4.0) &&
      out(2).contains(5.5) && out(3).isEmpty)
  }

  test("fft convolution matches direct on every mode (convolve.rs " +
      "method parity)") {
    import spark.implicits._
    // awkward sizes on purpose: n not a power of two, kernel even/odd
    val xs = (0 until 37).map(i => math.sin(i * 0.7) * 10 + i % 5)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
      .toDF("i", "x", "g")
    for (kernel <- Seq(Seq(0.25, 0.5, 0.25), Seq(1.0, -2.0, 3.0, -4.0));
         mode <- Seq("full", "valid", "same", "left", "right")) {
      val d = SeqOps.convolveSeries(df, col("x"), col("i"), Seq("g"),
        kernel, mode, "c").select("c").collect()(0).getSeq[Double](0)
      val f = SeqOps.convolveSeries(df, col("x"), col("i"), Seq("g"),
        kernel, mode, "c", method = "fft")
        .select("c").collect()(0).getSeq[Double](0)
      assert(d.length == f.length, s"$mode $kernel length")
      d.zip(f).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"$mode $kernel: $a vs $b") }
    }
    // pure-Scala kernel sanity: [1,2,3] * [1,1] full = [1,3,5,3]
    assert(SeqOps.fftConvolveFull(Array(1.0, 2.0, 3.0), Array(1.0, 1.0))
      .zip(Array(1.0, 3.0, 5.0, 3.0)).forall {
        case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("DFT of a pure cosine concentrates at its frequency") {
    import spark.implicits._
    val n = 64
    val xs = (0 until n).map(j => math.cos(2 * math.Pi * 4 * j / n))
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v, "g") }
      .toDF("i", "x", "g")
    val fft = SeqOps.rfft(df, col("x"), col("i"), Seq("g"), 6)
      .select("fft").head.getSeq[org.apache.spark.sql.Row](0)
    // coefficient 4 should have |re| = n/2 = 32; others ~0
    assert(approx(fft(4).getDouble(0), 32.0, 1e-9))
    assert(math.abs(fft(1).getDouble(0)) < 1e-9)
  }

  test("spline: lambda=0 interpolates, huge lambda approaches the trend") {
    val xs = Seq(0.0, 1.0, 2.0, 3.0, 4.0)
    val ys = Seq(1.0, 3.0, 2.0, 5.0, 4.0)
    val f0 = SeqOps.splineFit(xs, ys, 0.0)
    ys.indices.foreach(i => assert(approx(f0(i), ys(i), 1e-8)))
    val fInf = SeqOps.splineFit(xs, ys, 1e9)
    // linear fit of ys on xs: slope 0.8, intercept 1.4
    xs.indices.foreach { i =>
      assert(math.abs(fInf(i) - (1.4 + 0.8 * xs(i))) < 1e-3,
        s"i=$i got ${fInf(i)}")
    }
  }

  test("PCA singular values match a hand 2-D covariance") {
    import spark.implicits._
    // perfectly correlated: eigenvalues (2·var, 0)
    val df = (1 to 10).map(i => (i.toDouble, i.toDouble, "g"))
      .toDF("a", "b", "g")
    val r = PcaOps.singularValues(df, Seq(col("a"), col("b")), Seq("g"))
      .select(element_at(col("singular_values"), 1),
        element_at(col("singular_values"), 2),
        element_at(col("explained_variance_ratio"), 1)).head
    val varA = (1 to 10).map(_.toDouble)
      .map(v => (v - 5.5) * (v - 5.5)).sum / 9.0
    assert(approx(r.getDouble(0), math.sqrt(2 * varA * 9), 1e-9))
    assert(approx(r.getDouble(1), 0.0, 1e-6))
    assert(approx(r.getDouble(2), 1.0, 1e-12))
  }

  test("principalComponents: variances are the eigenvalues, PCs " +
      "uncorrelated, nulls project to null") {
    import spark.implicits._
    // anisotropic cloud with a known 45° principal axis
    val pts = (1 to 40).map { i =>
      val t = i.toDouble
      (t + 0.1 * (i % 3), t - 0.1 * (i % 3))
    }
    val df = pts.toDF("a", "b")
      .union(Seq((Double.NaN, Double.NaN)).toDF("a", "b")
        .select(lit(null).cast("double").as("a"),
          lit(null).cast("double").as("b")))
    val proj = PcaOps.principalComponents(df,
      Seq(col("a"), col("b")), 2)
    val stats = proj.agg(var_samp(col("pc_1")), var_samp(col("pc_2")),
      covar_samp(col("pc_1"), col("pc_2")), count(col("pc_1"))).head
    // eigenvalues of the 2x2 sample covariance, closed form
    val n = pts.length.toDouble
    val ma = pts.map(_._1).sum / n
    val mb = pts.map(_._2).sum / n
    val c11 = pts.map(p => (p._1 - ma) * (p._1 - ma)).sum / (n - 1)
    val c22 = pts.map(p => (p._2 - mb) * (p._2 - mb)).sum / (n - 1)
    val c12 = pts.map(p => (p._1 - ma) * (p._2 - mb)).sum / (n - 1)
    val disc = math.sqrt((c11 - c22) * (c11 - c22) + 4 * c12 * c12)
    assert(approx(stats.getDouble(0), (c11 + c22 + disc) / 2, 1e-8))
    assert(approx(stats.getDouble(1), (c11 + c22 - disc) / 2, 1e-8))
    assert(math.abs(stats.getDouble(2)) < 1e-8)
    assert(stats.getLong(3) == 40L) // the null row projected to null
  }
}
