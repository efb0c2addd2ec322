package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TSOps2.collectSeries

/** Whole-series kernels (SURVEY §2.6): isotonic regression, convolution,
  * real DFT, smoothing spline, combinations/product.
  *
  * Execution shapes, by scaling class:
  *  - convolve (small kernel): pure lead-Window algebra — distributed,
  *    codegen, any scale. (The reference's FFT path only wins for
  *    kernels ~ series length; for the common small-kernel case the
  *    direct form IS the scalable plan.)
  *  - isotonic / spline / DFT: inherently whole-series sequential →
  *    collect per group (ordered array aggregate), run the O(n)–O(n²)
  *    kernel in-executor. Memory = O(group); the documented trade-off
  *    for order-sensitive kernels (SURVEY §2.15).
  *  - combinations/product: explode/crossJoin — Catalyst handles
  *    distribution.
  */
object SeqOps {

  private val P = "__g_"

  // ---- isotonic regression (num.py:1106; isotonic_regression.rs:74) ----

  /** Pool-adjacent-violators on an ordered series (optionally weighted):
    * the unique non-decreasing fit minimizing Σw(fit−y)². */
  def pavaFit(ys0: Seq[Double], ws: Option[Seq[Double]] = None)
      : Array[Double] = {
    val ys = ys0.toArray // List at udf call sites: O(1) indexing after
    val n = ys.length
    val w = ws.map(_.toArray).getOrElse(Array.fill(n)(1.0))
    // blocks as (weighted mean, weight, count)
    val mean = new Array[Double](n)
    val wt = new Array[Double](n)
    val cnt = new Array[Int](n)
    var m = 0 // number of blocks - 1 position
    var i = 0
    while (i < n) {
      mean(m) = ys(i); wt(m) = w(i); cnt(m) = 1
      while (m > 0 && mean(m - 1) > mean(m)) {
        val tw = wt(m - 1) + wt(m)
        mean(m - 1) = (mean(m - 1) * wt(m - 1) + mean(m) * wt(m)) / tw
        wt(m - 1) = tw; cnt(m - 1) += cnt(m)
        m -= 1
      }
      m += 1
      i += 1
    }
    val out = new Array[Double](n)
    var b = 0; var pos = 0
    while (b < m) {
      var c = 0
      while (c < cnt(b)) { out(pos) = mean(b); pos += 1; c += 1 }
      b += 1
    }
    out
  }

  val pavaUdf = udf((ys: Seq[Double]) => pavaFit(ys).toSeq)

  private val pavaFullUdf =
    udf((ys: Seq[Double], ws: Seq[Double], inc: Boolean) => {
      val yy = if (inc) ys else ys.map(v => -v)
      val fit = pavaFit(yy, Option(ws))
      (if (inc) fit else fit.map(v => -v)).toSeq
    })

  /** Per-group isotonic fit: returns group rows with an `isotonic`
    * array column aligned with ascending `order`. `weights` and
    * `increasing` follow num.py:1106 (scipy.optimize
    * .isotonic_regression); decreasing = −PAVA(−y) with the same
    * weights. */
  def isotonic(df: DataFrame, y: Column, order: Column,
               groupNames: Seq[String],
               weights: Option[Column] = None,
               increasing: Boolean = true): DataFrame = weights match {
    case None if increasing =>
      collectSeries(df, y, order, groupNames)
        .withColumn("isotonic", pavaUdf(col("series")))
    case _ =>
      val gc = groupNames.map(col)
      val w = weights.getOrElse(lit(1.0))
      val paired = df.select(gc ++ Seq(order.as(s"${P}o"),
          y.cast("double").as(s"${P}x"),
          w.cast("double").as(s"${P}w")): _*)
        .groupBy(gc: _*)
        .agg(array_sort(collect_list(struct(col(s"${P}o"),
          col(s"${P}x"), col(s"${P}w")))).as(s"${P}s"))
      paired
        .withColumn("series", graft.util.Guard.cappedSeries(
          transform(col(s"${P}s"), s => s(s"${P}x")), "isotonic"))
        .withColumn("isotonic", pavaFullUdf(col("series"),
          transform(col(s"${P}s"), s => s(s"${P}w")), lit(increasing)))
        .drop(s"${P}s")
  }

  // ---- convolution (num.py:857; convolve.rs:190) ----

  /** 1-D convolution with a small kernel as lead-Window algebra.
    * mode "valid": output only where the kernel fully overlaps (rows
    * with fewer than k successors get null); mode "same": zero-padded
    * to input length. TRUE convolution (kernel flipped, np.convolve
    * and convolve.rs parity): out[i] = Σ_j kernel[k−1−j]·x[i+j]. */
  def convolveWin(df: DataFrame, x: Column, order: Column,
                  groupNames: Seq[String], kernel: Seq[Double],
                  mode: String = "valid", out: String = "conv")
      : DataFrame = {
    val gc = groupNames.map(col)
    val pre = df.select(gc ++ Seq(x.cast("double").as(s"${P}x"),
      order.as(s"${P}o")): _*)
    val w = Window.partitionBy(gc: _*).orderBy(col(s"${P}o"))
    // TRUE convolution (kernel flipped, like np.convolve and the
    // reference's fft.rs kernel): row i carries the valid-mode output
    // whose window is x[i..i+k-1]
    val terms = kernel.reverse.zipWithIndex.map { case (kv, j) =>
      val c = if (j == 0) col(s"${P}x") else lead(col(s"${P}x"), j).over(w)
      (c, kv)
    }
    val conv = mode match {
      case "valid" =>
        terms.map { case (c, kv) => c * kv }.reduce(_ + _)
      case "same" =>
        terms.map { case (c, kv) => coalesce(c, lit(0.0)) * kv }
          .reduce(_ + _)
      case m => throw new IllegalArgumentException(s"mode $m")
    }
    pre.withColumn(out, conv)
  }

  /** Exact reference convolution per group, all five modes
    * (num.py:857 convolve; modes per brianmcfee ch03): `full`
    * (n+k−1 outputs), `valid` (n−k+1), `same` (centered n), `left` /
    * `right` (left-/right-aligned n). Output-length ≠ input-length
    * modes cannot be a per-row column, so the result is one array per
    * group (collect-based — the whole-series kernel contract, capped
    * by [[graft.util.Guard]] inside collectSeries). Series shorter
    * than the kernel: `valid` yields an EMPTY array and `same` yields
    * n outputs — the reference's own slicing convention
    * (convolve.rs:97-103 uses (m−1, n−m+1) without numpy's
    * commutative swap; it cannot represent n < m), made non-crashing. */
  /** Full linear convolution via commons-math3 FFT (radix-2, zero-
    * padded to the next power of two ≥ n+k−1): transform both inputs,
    * multiply spectra, inverse-transform, take the real part — the
    * same method="fft" path as the reference (convolve.rs:190,
    * realfft). O((n+k)·log(n+k)) vs the direct O(n·k); the win starts
    * at kernel lengths in the hundreds. */
  private[graft] def fftConvolveFull(a: Array[Double], k: Array[Double])
      : Array[Double] = {
    import org.apache.commons.math3.transform.{DftNormalization,
      FastFourierTransformer, TransformType}
    val n = a.length + k.length - 1
    var size = 1
    while (size < n) size <<= 1
    val fft = new FastFourierTransformer(DftNormalization.STANDARD)
    val fa = fft.transform(java.util.Arrays.copyOf(a, size),
      TransformType.FORWARD)
    val fk = fft.transform(java.util.Arrays.copyOf(k, size),
      TransformType.FORWARD)
    val prod = Array.tabulate(size)(i => fa(i).multiply(fk(i)))
    val inv = fft.transform(prod, TransformType.INVERSE)
    Array.tabulate(n)(i => inv(i).getReal)
  }

  def convolveSeries(df: DataFrame, x: Column, order: Column,
                     groupNames: Seq[String], kernel: Seq[Double],
                     mode: String = "full", out: String = "conv",
                     method: String = "direct")
      : DataFrame = {
    require(method == "direct" || method == "fft",
      s"convolveSeries: method must be direct|fft, got $method")
    val k = kernel.toArray
    val convUdf = udf { (xs: Seq[Double]) =>
      val n = xs.length
      if (n == 0) Seq.empty[Double]
      else {
        val full =
          if (method == "fft") fftConvolveFull(xs.toArray, k)
          else {
            val xa = xs.toArray // List at udf sites: O(1) indexing
            val acc = new Array[Double](n + k.length - 1)
            var i = 0
            while (i < n) {
              var j = 0
              while (j < k.length) { acc(i + j) += xa(i) * k(j); j += 1 }
              i += 1
            }
            acc
          }
        val res = mode match {
          case "full"  => full
          case "valid" =>
            if (n < k.length) Array.empty[Double]
            else full.slice(k.length - 1, n)
          case "same"  =>
            val start = (k.length - 1) / 2
            full.slice(start, start + n)
          case "left"  => full.take(n)
          case "right" => full.takeRight(n)
          case m => throw new IllegalArgumentException(s"mode $m")
        }
        res.toSeq
      }
    }
    graft.ops.TSOps2.collectSeries(df, x, order, groupNames, s"${P}s")
      .withColumn(out, convUdf(col(s"${P}s")))
      .drop(s"${P}s")
  }

  // ---- real DFT (num.py:1043 rfft; fft.rs:14) ----

  /** Exact O(n·k) DFT of the first `nCoeffs` coefficients of each
    * group's ordered series: re_k = Σ x_j cos(2πjk/n),
    * im_k = −Σ x_j sin(2πjk/n). Returns array<struct<re,im>>.
    * (For full-length transforms use nCoeffs = n; the reference's
    * realfft returns n/2+1 coefficients.) */
  val dftUdf = udf((xs: Seq[Double], nCoeffs: Int) => {
    val n = xs.length
    val a = xs.toArray
    (0 until math.min(nCoeffs, n / 2 + 1)).map { k =>
      var re = 0.0; var im = 0.0
      var j = 0
      while (j < n) {
        val ang = 2.0 * math.Pi * j * k / n
        re += a(j) * math.cos(ang)
        im -= a(j) * math.sin(ang)
        j += 1
      }
      (re, im)
    }
  })

  def rfft(df: DataFrame, x: Column, order: Column,
           groupNames: Seq[String], nCoeffs: Int): DataFrame =
    collectSeries(df, x, order, groupNames)
      .withColumn("fft", dftUdf(col("series"), lit(nCoeffs))
        .cast("array<struct<re:double,im:double>>"))
      .drop("series")

  /** rfft with the reference's full signature (num.py:1043): `n`
    * crops or zero-pads the series before the transform; `returnFull`
    * emits the whole length-n spectrum via conjugate symmetry
    * (coefficient n−k = conj(k)) instead of the first n/2+1. */
  private val rfftFullUdf =
    udf((xs: Seq[Double], nReq: Int, full: Boolean) => {
      val src = xs.toArray
      val n = if (nReq > 0) nReq else src.length
      val a = if (n <= src.length) src.take(n)
        else src ++ Array.fill(n - src.length)(0.0)
      val half = n / 2 + 1
      val head = (0 until half).map { k =>
        var re = 0.0; var im = 0.0
        var j = 0
        while (j < n) {
          val ang = 2.0 * math.Pi * j * k / n
          re += a(j) * math.cos(ang)
          im -= a(j) * math.sin(ang)
          j += 1
        }
        (re, im)
      }
      if (!full) head
      else head ++ (half until n).map { k =>
        val (re, im) = head(n - k); (re, -im)
      }
    })

  def rfftFull(df: DataFrame, x: Column, order: Column,
               groupNames: Seq[String], n: Option[Int] = None,
               returnFull: Boolean = false): DataFrame = {
    n.foreach(v => require(v > 1, "Input `n` should be > 1."))
    collectSeries(df, x, order, groupNames)
      .withColumn("fft",
        rfftFullUdf(col("series"), lit(n.getOrElse(0)), lit(returnFull))
          .cast("array<struct<re:double,im:double>>"))
      .drop("series")
  }

  // ---- cubic smoothing spline (expr_spline.py:13; splines.rs:99) ----

  /** Natural cubic smoothing spline fit at the knots (Reinsch 1967):
    * minimizes Σ(y−f)² + λ∫f''². Tridiagonal-plus system solved via
    * dense Gaussian elimination on the driver-free executor side
    * (n per group). Returns fitted values aligned with ascending x.
    * Equally-spaced assumption NOT required. */
  def splineFit(xs0: Seq[Double], ys0: Seq[Double], lam: Double)
      : Array[Double] = {
    // List at udf call sites: O(1) indexing after the one-time copies
    val xs = xs0.toArray
    val ys = ys0.toArray
    val n = xs.length
    if (n < 3) return ys
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    val m = n - 2
    // Reinsch system (R + λ QᵀQ) γ = Qᵀy, f = y − λQγ.
    // Q has 3 nonzeros per column and R is tridiagonal, so QᵀQ is
    // PENTADIAGONAL — everything below is O(n) band arithmetic (the
    // dense form is O(n³) and melts down on collected groups).
    // Column c of Q (0-based) has entries at rows c, c+1, c+2:
    @inline def q0(c: Int) = 1.0 / h(c)
    @inline def q1(c: Int) = -1.0 / h(c) - 1.0 / h(c + 1)
    @inline def q2(c: Int) = 1.0 / h(c + 1)
    val qty = Array.tabulate(m)(c =>
      q0(c) * ys(c) + q1(c) * ys(c + 1) + q2(c) * ys(c + 2))
    // band storage: a(k)(i) = A(i, i+k-2) for k=0..4 (2 sub, diag, 2 sup)
    val band = Array.ofDim[Double](5, m)
    for (i <- 0 until m) {
      // diagonal: R(i,i) + λ·(q0²+q1²+q2²)
      band(2)(i) = (h(i) + h(i + 1)) / 3.0 +
        lam * (q0(i) * q0(i) + q1(i) * q1(i) + q2(i) * q2(i))
      if (i + 1 < m) {
        // first off-diagonal: R(i,i+1) + λ·(q1(i)q0(i+1) + q2(i)q1(i+1))
        val v = h(i + 1) / 6.0 +
          lam * (q1(i) * q0(i + 1) + q2(i) * q1(i + 1))
        band(3)(i) = v  // A(i, i+1)
        band(1)(i + 1) = v
      }
      if (i + 2 < m) {
        // second off-diagonal: λ·q2(i)·q0(i+2)
        val v = lam * (q2(i) * q0(i + 2))
        band(4)(i) = v  // A(i, i+2)
        band(0)(i + 2) = v
      }
    }
    // banded LU without pivoting (A is SPD) — O(n)
    val g = qty.clone()
    for (i <- 0 until m) {
      val piv = band(2)(i)
      for (r <- 1 to 2 if i + r < m) {
        // row i+r has A(i+r, i) at band(2-r)(i+r)
        val f = band(2 - r)(i + r) / piv
        if (f != 0.0) {
          // eliminate: columns i..i+2 of row i map to band(2..4)(i)
          for (cOff <- 0 to 2 if i + cOff < m) {
            band(2 - r + cOff)(i + r) -= f * band(2 + cOff)(i)
          }
          g(i + r) -= f * g(i)
        }
      }
    }
    for (i <- m - 1 to 0 by -1) {
      var s = g(i)
      for (cOff <- 1 to 2 if i + cOff < m)
        s -= band(2 + cOff)(i) * g(i + cOff)
      g(i) = s / band(2)(i)
    }
    // f = y − λ·Qγ: row r receives from columns r-2, r-1, r
    Array.tabulate(n) { r =>
      var s = 0.0
      if (r - 2 >= 0 && r - 2 < m) s += q2(r - 2) * g(r - 2)
      if (r - 1 >= 0 && r - 1 < m) s += q1(r - 1) * g(r - 1)
      if (r < m) s += q0(r) * g(r)
      ys(r) - lam * s
    }
  }

  val splineUdf = udf((xs: Seq[Double], ys: Seq[Double], lam: Double) =>
    splineFit(xs, ys, lam).toSeq)

  def smoothSpline(df: DataFrame, xCol: Column, y: Column,
                   groupNames: Seq[String], lam: Double): DataFrame = {
    val gc = groupNames.map(col)
    df.select(gc ++ Seq(xCol.cast("double").as(s"${P}xx"),
      y.cast("double").as(s"${P}yy")): _*)
      .groupBy(gc: _*)
      .agg(graft.util.Guard.cappedSeries(
        array_sort(collect_list(struct(col(s"${P}xx"), col(s"${P}yy")))),
        "smoothSpline").as(s"${P}pts"))
      .withColumn("xs", transform(col(s"${P}pts"), p => p(s"${P}xx")))
      .withColumn("ys", transform(col(s"${P}pts"), p => p(s"${P}yy")))
      .withColumn("spline", splineUdf(col("xs"), col("ys"), lit(lam)))
      .drop(s"${P}pts")
  }

  // ---- combinations / product (expr_iter.py:85,13; iterations.rs) ----

  /** All k=2 combinations (i<j by order) of a column's values per
    * group — length-changing, realized by self-join (the distributed
    * form of the reference's itertools kernel). */
  def combinations2(df: DataFrame, x: Column, order: Column,
                    groupNames: Seq[String]): DataFrame = {
    val gc = groupNames.map(col)
    val a = df.select(gc ++ Seq(x.as(s"${P}a"), order.as(s"${P}i")): _*)
    val b = df.select(gc ++ Seq(x.as(s"${P}b"), order.as(s"${P}j")): _*)
    a.join(b, groupNames).filter(col(s"${P}i") < col(s"${P}j"))
      .select(gc ++ Seq(col(s"${P}a").as("c1"), col(s"${P}b").as("c2")): _*)
  }

  /** Cartesian product of two columns, nulls dropped from both sides
    * first (expr_iter.py:13 product; test_many.py:1536: [1,null,null]
    * x [1,2,3] yields three pairs). */
  def product(df1: DataFrame, x1: Column, df2: DataFrame, x2: Column)
      : DataFrame =
    df1.select(x1.as("p1")).filter(col("p1").isNotNull)
      .crossJoin(df2.select(x2.as("p2")).filter(col("p2").isNotNull))
}
