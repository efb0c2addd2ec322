package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.agg.{LRIn, LinRegAgg}

/** Second ts-features wave (SURVEY §2.7): AR coefficients, sample /
  * approximate entropy, Kozachenko–Leonenko KNN entropy, subsequence
  * similarity counts.
  *
  * Entropies over embedded vectors are whole-series kernels in the
  * reference (src/num_ext/entrophies.rs, kd-tree Chebyshev counts).
  * Here: SampEn/ApEn collect each group's ordered series into one
  * aggregate buffer (memory = O(group), the documented trade-off for
  * order-sensitive kernels, SURVEY §2.15) and run the O(n²) template
  * count in-executor; the 1-D KNN entropy instead stays FULLY
  * distributed — after a sort-within-group, the k-th nearest neighbor
  * of a point in 1-D must lie within the k preceding/following values,
  * so a Window over ±k neighbors computes exact d_k with no collection
  * and no quadratic work. That version scales to arbitrarily large
  * groups.
  */
object TSOps2 {

  private val P = "__g_"

  /** AR(p) coefficients per group: regress x on its own lags 1..p
    * (+ intercept last) via the Gram aggregate. (ts_features.py:419
    * query_ar_coeffs) */
  def arCoeffs(df: DataFrame, x: Column, order: Column,
               groupNames: Seq[String], p: Int): DataFrame = {
    val gc = groupNames.map(col)
    val w = Window.partitionBy(gc: _*).orderBy(order)
    val lags = (1 to p).map(i => lag(x, i).over(w).as(s"${P}l$i"))
    val base = df.select(
      (gc :+ x.cast("double").as(s"${P}x")) ++ lags: _*)
      .na.drop(Seq((1 to p).map(i => s"${P}l$i"): _*))
    base.groupBy(gc: _*)
      .agg(LinRegAgg.linReg(
        array(((1 to p).map(i => col(s"${P}l$i")) :+ lit(1.0)): _*),
        col(s"${P}x"), p + 1).as("ar"))
      .select(gc :+ col("ar.coeffs").as("ar_coeffs"): _*)
  }

  /** Ordered per-group series as one array column (the collect-based
    * fallback for sequential kernels). */
  def collectSeries(df: DataFrame, x: Column, order: Column,
                    groupNames: Seq[String], out: String = "series")
      : DataFrame = {
    val gc = groupNames.map(col)
    df.select(gc ++ Seq(order.as(s"${P}o"), x.cast("double").as(s"${P}x")): _*)
      .groupBy(gc: _*)
      .agg(graft.util.Guard.cappedSeries(transform(
        array_sort(collect_list(struct(col(s"${P}o"), col(s"${P}x")))),
        s => s(s"${P}x")), "collectSeries").as(out))
  }

  private def chebWithin(xs: Array[Double], i: Int, j: Int, m: Int,
                         r: Double): Boolean = {
    var t = 0
    while (t < m) {
      if (math.abs(xs(i + t) - xs(j + t)) > r) return false
      t += 1
    }
    true
  }

  /** Sample entropy of an ordered series: −ln(A/B) with A/B the counts
    * of (i<j) template pairs of length m+1 / m within Chebyshev r.
    * Template indices run 0..n−m−1 for BOTH lengths (the standard
    * Richman–Moorman estimator; reference entrophies.rs:102). */
  def sampleEntropySeries(xs: Seq[Double], m: Int, r: Double): Double = {
    // O(n²) template count — fail loud past the documented cap
    // (sub-sample upstream; SURVEY §7 order-sensitive-aggregate policy)
    require(xs.length <= 100000,
      s"sampleEntropy: series of ${xs.length} exceeds the O(n²) cap")
    val a = xs.toArray
    // the reference's template ranges (ts_features.py:552 rows =
    // n−m+1; entrophies.rs:139-175): B counts m-dim template pairs
    // over ALL n−m+1 templates, A counts (m+1)-dim pairs over the
    // first n−m — one more B template than the naive symmetric loop,
    // which is what tsfresh computes too
    val nTm = a.length - m + 1
    if (nTm <= 1) return Double.NaN
    var bCnt = 0L; var aCnt = 0L
    var i = 0
    while (i < nTm) {
      var j = i + 1
      while (j < nTm) {
        if (chebWithin(a, i, j, m, r)) {
          bCnt += 1
          if (j < nTm - 1 &&
              math.abs(a(i + m) - a(j + m)) <= r) aCnt += 1
        }
        j += 1
      }
      i += 1
    }
    if (aCnt == 0 || bCnt == 0) Double.NaN
    else math.log(bCnt.toDouble / aCnt.toDouble)
  }

  /** Approximate entropy φ(m) − φ(m+1), self-matches included
    * (Pincus; reference entrophies.rs:17). */
  def approxEntropySeries(xs: Seq[Double], m: Int, r: Double): Double = {
    val a = xs.toArray
    def phi(mm: Int): Double = {
      val n = a.length - mm + 1
      if (n <= 0) return Double.NaN
      var s = 0.0
      var i = 0
      while (i < n) {
        var c = 0
        var j = 0
        while (j < n) {
          if (chebWithin(a, i, j, mm, r)) c += 1
          j += 1
        }
        s += math.log(c.toDouble / n)
        i += 1
      }
      s / n
    }
    // the reference returns |φ(m+1) − φ(m)| (entrophies.rs:99)
    math.abs(phi(m) - phi(m + 1))
  }

  val sampleEntropyUdf =
    udf((xs: Seq[Double], m: Int, r: Double) => sampleEntropySeries(xs, m, r))
  val approxEntropyUdf =
    udf((xs: Seq[Double], m: Int, r: Double) => approxEntropySeries(xs, m, r))

  /** SampEn per group with r = rFactor · POPULATION std of the group —
    * the reference scales by `std(ddof=0)` here (ts_features.py:551),
    * unlike ApEn which uses sample std.
    * (ts_features.py:519 query_sample_entropy) */
  def sampleEntropy(df: DataFrame, x: Column, order: Column,
                    groupNames: Seq[String], m: Int = 2,
                    rFactor: Double = 0.2): DataFrame = {
    val gc = groupNames.map(col)
    val rs = df.select(gc :+ x.cast("double").as(s"${P}x"): _*)
      .groupBy(gc: _*).agg(stddev_pop(col(s"${P}x")).as(s"${P}sd"))
    collectSeries(df, x, order, groupNames)
      .join(rs, groupNames)
      .withColumn("sample_entropy",
        sampleEntropyUdf(col("series"), lit(m), col(s"${P}sd") * rFactor))
      .drop("series", s"${P}sd")
  }

  /** ApEn per group. (ts_features.py:571 query_approx_entropy) */
  def approxEntropy(df: DataFrame, x: Column, order: Column,
                    groupNames: Seq[String], m: Int = 2,
                    rFactor: Double = 0.2): DataFrame = {
    val gc = groupNames.map(col)
    val rs = df.select(gc :+ x.cast("double").as(s"${P}x"): _*)
      .groupBy(gc: _*).agg(stddev_samp(col(s"${P}x")).as(s"${P}sd"))
    collectSeries(df, x, order, groupNames)
      .join(rs, groupNames)
      .withColumn("approx_entropy",
        approxEntropyUdf(col("series"), lit(m), col(s"${P}sd") * rFactor))
      .drop("series", s"${P}sd")
  }

  /** Digamma via the asymptotic series — shared formula with the SQL
    * oracle so both engines produce identical doubles for n ≥ 10. */
  def digammaAsym(n: Double): Double =
    math.log(n) - 1.0 / (2.0 * n) - 1.0 / (12.0 * n * n) +
      1.0 / (120.0 * math.pow(n, 4)) - 1.0 / (252.0 * math.pow(n, 6))

  /** ψ(3) exact: −γ + 1 + 1/2. */
  val digamma3: Double = 0.9227843350984671

  /** Column form of [[digammaAsym]] — identical expression shape so the
    * SQL oracle reproduces the exact doubles. */
  private def digammaAsymCol(n: Column): Column =
    log(n) - lit(1.0) / (n * 2.0) - lit(1.0) / (n * n * 12.0) +
      lit(1.0) / (pow(n, 4) * 120.0) - lit(1.0) / (pow(n, 6) * 252.0)

  /** Kozachenko–Leonenko 1-D KNN entropy per group, fully distributed:
    * H = ψ(n) − ψ(k) + mean(ln(2·d_k)) where d_k is the distance to the
    * k-th nearest neighbor. In 1-D, after sorting by x the k nearest
    * neighbors of a row are among its k predecessors/successors, so d_k
    * is a Window expression — no collection, no O(n²).
    * (ts_features.py:635 query_knn_entropy; entrophies.rs:217) */
  def knnEntropy1d(df: DataFrame, x: Column, groupNames: Seq[String],
                   k: Int = 3): DataFrame = {
    require(k == 3, "oracle pins psi(k) for k=3; extend digamma for other k")
    val gc = groupNames.map(col)
    val w = Window.partitionBy(gc: _*).orderBy(col(s"${P}x"))
    val neighborDiffs = ((1 to k).map(i =>
      abs(col(s"${P}x") - lag(s"${P}x", i).over(w))) ++
      (1 to k).map(i =>
        abs(col(s"${P}x") - lead(s"${P}x", i).over(w))))
    val dk = element_at(
      array_sort(array(neighborDiffs.map(c => coalesce(c,
        lit(Double.PositiveInfinity))): _*)), k)
    df.select(gc :+ x.cast("double").as(s"${P}x"): _*)
      .withColumn(s"${P}dk", dk)
      .groupBy(gc: _*)
      .agg(count(lit(1)).cast("double").as(s"${P}n"),
        avg(log(col(s"${P}dk") * 2.0)).as(s"${P}m"))
      .select(gc :+ (digammaAsymCol(col(s"${P}n")) - digamma3 +
        col(s"${P}m")).as("knn_entropy"): _*)
  }

  /** Generic d-dimensional Kozachenko–Leonenko entropy of a collected
    * point set (Chebyshev metric, k=3): H = ψ(n) − ψ(3) +
    * d·mean(ln(2·r_i)) with r_i the k-th NN distance. Brute-force O(n²)
    * — callers feed bounded (sub-sampled or per-group) sets; the
    * distributed 1-D case uses [[knnEntropy1d]] instead.
    * (ts_features.py:635-733; entrophies.rs:217) */
  def klEntropySeries(points: Seq[Seq[Double]], k: Int = 3): Double = {
    val n = points.length
    if (n <= k) return Double.NaN
    val d = points.head.length
    val pts = points.map(_.toArray).toArray
    var sumLog = 0.0
    if (n <= 512) {
      // brute force: cheap below the crossover and allocation-free
      var i = 0
      while (i < n) {
        val dists = new Array[Double](n - 1)
        var m = 0
        var j = 0
        while (j < n) {
          if (j != i) {
            var cheb = 0.0
            var t = 0
            while (t < d) {
              val df = math.abs(pts(i)(t) - pts(j)(t))
              if (df > cheb) cheb = df
              t += 1
            }
            dists(m) = cheb; m += 1
          }
          j += 1
        }
        java.util.Arrays.sort(dists)
        sumLog += math.log(2.0 * dists(k - 1))
        i += 1
      }
    } else {
      // kd-tree path: O(n log n) k-NN under the same Chebyshev metric,
      // identical distances → identical estimate
      val tree = graft.knn.KdTree.build(
        Array.tabulate(n)(i => (i.toLong, pts(i))), "inf")
      var i = 0
      while (i < n) {
        val nn = tree.knn(pts(i), k, exclude = i.toLong)
        sumLog += math.log(2.0 * nn.last._2)
        i += 1
      }
    }
    digammaAsym(n.toDouble) - digamma3 + d * (sumLog / n)
  }

  private val klEntropyUdf =
    udf((pts: Seq[Seq[Double]], k: Int) => klEntropySeries(pts, k))

  /** Copula entropy per group: rank-transform (x, y) to (0,1)² and
    * return −H of the empirical copula (copent convention) —
    * negative MI. Ranks need unique x/y (jitter upstream for ties).
    * (ts_features.py:660 query_copula_entropy) */
  def copulaEntropy(df: DataFrame, x: Column, y: Column,
                    groupNames: Seq[String], k: Int = 3): DataFrame = {
    val gc = groupNames.map(col)
    val pre = df.select(gc ++ Seq(x.cast("double").as(s"${P}x"),
      y.cast("double").as(s"${P}y")): _*)
    val wx = Window.partitionBy(gc: _*).orderBy(col(s"${P}x"))
    val wy = Window.partitionBy(gc: _*).orderBy(col(s"${P}y"))
    val wn = Window.partitionBy(gc: _*)
    val ranked = pre
      .withColumn(s"${P}n", count(lit(1)).over(wn).cast("double"))
      .withColumn(s"${P}u",
        (row_number().over(wx) - 1) / (col(s"${P}n") - 1.0))
      .withColumn(s"${P}v",
        (row_number().over(wy) - 1) / (col(s"${P}n") - 1.0))
    ranked.groupBy(gc: _*)
      .agg(graft.util.Guard.cappedSeries(
        collect_list(array(col(s"${P}u"), col(s"${P}v"))),
        "copulaEntropy").as(s"${P}pts"))
      .select(gc :+
        (-klEntropyUdf(col(s"${P}pts"), lit(k))).as("copula_entropy"): _*)
  }

  /** Transfer entropy x→y at lag 1 via the 4-term KL decomposition
    * TE = H(y_t,y_l) + H(y_l,x_l) − H(y_l) − H(y_t,y_l,x_l).
    * (ts_features.py:708 query_transfer_entropy) */
  def transferEntropy(df: DataFrame, x: Column, y: Column, order: Column,
                      groupNames: Seq[String], k: Int = 3): DataFrame = {
    val gc = groupNames.map(col)
    val w = Window.partitionBy(gc: _*).orderBy(col(s"${P}o"))
    val pre = df.select(gc ++ Seq(x.cast("double").as(s"${P}x"),
        y.cast("double").as(s"${P}y"), order.as(s"${P}o")): _*)
      .withColumn(s"${P}yl", lag(col(s"${P}y"), 1).over(w))
      .withColumn(s"${P}xl", lag(col(s"${P}x"), 1).over(w))
      .na.drop(Seq(s"${P}yl", s"${P}xl"))
    pre.groupBy(gc: _*)
      .agg(
        // one capped column guards the group (all four share its size)
        graft.util.Guard.cappedSeries(
          collect_list(array(col(s"${P}y"), col(s"${P}yl"))),
          "transferEntropy").as("p_yyl"),
        collect_list(array(col(s"${P}yl"), col(s"${P}xl"))).as("p_ylxl"),
        collect_list(array(col(s"${P}yl"))).as("p_yl"),
        collect_list(array(col(s"${P}y"), col(s"${P}yl"),
          col(s"${P}xl"))).as("p_yylxl"))
      .select(gc :+
        (klEntropyUdf(col("p_yyl"), lit(k)) +
          klEntropyUdf(col("p_ylxl"), lit(k)) -
          klEntropyUdf(col("p_yl"), lit(k)) -
          klEntropyUdf(col("p_yylxl"), lit(k))).as("transfer_entropy"): _*)
  }

  /** Conditional-independence score: CMI I(x;y|z) = H(x,z) + H(y,z) −
    * H(z) − H(x,y,z); ≈0 ⇒ x ⟂ y | z. (ts_features.py:686
    * query_cond_indep) */
  def condIndep(df: DataFrame, x: Column, y: Column, z: Column,
                groupNames: Seq[String], k: Int = 3): DataFrame = {
    val gc = groupNames.map(col)
    val pre = df.select(gc ++ Seq(x.cast("double").as(s"${P}x"),
      y.cast("double").as(s"${P}y"), z.cast("double").as(s"${P}z")): _*)
    pre.groupBy(gc: _*)
      .agg(
        // one capped column guards the group (all four share its size)
        graft.util.Guard.cappedSeries(
          collect_list(array(col(s"${P}x"), col(s"${P}z"))),
          "condIndep").as("p_xz"),
        collect_list(array(col(s"${P}y"), col(s"${P}z"))).as("p_yz"),
        collect_list(array(col(s"${P}z"))).as("p_z"),
        collect_list(array(col(s"${P}x"), col(s"${P}y"),
          col(s"${P}z"))).as("p_xyz"))
      .select(gc :+
        (klEntropyUdf(col("p_xz"), lit(k)) +
          klEntropyUdf(col("p_yz"), lit(k)) -
          klEntropyUdf(col("p_z"), lit(k)) -
          klEntropyUdf(col("p_xyz"), lit(k))).as("cond_mi"): _*)
  }

  /** Count of length-w sliding windows within `threshold` (squared-l2)
    * of a fixed query pattern; optional z-normalization of each window.
    * Pure lead-Window algebra — runs at scan speed, any scale.
    * (ts_features.py:239 query_similar_count; subseq_sim.rs:22,68) */
  /** CUSUM change detection per group (Page 1954, public): the
    * one-sided control statistics
    * S⁺_t = max(0, S⁺_{t−1} + (x_t − target − slack)) and the mirrored
    * S⁻, with an alarm whenever either exceeds `h`. The recursion is
    * NOT run sequentially: via the reflection identity
    * S⁺_t = P_t − min_{i ≤ t} P_i (P = prefix sum of the drift-adjusted
    * series, P₀ = 0), both statistics become a prefix sum plus a
    * running extremum — two per-group ordered windows, fully
    * distributed, exactly replayable in SQL. `order` must be unique
    * within each group (ROWS-frame sums over tied keys are
    * row-order-dependent). Returns one row per group:
    * (n_alarms_up, n_alarms_down, first_alarm_order, max_s_up,
    * max_s_down). `first_alarm_order` is the order key of the earliest
    * alarm of either side (null when in control). */
  def cusum(df: DataFrame, x: Column, order: Column,
            groupNames: Seq[String], target: Double, slack: Double,
            h: Double): DataFrame = {
    require(h > 0, "cusum: alarm threshold h must be > 0")
    val gc = groupNames.map(col)
    val t = df.select(gc :+ order.as(s"${P}o")
      :+ x.cast("double").as(s"${P}x"): _*)
    val wCum = Window.partitionBy(gc: _*).orderBy(col(s"${P}o"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val up = sum(col(s"${P}x") - target - slack).over(wCum)
    val dn = sum(col(s"${P}x") - target + slack).over(wCum)
    val sUp = up - least(lit(0.0), min(up).over(wCum))
    val sDn = greatest(lit(0.0), max(dn).over(wCum)) - dn
    t.withColumn(s"${P}su", sUp).withColumn(s"${P}sd", sDn)
      .groupBy(gc: _*)
      .agg(
        sum(when(col(s"${P}su") > h, 1L).otherwise(0L))
          .as("n_alarms_up"),
        sum(when(col(s"${P}sd") > h, 1L).otherwise(0L))
          .as("n_alarms_down"),
        min(when(col(s"${P}su") > h || col(s"${P}sd") > h,
          col(s"${P}o"))).as("first_alarm_order"),
        max(s"${P}su").as("max_s_up"),
        max(s"${P}sd").as("max_s_down"))
  }

  /** Classical additive seasonal decomposition per group (the
    * moving-average method behind `decompose`/STL's ancestor, public):
    * trend = centered moving average over `period` points (odd period;
    * edge rows where the window is incomplete get null trend),
    * seasonal = per-phase mean of the detrended series re-centered to
    * sum to zero, resid = x − trend − seasonal. Phases come from the
    * per-group row position (`order` must be unique per group).
    *
    * Scale shape: two ordered per-group windows (position + centered
    * MA), one (group, phase) aggregation for the indices — broadcast
    * back (period·groups rows). Returns the per-row frame
    * (groups…, order, x, trend, seasonal, resid). */
  def seasonalDecompose(df: DataFrame, x: Column, order: Column,
                        groupNames: Seq[String], period: Int)
      : DataFrame = {
    require(period >= 2 && period % 2 == 1,
      "seasonalDecompose: period must be odd and >= 2 (centered MA)")
    val gc = groupNames.map(col)
    val half = period / 2
    val wOrd = Window.partitionBy(gc: _*).orderBy(col(s"${P}o"))
    val wMa = wOrd.rowsBetween(-half, half)
    val base = df.select(gc :+ order.as(s"${P}o")
        :+ x.cast("double").as(s"${P}x"): _*)
      .withColumn(s"${P}phase",
        pmod(row_number().over(wOrd) - 1, lit(period)))
      .withColumn(s"${P}trend",
        when(count(lit(1)).over(wMa) === period,
          avg(s"${P}x").over(wMa)))
      .withColumn(s"${P}det", col(s"${P}x") - col(s"${P}trend"))
    val idx = base.filter(col(s"${P}det").isNotNull)
      .groupBy(gc :+ col(s"${P}phase"): _*)
      .agg(avg(s"${P}det").as(s"${P}raw"))
    val centered = {
      val wG = Window.partitionBy(gc: _*)
      idx.withColumn(s"${P}seasonal",
        col(s"${P}raw") - avg(s"${P}raw").over(wG))
        .drop(s"${P}raw")
    }
    base.join(centered, groupNames :+ s"${P}phase", "left")
      .select(gc ++ Seq(col(s"${P}o").as("order_key"),
        col(s"${P}x").as("x"), col(s"${P}trend").as("trend"),
        col(s"${P}seasonal").as("seasonal"),
        (col(s"${P}x") - col(s"${P}trend") - col(s"${P}seasonal"))
          .as("resid")): _*)
  }

  def subseqSimCount(df: DataFrame, x: Column, order: Column,
                     groupNames: Seq[String], query: Seq[Double],
                     threshold: Double,
                     znormalize: Boolean = false): DataFrame = {
    val gc = groupNames.map(col)
    val pre = df.select(gc ++ Seq(x.cast("double").as(s"${P}x"),
      order.as(s"${P}o")): _*)
    val w = Window.partitionBy(gc: _*).orderBy(col(s"${P}o"))
    val win = query.indices.map(i =>
      if (i == 0) col(s"${P}x") else lead(col(s"${P}x"), i).over(w))
    val full = win.last.isNotNull
    val dist =
      if (!znormalize)
        win.zip(query).map { case (c, q) => (c - q) * (c - q) }.reduce(_ + _)
      else {
        val n = query.length.toDouble
        val mu = win.reduce(_ + _) / n
        val sd = sqrt(win.map(c => (c - mu) * (c - mu)).reduce(_ + _) / n)
        // z-normalize the query with the same population convention
        val qm = query.sum / n
        val qs = math.sqrt(query.map(v => (v - qm) * (v - qm)).sum / n)
        win.zip(query).map { case (c, q) =>
          val cz = (c - mu) / sd
          val qz = (q - qm) / qs
          (cz - qz) * (cz - qz)
        }.reduce(_ + _)
      }
    pre
      .withColumn(s"${P}hit", full && dist <= threshold)
      .groupBy(gc: _*)
      .agg(sum(col(s"${P}hit").cast("long")).as("similar_count"))
  }
}
