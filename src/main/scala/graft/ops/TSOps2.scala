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
      .agg(transform(
        array_sort(collect_list(struct(col(s"${P}o"), col(s"${P}x")))),
        s => s(s"${P}x")).as(out))
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
    val a = xs.toArray
    val nT = a.length - m          // templates comparable at m+1
    var bCnt = 0L; var aCnt = 0L
    var i = 0
    while (i < nT) {
      var j = i + 1
      while (j < nT) {
        if (chebWithin(a, i, j, m, r)) {
          bCnt += 1
          if (math.abs(a(i + m) - a(j + m)) <= r) aCnt += 1
        }
        j += 1
      }
      i += 1
    }
    if (aCnt == 0 || bCnt == 0) Double.NaN
    else -math.log(aCnt.toDouble / bCnt.toDouble)
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
    phi(m) - phi(m + 1)
  }

  val sampleEntropyUdf =
    udf((xs: Seq[Double], m: Int, r: Double) => sampleEntropySeries(xs, m, r))
  val approxEntropyUdf =
    udf((xs: Seq[Double], m: Int, r: Double) => approxEntropySeries(xs, m, r))

  /** SampEn per group with r = rFactor · sample-std of the group.
    * (ts_features.py:519 query_sample_entropy) */
  def sampleEntropy(df: DataFrame, x: Column, order: Column,
                    groupNames: Seq[String], m: Int = 2,
                    rFactor: Double = 0.2): DataFrame = {
    val gc = groupNames.map(col)
    val rs = df.select(gc :+ x.cast("double").as(s"${P}x"): _*)
      .groupBy(gc: _*).agg(stddev_samp(col(s"${P}x")).as(s"${P}sd"))
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

  /** Count of length-w sliding windows within `threshold` (squared-l2)
    * of a fixed query pattern; optional z-normalization of each window.
    * Pure lead-Window algebra — runs at scan speed, any scale.
    * (ts_features.py:239 query_similar_count; subseq_sim.rs:22,68) */
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
