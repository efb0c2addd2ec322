package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Statistical aggregates as pure `Column` algebra (SURVEY §2.5;
  * reference python/polars_ds/exprs/stats.py). Everything here is a
  * composition of built-in aggregates → partial+final hash aggregation,
  * no buffering, safe at any group size.
  *
  * P-values that need special functions (incomplete beta/gamma) are in
  * [[PValues]] as scalar functions applied to the (tiny) aggregated
  * output — they never run over row-scale data.
  */
object Stats {

  // ---- weighted moments & similarity (stats.py:756-977) ----

  /** Σwx / Σw */
  def weightedMean(x: Column, w: Column): Column = sum(w * x) / sum(w)

  /** Weighted variance. Default is the reference's biased convention
    * (/Σw); `freqWeights=true` treats w as unnormalized frequency
    * weights and divides by Σw − 1 (stats.py:852 weighted_var).
    * Algebraic: (Σwx² − (Σwx)²/Σw) / denom */
  def weightedVar(x: Column, w: Column,
                  freqWeights: Boolean = false): Column = {
    val summand = sum(w * x * x) - sum(w * x) * sum(w * x) / sum(w)
    if (freqWeights) summand / (sum(w) - 1.0) else summand / sum(w)
  }

  /** Weighted covariance (population convention). */
  def weightedCov(x: Column, y: Column, w: Column): Column =
    (sum(w * x * y) - sum(w * x) * sum(w * y) / sum(w)) / sum(w)

  /** Weighted Pearson correlation. */
  def weightedCorr(x: Column, y: Column, w: Column): Column =
    weightedCov(x, y, w) / sqrt(weightedVar(x, w) * weightedVar(y, w))

  /** Column-as-vector cosine similarity. (stats.py:842) */
  def cosineSim(x: Column, y: Column): Column =
    sum(x * y) / sqrt(sum(x * x) * sum(y * y))

  /** Weighted cosine similarity. */
  def weightedCosineSim(x: Column, y: Column, w: Column): Column =
    sum(w * x * y) / sqrt(sum(w * x * x) * sum(w * y * y))

  /** Harmonic mean: n / Σ(1/x); weighted: Σw / Σ(w/x). */
  def hmean(x: Column): Column = count(x).cast("double") / sum(lit(1.0) / x)
  def weightedHmean(x: Column, w: Column): Column = sum(w) / sum(w / x)

  /** Geometric mean: exp(mean(ln x)); weighted: exp(Σw·lnx / Σw). */
  def gmean(x: Column): Column = exp(avg(log(x)))
  def weightedGmean(x: Column, w: Column): Column =
    exp(sum(w * log(x)) / sum(w))

  // ---- t-test family (stats.py:58-230; src/stats/t_test.rs) ----
  // Return struct{statistic, df}; add the p-value with PValues.tSf on the
  // aggregated result.

  /** Two-sample Student t (equal variances) between two columns of the
    * same frame; nulls excluded per-column (count/avg/var ignore nulls). */
  def tTestInd(a: Column, b: Column): Column = {
    val (n1, n2) = (count(a).cast("double"), count(b).cast("double"))
    val (m1, m2) = (avg(a), avg(b))
    val (v1, v2) = (var_samp(a), var_samp(b))
    val df = n1 + n2 - 2.0
    val sp2 = ((n1 - 1.0) * v1 + (n2 - 1.0) * v2) / df
    val t = (m1 - m2) / sqrt(sp2 * (lit(1.0) / n1 + lit(1.0) / n2))
    struct(t.as("statistic"), df.as("df"))
  }

  /** Welch two-sample t (unequal variances), Welch–Satterthwaite df. */
  def tTestWelch(a: Column, b: Column): Column = {
    val (n1, n2) = (count(a).cast("double"), count(b).cast("double"))
    val (v1, v2) = (var_samp(a), var_samp(b))
    val (se1, se2) = (v1 / n1, v2 / n2)
    val t = (avg(a) - avg(b)) / sqrt(se1 + se2)
    val df = (se1 + se2) * (se1 + se2) /
      (se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0))
    struct(t.as("statistic"), df.as("df"))
  }

  /** Two-sample t from PRECOMPUTED stats (stats.py:170
    * ttest_ind_from_stats): the same algebra as [[tTestInd]] /
    * [[tTestWelch]], but over caller-supplied mean/std/count columns —
    * scalar math, usable on already-aggregated rows. */
  def tTestIndFromStats(m1: Column, s1: Column, n1: Column,
                        m2: Column, s2: Column, n2: Column,
                        equalVar: Boolean = true): Column =
    if (equalVar) {
      val df = n1 + n2 - 2.0
      val sp2 = ((n1 - 1.0) * s1 * s1 + (n2 - 1.0) * s2 * s2) / df
      val t = (m1 - m2) / sqrt(sp2 * (lit(1.0) / n1 + lit(1.0) / n2))
      struct(t.as("statistic"), df.as("df"))
    } else {
      val (se1, se2) = (s1 * s1 / n1, s2 * s2 / n2)
      val t = (m1 - m2) / sqrt(se1 + se2)
      val df = (se1 + se2) * (se1 + se2) /
        (se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0))
      struct(t.as("statistic"), df.as("df"))
    }

  /** One-sample t vs population mean mu0. */
  def tTest1Samp(x: Column, mu0: Double): Column = {
    val n = count(x).cast("double")
    val t = (avg(x) - mu0) / sqrt(var_samp(x) / n)
    struct(t.as("statistic"), (n - 1.0).as("df"))
  }

  // ---- central moments / normality (src/stats/normal_test.rs) ----

  /** Population central moments 2..4 from power sums (algebraic, exact). */
  private def centralMoments(x: Column): (Column, Column, Column, Column) = {
    val n = count(x).cast("double")
    val m = avg(x)
    val s2 = avg(x * x)
    val s3 = avg(x * x * x)
    val s4 = avg(x * x * x * x)
    val m2 = s2 - m * m
    val m3 = s3 - m * s2 * 3.0 + m * m * m * 2.0
    val m4 = s4 - m * s3 * 4.0 + m * m * s2 * 6.0 - m * m * m * m * 3.0
    (n, m2, m3, m4)
  }

  /** Population skewness g1 = m3/m2^1.5 (matches scipy bias=True). */
  def skew(x: Column): Column = {
    val (_, m2, m3, _) = centralMoments(x)
    m3 / pow(m2, 1.5)
  }

  /** Population kurtosis b2 = m4/m2² (NOT excess). */
  def kurtosisB2(x: Column): Column = {
    val (_, m2, _, m4) = centralMoments(x)
    m4 / (m2 * m2)
  }

  /** D'Agostino–Pearson K² omnibus normality test:
    * struct{statistic, pvalue}. p = exp(-K²/2) is the exact χ²(2)
    * survival function, so even the p-value is closed-form.
    * (scipy.stats.normaltest formulas; reference src/stats/normal_test.rs) */
  def normalTest(x: Column): Column = {
    val (n, m2, m3, m4) = centralMoments(x)
    val g1 = m3 / pow(m2, 1.5)
    val b2 = m4 / (m2 * m2)
    // skewtest (D'Agostino 1970)
    val y = g1 * sqrt((n + 1.0) * (n + 3.0) / ((n - 2.0) * 6.0))
    val beta2 = (n * n + n * 27.0 - 70.0) * (n + 1.0) * (n + 3.0) * 3.0 /
      ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0))
    val w2 = sqrt((beta2 - 1.0) * 2.0) - 1.0
    val delta = lit(1.0) / sqrt(log(sqrt(w2)))
    val alpha = sqrt(lit(2.0) / (w2 - 1.0))
    val ya = y / alpha
    val z1 = delta * log(ya + sqrt(ya * ya + 1.0))
    // kurtosistest (Anscombe & Glynn 1983)
    val eb2 = (n - 1.0) * 3.0 / (n + 1.0)
    val vb2 = n * (n - 2.0) * (n - 3.0) * 24.0 /
      ((n + 1.0) * (n + 1.0) * (n + 3.0) * (n + 5.0))
    val xk = (b2 - eb2) / sqrt(vb2)
    val sqrtBeta1 = (n * n - n * 5.0 + 2.0) * 6.0 / ((n + 7.0) * (n + 9.0)) *
      sqrt((n + 3.0) * (n + 5.0) * 6.0 / (n * (n - 2.0) * (n - 3.0)))
    val a = lit(8.0) / sqrtBeta1 *
      (lit(2.0) / sqrtBeta1 + sqrt(lit(4.0) / (sqrtBeta1 * sqrtBeta1) + 1.0)) +
      6.0
    val inner = (lit(1.0) - lit(2.0) / a) /
      (xk * sqrt(lit(2.0) / (a - 4.0)) + 1.0)
    val cbrt = signum(inner) * pow(abs(inner), 1.0 / 3.0)
    val z2 = ((lit(1.0) - lit(2.0) / (a * 9.0)) - cbrt) /
      sqrt(lit(2.0) / (a * 9.0))
    val k2 = z1 * z1 + z2 * z2
    struct(k2.as("statistic"), exp(k2 * -0.5).as("pvalue"))
  }
}
