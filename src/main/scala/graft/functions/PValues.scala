package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import org.apache.commons.math3.distribution.{ChiSquaredDistribution, FDistribution, NormalDistribution, TDistribution}

/** P-value layer on commons-math3 (ships in /opt/spark/jars).
  * The reference ports its own incomplete beta/gamma (src/stats_utils/);
  * on the JVM these are already available and battle-tested.
  *
  * These are scalar UDFs intended for POST-AGGREGATION rows (one row per
  * group), so the UDF-vs-codegen cost is irrelevant — they never run at
  * row scale. */
object PValues {

  private val stdNorm = new NormalDistribution(null, 0.0, 1.0)

  /** Two-sided t-test p-value from (t, df). */
  val tSf = udf { (t: java.lang.Double, df: java.lang.Double) =>
    if (t == null || df == null || df.isNaN || df <= 0) null
    else java.lang.Double.valueOf(
      2.0 * new TDistribution(null, df).cumulativeProbability(-math.abs(t)))
  }

  /** One-sided F-test p-value (ANOVA) from (f, df1, df2). */
  val fSf = udf { (f: java.lang.Double, d1: java.lang.Double,
                   d2: java.lang.Double) =>
    if (f == null || d1 == null || d2 == null || d1 <= 0 || d2 <= 0) null
    else java.lang.Double.valueOf(
      1.0 - new FDistribution(null, d1, d2).cumulativeProbability(f))
  }

  /** Chi-squared survival function from (x, df). */
  val chi2Sf = udf { (x: java.lang.Double, df: java.lang.Double) =>
    if (x == null || df == null || df <= 0) null
    else java.lang.Double.valueOf(
      1.0 - new ChiSquaredDistribution(null, df).cumulativeProbability(x))
  }

  /** Two-sided normal p-value from a z score. */
  val normSf2 = udf { (z: java.lang.Double) =>
    if (z == null) null
    else java.lang.Double.valueOf(
      2.0 * stdNorm.cumulativeProbability(-math.abs(z)))
  }

  /** One-sided normal survival function sf(z) = P(Z > z). */
  val normSf = udf { (z: java.lang.Double) =>
    if (z == null) null
    else java.lang.Double.valueOf(1.0 - stdNorm.cumulativeProbability(z))
  }

  /** t p-value under a scipy-style alternative (t_test.rs:26-58):
    * two-sided 2·sf(|t|), less sf(−t) = cdf(t), greater sf(t). */
  val tSfAlt = udf { (t: java.lang.Double, df: java.lang.Double,
                      alt: String) =>
    if (t == null || df == null || df.isNaN || df <= 0) null
    else {
      val d = new TDistribution(null, df)
      val p = alt match {
        case "less"    => d.cumulativeProbability(t)
        case "greater" => 1.0 - d.cumulativeProbability(t)
        case _         => 2.0 * d.cumulativeProbability(-math.abs(t))
      }
      java.lang.Double.valueOf(p)
    }
  }

  /** Kolmogorov–Smirnov asymptotic two-sample p-value:
    * p = 2 Σ_{k≥1} (−1)^{k−1} exp(−2 k² λ²), λ = D·sqrt(n1·n2/(n1+n2)).
    * (reference src/stats/ks.rs uses the same asymptotic form) */
  val ksSf = udf { (d: java.lang.Double, n1: java.lang.Double,
                    n2: java.lang.Double) =>
    if (d == null || n1 == null || n2 == null) null
    else {
      val en = math.sqrt(n1 * n2 / (n1 + n2))
      val lambda = math.max((en + 0.12 + 0.11 / en) * d, 0.0)
      var (sum, sign, k) = (0.0, 1.0, 1)
      var term = Double.MaxValue
      while (k <= 100 && math.abs(term) > 1e-12) {
        term = sign * 2.0 * math.exp(-2.0 * k * k * lambda * lambda)
        sum += term; sign = -sign; k += 1
      }
      java.lang.Double.valueOf(math.min(math.max(sum, 0.0), 1.0))
    }
  }

  /** Apply the two-sided t p-value to a struct{statistic, df} column,
    * producing struct{statistic, pvalue}. */
  def withTPValue(ts: Column): Column = withTPValue(ts, "two-sided")

  /** Same with a scipy alternative: two-sided / less / greater
    * (stats.py:58 ttest_ind(alternative=...)). */
  def withTPValue(ts: Column, alternative: String): Column = {
    import org.apache.spark.sql.functions._
    require(Set("two-sided", "less", "greater")(alternative),
      s"unknown alternative '$alternative'")
    struct(ts.getField("statistic").as("statistic"),
      tSfAlt(ts.getField("statistic"), ts.getField("df"),
        lit(alternative)).as("pvalue"))
  }
}
