package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / ordered features (SURVEY §2.7; reference
  * python/polars_ds/exprs/ts_features.py). Polars rows are implicitly
  * ordered; Spark rows are not — every ordered op here takes an explicit
  * `order` column (the intentional, documented API divergence from the
  * reference, SURVEY §7 "hard parts").
  *
  * Lag-based features use `Window.partitionBy(group).orderBy(order)`:
  * one shuffle on the group key, sort within partition — the minimal
  * machinery for ordered semantics in a distributed engine. Group-level
  * statistics needed alongside (e.g. z-normalization) are computed with
  * a separate aggregate and broadcast-joined back rather than with
  * whole-partition windows, so no group ever has to fit in one task
  * except for its (unavoidable) ordered scan.
  */
object TSOps {

  private val P = "__pds_"

  private def gw(groupNames: Seq[String], order: Column) =
    Window.partitionBy(groupNames.map(col): _*).orderBy(order)

  /** Lag-based ordered features, one row per group:
    * mean_abs_change (ts_features.py:76), cid_ce (:356),
    * c3 (:336), time-reversal asymmetry (:382), autocorrelation (:393),
    * is_increasing/is_decreasing monotonicity flags (num.py:218,235). */
  def lagFeatures(df: DataFrame, x: Column, order: Column,
                  groupNames: Seq[String], lag1: Int = 1): DataFrame = {
    val gc = groupNames.map(col)
    val w = gw(groupNames, order)
    val t = df
      .select(gc :+ x.cast("double").as(s"${P}x") :+ order.as(s"${P}o"): _*)
      .withColumn(s"${P}l1", lag(col(s"${P}x"), lag1).over(
        Window.partitionBy(gc: _*).orderBy(col(s"${P}o"))))
      .withColumn(s"${P}l2", lag(col(s"${P}x"), 2 * lag1).over(
        Window.partitionBy(gc: _*).orderBy(col(s"${P}o"))))
    val d = col(s"${P}x") - col(s"${P}l1")
    val n = count(lit(1)).cast("double")
    val mean = sum(s"${P}x") / n
    val varPop = sum(col(s"${P}x") * col(s"${P}x")) / n - mean * mean
    t.groupBy(gc: _*).agg(
      avg(abs(d)).as("mean_abs_change"),
      sqrt(sum(d * d)).as("cid_ce"),
      // normalize=True (ts_features.py:356): z-normalize first, which
      // algebraically is cid_ce / std(ddof=1)
      (sqrt(sum(d * d)) / stddev_samp(col(s"${P}x")))
        .as("cid_ce_normalized"),
      avg(col(s"${P}x") * col(s"${P}l1") * col(s"${P}l2")).as("c3"),
      avg(col(s"${P}l2") * col(s"${P}l2") * col(s"${P}l1") -
        col(s"${P}l1") * col(s"${P}x") * col(s"${P}x"))
        .as("time_reversal_asymmetry"),
      // Σ(x−m)(l1−m) over non-null pairs, expanded so the group mean is
      // not nested inside another aggregate:
      ((sum(col(s"${P}x") * col(s"${P}l1")) -
        mean * sum(when(col(s"${P}l1").isNotNull, col(s"${P}x"))) -
        mean * sum(col(s"${P}l1")) +
        count(col(s"${P}l1")) * mean * mean) /
        (count(col(s"${P}l1")) * varPop)).as("auto_corr"),
      min(when(col(s"${P}l1").isNotNull, (d >= 0).cast("int")))
        .cast("boolean").as("is_increasing"),
      min(when(col(s"${P}l1").isNotNull, (d <= 0).cast("int")))
        .cast("boolean").as("is_decreasing"),
      // strict=True variants: diff() > 0 / < 0 (num.py:229,248)
      min(when(col(s"${P}l1").isNotNull, (d > 0).cast("int")))
        .cast("boolean").as("is_increasing_strict"),
      min(when(col(s"${P}l1").isNotNull, (d < 0).cast("int")))
        .cast("boolean").as("is_decreasing_strict"))
  }

  /** Order-free aggregate features, one row per group: mid_range,
    * abs_energy, coefficient of variation, count_uniques, range_count.
    * (ts_features.py:51-106) */
  def basicFeatures(df: DataFrame, x: Column, groupNames: Seq[String],
                    rangeLo: Double, rangeHi: Double,
                    cvDdof: Int = 1): DataFrame = {
    val gc = groupNames.map(col)
    // cv std with a general ddof (ts_features.py:92 query_cv); the
    // default ddof=1 keeps Spark's stddev_samp (bit-stable with the
    // SQL oracle), other ddof use the power-sum form
    val n = count(col(s"${P}x")).cast("double")
    val m = avg(s"${P}x")
    val cvStd =
      if (cvDdof == 1) stddev_samp(col(s"${P}x"))
      else sqrt((sum(col(s"${P}x") * col(s"${P}x")) - n * m * m) /
        (n - cvDdof))
    df.select(gc :+ x.cast("double").as(s"${P}x"): _*)
      .groupBy(gc: _*).agg(
        ((max(s"${P}x") + min(s"${P}x")) / 2.0).as("mid_range"),
        sum(col(s"${P}x") * col(s"${P}x")).as("abs_energy"),
        (cvStd / m).as("cv"),
        countDistinct(col(s"${P}x")).as("count_uniques"),
        sum((col(s"${P}x") >= rangeLo && col(s"${P}x") < rangeHi)
          .cast("long")).as("range_count"))
  }

  /** Mean of the n largest |x| per group (ts_features.py:83
    * query_mean_n_abs_max): rank-filter, no per-group collection. */
  def meanNAbsMax(df: DataFrame, x: Column, groupNames: Seq[String],
                  n: Int): DataFrame = {
    val gc = groupNames.map(col)
    val w = Window.partitionBy(gc: _*)
      .orderBy(abs(col(s"${P}x")).desc, col(s"${P}x").desc)
    df.select(gc :+ x.cast("double").as(s"${P}x"): _*)
      .withColumn(s"${P}rk", row_number().over(w))
      .filter(col(s"${P}rk") <= n)
      .groupBy(gc: _*)
      .agg(avg(abs(col(s"${P}x"))).as("mean_n_abs_max"))
  }

  /** Autocorrelation at `lag` with the reference's options
    * (ts_features.py:393 query_auto_corr): normalize=true →
    * Σ(x−m)(x_{+lag}−m) / ((n−lag)·var(ddof)), NaN when n < lag;
    * normalize=false → mean(x·x_{+lag}). One window lead + one agg. */
  def autoCorr(df: DataFrame, x: Column, order: Column,
               groupNames: Seq[String], lag1: Int, ddof: Int = 0,
               normalize: Boolean = true): DataFrame = {
    val gc = groupNames.map(col)
    val t = df.select(gc :+ x.cast("double").as(s"${P}x")
        :+ order.as(s"${P}o"): _*)
      .withColumn(s"${P}xl", lead(col(s"${P}x"), lag1).over(
        Window.partitionBy(gc: _*).orderBy(col(s"${P}o"))))
    if (!normalize)
      t.groupBy(gc: _*)
        .agg(avg(col(s"${P}x") * col(s"${P}xl")).as("auto_corr"))
    else {
      val n = count(col(s"${P}x")).cast("double")
      val m = sum(s"${P}x") / n
      val varD = (sum(col(s"${P}x") * col(s"${P}x")) - n * m * m) /
        (n - ddof)
      // Σ(x−m)(xl−m) over non-null pairs, expanded (m is per-group)
      val dot = sum(col(s"${P}x") * col(s"${P}xl")) -
        m * sum(when(col(s"${P}xl").isNotNull, col(s"${P}x"))) -
        m * sum(col(s"${P}xl")) + count(col(s"${P}xl")) * m * m
      t.groupBy(gc: _*).agg(
        when(n < lag1, lit(Double.NaN))
          .otherwise(dot / ((n - lag1) * varD)).as("auto_corr"))
    }
  }

  /** Per-run streak lengths (ts_features.py:184 query_streak —
    * polars rle()): one row per run of equal condition value with the
    * run's ordinal, value, and length. */
  def streakLengths(df: DataFrame, cond: Column, order: Column,
                    groupNames: Seq[String]): DataFrame = {
    val gc = groupNames.map(col)
    val t = df.select(gc :+ cond.cast("boolean").as(s"${P}c")
      :+ order.as(s"${P}o"): _*)
    val wo = Window.partitionBy(gc: _*).orderBy(col(s"${P}o"))
    t.withColumn(s"${P}chg",
        when(coalesce(col(s"${P}c") <=>
          lag(col(s"${P}c"), 1).over(wo), lit(false)), 0).otherwise(1))
      .withColumn(s"${P}sid", sum(s"${P}chg").over(
        wo.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(gc :+ col(s"${P}sid"): _*)
      .agg(first(col(s"${P}c")).as("value"),
        count(lit(1)).as("streak_len"))
      .withColumnRenamed(s"${P}sid", "run")
  }

  /** Longest / average / count of streaks where `cond` holds, per group —
    * the gaps-and-islands pattern (ts_features.py:121-208 query_*streak;
    * the reference uses rle_id, this is its shuffle-native equivalent). */
  def streaks(df: DataFrame, cond: Column, order: Column,
              groupNames: Seq[String]): DataFrame = {
    val gc = groupNames.map(col)
    val w = gw(groupNames, order)
    val t = df.select(gc :+ cond.cast("int").as(s"${P}c")
      :+ order.as(s"${P}o"): _*)
    val wo = Window.partitionBy(gc: _*).orderBy(col(s"${P}o"))
    val withId = t.withColumn(s"${P}chg",
        when(col(s"${P}c") =!=
          coalesce(lag(col(s"${P}c"), 1).over(wo), lit(-1)), 1)
          .otherwise(0))
      .withColumn(s"${P}sid", sum(s"${P}chg").over(
        wo.rowsBetween(Window.unboundedPreceding, 0)))
    // keep every run (true, false, null) so a group whose condition
    // never holds still aggregates to ONE row with streak 0 — the
    // reference's `.fill_null(0)` contract (ts_features.py:146,180)
    val runs = withId.groupBy(gc :+ col(s"${P}sid"): _*)
      .agg(sum(when(col(s"${P}c") === 1, 1).otherwise(0)).as(s"${P}len"))
    runs.groupBy(gc: _*).agg(
      coalesce(max(when(col(s"${P}len") > 0, col(s"${P}len"))), lit(0L))
        .as("longest_streak"),
      coalesce(avg(when(col(s"${P}len") > 0, col(s"${P}len"))), lit(0.0))
        .as("avg_streak"),
      sum(when(col(s"${P}len") > 0, 1).otherwise(0)).as("n_streaks"))
  }

  /** Trapezoidal integration of y over explicit abscissa x (num.py:830
    * integrate_trapz; kernel src/num_ext/trapz.rs:26). */
  def trapz(df: DataFrame, y: Column, xCol: Column,
            groupNames: Seq[String]): DataFrame = {
    val gc = groupNames.map(col)
    val t = df.select(gc :+ y.cast("double").as(s"${P}y")
      :+ xCol.cast("double").as(s"${P}x"): _*)
    val w = Window.partitionBy(gc: _*).orderBy(col(s"${P}x"))
    t.withColumn(s"${P}py", lag(s"${P}y", 1).over(w))
      .withColumn(s"${P}px", lag(s"${P}x", 1).over(w))
      .groupBy(gc: _*)
      .agg(sum((col(s"${P}y") + col(s"${P}py")) / 2.0 *
        (col(s"${P}x") - col(s"${P}px"))).as("trapz"))
  }

  /** Linear-trend slope/intercept of x against its row index (detrend's
    * fit step, num.py:1021): slope = cov(i,x)/var(i) — algebraic. */
  def linearTrend(df: DataFrame, x: Column, order: Column,
                  groupNames: Seq[String]): DataFrame = {
    val gc = groupNames.map(col)
    val w = gw(groupNames, order)
    val t = df.select(gc :+ x.cast("double").as(s"${P}x")
      :+ order.as(s"${P}o"): _*)
      .withColumn(s"${P}i",
        (row_number().over(Window.partitionBy(gc: _*)
          .orderBy(col(s"${P}o"))) - 1).cast("double"))
    val n = count(lit(1)).cast("double")
    val sxy = sum(col(s"${P}i") * col(s"${P}x")) -
      sum(s"${P}i") * sum(s"${P}x") / n
    val sxx = sum(col(s"${P}i") * col(s"${P}i")) -
      sum(s"${P}i") * sum(s"${P}i") / n
    t.groupBy(gc: _*).agg(
      (sxy / sxx).as("slope"),
      ((sum(s"${P}x") - (sxy / sxx) * sum(s"${P}i")) / n).as("intercept"))
  }

  /** Shannon entropy (nats) of the value distribution per group
    * (ts_features.py:484 query_entropy): two map-side-combinable
    * aggregations, no collection. */
  def entropy(df: DataFrame, x: Column, groupNames: Seq[String],
              outName: String = "entropy", base: Double = math.E,
              normalize: Boolean = true): DataFrame = {
    val gc = groupNames.map(col)
    val cnt = df.select(gc :+ x.as(s"${P}x"): _*)
      .groupBy(gc :+ col(s"${P}x"): _*).agg(count(lit(1)).as(s"${P}c"))
    val wT = Window.partitionBy(gc: _*)
    // polars .entropy(base, normalize) over unique_counts: normalize
    // divides the counts by their sum first; base rescales the log
    val p =
      if (normalize) col(s"${P}c") / col(s"${P}n")
      else col(s"${P}c").cast("double")
    val h = -sum(p * log(p))
    cnt.withColumn(s"${P}n", sum(s"${P}c").over(wT))
      .groupBy(gc: _*)
      .agg((if (base == math.E) h else h / math.log(base)).as(outName))
  }

  /** Conditional entropy H(x|y) per group (ts_features.py:500;
    * kernel src/num_ext/cond_entropy.rs): H(x|y) = H(x,y) − H(y). */
  def condEntropy(df: DataFrame, x: Column, y: Column,
                  groupNames: Seq[String], outName: String = "cond_entropy")
      : DataFrame = {
    val gc = groupNames.map(col)
    val joint = df.select(gc :+ x.as(s"${P}x") :+ y.as(s"${P}y"): _*)
      .groupBy(gc :+ col(s"${P}x") :+ col(s"${P}y"): _*)
      .agg(count(lit(1)).cast("double").as(s"${P}cxy"))
    val wY = Window.partitionBy(gc :+ col(s"${P}y"): _*)
    val wT = Window.partitionBy(gc: _*)
    joint
      .withColumn(s"${P}cy", sum(s"${P}cxy").over(wY))
      .withColumn(s"${P}n", sum(s"${P}cxy").over(wT))
      .groupBy(gc: _*)
      .agg((-sum(col(s"${P}cxy") / col(s"${P}n") *
        log(col(s"${P}cxy") / col(s"${P}cy")))).as(outName))
  }

  /** First-significant-digit counts 1..9 per group (Benford's law;
    * ts_features.py:209 query_benford / src/num_ext/benford.rs:34).
    * Output: group × digit × cnt (exploded table form). */
  def benford(df: DataFrame, x: Column, groupNames: Seq[String])
      : DataFrame = {
    val gc = groupNames.map(col)
    // first significant digit: floor(|x| / 10^floor(log10|x|)).
    // Non-finite and zero values are excluded (benford.rs formats via
    // scientific notation, which silently skips them). log10 of an
    // exact power of ten can land an ulp off in either direction, so
    // clamp the two boundary artifacts: ratio 10 → digit 1 (floor an
    // exponent low), ratio <1 → digit 9 (floor an exponent high).
    val ax = abs(x.cast("double"))
    val raw = floor(ax / pow(lit(10.0), floor(log10(ax)))).cast("int")
    val digit = when(raw === 10, 1).when(raw === 0, 9).otherwise(raw)
    df.filter(x.isNotNull && ax > 0 && !isnan(ax) &&
        ax < Double.PositiveInfinity)
      .select(gc :+ digit.as("digit"): _*)
      .groupBy(gc :+ col("digit"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Permutation entropy with embedding dimension 3, delay 1
    * (ts_features.py:734 query_permute_entropy). The 3-element ordinal
    * pattern is derived from pairwise comparisons of (x, lag(x),
    * lag2(x)) — pure expression logic, no collection. Ties broken by
    * order of appearance (stable, matches argsort semantics). */
  def permutationEntropy3(df: DataFrame, x: Column, order: Column,
                          groupNames: Seq[String]): DataFrame = {
    val gc = groupNames.map(col)
    val wo = gw(groupNames, order)
    val t = df.select(gc :+ x.cast("double").as(s"${P}x")
      :+ order.as(s"${P}o"): _*)
      .withColumn(s"${P}b",
        lag(s"${P}x", 1).over(Window.partitionBy(gc: _*)
          .orderBy(col(s"${P}o"))))
      .withColumn(s"${P}a",
        lag(s"${P}x", 2).over(Window.partitionBy(gc: _*)
          .orderBy(col(s"${P}o"))))
      .filter(col(s"${P}a").isNotNull)
    // window = (a, b, c) in time order; pattern = ranks with stable ties
    val a = col(s"${P}a"); val b = col(s"${P}b"); val c = col(s"${P}x")
    val pat = concat(
      (a > b).cast("int"), (a > c).cast("int"), (b > c).cast("int"))
    entropy(t.withColumn(s"${P}pat", pat), col(s"${P}pat"), groupNames,
      "permutation_entropy")
  }

  /** Kaplan–Meier survival curve per group (survival.py:11;
    * src/stats/kaplan_meier.rs:11): at each distinct event time,
    * S(t) = Π_{t_i ≤ t} (1 − d_i / n_i). Censored rows (status=0) leave
    * the risk set without an event. Output: group × time × survival. */
  def kaplanMeier(df: DataFrame, time: Column, status: Column,
                  groupNames: Seq[String]): DataFrame = {
    val gc = groupNames.map(col)
    val byT = df.select(gc :+ time.cast("double").as(s"${P}t")
      :+ status.cast("int").as(s"${P}s"): _*)
      .groupBy(gc :+ col(s"${P}t"): _*)
      .agg(sum(s"${P}s").cast("double").as(s"${P}d"),
        count(lit(1)).cast("double").as(s"${P}c"))
    val wT = Window.partitionBy(gc: _*)
    val wBefore = Window.partitionBy(gc: _*).orderBy(col(s"${P}t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(gc: _*).orderBy(col(s"${P}t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    byT
      .withColumn(s"${P}atRisk",
        sum(s"${P}c").over(wT) -
          coalesce(sum(s"${P}c").over(wBefore), lit(0.0)))
      // cumulative product via Σlog; the final factor can be exactly 0
      // (everyone at risk dies) — clamp so log stays finite and the
      // survival underflows to 0 rather than null.
      .withColumn("survival",
        exp(sum(log(greatest(lit(1.0) - col(s"${P}d") / col(s"${P}atRisk"),
          lit(1e-300)))).over(wCum)))
      .select(gc ++ Seq(col(s"${P}t").as("time"), col("survival")): _*)
  }

  /** Nelson–Aalen cumulative-hazard estimator per group (Nelson 1972 /
    * Aalen 1978, public): H(t) = Σ_{t_i ≤ t} d_i / n_i — the additive
    * companion to [[kaplanMeier]] (same risk-set machinery, cumulative
    * SUM instead of log-product). Output: group × time × cum_hazard. */
  def nelsonAalen(df: DataFrame, time: Column, status: Column,
                  groupNames: Seq[String]): DataFrame = {
    val gc = groupNames.map(col)
    val byT = df.select(gc :+ time.cast("double").as(s"${P}t")
      :+ status.cast("int").as(s"${P}s"): _*)
      .groupBy(gc :+ col(s"${P}t"): _*)
      .agg(sum(s"${P}s").cast("double").as(s"${P}d"),
        count(lit(1)).cast("double").as(s"${P}c"))
    val wT = Window.partitionBy(gc: _*)
    val wBefore = Window.partitionBy(gc: _*).orderBy(col(s"${P}t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(gc: _*).orderBy(col(s"${P}t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    byT
      .withColumn(s"${P}atRisk",
        sum(s"${P}c").over(wT) -
          coalesce(sum(s"${P}c").over(wBefore), lit(0.0)))
      .withColumn("cum_hazard",
        sum(col(s"${P}d") / col(s"${P}atRisk")).over(wCum))
      .select(gc ++ Seq(col(s"${P}t").as("time"),
        col("cum_hazard")): _*)
  }

  /** Two-sample log-rank test (Mantel 1966, public): at each distinct
    * time with d_j events, group 1 contributes expected
    * e₁ⱼ = d_j·n₁ⱼ/n_j and hypergeometric variance
    * v_j = d_j·(n₁ⱼ/n_j)·(n₂ⱼ/n_j)·(n_j−d_j)/(n_j−1);
    * χ² = (O₁−E₁)²/ΣV, p via the 1-df identity 2·Φ̄(√χ²).
    * Returns one row {o1, e1, chi2, pvalue}.
    *
    * Scale shape: rows compress to the distinct-time table in one
    * map-side groupBy; risk sets come from a GlobalCumsum over that
    * table (no zero-column window), totals from a 1-row crossJoin. */
  def logRank(df: DataFrame, time: Column, status: Column,
              inFirst: Column): DataFrame = {
    val byT = df.select(time.cast("double").as(s"${P}t"),
        status.cast("int").as(s"${P}s"),
        inFirst.cast("int").as(s"${P}i1"))
      .groupBy(col(s"${P}t"))
      .agg(sum(col(s"${P}s") * col(s"${P}i1")).cast("double")
          .as(s"${P}d1"),
        sum(col(s"${P}s") * (lit(1) - col(s"${P}i1"))).cast("double")
          .as(s"${P}d2"),
        sum(s"${P}i1").cast("double").as(s"${P}c1"),
        (count(lit(1)) - sum(s"${P}i1")).cast("double").as(s"${P}c2"))
    val cum = graft.util.GlobalCumsum.runningSums(byT, col(s"${P}t"),
      ascending = true,
      Seq(col(s"${P}c1") -> s"${P}cum1", col(s"${P}c2") -> s"${P}cum2"))
    val tot = byT.agg(sum(s"${P}c1").as(s"${P}N1"),
      sum(s"${P}c2").as(s"${P}N2"))
    val terms = cum.crossJoin(tot)
      .withColumn(s"${P}n1j",
        col(s"${P}N1") - (col(s"${P}cum1") - col(s"${P}c1")))
      .withColumn(s"${P}n2j",
        col(s"${P}N2") - (col(s"${P}cum2") - col(s"${P}c2")))
      .withColumn(s"${P}dj", col(s"${P}d1") + col(s"${P}d2"))
      .withColumn(s"${P}nj", col(s"${P}n1j") + col(s"${P}n2j"))
      .filter(col(s"${P}dj") > 0)
    val agg = terms.agg(
      sum(s"${P}d1").as(s"${P}o1"),
      sum(col(s"${P}dj") * col(s"${P}n1j") / col(s"${P}nj"))
        .as(s"${P}e1"),
      sum(when(col(s"${P}nj") > 1,
        col(s"${P}dj") * (col(s"${P}n1j") / col(s"${P}nj")) *
          (col(s"${P}n2j") / col(s"${P}nj")) *
          (col(s"${P}nj") - col(s"${P}dj")) / (col(s"${P}nj") - 1))
        .otherwise(0.0)).as(s"${P}v"))
    val chi2 = (col(s"${P}o1") - col(s"${P}e1")) *
      (col(s"${P}o1") - col(s"${P}e1")) / col(s"${P}v")
    agg.select(col(s"${P}o1").as("o1"), col(s"${P}e1").as("e1"),
      chi2.as("chi2"),
      graft.functions.PValues.normSf(sqrt(chi2)) * 2.0 as "pvalue")
  }
}
