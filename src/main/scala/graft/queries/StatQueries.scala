package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.KendallTauAgg
import graft.functions.Stats
import graft.ops.StatOps

/** Driver-contract queries for SURVEY §2.5 — statistical tests and
  * weighted statistics. P-values that need incomplete beta/gamma are not
  * SQL-expressible and are excluded from oracle outputs (covered by
  * ScalaTest goldens instead); KS and normal-test p-values ARE closed
  * form and included. */
object StatQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ttest" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val a = when(col("event_type") === "click", col("value"))
      val b = when(col("event_type") === "view", col("value"))
      ev.agg(Stats.tTestInd(a, b).as("ts"),
          Stats.tTestWelch(a, b).as("tw"))
        .select(
          round(col("ts.statistic"), 6).as("t_student"),
          round(col("ts.df"), 1).as("df_student"),
          round(col("tw.statistic"), 6).as("t_welch"),
          round(col("tw.df"), 4).as("df_welch"))
    }),
    // from-stats variant (stats.py:170): stats aggregated per group
    // first, then the scalar t algebra applied to the aggregated row
    "q_ttest_from_stats" -> ((s, dir) => {
      val st = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(avg(col("l_quantity")).as("m1"),
          stddev_samp(col("l_quantity")).as("s1"),
          count(col("l_quantity")).cast("double").as("n1"),
          avg(col("l_extendedprice") / 1000.0).as("m2"),
          stddev_samp(col("l_extendedprice") / 1000.0).as("s2"),
          count(col("l_extendedprice")).cast("double").as("n2"))
      val eq = Stats.tTestIndFromStats(col("m1"), col("s1"), col("n1"),
        col("m2"), col("s2"), col("n2"))
      val we = Stats.tTestIndFromStats(col("m1"), col("s1"), col("n1"),
        col("m2"), col("s2"), col("n2"), equalVar = false)
      st.select(col("l_returnflag"),
          round(eq("statistic"), 6).as("t_eq"),
          round(eq("df"), 1).as("df_eq"),
          round(we("statistic"), 6).as("t_welch"),
          round(we("df"), 4).as("df_welch"))
        .orderBy("l_returnflag")
    }),
    "q_ttest_1samp" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(Stats.tTest1Samp(col("value"), 50.0).as("ts"))
        .select(col("event_type"),
          round(col("ts.statistic"), 6).as("t"),
          round(col("ts.df"), 1).as("df"))
        .orderBy("event_type")
    }),
    "q_f_test" -> ((s, dir) => {
      StatOps.fTest(t(s, dir, "events").withColumn("g", lit(1)),
          col("value"), col("event_type"), Seq("g"))
        .select(round(col("f"), 6).as("f"),
          round(col("df1"), 1).as("df1"), round(col("df2"), 1).as("df2"))
    }),
    "q_kruskal" -> ((s, dir) => {
      // Kruskal–Wallis H of l_quantity (integer → heavy ties, so the
      // tie correction is load-bearing) across the 3 return flags,
      // per line status
      StatOps.kruskalWallis(t(s, dir, "lineitem"), col("l_quantity"),
          col("l_returnflag"), Seq("l_linestatus"))
        .select(col("l_linestatus"), round(col("h"), 6).as("h"),
          round(col("df"), 1).as("df"))
        .orderBy("l_linestatus")
    }),
    "q_levene" -> ((s, dir) => {
      // Brown–Forsythe (median-centered Levene) equality of variances
      // across event types, whole frame — exercises the exact
      // per-level median path
      StatOps.levene(t(s, dir, "events").withColumn("g", lit(1)),
          col("value"), col("event_type"), Seq("g"), center = "median")
        .select(round(col("w"), 6).as("w"),
          round(col("df1"), 1).as("df1"), round(col("df2"), 1).as("df2"))
    }),
    "q_wilcoxon" -> ((s, dir) => {
      // paired signed-rank per event type: the constructed pair
      // y = value + (event_id%11 − 5) yields d ∈ {−5..5} — zeros
      // (dropped) and heavy ties (averaged) are both load-bearing
      val ev = t(s, dir, "events")
        .withColumn("y", col("value") + (col("event_id") % 11 - 5))
      StatOps.wilcoxonSignedRank(ev, col("value"), col("y"),
          Seq("event_type"))
        .select(col("event_type"), round(col("w_plus"), 1).as("w_plus"),
          round(col("z"), 6).as("z"), col("n"))
        .orderBy("event_type")
    }),
    "q_mcnemar" -> ((s, dir) => {
      // paired binary outcomes (two graders of the same items) per
      // event type; continuity-corrected χ²₁
      val ev = t(s, dir, "events")
      StatOps.mcnemar(ev, col("value") > 50,
          (col("value") + col("event_id") % 20) > 55, Seq("event_type"))
        .select(col("event_type"), col("b"), col("c"),
          round(col("statistic"), 6).as("statistic"))
        .orderBy("event_type")
    }),
    "q_welch_anova" -> ((s, dir) => {
      // unequal-variance omnibus F across event types, whole frame
      StatOps.welchAnova(t(s, dir, "events").withColumn("g", lit(1)),
          col("value"), col("event_type"), Seq("g"))
        .select(round(col("f"), 6).as("f"),
          round(col("df1"), 1).as("df1"), round(col("df2"), 4).as("df2"))
    }),
    "q_chi2" -> ((s, dir) => {
      StatOps.chi2(t(s, dir, "lineitem").withColumn("g", lit(1)),
          col("l_returnflag"), col("l_linestatus"), Seq("g"))
        .select(round(col("statistic"), 6).as("statistic"),
          round(col("df"), 1).as("df"))
    }),
    // chi2(return_full=True): per-cell expected frequencies
    "q_chi2_full" -> ((s, dir) => {
      StatOps.chi2Full(t(s, dir, "lineitem"),
          col("l_returnflag"), col("l_linestatus"), Nil)
        .select(col("a"), col("b"),
          col("observed").cast("long").as("observed"),
          round(col("expected"), 4).as("expected"),
          round(col("statistic"), 6).as("statistic"),
          round(col("dof"), 1).as("dof"))
        .orderBy("a", "b")
    }),
    "q_weighted_stats" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(Stats.weightedMean(col("l_extendedprice"),
            col("l_quantity")), 4).as("wmean"),
          round(Stats.weightedVar(col("l_extendedprice"),
            col("l_quantity")), 2).as("wvar"),
          round(Stats.weightedVar(col("l_extendedprice"),
            col("l_quantity"), freqWeights = true), 2).as("wvar_freq"),
          round(Stats.weightedCorr(col("l_extendedprice"),
            col("l_discount"), col("l_quantity")), 6).as("wcorr"),
          round(Stats.cosineSim(col("l_extendedprice"),
            col("l_quantity")), 6).as("cos_sim"),
          round(Stats.weightedCosineSim(col("l_extendedprice"),
            col("l_discount"), col("l_quantity")), 6).as("wcos_sim"))
        .orderBy("l_returnflag")
    }),
    "q_hmean_gmean" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(Stats.hmean(col("l_extendedprice")), 4).as("hmean"),
          round(Stats.gmean(col("l_extendedprice")), 4).as("gmean"),
          round(Stats.weightedHmean(col("l_extendedprice"),
            col("l_quantity")), 4).as("whmean"),
          round(Stats.weightedGmean(col("l_extendedprice"),
            col("l_quantity")), 4).as("wgmean"))
        .orderBy("l_returnflag")
    }),
    "q_winsorized_mean" -> ((s, dir) => {
      StatOps.winsorizedMean(t(s, dir, "lineitem"),
          col("l_extendedprice"), Seq("l_returnflag"))
        .withColumn("wmean", round(col("wmean"), 4))
        .orderBy("l_returnflag")
    }),
    "q_spearman" -> ((s, dir) => {
      StatOps.spearman(t(s, dir, "lineitem"), col("l_quantity"),
          col("l_extendedprice"), Seq("l_returnflag"))
        .withColumn("spearman", round(col("spearman"), 6))
        .orderBy("l_returnflag")
    }),
    "q_xi_corr" -> ((s, dir) => {
      StatOps.xiCorr(t(s, dir, "lineitem"), col("l_quantity"),
          col("l_extendedprice"), Seq("l_returnflag"))
        .withColumn("xi", round(col("xi"), 6))
        .orderBy("l_returnflag")
    }),
    "q_kendall_tau" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(round(KendallTauAgg.kendallTau(col("c_acctbal"),
          col("c_custkey")), 6).as("tau"))
        .orderBy("c_mktsegment")
    }),
    // sf1-feasible value-exact twins of q_kendall_tau (BASELINE.md
    // "sf1 CORRECTNESS"): the original's O(n^2)-pairs oracle is
    // DuckDB-infeasible at sf1 group sizes (30k/segment).
    // (a) the same aggregator over a deterministic 1/10 key sample —
    // pair counts shrink 100x, DuckDB replays them at sf1;
    "q_sx_kendall" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_custkey") % 10 === 0)
        .groupBy(col("c_mktsegment"))
        .agg(round(KendallTauAgg.kendallTau(col("c_acctbal"),
          col("c_custkey")), 6).as("tau"))
        .orderBy("c_mktsegment")
    }),
    // (b) a CONSTRUCTED 6M-row fixture whose tau has a closed form:
    // within each of 4 groups, y reverses x inside blocks of 1000, so
    // discordant pairs = (n/B)*C(B,2) exactly and tau = 1 - 2*dis/n0.
    // The O(n log n) merge-sort aggregator digests 1.5M rows/group —
    // full sf1 group size — and must land on the closed form to 6 dp.
    // Deliberately sf-independent (the fixture IS the scale).
    "q_sx_kendall_closed" -> ((s, _) => {
      val B = 1000L
      s.range(6000000L)
        .select((col("id") % 4).as("g"), expr("id DIV 4").as("i"))
        .select(col("g"), col("i").cast("double").as("x"),
          (col("i") + lit(B - 1) - lit(2L) * (col("i") % lit(B)))
            .cast("double").as("y"))
        .groupBy("g")
        .agg(round(KendallTauAgg.kendallTau(col("x"), col("y")), 6)
          .as("tau"))
        .orderBy("g")
    }),
    "q_bicor" -> ((s, dir) => {
      StatOps.bicor(t(s, dir, "lineitem"), col("l_extendedprice"),
          col("l_quantity"), Seq("l_returnflag"))
        .withColumn("bicor", round(col("bicor"), 6))
        .orderBy("l_returnflag")
    }),
    "q_p_adjust" -> ((s, dir) => {
      // BH / Holm / Bonferroni over deterministic p = value/100 per
      // event_type; tie blocks provably get identical adjusted values
      // in both engines, so ordering inside ties cannot matter
      val ev = t(s, dir, "events").withColumn("p0", col("value") / 100.0)
      def agg(method: String, tag: String) =
        StatOps.pAdjust(ev, col("p0"), Seq("event_type"), method)
          .groupBy(col("event_type"))
          .agg(sum(when(col("p_adj") < 0.05, 1L).otherwise(0L))
              .as(s"n_sig_$tag"),
            round(min(col("p_adj")), 6).as(s"min_$tag"),
            round(avg(col("p_adj")), 6).as(s"avg_$tag"))
      agg("bh", "bh")
        .join(agg("holm", "holm"), "event_type")
        .join(agg("bonferroni", "bonf"), "event_type")
        .orderBy("event_type")
    }),
    "q_effect_size" -> ((s, dir) => {
      // the report numbers beside a t/U test: split each event_type
      // by event_id parity and standardize the mean difference
      StatOps.effectSizes(t(s, dir, "events"), col("value"),
          col("event_id") % 2 === 0, Seq("event_type"))
        .select(col("event_type"), col("n1"), col("n2"),
          round(col("cohen_d"), 6).as("cohen_d"),
          round(col("hedges_g"), 6).as("hedges_g"),
          round(col("cliffs_delta"), 6).as("cliffs_delta"))
        .orderBy("event_type")
    }),
    "q_mann_whitney" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .withColumn("g", lit(1))
      val in1 = col("event_type") === "click"
      val two = StatOps.mannWhitneyU(ev, col("value"), in1, Seq("g"))
      val less = StatOps.mannWhitneyU(ev, col("value"), in1, Seq("g"),
        alternative = "less")
      val grt = StatOps.mannWhitneyU(ev, col("value"), in1, Seq("g"),
        alternative = "greater")
      two.select(round(col("u"), 1).as("u"), round(col("z"), 6).as("z"))
        .crossJoin(less.select(round(col("z"), 6).as("z_less")))
        .crossJoin(grt.select(round(col("z"), 6).as("z_greater")))
    }),
    "q_ks_2samp" -> ((s, dir) => {
      StatOps.ks2Samp(
          t(s, dir, "events")
            .filter(col("event_type").isin("click", "view"))
            .withColumn("g", lit(1)),
          col("value"), col("event_type") === "click", Seq("g"))
        .select(round(col("d"), 6).as("d"), col("n1"), col("n2"),
          round(col("pvalue"), 6).as("pvalue"))
    }),
    "q_normal_test" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(Stats.normalTest(col("value")).as("nt"))
        .select(col("event_type"),
          round(col("nt.statistic"), 6).as("statistic"),
          round(col("nt.pvalue"), 6).as("pvalue"))
        .orderBy("event_type")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_ttest" ->
      """WITH m AS (
        |  SELECT
        |    COUNT(value) FILTER (WHERE event_type = 'click')::DOUBLE n1,
        |    AVG(value) FILTER (WHERE event_type = 'click') m1,
        |    VAR_SAMP(value) FILTER (WHERE event_type = 'click') v1,
        |    COUNT(value) FILTER (WHERE event_type = 'view')::DOUBLE n2,
        |    AVG(value) FILTER (WHERE event_type = 'view') m2,
        |    VAR_SAMP(value) FILTER (WHERE event_type = 'view') v2
        |  FROM events)
        |SELECT
        |  ROUND((m1 - m2) / SQRT(((n1-1)*v1 + (n2-1)*v2) / (n1+n2-2)
        |    * (1.0/n1 + 1.0/n2)), 6) AS t_student,
        |  ROUND(n1 + n2 - 2, 1) AS df_student,
        |  ROUND((m1 - m2) / SQRT(v1/n1 + v2/n2), 6) AS t_welch,
        |  ROUND(POW(v1/n1 + v2/n2, 2)
        |    / (POW(v1/n1, 2)/(n1-1) + POW(v2/n2, 2)/(n2-1)), 4)
        |    AS df_welch
        |FROM m""".stripMargin,
    "q_ttest_from_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    AVG(l_quantity) m1, STDDEV_SAMP(l_quantity) s1,
        |    COUNT(l_quantity)::DOUBLE n1,
        |    AVG(l_extendedprice / 1000.0) m2,
        |    STDDEV_SAMP(l_extendedprice / 1000.0) s2,
        |    COUNT(l_extendedprice)::DOUBLE n2
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag,
        |  ROUND((m1 - m2) / SQRT(((n1-1)*s1*s1 + (n2-1)*s2*s2)
        |    / (n1+n2-2) * (1.0/n1 + 1.0/n2)), 6) AS t_eq,
        |  ROUND(n1 + n2 - 2, 1) AS df_eq,
        |  ROUND((m1 - m2) / SQRT(s1*s1/n1 + s2*s2/n2), 6) AS t_welch,
        |  ROUND(POW(s1*s1/n1 + s2*s2/n2, 2)
        |    / (POW(s1*s1/n1, 2)/(n1-1) + POW(s2*s2/n2, 2)/(n2-1)), 4)
        |    AS df_welch
        |FROM m ORDER BY 1""".stripMargin,
    "q_ttest_1samp" ->
      """SELECT event_type,
        |  ROUND((AVG(value) - 50.0)
        |    / SQRT(VAR_SAMP(value) / COUNT(value)), 6) AS t,
        |  ROUND(COUNT(value) - 1.0, 1) AS df
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_f_test" ->
      """WITH lv AS (
        |  SELECT event_type, COUNT(*)::DOUBLE ng, SUM(value) sg,
        |    SUM(value * value) ssg
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT COUNT(*)::DOUBLE k, SUM(ng) n,
        |    SUM(ssg - sg * sg / ng) ssw,
        |    SUM(sg * sg / ng) - SUM(sg) * SUM(sg) / SUM(ng) ssb
        |  FROM lv)
        |SELECT ROUND((ssb / (k-1)) / (ssw / (n-k)), 6) AS f,
        |  ROUND(k - 1, 1) AS df1, ROUND(n - k, 1) AS df2
        |FROM a""".stripMargin,
    "q_wilcoxon" ->
      // d = −(event_id%11 − 5); zeros dropped, |d| tie-avg ranks
      """WITH d0 AS (
        |  SELECT event_type g,
        |    value - (value + (event_id % 11 - 5)) AS d
        |  FROM events),
        |d AS (SELECT g, d, ABS(d) a FROM d0 WHERE d <> 0),
        |r AS (
        |  SELECT g, d,
        |    RANK() OVER (PARTITION BY g ORDER BY a) +
        |      (COUNT(*) OVER (PARTITION BY g, a) - 1) / 2.0 AS rk
        |  FROM d),
        |tie AS (
        |  SELECT g, SUM(c*c*c - c) tsum FROM (
        |    SELECT g, a, COUNT(*)::DOUBLE c FROM d GROUP BY 1, 2)
        |  GROUP BY 1),
        |a AS (
        |  SELECT g, SUM(CASE WHEN d > 0 THEN rk ELSE 0 END) wp,
        |    COUNT(*)::DOUBLE n
        |  FROM r GROUP BY 1)
        |SELECT a.g AS event_type, ROUND(wp, 1) AS w_plus,
        |  ROUND((wp - n*(n+1)/4.0)
        |    / SQRT(n*(n+1)*(2*n+1)/24.0 - tie.tsum/48.0), 6) AS z,
        |  n::BIGINT AS n
        |FROM a JOIN tie ON a.g = tie.g ORDER BY 1""".stripMargin,
    "q_mcnemar" ->
      """WITH p AS (
        |  SELECT event_type,
        |    (value > 50) a, ((value + event_id % 20) > 55) b
        |  FROM events),
        |agg AS (
        |  SELECT event_type,
        |    SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)::DOUBLE b,
        |    SUM(CASE WHEN b AND NOT a THEN 1 ELSE 0 END)::DOUBLE c
        |  FROM p GROUP BY 1)
        |SELECT event_type, b::BIGINT AS b, c::BIGINT AS c,
        |  ROUND(CASE WHEN b + c > 0
        |    THEN (ABS(b - c) - 1) * (ABS(b - c) - 1) / (b + c)
        |    ELSE 0 END, 6) AS statistic
        |FROM agg ORDER BY 1""".stripMargin,
    "q_welch_anova" ->
      """WITH lv AS (
        |  SELECT event_type, COUNT(*)::DOUBLE ng, AVG(value) mg,
        |    VAR_SAMP(value) vg
        |  FROM events GROUP BY 1),
        |w AS (SELECT ng, mg, ng / vg wt FROM lv),
        |tot AS (SELECT SUM(wt) W FROM w),
        |a AS (
        |  SELECT COUNT(*)::DOUBLE k, SUM(wt) W,
        |    SUM(wt * mg) wm, SUM(wt * mg * mg) wm2,
        |    SUM((1 - wt / tot.W) * (1 - wt / tot.W) / (ng - 1)) lam
        |  FROM w, tot GROUP BY tot.W)
        |SELECT
        |  ROUND(((wm2 - wm*wm/W) / (k-1))
        |    / (1 + 2*(k-2)/(k*k-1)*lam), 6) AS f,
        |  ROUND(k - 1, 1) AS df1,
        |  ROUND((k*k - 1) / (3*lam), 4) AS df2
        |FROM a""".stripMargin,
    "q_kruskal" ->
      // tie-averaged ranks = RANK() + (ties-1)/2; H' = H / tie-corr
      """WITH t AS (
        |  SELECT l_linestatus g, l_returnflag f, l_quantity::DOUBLE x
        |  FROM lineitem),
        |r AS (
        |  SELECT g, f,
        |    RANK() OVER (PARTITION BY g ORDER BY x) +
        |      (COUNT(*) OVER (PARTITION BY g, x) - 1) / 2.0 AS rk
        |  FROM t),
        |lv AS (SELECT g, f, SUM(rk) rf, COUNT(*)::DOUBLE nf
        |  FROM r GROUP BY 1, 2),
        |tie AS (
        |  SELECT g, SUM(c*c*c - c) tsum FROM (
        |    SELECT g, x, COUNT(*)::DOUBLE c FROM t GROUP BY 1, 2)
        |  GROUP BY 1),
        |a AS (SELECT g, COUNT(*)::DOUBLE k, SUM(nf) n,
        |  SUM(rf*rf/nf) r2 FROM lv GROUP BY 1)
        |SELECT a.g AS l_linestatus,
        |  ROUND((12.0/(n*(n+1))*r2 - 3*(n+1))
        |    / (1 - tie.tsum/(n*n*n - n)), 6) AS h,
        |  ROUND(k - 1, 1) AS df
        |FROM a JOIN tie ON a.g = tie.g ORDER BY 1""".stripMargin,
    "q_levene" ->
      // Brown–Forsythe = one-way ANOVA F on |x − median_level|
      """WITH t AS (SELECT event_type f, value x FROM events),
        |m AS (SELECT f, MEDIAN(x) med FROM t GROUP BY 1),
        |z AS (SELECT t.f, ABS(t.x - m.med) z
        |  FROM t JOIN m ON t.f = m.f),
        |lv AS (SELECT f, COUNT(*)::DOUBLE ng, SUM(z) sg,
        |  SUM(z * z) ssg FROM z GROUP BY 1),
        |a AS (
        |  SELECT COUNT(*)::DOUBLE k, SUM(ng) n,
        |    SUM(ssg - sg * sg / ng) ssw,
        |    SUM(sg * sg / ng) - SUM(sg) * SUM(sg) / SUM(ng) ssb
        |  FROM lv)
        |SELECT ROUND((ssb / (k-1)) / (ssw / (n-k)), 6) AS w,
        |  ROUND(k - 1, 1) AS df1, ROUND(n - k, 1) AS df2
        |FROM a""".stripMargin,
    "q_chi2" ->
      """WITH o AS (
        |  SELECT l_returnflag a, l_linestatus b, COUNT(*)::DOUBLE o
        |  FROM lineitem GROUP BY 1, 2),
        |e AS (
        |  SELECT o,
        |    SUM(o) OVER (PARTITION BY a) * SUM(o) OVER (PARTITION BY b)
        |      / SUM(o) OVER () AS exp_
        |  FROM o),
        |d AS (
        |  SELECT (COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) df
        |  FROM o)
        |SELECT ROUND(SUM((o - exp_) * (o - exp_) / exp_), 6) AS statistic,
        |  ROUND(ANY_VALUE(d.df), 1) AS df
        |FROM e, d""".stripMargin,
    "q_chi2_full" ->
      """WITH o AS (
        |  SELECT l_returnflag a, l_linestatus b, COUNT(*)::DOUBLE o
        |  FROM lineitem GROUP BY 1, 2),
        |e AS (
        |  SELECT a, b, o,
        |    SUM(o) OVER (PARTITION BY a) * SUM(o) OVER (PARTITION BY b)
        |      / SUM(o) OVER () AS exp_
        |  FROM o),
        |s AS (
        |  SELECT SUM((o - exp_) * (o - exp_) / exp_) stat,
        |    (COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) dof
        |  FROM e)
        |SELECT e.a, e.b, e.o::BIGINT AS observed,
        |  ROUND(e.exp_, 4) AS expected,
        |  ROUND(s.stat, 6) AS statistic, ROUND(s.dof, 1) AS dof
        |FROM e, s ORDER BY 1, 2""".stripMargin,
    "q_weighted_stats" ->
      """SELECT l_returnflag,
        |  ROUND(SUM(l_quantity * l_extendedprice) / SUM(l_quantity), 4)
        |    AS wmean,
        |  ROUND((SUM(l_quantity * l_extendedprice * l_extendedprice)
        |    - SUM(l_quantity * l_extendedprice)
        |      * SUM(l_quantity * l_extendedprice) / SUM(l_quantity))
        |    / SUM(l_quantity), 2) AS wvar,
        |  ROUND((SUM(l_quantity * l_extendedprice * l_extendedprice)
        |    - SUM(l_quantity * l_extendedprice)
        |      * SUM(l_quantity * l_extendedprice) / SUM(l_quantity))
        |    / (SUM(l_quantity) - 1), 2) AS wvar_freq,
        |  ROUND(((SUM(l_quantity * l_extendedprice * l_discount)
        |      - SUM(l_quantity * l_extendedprice)
        |        * SUM(l_quantity * l_discount) / SUM(l_quantity))
        |      / SUM(l_quantity))
        |    / SQRT(
        |      ((SUM(l_quantity * l_extendedprice * l_extendedprice)
        |        - SUM(l_quantity * l_extendedprice)
        |          * SUM(l_quantity * l_extendedprice) / SUM(l_quantity))
        |        / SUM(l_quantity))
        |      * ((SUM(l_quantity * l_discount * l_discount)
        |        - SUM(l_quantity * l_discount)
        |          * SUM(l_quantity * l_discount) / SUM(l_quantity))
        |        / SUM(l_quantity))), 6) AS wcorr,
        |  ROUND(SUM(l_extendedprice * l_quantity)
        |    / SQRT(SUM(l_extendedprice * l_extendedprice)
        |      * SUM(l_quantity * l_quantity)), 6) AS cos_sim,
        |  ROUND(SUM(l_quantity * l_extendedprice * l_discount)
        |    / SQRT(SUM(l_quantity * l_extendedprice * l_extendedprice)
        |      * SUM(l_quantity * l_discount * l_discount)), 6) AS wcos_sim
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_hmean_gmean" ->
      """SELECT l_returnflag,
        |  ROUND(COUNT(*) / SUM(1.0 / l_extendedprice), 4) AS hmean,
        |  ROUND(EXP(AVG(LN(l_extendedprice))), 4) AS gmean,
        |  ROUND(SUM(l_quantity) / SUM(l_quantity / l_extendedprice), 4)
        |    AS whmean,
        |  ROUND(EXP(SUM(l_quantity * LN(l_extendedprice))
        |    / SUM(l_quantity)), 4) AS wgmean
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_winsorized_mean" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice v,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice) - 1 rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) n
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |b AS (
        |  SELECT l_returnflag,
        |    MIN(CASE WHEN rn = CAST(ROUND(0.05*(n-1)) AS BIGINT)
        |      THEN v END) lo,
        |    MIN(CASE WHEN rn = CAST(ROUND(0.95*(n-1)) AS BIGINT)
        |      THEN v END) hi
        |  FROM r GROUP BY 1)
        |SELECT l.l_returnflag,
        |  ROUND(AVG(LEAST(GREATEST(l.l_extendedprice, b.lo), b.hi)), 4)
        |    AS wmean
        |FROM lineitem l JOIN b USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_spearman" ->
      """WITH r AS (
        |  SELECT l_returnflag g,
        |    RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |      + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
        |        - 1) / 2.0 AS rx,
        |    RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
        |      + (COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice)
        |        - 1) / 2.0 AS ry
        |  FROM lineitem)
        |SELECT g AS l_returnflag, ROUND(CORR(rx, ry), 6) AS spearman
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_xi_corr" ->
      """WITH t AS (
        |  SELECT l_returnflag g, l_quantity x, l_extendedprice y
        |  FROM lineitem),
        |r AS (
        |  SELECT g, x, y,
        |    COUNT(*) OVER (PARTITION BY g ORDER BY y
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE r,
        |    COUNT(*) OVER (PARTITION BY g ORDER BY y DESC
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE l,
        |    COUNT(*) OVER (PARTITION BY g)::DOUBLE n
        |  FROM t),
        |s AS (
        |  SELECT g, n, r, l,
        |    LEAD(r) OVER (PARTITION BY g ORDER BY x, y) rn
        |  FROM r)
        |SELECT g AS l_returnflag,
        |  ROUND(1 - n * SUM(ABS(rn - r))
        |    / (2.0 * SUM(l * (n - l))), 6) AS xi
        |FROM s GROUP BY g, n ORDER BY 1""".stripMargin,
    // τ-b from counts (y = c_custkey is unique, so n0 pairs split
    // into con + dis + x-ties): τ = (n0 − tx − 2·dis)/√((n0−tx)·n0).
    // dis (= discordant pairs = inversions of x under y-order) is
    // counted EXACTLY by √n-block decomposition instead of the
    // all-pairs join (r13 verdict ask #8 — the quadratic formulation
    // needed a 300 s budget at sf1's 30k-row segments; this runs in
    // ~3 s): split each segment into ⌈√n⌉ y-blocks (row_number order)
    // and ⌈√n⌉ x-buckets (dense_rank order, ties share a bucket, so
    // bucket order ⇒ strict value order). A discordant pair is then
    // EITHER same-y-block (exact join within block), same-x-bucket
    // across y-blocks (exact join within bucket), or different-both —
    // where x_a > x_b is decided by bucket alone, so those pairs are
    // the cell-count products Σ c(yb,xb)·|{yb' < yb, xb' > xb}|,
    // computed with two windowed prefix sums over the dense cell
    // grid. Disjoint and exhaustive ⇒ exact dis; the per-leg joins
    // are O(n·√n) rows.
    "q_kendall_tau" ->
      """WITH c AS (
        |  SELECT c_mktsegment g, c_acctbal x, c_custkey y FROM customer),
        |n AS (SELECT g, COUNT(*)::BIGINT n FROM c GROUP BY 1),
        |b AS (SELECT g, GREATEST(16, CEIL(SQRT(n)))::BIGINT nb FROM n),
        |t AS (
        |  SELECT c.g, c.x, c.y,
        |    (ROW_NUMBER() OVER (PARTITION BY c.g ORDER BY c.y) - 1)
        |      // CEIL(n.n / b.nb)::BIGINT AS yb,
        |    (DENSE_RANK() OVER (PARTITION BY c.g ORDER BY c.x) - 1) AS xr
        |  FROM c JOIN n USING (g) JOIN b USING (g)),
        |nr AS (SELECT g, MAX(xr) + 1 nxr FROM t GROUP BY 1),
        |t2 AS (
        |  SELECT t.g, t.x, t.y, t.yb,
        |    t.xr // CEIL(nr.nxr / b.nb)::BIGINT AS xb
        |  FROM t JOIN nr USING (g) JOIN b USING (g)),
        |a_cnt AS (
        |  SELECT l.g, COUNT(*)::BIGINT dis
        |  FROM t2 l JOIN t2 r ON l.g = r.g AND l.yb = r.yb
        |    AND l.y < r.y AND l.x > r.x
        |  GROUP BY 1),
        |b_cnt AS (
        |  SELECT l.g, COUNT(*)::BIGINT dis
        |  FROM t2 l JOIN t2 r ON l.g = r.g AND l.xb = r.xb
        |    AND l.yb < r.yb AND l.x > r.x
        |  GROUP BY 1),
        |cells AS (
        |  SELECT g, yb, xb, COUNT(*)::BIGINT c FROM t2 GROUP BY 1, 2, 3),
        |dims AS (SELECT g, MAX(yb) myb, MAX(xb) mxb FROM cells GROUP BY 1),
        |grid AS (
        |  SELECT d.g, gy.yb, gx.xb, COALESCE(cl.c, 0)::BIGINT c
        |  FROM dims d
        |  CROSS JOIN LATERAL (SELECT UNNEST(RANGE(0, d.myb + 1)) AS yb) gy
        |  CROSS JOIN LATERAL (SELECT UNNEST(RANGE(0, d.mxb + 1)) AS xb) gx
        |  LEFT JOIN cells cl ON cl.g = d.g AND cl.yb = gy.yb
        |    AND cl.xb = gx.xb),
        |cumy AS (
        |  SELECT g, yb, xb, c,
        |    SUM(c) OVER (PARTITION BY g, xb ORDER BY yb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS above
        |  FROM grid),
        |s AS (
        |  SELECT g, yb, xb, c,
        |    SUM(COALESCE(above, 0)) OVER (PARTITION BY g, yb
        |      ORDER BY xb DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS right_above
        |  FROM cumy),
        |c_cnt AS (
        |  SELECT g, SUM(c * COALESCE(right_above, 0))::BIGINT dis
        |  FROM s GROUP BY 1),
        |tx AS (
        |  SELECT g, COALESCE(SUM(cnt * (cnt - 1) / 2), 0)::BIGINT tx
        |  FROM (SELECT g, x, COUNT(*)::BIGINT cnt FROM c GROUP BY 1, 2)
        |  GROUP BY 1),
        |fin AS (
        |  SELECT n.g, n.n * (n.n - 1) / 2 AS n0, tx.tx,
        |    COALESCE(a.dis, 0) + COALESCE(bb.dis, 0)
        |      + COALESCE(cc.dis, 0) AS dis
        |  FROM n JOIN tx USING (g)
        |  LEFT JOIN a_cnt a ON a.g = n.g
        |  LEFT JOIN b_cnt bb ON bb.g = n.g
        |  LEFT JOIN c_cnt cc ON cc.g = n.g)
        |SELECT g AS c_mktsegment,
        |  ROUND((n0 - tx - 2.0 * dis) / SQRT((n0 - tx)::DOUBLE * n0), 6)
        |    AS tau
        |FROM fin ORDER BY 1""".stripMargin,
    "q_sx_kendall" ->
      """WITH c AS (
        |  SELECT c_mktsegment g, c_acctbal x, c_custkey y FROM customer
        |  WHERE c_custkey % 10 = 0),
        |p AS (
        |  SELECT a.g,
        |    SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
        |      OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END)::DOUBLE con,
        |    SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
        |      OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END)::DOUBLE dis,
        |    COUNT(*)::DOUBLE n0
        |  FROM c a JOIN c b ON a.g = b.g AND a.y < b.y
        |  GROUP BY 1)
        |SELECT g AS c_mktsegment,
        |  ROUND((con - dis) / SQRT((con + dis) * n0), 6) AS tau
        |FROM p ORDER BY 1""".stripMargin,
    "q_sx_kendall_closed" ->
      """WITH g AS (SELECT UNNEST(ARRAY[0, 1, 2, 3]) g),
        |p AS (SELECT g::BIGINT g,
        |  1500000.0 * (1500000.0 - 1) / 2 n0,
        |  (1500000 / 1000) * (1000.0 * 999 / 2) dis FROM g)
        |SELECT g, ROUND((n0 - 2 * dis) / n0, 6) AS tau
        |FROM p ORDER BY 1""".stripMargin,
    "q_bicor" ->
      """WITH t AS (
        |  SELECT l_returnflag g, l_extendedprice x, l_quantity y
        |  FROM lineitem),
        |med AS (
        |  SELECT g, QUANTILE_CONT(x, 0.5) mx, QUANTILE_CONT(y, 0.5) my
        |  FROM t GROUP BY 1),
        |mad AS (
        |  SELECT t.g, QUANTILE_CONT(ABS(t.x - m.mx), 0.5) madx,
        |    QUANTILE_CONT(ABS(t.y - m.my), 0.5) mady
        |  FROM t JOIN med m USING (g) GROUP BY 1),
        |u AS (
        |  SELECT t.g,
        |    (t.x - m.mx) AS dx0, (t.y - m.my) AS dy0,
        |    (t.x - m.mx) / (9.0 * d.madx) AS uu,
        |    (t.y - m.my) / (9.0 * d.mady) AS vv
        |  FROM t JOIN med m USING (g) JOIN mad d USING (g)),
        |w AS (
        |  SELECT g,
        |    dx0 * CASE WHEN ABS(uu) < 1
        |      THEN POW(1 - uu * uu, 2) ELSE 0 END AS dx,
        |    dy0 * CASE WHEN ABS(vv) < 1
        |      THEN POW(1 - vv * vv, 2) ELSE 0 END AS dy
        |  FROM u)
        |SELECT g AS l_returnflag,
        |  ROUND(SUM(dx * dy) / (SQRT(SUM(dx * dx)) * SQRT(SUM(dy * dy))), 6)
        |    AS bicor
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_p_adjust" ->
      """WITH t AS (
        |  SELECT event_type AS g, value / 100.0 AS p FROM events),
        |r AS (
        |  SELECT g, p,
        |    COUNT(*) OVER (PARTITION BY g)::DOUBLE AS n,
        |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY p)::DOUBLE
        |      AS iu,
        |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY p DESC)::DOUBLE
        |      AS idn
        |  FROM t),
        |adj AS (
        |  SELECT g, p,
        |    LEAST(1.0, MIN(n * p / (n - idn + 1)) OVER (PARTITION BY g
        |      ORDER BY p DESC, idn
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |      AS bh,
        |    LEAST(1.0, MAX((n - iu + 1) * p) OVER (PARTITION BY g
        |      ORDER BY p, iu
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |      AS holm,
        |    LEAST(1.0, n * p) AS bonf
        |  FROM r)
        |SELECT g AS event_type,
        |  SUM(CASE WHEN bh < 0.05 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_sig_bh,
        |  ROUND(MIN(bh), 6) AS min_bh, ROUND(AVG(bh), 6) AS avg_bh,
        |  SUM(CASE WHEN holm < 0.05 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_sig_holm,
        |  ROUND(MIN(holm), 6) AS min_holm,
        |  ROUND(AVG(holm), 6) AS avg_holm,
        |  SUM(CASE WHEN bonf < 0.05 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_sig_bonf,
        |  ROUND(MIN(bonf), 6) AS min_bonf,
        |  ROUND(AVG(bonf), 6) AS avg_bonf
        |FROM adj GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_effect_size" ->
      """WITH t AS (
        |  SELECT event_type AS g, value AS x,
        |    CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS s1
        |  FROM events),
        |mom AS (
        |  SELECT g, SUM(s1)::DOUBLE AS n1,
        |    (COUNT(*) - SUM(s1))::DOUBLE AS n2,
        |    SUM(x * s1) AS sx1, SUM(x * x * s1) AS sq1,
        |    SUM(x * (1 - s1)) AS sx2, SUM(x * x * (1 - s1)) AS sq2
        |  FROM t GROUP BY 1),
        |r AS (
        |  SELECT g, s1,
        |    RANK() OVER (PARTITION BY g ORDER BY x)
        |      + (COUNT(*) OVER (PARTITION BY g, x) - 1) / 2.0 AS ar
        |  FROM t),
        |rs AS (
        |  SELECT g, SUM(CASE WHEN s1 = 1 THEN ar END) AS r1
        |  FROM r GROUP BY 1),
        |f AS (
        |  SELECT m.g, n1, n2, sx1 / n1 AS m1, sx2 / n2 AS m2,
        |    (sq1 - n1 * (sx1 / n1) * (sx1 / n1)) / (n1 - 1) AS v1,
        |    (sq2 - n2 * (sx2 / n2) * (sx2 / n2)) / (n2 - 1) AS v2,
        |    r1
        |  FROM mom m JOIN rs ON rs.g = m.g),
        |e AS (
        |  SELECT g, n1, n2,
        |    (m1 - m2) / SQRT(((n1 - 1) * v1 + (n2 - 1) * v2)
        |      / (n1 + n2 - 2)) AS d,
        |    r1 - n1 * (n1 + 1) / 2.0 AS u1
        |  FROM f)
        |SELECT g AS event_type, n1::BIGINT AS n1, n2::BIGINT AS n2,
        |  ROUND(d, 6) AS cohen_d,
        |  ROUND(d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6)
        |    AS hedges_g,
        |  ROUND(2.0 * u1 / (n1 * n2) - 1.0, 6) AS cliffs_delta
        |FROM e ORDER BY 1""".stripMargin,
    "q_mann_whitney" ->
      """WITH t AS (
        |  SELECT value,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END s1
        |  FROM events WHERE event_type IN ('click', 'view')),
        |r AS (
        |  SELECT s1,
        |    RANK() OVER (ORDER BY value)
        |      + (COUNT(*) OVER (PARTITION BY value) - 1) / 2.0 AS ar
        |  FROM t),
        |tie AS (
        |  SELECT SUM(POW(c, 3) - c) tt
        |  FROM (SELECT COUNT(*)::DOUBLE c FROM t GROUP BY value)),
        |a AS (
        |  SELECT SUM(CASE WHEN s1 = 1 THEN ar END) r1,
        |    SUM(s1)::DOUBLE n1, COUNT(*) - SUM(s1)::DOUBLE n2
        |  FROM r),
        |u AS (
        |  SELECT r1 - n1 * (n1 + 1) / 2.0 u1, n1 * n2 mn,
        |    n1 * n2 / 2.0 mu,
        |    SQRT(n1 * n2 / 12.0 * ((n1 + n2 + 1.0)
        |      - tt / ((n1 + n2) * (n1 + n2 - 1.0)))) sd
        |  FROM a, tie)
        |SELECT
        |  ROUND(u1, 1) AS u,
        |  ROUND((GREATEST(u1, mn - u1) - mu - 0.5) / sd, 6) AS z,
        |  ROUND((mn - u1 - mu - 0.5) / sd, 6) AS z_less,
        |  ROUND((u1 - mu - 0.5) / sd, 6) AS z_greater
        |FROM u""".stripMargin,
    "q_ks_2samp" ->
      """WITH t AS (
        |  SELECT value x,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END s1
        |  FROM events WHERE event_type IN ('click', 'view')),
        |v AS (
        |  SELECT x, SUM(s1)::DOUBLE c1, COUNT(*) - SUM(s1)::DOUBLE c2
        |  FROM t GROUP BY 1),
        |c AS (
        |  SELECT SUM(c1) OVER (ORDER BY x) f1,
        |    SUM(c2) OVER (ORDER BY x) f2,
        |    SUM(c1) OVER () n1, SUM(c2) OVER () n2
        |  FROM v),
        |d AS (
        |  SELECT MAX(ABS(f1 / n1 - f2 / n2)) d,
        |    ANY_VALUE(n1) n1, ANY_VALUE(n2) n2
        |  FROM c),
        |lam AS (
        |  SELECT d, n1, n2,
        |    (SQRT(n1 * n2 / (n1 + n2)) + 0.12
        |      + 0.11 / SQRT(n1 * n2 / (n1 + n2))) * d AS l
        |  FROM d)
        |SELECT ROUND(d, 6) AS d, n1::BIGINT AS n1, n2::BIGINT AS n2,
        |  ROUND(LEAST(GREATEST((
        |    SELECT SUM(POW(-1.0, k - 1) * 2.0 * EXP(-2.0 * k * k * l * l))
        |    FROM range(1, 26) s(k)), 0.0), 1.0), 6) AS pvalue
        |FROM lam""".stripMargin,
    "q_normal_test" ->
      """WITH t AS (SELECT event_type g, value x FROM events),
        |m AS (
        |  SELECT g, COUNT(*)::DOUBLE n, AVG(x) mean, AVG(x*x) s2,
        |    AVG(x*x*x) s3, AVG(x*x*x*x) s4
        |  FROM t GROUP BY 1),
        |mm AS (
        |  SELECT g, n, s2 - mean*mean m2,
        |    s3 - 3*mean*s2 + 2*mean*mean*mean m3,
        |    s4 - 4*mean*s3 + 6*mean*mean*s2 - 3*mean*mean*mean*mean m4
        |  FROM m),
        |gg AS (
        |  SELECT g, n, m3 / POW(m2, 1.5) g1, m4 / (m2 * m2) b2 FROM mm),
        |sk AS (
        |  SELECT g, n, b2, g1 * SQRT((n+1)*(n+3)/(6*(n-2))) y,
        |    3.0*(n*n + 27*n - 70)*(n+1)*(n+3)
        |      / ((n-2)*(n+5)*(n+7)*(n+9)) beta2
        |  FROM gg),
        |sk2 AS (SELECT g, n, b2, y, SQRT(2*(beta2-1)) - 1 w2 FROM sk),
        |sk3 AS (
        |  SELECT g, n, b2,
        |    (1.0/SQRT(LN(SQRT(w2))))
        |      * LN(y/SQRT(2/(w2-1))
        |        + SQRT(POW(y/SQRT(2/(w2-1)), 2) + 1)) z1
        |  FROM sk2),
        |ku AS (
        |  SELECT g, z1,
        |    (b2 - 3*(n-1)/(n+1))
        |      / SQRT(24*n*(n-2)*(n-3)/((n+1)*(n+1)*(n+3)*(n+5))) xk,
        |    6*(n*n - 5*n + 2)/((n+7)*(n+9))
        |      * SQRT(6*(n+3)*(n+5)/(n*(n-2)*(n-3))) sb1
        |  FROM sk3),
        |ku2 AS (
        |  SELECT g, z1, xk,
        |    6 + 8/sb1 * (2/sb1 + SQRT(1 + 4/(sb1*sb1))) a
        |  FROM ku),
        |ku3 AS (
        |  SELECT g, z1,
        |    ((1 - 2/(9*a))
        |      - SIGN((1 - 2/a)/(1 + xk*SQRT(2/(a-4))))
        |        * POW(ABS((1 - 2/a)/(1 + xk*SQRT(2/(a-4)))), 1.0/3.0))
        |      / SQRT(2/(9*a)) z2
        |  FROM ku2)
        |SELECT g AS event_type,
        |  ROUND(z1*z1 + z2*z2, 6) AS statistic,
        |  ROUND(EXP(-(z1*z1 + z2*z2)/2), 6) AS pvalue
        |FROM ku3 ORDER BY 1""".stripMargin
  )
}
