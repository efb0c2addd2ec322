package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.LempelZivAgg
import graft.ops.TSOps

/** Driver-contract queries for SURVEY §2.7 — ordered/time-series
  * features over the events table, ordered by event_id per event_type. */
object TSQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ts_lag_features" -> ((s, dir) => {
      TSOps.lagFeatures(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"))
        .select(col("event_type"),
          round(col("mean_abs_change"), 6).as("mean_abs_change"),
          round(col("cid_ce"), 4).as("cid_ce"),
          round(col("cid_ce_normalized"), 6).as("cid_ce_norm"),
          round(col("c3"), 2).as("c3"),
          round(col("time_reversal_asymmetry"), 2).as("tra"),
          round(col("auto_corr"), 6).as("auto_corr"),
          col("is_increasing"), col("is_decreasing"),
          col("is_increasing_strict"), col("is_decreasing_strict"))
        .orderBy("event_type")
    }),
    "q_ts_basic" -> ((s, dir) => {
      TSOps.basicFeatures(t(s, dir, "events"), col("value"),
          Seq("event_type"), 20.0, 80.0)
        .select(col("event_type"),
          round(col("mid_range"), 4).as("mid_range"),
          // gate-side projection: compare energy in 1e6 units so the
          // ~1e-13 relative float-summation-order noise between Spark
          // and DuckDB stays far from the rounding grid at every sf
          // (raw sum is ~1e9 at sf1, where round(.,4) flaked)
          round(col("abs_energy") / 1e6, 4).as("abs_energy_m"),
          round(col("cv"), 6).as("cv"),
          col("count_uniques"), col("range_count"))
        .orderBy("event_type")
    }),
    "q_mean_n_abs_max" -> ((s, dir) => {
      TSOps.meanNAbsMax(t(s, dir, "events"), col("value"),
          Seq("event_type"), 5)
        .withColumn("mean_n_abs_max", round(col("mean_n_abs_max"), 6))
        .orderBy("event_type")
    }),
    "q_streaks" -> ((s, dir) => {
      TSOps.streaks(t(s, dir, "events"), col("value") > 50.0,
          col("event_id"), Seq("event_type"))
        .withColumn("avg_streak", round(col("avg_streak"), 6))
        .orderBy("event_type")
    }),
    "q_trapz" -> ((s, dir) => {
      TSOps.trapz(t(s, dir, "events"), col("value"), col("event_id"),
          Seq("event_type"))
        .withColumn("trapz", round(col("trapz"), 3))
        .orderBy("event_type")
    }),
    "q_linear_trend" -> ((s, dir) => {
      TSOps.linearTrend(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"))
        .withColumn("slope", round(col("slope"), 6))
        .withColumn("intercept", round(col("intercept"), 4))
        .orderBy("event_type")
    }),
    "q_entropy" -> ((s, dir) => {
      val df = t(s, dir, "events")
        .withColumn("bin", floor(col("value") / 10.0).cast("int"))
        .withColumn("ybin", col("user_id") % 5)
      TSOps.entropy(df, col("bin"), Seq("event_type"))
        .join(TSOps.entropy(df, col("bin"), Seq("event_type"),
          outName = "entropy_bits", base = 2.0), Seq("event_type"))
        .join(TSOps.condEntropy(df, col("bin"), col("ybin"),
          Seq("event_type")), Seq("event_type"))
        .select(col("event_type"),
          round(col("entropy"), 6).as("entropy"),
          round(col("entropy_bits"), 6).as("entropy_bits"),
          round(col("cond_entropy"), 6).as("cond_entropy"))
        .orderBy("event_type")
    }),
    "q_benford" -> ((s, dir) => {
      TSOps.benford(t(s, dir, "events"), col("value"), Seq("event_type"))
        .orderBy("event_type", "digit")
    }),
    "q_permute_entropy" -> ((s, dir) => {
      TSOps.permutationEntropy3(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"))
        .withColumn("permutation_entropy",
          round(col("permutation_entropy"), 6))
        .orderBy("event_type")
    }),
    // standalone auto_corr with the ddof/normalize options
    // (ts_features.py:393)
    "q_auto_corr" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val norm = TSOps.autoCorr(ev, col("value"), col("event_id"),
          Seq("event_type"), 3, ddof = 1)
        .withColumnRenamed("auto_corr", "ac_lag3_ddof1")
      val raw = TSOps.autoCorr(ev, col("value"), col("event_id"),
          Seq("event_type"), 2, normalize = false)
        .withColumnRenamed("auto_corr", "ac_lag2_raw")
      norm.join(raw, "event_type")
        .select(col("event_type"),
          round(col("ac_lag3_ddof1"), 6).as("ac_lag3_ddof1"),
          round(col("ac_lag2_raw"), 4).as("ac_lag2_raw"))
        .orderBy("event_type")
    }),
    // per-run streak lengths (ts_features.py:184 query_streak = rle())
    "q_streak_lengths" -> ((s, dir) => {
      TSOps.streakLengths(t(s, dir, "events"), col("value") > 50.0,
          col("event_id"), Seq("event_type"))
        .select(col("event_type"), col("run"), col("value"),
          col("streak_len"))
        .orderBy("event_type", "run")
    }),
    "q_kaplan_meier" -> ((s, dir) => {
      TSOps.kaplanMeier(
          t(s, dir, "events").withColumn("status", col("user_id") % 2),
          col("value"), col("status"), Seq("event_type"))
        .withColumn("survival", round(col("survival"), 6))
        .orderBy("event_type", "time")
    }),
    "q_seasonal" -> ((s, dir) => {
      // classical additive decomposition, period 7 over the event_id
      // order; the oracle replays the centered-MA trend, per-phase
      // re-centered indices and residuals with the same windows
      import graft.ops.TSOps2
      TSOps2.seasonalDecompose(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"), 7)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("trend").isNull, 1L).otherwise(0L))
            .as("n_edge"),
          round(avg(abs(col("resid"))), 6).as("avg_abs_resid"),
          round(max(col("seasonal")), 6).as("max_seasonal"),
          round(min(col("seasonal")), 6).as("min_seasonal"))
        .orderBy("event_type")
    }),
    "q_cusum" -> ((s, dir) => {
      // CUSUM drift detection on integer CENTS: every prefix sum is
      // an exact integer (≪ 2^53) in both engines, so the reflection
      // identity's running extrema — and therefore every alarm
      // decision — are bit-identical regardless of either engine's
      // internal summation order. target 52.00, slack 2.00, h 200.00.
      import graft.ops.TSOps2
      TSOps2.cusum(t(s, dir, "events"),
          round(col("value") * 100), col("event_id"),
          Seq("event_type"), 5200.0, 200.0, 20000.0)
        .select(col("event_type"), col("n_alarms_up"),
          col("n_alarms_down"),
          col("first_alarm_order").cast("long").as("first_alarm"),
          col("max_s_up").cast("long").as("max_s_up"),
          col("max_s_down").cast("long").as("max_s_down"))
        .orderBy("event_type")
    }),
    "q_nelson_aalen" -> ((s, dir) => {
      TSOps.nelsonAalen(
          t(s, dir, "events").withColumn("status", col("user_id") % 2),
          col("value"), col("status"), Seq("event_type"))
        .withColumn("cum_hazard", round(col("cum_hazard"), 6))
        .orderBy("event_type", "time")
    }),
    "q_cindex" -> ((s, dir) => {
      // Harrell's C over a deterministic 1-in-25 user slice (the
      // oracle is the quadratic pair join — q_sx convention keeps it
      // sf1-feasible); the op itself is O(n log n)
      t(s, dir, "events").filter(col("user_id") % 25 === 3)
        .groupBy("event_type")
        .agg(graft.agg.ConcordanceAgg.cIndex(col("value"),
          col("user_id") % 3 === 0,
          (col("event_id") % 100) / 100.0).as("ci"))
        .select(col("event_type"),
          round(col("ci._1"), 6).as("c_index"),
          col("ci._2").as("n_pairs"))
        .orderBy("event_type")
    }),
    "q_cox_ph" -> ((s, dir) => {
      // Cox PH effect of a synthetic covariate on event-time `value`;
      // fixed 3-Newton-step contract replayed iteration-by-iteration
      // in the oracle. The normal p-value is spec-gated (family rule).
      graft.ops.SurvOps.coxPh(t(s, dir, "events"), col("value"),
          col("user_id") % 3 === 0,
          (col("event_id") % 100) / 100.0, Seq("event_type"),
          maxIter = 3)
        .select(col("event_type"), col("n"), col("n_events"),
          round(col("beta"), 6).as("beta"),
          round(col("se"), 6).as("se"),
          round(col("hazard_ratio"), 6).as("hazard_ratio"))
        .orderBy("event_type")
    }),
    "q_log_rank" -> ((s, dir) => {
      // two-sample survival comparison: parity of event_id splits the
      // arms, user_id parity is the event/censor status. The oracle
      // replays O1/E1/chi2; the 1-df p-value identity is spec-gated.
      TSOps.logRank(
          t(s, dir, "events").withColumn("status", col("user_id") % 2),
          col("value"), col("status"), col("event_id") % 2 === 0)
        .select(col("o1").cast("long").as("o1"),
          round(col("e1"), 4).as("e1"),
          round(col("chi2"), 6).as("chi2"))
    }),
    // LZ76 dictionary-parse complexity: the parse is sequential, but it
    // IS SQL-expressible — a recursive CTE carrying (position, phrase
    // set) replays the exact scan, so the query gets a full value oracle.
    "q_lempel_ziv" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(round(LempelZivAgg.lempelZiv(col("event_id"),
          col("value") > 50.0, asRatio = true), 6).as("lz_ratio"))
        .orderBy("event_type")
    }),
    // sf1-feasible value-exact twin of q_lempel_ziv (BASELINE.md "sf1
    // CORRECTNESS"): the original's recursive-CTE oracle replays the
    // LZ76 parse with a linear phrase-list scan — quadratic in phrase
    // count, DuckDB-infeasible at sf1 sequence lengths (200k/group).
    // A deterministic 1/200 key sample keeps full-corpus group
    // STRUCTURE (same groups, same agg merge across partitions) at
    // oracle-replayable sequence lengths (~1k/group at sf1).
    "q_sx_lz" -> ((s, dir) => {
      t(s, dir, "events").filter(col("event_id") % 200 === 0)
        .groupBy(col("event_type"))
        .agg(round(LempelZivAgg.lempelZiv(col("event_id"),
          col("value") > 50.0, asRatio = true), 6).as("lz_ratio"))
        .orderBy("event_type")
    })
  )

  // q_cox_ph: one Newton iteration = a descending range-frame window
  // pass (Breslow risk sums) + a per-group score/information aggregate;
  // chained here CTE-by-CTE for the fixed 3-step contract.
  private val coxSql: String = {
    val w = "WINDOW w AS (PARTITION BY g ORDER BY t DESC " +
      "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    def iter(i: Int): String =
      s"""st$i AS (
         |  SELECT g, t, e, x, b, SUM(EXP(b*x)) OVER w s0,
         |    SUM(x*EXP(b*x)) OVER w s1, SUM(x*x*EXP(b*x)) OVER w s2
         |  FROM j$i $w),
         |b$i AS (
         |  SELECT g, ANY_VALUE(b)
         |    + SUM(CASE WHEN e=1 THEN x - s1/s0 END)
         |      / SUM(CASE WHEN e=1 THEN s2/s0 - (s1/s0)*(s1/s0) END) b
         |  FROM st$i GROUP BY 1),
         |j${i + 1} AS (
         |  SELECT base.g, t, e, x, b$i.b
         |  FROM base JOIN b$i ON base.g = b$i.g),""".stripMargin
    s"""WITH base AS (
       |  SELECT event_type g, value t,
       |    CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END e,
       |    (event_id % 100) / 100.0 x
       |  FROM events),
       |j1 AS (SELECT g, t, e, x, 0.0 b FROM base),
       |${iter(1)}
       |${iter(2)}
       |${iter(3)}
       |fin AS (
       |  SELECT g, t, e, x, b, SUM(EXP(b*x)) OVER w s0,
       |    SUM(x*EXP(b*x)) OVER w s1, SUM(x*x*EXP(b*x)) OVER w s2
       |  FROM j4 $w)
       |SELECT g AS event_type, COUNT(*) AS n,
       |  SUM(e)::BIGINT AS n_events,
       |  ROUND(ANY_VALUE(b), 6) AS beta,
       |  ROUND(1.0/SQRT(SUM(CASE WHEN e=1
       |    THEN s2/s0 - (s1/s0)*(s1/s0) END)), 6) AS se,
       |  ROUND(EXP(ANY_VALUE(b)), 6) AS hazard_ratio
       |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q_cindex" ->
      """WITH s AS (
        |  SELECT event_type g, value t,
        |    CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END e,
        |    (event_id % 100)/100.0 r
        |  FROM events WHERE user_id % 25 = 3)
        |SELECT a.g AS event_type,
        |  ROUND(AVG(CASE WHEN a.r > b.r THEN 1.0
        |    WHEN a.r = b.r THEN 0.5 ELSE 0.0 END), 6) AS c_index,
        |  COUNT(*) AS n_pairs
        |FROM s a JOIN s b ON a.g = b.g AND a.t < b.t AND a.e = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cox_ph" -> coxSql,
    "q_auto_corr" ->
      """WITH t AS (
        |  SELECT event_type, value x,
        |    LEAD(value, 3) OVER (PARTITION BY event_type
        |      ORDER BY event_id) x3,
        |    LEAD(value, 2) OVER (PARTITION BY event_type
        |      ORDER BY event_id) x2
        |  FROM events),
        |m AS (
        |  SELECT event_type, AVG(value) mean, VAR_SAMP(value) vs,
        |    COUNT(*)::DOUBLE n
        |  FROM events GROUP BY 1)
        |SELECT t.event_type,
        |  ROUND((SUM(x * x3)
        |    - m.mean * SUM(CASE WHEN x3 IS NOT NULL THEN x END)
        |    - m.mean * SUM(x3) + COUNT(x3) * m.mean * m.mean)
        |    / ((m.n - 3) * m.vs), 6) AS ac_lag3_ddof1,
        |  ROUND(AVG(x * x2), 4) AS ac_lag2_raw
        |FROM t JOIN m USING (event_type)
        |GROUP BY t.event_type, m.mean, m.vs, m.n ORDER BY 1""".stripMargin,
    "q_streak_lengths" ->
      """WITH t AS (
        |  SELECT event_type, (value > 50.0) c, event_id,
        |    LAG(value > 50.0) OVER (PARTITION BY event_type
        |      ORDER BY event_id) pc
        |  FROM events),
        |r AS (
        |  SELECT event_type, c,
        |    CAST(SUM(CASE WHEN pc IS NOT DISTINCT FROM c THEN 0 ELSE 1
        |      END) OVER (PARTITION BY event_type ORDER BY event_id)
        |      AS BIGINT) run
        |  FROM t)
        |SELECT event_type, run, ANY_VALUE(c) AS value,
        |  COUNT(*) AS streak_len
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // LZ76 dictionary parse (the tsfresh variant LempelZivAgg implements):
    // at position ind, the next phrase is the shortest prefix of the tail
    // not yet in the phrase set. A phrase longer than maxlen+1 can never
    // collide with the set, so the candidate search is bounded by
    // maxlen+1 — the recursion does O(c · maxlen) work, not O(c · n).
    "q_lempel_ziv" ->
      """WITH RECURSIVE seqs AS (
        |  SELECT event_type, string_agg(
        |    CASE WHEN value > 50.0 THEN '1' ELSE '0' END, ''
        |    ORDER BY event_id) s
        |  FROM events GROUP BY 1),
        |st(event_type, s, n, ind, seen, maxlen, c) AS (
        |  SELECT event_type, s, strlen(s)::INT, 1, []::VARCHAR[], 0, 0
        |  FROM seqs
        |  UNION ALL
        |  SELECT event_type, s, n, ind + L,
        |    list_append(seen, s[ind:ind+L-1]), GREATEST(maxlen, L), c + 1
        |  FROM (
        |    SELECT *, list_min(list_filter(
        |      range(1, LEAST(n - ind + 1, maxlen + 1) + 1),
        |      l -> NOT list_contains(seen, s[ind:ind+l-1])))::INT L
        |    FROM st WHERE ind <= n)
        |  WHERE L IS NOT NULL)
        |SELECT event_type, ROUND(MAX(c)::DOUBLE / MAX(n), 6) AS lz_ratio
        |FROM st GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sx_lz" ->
      """WITH RECURSIVE seqs AS (
        |  SELECT event_type, string_agg(
        |    CASE WHEN value > 50.0 THEN '1' ELSE '0' END, ''
        |    ORDER BY event_id) s
        |  FROM events WHERE event_id % 200 = 0 GROUP BY 1),
        |st(event_type, s, n, ind, seen, maxlen, c) AS (
        |  SELECT event_type, s, strlen(s)::INT, 1, []::VARCHAR[], 0, 0
        |  FROM seqs
        |  UNION ALL
        |  SELECT event_type, s, n, ind + L,
        |    list_append(seen, s[ind:ind+L-1]), GREATEST(maxlen, L), c + 1
        |  FROM (
        |    SELECT *, list_min(list_filter(
        |      range(1, LEAST(n - ind + 1, maxlen + 1) + 1),
        |      l -> NOT list_contains(seen, s[ind:ind+l-1])))::INT L
        |    FROM st WHERE ind <= n)
        |  WHERE L IS NOT NULL)
        |SELECT event_type, ROUND(MAX(c)::DOUBLE / MAX(n), 6) AS lz_ratio
        |FROM st GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ts_lag_features" ->
      """WITH t AS (
        |  SELECT event_type, value x,
        |    LAG(value, 1) OVER (PARTITION BY event_type ORDER BY event_id)
        |      l1,
        |    LAG(value, 2) OVER (PARTITION BY event_type ORDER BY event_id)
        |      l2
        |  FROM events)
        |SELECT event_type,
        |  ROUND(AVG(ABS(x - l1)), 6) AS mean_abs_change,
        |  ROUND(SQRT(SUM((x - l1) * (x - l1))), 4) AS cid_ce,
        |  ROUND(SQRT(SUM((x - l1) * (x - l1))) / STDDEV_SAMP(x), 6)
        |    AS cid_ce_norm,
        |  ROUND(AVG(x * l1 * l2), 2) AS c3,
        |  ROUND(AVG(l2 * l2 * l1 - l1 * x * x), 2) AS tra,
        |  ROUND(SUM((x - sub.mean) * (l1 - sub.mean))
        |    / (COUNT(l1) * sub.varp), 6) AS auto_corr,
        |  MIN(CASE WHEN l1 IS NOT NULL
        |    THEN CASE WHEN x - l1 >= 0 THEN 1 ELSE 0 END END) = 1
        |    AS is_increasing,
        |  MIN(CASE WHEN l1 IS NOT NULL
        |    THEN CASE WHEN x - l1 <= 0 THEN 1 ELSE 0 END END) = 1
        |    AS is_decreasing,
        |  MIN(CASE WHEN l1 IS NOT NULL
        |    THEN CASE WHEN x - l1 > 0 THEN 1 ELSE 0 END END) = 1
        |    AS is_increasing_strict,
        |  MIN(CASE WHEN l1 IS NOT NULL
        |    THEN CASE WHEN x - l1 < 0 THEN 1 ELSE 0 END END) = 1
        |    AS is_decreasing_strict
        |FROM t
        |JOIN (SELECT event_type, AVG(value) mean,
        |        AVG(value * value) - AVG(value) * AVG(value) varp
        |      FROM events GROUP BY 1) sub USING (event_type)
        |GROUP BY event_type, sub.mean, sub.varp ORDER BY 1""".stripMargin,
    "q_ts_basic" ->
      """SELECT event_type,
        |  ROUND((MAX(value) + MIN(value)) / 2.0, 4) AS mid_range,
        |  ROUND(SUM(value * value) / 1e6, 4) AS abs_energy_m,
        |  ROUND(STDDEV_SAMP(value) / AVG(value), 6) AS cv,
        |  COUNT(DISTINCT value) AS count_uniques,
        |  SUM(CASE WHEN value >= 20.0 AND value < 80.0 THEN 1 ELSE 0 END)
        |    ::BIGINT AS range_count
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mean_n_abs_max" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY ABS(value) DESC, value DESC) rk
        |  FROM events)
        |SELECT event_type, ROUND(AVG(ABS(value)), 6) AS mean_n_abs_max
        |FROM r WHERE rk <= 5 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_streaks" ->
      """WITH t AS (
        |  SELECT event_type, event_id,
        |    CASE WHEN value > 50.0 THEN 1 ELSE 0 END c
        |  FROM events),
        |chg AS (
        |  SELECT event_type, event_id, c,
        |    CASE WHEN c <> COALESCE(LAG(c) OVER (PARTITION BY event_type
        |      ORDER BY event_id), -1) THEN 1 ELSE 0 END ch
        |  FROM t),
        |sid AS (
        |  SELECT event_type, c,
        |    SUM(ch) OVER (PARTITION BY event_type ORDER BY event_id) id
        |  FROM chg),
        |runs AS (
        |  SELECT event_type, id, COUNT(*) len
        |  FROM sid WHERE c = 1 GROUP BY 1, 2)
        |SELECT event_type, MAX(len) AS longest_streak,
        |  ROUND(AVG(len), 6) AS avg_streak, COUNT(*) AS n_streaks
        |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_trapz" ->
      """WITH t AS (
        |  SELECT event_type, value y, event_id x,
        |    LAG(value) OVER (PARTITION BY event_type ORDER BY event_id) py,
        |    LAG(event_id) OVER (PARTITION BY event_type ORDER BY event_id)
        |      px
        |  FROM events)
        |SELECT event_type,
        |  ROUND(SUM((y + py) / 2.0 * (x - px)), 3) AS trapz
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_linear_trend" ->
      """WITH t AS (
        |  SELECT event_type, value x,
        |    (ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id)
        |      - 1)::DOUBLE i
        |  FROM events)
        |SELECT event_type,
        |  ROUND((SUM(i * x) - SUM(i) * SUM(x) / COUNT(*))
        |    / (SUM(i * i) - SUM(i) * SUM(i) / COUNT(*)), 6) AS slope,
        |  ROUND((SUM(x) - (SUM(i * x) - SUM(i) * SUM(x) / COUNT(*))
        |    / (SUM(i * i) - SUM(i) * SUM(i) / COUNT(*)) * SUM(i))
        |    / COUNT(*), 4) AS intercept
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_entropy" ->
      """WITH t AS (
        |  SELECT event_type, FLOOR(value / 10.0)::INT bin,
        |    user_id % 5 ybin
        |  FROM events),
        |h AS (
        |  SELECT event_type,
        |    -SUM(p * LN(p)) e
        |  FROM (SELECT event_type,
        |          COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER
        |            (PARTITION BY event_type) p
        |        FROM t GROUP BY event_type, bin)
        |  GROUP BY 1),
        |hc AS (
        |  SELECT event_type, -SUM(pxy * LN(pxy / py)) ce
        |  FROM (SELECT event_type,
        |          COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER
        |            (PARTITION BY event_type) pxy,
        |          SUM(COUNT(*)) OVER (PARTITION BY event_type, ybin)
        |            / SUM(COUNT(*)) OVER (PARTITION BY event_type) py
        |        FROM t GROUP BY event_type, bin, ybin)
        |  GROUP BY 1)
        |SELECT event_type, ROUND(h.e, 6) AS entropy,
        |  ROUND(h.e / LN(2), 6) AS entropy_bits,
        |  ROUND(hc.ce, 6) AS cond_entropy
        |FROM h JOIN hc USING (event_type) ORDER BY 1""".stripMargin,
    "q_benford" ->
      """SELECT event_type,
        |  FLOOR(ABS(value) / POW(10, FLOOR(LOG10(ABS(value)))))::INT
        |    AS digit,
        |  COUNT(*) AS cnt
        |FROM events WHERE value IS NOT NULL AND ABS(value) > 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_permute_entropy" ->
      """WITH t AS (
        |  SELECT event_type, value c,
        |    LAG(value, 1) OVER (PARTITION BY event_type ORDER BY event_id)
        |      b,
        |    LAG(value, 2) OVER (PARTITION BY event_type ORDER BY event_id)
        |      a
        |  FROM events),
        |p AS (
        |  SELECT event_type,
        |    (CASE WHEN a > b THEN 1 ELSE 0 END)::VARCHAR
        |      || (CASE WHEN a > c THEN 1 ELSE 0 END)::VARCHAR
        |      || (CASE WHEN b > c THEN 1 ELSE 0 END)::VARCHAR pat
        |  FROM t WHERE a IS NOT NULL),
        |d AS (
        |  SELECT event_type,
        |    COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER (PARTITION BY event_type)
        |      p
        |  FROM p GROUP BY event_type, pat)
        |SELECT event_type, ROUND(-SUM(p * LN(p)), 6)
        |  AS permutation_entropy
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_seasonal" ->
      """WITH t AS (
        |  SELECT event_type AS g, event_id AS o, value AS x
        |  FROM events),
        |b AS (
        |  SELECT g, o, x,
        |    (ROW_NUMBER() OVER (PARTITION BY g ORDER BY o) - 1) % 7
        |      AS phase,
        |    CASE WHEN COUNT(*) OVER w = 7 THEN AVG(x) OVER w END
        |      AS trend
        |  FROM t
        |  WINDOW w AS (PARTITION BY g ORDER BY o
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |d AS (SELECT *, x - trend AS det FROM b),
        |i AS (
        |  SELECT g, phase, AVG(det) AS raw
        |  FROM d WHERE det IS NOT NULL GROUP BY 1, 2),
        |c AS (
        |  SELECT g, phase,
        |    raw - AVG(raw) OVER (PARTITION BY g) AS seasonal
        |  FROM i),
        |j AS (
        |  SELECT d.g, d.x, d.trend, c.seasonal,
        |    d.x - d.trend - c.seasonal AS resid
        |  FROM d LEFT JOIN c ON c.g = d.g AND c.phase = d.phase)
        |SELECT g AS event_type, COUNT(*)::BIGINT AS n,
        |  SUM(CASE WHEN trend IS NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_edge,
        |  ROUND(AVG(ABS(resid)), 6) AS avg_abs_resid,
        |  ROUND(MAX(seasonal), 6) AS max_seasonal,
        |  ROUND(MIN(seasonal), 6) AS min_seasonal
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cusum" ->
      """WITH t AS (
        |  SELECT event_type AS g, event_id AS o,
        |    ROUND(value * 100) AS x
        |  FROM events),
        |p AS (
        |  SELECT g, o,
        |    SUM(x - 5400.0) OVER (PARTITION BY g ORDER BY o
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS up,
        |    SUM(x - 5000.0) OVER (PARTITION BY g ORDER BY o
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dn
        |  FROM t),
        |s AS (
        |  SELECT g, o,
        |    up - LEAST(0.0, MIN(up) OVER (PARTITION BY g ORDER BY o
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS su,
        |    GREATEST(0.0, MAX(dn) OVER (PARTITION BY g ORDER BY o
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) - dn
        |      AS sd
        |  FROM p)
        |SELECT g AS event_type,
        |  SUM(CASE WHEN su > 20000.0 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_alarms_up,
        |  SUM(CASE WHEN sd > 20000.0 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_alarms_down,
        |  MIN(CASE WHEN su > 20000.0 OR sd > 20000.0 THEN o END)
        |    ::BIGINT AS first_alarm,
        |  MAX(su)::BIGINT AS max_s_up, MAX(sd)::BIGINT AS max_s_down
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_nelson_aalen" ->
      """WITH t AS (
        |  SELECT event_type, value tm, user_id % 2 st FROM events),
        |byt AS (
        |  SELECT event_type, tm, SUM(st)::DOUBLE d, COUNT(*)::DOUBLE c
        |  FROM t GROUP BY 1, 2),
        |rsk AS (
        |  SELECT event_type, tm, d,
        |    SUM(c) OVER (PARTITION BY event_type)
        |      - COALESCE(SUM(c) OVER (PARTITION BY event_type ORDER BY tm
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS atrisk
        |  FROM byt)
        |SELECT event_type, tm AS time,
        |  ROUND(SUM(d / atrisk) OVER (PARTITION BY event_type
        |    ORDER BY tm ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
        |    ROW), 6) AS cum_hazard
        |FROM rsk ORDER BY 1, 2""".stripMargin,
    "q_log_rank" ->
      """WITH t AS (
        |  SELECT value tm, user_id % 2 st,
        |    CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END i1
        |  FROM events),
        |byt AS (
        |  SELECT tm, SUM(st * i1)::DOUBLE d1,
        |    SUM(st * (1 - i1))::DOUBLE d2,
        |    SUM(i1)::DOUBLE c1, (COUNT(*) - SUM(i1))::DOUBLE c2
        |  FROM t GROUP BY 1),
        |rsk AS (
        |  SELECT tm, d1, d2, c1, c2,
        |    SUM(c1) OVER () - COALESCE(SUM(c1) OVER (ORDER BY tm
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n1j,
        |    SUM(c2) OVER () - COALESCE(SUM(c2) OVER (ORDER BY tm
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n2j
        |  FROM byt),
        |f AS (
        |  SELECT d1, d1 + d2 AS dj, n1j, n2j, n1j + n2j AS nj
        |  FROM rsk WHERE d1 + d2 > 0),
        |a AS (
        |  SELECT SUM(d1) o1, SUM(dj * n1j / nj) e1,
        |    SUM(CASE WHEN nj > 1 THEN dj * (n1j / nj) * (n2j / nj)
        |      * (nj - dj) / (nj - 1) ELSE 0 END) v
        |  FROM f)
        |SELECT o1::BIGINT AS o1, ROUND(e1, 4) AS e1,
        |  ROUND((o1 - e1) * (o1 - e1) / v, 6) AS chi2
        |FROM a""".stripMargin,
    "q_kaplan_meier" ->
      """WITH t AS (
        |  SELECT event_type, value tm, user_id % 2 st FROM events),
        |byt AS (
        |  SELECT event_type, tm, SUM(st)::DOUBLE d, COUNT(*)::DOUBLE c
        |  FROM t GROUP BY 1, 2),
        |rsk AS (
        |  SELECT event_type, tm, d,
        |    SUM(c) OVER (PARTITION BY event_type)
        |      - COALESCE(SUM(c) OVER (PARTITION BY event_type ORDER BY tm
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS atrisk
        |  FROM byt)
        |SELECT event_type, tm AS time,
        |  ROUND(EXP(SUM(LN(GREATEST(1 - d / atrisk, 1e-300)))
        |    OVER (PARTITION BY event_type
        |    ORDER BY tm ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |    6) AS survival
        |FROM rsk ORDER BY 1, 2""".stripMargin
  )
}
