package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{TSOps2, TrendOps}

/** Driver-contract queries for SURVEY §2.7 second wave: AR coefficients,
  * sample/approximate entropy, KNN entropy, subsequence similarity.
  * Entropy queries run on the deterministic 1-in-10 subsample
  * (event_id % 10 = 0) so the O(n²) oracle join stays cheap at sf0.01
  * while the distributed Spark side is exercised the same way. */
object TSQueries2 extends QueryPack {

  private def sub(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").filter(col("event_id") % 10 === 0)

  private val subSql = "SELECT * FROM events WHERE event_id % 10 = 0"

  // q_sx_* twins (BASELINE.md "sf1 CORRECTNESS"): the entropy
  // estimators' oracles are quadratic pair scans DuckDB cannot replay
  // at sf1 group sizes (~20k). A deterministic 1/100 key sample keeps
  // the same groups and the same estimator code path at
  // oracle-replayable sizes (~2k/group at sf1).
  // Groups below 12 points are dropped on BOTH sides: the m=2 /
  // k=3 estimators are undefined (or join-degenerate) there, and at
  // tiny scale factors the thin sample would otherwise leave the two
  // engines disagreeing about WHICH degenerate groups appear at all.
  private def sub100(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "events").filter(col("event_id") % 100 === 0)
    val ok = d.groupBy(col("event_type")).count()
      .filter(col("count") >= 12).select(col("event_type"))
    d.join(ok, "event_type")
  }

  private val subSql100 =
    """SELECT e.* FROM
      |  (SELECT * FROM events WHERE event_id % 100 = 0) e
      |JOIN (SELECT event_type FROM events WHERE event_id % 100 = 0
      |      GROUP BY 1 HAVING COUNT(*) >= 12) g
      |USING (event_type)""".stripMargin

  /** q_sample_entropy's exact SQL twin, parameterized by the base
    * row filter (shared by the original and its q_sx_ twin). */
  private def sampleEntropySql(base: String): String =
    s"""WITH e AS ($base),
       |r AS (
       |  SELECT event_type, 0.5 * STDDEV_POP(value) r FROM e GROUP BY 1),
       |s AS (
       |  SELECT event_type, value x,
       |    LEAD(value, 1) OVER w x1, LEAD(value, 2) OVER w x2,
       |    ROW_NUMBER() OVER w rn
       |  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY event_id)),
       |t AS (SELECT * FROM s WHERE x1 IS NOT NULL),
       |p AS (
       |  SELECT a.event_type,
       |    SUM(CASE WHEN GREATEST(ABS(a.x - b.x), ABS(a.x1 - b.x1))
       |      <= r.r THEN 1 ELSE 0 END) bb,
       |    SUM(CASE WHEN GREATEST(ABS(a.x - b.x), ABS(a.x1 - b.x1))
       |        <= r.r AND b.x2 IS NOT NULL
       |        AND ABS(a.x2 - b.x2) <= r.r
       |      THEN 1 ELSE 0 END) aa
       |  FROM t a
       |  JOIN t b ON a.event_type = b.event_type AND a.rn < b.rn
       |  JOIN r ON r.event_type = a.event_type
       |  GROUP BY 1)
       |SELECT event_type,
       |  CASE WHEN aa = 0 OR bb = 0 THEN 'NaN'::DOUBLE
       |    ELSE ROUND(LN(bb::DOUBLE / aa::DOUBLE), 6) END
       |    AS sample_entropy
       |FROM p ORDER BY 1""".stripMargin

  private def approxEntropySql(base: String): String =
    s"""WITH e AS ($base),
       |r AS (
       |  SELECT event_type, 0.2 * STDDEV_SAMP(value) r FROM e GROUP BY 1),
       |s AS (
       |  SELECT event_type, value x,
       |    LEAD(value, 1) OVER w x1, LEAD(value, 2) OVER w x2,
       |    ROW_NUMBER() OVER w rn
       |  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY event_id)),
       |t2 AS (SELECT * FROM s WHERE x1 IS NOT NULL),
       |t3 AS (SELECT * FROM s WHERE x2 IS NOT NULL),
       |n2 AS (SELECT event_type, COUNT(*)::DOUBLE n FROM t2 GROUP BY 1),
       |n3 AS (SELECT event_type, COUNT(*)::DOUBLE n FROM t3 GROUP BY 1),
       |c2 AS (
       |  SELECT a.event_type, a.rn,
       |    SUM(CASE WHEN GREATEST(ABS(a.x - b.x), ABS(a.x1 - b.x1))
       |      <= r.r THEN 1 ELSE 0 END) c
       |  FROM t2 a
       |  JOIN t2 b ON a.event_type = b.event_type
       |  JOIN r ON r.event_type = a.event_type
       |  GROUP BY 1, 2),
       |c3 AS (
       |  SELECT a.event_type, a.rn,
       |    SUM(CASE WHEN GREATEST(ABS(a.x - b.x), ABS(a.x1 - b.x1),
       |      ABS(a.x2 - b.x2)) <= r.r THEN 1 ELSE 0 END) c
       |  FROM t3 a
       |  JOIN t3 b ON a.event_type = b.event_type
       |  JOIN r ON r.event_type = a.event_type
       |  GROUP BY 1, 2),
       |p2 AS (
       |  SELECT c2.event_type, AVG(LN(c2.c::DOUBLE / n2.n)) p
       |  FROM c2 JOIN n2 USING (event_type) GROUP BY 1),
       |p3 AS (
       |  SELECT c3.event_type, AVG(LN(c3.c::DOUBLE / n3.n)) p
       |  FROM c3 JOIN n3 USING (event_type) GROUP BY 1)
       |SELECT event_type, ROUND(ABS(p2.p - p3.p), 6) AS approx_entropy
       |FROM p2 JOIN p3 USING (event_type) ORDER BY 1""".stripMargin

  private def knnEntropySql(base: String): String =
    s"""WITH e AS (
       |  SELECT event_type, value + event_id * 1e-9 xj
       |  FROM ($base)),
       |p AS (
       |  SELECT a.event_type, a.xj,
       |    ABS(a.xj - b.xj) d,
       |    ROW_NUMBER() OVER (PARTITION BY a.event_type, a.xj
       |      ORDER BY ABS(a.xj - b.xj)) rk
       |  FROM e a JOIN e b
       |    ON a.event_type = b.event_type AND a.xj <> b.xj),
       |k AS (
       |  SELECT event_type, AVG(LN(d * 2.0)) m, COUNT(*)::DOUBLE n
       |  FROM p WHERE rk = 3 GROUP BY 1)
       |SELECT event_type,
       |  ROUND(LN(n) - 1.0 / (2.0 * n) - 1.0 / (12.0 * n * n)
       |    + 1.0 / (120.0 * POW(n, 4)) - 1.0 / (252.0 * POW(n, 6))
       |    - 0.9227843350984671 + m, 6) AS knn_entropy
       |FROM k ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ar_coeffs" -> ((s, dir) => {
      TSOps2.arCoeffs(t(s, dir, "events"), col("value"), col("event_id"),
          Seq("event_type"), 2)
        .select(col("event_type"),
          round(element_at(col("ar_coeffs"), 1), 6).as("b1"),
          round(element_at(col("ar_coeffs"), 2), 6).as("b2"),
          round(element_at(col("ar_coeffs"), 3), 4).as("b0"))
        .orderBy("event_type")
    }),
    "q_mann_kendall" -> ((s, dir) => {
      // Mann–Kendall trend + Theil–Sen slope per event type on a
      // deterministic subsample (the DuckDB oracle is the quadratic
      // pair join; the Spark side is O(n log n) selection, no pair
      // set). sf-adaptive rate (r13 verdict ask #8): 1/10 replays to
      // ~100k events (≤2e7 pairs/group); sf1's 20k-row groups pushed
      // the oracle to a 300 s budget, so both sides step to 1/40 past
      // 200k events — gate and bench scales are untouched, and the
      // oracle stays the full quadratic DEFINITION on the same rows.
      val ev = t(s, dir, "events")
      val rate = if (ev.count() > 200000L) 40 else 10
      TrendOps.mannKendall(ev.filter(col("event_id") % rate === 0),
          col("event_id"), col("value"), Seq("event_type"))
        .select(col("event_type"), round(col("s"), 1).as("s"),
          round(col("var_s"), 2).as("var_s"),
          round(col("z"), 6).as("z"),
          round(col("slope"), 6).as("slope"),
          round(col("intercept"), 5).as("intercept"), col("n"))
        .orderBy("event_type")
    }),
    "q_durbin_watson" -> ((s, dir) => {
      TrendOps.durbinWatson(t(s, dir, "events"), col("event_id"),
          col("value"), Seq("event_type"))
        .select(col("event_type"), round(col("dw"), 6).as("dw"), col("n"))
        .orderBy("event_type")
    }),
    "q_ewm_mean" -> ((s, dir) => {
      // truncated exponentially weighted mean (span 8, α = 0.5) per
      // event type; row-level values spot-checked on a 1-in-97 slice
      TrendOps.ewmMean(t(s, dir, "events"), col("event_id"),
          col("value"), alpha = 0.5, span = 8, Seq("event_type"))
        .filter(col("__trend_t") % 97 === 0)
        .select(col("event_type"), col("__trend_t").as("event_id"),
          round(col("ewm"), 6).as("ewm"))
        .orderBy("event_type", "event_id")
    }),
    "q_dtw" -> ((s, dir) => {
      // DTW distance of each event-type series to the 2-point pattern
      // [25, 75] (a low->high template); with m=2 the full symmetric
      // DP has the closed form the oracle replays via cumsums. The
      // deterministic 1-in-50 user slice keeps each series under the
      // loud graft.maxDtwSeries cap across the sf ladder (the q_sx
      // convention: restrict the aggregated rows, not the operator)
      t(s, dir, "events").filter(col("user_id") % 50 === 7)
        .groupBy("event_type")
        .agg(round(graft.agg.DtwAgg.dtw(col("event_id"), col("value"),
          Seq(25.0, 75.0)), 4).as("dtw"))
        .orderBy("event_type")
    }),
    "q_holt_brown" -> ((s, dir) => {
      // Brown double-smoothing forecast (α=0.3, span 8, h=3) per
      // event type; the last row's state is each series' live forecast
      TrendOps.brownDouble(t(s, dir, "events"), col("event_id"),
          col("value"), alpha = 0.3, span = 8, h = 3, Seq("event_type"))
        .groupBy("event_type")
        .agg(round(max_by(col("level"), col("t")), 6).as("level"),
          round(max_by(col("trend"), col("t")), 6).as("trend"),
          round(max_by(col("forecast"), col("t")), 6).as("forecast"))
        .orderBy("event_type")
    }),
    "q_sample_entropy" -> ((s, dir) => {
      TSOps2.sampleEntropy(sub(s, dir), col("value"), col("event_id"),
          Seq("event_type"), 2, 0.5)
        .select(col("event_type"),
          round(col("sample_entropy"), 6).as("sample_entropy"))
        .orderBy("event_type")
    }),
    "q_approx_entropy" -> ((s, dir) => {
      TSOps2.approxEntropy(sub(s, dir), col("value"), col("event_id"),
          Seq("event_type"), 2, 0.2)
        .select(col("event_type"),
          round(col("approx_entropy"), 6).as("approx_entropy"))
        .orderBy("event_type")
    }),
    "q_knn_entropy" -> ((s, dir) => {
      val d = sub(s, dir)
        .withColumn("xj", col("value") + col("event_id") * 1e-9)
      TSOps2.knnEntropy1d(d, col("xj"), Seq("event_type"), 3)
        .select(col("event_type"),
          round(col("knn_entropy"), 6).as("knn_entropy"))
        .orderBy("event_type")
    }),
    "q_sx_sample_entropy" -> ((s, dir) => {
      TSOps2.sampleEntropy(sub100(s, dir), col("value"), col("event_id"),
          Seq("event_type"), 2, 0.5)
        .select(col("event_type"),
          round(col("sample_entropy"), 6).as("sample_entropy"))
        .orderBy("event_type")
    }),
    "q_sx_approx_entropy" -> ((s, dir) => {
      TSOps2.approxEntropy(sub100(s, dir), col("value"), col("event_id"),
          Seq("event_type"), 2, 0.2)
        .select(col("event_type"),
          round(col("approx_entropy"), 6).as("approx_entropy"))
        .orderBy("event_type")
    }),
    "q_sx_knn_entropy" -> ((s, dir) => {
      val d = sub100(s, dir)
        .withColumn("xj", col("value") + col("event_id") * 1e-9)
      TSOps2.knnEntropy1d(d, col("xj"), Seq("event_type"), 3)
        .select(col("event_type"),
          round(col("knn_entropy"), 6).as("knn_entropy"))
        .orderBy("event_type")
    }),
    "q_subseq_sim" -> ((s, dir) => {
      val q = Seq(120.5, 80.2, 95.0, 110.3)
      val plain = TSOps2.subseqSimCount(t(s, dir, "events"), col("value"),
        col("event_id"), Seq("event_type"), q, 5000.0)
      val znorm = TSOps2.subseqSimCount(t(s, dir, "events"), col("value"),
        col("event_id"), Seq("event_type"), q, 1.0, znormalize = true)
        .withColumnRenamed("similar_count", "similar_count_z")
      plain.join(znorm, "event_type").orderBy("event_type")
    })
  )

  private val ewmNum = (0 until 8).map { k =>
    val w = math.pow(0.5, k)
    if (k == 0) "value"
    else s"COALESCE(LAG(value, $k) OVER w, 0) * $w"
  }.mkString(" + ")
  private val ewmDen = (0 until 8).map { k =>
    val w = math.pow(0.5, k)
    if (k == 0) "1.0"
    else s"CASE WHEN LAG(value, $k) OVER w IS NULL THEN 0 ELSE $w END"
  }.mkString(" + ")

  // span-8 alpha=0.3 EWM of column `c` (q_holt_brown's two nested
  // smoothing passes); weights embedded as Scala doubles so DuckDB
  // parses bit-identical values
  private def brownEwm(c: String): String = {
    val num = (0 until 8).map { k =>
      val w = math.pow(0.7, k)
      if (k == 0) c else s"COALESCE(LAG($c, $k) OVER w, 0) * $w"
    }.mkString(" + ")
    val den = (0 until 8).map { k =>
      val w = math.pow(0.7, k)
      if (k == 0) "1.0"
      else s"CASE WHEN LAG($c, $k) OVER w IS NULL THEN 0 ELSE $w END"
    }.mkString(" + ")
    s"($num) / ($den)"
  }

  def oracles: Map[String, String] = Map(
    "q_mann_kendall" ->
      // the oracle IS the quadratic definition: every pair's sign and
      // slope, MEDIAN over slopes — feasible only on the subsample
      s"""WITH rt AS (
        |  SELECT CASE WHEN COUNT(*) > 200000 THEN 40 ELSE 10 END r
        |  FROM events),
        |t AS (
        |  SELECT event_type g, event_id::DOUBLE tt, value x
        |  FROM events WHERE event_id % (SELECT r FROM rt) = 0),
        |p AS (
        |  SELECT a.g, SIGN(b.x - a.x) sgn,
        |    (b.x - a.x) / (b.tt - a.tt) sl
        |  FROM t a JOIN t b ON a.g = b.g AND b.tt > a.tt),
        |s AS (SELECT g, SUM(sgn)::DOUBLE s, MEDIAN(sl) slope
        |  FROM p GROUP BY 1),
        |tie AS (
        |  SELECT g, SUM(c*(c-1)*(2*c+5)) tv FROM (
        |    SELECT g, x, COUNT(*)::DOUBLE c FROM t GROUP BY 1, 2)
        |  GROUP BY 1),
        |nn AS (SELECT g, COUNT(*)::DOUBLE n FROM t GROUP BY 1),
        |v AS (
        |  SELECT nn.g, s.s, s.slope, nn.n,
        |    (nn.n*(nn.n-1)*(2*nn.n+5) - tie.tv)/18.0 vs
        |  FROM nn JOIN tie ON nn.g = tie.g JOIN s ON s.g = nn.g),
        |ic AS (
        |  SELECT t.g, MEDIAN(t.x - v.slope * t.tt) intercept
        |  FROM t JOIN v ON t.g = v.g GROUP BY 1)
        |SELECT v.g AS event_type, ROUND(s, 1) AS s,
        |  ROUND(vs, 2) AS var_s,
        |  ROUND(CASE WHEN s > 0 THEN (s-1)/SQRT(vs)
        |             WHEN s < 0 THEN (s+1)/SQRT(vs)
        |             ELSE 0 END, 6) AS z,
        |  ROUND(slope, 6) AS slope, ROUND(ic.intercept, 5) AS intercept,
        |  n::BIGINT AS n
        |FROM v JOIN ic ON v.g = ic.g ORDER BY 1""".stripMargin,
    "q_durbin_watson" ->
      """WITH d AS (
        |  SELECT event_type, value,
        |    value - LAG(value) OVER (
        |      PARTITION BY event_type ORDER BY event_id) dd
        |  FROM events)
        |SELECT event_type, ROUND(SUM(dd*dd)/SUM(value*value), 6) AS dw,
        |  COUNT(value)::BIGINT AS n
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ewm_mean" ->
      s"""SELECT event_type, event_id,
        |  ROUND(($ewmNum) / ($ewmDen), 6) AS ewm
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY event_id)
        |QUALIFY event_id % 97 = 0
        |ORDER BY 1, 2""".stripMargin,
    "q_dtw" ->
      """WITH c AS (
        |  SELECT event_type g, ABS(value - 75.0) d2,
        |    SUM(ABS(value - 25.0)) OVER (PARTITION BY event_type
        |      ORDER BY event_id) c1,
        |    SUM(ABS(value - 75.0)) OVER (PARTITION BY event_type
        |      ORDER BY event_id) c2,
        |    SUM(ABS(value - 25.0)) OVER (PARTITION BY event_type) t1,
        |    SUM(ABS(value - 75.0)) OVER (PARTITION BY event_type) t2,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY event_id) rn,
        |    COUNT(*) OVER (PARTITION BY event_type) n
        |  FROM events WHERE user_id % 50 = 7)
        |SELECT g AS event_type,
        |  ROUND(LEAST(
        |    MIN(CASE WHEN rn < n THEN c1 + t2 - c2 END),
        |    MIN(CASE WHEN rn = n THEN t1 + d2 END)), 4) AS dtw
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_holt_brown" ->
      s"""WITH s1t AS (
        |  SELECT event_type g, event_id o,
        |    ${brownEwm("value")} s1
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY event_id)),
        |s2t AS (
        |  SELECT g, o, s1, ${brownEwm("s1")} s2
        |  FROM s1t
        |  WINDOW w AS (PARTITION BY g ORDER BY o)),
        |lastrow AS (
        |  SELECT g, 2*s1 - s2 lv, 0.3/0.7*(s1 - s2) tr
        |  FROM s2t
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY g ORDER BY o DESC) = 1)
        |SELECT g AS event_type, ROUND(lv, 6) AS level,
        |  ROUND(tr, 6) AS trend, ROUND(lv + 3*tr, 6) AS forecast
        |FROM lastrow ORDER BY 1""".stripMargin,
    "q_ar_coeffs" ->
      """WITH l AS (
        |  SELECT event_type, value y,
        |    LAG(value, 1) OVER (PARTITION BY event_type ORDER BY event_id)
        |      x1,
        |    LAG(value, 2) OVER (PARTITION BY event_type ORDER BY event_id)
        |      x2
        |  FROM events),
        |s AS (
        |  SELECT event_type, COUNT(*)::DOUBLE n,
        |    SUM(x1 * x1) s11, SUM(x1 * x2) s12, SUM(x2 * x2) s22,
        |    SUM(x1) s1, SUM(x2) s2, SUM(y) sy,
        |    SUM(x1 * y) s1y, SUM(x2 * y) s2y
        |  FROM l WHERE x1 IS NOT NULL AND x2 IS NOT NULL GROUP BY 1),
        |d AS (
        |  SELECT *,
        |    s11*(s22*n - s2*s2) - s12*(s12*n - s2*s1)
        |      + s1*(s12*s2 - s22*s1) AS det
        |  FROM s)
        |SELECT event_type,
        |  ROUND((s1y*(s22*n - s2*s2) - s12*(s2y*n - s2*sy)
        |    + s1*(s2y*s2 - s22*sy)) / det, 6) AS b1,
        |  ROUND((s11*(s2y*n - sy*s2) - s1y*(s12*n - s2*s1)
        |    + s1*(s12*sy - s2y*s1)) / det, 6) AS b2,
        |  ROUND((s11*(s22*sy - s2y*s2) - s12*(s12*sy - s2y*s1)
        |    + s1y*(s12*s2 - s22*s1)) / det, 4) AS b0
        |FROM d ORDER BY 1""".stripMargin,
    "q_sample_entropy" -> sampleEntropySql(subSql),
    "q_sx_sample_entropy" -> sampleEntropySql(subSql100),
    "q_approx_entropy" -> approxEntropySql(subSql),
    "q_sx_approx_entropy" -> approxEntropySql(subSql100),
    "q_knn_entropy" -> knnEntropySql(subSql),
    "q_sx_knn_entropy" -> knnEntropySql(subSql100),
    "q_subseq_sim" ->
      """WITH s AS (
        |  SELECT event_type, value x0,
        |    LEAD(value, 1) OVER w x1, LEAD(value, 2) OVER w x2,
        |    LEAD(value, 3) OVER w x3
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY event_id)),
        |q AS (
        |  SELECT (120.5 + 80.2 + 95.0 + 110.3) / 4.0 qm,
        |    SQRT(((120.5 - (120.5 + 80.2 + 95.0 + 110.3) / 4.0)
        |        * (120.5 - (120.5 + 80.2 + 95.0 + 110.3) / 4.0)
        |      + (80.2 - (120.5 + 80.2 + 95.0 + 110.3) / 4.0)
        |        * (80.2 - (120.5 + 80.2 + 95.0 + 110.3) / 4.0)
        |      + (95.0 - (120.5 + 80.2 + 95.0 + 110.3) / 4.0)
        |        * (95.0 - (120.5 + 80.2 + 95.0 + 110.3) / 4.0)
        |      + (110.3 - (120.5 + 80.2 + 95.0 + 110.3) / 4.0)
        |        * (110.3 - (120.5 + 80.2 + 95.0 + 110.3) / 4.0)) / 4.0) qs),
        |h AS (
        |  SELECT s.event_type,
        |    CASE WHEN x3 IS NOT NULL AND
        |      (x0 - 120.5) * (x0 - 120.5) + (x1 - 80.2) * (x1 - 80.2)
        |      + (x2 - 95.0) * (x2 - 95.0) + (x3 - 110.3) * (x3 - 110.3)
        |      <= 5000.0 THEN 1 ELSE 0 END hit,
        |    CASE WHEN x3 IS NOT NULL AND (
        |      ((x0 - (x0+x1+x2+x3)/4.0) / SQRT(((x0 - (x0+x1+x2+x3)/4.0)
        |          * (x0 - (x0+x1+x2+x3)/4.0)
        |        + (x1 - (x0+x1+x2+x3)/4.0) * (x1 - (x0+x1+x2+x3)/4.0)
        |        + (x2 - (x0+x1+x2+x3)/4.0) * (x2 - (x0+x1+x2+x3)/4.0)
        |        + (x3 - (x0+x1+x2+x3)/4.0) * (x3 - (x0+x1+x2+x3)/4.0))
        |        / 4.0) - (120.5 - q.qm) / q.qs)
        |      * ((x0 - (x0+x1+x2+x3)/4.0) / SQRT(((x0 - (x0+x1+x2+x3)/4.0)
        |          * (x0 - (x0+x1+x2+x3)/4.0)
        |        + (x1 - (x0+x1+x2+x3)/4.0) * (x1 - (x0+x1+x2+x3)/4.0)
        |        + (x2 - (x0+x1+x2+x3)/4.0) * (x2 - (x0+x1+x2+x3)/4.0)
        |        + (x3 - (x0+x1+x2+x3)/4.0) * (x3 - (x0+x1+x2+x3)/4.0))
        |        / 4.0) - (120.5 - q.qm) / q.qs)
        |      + ((x1 - (x0+x1+x2+x3)/4.0) / SQRT(((x0 - (x0+x1+x2+x3)/4.0)
        |          * (x0 - (x0+x1+x2+x3)/4.0)
        |        + (x1 - (x0+x1+x2+x3)/4.0) * (x1 - (x0+x1+x2+x3)/4.0)
        |        + (x2 - (x0+x1+x2+x3)/4.0) * (x2 - (x0+x1+x2+x3)/4.0)
        |        + (x3 - (x0+x1+x2+x3)/4.0) * (x3 - (x0+x1+x2+x3)/4.0))
        |        / 4.0) - (80.2 - q.qm) / q.qs)
        |      * ((x1 - (x0+x1+x2+x3)/4.0) / SQRT(((x0 - (x0+x1+x2+x3)/4.0)
        |          * (x0 - (x0+x1+x2+x3)/4.0)
        |        + (x1 - (x0+x1+x2+x3)/4.0) * (x1 - (x0+x1+x2+x3)/4.0)
        |        + (x2 - (x0+x1+x2+x3)/4.0) * (x2 - (x0+x1+x2+x3)/4.0)
        |        + (x3 - (x0+x1+x2+x3)/4.0) * (x3 - (x0+x1+x2+x3)/4.0))
        |        / 4.0) - (80.2 - q.qm) / q.qs)
        |      + ((x2 - (x0+x1+x2+x3)/4.0) / SQRT(((x0 - (x0+x1+x2+x3)/4.0)
        |          * (x0 - (x0+x1+x2+x3)/4.0)
        |        + (x1 - (x0+x1+x2+x3)/4.0) * (x1 - (x0+x1+x2+x3)/4.0)
        |        + (x2 - (x0+x1+x2+x3)/4.0) * (x2 - (x0+x1+x2+x3)/4.0)
        |        + (x3 - (x0+x1+x2+x3)/4.0) * (x3 - (x0+x1+x2+x3)/4.0))
        |        / 4.0) - (95.0 - q.qm) / q.qs)
        |      * ((x2 - (x0+x1+x2+x3)/4.0) / SQRT(((x0 - (x0+x1+x2+x3)/4.0)
        |          * (x0 - (x0+x1+x2+x3)/4.0)
        |        + (x1 - (x0+x1+x2+x3)/4.0) * (x1 - (x0+x1+x2+x3)/4.0)
        |        + (x2 - (x0+x1+x2+x3)/4.0) * (x2 - (x0+x1+x2+x3)/4.0)
        |        + (x3 - (x0+x1+x2+x3)/4.0) * (x3 - (x0+x1+x2+x3)/4.0))
        |        / 4.0) - (95.0 - q.qm) / q.qs)
        |      + ((x3 - (x0+x1+x2+x3)/4.0) / SQRT(((x0 - (x0+x1+x2+x3)/4.0)
        |          * (x0 - (x0+x1+x2+x3)/4.0)
        |        + (x1 - (x0+x1+x2+x3)/4.0) * (x1 - (x0+x1+x2+x3)/4.0)
        |        + (x2 - (x0+x1+x2+x3)/4.0) * (x2 - (x0+x1+x2+x3)/4.0)
        |        + (x3 - (x0+x1+x2+x3)/4.0) * (x3 - (x0+x1+x2+x3)/4.0))
        |        / 4.0) - (110.3 - q.qm) / q.qs)
        |      * ((x3 - (x0+x1+x2+x3)/4.0) / SQRT(((x0 - (x0+x1+x2+x3)/4.0)
        |          * (x0 - (x0+x1+x2+x3)/4.0)
        |        + (x1 - (x0+x1+x2+x3)/4.0) * (x1 - (x0+x1+x2+x3)/4.0)
        |        + (x2 - (x0+x1+x2+x3)/4.0) * (x2 - (x0+x1+x2+x3)/4.0)
        |        + (x3 - (x0+x1+x2+x3)/4.0) * (x3 - (x0+x1+x2+x3)/4.0))
        |        / 4.0) - (110.3 - q.qm) / q.qs))
        |      <= 1.0 THEN 1 ELSE 0 END hitz
        |  FROM s, q)
        |SELECT event_type, SUM(hit)::BIGINT AS similar_count,
        |  SUM(hitz)::BIGINT AS similar_count_z
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
