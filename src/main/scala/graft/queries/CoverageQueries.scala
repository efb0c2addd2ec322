package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.agg.LinRegAgg
import graft.ops.{EncodeOps, MetricOps}

/** Closing-coverage queries: binary-metrics combo with sklearn-style
  * average precision (§2.4), symmetry ratio (§2.7), column-as-set
  * jaccard (§2.6), discrete PSI (§2.6), weighted least squares (§2.9),
  * pairwise correlation report (§2.13). */
object CoverageQueries extends QueryPack {

  private def scored(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("y",
        (col("value") + col("event_id") % 7 > 52).cast("int"))
      .withColumn("p",
        least(col("value") / 350.0 + 0.001, lit(0.999)))

  private val scoredSql =
    """SELECT *,
      |  CASE WHEN value + (event_id % 7) > 52 THEN 1 ELSE 0 END AS y,
      |  LEAST(value / 350.0 + 0.001, 0.999) AS p
      |FROM events""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_binary_metrics" -> ((s, dir) => {
      val df = scored(s, dir)
      val hard = (col("p") >= 0.5).cast("long")
      val counts = df.groupBy(col("event_type")).agg(
        (sum(when(col("y") === 1 && hard === 1, 1L).otherwise(0L)) /
          sum(hard)).as("precision"),
        (sum(when(col("y") === 1 && hard === 1, 1L).otherwise(0L))
          .cast("double") / sum(col("y"))).as("recall"))
      val ap = MetricOps.averagePrecision(df, col("y"), col("p"),
        Seq("event_type"))
      val auc = MetricOps.rocAucNamed(df, col("y"), col("p"),
        Seq("event_type"))
      counts.join(ap, "event_type").join(auc, "event_type")
        .select(col("event_type"),
          round(col("precision"), 6).as("precision"),
          round(col("recall"), 6).as("recall"),
          round(col("avg_precision"), 6).as("avg_precision"),
          round(col("roc_auc"), 6).as("roc_auc"))
        .orderBy("event_type")
    }),
    "q_symm_ratio" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(round(
          abs(avg(col("value")) - percentile(col("value"), lit(0.5))) /
            (max(col("value")) - min(col("value"))), 8).as("symm_ratio"))
        .orderBy("event_type")
    }),
    "q_jaccard_col" -> ((s, dir) => {
      // set-of-values jaccard between click and non-click value buckets
      // via NumFuncs.jaccardCol (num.py:487): the null-dropping default
      // turns the two when() projections into the two sides' sets.
      val ev = t(s, dir, "events")
        .withColumn("bucket", floor(col("value") / 5.0))
      graft.functions.NumFuncs.jaccardCol(ev,
        when(col("event_type") === "click", col("bucket")),
        when(col("event_type") =!= "click", col("bucket")))
    }),
    "q_psi_discrete" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      EncodeOps.psiDiscrete(
          ev.filter(col("user_id") % 2 === 0), col("event_type"),
          ev.filter(col("user_id") % 2 =!= 0), col("event_type"))
        .select(col("value"),
          round(col("baseline_pct"), 6).as("baseline_pct"),
          round(col("actual_pct"), 6).as("actual_pct"),
          round(col("psi_bin"), 8).as("psi_bin"))
        .orderBy("value")
    }),
    "q_wls" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(LinRegAgg.linReg(
          array(col("l_quantity"), col("l_discount"), lit(1.0)),
          col("l_extendedprice"), 3,
          weight = col("l_quantity")).as("r"))
        .select(col("l_returnflag"),
          round(element_at(col("r.coeffs"), 1), 6).as("b_qty"),
          round(element_at(col("r.coeffs"), 2), 4).as("b_disc"),
          round(element_at(col("r.coeffs"), 3), 4).as("b0"))
        .orderBy("l_returnflag")
    }),
    "q_corr_matrix" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.agg(
        round(corr(col("value"), col("user_id").cast("double")), 6)
          .as("corr_value_user"),
        round(corr(col("value"), col("event_id").cast("double")), 6)
          .as("corr_value_event"),
        round(corr(col("user_id").cast("double"),
          col("event_id").cast("double")), 6).as("corr_user_event"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_binary_metrics" ->
      s"""WITH t AS ($scoredSql),
         |c AS (
         |  SELECT event_type,
         |    SUM(CASE WHEN y = 1 AND p >= 0.5 THEN 1 ELSE 0 END)::DOUBLE
         |      tp,
         |    SUM(CASE WHEN p >= 0.5 THEN 1 ELSE 0 END)::DOUBLE pp,
         |    SUM(y)::DOUBLE pos
         |  FROM t GROUP BY 1),
         |thr AS (
         |  SELECT event_type, p, COUNT(*) cnt, SUM(y) ypos
         |  FROM t GROUP BY 1, 2),
         |cum AS (
         |  SELECT event_type, p,
         |    SUM(ypos) OVER (PARTITION BY event_type ORDER BY p DESC)
         |      cum_pos,
         |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY p DESC)
         |      cum_cnt,
         |    SUM(ypos) OVER (PARTITION BY event_type) npos
         |  FROM thr),
         |delta AS (
         |  SELECT event_type,
         |    (cum_pos / npos
         |      - COALESCE(LAG(cum_pos / npos) OVER (
         |          PARTITION BY event_type ORDER BY p DESC), 0))
         |      * (cum_pos / cum_cnt) term
         |  FROM cum),
         |ap AS (
         |  SELECT event_type, SUM(term) avg_precision
         |  FROM delta GROUP BY 1),
         |r AS (
         |  SELECT event_type, y,
         |    RANK() OVER (PARTITION BY event_type ORDER BY p)
         |      + (COUNT(*) OVER (PARTITION BY event_type, p) - 1) / 2.0
         |      ar
         |  FROM t),
         |auc AS (
         |  SELECT event_type,
         |    (SUM(CASE WHEN y = 1 THEN ar END)
         |      - SUM(y) * (SUM(y) + 1) / 2.0)
         |      / (SUM(y) * (COUNT(*) - SUM(y))) roc_auc
         |  FROM r GROUP BY 1)
         |SELECT c.event_type,
         |  ROUND(tp / pp, 6) AS precision,
         |  ROUND(tp / pos, 6) AS recall,
         |  ROUND(ap.avg_precision, 6) AS avg_precision,
         |  ROUND(auc.roc_auc, 6) AS roc_auc
         |FROM c JOIN ap USING (event_type) JOIN auc USING (event_type)
         |ORDER BY 1""".stripMargin,
    "q_symm_ratio" ->
      """SELECT event_type,
        |  ROUND(ABS(AVG(value) - quantile_cont(value, 0.5))
        |    / (MAX(value) - MIN(value)), 8) AS symm_ratio
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_jaccard_col" ->
      """WITH a AS (
        |  SELECT DISTINCT FLOOR(value / 5.0) b FROM events
        |  WHERE event_type = 'click'),
        |b AS (
        |  SELECT DISTINCT FLOOR(value / 5.0) b FROM events
        |  WHERE event_type <> 'click'),
        |s AS (
        |  SELECT (SELECT COUNT(*) FROM a) na,
        |    (SELECT COUNT(*) FROM b) nb,
        |    (SELECT COUNT(*) FROM (SELECT b FROM a INTERSECT
        |      SELECT b FROM b)) ni)
        |SELECT na AS n_a, nb AS n_b, ni AS n_common,
        |  ni::DOUBLE / (na + nb - ni) AS jaccard_col
        |FROM s""".stripMargin,
    "q_psi_discrete" ->
      """WITH bp AS (
        |  SELECT event_type AS "value", COUNT(*)::DOUBLE
        |    / (SELECT COUNT(*) FROM events WHERE user_id % 2 = 0)
        |    baseline_pct
        |  FROM events WHERE user_id % 2 = 0 GROUP BY 1),
        |ap AS (
        |  SELECT event_type AS "value", COUNT(*)::DOUBLE
        |    / (SELECT COUNT(*) FROM events WHERE user_id % 2 <> 0)
        |    actual_pct
        |  FROM events WHERE user_id % 2 <> 0 GROUP BY 1)
        |SELECT "value",
        |  ROUND(GREATEST(COALESCE(baseline_pct, 0), 0.0001), 6)
        |    AS baseline_pct,
        |  ROUND(GREATEST(COALESCE(actual_pct, 0), 0.0001), 6)
        |    AS actual_pct,
        |  ROUND((GREATEST(COALESCE(actual_pct, 0), 0.0001)
        |      - GREATEST(COALESCE(baseline_pct, 0), 0.0001))
        |    * LN(GREATEST(COALESCE(actual_pct, 0), 0.0001)
        |      / GREATEST(COALESCE(baseline_pct, 0), 0.0001)), 8)
        |    AS psi_bin
        |FROM bp FULL JOIN ap USING ("value") ORDER BY "value"""".stripMargin,
    "q_wls" ->
      """WITH li AS (
        |  SELECT l_returnflag, l_quantity, l_discount,
        |    l_extendedprice y, l_quantity w FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, SUM(w) n,
        |    SUM(w * l_quantity * l_quantity) s11,
        |    SUM(w * l_quantity * l_discount) s12, SUM(w * l_quantity) s1,
        |    SUM(w * l_discount * l_discount) s22, SUM(w * l_discount) s2,
        |    SUM(w * y) sy, SUM(w * l_quantity * y) s1y,
        |    SUM(w * l_discount * y) s2y
        |  FROM li GROUP BY 1),
        |d AS (
        |  SELECT *,
        |    s11 * (s22 * n - s2 * s2) - s12 * (s12 * n - s2 * s1)
        |      + s1 * (s12 * s2 - s22 * s1) AS det
        |  FROM s)
        |SELECT l_returnflag,
        |  ROUND((s1y * (s22 * n - s2 * s2) - s12 * (s2y * n - s2 * sy)
        |    + s1 * (s2y * s2 - s22 * sy)) / det, 6) AS b_qty,
        |  ROUND((s11 * (s2y * n - sy * s2) - s1y * (s12 * n - s2 * s1)
        |    + s1 * (s12 * sy - s2y * s1)) / det, 4) AS b_disc,
        |  ROUND((s11 * (s22 * sy - s2y * s2) - s12 * (s12 * sy - s2y * s1)
        |    + s1y * (s12 * s2 - s22 * s1)) / det, 4) AS b0
        |FROM d ORDER BY 1""".stripMargin,
    "q_corr_matrix" ->
      """SELECT ROUND(CORR(value, user_id), 6) AS corr_value_user,
        |  ROUND(CORR(value, event_id), 6) AS corr_value_event,
        |  ROUND(CORR(user_id, event_id), 6) AS corr_user_event
        |FROM events""".stripMargin
  )
}
