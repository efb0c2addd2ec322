package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Metrics
import graft.ops.MetricOps

/** Driver-contract queries for SURVEY §2.4 — ML evaluation metrics.
  * Inputs are deterministic derivations over the shared testdata tables so
  * the DuckDB oracle can reproduce them with identical arithmetic. */
object MetricQueries extends QueryPack {

  /** events + derived binary label y and score p. */
  private def scoredEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("y",
        (col("value") + col("event_id") % 7 > 52).cast("int"))
      .withColumn("p",
        least(col("value") / 350.0 + 0.001, lit(0.999)))

  private[queries] val scoredEventsSql =
    """SELECT *,
      |  CASE WHEN value + (event_id % 7) > 52 THEN 1 ELSE 0 END AS y,
      |  LEAST(value / 350.0 + 0.001, 0.999) AS p
      |FROM events""".stripMargin

  /** lineitem + deterministic regression "prediction". */
  private def regLineitem(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .withColumn("yy", col("l_extendedprice"))
      .withColumn("pp",
        col("l_quantity") * 36000.0 * (lit(1.0) - col("l_discount")))

  private val regSql =
    """SELECT l_returnflag, l_extendedprice AS yy,
      |  l_quantity * 36000.0 * (1.0 - l_discount) AS pp
      |FROM lineitem""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pass_at_k" -> ((s, dir) => {
      // unbiased pass@k over a constructed eval log: 20 attempts per
      // task (event_id % 500), success = value > 60
      MetricOps.passAtK(t(s, dir, "events"),
          col("event_id") % 500, col("value") > 60, Seq(1, 5, 10), Nil)
        .select(col("k"), round(col("pass_at_k"), 6).as("pass_at_k"),
          col("n_tasks"))
        .orderBy("k")
    }),
    "q_bootstrap_ci" -> ((s, dir) => {
      // deterministic Poisson-bootstrap CI of mean document length per
      // source (the md5-prefix weights replay exactly in SQL)
      import graft.sample.SampleOps
      SampleOps.bootstrapMeanCI(t(s, dir, "documents"), col("doc_id"),
          length(col("text")), Seq("source"), reps = 40)
        .select(col("source"), round(col("mean"), 6).as("mean"),
          round(col("ci_lo"), 6).as("ci_lo"),
          round(col("ci_hi"), 6).as("ci_hi"), col("n"), col("reps"))
        .orderBy("source")
    }),
    "q_kappa" -> ((s, dir) => {
      // inter-annotator agreement: two deterministic "raters" bucket
      // the same 2-dp value with a shifted copy (identical IEEE
      // arithmetic in both engines → identical buckets); Fleiss
      // treats event_id%5 as 5 raters per floor(event_id/5) item,
      // complete items only
      val ev = t(s, dir, "events")
        .withColumn("r1", floor(col("value") / 20.0).cast("int"))
        .withColumn("r2", floor((col("value") + col("event_id") % 7
          - 3) / 20.0).cast("int"))
      val cohen = MetricOps.cohenKappa(ev, col("r1"), col("r2"),
        Seq("event_type"))
      val fleiss = MetricOps.fleissKappa(
        ev.withColumn("item", floor(col("event_id") / 5)),
        col("item"), col("r1"), 5)
      cohen.select(col("event_type"),
          round(col("kappa"), 6).as("cohen_kappa"))
        .crossJoin(fleiss.select(col("n_items"),
          round(col("kappa"), 6).as("fleiss_kappa")))
        .orderBy("event_type")
    }),
    "q_krippendorff" -> ((s, dir) => {
      // general agreement with deterministic MISSINGNESS (%23 ratings
      // dropped — the case kappa can't handle); units of ~5 ratings
      val ev = t(s, dir, "events")
        .filter(col("event_id") % 23 =!= 0)
        .withColumn("unit", floor(col("event_id") / 5))
        .withColumn("v", floor(col("value") / 20.0).cast("int"))
      MetricOps.krippendorffAlpha(ev, col("unit"), col("v"))
        .select(col("n_units"), col("n_ratings"),
          round(col("alpha"), 6).as("alpha"))
    }),
    "q_calibration" -> ((s, dir) => {
      MetricOps.calibration(scoredEvents(s, dir), col("y"), col("p"),
          Seq("event_type"), 10)
        .select(col("event_type"), col("n"),
          round(col("ece"), 6).as("ece"),
          round(col("brier"), 6).as("brier"))
        .orderBy("event_type")
    }),
    "q_roc_auc" -> ((s, dir) => {
      MetricOps.rocAucNamed(scoredEvents(s, dir), col("y"), col("p"),
          Seq("event_type"))
        .withColumn("roc_auc", round(col("roc_auc"), 6))
        .orderBy("event_type")
    }),
    "q_log_loss" -> ((s, dir) => {
      scoredEvents(s, dir)
        .groupBy(col("event_type"))
        .agg(round(Metrics.logLoss(col("y"), col("p")), 6).as("log_loss"))
        .orderBy("event_type")
    }),
    "q_reg_metrics" -> ((s, dir) => {
      regLineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(Metrics.l1Loss(col("yy"), col("pp")), 4).as("mae"),
          round(Metrics.lInfLoss(col("yy"), col("pp")), 4).as("max_err"),
          round(Metrics.rmse(col("yy"), col("pp")), 4).as("rmse"),
          round(Metrics.r2(col("yy"), col("pp")), 6).as("r2"),
          round(Metrics.adjR2(col("yy"), col("pp"), 2), 6).as("adj_r2"),
          round(Metrics.mape(col("yy"), col("pp")), 6).as("mape"),
          round(Metrics.smape(col("yy"), col("pp")), 6).as("smape"),
          round(Metrics.msle(col("yy"), col("pp")), 6).as("msle"),
          round(Metrics.huberLoss(col("yy"), col("pp"), 1000.0), 4)
            .as("huber"),
          round(Metrics.logCosh(col("yy"), col("pp")), 4).as("log_cosh"))
        .orderBy("l_returnflag")
    }),
    "q_confusion_matrix" -> ((s, dir) => {
      scoredEvents(s, dir)
        .groupBy(col("event_type"))
        .agg(Metrics.confusionMatrix(col("y"), col("p"), 0.25).as("cm"))
        .select(col("event_type"),
          col("cm.tp").as("tp"), col("cm.fp").as("fp"),
          col("cm.tn").as("tn"), col("cm.fn").as("fn"),
          round(col("cm.precision"), 6).as("precision"),
          round(col("cm.recall"), 6).as("recall"),
          round(col("cm.f1"), 6).as("f1"),
          round(col("cm.accuracy"), 6).as("accuracy"),
          round(col("cm.mcc"), 6).as("mcc"),
          round(col("cm.balanced_accuracy"), 6).as("balanced_accuracy"))
        .orderBy("event_type")
    }),
    "q_gini" -> ((s, dir) => {
      MetricOps.gini(scoredEvents(s, dir), col("y"), col("p"),
          Seq("event_type"))
        .withColumn("gini", round(col("gini"), 6))
        .orderBy("event_type")
    }),
    "q_tpr_fpr" -> ((s, dir) => {
      MetricOps.tprFpr(scoredEvents(s, dir), col("y"), col("p"),
          Seq("event_type"))
        .withColumn("tpr", round(col("tpr"), 6))
        .withColumn("fpr", round(col("fpr"), 6))
        .orderBy("event_type", "threshold")
    }),
    "q_ndcg" -> ((s, dir) => {
      val df = scoredEvents(s, dir)
        .withColumn("rel", floor(col("value") / 100.0).cast("int"))
      MetricOps.ndcg(df, col("rel"), col("p"), col("event_id"),
          Seq("event_type"), 50)
        .withColumn("dcg", round(col("dcg"), 6))
        .withColumn("ndcg", round(col("ndcg"), 6))
        .orderBy("event_type")
    }),
    // coarse score = heavy ties → exercises the sklearn tie-averaged
    // path, whose result is invariant to tie order (safe to hash)
    "q_ndcg_ties" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("rel", (floor(col("value")) % 10).cast("int"))
        .withColumn("score", floor(col("value") / 50.0))
      MetricOps.ndcgTieAveraged(ev, col("rel"), col("score"),
          Seq("event_type"))
        .select(col("event_type"), round(col("dcg"), 4).as("dcg"),
          round(col("ndcg"), 6).as("ndcg"))
        .orderBy("event_type")
    }),
    "q_multi_roc_auc" -> ((s, dir) => {
      val df = t(s, dir, "events")
        .withColumn("y_cls", col("user_id") % 3)
        .withColumn("probs", array(
          (col("event_id") * 131 % 997) / 997.0,
          (col("event_id") * 137 % 991) / 991.0,
          (col("event_id") * 139 % 983) / 983.0))
      MetricOps.multiRocAuc(df, col("y_cls"), col("probs"), 3,
          Seq("event_type"))
        .withColumn("multi_roc_auc", round(col("multi_roc_auc"), 6))
        .orderBy("event_type")
    }),
    "q_cat_cross_entropy" -> ((s, dir) => {
      val df = t(s, dir, "events")
        .withColumn("y_cls", col("user_id") % 3)
        .withColumn("probs", array(
          (col("event_id") * 131 % 997 + 1) / 998.0,
          (col("event_id") * 137 % 991 + 1) / 992.0,
          (col("event_id") * 139 % 983 + 1) / 984.0))
      df.groupBy(col("event_type"))
        .agg(round(Metrics.catCrossEntropy(col("y_cls"), col("probs")), 6)
          .as("cce"))
        .orderBy("event_type")
    }),
    "q_mad" -> ((s, dir) => {
      MetricOps.mad(t(s, dir, "lineitem"), col("l_extendedprice"),
          Seq("l_returnflag"), "median")
        .withColumn("mad", round(col("mad"), 4))
        .orderBy("l_returnflag")
    }),
    "q_mean_ad" -> ((s, dir) => {
      MetricOps.mad(t(s, dir, "lineitem"), col("l_extendedprice"),
          Seq("l_returnflag"), "mean", "mean_ad")
        .withColumn("mean_ad", round(col("mean_ad"), 4))
        .orderBy("l_returnflag")
    }),
    "q_mase" -> ((s, dir) => {
      MetricOps.mase(scoredEvents(s, dir), col("event_id"), col("value"),
          col("value") * 0.9 + 5.0, Seq("event_type"), 1)
        .withColumn("mase", round(col("mase"), 6))
        .join(MetricOps.mase(scoredEvents(s, dir), col("event_id"),
            col("value"), col("value") * 0.9 + 5.0, Seq("event_type"), 1,
            outName = "mase_median", useMean = false)
          .withColumn("mase_median", round(col("mase_median"), 6)),
          "event_type")
        .orderBy("event_type")
    })
  )

  private def passProd(k: Int): String =
    (0 until k).map(i => s"(n - c - $i) / (n - $i)").mkString(" * ")
  private def passSel(k: Int): String =
    s"SELECT $k AS k, ROUND(AVG(CASE WHEN n - c < $k THEN 1.0 " +
      s"ELSE 1.0 - ${passProd(k)} END), 6) AS pass_at_k, " +
      s"COUNT(*)::BIGINT AS n_tasks FROM pt WHERE n >= $k"
  private val poisSum = graft.sample.SampleOps.poissonBounds
    .map(b => s"CASE WHEN h >= '$b' THEN 1 ELSE 0 END")
    .mkString(" + ")

  def oracles: Map[String, String] = Map(
    "q_pass_at_k" ->
      s"""WITH a AS (
        |  SELECT event_id % 500 task,
        |    CASE WHEN value > 60 THEN 1 ELSE 0 END ok
        |  FROM events),
        |pt AS (SELECT task, COUNT(*)::DOUBLE n, SUM(ok)::DOUBLE c
        |  FROM a GROUP BY 1)
        |SELECT * FROM (
        |  ${passSel(1)}
        |  UNION ALL ${passSel(5)}
        |  UNION ALL ${passSel(10)})
        |ORDER BY k""".stripMargin,
    "q_bootstrap_ci" ->
      s"""WITH b AS (
        |  SELECT source, doc_id::VARCHAR id, LENGTH(text)::DOUBLE x
        |  FROM documents),
        |e AS (SELECT source, id, x, r.r FROM b, range(0, 40) r(r)),
        |h AS (
        |  SELECT source, r, x,
        |    substring(md5(id || ':42:' || r::VARCHAR), 1, 12) h
        |  FROM e),
        |w AS (SELECT source, r, x, ($poisSum)::DOUBLE wt FROM h),
        |m AS (SELECT source, r, SUM(wt*x)/SUM(wt) m
        |  FROM w GROUP BY 1, 2),
        |ci AS (
        |  SELECT source, quantile_cont(m, 0.025) lo,
        |    quantile_cont(m, 0.975) hi
        |  FROM m GROUP BY 1),
        |st AS (SELECT source, AVG(x) mean, COUNT(*) n
        |  FROM b GROUP BY 1)
        |SELECT st.source, ROUND(mean, 6) AS mean,
        |  ROUND(lo, 6) AS ci_lo, ROUND(hi, 6) AS ci_hi,
        |  n::BIGINT AS n, 40::BIGINT AS reps
        |FROM st JOIN ci ON st.source = ci.source
        |ORDER BY 1""".stripMargin,
    "q_krippendorff" ->
      """WITH r AS (
        |  SELECT CAST(FLOOR(event_id / 5) AS BIGINT) AS u,
        |    CAST(FLOOR(value / 20.0) AS INT) AS v
        |  FROM events WHERE event_id % 23 <> 0),
        |vc AS (SELECT u, v, COUNT(*) AS n FROM r GROUP BY 1, 2),
        |un AS (
        |  SELECT u, SUM(n) AS m, SUM(n * n) AS sq
        |  FROM vc GROUP BY 1 HAVING SUM(n) >= 2),
        |dn AS (
        |  SELECT COUNT(*) AS nu, SUM(m) AS ntot,
        |    SUM((m * m - sq)::DOUBLE / (m - 1)) AS dnum
        |  FROM un),
        |nc AS (
        |  SELECT SUM(cn * cn)::DOUBLE AS csq
        |  FROM (SELECT v, SUM(n) AS cn
        |        FROM vc JOIN un USING (u) GROUP BY 1))
        |SELECT nu::BIGINT AS n_units, ntot::BIGINT AS n_ratings,
        |  ROUND(1.0 - (dnum / ntot) /
        |    ((ntot * ntot - csq) / (ntot::DOUBLE * (ntot - 1))), 6)
        |    AS alpha
        |FROM dn CROSS JOIN nc""".stripMargin,
    "q_calibration" ->
      s"""WITH t AS ($scoredEventsSql),
         |b AS (
         |  SELECT event_type,
         |    LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS bin,
         |    y::DOUBLE AS y, p
         |  FROM t),
         |pb AS (
         |  SELECT event_type, bin, COUNT(*) AS n, AVG(y) AS acc,
         |    AVG(p) AS conf, SUM((p - y) * (p - y)) AS se
         |  FROM b GROUP BY 1, 2)
         |SELECT event_type, SUM(n)::BIGINT AS n,
         |  ROUND(SUM(ABS(acc - conf) * n) / SUM(n), 6) AS ece,
         |  ROUND(SUM(se) / SUM(n), 6) AS brier
         |FROM pb GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_kappa" ->
      """WITH r AS (
        |  SELECT event_type,
        |    CAST(FLOOR(value / 20.0) AS INT) AS r1,
        |    CAST(FLOOR((value + (event_id % 7) - 3) / 20.0) AS INT)
        |      AS r2,
        |    CAST(FLOOR(event_id / 5) AS BIGINT) AS item
        |  FROM events),
        |tot AS (
        |  SELECT event_type, COUNT(*) AS t,
        |    SUM(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS d
        |  FROM r GROUP BY 1),
        |ma AS (SELECT event_type, r1 AS c, COUNT(*) AS ca
        |  FROM r GROUP BY 1, 2),
        |mb AS (SELECT event_type, r2 AS c, COUNT(*) AS cb
        |  FROM r GROUP BY 1, 2),
        |pe AS (
        |  SELECT a.event_type, SUM(a.ca * b.cb) AS ab
        |  FROM ma a JOIN mb b
        |    ON a.event_type = b.event_type AND a.c = b.c
        |  GROUP BY 1),
        |cohen AS (
        |  SELECT t.event_type,
        |    ROUND((d::DOUBLE / t - ab::DOUBLE / (t * t))
        |      / (1.0 - ab::DOUBLE / (t * t)), 6) AS cohen_kappa
        |  FROM tot t JOIN pe ON pe.event_type = t.event_type),
        |fc AS (SELECT item, r1 AS cat, COUNT(*) AS n
        |  FROM r GROUP BY 1, 2),
        |fi AS (SELECT item, SUM(n) AS tot, SUM(n * n) AS sq
        |  FROM fc GROUP BY 1 HAVING SUM(n) = 5),
        |pb AS (
        |  SELECT COUNT(*) AS n_items,
        |    AVG((sq - 5)::DOUBLE / 20.0) AS pbar
        |  FROM fi),
        |ct AS (
        |  SELECT cat, SUM(n) AS cn
        |  FROM fc JOIN fi USING (item) GROUP BY 1),
        |pe2 AS (
        |  SELECT SUM(cn * cn)::DOUBLE / (SUM(cn)::DOUBLE * SUM(cn))
        |    AS pe FROM ct)
        |SELECT c.event_type, c.cohen_kappa, pb.n_items::BIGINT
        |  AS n_items,
        |  ROUND((pb.pbar - pe2.pe) / (1.0 - pe2.pe), 6)
        |    AS fleiss_kappa
        |FROM cohen c CROSS JOIN pb CROSS JOIN pe2
        |ORDER BY 1""".stripMargin,
    "q_roc_auc" ->
      s"""WITH t AS ($scoredEventsSql),
         |r AS (
         |  SELECT event_type, y,
         |    RANK() OVER (PARTITION BY event_type ORDER BY p)
         |      + (COUNT(*) OVER (PARTITION BY event_type, p) - 1) / 2.0
         |      AS ar
         |  FROM t)
         |SELECT event_type,
         |  ROUND((SUM(CASE WHEN y = 1 THEN ar END)
         |          - SUM(y) * (SUM(y) + 1) / 2.0)
         |        / (SUM(y) * (COUNT(*) - SUM(y))), 6) AS roc_auc
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_log_loss" ->
      s"""WITH t AS ($scoredEventsSql)
         |SELECT event_type,
         |  ROUND(-AVG(y * LN(LEAST(GREATEST(p, 1e-15), 1 - 1e-15))
         |    + (1 - y) * LN(1 - LEAST(GREATEST(p, 1e-15), 1 - 1e-15))), 6)
         |    AS log_loss
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_reg_metrics" ->
      s"""WITH t AS ($regSql)
         |SELECT l_returnflag,
         |  ROUND(AVG(ABS(yy - pp)), 4) AS mae,
         |  ROUND(MAX(ABS(yy - pp)), 4) AS max_err,
         |  ROUND(SQRT(AVG((yy - pp) * (yy - pp))), 4) AS rmse,
         |  ROUND(1 - SUM((yy - pp) * (yy - pp))
         |    / (SUM(yy * yy) - SUM(yy) * SUM(yy) / COUNT(*)), 6) AS r2,
         |  ROUND(1 - (1 - (1 - SUM((yy - pp) * (yy - pp))
         |      / (SUM(yy * yy) - SUM(yy) * SUM(yy) / COUNT(*))))
         |    * (COUNT(*) - 1.0) / (COUNT(*) - 3.0), 6) AS adj_r2,
         |  ROUND(AVG(ABS((yy - pp) / yy)), 6) AS mape,
         |  ROUND(AVG(ABS(pp - yy) / (ABS(pp) + ABS(yy))), 6) AS smape,
         |  ROUND(AVG(POW(LN(1 + yy) - LN(1 + pp), 2)), 6) AS msle,
         |  ROUND(AVG(CASE WHEN ABS(yy - pp) < 1000.0
         |    THEN (yy - pp) * (yy - pp) / 2.0
         |    ELSE 1000.0 * (ABS(yy - pp) - 500.0) END), 4) AS huber,
         |  ROUND(AVG(ABS(yy - pp)
         |    + LN(1 + EXP(-2 * ABS(yy - pp))) - LN(2)), 4) AS log_cosh
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_confusion_matrix" ->
      s"""WITH t AS ($scoredEventsSql),
         |c AS (
         |  SELECT event_type,
         |    SUM(CASE WHEN y = 1 AND p >= 0.25 THEN 1 ELSE 0 END)::DOUBLE tp,
         |    SUM(CASE WHEN y = 0 AND p >= 0.25 THEN 1 ELSE 0 END)::DOUBLE fp,
         |    SUM(CASE WHEN y = 0 AND p < 0.25 THEN 1 ELSE 0 END)::DOUBLE tn,
         |    SUM(CASE WHEN y = 1 AND p < 0.25 THEN 1 ELSE 0 END)::DOUBLE fn
         |  FROM t GROUP BY 1)
         |SELECT event_type,
         |  tp::BIGINT AS tp, fp::BIGINT AS fp,
         |  tn::BIGINT AS tn, fn::BIGINT AS fn,
         |  ROUND(tp / (tp + fp), 6) AS precision,
         |  ROUND(tp / (tp + fn), 6) AS recall,
         |  ROUND(2 * tp / (2 * tp + fp + fn), 6) AS f1,
         |  ROUND((tp + tn) / (tp + fp + tn + fn), 6) AS accuracy,
         |  ROUND((tp * tn - fp * fn)
         |    / SQRT((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)), 6) AS mcc,
         |  ROUND((tp / (tp + fn) + tn / (tn + fp)) / 2, 6)
         |    AS balanced_accuracy
         |FROM c ORDER BY 1""".stripMargin,
    "q_gini" ->
      s"""WITH t AS ($scoredEventsSql),
         |r AS (
         |  SELECT event_type, y,
         |    RANK() OVER (PARTITION BY event_type ORDER BY p)
         |      + (COUNT(*) OVER (PARTITION BY event_type, p) - 1) / 2.0
         |      AS ar
         |  FROM t)
         |SELECT event_type,
         |  ROUND(2 * ((SUM(CASE WHEN y = 1 THEN ar END)
         |          - SUM(y) * (SUM(y) + 1) / 2.0)
         |        / (SUM(y) * (COUNT(*) - SUM(y)))) - 1, 6) AS gini
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_tpr_fpr" ->
      s"""WITH t AS ($scoredEventsSql),
         |thr AS (
         |  SELECT event_type, p AS threshold, COUNT(*) cnt, SUM(y) pos
         |  FROM t GROUP BY 1, 2),
         |c AS (
         |  SELECT event_type, threshold,
         |    SUM(pos) OVER (PARTITION BY event_type ORDER BY threshold DESC)
         |      AS cum_pos,
         |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY threshold DESC)
         |      AS cum_cnt,
         |    SUM(pos) OVER (PARTITION BY event_type) AS npos,
         |    SUM(cnt) OVER (PARTITION BY event_type) AS n
         |  FROM thr)
         |SELECT event_type, threshold,
         |  ROUND(cum_pos / npos, 6) AS tpr,
         |  ROUND((cum_cnt - cum_pos) / (n - npos), 6) AS fpr
         |FROM c ORDER BY 1, 2""".stripMargin,
    "q_ndcg_ties" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(FLOOR(value) AS INT) % 10 AS rel,
        |    FLOOR(value / 50.0) AS score
        |  FROM events),
        |r AS (
        |  SELECT event_type, rel,
        |    AVG(rel) OVER (PARTITION BY event_type, score) avg_rel,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY score DESC) rk,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY rel DESC) irk
        |  FROM e)
        |SELECT event_type,
        |  ROUND(SUM(avg_rel / LOG2(rk + 1)), 4) AS dcg,
        |  ROUND(SUM(avg_rel / LOG2(rk + 1))
        |    / SUM(rel / LOG2(irk + 1)), 6) AS ndcg
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ndcg" ->
      s"""WITH t AS (
         |  SELECT event_type, event_id,
         |    FLOOR(value / 100.0)::INT AS rel,
         |    LEAST(value / 350.0 + 0.001, 0.999) AS p
         |  FROM events),
         |r AS (
         |  SELECT event_type, rel,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY p DESC, event_id) AS rk,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY rel DESC, event_id) AS irk
         |  FROM t)
         |SELECT event_type,
         |  ROUND(SUM(CASE WHEN rk <= 50
         |    THEN rel / (LN(rk + 1.0) / LN(2)) ELSE 0 END), 6) AS dcg,
         |  ROUND(SUM(CASE WHEN rk <= 50
         |      THEN rel / (LN(rk + 1.0) / LN(2)) ELSE 0 END)
         |    / SUM(CASE WHEN irk <= 50
         |      THEN rel / (LN(irk + 1.0) / LN(2)) ELSE 0 END), 6) AS ndcg
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_multi_roc_auc" ->
      """WITH t AS (
        |  SELECT event_type, user_id % 3 AS y_cls,
        |    (event_id * 131 % 997) / 997.0 AS p0,
        |    (event_id * 137 % 991) / 991.0 AS p1,
        |    (event_id * 139 % 983) / 983.0 AS p2
        |  FROM events),
        |cls AS (
        |  SELECT event_type, CASE WHEN y_cls = 0 THEN 1 ELSE 0 END y, p0 p,
        |    0 k FROM t
        |  UNION ALL
        |  SELECT event_type, CASE WHEN y_cls = 1 THEN 1 ELSE 0 END, p1, 1
        |    FROM t
        |  UNION ALL
        |  SELECT event_type, CASE WHEN y_cls = 2 THEN 1 ELSE 0 END, p2, 2
        |    FROM t),
        |r AS (
        |  SELECT event_type, k, y,
        |    RANK() OVER (PARTITION BY event_type, k ORDER BY p)
        |      + (COUNT(*) OVER (PARTITION BY event_type, k, p) - 1) / 2.0
        |      AS ar
        |  FROM cls),
        |auc AS (
        |  SELECT event_type, k,
        |    (SUM(CASE WHEN y = 1 THEN ar END)
        |      - SUM(y) * (SUM(y) + 1) / 2.0)
        |      / (SUM(y) * (COUNT(*) - SUM(y))) AS auc
        |  FROM r GROUP BY 1, 2)
        |SELECT event_type, ROUND(AVG(auc), 6) AS multi_roc_auc
        |FROM auc GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cat_cross_entropy" ->
      """WITH t AS (
        |  SELECT event_type, user_id % 3 AS y_cls,
        |    [(event_id * 131 % 997 + 1) / 998.0,
        |     (event_id * 137 % 991 + 1) / 992.0,
        |     (event_id * 139 % 983 + 1) / 984.0] AS probs
        |  FROM events)
        |SELECT event_type,
        |  ROUND(-AVG(LN(LEAST(GREATEST(
        |    probs[(y_cls + 1)::INT], 1e-15), 1 - 1e-15))), 6) AS cce
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mad" ->
      """WITH c AS (
        |  SELECT l_returnflag, QUANTILE_CONT(l_extendedprice, 0.5) AS m
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag,
        |  ROUND(QUANTILE_CONT(ABS(l.l_extendedprice - c.m), 0.5), 4) AS mad
        |FROM lineitem l JOIN c USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mean_ad" ->
      """WITH c AS (
        |  SELECT l_returnflag, AVG(l_extendedprice) AS m
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag,
        |  ROUND(AVG(ABS(l.l_extendedprice - c.m)), 4) AS mean_ad
        |FROM lineitem l JOIN c USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_mase" ->
      s"""WITH t AS ($scoredEventsSql),
         |l AS (
         |  SELECT event_type, value,
         |    value * 0.9 + 5.0 AS pred,
         |    LAG(value, 1) OVER (PARTITION BY event_type ORDER BY event_id)
         |      AS naive
         |  FROM t)
         |SELECT event_type,
         |  ROUND(AVG(ABS(value - pred)) / AVG(ABS(value - naive)), 6)
         |    AS mase,
         |  ROUND(QUANTILE_CONT(ABS(value - pred), 0.5)
         |    / QUANTILE_CONT(ABS(value - naive), 0.5), 6)
         |    AS mase_median
         |FROM l GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
