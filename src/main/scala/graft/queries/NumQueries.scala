package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.NumFuncs
import graft.ops.EncodeOps

/** Driver-contract queries for SURVEY §2.6 — numerical extras, array
  * math, encoders, PSI/WoE drift metrics. */
object NumQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_float_extras" -> ((s, dir) => {
      val v = col("value")
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(avg(NumFuncs.expit(v / 100.0)), 6).as("avg_expit"),
          round(avg(NumFuncs.logit(
            least(greatest(v / 500.0, lit(0.01)), lit(0.99)))), 6)
            .as("avg_logit"),
          round(avg(NumFuncs.sinc(v / 50.0)), 6).as("avg_sinc"),
          round(sum(NumFuncs.xlogy((v > 100).cast("double"), v)), 4)
            .as("sum_xlogy"),
          round(avg(NumFuncs.exp2(v / 100.0)), 6).as("avg_exp2"),
          round(avg(NumFuncs.fract(v)), 6).as("avg_fract"),
          round(sum(NumFuncs.truncCol(v)), 2).as("sum_trunc"),
          round(avg(NumFuncs.gammaFn(v % 5.0 + 1.5)), 6).as("avg_gamma"))
        .orderBy("event_type")
    }),
    "q_horizontal" -> ((s, dir) => {
      val (q, p, d) =
        (col("l_quantity"), col("l_extendedprice") / 10000.0,
          col("l_discount") * 10.0)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(sum(NumFuncs.l1Horizontal(q, p, d)), 4).as("sum_l1"),
          round(sum(NumFuncs.l2SqHorizontal(q, p, d)), 4).as("sum_l2sq"),
          round(sum(NumFuncs.lInfHorizontal(q, p, d)), 4).as("sum_linf"),
          round(avg(NumFuncs.haversine(
            q, p * 3.0, d, col("l_tax") * 100.0)), 6).as("avg_haversine"),
          sum(NumFuncs.gcdCol(col("l_linenumber"),
            col("l_partkey") % 100 + 1)).as("sum_gcd"),
          sum(NumFuncs.lcmCol(col("l_linenumber"),
            col("l_partkey") % 12 + 1)).as("sum_lcm"))
        .orderBy("l_returnflag")
    }),
    "q_array_ops" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("a"))
      val b = e.select((col("vec_id") - 1).as("vec_id"),
        col("a").as("b"))
      e.join(b, "vec_id")
        .groupBy(col("label"))
        .agg(
          round(sum(NumFuncs.arrDot(col("a"), col("b"))), 4).as("sum_dot"),
          round(sum(NumFuncs.arrL1Dist(col("a"), col("b"))), 4)
            .as("sum_l1"),
          round(sum(NumFuncs.arrSql2Dist(col("a"), col("b"))), 4)
            .as("sum_sql2"),
          round(sum(NumFuncs.arrLInfDist(col("a"), col("b"))), 4)
            .as("sum_linf"),
          round(sum(NumFuncs.arrCosineSim(col("a"), col("b"))), 4)
            .as("sum_cos"),
          round(sum(element_at(NumFuncs.softmaxArr(col("a")), 1)), 6)
            .as("sum_softmax1"))
        .orderBy("label")
    }),
    "q_jaccard_row" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
        .withColumn("long_toks",
          filter(col("toks"), t => length(t) > 4))
      d.groupBy(col("source"))
        .agg(
          round(avg(NumFuncs.jaccardRow(col("toks"), col("long_toks"))), 6)
            .as("avg_jaccard"),
          round(avg(NumFuncs.listAmax(
            transform(col("toks"), t => length(t)))), 6)
            .as("avg_max_toklen"))
        .orderBy("source")
    }),
    "q_psi" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      EncodeOps.psiReport(
          ev.filter(col("event_type") === "click"), col("value"),
          ev.filter(col("event_type") =!= "click"), col("value"), 10)
        .select(col("bucket"),
          round(col("baseline_pct"), 6).as("baseline_pct"),
          round(col("actual_pct"), 6).as("actual_pct"),
          round(col("psi_bin"), 8).as("psi_bin"))
    }),
    "q_woe_iv" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("y",
          (col("value") + col("event_id") % 7 > 52).cast("int"))
      EncodeOps.woeDiscrete(ev, col("event_type"), col("y"))
        .join(EncodeOps.infoValue(ev, col("event_type"), col("y")),
          Seq("value"))
        .select(col("value"), round(col("woe"), 6).as("woe"),
          round(col("iv"), 8).as("iv"))
        .orderBy("value")
    }),
    "q_woe_cont" -> ((s, dir) => {
      // continuous woe, scale path: percentile breakpoints + codegen'd
      // bucketing (no total sort); DuckDB mirrors with quantile_cont
      val ev = t(s, dir, "events")
        .withColumn("y",
          (col("value") + col("event_id") % 7 > 52).cast("int"))
      EncodeOps.woeContinuous(ev, col("value"), col("y"), 10)
        .select(col("bin"), col("events").cast("long").as("events"),
          round(col("woe"), 6).as("woe"), round(col("iv"), 8).as("iv"))
        .orderBy("bin")
    }),
    "q_woe_cont_exact" -> ((s, dir) => {
      // tie-exact variant: rank bins over the deterministic
      // (value, event_id) order — event_id is unique, so both engines
      // agree on tie placement
      val ev = t(s, dir, "events")
        .withColumn("y",
          (col("value") + col("event_id") % 7 > 52).cast("int"))
      EncodeOps.woeContinuousExact(ev, col("value"), col("y"),
          col("event_id"), 10)
        .select(col("bin"), col("events").cast("long").as("events"),
          round(col("woe"), 6).as("woe"), round(col("iv"), 8).as("iv"))
        .orderBy("bin")
    }),
    "q_target_encode" -> ((s, dir) => {
      EncodeOps.targetEncode(t(s, dir, "customer"), col("c_mktsegment"),
          (col("c_acctbal") > 0).cast("double"), 100, 50.0)
        .select(col("value"), round(col("to"), 6).as("to"))
        .orderBy("value")
    }),
    "q_detrend" -> ((s, dir) => {
      EncodeOps.detrend(t(s, dir, "events"), col("value"),
          col("event_id"), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(round(sum(abs(col("detrended"))), 4).as("sum_abs_detrended"),
          round(stddev(col("detrended")), 6).as("sd_detrended"))
        .orderBy("event_type")
    }),
    "q_add_at" -> ((s, dir) => {
      EncodeOps.addAt(t(s, dir, "events"), col("user_id") % 20,
          col("value"))
        .select(col("idx"), round(col("sum"), 2).as("sum"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q_float_extras" ->
      """SELECT event_type,
        |  ROUND(AVG(1.0 / (1.0 + EXP(-value / 100.0))), 6) AS avg_expit,
        |  ROUND(AVG(LN(LEAST(GREATEST(value / 500.0, 0.01), 0.99)
        |    / (1 - LEAST(GREATEST(value / 500.0, 0.01), 0.99)))), 6)
        |    AS avg_logit,
        |  ROUND(AVG(CASE WHEN value = 0 THEN 1.0
        |    ELSE SIN(PI() * value / 50.0) / (PI() * value / 50.0) END), 6)
        |    AS avg_sinc,
        |  ROUND(SUM(CASE WHEN value > 100 THEN LN(value) ELSE 0 END), 4)
        |    AS sum_xlogy,
        |  ROUND(AVG(POW(2.0, value / 100.0)), 6) AS avg_exp2,
        |  ROUND(AVG(value - TRUNC(value)), 6) AS avg_fract,
        |  ROUND(SUM(TRUNC(value)), 2) AS sum_trunc,
        |  ROUND(AVG(gamma(value % 5.0 + 1.5)), 6) AS avg_gamma
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_horizontal" ->
      """WITH t AS (
        |  SELECT l_returnflag, l_quantity q, l_extendedprice / 10000.0 p,
        |    l_discount * 10.0 d, l_linenumber ln,
        |    l_partkey % 100 + 1 g1, l_partkey % 12 + 1 g2, l_tax
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  ROUND(SUM(ABS(q) + ABS(p) + ABS(d)), 4) AS sum_l1,
        |  ROUND(SUM(q*q + p*p + d*d), 4) AS sum_l2sq,
        |  ROUND(SUM(GREATEST(ABS(q), ABS(p), ABS(d))), 4) AS sum_linf,
        |  ROUND(AVG(2 * 6371.0 * ASIN(SQRT(
        |    SIN(RADIANS(d - q) / 2) * SIN(RADIANS(d - q) / 2)
        |    + COS(RADIANS(q)) * COS(RADIANS(d))
        |      * SIN(RADIANS(l_tax * 100.0 - p * 3.0) / 2)
        |      * SIN(RADIANS(l_tax * 100.0 - p * 3.0) / 2)))), 6)
        |    AS avg_haversine,
        |  SUM(gcd(ln::BIGINT, g1::BIGINT))::BIGINT AS sum_gcd,
        |  SUM(lcm(ln::BIGINT, g2::BIGINT))::BIGINT AS sum_lcm
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_array_ops" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] a FROM embeddings),
        |b AS (SELECT vec_id - 1 vec_id, embedding::DOUBLE[] b
        |  FROM embeddings),
        |j AS (SELECT label, a, b FROM e JOIN b USING (vec_id)),
        |x AS (
        |  SELECT label,
        |    list_dot_product(a, b) dot,
        |    (SELECT SUM(ABS(u.x - u.y)) FROM
        |      (SELECT UNNEST(a) x, UNNEST(b) y) u) l1,
        |    (SELECT SUM((u.x - u.y) * (u.x - u.y)) FROM
        |      (SELECT UNNEST(a) x, UNNEST(b) y) u) sql2,
        |    (SELECT MAX(ABS(u.x - u.y)) FROM
        |      (SELECT UNNEST(a) x, UNNEST(b) y) u) linf,
        |    list_cosine_similarity(a, b) cos,
        |    EXP(a[1] - list_max(a)) /
        |      (SELECT SUM(EXP(u.x - list_max(a)))
        |       FROM (SELECT UNNEST(a) x) u) sm1
        |  FROM j)
        |SELECT label, ROUND(SUM(dot), 4) AS sum_dot,
        |  ROUND(SUM(l1), 4) AS sum_l1,
        |  ROUND(SUM(sql2), 4) AS sum_sql2,
        |  ROUND(SUM(linf), 4) AS sum_linf,
        |  ROUND(SUM(cos), 4) AS sum_cos,
        |  ROUND(SUM(sm1), 6) AS sum_softmax1
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_jaccard_row" ->
      """WITH d AS (
        |  SELECT source,
        |    regexp_split_to_array(LOWER(TRIM(text)), '\s+') toks,
        |    list_filter(regexp_split_to_array(LOWER(TRIM(text)), '\s+'),
        |      t -> LENGTH(t) > 4) long_toks
        |  FROM documents)
        |SELECT source,
        |  ROUND(AVG(LENGTH(list_intersect(toks, long_toks))::DOUBLE
        |    / LENGTH(list_distinct(list_concat(toks, long_toks)))), 6)
        |    AS avg_jaccard,
        |  ROUND(AVG(list_max(list_transform(toks, t -> LENGTH(t)))), 6)
        |    AS avg_max_toklen
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_psi" ->
      """WITH base AS (
        |  SELECT value FROM events WHERE event_type = 'click'),
        |act AS (
        |  SELECT value FROM events WHERE event_type <> 'click'),
        |bps AS (
        |  SELECT UNNEST(quantile_cont(value,
        |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])) bp FROM base),
        |bb AS (
        |  SELECT LEAST((SELECT COUNT(*) FROM bps WHERE value > bp), 9)
        |    bucket FROM base),
        |ab AS (
        |  SELECT LEAST((SELECT COUNT(*) FROM bps WHERE value > bp), 9)
        |    bucket FROM act),
        |bp_pct AS (
        |  SELECT bucket, COUNT(*)::DOUBLE
        |    / (SELECT COUNT(*) FROM bb) baseline_pct
        |  FROM bb GROUP BY 1),
        |ap_pct AS (
        |  SELECT bucket, COUNT(*)::DOUBLE
        |    / (SELECT COUNT(*) FROM ab) actual_pct
        |  FROM ab GROUP BY 1)
        |SELECT bucket,
        |  ROUND(GREATEST(COALESCE(baseline_pct, 0), 0.0001), 6)
        |    AS baseline_pct,
        |  ROUND(GREATEST(COALESCE(actual_pct, 0), 0.0001), 6)
        |    AS actual_pct,
        |  ROUND((GREATEST(COALESCE(actual_pct, 0), 0.0001)
        |      - GREATEST(COALESCE(baseline_pct, 0), 0.0001))
        |    * LN(GREATEST(COALESCE(actual_pct, 0), 0.0001)
        |        / GREATEST(COALESCE(baseline_pct, 0), 0.0001)), 8)
        |    AS psi_bin
        |FROM bp_pct FULL JOIN ap_pct USING (bucket)
        |ORDER BY bucket""".stripMargin,
    "q_woe_iv" ->
      """WITH t AS (
        |  SELECT event_type AS value,
        |    CASE WHEN value + (event_id % 7) > 52 THEN 1.0 ELSE 0.0 END y
        |  FROM events),
        |c AS (
        |  SELECT value, SUM(y) events, COUNT(*) - SUM(y) non_events
        |  FROM t GROUP BY 1),
        |tot AS (
        |  SELECT SUM(events) te, SUM(non_events) tn FROM c)
        |SELECT value,
        |  ROUND(LN(((events + 1.0) / (te + 2.0))
        |    / ((non_events + 1.0) / (tn + 2.0))), 6) AS woe,
        |  ROUND(((events + 1.0) / (te + 2.0)
        |      - (non_events + 1.0) / (tn + 2.0))
        |    * LN(((events + 1.0) / (te + 2.0))
        |      / ((non_events + 1.0) / (tn + 2.0))), 8) AS iv
        |FROM c, tot ORDER BY value""".stripMargin,
    "q_woe_cont" ->
      """WITH f AS (
        |  SELECT value x,
        |    CASE WHEN value + (event_id % 7) > 52 THEN 1.0 ELSE 0.0 END y
        |  FROM events
        |  WHERE value IS NOT NULL AND isfinite(value)),
        |bp AS (
        |  SELECT quantile_cont(x, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7,
        |    0.8, 0.9]) bps
        |  FROM f),
        |b AS (
        |  SELECT len(list_filter(bp.bps, e -> f.x > e))::BIGINT AS bin, y
        |  FROM f, bp),
        |c AS (
        |  SELECT bin, SUM(y) events, COUNT(*) - SUM(y) non_events
        |  FROM b GROUP BY 1),
        |tot AS (SELECT SUM(events) te, SUM(non_events) tn FROM c)
        |SELECT bin, events::BIGINT AS events,
        |  ROUND(LN(((events + 1.0) / (te + 2.0))
        |    / ((non_events + 1.0) / (tn + 2.0))), 6) AS woe,
        |  ROUND(((events + 1.0) / (te + 2.0)
        |      - (non_events + 1.0) / (tn + 2.0))
        |    * LN(((events + 1.0) / (te + 2.0))
        |      / ((non_events + 1.0) / (tn + 2.0))), 8) AS iv
        |FROM c, tot ORDER BY bin""".stripMargin,
    "q_woe_cont_exact" ->
      """WITH f AS (
        |  SELECT value x,
        |    CASE WHEN value + (event_id % 7) > 52 THEN 1.0 ELSE 0.0 END y,
        |    event_id o
        |  FROM events
        |  WHERE value IS NOT NULL AND isfinite(value)),
        |r AS (
        |  SELECT y, ROW_NUMBER() OVER (ORDER BY x, o) - 1 AS idx,
        |    COUNT(*) OVER () AS n
        |  FROM f),
        |b AS (SELECT (idx * 10) // n AS bin, y FROM r),
        |c AS (
        |  SELECT bin, SUM(y) events, COUNT(*) - SUM(y) non_events
        |  FROM b GROUP BY 1),
        |tot AS (SELECT SUM(events) te, SUM(non_events) tn FROM c)
        |SELECT bin, events::BIGINT AS events,
        |  ROUND(LN(((events + 1.0) / (te + 2.0))
        |    / ((non_events + 1.0) / (tn + 2.0))), 6) AS woe,
        |  ROUND(((events + 1.0) / (te + 2.0)
        |      - (non_events + 1.0) / (tn + 2.0))
        |    * LN(((events + 1.0) / (te + 2.0))
        |      / ((non_events + 1.0) / (tn + 2.0))), 8) AS iv
        |FROM c, tot ORDER BY bin""".stripMargin,
    "q_target_encode" ->
      """WITH t AS (
        |  SELECT c_mktsegment AS value,
        |    CASE WHEN c_acctbal > 0 THEN 1.0 ELSE 0.0 END t
        |  FROM customer),
        |g AS (
        |  SELECT value, COUNT(*) cnt, AVG(t) cond_p FROM t GROUP BY 1),
        |p AS (SELECT AVG(t) pr FROM t)
        |SELECT value,
        |  ROUND((1.0 / (1.0 + EXP(-(cnt - 100) / 50.0))) * cond_p
        |    + (1 - 1.0 / (1.0 + EXP(-(cnt - 100) / 50.0))) * pr, 6)
        |    AS "to"
        |FROM g, p ORDER BY value""".stripMargin,
    "q_detrend" ->
      """WITH s AS (
        |  SELECT event_type,
        |    (AVG(event_id * value) - AVG(event_id) * AVG(value))
        |      / (AVG(event_id * event_id) - AVG(event_id) * AVG(event_id))
        |      slope,
        |    AVG(value) my, AVG(event_id) mx
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT e.event_type,
        |    value - (s.slope * event_id + (s.my - s.slope * s.mx)) r
        |  FROM events e JOIN s USING (event_type))
        |SELECT event_type,
        |  ROUND(SUM(ABS(r)), 4) AS sum_abs_detrended,
        |  ROUND(STDDEV_SAMP(r), 6) AS sd_detrended
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_add_at" ->
      """SELECT user_id % 20 AS idx, ROUND(SUM(value), 2) AS sum
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
