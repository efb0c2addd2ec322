package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eda.EdaOps
import graft.sample.SampleOps

/** Driver-contract queries for SURVEY §2.12 (sampling/splitting) and
  * §2.13 (EDA reports). Random sampling can't be bit-compared across
  * engines, so sampling queries verify the *deterministic* structure:
  * exact counts from volume-neutral caps and stratified percent-rank
  * cuts, plus invariant booleans for Bernoulli paths. */
object EdaQueries extends QueryPack {

  /** events with a derived nullable numeric + flags, shared with the
    * oracle. */
  private def ev(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("v_null",
        when(col("value") < 1.0, lit(null)).otherwise(col("value")))

  private val evSql =
    """SELECT *, CASE WHEN value < 1.0 THEN NULL ELSE value END v_null
      |FROM events""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // col/row validation reports (diagnosis.py:236/:268): the rule
    // sets are fixed, so which column rules fail and the per-reason
    // violating-row counts are plain SQL facts
    "q_eda_validation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val colRep = EdaOps.colValidation(li, Seq(
          ("l_quantity", min(col("l_quantity")) >= 1, "qty >= 1"),
          ("l_discount", max(col("l_discount")) <= 0.05, "disc cap"),
          ("l_tax", min(col("l_tax")) >= 0, "tax >= 0")))
        .select(lit("col").as("kind"), col("column").as("name"),
          lit(1L).as("n"))
      val rowRep = EdaOps.rowValidation(li,
          Seq((col("l_quantity") <= 30, "qty > 30"),
            (col("l_discount") <= 0.06, "disc > 0.06")),
          idCol = Some((col("l_orderkey") * 10 + col("l_linenumber"))
            .as("rid")))
        .groupBy(col("__reason__"))
        .agg(count(lit(1)).as("n"))
        .select(lit("row").as("kind"), col("__reason__").as("name"),
          col("n"))
      colRep.unionByName(rowRep).orderBy("kind", "name")
    }),
    "q_split_ratio" -> ((s, dir) => {
      SampleOps.splitByRatio(t(s, dir, "events"),
          Seq(("train", 0.7), ("val", 0.2), ("test", 0.1)),
          stratifyBy = Seq("event_type"))
        .groupBy(col("event_type"), col("split"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "split")
    }),
    "q_volume_neutral" -> ((s, dir) => {
      SampleOps.volumeNeutral(t(s, dir, "events"), Seq("event_type"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),
    // volume_neutral with `control` (sample_and_split.py:224): the cap
    // is the min by-group size INSIDE each control group — group sizes
    // after equalization are deterministic
    "q_vn_control" -> ((s, dir) => {
      val df = t(s, dir, "events")
        .withColumn("ctl", col("user_id") % 3)
      SampleOps.volumeNeutral(df, Seq("event_type"), control = Seq("ctl"))
        .groupBy(col("ctl"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("ctl", "event_type")
    }),
    // downsample with exact-n conditions (sample_and_split.py:238):
    // kept counts are min(n, subset size); unmatched rows untouched
    "q_downsample_where" -> ((s, dir) => {
      SampleOps.downsampleWhere(t(s, dir, "events"), Seq(
          (col("event_type") === "click", Left(100)),
          (col("event_type") === "view", Left(50))))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),
    "q_sample_counts" -> ((s, dir) => {
      val events = t(s, dir, "events")
      val n = SampleOps.sampleN(events, 500).count()
      val down = SampleOps.downsample(events, "event_type",
        Map("click" -> 0.5))
      val clickKept = down.filter(col("event_type") === "click").count()
      val clickTotal = events.filter(col("event_type") === "click").count()
      val othersKept = down.filter(col("event_type") =!= "click").count()
      val othersTotal = events.filter(col("event_type") =!= "click").count()
      s.createDataFrame(Seq((n,
        clickKept > 0 && clickKept < clickTotal,
        othersKept == othersTotal)))
        .toDF("sample_n", "click_downsampled", "others_untouched")
    }),
    "q_eda_special" -> ((s, dir) => {
      EdaOps.specialValuesReport(ev(s, dir), Seq("v_null", "value"))
        .orderBy("column")
    }),
    "q_eda_profile" -> ((s, dir) => {
      EdaOps.numericProfile(ev(s, dir), Seq("v_null", "value"))
        .select(col("column"), col("cnt"), col("null_cnt"),
          round(col("mean"), 6).as("mean"), round(col("std"), 6).as("std"),
          col("min"), round(col("q25"), 6).as("q25"),
          round(col("median"), 6).as("median"),
          round(col("q75"), 6).as("q75"), col("max"))
        .orderBy("column")
    }),
    "q_null_corr" -> ((s, dir) => {
      EdaOps.nullCorr(ev(s, dir), Seq("v_null"), Seq("value", "user_id"))
        .select(col("null_col"), col("num_col"),
          round(col("corr"), 6).as("corr"))
        .orderBy("null_col", "num_col")
    }),
    "q_str_stats" -> ((s, dir) => {
      EdaOps.strStats(t(s, dir, "documents"), Seq("text", "lang"))
        .select(col("column"), col("null_cnt"), col("n_unique"),
          col("min_len"), round(col("avg_len"), 6).as("avg_len"),
          col("max_len"))
        .orderBy("column")
    }),
    "q_eda_infer" -> ((s, dir) => {
      val df = ev(s, dir)
        .withColumn("const_col", lit(1))
        .withColumn("bin_col", col("user_id") % 2)
      EdaOps.inferReport(df,
          Seq("const_col", "bin_col", "event_type", "value", "v_null"),
          maxDistinct = 10, nullThreshold = 0.005)
        .orderBy("column")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_eda_validation" ->
      """WITH rowv AS (
        |  SELECT CASE WHEN NOT (l_quantity <= 30) THEN 'qty > 30'
        |              WHEN NOT (l_discount <= 0.06) THEN 'disc > 0.06'
        |         END r
        |  FROM lineitem),
        |rv AS (
        |  SELECT 'row' AS kind, r AS name, COUNT(*)::BIGINT AS n
        |  FROM rowv WHERE r IS NOT NULL GROUP BY 2),
        |cv AS (
        |  SELECT 'col' AS kind, 'l_discount' AS name, 1::BIGINT AS n
        |  FROM (SELECT MAX(l_discount) m FROM lineitem) WHERE m > 0.05)
        |SELECT * FROM cv UNION ALL SELECT * FROM rv
        |ORDER BY kind, name""".stripMargin,
    "q_split_ratio" ->
      """WITH g AS (
        |  SELECT event_type, COUNT(*) n FROM events GROUP BY 1),
        |r AS (
        |  SELECT event_type, UNNEST(generate_series(0, (n - 1)::INT)) i, n
        |  FROM g),
        |lab AS (
        |  SELECT event_type,
        |    CASE WHEN i / (n - 1.0) <= 0.7 THEN 'train'
        |         WHEN i / (n - 1.0) <= 0.9 THEN 'val'
        |         ELSE 'test' END split
        |  FROM r)
        |SELECT event_type, split, COUNT(*) AS n
        |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_volume_neutral" ->
      """WITH g AS (SELECT event_type, COUNT(*) n FROM events GROUP BY 1),
        |m AS (SELECT MIN(n) cap FROM g)
        |SELECT event_type, LEAST(n, cap)::BIGINT AS n
        |FROM g, m ORDER BY 1""".stripMargin,
    "q_vn_control" ->
      """WITH base AS (SELECT user_id % 3 AS ctl, event_type FROM events),
        |g AS (SELECT ctl, event_type, COUNT(*) n FROM base GROUP BY 1, 2),
        |m AS (SELECT ctl, MIN(n) cap FROM g GROUP BY 1)
        |SELECT g.ctl, g.event_type, m.cap::BIGINT AS n
        |FROM g JOIN m USING (ctl) ORDER BY 1, 2""".stripMargin,
    "q_downsample_where" ->
      """WITH g AS (SELECT event_type, COUNT(*) n FROM events GROUP BY 1)
        |SELECT event_type,
        |  CASE WHEN event_type = 'click' THEN LEAST(n, 100)
        |       WHEN event_type = 'view' THEN LEAST(n, 50)
        |       ELSE n END::BIGINT AS n
        |FROM g ORDER BY 1""".stripMargin,
    "q_sample_counts" ->
      """SELECT 500::BIGINT AS sample_n, TRUE AS click_downsampled,
        |  TRUE AS others_untouched""".stripMargin,
    "q_eda_special" ->
      s"""WITH e AS ($evSql),
         |u AS (
         |  SELECT 'v_null' AS "column",
         |    SUM(CASE WHEN v_null IS NULL THEN 1 ELSE 0 END)::BIGINT n_null,
         |    0::BIGINT n_inf,
         |    SUM(CASE WHEN isnan(v_null) THEN 1 ELSE 0 END)::BIGINT n_nan,
         |    SUM(CASE WHEN v_null = 0 THEN 1 ELSE 0 END)::BIGINT n_zero
         |  FROM e
         |  UNION ALL
         |  SELECT 'value',
         |    SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT,
         |    0::BIGINT,
         |    SUM(CASE WHEN isnan(value) THEN 1 ELSE 0 END)::BIGINT,
         |    SUM(CASE WHEN value = 0 THEN 1 ELSE 0 END)::BIGINT
         |  FROM e)
         |SELECT * FROM u ORDER BY "column"""".stripMargin,
    "q_eda_profile" ->
      s"""WITH e AS ($evSql),
         |u AS (
         |  SELECT 'v_null' AS "column", COUNT(v_null)::BIGINT cnt,
         |    SUM(CASE WHEN v_null IS NULL THEN 1 ELSE 0 END)::BIGINT
         |      null_cnt,
         |    ROUND(AVG(v_null), 6) mean,
         |    ROUND(STDDEV_SAMP(v_null), 6) std,
         |    MIN(v_null) min, ROUND(quantile_cont(v_null, 0.25), 6) q25,
         |    ROUND(quantile_cont(v_null, 0.5), 6) median,
         |    ROUND(quantile_cont(v_null, 0.75), 6) q75, MAX(v_null) max
         |  FROM e
         |  UNION ALL
         |  SELECT 'value', COUNT(value)::BIGINT,
         |    SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT,
         |    ROUND(AVG(value), 6), ROUND(STDDEV_SAMP(value), 6),
         |    MIN(value), ROUND(quantile_cont(value, 0.25), 6),
         |    ROUND(quantile_cont(value, 0.5), 6),
         |    ROUND(quantile_cont(value, 0.75), 6), MAX(value)
         |  FROM e)
         |SELECT * FROM u ORDER BY "column"""".stripMargin,
    "q_null_corr" ->
      s"""WITH e AS ($evSql)
         |SELECT 'v_null' AS null_col, 'user_id' AS num_col,
         |  ROUND(CORR(CASE WHEN v_null IS NULL THEN 1.0 ELSE 0.0 END,
         |    user_id), 6) AS corr
         |FROM e
         |UNION ALL
         |SELECT 'v_null', 'value',
         |  ROUND(CORR(CASE WHEN v_null IS NULL THEN 1.0 ELSE 0.0 END,
         |    value), 6)
         |FROM e
         |ORDER BY null_col, num_col""".stripMargin,
    "q_str_stats" ->
      """WITH u AS (
        |  SELECT 'lang' AS "column",
        |    SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT null_cnt,
        |    COUNT(DISTINCT lang)::BIGINT n_unique,
        |    MIN(LENGTH(lang))::BIGINT min_len,
        |    ROUND(AVG(LENGTH(lang)), 6) avg_len,
        |    MAX(LENGTH(lang))::BIGINT max_len
        |  FROM documents
        |  UNION ALL
        |  SELECT 'text',
        |    SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    COUNT(DISTINCT text)::BIGINT, MIN(LENGTH(text))::BIGINT,
        |    ROUND(AVG(LENGTH(text)), 6), MAX(LENGTH(text))::BIGINT
        |  FROM documents)
        |SELECT * FROM u ORDER BY "column"""".stripMargin,
    "q_eda_infer" ->
      s"""WITH e AS (SELECT *, 1 const_col, user_id % 2 bin_col
         |  FROM ($evSql)),
         |u AS (
         |  SELECT 'bin_col' AS "column",
         |    COUNT(DISTINCT bin_col)::BIGINT n_distinct,
         |    COUNT(DISTINCT bin_col) = 1 is_const,
         |    COUNT(DISTINCT bin_col) = 2 is_binary,
         |    COUNT(DISTINCT bin_col) <= 10 is_discrete,
         |    AVG(CASE WHEN bin_col IS NULL THEN 1.0 ELSE 0.0 END) > 0.005
         |      high_null
         |  FROM e
         |  UNION ALL SELECT 'const_col', COUNT(DISTINCT const_col)::BIGINT,
         |    COUNT(DISTINCT const_col) = 1, COUNT(DISTINCT const_col) = 2,
         |    COUNT(DISTINCT const_col) <= 10,
         |    AVG(CASE WHEN const_col IS NULL THEN 1.0 ELSE 0.0 END) > 0.005
         |  FROM e
         |  UNION ALL SELECT 'event_type', COUNT(DISTINCT event_type)::BIGINT,
         |    COUNT(DISTINCT event_type) = 1, COUNT(DISTINCT event_type) = 2,
         |    COUNT(DISTINCT event_type) <= 10,
         |    AVG(CASE WHEN event_type IS NULL THEN 1.0 ELSE 0.0 END) > 0.005
         |  FROM e
         |  UNION ALL SELECT 'v_null', COUNT(DISTINCT v_null)::BIGINT,
         |    COUNT(DISTINCT v_null) = 1, COUNT(DISTINCT v_null) = 2,
         |    COUNT(DISTINCT v_null) <= 10,
         |    AVG(CASE WHEN v_null IS NULL THEN 1.0 ELSE 0.0 END) > 0.005
         |  FROM e
         |  UNION ALL SELECT 'value', COUNT(DISTINCT value)::BIGINT,
         |    COUNT(DISTINCT value) = 1, COUNT(DISTINCT value) = 2,
         |    COUNT(DISTINCT value) <= 10,
         |    AVG(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END) > 0.005
         |  FROM e)
         |SELECT * FROM u ORDER BY "column"""".stripMargin
  )
}
